from regennet_tpu.ops import rotations  # noqa: F401
