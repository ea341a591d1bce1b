from regennet_tpu.models.cmdm import CMDM  # noqa: F401
