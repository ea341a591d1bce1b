from regennet_tpu.data.get_data import get_dataset_loader  # noqa: F401
