from mimrl_tpu.data.universal import get_data_loader

__all__ = ["get_data_loader"]
