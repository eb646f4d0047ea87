from hydragen_tpu.models.config import ModelConfig

__all__ = ["ModelConfig"]
