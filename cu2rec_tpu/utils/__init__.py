from cu2rec_tpu.utils.config import Config

__all__ = ["Config"]
