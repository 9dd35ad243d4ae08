from .flash_attention import flash_attention
from .flash_attention_bwd import flash_attention_trainable

__all__ = ["flash_attention", "flash_attention_trainable"]
