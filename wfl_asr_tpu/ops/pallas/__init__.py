from .flash_attention import flash_attention
from .flash_attention_bwd import flash_attention_trainable
from .conv_stack import conv_stride_matmul

__all__ = ["flash_attention", "flash_attention_trainable",
           "conv_stride_matmul"]
