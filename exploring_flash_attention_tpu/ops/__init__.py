from exploring_flash_attention_tpu.ops.attention_v1 import flash_attention_v1

__all__ = ["flash_attention_v1"]
