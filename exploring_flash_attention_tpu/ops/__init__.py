from exploring_flash_attention_tpu.ops.attention_v1 import flash_attention_v1
from exploring_flash_attention_tpu.ops.attention_v1_dtiled import (
    flash_attention_v1_dtiled,
)
from exploring_flash_attention_tpu.ops.attention_int8 import (
    flash_attention_int8,
)
from exploring_flash_attention_tpu.ops.attention_kvquant import (
    flash_attention_kvquant,
)
from exploring_flash_attention_tpu.ops.attention_v2_splitkv import (
    flash_attention_splitkv_partial,
    flash_attention_v2,
    splitkv_combine,
)
from exploring_flash_attention_tpu.ops.attention_bwd import (
    flash_attention_bwd,
)
from exploring_flash_attention_tpu.ops.attention_vjp import flash_attention

__all__ = [
    "flash_attention",
    "flash_attention_bwd",
    "flash_attention_v1",
    "flash_attention_v1_dtiled",
    "flash_attention_v2",
    "flash_attention_kvquant",
    "flash_attention_int8",
    "flash_attention_splitkv_partial",
    "splitkv_combine",
]
