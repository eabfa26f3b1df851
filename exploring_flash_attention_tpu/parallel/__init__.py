from exploring_flash_attention_tpu.parallel.mesh import make_mesh
from exploring_flash_attention_tpu.parallel.partials import (
    attention_partial_local,
    merge_partials,
)
from exploring_flash_attention_tpu.parallel.ring import (
    ring_attention,
    ring_flash_attention,
)
from exploring_flash_attention_tpu.parallel.splitkv_xhost import (
    splitkv_attention_xhost,
)
from exploring_flash_attention_tpu.parallel.ulysses import ulysses_attention
from exploring_flash_attention_tpu.parallel.window import sp_window_attention

__all__ = [
    "make_mesh",
    "attention_partial_local",
    "merge_partials",
    "ring_attention",
    "ring_flash_attention",
    "splitkv_attention_xhost",
    "sp_window_attention",
    "ulysses_attention",
]
