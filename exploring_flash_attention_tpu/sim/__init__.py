from exploring_flash_attention_tpu.sim.tile_loop import (
    flash_attention_tiled,
    flash_attention_tiled_fused,
    process_kv_tile,
)
from exploring_flash_attention_tpu.sim.dtiled import flash_attention_dtiled
from exploring_flash_attention_tpu.sim.splitkv import (
    combine_partials,
    flash_attention_splitkv_sim,
    partial_attention_block,
)

__all__ = [
    "process_kv_tile",
    "flash_attention_tiled",
    "flash_attention_tiled_fused",
    "flash_attention_dtiled",
    "partial_attention_block",
    "combine_partials",
    "flash_attention_splitkv_sim",
]
