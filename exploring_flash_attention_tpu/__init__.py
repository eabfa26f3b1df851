"""TPU-native flash-attention engine.

A brand-new JAX/Pallas re-design of the progressive flash-attention ladder in
the reference repo ``tyler-utah/exploring_flash_attention``:

- fused online-softmax V1  -> Pallas kernel over a (batch*head, Q-block) grid
  with VMEM-resident running-softmax state (``ops/attention_v1.py``),
- true d-tiled V1 for large head dims -> independent D_TILE_QK / D_TILE_V
  streaming from HBM with a float32 VMEM output accumulator
  (``ops/attention_v1_dtiled.py``),
- split-KV V2 forward+combine -> a Pallas kernel pair with an HBM partial
  (O, lse) workspace (``ops/attention_v2_splitkv.py``),

extended TPU-first with INT8/FP8 quantized QKV + INT8 paged KV-cache with
dequant fused into the tile matmuls (``ops/quant.py``, ``ops/paged.py``), a
continuous-batching decode path (``serving/``), and multi-chip ring/split-KV
attention over ICI via ``shard_map`` (``parallel/``).

Reference capability surface (see SURVEY.md): forward non-causal batched
multi-head attention softmax(Q K^T / sqrt(d)) V computed tile-wise with
streaming softmax, validated against naive oracles.
"""

from exploring_flash_attention_tpu.configs import (
    MeshConfig,
    Precision,
    SplitKVConfig,
    TileConfig,
)
from exploring_flash_attention_tpu.oracle.reference import (
    check_accuracy,
    naive_attention,
    naive_attention_jax,
    print_comparison,
)

__all__ = [
    "TileConfig",
    "SplitKVConfig",
    "Precision",
    "MeshConfig",
    "naive_attention",
    "naive_attention_jax",
    "check_accuracy",
    "print_comparison",
]

__version__ = "0.1.0"
