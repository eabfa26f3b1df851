"""Config dataclasses — the TPU-native replacement for the reference's
compile-time ``-D`` macro knobs.

The reference injects ``BQ/BK/D_TILE_QK/D_TILE_V/D/THREADS_PER_BLOCK/
KV_TILES_PER_BLOCK/USE_FP64`` through Makefile defines and stitches the
compile-time/runtime worlds with ``assert(d_runtime == D)`` (reference:
flash_attention_v1_tiled_d/CUDA/Makefile:9-18,
flash_attention_v1/CUDA/flash_attention_v1.h:167).  Here the same knob set is
a frozen dataclass; jit tracing specializes each kernel on the config, so
"rebuild with different -Ds" becomes "call with a different config".
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp


def _is_pow2(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@dataclasses.dataclass(frozen=True)
class TileConfig:
    """Tile-size knobs for the fused / d-tiled kernels.

    TPU sweet spots differ from the reference's CUDA defaults (BQ=BK=16):
    the MXU wants (8..16, 128)-aligned operands, so the defaults here are
    128-sized blocks.  Same knobs, different sweet spots.
    """

    block_q: int = 512          # reference BQ (TPU sweet spot; min 128)
    block_kv: int = 512         # reference BK
    d_tile_qk: Optional[int] = None   # reference D_TILE_QK (None = no d-tiling)
    d_tile_v: Optional[int] = None    # reference D_TILE_V
    # one-pass fast-path selection: None = auto (use it whenever the whole
    # KV fits VMEM and the call is non-causal), False = always stream
    # (exercises/tunes the online-softmax kernel), True = require it
    one_pass: Optional[bool] = None
    # rows of scores per softmax strip in the one-pass kernels
    # (None = auto, 256 — the measured v5e optimum at d=128)
    q_chunk: Optional[int] = None
    # heads processed per one-pass program with their K/V resident
    # (None = auto: 4 when the whole-head geometry fits VMEM, else 1).
    # Folding amortizes per-program pipeline fill — measured +3-5% at the
    # canonical d=128 shape (scripts/proto_headfold*.py); 1 disables.
    head_fold: Optional[int] = None
    # softmax max-statistic strategy on the one-pass paths:
    #   "exact" — per-row lane max-reduction over the scores (default;
    #     max_abs ~4e-4 vs the f64 oracle at the canonical bf16 shape);
    #   "bound" — rigorous Cauchy-Schwarz upper bound
    #     ||q_i|| * max_j ||k_j|| * scale replaces the reduce.  Softmax is
    #     shift-invariant, the bound >= true max makes overflow impossible,
    #     and K norms amortize across strips — measured 161 vs 151 TF/s
    #     (+6.6%, 81.9% of roofline) at B=32,H=8,L=1024,d=128
    #     (scripts/proto_r4_boundmax.py).  Costs the top softmax weight its
    #     exact-1.0 bf16 representation, so max_abs vs the oracle is
    #     ~1.0e-3 instead of ~4e-4 — inside the reference's 1e-2 tier
    #     (common/reference.py:24) but marginally over this repo's 1e-3
    #     headline gate, hence opt-in.
    softmax: str = "exact"

    def __post_init__(self):
        if self.softmax not in ("exact", "bound"):
            raise ValueError(
                f"softmax must be 'exact' or 'bound', got {self.softmax!r}")
        if self.block_q <= 0 or self.block_kv <= 0:
            raise ValueError("block sizes must be positive")
        if not _is_pow2(self.block_q) or not _is_pow2(self.block_kv):
            # mirrors the reference's power-of-two static_assert
            # (flash_attention_v1/CUDA/flash_attention_v1.h:257-260)
            raise ValueError("block_q / block_kv must be powers of two")
        if self.head_fold is not None and (
                self.head_fold < 1 or not _is_pow2(self.head_fold)):
            raise ValueError("head_fold must be a positive power of two")
        for dt in (self.d_tile_qk, self.d_tile_v):
            if dt is not None and (dt <= 0 or dt % 128 != 0):
                raise ValueError("d tiles must be positive multiples of 128 (TPU lane width)")
        if self.q_chunk is not None and (
                self.q_chunk <= 0 or self.q_chunk % 8 != 0):
            raise ValueError("q_chunk must be a positive multiple of 8 "
                             "(TPU sublane width)")

    def validate_for(self, seq_len_q: int, seq_len_kv: int, head_dim: int) -> None:
        if self.d_tile_qk is not None and head_dim % self.d_tile_qk != 0:
            raise ValueError(f"head_dim {head_dim} not divisible by d_tile_qk {self.d_tile_qk}")
        if self.d_tile_v is not None and head_dim % self.d_tile_v != 0:
            raise ValueError(f"head_dim {head_dim} not divisible by d_tile_v {self.d_tile_v}")


@dataclasses.dataclass(frozen=True)
class SplitKVConfig(TileConfig):
    """Adds the V2 split-KV knob: how many KV tiles one forward block owns
    (reference KV_TILES_PER_BLOCK, flash_attention_v2/CUDA/flash_attention_v2.h:44)."""

    kv_tiles_per_block: int = 4

    def num_kv_blocks(self, seq_len_kv: int) -> int:
        n_kv_tiles = cdiv(seq_len_kv, self.block_kv)
        return cdiv(n_kv_tiles, self.kv_tiles_per_block)

    @property
    def kv_block_len(self) -> int:
        return self.kv_tiles_per_block * self.block_kv


@dataclasses.dataclass(frozen=True)
class Precision:
    """Mixed-precision policy.

    The reference stores tiles in FP16 and keeps softmax statistics and
    accumulation in FP32 (DATA_TYPE macros,
    flash_attention_v1/CUDA/flash_attention_v1.h:33-41).  On TPU the storage
    dtype is bf16 (or int8/fp8 when quantized) and all statistics /
    accumulators are f32.
    """

    storage: jnp.dtype = jnp.bfloat16     # Q/K/V/O storage dtype
    accum: jnp.dtype = jnp.float32        # matmul accumulator + m/l/lse
    # softmax scale override; None -> 1/sqrt(d)
    scale: Optional[float] = None

    def softmax_scale(self, head_dim: int) -> float:
        return self.scale if self.scale is not None else 1.0 / math.sqrt(head_dim)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for the multi-chip paths.

    Axes: ``dp`` data/batch, ``tp`` tensor (heads + KV-cache sharding),
    ``sp`` sequence/context (ring or split-KV over the KV axis).
    """

    dp: int = 1
    tp: int = 1
    sp: int = 1
    axis_names: Tuple[str, str, str] = ("dp", "tp", "sp")

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.dp, self.tp, self.sp)

    @property
    def n_devices(self) -> int:
        return self.dp * self.tp * self.sp


# Canonical benchmark shape from the reference drivers
# (flash_attention_v1/CUDA/driver.cu:140-143).
CANONICAL_B, CANONICAL_H, CANONICAL_L = 32, 8, 1024
CANONICAL_D_V1, CANONICAL_D_TILED = 32, 128
