"""d-tiled V1 flash-attention Pallas kernel for large head dims.

TPU-native re-design of the reference's "true d-tiling" kernel
(flash_attention_v1_tiled_d/CUDA/flash_attention_v1.h): instead of staging
full (block, d) K/V tiles on-chip, the head dimension is streamed in
``d_tile_qk`` / ``d_tile_v`` chunks from HBM, with the score matrix
accumulated chunk-by-chunk and a full-width f32 output accumulator kept
resident (the VMEM analog of the reference's per-thread ``O_reg``,
tiled_d/flash_attention_v1.h:269-284).

Mapping of the reference's machinery:

- global->shared chunk loads inside the tile step (tiled_d
  flash_attention_v1.h:154-174, 209-226)  ->  a sequential *d-chunk grid
  axis* whose K/V BlockSpecs stream one (block_kv, d_tile) chunk per
  program — Pallas's pipeline emitter double-buffers the HBM->VMEM copies
  and overlaps them with the MXU work automatically, including across KV
  steps (the role of load_shared_memory.h's vectorized copy library, and
  the replacement for this file's earlier hand-rolled
  ``make_async_copy`` double buffering, which exposed one DMA latency per
  KV step and measured ~40 TFLOP/s at d=512 vs ~2x for this form);
- ``mat_mul_chunk_accumulate`` (:57-73)   ->  per-chunk MXU dot into an
  f32 S accumulator in VMEM;
- alpha-scaling hoisted before the V d-loop (the opt/V2 refinement,
  flash_attention_v2.h:213-219)           ->  one full-width multiply of
  O_acc at the softmax phase, before the chunked P@V accumulation.

The innermost grid axis runs ``n_cq + n_cv`` phases per KV tile: phases
``[0, n_cq)`` accumulate S chunk-by-chunk, phase ``n_cq`` runs the online
softmax update (exp2 basis, scale folded into one FMA), phases
``[n_cq, n_cq + n_cv)`` accumulate P@V into the owning output columns.
The K spec clamps its chunk index during the V phases (and vice versa) so
a block is only re-fetched when its index actually advances.

On-chip memory per program is O(BQ*BK + (BQ+BK)*d_tile + BQ*d) versus the
non-tiled kernel's O((BQ+2*BK)*d + BQ*BK) input residency — the same VMEM
economy argument as the reference's 3.69 KB vs 8.22 KB shared-memory table
(tiled_d/README.md:13,211), which is what lets d grow to 512+ while keeping
large blocks.

Restrictions (asserted): L divisible by blocks, d divisible by both d tiles
— the d-tiled path targets large aligned shapes, mirroring the reference's
compile-time divisibility static_asserts.  Non-causal only, like the
reference.

When to use: only when a single (block, d) K/V tile would blow the VMEM
budget (d >= ~1024 at large blocks).  For d <= 512 with moderate L the
plain :func:`flash_attention_v1` (whose one-pass/streaming tiles hold the
full head dim) is substantially faster — d-tiling trades on-chip residency
for extra HBM chunk traffic, exactly as the reference's shared-memory
variant did (tiled_d/README.md:13).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.configs import TileConfig, cdiv
from exploring_flash_attention_tpu.ops.attention_v1 import (
    LOG2E,
    NEG_INF,
    STATS_LANES,
    _resolve_interpret,
    dot_precision,
)


def _dtiled_kernel(
    *refs,
    scale: float,
    d_tile_qk: int,
    d_tile_v: int,
    n_cq: int,
    n_cv: int,
    quantized: bool,
):
    # refs layout:
    #   q_ref, k_ref, v_ref     VMEM (1,BQ,d), (1,BK,DTQ), (1,BK,DTV)
    #                           (k/v int8 or fp8 when quantized)
    #   [ks_ref, vs_ref]        SMEM, full flat [n_bh * n_kv] f32 scales
    #                           (unblocked — TPU SMEM blocks must keep
    #                           native tiling, so index by program id)
    #   o_ref                   VMEM (1, BQ, d)
    #   s_scratch               VMEM (BQ, BK) f32 — S accumulator
    #   p_scratch               VMEM (BQ, BK) compute dtype — probabilities
    #   o_acc, m_ref, l_ref     VMEM (BQ, d) f32, (BQ, 128) f32 x2
    if quantized:
        (q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
         s_scratch, p_scratch, o_acc, m_ref, l_ref) = refs
    else:
        (q_ref, k_ref, v_ref, o_ref,
         s_scratch, p_scratch, o_acc, m_ref, l_ref) = refs
    kv = pl.program_id(2)
    c = pl.program_id(3)
    n_kv = pl.num_programs(2)
    c2 = scale * LOG2E
    if quantized:
        # K dequant rides the softmax-scale scalar (softmax args are
        # s * ks * scale — fold once into the exp2-basis constant).
        # program_id is hoisted: it cannot be read inside pl.when bodies
        # under interpret mode.
        scale_idx = pl.program_id(0) * n_kv + kv
        c2 = c2 * ks_ref[scale_idx]
    else:
        scale_idx = None

    @pl.when(jnp.logical_and(kv == 0, c == 0))
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        o_acc[...] = jnp.zeros_like(o_acc)

    # ---- phases [0, n_cq): S += Q_c K_c^T, one d-chunk per program ----
    @pl.when(c < n_cq)
    def _qk_chunk():
        # Q stays VMEM-resident full-width for the whole program (the
        # reference re-loads Q chunks per KV tile because shared memory is
        # KBs, tiled_d flash_attention_v1.h:154-174); slice the owning chunk
        q_c = q_ref[0, :, pl.ds(c * d_tile_qk, d_tile_qk)]
        k_c = k_ref[0]
        if quantized:
            k_c = k_c.astype(q_c.dtype)      # exact int8/fp8 -> bf16 cast
        partial = jax.lax.dot_general(
            q_c, k_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q_c),
        )

        @pl.when(c == 0)
        def _first():
            s_scratch[...] = partial

        @pl.when(c > 0)
        def _rest():
            s_scratch[...] = s_scratch[...] + partial

    # ---- phase n_cq: online-softmax update (exp2 basis) ----
    @pl.when(c == n_cq)
    def _softmax():
        s = s_scratch[...]
        m_prev = m_ref[...]
        m_cur = jnp.max(s, axis=1, keepdims=True) * c2
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s * c2 - m_new[:, :1])
        m_ref[...] = m_new
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        # alpha hoisted: one full-width rescale before the chunked P@V
        o_acc[...] = o_acc[...] * alpha[:, :1]
        if quantized:
            # V dequant rides the probability tile — the per-chunk P@V
            # matmul only needs the exact int8/fp8 -> bf16 operand cast
            p = p * vs_ref[scale_idx]
        p_scratch[...] = p.astype(p_scratch.dtype)

    # ---- phases [n_cq, n_cq+n_cv): O[:, cv] += P V_cv ----
    @pl.when(c >= n_cq)
    def _pv_chunk():
        cv = c - n_cq
        v_c = v_ref[0]
        if quantized:
            v_c = v_c.astype(p_scratch.dtype)
        pv = jax.lax.dot_general(
            p_scratch[...], v_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(p_scratch[...]),
        )
        col = pl.ds(cv * d_tile_v, d_tile_v)
        o_acc[:, col] = o_acc[:, col] + pv

    # finalize O = O_acc / l (reference tiled_d :300-308)
    @pl.when(jnp.logical_and(kv == n_kv - 1, c == n_cq + n_cv - 1))
    def _finalize():
        l = l_ref[:, :1]
        o_ref[0] = (
            o_acc[...] / jnp.where(l == 0.0, 1.0, l)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("config", "scale", "interpret", "out_dtype"),
)
def flash_attention_v1_dtiled(
    q: jax.Array,             # [B, H, L, d]
    k,                        # jax.Array or QuantizedTensor (int8/fp8 + scales)
    v,
    config: TileConfig = TileConfig(block_q=256, block_kv=256,
                                    d_tile_qk=128, d_tile_v=128),
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    out_dtype=None,
) -> jax.Array:
    """d-tiled fused attention forward for large head dims (d >= 128).

    ``k``/``v`` may be :class:`~.quant.QuantizedTensor` (INT8 or FP8
    values + per-KV-tile f32 scales, quant block == ``block_kv``) — the
    BASELINE "d-tiled V1 ... with FP8 weight-only QKV" tier.  Dequant is
    fused into the existing multiplies: the K scale folds into the
    exp2-basis softmax constant, the V scale rides the probability tile,
    so the chunk matmuls keep low-precision operands and the kernel runs
    the same number of passes as the bf16 version."""
    from exploring_flash_attention_tpu.ops.quant import (
        QuantizedTensor, warn_if_fp8_slow,
    )

    quantized = isinstance(k, QuantizedTensor)
    if quantized != isinstance(v, QuantizedTensor):
        raise ValueError("quantize both k and v or neither")
    if quantized:
        warn_if_fp8_slow(k.values.dtype)
    k_arr = k.values if quantized else k
    v_arr = v.values if quantized else v
    b, h, lq, d = q.shape
    lkv = k_arr.shape[2]
    d_tile_qk = config.d_tile_qk or min(d, 128)
    d_tile_v = config.d_tile_v or min(d, 128)
    if d % d_tile_qk or d % d_tile_v:
        raise ValueError(f"head_dim {d} must be divisible by d tiles "
                         f"({d_tile_qk}, {d_tile_v})")
    block_q = min(config.block_q, lq)
    block_kv = min(config.block_kv, lkv)
    if lq % block_q or lkv % block_kv:
        raise ValueError(
            f"d-tiled path requires L divisible by blocks: "
            f"Lq={lq}%{block_q}, Lkv={lkv}%{block_kv}"
        )
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    out_dtype = out_dtype or q.dtype

    n_bh = b * h
    n_q = lq // block_q
    n_kv = lkv // block_kv
    n_cq = d // d_tile_qk
    n_cv = d // d_tile_v
    qf = q.reshape(n_bh, lq, d)
    kf = k_arr.reshape(n_bh, lkv, d)
    vf = v_arr.reshape(n_bh, lkv, d)

    kernel = functools.partial(
        _dtiled_kernel,
        scale=scale,
        d_tile_qk=d_tile_qk,
        d_tile_v=d_tile_v,
        n_cq=n_cq,
        n_cv=n_cv,
        quantized=quantized,
    )
    in_specs = [
        pl.BlockSpec((1, block_q, d),
                     lambda bh, qi, kv, c: (bh, qi, 0)),
        # chunk index clamps during the foreign phase so the block is
        # only re-fetched when it actually advances
        pl.BlockSpec(
            (1, block_kv, d_tile_qk),
            lambda bh, qi, kv, c: (bh, kv, jnp.minimum(c, n_cq - 1)),
        ),
        pl.BlockSpec(
            (1, block_kv, d_tile_v),
            lambda bh, qi, kv, c: (
                bh, kv, jnp.clip(c - n_cq, 0, n_cv - 1)
            ),
        ),
    ]
    inputs = [qf, kf, vf]
    if quantized:
        if k.block != block_kv or v.block != block_kv:
            raise ValueError(
                f"quant block ({k.block}, {v.block}) must equal "
                f"block_kv ({block_kv})"
            )
        scale_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        in_specs += [scale_spec, scale_spec]
        inputs += [
            k.scales.reshape(n_bh * n_kv),
            v.scales.reshape(n_bh * n_kv),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(n_bh, n_q, n_kv, n_cq + n_cv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bh, qi, kv, c: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, lq, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, block_kv), jnp.float32),
            pltpu.VMEM((block_q, block_kv),
                       q.dtype if quantized else v_arr.dtype),
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, STATS_LANES), jnp.float32),
            pltpu.VMEM((block_q, STATS_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_bh * lq * lkv * d,
            bytes_accessed=(qf.size * qf.dtype.itemsize
                            + n_q * (kf.size + vf.size) * kf.dtype.itemsize)
            + n_bh * lq * d * jnp.dtype(out_dtype).itemsize,
            transcendentals=n_bh * lq * lkv,
        ),
        interpret=_resolve_interpret(interpret),
    )(*inputs)
    return out.reshape(b, h, lq, d)
