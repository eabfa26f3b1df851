"""Fully-quantized INT8 QKV flash attention — both tile matmuls on the
MXU's int8 path (v5e: 394 TOPS int8 vs 197 TFLOP/s bf16).

Extends the fused-dequant design of :mod:`attention_kvquant` (K/V int8,
compute bf16) to *integer arithmetic*:

- S tile: ``s_i32 = Q_i8 @ K_i8^T`` with int32 accumulation; the combined
  dequant factor ``q_scale * k_scale * softmax_scale * log2(e)`` folds into
  the one fused multiply-subtract that feeds ``exp2`` — zero extra passes;
- P tile, two modes: ``pv_mode="bf16"`` (default) casts probabilities to
  bf16 and V int8→bf16 (exact — int8 fits bf16's mantissa), folding
  ``v_scale`` into the per-block output sum: QK at int8 rate, PV at bf16
  rate, accuracy equal to the kvquant kernel; ``pv_mode="int8"``
  re-quantizes P (``round(p * 127)``) so ``P @ V`` also runs
  int8×int8→int32 with ``v_scale / 127`` folded into the final divide —
  the full-speed mode.

Scale granularity: one f32 scale per (row-block of Q) and per (row-block of
K/V) — the same per-L-block contract as ops/quant.py.  Probabilities use a
fixed 1/127 scale (p ∈ [0, 1] after max-subtraction, so the max quantizes
exactly to 127).

Accuracy: the int8 S matmul is EXACT integer arithmetic (zero error vs the
dequantized operands).  ``pv_mode="int8"`` adds an *absolute* ±1/254 error
on attention weights -> max|Δ| ~1e-2..2e-2 vs the f32 oracle, around the
reference's own tolerance tier (max_abs 1e-2, common/reference.py:24);
``pv_mode="bf16"`` stays at bf16-kernel accuracy (~1e-3).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.configs import TileConfig, cdiv
from exploring_flash_attention_tpu.ops.attention_v1 import (
    LOG2E,
    NEG_INF,
    _resolve_interpret,
)
from exploring_flash_attention_tpu.ops.quant import QuantizedTensor


def _int8_kernel(
    q_ref, k_ref, v_ref,          # (1, BQ, d) i8, (1, Lkv, d) i8 x2
    qs_ref, ks_ref, vs_ref,       # SMEM flat f32 scale arrays
    o_ref,                        # (1, BQ, d)
    *,
    scale: float,
    q_chunk: int,
    block_q: int,
    n_q: int,
    n_kv: int,
    kv_block: int,
    seq_len_kv: int,
    pv_mode: str,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    qs = qs_ref[bh * n_q + qi]                      # this Q block's scale
    k = k_ref[0]
    v = v_ref[0]
    # NOTE: ragged L_kv needs no mask here — score pieces are sliced to
    # exactly min(kv_block, seq_len_kv - k0) columns, so the concatenated
    # strip is seq_len_kv wide by construction

    for q0 in range(0, block_q, q_chunk):
        rows = min(q_chunk, block_q - q0)
        q = q_ref[0, q0:q0 + rows, :]
        # S per KV scale-block: int8 matmul, scales folded per block
        pieces = []
        for kb in range(n_kv):
            k0 = kb * kv_block
            cols = min(kv_block, seq_len_kv - k0)
            s_i32 = jax.lax.dot_general(
                q, k[k0:k0 + cols, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            ks = ks_ref[bh * n_kv + kb]
            # combined dequant+softmax scale for this (q-block, kv-block):
            # exp2 basis, so fold log2(e) too
            cc = qs * ks * (scale * LOG2E)
            pieces.append(s_i32.astype(jnp.float32) * cc)
        s = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]

        m = jnp.max(s, axis=1, keepdims=True)
        arg = jnp.where(jnp.isneginf(m), NEG_INF, s - m)
        p = jnp.exp2(arg)                            # (rows, Lkv) in [0, 1]
        l = jnp.sum(p, axis=1, keepdims=True)
        if pv_mode == "int8":
            # re-quantize P to int8: p_max = 1 -> 127 exactly
            p_lp = jnp.round(p * 127.0).astype(jnp.int8)
            pv_scale = 1.0 / 127.0
            acc_t = jnp.int32
        else:
            p_lp = p.astype(jnp.bfloat16)
            pv_scale = 1.0
            acc_t = jnp.float32

        outs = []
        for kb in range(n_kv):
            k0 = kb * kv_block
            cols = min(kv_block, seq_len_kv - k0)
            v_b = v[k0:k0 + cols, :]
            if pv_mode != "int8":
                v_b = v_b.astype(jnp.bfloat16)       # exact int8 -> bf16
            pv_blk = jax.lax.dot_general(
                p_lp[:, k0:k0 + cols], v_b,
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )
            vs = vs_ref[bh * n_kv + kb]
            outs.append(pv_blk.astype(jnp.float32) * (vs * pv_scale))
        pv = functools.reduce(jnp.add, outs)
        denom = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, q0:q0 + rows, :] = (pv / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("config", "scale", "interpret", "out_dtype", "pv_mode"),
)
def flash_attention_int8(
    q_q: QuantizedTensor,         # int8 [B, H, Lq, d] + per-Lq-block scales
    k_q: QuantizedTensor,         # int8 [B, H, Lkv, d]
    v_q: QuantizedTensor,
    config: TileConfig = TileConfig(block_q=512, block_kv=512),
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    out_dtype=jnp.bfloat16,
    pv_mode: str = "bf16",        # "bf16" (accurate) | "int8" (fastest)
) -> jax.Array:
    """Fully-int8 fused attention forward (serving speed mode).

    Both matmuls run int8 on the MXU; requires the whole KV to be
    VMEM-resident (Lkv <= ~4096 at d=128).  Scale blocks: q block must
    equal config.block_q; k/v blocks must match each other."""
    b, h, lq, d = q_q.values.shape
    lkv = k_q.values.shape[2]
    if k_q.block != v_q.block:
        raise ValueError("K and V quant blocks must match")
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    block_q = min(config.block_q, max(lq, 8))
    if q_q.block != block_q:
        raise ValueError(
            f"q quant block {q_q.block} must equal block_q {block_q}"
        )
    kv_block = k_q.block
    n_bh = b * h
    n_q = cdiv(lq, block_q)
    n_kv = cdiv(lkv, kv_block)

    qf = q_q.values.reshape(n_bh, lq, d)
    kf = k_q.values.reshape(n_bh, lkv, d)
    vf = v_q.values.reshape(n_bh, lkv, d)

    kernel = functools.partial(
        _int8_kernel,
        scale=scale,
        q_chunk=min(256, block_q),
        block_q=block_q,
        n_q=n_q,
        n_kv=n_kv,
        kv_block=kv_block,
        seq_len_kv=lkv,
        pv_mode=pv_mode,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_bh, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, lkv, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, lkv, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, lq, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_resolve_interpret(interpret),
    )(
        qf, kf, vf,
        q_q.scales.reshape(-1), k_q.scales.reshape(-1),
        v_q.scales.reshape(-1),
    )
    return out.reshape(b, h, lq, d)
