"""Fused V1 attention with quantized K/V and in-kernel fused dequant.

The serving-relevant quantized path (BASELINE.json: "FP8/INT8 QKV ... so
dequant is fused into the Q@K^T and P@V tile matmuls"): Q stays bf16, K and
V arrive as INT8 or FP8 values plus per-KV-block f32 scales
(ops/quant.py:QuantizedTensor).  Dequantization never materializes in HBM:

- K tile: int8/fp8 -> bf16 cast in VMEM (exact — both fit bf16's mantissa
  for their representable range), and the block's k_scale folds into the
  existing softmax-scale scalar multiply:  S = (Q K_q^T) * (scale * k_s);
- V tile: cast in VMEM, and v_scale folds into the accumulator update:
  O_acc = O_acc * alpha + (P V_q) * v_s.

So the quantized kernel performs the *same number of passes* as the bf16
kernel — the scales ride along on multiplies that already exist.  This is
the "scales must fold into the accumulator, not the int operands" rule from
SURVEY §7 hard-parts.

Scale granularity contract: one scale per ``block_kv`` rows, i.e. the
QuantizedTensor's block must equal the kernel's block_kv (asserted).
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
    ONEPASS_Q_CHUNK,
    STATS_LANES,
    _resolve_interpret,
    cap_onepass_block_q,
    fits_onepass,
)
from exploring_flash_attention_tpu.ops.quant import QuantizedTensor


def _kvquant_kernel(
    q_ref, k_ref, v_ref,          # (1, BQ, d) bf16, (1, BK, d) int8/fp8 x2
    k_scale_ref, v_scale_ref,     # SMEM, full [n_bh * n_kv] f32 (unblocked:
                                  # TPU SMEM blocks must keep native tiling,
                                  # so scales are indexed by program id)
    o_ref,
    acc_ref, m_ref, l_ref,
    *,
    scale: float,
    block_q: int,
    block_kv: int,
    seq_len_kv: int,
    compute_dtype,
):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)
    scale_idx = pl.program_id(0) * n_kv + kv_idx

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0].astype(compute_dtype)       # exact int8/fp8 -> bf16 cast
    k_s = k_scale_ref[scale_idx]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s *= scale * k_s                          # fused dequant of K

    needs_kv_mask = seq_len_kv % block_kv != 0
    if needs_kv_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
        col = col + kv_idx * block_kv
        s = jnp.where(col < seq_len_kv, s, NEG_INF)

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.where(jnp.isneginf(m_new), 0.0, jnp.exp(m_prev - m_new))
    p = jnp.exp(s - m_new[:, :1])
    if needs_kv_mask:
        p = jnp.where(jnp.isneginf(s), 0.0, p)
    m_ref[...] = m_new
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)

    v = v_ref[0].astype(compute_dtype)
    if needs_kv_mask:
        vrow = jax.lax.broadcasted_iota(jnp.int32, (block_kv, 1), 0)
        vrow = vrow + kv_idx * block_kv
        v = jnp.where(vrow < seq_len_kv, v, jnp.zeros_like(v))
    pv = jax.lax.dot_general(
        p.astype(compute_dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    v_s = v_scale_ref[scale_idx]
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv * v_s   # fused dequant of V

    @pl.when(kv_idx == n_kv - 1)
    def _finalize():
        l = l_ref[:, :1]
        o_ref[0] = (
            acc_ref[...] / jnp.where(l == 0.0, 1.0, l)
        ).astype(o_ref.dtype)


def _kvquant_onepass_kernel(
    q_ref, k_ref, v_ref,          # (1, BQ, d) bf16, (1, Lkv, d) int8/fp8 x2
    ks_ref, vs_ref,               # SMEM flat [n_bh * n_kv] f32 scales
    o_ref,                        # (1, BQ, d)
    *,
    scale: float,
    q_chunk: int,
    block_q: int,
    n_kv: int,
    kv_block: int,
    seq_len_kv: int,
    compute_dtype,
):
    """One-pass quantized-KV forward: the whole int8/fp8 KV is
    VMEM-resident (half the bytes of bf16), dequantized by casting once
    per program; K scales fold into the per-block exp2 multiply and V
    scales into the per-block output sums (same zero-extra-pass scale
    placement as the streaming kernel)."""
    bh = pl.program_id(0)
    k = k_ref[0].astype(compute_dtype)
    v = v_ref[0].astype(compute_dtype)

    for q0 in range(0, block_q, q_chunk):
        rows = min(q_chunk, block_q - q0)
        q = q_ref[0, q0:q0 + rows, :]
        pieces = []
        for kb in range(n_kv):
            k0 = kb * kv_block
            cols = min(kv_block, seq_len_kv - k0)
            s_kb = jax.lax.dot_general(
                q, k[k0:k0 + cols, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cc = ks_ref[bh * n_kv + kb] * (scale * LOG2E)
            pieces.append(s_kb * cc)                    # fused K dequant
        s = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]

        m = jnp.max(s, axis=1, keepdims=True)
        arg = jnp.where(jnp.isneginf(m), NEG_INF, s - m)
        # compute-dtype p feeds BOTH the PV matmuls and the denominator,
        # summed after them (headline kernel's measured ordering, ~2%;
        # scripts/proto_onepass10.py)
        p_lp = jnp.exp2(arg).astype(compute_dtype)
        outs = []
        for kb in range(n_kv):
            k0 = kb * kv_block
            cols = min(kv_block, seq_len_kv - k0)
            pv = jax.lax.dot_general(
                p_lp[:, k0:k0 + cols], v[k0:k0 + cols, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(pv * vs_ref[bh * n_kv + kb])    # fused V dequant
        pv = functools.reduce(lambda a, b: a + b, outs)
        l = jnp.sum(p_lp.astype(jnp.float32), axis=1, keepdims=True)
        denom = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, q0:q0 + rows, :] = (pv / denom).astype(o_ref.dtype)

@functools.partial(
    jax.jit,
    static_argnames=("config", "scale", "interpret", "out_dtype"),
)
def flash_attention_kvquant(
    q: jax.Array,                 # [B, H, Lq, d] bf16/f32
    k_q: QuantizedTensor,         # int8 or fp8 values + per-block scales
    v_q: QuantizedTensor,
    config: TileConfig = TileConfig(),
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    out_dtype=None,
) -> jax.Array:
    """Fused attention over a quantized KV (the quantized KV-cache read path)."""
    from exploring_flash_attention_tpu.ops.quant import warn_if_fp8_slow

    warn_if_fp8_slow(k_q.values.dtype)
    b, h, lq, d = q.shape
    lkv = k_q.values.shape[2]
    if k_q.block != v_q.block:
        raise ValueError("K and V quant blocks must match")
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    out_dtype = out_dtype or q.dtype
    compute_dtype = q.dtype if q.dtype != jnp.float32 else jnp.float32

    block_q = min(config.block_q, max(lq, 8))
    block_kv = k_q.block
    n_bh = b * h
    n_q = cdiv(lq, block_q)
    n_kv = cdiv(lkv, block_kv)
    if k_q.scales.shape[2] != n_kv:
        raise ValueError(
            f"scale blocks {k_q.scales.shape[2]} != n_kv_blocks {n_kv}"
        )

    qf = q.reshape(n_bh, lq, d)
    kf = k_q.values.reshape(n_bh, lkv, d)
    vf = v_q.values.reshape(n_bh, lkv, d)
    ks = k_q.scales.reshape(n_bh, n_kv)
    vs = v_q.scales.reshape(n_bh, n_kv)

    # One-pass fast path: the quantized KV is half the bytes of bf16, so
    # VMEM residency reaches 2x the sequence length of the bf16 kernel.
    if fits_onepass(lkv, d) and config.one_pass is not False:
        op_block_q = min(1024, max(lq, 8)) if lq <= 1024 or lq % 1024 == 0 \
            else block_q
        op_block_q = cap_onepass_block_q(op_block_q, lkv)
        op_kernel = functools.partial(
            _kvquant_onepass_kernel,
            scale=scale,
            q_chunk=min(ONEPASS_Q_CHUNK, op_block_q),
            block_q=op_block_q,
            n_kv=n_kv,
            kv_block=block_kv,
            seq_len_kv=lkv,
            compute_dtype=compute_dtype,
        )
        out = pl.pallas_call(
            op_kernel,
            grid=(n_bh, cdiv(lq, op_block_q)),
            in_specs=[
                pl.BlockSpec((1, op_block_q, d), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec((1, lkv, d), lambda bh, qi: (bh, 0, 0)),
                pl.BlockSpec((1, lkv, d), lambda bh, qi: (bh, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, op_block_q, d), lambda bh, qi: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((n_bh, lq, d), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=_resolve_interpret(interpret),
        )(qf, kf, vf, ks.reshape(-1), vs.reshape(-1))
        return out.reshape(b, h, lq, d)

    kernel = functools.partial(
        _kvquant_kernel,
        scale=scale,
        block_q=block_q,
        block_kv=block_kv,
        seq_len_kv=lkv,
        compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_bh, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, lq, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, STATS_LANES), jnp.float32),
            pltpu.VMEM((block_q, STATS_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_resolve_interpret(interpret),
    )(qf, kf, vf, ks.reshape(-1), vs.reshape(-1))
    return out.reshape(b, h, lq, d)
