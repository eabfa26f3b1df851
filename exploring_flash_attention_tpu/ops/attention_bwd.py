"""Tiled Pallas backward kernels for flash attention (dQ and dK/dV).

The reference repo has no backward pass (SURVEY §0: "no backward pass"), so
this is a framework extension modeled on the standard flash-attention
gradient, decomposed the TPU way as two kernels with opposite iteration
orders (the pattern of JAX's production flash kernels — see
pallas_guide/boom notes on separate dKV and dQ kernels):

- ``dkv`` kernel: grid ``(B*H, n_kv, n_q)`` — each program owns one KV tile
  and accumulates ``dK``/``dV`` over the sequential Q-tile axis in VMEM f32
  scratch;
- ``dq`` kernel: grid ``(B*H, n_q, n_kv)`` — each program owns one Q tile
  and accumulates ``dQ`` over the sequential KV-tile axis.

Both recompute the probability tile from (q, k, lse) — never materializing
the [Lq, Lkv] score matrix in HBM:

    p  = exp(s*scale - lse)          (lse = m + log l from the forward)
    dV = p^T dO
    dP = dO V^T
    dS = p * (dP - delta) * scale,   delta = rowsum(dO * O)  (precomputed)
    dQ = dS K ;  dK = dS^T Q

Matmuls run on the MXU with f32 accumulation; p/dS are cast to the storage
dtype for the MXU (same mixed-precision policy as the forward kernels).
Causal masking supports traced global shard offsets (positions), which is
what sequence-parallel training needs.
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
    NEG_INF,
    _resolve_interpret,
    dot_precision,
    fits_onepass,
)

LOG2E = math.log2(math.e)


def _recompute_p(
    q, k, lse_row,               # (BQ, d), (BK, d), (BQ, 1) f32
    *,
    scale: float,
    causal: bool,
    q_start, kv_start,           # LOCAL element offsets of tile row/col 0
    q_pos0, kv_pos0,             # global positions of shard row/col 0
    window=None,                 # sliding-window width (causal only)
    block_q: int,
    block_kv: int,
    seq_len_q: int,
    seq_len_kv: int,
    needs_q_mask: bool,
    needs_kv_mask: bool,
):
    """Probability tile p = exp(s*scale - lse) recomputed from residuals."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=dot_precision(q, k),
    )
    mask = None
    if needs_kv_mask or needs_q_mask or causal:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
        col = col + kv_start
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
        if needs_kv_mask:
            # ragged masks are in LOCAL coordinates
            mask = col < seq_len_kv
        if needs_q_mask:
            # pad Q rows must not pollute the dK/dV accumulation
            qmask = (row + q_start) < seq_len_q
            mask = qmask if mask is None else jnp.logical_and(mask, qmask)
        if causal:
            cmask = (col + kv_pos0) <= (row + q_start + q_pos0)
            if window is not None:
                cmask = jnp.logical_and(
                    cmask,
                    (col + kv_pos0)
                    >= (row + q_start + q_pos0) - window + 1,
                )
            mask = cmask if mask is None else jnp.logical_and(mask, cmask)
    # p = exp2(s * (scale*log2e) - lse*log2e); guard fully-masked rows
    # (lse == -inf would otherwise make the argument +inf -> p = inf)
    arg = s * (scale * LOG2E) - lse_row * LOG2E
    if mask is not None:
        arg = jnp.where(mask, arg, NEG_INF)
    arg = jnp.where(jnp.isneginf(lse_row), NEG_INF, arg)
    p = jnp.exp2(arg)
    return p, mask


def _zero_pad_rows(x, limit: int, block: int, start):
    """Zero rows past ``limit``: padded block rows hold undefined values
    (NaN under interpret) and 0*NaN would poison the MXU accumulations."""
    if limit % block == 0:
        return x
    row = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0) + start
    return jnp.where(row < limit, x, jnp.zeros_like(x))


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref,   # (1,BQ,d), (1,BK,d), (1,BK,d), (1,BQ,d)
    lse_ref, delta_ref,            # (1, 8, BQ) f32 each (8-sublane padded)
    offs_ref,                      # SMEM (1, 2) int32: (q_pos0, kv_pos0)
    dk_ref, dv_ref,                # out blocks (1, BK, d)
    dk_acc, dv_acc,                # scratch (BK, d) f32
    *,
    scale: float,
    block_q: int,
    block_kv: int,
    seq_len_q: int,
    seq_len_kv: int,
    causal: bool,
    out_dtype,
    window=None,
):
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_start = qi * block_q
    kv_start = pl.program_id(1) * block_kv
    # causal tile-skip: (q tile, kv tile) pairs strictly above the diagonal
    # contribute nothing to dK/dV — skip all four matmuls
    if causal:
        visible = (kv_start + offs_ref[0, 1]
                   <= q_start + block_q - 1 + offs_ref[0, 0])
        if window is not None:
            # tiles entirely LEFT of the band contribute nothing either
            visible = jnp.logical_and(
                visible,
                kv_start + block_kv - 1 + offs_ref[0, 1]
                >= q_start + offs_ref[0, 0] - window + 1,
            )
    else:
        visible = True

    @pl.when(visible)
    def _visible_tile():
        q = _zero_pad_rows(q_ref[0], seq_len_q, block_q, q_start)
        k = _zero_pad_rows(k_ref[0], seq_len_kv, block_kv, kv_start)
        v = _zero_pad_rows(v_ref[0], seq_len_kv, block_kv, kv_start)
        do = _zero_pad_rows(do_ref[0], seq_len_q, block_q, q_start)
        lse_row = lse_ref[0, 0, :][:, None]            # (BQ, 1)
        delta_row = delta_ref[0, 0, :][:, None]        # (BQ, 1)

        p, mask = _recompute_p(
            q, k, lse_row, scale=scale, causal=causal,
            q_start=q_start,
            kv_start=kv_start,
            q_pos0=offs_ref[0, 0], kv_pos0=offs_ref[0, 1],
            window=window,
            block_q=block_q, block_kv=block_kv,
            seq_len_q=seq_len_q, seq_len_kv=seq_len_kv,
            needs_q_mask=seq_len_q % block_q != 0,
            needs_kv_mask=seq_len_kv % block_kv != 0,
        )                                              # (BQ, BK) f32

        p_lp = p.astype(q.dtype)
        # dV += P^T dO
        dv_acc[...] += jax.lax.dot_general(
            p_lp, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dot_precision(do),
        )
        # dP = dO V^T
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(do, v),
        )
        # mask ds: pad lse/delta rows are garbage (possibly NaN), and masked
        # p entries are exact zeros that 0*NaN would otherwise resurrect
        ds = p * (dp - delta_row) * scale
        ds = jnp.where(jnp.isneginf(lse_row), 0.0, ds)
        if mask is not None:
            ds = jnp.where(mask, ds, 0.0)
        ds = ds.astype(q.dtype)
        # dK += dS^T Q
        dk_acc[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dot_precision(q),
        )

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_acc[...].astype(out_dtype)
        dv_ref[0] = dv_acc[...].astype(out_dtype)


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref,
    lse_ref, delta_ref,
    offs_ref,
    dq_ref,                        # out block (1, BQ, d)
    dq_acc,                        # scratch (BQ, d) f32
    *,
    scale: float,
    block_q: int,
    block_kv: int,
    seq_len_q: int,
    seq_len_kv: int,
    causal: bool,
    out_dtype,
    window=None,
):
    ki = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q_start = pl.program_id(1) * block_q
    kv_start = ki * block_kv
    if causal:
        visible = (kv_start + offs_ref[0, 1]
                   <= q_start + block_q - 1 + offs_ref[0, 0])
        if window is not None:
            visible = jnp.logical_and(
                visible,
                kv_start + block_kv - 1 + offs_ref[0, 1]
                >= q_start + offs_ref[0, 0] - window + 1,
            )
    else:
        visible = True

    @pl.when(visible)
    def _visible_tile():
        q = _zero_pad_rows(q_ref[0], seq_len_q, block_q, q_start)
        k = _zero_pad_rows(k_ref[0], seq_len_kv, block_kv, kv_start)
        v = _zero_pad_rows(v_ref[0], seq_len_kv, block_kv, kv_start)
        do = _zero_pad_rows(do_ref[0], seq_len_q, block_q, q_start)
        lse_row = lse_ref[0, 0, :][:, None]
        delta_row = delta_ref[0, 0, :][:, None]
        p, mask = _recompute_p(
            q, k, lse_row, scale=scale, causal=causal,
            q_start=q_start,
            kv_start=kv_start,
            q_pos0=offs_ref[0, 0], kv_pos0=offs_ref[0, 1],
            window=window,
            block_q=block_q, block_kv=block_kv,
            seq_len_q=seq_len_q, seq_len_kv=seq_len_kv,
            needs_q_mask=seq_len_q % block_q != 0,
            needs_kv_mask=seq_len_kv % block_kv != 0,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(do, v),
        )
        ds = p * (dp - delta_row) * scale
        ds = jnp.where(jnp.isneginf(lse_row), 0.0, ds)
        if mask is not None:
            ds = jnp.where(mask, ds, 0.0)
        ds = ds.astype(q.dtype)
        dq_acc[...] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dot_precision(k),
        )

    @pl.when(ki == n_kv - 1)
    def _finalize():
        dq_ref[0] = dq_acc[...].astype(out_dtype)


def _dkv_onepass_kernel(
    q_ref, k_ref, v_ref, do_ref,   # (1,Lq,d), (1,BK,d), (1,BK,d), (1,Lq,d)
    lse_ref, delta_ref,            # (1, 8, Lq) f32
    offs_ref,                      # SMEM (1, 2) int32
    dk_ref, dv_ref,                # out blocks (1, BK, d)
    dk_acc, dv_acc,                # scratch (BK, d) f32
    *,
    scale: float,
    q_strip: int,
    block_kv: int,
    seq_len_q: int,
    seq_len_kv: int,
    causal: bool,
    out_dtype,
    window=None,
):
    """One-pass dK/dV: the whole Q/dO sequence is VMEM-resident, processed
    in strips — no per-Q-tile grid steps, Q/dO read from HBM once per KV
    tile instead of once per (KV, Q) pair, and strip t+1's matmuls overlap
    strip t's VPU work (the bwd analog of the one-pass forward)."""
    kv_start = pl.program_id(1) * block_kv
    k = _zero_pad_rows(k_ref[0], seq_len_kv, block_kv, kv_start)
    v = _zero_pad_rows(v_ref[0], seq_len_kv, block_kv, kv_start)
    c = scale * LOG2E

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    for q0 in range(0, seq_len_q, q_strip):
        rows = min(q_strip, seq_len_q - q0)
        if causal:
            # strip contributes iff any (row, col) pair is visible
            visible = (kv_start + offs_ref[0, 1]) <= (
                q0 + rows - 1 + offs_ref[0, 0]
            )
            if window is not None:
                visible = jnp.logical_and(
                    visible,
                    kv_start + block_kv - 1 + offs_ref[0, 1]
                    >= q0 + offs_ref[0, 0] - window + 1,
                )
        else:
            visible = True

        @pl.when(visible)
        def _strip(q0=q0, rows=rows):
            q = q_ref[0, q0:q0 + rows, :]
            do = do_ref[0, q0:q0 + rows, :]
            lse_row = lse_ref[0, 0, q0:q0 + rows][:, None]
            delta_row = delta_ref[0, 0, q0:q0 + rows][:, None]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(q, k),
            )
            arg = s * c - lse_row * LOG2E
            if causal:
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, block_kv), 0)
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, block_kv), 1)
                mask = (col + kv_start + offs_ref[0, 1]) <= (
                    row + q0 + offs_ref[0, 0])
                if window is not None:
                    mask = jnp.logical_and(
                        mask,
                        (col + kv_start + offs_ref[0, 1])
                        >= (row + q0 + offs_ref[0, 0]) - window + 1,
                    )
                arg = jnp.where(mask, arg, NEG_INF)
            arg = jnp.where(jnp.isneginf(lse_row), NEG_INF, arg)
            p = jnp.exp2(arg)

            p_lp = p.astype(q.dtype)
            dv_acc[...] += jax.lax.dot_general(
                p_lp, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(do),
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(do, v),
            )
            ds = (p * (dp - delta_row) * scale).astype(q.dtype)
            dk_acc[...] += jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(q),
            )

    dk_ref[0] = dk_acc[...].astype(out_dtype)
    dv_ref[0] = dv_acc[...].astype(out_dtype)


def _dq_onepass_kernel(
    q_ref, k_ref, v_ref, do_ref,   # (1,BQ,d), (1,Lkv,d), (1,Lkv,d), (1,BQ,d)
    lse_ref, delta_ref,            # (1, 8, BQ) f32
    offs_ref,
    dq_ref,                        # out (1, BQ, d)
    dq_acc,                        # scratch (BQ, d) f32
    *,
    scale: float,
    kv_strip: int,
    block_q: int,
    seq_len_q: int,
    seq_len_kv: int,
    causal: bool,
    out_dtype,
    window=None,
):
    """One-pass dQ: the whole K/V sequence is VMEM-resident, processed in
    strips with the Q tile's (lse, delta) loaded once."""
    q_start = pl.program_id(1) * block_q
    q = _zero_pad_rows(q_ref[0], seq_len_q, block_q, q_start)
    do = _zero_pad_rows(do_ref[0], seq_len_q, block_q, q_start)
    lse_row = lse_ref[0, 0, :][:, None]
    delta_row = delta_ref[0, 0, :][:, None]
    c = scale * LOG2E

    dq_acc[...] = jnp.zeros_like(dq_acc)

    for k0 in range(0, seq_len_kv, kv_strip):
        cols = min(kv_strip, seq_len_kv - k0)
        if causal:
            visible = (k0 + offs_ref[0, 1]) <= (
                q_start + block_q - 1 + offs_ref[0, 0]
            )
            if window is not None:
                visible = jnp.logical_and(
                    visible,
                    k0 + cols - 1 + offs_ref[0, 1]
                    >= q_start + offs_ref[0, 0] - window + 1,
                )
        else:
            visible = True

        @pl.when(visible)
        def _strip(k0=k0, cols=cols):
            k = k_ref[0, k0:k0 + cols, :]
            v = v_ref[0, k0:k0 + cols, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(q, k),
            )
            arg = s * c - lse_row * LOG2E
            if causal:
                row = jax.lax.broadcasted_iota(jnp.int32, (block_q, cols), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (block_q, cols), 1)
                mask = (col + k0 + offs_ref[0, 1]) <= (
                    row + q_start + offs_ref[0, 0])
                if window is not None:
                    mask = jnp.logical_and(
                        mask,
                        (col + k0 + offs_ref[0, 1])
                        >= (row + q_start + offs_ref[0, 0]) - window + 1,
                    )
                arg = jnp.where(mask, arg, NEG_INF)
            arg = jnp.where(jnp.isneginf(lse_row), NEG_INF, arg)
            p = jnp.exp2(arg)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(do, v),
            )
            ds = (p * (dp - delta_row) * scale).astype(q.dtype)
            dq_acc[...] += jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(k),
            )

    dq_ref[0] = dq_acc[...].astype(out_dtype)


def _fused_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref,   # (1, Lq, d), (1, Lkv, d) x2, (1, Lq, d)
    lse_ref, delta_ref,            # (1, 8, Lq) f32
    offs_ref,                      # SMEM (1, 2) int32
    dq_ref, dk_ref, dv_ref,        # out (1, Lq, d), (1, Lkv, d) x2
    dq_acc, dk_acc, dv_acc,        # scratch f32 full-size
    *,
    scale: float,
    q_strip: int,
    kv_strip: int,
    seq_len_q: int,
    seq_len_kv: int,
    causal: bool,
    q_dtype,
    k_dtype,
    v_dtype,
    static_positions=None,
    window=None,
):
    """Fused one-pass backward: one program per (b, h) with Q/K/V/dO fully
    VMEM-resident computes dQ, dK and dV together, sharing the S and dP
    recomputation between them — 5 tile matmuls per (q-strip, kv-strip)
    pair instead of the 7 of the split dQ/dKV kernels.

    ``static_positions``: compile-time (q_pos0, kv_pos0) — the common
    training case.  Enables trace-time causal pruning: pairs strictly above
    the diagonal are not emitted at all, pairs strictly below skip the mask
    computation, and the empty-row lse guard drops when every row provably
    has a visible column.  Traced positions (SMEM offs) fall back to
    runtime ``pl.when`` gating + per-pair masks."""
    c = scale * LOG2E
    static = static_positions is not None
    if static:
        q_pos0, kv_pos0 = static_positions
    else:
        q_pos0 = offs_ref[0, 0]
        kv_pos0 = offs_ref[0, 1]
    # every q row sees >= 1 column (lse finite) iff row 0's position is >=
    # the first kv position — provable only with static offsets
    guard_empty_rows = causal and not (static and q_pos0 >= kv_pos0)

    dq_acc[...] = jnp.zeros_like(dq_acc)
    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    for k0 in range(0, seq_len_kv, kv_strip):
        cols = min(kv_strip, seq_len_kv - k0)
        k = k_ref[0, k0:k0 + cols, :]
        v = v_ref[0, k0:k0 + cols, :]
        for q0 in range(0, seq_len_q, q_strip):
            rows = min(q_strip, seq_len_q - q0)
            if causal:
                visible = (k0 + kv_pos0) <= (q0 + rows - 1 + q_pos0)
                if window is not None:
                    in_band = ((k0 + cols - 1 + kv_pos0)
                               >= (q0 + q_pos0) - window + 1)
                    visible = (visible and in_band) if static \
                        else jnp.logical_and(visible, in_band)
                if static and not visible:
                    continue                       # pruned at trace time
                # pair strictly below the diagonal (and, with a window,
                # strictly inside its left edge) => no masking needed
                mask_free = static and (
                    (k0 + cols - 1 + kv_pos0) <= (q0 + q_pos0)
                ) and (window is None or (
                    (k0 + kv_pos0)
                    >= (q0 + rows - 1 + q_pos0) - window + 1
                ))
            else:
                visible = True
                mask_free = True

            @pl.when(True if static else visible)
            def _pair(q0=q0, rows=rows, k0=k0, cols=cols, k=k, v=v,
                      mask_free=mask_free):
                q = q_ref[0, q0:q0 + rows, :]
                do = do_ref[0, q0:q0 + rows, :]
                lse_row = lse_ref[0, 0, q0:q0 + rows][:, None]
                delta_row = delta_ref[0, 0, q0:q0 + rows][:, None]

                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(q, k),
                )
                arg = s * c - lse_row * LOG2E
                if causal and not mask_free:
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (rows, cols), 0)
                    col = jax.lax.broadcasted_iota(
                        jnp.int32, (rows, cols), 1)
                    cm = (col + k0 + kv_pos0) <= (row + q0 + q_pos0)
                    if window is not None:
                        cm = jnp.logical_and(
                            cm,
                            (col + k0 + kv_pos0)
                            >= (row + q0 + q_pos0) - window + 1,
                        )
                    arg = jnp.where(cm, arg, NEG_INF)
                if guard_empty_rows:
                    arg = jnp.where(jnp.isneginf(lse_row), NEG_INF, arg)
                p = jnp.exp2(arg)

                p_lp = p.astype(q.dtype)
                dv_acc[k0:k0 + cols, :] += jax.lax.dot_general(
                    p_lp, do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(do),
                )
                dp = jax.lax.dot_general(
                    do, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(do, v),
                )
                ds = (p * (dp - delta_row) * scale).astype(q.dtype)
                dk_acc[k0:k0 + cols, :] += jax.lax.dot_general(
                    ds, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(q),
                )
                dq_acc[q0:q0 + rows, :] += jax.lax.dot_general(
                    ds, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(k),
                )

    dq_ref[0] = dq_acc[...].astype(q_dtype)
    dk_ref[0] = dk_acc[...].astype(k_dtype)
    dv_ref[0] = dv_acc[...].astype(v_dtype)


def _pad_stats(x: jax.Array, n_bh: int, l: int) -> jax.Array:
    """[B,H,L] f32 -> (n_bh, 8, L) with the stats broadcast over a padded
    8-sublane dim (TPU (8, 128) tiling rule for 2D blocks)."""
    xf = x.reshape(n_bh, 1, l).astype(jnp.float32)
    return jnp.broadcast_to(xf, (n_bh, 8, l))


@functools.partial(
    jax.jit,
    static_argnames=("config", "causal", "scale", "interpret",
                     "static_positions", "window"),
)
def flash_attention_bwd(
    q: jax.Array,                  # [B, H, Lq, d]
    k: jax.Array,                  # [B, H, Lkv, d]
    v: jax.Array,
    out: jax.Array,                # forward output [B, H, Lq, d]
    do: jax.Array,                 # output cotangent, same shape
    lse: jax.Array,                # [B, H, Lq] f32 (includes scale)
    config: TileConfig = TileConfig(),
    scale: Optional[float] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
    positions: Optional[Tuple[jax.Array, jax.Array]] = None,
    static_positions: Optional[Tuple[int, int]] = None,
    window: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Tiled flash-attention backward: returns (dq, dk, dv).

    ``window``: sliding-window width (requires ``causal=True``); pairs
    outside the band are pruned (at trace time with static positions).

    ``static_positions``: compile-time (q_pos0, kv_pos0) — lets the fused
    kernel prune causal work at trace time.  Mutually exclusive with the
    traced ``positions``.

    GQA: ``k``/``v`` may carry fewer heads than ``q``; the kernels read
    the shared KV block per group (BlockSpec ``bh // group``) and emit
    per-q-head dK/dV partials in f32, which are summed over the group
    before returning ``[B, H_kv, L_kv, d]`` grads."""
    if positions is not None and static_positions is not None:
        raise ValueError("pass positions OR static_positions, not both")
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        if window >= k.shape[2]:
            window = None          # band covers every key: plain causal
    b, h, lq, d = q.shape
    h_kv = k.shape[1]
    lkv = k.shape[2]
    if h % h_kv != 0:
        raise ValueError(f"q heads {h} not divisible by kv heads {h_kv}")
    kv_group = h // h_kv
    # per-q-head dk/dv partials are summed over the group — keep them f32
    # so the reduction doesn't round twice
    dkv_dtype = k.dtype if kv_group == 1 else jnp.float32
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_q = min(config.block_q, max(lq, 8))
    block_kv = min(config.block_kv, max(lkv, 8))
    n_bh = b * h
    n_q = cdiv(lq, block_q)
    n_kv = cdiv(lkv, block_kv)
    interp = _resolve_interpret(interpret)

    if static_positions is not None:
        q_pos0 = jnp.int32(static_positions[0])
        kv_pos0 = jnp.int32(static_positions[1])
    elif positions is None:
        static_positions = (lkv - lq, 0)       # decode convention, static
        q_pos0 = jnp.int32(lkv - lq)
        kv_pos0 = jnp.int32(0)
    else:
        q_pos0, kv_pos0 = (jnp.asarray(p, jnp.int32) for p in positions)
    offs = jnp.stack([q_pos0, kv_pos0]).reshape(1, 2)

    qf = q.reshape(n_bh, lq, d)
    kf = k.reshape(b * h_kv, lkv, d)
    vf = v.reshape(b * h_kv, lkv, d)
    dof = do.reshape(n_bh, lq, d).astype(q.dtype)

    def fold_kv_grads(dk, dv):
        # per-q-head partials [n_bh, lkv, d] -> grouped sum [B, H_kv, ...]
        dk = dk.reshape(b, h_kv, kv_group, lkv, d)
        dv = dv.reshape(b, h_kv, kv_group, lkv, d)
        if kv_group > 1:
            return dk.sum(axis=2).astype(k.dtype), dv.sum(axis=2).astype(v.dtype)
        return dk[:, :, 0], dv[:, :, 0]
    lsef = _pad_stats(lse, n_bh, lq)
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )                                              # [B, H, Lq]
    deltaf = _pad_stats(delta, n_bh, lq)

    # ---- fused fast path: everything (incl. f32 grads) VMEM-resident ----
    # VMEM budget ~ 4 inputs (bf16) + 3 f32 accumulators + 3 outputs; cap
    # at half the one-pass forward budget.
    if (fits_onepass(2 * lq, d) and fits_onepass(2 * lkv, d)
            and lq % 8 == 0 and lkv % 8 == 0):
        fused_kernel = functools.partial(
            _fused_bwd_kernel,
            scale=scale,
            # 512-row strips measured best for the fused bwd (the forward's
            # 256-row optimum does not transfer: 5 matmuls per pair amortize
            # more VPU work per strip; scripts/ab_bwd_strips.py)
            q_strip=min(config.q_chunk or 512, lq),
            kv_strip=min(config.block_kv, lkv),
            seq_len_q=lq, seq_len_kv=lkv, causal=causal,
            q_dtype=q.dtype, k_dtype=dkv_dtype, v_dtype=dkv_dtype,
            static_positions=static_positions,
            window=window,
        )
        dq, dk, dv = pl.pallas_call(
            fused_kernel,
            grid=(n_bh,),
            in_specs=[
                pl.BlockSpec((1, lq, d), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, lkv, d), lambda bh: (bh // kv_group, 0, 0)),
                pl.BlockSpec((1, lkv, d), lambda bh: (bh // kv_group, 0, 0)),
                pl.BlockSpec((1, lq, d), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, 8, lq), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, 8, lq), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, 2), lambda bh: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, lq, d), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, lkv, d), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, lkv, d), lambda bh: (bh, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_bh, lq, d), q.dtype),
                jax.ShapeDtypeStruct((n_bh, lkv, d), dkv_dtype),
                jax.ShapeDtypeStruct((n_bh, lkv, d), dkv_dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((lq, d), jnp.float32),
                pltpu.VMEM((lkv, d), jnp.float32),
                pltpu.VMEM((lkv, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=interp,
        )(qf, kf, vf, dof, lsef, deltaf, offs)
        dk, dv = fold_kv_grads(dk, dv)
        return (dq.reshape(b, h, lq, d), dk, dv)

    # ---- one-pass fast path: whole sequences VMEM-resident ----
    if fits_onepass(lq, d) and fits_onepass(lkv, d):
        dkv_kernel = functools.partial(
            _dkv_onepass_kernel,
            scale=scale, q_strip=min(256, max(lq, 8)), block_kv=block_kv,
            seq_len_q=lq, seq_len_kv=lkv, causal=causal, out_dtype=dkv_dtype,
            window=window,
        )
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid=(n_bh, n_kv),
            in_specs=[
                pl.BlockSpec((1, lq, d), lambda bh, ki: (bh, 0, 0)),
                pl.BlockSpec((1, block_kv, d),
                             lambda bh, ki: (bh // kv_group, ki, 0)),
                pl.BlockSpec((1, block_kv, d),
                             lambda bh, ki: (bh // kv_group, ki, 0)),
                pl.BlockSpec((1, lq, d), lambda bh, ki: (bh, 0, 0)),
                pl.BlockSpec((1, 8, lq), lambda bh, ki: (bh, 0, 0)),
                pl.BlockSpec((1, 8, lq), lambda bh, ki: (bh, 0, 0)),
                pl.BlockSpec((1, 2), lambda bh, ki: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_kv, d), lambda bh, ki: (bh, ki, 0)),
                pl.BlockSpec((1, block_kv, d), lambda bh, ki: (bh, ki, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_bh, lkv, d), dkv_dtype),
                jax.ShapeDtypeStruct((n_bh, lkv, d), dkv_dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_kv, d), jnp.float32),
                pltpu.VMEM((block_kv, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interp,
        )(qf, kf, vf, dof, lsef, deltaf, offs)

        dq_kernel = functools.partial(
            _dq_onepass_kernel,
            scale=scale, kv_strip=min(512, max(lkv, 8)), block_q=block_q,
            seq_len_q=lq, seq_len_kv=lkv, causal=causal, out_dtype=q.dtype,
            window=window,
        )
        dq = pl.pallas_call(
            dq_kernel,
            grid=(n_bh, n_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec((1, lkv, d),
                             lambda bh, qi: (bh // kv_group, 0, 0)),
                pl.BlockSpec((1, lkv, d),
                             lambda bh, qi: (bh // kv_group, 0, 0)),
                pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec((1, 8, block_q), lambda bh, qi: (bh, 0, qi)),
                pl.BlockSpec((1, 8, block_q), lambda bh, qi: (bh, 0, qi)),
                pl.BlockSpec((1, 2), lambda bh, qi: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((n_bh, lq, d), q.dtype),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interp,
        )(qf, kf, vf, dof, lsef, deltaf, offs)
        dk, dv = fold_kv_grads(dk, dv)
        return (dq.reshape(b, h, lq, d), dk, dv)

    stats_spec_q = pl.BlockSpec((1, 8, block_q), lambda bh, i, j: (bh, 0, i))
    offs_spec = pl.BlockSpec(
        (1, 2), lambda bh, i, j: (0, 0), memory_space=pltpu.SMEM
    )

    # Causal dead-pair fetch clamps (possible only at static positions):
    # pairs the kernels skip via pl.when would otherwise still stream
    # their Q/dO (dkv grid) or K/V (dq grid) blocks from HBM — a repeated
    # block index elides the fetch, ~2x HBM traffic saved for causal
    # long-context training (the tiled fallback is the L > one-pass-budget
    # tier).  Mirrors the forward kernel's kv_block_index clamp.
    if causal and static_positions is not None:
        sp_q0, sp_kv0 = static_positions


        def _dkv_qi_eff(ki, qi):
            qmin = (ki * block_kv + sp_kv0 - sp_q0) // block_q
            qi_eff = jnp.maximum(qi, jnp.clip(qmin, 0, n_q - 1))
            if window is not None:
                # last q block inside the band for kv tile ki
                qmax = (ki * block_kv + block_kv - 1 + sp_kv0 - sp_q0
                        + window - 1) // block_q
                qi_eff = jnp.minimum(qi_eff, jnp.clip(qmax, 0, n_q - 1))
            return qi_eff

        def dkv_q_index(bh, ki, qi):
            # first (and, with a window, last) q block visible from kv
            # tile ki: ceil((ki*BK + kv0 - q0 - BQ + 1) / BQ) simplifies
            return (bh, _dkv_qi_eff(ki, qi), 0)

        def dkv_stats_index(bh, ki, qi):
            return (bh, 0, _dkv_qi_eff(ki, qi))

        def dq_kv_index(bh, qi, ki):
            # last (and, with a window, first) kv tile visible from q
            # block qi
            kmax = (qi * block_q + block_q - 1 + sp_q0 - sp_kv0) // block_kv
            ki_eff = jnp.minimum(ki, jnp.clip(kmax, 0, n_kv - 1))
            if window is not None:
                kmin = (qi * block_q + sp_q0 - sp_kv0
                        - window + 1) // block_kv
                ki_eff = jnp.maximum(ki_eff, jnp.clip(kmin, 0, n_kv - 1))
            return (bh // kv_group, ki_eff, 0)
    else:
        def dkv_q_index(bh, ki, qi):
            return (bh, qi, 0)

        def dkv_stats_index(bh, ki, qi):
            return (bh, 0, qi)

        def dq_kv_index(bh, qi, ki):
            return (bh // kv_group, ki, 0)

    # ---- dK / dV ----
    dkv_kernel = functools.partial(
        _dkv_kernel,
        scale=scale, block_q=block_q, block_kv=block_kv,
        seq_len_q=lq, seq_len_kv=lkv, causal=causal, out_dtype=dkv_dtype,
        window=window,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(n_bh, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), dkv_q_index),
            pl.BlockSpec((1, block_kv, d),
                         lambda bh, ki, qi: (bh // kv_group, ki, 0)),
            pl.BlockSpec((1, block_kv, d),
                         lambda bh, ki, qi: (bh // kv_group, ki, 0)),
            pl.BlockSpec((1, block_q, d), dkv_q_index),
            pl.BlockSpec((1, 8, block_q), dkv_stats_index),
            pl.BlockSpec((1, 8, block_q), dkv_stats_index),
            pl.BlockSpec((1, 2), lambda bh, ki, qi: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, d), lambda bh, ki, qi: (bh, ki, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bh, ki, qi: (bh, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_bh, lkv, d), dkv_dtype),
            jax.ShapeDtypeStruct((n_bh, lkv, d), dkv_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(qf, kf, vf, dof, lsef, deltaf, offs)

    # ---- dQ ----
    dq_kernel = functools.partial(
        _dq_kernel,
        scale=scale, block_q=block_q, block_kv=block_kv,
        seq_len_q=lq, seq_len_kv=lkv, causal=causal, out_dtype=q.dtype,
        window=window,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(n_bh, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_kv, d), dq_kv_index),
            pl.BlockSpec((1, block_kv, d), dq_kv_index),
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            stats_spec_q,
            stats_spec_q,
            offs_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, lq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(qf, kf, vf, dof, lsef, deltaf, offs)

    dk, dv = fold_kv_grads(dk, dv)
    return (dq.reshape(b, h, lq, d), dk, dv)
