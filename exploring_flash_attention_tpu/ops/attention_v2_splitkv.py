"""Split-KV V2 flash attention — Pallas forward+combine kernel pair.

TPU-native re-design of the reference's two-kernel V2
(flash_attention_v2/CUDA/flash_attention_v2.h): parallelism over KV blocks as
well as Q blocks.  The forward kernel's grid gains a ``kv_block`` axis; each
program streams only its span of KV tiles and writes a partial result to an
HBM workspace; the combine kernel merges the partials with softmax rescaling.

Deltas vs the reference design (deliberate, per SURVEY §7):

- the workspace stores the **normalized** partial output and the
  log-sum-exp ``lse = m + log(l)`` instead of raw (m, l) + unnormalized O
  (reference flash_attention_v2.h:321-340) — more robust at low precision,
  and exactly the triple that crosses chips in ring/x-host attention;
- the workspace is an XLA-managed kernel output, not a per-call
  cudaMalloc/Free (the reference quirk flagged at SURVEY §7 end);
- the phase-1/phase-2 barrier is XLA dataflow, not cudaDeviceSynchronize;
- no separate WMMA variant: both matmuls are MXU ops, tuning is block sizes.

The partial/combine halves are exported separately
(:func:`flash_attention_splitkv_partial`, :func:`splitkv_combine`) because a
partial+LSE forward is the building block of decode (flash-decoding style
split over a long KV cache) and of cross-chip attention
(parallel/splitkv_xhost.py, parallel/ring.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.configs import SplitKVConfig, cdiv
from exploring_flash_attention_tpu.ops.attention_v1 import (
    LOG2E,
    NEG_INF,
    ONEPASS_Q_CHUNK,
    STATS_LANES,
    _resolve_interpret,
    cap_onepass_block_q,
    dot_precision,
    fits_onepass,
)


def _onepass_partial_kernel(
    *refs,
    scale: float,
    q_chunk: int,
    kv_chunk: int,
    block_q: int,
    kv_span: int,
    seq_len_q: int,
    seq_len_kv: int,
    causal: bool,
    has_offsets: bool,
    static_positions=None,
    multi_span: bool = False,
):
    """Single-pass partial-attention forward for a VMEM-resident KV span:
    the strip-mined one-pass softmax of attention_v1's fast path, extended
    with the LSE output and causal chunk-skip.

    Runs in two grid shapes: ``multi_span=False`` covers the whole KV in
    one span (grid ``(n_bh, n_q)``, the decode / ring building block);
    ``multi_span=True`` adds a third ``kv_block`` grid axis and computes a
    span-local softmax per block — since the BlockSpec stages the full span
    in VMEM either way, online-softmax state across tiles *within* a span
    is pure overhead, and this path replaces the streaming span kernel
    whenever the span fits the one-pass budget (measured ~2x on v5e at the
    canonical split-KV shape).

    Causal handling: with static offsets (``has_offsets=False``, the decode
    convention) and a single span, chunks strictly above a strip's diagonal
    are skipped at trace time — real FLOP savings with zero control-flow
    overhead.  Multi-span programs whose span sits entirely above the
    diagonal skip all compute under one ``pl.when`` (span_start is traced,
    so trace-time chunk skipping is unavailable); partially-visible spans
    compute fully and mask.  With traced shard offsets (ring /
    sequence-parallel) the kernel computes the full span and masks;
    whole-shard skipping belongs to the caller (parallel/ring.py wraps the
    shard in one ``lax.cond``) — measured on v5e, per-chunk ``lax.cond``
    costs more than the MXU work it saves."""
    if has_offsets:
        q_ref, k_ref, v_ref, offs_ref, o_part_ref, lse_ref = refs
        q_pos0 = offs_ref[0, 0]
        kv_pos0 = offs_ref[0, 1]
    else:
        q_ref, k_ref, v_ref, o_part_ref, lse_ref = refs
        q_pos0, kv_pos0 = (
            static_positions if static_positions is not None
            else (seq_len_kv - seq_len_q, 0)   # decode convention
        )
    c = scale * LOG2E
    q_base = pl.program_id(1) * block_q
    span_start = pl.program_id(2) * kv_span if multi_span else 0
    k = k_ref[0]
    v = v_ref[0]

    def span_body():
        # three-stage software pipeline over strips (round 5 — the dense
        # headline kernel's restructure, _v1_onepass_fold_kernel): strip
        # t+1's QK^T issues before strip t's max/exp2/PV, with the
        # denominator/store/LSE trailing one more slot, so the
        # critical-path reductions overlap MXU work.

        def _stage_a(q0, rows):
            q = q_ref[0, q0:q0 + rows, :]
            pieces = []
            for k0 in range(0, kv_span, kv_chunk):
                cols = min(kv_chunk, kv_span - k0)
                k_c = k[k0:k0 + cols, :]
                if causal and not has_offsets and not multi_span:
                    # static offsets: chunk visible iff its first column
                    # is <= the strip's last row in global coordinates —
                    # invisible chunks cost a constant fill, not a
                    # matmul.  q_base is a traced program id, so use the
                    # static worst-case (last) q block: exact when
                    # n_q == 1 (the common op_block_q == Lq case),
                    # conservative otherwise.
                    max_q_base = (cdiv(seq_len_q, block_q) - 1) * block_q
                    visible = (
                        (k0 + kv_pos0)
                        <= (max_q_base + q0 + rows - 1 + q_pos0)
                    )
                    if not visible:
                        pieces.append(
                            jnp.full((rows, cols), NEG_INF, jnp.float32)
                        )
                        continue
                pieces.append(jax.lax.dot_general(
                    q, k_c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(q, k_c),
                ))
            s = (jnp.concatenate(pieces, axis=1)
                 if len(pieces) > 1 else pieces[0])
            if causal:
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(
                    (col + span_start + kv_pos0)
                    <= (row + q_base + q0 + q_pos0),
                    s, NEG_INF,
                )
            return q0, rows, s

        def _stage_b(q0, rows, s):
            m = jnp.max(s, axis=1, keepdims=True)
            arg = jnp.where(jnp.isneginf(m), NEG_INF, s * c - m * c)
            # storage-dtype p feeds BOTH the PV matmul and the
            # denominator (summed after the matmul so the VPU reduction
            # rides under the MXU — the headline kernel's measured
            # ordering, ~2%; scripts/proto_onepass10.py)
            p = jnp.exp2(arg).astype(v.dtype)
            pv = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(v),
            )
            return q0, rows, m, p, pv

        def _stage_c(q0, rows, m, p, pv):
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            denom = jnp.where(l == 0.0, 1.0, l)
            o_part_ref[0, 0, q0:q0 + rows, :] = (pv / denom).astype(
                o_part_ref.dtype)
            lse = jnp.where(
                l[:, 0] == 0.0, NEG_INF,
                m[:, 0] * scale + jnp.log(l[:, 0])
            )
            lse_ref[0, 0, :, q0:q0 + rows] = jnp.broadcast_to(
                lse[None, :], (8, rows)
            )

        a_pend, b_pend = [], []
        for q0 in range(0, block_q, q_chunk):
            rows = min(q_chunk, block_q - q0)
            a_pend.append(_stage_a(q0, rows))
            if len(a_pend) > 1:
                b_pend.append(_stage_b(*a_pend.pop(0)))
            if len(b_pend) > 1:
                _stage_c(*b_pend.pop(0))
        for item in a_pend:
            b_pend.append(_stage_b(*item))
        for item in b_pend:
            _stage_c(*item)

    if causal and multi_span:
        # whole-span skip: a span strictly above this q block's diagonal
        # contributes nothing — emit the neutral (zeros, -inf) partial
        span_visible = (
            span_start + kv_pos0 <= q_base + block_q - 1 + q_pos0
        )

        @pl.when(jnp.logical_not(span_visible))
        def _dead_span():
            o_part_ref[...] = jnp.zeros_like(o_part_ref)
            lse_ref[...] = jnp.full_like(lse_ref, NEG_INF)

        @pl.when(span_visible)
        def _live_span():
            span_body()
    else:
        span_body()


def _splitkv_fwd_kernel(
    *refs,
    scale: float,
    block_q: int,
    block_kv: int,
    kv_span: int,
    seq_len_q: int,
    seq_len_kv: int,
    causal: bool,
    has_offsets: bool,
    static_positions=None,
):
    # refs layout:
    #   q_ref, k_ref, v_ref            (1, BQ, d), (1, SPAN, d), (1, SPAN, d)
    #   [offs_ref]                     SMEM (1, 2) int32 — global positions of
    #                                  (q row 0, kv row 0); present only when
    #                                  has_offsets (ring / sequence-parallel
    #                                  callers whose shards sit at traced
    #                                  global offsets)
    #   o_part_ref, lse_ref            (1, 1, BQ, d) f32, (1, 1, 8, BQ) f32
    #                                  (lse carries a padded 8-sublane dim to
    #                                  satisfy the TPU (8, 128) tiling rule)
    #   acc_ref, m_ref, l_ref          scratch
    if has_offsets:
        q_ref, k_ref, v_ref, offs_ref, o_part_ref, lse_ref, acc_ref, m_ref, l_ref = refs
        q_pos0 = offs_ref[0, 0]
        kv_pos0 = offs_ref[0, 1]
    else:
        q_ref, k_ref, v_ref, o_part_ref, lse_ref, acc_ref, m_ref, l_ref = refs
        q_pos0, kv_pos0 = (
            static_positions if static_positions is not None
            else (seq_len_kv - seq_len_q, 0)   # decode convention
        )
    kb = pl.program_id(2)
    q = q_ref[0]
    n_tiles = kv_span // block_kv

    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    span_start = kb * kv_span
    q_start = pl.program_id(1) * block_q     # hoisted: program_id cannot be
                                             # read inside the loop body under
                                             # interpret mode
    needs_kv_mask = seq_len_kv % block_kv != 0 or seq_len_kv % kv_span != 0

    def tile_step(t, _):
        # causal tile-skip: tiles strictly above the diagonal are dead work
        if causal:
            visible = (span_start + t * block_kv + kv_pos0
                       <= q_start + block_q - 1 + q_pos0)
        else:
            visible = True

        @pl.when(visible)
        def _visible_tile():
            _tile_body(t)
        return ()

    def _tile_body(t):
        k_t = k_ref[0, pl.ds(t * block_kv, block_kv), :]
        v_t = v_ref[0, pl.ds(t * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q, k_t),
        )
        s *= scale
        if needs_kv_mask or causal:
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            col = col + span_start + t * block_kv
            mask = None
            if needs_kv_mask:
                mask = col < seq_len_kv
            if causal:
                row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
                row = row + q_start
                cmask = (col + kv_pos0) <= (row + q_pos0)
                mask = cmask if mask is None else jnp.logical_and(mask, cmask)
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.where(
            jnp.isneginf(m_new), 0.0, jnp.exp(m_prev - m_new)
        )
        p = jnp.exp(s - m_new[:, :1])
        if needs_kv_mask or causal:
            p = jnp.where(jnp.isneginf(s), 0.0, p)
        m_ref[...] = m_new
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if needs_kv_mask:
            vrow = jax.lax.broadcasted_iota(jnp.int32, (block_kv, 1), 0)
            vrow = vrow + span_start + t * block_kv
            v_t = jnp.where(vrow < seq_len_kv, v_t, jnp.zeros_like(v_t))
        pv = jax.lax.dot_general(
            p.astype(v_t.dtype), v_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dot_precision(v_t),
        )
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

    jax.lax.fori_loop(0, n_tiles, tile_step, (), unroll=True)

    # write normalized partial + lse (zero / -inf for fully-masked rows)
    l = l_ref[:, :1]
    denom = jnp.where(l == 0.0, 1.0, l)
    o_part_ref[0, 0] = (acc_ref[...] / denom).astype(o_part_ref.dtype)
    m_final = m_ref[:, 0]
    lse = jnp.where(
        l[:, 0] == 0.0,
        NEG_INF,
        m_final + jnp.log(l[:, 0]),
    )
    lse_ref[0, 0] = jnp.broadcast_to(lse[None, :], (8, block_q))


def _combine_kernel(o_part_ref, lse_ref, o_ref, *, out_dtype):
    # blocks: (1, nkb, BQ, d) f32, (1, nkb, BQ) f32 -> (1, BQ, d)
    lse = lse_ref[0]                                  # (nkb, BQ)
    o_parts = o_part_ref[0]                           # (nkb, BQ, d)
    m_g = jnp.max(lse, axis=0, keepdims=True)         # (1, BQ)
    m_safe = jnp.where(jnp.isneginf(m_g), 0.0, m_g)
    w = jnp.exp(lse - m_safe)                         # (nkb, BQ)
    denom = jnp.sum(w, axis=0, keepdims=True)
    w = w / jnp.where(denom == 0.0, 1.0, denom)
    merged = jnp.sum(o_parts * w[..., None], axis=0)  # (BQ, d)
    o_ref[0] = merged.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("config", "causal", "scale", "interpret",
                     "workspace_dtype", "static_positions"),
)
def flash_attention_splitkv_partial(
    q: jax.Array,                 # [B, H, Lq, d]
    k: jax.Array,                 # [B, H, Lkv, d]
    v: jax.Array,
    config: SplitKVConfig = SplitKVConfig(),
    scale: Optional[float] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
    workspace_dtype=jnp.float32,
    positions: Optional[Tuple[jax.Array, jax.Array]] = None,
    static_positions: Optional[Tuple[int, int]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Phase 1: returns (o_partial [B,H,nkb,Lq,d], lse [B,H,nkb,Lq]).

    ``positions``: optional traced int32 scalars (q_pos0, kv_pos0) — the
    global sequence positions of q row 0 and kv row 0, for causal masking
    of ring / sequence-parallel shards.  Default assumes q rows are the
    final Lq positions of the KV span (decode convention).
    ``static_positions``: same as ``positions`` but compile-time ints —
    enables trace-time causal chunk skipping (real FLOP savings).

    GQA: ``k``/``v`` may carry fewer heads than ``q`` (H % H_kv == 0) —
    the group's programs share the KV block via the BlockSpec index map
    (see flash_attention_v1)."""
    if positions is not None and static_positions is not None:
        raise ValueError("pass positions OR static_positions, not both")
    b, h, lq, d = q.shape
    h_kv = k.shape[1]
    lkv = k.shape[2]
    if (k.shape != (b, h_kv, lkv, d) or v.shape != (b, h_kv, lkv, d)
            or h % h_kv != 0):
        raise ValueError(f"shape mismatch: q={q.shape} k={k.shape} v={v.shape}")
    kv_group = h // h_kv
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    block_q = min(config.block_q, max(lq, 8))
    block_kv = min(config.block_kv, max(lkv, 8))
    # span must stay a multiple of block_kv or the in-kernel tile loop
    # (kv_span // block_kv iterations) would drop the ragged tail tile
    kv_span = min(config.kv_tiles_per_block, cdiv(lkv, block_kv)) * block_kv
    n_bh = b * h
    n_q = cdiv(lq, block_q)
    n_kb = cdiv(lkv, kv_span)

    qf = q.reshape(n_bh, lq, d)
    kf = k.reshape(b * h_kv, lkv, d)
    vf = v.reshape(b * h_kv, lkv, d)

    has_offsets = positions is not None

    # One-pass fast path: a single VMEM-resident KV block needs no online
    # state — run the strip-mined single-softmax kernel (with causal
    # chunk-skip) and emit the same (o_partial, lse) contract.
    if (n_kb == 1 and fits_onepass(lkv, d)
            and config.one_pass is not False):
        op_block_q = min(1024, max(lq, 8)) if lq <= 1024 or lq % 1024 == 0 \
            else block_q
        op_block_q = cap_onepass_block_q(op_block_q, lkv)
        op_n_q = cdiv(lq, op_block_q)
        op_kernel = functools.partial(
            _onepass_partial_kernel,
            scale=scale,
            q_chunk=min(ONEPASS_Q_CHUNK, op_block_q),
            kv_chunk=min(512, lkv),
            block_q=op_block_q,
            kv_span=lkv,
            seq_len_q=lq,
            seq_len_kv=lkv,
            causal=causal,
            has_offsets=has_offsets,
            static_positions=static_positions,
        )
        op_specs = [
            pl.BlockSpec((1, op_block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, lkv, d),
                         lambda bh, qi: (bh // kv_group, 0, 0)),
            pl.BlockSpec((1, lkv, d),
                         lambda bh, qi: (bh // kv_group, 0, 0)),
        ]
        op_inputs = [qf, kf, vf]
        if has_offsets:
            q_pos0, kv_pos0 = positions
            offs = jnp.stack([
                jnp.asarray(q_pos0, jnp.int32),
                jnp.asarray(kv_pos0, jnp.int32),
            ]).reshape(1, 2)
            op_specs.append(
                pl.BlockSpec((1, 2), lambda bh, qi: (0, 0),
                             memory_space=pltpu.SMEM)
            )
            op_inputs.append(offs)
        o_part, lse = pl.pallas_call(
            op_kernel,
            grid=(n_bh, op_n_q),
            in_specs=op_specs,
            out_specs=[
                pl.BlockSpec(
                    (1, 1, op_block_q, d), lambda bh, qi: (bh, 0, qi, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 8, op_block_q), lambda bh, qi: (bh, 0, 0, qi)
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_bh, 1, lq, d), workspace_dtype),
                jax.ShapeDtypeStruct((n_bh, 1, 8, lq), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=_resolve_interpret(interpret),
        )(*op_inputs)
        return (
            o_part.reshape(b, h, 1, lq, d),
            lse[:, :, 0, :].reshape(b, h, 1, lq),
        )

    def make_span_index(bq):
        # clamp dead causal spans' K/V fetches (the kernels skip their
        # compute via grid-id predicates, but a distinct block index would
        # still stream the span from HBM); only possible at static
        # positions
        if causal and not has_offsets:
            sp_q_pos0, sp_kv_pos0 = (
                static_positions if static_positions is not None
                else (lkv - lq, 0)
            )

            def span_index(bh, qi, kb):
                vis_max = (
                    qi * bq + bq - 1 + sp_q_pos0 - sp_kv_pos0
                ) // kv_span
                return (bh // kv_group,
                        jnp.minimum(kb, jnp.clip(vis_max, 0, n_kb - 1)), 0)
        else:
            def span_index(bh, qi, kb):
                return (bh // kv_group, kb, 0)
        return span_index

    # Multi-span one-pass path: the BlockSpec stages the full kv_span in
    # VMEM regardless, so whenever the span fits the one-pass budget the
    # span-local softmax needs no online state — run the strip-mined
    # single-softmax kernel with a kv_block grid axis.  Requires an aligned
    # KV length (ragged tails keep the masking streaming kernel).
    if (n_kb > 1 and fits_onepass(kv_span, d) and lkv % kv_span == 0
            and config.one_pass is not False):
        ms_block_q = cap_onepass_block_q(block_q, kv_span)
        ms_n_q = cdiv(lq, ms_block_q)
        ms_kernel = functools.partial(
            _onepass_partial_kernel,
            scale=scale,
            q_chunk=min(ONEPASS_Q_CHUNK, ms_block_q),
            kv_chunk=min(512, kv_span),
            block_q=ms_block_q,
            kv_span=kv_span,
            seq_len_q=lq,
            seq_len_kv=lkv,
            causal=causal,
            has_offsets=has_offsets,
            static_positions=static_positions,
            multi_span=True,
        )
        span_index = make_span_index(ms_block_q)
        ms_specs = [
            pl.BlockSpec((1, ms_block_q, d), lambda bh, qi, kb: (bh, qi, 0)),
            pl.BlockSpec((1, kv_span, d), span_index),
            pl.BlockSpec((1, kv_span, d), span_index),
        ]
        ms_inputs = [qf, kf, vf]
        if has_offsets:
            q_pos0, kv_pos0 = positions
            offs = jnp.stack([
                jnp.asarray(q_pos0, jnp.int32),
                jnp.asarray(kv_pos0, jnp.int32),
            ]).reshape(1, 2)
            ms_specs.append(
                pl.BlockSpec((1, 2), lambda bh, qi, kb: (0, 0),
                             memory_space=pltpu.SMEM)
            )
            ms_inputs.append(offs)
        o_part, lse = pl.pallas_call(
            ms_kernel,
            grid=(n_bh, ms_n_q, n_kb),
            in_specs=ms_specs,
            out_specs=[
                pl.BlockSpec(
                    (1, 1, ms_block_q, d), lambda bh, qi, kb: (bh, kb, qi, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 8, ms_block_q), lambda bh, qi, kb: (bh, kb, 0, qi)
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_bh, n_kb, lq, d), workspace_dtype),
                jax.ShapeDtypeStruct((n_bh, n_kb, 8, lq), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            interpret=_resolve_interpret(interpret),
        )(*ms_inputs)
        return (
            o_part.reshape(b, h, n_kb, lq, d),
            lse[:, :, 0, :].reshape(b, h, n_kb, lq),
        )

    kernel = functools.partial(
        _splitkv_fwd_kernel,
        scale=scale,
        block_q=block_q,
        block_kv=block_kv,
        kv_span=kv_span,
        seq_len_q=lq,
        seq_len_kv=lkv,
        causal=causal,
        has_offsets=has_offsets,
        static_positions=static_positions,
    )
    stream_span_index = make_span_index(block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi, kb: (bh, qi, 0)),
        pl.BlockSpec((1, kv_span, d), stream_span_index),
        pl.BlockSpec((1, kv_span, d), stream_span_index),
    ]
    inputs = [qf, kf, vf]
    if has_offsets:
        q_pos0, kv_pos0 = positions
        offs = jnp.stack(
            [jnp.asarray(q_pos0, jnp.int32), jnp.asarray(kv_pos0, jnp.int32)]
        ).reshape(1, 2)
        in_specs.append(
            pl.BlockSpec((1, 2), lambda bh, qi, kb: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        inputs.append(offs)
    o_part, lse = pl.pallas_call(
        kernel,
        grid=(n_bh, n_q, n_kb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bh, qi, kb: (bh, kb, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, 8, block_q), lambda bh, qi, kb: (bh, kb, 0, qi)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_bh, n_kb, lq, d), workspace_dtype),
            jax.ShapeDtypeStruct((n_bh, n_kb, 8, lq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, STATS_LANES), jnp.float32),
            pltpu.VMEM((block_q, STATS_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=_resolve_interpret(interpret),
    )(*inputs)
    return (
        o_part.reshape(b, h, n_kb, lq, d),
        lse[:, :, 0, :].reshape(b, h, n_kb, lq),
    )


@functools.partial(
    jax.jit, static_argnames=("block_q", "out_dtype", "interpret")
)
def splitkv_combine(
    o_partials: jax.Array,        # [B, H, nkb, Lq, d]
    lses: jax.Array,              # [B, H, nkb, Lq]
    block_q: int = 128,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Phase 2: merge partials (reference reduction_kernel,
    flash_attention_v2.h:356-435) via the LSE rescale rule."""
    b, h, n_kb, lq, d = o_partials.shape
    out_dtype = out_dtype or o_partials.dtype
    block_q = min(block_q, max(lq, 8))
    n_bh = b * h
    n_q = cdiv(lq, block_q)
    of = o_partials.reshape(n_bh, n_kb, lq, d)
    lf = lses.reshape(n_bh, n_kb, lq)

    out = pl.pallas_call(
        functools.partial(_combine_kernel, out_dtype=out_dtype),
        grid=(n_bh, n_q),
        in_specs=[
            pl.BlockSpec((1, n_kb, block_q, d), lambda bh, qi: (bh, 0, qi, 0)),
            pl.BlockSpec((1, n_kb, block_q), lambda bh, qi: (bh, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, lq, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_resolve_interpret(interpret),
    )(of, lf)
    return out.reshape(b, h, lq, d)


@functools.partial(
    jax.jit,
    static_argnames=("config", "causal", "scale", "interpret", "out_dtype"),
)
def flash_attention_v2(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    config: SplitKVConfig = SplitKVConfig(),
    scale: Optional[float] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
    out_dtype=None,
) -> jax.Array:
    """Full split-KV pair: forward workspace + combine (reference
    flash_attention_v2.h:438-508 host orchestration, minus the per-call
    workspace malloc)."""
    out_dtype = out_dtype or q.dtype
    # workspace in the storage dtype (the reference's half workspace,
    # flash_attention_v2.h:453-463): halves the HBM round-trip between the
    # phases; lse stays f32
    o_part, lse = flash_attention_splitkv_partial(
        q, k, v, config=config, scale=scale, causal=causal,
        interpret=interpret, workspace_dtype=q.dtype,
    )
    return splitkv_combine(
        o_part, lse, block_q=config.block_q, out_dtype=out_dtype,
        interpret=interpret,
    )
