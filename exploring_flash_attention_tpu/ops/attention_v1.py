"""Fused V1 flash-attention Pallas kernel.

TPU-native re-design of the reference's fused single-kernel forward
(flash_attention_v1/CUDA/flash_attention_v1.h:161-248 baseline,
flash_attention_v1_opt1.h WMMA variant):

- the CUDA grid ``(ceil(L/BQ), B*H)`` becomes the Pallas grid
  ``(B*H, n_q_blocks, n_kv_blocks)`` — the KV-tile loop that CUDA runs
  in-kernel (flash_attention_v1.h:222-240) is the innermost *sequential*
  grid axis here so Pallas double-buffers the K/V HBM->VMEM streams
  automatically (the role of load_shared_memory.h's vectorized copies);
- shared-memory tiles map to VMEM blocks; the f32 (m, l, O_acc) running
  state maps to VMEM scratch that persists across the sequential axis
  (the TPU analog of registers + smem statistics);
- WMMA maps to the MXU: both tile matmuls are ``jax.lax.dot_general`` with
  ``preferred_element_type=float32`` — there is no separate "opt" kernel,
  the optimization axis is block-size/layout tuning (SURVEY §2.5);
- the 5-phase ``__syncthreads`` discipline disappears: Pallas's pipelined
  execution model sequences the phases by dataflow.

Numerics follow the reference's mixed-precision policy: low-precision
storage (bf16), f32 scores/statistics/accumulator, probabilities cast back
to storage dtype for the P@V matmul (as the CUDA kernel's half exp_S,
flash_attention_v1.h:148-156).

Two execution tiers behind one API (selected by ``TileConfig.one_pass``,
default auto):

- **one-pass**: whole KV VMEM-resident, single softmax per q-strip —
  no online state, the fastest path whenever ``fits_onepass`` holds;
- **streaming**: online-softmax over a sequential KV grid axis with the
  same strip-mined update, for arbitrary sequence lengths.

Extensions beyond the reference surface: optional causal masking with
whole-tile skipping, sliding-window (local) attention, cross-length
(L_kv != L_q) attention, and ragged (non-divisible) sequence lengths via
in-kernel masking.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.configs import (
    SplitKVConfig,
    TileConfig,
    cdiv,
)

NEG_INF = float("-inf")
# m/l statistics are stored broadcast across a full 128-lane vector so the
# scratch keeps the native (sublane, lane) tiling.
STATS_LANES = 128
LOG2E = math.log2(math.e)

# One-pass fast path: largest L_kv * d product whose full K/V (plus the f32
# score strip) comfortably fits VMEM (= L_kv 4096 at d=128, 1024 at d=512).
# Above this the online-softmax streaming kernel takes over.
ONEPASS_MAX_KV = 4096
ONEPASS_MAX_KV_ELEMS = ONEPASS_MAX_KV * 128


# Rows of scores processed per inner step — small enough that the Mosaic
# scheduler can overlap one chunk's VPU softmax with the next chunk's MXU
# matmul (measured optimum on v5e; see scripts/proto_onepass*.py sweeps).
ONEPASS_Q_CHUNK = 256

# Strip rows for the PIPELINED exact fold kernel: smaller strips give the
# 3-stage software pipeline more (head, strip) slots to overlap — measured
# optimum qc128 (158-161 TF/s) vs qc256 (155) vs qc512 (152) at the
# canonical d=128 shape (scripts/proto_r5_pipe.py).
ONEPASS_FOLD_Q_CHUNK = 128


def onepass_span(lkv: int, d: int, block_kv: int) -> Optional[int]:
    """Largest KV span within the one-pass VMEM budget that tiles ``lkv``
    exactly (a multiple of ``block_kv``), or None — the span size the
    multi-span one-pass split-KV path runs with."""
    budget = min(ONEPASS_MAX_KV, ONEPASS_MAX_KV_ELEMS // max(d, 1))
    for span in range(budget - budget % block_kv, 0, -block_kv):
        if lkv % span == 0:
            return span
    return None


def fits_onepass(lkv: int, d: int) -> bool:
    # both bounds matter: lkv*d sizes the K/V blocks, but the f32 score
    # strip is q_chunk*lkv regardless of d — small head dims must not
    # admit arbitrarily long rows
    return lkv <= ONEPASS_MAX_KV and lkv * d <= ONEPASS_MAX_KV_ELEMS


# Mosaic's scoped-VMEM (kernel stack + pipeline blocks) hard limit — the
# TPU analog of the reference's sharedMemPerBlock check
# (/root/reference/flash_attention_v1/CUDA/flash_attention_v1.h:267-283).
VMEM_SCOPED_BYTES = 16 * 1024 * 1024
# Budget for the unrolled strips' f32 score buffers: Mosaic keeps every
# strip's buffer live on the kernel stack (block_q * lkv * 4 bytes total
# regardless of q_chunk) — leave the other half of the scoped limit for
# K/V/Q/output blocks.
ONEPASS_STRIP_BYTES = VMEM_SCOPED_BYTES // 2


def cap_onepass_block_q(block_q: int, lkv: int) -> int:
    """Shrink a one-pass q block until its live strip total fits the
    scoped-VMEM budget.  Only halves blocks that stay multiples of 8
    (the Pallas TPU block-shape rule) — an already-odd block like
    block_q == lq == 520 is left alone, matching pre-cap behavior."""
    while (block_q > 256 and block_q % 16 == 0
           and block_q * lkv * 4 > ONEPASS_STRIP_BYTES):
        block_q //= 2
    return block_q


# The fold estimator's budget sits 0.75 MB under the scoped limit: the
# model under-counts Mosaic's true scoped allocation by ~1.5 MB at the
# measured OOM points (scheduling copies it does not itemize), so the
# margin is carried here.  Validated against measured Mosaic scoped
# allocations at 1024x1024/d=128 (scripts/proto_causal_fast3.py,
# proto_r4_boundmax.py, ab_r4_vpu_ablate.py): every measured-OOM
# geometry estimates above this budget (dense fold4 f32-out qc512 ->
# est 15.5 / 17.21 actual; causal fold4 f32-out+LSE -> est 15.8 / 17.01
# actual; fold8 bf16 -> est 21.0 / 21+ actual) and every
# measured-fitting one below it (dense fold4 bf16 qc256 -> est 13.0;
# bf16 qc512 -> 13.5; f32-out qc256 -> est 15.0 / ~15 actual; causal
# fold4 bf16 -> est 13.6).
FOLD_VMEM_BUDGET = VMEM_SCOPED_BYTES - 3 * 1024 * 1024 // 4


def onepass_fold_vmem_bytes(
    block_q: int,
    vis: int,
    d: int,
    fold: int,
    in_bytes: int = 2,
    out_bytes: int = 2,
    with_lse: bool = False,
    q_chunk: int = ONEPASS_Q_CHUNK,
    strip_spans: Optional[list] = None,
    pipelined: bool = False,
) -> int:
    """Estimated scoped-VMEM working set of one head-folded one-pass
    program (VERDICT r3 item 6 — replaces the CAUSAL_FOLD_BYTES /
    element-cap magic constants with the explicit arithmetic the
    reference does for shared memory, flash_attention_v1.h:267-283).

    Itemized against Mosaic's allocation behavior:
      - pipeline blocks, double-buffered across grid steps:
        2 x fold x (q + K + V + out [+ LSE]) block bytes;
      - kernel stack: ONE head's unrolled strip temporaries stay live —
        each strip's f32 score rectangle (rows x span; for causal strips
        ``strip_spans`` carries the true truncated spans of the WORST
        q block — the flat 5/8-of-diagonal factor under-counted later
        blocks, round-4 ADVICE) plus its banded-mask f32 copy, its f32
        PV accumulator, and one strip's storage-dtype P staging buffer.
    """
    q_chunk = min(q_chunk, block_q)
    n_strips = cdiv(block_q, q_chunk)
    if strip_spans is None:
        strip_spans = [vis] * n_strips
    lse_blk = 8 * block_q * 4 if with_lse else 0
    blocks = 2 * fold * (block_q * d * in_bytes       # q
                         + 2 * vis * d * in_bytes     # K, V
                         + block_q * d * out_bytes    # out
                         + lse_blk)
    score_f32 = 4 * sum(min(q_chunk, block_q - i * q_chunk) * s
                        for i, s in enumerate(strip_spans))
    bands = 0
    if any(s != vis for s in strip_spans):            # causal: banded strips
        # each strip's masked diagonal band (<= q_chunk + lane-group wide)
        # is materialized as an f32 bias copy plus its storage-dtype probs
        bands = sum(min(q_chunk, block_q - i * q_chunk)
                    * min(strip_spans[i], q_chunk + STATS_LANES)
                    * (4 + in_bytes)
                    for i in range(len(strip_spans)))
    pv_f32 = 4 * n_strips * q_chunk * d
    # the 3-stage pipelined exact kernel (round 5) keeps TWO strips'
    # storage-dtype P staging buffers live (stage B's current + stage C's
    # trailing) plus roughly half a strip of f32 exp2 temporaries inside
    # the overlap window.  The half-strip coefficient is calibrated on the
    # six fold4 boundary geometries measured on v5e (round 5): fits —
    # qc128 bf16/f32, qc256 bf16; OOM — qc256 f32, qc512 bf16/f32; with
    # the non-pipelined points (bound/causal) keeping their round-4
    # calibration.
    p_staging = (2 if pipelined else 1) * q_chunk * vis * in_bytes
    pipe_overlap = (q_chunk // 2) * vis * 4 if pipelined else 0
    return blocks + score_f32 + bands + pv_f32 + p_staging + pipe_overlap


def _resolve_interpret(interpret: Optional[bool]) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"

def dot_precision(*operands):
    """MXU precision knob: Pallas/Mosaic lowers f32 matmuls to single-pass
    bf16 by default, silently quantizing f32 operands.  Request HIGHEST
    (multi-pass bf16x emulation) when any operand is genuinely f32 so the
    f32 kernels referee at f32 accuracy; bf16/int8 paths are unaffected."""
    for x in operands:
        if x.dtype == jnp.float32:
            return jax.lax.Precision.HIGHEST
    return None


def _v1_kernel(
    *refs,                      # q, k, v [, pk] blocks + o + 3 scratch
    scale: float,
    block_q: int,
    block_kv: int,
    seq_len_q: int,
    seq_len_kv: int,
    causal: bool,
    window: Optional[int] = None,
    softmax: str = "exact",
):
    """Streaming (online-softmax) kernel.

    ``softmax="bound"``: the per-row shift is FIXED for the whole stream
    at the Cauchy-Schwarz bound ||q_i|| * prefix-kmax * c (pk_ref carries
    the per-q-block prefix max of K row norms over the block's visible
    tiles, computed by the launcher with one XLA pass + cummax).  A fixed
    shift collapses the online state to (acc, l): no running max, no
    alpha, no accumulator rescale — measured 131.4 -> 167.8 TF/s (+28%)
    at the causal L=32K suite shape (scripts/ab_streaming_fixedm.py).
    Same accuracy trade as every bound path (TileConfig docstring)."""
    if softmax == "bound":
        q_ref, k_ref, v_ref, pk_ref, o_ref, acc_ref, m_ref, l_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref = refs
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)
    q_idx = pl.program_id(1)   # hoisted: program_id cannot be read inside
                               # pl.when bodies under interpret mode

    @pl.when(kv_idx == 0)
    def _init():
        if softmax != "bound":
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Causal tile-skip: a KV tile strictly above the diagonal contributes
    # nothing — skip its matmuls entirely (the FLOP-halving the reference
    # never had; boom guide "skip entire KV tiles above the diagonal").
    if causal:
        diag_off = seq_len_kv - seq_len_q
        tile_visible = (
            kv_idx * block_kv <= (q_idx + 1) * block_q - 1 + diag_off
        )
        if window is not None:
            # sliding window: also skip tiles entirely BEFORE the band
            # (col_end < q_start + off - window + 1)
            tile_visible = jnp.logical_and(
                tile_visible,
                (kv_idx + 1) * block_kv - 1
                >= q_idx * block_q + diag_off - window + 1,
            )
    else:
        tile_visible = True

    # The tile is processed in q-strips so strip t+1's S matmul can overlap
    # strip t's VPU softmax/state update (the one-pass kernel's structure
    # applied to the streaming case).  Statistics live in the exp2 basis
    # with the softmax scale pre-folded (m2 = max(s)*scale*log2e), so the
    # per-element work per strip is one fused multiply-subtract + exp2.
    c = scale * LOG2E
    needs_kv_mask = seq_len_kv % block_kv != 0
    # strip-mining pays off when the KV tile is wide (the VPU work per
    # strip is large enough to hide the next strip's matmul under); for
    # narrow tiles the extra per-strip state read-modify-writes dominate —
    # process the block monolithically instead (measured crossover on
    # v5e: ~1024 columns)
    q_strip = (min(ONEPASS_Q_CHUNK, block_q) if block_kv >= 1024
               else block_q)

    @pl.when(tile_visible)
    def _tile():
        k = k_ref[0]
        v = v_ref[0]
        if needs_kv_mask:
            # padded V rows hold undefined values (NaN under interpret);
            # zero them so p=0 columns can't poison the matmul via 0*NaN
            vrow = jax.lax.broadcasted_iota(jnp.int32, (block_kv, 1), 0)
            vrow = vrow + kv_idx * block_kv
            v = jnp.where(vrow < seq_len_kv, v, jnp.zeros_like(v))

        for q0 in range(0, block_q, q_strip):
            rows = min(q_strip, block_q - q0)
            q = q_ref[0, q0:q0 + rows, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(q, k),
            )

            # Mask padded KV columns (ragged L_kv) / the causal triangle.
            mask = None
            if needs_kv_mask or causal:
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, block_kv), 1)
                col = col + kv_idx * block_kv
                if needs_kv_mask:
                    mask = col < seq_len_kv
                if causal:
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (rows, block_kv), 0)
                    row = row + q_idx * block_q + q0
                    cmask = col <= row + (seq_len_kv - seq_len_q)
                    if window is not None:
                        cmask = jnp.logical_and(
                            cmask,
                            col >= row + (seq_len_kv - seq_len_q)
                            - window + 1,
                        )
                    mask = (cmask if mask is None
                            else jnp.logical_and(mask, cmask))

            if softmax == "bound":
                # fixed shift: state is pure accumulation
                qf32 = q.astype(jnp.float32)
                q_sq = jnp.sum(qf32 * qf32, axis=1, keepdims=True)
                m_fix = (jnp.sqrt(q_sq * pk_ref[0, 0, 0, 0]) * c
                         - BOUND_SHIFT)
                if mask is not None:
                    arg = jnp.where(mask, s * c - m_fix, NEG_INF)
                else:
                    arg = s * c - m_fix
                p = jnp.exp2(arg)
                l_ref[q0:q0 + rows, :] = (
                    l_ref[q0:q0 + rows, :]
                    + jnp.sum(p, axis=1, keepdims=True)
                )
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(v),
                )
                acc_ref[q0:q0 + rows, :] = acc_ref[q0:q0 + rows, :] + pv
                continue
            # Online-softmax update in the exp2 basis (the process_kv_tile
            # contract, sim/tile_loop.py:process_kv_tile).
            m_prev = m_ref[q0:q0 + rows, :]                 # (rows, 128)
            m_cur = jnp.max(s, axis=1, keepdims=True) * c   # (rows, 1)
            if mask is not None:
                s_c = jnp.where(mask, s * c, NEG_INF)
                m_cur = jnp.max(s_c, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_new)
            alpha = jnp.where(jnp.isneginf(m_new), 0.0, alpha)
            if mask is not None:
                arg = jnp.where(mask, s * c - m_new[:, :1], NEG_INF)
            else:
                arg = s * c - m_new[:, :1]
            p = jnp.exp2(arg)                               # (rows, BK)

            m_ref[q0:q0 + rows, :] = m_new
            l_ref[q0:q0 + rows, :] = (
                l_ref[q0:q0 + rows, :] * alpha
                + jnp.sum(p, axis=1, keepdims=True)
            )
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(v),
            )
            acc_ref[q0:q0 + rows, :] = (
                acc_ref[q0:q0 + rows, :] * alpha[:, :1] + pv
            )

    @pl.when(kv_idx == n_kv - 1)
    def _finalize():
        # O = O_acc / l (reference finalize, flash_attention_v1.h:243-247);
        # guard fully-masked rows (l == 0) to emit zeros, not NaN.
        l = l_ref[:, :1]
        denom = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


def _v1_onepass_kernel(
    q_ref, k_ref, v_ref,        # VMEM blocks: (1, BQ, d), (1, Lkv, d) x2
    o_ref,                      # VMEM block:  (1, BQ, d)
    *,
    scale: float,
    q_chunk: int,
    seq_len_kv: int,
    softmax: str = "exact",
):
    """Single-pass softmax for VMEM-resident KV (the fused V1 kernel when
    the whole KV sequence is one tile).

    The softmax-scale multiply is folded into one fused multiply-subtract on
    the score strip (p = exp2(s*c - m*c), c = scale*log2(e)); scores are
    processed in ``q_chunk``-row strips so the MXU matmul of strip t+1 can
    overlap the VPU softmax of strip t.  5.9x the reference's best-published
    per-shape speed came from exactly this structure (scripts/proto_* sweeps:
    online-softmax streaming at this shape tops out at ~59% of roofline, the
    strip-mined one-pass reaches ~75%+)."""
    block_q = q_ref.shape[1]
    lkv_blk = k_ref.shape[1]
    c = scale * LOG2E
    k = k_ref[0]
    v = v_ref[0]
    needs_kv_mask = seq_len_kv % lkv_blk != 0
    if needs_kv_mask:
        # zero padded V rows: 0 * NaN would poison the P@V matmul
        vrow = jax.lax.broadcasted_iota(jnp.int32, (lkv_blk, 1), 0)
        v = jnp.where(vrow < seq_len_kv, v, jnp.zeros_like(v))
    # bound mode with padded KV: garbage K rows would inflate the norm
    # bound (still safe — only looser), but mask them for tightness
    kms = None
    if softmax == "bound":
        kb = k
        if needs_kv_mask:
            krow = jax.lax.broadcasted_iota(jnp.int32, (lkv_blk, 1), 0)
            kb = jnp.where(krow < seq_len_kv, k, jnp.zeros_like(k))
        kms = _k_max_sq(kb, softmax)
    # Cast p to the storage dtype once and derive BOTH matmul operand
    # and denominator from it: the f32 score strip is read exactly
    # once after exp2, and numerator/denominator rounding partially
    # cancels in O = pv/denom.  Summing after the PV dot_general lets
    # the VPU reduction ride under the MXU matmul (measured ~2% at
    # the canonical shape; scripts/proto_onepass10.py).
    #
    # Exact softmax runs the round-5 3-stage software pipeline (QK^T of
    # strip t+1 before softmax of strip t, denominator/store one slot
    # later — see _v1_onepass_fold_kernel); the zero-guard is elided
    # when no KV mask exists (exact max => denom >= 1); bound mode keeps
    # the sequential loop (its p_top can underflow and its shift needs q).

    def _stage_a(q0, rows):
        q = q_ref[0, q0:q0 + rows, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q, k),
        )
        if needs_kv_mask:
            col = jax.lax.broadcasted_iota(jnp.int32, (rows, lkv_blk), 1)
            s = jnp.where(col < seq_len_kv, s, NEG_INF)
        return q, s

    def _stage_b(q0, q, s):
        m = _softmax_m(s, q, kms, c, softmax)
        p = jnp.exp2(s * c - m)
        if needs_kv_mask:
            p = jnp.where(jnp.isneginf(s), 0.0, p)
        pb = p.astype(v.dtype)
        pv = jax.lax.dot_general(
            pb, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dot_precision(v),
        )
        return q0, pb, pv

    def _stage_c(q0, pb, pv):
        denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
        if needs_kv_mask or softmax != "exact":
            denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0, q0:q0 + pv.shape[0], :] = (pv / denom).astype(o_ref.dtype)

    if softmax == "exact":
        qk_pend, bc_pend = [], []
        for q0 in range(0, block_q, q_chunk):
            rows = min(q_chunk, block_q - q0)
            qk_pend.append((q0, *_stage_a(q0, rows)))
            if len(qk_pend) > 1:
                q0p, qp, sp = qk_pend.pop(0)
                bc_pend.append(_stage_b(q0p, qp, sp))
            if len(bc_pend) > 1:
                _stage_c(*bc_pend.pop(0))
        for q0p, qp, sp in qk_pend:
            bc_pend.append(_stage_b(q0p, qp, sp))
        for item in bc_pend:
            _stage_c(*item)
    else:
        for q0 in range(0, block_q, q_chunk):
            rows = min(q_chunk, block_q - q0)
            q, s = _stage_a(q0, rows)
            _stage_c(*_stage_b(q0, q, s))


def _v1_onepass_causal_kernel(
    *refs,                      # q (F,BQ,d), k/v (F,VIS,d), o (F,BQ,d)
                                # [, lse (F,8,BQ) when with_lse]
    scale: float,
    q_chunk: int,
    q_base: int,                # global q position of this block's row 0
    diag_off: int,              # q_pos0 - kv_pos0 (causal diagonal offset)
    fold: int = 1,              # heads per program (K/V resident)
    with_lse: bool = False,
    softmax: str = "exact",
):
    """Causal single-pass softmax for VMEM-resident KV.

    The causal structure is exploited *statically*: the wrapper hands each
    q block only its visible KV prefix (k_ref covers [0, vis)), and inside
    the kernel every q strip truncates its matmuls to its own visible span
    — strip [q0, q0+rows) contracts against K[:q0+rows+diag] only.  Total
    work is L(L+q_chunk)/2 instead of L^2 (the FLOP halving the streaming
    kernel gets from whole-tile skipping, without the online-softmax
    state), and each strip's softmax is single-pass because its span is
    complete.

    Three measured refinements over the round-2 form (scripts/
    proto_causal_fast*.py at B=32,H=8,L=1024,d=128, ladder
    90.2 -> 97.9 -> 99.3 -> 137 TF/s of L^2/2 FLOPs):
      - dense/band split: only the trailing diagonal band of a strip is
        masked; the dense prefix runs entirely mask-free (every column is
        visible to every row there, including for its row max) (+8%);
      - head fold: ``fold`` heads per program with K/V resident amortize
        the per-program pipeline fill, which weighs double here because a
        causal program does half a dense program's work;
      - strips OUTER, folded heads INNER: each strip-class issues ``fold``
        identical-shape matmul pairs back-to-back, so head h's VPU softmax
        hides under head h+1's same-shape MXU work instead of under the
        next strip's differently-shaped matmul (+38% on top of fold —
        heads-outer measured 99.3, heads-inner 137).

    Extends the reference's causal-free surface the same way the streaming
    kernel does (flash_attention_v1/CUDA/flash_attention_v1.h has no mask);
    the strip truncation generalizes the V2 split-KV span discipline
    (/root/reference/flash_attention_v2/CUDA/flash_attention_v2.h:250-253)
    to a static per-strip bound.

    ``with_lse``: also emit the natural-log row LSE (the split-KV /
    ring partial contract, attention_v2_splitkv.py) so the training
    forward can keep the residual the backward needs."""
    if with_lse:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
    block_q = q_ref.shape[1]
    vis_blk = k_ref.shape[1]
    c = scale * LOG2E

    # The band mask is STATIC per strip (indices and offsets are Python
    # ints), so it folds into a compile-time 0/-inf bias added in the same
    # fused multiply-add as the softmax scale: sb*c + TRI.  One VPU op on
    # the band replaces two iotas + compare + select, and strips with the
    # same (rows, band, delta) share one constant.
    _tri_cache = {}

    def _tri(rows, band, delta):
        key = (rows, band, delta)
        if key not in _tri_cache:
            col = jax.lax.broadcasted_iota(jnp.int32, (rows, band), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (rows, band), 0)
            _tri_cache[key] = jnp.where(col <= row + delta, 0.0, NEG_INF)
        return _tri_cache[key]

    # bound softmax (TileConfig.softmax docstring): K row-norms squared,
    # once per head, shared by every strip.  The per-strip statistic is
    # the prefix max over the strip's lane-ALIGNED visible span — shared
    # by all rows of the strip, so it can include up to STATS_LANES-1
    # keys past an individual row's position.  Bound-mode causal outputs
    # are therefore bit-invariant to future tokens only at aligned
    # strip/lane-group granularity: extending the KV sequence by whole
    # aligned blocks leaves earlier outputs bitwise unchanged
    # (tests/test_attention_v1.py misaligned-extension test), but a
    # per-token extension may re-round rows in the strip that straddles
    # the old boundary.  EXACT mode is per-token invariant (its masked
    # band max sees only each row's own visible keys) — anything that
    # needs per-token bit-invariance (e.g. a per-token greedy-equivalence
    # gate) must use softmax="exact"; the speculative-decode verifier
    # extends by whole aligned blocks or runs exact.
    knorm_sq = None
    if softmax == "bound":
        knorm_sq = []
        for hh in range(fold):
            kf32 = k_ref[hh].astype(jnp.float32)
            knorm_sq.append(jnp.sum(kf32 * kf32, axis=1))      # [vis_blk]

    # Three-stage software pipeline over (strip, head) slots (round 5 —
    # the same restructure that closed the dense headline,
    # _v1_onepass_fold_kernel): strip t+1's QK^T issues before strip t's
    # max/exp2/PV, whose denominator/divide/store trails one more slot,
    # so the critical-path reductions overlap MXU work.  Zero-span
    # strips bypass the pipeline (stored directly).

    def _stage_a(hh, q0, rows, span, band_lo):
        q = q_ref[hh, q0:q0 + rows, :]
        ks = k_ref[hh, :span]
        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q, ks),
        )
        band = span - band_lo
        sb_m = None
        if band > 0:
            sb = s[:, band_lo:]
            sb_m = sb * c + _tri(
                rows, band, q_base + q0 + diag_off - band_lo)
        m = None
        if softmax == "bound":
            qf32 = q.astype(jnp.float32)
            q_sq = jnp.sum(qf32 * qf32, axis=1, keepdims=True)
            k_sq_vis = jnp.max(knorm_sq[hh][:span])
            m = jnp.sqrt(q_sq * k_sq_vis) * c - BOUND_SHIFT
        return (hh, q0, rows, span, band_lo, band, s, sb_m, m)

    def _stage_b(hh, q0, rows, span, band_lo, band, s, sb_m, m):
        vs = v_ref[hh, :span]
        # row max over the VISIBLE columns only: the dense prefix needs
        # no mask (every column visible), the band maxes over its masked
        # scores.  A full-strip max would be cheaper and shift-invariant
        # in exact arithmetic, but it makes the f32 rounding depend on
        # FUTURE tokens — exact-mode causal outputs are bit-invariant to
        # them per token (tests/test_model.py gates this; speculative
        # greedy equivalence leans on it).  The bound statistic (m
        # computed in stage A) is invariant only at aligned strip
        # granularity: k_sq_vis spans the lane-ALIGNED visible range
        # (see the knorm_sq comment above).
        if m is None:                        # exact
            if band > 0:
                m = jnp.max(sb_m, axis=1, keepdims=True)
            if band_lo > 0:
                m_d = jnp.max(s[:, :band_lo], axis=1,
                              keepdims=True) * c
                m = m_d if m is None else jnp.maximum(m, m_d)
        # fully-masked rows (cross-length with lkv < lq): m = -inf
        # would make the exp argument NaN; substitute 0 so p = 0
        m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
        pv = None
        pd = pb = None
        if band_lo > 0:
            pd = jnp.exp2(s[:, :band_lo] * c - m_safe).astype(vs.dtype)
            pv = jax.lax.dot_general(
                pd, vs[:band_lo], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(vs),
            )
        if band > 0:
            pb = jnp.exp2(sb_m - m_safe).astype(vs.dtype)
            pv_b = jax.lax.dot_general(
                pb, vs[band_lo:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(vs),
            )
            pv = pv_b if pv is None else pv + pv_b
        return (hh, q0, rows, m, pd, pb, pv)

    def _stage_c(hh, q0, rows, m, pd, pb, pv):
        l_raw = None
        if pd is not None:
            l_raw = jnp.sum(pd.astype(jnp.float32), axis=1, keepdims=True)
        if pb is not None:
            l_b = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
            l_raw = l_b if l_raw is None else l_raw + l_b
        denom = jnp.where(l_raw == 0.0, 1.0, l_raw)
        o_ref[hh, q0:q0 + rows, :] = (pv / denom).astype(o_ref.dtype)
        if with_lse:
            # natural-log LSE over the visible span:
            # max(s*scale) + ln(sum); m is in the exp2-scaled basis
            lse = jnp.where(
                l_raw[:, 0] == 0.0, NEG_INF,
                m[:, 0] / LOG2E + jnp.log(denom[:, 0]),
            )
            lse_ref[hh, :, q0:q0 + rows] = jnp.broadcast_to(
                lse[None, :], (8, rows))

    a_pend, b_pend = [], []
    for q0 in range(0, block_q, q_chunk):
        rows = min(q_chunk, block_q - q0)
        # columns visible to this strip's last row, lane-aligned
        span_exact = q_base + q0 + rows + diag_off
        span = min(vis_blk, -(-max(span_exact, 1) // STATS_LANES)
                   * STATS_LANES)
        # columns below this are visible to EVERY row of the strip: the
        # mask-free dense prefix (aligned down to the lane group)
        band_lo = min(span, max(0, (q_base + q0 + diag_off + 1)
                                // STATS_LANES * STATS_LANES))
        for hh in range(fold):
            if span <= 0:
                o_ref[hh, q0:q0 + rows, :] = jnp.zeros(
                    (rows, o_ref.shape[2]), o_ref.dtype)
                if with_lse:
                    lse_ref[hh, :, q0:q0 + rows] = jnp.full(
                        (8, rows), NEG_INF, jnp.float32)
                continue
            a_pend.append(_stage_a(hh, q0, rows, span, band_lo))
            if len(a_pend) > 1:
                b_pend.append(_stage_b(*a_pend.pop(0)))
            if len(b_pend) > 1:
                _stage_c(*b_pend.pop(0))
    for item in a_pend:
        b_pend.append(_stage_b(*item))
    for item in b_pend:
        _stage_c(*item)


def causal_strip_spans(block_q: int, q_base: int, diag_off: int,
                       vis: int, q_chunk: int) -> list:
    """Lane-aligned visible span of each q strip of a causal block — the
    spans _v1_onepass_causal_kernel truncates its matmuls to."""
    spans = []
    for q0 in range(0, block_q, q_chunk):
        rows = min(q_chunk, block_q - q0)
        span_exact = q_base + q0 + rows + diag_off
        spans.append(min(vis, -(-max(span_exact, 1) // STATS_LANES)
                         * STATS_LANES))
    return spans


def _causal_headfold(n_bh: int, block_q: int, vis_max: int, d: int,
                     kv_group: int, out_bytes: int = 2,
                     with_lse: bool = False,
                     q_chunk: int = ONEPASS_Q_CHUNK,
                     lq: Optional[int] = None,
                     diag_off: int = 0) -> int:
    """Heads per causal one-pass program (the causal analog of _headfold:
    no GQA block sharing, a dividing head count, lane-aligned geometry,
    and the folded working set inside the VMEM budget).  The estimate is
    taken at the WORST (last) q block — its strips span nearly the whole
    vis, not the 5/8 of the diagonal block (round-4 ADVICE fix)."""
    if (kv_group != 1 or block_q % STATS_LANES != 0
            or vis_max % STATS_LANES != 0):
        return 1
    q_base_worst = max((lq or block_q) - block_q, 0)
    spans = causal_strip_spans(block_q, q_base_worst, diag_off, vis_max,
                               min(q_chunk, block_q))
    fold = 4
    while fold > 1 and (
        n_bh % fold != 0
        or onepass_fold_vmem_bytes(
            block_q, vis_max, d, fold, out_bytes=out_bytes,
            with_lse=with_lse, q_chunk=q_chunk, strip_spans=spans,
            pipelined=True,
        ) > FOLD_VMEM_BUDGET
    ):
        fold //= 2
    return max(fold, 1)


def _flash_attention_v1_onepass_causal(
    qf, kf, vf,                  # [n_bh, Lq, d] / [n_bh_kv, Lkv, d] x2
    scale: float,
    out_dtype,
    interpret: bool,
    q_chunk: Optional[int] = None,
    kv_group: int = 1,
    diag_off: Optional[int] = None,
    with_lse: bool = False,
    softmax: str = "exact",
):
    """Causal one-pass launcher: one pallas_call per q block, each handed
    only its visible KV prefix (static XLA-level slice, so the late
    blocks' wide spans never inflate the early blocks' VMEM budget).

    ``with_lse`` also returns the natural-log row LSE [n_bh, Lq] f32."""
    n_bh, lq, d = qf.shape
    lkv = kf.shape[1]
    if diag_off is None:
        diag_off = lkv - lq
    block_q = min(1024, lq) if lq % 1024 == 0 or lq <= 1024 else 512
    block_q = cap_onepass_block_q(block_q, lkv)
    block_q = min(block_q, max(lq, 8))
    chunk = min(q_chunk or ONEPASS_Q_CHUNK, block_q)
    # head fold (see _v1_onepass_causal_kernel): gate on the LARGEST
    # q block's visible span — and its actual strip spans, not the
    # diagonal block's 5/8 — so every per-block pallas_call shares one
    # fold that fits the worst block.
    vis_max = min(lkv, -(-max(diag_off + lq, 1) // STATS_LANES)
                  * STATS_LANES)
    fold = _causal_headfold(n_bh, block_q, vis_max, d, kv_group,
                            out_bytes=jnp.dtype(out_dtype).itemsize,
                            with_lse=with_lse, q_chunk=chunk,
                            lq=lq, diag_off=diag_off)
    outs = []
    lses = []
    for q_base in range(0, lq, block_q):
        bq = min(block_q, lq - q_base)
        vis = diag_off + q_base + bq
        vis = -(-max(vis, 1) // STATS_LANES) * STATS_LANES  # lane-align up
        vis = max(8, min(lkv, vis))
        kernel = functools.partial(
            _v1_onepass_causal_kernel,
            scale=scale,
            q_chunk=min(chunk, bq),
            q_base=q_base,
            diag_off=diag_off,
            fold=fold,
            with_lse=with_lse,
            softmax=softmax,
        )
        out_specs = pl.BlockSpec((fold, bq, d), lambda bh, qi: (bh, qi, 0))
        out_shape = jax.ShapeDtypeStruct((n_bh, bq, d), out_dtype)
        if with_lse:
            out_specs = [out_specs,
                         pl.BlockSpec((fold, 8, bq),
                                      lambda bh, qi: (bh, 0, qi))]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((n_bh, 8, bq), jnp.float32)]
        flops = 2 * n_bh * bq * (diag_off + q_base + bq // 2) * d * 2
        out_i = pl.pallas_call(
            kernel,
            grid=(n_bh // fold, 1),
            in_specs=[
                pl.BlockSpec((fold, bq, d), lambda bh, qi: (bh, qi, 0)),
                pl.BlockSpec((fold, vis, d),
                             lambda bh, qi: (bh // kv_group, 0, 0)),
                pl.BlockSpec((fold, vis, d),
                             lambda bh, qi: (bh // kv_group, 0, 0)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=max(flops, 1),
                bytes_accessed=(n_bh * bq * d * 2
                                + 2 * kf.shape[0] * vis * d
                                * kf.dtype.itemsize),
                transcendentals=n_bh * bq * max(vis, 1),
            ),
            interpret=interpret,
        )(qf[:, q_base:q_base + bq], kf[:, :vis], vf[:, :vis])
        if with_lse:
            outs.append(out_i[0])
            lses.append(out_i[1][:, 0, :])
        else:
            outs.append(out_i)
    o = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    if not with_lse:
        return o
    lse = lses[0] if len(lses) == 1 else jnp.concatenate(lses, axis=1)
    return o, lse


@functools.partial(
    jax.jit,
    static_argnames=("scale", "static_positions", "q_chunk", "interpret"),
)
def flash_attention_v1_causal_partial(
    q: jax.Array,               # [B, H, Lq, d]
    k: jax.Array,               # [B, H_kv, Lkv, d]
    v: jax.Array,
    scale: Optional[float] = None,
    static_positions: Optional[tuple] = None,
    q_chunk: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Causal partial-attention forward over the FULL KV via the one-pass
    causal kernel: returns (o [B,H,Lq,d] f32 normalized, lse [B,H,Lq] f32
    natural log) — the single-shard partial contract of
    parallel.partials.attention_partial_local, at the causal one-pass
    kernel's speed (QK^T, softmax and PV all truncated per strip, vs the
    split-KV partial's QK^T-only chunk skip)."""
    b, h, lq, d = q.shape
    h_kv, lkv = k.shape[1], k.shape[2]
    kv_group = h // h_kv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    q_pos0, kv_pos0 = static_positions or (lkv - lq, 0)
    o, lse = _flash_attention_v1_onepass_causal(
        q.reshape(b * h, lq, d),
        k.reshape(b * h_kv, lkv, d),
        v.reshape(b * h_kv, lkv, d),
        scale, jnp.float32, _resolve_interpret(interpret),
        q_chunk=q_chunk, kv_group=kv_group,
        diag_off=int(q_pos0) - int(kv_pos0), with_lse=True,
    )
    return o.reshape(b, h, lq, d), lse.reshape(b, h, lq)


def causal_partial_onepass_eligible(lq: int, lkv: int, d: int) -> bool:
    """Shapes the causal one-pass partial can serve (mirrors the
    flash_attention_v1 causal_eligible gate)."""
    return (fits_onepass(lkv, d) and d > PVT_MAX_D
            and lq % 8 == 0 and lkv % 8 == 0)


def _window_span(block_q: int, window: int) -> int:
    """KV columns a windowed q block touches: its band (block_q + window - 1
    columns) plus up to one lane group of left-alignment slack."""
    band = block_q + window - 1
    return (-(-band // STATS_LANES) + 1) * STATS_LANES


def _window_lo(qi, block_q: int, diag_off: int, window: int,
               lkv: int, span: int):
    """Element offset of a windowed q block's KV slice: the band's first
    visible column, aligned down to the lane group and clamped in-bounds.
    Shared by the BlockSpec index map and the in-kernel mask so both see
    the identical slice origin (``qi`` may be traced; // and clip are
    jnp-safe)."""
    lo = (qi * block_q + diag_off - window + 1) // STATS_LANES
    # multiply LAST: Mosaic's window-parameter prover must see the offset
    # as a syntactic multiple of the sublane tiling
    return jnp.clip(lo, 0, max(lkv - span, 0) // STATS_LANES) * STATS_LANES


def _v1_onepass_window_kernel(
    *refs,                      # q (1,BQ,d), k/v (1,SPAN,d), o (1,BQ,d)
                                # [, lse (1,8,BQ) when with_lse]
    scale: float,
    q_chunk: int,
    block_q: int,
    diag_off: int,              # lkv - lq
    window: int,
    seq_len_kv: int,
    span: int,
    with_lse: bool = False,
):
    """Sliding-window one-pass softmax over a dynamically-placed KV slice.

    The Element-indexed K/V BlockSpec hands each q block exactly its
    visible band [lo, lo+span) — the DMA window *slides* with the q block
    (something the streaming kernel's block-granular fetch elision can
    only approximate), so the kernel runs a complete single-pass softmax
    per strip over a constant-width band with no online state.  Work per
    strip is q_chunk x span ≈ q_chunk x (window + q_chunk) regardless of
    L: the banded generalization of _v1_onepass_causal_kernel.

    Extends the reference's non-causal surface (windows are a framework
    extension; SURVEY §2 lists no masking of any kind).  ``with_lse``
    also emits the natural-log row LSE (the training-forward residual).

    ``diag_off`` need not equal lkv - lq: a caller may place q row 0 at
    any position past the KV span (diag_off >= lkv), which turns the band
    into a *suffix band* over a disjoint past — the sequence-parallel
    window path uses this for the neighbor-tail partial
    (parallel/window.py)."""
    if with_lse:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
    qi = pl.program_id(1)
    lo = _window_lo(qi, block_q, diag_off, window, seq_len_kv, span)
    c = scale * LOG2E
    k = k_ref[0]
    v = v_ref[0]
    for q0 in range(0, block_q, q_chunk):
        rows = min(q_chunk, block_q - q0)
        q = q_ref[0, q0:q0 + rows, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q, k),
        )
        # global coordinates: row = qi*BQ + q0 + i, col = lo + j
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, span), 1) + lo
        row = (jax.lax.broadcasted_iota(jnp.int32, (rows, span), 0)
               + qi * block_q + q0 + diag_off)
        mask = jnp.logical_and(col <= row, col >= row - window + 1)
        s_m = jnp.where(mask, s * c, NEG_INF)
        m = jnp.max(s_m, axis=1, keepdims=True)
        m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
        pb = jnp.exp2(s_m - m_safe).astype(v.dtype)
        pv = jax.lax.dot_general(
            pb, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dot_precision(v),
        )
        l_raw = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
        denom = jnp.where(l_raw == 0.0, 1.0, l_raw)
        o_ref[0, q0:q0 + rows, :] = (pv / denom).astype(o_ref.dtype)
        if with_lse:
            lse = jnp.where(
                l_raw[:, 0] == 0.0, NEG_INF,
                m[:, 0] / LOG2E + jnp.log(denom[:, 0]),
            )
            lse_ref[0, :, q0:q0 + rows] = jnp.broadcast_to(
                lse[None, :], (8, rows))


def _flash_attention_v1_onepass_window(
    qf, kf, vf,                  # [n_bh, Lq, d] / [n_bh_kv, Lkv, d] x2
    scale: float,
    window: int,
    out_dtype,
    interpret: bool,
    q_chunk: Optional[int] = None,
    kv_group: int = 1,
    with_lse: bool = False,
    row_off: int = 0,
):
    n_bh, lq, d = qf.shape
    lkv = kf.shape[1]
    diag_off = lkv - lq + row_off
    # largest q block whose live strip buffers fit the scoped-VMEM budget
    block_q = 256
    for cand in (1024, 512):
        span_c = min(_window_span(cand, window), lkv)
        if lq % cand == 0 and cand * span_c * 4 <= ONEPASS_STRIP_BYTES:
            block_q = cand
            break
    block_q = min(block_q, max(lq, 8))
    span = min(_window_span(block_q, window), lkv)
    n_q = cdiv(lq, block_q)
    kernel = functools.partial(
        _v1_onepass_window_kernel,
        scale=scale,
        q_chunk=min(q_chunk or ONEPASS_Q_CHUNK, block_q),
        block_q=block_q,
        diag_off=diag_off,
        window=window,
        seq_len_kv=lkv,
        span=span,
        with_lse=with_lse,
    )

    def kv_index(bh, qi):
        return (bh // kv_group,
                _window_lo(qi, block_q, diag_off, window, lkv, span), 0)

    out_specs = pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0))
    out_shape = jax.ShapeDtypeStruct((n_bh, lq, d), out_dtype)
    if with_lse:
        out_specs = [out_specs,
                     pl.BlockSpec((1, 8, block_q), lambda bh, qi: (bh, 0, qi))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((n_bh, 8, lq), jnp.float32)]
    flops = 4 * n_bh * lq * min(window + block_q, lkv) * d
    out = pl.pallas_call(
        kernel,
        grid=(n_bh, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((pl.Element(1), pl.Element(span), pl.Element(d)),
                         kv_index),
            pl.BlockSpec((pl.Element(1), pl.Element(span), pl.Element(d)),
                         kv_index),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(n_bh * lq * d * 4
                            + 2 * n_bh * n_q * span * d
                            * kf.dtype.itemsize),
            transcendentals=n_bh * lq * span,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    if with_lse:
        return out[0], out[1][:, 0, :]
    return out


@functools.partial(
    jax.jit,
    static_argnames=("scale", "window", "q_chunk", "interpret", "row_off"),
)
def flash_attention_v1_window_partial(
    q: jax.Array,               # [B, H, Lq, d]
    k: jax.Array,               # [B, H_kv, Lkv, d]
    v: jax.Array,
    window: int,
    scale: Optional[float] = None,
    q_chunk: Optional[int] = None,
    interpret: Optional[bool] = None,
    row_off: int = 0,
):
    """Sliding-window partial forward over the full KV (decode-convention
    positions): returns (o [B,H,Lq,d] f32 normalized, lse [B,H,Lq] f32
    natural log) — the residual pair the windowed backward needs.

    ``row_off`` shifts q row 0 a further ``row_off`` positions past the
    decode convention (row j sits at position lkv - lq + row_off + j):
    with row_off = lq the q rows lie entirely AFTER the KV span and the
    call computes the suffix-band partial of the sequence-parallel window
    path (parallel/window.py) — rows whose band misses the KV span come
    back fully masked (o = 0, lse = -inf, the merge identity)."""
    b, h, lq, d = q.shape
    h_kv, lkv = k.shape[1], k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    o, lse = _flash_attention_v1_onepass_window(
        q.reshape(b * h, lq, d),
        k.reshape(b * h_kv, lkv, d),
        v.reshape(b * h_kv, lkv, d),
        scale, window, jnp.float32, _resolve_interpret(interpret),
        q_chunk=q_chunk, kv_group=h // h_kv, with_lse=True,
        row_off=row_off,
    )
    return o.reshape(b, h, lq, d), lse.reshape(b, h, lq)


def window_onepass_eligible(lq: int, lkv: int, d: int,
                            window: int) -> bool:
    """Shapes the sliding-window one-pass kernel can serve: 8-aligned
    lengths, direct-PV head dims, a genuinely banded window, and a band
    that fits the strip budget at the minimum q block."""
    # lkv must be lane-aligned: the slice's upper clamp is computed in
    # whole lane groups, so a ragged lkv could clip the band's right edge
    if not (d > PVT_MAX_D and lq % 8 == 0 and lkv % STATS_LANES == 0
            and 0 < window < lkv):
        return False
    span = min(_window_span(256, window), lkv)   # whole-KV cap: lo == 0
    return 256 * span * 4 <= ONEPASS_STRIP_BYTES \
        and span * d <= 2 * ONEPASS_MAX_KV_ELEMS


# Shift applied to the bound-softmax exponent so even a wildly loose bound
# cannot flush a whole row to zero: p <= 2^BOUND_SHIFT (sum <= 2^(SHIFT+10),
# far from f32 overflow), and all-row underflow now needs the bound to be
# loose by > 126 + BOUND_SHIFT bits — norm products ~2^(190)x the true max
# dot, unreachable for finite bf16 inputs at practical d.
BOUND_SHIFT = 64.0


def _softmax_m(s, q, k_max_sq, c, mode):
    """Per-row softmax shift statistic for a one-pass strip.

    "exact": the true row max (lane reduction over the whole strip).
    "bound": ||q_i|| * max_j ||k_j|| * scale (Cauchy-Schwarz upper bound)
    — softmax is shift-invariant and every p keeps full relative precision
    at any scale, so the only accuracy cost is the top weight losing its
    exact bf16 1.0 (measured 1.0e-3 vs 4e-4 max_abs at the canonical
    shape, scripts/proto_r4_boundmax.py); in exchange the 1024-lane
    reduce becomes a d-lane q-norm reduce plus an amortized K-norm pass
    (+6.6% kernel throughput).  ``k_max_sq`` is max_j ||k_j||^2, computed
    once per resident K."""
    if mode == "bound":
        qf32 = q.astype(jnp.float32)
        q_sq = jnp.sum(qf32 * qf32, axis=1, keepdims=True)
        return jnp.sqrt(q_sq * k_max_sq) * c - BOUND_SHIFT
    return jnp.max(s, axis=1, keepdims=True) * c


def _k_max_sq(k, mode):
    if mode != "bound":
        return None
    kf32 = k.astype(jnp.float32)
    return jnp.max(jnp.sum(kf32 * kf32, axis=1))


def _v1_onepass_fold_kernel(
    q_ref, k_ref, v_ref,        # VMEM blocks: (fold, Lq, d), (fold, Lkv, d) x2
    o_ref,                      # VMEM block:  (fold, Lq, d)
    *,
    scale: float,
    q_chunk: int,
    fold: int,
    softmax: str = "exact",
):
    """One-pass kernel computing ``fold`` heads per program with all their
    K/V resident (VERDICT r2 item 1a): 4x fewer programs amortize the
    per-program pipeline fill that dominates the headline kernel's gap to
    its matmul ceiling — measured +3-5% at B=32,H=8,L=1024,d=128
    (scripts/proto_headfold*.py: fold4 med 153 TF/s vs unfolded 145-149,
    interleaved).  Head loop unrolled (a fori_loop variant measured
    slightly slower and compiles to more VMEM traffic); only reachable
    for shapes whose folded geometry fits VMEM (see launcher gate).

    The exact path is a THREE-STAGE SOFTWARE PIPELINE over (head, strip)
    slots (round 5): strip t+1's QK^T is issued before strip t's
    max/exp2/PV, whose denominator/divide/store in turn trails one more
    slot.  Mosaic will not hoist VPU reductions across statement order on
    its own (r4's within-strip chunking moved +0.6%); this ordering plus
    a small strip (q_chunk 128) hands it the overlap explicitly —
    measured 151→158-161 TF/s at B=32,H=8,L=1024,d=128, outputs BITWISE
    identical (scripts/proto_r5_pipe.py).  The denominator's zero-guard
    is statically elided here: with an exact max the argmax element's
    shifted score is exactly 0.0 (same f32 product subtracted from
    itself), so denom = sum(pb) >= exp2(0) = 1 — there are no masked or
    padded rows on the fold path (launcher requires lq == lkv aligned,
    no GQA).  The guard's [rows,1] select measured ~2% on its own.

    ``softmax="bound"`` replaces the row-max lane reduction with the
    Cauchy-Schwarz bound (_softmax_m) — the round-4 fast path; its p_top
    can legitimately underflow, so it keeps the guard and the plain loop."""
    block_q = q_ref.shape[1]
    c = scale * LOG2E
    if softmax == "bound":
        for hh in range(fold):
            k = k_ref[hh]
            v = v_ref[hh]
            kms = _k_max_sq(k, softmax)
            for q0 in range(0, block_q, q_chunk):
                rows = min(q_chunk, block_q - q0)
                q = q_ref[hh, q0:q0 + rows, :]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(q, k),
                )
                m = _softmax_m(s, q, kms, c, softmax)
                pb = jnp.exp2(s * c - m).astype(v.dtype)
                pv = jax.lax.dot_general(
                    pb, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=dot_precision(v),
                )
                denom = jnp.sum(pb.astype(jnp.float32), axis=1,
                                keepdims=True)
                denom = jnp.where(denom == 0.0, 1.0, denom)
                o_ref[hh, q0:q0 + rows, :] = (pv / denom).astype(o_ref.dtype)
        return

    def _stage_b(hh, q0, s):
        v = v_ref[hh]
        m = jnp.max(s, axis=1, keepdims=True) * c
        pb = jnp.exp2(s * c - m).astype(v.dtype)
        pv = jax.lax.dot_general(
            pb, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(v),
        )
        return hh, q0, pb, pv

    def _stage_c(hh, q0, pb, pv):
        denom = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
        o_ref[hh, q0:q0 + pv.shape[0], :] = (pv / denom).astype(o_ref.dtype)

    qk_pend, bc_pend = [], []
    for hh in range(fold):
        for q0 in range(0, block_q, q_chunk):
            rows = min(q_chunk, block_q - q0)
            q = q_ref[hh, q0:q0 + rows, :]
            s = jax.lax.dot_general(
                q, k_ref[hh], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(q, k_ref[hh]),
            )
            qk_pend.append((hh, q0, s))
            if len(qk_pend) > 1:
                bc_pend.append(_stage_b(*qk_pend.pop(0)))
            if len(bc_pend) > 1:
                _stage_c(*bc_pend.pop(0))
    for item in qk_pend:
        bc_pend.append(_stage_b(*item))
    for item in bc_pend:
        _stage_c(*item)


def _headfold(n_bh: int, lq: int, lkv: int, d: int, kv_group: int,
              requested: Optional[int], out_bytes: int = 2,
              q_chunk: int = ONEPASS_Q_CHUNK,
              pipelined: bool = False) -> int:
    """Heads per one-pass program.  Folding needs: whole-KV single q
    block per head, no GQA block sharing, a head count the fold divides,
    aligned lengths, and a folded working set inside the VMEM budget
    (onepass_fold_vmem_bytes — pipeline blocks + live strip temporaries
    against the 16 MB scoped limit)."""
    if kv_group != 1 or lq != lkv or lq % STATS_LANES != 0:
        return 1
    fold = 4 if requested is None else requested
    while fold > 1 and (
        n_bh % fold != 0
        or onepass_fold_vmem_bytes(
            lq, lkv, d, fold, out_bytes=out_bytes, q_chunk=q_chunk,
            pipelined=pipelined,
        ) > FOLD_VMEM_BUDGET
    ):
        fold //= 2
    return max(fold, 1)


def _v1_onepass_kernel_pvt(
    q_ref, k_ref, v_ref,        # VMEM blocks: (1, BQ, d), (1, Lkv, d) x2
    o_ref,                      # VMEM block:  (1, d, BQ) — transposed!
    *,
    scale: float,
    q_chunk: int,
    seq_len_kv: int,
    softmax: str = "exact",
):
    """One-pass kernel for small head dims (d <= 32), transposed-PV form.

    At d=32 the MXU charges structurally for dark hardware: a depth-32
    contraction runs at 1/4 rate and a 32-lane output at 1/4 rate
    (measured, scripts/ab_d32_mxu_rates.py — depth-64 at 1/2 confirms
    linearity), and packing/padding schemes trade zeros for utilization
    exactly 1:1, so QK^T is pinned at 1/4 rate in every algebraic form.
    P@V is not: computed transposed (O^T = V^T @ P^T) it contracts over
    the FULL KV length with full output lanes, paying only an M=32
    streaming penalty — measured 1.7x faster per useful FLOP than the
    32-lane direct product.

    Scores are therefore computed transposed from the start and the
    softmax reduces over sublanes instead of lanes.  No transpose is ever
    materialized in-kernel: S^T and O^T come out of dot_general dimension
    numbers directly (S^T = contract d x d of (K, Q-strip); O^T = contract
    Lkv x Lkv of (V, P^T)), and the output block is written [d, BQ] with
    the final layout restore done by one XLA swapaxes in the wrapper
    (in-kernel [32, 1024] Mosaic transposes measured 2x the cost).
    Measured at B=32,H=8,L=1024,d=32: 35.0 -> 40.9 TFLOP/s.

    ``softmax="bound"`` matters MORE here than at d=128: the sublane max
    reduce over Lkv=1024 is the dominant non-MXU cost of the transposed
    form — measured 41.2 -> 54.7 TF/s (+33%, past the 49 TF/s bound the
    r2 analysis treated as the pinned-rate ceiling, which priced the MXU
    but not the reduction; scripts/proto_d32_bound.py)."""
    block_q = q_ref.shape[1]
    lkv_blk = k_ref.shape[1]
    c = scale * LOG2E
    k = k_ref[0]                                   # [Lkv, d]
    v = v_ref[0]
    needs_kv_mask = seq_len_kv % lkv_blk != 0
    if needs_kv_mask:
        # zero padded V rows: 0 * NaN would poison the P@V matmul
        vrow = jax.lax.broadcasted_iota(jnp.int32, (lkv_blk, 1), 0)
        v = jnp.where(vrow < seq_len_kv, v, jnp.zeros_like(v))
    kms = None
    if softmax == "bound":
        kb = k
        if needs_kv_mask:
            krow = jax.lax.broadcasted_iota(jnp.int32, (lkv_blk, 1), 0)
            kb = jnp.where(krow < seq_len_kv, k, jnp.zeros_like(k))
        kms = _k_max_sq(kb, softmax)
    for q0 in range(0, block_q, q_chunk):
        rows = min(q_chunk, block_q - q0)
        qc = q_ref[0, q0:q0 + rows, :]
        st = jax.lax.dot_general(
            k, qc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(k, qc),
        )                                          # [Lkv, rows] = S^T
        if needs_kv_mask:
            row = jax.lax.broadcasted_iota(jnp.int32, (lkv_blk, rows), 0)
            st = jnp.where(row < seq_len_kv, st, NEG_INF)
        if softmax == "bound":
            qf32 = qc.astype(jnp.float32)
            q_sq = jnp.sum(qf32 * qf32, axis=1)    # [rows]
            m = (jnp.sqrt(q_sq * kms) * c - BOUND_SHIFT)[None, :]
        else:
            m = jnp.max(st, axis=0, keepdims=True) * c  # [1, rows]
        p = jnp.exp2(st * c - m)
        if needs_kv_mask:
            p = jnp.where(jnp.isneginf(st), 0.0, p)
        # storage-dtype p feeds matmul and denominator; sum after the
        # matmul (headline ordering, scripts/proto_onepass10.py)
        pb = p.astype(v.dtype)
        ot = jax.lax.dot_general(
            v, pb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=dot_precision(v),
        )                                          # [d, rows] = O^T
        denom = jnp.sum(pb.astype(jnp.float32), axis=0, keepdims=True)
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0, :, q0:q0 + rows] = (ot / denom).astype(o_ref.dtype)


# transposed-PV pays off while the M=d stream is the cheaper waste; at
# d >= 64 the direct form's lane utilization (1/2) beats the transposed
# stream (measured: PV direct d=64 69.7 vs full 138.9 TFLOP/s)
PVT_MAX_D = 32

# Pipelined fold-pvt strip rows: qc512 measured best (44.2 TF/s vs 43.2
# at fold2, 39.0 at qc256 — small strips starve the d=32 MXU passes;
# scripts/proto_r5_d32_ones.py)
PVT_PIPE_Q_CHUNK = 512
PVT_PIPE_FOLD = 4


def _v1_onepass_pvt_pipe_kernel(
    q_ref, k_ref, v_ref,        # VMEM blocks: (fold, L, d) x3
    o_ref,                      # VMEM block:  (fold, d, L) — transposed
    *,
    scale: float,
    q_chunk: int,
    fold: int,
):
    """3-stage pipelined transposed-PV kernel for small head dims, exact
    softmax (round 5): the sublane max reduce over Lkv — the dominant
    non-MXU cost of the transposed form — overlaps the next strip's
    K@Q^T.  Measured 41.1 -> 44.2 TF/s at B=32,H=8,L=1024,d=32 with
    fold4/qc512; bound mode does NOT pipeline (no critical-path reduce
    to hide; measured 53.1 pipelined vs 54.9 plain) and keeps
    _v1_onepass_kernel_pvt.  The ones-row-in-V^T denominator fold was
    measured and buried: 40.5/54.5 vs 41.3/55.1 (VERDICT r4 item 6,
    scripts/proto_r5_d32_ones.py — the denominator sublane reduce
    already rides under the MXU; 8 extra output sublanes only add work).
    Zero-guard elided as in _v1_onepass_fold_kernel (exact max, no
    masked rows on this path)."""
    block_q = q_ref.shape[1]
    c = scale * LOG2E

    def _stage_b(hh, q0, st):
        m = jnp.max(st, axis=0, keepdims=True) * c
        pb = jnp.exp2(st * c - m).astype(v_ref.dtype)
        ot = jax.lax.dot_general(
            v_ref[hh], pb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(v_ref[hh]),
        )
        return hh, q0, pb, ot

    def _stage_c(hh, q0, pb, ot):
        denom = jnp.sum(pb.astype(jnp.float32), axis=0, keepdims=True)
        o_ref[hh, :, q0:q0 + ot.shape[1]] = (ot / denom).astype(o_ref.dtype)

    qk_pend, bc_pend = [], []
    for hh in range(fold):
        for q0 in range(0, block_q, q_chunk):
            rows = min(q_chunk, block_q - q0)
            qcur = q_ref[hh, q0:q0 + rows, :]
            st = jax.lax.dot_general(
                k_ref[hh], qcur, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision(k_ref[hh], qcur),
            )
            qk_pend.append((hh, q0, st))
            if len(qk_pend) > 1:
                bc_pend.append(_stage_b(*qk_pend.pop(0)))
            if len(bc_pend) > 1:
                _stage_c(*bc_pend.pop(0))
    for item in qk_pend:
        bc_pend.append(_stage_b(*item))
    for item in bc_pend:
        _stage_c(*item)


def _flash_attention_v1_onepass(
    qf, kf, vf,                  # [n_bh, L, d] / [n_bh_kv, L, d] x2
    scale: float,
    out_dtype,
    interpret: bool,
    q_chunk: Optional[int] = None,
    kv_group: int = 1,
    head_fold: Optional[int] = None,
    softmax: str = "exact",
):
    n_bh, lq, d = qf.shape
    lkv = kf.shape[1]
    block_q = min(1024, lq) if lq % 1024 == 0 or lq <= 1024 else 512
    block_q = cap_onepass_block_q(block_q, lkv)
    block_q = min(block_q, max(lq, 8))
    n_q = cdiv(lq, block_q)
    pvt = d <= PVT_MAX_D

    # Head-folded fast path: fold heads per program, K/V resident
    # (+3-5% at the canonical shape; _v1_onepass_fold_kernel docstring)
    fold_qc_default = (ONEPASS_FOLD_Q_CHUNK if softmax == "exact"
                       else ONEPASS_Q_CHUNK)
    fold = 1
    if not pvt and n_q == 1:
        fold = _headfold(n_bh, lq, lkv, d, kv_group, head_fold,
                         out_bytes=jnp.dtype(out_dtype).itemsize,
                         q_chunk=min(q_chunk or fold_qc_default, block_q),
                         pipelined=softmax == "exact")

    # Pipelined fold-pvt fast path for small head dims, exact softmax
    # (41.1 -> 44.2 TF/s at the reference's flagship d=32 shape; see
    # _v1_onepass_pvt_pipe_kernel docstring).  Same eligibility as the
    # direct fold path: aligned square lengths, no GQA block sharing.
    pvt_fold = 0
    if (pvt and n_q == 1 and kv_group == 1 and lq == lkv
            and lq % STATS_LANES == 0 and softmax == "exact"
            and head_fold != 1):
        pvt_fold = PVT_PIPE_FOLD if head_fold is None else head_fold
        while pvt_fold > 1 and n_bh % pvt_fold != 0:
            pvt_fold //= 2
    if pvt_fold > 1:
        kernel = functools.partial(
            _v1_onepass_pvt_pipe_kernel,
            scale=scale,
            q_chunk=min(q_chunk or PVT_PIPE_Q_CHUNK, block_q),
            fold=pvt_fold,
        )
        flops = 4 * n_bh * lq * lkv * d
        out = pl.pallas_call(
            kernel,
            grid=(n_bh // pvt_fold,),
            in_specs=[pl.BlockSpec((pvt_fold, lq, d),
                                   lambda i: (i, 0, 0))] * 3,
            out_specs=pl.BlockSpec((pvt_fold, d, lq), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_bh, d, lq), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(qf.size + kf.size + vf.size)
                * qf.dtype.itemsize
                + n_bh * lq * d * jnp.dtype(out_dtype).itemsize,
                transcendentals=n_bh * lq * lkv,
            ),
            interpret=interpret,
        )(qf, kf, vf)
        return out.swapaxes(1, 2)
    if fold > 1:
        kernel = functools.partial(
            _v1_onepass_fold_kernel,
            scale=scale,
            q_chunk=min(q_chunk or fold_qc_default, block_q),
            fold=fold,
            softmax=softmax,
        )
        flops = 4 * n_bh * lq * lkv * d
        return pl.pallas_call(
            kernel,
            grid=(n_bh // fold,),
            in_specs=[pl.BlockSpec((fold, lq, d), lambda i: (i, 0, 0))] * 3,
            out_specs=pl.BlockSpec((fold, lq, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_bh, lq, d), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(qf.size + kf.size + vf.size)
                * qf.dtype.itemsize
                + n_bh * lq * d * jnp.dtype(out_dtype).itemsize,
                transcendentals=n_bh * lq * lkv,
            ),
            interpret=interpret,
        )(qf, kf, vf)
    if pvt:
        # transposed-PV: whole-block strips measured fastest (fewer,
        # larger matmuls beat strip-level MXU/VPU overlap at small d)
        default_chunk = block_q
    else:
        default_chunk = ONEPASS_Q_CHUNK
    kernel = functools.partial(
        _v1_onepass_kernel_pvt if pvt else _v1_onepass_kernel,
        scale=scale,
        q_chunk=min(q_chunk or default_chunk, block_q),
        seq_len_kv=lkv,
        softmax=softmax,
    )
    if pvt:
        out_specs = pl.BlockSpec((1, d, block_q), lambda bh, qi: (bh, 0, qi))
        out_shape = jax.ShapeDtypeStruct((n_bh, d, lq), out_dtype)
    else:
        out_specs = pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0))
        out_shape = jax.ShapeDtypeStruct((n_bh, lq, d), out_dtype)
    flops = 4 * n_bh * lq * lkv * d
    out = pl.pallas_call(
        kernel,
        grid=(n_bh, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0)),
            # GQA: a q-head group's consecutive programs map to the same
            # KV block, which Pallas fetches once and re-uses
            pl.BlockSpec((1, lkv, d), lambda bh, qi: (bh // kv_group, 0, 0)),
            pl.BlockSpec((1, lkv, d), lambda bh, qi: (bh // kv_group, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize
            + n_bh * lq * d * jnp.dtype(out_dtype).itemsize,
            transcendentals=n_bh * lq * lkv,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    # restore [n_bh, L, d] from the kernel's transposed output layout
    # (one fused XLA transpose — cheaper than Mosaic in-kernel transposes)
    return out.swapaxes(1, 2) if pvt else out


@functools.partial(
    jax.jit,
    static_argnames=("config", "causal", "scale", "interpret", "out_dtype",
                     "window"),
)
def flash_attention_v1(
    q: jax.Array,               # [B, H, Lq, d]
    k: jax.Array,               # [B, H, Lkv, d]
    v: jax.Array,               # [B, H, Lkv, d]
    config: TileConfig = TileConfig(),
    scale: Optional[float] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
    out_dtype=None,
    window: Optional[int] = None,
) -> jax.Array:
    """Fused single-kernel flash attention forward on [B, H, L, d] inputs.

    ``window``: sliding-window (local) attention width — each query attends
    to its last ``window`` positions (inclusive); requires ``causal=True``.
    Tiles entirely outside the band are skipped on both sides.

    GQA: ``k``/``v`` may carry fewer heads than ``q`` (H % H_kv == 0); the
    q-head group shares its KV head natively — the K/V BlockSpecs point
    the group's programs at the same block (``bh // group``), so no
    repeated KV is materialized in HBM (the ``jnp.repeat`` a caller would
    otherwise need), and on the one-pass path consecutive programs of a
    group re-use the fetched block outright."""
    b, h, lq, d = q.shape
    h_kv = k.shape[1]
    lkv = k.shape[2]
    if (k.shape != (b, h_kv, lkv, d) or v.shape != (b, h_kv, lkv, d)
            or h % h_kv != 0):
        raise ValueError(f"shape mismatch: q={q.shape} k={k.shape} v={v.shape}")
    kv_group = h // h_kv
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        if window >= lkv:
            window = None   # band covers every key: plain causal
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    out_dtype = out_dtype or q.dtype

    block_q = min(config.block_q, max(lq, 8))
    block_kv = min(config.block_kv, max(lkv, 8))
    n_bh = b * h
    n_q = cdiv(lq, block_q)
    n_kv = cdiv(lkv, block_kv)

    qf = q.reshape(n_bh, lq, d)
    kf = k.reshape(b * h_kv, lkv, d)
    vf = v.reshape(b * h_kv, lkv, d)

    # Fast path: whole-KV-resident one-pass softmax (no online state, no
    # accumulator read-modify-write) whenever KV fits VMEM (~1.3x over
    # streaming non-causal, 1.7-2.25x causal via static strip truncation;
    # scripts/proto_onepass*.py, ab_causal_onepass.py).  config.one_pass
    # overrides: False always streams, True requires eligibility.
    eligible = not causal and fits_onepass(lkv, d)
    # Causal one-pass: static per-strip KV truncation does the FLOP halving
    # without online-softmax state (see _v1_onepass_causal_kernel).  Needs
    # lane-sliceable lengths and a head dim on the direct-PV path.
    causal_eligible = (
        causal and window is None and fits_onepass(lkv, d)
        and d > PVT_MAX_D and lq % 8 == 0 and lkv % 8 == 0
    )
    win_eligible = (causal and window is not None
                    and window_onepass_eligible(lq, lkv, d, window))
    if config.one_pass and not (eligible or causal_eligible or win_eligible):
        raise ValueError(
            "one_pass=True requires a call whose KV (or window band) fits "
            f"VMEM with 8-aligned lengths; got L_kv={lkv}, d={d}, "
            f"causal={causal}, window={window}"
        )
    if eligible and config.one_pass is not False:
        out = _flash_attention_v1_onepass(
            qf, kf, vf, scale, out_dtype, _resolve_interpret(interpret),
            q_chunk=config.q_chunk, kv_group=kv_group,
            head_fold=config.head_fold, softmax=config.softmax,
        )
        return out.reshape(b, h, lq, d)
    if causal_eligible and config.one_pass is not False:
        out = _flash_attention_v1_onepass_causal(
            qf, kf, vf, scale, out_dtype, _resolve_interpret(interpret),
            q_chunk=config.q_chunk, kv_group=kv_group,
            softmax=config.softmax,
        )
        return out.reshape(b, h, lq, d)

    # Sliding-window one-pass: the Element-indexed KV band slides with the
    # q block, so this path works at ANY L (the band, not the whole KV,
    # must fit VMEM) — unlike fits_onepass.
    if win_eligible and config.one_pass is not False:
        if config.softmax == "bound":
            # round-4 ADVICE: don't silently run the exact kernel when the
            # caller opted into the bound statistic — the windowed
            # one-pass kernel does not implement it (its per-strip band
            # spans make the amortized K-norm pass a different design)
            import warnings

            warnings.warn(
                "softmax='bound' is not implemented on the windowed "
                "one-pass path; running the exact kernel",
                stacklevel=2,
            )
        out = _flash_attention_v1_onepass_window(
            qf, kf, vf, scale, window, out_dtype,
            _resolve_interpret(interpret),
            q_chunk=config.q_chunk, kv_group=kv_group,
        )
        return out.reshape(b, h, lq, d)

    # Long-KV unification: a non-causal KV beyond the one-pass VMEM budget
    # is still fastest through the span-local one-pass split-KV pair
    # (~104 vs ~67 TFLOP/s streaming at L_kv=8192/d=128) — the best kernel
    # for a shape must not depend on which API the caller picked, so route
    # it here instead of falling back to the streaming kernel.  Mirrors the
    # reference's own V1-vs-V2 crossover guidance
    # (/root/reference/flash_attention_v2/README.md: V1-vs-V2 table).
    if (not causal and config.one_pass is not False
            and not fits_onepass(lkv, d)):
        span = onepass_span(lkv, d, block_kv)
        if span is not None:
            if config.softmax == "bound":
                # round-4 ADVICE: the span-local split-KV pair runs exact
                # softmax per span; tell the caller instead of silently
                # misattributing a benchmark to the bound path
                import warnings

                warnings.warn(
                    "softmax='bound' is not implemented on the long-KV "
                    "one-pass split-KV route; running the exact kernels",
                    stacklevel=2,
                )
            # local import: attention_v2_splitkv imports helpers from here
            from exploring_flash_attention_tpu.ops.attention_v2_splitkv \
                import flash_attention_splitkv_partial, splitkv_combine

            span_cfg = SplitKVConfig(
                block_q=config.block_q,
                block_kv=block_kv,
                one_pass=config.one_pass,
                q_chunk=config.q_chunk,
                kv_tiles_per_block=span // block_kv,
            )
            o_part, lse = flash_attention_splitkv_partial(
                q, k, v, config=span_cfg, scale=scale,
                interpret=interpret, workspace_dtype=q.dtype,
            )
            return splitkv_combine(
                o_part, lse, block_q=config.block_q, out_dtype=out_dtype,
                interpret=interpret,
            )

    kernel = functools.partial(
        _v1_kernel,
        scale=scale,
        block_q=block_q,
        block_kv=block_kv,
        seq_len_q=lq,
        seq_len_kv=lkv,
        causal=causal,
        window=window,
        softmax=config.softmax,
    )

    # bound softmax on the streaming path (_v1_kernel docstring): one XLA
    # pass over K computes per-tile maxima of ||k_j||^2, a cummax makes
    # them prefix maxima, and each q block gets the prefix max over its
    # VISIBLE tiles.  Causal bound outputs are therefore bit-invariant to
    # future tokens at whole-KV-TILE granularity only (the last visible
    # tile's max sees the full tile, not each row's prefix of it) —
    # per-token invariance needs softmax="exact", as on the one-pass
    # path.  ~one extra K read of HBM, amortized over the whole kernel.
    pk_in = None
    if config.softmax == "bound":
        ksq = jnp.sum(kf.astype(jnp.float32) ** 2, axis=2)  # [n_bh_kv, lkv]
        pad = n_kv * block_kv - lkv
        if pad:
            ksq = jnp.pad(ksq, ((0, 0), (0, pad)))          # zeros: safe
        tile_max = jnp.max(
            ksq.reshape(kf.shape[0], n_kv, block_kv), axis=2)
        pk = jax.lax.cummax(tile_max, axis=1)               # [n_bh_kv, n_kv]
        if causal:
            diag = lkv - lq
            idx = [max(0, min(n_kv - 1,
                              ((qi + 1) * block_q - 1 + diag) // block_kv))
                   for qi in range(n_q)]
        else:
            idx = [n_kv - 1] * n_q
        pk_blk = pk[:, jnp.asarray(idx, jnp.int32)]         # [n_bh_kv, n_q]
        pk_in = jnp.broadcast_to(
            pk_blk[:, :, None, None], (kf.shape[0], n_q, 8, 128))

    # Causal/windowed K/V index maps clamp to the visible tile range for
    # each q block: tiles the kernel skips via pl.when would otherwise
    # still stream their (dead) K/V blocks from HBM — a repeated block
    # index makes Pallas elide the fetch entirely (≈2x HBM traffic saved
    # for causal, more for narrow windows).
    if causal:
        diag_off = lkv - lq

        def kv_block_index(bh, qi, ki):
            vis_max = ((qi + 1) * block_q - 1 + diag_off) // block_kv
            vis_max = jnp.clip(vis_max, 0, n_kv - 1)
            ki_eff = jnp.minimum(ki, vis_max)
            if window is not None:
                vis_min = jnp.maximum(
                    (qi * block_q + diag_off - window + 1) // block_kv, 0
                )
                ki_eff = jnp.maximum(ki_eff, vis_min)
            return (bh // kv_group, ki_eff, 0)
    else:
        def kv_block_index(bh, qi, ki):
            return (bh // kv_group, ki, 0)

    flops = 4 * n_bh * lq * lkv * d
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        pl.BlockSpec((1, block_kv, d), kv_block_index),
        pl.BlockSpec((1, block_kv, d), kv_block_index),
    ]
    operands = [qf, kf, vf]
    if pk_in is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, 8, STATS_LANES),
            lambda bh, qi, ki: (bh // kv_group, qi, 0, 0)))
        operands.append(pk_in)
    out = pl.pallas_call(
        kernel,
        grid=(n_bh, n_q, n_kv),
        in_specs=in_specs,
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
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize
            + n_bh * lq * d * jnp.dtype(out_dtype).itemsize,
            transcendentals=n_bh * lq * lkv,
        ),
        interpret=_resolve_interpret(interpret),
    )(*operands)
    return out.reshape(b, h, lq, d)
