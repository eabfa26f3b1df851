"""Paged decode attention kernel (flash-decoding over the INT8 paged cache).

One generated token per sequence attends over that sequence's whole paged
KV history.  This is the reference's split-KV V2 forward specialized to
Lq=1 and lifted onto the paged cache: the KV "tiles" are pages found
through the page table (scalar-prefetched so DMA addresses are known ahead
of the loop — PrefetchScalarGridSpec, the pattern SURVEY §7 flags for
paged gather), streamed HBM->VMEM with a deep prefetch window, and
folded into the online-softmax state.

Flat decode: ONE program walks a flattened (sequence, page) work list for
the whole batch, so the DMA prefetch window stays full ACROSS sequence
boundaries.  A one-program-per-sequence grid refills the window from empty
at every program start, exposing first-page HBM latency once per sequence
(measured: ~55us of the 220us step at B=32/ctx=2048 — 25% over the
cache-read floor); the flat work list exposes it exactly once per step.
Per-sequence softmax state lives in the loop carry and is finalized into
the output row whenever the work list crosses a sequence boundary.

The work list itself is built by an in-kernel scalar prepass over the raw
(page_table, seq_lens, seq_slots) scalar-prefetch arrays into SMEM scratch
— building it with XLA ops in the wrapper measured ~28us/step of small
gather/cumsum/scatter kernels, swamping the win at B=32; the scalar core
does the same walk in ~1us while the vector core has nothing else to do.

The packed page layout ([n_pages, 2, Hkv, ps, d], serving/kv_cache.py)
makes one page index a single contiguous (2, Hkv, ps, d) DMA carrying
every head's K AND V, plus one small DMA for both scale vectors — 2 DMAs
per page where an unpacked (k, v, k_scales, v_scales) layout costs 4.
This is the TPU analog of the reference's vectorized-width copy selection
(flash_attention_v1/CUDA/load_shared_memory.h:37-51 picks the widest
legal transfer — here the widest transfer is "the whole page, K and V").

Fused INT8 dequant with per-token scales:
  - K: scores S = (q K_page^T) * softmax_scale, then S *= k_scale[col]
       (column-broadcast multiply — scales fold into S, not the operands);
  - V: probabilities P *= v_scale[col] before P @ V_page.

GQA-ready: q heads are grouped per KV head; the group dimension G fills
MXU rows.  Decode is HBM-bandwidth-bound (the cost is reading the cache
once), which INT8 pages halve relative to bf16.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.configs import cdiv
from exploring_flash_attention_tpu.ops.attention_v1 import (
    NEG_INF,
    _resolve_interpret,
)
from exploring_flash_attention_tpu.serving.kv_cache import PagedKVCache

N_BUF = 8          # prefetch window depth (pages in flight)

# The paged kernels DMA whole (2, Hkv/pack, ps, d*pack) pages: on real
# hardware Mosaic requires the page's last dim to be lane-aligned, which
# the cache's head packing guarantees whenever 128 % d == 0 and
# Hkv % (128/d) == 0 (kv_cache.head_pack_for) — d=64 and d=32 now run on
# the chip (round 5, VERDICT r4 item 2).  Geometries that cannot pack
# (e.g. MQA Hkv=1 with d=64) keep head_pack=1 and run interpret-only.
# Page size must be a 128 multiple for the same reason
# (kv_cache.make_cache enforces it).


def _decode_kernel(
    # scalar prefetch
    pt_ref,                      # int32 [max_seqs * max_pages] page table
    sl_ref,                      # int32 [max_seqs] sequence lengths
    slots_ref,                   # int32 [B] cache slot per batch row
    # tensor inputs
    q_ref,                       # VMEM (B, Hkv/pk, pk*G, pk*d) block-diag
    kvp_ref,                     # ANY [n_pages, 2, Hkv/pk, ps, pk*d] int8
    kvs_ref,                     # ANY [n_pages, 2, Hkv, 1, ps] f32
    # output
    o_ref,                       # VMEM (B, Hkv, G, d)
    # scratch
    fpage,                       # SMEM (B * max_pages) work list: page id
    fmeta,                       # SMEM (B * max_pages) seq | last | ntok
    fskip,                       # SMEM (B * max_pages) first visible token
    kv_buf,                      # VMEM (N_BUF, 2, Hkv/pk, ps, pk*d) int8
    sc_buf,                      # VMEM (N_BUF, 2, Hkv, 1, ps) f32
    sems,                        # DMA (2, N_BUF)
    *,
    scale: float,
    page_size: int,
    max_pages: int,
    batch: int,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    compute_dtype,
    window: Optional[int] = None,
    head_pack: int = 1,
    n_buf: int = N_BUF,
):
    ps = page_size
    # zero-length sequences produce no work-list entries; pre-zero the
    # whole output so they emit zeros
    o_ref[...] = jnp.zeros_like(o_ref)

    # ---- scalar prepass: flatten (batch row, page) into the work list.
    # fmeta packs (seq << 16) | (last << 15) | ntok  — ntok <= ps <= 16K.
    def fill_seq(s, cnt):
        slot = slots_ref[s]
        sl = sl_ref[slot]
        np_s = jax.lax.div(sl + ps - 1, ps)
        # sliding window: the new token (position sl-1) attends to the
        # last `window` positions only — pages wholly before the band are
        # never listed (decode cost O(window), not O(ctx)), and the first
        # in-band page records where the band starts inside it
        first_vis = jnp.maximum(sl - window, 0) if window is not None \
            else jnp.int32(0)
        j0 = jax.lax.div(first_vis, ps)

        def fill_page(j, cnt):
            ntok = jnp.minimum(sl - j * ps, ps)
            last = jnp.where(j == np_s - 1, 1, 0)
            fpage[cnt] = pt_ref[slot * max_pages + j]
            fmeta[cnt] = (s << 16) | (last << 15) | ntok
            fskip[cnt] = jnp.maximum(first_vis - j * ps, 0)
            return cnt + 1

        return jax.lax.fori_loop(j0, np_s, fill_page, cnt)

    n_total = jax.lax.fori_loop(0, batch, fill_seq, jnp.int32(0))

    def dma(slot, i):
        page_id = fpage[i]
        return [
            pltpu.make_async_copy(
                kvp_ref.at[page_id], kv_buf.at[slot], sems.at[0, slot]
            ),
            pltpu.make_async_copy(
                kvs_ref.at[page_id], sc_buf.at[slot], sems.at[1, slot]
            ),
        ]

    # fill the prefetch window once for the WHOLE batch (decode is
    # DMA-latency-bound; keep n_buf page transfers in flight)
    for w in range(n_buf):
        @pl.when(w < n_total)
        def _start(w=w):
            for d_ in dma(w, w):
                d_.start()

    hg = num_kv_heads * group

    def page_step(i, carry):
        m, l, acc = carry                      # (Hkv*G, 1) x2, (Hkv*G, d)
        slot = jax.lax.rem(i, n_buf)

        for d_ in dma(slot, i):
            d_.wait()

        meta = fmeta[i]
        seq = meta >> 16
        n_tok = meta & 0x7FFF
        q = q_ref[seq]                                 # (Hkv/pk, pk*G, pk*d)

        # read everything out of the slot BEFORE re-targeting its DMA
        k_scale = sc_buf[slot, 0][:, 0, :]             # (Hkv, ps)
        v_scale = sc_buf[slot, 1][:, 0, :]
        # per-packed-row scores: q is block-diagonal over the pack, so one
        # MXU dot against a packed K row yields every packed head's
        # scores (cross-head lanes hit zeros); rows come out head-major
        n_hp = num_kv_heads // head_pack
        s_heads = [
            jax.lax.dot_general(
                q[ph], kv_buf[slot, 0, ph].astype(compute_dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for ph in range(n_hp)
        ]                                              # each (pk*G, ps)
        v_rows = [kv_buf[slot, 1, ph].astype(compute_dtype)
                  for ph in range(n_hp)]

        # slot fully read — start its next transfer while we compute
        @pl.when(i + n_buf < n_total)
        def _prefetch():
            for d_ in dma(slot, i + n_buf):
                d_.start()

        s = jnp.concatenate(s_heads, axis=0)           # (Hkv*G, ps)
        ks_b = (jnp.repeat(k_scale, group, axis=0)
                if group > 1 else k_scale)
        vs_b = (jnp.repeat(v_scale, group, axis=0)
                if group > 1 else v_scale)
        s = s * scale * ks_b
        col = jax.lax.broadcasted_iota(jnp.int32, (hg, page_size), 1)
        vis = col < n_tok
        if window is not None:
            vis = jnp.logical_and(vis, col >= fskip[i])
        s = jnp.where(vis, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.where(jnp.isneginf(m_new), 0.0, jnp.exp(m - m_new))
        p = jnp.exp(s - m_new)
        p = jnp.where(jnp.isneginf(s), 0.0, p)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        p = p * vs_b                                   # fold V scales into P
        p_lp = p.astype(compute_dtype)
        # packed PV: each packed V row carries pk heads' values side by
        # side; the accumulator stays PACKED (pk*d lanes, only each
        # head's own d-slice meaningful) and is sliced once per sequence
        # at finalize — never in the per-page loop (sub-128-lane slices
        # are relayouts)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                p_lp[ph * head_pack * group:(ph + 1) * head_pack * group],
                v_rows[ph],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for ph in range(n_hp)
        ], axis=0)                                     # (Hkv*G, pk*d)
        acc = acc * alpha + pv

        # sequence boundary: finalize this row and reset the carry
        is_last = (meta >> 15) & 1 == 1

        @pl.when(is_last)
        def _finalize():
            denom = jnp.where(l == 0.0, 1.0, l)
            on = acc / denom
            if head_pack == 1:
                o_ref[seq] = on.reshape(
                    num_kv_heads, group, head_dim).astype(o_ref.dtype)
            else:
                o_ref[seq] = jnp.stack([
                    on[kh * group:(kh + 1) * group,
                       (kh % head_pack) * head_dim:
                       (kh % head_pack + 1) * head_dim]
                    for kh in range(num_kv_heads)
                ], axis=0).astype(o_ref.dtype)

        m = jnp.where(is_last, jnp.full_like(m_new, NEG_INF), m_new)
        l = jnp.where(is_last, jnp.zeros_like(l), l)
        acc = jnp.where(is_last, jnp.zeros_like(acc), acc)
        return m, l, acc

    m0 = jnp.full((hg, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((hg, 1), jnp.float32)
    acc0 = jnp.zeros((hg, head_dim * head_pack), jnp.float32)
    jax.lax.fori_loop(0, n_total, page_step, (m0, l0, acc0))


def _extend_kernel(
    # scalar prefetch
    pt_ref,                      # int32 [max_seqs * max_pages] page table
    sl_ref,                      # int32 [max_seqs] sequence lengths
    slots_ref,                   # int32 [B] cache slot per batch row
    # tensor inputs
    q_ref,                       # VMEM (1, Hkv/pk, pk*C*G, pk*d) block-diag
    kvp_ref,                     # ANY [n_pages, 2, Hkv/pk, ps, pk*d] int8
    kvs_ref,                     # ANY [n_pages, 2, Hkv, 1, ps] f32
    # output
    o_ref,                       # VMEM (1, Hkv, G*C, d)
    # scratch
    kv_buf,                      # VMEM (N_BUF, 2, Hkv/pk, ps, pk*d) int8
    sc_buf,                      # VMEM (N_BUF, 2, Hkv, 1, ps) f32
    sems,                        # DMA (2, N_BUF)
    *,
    scale: float,
    page_size: int,
    max_pages: int,
    n_new: int,                  # C — chunk rows per sequence
    num_kv_heads: int,
    group: int,
    head_dim: int,
    compute_dtype,
    window: Optional[int] = None,
    head_pack: int = 1,
    n_buf: int = N_BUF,
):
    """Chunked-prefill ("extend") attention over the paged INT8 cache.

    One program per sequence: C new tokens (already appended to the cache,
    so they read themselves quantized — decode-consistent numerics) attend
    causally over the whole paged history.  The page stream reuses the
    decode kernel's N_BUF-deep manual-DMA prefetch; unlike decode this is
    compute-bound (C x ctx FLOPs), so per-sequence programs pipeline the
    first-page latency across the grid instead of the flat work list.

    The banded generalization of the reference's split-KV forward to the
    serving cache (flash_attention_v2/CUDA/flash_attention_v2.h grid over
    KV blocks), plus causal masking on the chunk's own pages."""
    ps = page_size
    s_id = pl.program_id(0)
    slot = slots_ref[s_id]
    sl = sl_ref[slot]                       # includes the appended chunk
    np_s = jax.lax.div(sl + ps - 1, ps)
    q_start = sl - n_new                    # global pos of chunk row 0
    first_vis = (jnp.maximum(q_start - window + 1, 0)
                 if window is not None else jnp.int32(0))
    j0 = jax.lax.div(first_vis, ps)

    def dma(buf, j):
        page_id = pt_ref[slot * max_pages + j]
        return [
            pltpu.make_async_copy(
                kvp_ref.at[page_id], kv_buf.at[buf], sems.at[0, buf]
            ),
            pltpu.make_async_copy(
                kvs_ref.at[page_id], sc_buf.at[buf], sems.at[1, buf]
            ),
        ]

    for w in range(n_buf):
        @pl.when(j0 + w < np_s)
        def _start(w=w):
            for d_ in dma(w, j0 + w):
                d_.start()

    hg = num_kv_heads * group
    rows = hg * n_new
    # q rows are laid out [Hkv, C*G]: row r of head kh covers chunk
    # position r // G — its global position is q_start + r // G
    row_pos = (jax.lax.broadcasted_iota(jnp.int32, (n_new * group, ps), 0)
               // group) + q_start

    def page_step(j, carry):
        m, l, acc = carry           # (rows, 1) x2, (rows, d)
        buf = jax.lax.rem(j - j0, n_buf)
        for d_ in dma(buf, j):
            d_.wait()

        n_tok = jnp.minimum(sl - j * ps, ps)
        k_scale = sc_buf[buf, 0][:, 0, :]              # (Hkv, ps)
        v_scale = sc_buf[buf, 1][:, 0, :]
        # packed rows (head_pack heads per lane row): one dot per packed
        # row, then static row-slices recover per-head score blocks
        n_hp = num_kv_heads // head_pack
        cg = n_new * group
        s_packed = [
            jax.lax.dot_general(
                q_ref[0, ph], kv_buf[buf, 0, ph].astype(compute_dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for ph in range(n_hp)
        ]                                              # each (pk*C*G, ps)
        s_heads = [
            s_packed[kh // head_pack][
                (kh % head_pack) * cg:(kh % head_pack + 1) * cg]
            for kh in range(num_kv_heads)
        ]                                              # each (C*G, ps)
        v_rows = [kv_buf[buf, 1, ph].astype(compute_dtype)
                  for ph in range(n_hp)]

        @pl.when(j + n_buf < np_s)
        def _prefetch():
            for d_ in dma(buf, j + n_buf):
                d_.start()

        col = (jax.lax.broadcasted_iota(
            jnp.int32, (n_new * group, ps), 1) + j * ps)
        vis = jnp.logical_and(col <= row_pos, col - j * ps < n_tok)
        if window is not None:
            vis = jnp.logical_and(vis, col >= row_pos - window + 1)

        outs_m, outs_l, outs_acc = [], [], []
        for kh in range(num_kv_heads):
            sk = s_heads[kh] * scale * k_scale[kh][None, :]
            sk = jnp.where(vis, sk, NEG_INF)
            r0 = kh * n_new * group
            m_h = m[r0:r0 + n_new * group]
            l_h = l[r0:r0 + n_new * group]
            a_h = acc[r0:r0 + n_new * group]
            m_new = jnp.maximum(m_h, jnp.max(sk, axis=1, keepdims=True))
            alpha = jnp.where(jnp.isneginf(m_new), 0.0,
                              jnp.exp(m_h - m_new))
            p = jnp.exp(sk - m_new)
            p = jnp.where(jnp.isneginf(sk), 0.0, p)
            l_h = l_h * alpha + jnp.sum(p, axis=1, keepdims=True)
            p = p * v_scale[kh][None, :]
            # packed accumulator (pk*d lanes; own d-slice extracted once
            # at finalize, not in the page loop)
            pv = jax.lax.dot_general(
                p.astype(compute_dtype), v_rows[kh // head_pack],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs_m.append(m_new)
            outs_l.append(l_h)
            outs_acc.append(a_h * alpha + pv)
        return (jnp.concatenate(outs_m, axis=0),
                jnp.concatenate(outs_l, axis=0),
                jnp.concatenate(outs_acc, axis=0))

    m0 = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, head_dim * head_pack), jnp.float32)
    m, l, acc = jax.lax.fori_loop(j0, np_s, page_step, (m0, l0, acc0))
    denom = jnp.where(l == 0.0, 1.0, l)
    on = acc / denom
    cg_rows = n_new * group
    if head_pack == 1:
        o_ref[0] = on.reshape(
            num_kv_heads, cg_rows, head_dim).astype(o_ref.dtype)
    else:
        o_ref[0] = jnp.stack([
            on[kh * cg_rows:(kh + 1) * cg_rows,
               (kh % head_pack) * head_dim:(kh % head_pack + 1) * head_dim]
            for kh in range(num_kv_heads)
        ], axis=0).astype(o_ref.dtype)


# One-pass extend applies when the kernel's whole estimated VMEM working
# set (extend_onepass_vmem_bytes: double-buffered int8 pages + scale
# buffers + one head's dequantized K/V + live f32 score strips) fits this
# budget — 14 MB of the 16 MB scoped-vmem limit, the rest left for the
# q/o pipeline blocks.  Beyond it the page-streaming _extend_kernel takes
# over.  (Round-4 ADVICE fix: the old gate bounded only the page buffer,
# so a low-Hkv cache with a long Lmax — whose per-head strips scale with
# Lmax independent of Hkv — could pass the gate yet OOM at compile.)
EXTEND_ONEPASS_MAX_BYTES = 14 * 1024 * 1024
# 128-row score strips keep the f32 (rows, Lmax) temporaries ~1 MB so the
# resident double-buffered pages + pipeline blocks stay inside the 16 MB
# scoped-vmem limit (256-row strips measured 20.6 MB > 16 MB at the cap)
EXTEND_Q_STRIP = 128
_LOG2E = math.log2(math.e)


def extend_onepass_vmem_bytes(cache, q_dtype) -> int:
    """Estimated scoped-VMEM working set of _extend_onepass_kernel.

    Sums the buffers the kernel actually holds live: the double-buffered
    int8 page scratch (2 seq buffers x (K+V) x Hkv x Lmax x d), the
    matching f32 scale scratch, and — the Lmax-scaled per-head terms the
    pre-round-4 gate missed — one KV head's dequantized K and V
    ((Lmax, d) in compute dtype each) plus the two live f32 score strips
    ((EXTEND_Q_STRIP, Lmax): S and P)."""
    lmax = cache.max_pages_per_seq * cache.page_size
    d = cache.head_dim
    kv_buf = 2 * 2 * cache.num_kv_heads * lmax * d \
        * jnp.dtype(cache.kv_pages.dtype).itemsize
    sc_buf = 2 * 2 * cache.num_kv_heads * lmax * 4
    # one PACKED row's dequantized K/V: head_pack heads share the row,
    # so the per-iteration live set scales with pack*d
    per_head = 2 * lmax * d * cache.head_pack * jnp.dtype(q_dtype).itemsize
    strips = 2 * EXTEND_Q_STRIP * lmax * 4
    return kv_buf + sc_buf + per_head + strips


def _extend_onepass_kernel(
    # scalar prefetch
    pt_ref,                      # int32 [max_seqs * max_pages] page table
    sl_ref,                      # int32 [max_seqs] sequence lengths
    slots_ref,                   # int32 [B] cache slot per batch row
    # tensor inputs
    q_ref,                       # VMEM (1, Hkv/pk, pk*C*G, pk*d) block-diag
    kvp_ref,                     # ANY [n_pages, 2, Hkv/pk, ps, pk*d] int8
    kvs_ref,                     # ANY [n_pages, 2, Hkv, 1, ps] f32
    # output
    o_ref,                       # VMEM (1, Hkv, C*G, d)
    # scratch
    kv_buf,                      # VMEM (2, 2, Hkv/pk, max_pages, ps, pk*d)
    sc_buf,                      # VMEM (2, 2, Hkv, max_pages, 1, ps) f32
    sems,                        # DMA (2, 2, max_pages)
    *,
    scale: float,
    page_size: int,
    max_pages: int,
    n_new: int,                  # C — chunk rows per sequence
    num_kv_heads: int,
    group: int,
    head_dim: int,
    compute_dtype,
    window: Optional[int] = None,
    head_pack: int = 1,
    q_strip: int = EXTEND_Q_STRIP,
):
    """One-pass chunked-prefill attention: the whole visible span resident.

    The streaming _extend_kernel pays an online-softmax update (max/alpha
    rescale of the (rows, d) accumulator + exp over the strip) every
    ``ps`` columns — the per-page VPU rescans cap it near the streaming
    kernel's rate (measured 55.7 TF/s, VERDICT r2 item 5).  Here ALL of a
    sequence's pages are DMA'd up front into a per-sequence buffer, and
    each head runs a single-pass softmax over the full (Lmax = max_pages
    x ps) span — the paged-int8 form of the one-pass discipline the
    headline kernel uses (ops/attention_v1.py:_v1_onepass_kernel).

    The buffer is double-buffered at SEQUENCE granularity: program s
    starts sequence s+1's page DMAs before computing sequence s, so the
    next span's HBM transfer (~5us at ctx=2048 int8) hides under the
    current span's MXU time (~7us) instead of serializing with it.
    Programs run sequentially on the core ("arbitrary" semantics), so the
    buffer handoff is race-free: s+1 writes the half that s-1 (already
    finished) computed from.

    Masked columns are computed and discarded (the span is the STATIC
    Lmax, the price of one-pass residency); the launcher gates on the
    working set fitting VMEM and the streaming kernel keeps longer
    histories.  Garbage in never-DMA'd scratch (slots >= np_s - j0) is
    neutralized by the visibility select on S (covers NaN k-scales) and a
    zeroing select on the V-scale vector (a 0 * NaN guard)."""
    ps = page_size
    lmax = max_pages * ps
    b = pl.num_programs(0)
    s_id = pl.program_id(0)
    db = jax.lax.rem(s_id, 2)

    def seq_params(sid):
        slot = slots_ref[sid]
        sl = sl_ref[slot]
        np_s = jax.lax.div(sl + ps - 1, ps)
        if window is not None:
            first_vis = jnp.maximum(sl - n_new - window + 1, 0)
        else:
            first_vis = jnp.int32(0)
        return slot, sl, np_s, jax.lax.div(first_vis, ps)

    def copies(buf, slot, j, idx):
        page_id = pt_ref[slot * max_pages + j]
        return [
            pltpu.make_async_copy(
                kvp_ref.at[page_id], kv_buf.at[buf, :, :, idx],
                sems.at[0, buf, idx]),
            pltpu.make_async_copy(
                kvs_ref.at[page_id], sc_buf.at[buf, :, :, idx],
                sems.at[1, buf, idx]),
        ]

    def start_seq(sid, buf):
        slot, _, np_s, j0 = seq_params(sid)

        def body(j, _):
            for c_ in copies(buf, slot, j, j - j0):
                c_.start()
            return 0

        jax.lax.fori_loop(j0, np_s, body, 0)

    @pl.when(s_id == 0)
    def _first():
        start_seq(0, 0)

    @pl.when(s_id + 1 < b)
    def _next():
        start_seq(s_id + 1, jax.lax.rem(s_id + 1, 2))

    slot, sl, np_s, j0 = seq_params(s_id)

    def wait_body(j, _):
        for c_ in copies(db, slot, j, j - j0):
            c_.wait()
        return 0

    jax.lax.fori_loop(j0, np_s, wait_body, 0)

    q_start = sl - n_new
    base = j0 * ps               # global position of buffer column 0
    rows_all = n_new * group

    # fori_loop (not an unrolled Python loop) over KV heads: unrolling let
    # Mosaic keep every head's dequantized K/V copies live at once —
    # measured 20.8 MB of scoped vmem at Hkv=8/ctx=2048, over the 16 MB
    # stack limit; the loop bounds the live set to one head's working set
    def head_step(ph, _):
        k_all = kv_buf[db, 0, ph].reshape(lmax, head_dim * head_pack)
        v_all = kv_buf[db, 1, ph].reshape(
            lmax, head_dim * head_pack).astype(compute_dtype)
        kb = k_all.astype(compute_dtype)
        col_v = jax.lax.broadcasted_iota(jnp.int32, (1, lmax), 1) + base
        # (A bound-softmax variant — replacing the row max with the
        # Cauchy-Schwarz K-norm bound as in ops/attention_v1.py — was
        # measured HERE at 63.8 vs 118.3 TF/s and reverted: the f32
        # K-norm pass over the whole resident span per head upsets the
        # kernel's VMEM/pipeline balance, round-4 A/B via
        # bench/suite.py extend_prefill.)
        for s_i in range(head_pack):      # static: true head in the pack
            kh = ph * head_pack + s_i
            # fold softmax scale and the exp2 basis into the per-column K
            # scale: S2 = (q k^T) * (scale * log2e * k_scale[col])
            k_sc = sc_buf[db, 0, kh].reshape(1, lmax) * (scale * _LOG2E)
            v_sc = jnp.where(col_v < sl,
                             sc_buf[db, 1, kh].reshape(1, lmax), 0.0)
            for r0 in range(0, rows_all, q_strip):
                rr = min(q_strip, rows_all - r0)
                qs = q_ref[0, ph,
                           s_i * rows_all + r0:s_i * rows_all + r0 + rr, :]
                s = jax.lax.dot_general(
                    qs, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * k_sc                                  # (rr, lmax)
                col = (jax.lax.broadcasted_iota(jnp.int32, (rr, lmax), 1)
                       + base)
                row_pos = (jax.lax.broadcasted_iota(
                    jnp.int32, (rr, lmax), 0) + r0) // group + q_start
                vis = col <= row_pos  # row_pos <= sl-1 implies col < sl
                if window is not None:
                    vis = jnp.logical_and(vis, col >= row_pos - window + 1)
                s = jnp.where(vis, s, NEG_INF)
                m = jnp.max(s, axis=1, keepdims=True)
                m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
                p = jnp.exp2(s - m_safe)
                l = jnp.sum(p, axis=1, keepdims=True)
                pv = jax.lax.dot_general(
                    (p * v_sc).astype(compute_dtype), v_all,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                         # (rr, pk*d)
                if head_pack > 1:
                    # once per strip (not per page): extract this head's
                    # d-lane slice of the packed PV
                    pv = pv[:, s_i * head_dim:(s_i + 1) * head_dim]
                denom = jnp.where(l == 0.0, 1.0, l)
                o_ref[0, kh, r0:r0 + rr, :] = (
                    pv / denom).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_kv_heads // head_pack, head_step, 0)


def paged_extend_attention(
    q: jax.Array,                # [B, C, Hq, d] — C new tokens per sequence
    cache: PagedKVCache,
    seq_slots: jax.Array,        # int32 [B] cache slot per batch row
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    window: Optional[int] = None,
    n_buf: int = N_BUF,
    q_strip: int = EXTEND_Q_STRIP,
) -> jax.Array:
    """Chunked-prefill attention: each sequence's C newest tokens (already
    appended to the cache via ``append_prompt``) attend causally over that
    sequence's full paged history.  Returns [B, C, Hq, d].

    With ``window``, pages before every chunk row's band are never read.
    One-pass residency when the kernel's whole estimated VMEM working set
    fits (see extend_onepass_vmem_bytes / _extend_onepass_kernel); page
    streaming otherwise.  The gate runs outside jit so it is part of the
    trace key."""
    onepass = (extend_onepass_vmem_bytes(cache, q.dtype)
               <= EXTEND_ONEPASS_MAX_BYTES)
    return _paged_extend_attention(
        q, cache, seq_slots, scale=scale, interpret=interpret,
        window=window, onepass=onepass, n_buf=n_buf, q_strip=q_strip)


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "window", "onepass",
                              "n_buf", "q_strip"))
def _paged_extend_attention(
    q: jax.Array,
    cache: PagedKVCache,
    seq_slots: jax.Array,
    scale: Optional[float],
    interpret: Optional[bool],
    window: Optional[int],
    onepass: bool,
    n_buf: int = N_BUF,
    q_strip: int = EXTEND_Q_STRIP,
) -> jax.Array:
    b, c, hq, d = q.shape
    hkv = cache.num_kv_heads
    if hq % hkv:
        raise ValueError(f"q heads {hq} not divisible by kv heads {hkv}")
    group = hq // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    ps = cache.page_size
    max_pages = cache.max_pages_per_seq
    pk = cache.head_pack
    hp = hkv // pk

    # [B, C, Hkv, G, d] -> [B, Hkv, C*G, d] (row r = chunk pos r//G)
    qg = q.reshape(b, c, hkv, group, d).transpose(0, 2, 1, 3, 4).reshape(
        b, hkv, c * group, d)
    if pk > 1:
        # block-diagonal packing: head s of a pack keeps its values in
        # rows [s*C*G, (s+1)*C*G) and lanes [s*d, (s+1)*d), zeros
        # elsewhere — one MXU dot against a packed K row then yields all
        # pk heads' scores with zero cross-terms
        q5 = qg.reshape(b, hp, pk, c * group, d)
        qg = jnp.einsum(
            "bpsrd,st->bpsrtd", q5, jnp.eye(pk, dtype=q.dtype)
        ).reshape(b, hp, pk * c * group, pk * d)

    kernel = functools.partial(
        _extend_onepass_kernel if onepass else _extend_kernel,
        scale=scale,
        page_size=ps,
        max_pages=max_pages,
        n_new=c,
        num_kv_heads=hkv,
        group=group,
        head_dim=d,
        compute_dtype=q.dtype,
        window=window,
        head_pack=pk,
        **({"q_strip": q_strip} if onepass else {"n_buf": n_buf}),
    )
    if onepass:
        scratch_shapes = [
            pltpu.VMEM((2, 2, hp, max_pages, ps, pk * d),
                       cache.kv_pages.dtype),
            pltpu.VMEM((2, 2, hkv, max_pages, 1, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, max_pages)),
        ]
    else:
        scratch_shapes = [
            pltpu.VMEM((n_buf, 2, hp, ps, pk * d), cache.kv_pages.dtype),
            pltpu.VMEM((n_buf, 2, hkv, 1, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_buf)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp, pk * c * group, pk * d),
                         lambda i, *refs: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, hkv, c * group, d), lambda i, *refs: (i, 0, 0, 0)
        ),
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, c * group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_resolve_interpret(interpret),
    )(cache.page_table.reshape(-1), cache.seq_lens, seq_slots,
      qg, cache.kv_pages, cache.kv_scales)
    # [B, Hkv, C*G, d] -> [B, C, Hq, d]
    return out.reshape(b, hkv, c, group, d).transpose(0, 2, 1, 3, 4).reshape(
        b, c, hq, d)


@functools.partial(jax.jit, static_argnames=("scale", "interpret",
                                             "window", "n_buf"))
def paged_decode_attention(
    q: jax.Array,                # [B, Hq, d] one token per sequence
    cache: PagedKVCache,
    seq_slots: jax.Array,        # int32 [B] cache slot per batch row
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    window: Optional[int] = None,
    n_buf: int = N_BUF,
) -> jax.Array:
    """Batched single-token decode over the paged INT8 cache.

    ``window``: sliding-window width — each new token attends only to the
    last ``window`` cache positions; out-of-band pages are never read."""
    b, hq, d = q.shape
    hkv = cache.num_kv_heads
    if hq % hkv:
        raise ValueError(f"q heads {hq} not divisible by kv heads {hkv}")
    group = hq // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    ps = cache.page_size
    max_pages = cache.max_pages_per_seq
    if ps > 0x7FFF:
        raise ValueError("page_size must fit the 15-bit ntok meta field")
    pk = cache.head_pack
    hp = hkv // pk

    qg = q.reshape(b, hkv, group, d)
    if pk > 1:
        # block-diagonal packing (see kv_cache.py head-packing note)
        q5 = qg.reshape(b, hp, pk, group, d)
        qg = jnp.einsum(
            "bpsgd,st->bpsgtd", q5, jnp.eye(pk, dtype=q.dtype)
        ).reshape(b, hp, pk * group, pk * d)

    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        page_size=ps,
        max_pages=max_pages,
        batch=b,
        num_kv_heads=hkv,
        group=group,
        head_dim=d,
        compute_dtype=q.dtype,
        window=window,
        head_pack=pk,
        n_buf=n_buf,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, hp, pk * group, pk * d),
                         lambda i, *refs: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (b, hkv, group, d), lambda i, *refs: (0, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.SMEM((b * max_pages,), jnp.int32),
            pltpu.SMEM((b * max_pages,), jnp.int32),
            pltpu.SMEM((b * max_pages,), jnp.int32),
            pltpu.VMEM((n_buf, 2, hp, ps, pk * d), cache.kv_pages.dtype),
            pltpu.VMEM((n_buf, 2, hkv, 1, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_buf)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_resolve_interpret(interpret),
    )(cache.page_table.reshape(-1), cache.seq_lens, seq_slots,
      qg, cache.kv_pages, cache.kv_scales)
    return out.reshape(b, hq, d)
