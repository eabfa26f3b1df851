"""Paged decode attention kernel (flash-decoding over the INT8 paged cache).

One generated token per sequence attends over that sequence's whole paged
KV history.  This is the reference's split-KV V2 forward specialized to
Lq=1 and lifted onto the paged cache: the KV "tiles" are pages found
through the page table (scalar-prefetched so DMA addresses are known ahead
of the loop — PrefetchScalarGridSpec, the pattern SURVEY §7 flags for
paged gather), streamed HBM->VMEM with a 4-deep prefetch window, and
folded into the online-softmax state.

Grid = one program per sequence: the page-major cache layout
([n_pages, Hkv, ps, d], serving/kv_cache.py) makes one page index a single
contiguous (Hkv, ps, d) DMA carrying every head — 8x fewer, 8x larger
transfers than a head-major layout, which matters because decode is
DMA-latency-bound (per-page compute is trivial).

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

N_BUF = 4          # prefetch window depth (pages in flight per stream)


def _decode_kernel(
    # scalar prefetch
    pt_ref,                      # int32 [B * max_pages] flattened page table
    sl_ref,                      # int32 [B] sequence lengths
    # tensor inputs
    q_ref,                       # VMEM (1, Hkv, G, d)
    kp_ref, vp_ref,              # ANY [n_pages, Hkv, ps, d] int8
    ks_ref, vs_ref,              # ANY [n_pages, Hkv, 1, ps] f32
    # output
    o_ref,                       # VMEM (1, Hkv, G, d)
    # scratch
    k_buf, v_buf,                # VMEM (N_BUF, Hkv, ps, d) int8
    ksb, vsb,                    # VMEM (N_BUF, Hkv, 1, ps) f32
    sems,                        # DMA (4, N_BUF)
    *,
    scale: float,
    page_size: int,
    max_pages: int,
    num_kv_heads: int,
    group: int,
    head_dim: int,
    compute_dtype,
):
    b = pl.program_id(0)
    seq_len = sl_ref[b]
    n_pages = jax.lax.div(seq_len + page_size - 1, page_size)

    def dma(slot, i):
        page_id = pt_ref[b * max_pages + i]
        return [
            pltpu.make_async_copy(
                kp_ref.at[page_id], k_buf.at[slot], sems.at[0, slot]
            ),
            pltpu.make_async_copy(
                vp_ref.at[page_id], v_buf.at[slot], sems.at[1, slot]
            ),
            pltpu.make_async_copy(
                ks_ref.at[page_id], ksb.at[slot], sems.at[2, slot]
            ),
            pltpu.make_async_copy(
                vs_ref.at[page_id], vsb.at[slot], sems.at[3, slot]
            ),
        ]

    # fill the prefetch window (decode is DMA-latency-bound; keep N_BUF
    # page transfers in flight — guide: "start all page DMAs concurrently")
    for w in range(N_BUF):
        @pl.when(w < n_pages)
        def _start(w=w):
            for d_ in dma(w, w):
                d_.start()

    q = q_ref[0]                                       # (Hkv, G, d)

    def page_step(i, carry):
        m, l, acc = carry                      # (Hkv*G, 1) x2, (Hkv*G, d)
        slot = jax.lax.rem(i, N_BUF)

        for d_ in dma(slot, i):
            d_.wait()

        # read everything out of the slot BEFORE re-targeting its DMA
        k_scale = ksb[slot][:, 0, :]                   # (Hkv, ps)
        v_scale = vsb[slot][:, 0, :]
        # per-head scores assembled from per-head MXU dots
        s_heads = [
            jax.lax.dot_general(
                q[kh], k_buf[slot, kh].astype(compute_dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for kh in range(num_kv_heads)
        ]                                              # each (G, ps)
        v_heads = [v_buf[slot, kh].astype(compute_dtype)
                   for kh in range(num_kv_heads)]

        # slot fully read — start its next transfer while we compute
        @pl.when(i + N_BUF < n_pages)
        def _prefetch():
            for d_ in dma(slot, i + N_BUF):
                d_.start()

        s = jnp.concatenate(s_heads, axis=0)           # (Hkv*G, ps)
        ks_b = (jnp.repeat(k_scale, group, axis=0)
                if group > 1 else k_scale)
        vs_b = (jnp.repeat(v_scale, group, axis=0)
                if group > 1 else v_scale)
        s = s * scale * ks_b
        col = jax.lax.broadcasted_iota(
            jnp.int32, (num_kv_heads * group, page_size), 1)
        s = jnp.where(col + i * page_size < seq_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.where(jnp.isneginf(m_new), 0.0, jnp.exp(m - m_new))
        p = jnp.exp(s - m_new)
        p = jnp.where(jnp.isneginf(s), 0.0, p)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        p = p * vs_b                                   # fold V scales into P
        p_lp = p.astype(compute_dtype)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                p_lp[kh * group:(kh + 1) * group], v_heads[kh],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for kh in range(num_kv_heads)
        ], axis=0)                                     # (Hkv*G, d)
        acc = acc * alpha + pv
        return m_new, l, acc

    hg = num_kv_heads * group
    m0 = jnp.full((hg, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((hg, 1), jnp.float32)
    acc0 = jnp.zeros((hg, head_dim), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_pages, page_step, (m0, l0, acc0))

    denom = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / denom).reshape(
        num_kv_heads, group, head_dim).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention(
    q: jax.Array,                # [B, Hq, d] one token per sequence
    cache: PagedKVCache,
    seq_slots: jax.Array,        # int32 [B] cache slot per batch row
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Batched single-token decode over the paged INT8 cache."""
    b, hq, d = q.shape
    hkv = cache.num_kv_heads
    if hq % hkv:
        raise ValueError(f"q heads {hq} not divisible by kv heads {hkv}")
    group = hq // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    ps = cache.page_size
    max_pages = cache.max_pages_per_seq

    # gather this batch's page-table rows / lengths (scalar prefetch wants
    # the batch-aligned view)
    pt = cache.page_table[seq_slots].reshape(-1)       # [B * max_pages]
    sl = cache.seq_lens[seq_slots]                     # [B]
    qg = q.reshape(b, hkv, group, d)

    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        page_size=ps,
        max_pages=max_pages,
        num_kv_heads=hkv,
        group=group,
        head_dim=d,
        compute_dtype=q.dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, group, d), lambda b_, *refs: (b_, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, hkv, group, d), lambda b_, *refs: (b_, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, hkv, ps, d), cache.k_pages.dtype),
            pltpu.VMEM((N_BUF, hkv, ps, d), cache.v_pages.dtype),
            pltpu.VMEM((N_BUF, hkv, 1, ps), jnp.float32),
            pltpu.VMEM((N_BUF, hkv, 1, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((4, N_BUF)),
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
    )(pt, sl, qg, cache.k_pages, cache.v_pages, cache.k_scales, cache.v_scales)
    return out.reshape(b, hq, d)
