"""Paged decode attention kernel (flash-decoding over the INT8 paged cache).

One generated token per sequence attends over that sequence's whole paged
KV history.  This is the reference's split-KV V2 forward specialized to
Lq=1 and lifted onto the paged cache: the KV "tiles" are pages found
through the page table (scalar-prefetched so DMA addresses are known ahead
of the loop — PrefetchScalarGridSpec, the pattern SURVEY §7 flags for
paged gather), streamed HBM->VMEM with double buffering, and folded into
the online-softmax state.

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


def _decode_kernel(
    # scalar prefetch
    pt_ref,                      # int32 [B * max_pages] flattened page table
    sl_ref,                      # int32 [B] sequence lengths
    # tensor inputs
    q_ref,                       # VMEM (1, 1, G, d)
    kp_ref, vp_ref,              # ANY [Hkv, n_pages, ps, d] int8
    ks_ref, vs_ref,              # ANY [Hkv, n_pages, 1, ps] f32
    # output
    o_ref,                       # VMEM (1, 1, G, d)
    # scratch
    k_buf, v_buf,                # VMEM (2, ps, d) int8
    ksb, vsb,                    # VMEM (2, 1, ps) f32
    sems,                        # DMA (4, 2)
    *,
    scale: float,
    page_size: int,
    max_pages: int,
    group: int,
    head_dim: int,
    compute_dtype,
):
    b = pl.program_id(0)
    kh = pl.program_id(1)
    seq_len = sl_ref[b]
    n_pages = jax.lax.div(seq_len + page_size - 1, page_size)

    def dma(slot, i):
        page_id = pt_ref[b * max_pages + i]
        return [
            pltpu.make_async_copy(
                kp_ref.at[kh, page_id], k_buf.at[slot], sems.at[0, slot]
            ),
            pltpu.make_async_copy(
                vp_ref.at[kh, page_id], v_buf.at[slot], sems.at[1, slot]
            ),
            pltpu.make_async_copy(
                ks_ref.at[kh, page_id], ksb.at[slot], sems.at[2, slot]
            ),
            pltpu.make_async_copy(
                vs_ref.at[kh, page_id], vsb.at[slot], sems.at[3, slot]
            ),
        ]

    @pl.when(n_pages > 0)
    def _start_first():
        for d_ in dma(0, 0):
            d_.start()

    q = q_ref[0, 0]                                    # (G, d)

    def page_step(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_pages)
        def _prefetch():
            for d_ in dma(nxt, i + 1):
                d_.start()

        for d_ in dma(slot, i):
            d_.wait()

        k_page = k_buf[slot].astype(compute_dtype)     # (ps, d)
        s = jax.lax.dot_general(
            q, k_page, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s *= scale
        s = s * ksb[slot]                              # (1, ps) column scales
        # mask positions beyond seq_len (last, partial page)
        col = jax.lax.broadcasted_iota(jnp.int32, (group, page_size), 1)
        s = jnp.where(col + i * page_size < seq_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.where(jnp.isneginf(m_new), 0.0, jnp.exp(m - m_new))
        p = jnp.exp(s - m_new)
        p = jnp.where(jnp.isneginf(s), 0.0, p)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        p = p * vsb[slot]                              # fold V scales into P
        v_page = v_buf[slot].astype(compute_dtype)
        pv = jax.lax.dot_general(
            p.astype(compute_dtype), v_page, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return m_new, l, acc

    m0 = jnp.full((group, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((group, 1), jnp.float32)
    acc0 = jnp.zeros((group, head_dim), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_pages, page_step, (m0, l0, acc0))

    denom = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / denom).astype(o_ref.dtype)


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
        group=group,
        head_dim=d,
        compute_dtype=q.dtype if q.dtype != jnp.float32 else jnp.float32,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec(
                (1, 1, group, d), lambda b_, kh, *refs: (b_, kh, 0, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group, d), lambda b_, kh, *refs: (b_, kh, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ps, d), cache.k_pages.dtype),
            pltpu.VMEM((2, ps, d), cache.v_pages.dtype),
            pltpu.VMEM((2, 1, ps), jnp.float32),
            pltpu.VMEM((2, 1, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_resolve_interpret(interpret),
    )(pt, sl, qg, cache.k_pages, cache.v_pages, cache.k_scales, cache.v_scales)
    return out.reshape(b, hq, d)
