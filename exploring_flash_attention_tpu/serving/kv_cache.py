"""INT8 paged KV-cache.

The serving-side generalization of the reference's KV streaming: instead of
contiguous [B, H, L, d] K/V, tokens live in fixed-size pages indexed by a
per-sequence page table, stored INT8 with per-token f32 scales (absmax over
the d axis), so the decode kernel dequantizes on the fly by folding scales
into score columns / probability columns (see ops/attention_kvquant.py for
the folding math, serving/decode.py for the paged variant).

Layout (page-major, K/V packed: ONE page index fetches every KV head's K
AND V slice in a single contiguous DMA, and both scale vectors in a second
small one — 2 DMAs per page, where a k/v/k_scale/v_scale split layout costs
4; decode is DMA-latency-bound so transfer count is the currency):
    kv_pages  : int8 [n_pages, 2, H_kv, page_size, d]   (0 = K, 1 = V)
    kv_scales : f32  [n_pages, 2, H_kv, 1, page_size]
    page_table: int32 [max_seqs, max_pages_per_seq]
    seq_lens  : int32 [max_seqs]

Page management (allocator, free list) is host-side Python — the analog of
the reference drivers' host orchestration; all token writes are functional
XLA scatters so the cache arrays stay on device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from exploring_flash_attention_tpu.configs import cdiv

INT8_MAX = 127.0


@dataclasses.dataclass
class PagedKVCache:
    kv_pages: jax.Array         # int8 [n_pages, 2, Hkv, page_size, d]
    kv_scales: jax.Array        # f32  [n_pages, 2, Hkv, 1, page_size]
    page_table: jax.Array       # int32 [max_seqs, max_pages]
    seq_lens: jax.Array         # int32 [max_seqs]
    page_size: int

    @property
    def num_kv_heads(self) -> int:
        return self.kv_pages.shape[2]

    @property
    def head_dim(self) -> int:
        return self.kv_pages.shape[4]

    @property
    def max_pages_per_seq(self) -> int:
        return self.page_table.shape[1]


jax.tree_util.register_dataclass(
    PagedKVCache,
    data_fields=["kv_pages", "kv_scales", "page_table", "seq_lens"],
    meta_fields=["page_size"],
)


def make_cache(
    num_kv_heads: int,
    head_dim: int,
    n_pages: int,
    page_size: int = 128,
    max_seqs: int = 64,
    max_pages_per_seq: Optional[int] = None,
) -> PagedKVCache:
    if page_size % 128 != 0:
        raise ValueError("page_size must be a multiple of 128 (lane width)")
    max_pages_per_seq = max_pages_per_seq or n_pages
    return PagedKVCache(
        kv_pages=jnp.zeros(
            (n_pages, 2, num_kv_heads, page_size, head_dim), jnp.int8),
        kv_scales=jnp.zeros(
            (n_pages, 2, num_kv_heads, 1, page_size), jnp.float32),
        page_table=jnp.zeros((max_seqs, max_pages_per_seq), jnp.int32),
        seq_lens=jnp.zeros((max_seqs,), jnp.int32),
        page_size=page_size,
    )


class PageAllocator:
    """Host-side free-list page allocator."""

    def __init__(self, n_pages: int):
        self._free: List[int] = list(range(n_pages - 1, -1, -1))
        self.n_pages = n_pages

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise MemoryError(f"out of KV pages: want {n}, have {len(self._free)}")
        return [self._free.pop() for _ in range(n)]

    def free(self, pages: List[int]) -> None:
        self._free.extend(pages)


def _quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token (row over d) symmetric int8.  x: [..., d] f32/bf16."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / INT8_MAX
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]),
        -INT8_MAX, INT8_MAX,
    ).astype(jnp.int8)
    return q, scale


@jax.jit
def append_tokens(
    cache: PagedKVCache,
    seq_ids: jax.Array,          # int32 [B] cache slots being written
    k_new: jax.Array,            # [B, Hkv, d] new K rows (one token per seq)
    v_new: jax.Array,
) -> PagedKVCache:
    """Functionally append one token per sequence (quantize + scatter).

    Pages must already be mapped in the page table (the scheduler allocates
    them); positions come from ``cache.seq_lens``."""
    pos = cache.seq_lens[seq_ids]                      # [B]
    page_idx_in_seq = pos // cache.page_size
    offset = pos % cache.page_size
    page_ids = cache.page_table[seq_ids, page_idx_in_seq]  # [B]

    kq, ks = _quantize_rows(k_new)                     # [B,Hkv,d], [B,Hkv]
    vq, vs = _quantize_rows(v_new)
    kv = jnp.stack([kq, vq], axis=1)                   # [B, 2, Hkv, d]
    sc = jnp.stack([ks, vs], axis=1)                   # [B, 2, Hkv]

    # scatter: pages[page_ids[b], :, h, offset[b], :] = kv[b, :, h, :]
    kv_pages = cache.kv_pages.at[page_ids, :, :, offset, :].set(kv, mode="drop")
    kv_scales = cache.kv_scales.at[page_ids, :, :, 0, offset].set(sc, mode="drop")
    seq_lens = cache.seq_lens.at[seq_ids].add(1, mode="drop")
    return dataclasses.replace(
        cache, kv_pages=kv_pages, kv_scales=kv_scales, seq_lens=seq_lens,
    )


@jax.jit
def append_chunks(
    cache: PagedKVCache,
    seq_ids: jax.Array,          # int32 [B] cache slots being written
    k_new: jax.Array,            # [B, C, Hkv, d] new K rows per sequence
    v_new: jax.Array,
) -> PagedKVCache:
    """Functionally append C tokens per sequence at each sequence's
    current position (quantize + batched scatter) — append_tokens
    vectorized over the chunk, with per-sequence ARBITRARY (traced,
    non-page-aligned) start offsets.  The multi-turn / chunked-prefill
    cache write."""
    b, c, hkv, d = k_new.shape
    ps = cache.page_size
    pos = cache.seq_lens[seq_ids][:, None] + jnp.arange(c)[None, :]  # [B,C]
    page_idx = pos // ps
    offset = (pos % ps).reshape(-1)                                  # [B*C]
    page_ids = cache.page_table[seq_ids[:, None], page_idx].reshape(-1)

    kq, ks = _quantize_rows(k_new)                   # [B,C,H,d], [B,C,H]
    vq, vs = _quantize_rows(v_new)
    kv = jnp.stack([kq, vq], axis=2).reshape(b * c, 2, hkv, d)
    sc = jnp.stack([ks, vs], axis=2).reshape(b * c, 2, hkv)

    kv_pages = cache.kv_pages.at[page_ids, :, :, offset, :].set(
        kv, mode="drop")
    kv_scales = cache.kv_scales.at[page_ids, :, :, 0, offset].set(
        sc, mode="drop")
    seq_lens = cache.seq_lens.at[seq_ids].add(c, mode="drop")
    return dataclasses.replace(
        cache, kv_pages=kv_pages, kv_scales=kv_scales, seq_lens=seq_lens,
    )


def append_prompt(
    cache: PagedKVCache,
    seq_id: int,
    k_prompt: jax.Array,         # [L, Hkv, d]
    v_prompt: jax.Array,
) -> PagedKVCache:
    """Bulk-append a prompt's K/V (prefill path).  Host loop over pages;
    each page written with one functional update."""
    l = k_prompt.shape[0]
    ps = cache.page_size
    start = int(cache.seq_lens[seq_id])
    if start % ps != 0:
        raise ValueError("prompt append must start on a page boundary")
    for p0 in range(0, l, ps):
        chunk_k = k_prompt[p0:p0 + ps]
        chunk_v = v_prompt[p0:p0 + ps]
        n = chunk_k.shape[0]
        page_id = int(cache.page_table[seq_id, (start + p0) // ps])
        kq, ks = _quantize_rows(chunk_k)               # [n,Hkv,d],[n,Hkv]
        vq, vs = _quantize_rows(chunk_v)
        kv = jnp.stack(
            [kq.transpose(1, 0, 2), vq.transpose(1, 0, 2)], axis=0
        )                                              # [2, Hkv, n, d]
        sc = jnp.stack([ks.transpose(1, 0), vs.transpose(1, 0)], axis=0)
        cache = dataclasses.replace(
            cache,
            kv_pages=cache.kv_pages.at[page_id, :, :, :n, :].set(kv),
            kv_scales=cache.kv_scales.at[page_id, :, :, 0, :n].set(sc),
        )
    cache = dataclasses.replace(
        cache, seq_lens=cache.seq_lens.at[seq_id].set(start + l)
    )
    return cache


@functools.partial(jax.jit, donate_argnums=(0,))
def append_prompts(
    cache: PagedKVCache,
    seq_ids: jax.Array,          # int32 [B] cache slots (page tables mapped)
    k_prompts: jax.Array,        # [B, L, Hkv, d] — same L for the batch
    v_prompts: jax.Array,
) -> PagedKVCache:
    """Batched prefill append: quantize + scatter every sequence's prompt
    K/V in one jitted call (the per-seq :func:`append_prompt` host loop
    costs one device sync per call — this is the serving-path version).

    Sequences must be empty (prompts start at position 0); ragged final
    pages are zero-padded (the decode kernel masks past ``seq_lens``)."""
    b, l, hkv, d = k_prompts.shape
    ps = cache.page_size
    npg = cdiv(l, ps)
    pad = npg * ps - l

    def prep(x):
        xq, xs = _quantize_rows(x)                       # [B,L,H,d],[B,L,H]
        if pad:
            xq = jnp.pad(xq, ((0, 0), (0, pad), (0, 0), (0, 0)))
            xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
        # [B, npg, Hkv, ps, d] / [B, npg, Hkv, 1, ps]
        xq = xq.reshape(b, npg, ps, hkv, d).transpose(0, 1, 3, 2, 4)
        xs = xs.reshape(b, npg, ps, hkv).transpose(0, 1, 3, 2)[:, :, :, None, :]
        return xq.reshape(b * npg, hkv, ps, d), xs.reshape(b * npg, hkv, 1, ps)

    kq, ks = prep(k_prompts)
    vq, vs = prep(v_prompts)
    kv = jnp.stack([kq, vq], axis=1)                   # [B*npg, 2, Hkv, ps, d]
    sc = jnp.stack([ks, vs], axis=1)                   # [B*npg, 2, Hkv, 1, ps]
    page_ids = cache.page_table[seq_ids, :npg].reshape(-1)   # [B*npg]
    return dataclasses.replace(
        cache,
        kv_pages=cache.kv_pages.at[page_ids].set(kv, mode="drop"),
        kv_scales=cache.kv_scales.at[page_ids].set(sc, mode="drop"),
        seq_lens=cache.seq_lens.at[seq_ids].set(l, mode="drop"),
    )

@jax.jit
def set_seq_lens(
    cache: PagedKVCache,
    seq_ids: jax.Array,          # int32 [B] cache slots
    new_lens: jax.Array,         # int32 [B]
) -> PagedKVCache:
    """Functionally reset per-sequence lengths (speculative-decoding
    rollback: rejected draft tokens stay in their pages but become
    invisible — the kernels mask past ``seq_lens`` — and the next append
    overwrites them, since writes land at ``seq_lens``).  Pages stay
    mapped; only the length changes."""
    return dataclasses.replace(
        cache, seq_lens=cache.seq_lens.at[seq_ids].set(new_lens, mode="drop")
    )


def gather_kv(
    cache: PagedKVCache, seq_id: int, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    """Dequantized contiguous [Hkv, L, d] K/V for one sequence — reference
    path for tests (the fused kernels never materialize this)."""
    l = int(cache.seq_lens[seq_id])
    n_pages = cdiv(l, cache.page_size)
    ids = np.asarray(cache.page_table[seq_id, :n_pages])
    kv = jnp.asarray(cache.kv_pages)[ids]              # [np, 2, H, ps, d]
    sc = jnp.asarray(cache.kv_scales)[ids]             # [np, 2, H, 1, ps]
    kv = kv.astype(jnp.float32) * sc.transpose(0, 1, 2, 4, 3)
    npg, _, h, ps, d = kv.shape
    # [np, 2, H, ps, d] -> [2, H, np*ps, d]
    kv = kv.transpose(1, 2, 0, 3, 4).reshape(2, h, npg * ps, d)[:, :, :l]
    return kv[0].astype(dtype), kv[1].astype(dtype)
