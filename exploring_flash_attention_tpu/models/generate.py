"""End-to-end LM inference engine: prefill → paged INT8 KV-cache → decode.

Ties the flagship transformer to the serving stack (the reference has no
serving; this is the BASELINE north-star path "split-KV decode over the
INT8 paged cache with continuous batching"):

- :func:`prefill` runs the training forward over the prompt (every
  attention call the Pallas one-pass/streaming kernel) while collecting
  each layer's K/V, then quantizes them into per-layer paged caches;
- :func:`decode_step` advances all sequences one token: single-token QKV
  projections, functional cache append, the paged flash-decoding kernel
  per layer, sampling (greedy or temperature);
- :class:`GenerationEngine` owns the per-layer caches + page allocation
  and exposes ``generate()``.

Positions: the model applies RoPE (ModelConfig.use_rope, default on) —
the cache stores POST-rotation K, and decode rotates each new token's
q/k at its per-sequence position taken from the cache's ``seq_lens``
(so seq_lens doubles as the RoPE position counter; keep that invariant
when adding eviction or slot reuse).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from exploring_flash_attention_tpu.configs import cdiv
from exploring_flash_attention_tpu.models.transformer import (
    ModelConfig,
    Params,
    _mlp_block,
    _rmsnorm,
    rope,
)
from exploring_flash_attention_tpu.ops.attention_vjp import flash_attention
from exploring_flash_attention_tpu.serving.decode import (
    paged_decode_attention,
    paged_extend_attention,
)
from exploring_flash_attention_tpu.serving.kv_cache import (
    PagedKVCache,
    PageAllocator,
    append_chunks,
    append_prompts,
    append_tokens,
    make_cache,
)


def forward_collect_kv(
    params: Params,
    tokens: jax.Array,             # [B, L] int32
    config: ModelConfig,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, List[Tuple[jax.Array, jax.Array]]]:
    """Causal forward returning (logits [B, L, V], per-layer (k, v) in
    cache layout [B, L, Hkv, d])."""
    c = config
    x = params["embed"][tokens].astype(c.dtype)
    kvs = []
    for p in params["layers"]:
        h = _rmsnorm(x, p["ln1"], c.norm_eps)
        q = jnp.einsum("ble,ehd->bhld", h, p["wq"])
        k = jnp.einsum("ble,ehd->bhld", h, p["wk"])
        v = jnp.einsum("ble,ehd->bhld", h, p["wv"])
        if c.use_rope:
            pos = jnp.arange(k.shape[2], dtype=jnp.int32)
            q = rope(q, pos, c.rope_theta)
            k = rope(k, pos, c.rope_theta)   # cache stores post-rotation K
        kvs.append((k, v))                           # [B, Hkv, L, d]
        # GQA handled natively by the kernel (shared KV block per group)
        o = flash_attention(
            q, k, v, config=c.tile, causal=True, interpret=interpret,
            window=c.window,
        )
        x = x + jnp.einsum("bhld,hde->ble", o.astype(x.dtype), p["wo"])
        x = x + _mlp_block(p, x, c, None)
    x = _rmsnorm(x, params["ln_f"], c.norm_eps)
    logits = jnp.einsum(
        "ble,ve->blv", x, params["embed"].astype(c.dtype)
    ).astype(jnp.float32)
    return logits, [(k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))
                    for (k, v) in kvs]


def _decode_forward(
    params: Params,
    tokens: jax.Array,             # [B] int32 — last sampled token per seq
    caches: List[PagedKVCache],
    slots: jax.Array,              # [B] int32
    config: ModelConfig,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, List[PagedKVCache]]:
    """One decode step: returns (logits [B, V], updated caches)."""
    c = config
    x = params["embed"][tokens].astype(c.dtype)          # [B, E]
    new_caches = []
    for p, cache in zip(params["layers"], caches):
        h = _rmsnorm(x, p["ln1"], c.norm_eps)
        q = jnp.einsum("be,ehd->bhd", h, p["wq"])        # [B, Hq, d]
        k = jnp.einsum("be,ehd->bhd", h, p["wk"])        # [B, Hkv, d]
        v = jnp.einsum("be,ehd->bhd", h, p["wv"])
        if c.use_rope:
            pos = cache.seq_lens[slots]                  # [B] this token's pos
            q = rope(q, pos[:, None], c.rope_theta)
            k = rope(k, pos[:, None], c.rope_theta)
        cache = append_tokens(cache, slots, k, v)
        o = paged_decode_attention(
            q, cache, slots, interpret=interpret, window=c.window,
        )                                                 # [B, Hq, d]
        x = x + jnp.einsum(
            "bhd,hde->be", o.astype(x.dtype), p["wo"]
        )
        x2 = x[:, None, :]                                # [B, 1, E]
        x = (x2 + _mlp_block(p, x2, c, None))[:, 0]
        new_caches.append(cache)
    xf = _rmsnorm(x, params["ln_f"], c.norm_eps)
    logits = jnp.einsum(
        "be,ve->bv", xf, params["embed"].astype(c.dtype)
    ).astype(jnp.float32)
    return logits, new_caches


def _extend_forward(
    params: Params,
    tokens: jax.Array,             # [B, C] int32 — a new turn per sequence
    caches: List[PagedKVCache],
    slots: jax.Array,              # [B] int32
    config: ModelConfig,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, List[PagedKVCache]]:
    """Multi-turn continuation forward: C new tokens per sequence attend
    over their existing paged history via the extend kernel (the chunked
    prefill path — no full-prompt recompute).  Returns (logits [B, C, V],
    updated caches)."""
    c = config
    x = params["embed"][tokens].astype(c.dtype)          # [B, C, E]
    new_caches = []
    for p, cache in zip(params["layers"], caches):
        h = _rmsnorm(x, p["ln1"], c.norm_eps)
        q = jnp.einsum("ble,ehd->bhld", h, p["wq"])      # [B, Hq, C, d]
        k = jnp.einsum("ble,ehd->bhld", h, p["wk"])
        v = jnp.einsum("ble,ehd->bhld", h, p["wv"])
        if c.use_rope:
            pos0 = cache.seq_lens[slots]                 # [B]
            pos = (pos0[:, None] + jnp.arange(
                tokens.shape[1], dtype=jnp.int32)[None, :])[:, None, :]
            q = rope(q, pos, c.rope_theta)               # pos: [B, 1, C]
            k = rope(k, pos, c.rope_theta)
        # append first: the chunk reads itself quantized from the cache
        # (decode-consistent numerics)
        cache = append_chunks(
            cache, slots, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
        )
        o = paged_extend_attention(
            q.transpose(0, 2, 1, 3), cache, slots, interpret=interpret,
            window=c.window,
        )                                                # [B, C, Hq, d]
        x = x + jnp.einsum(
            "blhd,hde->ble", o.astype(x.dtype), p["wo"])
        x = x + _mlp_block(p, x, c, None)
        new_caches.append(cache)
    xf = _rmsnorm(x, params["ln_f"], c.norm_eps)
    logits = jnp.einsum(
        "ble,ve->blv", xf, params["embed"].astype(c.dtype)
    ).astype(jnp.float32)
    return logits, new_caches


def sample(
    logits: jax.Array,             # [B, V]
    rng: jax.Array,
    temperature: float = 0.0,
) -> jax.Array:
    """Greedy (temperature 0) or temperature sampling -> [B] int32."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        rng, logits / temperature, axis=-1
    ).astype(jnp.int32)


class GenerationEngine:
    """Batch text generation over per-layer paged INT8 KV-caches."""

    def __init__(
        self,
        params: Params,
        config: ModelConfig,
        max_seqs: int = 8,
        max_len: int = 2048,
        page_size: int = 128,
        interpret: Optional[bool] = None,
    ):
        self.params = params
        self.config = config
        self.interpret = interpret
        self.page_size = page_size
        pages_per_seq = cdiv(max_len, page_size)
        n_pages = max_seqs * pages_per_seq
        self.caches = [
            make_cache(
                config.n_kv_heads, config.d_head, n_pages,
                page_size=page_size, max_seqs=max_seqs,
                max_pages_per_seq=pages_per_seq,
            )
            for _ in range(config.n_layers)
        ]
        # all layers share one page map (identical table per layer)
        self.allocator = PageAllocator(n_pages)
        self.max_seqs = max_seqs
        self.pages_per_seq = pages_per_seq
        self._loop_cache = {}
        self._mapped_pages: List[int] = []
        self._held_slots = None

    def _map_slots(self, bsz: int) -> jax.Array:
        # one page map shared by every layer's cache (layers use the same
        # slot/page geometry; tables are kept identical).  The table is
        # assembled host-side and shipped as ONE transfer — per-slot
        # ``.at[].set`` updates were 2 device executions per (slot, layer),
        # ~1 s of fixed dispatch latency over the tunnel per generate().
        self._mapped_pages = []
        table = np.zeros((self.max_seqs, self.pages_per_seq), np.int32)
        for s in range(bsz):
            pages = self.allocator.alloc(self.pages_per_seq)
            self._mapped_pages.extend(pages)
            table[s, :len(pages)] = pages
        tablej = jnp.asarray(table)
        lens = jnp.zeros((self.max_seqs,), jnp.int32)
        for i, cache in enumerate(self.caches):
            self.caches[i] = dataclasses.replace(
                cache, page_table=tablej, seq_lens=lens
            )
        return jnp.arange(bsz, dtype=jnp.int32)

    def _release_slots(self) -> None:
        self.allocator.free(self._mapped_pages)
        self._mapped_pages = []

    def generate(
        self,
        prompt: jax.Array,          # [B, L_prompt] int32
        max_new_tokens: int,
        temperature: float = 0.0,
        seed: int = 0,
        hold: bool = False,
    ) -> np.ndarray:
        """Returns generated tokens [B, max_new_tokens] (int32).

        ``hold=True`` keeps the batch's cache slots mapped after the call
        so :meth:`continue_generation` can extend the conversation without
        re-running the prompt; call :meth:`release` when done."""
        bsz, l_prompt = prompt.shape
        if bsz > self.max_seqs:
            raise ValueError(f"batch {bsz} > max_seqs {self.max_seqs}")
        if self._held_slots is not None:
            raise RuntimeError("slots held — call release() first")
        try:
            # inside the try so a partial allocation (alloc raising midway
            # through the slot loop) still reaches _release_slots — the
            # pages recorded so far would otherwise leak permanently
            slots = self._map_slots(bsz)
            # one device execution for prefill + cache population + the
            # whole decode scan — over the tunnel every chained dispatch
            # pays its own latency, so the fewer executions the better
            rng = jax.random.PRNGKey(seed)
            out, caches = self._generate_fn(max_new_tokens, temperature)(
                self.params, prompt, tuple(self.caches), slots, rng
            )
            self.caches = list(caches)
        except Exception:
            self._release_slots()               # engine stays reusable
            raise
        if hold:
            self._held_slots = slots
        else:
            self._release_slots()
        return np.asarray(out)

    def continue_generation(
        self,
        new_tokens: jax.Array,      # [B, C] int32 — the next turn
        max_new_tokens: int,
        temperature: float = 0.0,
        seed: int = 1,
    ) -> np.ndarray:
        """Multi-turn continuation over held slots: the new turn's tokens
        attend to the existing cache via the paged extend kernel (no
        full-history recompute), then decoding proceeds as usual.
        Returns [B, max_new_tokens] (int32)."""
        if self._held_slots is None:
            raise RuntimeError("no held slots — generate(..., hold=True) first")
        slots = self._held_slots
        if new_tokens.shape[0] != int(slots.shape[0]):
            raise ValueError("batch mismatch with the held slots")
        rng = jax.random.PRNGKey(seed)
        out, caches = self._continue_fn(
            int(new_tokens.shape[1]), max_new_tokens, temperature)(
            self.params, jnp.asarray(new_tokens, jnp.int32),
            tuple(self.caches), slots, rng
        )
        self.caches = list(caches)
        return np.asarray(out)

    def release(self) -> None:
        """Free the slots held by ``generate(..., hold=True)``."""
        if self._held_slots is not None:
            self._held_slots = None
            self._release_slots()

    def _continue_fn(self, chunk_len, max_new_tokens, temperature):
        key = ("cont", chunk_len, max_new_tokens, temperature)
        fn = self._loop_cache.get(key)
        if fn is not None:
            return fn
        config, interpret = self.config, self.interpret

        @jax.jit
        def run(params, new_tokens, caches, slots, rng):
            logits, caches = _extend_forward(
                params, new_tokens, list(caches), slots, config,
                interpret=interpret,
            )
            caches = tuple(caches)
            rng, sub = jax.random.split(rng)
            tok0 = sample(logits[:, -1, :], sub, temperature)

            def body(carry, _):
                tok, caches, rng = carry
                logits, caches = _decode_forward(
                    params, tok, list(caches), slots, config,
                    interpret=interpret,
                )
                rng, sub = jax.random.split(rng)
                tok = sample(logits, sub, temperature)
                return (tok, tuple(caches), rng), tok

            (_, caches, _), toks = jax.lax.scan(
                body, (tok0, caches, rng), None,
                length=max_new_tokens - 1,
            )
            out = jnp.concatenate([tok0[:, None], toks.T], axis=1)
            return out, caches

        self._loop_cache[key] = run
        return run

    def _generate_fn(self, max_new_tokens: int, temperature: float):
        key = (max_new_tokens, temperature)
        fn = self._loop_cache.get(key)
        if fn is not None:
            return fn
        config, interpret = self.config, self.interpret

        @jax.jit
        def run(params, prompt, caches, slots, rng):
            # ---- prefill: full forward + quantized cache population ----
            logits, kvs = forward_collect_kv(
                params, prompt, config, interpret=interpret
            )
            caches = tuple(
                append_prompts(c, slots, k, v)
                for c, (k, v) in zip(caches, kvs)
            )
            rng, sub = jax.random.split(rng)
            tok0 = sample(logits[:, -1, :], sub, temperature)

            # ---- decode: one lax.scan over steps (caches are the carry,
            # no per-token host round-trips) ----
            def body(carry, _):
                tok, caches, rng = carry
                logits, caches = _decode_forward(
                    params, tok, list(caches), slots, config,
                    interpret=interpret,
                )
                rng, sub = jax.random.split(rng)
                tok = sample(logits, sub, temperature)
                return (tok, tuple(caches), rng), tok

            (_, caches, _), toks = jax.lax.scan(
                body, (tok0, caches, rng), None,
                length=max_new_tokens - 1,
            )
            out = jnp.concatenate([tok0[:, None], toks.T], axis=1)
            return out, caches              # out: [B, max_new_tokens]

        self._loop_cache[key] = run
        return run
