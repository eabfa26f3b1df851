"""Speculative decoding: a draft model proposes, the target verifies.

Serving-tier extension over the paged-cache engine (the reference has no
serving stack at all; this builds on the same extend/decode kernels the
multi-turn tier uses — serving/decode.py):

    1. the DRAFT model runs gamma cheap autoregressive steps through the
       paged decode kernel, proposing d_1..d_gamma;
    2. the TARGET model scores all proposals in ONE paged-extend pass
       (chunk = [pending, d_1..d_gamma] — gamma+1 positions of logits for
       the price of one chunked-prefill kernel call instead of gamma+1
       serial decode dispatches);
    3. acceptance keeps the longest valid prefix, then both caches ROLL
       BACK (serving/kv_cache.py:set_seq_lens) past the rejected tokens —
       pages are untouched; the next append overwrites in place.

Acceptance rules:
- ``temperature == 0``: greedy equivalence — a draft token is accepted iff
  it equals the target's argmax at that position; the first mismatch is
  replaced by the target's argmax.  Output is exactly what target-only
  greedy decoding produces (modulo float-associativity ties between the
  decode and extend kernels), verified in tests/test_speculative.py.
- ``temperature > 0``: standard speculative rejection sampling
  (Leviathan et al. / Chen et al.): accept d_i with prob
  min(1, p_target(d_i)/p_draft(d_i)); on first rejection resample from
  normalize(max(p_target - p_draft, 0)); if all gamma survive, sample the
  bonus token from the target's last position.  The output distribution
  equals target-only sampling.

The whole generation loop (draft steps, verify, rollback, emit) is one
jitted ``lax.while_loop`` — no per-round host round-trips; rounds run
until every sequence has ``max_new_tokens``.  Per-sequence acceptance
counts differ, so emission is a masked scatter into the output buffer.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import math

from exploring_flash_attention_tpu.configs import cdiv
from exploring_flash_attention_tpu.models.generate import (
    _decode_forward,
    _extend_forward,
    forward_collect_kv,
    sample,
)
from exploring_flash_attention_tpu.models.transformer import (
    ModelConfig,
    Params,
    _rmsnorm,
    rope,
)
from exploring_flash_attention_tpu.serving.kv_cache import (
    PageAllocator,
    append_prompts,
    make_cache,
    set_seq_lens,
)


# ---- dense rolling-window draft execution (round 5) ----
#
# A speculative draft does not need the paged serving machinery: its job
# is to be CHEAP, and correctness never depends on it (any proposal
# distribution verifies exactly).  Routing the draft through the paged
# decode kernels costs a fixed ~0.25-0.35 ms per step (kernel dispatch +
# cache scatter floors) that swamps a small draft's compute — measured:
# a 1-layer draft's gamma steps priced speculative decoding at 0.6-0.9x
# of target-only decoding even at 0.93+ acceptance.  Instead the draft
# keeps a per-layer rolling WINDOW of dense K/V in the jitted loop's
# carry: each step is a handful of fused XLA einsums over [B, W, d] —
# no kernels, no cache traffic, tens of microseconds.  Rollback is free:
# the ring stores each slot's position, the mask hides slots whose
# position exceeds the rewound cursor, and re-generated positions
# overwrite their slots.

def _dense_draft_prefill(dparams, dcfg, prompt, window, interpret):
    """Seed the rolling ring from the prompt.  Returns (bufs: per-layer
    (k_buf, v_buf) [B, Hkv, W, d], slot_pos [B, W])."""
    _, kvs = forward_collect_kv(dparams, prompt, dcfg, interpret=interpret)
    b, l = prompt.shape
    w = window
    n = min(w, l)
    ps = jnp.arange(l - n, l, dtype=jnp.int32)
    slots = ps % w
    bufs = []
    for (k, v) in kvs:                         # cache layout [B, L, Hkv, d]
        kb = jnp.zeros((b, dcfg.n_kv_heads, w, dcfg.d_head), dcfg.dtype)
        vb = jnp.zeros_like(kb)
        kb = kb.at[:, :, slots, :].set(
            k[:, l - n:, :, :].transpose(0, 2, 1, 3))
        vb = vb.at[:, :, slots, :].set(
            v[:, l - n:, :, :].transpose(0, 2, 1, 3))
        bufs.append((kb, vb))
    slot_pos = jnp.full((w,), -1, jnp.int32).at[slots].set(ps)
    return tuple(bufs), jnp.broadcast_to(slot_pos[None], (b, w))


def _dense_draft_step(dparams, dcfg, tok, bufs, slot_pos, pos):
    """One dense rolling-window decode step: tok [B] at positions
    ``pos`` [B].  Returns (logits [B, V] f32, bufs, slot_pos).  Mirrors
    transformer.forward's block structure exactly (same params)."""
    c = dcfg
    b = tok.shape[0]
    w = slot_pos.shape[1]
    bi = jnp.arange(b, dtype=jnp.int32)
    slot = pos % w
    slot_pos = slot_pos.at[bi, slot].set(pos)
    scale = 1.0 / math.sqrt(c.d_head)
    g = c.n_heads // c.n_kv_heads
    x = dparams["embed"][tok].astype(c.dtype)
    new_bufs = []
    for p, (kb, vb) in zip(dparams["layers"], bufs):
        h = _rmsnorm(x, p["ln1"], c.norm_eps)
        q = jnp.einsum("be,ehd->bhd", h, p["wq"])
        k = jnp.einsum("be,ehd->bhd", h, p["wk"])
        v = jnp.einsum("be,ehd->bhd", h, p["wv"])
        if c.use_rope:
            q = rope(q[:, :, None, :], pos[:, None, None],
                     c.rope_theta)[:, :, 0, :]
            k = rope(k[:, :, None, :], pos[:, None, None],
                     c.rope_theta)[:, :, 0, :]
        kb = kb.at[bi, :, slot, :].set(k)
        vb = vb.at[bi, :, slot, :].set(v)
        new_bufs.append((kb, vb))
        q4 = q.reshape(b, c.n_kv_heads, g, c.d_head).astype(jnp.float32)
        s = jnp.einsum("bkgd,bkwd->bkgw", q4,
                       kb.astype(jnp.float32)) * scale
        vis = ((slot_pos >= 0) & (slot_pos <= pos[:, None])
               & (slot_pos > pos[:, None] - w))
        s = jnp.where(vis[:, None, None, :], s, -jnp.inf)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bkgw,bkwd->bkgd", a, vb.astype(jnp.float32))
        o = o.reshape(b, c.n_heads, c.d_head).astype(c.dtype)
        x = x + jnp.einsum("bhd,hde->be", o, p["wo"])
        hh = _rmsnorm(x, p["ln2"], c.norm_eps)
        gate = jnp.einsum("be,ef->bf", hh, p["w_gate"])
        up = jnp.einsum("be,ef->bf", hh, p["w_up"])
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
        x = x + jnp.einsum("bf,fe->be", act, p["w_down"])
    xf = _rmsnorm(x, dparams["ln_f"], c.norm_eps)
    logits = jnp.einsum("be,ve->bv", xf,
                        dparams["embed"].astype(c.dtype))
    return logits.astype(jnp.float32), tuple(new_bufs), slot_pos


class SpeculativeEngine:
    """Batch speculative generation: target + draft over twin paged caches.

    Both models share the vocabulary; the draft is typically a shallower
    ``ModelConfig`` over the same embedding size class.  Slot/page geometry
    mirrors models/generate.py:GenerationEngine."""

    def __init__(
        self,
        target_params: Params,
        target_config: ModelConfig,
        draft_params: Params,
        draft_config: ModelConfig,
        max_seqs: int = 8,
        max_len: int = 2048,
        page_size: int = 128,
        interpret: Optional[bool] = None,
        draft_mode: str = "paged",
        draft_window: int = 128,
    ):
        """``draft_mode="dense"`` runs the draft through the rolling
        dense-window path (_dense_draft_step) instead of the paged
        kernels — same draft params, ``draft_window`` positions of
        attention context, ~10x cheaper per draft step (see the module
        note above the helpers)."""
        if target_config.vocab_size != draft_config.vocab_size:
            raise ValueError("target and draft must share a vocabulary")
        if target_config.window is not None or draft_config.window is not None:
            raise ValueError("speculative decoding over windowed caches is "
                             "not supported yet")
        if draft_mode not in ("paged", "dense"):
            raise ValueError(f"draft_mode must be 'paged' or 'dense', "
                             f"got {draft_mode!r}")
        self.tparams, self.tcfg = target_params, target_config
        self.dparams, self.dcfg = draft_params, draft_config
        self.interpret = interpret
        self.page_size = page_size
        self.max_seqs = max_seqs
        self.draft_mode = draft_mode
        self.draft_window = draft_window
        self.pages_per_seq = cdiv(max_len, page_size)
        self.max_len = self.pages_per_seq * page_size
        n_pages = max_seqs * self.pages_per_seq

        def caches(cfg: ModelConfig):
            return [
                make_cache(cfg.n_kv_heads, cfg.d_head, n_pages,
                           page_size=page_size, max_seqs=max_seqs,
                           max_pages_per_seq=self.pages_per_seq)
                for _ in range(cfg.n_layers)
            ]
        self.tcaches = caches(target_config)
        self.dcaches = (caches(draft_config) if draft_mode == "paged"
                        else [])
        self.t_alloc = PageAllocator(n_pages)
        self.d_alloc = PageAllocator(n_pages)
        self._loop_cache = {}

    # ---- slot/page mapping (one host-assembled table per model) ----

    def _map(self, bsz: int):
        mapped = {"t": []}
        pairs = [("t", self.t_alloc, self.tcaches)]
        if self.draft_mode == "paged":
            mapped["d"] = []
            pairs.append(("d", self.d_alloc, self.dcaches))
        for key, alloc, cache_list in pairs:
            table = np.zeros((self.max_seqs, self.pages_per_seq), np.int32)
            for s in range(bsz):
                pages = alloc.alloc(self.pages_per_seq)
                mapped[key].extend(pages)
                table[s, :len(pages)] = pages
            tablej = jnp.asarray(table)
            lens = jnp.zeros((self.max_seqs,), jnp.int32)
            for i, c in enumerate(cache_list):
                cache_list[i] = dataclasses.replace(
                    c, page_table=tablej, seq_lens=lens)
        return jnp.arange(bsz, dtype=jnp.int32), mapped

    def _release(self, mapped) -> None:
        self.t_alloc.free(mapped["t"])
        if "d" in mapped:
            self.d_alloc.free(mapped["d"])

    # ---- public API ----

    def generate(
        self,
        prompt: jax.Array,             # [B, L_prompt] int32
        max_new_tokens: int,
        gamma: int = 4,
        temperature: float = 0.0,
        seed: int = 0,
    ) -> Tuple[np.ndarray, Dict[str, float]]:
        """Returns (tokens [B, max_new_tokens] int32, stats).

        stats: ``acceptance_rate`` (accepted draft tokens / proposed),
        ``rounds`` (verify passes run), ``tokens_per_round``."""
        bsz, l_prompt = prompt.shape
        if bsz > self.max_seqs:
            raise ValueError(f"batch {bsz} > max_seqs {self.max_seqs}")
        # peak cache length: accepted history can overshoot max_new by a
        # round (gamma+1) and verification holds gamma+1 unaccepted slots
        if l_prompt + max_new_tokens + 2 * (gamma + 1) > self.max_len:
            raise ValueError("prompt + max_new_tokens + 2*(gamma+1) must "
                             f"fit max_len={self.max_len}")
        slots, mapped = self._map(bsz)
        try:
            rng = jax.random.PRNGKey(seed)
            fn = self._spec_fn(max_new_tokens, gamma, temperature)
            out, n_rounds, n_acc, tc, dc = fn(
                self.tparams, self.dparams, jnp.asarray(prompt, jnp.int32),
                tuple(self.tcaches), tuple(self.dcaches), slots, rng,
            )
            out = np.asarray(out)[:, :max_new_tokens]
            rounds = float(n_rounds)
            accepted = float(n_acc)
        finally:
            self._release(mapped)
        proposed = rounds * gamma * bsz
        stats = {
            "acceptance_rate": accepted / max(proposed, 1.0),
            "rounds": rounds,
            "tokens_per_round": (bsz * out.shape[1]) / max(rounds * bsz, 1.0),
        }
        return out, stats

    # ---- the jitted speculative loop ----

    def _spec_fn(self, max_new: int, gamma: int, temperature: float):
        key = (max_new, gamma, temperature)
        fn = self._loop_cache.get(key)
        if fn is not None:
            return fn
        tcfg, dcfg, interpret = self.tcfg, self.dcfg, self.interpret
        cap = max_new + gamma + 1
        greedy = temperature == 0.0
        dense = self.draft_mode == "dense"
        dwin = self.draft_window

        @jax.jit
        def run(tparams, dparams, prompt, tcaches, dcaches, slots, rng):
            bsz = prompt.shape[0]
            # ---- prefill BOTH models on the prompt ----
            t_logits, t_kvs = forward_collect_kv(
                tparams, prompt, tcfg, interpret=interpret)
            tcaches = tuple(append_prompts(c, slots, k, v)
                            for c, (k, v) in zip(tcaches, t_kvs))
            if dense:
                dcaches = _dense_draft_prefill(
                    dparams, dcfg, prompt, dwin, interpret)
            else:
                _, d_kvs = forward_collect_kv(
                    dparams, prompt, dcfg, interpret=interpret)
                dcaches = tuple(append_prompts(c, slots, k, v)
                                for c, (k, v) in zip(dcaches, d_kvs))
            rng, sub = jax.random.split(rng)
            # token #1 comes from the TARGET's prefill logits — identical
            # to target-only decoding by construction
            pending = sample(t_logits[:, -1, :], sub, temperature)

            out = jnp.zeros((bsz, cap), jnp.int32)
            out = out.at[:, 0].set(pending)
            count = jnp.ones((bsz,), jnp.int32)

            def cond(state):
                return jnp.min(state[0]) < max_new

            def body(state):
                count, pending, out, tcaches, dcaches, rng, rounds, acc_tot = state
                base_t = tcaches[0].seq_lens[slots]      # [B] pre-round len

                # ---- draft: gamma proposal steps (+1 catch-up append) ----
                d_toks, d_dists = [], []
                tok = pending
                if dense:
                    dbufs, dslot = dcaches
                    for i in range(gamma + 1):
                        lg, dbufs, dslot = _dense_draft_step(
                            dparams, dcfg, tok, dbufs, dslot, base_t + i)
                        if i == gamma:
                            # catch-up: d_gamma's K/V only (full-accept
                            # continuity); logits discarded
                            break
                        rng, sub = jax.random.split(rng)
                        tok = sample(lg, sub, temperature)
                        d_toks.append(tok)
                        if not greedy:
                            d_dists.append(jax.nn.softmax(
                                lg / temperature, axis=-1))
                    dcaches = (dbufs, dslot)
                else:
                    base_d = dcaches[0].seq_lens[slots]
                    for _ in range(gamma):
                        lg, dcaches_l = _decode_forward(
                            dparams, tok, list(dcaches), slots, dcfg,
                            interpret=interpret)
                        dcaches = tuple(dcaches_l)
                        rng, sub = jax.random.split(rng)
                        tok = sample(lg, sub, temperature)
                        d_toks.append(tok)
                        if not greedy:
                            d_dists.append(jax.nn.softmax(
                                lg / temperature, axis=-1))
                    # catch-up: append d_gamma's K/V so the draft cache
                    # covers the full-accept case (logits discarded)
                    _, dcaches_l = _decode_forward(
                        dparams, tok, list(dcaches), slots, dcfg,
                        interpret=interpret)
                    dcaches = tuple(dcaches_l)
                d = jnp.stack(d_toks, axis=1)            # [B, gamma]

                # ---- target: verify the whole chunk in one extend ----
                chunk = jnp.concatenate([pending[:, None], d], axis=1)
                t_logits, tcaches_l = _extend_forward(
                    tparams, chunk, list(tcaches), slots, tcfg,
                    interpret=interpret)                 # [B, gamma+1, V]
                tcaches = tuple(tcaches_l)

                # ---- acceptance ----
                if greedy:
                    t_arg = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)
                    match = (t_arg[:, :gamma] == d)
                    n_acc = jnp.sum(jnp.cumprod(
                        match.astype(jnp.int32), axis=1), axis=1)  # [B]
                    next_tok = jnp.take_along_axis(
                        t_arg, n_acc[:, None], axis=1)[:, 0]
                else:
                    p_t = jax.nn.softmax(t_logits / temperature, axis=-1)
                    p_d = jnp.stack(d_dists, axis=1)     # [B, gamma, V]
                    pt_i = jnp.take_along_axis(
                        p_t[:, :gamma], d[..., None], axis=-1)[..., 0]
                    pd_i = jnp.take_along_axis(
                        p_d, d[..., None], axis=-1)[..., 0]
                    rng, sub = jax.random.split(rng)
                    u = jax.random.uniform(sub, (bsz, gamma))
                    accept = u * pd_i < pt_i             # min(1, pt/pd) rule
                    n_acc = jnp.sum(jnp.cumprod(
                        accept.astype(jnp.int32), axis=1), axis=1)
                    # residual at the first rejected position; bonus from
                    # the target's last position when everything survived
                    pos = jnp.minimum(n_acc, gamma - 1)
                    p_t_rej = jnp.take_along_axis(
                        p_t, pos[:, None, None], axis=1)[:, 0]
                    p_d_rej = jnp.take_along_axis(
                        p_d, pos[:, None, None], axis=1)[:, 0]
                    resid = jnp.maximum(p_t_rej - p_d_rej, 0.0)
                    resid = resid / jnp.maximum(
                        jnp.sum(resid, axis=-1, keepdims=True), 1e-20)
                    dist = jnp.where(
                        (n_acc == gamma)[:, None], p_t[:, gamma], resid)
                    rng, sub = jax.random.split(rng)
                    next_tok = jax.random.categorical(
                        sub, jnp.log(jnp.maximum(dist, 1e-30)), axis=-1
                    ).astype(jnp.int32)

                # ---- roll both caches back past the rejected tokens ----
                new_t = base_t + 1 + n_acc               # [pending, d_1..d_n]
                tcaches = tuple(set_seq_lens(c, slots, new_t) for c in tcaches)
                if not dense:
                    # dense rollback is implicit: next round's positions
                    # restart at new_t, the ring's position mask hides
                    # stale slots, re-generated positions overwrite them
                    new_d = base_d + 1 + n_acc
                    dcaches = tuple(
                        set_seq_lens(c, slots, new_d) for c in dcaches)

                # ---- emit d_1..d_n then the corrected/bonus token ----
                j = jnp.arange(gamma + 1, dtype=jnp.int32)[None, :]
                d_pad = jnp.concatenate([d, d[:, -1:]], axis=1)
                emitted = jnp.where(j == n_acc[:, None],
                                    next_tok[:, None], d_pad)
                posn = count[:, None] + j
                valid = j <= n_acc[:, None]
                b_idx = jnp.arange(bsz, dtype=jnp.int32)[:, None]
                out = out.at[
                    jnp.broadcast_to(b_idx, posn.shape),
                    jnp.where(valid, posn, cap),         # cap -> dropped
                ].set(emitted, mode="drop")

                return (count + n_acc + 1, next_tok, out, tcaches, dcaches,
                        rng, rounds + 1, acc_tot + jnp.sum(n_acc))

            state = (count, pending, out, tcaches, dcaches, rng,
                     jnp.int32(0), jnp.int32(0))
            count, pending, out, tcaches, dcaches, rng, rounds, acc_tot = (
                jax.lax.while_loop(cond, body, state))
            return out, rounds, acc_tot, tcaches, dcaches

        self._loop_cache[key] = run
        return run
