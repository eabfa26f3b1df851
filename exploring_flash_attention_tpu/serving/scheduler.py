"""Continuous-batching decode scheduler over the paged INT8 KV-cache.

The serving subsystem from BASELINE.json ("split-KV Pallas pair feeding a
continuous-batching decode scheduler").  The scheduler owns cache slots and
pages; requests join the running batch the moment a slot and pages are
available (continuous batching — no static batch barriers), decode steps
run the paged flash-decoding kernel over all active sequences at once, and
finished sequences release their pages immediately.

The scheduler is model-agnostic: each request supplies its prompt K/V and a
per-step input callback (in a full LM the callback is the model's QKV
projection of the previously sampled token — models/transformer.py wires
that up; tests drive it with seeded tensors).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Callable, Deque, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from exploring_flash_attention_tpu.configs import cdiv
from exploring_flash_attention_tpu.serving.decode import paged_decode_attention
from exploring_flash_attention_tpu.serving.kv_cache import (
    PagedKVCache,
    PageAllocator,
    append_prompt,
    append_tokens,
    make_cache,
)

# step_idx -> (q [Hq,d], k_new [Hkv,d], v_new [Hkv,d])
StepInputFn = Callable[[int], Tuple[jax.Array, jax.Array, jax.Array]]


@dataclasses.dataclass
class Request:
    rid: int
    prompt_k: jax.Array          # [L, Hkv, d]
    prompt_v: jax.Array
    max_new_tokens: int
    step_inputs: StepInputFn


@dataclasses.dataclass
class _Active:
    req: Request
    slot: int
    pages: List[int]
    tokens_done: int = 0


class ContinuousBatchingScheduler:
    def __init__(
        self,
        num_q_heads: int,
        num_kv_heads: int,
        head_dim: int,
        n_pages: int = 256,
        page_size: int = 128,
        max_seqs: int = 16,
        max_pages_per_seq: Optional[int] = None,
        interpret: Optional[bool] = None,
    ):
        self.num_q_heads = num_q_heads
        self.cache = make_cache(
            num_kv_heads, head_dim, n_pages, page_size,
            max_seqs=max_seqs, max_pages_per_seq=max_pages_per_seq,
        )
        self.allocator = PageAllocator(n_pages)
        self.free_slots: Deque[int] = deque(range(max_seqs))
        self.pending: Deque[Request] = deque()
        self.active: Dict[int, _Active] = {}
        self.interpret = interpret
        self.completed: Dict[int, int] = {}      # rid -> tokens generated

    # ---------------- submission / admission ----------------

    def submit(self, req: Request) -> None:
        need = self._pages_needed(req)
        if need > self.allocator.n_pages:
            raise ValueError(
                f"request {req.rid} needs {need} pages but the cache only has "
                f"{self.allocator.n_pages} — it could never be admitted"
            )
        if need > self.cache.max_pages_per_seq:
            raise ValueError(
                f"request {req.rid} needs {need} pages > max_pages_per_seq "
                f"{self.cache.max_pages_per_seq}"
            )
        self.pending.append(req)

    def _pages_needed(self, req: Request) -> int:
        total = req.prompt_k.shape[0] + req.max_new_tokens
        return cdiv(total, self.cache.page_size)

    def _try_admit(self) -> None:
        while self.pending:
            req = self.pending[0]
            need = self._pages_needed(req)
            if not self.free_slots or need > self.allocator.free_pages:
                return
            self.pending.popleft()
            slot = self.free_slots.popleft()
            pages = self.allocator.alloc(need)
            # map pages + reset the slot
            pt = self.cache.page_table
            pt = pt.at[slot, :].set(0)
            pt = pt.at[slot, : len(pages)].set(jnp.asarray(pages, jnp.int32))
            self.cache = dataclasses.replace(
                self.cache,
                page_table=pt,
                seq_lens=self.cache.seq_lens.at[slot].set(0),
            )
            # prefill: quantize + write the prompt K/V
            self.cache = append_prompt(
                self.cache, slot, req.prompt_k, req.prompt_v
            )
            self.active[slot] = _Active(req=req, slot=slot, pages=pages)

    # ---------------- decode step ----------------

    def step(self) -> List[Tuple[int, np.ndarray]]:
        """Admit what fits, run one batched decode step, retire finished.

        Returns [(rid, attention_output [Hq, d])] for this step."""
        self._try_admit()
        if not self.active:
            return []

        slots = sorted(self.active.keys())
        qs, ks, vs = [], [], []
        for s in slots:
            a = self.active[s]
            q, k_new, v_new = a.req.step_inputs(a.tokens_done)
            qs.append(q)
            ks.append(k_new)
            vs.append(v_new)
        q_b = jnp.stack(qs)                     # [B, Hq, d]
        k_b = jnp.stack(ks)                     # [B, Hkv, d]
        v_b = jnp.stack(vs)
        slot_ids = jnp.asarray(slots, jnp.int32)

        # write this step's K/V, then attend over the full history
        self.cache = append_tokens(self.cache, slot_ids, k_b, v_b)
        out = paged_decode_attention(
            q_b, self.cache, slot_ids, interpret=self.interpret
        )
        out_np = np.asarray(out)

        results = []
        for i, s in enumerate(slots):
            a = self.active[s]
            a.tokens_done += 1
            results.append((a.req.rid, out_np[i]))
            if a.tokens_done >= a.req.max_new_tokens:
                self._retire(s)
        return results

    def _retire(self, slot: int) -> None:
        a = self.active.pop(slot)
        self.allocator.free(a.pages)
        self.free_slots.append(slot)
        self.completed[a.req.rid] = a.tokens_done

    # ---------------- introspection ----------------

    @property
    def num_active(self) -> int:
        return len(self.active)

    @property
    def num_pending(self) -> int:
        return len(self.pending)

    def run_to_completion(self, max_steps: int = 10_000) -> Dict[int, int]:
        steps = 0
        while (self.pending or self.active) and steps < max_steps:
            self.step()
            steps += 1
        return dict(self.completed)
