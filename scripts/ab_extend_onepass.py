#!/usr/bin/env python
"""A/B: streaming _extend_kernel vs _extend_onepass_kernel on the real chip
at the suite's bench_extend_prefill geometry (B=8, C=256 over ctx=2048,
int8 pages, ps=256), plus a GQA leg and an accuracy referee."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import exploring_flash_attention_tpu.serving.decode as dec
from exploring_flash_attention_tpu.serving.decode import (
    paged_extend_attention,
)
from exploring_flash_attention_tpu.serving.kv_cache import (
    PageAllocator, append_prompt, make_cache,
)
from exploring_flash_attention_tpu.utils.benchmark import time_fn_chained

bsz, hq, hkv, d = 8, 8, 8, 128
hist, chunk, page_size = 1792, 256, 256
ctx = hist + chunk
pps = ctx // page_size
cache = make_cache(hkv, d, n_pages=bsz * pps, page_size=page_size,
                   max_seqs=bsz, max_pages_per_seq=pps)
alloc = PageAllocator(bsz * pps)
rng = np.random.default_rng(0)
for s in range(bsz):
    pages = alloc.alloc(pps)
    pt = cache.page_table.at[s, :pps].set(jnp.asarray(pages, jnp.int32))
    cache = dataclasses.replace(cache, page_table=pt)
    kp = jnp.asarray(rng.standard_normal((ctx, hkv, d)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((ctx, hkv, d)), jnp.float32)
    cache = append_prompt(cache, s, kp, vp)
slots = jnp.arange(bsz, dtype=jnp.int32)
q0 = jnp.asarray(rng.standard_normal((bsz, chunk, hq, d)), jnp.bfloat16)

flops = 4 * bsz * hq * chunk * (hist + chunk / 2) * d

# accuracy: one-pass vs streaming on-chip (bit-for-bit is not expected —
# exp2-basis single-pass vs natural-exp online — but must agree to bf16)
o_new = np.asarray(paged_extend_attention(q0, cache, slots),
                   dtype=np.float32)
# budget overrides restored unconditionally (round-4 ADVICE: a raise
# mid-run must not leave the module gate at 0 for later importers)
_budget = dec.EXTEND_ONEPASS_MAX_BYTES
try:
    dec.EXTEND_ONEPASS_MAX_BYTES = 0
    o_old = np.asarray(paged_extend_attention(q0, cache, slots),
                       dtype=np.float32)
finally:
    dec.EXTEND_ONEPASS_MAX_BYTES = _budget
diff = np.max(np.abs(o_new - o_old))
print(f"onepass vs streaming max_abs {diff:.2e}", flush=True)
assert diff < 2e-2, diff


def run(name, fn):
    sec = time_fn_chained(fn, q0, n_long=24, n_short=4, reps=5)
    print(f"{name:28s} {sec*1e3:7.3f} ms  {flops/sec/1e12:6.1f} TF  "
          f"({bsz*chunk/sec:.0f} tok/s)", flush=True)


run("onepass extend", lambda x: paged_extend_attention(x, cache, slots))

try:
    dec.EXTEND_ONEPASS_MAX_BYTES = 0
    run("streaming extend", lambda x: paged_extend_attention(x, cache, slots))
finally:
    dec.EXTEND_ONEPASS_MAX_BYTES = _budget
