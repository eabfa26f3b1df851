"""In-process A/B: decode throughput vs page size (B=32, ctx=2048)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import numpy as np
import jax.numpy as jnp

from exploring_flash_attention_tpu.serving.decode import paged_decode_attention
from exploring_flash_attention_tpu.serving.kv_cache import (
    PageAllocator, append_prompt, make_cache,
)
from exploring_flash_attention_tpu.utils.benchmark import time_fn_chained

bsz, hq, hkv, d, ctx = 32, 8, 8, 128, 2048
rng = np.random.default_rng(0)

for ps in (128, 256, 512, 1024):
    pages_per_seq = ctx // ps
    cache = make_cache(hkv, d, n_pages=bsz * pages_per_seq, page_size=ps,
                       max_seqs=bsz, max_pages_per_seq=pages_per_seq)
    alloc = PageAllocator(bsz * pages_per_seq)
    for s in range(bsz):
        pages = alloc.alloc(pages_per_seq)
        pt = cache.page_table.at[s, :pages_per_seq].set(
            jnp.asarray(pages, jnp.int32))
        cache = dataclasses.replace(cache, page_table=pt)
        kp = jnp.asarray(rng.standard_normal((ctx, hkv, d)), jnp.float32)
        vp = jnp.asarray(rng.standard_normal((ctx, hkv, d)), jnp.float32)
        cache = append_prompt(cache, s, kp, vp)
    slots = jnp.arange(bsz, dtype=jnp.int32)
    q0 = jnp.asarray(rng.standard_normal((bsz, hq, d)), jnp.bfloat16)
    sec = time_fn_chained(
        lambda x, c=cache: paged_decode_attention(x, c, slots),
        q0, n_long=128, n_short=16)
    print(f"page_size={ps:5d}  {sec*1e6:8.1f} us/step  "
          f"{bsz/sec:9.0f} tok/s", flush=True)
