"""Diagnose generation throughput: per-step slope vs fixed overhead."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.models import (
    GenerationEngine, ModelConfig, init_params,
)

cfg = ModelConfig(
    vocab_size=32768, n_layers=4, n_heads=8, n_kv_heads=4,
    d_model=1024, d_head=128, d_ff=4096, dtype=jnp.bfloat16,
    tile=TileConfig(block_q=512, block_kv=512),
)
params = init_params(cfg, seed=0)
bsz, l_prompt = 8, 256
prompt = jnp.asarray(
    np.random.default_rng(0).integers(0, cfg.vocab_size, (bsz, l_prompt)),
    jnp.int32,
)
eng = GenerationEngine(params, cfg, max_seqs=bsz, max_len=1024)

for n_new in (24, 104):
    eng.generate(prompt, max_new_tokens=n_new)          # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        eng.generate(prompt, max_new_tokens=n_new)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"n_new={n_new:4d}  {dt*1e3:8.1f} ms  "
          f"{bsz*n_new/dt:8.0f} tok/s", flush=True)
