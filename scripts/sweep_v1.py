#!/usr/bin/env python
"""Block-size sweep for the fused V1 kernel on the real chip."""
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, roofline_attention_tflops, time_fn_chained,
)

B, H, L, D = 32, 8, 1024, 128

def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    kd = jnp.asarray(k).astype(jnp.bfloat16)
    vd = jnp.asarray(v).astype(jnp.bfloat16)
    q0 = jnp.asarray(q).astype(jnp.bfloat16)
    flops = attention_flops(B, H, L, L, D)
    roof = roofline_attention_tflops(B, H, L, D)

    results = []
    bqs = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1 else [128, 256, 512, 1024])]
    bks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else [128, 256, 512, 1024])]
    for bq, bk in itertools.product(bqs, bks):
        cfg = TileConfig(block_q=bq, block_kv=bk)
        def step(x, cfg=cfg):
            return flash_attention_v1(x, kd, vd, config=cfg)
        try:
            sec = time_fn_chained(step, q0, n_long=16, n_short=4, reps=3)
        except Exception as e:
            print(f"bq={bq:5d} bk={bk:5d}  FAILED: {type(e).__name__}: {str(e)[:100]}")
            continue
        tf = flops / sec / 1e12
        results.append((tf, bq, bk))
        print(f"bq={bq:5d} bk={bk:5d}  {sec*1e3:7.3f} ms  {tf:7.1f} TFLOP/s  {100*tf/roof:5.1f}% roofline")
    results.sort(reverse=True)
    print("\nbest:", results[0] if results else None)

if __name__ == "__main__":
    main()
