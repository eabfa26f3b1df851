#!/usr/bin/env python
"""Compare kernel variants on the canonical d=128 shape on the real chip."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import SplitKVConfig, TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import (
    flash_attention_v1, flash_attention_v2,
)
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

    variants = {}
    for bq in (256, 512, 1024):
        for bk in (256, 512):
            cfg = SplitKVConfig(block_q=bq, block_kv=bk,
                                kv_tiles_per_block=L // bk)
            variants[f"v2span bq={bq} bk={bk}"] = (
                lambda x, cfg=cfg: flash_attention_v2(x, kd, vd, config=cfg))
    variants["v1 bq=1024 bk=1024"] = (
        lambda x: flash_attention_v1(x, kd, vd,
                                     config=TileConfig(block_q=1024, block_kv=1024)))

    for name, step in variants.items():
        try:
            sec = time_fn_chained(step, q0, n_long=16, n_short=4, reps=3)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        tf = flops / sec / 1e12
        print(f"{name:28s} {sec*1e3:7.3f} ms  {tf:7.1f} TFLOP/s  {100*tf/roof:5.1f}%")

if __name__ == "__main__":
    main()
