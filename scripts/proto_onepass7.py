#!/usr/bin/env python
"""Prod kernel A/B: denom pre-cast (current) vs post-cast, + gate accuracy."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import (
    error_stats, make_qkv, naive_attention,
)
import exploring_flash_attention_tpu.ops.attention_v1 as v1mod
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, roofline_attention_tflops, time_fn_chained,
)

B, H, L, D = 32, 8, 1024, 128
CFG = TileConfig(block_q=1024, block_kv=1024)


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    kd = jnp.asarray(k).astype(jnp.bfloat16)
    vd = jnp.asarray(v).astype(jnp.bfloat16)
    q0 = jnp.asarray(q).astype(jnp.bfloat16)
    flops = attention_flops(B, H, L, L, D)
    roof = roofline_attention_tflops(B, H, L, D)

    gq, gk, gv = make_qkv(2, 4, 512, D, dtype=np.float32, seed=0)
    gqb, gkb, gvb = (jnp.asarray(x).astype(jnp.bfloat16) for x in (gq, gk, gv))
    gref = naive_attention(*(np.asarray(x.astype(jnp.float32)) for x in (gqb, gkb, gvb)))

    for mode in ("pre", "post"):
        v1mod._DENOM_POST_CAST = (mode == "post")
        fn = v1mod.flash_attention_v1
        # fresh jit cache per mode: config diff via block sizes? use clear
        fn.clear_cache()
        out = np.asarray(fn(gqb, gkb, gvb, config=TileConfig(block_q=512, block_kv=512), out_dtype=jnp.float32))
        err = error_stats(out, gref)["max_abs"]
        sec = time_fn_chained(lambda x: fn(x, kd, vd, config=CFG), q0, n_long=16, n_short=4, reps=5)
        tf = flops / sec / 1e12
        print(f"{mode:5s} {sec*1e3:7.3f} ms {tf:7.1f} TF {100*tf/roof:5.1f}%  gate={err:.2e}")


if __name__ == "__main__":
    main()
