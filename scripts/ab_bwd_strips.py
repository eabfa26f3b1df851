"""In-process A/B: fused-backward strip sizes on the causal train step."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)

b, h, l, d = 32, 8, 1024, 128
q, k, v = make_qkv(b, h, l, d, dtype=np.float32, seed=1)
qb, kb, vb = (jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))
fl = 4.5 * attention_flops(b, h, l, l, d, causal=True)

for qs, ks in ((256, 512), (512, 512), (256, 1024), (512, 1024), (128, 512)):
    cfg = TileConfig(block_q=512, block_kv=ks, q_chunk=qs)

    def step(x, c=cfg):
        dq, dk, dv = jax.grad(
            lambda q, k, v: jnp.sum(
                flash_attention(q, k, v, config=c, causal=True)
            ),
            argnums=(0, 1, 2),
        )(x, kb, vb)
        return ((dq + dk + dv) / 3).astype(x.dtype)

    sec = time_fn_chained(step, qb, n_long=12, n_short=3)
    print(f"fused bwd q_strip={qs} kv_strip={ks}   "
          f"{sec*1e3:8.3f} ms  {fl/sec/1e12:7.1f} TF", flush=True)
