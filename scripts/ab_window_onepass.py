#!/usr/bin/env python
"""A/B: sliding-window one-pass (Element-indexed sliding KV band) vs the
streaming window kernel at the 32K benchmark shape, one process."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax.numpy as jnp
from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import (
    error_stats, make_qkv, naive_attention)
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.utils.benchmark import time_fn_chained

B, H, L, D, W = 1, 8, 32768, 128, 4096

def run(one_pass, tag, check=False):
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    qb, kb, vb = (jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))
    cfg = TileConfig(block_q=1024, block_kv=2048,
                     one_pass=None if one_pass else False)
    errtxt = ""
    if check:
        out = np.asarray(flash_attention_v1(
            qb[:, :1, :2048], kb[:, :1, :2048], vb[:, :1, :2048],
            config=TileConfig(one_pass=None if one_pass else False),
            causal=True, window=W // 4).astype(jnp.float32))
        qr, kr, vr = (np.asarray(x.astype(jnp.float32))[:, :1, :2048]
                      for x in (qb, kb, vb))
        ref = naive_attention(qr, kr, vr, causal=True, window=W // 4)
        errtxt = f" max_abs={error_stats(out, ref)['max_abs']:.1e}"
    sec = time_fn_chained(
        lambda x: flash_attention_v1(x, kb, vb, config=cfg, causal=True,
                                     window=W),
        qb, n_long=6, n_short=2)
    band = 4 * B * H * L * W * D          # useful band FLOPs
    print(f"{tag:24s}: {sec*1e3:8.3f} ms  {band/sec/1e12:6.1f} TF/s"
          f"{errtxt}", flush=True)

run(True,  "window onepass 32K w=4K", check=True)
run(False, "window stream  32K w=4K")
run(True,  "window onepass (rep)")
