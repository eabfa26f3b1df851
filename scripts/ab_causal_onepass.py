#!/usr/bin/env python
"""A/B: causal one-pass (static strip truncation) vs causal streaming
(online softmax + tile skip) at the eligible shapes, one process."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax.numpy as jnp
from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import (
    error_stats, make_qkv, naive_attention)
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained)

def run(b, h, l, d, one_pass, tag, check=False):
    q, k, v = make_qkv(b, h, l, d, dtype=np.float32, seed=1)
    qb, kb, vb = (jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))
    cfg = TileConfig(block_q=512, block_kv=512,
                     one_pass=None if one_pass else False)
    errtxt = ""
    if check:
        out = np.asarray(flash_attention_v1(
            qb, kb, vb, config=cfg, causal=True).astype(jnp.float32))
        qr, kr, vr = (np.asarray(x.astype(jnp.float32)) for x in (qb, kb, vb))
        ref = naive_attention(qr[:1, :2], kr[:1, :2], vr[:1, :2], causal=True)
        errtxt = f" max_abs={error_stats(out[:1,:2], ref)['max_abs']:.1e}"
    sec = time_fn_chained(
        lambda x: flash_attention_v1(x, kb, vb, config=cfg, causal=True),
        qb, n_long=12, n_short=3)
    tf = attention_flops(b, h, l, l, d, causal=True) / sec / 1e12
    print(f"{tag:28s}: {sec*1e3:7.3f} ms  {tf:6.1f} TF/s{errtxt}", flush=True)

for l, nl in [(1024, None), (2048, None), (4096, None)]:
    run(32 if l == 1024 else 8, 8, l, 128, True,  f"onepass  L={l}", check=True)
    run(32 if l == 1024 else 8, 8, l, 128, False, f"stream   L={l}")
run(32, 8, 1024, 128, True,  "onepass  L=1024 (rep)")
