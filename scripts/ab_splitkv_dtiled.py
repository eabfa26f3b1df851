"""In-process A/B sweep: split-KV pair configs and d-tiled configs.

Run on the real chip: python scripts/ab_splitkv_dtiled.py
(one process => comparable timings; cross-process variance is 10-25%).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import SplitKVConfig, TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import (
    flash_attention_v1_dtiled, flash_attention_v2,
)
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, time_fn_chained,
)


def bf16(b, h, l, d, seed):
    q, k, v = make_qkv(b, h, l, d, dtype=np.float32, seed=seed)
    return tuple(jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))


def run(tag, fn, q, flops):
    # time_fn_chained medians 3 internal reps; calling it repeatedly would
    # recompile the chain wrappers each time
    sec = time_fn_chained(fn, q)
    print(f"{tag:55s} {sec*1e3:8.3f} ms  {flops/sec/1e12:7.1f} TF",
          flush=True)


def main():
    # ---- split-KV pair at the canonical shape ----
    b, h, l, d = 32, 8, 1024, 128
    qb, kb, vb = bf16(b, h, l, d, seed=1)
    fl = attention_flops(b, h, l, l, d)
    for bq, span_tiles, bkv in (
        (512, 1, 512), (1024, 1, 512), (512, 1, 256), (1024, 1, 256),
    ):
        cfg = SplitKVConfig(block_q=bq, block_kv=bkv,
                            kv_tiles_per_block=span_tiles)
        run(f"splitkv bq={bq} span={span_tiles*bkv}",
            lambda x, c=cfg: flash_attention_v2(x, kb, vb, config=c),
            qb, fl)

    # ---- d-tiled at d=512 ----
    b, h, l, d = 4, 8, 1024, 512
    qb, kb, vb = bf16(b, h, l, d, seed=1)
    fl = attention_flops(b, h, l, l, d)
    for bq, bkv, dt in (
        (256, 256, 128), (512, 512, 128), (512, 512, 256), (512, 256, 256),
        (1024, 512, 256),
    ):
        cfg = TileConfig(block_q=bq, block_kv=bkv,
                         d_tile_qk=dt, d_tile_v=dt)
        run(f"dtiled d512 bq={bq} bkv={bkv} dt={dt}",
            lambda x, c=cfg: flash_attention_v1_dtiled(x, kb, vb, config=c),
            qb, fl)


if __name__ == "__main__":
    main()
