#!/usr/bin/env python
"""Analytic ICI scaling projection for ring sequence-parallel attention
(VERDICT r4 item 7) — computable on ONE chip.

The ring (parallel/ring.py) runs ``sp`` steps; per step every chip
computes a partial attention of its local Q block against the currently
resident KV shard and ppermutes the shard to its neighbor.  With the
collective overlapped against compute (the shipped design), per-chip
step time is max(t_compute, t_comm):

    t_comm    = 2 * B * H * L_local * d * 2 bytes / BW_ici   (K and V, bf16)
    t_compute = MEASURED one-chip time of the partial kernel at
                (B, H, L_local x L_local, d)

and ring efficiency = t_compute / max(t_compute, t_comm) (overlapped)
or t_compute / (t_compute + t_comm) (serialized floor).  Both are
reported, swept over L in {8K, 32K, 128K} and sp in {2, 4, 8}.

Assumptions (stated, not measured — no pod is reachable from this
harness):
  - v5e ICI: 4 links/chip; a 1D ring uses one link each way.  Public
    per-link one-way bandwidth ~45 GB/s ("How to Scale Your Model",
    v5e row); a conservative half-rate row is included.
  - KV travels bf16; per-step message = the full local K and V shard.
  - The merge of partials (associative (m, l, o) combine) is elementwise
    VPU work measured <3% of the partial kernel at these shapes and is
    folded into t_compute via the measured call.
  - DCN is NOT modeled: the projection holds for rings that stay on ICI
    (<= one v5e pod slice), which is the BASELINE.md:38 N>=2-host tier.

Writes bench/scaling_model.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.utils.benchmark import time_fn_chained

B, H, D = 1, 8, 128
ICI_GBPS = {"v5e_1link_oneway_45GBs": 45e9,
            "conservative_half_22.5GBs": 22.5e9}


def measure_partial(l_local: int) -> float:
    q, k, v = make_qkv(B, H, l_local, D, dtype=np.float32, seed=1)
    qb, kb, vb = (jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))
    cfg = TileConfig(block_q=min(1024, l_local), block_kv=min(1024, l_local))
    return time_fn_chained(
        lambda x: flash_attention_v1(x, kb, vb, config=cfg),
        qb, n_long=max(8, min(64, (16384 // l_local) * 8)), n_short=2)


def main():
    measured = {}
    for l_local in (1024, 2048, 4096, 8192, 16384):
        sec = measure_partial(l_local)
        measured[l_local] = sec
        print(f"partial kernel L_local={l_local}: {sec*1e3:.3f} ms",
              flush=True)

    table = []
    for l_total in (8192, 32768, 131072):
        for sp in (2, 4, 8):
            l_local = l_total // sp
            if l_local not in measured:
                continue
            t_c = measured[l_local]
            msg_bytes = 2 * B * H * l_local * D * 2
            for bw_name, bw in ICI_GBPS.items():
                t_m = msg_bytes / bw
                table.append({
                    "L_total": l_total,
                    "sp": sp,
                    "L_local": l_local,
                    "bw_assumption": bw_name,
                    "t_compute_ms": round(t_c * 1e3, 4),
                    "t_comm_ms": round(t_m * 1e3, 4),
                    "eff_overlapped": round(t_c / max(t_c, t_m), 4),
                    "eff_serialized_floor": round(t_c / (t_c + t_m), 4),
                })

    out = {
        "model": "ring sp attention: per-step max(t_compute, t_comm), "
                 "t_comm = 2*B*H*L_local*d*2B / BW_ici",
        "shape": {"B": B, "H": H, "d": D, "kv_dtype": "bf16"},
        "measured_partial_kernel_ms": {
            str(k): round(v * 1e3, 4) for k, v in measured.items()},
        "assumptions": [
            "v5e 1D ring on ICI (one link each way); per-link one-way "
            "bandwidth 45 GB/s per the public scaling-book v5e row, with "
            "a conservative half-rate sensitivity row",
            "partial-merge VPU cost folded into the measured kernel call",
            "DCN not modeled: valid for rings within one ICI domain "
            "(the BASELINE N>=2-host tier on a pod slice)",
            "compute measured on THIS chip (see vintage in results.json); "
            "multi-chip execution itself is CPU-mesh-verified only "
            "(bench/scaling.json valid_on_hw=false)",
        ],
        "projection": table,
        "headline": None,
    }
    # the >=85% claim's citation row: L=32K on a 4-chip ring
    for row in table:
        if (row["L_total"] == 32768 and row["sp"] == 4
                and row["bw_assumption"].startswith("v5e")):
            out["headline"] = row
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench", "scaling_model.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["headline"]))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
