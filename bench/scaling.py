#!/usr/bin/env python
"""Multi-chip scaling-efficiency harness (BASELINE: >=85% tokens/s scaling
to N>=2 hosts; VERDICT round-1 item 6).

Measures per-chip training tokens/s of the flagship model at dp=1 and at
dp=N (the full device set), and reports

    efficiency = tokens_per_chip(dp=N) / tokens_per_chip(dp=1) * 100

— the number BASELINE demands the moment real chips exist.  The harness
extends the reference's driver-is-the-benchmark discipline
(/root/reference/flash_attention_v1/CUDA/driver.cu:218-243) to the
multi-chip tier: each configuration self-validates (finite, decreasing
loss) before it is timed.

On this environment only ONE real TPU chip exists, so the dp=N leg runs on
the virtual CPU mesh (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8) — that validates the
harness and the sharded step end-to-end but the efficiency number is
labeled ``valid_on_hw: false`` (host "chips" share one socket's memory
bandwidth, so CPU efficiency vastly understates ICI).  On a pod, run as-is.

Usage:
    python bench/scaling.py                 # all devices
    python bench/scaling.py --dp 4          # fixed dp
    python bench/scaling.py --sp 4          # sequence-parallel scaling leg
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Some TPU plugins (axon) ignore the JAX_PLATFORMS env var; when the caller
# asked for the virtual CPU mesh, re-assert it through jax.config before any
# backend initialization (same workaround as __graft_entry__.dryrun_multichip).
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" in flags:
        n = int(flags.split("xla_force_host_platform_device_count=")[1].split()[0])
        jax.config.update("jax_num_cpu_devices", n)

import jax.numpy as jnp
import numpy as np


def measure_tokens_per_sec(mesh_cfg, bsz_per_dp, seq, n_steps=8):
    """Train-step tokens/s on a (dp, tp, sp) mesh (None = single chip)."""
    from exploring_flash_attention_tpu.configs import MeshConfig, TileConfig
    from exploring_flash_attention_tpu.models import (
        ModelConfig, init_params, make_train_step,
    )
    from exploring_flash_attention_tpu.models.transformer import shard_params
    from exploring_flash_attention_tpu.parallel import make_mesh

    dp, tp, sp = mesh_cfg if mesh_cfg else (1, 1, 1)
    mesh = make_mesh(MeshConfig(dp=dp, tp=tp, sp=sp)) if mesh_cfg else None

    cfg = ModelConfig(
        vocab_size=32768, n_layers=4, n_heads=8, n_kv_heads=8,
        d_model=1024, d_head=128, d_ff=4096, dtype=jnp.bfloat16,
        tile=TileConfig(block_q=256, block_kv=256),
    )
    params = init_params(cfg, seed=0)
    if mesh is not None:
        params = shard_params(params, mesh, cfg)
        train_step, opt = make_train_step(cfg, mesh=mesh)
    else:
        train_step, opt = make_train_step(cfg)
    opt_state = opt.init(params)

    bsz = bsz_per_dp * dp
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (bsz, seq + 1)),
        jnp.int32,
    )
    # self-validation before timing (driver.cu discipline): finite and
    # decreasing loss through the sharded step
    params, opt_state, loss0 = train_step(params, opt_state, tokens)
    params, opt_state, loss1 = train_step(params, opt_state, tokens)
    assert jnp.isfinite(loss0) and float(loss1) < float(loss0), (loss0, loss1)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = train_step(params, opt_state, tokens)
    float(loss)  # force completion (block_until_ready lies on axon)
    dt = (time.perf_counter() - t0) / n_steps
    return bsz * seq / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel width (default: all devices)")
    ap.add_argument("--sp", type=int, default=0,
                    help="scale over sp instead of dp")
    ap.add_argument("--bsz", type=int, default=4, help="batch per dp shard")
    ap.add_argument("--seq", type=int, default=512)
    args = ap.parse_args()

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    if args.sp:
        n = args.sp
        mesh_n = (1, 1, n)
        seq_n, seq_1 = args.seq * n, args.seq * n  # same global problem
        axis = "sp"
    else:
        n = args.dp or n_dev
        mesh_n = (n, 1, 1)
        seq_n = seq_1 = args.seq
        axis = "dp"

    tps_1, dt_1 = measure_tokens_per_sec((1, 1, 1), args.bsz, seq_1)
    tps_n, dt_n = measure_tokens_per_sec(mesh_n, args.bsz, seq_n)

    per_chip_1 = tps_1
    per_chip_n = tps_n / n
    eff = 100.0 * per_chip_n / per_chip_1
    valid = platform == "tpu" and n > 1
    entry = {
        "metric": f"train_scaling_efficiency_{axis}{n}",
        "value": round(eff, 2),
        "unit": "%",
        "vs_baseline": round(eff / 85.0, 4),
        "tokens_per_sec_1chip": round(tps_1, 1),
        "tokens_per_sec_total": round(tps_n, 1),
        "ms_per_step": [round(dt_1 * 1e3, 2), round(dt_n * 1e3, 2)],
        "platform": platform,
        "valid_on_hw": valid,
        "note": (f"{axis}={n} vs {axis}=1, per-chip tokens/s ratio"
                 + ("" if valid else
                    " — CPU/1-chip run validates the harness only")),
    }
    print(json.dumps(entry))

    # persist: every round's artifact carries the scaling number
    # (VERDICT r2 item 6 — the driver-is-the-benchmark rule,
    # /root/reference/flash_attention_v1/CUDA/driver.cu:218-243)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scaling.json")
    try:
        with open(out_path) as f:
            persisted = {e["metric"]: e for e in json.load(f)}
    except (OSError, ValueError):
        persisted = {}
    persisted[entry["metric"]] = entry
    with open(out_path, "w") as f:
        json.dump(sorted(persisted.values(), key=lambda e: e["metric"]),
                  f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
