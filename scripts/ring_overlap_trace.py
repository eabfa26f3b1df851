#!/usr/bin/env python
"""Ring comm/compute overlap evidence harness (VERDICT round-1 item 9).

The ring (parallel/ring.py) claims its ``ppermute``-before-compute ordering
lets XLA's async collective scheduling hide the K/V shard transfer under
the partial-attention matmuls — the collective-level analog of the
reference's double-buffered smem prefetch
(/root/reference/flash_attention_v2/CUDA/flash_attention_v2.h:466-501).
That claim needs DATA from a real multi-chip ICI domain.  This script is
the runnable evidence plan: point it at a pod and it

1. times three jitted programs on the sp mesh —
     ring      : the full ring step (compute + rotation interleaved)
     compute   : the same per-step partial-attention work, no collectives
     comm      : the same n-1 (K, V) rotations, no attention
2. reports overlap% = (T_compute + T_comm - T_ring) / min(T_comp, T_comm)
   — 100% means the cheaper phase rides entirely under the other; <=0%
   means the phases serialized and the RDMA-ring alternative
   (pltpu.make_async_remote_copy) should be revisited;
3. captures an xprof/XPlane trace of one ring step (--trace-dir, open in
   TensorBoard's Profile tab or xprof) so the collective-permute /
   fusion timeline can be inspected kernel-by-kernel.

Off-pod this still runs end-to-end on the virtual CPU mesh
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8),
which validates lowering + the harness itself; the overlap number is
meaningless there (host "collectives" are memcpys) and is labeled so.

Usage:
    python scripts/ring_overlap_trace.py                # time + trace
    python scripts/ring_overlap_trace.py --check        # lowering check only
    python scripts/ring_overlap_trace.py --sp 4 --l-local 8192 --causal
"""

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from exploring_flash_attention_tpu.configs import MeshConfig, TileConfig
from exploring_flash_attention_tpu.parallel.mesh import make_mesh
from exploring_flash_attention_tpu.parallel.partials import (
    attention_partial_local,
    merge_partials,
)
from exploring_flash_attention_tpu.parallel.ring import (
    _ring_perm,
    ring_flash_attention,
)
from exploring_flash_attention_tpu.utils.benchmark import time_fn_chained


def build_programs(mesh, axis, config, causal):
    """(ring, compute-only, comm-only) shard_map programs, each mapping
    (q, k, v) -> q-shaped array so time_fn_chained can chain them."""
    n_ring = mesh.shape[axis]
    spec = P(None, None, axis, None)

    def ring_local(q_l, k_l, v_l):
        return ring_flash_attention(
            q_l, k_l, v_l, axis, config, None, causal, None
        )

    def compute_local(q_l, k_l, v_l):
        # the ring's per-step compute, same count (n_ring partials + merge),
        # but always on the resident shard — zero collectives
        o, lse = attention_partial_local(
            q_l, k_l, v_l, config=config, causal=causal,
            positions=(jnp.int32(0), jnp.int32(0)) if causal else None,
        )
        def body(carry, _):
            o, lse = carry
            o_p, lse_p = attention_partial_local(
                q_l, k_l, v_l, config=config, causal=causal,
                positions=(jnp.int32(0), jnp.int32(0)) if causal else None,
            )
            return merge_partials(o, lse, o_p, lse_p), ()
        (o, lse), _ = jax.lax.scan(
            body, (o, lse), None, length=n_ring - 1
        )
        return o.astype(q_l.dtype)

    def comm_local(q_l, k_l, v_l):
        # the ring's transfer volume, zero attention: n-1 (K, V) rotations
        perm = _ring_perm(n_ring)
        def body(carry, _):
            k_c, v_c = carry
            return (jax.lax.ppermute(k_c, axis, perm),
                    jax.lax.ppermute(v_c, axis, perm)), ()
        (k_c, v_c), _ = jax.lax.scan(
            body, (k_l, v_l), None, length=n_ring - 1
        )
        # fold into a q-shaped output so nothing dead-code-eliminates
        return q_l + (jnp.sum(k_c) + jnp.sum(v_c)).astype(q_l.dtype) * 0

    def wrap(local):
        return jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
            check_vma=False,
        ))

    return wrap(ring_local), wrap(compute_local), wrap(comm_local)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sp", type=int, default=0,
                    help="ring size (default: all devices)")
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--l-local", type=int, default=4096,
                    help="per-chip sequence length")
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/ring_overlap_trace")
    ap.add_argument("--check", action="store_true",
                    help="lowering check only (no timing, works anywhere)")
    args = ap.parse_args()

    n_dev = len(jax.devices())
    sp = args.sp or n_dev
    platform = jax.devices()[0].platform
    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=sp))
    config = TileConfig()
    axis = "sp"

    B, H, d = args.b, args.h, args.d
    L = args.l_local * sp
    rng = np.random.default_rng(0)
    spec = P(None, None, axis, None)
    qkv = [
        jax.device_put(
            jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.bfloat16),
            NamedSharding(mesh, spec))
        for _ in range(3)
    ]

    ring, comp, comm = build_programs(mesh, axis, config, args.causal)

    if args.check:
        for name, fn in (("ring", ring), ("compute", comp), ("comm", comm)):
            lowered = fn.lower(*qkv)
            lowered.compile()
            print(f"lowering ok: {name}")
        return

    def chainable(fn):
        # time_fn_chained wants x -> fn(x); close over (k, v)
        k, v = qkv[1], qkv[2]
        return lambda q: fn(q, k, v)

    times = {}
    for name, fn in (("ring", ring), ("compute", comp), ("comm", comm)):
        times[name] = time_fn_chained(chainable(fn), qkv[0], n_long=12,
                                      n_short=3, reps=3)
        print(f"{name:<10} {times[name]*1e3:9.3f} ms/step")

    t_r, t_cp, t_cm = times["ring"], times["compute"], times["comm"]
    hideable = min(t_cp, t_cm)
    overlap_pct = 100.0 * (t_cp + t_cm - t_r) / hideable if hideable > 0 else 0.0
    valid = platform == "tpu" and sp > 1
    verdict = (
        "ICI transfer rides under the matmuls — ppermute ring justified"
        if overlap_pct >= 70 else
        "phases mostly serialized — revisit the make_async_remote_copy ring"
    ) if valid else "INVALID off-pod: CPU/1-chip collectives are memcpys"

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        ring(*qkv)[0, 0, 0, :8].block_until_ready()
    print(f"xprof trace -> {args.trace_dir} (TensorBoard Profile tab)")

    result = {
        "platform": platform, "sp": sp, "shape": [B, H, L, d],
        "causal": args.causal,
        "ms": {k: v * 1e3 for k, v in times.items()},
        "overlap_pct": overlap_pct, "valid_on_ici": valid,
        "verdict": verdict,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
