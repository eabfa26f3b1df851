"""Ring attention over the sequence axis: KV tiles rotate around the ICI
ring while every chip folds them into its running (O, lse) state.

This is the reference's V2 split-KV math (partial + rescaled combine,
SURVEY §5 long-context row) with "KV blocks" = chips and the workspace
exchange = ``ppermute`` rotations: each chip holds one Q shard and one KV
shard; after ``sp`` steps every Q shard has seen every KV shard.  The merge
is the associative pairwise rule (parallel/partials.py:merge_partials), so
no global workspace materializes — memory per chip stays O(L_local).

Comm/compute overlap: each step starts the next shard's ``ppermute``
(lowered to async collective-permute over ICI) BEFORE computing on the
shard in hand, so the transfer rides under the partial-attention matmuls
— the collective-level expression of the double-buffered
``make_async_remote_copy`` ring (pallas_guide: Ring Collectives).  A
hand-rolled Pallas RDMA ring was evaluated and rejected for this tier:
TPU grid programs execute sequentially per core, so an in-kernel ring
would need HBM-resident softmax state (see memory notes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.parallel.partials import (
    attention_partial_local,
    merge_partials,
)


def ring_attention(
    q: jax.Array,               # [B, H, Lq, d]  sharded over sp on dim 2
    k: jax.Array,               # [B, H, Lkv, d] sharded over sp on dim 2
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "sp",
    config: TileConfig = TileConfig(),
    scale: Optional[float] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Ring attention; output sharded like q.

    Causal mode: every shard's global offset is threaded into the partial
    kernel (positions=(q_pos0, kv_pos0)), so KV chunks entirely in a Q
    shard's future contribute lse=-inf and drop out of the merge — the
    simple (non-zigzag) causal ring."""
    n_ring = mesh.shape[axis_name]

    def local_fn(q_l, k_l, v_l):
        lq_local = q_l.shape[2]
        lkv_local = k_l.shape[2]
        my = jax.lax.axis_index(axis_name)
        q_pos0 = my * lq_local

        def partial(k_c, v_c, src_idx):
            return attention_partial_local(
                q_l, k_c, v_c, config=config, scale=scale,
                interpret=interpret, causal=causal,
                positions=(q_pos0, src_idx * lkv_local) if causal else None,
            )

        # step 0: local KV shard
        o, lse = partial(k_l, v_l, my)
        if n_ring == 1:
            return o.astype(q_l.dtype)

        perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

        # Overlap structure: each scan step STARTS the rotation of the shard
        # it already holds (async collective-permute over ICI), then computes
        # attention on that same shard while the transfer is in flight — the
        # compute result does not depend on the permute output, so XLA's
        # async collective scheduling can run them concurrently (the
        # dataflow analog of the double-buffered make_async_remote_copy ring,
        # pallas_guide "Ring Collectives"; compute-hides-comm as in SURVEY §7
        # stage 8).  Step 0 (the local shard) is peeled above; the scan folds
        # shards my-1, my-2, ... in arrival order.
        def body(carry, step):
            o, lse, k_c, v_c = carry
            k_nxt = jax.lax.ppermute(k_c, axis_name, perm)   # start transfer
            v_nxt = jax.lax.ppermute(v_c, axis_name, perm)
            src_idx = jax.lax.rem(my - step + n_ring, n_ring)
            o_p, lse_p = partial(k_c, v_c, src_idx)          # overlap compute
            o, lse = merge_partials(o, lse, o_p, lse_p)
            return (o, lse, k_nxt, v_nxt), None

        # the peeled step 0 already consumed the local shard, so the scan
        # body computes on the shard that arrived at the END of the previous
        # step: rotate once before entering the loop.  The LAST arriving
        # shard is folded outside the scan so its rotation isn't wastefully
        # forwarded another hop.
        k_c = jax.lax.ppermute(k_l, axis_name, perm)
        v_c = jax.lax.ppermute(v_l, axis_name, perm)
        (o, lse, k_c, v_c), _ = jax.lax.scan(
            body, (o, lse, k_c, v_c), jnp.arange(1, n_ring - 1)
        )
        last_src = jax.lax.rem(my - (n_ring - 1) + n_ring, n_ring)
        o_p, lse_p = partial(k_c, v_c, last_src)
        o, lse = merge_partials(o, lse, o_p, lse_p)
        return o.astype(q_l.dtype)

    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
