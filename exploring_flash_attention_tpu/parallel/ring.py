"""Ring attention over the sequence axis: KV tiles rotate around the ICI
ring while every chip folds them into its running (O, lse) state.

This is the reference's V2 split-KV math (partial + rescaled combine,
SURVEY §5 long-context row) with "KV blocks" = chips and the workspace
exchange = ``ppermute`` rotations: each chip holds one Q shard and one KV
shard; after ``sp`` steps every Q shard has seen every KV shard.  The merge
is the associative pairwise rule (parallel/partials.py:merge_partials), so
no global workspace materializes — memory per chip stays O(L_local).

Differentiability: :func:`ring_flash_attention` carries a custom VJP whose
backward runs the ring in reverse — (K, V) shards rotate together with
their accumulating (dK, dV) partials while every chip folds its local
(Q, dO) contribution into the visiting shard's gradients.  The per-step
gradient math is the tiled Pallas backward (ops/attention_bwd.py) with the
shard's traced global offset; the cross-shard composition is exactly the
reference's V2 combine rule run through the chain rule
(/root/reference/flash_attention_v2/numpy_gpu_like.py:247-288: partial
(O, m, l) triples merge linearly once weights are fixed, so each shard's
cotangent is the sum of its per-(q-shard) tile gradients).  Memory stays
O(L_local) in both passes — this is what makes sp-training at L=128K
possible, vs the all-gather path's O(L_global) K/V per chip.

Comm/compute overlap: each step starts the next shard's ``ppermute``
(lowered to async collective-permute over ICI) BEFORE computing on the
shard in hand, so the transfer rides under the partial-attention matmuls
— the collective-level expression of the double-buffered
``make_async_remote_copy`` ring (pallas_guide: Ring Collectives).  In the
backward the (K, V) prefetch overlaps the same way; the (dK, dV) rotation
necessarily follows the step's compute (the contribution must be folded in
before the shard leaves).  A hand-rolled Pallas RDMA ring was evaluated
and rejected for this tier: TPU grid programs execute sequentially per
core, so an in-kernel ring would need HBM-resident softmax state (see
scripts/ring_overlap_trace.py for the on-pod validation plan).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.parallel.partials import (
    attention_partial_local,
    merge_partials,
)


def _ring_perm(n_ring: int):
    return [(i, (i + 1) % n_ring) for i in range(n_ring)]


def _ring_fwd_core(
    q_l, k_l, v_l, axis_name, config, scale, causal, interpret
):
    """One shard's ring forward: returns (o [B,H,Lql,d] f32, lse [B,H,Lql])."""
    n_ring = jax.lax.axis_size(axis_name)
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
        return o, lse

    perm = _ring_perm(n_ring)

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
    return o, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def ring_flash_attention(
    q_l: jax.Array,               # [B, H, Lq_local, d]   (this shard)
    k_l: jax.Array,               # [B, H_kv, Lkv_local, d]
    v_l: jax.Array,
    axis_name: str = "sp",
    config: TileConfig = TileConfig(),
    scale: Optional[float] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Differentiable ring attention over ``axis_name`` — call INSIDE
    ``shard_map`` on per-shard values.  Output is this shard's [B, H,
    Lq_local, d] in q's dtype.  Memory per chip is O(L_local) in forward
    AND backward (no K/V all-gather anywhere), which is what lets
    sequence-parallel training reach the L=128K north-star tier.

    GQA: ``k_l``/``v_l`` may carry fewer heads than ``q_l``; the partial
    and backward kernels share the KV head across the q-head group
    natively."""
    o, _ = _ring_fwd_core(
        q_l, k_l, v_l, axis_name, config, scale, causal, interpret
    )
    return o.astype(q_l.dtype)


def _ring_fa_fwd(q_l, k_l, v_l, axis_name, config, scale, causal, interpret):
    o, lse = _ring_fwd_core(
        q_l, k_l, v_l, axis_name, config, scale, causal, interpret
    )
    out = o.astype(q_l.dtype)
    return out, (q_l, k_l, v_l, out, lse)


def _ring_fa_bwd(axis_name, config, scale, causal, interpret, res, g):
    from exploring_flash_attention_tpu.ops.attention_bwd import (
        flash_attention_bwd,
    )

    q_l, k_l, v_l, out, lse = res
    n_ring = jax.lax.axis_size(axis_name)
    lq_local = q_l.shape[2]
    lkv_local = k_l.shape[2]
    my = jax.lax.axis_index(axis_name)
    q_pos0 = my * lq_local
    do = g.astype(q_l.dtype)
    perm = _ring_perm(n_ring)

    def step_grads(k_c, v_c, src_idx):
        return flash_attention_bwd(
            q_l, k_c, v_c, out, do, lse,
            config=config, scale=scale, causal=causal, interpret=interpret,
            positions=(q_pos0, src_idx * lkv_local) if causal else None,
        )

    if n_ring == 1:
        dq, dk, dv = step_grads(k_l, v_l, my)
        return dq.astype(q_l.dtype), dk.astype(k_l.dtype), dv.astype(v_l.dtype)

    # (K, V) shards rotate together with their accumulating (dK, dV): at
    # step s chip `my` holds shard (my - s) mod n plus the gradients the
    # previous s chips already folded in; after n steps every shard is
    # home carrying contributions from every chip.  The (K, V) prefetch
    # rotation starts before the step's backward kernels (overlapped);
    # the (dK, dV) rotation follows them by necessity.
    def body(carry, step):
        dq_acc, k_c, v_c, dk_c, dv_c = carry
        k_nxt = jax.lax.ppermute(k_c, axis_name, perm)   # prefetch overlap
        v_nxt = jax.lax.ppermute(v_c, axis_name, perm)
        src_idx = jax.lax.rem(my - step + n_ring, n_ring)
        dq_p, dk_p, dv_p = step_grads(k_c, v_c, src_idx)
        dq_acc = dq_acc + dq_p.astype(jnp.float32)
        dk_c = dk_c + dk_p.astype(jnp.float32)
        dv_c = dv_c + dv_p.astype(jnp.float32)
        dk_c = jax.lax.ppermute(dk_c, axis_name, perm)
        dv_c = jax.lax.ppermute(dv_c, axis_name, perm)
        return (dq_acc, k_nxt, v_nxt, dk_c, dv_c), None

    dq0 = jnp.zeros(q_l.shape, jnp.float32)
    dk0 = jnp.zeros(k_l.shape, jnp.float32)
    dv0 = jnp.zeros(v_l.shape, jnp.float32)
    (dq, k_c, v_c, dk, dv), _ = jax.lax.scan(
        body, (dq0, k_l, v_l, dk0, dv0), jnp.arange(n_ring)
    )
    return dq.astype(q_l.dtype), dk.astype(k_l.dtype), dv.astype(v_l.dtype)


ring_flash_attention.defvjp(_ring_fa_fwd, _ring_fa_bwd)


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
    batch_axis: Optional[str] = None,
    head_axis: Optional[str] = None,
) -> jax.Array:
    """Ring attention on global arrays; output sharded like q.
    Differentiable (the shard-local body carries the ring VJP).

    ``batch_axis``/``head_axis``: optional extra mesh axes partitioning the
    batch / head dims (dp / tp), composing the ring with data and tensor
    parallelism on a 3D mesh.

    Causal mode: every shard's global offset is threaded into the partial
    kernel (positions=(q_pos0, kv_pos0)), so KV chunks entirely in a Q
    shard's future contribute lse=-inf and drop out of the merge — the
    simple (non-zigzag) causal ring."""

    def local_fn(q_l, k_l, v_l):
        return ring_flash_attention(
            q_l, k_l, v_l, axis_name, config, scale, causal, interpret
        )

    spec = P(batch_axis, head_axis, axis_name, None)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
