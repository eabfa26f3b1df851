"""Cross-chip split-KV attention: the V2 decomposition lifted over ICI.

The reference's phase-1/phase-2 boundary (workspace write + device sync +
combine, flash_attention_v2.h:466-501) becomes a cross-chip boundary: each
chip holds a KV shard (the "KV block"), computes its partial (O, lse) with
the Pallas split-KV forward kernel, and the combine rule runs as XLA
collectives over the sequence axis — max/sum reductions instead of a
reduction kernel re-reading an HBM workspace.

Q is replicated over the ``sp`` axis (every chip answers for all queries);
KV is sharded.  This is the non-overlapped, collective-based strategy —
the overlapped ring (parallel/ring.py) trades it for pipelined transfers.
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
)


def splitkv_attention_xhost(
    q: jax.Array,               # [B, H, Lq, d] (replicated over sp)
    k: jax.Array,               # [B, H, Lkv, d] (sharded over sp on dim 2)
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "sp",
    config: TileConfig = TileConfig(),
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Attention with KV sequence-sharded over ``axis_name``.

    Input/output shardings: q, out replicated on ``axis_name``; k, v
    sharded on their L dimension.  Other mesh axes (dp, tp) may shard
    batch/heads orthogonally — the kernel call is local to each chip.
    """

    def local_fn(q_l, k_l, v_l):
        o_p, lse = attention_partial_local(
            q_l, k_l, v_l, config=config, scale=scale, interpret=interpret
        )
        # collective combine over the sequence axis:
        #   m_g   = max_k lse_k
        #   w     = exp(lse - m_g)
        #   out   = sum_k w_k O_k / sum_k w_k
        m_g = jax.lax.pmax(lse, axis_name)
        m_safe = jnp.where(jnp.isneginf(m_g), 0.0, m_g)
        w = jnp.where(jnp.isneginf(lse), 0.0, jnp.exp(lse - m_safe))
        num = jax.lax.psum(o_p * w[..., None], axis_name)
        denom = jax.lax.psum(w, axis_name)
        out = num / jnp.where(denom == 0.0, 1.0, denom)[..., None]
        return out.astype(q_l.dtype)

    # build specs: preserve dp/tp sharding outside, sp shards only KV's L dim
    qspec = P(None, None, None, None)
    kvspec = P(None, None, axis_name, None)

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(qspec, kvspec, kvspec),
        out_specs=qspec,
        check_vma=False,
    )
    return fn(q, k, v)
