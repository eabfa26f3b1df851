"""Differentiable flash attention: custom VJP around the Pallas forward.

The reference has no backward pass (SURVEY: "no training loop ... no
backward pass"), so this is a framework extension: the forward is the
split-KV partial kernel (which already returns the LSE residual the
backward needs), and the backward recomputes attention probabilities from
(q, k, v, lse) in jnp — the standard flash-attention gradient

    P  = exp(q k^T * scale - lse)
    dV = P^T dO
    dP = dO V^T
    dS = P * (dP - rowsum(dO * O)) * scale
    dQ = dS K ;  dK = dS^T Q

computed block-free (XLA materializes the [Lq, Lkv] score block per head;
a tiled Pallas backward kernel is a planned optimization, not a capability
gap).  Supports causal masking at traced global positions — what
sequence-parallel training shards need.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from exploring_flash_attention_tpu.configs import TileConfig


def flash_attention(
    q: jax.Array,               # [B, H, Lq, d]
    k: jax.Array,
    v: jax.Array,
    config: TileConfig = TileConfig(),
    scale: Optional[float] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
    positions: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Differentiable fused attention (Pallas forward, recompute backward).

    ``positions=(q_pos0, kv_pos0)``: traced int32 global positions of row 0
    of the q / kv shards for causal masking; defaults to the decode
    convention (q rows are the last Lq positions)."""
    lq, lkv = q.shape[2], k.shape[2]
    if positions is None:
        q_pos0 = jnp.int32(lkv - lq)
        kv_pos0 = jnp.int32(0)
    else:
        q_pos0, kv_pos0 = (jnp.asarray(p, jnp.int32) for p in positions)
    return _flash_attention(
        q, k, v, q_pos0, kv_pos0, config, scale, causal, interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_attention(q, k, v, q_pos0, kv_pos0, config, scale, causal, interpret):
    out, _ = _fwd(q, k, v, q_pos0, kv_pos0, config, scale, causal, interpret)
    return out


def _fwd(q, k, v, q_pos0, kv_pos0, config, scale, causal, interpret):
    # local import: parallel.partials itself imports from ops (avoid cycle)
    from exploring_flash_attention_tpu.parallel.partials import (
        attention_partial_local,
    )

    o, lse = attention_partial_local(
        q, k, v, config=config, scale=scale, causal=causal,
        interpret=interpret,
        positions=(q_pos0, kv_pos0) if causal else None,
    )
    out = o.astype(q.dtype)
    return out, (q, k, v, q_pos0, kv_pos0, out, lse)


def _bwd(config, scale, causal, interpret, res, g):
    from exploring_flash_attention_tpu.ops.attention_bwd import (
        flash_attention_bwd,
    )

    q, k, v, q_pos0, kv_pos0, out, lse = res
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, g, lse,
        config=config, scale=scale, causal=causal, interpret=interpret,
        positions=(q_pos0, kv_pos0),
    )
    zero = np.zeros((), dtype=jax.dtypes.float0)       # int cotangents
    return dq, dk, dv, zero, zero


_flash_attention.defvjp(_fwd, _bwd)
