"""Ulysses-style (all-to-all) sequence-parallel attention.

The alternative to :mod:`parallel.ring` that SURVEY §2.6 notes the
reference lacks entirely ("No Ulysses/all-to-all analog exists"): instead
of rotating KV shards around the ring and merging partials, two
``all_to_all`` collectives re-shard the problem so each chip computes a
*complete* attention:

    [B, H, L/sp, d]  --a2a(split heads, concat seq)-->  [B, H/sp, L, d]
    local flash attention at full context (plain causal mask — no
    per-shard offsets, no partial merge numerics)
    [B, H/sp, L, d]  --a2a(split seq, concat heads)-->  [B, H, L/sp, d]

Trade-offs vs the ring (pallas_guide / scaling-book framing):

- communication: 2 all-to-alls of Q/K/V/O-sized tensors vs ``sp - 1``
  KV rotations — Ulysses moves less data for small ``sp`` and long
  sequences, the ring wins when ``sp`` is large or heads are few;
- head budget: requires ``H % sp == 0`` (and ``H_kv % sp == 0`` under
  GQA) — parallelism is capped by the head count, the ring's is not;
- numerics: bit-identical to single-chip attention (the softmax is never
  split), whereas the ring merges normalized partials.

Differentiable end-to-end: the local attention is the custom-VJP kernel
and ``all_to_all`` transposes itself in the backward pass.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.ops.attention_vjp import flash_attention


def ulysses_flash_attention(
    q_l: jax.Array,             # [B, H, L/sp, d]    (this shard)
    k_l: jax.Array,             # [B, H_kv, Lkv/sp, d]
    v_l: jax.Array,
    axis_name: str = "sp",
    config: TileConfig = TileConfig(),
    scale: Optional[float] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Shard-local Ulysses attention — call INSIDE ``shard_map`` on
    per-shard values (the :func:`ring_flash_attention` convention).
    Output is this shard's [B, H, Lq/sp, d].

    Cross-attention ready: q and k/v may carry different (sharded)
    sequence lengths — each side's all-to-all gathers its own length.
    Differentiable (all_to_all transposes itself in the VJP)."""
    sp = jax.lax.axis_size(axis_name)
    h = q_l.shape[1]
    h_kv = k_l.shape[1]
    if h % sp or h_kv % sp:
        raise ValueError(
            f"ulysses needs head counts divisible by the sp axis: "
            f"H={h}, H_kv={h_kv}, sp={sp}"
        )
    if sp == 1:
        return flash_attention(
            q_l, k_l, v_l, config=config, scale=scale, causal=causal,
            interpret=interpret,
        )
    # heads scatter / sequence gather: [B, H, L/sp, d] -> [B, H/sp, L, d]
    qh, kh, vh = (
        jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                           tiled=True)
        for x in (q_l, k_l, v_l)
    )
    o = flash_attention(
        qh, kh, vh, config=config, scale=scale, causal=causal,
        interpret=interpret,
    )
    # inverse: [B, H/sp, L, d] -> [B, H, L/sp, d]
    return jax.lax.all_to_all(o, axis_name, split_axis=2, concat_axis=1,
                              tiled=True)


def ulysses_attention(
    q: jax.Array,               # [B, H, L, d]    sharded over sp on dim 2
    k: jax.Array,               # [B, H_kv, L, d] sharded over sp on dim 2
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "sp",
    config: TileConfig = TileConfig(),
    scale: Optional[float] = None,
    causal: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """All-to-all sequence-parallel attention; output sharded like q."""
    sp = mesh.shape[axis_name]
    h = q.shape[1]
    h_kv = k.shape[1]
    if h % sp or h_kv % sp:
        raise ValueError(
            f"ulysses needs head counts divisible by the sp axis: "
            f"H={h}, H_kv={h_kv}, sp={sp}"
        )

    def local_fn(q_l, k_l, v_l):
        return ulysses_flash_attention(
            q_l, k_l, v_l, axis_name, config, scale, causal, interpret
        )

    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
