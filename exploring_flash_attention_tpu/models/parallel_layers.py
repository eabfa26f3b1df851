"""Megatron-style manual-SPMD helpers for use inside ``shard_map``.

``f_tp`` / ``g_tp`` are the Megatron paper's f/g conjugate operators:

- ``f_tp`` (column-parallel input): identity forward, all-reduce backward —
  inserted where a replicated activation fans out into tensor-sharded
  branches, so the cotangent sums contributions from every tp shard.
- ``g_tp`` (row-parallel output): all-reduce forward, identity backward —
  the forward psum after a row-sharded matmul whose transpose must NOT
  re-reduce.

``gather_kv_sp`` all-gathers sequence-sharded K/V for sequence-parallel
attention with a reduce-scatter backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def f_tp(x, axis_name: str):
    return x


def _f_fwd(x, axis_name):
    return x, None


def _f_bwd(axis_name, _, g):
    return (jax.lax.psum(g, axis_name),)


f_tp.defvjp(_f_fwd, _f_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def g_tp(x, axis_name: str):
    return jax.lax.psum(x, axis_name)


def _g_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _g_bwd(axis_name, _, g):
    return (g,)


g_tp.defvjp(_g_fwd, _g_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def gather_seq(x, axis_name: str, dim: int):
    """All-gather a sequence-sharded tensor along ``dim`` (fwd);
    reduce-scatter the cotangent (bwd)."""
    return jax.lax.all_gather(x, axis_name, axis=dim, tiled=True)


def _gather_fwd(x, axis_name, dim):
    return jax.lax.all_gather(x, axis_name, axis=dim, tiled=True), None


def _gather_bwd(axis_name, dim, _, g):
    return (
        jax.lax.psum_scatter(g, axis_name, scatter_dimension=dim, tiled=True),
    )


gather_seq.defvjp(_gather_fwd, _gather_bwd)
