"""Tiled Pallas backward kernels vs autodiff through the jnp oracle.

The reference has no backward pass; the contract here is pure calculus:
grad of sum(softmax(QK^T*scale)V * G) w.r.t. (Q, K, V) — checked against
``jax.grad`` through ``naive_attention_jax`` in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import (
    make_qkv,
    naive_attention_jax,
)
from exploring_flash_attention_tpu.ops.attention_vjp import flash_attention


def _ref_grads(q, k, v, g, causal, positions=None):
    def loss(q, k, v):
        if positions is not None and causal:
            # oracle with global-position causal masking
            lq, lkv = q.shape[2], k.shape[2]
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k,
                precision=jax.lax.Precision.HIGHEST,
            ) / jnp.sqrt(jnp.float32(q.shape[-1]))
            row = jax.lax.broadcasted_iota(jnp.int32, (lq, lkv), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (lq, lkv), 1)
            mask = (col + positions[1]) <= (row + positions[0])
            s = jnp.where(mask, s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", p, v,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            out = naive_attention_jax(q, k, v, causal=causal)
        return jnp.sum(out * g)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("lq,lkv", [(128, 128), (64, 192)])
def test_bwd_matches_autodiff(causal, lq, lkv):
    q, k, v = make_qkv(2, 3, max(lq, lkv), 32, dtype=np.float32, seed=0)
    q = jnp.asarray(q[:, :, :lq])
    k = jnp.asarray(k[:, :, :lkv])
    v = jnp.asarray(v[:, :, :lkv])
    g = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 3, lq, 32)),
        dtype=jnp.float32,
    )
    cfg = TileConfig(block_q=64, block_kv=64)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, config=cfg, causal=causal) * g)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = _ref_grads(q, k, v, g, causal)
    for got, ref, name in [(dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-2,
            err_msg=name,
        )


def test_bwd_ragged_lengths():
    # L not divisible by blocks: pad rows/cols must not pollute grads
    lq, lkv = 72, 104
    q, k, v = make_qkv(1, 2, 128, 32, dtype=np.float32, seed=2)
    q = jnp.asarray(q[:, :, :lq])
    k = jnp.asarray(k[:, :, :lkv])
    v = jnp.asarray(v[:, :, :lkv])
    g = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 2, lq, 32)),
        dtype=jnp.float32,
    )
    cfg = TileConfig(block_q=64, block_kv=64)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, config=cfg) * g)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = _ref_grads(q, k, v, g, causal=False)
    for got, ref, name in [(dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-2,
            err_msg=name,
        )


def test_bwd_positions_offset_causal():
    # sequence-parallel shard: q rows sit at global offset 64, kv at 0
    q, k, v = make_qkv(1, 2, 128, 32, dtype=np.float32, seed=4)
    q = jnp.asarray(q[:, :, 64:])          # local Lq=64, global rows 64..127
    k = jnp.asarray(k)
    v = jnp.asarray(v)
    g = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 2, 64, 32)),
        dtype=jnp.float32,
    )
    cfg = TileConfig(block_q=64, block_kv=64)
    positions = (jnp.int32(64), jnp.int32(0))

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, config=cfg, causal=True,
                            positions=positions) * g
        )

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = _ref_grads(q, k, v, g, causal=True, positions=(64, 0))
    for got, ref, name in [(dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-2,
            err_msg=name,
        )


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_tiled_fallback(causal, monkeypatch):
    # Force the fully-tiled dKV/dQ grids (the L > one-pass-budget tier,
    # incl. the causal dead-pair fetch clamps) at a test-sized L.
    from exploring_flash_attention_tpu.ops import attention_bwd as bwd_mod

    monkeypatch.setattr(bwd_mod, "fits_onepass", lambda *a, **k: False)
    # distinctive shape so no earlier trace of flash_attention_bwd with
    # identical (shapes, statics) can be reused from the jit cache
    lq = lkv = 160
    q, k, v = make_qkv(1, 2, 160, 32, dtype=np.float32, seed=6)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    g = jnp.asarray(
        np.random.default_rng(7).standard_normal((1, 2, lq, 32)),
        dtype=jnp.float32,
    )
    cfg = TileConfig(block_q=32, block_kv=32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, config=cfg, causal=causal) * g)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = _ref_grads(q, k, v, g, causal)
    for got, ref, name in [(dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-2,
            err_msg=name,
        )


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_gqa_matches_repeated_kv(causal):
    # GQA grads: dq per head; dk/dv summed over each q-head group — must
    # match autodiff through explicit KV repetition
    q, _, _ = make_qkv(1, 4, 128, 32, dtype=np.float32, seed=20)
    _, k, v = make_qkv(1, 2, 128, 32, dtype=np.float32, seed=21)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    g = jnp.asarray(
        np.random.default_rng(22).standard_normal((1, 4, 128, 32)),
        dtype=jnp.float32,
    )
    cfg = TileConfig(block_q=64, block_kv=64)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, config=cfg, causal=causal) * g)

    def loss_rep(q, k, v):
        kr = jnp.repeat(k, 2, axis=1)
        vr = jnp.repeat(v, 2, axis=1)
        return jnp.sum(
            flash_attention(q, kr, vr, config=cfg, causal=causal) * g)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss_rep, argnums=(0, 1, 2))(q, k, v)
    for got, ref, name in [(dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-4,
            err_msg=name,
        )


def _ref_window_grads(q, k, v, g, window):
    def loss(q, k, v):
        lq, lkv = q.shape[2], k.shape[2]
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k,
            precision=jax.lax.Precision.HIGHEST,
        ) / jnp.sqrt(jnp.float32(q.shape[-1]))
        row = jax.lax.broadcasted_iota(jnp.int32, (lq, lkv), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (lq, lkv), 1)
        r = row + (lkv - lq)
        mask = jnp.logical_and(col <= r, col >= r - window + 1)
        s = jnp.where(mask, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", p, v,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.sum(out * g)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("window,lq,lkv", [(64, 256, 256), (100, 256, 256),
                                           (64, 128, 256)])
def test_bwd_window_matches_autodiff(window, lq, lkv):
    # banded backward (fused path) vs autodiff through the banded oracle
    q, k, v = make_qkv(1, 2, lq, 64, dtype=np.float32, seed=21,
                       seq_len_kv=lkv)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    g = jnp.asarray(np.random.default_rng(3).standard_normal(q.shape),
                    jnp.float32)

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, window=window) * g)

    got = jax.grad(loss, argnums=(0, 1, 2))(qj, kj, vj)
    want = _ref_window_grads(qj, kj, vj, g, window)
    for a, b, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_bwd_window_tiled_fallback():
    # L beyond the fused/one-pass VMEM budgets exercises the tiled dKV/dQ
    # kernels' band pruning and fetch clamps
    q, k, v = make_qkv(1, 1, 4096, 64, dtype=np.float32, seed=22)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    g = jnp.asarray(np.random.default_rng(4).standard_normal(q.shape),
                    jnp.float32)
    cfg = TileConfig(block_q=512, block_kv=512)

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, window=512,
                            config=cfg) * g)

    got = jax.grad(loss, argnums=(0, 1, 2))(qj, kj, vj)
    want = _ref_window_grads(qj, kj, vj, g, 512)
    for a, b, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3,
                                   err_msg=f"d{name}")
