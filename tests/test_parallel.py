"""Multi-chip attention on the 8-device virtual CPU mesh (the TPU analog of
the reference's simulated grid-of-blocks testing, SURVEY §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.configs import MeshConfig, TileConfig
from exploring_flash_attention_tpu.oracle.reference import (
    error_stats,
    make_qkv,
    naive_attention,
)
from exploring_flash_attention_tpu.parallel import (
    make_mesh,
    merge_partials,
    ring_attention,
    splitkv_attention_xhost,
)

CFG = TileConfig(block_q=64, block_kv=64)


def test_merge_partials_identity():
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.standard_normal((2, 3, 16, 8)), dtype=jnp.float32)
    lse = jnp.asarray(rng.standard_normal((2, 3, 16)), dtype=jnp.float32)
    zero_o = jnp.zeros_like(o)
    ninf = jnp.full_like(lse, -jnp.inf)
    o2, lse2 = merge_partials(zero_o, ninf, o, lse)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse2), np.asarray(lse), atol=1e-6)


def test_merge_partials_associative():
    from exploring_flash_attention_tpu.parallel import attention_partial_local

    q, k, v = make_qkv(1, 2, 64, 32, dtype=np.float32, seq_len_kv=192, seed=1)
    qj = jnp.asarray(q)
    parts = [
        attention_partial_local(
            qj, jnp.asarray(k[:, :, i * 64:(i + 1) * 64]),
            jnp.asarray(v[:, :, i * 64:(i + 1) * 64]), config=CFG,
        )
        for i in range(3)
    ]
    # left fold vs right fold
    oL, lseL = parts[0]
    for o_p, lse_p in parts[1:]:
        oL, lseL = merge_partials(oL, lseL, o_p, lse_p)
    oR, lseR = parts[2]
    for o_p, lse_p in reversed(parts[:2]):
        oR, lseR = merge_partials(o_p, lse_p, oR, lseR)
    np.testing.assert_allclose(np.asarray(oL), np.asarray(oR), atol=1e-5)
    ref = naive_attention(q, k, v)
    assert error_stats(np.asarray(oL), ref)["max_abs"] < 1e-5


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_splitkv_xhost(sp):
    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=sp))
    q, k, v = make_qkv(1, 2, 128, 64, dtype=np.float32, seq_len_kv=512, seed=2)
    out = splitkv_attention_xhost(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh, config=CFG
    )
    assert error_stats(np.asarray(out), naive_attention(q, k, v))["max_abs"] < 1e-5


@pytest.mark.parametrize("sp", [2, 4])
def test_ring_attention(sp):
    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=sp))
    q, k, v = make_qkv(1, 2, 256, 64, dtype=np.float32, seed=3)
    out = ring_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh, config=CFG
    )
    assert error_stats(np.asarray(out), naive_attention(q, k, v))["max_abs"] < 1e-5


@pytest.mark.parametrize("causal", [False, True])
def test_ring_with_dp_tp_axes(causal):
    # full 3D mesh: dp shards batch, tp shards heads, sp rings the sequence
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(MeshConfig(dp=2, tp=2, sp=2))
    q, k, v = make_qkv(2, 4, 128, 32, dtype=np.float32, seed=4)
    spec = P("dp", "tp", "sp", None)
    qs, ks, vs = (
        jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
        for x in (q, k, v)
    )

    out = ring_attention(
        qs, ks, vs, mesh, config=CFG, causal=causal,
        batch_axis="dp", head_axis="tp",
    )
    # the output must be genuinely partitioned over all three axes, not
    # replicated: each device holds exactly 1/8 of the array
    assert out.sharding.spec == spec
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(1, 2, 64, 32)}
    # every input must have stayed partitioned too (no silent replication)
    for x in (qs, ks, vs):
        assert x.sharding.spec == spec
    ref = naive_attention(q, k, v, causal=causal)
    assert error_stats(np.asarray(out), ref)["max_abs"] < 1e-5


@pytest.mark.parametrize("sp", [2, 4])
@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_grads(sp, causal):
    """Ring VJP vs the single-device kernel gradient (VERDICT item 2)."""
    from exploring_flash_attention_tpu.ops import flash_attention

    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=sp))
    q, k, v = make_qkv(1, 2, 256, 64, dtype=np.float32, seed=11)
    qj, kj, vj = map(jnp.asarray, (q, k, v))

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(q, k, v, mesh, config=CFG, causal=causal) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, config=CFG, causal=causal) ** 2
        )

    got = jax.grad(loss_ring, argnums=(0, 1, 2))(qj, kj, vj)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qj, kj, vj)
    for g, r, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_ring_attention_gqa_grads():
    """GQA ring: fewer KV heads than Q heads, gradients still match."""
    from exploring_flash_attention_tpu.ops import flash_attention

    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=2))
    q, _, _ = make_qkv(1, 4, 128, 32, dtype=np.float32, seed=12)
    _, k, v = make_qkv(1, 2, 128, 32, dtype=np.float32, seed=13)
    qj, kj, vj = (jnp.asarray(x) for x in (q, k, v))

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(q, k, v, mesh, config=CFG, causal=True) ** 2
        )

    def loss_ref(q, k, v):
        kr = jnp.repeat(k, 2, axis=1)
        vr = jnp.repeat(v, 2, axis=1)
        return jnp.sum(
            flash_attention(q, kr, vr, config=CFG, causal=True) ** 2
        )

    got = jax.grad(loss_ring, argnums=(0, 1, 2))(qj, kj, vj)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qj, kj, vj)
    for g, r, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-5, rtol=1e-4, err_msg=name
        )


@pytest.mark.parametrize("sp", [2, 4])
def test_ring_attention_causal(sp):
    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=sp))
    q, k, v = make_qkv(1, 2, 256, 64, dtype=np.float32, seed=5)
    out = ring_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh,
        config=CFG, causal=True,
    )
    ref = naive_attention(q, k, v, causal=True)
    assert error_stats(np.asarray(out), ref)["max_abs"] < 1e-5


def test_partial_positions_equivalence():
    # explicit positions must reproduce the default decode-convention mask
    from exploring_flash_attention_tpu.parallel import attention_partial_local

    q, k, v = make_qkv(1, 1, 64, 32, dtype=np.float32, seq_len_kv=128, seed=6)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    o_a, lse_a = attention_partial_local(qj, kj, vj, config=CFG, causal=True)
    o_b, lse_b = attention_partial_local(
        qj, kj, vj, config=CFG, causal=True,
        positions=(jnp.int32(64), jnp.int32(0)),
    )
    np.testing.assert_allclose(np.asarray(o_a), np.asarray(o_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_a), np.asarray(lse_b), atol=1e-6)


@pytest.mark.parametrize("sp", [2, 4])
@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_attention(sp, causal):
    from exploring_flash_attention_tpu.parallel import ulysses_attention

    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=sp))
    q, k, v = make_qkv(1, 4, 256, 64, dtype=np.float32, seed=7)
    out = ulysses_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh,
        config=CFG, causal=causal,
    )
    ref = naive_attention(q, k, v, causal=causal)
    assert error_stats(np.asarray(out), ref)["max_abs"] < 1e-5


def test_ulysses_gqa_and_grads():
    from exploring_flash_attention_tpu.parallel import ulysses_attention

    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=2))
    q, _, _ = make_qkv(1, 4, 128, 32, dtype=np.float32, seed=8)
    _, k, v = make_qkv(1, 2, 128, 32, dtype=np.float32, seed=9)
    qj, kj, vj = (jnp.asarray(x) for x in (q, k, v))

    def loss(q, k, v):
        return jnp.sum(
            ulysses_attention(q, k, v, mesh, config=CFG, causal=True) ** 2
        )

    def loss_ref(q, k, v):
        from exploring_flash_attention_tpu.ops import flash_attention

        kr = jnp.repeat(k, 2, axis=1)
        vr = jnp.repeat(v, 2, axis=1)
        return jnp.sum(
            flash_attention(q, kr, vr, config=CFG, causal=True) ** 2
        )

    got = jax.grad(loss, argnums=(0, 1, 2))(qj, kj, vj)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qj, kj, vj)
    for g, r, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-5, rtol=1e-4, err_msg=name
        )


def test_ulysses_rejects_indivisible_heads():
    from exploring_flash_attention_tpu.parallel import ulysses_attention

    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=4))
    q, k, v = make_qkv(1, 2, 64, 32, dtype=np.float32, seed=10)
    with pytest.raises(ValueError, match="divisible"):
        ulysses_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh)


def test_ring_128k_lowers():
    # BASELINE tier 5: ring attention at L=128K over sharded KV.  Real
    # execution needs a pod; lowering with abstract avals validates that
    # the whole sharded program (8 x 16K shards, streaming span kernels)
    # traces and lowers without materializing anything.
    from exploring_flash_attention_tpu.parallel import ring_attention

    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=8))
    shape = jax.ShapeDtypeStruct((1, 8, 131072, 128), jnp.bfloat16)
    cfg = TileConfig(block_q=1024, block_kv=1024)
    fn = jax.jit(
        lambda q, k, v: ring_attention(q, k, v, mesh, config=cfg, causal=True)
    )
    lowered = fn.lower(shape, shape, shape)
    assert lowered is not None


# ---- windowed x sequence-parallel (one-hop neighbor exchange) ----

def _sp_window_global(q, k, v, mesh, window, config=CFG):
    """Global-array harness for sp_window_attention (test-only)."""
    from jax.sharding import PartitionSpec as P
    from exploring_flash_attention_tpu.parallel import sp_window_attention

    spec = P(None, None, "sp", None)
    fn = jax.shard_map(
        lambda ql, kl, vl: sp_window_attention(
            ql, kl, vl, "sp", window, config),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


@pytest.mark.parametrize("sp,window", [(2, 96), (4, 128), (8, 32)])
def test_sp_window_attention(sp, window):
    # L_local = 1024/sp; window <= L_local throughout
    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=sp))
    q, k, v = make_qkv(1, 2, 1024, 64, dtype=np.float32, seed=20)
    out = _sp_window_global(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh, window)
    ref = naive_attention(q, k, v, causal=True, window=window)
    assert error_stats(np.asarray(out), ref)["max_abs"] < 1e-5


@pytest.mark.parametrize("sp,window", [(2, 96), (4, 128)])
def test_sp_window_attention_grads(sp, window):
    """sp-window VJP vs the single-device banded kernel gradient."""
    from exploring_flash_attention_tpu.ops import flash_attention

    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=sp))
    q, k, v = make_qkv(1, 2, 1024, 64, dtype=np.float32, seed=21)
    qj, kj, vj = map(jnp.asarray, (q, k, v))

    def loss_sp(q, k, v):
        return jnp.sum(
            _sp_window_global(q, k, v, mesh, window) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            flash_attention(
                q, k, v, config=CFG, causal=True, window=window) ** 2)

    got = jax.grad(loss_sp, argnums=(0, 1, 2))(qj, kj, vj)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qj, kj, vj)
    for g, r, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_sp_window_gqa_grads():
    """GQA sp-window: fewer KV heads, tail exchange on the KV head count."""
    from exploring_flash_attention_tpu.ops import flash_attention

    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=2))
    q, _, _ = make_qkv(1, 4, 512, 64, dtype=np.float32, seed=22)
    _, k, v = make_qkv(1, 2, 512, 64, dtype=np.float32, seed=23)
    qj, kj, vj = (jnp.asarray(x) for x in (q, k, v))
    window = 128

    def loss_sp(q, k, v):
        return jnp.sum(_sp_window_global(q, k, v, mesh, window) ** 2)

    def loss_ref(q, k, v):
        kr = jnp.repeat(k, 2, axis=1)
        vr = jnp.repeat(v, 2, axis=1)
        return jnp.sum(
            flash_attention(
                q, kr, vr, config=CFG, causal=True, window=window) ** 2)

    got = jax.grad(loss_sp, argnums=(0, 1, 2))(qj, kj, vj)
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qj, kj, vj)
    for g, r, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_sp_window_rejects_oversized_window():
    from exploring_flash_attention_tpu.parallel import sp_window_attention

    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=8))
    q, k, v = make_qkv(1, 2, 1024, 64, dtype=np.float32, seed=24)
    with pytest.raises(NotImplementedError, match="window <= L_local"):
        _sp_window_global(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh, 256)


def test_sp_window_128k_lowers():
    # the L=128K windowed training configuration (VERDICT r2 item 3):
    # 8 x 16K shards, window 4096 — lowering validates the whole sharded
    # banded program without a pod
    from jax.sharding import PartitionSpec as P
    from exploring_flash_attention_tpu.parallel import sp_window_attention

    mesh = make_mesh(MeshConfig(dp=1, tp=1, sp=8))
    shape = jax.ShapeDtypeStruct((1, 8, 131072, 128), jnp.bfloat16)
    cfg = TileConfig(block_q=1024, block_kv=1024)
    spec = P(None, None, "sp", None)
    fn = jax.jit(jax.shard_map(
        lambda q, k, v: sp_window_attention(q, k, v, "sp", 4096, cfg),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    ))
    lowered = fn.lower(shape, shape, shape)
    assert lowered is not None
