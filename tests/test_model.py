"""Flagship transformer: single-device forward/train and the sharded
(dp, tp, sp) training step on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.configs import MeshConfig, TileConfig
from exploring_flash_attention_tpu.models import (
    ModelConfig,
    forward,
    init_params,
    make_train_step,
)
from exploring_flash_attention_tpu.models.transformer import shard_params
from exploring_flash_attention_tpu.parallel import make_mesh

CFG = ModelConfig(
    vocab_size=256, n_layers=2, n_heads=4, n_kv_heads=4,
    d_model=64, d_head=16, d_ff=128,
    tile=TileConfig(block_q=32, block_kv=32),
)


def _tokens(rng, b, l):
    return jnp.asarray(
        rng.integers(0, CFG.vocab_size, (b, l)), dtype=jnp.int32
    )


def test_forward_shapes_and_causality():
    rng = np.random.default_rng(0)
    params = init_params(CFG, seed=0)
    toks = _tokens(rng, 2, 64)
    logits = forward(params, toks, CFG)
    assert logits.shape == (2, 64, CFG.vocab_size)
    # causality: changing a future token must not change earlier logits
    toks2 = toks.at[:, 50].set((toks[:, 50] + 1) % CFG.vocab_size)
    logits2 = forward(params, toks2, CFG)
    np.testing.assert_allclose(
        np.asarray(logits[:, :50]), np.asarray(logits2[:, :50]), atol=1e-5
    )
    assert np.abs(np.asarray(logits[:, 50:]) - np.asarray(logits2[:, 50:])).max() > 1e-4


def test_train_step_single_device_reduces_loss():
    rng = np.random.default_rng(1)
    params = init_params(CFG, seed=0)
    step, opt = make_train_step(CFG)
    opt_state = opt.init(params)
    toks = _tokens(rng, 4, 65)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.3, losses
    assert all(b < a for a, b in zip(losses, losses[1:])), losses


@pytest.mark.parametrize("dp,tp,sp", [(2, 2, 2), (1, 4, 2), (2, 1, 4)])
def test_train_step_sharded_matches_single_device(dp, tp, sp):
    rng = np.random.default_rng(2)
    mesh = make_mesh(MeshConfig(dp=dp, tp=tp, sp=sp))
    params = init_params(CFG, seed=0)
    toks = _tokens(rng, 4, 65)

    import optax

    # SGD so updates are linear in grads (adam's first step is ~sign(g),
    # which amplifies numeric noise into sign flips)
    sgd = optax.sgd(0.1)

    # single-device reference step
    step1, opt1 = make_train_step(CFG, optimizer=sgd)
    st1 = opt1.init(params)
    p1, _, loss1 = step1(params, st1, toks)

    # sharded step
    stepN, optN = make_train_step(CFG, mesh=mesh, optimizer=sgd)
    pN = shard_params(params, mesh, CFG)
    stN = optN.init(pN)
    pN2, _, lossN = stepN(pN, stN, toks)

    assert abs(float(loss1) - float(lossN)) < 1e-4, (loss1, lossN)
    # updated params must agree (gather the sharded ones)
    flat1 = jax.tree.leaves(p1)
    flatN = jax.tree.leaves(jax.device_get(pN2))
    for a, b in zip(flat1, flatN):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )


def test_gqa_forward():
    cfg = ModelConfig(
        vocab_size=256, n_layers=1, n_heads=4, n_kv_heads=2,
        d_model=64, d_head=16, d_ff=128,
        tile=TileConfig(block_q=32, block_kv=32),
    )
    rng = np.random.default_rng(3)
    params = init_params(cfg, seed=0)
    toks = jnp.asarray(rng.integers(0, 256, (1, 32)), dtype=jnp.int32)
    logits = forward(params, toks, cfg)
    assert logits.shape == (1, 32, 256)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_rope_relative_invariance():
    """RoPE scores depend only on relative positions: shifting both q and
    k positions by a constant leaves q·k unchanged (and norms are
    preserved)."""
    from exploring_flash_attention_tpu.models.transformer import rope

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((1, 2, 8, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 8, 16)), jnp.float32)
    pos = jnp.arange(8, dtype=jnp.int32)

    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rope(q, pos, 1e4)), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1),
        rtol=1e-5,
    )
    s0 = jnp.einsum(
        "bhqd,bhkd->bhqk", rope(q, pos, 1e4), rope(k, pos, 1e4))
    s1 = jnp.einsum(
        "bhqd,bhkd->bhqk", rope(q, pos + 100, 1e4), rope(k, pos + 100, 1e4))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-4)


def test_windowed_model_trains():
    # sliding-window local attention end to end: banded fwd + banded bwd
    import numpy as np
    import jax.numpy as jnp
    from exploring_flash_attention_tpu.configs import TileConfig
    from exploring_flash_attention_tpu.models import (
        ModelConfig, init_params, make_train_step,
    )

    cfg = ModelConfig(vocab_size=512, n_layers=2, n_heads=4, n_kv_heads=2,
                      d_model=256, d_head=64, d_ff=512, dtype=jnp.float32,
                      tile=TileConfig(block_q=128, block_kv=128), window=96)
    params = init_params(cfg, seed=0)
    step, opt = make_train_step(cfg)
    st = opt.init(params)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, 512, (2, 257)), jnp.int32)
    params, st, l0 = step(params, st, toks)
    for _ in range(3):
        params, st, loss = step(params, st, toks)
    assert float(loss) < float(l0)


def test_encoder_mlm_trains_and_is_bidirectional():
    # second model family: the same stack run bidirectionally with an
    # MLM objective.  Check (a) the loss decreases, (b) attention is
    # genuinely non-causal: a masked token's logits must depend on a
    # FUTURE token (causal attention could not see it).
    import numpy as np
    import jax
    import jax.numpy as jnp
    from exploring_flash_attention_tpu.configs import TileConfig
    from exploring_flash_attention_tpu.models import (
        ModelConfig, init_params, make_mlm_train_step,
    )
    from exploring_flash_attention_tpu.models.transformer import forward

    cfg = ModelConfig(vocab_size=128, n_layers=2, n_heads=4, n_kv_heads=2,
                      d_model=128, d_head=64, d_ff=256, dtype=jnp.float32,
                      tile=TileConfig(block_q=64, block_kv=64))
    params = init_params(cfg, seed=0)

    # (b) future-dependence of bidirectional logits
    toks = jnp.asarray(np.random.default_rng(1).integers(0, 128, (1, 64)),
                       jnp.int32)
    toks2 = toks.at[0, 50].set((int(toks[0, 50]) + 1) % 128)
    la = forward(params, toks, cfg, causal=False)
    lb = forward(params, toks2, cfg, causal=False)
    assert float(jnp.abs(la[0, 10] - lb[0, 10]).max()) > 1e-6
    # ...which the causal forward cannot have
    ca = forward(params, toks, cfg, causal=True)
    cb = forward(params, toks2, cfg, causal=True)
    assert float(jnp.abs(ca[0, 10] - cb[0, 10]).max()) == 0.0

    # (a) MLM training
    step, opt = make_mlm_train_step(cfg, mask_rate=0.2)
    st = opt.init(params)
    data = jnp.asarray(np.random.default_rng(2).integers(0, 127, (4, 128)),
                       jnp.int32)
    rng = jax.random.PRNGKey(0)
    params, st, l0 = step(params, st, data, rng)
    for i in range(4):
        rng, sub = jax.random.split(rng)
        params, st, loss = step(params, st, data, sub)
    assert float(loss) < float(l0), (float(l0), float(loss))


@pytest.mark.parametrize("dp,tp,sp", [(1, 2, 2), (2, 1, 2)])
def test_windowed_train_step_sharded_matches_single_device(dp, tp, sp):
    """Windowed attention x sequence parallelism (one-hop tail exchange)
    inside the full training step: sharded grads == single-device grads."""
    import optax

    cfg = ModelConfig(
        vocab_size=256, n_layers=2, n_heads=4, n_kv_heads=2,
        d_model=128, d_head=64, d_ff=256,
        tile=TileConfig(block_q=128, block_kv=128), window=96,
    )
    rng = np.random.default_rng(5)
    mesh = make_mesh(MeshConfig(dp=dp, tp=tp, sp=sp))
    params = init_params(cfg, seed=0)
    toks = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (2 * dp, 256 * sp + 1)),
        dtype=jnp.int32)

    sgd = optax.sgd(0.1)
    step1, opt1 = make_train_step(cfg, optimizer=sgd)
    st1 = opt1.init(params)
    p1, _, loss1 = step1(params, st1, toks)

    stepN, optN = make_train_step(cfg, mesh=mesh, optimizer=sgd)
    pN = shard_params(params, mesh, cfg)
    stN = optN.init(pN)
    pN2, _, lossN = stepN(pN, stN, toks)

    assert abs(float(loss1) - float(lossN)) < 1e-4, (loss1, lossN)
    flat1 = jax.tree.leaves(p1)
    flatN = jax.tree.leaves(jax.device_get(pN2))
    for a, b in zip(flat1, flatN):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )


@pytest.mark.parametrize("dp,tp,sp", [(2, 2, 2), (1, 4, 2), (1, 1, 4)])
def test_encoder_mlm_sharded_matches_single_device(dp, tp, sp):
    """Encoder (bidirectional) training on the mesh: Ulysses all-to-all
    attention over sp (all-gather fallback when heads can't split),
    Megatron tp, dp batch sharding — must equal the single-device step."""
    import optax
    from exploring_flash_attention_tpu.models.encoder import (
        make_mlm_train_step,
    )

    rng = np.random.default_rng(8)
    toks = _tokens(rng, 4, 128)
    key = jax.random.PRNGKey(7)
    params = init_params(CFG, seed=0)
    sgd = optax.sgd(0.1)

    step1, opt1 = make_mlm_train_step(CFG, optimizer=sgd)
    p1, _, loss1 = step1(params, opt1.init(params), toks, key)

    mesh = make_mesh(MeshConfig(dp=dp, tp=tp, sp=sp))
    stepN, optN = make_mlm_train_step(CFG, optimizer=sgd, mesh=mesh)
    pN = shard_params(params, mesh, CFG)
    pN2, _, lossN = stepN(pN, optN.init(pN), toks, key)

    assert abs(float(loss1) - float(lossN)) < 1e-4, (loss1, lossN)
    for a, b in zip(jax.tree.leaves(p1),
                    jax.tree.leaves(jax.device_get(pN2))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )
