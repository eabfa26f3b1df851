"""Encoder-decoder family: cross-attention correctness + trainability.

The reference has no model stack; this exercises the cross-length
(Lq != Lkv) non-causal path of the kernels end-to-end through a real
encoder-decoder, the capability oracle/reference.py's cross-length
support exists for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.models.seq2seq import (
    Seq2SeqConfig,
    decode,
    encode,
    init_seq2seq_params,
    make_seq2seq_train_step,
    seq2seq_forward,
)
from exploring_flash_attention_tpu.models.transformer import ModelConfig

CFG = Seq2SeqConfig(
    base=ModelConfig(
        vocab_size=64, n_heads=4, n_kv_heads=4,
        d_model=64, d_head=16, d_ff=128,
        tile=TileConfig(block_q=32, block_kv=32),
    ),
    n_enc_layers=1,
    n_dec_layers=2,
)


def _toks(rng, b, l):
    return jnp.asarray(
        rng.integers(0, CFG.base.vocab_size, (b, l)), dtype=jnp.int32
    )


def test_shapes_cross_length():
    """L_src != L_tgt must work: the cross-attention kernel sees Lq=48,
    Lkv=96."""
    rng = np.random.default_rng(0)
    params = init_seq2seq_params(CFG, seed=0)
    src, tgt = _toks(rng, 2, 96), _toks(rng, 2, 48)
    logits = seq2seq_forward(params, src, tgt, CFG)
    assert logits.shape == (2, 48, CFG.base.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_decoder_is_causal_encoder_is_not():
    rng = np.random.default_rng(1)
    params = init_seq2seq_params(CFG, seed=0)
    src, tgt = _toks(rng, 2, 64), _toks(rng, 2, 64)

    # perturbing a late TARGET token must not change earlier logits
    logits = seq2seq_forward(params, src, tgt, CFG)
    tgt2 = tgt.at[:, 50].set((tgt[:, 50] + 1) % CFG.base.vocab_size)
    logits2 = seq2seq_forward(params, src, tgt2, CFG)
    np.testing.assert_allclose(
        np.asarray(logits[:, :50]), np.asarray(logits2[:, :50]), atol=1e-5
    )
    assert np.abs(np.asarray((logits - logits2)[:, 50:])).max() > 1e-4

    # perturbing ANY source token changes EVERY decoder position (cross
    # attention is bidirectional over the source)
    src2 = src.at[:, 60].set((src[:, 60] + 1) % CFG.base.vocab_size)
    logits3 = seq2seq_forward(params, src2, tgt, CFG)
    delta = np.abs(np.asarray(logits - logits3)).max(axis=(0, 2))
    assert (delta > 1e-6).all(), "some decoder position ignores the source"

    # and every ENCODER position sees that perturbation too (bidirectional)
    mem, mem2 = (np.asarray(encode(params, s, CFG)) for s in (src, src2))
    enc_delta = np.abs(mem - mem2).max(axis=(0, 2))
    assert (enc_delta > 1e-8).all()


def test_cross_attention_matches_oracle():
    """The decoder's cross block against a dense softmax composition."""
    from exploring_flash_attention_tpu.models.seq2seq import _cross_attn
    rng = np.random.default_rng(2)
    params = init_seq2seq_params(CFG, seed=0)
    c = CFG.base
    x = jnp.asarray(rng.normal(size=(2, 32, c.d_model)), dtype=c.dtype)
    mem = jnp.asarray(rng.normal(size=(2, 64, c.d_model)), dtype=c.dtype)
    p = params["dec_layers"][0]

    got = _cross_attn(p, x, mem, c, None)

    from exploring_flash_attention_tpu.models.transformer import _rmsnorm
    h = _rmsnorm(x, p["ln_x"], c.norm_eps)
    q = jnp.einsum("ble,ehd->bhld", h, p["cross"]["wq"])
    k = jnp.einsum("ble,ehd->bhld", mem, p["cross"]["wk"])
    v = jnp.einsum("ble,ehd->bhld", mem, p["cross"]["wv"])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(c.d_head)
    o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
    want = jnp.einsum("bhld,hde->ble", o.astype(x.dtype), p["cross"]["wo"])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-3
    )


def test_seq2seq_trains():
    """A copy task (target = source) must be learnable: loss drops
    monotonically-ish and gradients flow through BOTH attentions."""
    rng = np.random.default_rng(3)
    params = init_seq2seq_params(CFG, seed=0)
    step, opt = make_seq2seq_train_step(CFG)
    opt_state = opt.init(params)
    src = _toks(rng, 4, 32)
    tgt = jnp.concatenate([jnp.zeros((4, 1), jnp.int32), src], axis=1)
    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, src, tgt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, losses

    # cross-attention weights must actually receive gradient
    from exploring_flash_attention_tpu.models.seq2seq import seq2seq_loss
    grads = jax.grad(seq2seq_loss)(params, src, tgt, CFG)
    gx = np.abs(np.asarray(grads["dec_layers"][0]["cross"]["wq"])).max()
    assert gx > 0.0


@pytest.mark.parametrize("dp,tp,sp", [(2, 2, 2), (1, 4, 2), (1, 1, 4)])
def test_seq2seq_sharded_matches_single_device(dp, tp, sp):
    """Seq2seq on the mesh: ring for decoder self-attention, Ulysses
    all-to-all for the bidirectional encoder and cross-attention, tp
    Megatron everywhere — must equal the single-device step."""
    import optax
    from exploring_flash_attention_tpu.configs import MeshConfig
    from exploring_flash_attention_tpu.models.seq2seq import (
        make_seq2seq_train_step, shard_seq2seq_params,
    )
    from exploring_flash_attention_tpu.parallel import make_mesh

    cfg = Seq2SeqConfig(
        base=ModelConfig(
            vocab_size=256, n_layers=1, n_heads=4, n_kv_heads=4,
            d_model=64, d_head=16, d_ff=128,
            tile=TileConfig(block_q=32, block_kv=32),
        ),
        n_enc_layers=2, n_dec_layers=2,
    )
    rng = np.random.default_rng(9)
    src = jnp.asarray(rng.integers(0, 255, (4, 64)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 255, (4, 129)), jnp.int32)
    params = init_seq2seq_params(cfg, seed=0)
    sgd = optax.sgd(0.1)

    step1, opt1 = make_seq2seq_train_step(cfg, optimizer=sgd)
    p1, _, loss1 = step1(params, opt1.init(params), src, tgt)

    mesh = make_mesh(MeshConfig(dp=dp, tp=tp, sp=sp))
    stepN, optN = make_seq2seq_train_step(cfg, optimizer=sgd, mesh=mesh)
    pN = shard_seq2seq_params(params, mesh, cfg)
    pN2, _, lossN = stepN(pN, optN.init(pN), src, tgt)

    assert abs(float(loss1) - float(lossN)) < 1e-4, (loss1, lossN)
    for a, b in zip(jax.tree.leaves(p1),
                    jax.tree.leaves(jax.device_get(pN2))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )
