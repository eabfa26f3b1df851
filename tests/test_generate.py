"""End-to-end generation: prefill + paged INT8 decode vs the full forward.

The decode path (single-token projections + quantized paged cache +
flash-decoding kernel) must reproduce the training forward's next-token
logits up to INT8 cache quantization error."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.models import (
    ModelConfig,
    forward,
    init_params,
)
from exploring_flash_attention_tpu.models.generate import (
    GenerationEngine,
    forward_collect_kv,
)

CFG = ModelConfig(
    vocab_size=128, n_layers=2, n_heads=4, n_kv_heads=2,   # GQA group 2
    d_model=64, d_head=32, d_ff=128,
    tile=TileConfig(block_q=64, block_kv=64),
)


def test_forward_collect_kv_matches_forward():
    params = init_params(CFG, seed=0)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, CFG.vocab_size, (2, 32)),
        jnp.int32,
    )
    ref = forward(params, toks, CFG)
    got, kvs = forward_collect_kv(params, toks, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    assert len(kvs) == CFG.n_layers
    assert kvs[0][0].shape == (2, 32, CFG.n_kv_heads, CFG.d_head)


def test_decode_matches_full_forward_logits():
    """Greedy-generate 4 tokens; at each step the decode-path logits must
    match a from-scratch full forward over the extended sequence (up to
    INT8 KV-cache quantization error)."""
    params = init_params(CFG, seed=1)
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 17)), jnp.int32)

    eng = GenerationEngine(params, CFG, max_seqs=2, max_len=64, page_size=128)
    out = eng.generate(prompt, max_new_tokens=4, temperature=0.0)
    assert out.shape == (2, 4)

    # replay: greedy continuation computed with the full (non-cached)
    # forward at every step
    seq = np.asarray(prompt)
    for t in range(4):
        logits = forward(params, jnp.asarray(seq), CFG)
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))
        # int8 cache error can flip near-ties; require agreement OR a
        # near-tie between the two candidates
        for b in range(2):
            if nxt[b] != out[b, t]:
                lg = np.asarray(logits[b, -1])
                assert abs(lg[nxt[b]] - lg[out[b, t]]) < 0.15, (
                    t, b, nxt[b], out[b, t], lg[nxt[b]], lg[out[b, t]]
                )
        seq = np.concatenate([seq, out[:, t:t + 1]], axis=1)


def test_generate_temperature_reproducible():
    params = init_params(CFG, seed=2)
    prompt = jnp.asarray(
        np.random.default_rng(2).integers(0, CFG.vocab_size, (1, 8)),
        jnp.int32,
    )
    a = GenerationEngine(params, CFG, max_seqs=1, max_len=32).generate(
        prompt, 3, temperature=0.8, seed=7)
    b = GenerationEngine(params, CFG, max_seqs=1, max_len=32).generate(
        prompt, 3, temperature=0.8, seed=7)
    np.testing.assert_array_equal(a, b)


def test_generate_engine_reusable():
    params = init_params(CFG, seed=3)
    prompt = jnp.asarray(
        np.random.default_rng(3).integers(0, CFG.vocab_size, (1, 8)),
        jnp.int32,
    )
    eng = GenerationEngine(params, CFG, max_seqs=1, max_len=32)
    a = eng.generate(prompt, 2)
    b = eng.generate(prompt, 2)
    np.testing.assert_array_equal(a, b)


def test_generate_batch_capacity_check():
    params = init_params(CFG, seed=0)
    eng = GenerationEngine(params, CFG, max_seqs=1, max_len=32)
    with pytest.raises(ValueError, match="max_seqs"):
        eng.generate(jnp.zeros((2, 4), jnp.int32), 2)


def test_multi_turn_continuation_cache_consistency():
    # generate(hold=True) -> continue_generation: the new turn extends the
    # paged cache via the extend kernel.  The decisive bookkeeping check:
    # after continuation, every layer's cache must hold exactly the K/V a
    # full forward produces over the CONCATENATED token stream (same RoPE
    # positions, same page offsets), within int8 roundtrip error.
    import numpy as np
    import jax.numpy as jnp
    from exploring_flash_attention_tpu.configs import TileConfig
    from exploring_flash_attention_tpu.models import (
        GenerationEngine, ModelConfig, init_params,
    )
    from exploring_flash_attention_tpu.models.generate import (
        forward_collect_kv,
    )
    from exploring_flash_attention_tpu.serving.kv_cache import gather_kv

    cfg = ModelConfig(vocab_size=64, n_layers=2, n_heads=4, n_kv_heads=2,
                      d_model=128, d_head=64, d_ff=256, dtype=jnp.float32,
                      tile=TileConfig(block_q=64, block_kv=64))
    params = init_params(cfg, seed=0)
    eng = GenerationEngine(params, cfg, max_seqs=2, max_len=256,
                           page_size=128)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 64, (2, 12)), jnp.int32)

    n1 = 3
    g = eng.generate(prompt, n1, hold=True)
    assert g.shape == (2, n1) and (g >= 0).all() and (g < 64).all()

    # the last sampled token was never fed back into the cache — the new
    # turn must start with it (chat semantics: generated text ++ user turn)
    turn_new = jnp.asarray(rng.integers(0, 64, (2, 4)), jnp.int32)
    turn = jnp.concatenate([jnp.asarray(g[:, -1:]), turn_new], axis=1)
    n2 = 2
    g2 = eng.continue_generation(turn, n2)
    assert g2.shape == (2, n2) and (g2 >= 0).all() and (g2 < 64).all()

    # cache now holds: prompt ++ g ++ turn_new ++ g2[:, :-1]
    full = jnp.concatenate(
        [prompt, jnp.asarray(g), turn_new, jnp.asarray(g2[:, :-1])], axis=1)
    _, kvs = forward_collect_kv(params, full, cfg)
    L = full.shape[1]
    for li, (k_ref, _) in enumerate(kvs):          # [B, L, Hkv, d]
        for s in range(2):
            assert int(eng.caches[li].seq_lens[s]) == L, (li, s)
            k_got, _ = gather_kv(eng.caches[li], s)   # [Hkv, L, d]
            err = np.abs(np.asarray(k_got)
                         - np.asarray(k_ref[s]).transpose(1, 0, 2)).max()
            assert err < 0.06, (li, s, err)           # int8 roundtrip tier
    eng.release()
