"""Speculative decoding: exactness vs target-only decoding + rollback.

The defining property of speculative decoding is that it changes LATENCY,
never OUTPUT: greedy spec decoding must emit exactly the tokens the target
model would emit decoding alone (and stochastic spec sampling preserves
the target distribution — spot-checked via the acceptance-rate identity
when draft == target, where min(1, p_t/p_d) = 1 accepts everything)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.models.generate import GenerationEngine
from exploring_flash_attention_tpu.models.speculative import SpeculativeEngine
from exploring_flash_attention_tpu.models.transformer import (
    ModelConfig,
    init_params,
)

TCFG = ModelConfig(
    vocab_size=128, n_layers=2, n_heads=4, n_kv_heads=4,
    d_model=64, d_head=16, d_ff=128,
    tile=TileConfig(block_q=32, block_kv=32),
)
DCFG = ModelConfig(
    vocab_size=128, n_layers=1, n_heads=4, n_kv_heads=4,
    d_model=64, d_head=16, d_ff=128,
    tile=TileConfig(block_q=32, block_kv=32),
)


def _prompt(rng, b, l):
    return jnp.asarray(rng.integers(0, 128, (b, l)), jnp.int32)


@pytest.mark.parametrize("gamma", [2, 4])
def test_greedy_spec_matches_target_only(gamma):
    """Shallow draft, deeper target: spec output == vanilla greedy output
    of the target alone, token for token."""
    rng = np.random.default_rng(0)
    tparams = init_params(TCFG, seed=0)
    dparams = init_params(DCFG, seed=7)
    prompt = _prompt(rng, 2, 32)

    vanilla = GenerationEngine(tparams, TCFG, max_seqs=2, max_len=256)
    want = vanilla.generate(prompt, max_new_tokens=24, temperature=0.0)

    spec = SpeculativeEngine(tparams, TCFG, dparams, DCFG,
                             max_seqs=2, max_len=256)
    got, stats = spec.generate(prompt, max_new_tokens=24, gamma=gamma)

    np.testing.assert_array_equal(got, want)
    assert 0.0 <= stats["acceptance_rate"] <= 1.0
    assert stats["rounds"] >= 1


def test_self_draft_accepts_everything_greedy():
    """draft == target: every proposal matches the verifier's argmax, so
    acceptance is 1 and each round emits gamma+1 tokens."""
    rng = np.random.default_rng(1)
    params = init_params(TCFG, seed=0)
    prompt = _prompt(rng, 2, 32)

    spec = SpeculativeEngine(params, TCFG, params, TCFG,
                             max_seqs=2, max_len=256)
    got, stats = spec.generate(prompt, max_new_tokens=20, gamma=4)

    vanilla = GenerationEngine(params, TCFG, max_seqs=2, max_len=256)
    want = vanilla.generate(prompt, max_new_tokens=20, temperature=0.0)
    np.testing.assert_array_equal(got, want)
    assert stats["acceptance_rate"] >= 0.99, stats
    # full acceptance => ceil(19 / (gamma+1)) rounds after the prefill token
    assert stats["rounds"] <= int(np.ceil(19 / 5)) + 1, stats


def test_stochastic_self_draft_acceptance_identity():
    """With draft == target at temperature > 0, min(1, p_t/p_d) == 1, so
    rejection sampling must accept (numerics aside) every proposal."""
    rng = np.random.default_rng(2)
    params = init_params(TCFG, seed=0)
    prompt = _prompt(rng, 2, 32)
    spec = SpeculativeEngine(params, TCFG, params, TCFG,
                             max_seqs=2, max_len=256)
    got, stats = spec.generate(prompt, max_new_tokens=16, gamma=3,
                               temperature=0.8, seed=3)
    assert got.shape == (2, 16)
    assert ((0 <= got) & (got < TCFG.vocab_size)).all()
    assert stats["acceptance_rate"] >= 0.98, stats


def test_stochastic_distinct_draft_runs():
    """Distinct draft at temperature > 0: valid tokens, sane stats, and
    partial acceptance actually exercises the rollback path."""
    rng = np.random.default_rng(3)
    tparams = init_params(TCFG, seed=0)
    dparams = init_params(DCFG, seed=9)
    prompt = _prompt(rng, 2, 32)
    spec = SpeculativeEngine(tparams, TCFG, dparams, DCFG,
                             max_seqs=2, max_len=256)
    got, stats = spec.generate(prompt, max_new_tokens=16, gamma=4,
                               temperature=1.0, seed=5)
    assert got.shape == (2, 16)
    assert ((0 <= got) & (got < TCFG.vocab_size)).all()
    assert 0.0 <= stats["acceptance_rate"] <= 1.0
    # an untrained independent draft should NOT be accepted wholesale
    assert stats["acceptance_rate"] < 0.9, stats


def test_engine_reusable_and_validates():
    rng = np.random.default_rng(4)
    tparams = init_params(TCFG, seed=0)
    dparams = init_params(DCFG, seed=7)
    spec = SpeculativeEngine(tparams, TCFG, dparams, DCFG,
                             max_seqs=2, max_len=128)
    with pytest.raises(ValueError):
        spec.generate(_prompt(rng, 2, 64), max_new_tokens=64, gamma=4)
    # failed validation must not leak pages — a valid call still works
    out, _ = spec.generate(_prompt(rng, 2, 32), max_new_tokens=8, gamma=2)
    assert out.shape == (2, 8)
    out2, _ = spec.generate(_prompt(rng, 1, 32), max_new_tokens=8, gamma=2)
    assert out2.shape == (1, 8)


@pytest.mark.parametrize("gamma", [2, 4])
def test_dense_draft_greedy_matches_target_only(gamma):
    """draft_mode='dense' (rolling-window dense draft, no paged kernels):
    greedy spec output still equals target-only greedy exactly — the
    verify mechanism guarantees it for ANY proposal distribution, so the
    window-limited draft changes only the acceptance rate."""
    rng = np.random.default_rng(4)
    tparams = init_params(TCFG, seed=0)
    dparams = init_params(DCFG, seed=7)
    prompt = _prompt(rng, 2, 32)

    vanilla = GenerationEngine(tparams, TCFG, max_seqs=2, max_len=256)
    want = vanilla.generate(prompt, max_new_tokens=24, temperature=0.0)

    spec = SpeculativeEngine(tparams, TCFG, dparams, DCFG,
                             max_seqs=2, max_len=256,
                             draft_mode="dense", draft_window=64)
    got, stats = spec.generate(prompt, max_new_tokens=24, gamma=gamma)
    np.testing.assert_array_equal(got, want)
    assert 0.0 <= stats["acceptance_rate"] <= 1.0


def test_dense_draft_self_acceptance_with_covering_window():
    """dense self-draft whose window covers the whole context proposes
    exactly the target's argmaxes => acceptance ~1 (small numeric
    ties excepted) and output == vanilla."""
    rng = np.random.default_rng(5)
    params = init_params(TCFG, seed=0)
    prompt = _prompt(rng, 2, 24)

    spec = SpeculativeEngine(params, TCFG, params, TCFG,
                             max_seqs=2, max_len=256,
                             draft_mode="dense", draft_window=128)
    got, stats = spec.generate(prompt, max_new_tokens=16, gamma=4)
    vanilla = GenerationEngine(params, TCFG, max_seqs=2, max_len=256)
    want = vanilla.generate(prompt, max_new_tokens=16, temperature=0.0)
    np.testing.assert_array_equal(got, want)
    assert stats["acceptance_rate"] >= 0.9, stats
