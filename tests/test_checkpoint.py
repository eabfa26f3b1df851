"""Checkpoint / resume: atomic save, latest-selection, exact round-trip,
and resume-continues-training on the flagship model."""

import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.models import (
    ModelConfig,
    init_params,
    make_train_step,
)
from exploring_flash_attention_tpu.models.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)

CFG = ModelConfig(
    vocab_size=128, n_layers=1, n_heads=2, n_kv_heads=2,
    d_model=32, d_head=16, d_ff=64,
    tile=TileConfig(block_q=32, block_kv=32),
)


def test_roundtrip_exact(tmp_path):
    params = init_params(CFG, seed=0)
    # include a bf16 leaf to exercise the view-cast path
    tree = {"p": params, "x": jnp.arange(8, dtype=jnp.bfloat16)}
    path = save_checkpoint(str(tmp_path), 7, tree)
    restored, step = restore_checkpoint(path, tree)
    assert step == 7
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(restored)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_selection(tmp_path):
    params = {"w": jnp.ones((4,))}
    save_checkpoint(str(tmp_path), 3, params)
    p10 = save_checkpoint(str(tmp_path), 10, params)
    save_checkpoint(str(tmp_path), 9, params)
    assert latest_checkpoint(str(tmp_path)) == p10
    assert latest_checkpoint(str(tmp_path / "missing")) is None


def test_structure_mismatch_rejected(tmp_path):
    path = save_checkpoint(str(tmp_path), 0, {"a": jnp.ones((2,))})
    with pytest.raises(ValueError, match="leaves"):
        restore_checkpoint(path, {"a": jnp.ones((2,)), "b": jnp.ones((2,))})
    with pytest.raises(ValueError, match="shape"):
        restore_checkpoint(path, {"a": jnp.ones((3,))})


def test_resume_training(tmp_path):
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 33)), jnp.int32)
    step_fn, opt = make_train_step(CFG)

    params = init_params(CFG, seed=1)
    opt_state = opt.init(params)
    for i in range(3):
        params, opt_state, _ = step_fn(params, opt_state, toks)
    save_checkpoint(str(tmp_path), 3, {"params": params, "opt": opt_state})
    # continue original
    p_a, o_a, loss_a = step_fn(params, opt_state, toks)

    # resume from disk and take the same step
    restored, step = restore_checkpoint(
        latest_checkpoint(str(tmp_path)),
        {"params": params, "opt": opt_state},
    )
    assert step == 3
    p_b, o_b, loss_b = step_fn(restored["params"], restored["opt"], toks)
    assert float(loss_a) == pytest.approx(float(loss_b), abs=1e-6)
