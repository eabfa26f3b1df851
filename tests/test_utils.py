"""Autotuner + profiling harness (CPU interpret mode, tiny shapes)."""

import numpy as np
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.utils.autotune import (
    _CACHE,
    autotune_v1,
    default_candidates_v1,
)
from exploring_flash_attention_tpu.utils.profiling import roofline_tflops


def test_autotune_returns_valid_config_and_caches(tmp_path, monkeypatch):
    import exploring_flash_attention_tpu.utils.autotune as at

    monkeypatch.setattr(at, "_CACHE_PATH", str(tmp_path / "cache.json"))
    _CACHE.clear()
    q, k, v = make_qkv(1, 1, 64, 32, dtype=np.float32, seed=0)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    cands = [TileConfig(block_q=32, block_kv=32),
             TileConfig(block_q=64, block_kv=64)]
    cfg = autotune_v1(q, k, v, candidates=cands, iters=1)
    assert cfg in cands
    # second call must hit the in-process cache (no timing)
    assert autotune_v1(q, k, v, candidates=[], iters=1) == cfg
    # disk cache round-trips
    _CACHE.clear()
    assert autotune_v1(q, k, v, candidates=[cands[0]], iters=1) == cfg


def test_default_candidates_cover_onepass():
    cands = default_candidates_v1(1024, 1024, 128)
    assert any(c.block_kv >= 1024 for c in cands)
    assert all(c.block_q <= 1024 for c in cands)


def test_roofline_model():
    # compute-bound regime: high intensity clips at peak
    assert roofline_tflops(10**15, 10**6) == 197.0
    # bandwidth-bound: intensity 1 flop/byte * 819 GB/s = 0.819 TFLOP/s
    assert abs(roofline_tflops(10**9, 10**9) - 0.819) < 1e-6


def test_autotune_dtiled_and_splitkv(tmp_path, monkeypatch):
    import exploring_flash_attention_tpu.utils.autotune as at
    from exploring_flash_attention_tpu.configs import SplitKVConfig, TileConfig
    from exploring_flash_attention_tpu.utils import (
        autotune_dtiled, autotune_splitkv,
    )

    monkeypatch.setattr(at, "_CACHE_PATH", str(tmp_path / "tune.json"))
    at._CACHE.clear()
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 1, 256, 256)), jnp.float32)
        for _ in range(3)
    )
    cands = [TileConfig(block_q=128, block_kv=128,
                        d_tile_qk=128, d_tile_v=128)]
    cfg = autotune_dtiled(q, k, v, candidates=cands, iters=1)
    assert cfg in cands
    # disk-cache round trip
    at._CACHE.clear()
    assert autotune_dtiled(q, k, v, candidates=[], iters=1) == cfg

    q2, k2, v2 = (
        jnp.asarray(rng.standard_normal((1, 1, 512, 128)), jnp.float32)
        for _ in range(3)
    )
    scfg = autotune_splitkv(q2, k2, v2, iters=1)
    assert isinstance(scfg, SplitKVConfig)
    at._CACHE.clear()
    assert autotune_splitkv(q2, k2, v2, iters=1) == scfg


def test_autotune_dtiled_quantized_kv(tmp_path, monkeypatch):
    # quantized KV: candidates must pin block_kv to the quant block, and
    # the cache key must not collide with the bf16 entry for same shapes
    import exploring_flash_attention_tpu.utils.autotune as at
    from exploring_flash_attention_tpu.ops.quant import quantize_int8
    from exploring_flash_attention_tpu.utils import autotune_dtiled

    monkeypatch.setattr(at, "_CACHE_PATH", str(tmp_path / "tune.json"))
    at._CACHE.clear()
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 1, 256, 256)), jnp.float32)
        for _ in range(3)
    )
    bf16_cfg = autotune_dtiled(
        q, k, v,
        candidates=[at.TileConfig(block_q=128, block_kv=128,
                                  d_tile_qk=128, d_tile_v=128)],
        iters=1,
    )
    kq, vq = quantize_int8(k, block=256), quantize_int8(v, block=256)
    qcfg = autotune_dtiled(q, kq, vq, iters=1)
    assert qcfg.block_kv == 256            # pinned to the quant block
    assert qcfg != bf16_cfg or qcfg.block_kv == 256
    # separate cache entries survived
    at._CACHE.clear()
    assert autotune_dtiled(q, kq, vq, iters=1) == qcfg
    assert autotune_dtiled(q, k, v, candidates=[], iters=1) == bf16_cfg


def test_time_fn_chained_calibration_positive():
    # Round-4: the calibrator must never difference to negative time,
    # even for dispatch-dominated tiny ops (the failure the suite's
    # extend entry hit: per-iter overestimated 50x by per-call overhead,
    # long ~= short, difference below noise).  On CPU the overhead/work
    # ratio is extreme for a tiny add — the refinement pass must stretch
    # the chain until the differenced time is meaningful.
    import jax.numpy as jnp

    from exploring_flash_attention_tpu.utils.benchmark import (
        time_fn_chained_windows,
    )

    x = jnp.ones((8, 128), jnp.float32)
    secs = time_fn_chained_windows(lambda a: a * 1.0000001 + 1e-9,
                                   x, windows=3, target_long_sec=0.05)
    assert all(s > 0 for s in secs), secs
    assert all(s < 0.1 for s in secs), secs
