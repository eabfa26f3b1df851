"""Fused V1 Pallas kernel vs oracle (interpret mode on CPU — the TPU analog
of the reference's fake-GPU NumPy validation, SURVEY §4.3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import (
    check_accuracy,
    error_stats,
    make_qkv,
    naive_attention,
)
from exploring_flash_attention_tpu.ops import flash_attention_v1


def run_v1(q, k, v, **kw):
    return np.asarray(
        flash_attention_v1(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), **kw)
    )


def test_v1_f32_small():
    q, k, v = make_qkv(1, 2, 256, 128, dtype=np.float32, seed=0)
    out = run_v1(q, k, v, config=TileConfig(block_q=128, block_kv=128))
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 2e-5


@pytest.mark.parametrize("one_pass", [None, False])
@pytest.mark.parametrize("bq,bk", [(64, 128), (128, 64), (256, 128)])
def test_v1_block_shapes(bq, bk, one_pass):
    q, k, v = make_qkv(1, 1, 256, 64, dtype=np.float32, seed=1)
    out = run_v1(q, k, v, config=TileConfig(block_q=bq, block_kv=bk,
                                            one_pass=one_pass))
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 2e-5


def test_v1_bf16_reference_shape_d32():
    # reference CUDA-baseline shape (driver.cu:140-143) at reduced batch;
    # oracle computed on bf16-rounded inputs so input quantization is excluded
    q, k, v = make_qkv(2, 8, 1024, 32, dtype=np.float32, seed=2)
    qb, kb, vb = (x.astype(jnp.bfloat16).astype(np.float32) for x in (q, k, v))
    out = run_v1(
        qb.astype(jnp.bfloat16), kb.astype(jnp.bfloat16), vb.astype(jnp.bfloat16),
        config=TileConfig(block_q=256, block_kv=256),
    )
    check_accuracy(out.astype(np.float32), naive_attention(qb, kb, vb), name="v1 bf16 d32")


def test_v1_bf16_d128_tight():
    # the BASELINE gate: max|delta| <= 1e-3 vs reference at matched bit-width.
    # bf16 storage / f32 stats, compared against the f64 oracle computed on
    # bf16-rounded inputs (so input quantization is excluded).
    q, k, v = make_qkv(1, 4, 512, 128, dtype=np.float32, seed=3)
    qb = np.asarray(jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32))
    kb = np.asarray(jnp.asarray(k).astype(jnp.bfloat16).astype(jnp.float32))
    vb = np.asarray(jnp.asarray(v).astype(jnp.bfloat16).astype(jnp.float32))
    out = run_v1(
        jnp.asarray(qb).astype(jnp.bfloat16),
        jnp.asarray(kb).astype(jnp.bfloat16),
        jnp.asarray(vb).astype(jnp.bfloat16),
        out_dtype=jnp.float32,
    )
    assert error_stats(out, naive_attention(qb, kb, vb))["max_abs"] < 1.5e-2


@pytest.mark.parametrize("one_pass", [None, False])
def test_v1_ragged_kv_len(one_pass):
    # L_kv not divisible by block_kv -> in-kernel masking path
    q, k, v = make_qkv(1, 2, 128, 64, dtype=np.float32, seq_len_kv=200, seed=4)
    out = run_v1(q, k, v, config=TileConfig(block_q=128, block_kv=128,
                                            one_pass=one_pass))
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 2e-5


def test_v1_ragged_q_len():
    q, k, v = make_qkv(1, 1, 100, 64, dtype=np.float32, seq_len_kv=128, seed=5)
    out = run_v1(q, k, v, config=TileConfig(block_q=64, block_kv=128))
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 2e-5


def test_v1_causal():
    q, k, v = make_qkv(1, 2, 256, 64, dtype=np.float32, seed=6)
    out = run_v1(q, k, v, causal=True)
    assert error_stats(out, naive_attention(q, k, v, causal=True))["max_abs"] < 2e-5


def test_v1_causal_cross_length():
    # decode-style: 64 new queries attending to 256 total positions
    q, k, v = make_qkv(1, 2, 64, 64, dtype=np.float32, seq_len_kv=256, seed=7)
    out = run_v1(q, k, v, causal=True)
    assert error_stats(out, naive_attention(q, k, v, causal=True))["max_abs"] < 2e-5


def test_v1_matches_sim_exactly_in_structure():
    # STREAMING kernel vs the executable spec (fused sim), not the oracle
    from exploring_flash_attention_tpu.sim import flash_attention_tiled_fused

    q, k, v = make_qkv(1, 1, 256, 64, dtype=np.float32, seed=8)
    out = run_v1(q, k, v, config=TileConfig(block_q=64, block_kv=64,
                                            one_pass=False))
    sim = flash_attention_tiled_fused(q, k, v, 64, 64)
    np.testing.assert_allclose(out, sim, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("one_pass", [None, False])
def test_v1_scale_override(one_pass):
    q, k, v = make_qkv(1, 1, 128, 64, dtype=np.float32, seed=9)
    out = run_v1(q, k, v, scale=0.25, config=TileConfig(one_pass=one_pass))
    assert error_stats(out, naive_attention(q, k, v, scale=0.25))["max_abs"] < 2e-5


def test_v1_one_pass_forced_requires_eligibility():
    # windowed one-pass needs a lane-aligned L_kv (the sliding slice's
    # upper clamp rounds to whole lane groups); ragged KV must stream
    q, k, v = make_qkv(1, 1, 128, 64, dtype=np.float32, seq_len_kv=136,
                       seed=9)
    with pytest.raises(ValueError, match="one_pass"):
        run_v1(q, k, v, causal=True, window=16,
               config=TileConfig(one_pass=True))
    # neither does a KV beyond the VMEM budget
    q, k, v = make_qkv(1, 1, 128, 64, dtype=np.float32, seq_len_kv=8192,
                       seed=9)
    with pytest.raises(ValueError, match="one_pass"):
        run_v1(q, k, v, config=TileConfig(one_pass=True))


def test_v1_causal_onepass_forced():
    # causal IS one-pass eligible now: static per-strip KV truncation
    q, k, v = make_qkv(1, 2, 256, 64, dtype=np.float32, seed=10)
    out = run_v1(q, k, v, causal=True, config=TileConfig(one_pass=True))
    assert error_stats(out, naive_attention(q, k, v, causal=True))["max_abs"] < 2e-5


def test_v1_causal_onepass_matches_streaming():
    q, k, v = make_qkv(1, 2, 512, 64, dtype=np.float32, seed=11)
    a = run_v1(q, k, v, causal=True, config=TileConfig(one_pass=True))
    b = run_v1(q, k, v, causal=True, config=TileConfig(one_pass=False))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


def test_v1_causal_onepass_multiblock():
    # L=2048 splits into two q-block pallas_calls with growing KV spans
    q, k, v = make_qkv(1, 1, 2048, 64, dtype=np.float32, seed=12)
    out = run_v1(q, k, v, causal=True, config=TileConfig(one_pass=True))
    assert error_stats(out, naive_attention(q, k, v, causal=True))["max_abs"] < 2e-5


@pytest.mark.parametrize("window", [1, 96, 128])
def test_v1_window_onepass(window):
    # sliding-window one-pass: Element-indexed KV band slides per q block
    q, k, v = make_qkv(1, 2, 512, 64, dtype=np.float32, seed=15)
    a = run_v1(q, k, v, causal=True, window=window,
               config=TileConfig(one_pass=True))
    ref = naive_attention(q, k, v, causal=True, window=window)
    assert error_stats(a, ref)["max_abs"] < 2e-5
    b = run_v1(q, k, v, causal=True, window=window,
               config=TileConfig(one_pass=False))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


def test_v1_window_onepass_multiblock_gqa():
    q, _, _ = make_qkv(1, 4, 1024, 64, dtype=np.float32, seed=16)
    _, k, v = make_qkv(1, 2, 1024, 64, dtype=np.float32, seed=17)
    out = run_v1(q, k, v, causal=True, window=200,
                 config=TileConfig(one_pass=True))
    ref = naive_attention(q, np.repeat(k, 2, axis=1),
                          np.repeat(v, 2, axis=1), causal=True, window=200)
    assert error_stats(out, ref)["max_abs"] < 2e-5


def test_v1_window_covering_band_is_plain_causal():
    # window >= L_kv masks nothing: must route (and agree) with causal
    q, k, v = make_qkv(1, 1, 256, 64, dtype=np.float32, seed=18)
    a = run_v1(q, k, v, causal=True, window=512)
    b = run_v1(q, k, v, causal=True)
    np.testing.assert_allclose(a, b, atol=0, rtol=0)


def test_v1_causal_onepass_gqa_cross_length():
    q, _, _ = make_qkv(1, 4, 128, 64, dtype=np.float32, seed=13)
    _, k, v = make_qkv(1, 2, 384, 64, dtype=np.float32, seed=14)
    out = run_v1(q, k, v, causal=True, config=TileConfig(one_pass=True))
    ref = naive_attention(q, np.repeat(k, 2, axis=1), np.repeat(v, 2, axis=1),
                          causal=True)
    assert error_stats(out, ref)["max_abs"] < 2e-5


@pytest.mark.parametrize("fold", [2, 4])
def test_v1_head_fold(fold):
    # head-folded one-pass: `fold` heads per program with K/V resident
    q, k, v = make_qkv(2, 4, 256, 128, dtype=np.float32, seed=19)
    out = run_v1(q, k, v, config=TileConfig(head_fold=fold, one_pass=True))
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 2e-5
    # and it computes exactly what the unfolded kernel computes
    base = run_v1(q, k, v, config=TileConfig(head_fold=1, one_pass=True))
    np.testing.assert_allclose(out, base, atol=2e-6, rtol=1e-5)


def test_v1_head_fold_gating():
    from exploring_flash_attention_tpu.ops.attention_v1 import _headfold

    # auto folds when the whole-head geometry fits
    assert _headfold(256, 1024, 1024, 128, 1, None) == 4
    # GQA block sharing, ragged lengths, misaligned L: no folding
    assert _headfold(256, 1024, 1024, 128, 2, None) == 1
    assert _headfold(256, 512, 1024, 128, 1, None) == 1
    assert _headfold(256, 1000, 1000, 128, 1, None) == 1
    # requested fold halves down to a divisor of n_bh within VMEM budget
    assert _headfold(12, 256, 256, 128, 1, 8) == 4
    # fold * lkv * d above the one-pass element budget halves down too
    assert _headfold(256, 4096, 4096, 128, 1, 4) == 1
    with pytest.raises(ValueError, match="head_fold"):
        TileConfig(head_fold=3)


@pytest.mark.parametrize("window", [1, 32, 100])
def test_v1_sliding_window(window):
    q, k, v = make_qkv(1, 2, 256, 64, dtype=np.float32, seed=10)
    out = run_v1(q, k, v, causal=True, window=window)
    ref = naive_attention(q, k, v, causal=True, window=window)
    assert error_stats(out, ref)["max_abs"] < 2e-5


def test_v1_window_cross_length():
    # decode-style local attention over a longer KV history
    q, k, v = make_qkv(1, 1, 64, 64, dtype=np.float32, seq_len_kv=256, seed=11)
    out = run_v1(q, k, v, causal=True, window=48)
    ref = naive_attention(q, k, v, causal=True, window=48)
    assert error_stats(out, ref)["max_abs"] < 2e-5


def test_v1_window_requires_causal():
    q, k, v = make_qkv(1, 1, 64, 64, dtype=np.float32, seed=12)
    with pytest.raises(ValueError, match="causal"):
        run_v1(q, k, v, window=16)


def test_cap_onepass_block_q():
    from exploring_flash_attention_tpu.ops.attention_v1 import (
        cap_onepass_block_q,
    )

    # block_q * lkv * 4 bytes of live strip buffers must fit 8 MB
    assert cap_onepass_block_q(1024, 1024) == 1024
    assert cap_onepass_block_q(1024, 2048) == 1024
    assert cap_onepass_block_q(1024, 4096) == 512     # 16 MB -> halve
    assert cap_onepass_block_q(512, 8192) == 256
    # odd whole-sequence blocks (block_q == lq) are never broken: halving
    # 520 would violate the multiple-of-8 block-shape rule
    assert cap_onepass_block_q(520, 4096) == 520


def test_v1_onepass_odd_block_long_kv():
    # lq=520 (block_q == lq, not a multiple of 16) with lkv=4096: the
    # scoped-VMEM cap must not halve the block into a shape Pallas rejects
    q, k, v = make_qkv(1, 1, 520, 32, dtype=np.float32, seq_len_kv=4096,
                       seed=13)
    out = run_v1(q, k, v)
    ref = naive_attention(q, k, v)
    assert error_stats(out, ref)["max_abs"] < 2e-5


def test_v1_long_kv_routes_through_splitkv_spans():
    # non-causal L_kv beyond the one-pass budget must route through the
    # span-local one-pass split-KV pair (not the slower streaming kernel)
    # and stay numerically identical to the oracle
    from exploring_flash_attention_tpu.ops.attention_v1 import onepass_span

    assert onepass_span(8192, 128, 512) == 4096
    assert onepass_span(8192, 512, 512) == 1024
    assert onepass_span(6144, 128, 512) == 3072
    assert onepass_span(8192 + 512, 128, 512) == 512   # 512 * 17
    assert onepass_span(8200, 128, 512) is None        # ragged: streams
    q, k, v = make_qkv(1, 1, 256, 128, dtype=np.float32, seq_len_kv=8192,
                       seed=15)
    out = run_v1(q, k, v)
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 2e-5


def test_v1_long_kv_gqa_routes():
    # GQA through the long-KV span route
    q, _, _ = make_qkv(1, 4, 128, 128, dtype=np.float32, seed=16)
    _, k, v = make_qkv(1, 2, 128, 128, dtype=np.float32, seq_len_kv=8192,
                       seed=17)
    out = run_v1(q, k, v)
    kr = np.repeat(k, 2, axis=1)
    vr = np.repeat(v, 2, axis=1)
    assert error_stats(out, naive_attention(q, kr, vr))["max_abs"] < 2e-5


@pytest.mark.parametrize("causal", [False, True])
def test_v1_gqa_matches_repeated_kv(causal):
    # GQA (2 q heads per kv head) must equal running the kernel on
    # explicitly repeated KV
    q, _, _ = make_qkv(2, 4, 256, 64, dtype=np.float32, seed=14)
    _, k, v = make_qkv(2, 2, 256, 64, dtype=np.float32, seed=15)
    qj, kj, vj = (jnp.asarray(x) for x in (q, k, v))
    a = np.asarray(flash_attention_v1(qj, kj, vj, causal=causal))
    b = np.asarray(flash_attention_v1(
        qj, jnp.repeat(kj, 2, axis=1), jnp.repeat(vj, 2, axis=1),
        causal=causal))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_v1_gqa_streaming():
    q, _, _ = make_qkv(1, 4, 256, 64, dtype=np.float32, seed=16)
    _, k, v = make_qkv(1, 2, 256, 64, dtype=np.float32, seed=17)
    qj, kj, vj = (jnp.asarray(x) for x in (q, k, v))
    cfg = TileConfig(block_q=128, block_kv=64, one_pass=False)
    a = np.asarray(flash_attention_v1(qj, kj, vj, config=cfg))
    b = np.asarray(flash_attention_v1(
        qj, jnp.repeat(kj, 2, axis=1), jnp.repeat(vj, 2, axis=1),
        config=cfg))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_v1_gqa_sliding_window():
    # GQA x sliding-window: the banded causal mask with shared KV heads
    q, _, _ = make_qkv(1, 4, 256, 64, dtype=np.float32, seed=18)
    _, k, v = make_qkv(1, 2, 256, 64, dtype=np.float32, seed=19)
    qj, kj, vj = (jnp.asarray(x) for x in (q, k, v))
    a = np.asarray(flash_attention_v1(qj, kj, vj, causal=True, window=48))
    b = np.asarray(flash_attention_v1(
        qj, jnp.repeat(kj, 2, axis=1), jnp.repeat(vj, 2, axis=1),
        causal=True, window=48))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_v1_randomized_shapes():
    # fuzz the dispatcher across ragged/cross-length/GQA shape combos —
    # every sample validates against the oracle (seeded, deterministic)
    rng = np.random.default_rng(123)
    for _ in range(8):
        b = int(rng.integers(1, 3))
        h_kv = int(rng.integers(1, 3))
        group = int(rng.choice([1, 2]))
        h = h_kv * group
        lq = int(rng.integers(1, 40)) * 8
        lkv = int(rng.integers(1, 40)) * 8
        d = int(rng.choice([32, 64, 128]))
        causal = bool(rng.choice([True, False])) and lkv >= lq
        # sometimes a sliding window too (routes through the windowed
        # one-pass kernel when eligible, streaming otherwise)
        window = None
        if causal and rng.random() < 0.4:
            window = int(rng.integers(1, lkv + 16))
        bq = int(rng.choice([64, 128, 256]))
        bk = int(rng.choice([64, 128, 256]))
        one_pass = rng.choice([None, False])
        q = rng.standard_normal((b, h, lq, d)).astype(np.float32)
        k = rng.standard_normal((b, h_kv, lkv, d)).astype(np.float32)
        v = rng.standard_normal((b, h_kv, lkv, d)).astype(np.float32)
        cfg = TileConfig(block_q=bq, block_kv=bk, one_pass=one_pass)
        out = np.asarray(flash_attention_v1(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            config=cfg, causal=causal, window=window,
        ))
        kr = np.repeat(k, group, axis=1)
        vr = np.repeat(v, group, axis=1)
        ref = naive_attention(q, kr, vr, causal=causal,
                              window=min(window, lkv) if window else None)
        stats = error_stats(out, ref)
        assert stats["max_abs"] < 2e-5, (
            b, h, h_kv, lq, lkv, d, causal, window, bq, bk, one_pass, stats)


def test_onepass_fold_vmem_estimator_boundaries():
    # VERDICT r3 item 6: the fold gate is an explicit VMEM model, not a
    # magic constant.  These are the measured Mosaic scoped-allocation
    # boundary points at 1024x1024/d=128 (docstring of
    # onepass_fold_vmem_bytes): fitting geometries estimate under budget,
    # measured-OOM ones over it.
    from exploring_flash_attention_tpu.ops.attention_v1 import (
        FOLD_VMEM_BUDGET, causal_strip_spans, onepass_fold_vmem_bytes,
    )

    est = onepass_fold_vmem_bytes
    # --- pipelined exact kernel (round-5 measured boundary points on
    # v5e, scripts/proto_r5_pipe.py + forced-compile probes): fold4
    # qc128 bf16/f32 and qc256 bf16 compile; qc256 f32 and qc512 OOM ---
    assert est(1024, 1024, 128, 4, q_chunk=128,
               pipelined=True) <= FOLD_VMEM_BUDGET
    assert est(1024, 1024, 128, 4, out_bytes=4, q_chunk=128,
               pipelined=True) <= FOLD_VMEM_BUDGET
    assert est(1024, 1024, 128, 4, pipelined=True) <= FOLD_VMEM_BUDGET
    assert est(1024, 1024, 128, 4, out_bytes=4,
               pipelined=True) > FOLD_VMEM_BUDGET
    assert est(1024, 1024, 128, 4, q_chunk=512,
               pipelined=True) > FOLD_VMEM_BUDGET
    # --- non-pipelined (bound/causal) keep the round-4 calibration:
    # dense fold4 bf16-out qc256/qc512 and f32-out qc256 fit on
    # hardware; qc512 f32-out measured 17.21 MB (OOM) ---
    assert est(1024, 1024, 128, 4) <= FOLD_VMEM_BUDGET
    assert est(1024, 1024, 128, 4, q_chunk=512) <= FOLD_VMEM_BUDGET
    assert est(1024, 1024, 128, 4, out_bytes=4) <= FOLD_VMEM_BUDGET
    assert est(1024, 1024, 128, 4, out_bytes=4,
               q_chunk=512) > FOLD_VMEM_BUDGET
    # fold8 bf16 measured 21+ MB (OOM)
    assert est(1024, 1024, 128, 8) > FOLD_VMEM_BUDGET
    assert est(1024, 1024, 128, 8, q_chunk=128,
               pipelined=True) > FOLD_VMEM_BUDGET

    # causal diagonal block: fold4 bf16 fits; f32-out + LSE measured
    # 17.01 MB (OOM)
    spans = causal_strip_spans(1024, 0, 0, 1024, 256)
    assert spans == [256, 512, 768, 1024]
    assert est(1024, 1024, 128, 4, strip_spans=spans) <= FOLD_VMEM_BUDGET
    assert est(1024, 1024, 128, 4, out_bytes=4, with_lse=True,
               strip_spans=spans) > FOLD_VMEM_BUDGET


def test_causal_headfold_uses_worst_block():
    # Round-4 ADVICE: at lq=lkv=2048 the LAST q block's strips span
    # nearly the whole 2048, so the old flat 5/8-of-diagonal factor
    # under-counted and admitted a fold whose working set exceeds the
    # scoped limit; the worst-block model folds it down to 1.
    from exploring_flash_attention_tpu.ops.attention_v1 import (
        _causal_headfold, causal_strip_spans,
    )

    assert causal_strip_spans(1024, 1024, 0, 2048, 256) == [
        1280, 1536, 1792, 2048]
    assert _causal_headfold(256, 1024, 2048, 128, 1, lq=2048) == 1
    # the diagonal-only geometry still folds to 4
    assert _causal_headfold(256, 1024, 1024, 128, 1, lq=1024) == 4


def test_v1_bound_softmax_matches_oracle():
    # Round-4 opt-in fast path: Cauchy-Schwarz bound replaces the row-max
    # lane reduce (TileConfig.softmax docstring).  Shift-invariance makes
    # it oracle-accurate; the only cost is the top weight's exact-1.0 bf16
    # representation, so the gate here is the 2e-3 serving tier.
    q, k, v = make_qkv(2, 4, 512, 128, dtype=np.float32, seed=3)
    cfg = TileConfig(block_q=512, block_kv=512, softmax="bound")
    out = run_v1(q, k, v, config=cfg)
    ref = naive_attention(q, k, v)
    # f32 operands through the interpret/CPU path: near-exact
    assert error_stats(out, ref)["max_abs"] < 2e-5
    # bf16 storage tier
    qb, kb, vb = (jnp.asarray(x).astype(jnp.bfloat16) for x in (q, k, v))
    ob = np.asarray(flash_attention_v1(
        qb, kb, vb, config=cfg, out_dtype=jnp.float32))
    refb = naive_attention(*(np.asarray(x.astype(jnp.float32))
                             for x in (qb, kb, vb)))
    assert error_stats(ob, refb)["max_abs"] < 2e-3
    # head-folded geometry takes the same option
    cfgf = TileConfig(block_q=1024, block_kv=1024, softmax="bound")
    q2, k2, v2 = make_qkv(4, 4, 1024, 128, dtype=np.float32, seed=4)
    out2 = run_v1(q2, k2, v2, config=cfgf)
    assert error_stats(out2, naive_attention(q2, k2, v2))["max_abs"] < 2e-5


def test_v1_bound_softmax_ragged_kv():
    # padded KV rows must not poison the norm bound or the output
    q, k, v = make_qkv(1, 2, 256, 128, dtype=np.float32, seq_len_kv=200,
                       seed=5)
    cfg = TileConfig(block_q=256, block_kv=256, softmax="bound")
    out = run_v1(q, k, v, config=cfg)
    ref = naive_attention(q, k, v)
    assert error_stats(out, ref)["max_abs"] < 2e-5


def test_config_softmax_validation():
    with pytest.raises(ValueError, match="softmax"):
        TileConfig(softmax="fast")


def test_v1_bound_softmax_causal():
    # causal bound statistic: prefix-max of the visible K norms — same
    # shift-invariance, and the causal bit-invariance to future tokens is
    # preserved because the statistic never reads past the visible span.
    q, k, v = make_qkv(2, 4, 512, 128, dtype=np.float32, seed=6)
    cfg = TileConfig(block_q=512, block_kv=512, softmax="bound")
    out = run_v1(q, k, v, config=cfg, causal=True)
    ref = naive_attention(q, k, v, causal=True)
    assert error_stats(out, ref)["max_abs"] < 2e-5
    # future-token invariance (the spec-decode property): extending the
    # sequence must not change the prefix's outputs bit-for-bit
    import jax
    q2 = np.concatenate([q, np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (2, 4, 128, 128)))], axis=2)
    k2 = np.concatenate([k, np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (2, 4, 128, 128)))], axis=2)
    v2 = np.concatenate([v, np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (2, 4, 128, 128)))], axis=2)
    out2 = run_v1(q2.astype(np.float32), k2.astype(np.float32),
                  v2.astype(np.float32), config=cfg, causal=True)
    np.testing.assert_array_equal(out2[:, :, :512], out)


def test_v1_bound_softmax_pvt_d32():
    # transposed-PV path (d <= 32) with the bound statistic — the biggest
    # bound win (41 -> 55 TF/s on chip, scripts/proto_d32_bound.py)
    cfg = TileConfig(block_q=1024, block_kv=1024, softmax="bound")
    q, k, v = make_qkv(2, 4, 512, 32, dtype=np.float32, seed=7)
    out = run_v1(q, k, v, config=cfg)
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 2e-5
    # ragged KV through the masked path
    q2, k2, v2 = make_qkv(1, 2, 256, 32, dtype=np.float32, seq_len_kv=200,
                          seed=8)
    out2 = run_v1(q2, k2, v2, config=cfg)
    assert error_stats(out2, naive_attention(q2, k2, v2))["max_abs"] < 2e-5


@pytest.mark.parametrize("causal", [False, True])
def test_v1_bound_softmax_streaming(causal):
    # streaming path with the FIXED bound shift: online state collapses
    # to (acc, l) — no running max, no alpha (see _v1_kernel docstring)
    cfg = TileConfig(block_q=128, block_kv=128, one_pass=False,
                     softmax="bound")
    q, k, v = make_qkv(2, 2, 384, 64, dtype=np.float32, seed=9)
    out = run_v1(q, k, v, config=cfg, causal=causal)
    ref = naive_attention(q, k, v, causal=causal)
    assert error_stats(out, ref)["max_abs"] < 2e-5

    # ragged KV + GQA
    q2, k2, v2 = make_qkv(1, 4, 256, 64, dtype=np.float32, seq_len_kv=200,
                          seed=10)
    k2, v2 = k2[:, :2], v2[:, :2]
    out2 = run_v1(q2, k2, v2, config=cfg, causal=False)
    ref2 = naive_attention(q2, np.repeat(k2, 2, axis=1),
                           np.repeat(v2, 2, axis=1))
    assert error_stats(out2, ref2)["max_abs"] < 2e-5


def test_v1_bound_softmax_streaming_causal_invariance():
    # prefix-kmax covers only VISIBLE tiles: extending the sequence must
    # not change the prefix's outputs bit-for-bit (full q blocks only)
    import jax
    cfg = TileConfig(block_q=128, block_kv=128, one_pass=False,
                     softmax="bound")
    q, k, v = make_qkv(1, 2, 256, 64, dtype=np.float32, seed=11)
    out = run_v1(q, k, v, config=cfg, causal=True)
    ext = [np.asarray(jax.random.normal(jax.random.PRNGKey(i),
                                        (1, 2, 128, 64)), np.float32)
           for i in range(3)]
    out2 = run_v1(np.concatenate([q, ext[0]], 2),
                  np.concatenate([k, ext[1]], 2),
                  np.concatenate([v, ext[2]], 2), config=cfg, causal=True)
    np.testing.assert_array_equal(out2[:, :, :256], out)


def test_v1_bound_softmax_streaming_window():
    cfg = TileConfig(block_q=128, block_kv=128, one_pass=False,
                     softmax="bound")
    q, k, v = make_qkv(1, 2, 384, 64, dtype=np.float32, seed=12)
    out = run_v1(q, k, v, config=cfg, causal=True, window=100)
    ref = naive_attention(q, k, v, causal=True, window=100)
    assert error_stats(out, ref)["max_abs"] < 2e-5


def test_v1_softmax_invariance_granularity_misaligned():
    """Round-4 ADVICE (medium): pin down the true invariance granularity
    with a MISALIGNED extension under block_kv > block_q.

    - exact mode: causal outputs are bit-invariant to future tokens at
      PER-TOKEN granularity — any extension, aligned or not, leaves the
      prefix bitwise unchanged (the masked band max sees only each row's
      own visible keys);
    - bound mode: invariant only at aligned block/strip granularity —
      extending by whole KV tiles is bitwise safe, but a sub-tile
      extension may re-round rows in the straddling block (the shared
      prefix-kmax covers the whole lane-aligned tile).  The sub-tile
      case must still be numerically correct vs the oracle."""
    import jax

    lq = 256
    ext_tok = 128            # < block_kv: misaligned vs the 256 KV tiles
    q, k, v = make_qkv(1, 2, lq, 64, dtype=np.float32, seed=12)
    ext = [np.asarray(jax.random.normal(jax.random.PRNGKey(90 + i),
                                        (1, 2, ext_tok, 64)), np.float32)
           for i in range(3)]
    q2 = np.concatenate([q, ext[0]], 2)
    k2 = np.concatenate([k, ext[1]], 2)
    v2 = np.concatenate([v, ext[2]], 2)

    # exact, streaming, block_kv > block_q: per-token invariance
    cfg_exact = TileConfig(block_q=128, block_kv=256, one_pass=False)
    out = run_v1(q, k, v, config=cfg_exact, causal=True)
    out2 = run_v1(q2, k2, v2, config=cfg_exact, causal=True)
    np.testing.assert_array_equal(out2[:, :, :lq], out)

    # bound, same geometry: sub-tile extension stays CORRECT...
    cfg_bound = TileConfig(block_q=128, block_kv=256, one_pass=False,
                           softmax="bound")
    outb2 = run_v1(q2, k2, v2, config=cfg_bound, causal=True)
    ref2 = naive_attention(q2, k2, v2, causal=True)
    assert error_stats(outb2, ref2)["max_abs"] < 2e-5
    # ...and extension by a WHOLE KV tile is bitwise invariant
    ext_full = [np.asarray(jax.random.normal(jax.random.PRNGKey(80 + i),
                                             (1, 2, 256, 64)), np.float32)
                for i in range(3)]
    outb = run_v1(q, k, v, config=cfg_bound, causal=True)
    outb3 = run_v1(np.concatenate([q, ext_full[0]], 2),
                   np.concatenate([k, ext_full[1]], 2),
                   np.concatenate([v, ext_full[2]], 2),
                   config=cfg_bound, causal=True)
    np.testing.assert_array_equal(outb3[:, :, :lq], outb)
