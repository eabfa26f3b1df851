"""Paged KV-cache, decode kernel, and continuous-batching scheduler."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from exploring_flash_attention_tpu.oracle.reference import (
    error_stats,
    naive_attention,
)
from exploring_flash_attention_tpu.serving import (
    ContinuousBatchingScheduler,
    PageAllocator,
    Request,
    append_tokens,
    gather_kv,
    make_cache,
    paged_decode_attention,
)
from exploring_flash_attention_tpu.serving.kv_cache import append_prompt


def _mk_prompt(rng, l, hkv, d):
    return (
        jnp.asarray(rng.standard_normal((l, hkv, d)), dtype=jnp.float32),
        jnp.asarray(rng.standard_normal((l, hkv, d)), dtype=jnp.float32),
    )


def test_allocator_exhaustion_and_reuse():
    alloc = PageAllocator(4)
    a = alloc.alloc(3)
    with pytest.raises(MemoryError):
        alloc.alloc(2)
    alloc.free(a)
    assert alloc.free_pages == 4


def test_cache_roundtrip_via_gather():
    rng = np.random.default_rng(0)
    hkv, d, ps = 2, 64, 128
    cache = make_cache(hkv, d, n_pages=8, page_size=ps, max_seqs=2)
    cache = dataclasses.replace(
        cache, page_table=cache.page_table.at[0, :3].set(jnp.asarray([4, 1, 6]))
    )
    k_p, v_p = _mk_prompt(rng, 200, hkv, d)
    cache = append_prompt(cache, 0, k_p, v_p)
    assert int(cache.seq_lens[0]) == 200
    k_out, v_out = gather_kv(cache, 0)
    # int8 per-token quantization error bound
    err = np.abs(np.asarray(k_out) - np.asarray(k_p).transpose(1, 0, 2)).max()
    assert err < 0.05, err


def test_append_tokens_positions():
    rng = np.random.default_rng(1)
    hkv, d, ps = 2, 64, 128
    cache = make_cache(hkv, d, n_pages=4, page_size=ps, max_seqs=2)
    cache = dataclasses.replace(
        cache, page_table=cache.page_table.at[1, :2].set(jnp.asarray([2, 3]))
    )
    for t in range(130):            # crosses a page boundary
        k_new = jnp.asarray(rng.standard_normal((1, hkv, d)), dtype=jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((1, hkv, d)), dtype=jnp.float32)
        cache = append_tokens(cache, jnp.asarray([1]), k_new, v_new)
    assert int(cache.seq_lens[1]) == 130
    k_out, _ = gather_kv(cache, 1)
    assert k_out.shape == (hkv, 130, d)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_paged_decode_matches_oracle(hq, hkv):
    rng = np.random.default_rng(2)
    d, ps = 64, 128
    b = 2
    lens = [200, 77]
    cache = make_cache(hkv, d, n_pages=8, page_size=ps, max_seqs=4)
    pt = cache.page_table
    pt = pt.at[0, :2].set(jnp.asarray([0, 1]))
    pt = pt.at[1, :1].set(jnp.asarray([2]))
    cache = dataclasses.replace(cache, page_table=pt)
    prompts = []
    for s, l in enumerate(lens):
        k_p, v_p = _mk_prompt(rng, l, hkv, d)
        prompts.append((k_p, v_p))
        cache = append_prompt(cache, s, k_p, v_p)

    q = jnp.asarray(rng.standard_normal((b, hq, d)), dtype=jnp.float32)
    out = np.asarray(
        paged_decode_attention(q, cache, jnp.asarray([0, 1], jnp.int32))
    )
    assert out.shape == (b, hq, d)

    group = hq // hkv
    for s in range(b):
        k_full, v_full = gather_kv(cache, s)     # dequantized [Hkv, L, d]
        # oracle on the dequantized cache: isolates kernel error from quant
        q_g = np.asarray(q[s]).reshape(hkv, group, d)
        ref = naive_attention(q_g, np.asarray(k_full), np.asarray(v_full))
        got = out[s].reshape(hkv, group, d)
        assert error_stats(got, ref)["max_abs"] < 1e-4


def test_scheduler_continuous_batching():
    rng = np.random.default_rng(3)
    hq, hkv, d = 4, 2, 64
    sched = ContinuousBatchingScheduler(
        num_q_heads=hq, num_kv_heads=hkv, head_dim=d,
        n_pages=6, page_size=128, max_seqs=2,
    )

    def mk_request(rid, prompt_len, n_new):
        k_p, v_p = _mk_prompt(rng, prompt_len, hkv, d)
        r = np.random.default_rng(100 + rid)

        def step_inputs(i):
            return (
                jnp.asarray(r.standard_normal((hq, d)), dtype=jnp.float32),
                jnp.asarray(r.standard_normal((hkv, d)), dtype=jnp.float32),
                jnp.asarray(r.standard_normal((hkv, d)), dtype=jnp.float32),
            )

        return Request(rid, k_p, v_p, n_new, step_inputs)

    # 3 requests, only 2 slots / 6 pages: the third must wait (continuous
    # batching admits it when a slot frees)
    sched.submit(mk_request(0, 100, 3))
    sched.submit(mk_request(1, 100, 5))
    sched.submit(mk_request(2, 100, 2))

    out = sched.step()
    assert sched.num_active == 2 and sched.num_pending == 1
    assert {rid for rid, _ in out} == {0, 1}

    done = sched.run_to_completion()
    assert done == {0: 3, 1: 5, 2: 2}
    assert sched.num_active == 0 and sched.num_pending == 0
    # all pages returned
    assert sched.allocator.free_pages == 6


def test_scheduler_output_matches_unbatched_oracle():
    rng = np.random.default_rng(4)
    hq, hkv, d = 2, 2, 64
    sched = ContinuousBatchingScheduler(
        num_q_heads=hq, num_kv_heads=hkv, head_dim=d,
        n_pages=4, page_size=128, max_seqs=1,
    )
    k_p, v_p = _mk_prompt(rng, 64, hkv, d)
    q_step = jnp.asarray(rng.standard_normal((hq, d)), dtype=jnp.float32)
    k_step = jnp.asarray(rng.standard_normal((hkv, d)), dtype=jnp.float32)
    v_step = jnp.asarray(rng.standard_normal((hkv, d)), dtype=jnp.float32)
    sched.submit(Request(7, k_p, v_p, 1, lambda i: (q_step, k_step, v_step)))
    (rid, out), = sched.step()
    assert rid == 7
    # oracle: attention of q_step over prompt + the one appended token
    k_full = np.concatenate([np.asarray(k_p), np.asarray(k_step)[None]], 0)
    v_full = np.concatenate([np.asarray(v_p), np.asarray(v_step)[None]], 0)
    ref = naive_attention(
        np.asarray(q_step)[:, None, :],          # [Hq, 1, d] as [H,L,d]
        k_full.transpose(1, 0, 2),
        v_full.transpose(1, 0, 2),
    )[:, 0]
    # int8 cache quantization noise bounds the error here
    assert error_stats(out, ref)["max_abs"] < 0.05


def test_windowed_decode_matches_banded_oracle():
    # windowed decode lists only the band's pages; verify against naive
    # attention over the dequantized cache restricted to the band
    rng = np.random.default_rng(11)
    d, ps, w = 64, 128, 300
    b = 3
    lens = [450, 100, 800]
    hkv, hq = 2, 4
    cache = make_cache(hkv, d, n_pages=24, page_size=ps, max_seqs=4)
    pt = cache.page_table
    pt = pt.at[0, :4].set(jnp.asarray([0, 1, 2, 3]))
    pt = pt.at[1, :1].set(jnp.asarray([4]))
    pt = pt.at[2, :7].set(jnp.asarray([5, 6, 7, 8, 9, 10, 11]))
    cache = dataclasses.replace(cache, page_table=pt)
    for s, l in enumerate(lens):
        k_p, v_p = _mk_prompt(rng, l, hkv, d)
        cache = append_prompt(cache, s, k_p, v_p)

    q = jnp.asarray(rng.standard_normal((b, hq, d)), dtype=jnp.float32)
    slots = jnp.asarray([0, 1, 2], jnp.int32)
    out = np.asarray(paged_decode_attention(q, cache, slots, window=w))
    full = np.asarray(paged_decode_attention(q, cache, slots))

    group = hq // hkv
    for s, l in enumerate(lens):
        k_full, v_full = gather_kv(cache, s)       # dequantized [Hkv, L, d]
        lo = max(0, l - w)
        q_g = np.asarray(q[s]).reshape(hkv, group, d)
        ref = naive_attention(q_g, np.asarray(k_full)[:, lo:],
                              np.asarray(v_full)[:, lo:])
        got = out[s].reshape(hkv, group, d)
        assert error_stats(got, ref)["max_abs"] < 1e-4, s
        if l > w:   # the band must actually differ from full attention
            assert np.abs(out[s] - full[s]).max() > 1e-4


@pytest.mark.parametrize("path", ["onepass", "streaming"])
def test_paged_extend_matches_oracle(path, monkeypatch):
    # chunked prefill: C new tokens attend causally over paged history.
    # Both kernels referee against the same oracle: the one-pass kernel
    # serves spans whose double-buffered pages fit VMEM, the streaming
    # kernel everything longer — forcing the budget to 0 exercises it here.
    if path == "streaming":
        import exploring_flash_attention_tpu.serving.decode as dec
        monkeypatch.setattr(dec, "EXTEND_ONEPASS_MAX_BYTES", 0)
    rng = np.random.default_rng(9)
    hkv, hq, d, ps = 2, 4, 64, 128
    b, C = 2, 128
    hist = [256, 384]
    cache = make_cache(hkv, d, n_pages=16, page_size=ps, max_seqs=4)
    pt = cache.page_table
    pt = pt.at[0, :4].set(jnp.asarray([0, 1, 2, 3]))
    pt = pt.at[1, :4].set(jnp.asarray([4, 5, 6, 7]))
    cache = dataclasses.replace(cache, page_table=pt)
    for s, n in enumerate(hist):
        k_p, v_p = _mk_prompt(rng, n, hkv, d)
        cache = append_prompt(cache, s, k_p, v_p)
        k_c, v_c = _mk_prompt(rng, C, hkv, d)
        cache = append_prompt(cache, s, k_c, v_c)   # the chunk itself
    q = jnp.asarray(rng.standard_normal((b, C, hq, d)), jnp.float32)
    slots = jnp.asarray([0, 1], jnp.int32)

    from exploring_flash_attention_tpu.serving import paged_extend_attention
    for w in (None, 200):
        out = np.asarray(paged_extend_attention(q, cache, slots, window=w))
        for s, n in enumerate(hist):
            kf, vf = gather_kv(cache, s)
            qg = np.asarray(q[s]).reshape(C, hkv, hq // hkv, d)
            for i in (0, C - 1):
                pos = n + i
                lo = 0 if w is None else max(0, pos - w + 1)
                ref = naive_attention(qg[i], np.asarray(kf)[:, lo:pos + 1],
                                      np.asarray(vf)[:, lo:pos + 1])
                got = out[s, i].reshape(hkv, hq // hkv, d)
                assert error_stats(got, ref)["max_abs"] < 1e-4, (w, s, i)


def test_extend_onepass_gate_scales_with_lmax():
    # Round-4 ADVICE fix: the one-pass admission must include the
    # Lmax-scaled per-head terms (dequantized K/V + f32 score strips),
    # not just the int8 page buffer — a low-Hkv cache with a long max
    # span passes a pages-only gate yet OOMs scoped VMEM at compile.
    from exploring_flash_attention_tpu.serving import decode as dec

    calibrated = make_cache(8, 128, n_pages=8, page_size=256, max_seqs=1,
                            max_pages_per_seq=8)          # Lmax=2048
    assert (dec.extend_onepass_vmem_bytes(calibrated, jnp.bfloat16)
            <= dec.EXTEND_ONEPASS_MAX_BYTES)

    mqa_long = make_cache(2, 64, n_pages=144, page_size=128, max_seqs=1,
                          max_pages_per_seq=144)          # Lmax=18432
    est = dec.extend_onepass_vmem_bytes(mqa_long, jnp.bfloat16)
    # pages alone (~9.4 MB) passed the old gate; the strips (~18.9 MB)
    # push the true working set far past the 16 MB scoped limit
    assert est > 16 * 1024 * 1024
    assert est > dec.EXTEND_ONEPASS_MAX_BYTES
