#!/usr/bin/env python
"""Headroom probe for a fixed-shift (bound-style) STREAMING kernel: with a
per-row m fixed for the whole stream, the online-softmax state collapses
to (acc, l) — no running max, no alpha, no accumulator rescale.  This
probe times a measurement-only variant (constant m, numerically unsafe)
against the shipped kernel at the long-context suite shape to size the
win before building the real prefix-K-norm plumbing."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import exploring_flash_attention_tpu.ops.attention_v1 as av1
from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.utils.benchmark import attention_flops

B, H, L, D = 1, 8, 32768, 128
FLOPS = attention_flops(B, H, L, L, D, causal=True)
N_LONG, N_SHORT = 24, 2
WINDOWS = 6
LOG2E = av1.LOG2E
NEG_INF = av1.NEG_INF


def _v1_kernel_fixedm(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
    scale, block_q, block_kv, seq_len_q, seq_len_kv, causal, window=None,
):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)
    q_idx = pl.program_id(1)

    @pl.when(kv_idx == 0)
    def _init():
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if causal:
        diag_off = seq_len_kv - seq_len_q
        tile_visible = (
            kv_idx * block_kv <= (q_idx + 1) * block_q - 1 + diag_off
        )
    else:
        tile_visible = True

    c = scale * LOG2E
    q_strip = (min(av1.ONEPASS_Q_CHUNK, block_q) if block_kv >= 1024
               else block_q)
    M_CONST = 48.0          # measurement-only fixed shift

    @pl.when(tile_visible)
    def _tile():
        k = k_ref[0]
        v = v_ref[0]
        for q0 in range(0, block_q, q_strip):
            rows = min(q_strip, block_q - q0)
            q = q_ref[0, q0:q0 + rows, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            mask = None
            if causal:
                col = jax.lax.broadcasted_iota(jnp.int32, (rows, block_kv), 1)
                col = col + kv_idx * block_kv
                row = jax.lax.broadcasted_iota(jnp.int32, (rows, block_kv), 0)
                row = row + q_idx * block_q + q0
                mask = col <= row + (seq_len_kv - seq_len_q)
            arg = s * c - M_CONST
            if mask is not None:
                arg = jnp.where(mask, arg, NEG_INF)
            p = jnp.exp2(arg)
            l_ref[q0:q0 + rows, :] = (
                l_ref[q0:q0 + rows, :] + jnp.sum(p, axis=1, keepdims=True))
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[q0:q0 + rows, :] = acc_ref[q0:q0 + rows, :] + pv

    @pl.when(kv_idx == n_kv - 1)
    def _finalize():
        l = l_ref[:, :1]
        denom = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


def chain(fn, n):
    @jax.jit
    def run(x, *rest):
        def body(c, _):
            return fn(c, *rest), ()
        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))
    return run


def window(rl, rs, *args):
    shorts, longs = [], []
    for _ in range(2):
        t0 = time.perf_counter(); float(rs(*args))
        shorts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(rl(*args))
        longs.append(time.perf_counter() - t0)
    return (min(longs) - min(shorts)) / (N_LONG - N_SHORT)


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    qd = jnp.asarray(q).astype(jnp.bfloat16)
    kd = jnp.asarray(k).astype(jnp.bfloat16)
    vd = jnp.asarray(v).astype(jnp.bfloat16)
    cfg = TileConfig(block_q=1024, block_kv=2048)

    def mk(kern):
        def step(x, kk, vv):
            orig = av1._v1_kernel
            av1._v1_kernel = kern
            try:
                return av1.flash_attention_v1.__wrapped__(
                    x, kk, vv, config=cfg, causal=True)
            finally:
                av1._v1_kernel = orig
        return step

    paths = [("shipped", mk(av1._v1_kernel)),
             ("fixedm", mk(_v1_kernel_fixedm))]
    timers = []
    for name, fn in paths:
        t0 = time.perf_counter()
        rl, rs = chain(fn, N_LONG), chain(fn, N_SHORT)
        float(rl(qd, kd, vd)); float(rs(qd, kd, vd))
        timers.append((name, rl, rs))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s",
              flush=True)

    results = {name: [] for name, _, _ in timers}
    for w in range(WINDOWS):
        for name, rl, rs in timers:
            sec = window(rl, rs, qd, kd, vd)
            results[name].append(FLOPS / sec / 1e12)
    for name, _, _ in timers:
        vals = sorted(results[name])
        print(f"{name:8s}: min {vals[0]:6.1f} med {vals[len(vals)//2]:6.1f} "
              f"max {vals[-1]:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
