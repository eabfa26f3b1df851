#!/usr/bin/env python
"""Round-4: hide the exact-softmax reductions under the MXU by chunking
the score matmul along KV lanes.  Each chunk's partial row-max reduce can
issue while the next chunk's matmul occupies the MXU; after the global max,
each chunk's exp2+sum+PV overlaps the next chunk's exp2.  Numerics are
IDENTICAL to the exact kernel (max of chunk maxes = exact max).

Also measures the bound-softmax variant composed WITH chunking, and the
exact baseline, paired window-by-window (chain 96)."""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.oracle.reference import (
    error_stats, make_qkv, naive_attention,
)
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, roofline_attention_tflops,
)

B, H, L, D = 32, 8, 1024, 128
LOG2E = math.log2(math.e)
FLOPS = attention_flops(B, H, L, L, D)
ROOF = roofline_attention_tflops(B, H, L, D)
FOLD = 4
N_LONG, N_SHORT = 96, 4
WINDOWS = 6


def kernel(q_ref, k_ref, v_ref, o_ref, *, c, qc, n_chunks):
    lkv = k_ref.shape[1]
    ck = lkv // n_chunks
    for hh in range(FOLD):
        k = k_ref[hh]
        v = v_ref[hh]
        for q0 in range(0, q_ref.shape[1], qc):
            q = q_ref[hh, q0:q0 + qc, :]
            ss, ms = [], []
            for ci in range(n_chunks):
                sc = jax.lax.dot_general(
                    q, k[ci * ck:(ci + 1) * ck],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ss.append(sc)
                ms.append(jnp.max(sc, axis=1, keepdims=True))
            m = ms[0]
            for mm in ms[1:]:
                m = jnp.maximum(m, mm)
            m = m * c
            pv = None
            den = None
            for ci in range(n_chunks):
                pb = jnp.exp2(ss[ci] * c - m).astype(v.dtype)
                pvc = jax.lax.dot_general(
                    pb, v[ci * ck:(ci + 1) * ck],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dc = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
                pv = pvc if pv is None else pv + pvc
                den = dc if den is None else den + dc
            den = jnp.where(den == 0.0, 1.0, den)
            o_ref[hh, q0:q0 + qc, :] = (pv / den).astype(o_ref.dtype)


def baseline_kernel(q_ref, k_ref, v_ref, o_ref, *, c, qc):
    for hh in range(FOLD):
        k = k_ref[hh]
        v = v_ref[hh]
        for q0 in range(0, q_ref.shape[1], qc):
            q = q_ref[hh, q0:q0 + qc, :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=1, keepdims=True) * c
            pb = jnp.exp2(s * c - m).astype(v.dtype)
            pv = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            den = jnp.sum(pb.astype(jnp.float32), axis=1, keepdims=True)
            den = jnp.where(den == 0.0, 1.0, den)
            o_ref[hh, q0:q0 + qc, :] = (pv / den).astype(o_ref.dtype)


def make(kern, out_dtype=jnp.bfloat16, **kw):
    c = LOG2E / math.sqrt(D)
    n_bh = B * H
    return pl.pallas_call(
        functools.partial(kern, c=c, **kw),
        grid=(n_bh // FOLD,),
        in_specs=[pl.BlockSpec((FOLD, L, D), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((FOLD, L, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, L, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )


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
    qf = jnp.asarray(q).astype(jnp.bfloat16).reshape(B * H, L, D)
    kf = jnp.asarray(k).astype(jnp.bfloat16).reshape(B * H, L, D)
    vf = jnp.asarray(v).astype(jnp.bfloat16).reshape(B * H, L, D)

    cands = [
        ("exact_qc256", make(baseline_kernel, qc=256)),
        ("chunk2_qc256", make(kernel, qc=256, n_chunks=2)),
        ("chunk4_qc256", make(kernel, qc=256, n_chunks=4)),
        ("chunk4_qc512", make(kernel, qc=512, n_chunks=4)),
        ("chunk8_qc512", make(kernel, qc=512, n_chunks=8)),
    ]
    timers = []
    for name, fn in cands:
        t0 = time.perf_counter()
        try:
            rl, rs = chain(fn, N_LONG), chain(fn, N_SHORT)
            float(rl(qf, kf, vf)); float(rs(qf, kf, vf))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}", flush=True)
            continue
        timers.append((name, rl, rs))
        print(f"compiled {name} in {time.perf_counter()-t0:.1f}s", flush=True)

    results = {name: [] for name, _, _ in timers}
    for w in range(WINDOWS):
        for name, rl, rs in timers:
            sec = window(rl, rs, qf, kf, vf)
            results[name].append(FLOPS / sec / 1e12)

    base = sorted(results[timers[0][0]])[WINDOWS // 2]
    for name, _, _ in timers:
        vals = sorted(results[name])
        med = vals[len(vals) // 2]
        print(f"{name:14s}: med {med:6.1f} TF/s ({100*med/ROOF:4.1f}%) "
              f"= {med/base:5.3f}x exact  [ms {FLOPS/med/1e9:.3f}]",
              flush=True)


if __name__ == "__main__":
    main()
