#!/usr/bin/env python
"""One-pass micro-opt round: (base) current kernel; (I) two-strip explicit
interleave; (P) denom from post-cast p.  One process, reps=5."""
import functools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.oracle.reference import make_qkv
from exploring_flash_attention_tpu.ops import flash_attention_v1
from exploring_flash_attention_tpu.utils.benchmark import (
    attention_flops, roofline_attention_tflops, time_fn_chained,
)

B, H, L, D = 32, 8, 1024, 128
LOG2E = math.log2(math.e)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, c, variant):
    bq = q_ref.shape[1]
    k = k_ref[0]
    v = v_ref[0]
    qc = 256

    def softmax_pv(s):
        m = jnp.max(s, axis=1, keepdims=True) * c
        p = jnp.exp2(s * c - m)
        if variant == "P":
            p_lp = p.astype(v.dtype)
            denom = jnp.sum(p_lp.astype(jnp.float32), axis=1, keepdims=True)
        else:
            denom = jnp.sum(p, axis=1, keepdims=True)
            p_lp = p.astype(v.dtype)
        pv = jax.lax.dot_general(
            p_lp, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return pv / jnp.where(denom == 0.0, 1.0, denom)

    if variant == "I":
        # two strips in flight: both matmuls issued before either softmax
        for q0 in range(0, bq, 2 * qc):
            q1 = q_ref[0, q0:q0 + qc, :]
            q2 = q_ref[0, q0 + qc:q0 + 2 * qc, :]
            s1 = jax.lax.dot_general(q1, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            s2 = jax.lax.dot_general(q2, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o_ref[0, q0:q0 + qc, :] = softmax_pv(s1).astype(o_ref.dtype)
            o_ref[0, q0 + qc:q0 + 2 * qc, :] = softmax_pv(s2).astype(o_ref.dtype)
    else:
        for q0 in range(0, bq, qc):
            q = q_ref[0, q0:q0 + qc, :]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, q0:q0 + qc, :] = softmax_pv(s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("variant",))
def onepass6(q, k, v, variant="base"):
    b, h, l, d = q.shape
    c = LOG2E / math.sqrt(d)
    n_bh = b * h
    qf = q.reshape(n_bh, l, d)
    kf = k.reshape(n_bh, l, d)
    vf = v.reshape(n_bh, l, d)
    out = pl.pallas_call(
        functools.partial(_kernel, c=c, variant=variant),
        grid=(n_bh, 1),
        in_specs=[
            pl.BlockSpec((1, l, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, l, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, l, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, l, d), lambda bh, qi: (bh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_bh, l, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(qf, kf, vf)
    return out.reshape(b, h, l, d)


def main():
    q, k, v = make_qkv(B, H, L, D, dtype=np.float32, seed=1)
    kd = jnp.asarray(k).astype(jnp.bfloat16)
    vd = jnp.asarray(v).astype(jnp.bfloat16)
    q0 = jnp.asarray(q).astype(jnp.bfloat16)
    flops = attention_flops(B, H, L, L, D)
    roof = roofline_attention_tflops(B, H, L, D)

    def report(name, fn):
        sec = time_fn_chained(fn, q0, n_long=16, n_short=4, reps=5)
        tf = flops / sec / 1e12
        print(f"{name:14s} {sec*1e3:7.3f} ms {tf:7.1f} TF {100*tf/roof:5.1f}%")

    report("prod-kernel", lambda x: flash_attention_v1(
        x, kd, vd, config=TileConfig(block_q=1024, block_kv=1024)))
    for var in ("base", "I", "P"):
        report(var, lambda x, var=var: onepass6(x, kd, vd, variant=var))


if __name__ == "__main__":
    main()
