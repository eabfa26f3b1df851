#!/usr/bin/env python
"""VERDICT r3 item 9: why does the 65M encoder (MLM) train at ~72k
tokens/s while the same-geometry decoder trains at ~224k?

Ablation ladder, all timed with the calibrated chained protocol where the
step allows it (train steps carry their own params pytree, so they are
timed by the direct loop the suite uses, with a scalar pull per batch):

  decoder        — causal LM step (the suite's train_model_tokens entry)
  encoder        — MLM step as shipped
  encoder_fixed_rng — MLM step with the rng fixed (is host-side rng
                    split + per-step retrace/dispatch the cost?)
  encoder_causal — MLM loss but attention causal=True (isolates the
                    non-causal attention path: splitkv-partial forward
                    + dynamic-mask backward vs causal one-pass partial)
  encoder_fwd    — MLM loss forward only (no grad): fwd-path share
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.models import (
    ModelConfig, init_params, make_mlm_train_step, make_train_step,
)

cfg = ModelConfig(
    vocab_size=32768, n_layers=4, n_heads=8, n_kv_heads=4,
    d_model=1024, d_head=128, d_ff=4096, dtype=jnp.bfloat16,
    tile=TileConfig(block_q=512, block_kv=512),
)
bsz, seq = 8, 1024
rng0 = jax.random.PRNGKey(0)


def timeit(name, fn, n=12):
    fn()                       # compile + warm
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{name:22s} {dt*1e3:8.1f} ms/step  "
          f"{bsz*seq/dt:9.0f} tokens/s", flush=True)
    return dt


def main():
    params0 = init_params(cfg, seed=0)
    tokens_lm = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (bsz, seq + 1)),
        jnp.int32)
    tokens = tokens_lm[:, :seq]

    # decoder baseline
    dstep, dopt = make_train_step(cfg)
    dst = dopt.init(params0)
    state = {"p": params0, "s": dst}

    def run_dec():
        state["p"], state["s"], loss = dstep(state["p"], state["s"],
                                             tokens_lm)
        float(loss)
    timeit("decoder", run_dec)

    # encoder as shipped (per-step rng split like the suite entry)
    estep, eopt = make_mlm_train_step(cfg)
    est = eopt.init(params0)
    st = {"p": params0, "s": est, "rng": rng0}

    def run_enc():
        st["rng"], sub = jax.random.split(st["rng"])
        st["p"], st["s"], loss = estep(st["p"], st["s"], tokens, sub)
        float(loss)
    timeit("encoder", run_enc)

    # fixed rng (same jit, no host split)
    st2 = {"p": params0, "s": eopt.init(params0)}

    def run_enc_fixed():
        st2["p"], st2["s"], loss = estep(st2["p"], st2["s"], tokens, rng0)
        float(loss)
    timeit("encoder_fixed_rng", run_enc_fixed)

    # causal attention inside the same MLM loss (isolate attention path)
    import optax
    from exploring_flash_attention_tpu.models.encoder import mask_tokens
    from exploring_flash_attention_tpu.models.transformer import forward
    mtok = cfg.vocab_size - 1

    def mlm_causal_loss(params, tokens, rng):
        inputs, mask = mask_tokens(tokens, rng, mtok)
        logits = forward(params, inputs, cfg, causal=True)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, tokens)
        return jnp.sum(jnp.where(mask, ce, 0.0)) / jnp.maximum(
            jnp.sum(mask), 1)

    opt3 = optax.adamw(1e-3)
    st3 = {"p": params0, "s": opt3.init(params0)}

    @jax.jit
    def cstep(params, opt_state, tokens, rng):
        loss, grads = jax.value_and_grad(mlm_causal_loss)(
            params, tokens, rng)
        updates, opt_state = opt3.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def run_enc_causal():
        st3["p"], st3["s"], loss = cstep(st3["p"], st3["s"], tokens, rng0)
        float(loss)
    timeit("encoder_causal_attn", run_enc_causal)

    # forward only
    from exploring_flash_attention_tpu.models.encoder import mlm_loss

    @jax.jit
    def fwd_only(params, tokens, rng):
        return mlm_loss(params, tokens, rng, cfg, mtok, 0.15, None)

    def run_fwd():
        float(fwd_only(params0, tokens, rng0))
    timeit("encoder_fwd_only", run_fwd)

    @jax.jit
    def fwd_only_causal(params, tokens, rng):
        return mlm_causal_loss(params, tokens, rng)

    def run_fwd_c():
        float(fwd_only_causal(params0, tokens, rng0))
    timeit("encoder_fwd_causal", run_fwd_c)


if __name__ == "__main__":
    main()
