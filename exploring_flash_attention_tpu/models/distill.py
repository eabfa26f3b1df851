"""Draft-model distillation for speculative decoding.

A speculative draft only pays for itself when its argmax agrees with the
target often enough (acceptance ~0.3+); a random-init draft sits at the
1/vocab floor.  This module closes the loop the serving stack needs: it
distills a small draft against the TARGET'S OWN behavior so the
acceptance rate — and therefore the speedup — is a property the
framework can manufacture, not hope for.

Recipe (matched to the greedy acceptance rule in models/speculative.py):
  1. sample sequences from the target itself (greedy continuations of
     random prompts through the paged GenerationEngine) — the exact
     distribution the draft will be verified on;
  2. label every position with the target's argmax (for the generated
     suffix that IS the next token; for prompt positions it comes from
     one target forward);
  3. train the draft with cross-entropy against those hard labels
     (greedy acceptance is argmax agreement — soft-label KL optimizes a
     looser objective) under Adam.

The whole pipeline is a few hundred jitted steps — minutes on one chip.
No counterpart exists in the reference (it has no serving or training
stack); this is serving-tier scope from SURVEY §2.6 / BASELINE.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from exploring_flash_attention_tpu.models.transformer import (
    ModelConfig,
    Params,
    forward,
)


def target_labeled_corpus(
    tparams: Params,
    tcfg: ModelConfig,
    n_seqs: int = 32,
    prompt_len: int = 32,
    seq_len: int = 256,
    seed: int = 0,
    interpret: Optional[bool] = None,
    prompts: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(tokens [N, L], labels [N, L]) — target-generated sequences with
    per-position target-argmax labels (labels[i, t] = target argmax given
    tokens[i, :t+1]).  ``prompts`` [n_seqs, prompt_len] overrides the
    uniform-random default so the corpus matches the deployment prompt
    distribution (acceptance is a property OF a distribution)."""
    from exploring_flash_attention_tpu.models.generate import (
        GenerationEngine,
    )

    rng = np.random.default_rng(seed)
    if prompts is None:
        prompts = jnp.asarray(
            rng.integers(0, tcfg.vocab_size, (n_seqs, prompt_len)),
            jnp.int32)
    else:
        n_seqs, prompt_len = prompts.shape
    eng = GenerationEngine(tparams, tcfg, max_seqs=n_seqs,
                           max_len=max(seq_len + 8, 2 * seq_len),
                           interpret=interpret)
    toks = eng.generate(prompts, max_new_tokens=seq_len - prompt_len)
    tokens = jnp.concatenate([prompts, toks], axis=1)[:, :seq_len]
    logits = forward(tparams, tokens, tcfg, interpret=interpret)
    labels = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return tokens, labels


def distill_draft(
    tparams: Params,
    tcfg: ModelConfig,
    dparams: Params,
    dcfg: ModelConfig,
    steps: int = 300,
    batch: int = 16,
    n_seqs: int = 32,
    prompt_len: int = 32,
    seq_len: int = 256,
    lr: float = 1e-3,
    seed: int = 0,
    interpret: Optional[bool] = None,
    prompts: Optional[jax.Array] = None,
) -> Tuple[Params, dict]:
    """Distill ``dparams`` toward the target's argmax behavior.

    Returns the trained draft params and a stats dict with the initial /
    final batch agreement rate (the quantity greedy speculative
    acceptance tracks)."""
    tokens, labels = target_labeled_corpus(
        tparams, tcfg, n_seqs=n_seqs, prompt_len=prompt_len,
        seq_len=seq_len, seed=seed, interpret=interpret, prompts=prompts)

    opt = optax.adam(lr)
    opt_state = opt.init(dparams)

    def ce(params, tok, lab):
        logits = forward(params, tok, dcfg, interpret=interpret)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]
        agree = jnp.mean(jnp.argmax(logits, axis=-1) == lab)
        return jnp.mean(nll), agree

    @jax.jit
    def step(params, opt_state, tok, lab):
        (loss, agree), grads = jax.value_and_grad(
            ce, has_aux=True)(params, tok, lab)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, agree

    rng = np.random.default_rng(seed + 1)
    n = tokens.shape[0]
    first_agree = last_agree = None
    for s in range(steps):
        idx = jnp.asarray(rng.integers(0, n, (min(batch, n),)), jnp.int32)
        dparams, opt_state, loss, agree = step(
            dparams, opt_state, tokens[idx], labels[idx])
        if s == 0:
            first_agree = float(agree)
    last_agree = float(agree)
    return dparams, {"agree_first": first_agree, "agree_last": last_agree,
                     "loss_last": float(loss), "steps": steps}
