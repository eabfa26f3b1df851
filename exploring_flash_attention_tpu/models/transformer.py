"""Flagship model: a decoder-only transformer LM built on the flash
attention engine, with a Megatron-style manual-SPMD training step.

The reference has no model stack (SURVEY: "no training loop, no model
code"); this is the framework's demonstration vehicle: every attention call
is the Pallas kernel (differentiable via ops/attention_vjp.py), and the
training step shards over a (dp, tp, sp) mesh inside one ``shard_map``:

- dp: batch sharding, gradient all-mean over dp (+ sp);
- tp: heads (attention) and FFN columns Megatron-sharded, with the f/g
  conjugate all-reduce operators (models/parallel_layers.py);
- sp: sequence sharding of activations; attention runs the differentiable
  ring (parallel/ring.py:ring_flash_attention — K/V shards rotate over ICI,
  O(L_local) memory both passes, the scalable default) or, optionally, the
  all-gather path (K/V gathered over sp, O(L_global) memory — only viable
  at short L; ``ModelConfig.sp_attn``).

Architecture: pre-RMSNorm, GQA-capable attention, SwiGLU FFN, tied
embeddings.  Pure-functional params pytree + optax optimizer.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exploring_flash_attention_tpu.configs import TileConfig
from exploring_flash_attention_tpu.models.parallel_layers import (
    f_tp,
    g_tp,
    gather_seq,
)
from exploring_flash_attention_tpu.ops.attention_vjp import flash_attention
from exploring_flash_attention_tpu.parallel.ring import ring_flash_attention
from exploring_flash_attention_tpu.parallel.ulysses import (
    ulysses_flash_attention,
)
from exploring_flash_attention_tpu.parallel.window import sp_window_attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 4096
    n_layers: int = 2
    n_heads: int = 8
    n_kv_heads: int = 8
    d_model: int = 512
    d_head: int = 64
    d_ff: int = 1024
    dtype: Any = jnp.float32
    tile: TileConfig = TileConfig(block_q=128, block_kv=128)
    norm_eps: float = 1e-5
    use_rope: bool = True
    rope_theta: float = 10000.0
    # sequence-parallel attention strategy: "ring" rotates K/V shards over
    # ICI (O(L_local) memory, scales to the 128K tier); "allgather" gathers
    # the full K/V per layer (O(L_global) — short sequences only)
    sp_attn: str = "ring"
    # sliding-window (local) attention width for every layer; None = full
    # causal.  Trains through the banded one-pass fwd + banded bwd
    # (O(L*window) attention cost).  Composes with sequence parallelism
    # via the one-hop neighbor-tail exchange (parallel/window.py) when
    # window <= L_local.
    window: Optional[int] = None

    def __post_init__(self):
        if self.n_heads % self.n_kv_heads:
            raise ValueError("n_heads must be divisible by n_kv_heads")
        if self.use_rope and self.d_head % 2:
            raise ValueError("RoPE needs an even d_head")
        if self.sp_attn not in ("ring", "allgather"):
            raise ValueError(f"unknown sp_attn {self.sp_attn!r}")
        if self.window is not None and self.window < 1:
            raise ValueError(f"window must be >= 1, got {self.window}")


def init_params(config: ModelConfig, seed: int = 0) -> Params:
    rng = np.random.default_rng(seed)
    c = config

    def dense(*shape):
        std = 1.0 / np.sqrt(shape[0])
        return jnp.asarray(
            rng.normal(0.0, std, shape), dtype=c.dtype
        )

    layers = []
    for _ in range(c.n_layers):
        layers.append({
            "ln1": jnp.ones((c.d_model,), c.dtype),
            "wq": dense(c.d_model, c.n_heads, c.d_head),
            "wk": dense(c.d_model, c.n_kv_heads, c.d_head),
            "wv": dense(c.d_model, c.n_kv_heads, c.d_head),
            "wo": dense(c.n_heads * c.d_head, c.d_model).reshape(
                c.n_heads, c.d_head, c.d_model),
            "ln2": jnp.ones((c.d_model,), c.dtype),
            "w_gate": dense(c.d_model, c.d_ff),
            "w_up": dense(c.d_model, c.d_ff),
            "w_down": dense(c.d_ff, c.d_model),
        })
    return {
        "embed": jnp.asarray(
            rng.normal(0.0, 0.02, (c.vocab_size, c.d_model)), dtype=c.dtype
        ),
        "ln_f": jnp.ones((c.d_model,), c.dtype),
        "layers": layers,
    }


def rope(x, pos, theta: float):
    """Rotary position embedding.  x: [..., L, d] (d even); pos: int32
    positions broadcastable to x's [..., L] prefix (a scalar offset plus
    arange, or per-row positions for decode)."""
    d = x.shape[-1]
    half = d // 2
    freqs = theta ** (
        -jnp.arange(half, dtype=jnp.float32) / half
    )                                                   # [half]
    ang = pos[..., None].astype(jnp.float32) * freqs    # [..., L, half]
    cos = jnp.cos(ang).astype(x.dtype)
    sin = jnp.sin(ang).astype(x.dtype)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    )


def _rmsnorm(x, scale, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps).astype(x.dtype)) * scale


def _attn_block(
    p, x, config: ModelConfig,
    tp_axis: Optional[str], sp_axis: Optional[str],
    interpret: Optional[bool],
    causal: bool = True,
):
    """x: [B, L_local, E] (E replicated over tp; L sharded over sp)."""
    c = config
    b, l_local, _ = x.shape
    h = _rmsnorm(x, p["ln1"], c.norm_eps)
    # Megatron f sits BETWEEN the (replicated) norm and the column-parallel
    # projections: the norm scale's gradient is then computed from the
    # already-psum'd cotangent instead of one shard's slice of it
    if tp_axis is not None:
        h = f_tp(h, tp_axis)
    q = jnp.einsum("ble,ehd->bhld", h, p["wq"])        # heads local to tp
    k = jnp.einsum("ble,ehd->bhld", h, p["wk"])
    v = jnp.einsum("ble,ehd->bhld", h, p["wv"])

    if c.use_rope:
        # rotate at GLOBAL positions (sp shards sit at traced offsets);
        # k is rotated before the sequence gather so gathered keys carry
        # their source-shard rotations
        pos0 = (jax.lax.axis_index(sp_axis) * l_local
                if sp_axis is not None else 0)
        pos = pos0 + jnp.arange(l_local, dtype=jnp.int32)
        q = rope(q, pos, c.rope_theta)
        k = rope(k, pos, c.rope_theta)

    # GQA: the kernels share the KV head across each q-head group natively
    # (BlockSpec bh // group) — no repeated KV is materialized

    if not causal and c.window is not None:
        raise NotImplementedError(
            "windows are causal-only (encoder models use window=None)")
    if not causal and sp_axis is not None:
        # bidirectional x sequence-parallel: Ulysses all-to-all — heads
        # scatter over sp, each shard runs a COMPLETE non-causal softmax
        # at full context (no partial-merge numerics), then the inverse
        # all-to-all restores the sequence sharding.  When the tp-local
        # head count can't split over sp, fall back to the all-gather
        # path (O(L_global) KV per chip — fine at encoder lengths).
        sp_size = jax.lax.axis_size(sp_axis)
        if q.shape[1] % sp_size == 0 and k.shape[1] % sp_size == 0:
            o = ulysses_flash_attention(
                q, k, v, sp_axis, c.tile, None, False, interpret
            )                                           # [B, H, Ll, dh]
        else:
            kg = gather_seq(k, sp_axis, 2)
            vg = gather_seq(v, sp_axis, 2)
            o = flash_attention(
                q, kg, vg, config=c.tile, causal=False, interpret=interpret,
            )
    elif sp_axis is not None and c.window is not None:
        # windowed x sequence-parallel: one-hop neighbor-tail exchange,
        # O(window/L_global) of the ring's communication volume
        o = sp_window_attention(
            q, k, v, sp_axis, c.window, c.tile, None, interpret
        )                                               # [B, H, Ll, dh]
    elif sp_axis is not None and c.sp_attn == "ring":
        # differentiable ring: K/V shards rotate over ICI, every chip keeps
        # O(L_local) memory in forward AND backward — the sp strategy that
        # survives the L=128K tier
        o = ring_flash_attention(
            q, k, v, sp_axis, c.tile, None, True, interpret
        )                                               # [B, H, Ll, dh]
    else:
        if sp_axis is not None:
            # all-gather fallback: keep Q local, gather K/V (fwd
            # all-gather, bwd reduce-scatter), causal-mask at this shard's
            # global offset.  O(L_global) KV per chip.
            k = gather_seq(k, sp_axis, 2)
            v = gather_seq(v, sp_axis, 2)
            q_pos0 = jax.lax.axis_index(sp_axis) * l_local
            positions = (q_pos0, jnp.int32(0))
        else:
            positions = None
        o = flash_attention(
            q, k, v, config=c.tile, causal=causal, interpret=interpret,
            positions=positions if causal else None, window=c.window,
        )                                               # [B, H, Ll, dh]
    out = jnp.einsum("bhld,hde->ble", o.astype(x.dtype), p["wo"])
    if tp_axis is not None:
        out = g_tp(out, tp_axis)                        # row-parallel reduce
    return out


def _mlp_block(p, x, config: ModelConfig, tp_axis: Optional[str]):
    h = _rmsnorm(x, p["ln2"], config.norm_eps)
    if tp_axis is not None:
        h = f_tp(h, tp_axis)          # norm grad needs the tp-summed cotangent
    gate = jnp.einsum("ble,ef->blf", h, p["w_gate"])
    up = jnp.einsum("ble,ef->blf", h, p["w_up"])
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    out = jnp.einsum("blf,fe->ble", act, p["w_down"])
    if tp_axis is not None:
        out = g_tp(out, tp_axis)
    return out


def forward(
    params: Params,
    tokens: jax.Array,            # [B, L_local] int32
    config: ModelConfig,
    tp_axis: Optional[str] = None,
    sp_axis: Optional[str] = None,
    interpret: Optional[bool] = None,
    causal: bool = True,
) -> jax.Array:
    """Logits [B, L_local, V].  Callable single-device (axes=None) or
    inside shard_map with tp/sp axis names.  ``causal=False`` runs the
    same stack bidirectionally (encoder models) — under sp through the
    Ulysses all-to-all (parallel/ulysses.py)."""
    x = params["embed"][tokens].astype(config.dtype)
    for p in params["layers"]:
        x = x + _attn_block(p, x, config, tp_axis, sp_axis,
                            interpret, causal=causal)
        x = x + _mlp_block(p, x, config, tp_axis)
    x = _rmsnorm(x, params["ln_f"], config.norm_eps)
    return jnp.einsum(
        "ble,ve->blv", x, params["embed"].astype(config.dtype)
    ).astype(jnp.float32)


def loss_fn(
    params: Params,
    inputs: jax.Array,            # [B, L_local]
    targets: jax.Array,           # [B, L_local]
    config: ModelConfig,
    tp_axis: Optional[str] = None,
    sp_axis: Optional[str] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    logits = forward(params, inputs, config, tp_axis, sp_axis, interpret)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    return jnp.mean(ce)


def make_train_step(
    config: ModelConfig,
    mesh: Optional[Mesh] = None,
    learning_rate: float = 1e-3,
    interpret: Optional[bool] = None,
    optimizer=None,
):
    """Returns (train_step, optimizer_init).

    With a mesh: the full step (fwd + bwd + optimizer) runs inside one
    shard_map over (dp, tp, sp); tokens arrive [B, L+1] sharded over dp on
    batch, and each sp shard consumes its L/sp slice.  Params are
    tp-sharded on their head/FFN axes (see param_spec)."""
    opt = optimizer if optimizer is not None else optax.adamw(learning_rate)

    if mesh is None:
        @jax.jit
        def train_step(params, opt_state, tokens):
            inputs, targets = tokens[:, :-1], tokens[:, 1:]
            loss, grads = jax.value_and_grad(loss_fn)(
                params, inputs, targets, config, None, None, interpret
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train_step, opt

    dp, tp, sp = (mesh.shape[a] for a in ("dp", "tp", "sp"))

    def local_step(params, opt_state, tokens):
        # tokens: [B/dp, L+1] (replicated over tp, sp)
        l_total = tokens.shape[1] - 1
        l_local = l_total // sp
        sp_idx = jax.lax.axis_index("sp")
        start = sp_idx * l_local
        inputs = jax.lax.dynamic_slice_in_dim(tokens, start, l_local, 1)
        targets = jax.lax.dynamic_slice_in_dim(tokens, start + 1, l_local, 1)

        def local_loss(params):
            return loss_fn(
                params, inputs, targets, config, "tp", "sp", interpret
            )

        loss, grads = jax.value_and_grad(local_loss)(params)
        # data-axis gradient mean (dp and sp both shard the token stream)
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(g, ("dp", "sp")), grads
        )
        loss = jax.lax.pmean(loss, ("dp", "sp"))
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    pspec = param_spec(config)
    ospec = opt_state_spec(config, opt)

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspec, ospec, P("dp", None)),
        out_specs=(pspec, ospec, P()),
        check_vma=False,
    )
    return jax.jit(sharded), opt


def param_spec(config: ModelConfig) -> Params:
    """PartitionSpecs: heads/FFN columns over tp, the rest replicated."""
    layer = {
        "ln1": P(), "ln2": P(),
        "wq": P(None, "tp", None),
        "wk": P(None, "tp", None),
        "wv": P(None, "tp", None),
        "wo": P("tp", None, None),
        "w_gate": P(None, "tp"),
        "w_up": P(None, "tp"),
        "w_down": P("tp", None),
    }
    return {
        "embed": P(),
        "ln_f": P(),
        "layers": [dict(layer) for _ in range(config.n_layers)],
    }


def opt_state_spec_from(pspec: Any, params_shape: Any, opt) -> Any:
    """PartitionSpecs for an optax state: per-param moments (mu/nu)
    mirror the param sharding, scalars replicate."""
    state_shape = jax.eval_shape(opt.init, params_shape)

    def make(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=P(), mu=pspec, nu=pspec)
        if isinstance(s, optax.EmptyState):
            return optax.EmptyState()
        return s

    return tuple(make(s) for s in state_shape)


def opt_state_spec(config: ModelConfig, opt) -> Any:
    """Optimizer state mirrors param sharding (mu/nu per-param)."""
    params_shape = jax.eval_shape(lambda: init_params(config))
    return opt_state_spec_from(param_spec(config), params_shape, opt)


def shard_params(params: Params, mesh: Mesh, config: ModelConfig) -> Params:
    spec = param_spec(config)
    p_leaves, treedef = jax.tree.flatten(params)
    s_leaves = jax.tree.flatten(spec, is_leaf=lambda s: isinstance(s, P))[0]
    placed = [
        jax.device_put(x, NamedSharding(mesh, s))
        for x, s in zip(p_leaves, s_leaves)
    ]
    return jax.tree.unflatten(treedef, placed)
