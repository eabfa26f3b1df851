"""Test env: force an 8-device virtual CPU mesh so multi-chip sharding logic
runs without a pod, and so Pallas kernels exercise interpret mode.

NOTE: this environment's axon TPU plugin overrides the ``JAX_PLATFORMS``
env var, so the only reliable way to force CPU is ``jax.config.update``
immediately after import — before any backend is initialized by a test.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# ---- test tiers (VERDICT r4 item 9) ----
# `-m quick` is the <60s smoke tier: one representative per subsystem,
# biased to the fast paths.  Everything else is implicitly the `full`
# (merge-gate) tier; `pytest tests/` runs both.  Names, not durations,
# define the set so the tier is stable across machines.
_QUICK = {
    "test_oracle.py": {
        "test_oracle_softmax_rows_sum_to_one",
        "test_jax_oracle_matches_numpy_oracle",
        "test_check_accuracy_passes_and_fails",
        "test_oracle_matches_torch_sdpa",
    },
    "test_sim.py": {
        "test_tiled_matches_oracle_f32",
        "test_fused_equals_clean",
        "test_splitkv_matches_oracle",
        "test_combine_rule_associativity",
    },
    "test_attention_v1.py": {
        "test_v1_f32_small",
        "test_v1_causal",
        "test_v1_sliding_window",
        "test_v1_gqa_matches_repeated_kv",
        "test_onepass_fold_vmem_estimator_boundaries",
        "test_config_softmax_validation",
    },
    "test_attention_v2.py": {
        "test_v2_matches_oracle",
        "test_v2_partial_lse_is_logsumexp",
    },
    "test_attention_dtiled.py": {
        "test_dtiled_matches_oracle",
        "test_dtiled_rejects_bad_shapes",
    },
    "test_attention_bwd.py": {"test_bwd_matches_autodiff"},
    "test_attention_int8.py": {"test_int8_qk_bf16_pv_matches_dequant_oracle"},
    "test_quant.py": {
        "test_kvquant_attention_matches_dequant_oracle",
        "test_ragged_l_quantization",
    },
    "test_serving.py": {
        "test_cache_roundtrip_via_gather",
        "test_append_tokens_positions",
        "test_allocator_exhaustion_and_reuse",
    },
    "test_model.py": {"test_forward_shapes_and_causality"},
    "test_checkpoint.py": {"test_roundtrip_exact"},
    "test_native.py": {"test_native_oracle_matches_numpy"},
    "test_utils.py": {"test_roofline_model",
                      "test_time_fn_chained_calibration_positive"},
    "test_seq2seq.py": {"test_shapes_cross_length"},
    "test_parallel.py": set(),      # all shard_map tests are heavy
    "test_generate.py": set(),
    "test_speculative.py": set(),
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: <60s smoke tier (-m quick); see conftest _QUICK")


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.path.name if hasattr(item, "path") else ""
        base = item.name.split("[")[0]
        if base in _QUICK.get(fname, ()):  # noqa: SIM118
            item.add_marker(pytest.mark.quick)
