"""Native C++ oracle/implementation vs the numpy oracle (via ctypes), plus
the self-validating driver binary (role of the reference driver.cu)."""

import pathlib
import subprocess

import numpy as np
import pytest

from exploring_flash_attention_tpu.oracle import native
from exploring_flash_attention_tpu.oracle.reference import (
    error_stats,
    make_qkv,
    naive_attention,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_oracle_matches_numpy():
    q, k, v = make_qkv(2, 2, 128, 64, dtype=np.float32, seed=0)
    out = native.naive_attention_native(q, k, v)
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 1e-5


def test_native_oracle_causal_cross_length():
    q, k, v = make_qkv(1, 2, 64, 64, dtype=np.float32, seq_len_kv=128, seed=1)
    out = native.naive_attention_native(q, k, v, causal=True)
    ref = naive_attention(q, k, v, causal=True)
    assert error_stats(out, ref)["max_abs"] < 1e-5


@pytest.mark.parametrize("bq,bk", [(16, 16), (64, 32), (100, 64)])
def test_native_flash_matches_oracle(bq, bk):
    q, k, v = make_qkv(1, 2, 200, 64, dtype=np.float32, seed=2)
    out = native.flash_attention_native(q, k, v, block_q=bq, block_kv=bk)
    assert error_stats(out, naive_attention(q, k, v))["max_abs"] < 1e-5


def test_driver_binary_pass_exit_code():
    driver = (
        pathlib.Path(__file__).resolve().parents[1]
        / "native" / "build" / "fa_driver"
    )
    res = subprocess.run(
        [str(driver), "1", "2", "128", "128", "32", "1", "1"],
        capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "PASS" in res.stdout
