"""ctypes bindings to the native C++ oracle library (native/fa_oracle.cpp).

Builds the shared library on demand (make, cached) and exposes the two
C-ABI entry points as numpy-facing functions.  This is the third
independent oracle (numpy f64, jnp, C++ OpenMP) — the cross-validation
breadth the reference maintains (SURVEY §4.4).
"""

from __future__ import annotations

import ctypes
import math
import pathlib
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libfa_oracle.so"
_lib = None


class NativeBuildError(RuntimeError):
    pass


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, text=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            out = getattr(e, "stderr", str(e))
            raise NativeBuildError(f"building libfa_oracle.so failed: {out}")
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.fa_naive_attention_f32.argtypes = [
        f32p, f32p, f32p, f32p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, ctypes.c_int,
    ]
    lib.fa_flash_attention_f32.argtypes = (
        lib.fa_naive_attention_f32.argtypes
        + [ctypes.c_int64, ctypes.c_int64]
    )
    lib.fa_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeBuildError:
        return False


def naive_attention_native(
    q: np.ndarray, k: np.ndarray, v: np.ndarray,
    scale: Optional[float] = None, causal: bool = False,
) -> np.ndarray:
    """C++ OpenMP oracle on [B, H, L, d] float32 arrays."""
    lib = _load()
    b, h, lq, d = q.shape
    lkv = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    qc = np.ascontiguousarray(q, np.float32)
    kc = np.ascontiguousarray(k, np.float32)
    vc = np.ascontiguousarray(v, np.float32)
    out = np.empty_like(qc)
    lib.fa_naive_attention_f32(
        qc, kc, vc, out, b, h, lq, lkv, d, scale, int(causal)
    )
    return out


def flash_attention_native(
    q: np.ndarray, k: np.ndarray, v: np.ndarray,
    scale: Optional[float] = None, causal: bool = False,
    block_q: int = 64, block_kv: int = 64,
) -> np.ndarray:
    """C++ online-softmax tiled implementation (the native ladder rung)."""
    lib = _load()
    b, h, lq, d = q.shape
    lkv = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    qc = np.ascontiguousarray(q, np.float32)
    kc = np.ascontiguousarray(k, np.float32)
    vc = np.ascontiguousarray(v, np.float32)
    out = np.empty_like(qc)
    lib.fa_flash_attention_f32(
        qc, kc, vc, out, b, h, lq, lkv, d, scale, int(causal),
        block_q, block_kv,
    )
    return out


def num_threads() -> int:
    return _load().fa_num_threads()
