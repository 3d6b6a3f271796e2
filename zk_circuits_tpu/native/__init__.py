"""ctypes loader for the native host runtime (native/libzknative.so).

The reference keeps all host numerics in native code (Rust crates
qp-plonky2{,-field}; SURVEY.md §2.1).  This module is our equivalent: it
loads the C++ library built from ``native/zknative.cpp`` and exposes
numpy-array wrappers.  Everything has a pure-numpy fallback at the call
sites — ``available()`` gates usage — so the package works without a
toolchain (and the golden model stays the source of truth for tests).

Set ``ZKT_NO_NATIVE=1`` to force the numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libzknative.so"

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", str(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=300,
        )
        return _SO.exists()
    except Exception:
        return False


def _load():
    global _lib
    if os.environ.get("ZKT_NO_NATIVE"):
        return None
    if not _SO.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64 = ctypes.c_int64
    lib.zkn_gl_add.argtypes = [u64p, u64p, u64p, i64]
    lib.zkn_gl_sub.argtypes = [u64p, u64p, u64p, i64]
    lib.zkn_gl_mul.argtypes = [u64p, u64p, u64p, i64]
    lib.zkn_gl_inv.argtypes = [u64p, u64p, i64]
    lib.zkn_gl_powers.argtypes = [ctypes.c_uint64, u64p, i64]
    lib.zkn_poseidon_permute.argtypes = [u64p, i64]
    lib.zkn_hash_leaves.argtypes = [u64p, i64, i64, ctypes.c_int, u64p]
    lib.zkn_compress_level.argtypes = [u64p, i64, u64p]
    lib.zkn_hash_no_pad_batch.argtypes = [u64p, i64, i64, u64p]
    lib.zkn_ntt.argtypes = [u64p, i64, i64, ctypes.c_int]
    lib.zkn_coset_lde.argtypes = [u64p, i64, i64, ctypes.c_int,
                                  ctypes.c_uint64, u64p]
    return lib


_lib = _load()


def available() -> bool:
    return _lib is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _c64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.uint64)


def gl_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise Goldilocks product of two equal-shape arrays."""
    x = _c64(a)
    y = _c64(b)
    out = np.empty(x.shape, dtype=np.uint64)
    _lib.zkn_gl_mul(_ptr(x), _ptr(y), _ptr(out), x.size)
    return out


def gl_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = _c64(a)
    y = _c64(b)
    out = np.empty(x.shape, dtype=np.uint64)
    _lib.zkn_gl_add(_ptr(x), _ptr(y), _ptr(out), x.size)
    return out


def gl_powers(base: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    _lib.zkn_gl_powers(ctypes.c_uint64(base % (2**64)), _ptr(out), n)
    return out


def poseidon_permute(states: np.ndarray) -> np.ndarray:
    """(n, 12) -> (n, 12) permuted (copy)."""
    s = _c64(states).copy()
    n = s.size // 12
    _lib.zkn_poseidon_permute(_ptr(s), n)
    return s.reshape(states.shape)


def hash_leaves(leaves: np.ndarray, or_noop: bool = True) -> np.ndarray:
    """(rows, cols) -> (rows, 4) digests (plonky2 leaf rule when or_noop)."""
    lv = _c64(leaves)
    rows, cols = lv.shape
    out = np.empty((rows, 4), dtype=np.uint64)
    _lib.zkn_hash_leaves(_ptr(lv), rows, cols, 1 if or_noop else 0, _ptr(out))
    return out


def compress_level(digests: np.ndarray) -> np.ndarray:
    """(2k, 4) -> (k, 4): pairwise two-to-one Poseidon compress."""
    d = _c64(digests)
    k = d.shape[0] // 2
    out = np.empty((k, 4), dtype=np.uint64)
    _lib.zkn_compress_level(_ptr(d), k, _ptr(out))
    return out


def hash_no_pad_batch(inputs: np.ndarray) -> np.ndarray:
    """(n, len) -> (n, 4)."""
    x = _c64(inputs)
    n, ln = x.shape
    out = np.empty((n, 4), dtype=np.uint64)
    _lib.zkn_hash_no_pad_batch(_ptr(x), n, ln, _ptr(out))
    return out


def ntt(data: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Batched (…, n) NTT/INTT along the last axis (natural order)."""
    x = _c64(data).copy()
    n = x.shape[-1]
    batch = x.size // n
    _lib.zkn_ntt(_ptr(x), batch, n, 1 if inverse else 0)
    return x


def coset_lde(coeffs: np.ndarray, rate_bits: int, shift: int) -> np.ndarray:
    """(…, n) coefficients -> (…, n << rate_bits) coset evaluations."""
    c = _c64(coeffs)
    n = c.shape[-1]
    batch = c.size // n
    m = n << rate_bits
    out = np.empty(c.shape[:-1] + (m,), dtype=np.uint64)
    _lib.zkn_coset_lde(_ptr(c), batch, n, rate_bits,
                       ctypes.c_uint64(shift % (2**64)), _ptr(out))
    return out
