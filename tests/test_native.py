"""Native (C++) host runtime parity vs the numpy golden model.

The native library (native/zknative.cpp, loaded via ctypes in
zk_circuits_tpu.native) re-implements the host-side hot paths — Goldilocks
ops, Poseidon, Merkle hashing, NTT/LDE — and must be bit-identical to the
numpy model that is itself validated against the reference golden vectors.
"""

import numpy as np
import pytest

from zk_circuits_tpu import native
from zk_circuits_tpu.host import gl, poseidon as hp
from zk_circuits_tpu.ntt import ntt as nttm

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)

RNG = np.random.default_rng(0xC0FFEE)


def _felts(*shape):
    return RNG.integers(0, gl.P_INT, shape, dtype=np.uint64)


def test_field_ops_match_numpy():
    a, b = _felts(4096), _felts(4096)
    import ctypes
    out = np.empty_like(a)
    native._lib.zkn_gl_add(native._ptr(a), native._ptr(b), native._ptr(out), a.size)
    np.testing.assert_array_equal(out, gl.add(a, b))
    native._lib.zkn_gl_mul(native._ptr(a), native._ptr(b), native._ptr(out), a.size)
    np.testing.assert_array_equal(out, gl.mul(a, b))
    native._lib.zkn_gl_sub(native._ptr(a), native._ptr(b), native._ptr(out), a.size)
    np.testing.assert_array_equal(out, gl.sub(a, b))


def test_field_edge_cases():
    edge = np.array([0, 1, gl.P_INT - 1, gl.P_INT - 2, 0xFFFFFFFF,
                     1 << 32, (1 << 63) + 5], dtype=np.uint64)
    a = np.repeat(edge, edge.size)
    b = np.tile(edge, edge.size)
    out = np.empty_like(a)
    native._lib.zkn_gl_mul(native._ptr(a), native._ptr(b), native._ptr(out), a.size)
    np.testing.assert_array_equal(out, gl.mul(a, b))
    native._lib.zkn_gl_add(native._ptr(a), native._ptr(b), native._ptr(out), a.size)
    np.testing.assert_array_equal(out, gl.add(a, b))


def test_poseidon_permute_matches_golden():
    states = _felts(64, 12)
    expected = np.stack([hp.permute(s.copy()) for s in states])
    np.testing.assert_array_equal(native.poseidon_permute(states), expected)


def test_hash_no_pad_batch_matches_golden():
    x = _felts(16, 135)
    expected = np.stack([hp.hash_no_pad(r) for r in x])
    np.testing.assert_array_equal(native.hash_no_pad_batch(x), expected)


def test_hash_leaves_or_noop_rule():
    # cols <= 4: identity zero-pad (plonky2 Merkle leaf rule)
    small = _felts(8, 3)
    got = native.hash_leaves(small, or_noop=True)
    np.testing.assert_array_equal(got[:, :3], small)
    np.testing.assert_array_equal(got[:, 3], np.zeros(8, np.uint64))
    # cols > 4: hash
    big = _felts(8, 7)
    expected = np.stack([hp.hash_no_pad(r) for r in big])
    np.testing.assert_array_equal(native.hash_leaves(big, or_noop=True), expected)


def test_compress_level_matches_golden():
    d = _felts(16, 4)
    expected = np.stack([hp.compress(d[2 * i], d[2 * i + 1]) for i in range(8)])
    np.testing.assert_array_equal(native.compress_level(d), expected)


@pytest.mark.parametrize("n", [8, 256, 1 << 12])
def test_ntt_round_trip_and_parity(n):
    c = _felts(3, n)
    np.testing.assert_array_equal(native.ntt(c), nttm.host_ntt(c))
    np.testing.assert_array_equal(native.ntt(native.ntt(c), inverse=True), c)


def test_coset_lde_matches_golden():
    c = _felts(5, 256)
    np.testing.assert_array_equal(
        native.coset_lde(c, 3, gl.MULTIPLICATIVE_GROUP_GENERATOR),
        nttm.host_lde(c, 3),
    )


# ---------------------------------------------------------------------------
# Dispatch-layer parity: gl.mul/add/powers route large arrays to native;
# pin that both routes agree (incl. non-canonical u64 inputs + broadcasting).
# ---------------------------------------------------------------------------


def _full_range_u64(*shape):
    return RNG.integers(0, 2**64, shape, dtype=np.uint64)


@pytest.mark.parametrize("n", [100, gl._NATIVE_MUL_MIN, 4 * gl._NATIVE_MUL_MIN])
def test_mul_dispatch_parity(n):
    a, b = _full_range_u64(n), _full_range_u64(n)
    np.testing.assert_array_equal(gl.mul(a, b), gl._mul_np(a, b))


def test_mul_dispatch_broadcast_shapes():
    a = _full_range_u64(256, 64)
    b = _full_range_u64(64)          # broadcast along axis 0
    np.testing.assert_array_equal(gl.mul(a, b), gl._mul_np(a, b))
    s = np.uint64(RNG.integers(0, 2**64, dtype=np.uint64))  # scalar x array
    np.testing.assert_array_equal(gl.mul(s, a), gl._mul_np(s, a))


@pytest.mark.parametrize("n", [100, 4 * gl._NATIVE_MUL_MIN])
def test_add_dispatch_parity(n):
    a, b = _full_range_u64(n), _full_range_u64(n)
    np.testing.assert_array_equal(gl.add(a, b), gl._add_np(a, b))


@pytest.mark.parametrize("n", [1, 100, gl._NATIVE_MUL_MIN, 3 * gl._NATIVE_MUL_MIN])
def test_powers_matches_sequential_recurrence(n):
    base = int(RNG.integers(1, gl.P_INT, dtype=np.uint64))
    got = gl.powers(base, n)
    acc, expect = 1, np.empty(n, dtype=np.uint64)
    for i in range(n):
        expect[i] = acc
        acc = (acc * base) % gl.P_INT
    np.testing.assert_array_equal(got, expect)
