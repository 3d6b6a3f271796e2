"""Goldilocks field: JAX limb kernels vs numpy host model vs Python ints."""

import numpy as np
import pytest

from zk_circuits_tpu.field import goldilocks as gfd
from zk_circuits_tpu.host import gl

P = gl.P_INT
RNG = np.random.default_rng(0)


def rand_felts(n):
    return RNG.integers(0, P, size=n, dtype=np.uint64)


EDGE = np.array([0, 1, 2, P - 1, P - 2, 2**32 - 1, 2**32, 2**32 + 1, P // 2], dtype=np.uint64)


def test_host_add_sub_mul_match_python():
    a = np.concatenate([rand_felts(64), EDGE])
    b = np.concatenate([rand_felts(64), EDGE[::-1]])
    ai, bi = a.astype(object), b.astype(object)
    assert np.all(gl.add(a, b) == ((ai + bi) % P).astype(np.uint64))
    assert np.all(gl.sub(a, b) == ((ai - bi) % P).astype(np.uint64))
    assert np.all(gl.mul(a, b) == ((ai * bi) % P).astype(np.uint64))
    assert np.all(gl.neg(a) == ((-ai) % P).astype(np.uint64))


def test_host_inverse():
    a = np.concatenate([rand_felts(16), EDGE[1:]])  # skip zero
    inv = gl.inverse(a)
    assert np.all(gl.mul(a, inv) == 1)
    assert gl.inverse(np.uint64(0)) == 0


def test_host_batch_inverse():
    a = rand_felts(10)
    assert np.all(gl.batch_inverse(a) == gl.inverse(a))


def test_host_roots_of_unity():
    for k in (0, 1, 4, 13, 32):
        w = gl.primitive_root_of_unity(k)
        assert pow(w, 2**k, P) == 1
        if k > 0:
            assert pow(w, 2 ** (k - 1), P) == P - 1


@pytest.mark.parametrize("op", ["add", "sub", "mul", "neg", "inverse"])
def test_device_matches_host(op):
    import jax

    a = np.concatenate([rand_felts(256), EDGE])
    b = np.concatenate([rand_felts(256), EDGE[::-1]])
    da, db = gfd.from_u64(a), gfd.from_u64(b)
    if op == "neg":
        got, want = gfd.to_u64(jax.jit(gfd.neg)(da)), gl.neg(a)
    elif op == "inverse":
        got, want = gfd.to_u64(jax.jit(gfd.inverse)(da)), gl.inverse(a)
    else:
        got = gfd.to_u64(jax.jit(getattr(gfd, op))(da, db))
        want = getattr(gl, op)(a, b)
    np.testing.assert_array_equal(got, want)


def test_device_mul_const_and_pow():
    a = rand_felts(32)
    da = gfd.from_u64(a)
    np.testing.assert_array_equal(gfd.to_u64(gfd.mul_const(da, 12345)), gl.mul(a, np.uint64(12345)))
    np.testing.assert_array_equal(gfd.to_u64(gfd.powmod(da, 7)), gl.powmod(a, 7))


def test_device_select_equal():
    a, b = rand_felts(16), rand_felts(16)
    da, db = gfd.from_u64(a), gfd.from_u64(b)
    mask = np.arange(16) % 2 == 0
    import jax.numpy as jnp

    got = gfd.to_u64(gfd.select(jnp.asarray(mask), da, db))
    np.testing.assert_array_equal(got, np.where(mask, a, b))
    assert bool(gfd.equal(da, da).all())
