"""NTT/LDE: host vs naive DFT, device vs host, sharded (8-device mesh) vs host."""

import numpy as np
import pytest

from zk_circuits_tpu.field import goldilocks as gfd
from zk_circuits_tpu.host import gl
from zk_circuits_tpu.ntt import ntt as nttm

RNG = np.random.default_rng(7)


def naive_dft(coeffs):
    n = len(coeffs)
    w = gl.primitive_root_of_unity(n.bit_length() - 1)
    out = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        acc = 0
        x = pow(w, i, gl.P_INT)
        for c in reversed(coeffs.tolist()):
            acc = (acc * x + int(c)) % gl.P_INT
        out[i] = acc
    return out


@pytest.mark.parametrize("n", [1, 2, 8, 64, 256])
def test_host_ntt_matches_naive(n):
    coeffs = RNG.integers(0, gl.P_INT, size=n, dtype=np.uint64)
    np.testing.assert_array_equal(nttm.host_ntt(coeffs), naive_dft(coeffs))


def test_host_intt_round_trip():
    coeffs = RNG.integers(0, gl.P_INT, size=(3, 128), dtype=np.uint64)
    np.testing.assert_array_equal(nttm.host_intt(nttm.host_ntt(coeffs)), coeffs)


def test_host_coset_round_trip_and_semantics():
    n = 64
    coeffs = RNG.integers(0, gl.P_INT, size=n, dtype=np.uint64)
    vals = nttm.host_coset_ntt(coeffs)
    # value[i] = p(g * w^i)
    w = gl.primitive_root_of_unity(6)
    for i in (0, 1, 5, 63):
        x = (7 * pow(w, i, gl.P_INT)) % gl.P_INT
        expect = 0
        for c in reversed(coeffs.tolist()):
            expect = (expect * x + int(c)) % gl.P_INT
        assert vals[i] == expect
    np.testing.assert_array_equal(nttm.host_coset_intt(vals), coeffs)


def test_host_lde():
    n, rate = 32, 3
    coeffs = RNG.integers(0, gl.P_INT, size=n, dtype=np.uint64)
    ext = nttm.host_lde(coeffs, rate)
    assert ext.shape == (n << rate,)
    # LDE agrees with the polynomial on the large coset.
    w = gl.primitive_root_of_unity(8)
    x = (7 * pow(w, 17, gl.P_INT)) % gl.P_INT
    expect = 0
    for c in reversed(coeffs.tolist()):
        expect = (expect * x + int(c)) % gl.P_INT
    assert ext[17] == expect


def test_device_matches_host():
    import functools

    import jax

    coeffs = RNG.integers(0, gl.P_INT, size=(5, 256), dtype=np.uint64)
    d = gfd.from_u64(coeffs)
    np.testing.assert_array_equal(gfd.to_u64(jax.jit(nttm.ntt)(d)), nttm.host_ntt(coeffs))
    np.testing.assert_array_equal(gfd.to_u64(jax.jit(nttm.intt)(d)), nttm.host_intt(coeffs))
    np.testing.assert_array_equal(
        gfd.to_u64(jax.jit(nttm.coset_ntt)(d)), nttm.host_coset_ntt(coeffs)
    )
    np.testing.assert_array_equal(
        gfd.to_u64(jax.jit(functools.partial(nttm.lde, rate_bits=3))(d)),
        nttm.host_lde(coeffs, 3),
    )


def test_sharded_ntt_matches_host():
    import jax

    from zk_circuits_tpu.parallel import mesh as meshm
    from zk_circuits_tpu.parallel import ntt_sharded as sntt

    mesh = meshm.make_mesh()
    assert mesh.shape["x"] == 8
    n = 1024
    coeffs = RNG.integers(0, gl.P_INT, size=n, dtype=np.uint64)
    d = gfd.from_u64(coeffs)
    d = jax.device_put(d, meshm.shard_last(mesh, 1))
    got = gfd.to_u64(sntt.ntt_sharded(d, mesh))
    np.testing.assert_array_equal(got, nttm.host_ntt(coeffs))


def test_sharded_lde_matches_host():
    import jax

    from zk_circuits_tpu.parallel import mesh as meshm
    from zk_circuits_tpu.parallel import ntt_sharded as sntt

    mesh = meshm.make_mesh()
    n, rate = 256, 3
    coeffs = RNG.integers(0, gl.P_INT, size=n, dtype=np.uint64)
    d = jax.device_put(gfd.from_u64(coeffs), meshm.shard_last(mesh, 1))
    got = gfd.to_u64(sntt.coset_lde_sharded(d, rate, mesh))
    np.testing.assert_array_equal(got, nttm.host_lde(coeffs, rate))

    batch = RNG.integers(0, gl.P_INT, size=(8, 64), dtype=np.uint64)
    db = jax.device_put(gfd.from_u64(batch), meshm.shard_batch(mesh, 2))
    got = gfd.to_u64(sntt.lde_batch_sharded(db, rate, mesh))
    np.testing.assert_array_equal(got, nttm.host_lde(batch, rate))


def test_sharded_intt_matches_host():
    """Regression: the inverse four-step must use the inverse-root local row
    transform (forward row NTT + local index reversal) — caught producing
    forward-twiddle garbage in round 2."""
    import jax

    from zk_circuits_tpu.parallel import mesh as meshm
    from zk_circuits_tpu.parallel import ntt_sharded as sntt

    mesh = meshm.make_mesh()
    n = 1024
    values = RNG.integers(0, gl.P_INT, size=n, dtype=np.uint64)
    d = jax.device_put(gfd.from_u64(values), meshm.shard_last(mesh, 1))
    got = gfd.to_u64(sntt.intt_sharded(d, mesh))
    np.testing.assert_array_equal(got, nttm.host_intt(values))
    # round trip through the sharded forward transform
    d2 = jax.device_put(gfd.from_u64(nttm.host_ntt(values)),
                        meshm.shard_last(mesh, 1))
    back = gfd.to_u64(sntt.intt_sharded(d2, mesh))
    np.testing.assert_array_equal(back, values)
