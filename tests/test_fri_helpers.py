"""Unit tests for the vectorized FRI polynomial helpers.

divide_by_linear and ext_powers were rewritten from sequential recurrences
into log-step vectorized forms (fri/fri.py, fri/oracle.py); pin them
against the textbook loops they replaced.
"""

import numpy as np

from zk_circuits_tpu.fri.fri import divide_by_linear
from zk_circuits_tpu.fri.oracle import ext_powers
from zk_circuits_tpu.host import gl, gle


def _naive_divide_by_linear(coeffs: np.ndarray, z: np.ndarray) -> np.ndarray:
    n = coeffs.shape[0]
    q = np.zeros((n - 1, 2), dtype=np.uint64) if n > 1 else np.zeros((0, 2), np.uint64)
    acc = coeffs[n - 1].copy()
    for i in range(n - 2, -1, -1):
        q[i] = acc
        acc = gle.add(gle.mul(acc, z), coeffs[i])
    return q


def _naive_ext_powers(zeta: np.ndarray, n: int) -> np.ndarray:
    out = np.empty((n, 2), dtype=np.uint64)
    acc = gle.ONE.copy()
    for i in range(n):
        out[i] = acc
        acc = gle.mul(acc, zeta)
    return out


def _rand_ext(rng, shape=()):
    return rng.integers(0, gl.P_INT, size=shape + (2,), dtype=np.uint64)


def test_ext_powers_matches_naive():
    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 5, 8, 33, 100, 256):
        z = _rand_ext(rng)
        np.testing.assert_array_equal(ext_powers(z, n), _naive_ext_powers(z, n))


def test_divide_by_linear_matches_naive():
    rng = np.random.default_rng(8)
    for n in (1, 2, 3, 17, 64, 200):
        coeffs = _rand_ext(rng, (n,))
        z = _rand_ext(rng)
        np.testing.assert_array_equal(
            divide_by_linear(coeffs, z), _naive_divide_by_linear(coeffs, z)
        )


def test_divide_by_linear_zero_point():
    rng = np.random.default_rng(9)
    coeffs = _rand_ext(rng, (32,))
    z = np.zeros(2, dtype=np.uint64)
    np.testing.assert_array_equal(
        divide_by_linear(coeffs, z), _naive_divide_by_linear(coeffs, z)
    )


def test_divide_by_linear_is_exact_division():
    # (X - z) * Q(X) + P(z) == P(X)
    rng = np.random.default_rng(10)
    n = 50
    coeffs = _rand_ext(rng, (n,))
    z = _rand_ext(rng)
    q = divide_by_linear(coeffs, z)
    # multiply back: (X - z) * Q
    prod = np.zeros((n, 2), dtype=np.uint64)
    prod[1:] = q                       # X * Q
    prod[:-1] = gle.sub(prod[:-1], gle.mul(q, np.broadcast_to(z, (n - 1, 2))))
    # add remainder P(z) to the constant term
    from zk_circuits_tpu.fri.fri import eval_ext_poly

    pz = eval_ext_poly(coeffs, z)
    prod[0] = gle.add(prod[0], pz)
    np.testing.assert_array_equal(prod, coeffs)


def test_device_grind_matches_host_grind():
    """Forced small-batch parity: the opt-in device PoW sweep must find the
    same minimal witness as the native host grind (ADVICE r2)."""
    import numpy as np

    from zk_circuits_tpu.fri import fri as frim
    from zk_circuits_tpu.host import poseidon as hposeidon

    rng = np.random.default_rng(7)
    base = rng.integers(0, frim.gl.P_INT, 4, dtype=np.uint64)
    pow_bits = 8  # small grind so both paths stay fast on CPU
    threshold = np.uint64(1 << (64 - pow_bits))
    host_w = frim._host_grind(base, threshold, 0)
    dev_w = frim._device_grind(base, threshold)
    assert host_w == dev_w
    assert int(hposeidon.hash_no_pad(
        np.concatenate([base, np.array([host_w], np.uint64)])
    )[0]) < int(threshold)


def test_extract_last_json_skips_log_noise():
    """Typed extraction: trailing JSON log lines after the proof object must
    not shadow it (ADVICE r2; reference circuit_data_tests.rs:28-44)."""
    import pytest as _pytest

    from zk_circuits_tpu.circuits.wormhole.inputs import TransferProofJson

    proof = ('{"transfer_count": 4, "state_root": "ab" , '
             '"storage_proof": ["00ff"], "indices": [8]}')
    noise_after = '\n{"level": "info", "msg": "done"}\n'
    tp = TransferProofJson.from_json("boot log\n" + proof + noise_after)
    assert tp.transfer_count == 4
    assert tp.storage_proof == ["00ff"]
    # nested dicts inside the proof must not shadow it either
    proof2 = ('{"transfer_count": 9, "state_root": "cd", "storage_proof": [], '
              '"indices": [], "meta": {"nested": 1}}')
    assert TransferProofJson.from_json(proof2 + "\n" + noise_after).transfer_count == 9
    with _pytest.raises(ValueError):
        TransferProofJson.from_json('{"level": "info"} not a proof')
