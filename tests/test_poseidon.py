"""Poseidon: constant provenance, engine test vectors, and the reference's
golden secret→address / nullifier vectors (bit-exact parity gates).

Golden data from:
- /root/reference/wormhole/tests/src/circuit/unspendable_account_tests.rs:12-30
- /root/reference/wormhole/tests/src/prover/prover_tests.rs:29-43
- /root/reference/wormhole/tests/test-helpers/src/lib.rs:10-23
"""

import numpy as np

from zk_circuits_tpu.field import goldilocks as gfd
from zk_circuits_tpu.hash import poseidon as dposeidon
from zk_circuits_tpu.hash.constants import ALL_ROUND_CONSTANTS
from zk_circuits_tpu.host import poseidon as hposeidon
from zk_circuits_tpu.utils import codecs
from zk_circuits_tpu.utils.chacha import generate_poseidon_round_constants

SECRETS = [
    "cd94df2e3c38a87f3e429b62af022dbe4363143811219d80037e8798b2ec9229",
    "8b680b2421968a0c1d3cff6f3408e9d780157ae725724a78c3bc0998d1ac8194",
    "87f5fc11df0d12f332ccfeb92ddd8995e6c11709501a8b59c2aaf9eefee63ec1",
    "ef69da4e3aa2a6f15b3a9eec5e481f17260ac812faf1e685e450713327c3ab1c",
    "9aa84f99ef2de22e3070394176868df41d6a148117a36132d010529e19b018b7",
]
ADDRESSES = [
    "582d3b97e9b09c7776921d3ead2d8186e3aa199cf8d63f5d014e65d04ac80f26",
    "b0807446c24263def407aa8328400fef981ec30fc8453d7adbcc57bcf8af3bbf",
    "ac081f035cc995574fef749f33b455c31cb02759932d01b6367ab852bb5599ac",
    "a5073c13573f10552c37f35080dc0118bda22f1217381611cf4644909377ce05",
    "73378f4b54f48a38b17073e08440531594f2b771ceefc5c3cd621e1309fbe927",
]


def test_round_constants_regenerate():
    """The committed table must equal the deterministic ChaCha8 derivation."""
    assert generate_poseidon_round_constants() == list(ALL_ROUND_CONSTANTS)


def test_permutation_zero_vector():
    """Known engine test vector: permute(0^12)."""
    out = hposeidon.permute(np.zeros(12, dtype=np.uint64))
    assert out[0] == 0x3C18A9786CB0B359


def _unspendable_address(secret_hex: str) -> bytes:
    secret = bytes.fromhex(secret_hex)
    pre = np.concatenate(
        [codecs.injective_string_to_felts("wormhole"), codecs.injective_bytes_to_felts(secret)]
    )
    inner = hposeidon.hash_no_pad(pre)
    outer = hposeidon.hash_no_pad(inner)
    return codecs.digest_felts_to_bytes(outer)


def test_golden_unspendable_account_vectors():
    for secret, addr in zip(SECRETS, ADDRESSES):
        assert _unspendable_address(secret).hex() == addr


def test_golden_nullifier_vector():
    """Nullifier = Poseidon^2("~nullif~" ‖ secret ‖ transfer_count) — must match
    the hard-coded public-input bytes in prover_tests.rs:31-35."""
    secret = bytes.fromhex(SECRETS[0][:0] or "4c8587bd422e01d961acdc75e7d66f6761b7af7c9b1864a492f369c9d6724f05")
    pre = np.concatenate(
        [
            codecs.injective_string_to_felts("~nullif~"),
            codecs.injective_bytes_to_felts(secret),
            codecs.u64_to_felts(4),
        ]
    )
    outer = hposeidon.hash_no_pad(hposeidon.hash_no_pad(pre))
    expected = bytes(
        [169, 76, 150, 35, 66, 248, 76, 193, 57, 204, 106, 33, 169, 160, 248, 113,
         235, 144, 212, 48, 9, 232, 146, 7, 105, 125, 170, 24, 33, 54, 135, 28]
    )
    assert codecs.digest_felts_to_bytes(outer) == expected


def test_device_permutation_matches_host():
    import jax

    rng = np.random.default_rng(1)
    batch = rng.integers(0, 2**64 - 2**32 + 1, size=(64, 12), dtype=np.uint64)
    got = gfd.to_u64(jax.jit(dposeidon.permute)(gfd.from_u64(batch)))
    want = hposeidon.permute(batch)
    np.testing.assert_array_equal(got, want)


def test_device_hash_and_compress_match_host():
    import jax

    rng = np.random.default_rng(2)
    inputs = rng.integers(0, 2**64 - 2**32 + 1, size=(8, 11), dtype=np.uint64)
    got = gfd.to_u64(jax.jit(dposeidon.batch_hash_no_pad)(gfd.from_u64(inputs)))
    want = np.stack([hposeidon.hash_no_pad(row) for row in inputs])
    np.testing.assert_array_equal(got, want)

    left = rng.integers(0, 2**64, size=(8, 4), dtype=np.uint64)
    right = rng.integers(0, 2**64, size=(8, 4), dtype=np.uint64)
    left %= np.uint64(2**64 - 2**32 + 1)
    right %= np.uint64(2**64 - 2**32 + 1)
    got = gfd.to_u64(
        jax.jit(dposeidon.batch_compress)(gfd.from_u64(left), gfd.from_u64(right))
    )
    want = hposeidon.compress(left, right)
    np.testing.assert_array_equal(got, want)


def test_sponge_multi_output():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**64 - 2**32 + 1, size=17, dtype=np.uint64)
    out = hposeidon.hash_n_to_m_no_pad(x, 12)
    assert out.shape == (12,)
