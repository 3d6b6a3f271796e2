"""Wormhole circuit end-to-end, mirroring the reference's prover/verifier
integration tests (/root/reference/wormhole/tests/src/prover/prover_tests.rs,
verifier/verifier_tests.rs) against the golden fixtures in helpers.py."""

import numpy as np
import pytest

import helpers
from zk_circuits_tpu.api.prover import WormholeProver
from zk_circuits_tpu.api.verifier import WormholeVerifier
from zk_circuits_tpu.circuits.wormhole.inputs import PublicCircuitInputs
from zk_circuits_tpu.circuits.wormhole.nullifier import Nullifier
from zk_circuits_tpu.circuits.wormhole.unspendable_account import UnspendableAccount
from zk_circuits_tpu.plonk.config import CircuitConfig
from zk_circuits_tpu.utils import codecs
from zk_circuits_tpu.utils.serialization import proof_from_bytes, proof_to_bytes

# Golden root-hash bytes (prover_tests.rs:36-40).
EXPECTED_ROOT_HASH = bytes(
    [95, 250, 42, 181, 176, 219, 152, 131, 178, 43, 30, 88, 16, 147, 46, 169,
     217, 234, 177, 132, 7, 48, 253, 57, 172, 231, 28, 38, 187, 141, 8, 45]
)


def test_golden_nullifier_and_root():
    """Out-of-circuit hash chain must reproduce the reference's golden
    nullifier (prover_tests.rs:31-35) before any proving happens."""
    secret = bytes.fromhex(helpers.DEFAULT_SECRET)
    n = Nullifier.from_preimage(secret, helpers.DEFAULT_TRANSFER_COUNT)
    assert codecs.digest_felts_to_bytes(n.hash) == helpers.EXPECTED_NULLIFIER
    assert bytes.fromhex(helpers.DEFAULT_ROOT_HASH) == EXPECTED_ROOT_HASH


def test_golden_unspendable_account():
    """The to_account fixture IS the unspendable account of the default
    secret (test-helpers crate wires them together)."""
    secret = bytes.fromhex(helpers.DEFAULT_SECRET)
    acc = UnspendableAccount.from_secret(secret)
    assert codecs.digest_felts_to_bytes(acc.account_id) == helpers.DEFAULT_TO_ACCOUNT


@pytest.fixture(scope="module")
def wormhole_proof():
    prover = WormholeProver(CircuitConfig.standard_recursion_config())
    inputs = helpers.test_inputs()
    proof = prover.commit(inputs).prove()
    return prover, proof


def test_commit_and_prove_and_verify(wormhole_proof):
    # Verify with a WormholeVerifier sharing the prover's circuit data
    # (fresh-build equality is covered by test_artifacts round-trips).
    prover, proof = wormhole_proof
    verifier = WormholeVerifier(circuit_data=prover.circuit_data)
    verifier.verify(proof)


def test_public_inputs_match_golden(wormhole_proof):
    _, proof = wormhole_proof
    pub = PublicCircuitInputs.try_from_proof(proof)
    assert pub.funding_amount == 1_000_000_000_000
    assert pub.nullifier == helpers.EXPECTED_NULLIFIER
    assert pub.root_hash == EXPECTED_ROOT_HASH
    assert pub.exit_account == bytes([4] * 32)


def test_proof_serialization_round_trip(wormhole_proof):
    prover, proof = wormhole_proof
    blob = proof_to_bytes(proof)
    back = proof_from_bytes(blob)
    assert np.array_equal(back.public_inputs, proof.public_inputs)
    assert proof_to_bytes(back) == blob
    from zk_circuits_tpu.plonk.verifier import verify

    verify(prover.circuit_data.common, prover.circuit_data.verifier_only, back)


def test_tampered_public_input_fails(wormhole_proof):
    """Every tampered PI felt must fail verification
    (verifier_tests.rs:49-68)."""
    prover, proof = wormhole_proof
    from zk_circuits_tpu.plonk.verifier import verify

    pis = proof.public_inputs.copy()
    for i in range(len(pis)):
        bad = pis.copy()
        bad[i] = (int(bad[i]) + 1) % (2**64 - 2**32 + 1)
        tampered = proof_from_bytes(proof_to_bytes(proof))
        tampered.public_inputs = bad
        with pytest.raises(ValueError):
            verify(prover.circuit_data.common, prover.circuit_data.verifier_only,
                   tampered)


def test_commit_twice_raises():
    prover = WormholeProver(CircuitConfig.standard_recursion_config())
    inputs = helpers.test_inputs()
    prover.commit(inputs)
    with pytest.raises(RuntimeError):
        prover.commit(inputs)
