"""Voting circuit e2e, mirroring /root/reference/voting/src/lib.rs:263-448."""

import numpy as np
import pytest

from zk_circuits_tpu.circuits.voting import (
    MAX_MERKLE_DEPTH,
    VoteCircuitData,
    VotePrivateInputs,
    VotePublicInputs,
    VoteTargets,
    compute_nullifier,
)
from zk_circuits_tpu.host import poseidon as hposeidon
from zk_circuits_tpu.iop.builder import CircuitBuilder
from zk_circuits_tpu.iop.witness import PartialWitness
from zk_circuits_tpu.plonk.config import CircuitConfig
from zk_circuits_tpu.utils import codecs


def create_test_inputs() -> VoteCircuitData:
    keys = [bytes([i] * 32) for i in (1, 2, 3, 4)]
    leaves = [
        hposeidon.hash_no_pad(codecs.digest_bytes_to_felts(k)) for k in keys
    ]
    level1 = [
        hposeidon.hash_no_pad(np.concatenate([leaves[0], leaves[1]])),
        hposeidon.hash_no_pad(np.concatenate([leaves[2], leaves[3]])),
    ]
    root = hposeidon.hash_no_pad(np.concatenate([level1[0], level1[1]]))

    voter_key = codecs.digest_bytes_to_felts(keys[0])
    siblings = [leaves[1], level1[1]]
    path_indices = [False, False]
    proposal_id = codecs.digest_bytes_to_felts(bytes([42] * 32))
    nullifier = compute_nullifier(voter_key, proposal_id)
    return VoteCircuitData(
        VotePublicInputs(proposal_id, root, True, nullifier),
        VotePrivateInputs(voter_key, siblings, path_indices, 2),
    )


def _build():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    targets = VoteTargets.new(builder)
    VoteCircuitData.circuit(targets, builder)
    return builder.build(), targets


@pytest.fixture(scope="module")
def vote_circuit():
    return _build()


def test_vote_circuit_end_to_end(vote_circuit):
    data, targets = vote_circuit
    inputs = create_test_inputs()
    pw = PartialWitness()
    inputs.fill_targets(pw, targets)
    proof = data.prove(pw)
    data.verify(proof)
    # PI layout: proposal_id(4) ‖ merkle_root(4) ‖ vote(1) ‖ nullifier(4)
    assert proof.public_inputs.shape == (13,)
    assert proof.public_inputs[8] == 1


def test_invalid_merkle_depth(vote_circuit):
    data, targets = vote_circuit
    inputs = create_test_inputs()
    inputs.private_inputs.actual_merkle_depth = MAX_MERKLE_DEPTH + 1
    with pytest.raises(ValueError, match="exceeds maximum allowed depth"):
        inputs.fill_targets(PartialWitness(), targets)


def test_merkle_proof_length_mismatch(vote_circuit):
    data, targets = vote_circuit
    inputs = create_test_inputs()
    inputs.private_inputs.path_indices.append(False)
    with pytest.raises(ValueError, match="length mismatch"):
        inputs.fill_targets(PartialWitness(), targets)


def test_invalid_merkle_proof(vote_circuit):
    data, targets = vote_circuit
    inputs = create_test_inputs()
    inputs.private_inputs.actual_merkle_depth = 1  # should be 2
    pw = PartialWitness()
    inputs.fill_targets(pw, targets)
    with pytest.raises(ValueError):
        data.prove(pw)


def test_completely_invalid_proof(vote_circuit):
    data, targets = vote_circuit
    inputs = create_test_inputs()
    inputs.private_inputs.private_key = np.full(4, 12345, dtype=np.uint64)
    inputs.private_inputs.merkle_siblings = [
        np.full(4, 67890, dtype=np.uint64),
        np.full(4, 11111, dtype=np.uint64),
    ]
    inputs.private_inputs.path_indices = [True, True]
    inputs.private_inputs.actual_merkle_depth = 2
    pw = PartialWitness()
    inputs.fill_targets(pw, targets)
    with pytest.raises(ValueError):
        data.prove(pw)
