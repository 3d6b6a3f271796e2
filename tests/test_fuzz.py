"""Byte-tampering fuzz tests, mirroring the reference's fuzz suites:

- storage-proof byte flips must make proving impossible
  (/root/reference/wormhole/tests/src/circuit/storage_proof_tests.rs:102-147,
  1000 iterations, #[ignore]-gated there; sample-sized here with
  ZKT_FUZZ_ITERS to scale up), and
- random proof-byte mutations must fail deserialization or verification
  (/root/reference/wormhole/tests/src/verifier/verifier_tests.rs:70-96).
"""

import os

import numpy as np
import pytest

import helpers
from test_prover_square import build_square
from zk_circuits_tpu.api.prover import WormholeProver
from zk_circuits_tpu.circuits.wormhole.inputs import (
    CircuitInputs,
    PrivateCircuitInputs,
    ProcessedStorageProof,
)
from zk_circuits_tpu.iop.witness import PartialWitness, WitnessConflict
from zk_circuits_tpu.plonk.config import CircuitConfig
from zk_circuits_tpu.plonk.verifier import VerificationError
from zk_circuits_tpu.utils.serialization import proof_from_bytes, proof_to_bytes

FUZZ_ITERS = int(os.environ.get("ZKT_FUZZ_ITERS", "6"))


def _tampered_inputs(rng: np.random.Generator) -> CircuitInputs:
    """Golden inputs with one random byte of one random storage-proof node
    flipped (never a zero-length node)."""
    base = helpers.test_inputs()
    nodes = [bytearray(n) for n in base.private.storage_proof.proof]
    while True:
        ni = int(rng.integers(0, len(nodes)))
        if len(nodes[ni]):
            break
    bi = int(rng.integers(0, len(nodes[ni])))
    delta = int(rng.integers(1, 256))
    nodes[ni][bi] ^= delta
    proof = ProcessedStorageProof(
        [bytes(n) for n in nodes], list(base.private.storage_proof.indices)
    )
    return CircuitInputs(
        public=base.public,
        private=PrivateCircuitInputs(
            secret=base.private.secret,
            storage_proof=proof,
            transfer_count=base.private.transfer_count,
            funding_account=base.private.funding_account,
            unspendable_account=base.private.unspendable_account,
        ),
    )


@pytest.fixture(scope="module")
def wormhole_prover_data():
    prover = WormholeProver(CircuitConfig.standard_recursion_config())
    return prover.circuit_data, prover.targets


def test_storage_proof_byte_flip_always_fails(wormhole_prover_data):
    """100% failure rate on tampered storage proofs (the reference asserts a
    panic for every one of its 1000 random flips)."""
    circuit_data, targets = wormhole_prover_data
    rng = np.random.default_rng(0xF022)
    for _ in range(FUZZ_ITERS):
        prover = WormholeProver(circuit_data=circuit_data, targets=targets)
        with pytest.raises((ValueError, WitnessConflict, VerificationError)):
            # check_witness=True: tampered nodes that pass witness fill must
            # still trip the on-H constraint re-check (prove-time checking is
            # opt-in since r3; the default prove defers failure to verify()).
            prover.commit(_tampered_inputs(rng)).prove(check_witness=True)


def test_proof_byte_mutations_never_verify():
    """Random single-byte mutations of a serialized proof must fail to
    deserialize or fail verification — never verify clean."""
    data, x = build_square()
    pw = PartialWitness()
    pw.set_target(x, 3)
    proof = data.prove(pw)
    blob = bytearray(proof_to_bytes(proof))
    rng = np.random.default_rng(0xF0FF)
    iters = max(32, FUZZ_ITERS)
    for _ in range(iters):
        pos = int(rng.integers(0, len(blob)))
        delta = int(rng.integers(1, 256))
        mutated = bytearray(blob)
        mutated[pos] ^= delta
        try:
            bad = proof_from_bytes(bytes(mutated))
        except Exception:
            continue  # malformed encoding rejected at parse time
        with pytest.raises((VerificationError, ValueError, AssertionError)):
            data.verify(bad)
