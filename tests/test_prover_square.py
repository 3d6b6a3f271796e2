"""End-to-end prove+verify of the square circuit (x -> x^2, 1 public input)
— the same minimal leaf the reference aggregator tests use
(/root/reference/wormhole/aggregator/src/circuits/tree.rs:164-174)."""

import numpy as np
import pytest

from zk_circuits_tpu.iop.builder import CircuitBuilder
from zk_circuits_tpu.iop.witness import PartialWitness, WitnessConflict
from zk_circuits_tpu.plonk.config import CircuitConfig
from zk_circuits_tpu.plonk.verifier import VerificationError


def build_square():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    x2 = builder.square(x)
    builder.register_public_input(x2)
    data = builder.build()
    return data, x


def test_square_circuit_proves_and_verifies():
    data, x = build_square()
    pw = PartialWitness()
    pw.set_target(x, 3)
    proof = data.prove(pw)
    assert proof.public_inputs.tolist() == [9]
    data.verify(proof)  # raises on failure


def test_square_circuit_rejects_tampered_public_input():
    data, x = build_square()
    pw = PartialWitness()
    pw.set_target(x, 3)
    proof = data.prove(pw)
    proof.public_inputs = np.array([10], dtype=np.uint64)
    with pytest.raises(VerificationError):
        data.verify(proof)


def test_square_circuit_rejects_tampered_opening():
    data, x = build_square()
    pw = PartialWitness()
    pw.set_target(x, 3)
    proof = data.prove(pw)
    proof.proof.openings.wires[0, 0] ^= np.uint64(1)
    with pytest.raises((VerificationError, ValueError)):
        data.verify(proof)


def test_connect_one_zero_fails():
    """Engine sanity mirror of voting/src/lib.rs:436-447: connecting the
    constants 1 and 0 must make proving impossible."""
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    one = builder.one()
    zero = builder.zero()
    builder.connect(one, zero)
    data = builder.build()
    with pytest.raises((WitnessConflict, ValueError)):
        data.prove(PartialWitness())
