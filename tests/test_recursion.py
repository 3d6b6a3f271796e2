"""Recursive verification: verify a proof inside a circuit, then tree
aggregation — mirroring the reference aggregator's square-circuit leaf
tests (/root/reference/wormhole/aggregator/src/circuits/tree.rs:145-244)."""

import numpy as np
import pytest

from zk_circuits_tpu.aggregation.tree import (
    LevelCircuit,
    TreeAggregationConfig,
    aggregate_to_tree,
)
from zk_circuits_tpu.iop.builder import CircuitBuilder
from zk_circuits_tpu.iop.witness import PartialWitness
from zk_circuits_tpu.plonk.config import CircuitConfig


def test_tree_aggregation_config():
    cfg = TreeAggregationConfig.default()
    assert (cfg.branching_factor, cfg.depth, cfg.num_leaf_proofs) == (2, 3, 8)
    assert TreeAggregationConfig(3, 2).num_leaf_proofs == 9


@pytest.fixture(scope="module")
def square_circuit():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    x2 = builder.square(x)
    builder.register_public_input(x2)
    data = builder.build()
    return data, x


def _square_proof(square_circuit, value: int):
    data, x = square_circuit
    pw = PartialWitness()
    pw.set_target(x, value)
    return data.prove(pw)


@pytest.fixture(scope="module")
def level(square_circuit):
    data, _ = square_circuit
    return LevelCircuit(data.common, branching_factor=2)


def test_recursive_verification_of_two_proofs(square_circuit, level):
    data, _ = square_circuit
    p1 = _square_proof(square_circuit, 3)
    p2 = _square_proof(square_circuit, 5)
    outer = level.prove_chunk([p1, p2], data.verifier_only)
    # Outer PIs = concatenated inner PIs (tree.rs:117-124).
    assert outer.public_inputs.tolist() == [9, 25]
    level.circuit_data.verify(outer)


def test_recursive_verifier_rejects_tampered_inner_proof(square_circuit, level):
    data, _ = square_circuit
    p1 = _square_proof(square_circuit, 3)
    p2 = _square_proof(square_circuit, 5)
    # Tamper an inner opening: witness generation must hit a conflict or
    # the outer constraints must be unsatisfiable.
    p2.proof.openings.wires[0, 0] ^= np.uint64(1)
    with pytest.raises(ValueError):
        level.prove_chunk([p1, p2], data.verifier_only)


def test_two_level_tree(square_circuit):
    data, _ = square_circuit
    proofs = [_square_proof(square_circuit, v) for v in (2, 3, 4, 5)]
    cfg = TreeAggregationConfig(branching_factor=2, depth=2)
    root, root_data = aggregate_to_tree(
        proofs, data.common, data.verifier_only, cfg
    )
    assert root.public_inputs.tolist() == [4, 9, 16, 25]
    root_data.verify(root)
