"""WormholeProofAggregator API semantics (aggregator.rs:51-92) and the
tree-level plumbing that doesn't need expensive wormhole proofs — the
reference's own tree tests use a cheap square circuit as the leaf
(tree.rs:145-244); the full wormhole aggregation path is covered by the
recursion tests plus the golden wormhole e2e."""

import numpy as np
import pytest

from zk_circuits_tpu.aggregation.aggregator import WormholeProofAggregator
from zk_circuits_tpu.aggregation.tree import TreeAggregationConfig, aggregate_to_tree
from zk_circuits_tpu.circuits.wormhole.inputs import LEAF_PI_LEN, PublicCircuitInputs
from zk_circuits_tpu.iop.builder import CircuitBuilder
from zk_circuits_tpu.iop.witness import PartialWitness
from zk_circuits_tpu.plonk.config import CircuitConfig


@pytest.fixture(scope="module")
def square():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    builder.register_public_input(builder.square(x))
    data = builder.build()

    def prove(v: int):
        pw = PartialWitness()
        pw.set_target(x, v)
        return data.prove(pw)

    return data, prove


def test_buffer_rejects_overflow(square):
    data, prove = square
    agg = WormholeProofAggregator(data.common, data.verifier_only,
                                  TreeAggregationConfig(2, 1))
    agg.push(prove(2))
    agg.push(prove(3))
    with pytest.raises(ValueError, match="full"):
        agg.push(prove(4))


def test_aggregate_empty_buffer_raises(square):
    data, _ = square
    agg = WormholeProofAggregator(data.common, data.verifier_only)
    with pytest.raises(ValueError, match="no proofs"):
        agg.aggregate()


def test_partial_buffer_auto_pads_via_loader(square):
    """aggregate() with a short buffer pads automatically — the reference
    embeds its dummy (util.rs:11-29, aggregator.rs:74-92); non-wormhole
    inner circuits supply the dummy via dummy_loader."""
    data, prove = square
    calls = []

    def loader():
        calls.append(1)
        return prove(1)

    agg = WormholeProofAggregator(data.common, data.verifier_only,
                                  TreeAggregationConfig(2, 2),
                                  dummy_loader=loader)
    agg.push(prove(2))
    root = agg.aggregate()
    assert calls == [1]
    assert root.public_inputs.tolist() == [4, 1, 1, 1]
    agg.root_circuit_data.verify(root)


def test_mismatched_dummy_shape_raises(square):
    import types

    data, prove = square
    agg = WormholeProofAggregator(data.common, data.verifier_only,
                                  TreeAggregationConfig(2, 2))
    agg.push(prove(2))
    bad_dummy = types.SimpleNamespace(public_inputs=np.zeros(16, np.uint64))
    with pytest.raises(ValueError, match="dummy proof shape"):
        agg.aggregate(dummy_proof=bad_dummy)


def test_level_circuit_cache_reused(square):
    """A second aggregation of the same inner circuit must do ZERO Python
    circuit builds (the cross-call LevelCircuit cache; the reference
    rebuilds per chunk, tree.rs:111-127)."""
    from zk_circuits_tpu.aggregation import tree as treem

    data, prove = square
    cfg = TreeAggregationConfig(2, 1)
    aggregate_to_tree([prove(2), prove(3)], data.common, data.verifier_only, cfg)
    n_cached = len(treem._LEVEL_CACHE)
    builds = []
    orig_init = treem.LevelCircuit.__init__

    def spy(self, *a, **k):
        builds.append(1)
        orig_init(self, *a, **k)

    treem.LevelCircuit.__init__ = spy
    try:
        root, root_data = aggregate_to_tree(
            [prove(6), prove(7)], data.common, data.verifier_only, cfg)
    finally:
        treem.LevelCircuit.__init__ = orig_init
    assert builds == []                      # cache hit, no rebuild
    assert len(treem._LEVEL_CACHE) == n_cached
    assert root.public_inputs.tolist() == [36, 49]
    root_data.verify(root)


def test_aggregate_with_dummy_padding(square):
    """Pad 1 real proof to 4 leaves with a dummy (util.rs:11-29 semantics);
    root PIs = concatenated leaf PIs."""
    data, prove = square
    agg = WormholeProofAggregator(data.common, data.verifier_only,
                                  TreeAggregationConfig(2, 2))
    agg.push(prove(5))
    dummy = prove(1)
    root = agg.aggregate(dummy_proof=dummy)
    assert root.public_inputs.tolist() == [25, 1, 1, 1]
    agg.root_circuit_data.verify(root)


def test_extract_leaf_public_inputs_requires_aggregate(square):
    data, _ = square
    agg = WormholeProofAggregator(data.common, data.verifier_only)
    with pytest.raises(ValueError, match="aggregate"):
        agg.extract_leaf_public_inputs()


def test_try_from_aggregated_chunks():
    """inputs.rs:61-89: split a root proof's PIs into per-leaf chunks."""
    # Synthesize 2 leaves worth of valid wormhole PI felts: each digest felt
    # must be < 2^63-ish per the codec order check — use small values.
    import types

    pis = np.zeros(2 * LEAF_PI_LEN, dtype=np.uint64)
    pis[0:4] = [1, 2, 3, 4]          # nullifier digest felts (leaf 0)
    pis[16:20] = [5, 6, 7, 8]        # nullifier digest felts (leaf 1)
    fake_root = types.SimpleNamespace(public_inputs=pis)
    leaves = PublicCircuitInputs.try_from_aggregated(fake_root, LEAF_PI_LEN, 2)
    assert len(leaves) == 2
    assert leaves[0].nullifier != leaves[1].nullifier
    assert leaves[0].funding_amount == 0


def test_aggregate_on_mesh(square):
    """Cross-chip aggregation: level-1 chunks proved as ONE mesh-sharded
    batch (the TPU replacement for tree.rs:92-103's rayon fan-out).
    Byte-parity of the batched prover vs the sequential one is pinned by
    tests/test_prove_batch.py; here the aggregation plumbing runs the
    mesh path end-to-end and the root must carry all leaf PIs and verify."""
    from zk_circuits_tpu.parallel.mesh import make_mesh

    data, prove = square
    leaves = [prove(v) for v in (2, 3, 4, 5)]
    root, root_data = aggregate_to_tree(
        list(leaves), data.common, data.verifier_only,
        TreeAggregationConfig(2, 2), mesh=make_mesh(4))
    assert root.public_inputs.tolist() == [4, 9, 16, 25]
    root_data.verify(root)
