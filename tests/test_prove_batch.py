"""Batched (cross-chip) proving: prove_batch must produce byte-identical
proofs to sequential prove() (deterministic `no_random` mode), with the
batch axis sharded over the device mesh.

This is the TPU-native replacement for the reference aggregator's rayon
par_chunks thread fan-out (/root/reference/wormhole/aggregator/src/circuits/
tree.rs:92-103)."""

import numpy as np
import pytest

from zk_circuits_tpu.iop.builder import CircuitBuilder
from zk_circuits_tpu.iop.witness import PartialWitness
from zk_circuits_tpu.plonk.config import CircuitConfig
from zk_circuits_tpu.plonk.prover import prove_batch
from zk_circuits_tpu.utils.serialization import proof_to_bytes


def build_square():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    x2 = builder.square(x)
    builder.register_public_input(x2)
    data = builder.build()
    return data, x


def _witnesses(x, values):
    pws = []
    for v in values:
        pw = PartialWitness()
        pw.set_target(x, v)
        pws.append(pw)
    return pws


def test_prove_batch_matches_sequential():
    data, x = build_square()
    values = [3, 7, 11, 255]
    pws = _witnesses(x, values)
    batch = prove_batch(data, pws)
    for v, proof in zip(values, batch):
        assert proof.public_inputs.tolist() == [(v * v)]
        data.verify(proof)
    seq = [data.prove(pw) for pw in _witnesses(x, values)]
    for p_b, p_s in zip(batch, seq):
        assert proof_to_bytes(p_b) == proof_to_bytes(p_s)


@pytest.mark.slow
def test_prove_batch_on_mesh():
    """The fully batched DEVICE pipeline (plonk/prover_batch.py) on a
    4-virtual-device mesh: every stage vmapped over the proof axis, batch
    axis sharded, proof bytes identical to sequential device proves.

    Slow-marked: the whole batched pipeline (witness+commit, zs, quotient,
    FRI) compiles on the XLA CPU backend, ~tens of minutes on this 2-core
    host, and the persistent compile cache does not reliably reload CPU
    AOT results on this image.  The TPU path is exercised by bench.py."""
    from zk_circuits_tpu.parallel.mesh import make_mesh

    data, x = build_square()
    mesh = make_mesh(4)
    values = [2, 5, 6, 9]
    batch = prove_batch(data, _witnesses(x, values), mesh=mesh,
                        use_device=True)
    for v, proof in zip(values, batch):
        assert proof.public_inputs.tolist() == [v * v]
        data.verify(proof)
    seq = [data.prove(pw, use_device=True) for pw in _witnesses(x, values)]
    for p_b, p_s in zip(batch, seq):
        assert proof_to_bytes(p_b) == proof_to_bytes(p_s)


def test_prove_batch_empty():
    data, _ = build_square()
    assert prove_batch(data, []) == []
