"""Sharded single-proof prover (plonk/prover_sharded.py): one proof
spanning an 8-virtual-device CPU mesh must produce byte-identical proofs
to the host prove() — the VERDICT r4 missing-#3 wiring of the sharded
NTT/LDE/Merkle/FRI components into the real pipeline."""

import numpy as np
import pytest

from zk_circuits_tpu.iop.builder import CircuitBuilder
from zk_circuits_tpu.iop.witness import PartialWitness
from zk_circuits_tpu.plonk.config import CircuitConfig
from zk_circuits_tpu.plonk.prover_sharded import prove_sharded
from zk_circuits_tpu.utils.serialization import proof_to_bytes

pytestmark = pytest.mark.slow  # full-pipeline XLA CPU compiles (~minutes)


def build_square(zk: bool = False):
    cfg = (CircuitConfig.standard_recursion_zk_config() if zk
           else CircuitConfig.standard_recursion_config())
    builder = CircuitBuilder(cfg)
    x = builder.add_virtual_target()
    x2 = builder.square(x)
    builder.register_public_input(x2)
    return builder.build(), x


@pytest.mark.parametrize("zk", [False, True])
def test_prove_sharded_matches_host_bytes(zk):
    from zk_circuits_tpu.parallel.mesh import make_mesh

    data, x = build_square(zk)
    mesh = make_mesh(8)
    pw = PartialWitness()
    pw.set_target(x, 7)
    sharded = prove_sharded(data, pw, mesh)
    data.verify(sharded)
    pw2 = PartialWitness()
    pw2.set_target(x, 7)
    host = data.prove(pw2, use_device=False)
    assert proof_to_bytes(sharded) == proof_to_bytes(host)
