"""Device-pipeline parity: the fused TPU prove path (device quotient
commit + device FRI, fri/fri_device.py) must produce BYTE-IDENTICAL proofs
to the host golden pipeline (deterministic no_random mode).

Runs on the CPU backend (conftest forces it) with use_device=True — the
"device" path is then XLA-on-CPU over the same limb kernels, which is
bit-exact with the TPU backend (tests/test_ntt.py, test_poseidon.py pin
the primitives)."""

import numpy as np
import pytest

from test_prover_square import build_square

# Crypto-heavy: the device path's first CPU-backend compile of the fused
# quotient + zs programs takes tens of minutes per circuit shape on this
# 2-core box (cached persistently afterwards).  Slow-split per the
# reference's CI layout (.github/workflows/ci.yml skips such suites in the
# fast job); bench.py also asserts device/host byte parity on every run.
pytestmark = pytest.mark.slow
from zk_circuits_tpu.iop.builder import CircuitBuilder
from zk_circuits_tpu.iop.witness import PartialWitness
from zk_circuits_tpu.plonk.config import CircuitConfig
from zk_circuits_tpu.plonk.prover import prove
from zk_circuits_tpu.utils.serialization import proof_to_bytes


def _proof_pair(config):
    builder = CircuitBuilder(config)
    x = builder.add_virtual_target()
    x2 = builder.square(x)
    builder.register_public_input(x2)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(x, 3)
    host = prove(data, pw, use_device=False)
    pw2 = PartialWitness()
    pw2.set_target(x, 3)
    dev = prove(data, pw2, use_device=True)
    return data, host, dev


def test_device_prove_matches_host_bytes():
    data, host, dev = _proof_pair(CircuitConfig.standard_recursion_config())
    assert proof_to_bytes(host) == proof_to_bytes(dev)
    data.verify(dev)


def test_device_prove_matches_host_bytes_zk():
    """zk config: blinding salt polys must flow through the fused quotient
    program identically to the host path."""
    data, host, dev = _proof_pair(CircuitConfig.standard_recursion_zk_config())
    assert proof_to_bytes(host) == proof_to_bytes(dev)
    data.verify(dev)
