"""Pallas RDMA stage-exchange four-step NTT (parallel/ntt_exchange.py).

Two layers of validation, split by cost:

- The shard_map four-step body (explicit per-device code, three block
  exchanges + local NTT) is checked bit-exactly against the host NTT on
  the full 8-virtual-device CPU mesh with the semantically-identical
  ``lax.all_to_all`` exchange impl (fast — the Mosaic interpret
  machinery is not involved).
- The RDMA kernel itself (``make_async_remote_copy`` + DMA semaphores)
  is exercised through the Mosaic interpret simulator, which models the
  remote DMAs, at a tiny device count (slow: the interpret program is
  minutes to compile on the CPU backend).

Reference role: scale-out replacement for qp-plonky2's rayon-parallel
FFT (SURVEY.md §2.1 prover row, §2.3 comm-backend row).
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from zk_circuits_tpu.field import goldilocks as gfd
from zk_circuits_tpu.host import gl
from zk_circuits_tpu.ntt import ntt as nttm
from zk_circuits_tpu.parallel import ntt_exchange as nx


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8
    return Mesh(np.array(devs[:8]), ("x",))


@pytest.mark.parametrize("n", [512, 4096])
def test_four_step_exchange_ntt_matches_host(mesh8, n):
    rng = np.random.default_rng(11)
    x = rng.integers(0, gl.P_INT, size=n, dtype=np.uint64)
    out = gfd.to_u64(
        nx.ntt_sharded_pallas(gfd.from_u64(x), mesh8, impl="collective",
                              interpret=False))
    np.testing.assert_array_equal(out, nttm.host_ntt(x.copy()))


def test_four_step_exchange_intt_matches_host(mesh8):
    n = 1024
    rng = np.random.default_rng(12)
    x = rng.integers(0, gl.P_INT, size=n, dtype=np.uint64)
    out = gfd.to_u64(
        nx.intt_sharded_pallas(gfd.from_u64(x), mesh8, impl="collective",
                               interpret=False))
    np.testing.assert_array_equal(out, nttm.host_intt(x.copy()))


def test_rdma_exchange_kernel_interpret(mesh8):
    """The RDMA all-to-all kernel under the Mosaic interpret simulator:
    8 devices, every block moved by make_async_remote_copy + DMA
    semaphores (the simulator models the remote DMAs and the semaphore
    waits; ~1 s)."""
    E, B = 8, 64
    rng = np.random.default_rng(13)
    x = rng.integers(0, 2**32, size=(E, E, B), dtype=np.uint32)
    out = np.asarray(nx.all_to_all_blocks(x, mesh8, "x", interpret=True))
    np.testing.assert_array_equal(out, np.swapaxes(x, 0, 1))


def test_four_step_rdma_ntt_small_mesh(mesh8):
    """Composed four-step with the RDMA exchange impl at a 2-device mesh
    (ADVICE r4): covers the lo/hi packing in _exchange_gf UNDER the Pallas
    kernel — plus the three distinct collective_ids and the start barrier —
    in the default suite (~2 s; the 8-device composed variant below stays
    slow-marked)."""
    mesh2 = Mesh(np.array(jax.devices()[:2]), ("x",))
    n = 16
    rng = np.random.default_rng(15)
    x = rng.integers(0, gl.P_INT, size=n, dtype=np.uint64)
    out = gfd.to_u64(
        nx.ntt_sharded_pallas(gfd.from_u64(x), mesh2, impl="pallas",
                              interpret=True))
    np.testing.assert_array_equal(out, nttm.host_ntt(x.copy()))


@pytest.mark.slow
def test_four_step_rdma_ntt_matches_host(mesh8):
    """Full four-step NTT with ALL THREE stage exchanges running as the
    RDMA kernel under the Mosaic interpret simulator.  Slow-marked: the
    XLA CPU compile of the interpret program is ~6 minutes (the simulator
    expands every DMA/semaphore op into host callbacks); the kernel and
    the four-step math are each covered separately in the fast tests
    above."""
    n = 512
    rng = np.random.default_rng(14)
    x = rng.integers(0, gl.P_INT, size=n, dtype=np.uint64)
    out = gfd.to_u64(
        nx.ntt_sharded_pallas(gfd.from_u64(x), mesh8, impl="pallas",
                              interpret=True))
    np.testing.assert_array_equal(out, nttm.host_ntt(x.copy()))
