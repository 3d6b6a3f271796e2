"""Multi-host runtime tests (VERDICT r2 item 6).

Two layers:
- single-process hybrid (dcn, ici) mesh: the four-step NTT sharded over
  the combined axis must match the host golden NTT;
- true 2-OS-process simulation via scripts/multihost_sim.py —
  jax.distributed + gloo cross-process collectives (slow-marked).
"""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from zk_circuits_tpu.field import goldilocks as gfd
from zk_circuits_tpu.host import gl
from zk_circuits_tpu.ntt import ntt as nttm
from zk_circuits_tpu.parallel import ntt_sharded as nts
from zk_circuits_tpu.parallel.distributed import hybrid_mesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_hybrid_mesh_ntt():
    mesh = hybrid_mesh(num_hosts=2)
    assert mesh.shape["dcn"] == 2
    n = 1 << 10
    rng = np.random.default_rng(3)
    poly = rng.integers(0, gl.P_INT, size=n, dtype=np.uint64)
    x = jax.device_put(gfd.from_u64(poly),
                       NamedSharding(mesh, P(("dcn", "ici"))))
    out = nts.ntt_sharded(x, mesh, axis=("dcn", "ici"))
    assert np.array_equal(gfd.to_u64(out), nttm.host_ntt(poly))


def test_hybrid_mesh_batch_lde_dcn_only():
    mesh = hybrid_mesh(num_hosts=2)
    rng = np.random.default_rng(4)
    coeffs = rng.integers(0, gl.P_INT, size=(4, 128), dtype=np.uint64)
    out = nts.lde_batch_sharded(gfd.from_u64(coeffs), 3, mesh, axis="dcn")
    want = nttm.host_lde(coeffs, 3)
    assert np.array_equal(gfd.to_u64(out), want)


@pytest.mark.slow
def test_two_process_simulation():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_sim.py"),
         "--procs", "2", "--local-devices", "2", "--log2n", "9"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "ZKT_MH_PORT": "27911"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["ok"] and res["procs"] == 2
