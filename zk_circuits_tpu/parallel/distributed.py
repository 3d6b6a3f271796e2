"""Multi-host runtime: jax.distributed init + hybrid DCN x ICI meshes.

The reference is a single Rust process (SURVEY.md §2.3: no distributed
communication backend of any kind); the TPU-native framework scales the
prover across hosts instead.  Design (SURVEY.md §5 long-context row):

- processes join via :func:`initialize` (jax.distributed; coordinator =
  host 0).  Every process sees the GLOBAL device list; arrays are
  addressed via the usual ``jax.sharding`` API, with XLA routing
  collectives over ICI within a slice and DCN across hosts.
- :func:`hybrid_mesh` builds a 2-D ``Mesh`` with a slow outer ``dcn``
  (host) axis and a fast inner ``ici`` (chip) axis.  Batch/tree axes
  shard over ``dcn`` (zero or rare communication); the within-polynomial
  NTT axis shards over ``ici`` (all-to-all heavy), or over BOTH axes via
  the combined spec ``P(("dcn", "ici"))`` for polynomials larger than a
  host's HBM — the four-step NTT in ntt_sharded.py accepts the tuple
  axis directly (its cross-shard moves become one DCN transpose plus
  ICI-local work per host).

Validated without a pod by scripts/multihost_sim.py: N real OS processes
on the CPU backend (xla_force_host_platform_device_count), gloo-style
cross-process collectives through the jax.distributed service.
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host runtime.  On TPU pods all arguments are
    auto-detected from the environment; for CPU simulation pass them
    explicitly (scripts/multihost_sim.py)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def hybrid_mesh(dcn_axis: str = "dcn", ici_axis: str = "ici",
                num_hosts: int | None = None):
    """(num_hosts, devices_per_host) mesh: outer axis crosses DCN, inner
    axis stays on ICI.  Works both multi-process (real hosts) and
    single-process (virtual split for tests/dryrun)."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if num_hosts is None:
        num_hosts = max(1, jax.process_count())
    assert len(devices) % num_hosts == 0, (
        f"{len(devices)} devices not divisible by {num_hosts} hosts"
    )
    per_host = len(devices) // num_hosts
    if jax.process_count() > 1:
        # Order devices host-major so the outer axis maps to real hosts.
        devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.array(devices).reshape(num_hosts, per_host)
    return Mesh(arr, (dcn_axis, ici_axis))


def host_local_slice(mesh, axis: str = "dcn"):
    """The index of this process along the DCN axis (for host-sharded IO)."""
    import jax

    return jax.process_index() % mesh.shape[axis]
