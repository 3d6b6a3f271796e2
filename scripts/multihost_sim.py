"""Multi-host simulation: N real OS processes x M virtual CPU devices.

Validates the multi-host story (VERDICT r2 item 6) without a pod: each
process calls jax.distributed.initialize against a local coordinator,
builds the hybrid (dcn=N, ici=M) mesh, and runs

1. the four-step NTT sharded over the COMBINED ("dcn","ici") axis — the
   cross-process all-to-all exercises the same GSPMD collectives a 2-host
   TPU slice would route over DCN;
2. a batch LDE sharded over "dcn" only (zero cross-host communication).

Each process checks the distributed NTT output against the host golden
NTT on its addressable shards.  Prints ONE JSON line from process 0.

Usage: python scripts/multihost_sim.py [--procs 2] [--local-devices 4]
       [--log2n 12]
(parent mode spawns the workers; workers are re-invoked with --worker)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("ZKT_MH_PORT", "27643"))


def worker(args) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from zk_circuits_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=args.procs,
        process_id=args.worker,
    )
    assert jax.process_count() == args.procs
    assert len(jax.devices()) == args.procs * args.local_devices

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zk_circuits_tpu.field import goldilocks as gfd
    from zk_circuits_tpu.host import gl
    from zk_circuits_tpu.ntt import ntt as nttm
    from zk_circuits_tpu.parallel import ntt_sharded as nts

    mesh = distributed.hybrid_mesh()
    axis = ("dcn", "ici")
    n = 1 << args.log2n
    rng = np.random.default_rng(7)
    x_host = rng.integers(0, gl.P_INT, size=n, dtype=np.uint64)

    # Every process materializes the same global array (replicated input),
    # then the NTT reshards over the combined axis.
    t0 = time.time()
    x = jax.device_put(
        gfd.from_u64(x_host), NamedSharding(mesh, P())
    )
    with mesh:
        y = nts.ntt_sharded(x, mesh, axis=axis)
        jax.block_until_ready(y.lo)
    ntt_s = time.time() - t0

    # Check addressable shards against the host golden NTT.
    want = nttm.host_ntt(x_host)
    for shard in y.lo.addressable_shards:
        idx = shard.index[0]
        got_lo = np.asarray(shard.data, dtype=np.uint64)
        want_slice = want[idx]
        assert np.array_equal(got_lo, want_slice & np.uint64(0xFFFFFFFF)), (
            f"proc {args.worker}: NTT shard mismatch at {idx}"
        )
    for shard in y.hi.addressable_shards:
        idx = shard.index[0]
        got_hi = np.asarray(shard.data, dtype=np.uint64)
        assert np.array_equal(got_hi, want[idx] >> np.uint64(32))

    # Batch LDE over the dcn axis only (no cross-host comms).
    coeffs = gfd.from_u64(
        rng.integers(0, gl.P_INT, size=(args.procs * args.local_devices, 256),
                     dtype=np.uint64)
    )
    with mesh:
        out = nts.lde_batch_sharded(coeffs, 3, mesh, axis="dcn")
        jax.block_until_ready(out.lo)

    if args.worker == 0:
        print(json.dumps({
            "ok": True,
            "procs": args.procs,
            "devices": args.procs * args.local_devices,
            "log2n": args.log2n,
            "ntt_s": round(ntt_s, 3),
        }), flush=True)


def parent(args) -> int:
    procs = []
    for pid in range(args.procs):
        cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(pid),
               "--procs", str(args.procs),
               "--local-devices", str(args.local_devices),
               "--log2n", str(args.log2n)]
        procs.append(subprocess.Popen(cmd, stdout=None if pid == 0 else
                                      subprocess.DEVNULL))
    rc = 0
    for p in procs:
        p.wait()
        rc |= p.returncode
    return rc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--log2n", type=int, default=12)
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()
    if args.worker is None:
        sys.exit(parent(args))
    worker(args)


if __name__ == "__main__":
    main()
