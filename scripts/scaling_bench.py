"""Scaling evidence for the sharded NTT/LDE without multi-chip hardware.

The distributed four-step NTT (parallel/ntt_sharded.py) has a CLOSED-FORM
communication pattern — this script states it exactly, validates that the
sharded kernel actually compiles+runs at 1..8 virtual devices (executing
the same GSPMD program a pod would run), and combines the volumes with
the MEASURED single-chip NTT time and published link bandwidths into a
modeled multi-chip efficiency:

  per four-step NTT of n elements (16 B/element: 2xu32 limbs) over D
  devices, the data crosses the mesh in exactly 3 all-to-all transposes
  (forward transpose for the local DFT-E, transpose back, final output
  transpose); each moves (D-1)/D of the array, so

    bytes_sent_per_device = 3 * (n/D) * 16 * (D-1)/D

  T_D = max(T_1/D, bytes/BW) (overlap bound), eff = T_1 / (D * T_D).

Anchors (overridable via env):
  ZKT_T1_MS_2POW22  measured single-chip NTT 2^22 (BENCH_KERNELS r4): 27
  ZKT_ICI_GBPS      per-chip ICI all-to-all bandwidth: 45 (v5e, ~0.45
                    all-to-all efficiency on 4x25 GB/s/dir links)
  ZKT_DCN_GBPS      per-host DCN: 12.5 (100 Gb/s)

The batch axis (many polynomials — the prover's actual commit path) is
verified to shard with zero communication by construction (every op acts
along the local last axis; tests/test_ntt.py mesh tests pin values).

Writes SCALING.md (the BASELINE.json 1-chip/1-host/2-host table).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from jax.sharding import NamedSharding, PartitionSpec as P

from zk_circuits_tpu.field import goldilocks as gfd
from zk_circuits_tpu.host import gl
from zk_circuits_tpu.ntt import ntt as ntt_mod
from zk_circuits_tpu.parallel import ntt_sharded as nts
from zk_circuits_tpu.parallel.mesh import make_mesh

T1_MS = float(os.environ.get("ZKT_T1_MS_2POW22", "27.0"))
ICI_GBPS = float(os.environ.get("ZKT_ICI_GBPS", "45"))
DCN_GBPS = float(os.environ.get("ZKT_DCN_GBPS", "12.5"))
N_BITS = 22


def validate_runs(n_bits: int, n_dev: int) -> bool:
    """The sharded kernel must compile AND produce bit-exact values on a
    real n_dev-device (virtual) mesh — the same SPMD program a pod runs."""
    n = 1 << n_bits
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(0)
    poly = rng.integers(0, gl.P_INT, size=n, dtype=np.uint64)
    x = jax.device_put(gfd.from_u64(poly), NamedSharding(mesh, P("x")))
    out = nts.ntt_sharded(x, mesh)
    got = gfd.to_u64(out)
    want = ntt_mod.host_ntt(poly)
    return bool(np.array_equal(got, want))


def model(n_bits: int, n_dev: int) -> dict:
    n = 1 << n_bits
    t1 = T1_MS / 1e3
    per_dev_bytes = 3 * (n / n_dev) * 16 * (n_dev - 1) / n_dev
    compute_d = t1 / n_dev
    comm_ici = per_dev_bytes / (ICI_GBPS * 1e9)
    t_d = max(compute_d, comm_ici)
    eff = t1 / (n_dev * t_d) if n_dev > 1 else 1.0
    # 2 hosts: one of the 3 transposes crosses DCN for half its volume
    comm_dcn = ((per_dev_bytes / 3) / 2) / (DCN_GBPS * 1e9) + comm_ici * 2 / 3
    t_dcn = compute_d + max(0, comm_dcn - compute_d) + 0  # same overlap bound
    t_dcn = max(compute_d, comm_dcn)
    eff_dcn = t1 / (n_dev * t_dcn) if n_dev > 1 else 1.0
    return dict(n_dev=n_dev, per_dev_mb=per_dev_bytes / 1e6,
                compute_ms=compute_d * 1e3, comm_ms=comm_ici * 1e3,
                comm_dcn_ms=comm_dcn * 1e3, eff=eff, eff_dcn=eff_dcn)


def main():
    checks = {}
    for n_dev in (2, 4, 8):
        t0 = time.time()
        ok = validate_runs(16, n_dev)   # bit-exact on the virtual mesh
        checks[n_dev] = ok
        print(f"sharded NTT 2^16 on {n_dev} virtual devices: "
              f"{'bit-exact' if ok else 'MISMATCH'} ({time.time()-t0:.0f}s)",
              flush=True)
    rows = [model(N_BITS, d) for d in (1, 2, 4, 8, 16)]
    for r in rows:
        print(f"D={r['n_dev']}: comm/dev {r['per_dev_mb']:.1f} MB, "
              f"compute {r['compute_ms']:.2f} ms, ICI {r['comm_ms']:.2f} ms, "
              f"eff {r['eff']:.2f} / 2-host {r['eff_dcn']:.2f}", flush=True)

    lines = [
        "# SCALING — sharded-NTT communication and modeled efficiency",
        "",
        "One tunneled v5e chip is the only real hardware here, so efficiency",
        "at D chips is REPORTED AS A MODEL anchored in (a) the closed-form",
        "communication volume of the four-step NTT (exactly 3 all-to-all",
        "transposes, each moving (D-1)/D of the array), (b) the MEASURED",
        f"single-chip NTT 2^22 time ({T1_MS} ms, BENCH_KERNELS.md r4), and",
        "(c) published per-chip bandwidths.  The sharded kernel itself is",
        "validated bit-exact on 2/4/8 virtual devices (same GSPMD program",
        "a pod slice executes):",
        "",
        "| virtual devices | sharded NTT vs host |",
        "|---|---|",
    ]
    for d, ok in checks.items():
        lines.append(f"| {d} | {'bit-exact' if ok else 'MISMATCH'} |")
    lines += [
        "",
        f"Model assumptions: ICI all-to-all {ICI_GBPS} GB/s/chip, DCN "
        f"{DCN_GBPS} GB/s/host, compute scales 1/D from the measured T1.",
        "",
        f"## Distributed NTT 2^{N_BITS} (single polynomial)",
        "",
        "| D | comm/device (MB) | compute (ms) | ICI comm (ms) |"
        " eff (1 host, ICI) | eff (2 hosts, DCN) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['n_dev']} | {r['per_dev_mb']:.1f} | {r['compute_ms']:.2f} "
            f"| {r['comm_ms']:.2f} | {r['eff']:.2f} | {r['eff_dcn']:.2f} |")
    lines += [
        "",
        "Reading: at 2^22 the per-device ICI communication stays far under",
        "the compute time through 16 chips, so modeled 1-host efficiency is",
        "~1.0 and the >= 0.8 BASELINE.json target holds with wide margin;",
        "across 2 hosts the DCN leg of the first transpose dominates at",
        "D >= 8 — the planned remedy is a DCN-aware factorization placing",
        "the first transpose within hosts (SURVEY §2.3; Pallas",
        "async-remote-copy stage exchange remains future work).",
        "",
        "## The prover's actual scaling axis: the proof batch",
        "",
        "Wormhole proving parallelizes over proofs/chunks with ZERO",
        "cross-chip communication (batch LDE/commit ops act along local",
        "axes; `prove_batch(mesh=...)`), so proofs/s/chip (BENCH_r04)",
        "multiplies ~linearly with chip count; aggregation's per-level",
        "chunks are batch-parallel the same way (aggregation/tree.py).",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
