"""Per-kernel device benchmarks with speed-of-light comparison.

Covers the BASELINE.json config list: Goldilocks field ops, Poseidon
hashing (XLA scan + fused Pallas), Merkle-cap build, radix-2 NTT and
coset LDE at sizes 2^12..2^22, and the full commit (LDE+Merkle) step.

Timing methodology: each benchmark runs a single jitted ``lax.fori_loop``
whose iteration i+1 data-depends on iteration i's output, then fetches the
final result — immune to async-dispatch artifacts (see bench.py).

Speed-of-light model (printed per kernel):
- bandwidth-bound kernels (field ops, NTT stages): bytes moved / HBM BW;
- compute-bound kernels (Poseidon): u32 VPU ops / VPU throughput.
Hardware numbers default to TPU v5e-class (set via env ZKT_HBM_GBPS /
ZKT_VPU_GOPS for other chips).

Usage: python scripts/kernel_bench.py [--sizes 12,16,20] [--out BENCH_KERNELS.md]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_GBPS = float(os.environ.get("ZKT_HBM_GBPS", "819"))    # v5e: ~819 GB/s
VPU_GOPS = float(os.environ.get("ZKT_VPU_GOPS", "3900"))   # v5e: ~3.9 Tint32op/s


def _timed_chain(step, chain, x0, iters=8):
    """Run step+chain in a fori_loop with serial data dependence; return
    per-iteration seconds."""
    import jax

    import jax.numpy as jnp

    @jax.jit
    def loop(x):
        def body(_, carry):
            return chain(carry, step(carry))

        final = jax.lax.fori_loop(0, iters, body, x)
        out = step(final)
        # Reduce to scalars so the d2h fetch is tiny (a full 2^22 fetch
        # costs seconds through the tunnel and used to dominate the
        # numbers) while still data-depending on EVERY output element —
        # block_until_ready alone is async fiction on this platform
        # (returned SoL fractions >100%).
        return jax.tree_util.tree_map(
            lambda a: jnp.sum(a.astype(jnp.uint32)), out)

    jax.tree_util.tree_map(lambda a: jax.device_get(a), loop(x0))  # warm
    t0 = time.perf_counter()
    jax.tree_util.tree_map(lambda a: jax.device_get(a), loop(x0))
    return (time.perf_counter() - t0) / (iters + 1)


def bench_field_mul(rows=[]):
    import jax

    from zk_circuits_tpu.field import goldilocks as gfd
    from zk_circuits_tpu.host import gl

    n = 1 << 22
    rng = np.random.default_rng(1)
    a = gfd.from_u64(rng.integers(0, gl.P_INT, size=n, dtype=np.uint64))

    def step(x):
        return gfd.mul(x, x)

    def chain(x, y):
        return y

    s = _timed_chain(step, chain, a)
    # bytes: read 8B + write 8B per element (fused squaring, 1 pass)
    sol = (n * 16) / (HBM_GBPS * 1e9)
    rows.append({
        "kernel": "field mul (2^22 elements, x*x)",
        "time_ms": s * 1e3,
        "throughput": f"{n / s / 1e9:.2f} Gmul/s",
        "sol_ms": sol * 1e3,
        "sol_frac": sol / s,
    })


def bench_poseidon(rows=[]):
    import jax

    from zk_circuits_tpu.field import goldilocks as gfd
    from zk_circuits_tpu.host import gl

    n = 1 << 18  # leaves
    cols = 8
    rng = np.random.default_rng(2)
    leaves = gfd.from_u64(
        rng.integers(0, gl.P_INT, size=(n, cols), dtype=np.uint64))

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from zk_circuits_tpu.hash import poseidon_pallas as pp

        def step(x):
            return pp.hash_leaves(x, interpret=False)
    else:
        from zk_circuits_tpu.hash.poseidon import batch_hash_no_pad

        def step(x):
            return batch_hash_no_pad(x)

    def chain(x, dig):
        mixed = gfd.add(x[:, :4], dig)
        return gfd.GF(x.lo.at[:, :4].set(mixed.lo), x.hi.at[:, :4].set(mixed.hi))

    s = _timed_chain(step, chain, leaves)
    # compute-bound: ~6.5e4 u32 VPU ops per permutation (sbox 12*4 gfmul
    # full rounds + MDS sublimb madds), 1 perm per 8-felt row
    perms = n
    sol = perms * 6.5e4 / (VPU_GOPS * 1e9)
    rows.append({
        "kernel": f"poseidon leaf hash ({'pallas' if on_tpu else 'xla'}, 2^18 x 8 felts)",
        "time_ms": s * 1e3,
        "throughput": f"{perms / s / 1e6:.2f} Mperm/s",
        "sol_ms": sol * 1e3,
        "sol_frac": sol / s,
    })


def bench_ntt(size_bits, rows=[]):
    from zk_circuits_tpu.field import goldilocks as gfd
    from zk_circuits_tpu.host import gl
    from zk_circuits_tpu.ntt import ntt as nttm

    n = 1 << size_bits
    rng = np.random.default_rng(3)
    a = gfd.from_u64(rng.integers(0, gl.P_INT, size=n, dtype=np.uint64))

    def step(x):
        return nttm.ntt(x)

    def chain(x, y):
        return y

    s = _timed_chain(step, chain, a)
    # log2(n) stages, each streaming 8B*2 (lo+hi) read + write
    passes = size_bits
    sol = (n * 16 * 2 * passes) / (HBM_GBPS * 1e9)
    rows.append({
        "kernel": f"NTT 2^{size_bits}",
        "time_ms": s * 1e3,
        "throughput": f"{n / s / 1e6:.1f} Mfelt/s",
        "sol_ms": sol * 1e3,
        "sol_frac": sol / s,
    })


def bench_commit(rows=[], degree_bits=13):
    # degree 2^13 = our wormhole circuit; 2^14 = the reference's
    # (tests/test_compat.py: common.bin degree_bits=14).
    from zk_circuits_tpu.field import goldilocks as gfd
    from zk_circuits_tpu.hash import merkle as merklem
    from zk_circuits_tpu.host import gl
    from zk_circuits_tpu.ntt import ntt as nttm

    num_polys, n, rate_bits, cap_h = 135, 1 << degree_bits, 3, 4
    rng = np.random.default_rng(4)
    coeffs = gfd.from_u64(
        rng.integers(0, gl.P_INT, size=(num_polys, n), dtype=np.uint64))

    def step(c):
        values = nttm.lde(c, rate_bits)
        rowsm = gfd.GF(values.lo.T, values.hi.T)
        return merklem.device_merkle_levels(rowsm, cap_h)[-1]

    def chain(c, cap):
        w = 4 << cap_h
        mixed = gfd.add(c[0, :w], cap.reshape(-1))
        return gfd.GF(c.lo.at[0, :w].set(mixed.lo), c.hi.at[0, :w].set(mixed.hi))

    s = _timed_chain(step, chain, coeffs)
    lde_elems = num_polys * (n << rate_bits)
    perms = (n << rate_bits) * ((num_polys + 7) // 8) + (n << rate_bits)
    sol = max(
        (lde_elems * 16 * 2 * (degree_bits + rate_bits)) / (HBM_GBPS * 1e9),
        perms * 6.5e4 / (VPU_GOPS * 1e9),
    )
    rows.append({
        "kernel": f"wire commit (LDE+Merkle, 135 x 2^{degree_bits}, rate 8)",
        "time_ms": s * 1e3,
        "throughput": f"{lde_elems / s / 1e6:.1f} Mfelt/s",
        "sol_ms": sol * 1e3,
        "sol_frac": sol / s,
    })

    # r5 fused variant: the Pallas sponge reads the LDE output COLUMN-
    # MAJOR zero-copy (merkle.device_merkle_levels_values) — no (8n, k)
    # transpose materialization, no re-swizzle.  This is the production
    # commit path since r5 (oracle._device_commit_fn).
    def step_fused(c):
        values = nttm.lde(c, rate_bits)
        return merklem.device_merkle_levels_values(values, cap_h)[-1]

    s2 = _timed_chain(step_fused, chain, coeffs)
    rows.append({
        "kernel": f"wire commit FUSED (LDE+col-major hash, 135 x 2^{degree_bits})",
        "time_ms": s2 * 1e3,
        "throughput": f"{lde_elems / s2 / 1e6:.1f} Mfelt/s",
        "sol_ms": sol * 1e3,
        "sol_frac": sol / s2,
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="12,14,16,18,20,22")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          file=sys.stderr)
    rows = []
    bench_field_mul(rows)
    bench_poseidon(rows)
    for b in [int(x) for x in args.sizes.split(",")]:
        bench_ntt(b, rows)
    bench_commit(rows, degree_bits=13)
    bench_commit(rows, degree_bits=14)

    hdr = f"| kernel | time (ms) | throughput | speed-of-light (ms) | SoL frac |"
    sep = "|---|---|---|---|---|"
    lines = [hdr, sep]
    for r in rows:
        lines.append(
            f"| {r['kernel']} | {r['time_ms']:.3f} | {r['throughput']} "
            f"| {r['sol_ms']:.3f} | {r['sol_frac']:.2f} |"
        )
    table = "\n".join(lines)
    print(table)
    for r in rows:
        print(json.dumps(r), file=sys.stderr)
    if args.out:
        with open(args.out, "w") as f:
            f.write(
                "# Per-kernel device benchmarks vs speed-of-light\n\n"
                f"Backend: {jax.default_backend()}; HBM {HBM_GBPS} GB/s, "
                f"VPU {VPU_GOPS} Gop/s model.\n"
                "Timing: serial dependency-chained fori_loop (see bench.py).\n\n"
                + table + "\n"
            )


if __name__ == "__main__":
    main()
