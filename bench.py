"""Headline benchmark: prover polynomial-commit throughput on device.

The reference publishes no benchmark numbers (BASELINE.md) and its Rust
toolchain is not present in this image, so the baseline is this repo's
host (numpy + native C++) golden model of the same commit step — a
stand-in for the reference's CPU-only engine.  Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where vs_baseline is the speedup of the device path over the host path.

Measurement note: on the axon-tunneled TPU, ``block_until_ready`` (and in
round 1 even ``device_get`` of the result) can return before the device
work actually completes, inflating throughput.  The timed region is now a
single jitted ``lax.fori_loop`` whose iteration i+1 consumes iteration i's
Merkle cap (folded back into the coefficients), so the device MUST execute
all iterations serially before the final cap fetch can produce data.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # XLA compiles dominate on this small-core host; persist them so the
    # driver's repeated bench runs skip straight to execution.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

    from zk_circuits_tpu.field import goldilocks as gfd
    from zk_circuits_tpu.hash import merkle as merklem
    from zk_circuits_tpu.host import gl
    from zk_circuits_tpu.ntt import ntt as nttm

    # Wormhole-scale wire commit: 135 wire polynomials, degree 2^13,
    # rate 8x LDE, cap_height 4 (SURVEY.md §0, §3.2).
    num_polys, n, rate_bits, cap_height = 135, 1 << 13, 3, 4
    iters = 10
    rng = np.random.default_rng(0)
    coeffs_u64 = rng.integers(0, gl.P_INT, size=(num_polys, n), dtype=np.uint64)

    def commit_step(coeffs: gfd.GF) -> gfd.GF:
        values = nttm.lde(coeffs, rate_bits)
        rows = gfd.GF(values.lo.T, values.hi.T)
        return merklem.device_merkle_levels(rows, cap_height)[-1]

    def chain(coeffs: gfd.GF, cap: gfd.GF) -> gfd.GF:
        """Fold the 2^cap_height x 4 cap into the first coefficient row so
        the next iteration data-depends on this one's full commit."""
        mix = gfd.add(coeffs[0, : 4 << cap_height], cap.reshape(-1))
        return gfd.GF(
            coeffs.lo.at[0, : 4 << cap_height].set(mix.lo),
            coeffs.hi.at[0, : 4 << cap_height].set(mix.hi),
        )

    @jax.jit
    def bench_loop(coeffs: gfd.GF) -> gfd.GF:
        def body(_, carry):
            cap = commit_step(carry)
            return chain(carry, cap)

        final = jax.lax.fori_loop(0, iters, body, coeffs)
        return commit_step(final)

    coeffs = gfd.from_u64(coeffs_u64)
    cap = bench_loop(coeffs)                      # compile + warmup
    _ = jax.device_get(cap.lo)

    t0 = time.perf_counter()
    cap = bench_loop(coeffs)
    _ = jax.device_get(cap.lo)                    # forces real completion
    dev_s = (time.perf_counter() - t0) / (iters + 1)

    # Host baseline (one iteration; numpy + native C++ golden model).
    t0 = time.perf_counter()
    values = nttm.host_lde(coeffs_u64, rate_bits)
    leaves = np.ascontiguousarray(values.T)
    merklem.MerkleTree.build(leaves, cap_height)
    host_s = time.perf_counter() - t0

    elems = num_polys * (n << rate_bits)  # LDE output field elements
    print(json.dumps({
        "metric": "commit_lde_merkle_135x8192_throughput",
        "value": round(elems / dev_s / 1e6, 3),
        "unit": "Mfelt/s",
        "vs_baseline": round(host_s / dev_s, 3),
    }))


if __name__ == "__main__":
    main()
