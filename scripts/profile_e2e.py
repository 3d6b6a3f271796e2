"""Profile the end-to-end wormhole prove on the current backend.

Runs build once, then proves twice (cold incl. jit compiles, then warm)
and prints per-stage timings. Usage: python scripts/profile_e2e.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

from zk_circuits_tpu.api.prover import WormholeProver
from zk_circuits_tpu.api.verifier import WormholeVerifier
from zk_circuits_tpu.circuits.wormhole.golden_fixtures import test_inputs
from zk_circuits_tpu.utils import profiling


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    p = WormholeProver()
    print(f"build: {time.time()-t0:.1f}s", flush=True)
    cd, targets = p.circuit_data, p.targets

    for run in range(3):
        prover = WormholeProver(circuit_data=cd, targets=targets)
        t0 = time.time()
        proof = prover.commit(test_inputs()).prove()
        print(f"prove[{run}]: {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    v = WormholeVerifier.from_parts(cd.common, cd.verifier_only)
    v.verify(proof)
    print(f"verify: {time.time()-t0:.2f}s", flush=True)
    profiling.dump_timings("/tmp/e2e_timings.json")


if __name__ == "__main__":
    main()
