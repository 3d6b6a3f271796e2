"""On-chip wormhole aggregation benchmark (VERDICT r3 item 7).

Proves a depth-2 binary wormhole tree (4 leaves) on the TPU device path:
leaf proof from the cached circuit artifacts, then per-level recursion
proves through prove_batch (device commits batched on the chip).  Appends
the measured timings to BENCH_RECURSION.md.

Usage: python scripts/bench_aggregation_device.py [depth]
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ZKT_TIMING", "1")


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    import numpy as np

    from zk_circuits_tpu.aggregation.aggregator import WormholeProofAggregator
    from zk_circuits_tpu.aggregation.tree import TreeAggregationConfig
    from zk_circuits_tpu.api.prover import WormholeProver
    from zk_circuits_tpu.circuits.wormhole.golden_fixtures import test_inputs
    from zk_circuits_tpu.circuits.wormhole.inputs import PublicCircuitInputs
    from zk_circuits_tpu.utils import profiling

    prover_tpl, build_s = bench._build_or_load()
    cd, targets = prover_tpl.circuit_data, prover_tpl.targets

    t0 = time.time()
    leaf = WormholeProver(circuit_data=cd, targets=targets) \
        .commit(test_inputs()).prove()
    leaf_s = time.time() - t0
    print(f"leaf prove: {leaf_s:.2f}s", flush=True)

    agg = WormholeProofAggregator(
        cd.common, cd.verifier_only,
        TreeAggregationConfig(branching_factor=2, depth=depth),
        dummy_loader=lambda: leaf,
    )
    n_real = 2 ** depth - 1
    for _ in range(min(n_real, 3)):
        agg.push(leaf)

    t0 = time.time()
    root = agg.aggregate()
    agg_cold_s = time.time() - t0  # includes LevelCircuit python builds + compiles
    print(f"aggregate (cold, incl. circuit builds+compiles): {agg_cold_s:.1f}s",
          flush=True)

    # warm: LevelCircuits cached, device programs compiled
    agg2 = WormholeProofAggregator(
        cd.common, cd.verifier_only,
        TreeAggregationConfig(branching_factor=2, depth=depth),
        dummy_loader=lambda: leaf,
    )
    for _ in range(min(n_real, 3)):
        agg2.push(leaf)
    t0 = time.time()
    root2 = agg2.aggregate()
    agg_warm_s = time.time() - t0
    print(f"aggregate (warm): {agg_warm_s:.2f}s", flush=True)

    agg2.root_circuit_data.verify(root2)
    leaves = agg2.extract_leaf_public_inputs()
    assert len(leaves) == 2 ** depth
    want = PublicCircuitInputs.try_from_slice(np.asarray(leaf.public_inputs))
    assert all(l == want for l in leaves)
    print("root verifies; all leaf PIs extract", flush=True)

    stage = {k: round(sum(v) / len(v), 3)
             for k, v in profiling.get_timings().items() if "agg" in k}
    out = {
        "depth": depth, "leaves": 2 ** depth,
        "leaf_prove_s": round(leaf_s, 2),
        "aggregate_cold_s": round(agg_cold_s, 1),
        "aggregate_warm_s": round(agg_warm_s, 2),
        "backend": __import__("jax").default_backend(),
        "stages": stage,
    }
    print(json.dumps(out))
    md = Path(__file__).resolve().parent.parent / "BENCH_RECURSION.md"
    with open(md, "a") as f:
        f.write(
            f"\n## On-chip aggregation (round 4, {out['backend']})\n\n"
            f"Depth-{depth} binary wormhole tree ({2**depth} leaves), device\n"
            f"path, LevelCircuit cache warm on the second call:\n\n"
            f"```json\n{json.dumps(out, indent=2)}\n```\n")
    print(f"appended to {md}")


if __name__ == "__main__":
    main()
