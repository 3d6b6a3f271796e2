"""Quantify the recursive verifier circuit (VERDICT r2 item 7).

Builds a LevelCircuit (branching=2) over an inner circuit's common data and
prints gate rows, padded degree, per-gate-type histogram, and build time.
Inner circuit: the x->x^2 square circuit by default, or the cached wormhole
circuit (.bench_cache/common.bin) with --wormhole.

Usage: python scripts/recursion_size.py [--wormhole]
"""

import argparse
import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wormhole", action="store_true")
    ap.add_argument("--branching", type=int, default=2)
    args = ap.parse_args()

    if args.wormhole:
        from pathlib import Path

        from zk_circuits_tpu.api import artifacts

        cache = Path(__file__).resolve().parent.parent / ".bench_cache"
        common = artifacts.load_common(cache / "common.bin")
    else:
        from zk_circuits_tpu.iop.builder import CircuitBuilder
        from zk_circuits_tpu.plonk.config import CircuitConfig

        builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
        x = builder.add_virtual_target()
        x2 = builder.square(x)
        builder.register_public_input(x)
        builder.register_public_input(x2)
        common = builder.build().common

    print(f"inner: degree_bits={common.degree_bits} "
          f"pis={common.num_public_inputs}", file=sys.stderr)

    from zk_circuits_tpu.aggregation.tree import LevelCircuit

    t0 = time.time()
    lc = LevelCircuit(common, args.branching)
    build_s = time.time() - t0
    cd = lc.circuit_data
    hist = collections.Counter(g.id for g in cd.prover_only.gates_by_row)
    print(json.dumps({
        "inner_degree_bits": common.degree_bits,
        "level_build_s": round(build_s, 1),
        "level_gate_rows": lc.num_gate_rows,
        "level_degree_bits": cd.common.degree_bits,
        "level_pis": cd.common.num_public_inputs,
        "gate_hist": dict(hist.most_common()),
    }, indent=2))


if __name__ == "__main__":
    main()
