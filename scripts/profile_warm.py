"""Warm-only per-stage profile of the device wormhole prove.

Builds (or loads) the cached circuit, runs one cold prove to compile,
then resets stage timers and runs N warm proves — the stage means of the
warm runs alone show where resident-prover time goes (BENCH_STAGES.json's
means mix cold compiles in).

Usage: python scripts/profile_warm.py [N]
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ZKT_TIMING", "1")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    from zk_circuits_tpu.api.prover import WormholeProver
    from zk_circuits_tpu.circuits.wormhole.golden_fixtures import test_inputs
    from zk_circuits_tpu.utils import profiling

    prover_tpl, build_s = bench._build_or_load()
    cd, targets = prover_tpl.circuit_data, prover_tpl.targets
    print(f"build_s={build_s:.1f}", file=sys.stderr)

    def one_prove():
        p = WormholeProver(circuit_data=cd, targets=targets)
        return p.commit(test_inputs()).prove()

    t0 = time.time()
    one_prove()
    print(f"cold_s={time.time() - t0:.1f}", file=sys.stderr)

    profiling.reset_timings()
    times = []
    for _ in range(n):
        t0 = time.time()
        one_prove()
        times.append(time.time() - t0)

    out = {
        "warm_each_s": [round(t, 3) for t in times],
        "warm_mean_s": round(sum(times) / len(times), 3),
        "stage_means_s": {
            k: round(sum(v) / len(v), 4)
            for k, v in sorted(profiling.get_timings().items())
        },
        "stage_total_s": round(
            sum(sum(v) for v in profiling.get_timings().values()) / n, 3),
    }
    print(json.dumps(out, indent=2))
    Path("/tmp/warm_stages.json").write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
