"""Solve the level-1 FRI slot rule per query from fold1->2 consistency.

The level-2 layout is validated; for each query the fold of tree-1 leaf c
must equal the shipped tree-2 value.  Fiber points are 16th roots of
y2(c) = s2*w9^(K*rev9(c)): x_t = r(c) * mu^e(t) with
r(c) = s1*w13^(K*rev9(c) mod 512) and mu = w13^512 (primitive 16th root).
Search per query over slot rules e(t) = a*sigma(t) + b (a in [0,16),
b in [0,16), sigma in {id, rev4}); the global rule must pin a and sigma,
with b possibly a per-leaf offset phi(c) whose structure we then read off.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from zk_circuits_tpu.compat import serde
from zk_circuits_tpu.host import gl, gle

from compat_fold0_solve import transcript
from compat_fold0_sum import bit_reverse
from compat_level1_check import interp_at

P = gl.P_INT
BD = "/root/reference/wormhole/bench-data"
K = 6533
S1 = 6649786511859475384


def main():
    common = serde.read_common_data(open(f"{BD}/common.bin", "rb").read())
    vdata = serde.read_verifier_data(open(f"{BD}/verifier.bin", "rb").read())
    proof = serde.read_proof(open(f"{BD}/proof.bin", "rb").read(), common)
    zeta, alpha, fri_betas, qidx = transcript(common, vdata, proof)
    fp = proof.opening_proof
    w13 = gl.primitive_root_of_unity(13)
    mu = pow(w13, 512, P)
    mu_pows = [pow(mu, e, P) for e in range(16)]
    beta1 = fri_betas[1]

    per_q = []
    for qi, idx in enumerate(qidx):
        j1 = idx >> 4
        c = j1 >> 4
        j2 = c
        step1 = fp.query_rounds[qi].steps[1]
        step2 = fp.query_rounds[qi].steps[2]
        got = step2.evals[j2 & 15]
        r = gl.mul(np.uint64(S1),
                   np.uint64(pow(w13, (K * bit_reverse(c, 9)) % 512, P)))
        sols = []
        for use_rev in (0, 1):
            for a in range(16):
                for b in range(16):
                    xs = []
                    seen = set()
                    okperm = True
                    for t in range(16):
                        st = bit_reverse(t, 4) if use_rev else t
                        e = (a * st + b) % 16
                        if e in seen:
                            okperm = False
                            break
                        seen.add(e)
                        xs.append(int(gl.mul(r, np.uint64(mu_pows[e]))))
                    if not okperm:
                        continue
                    val = interp_at(xs, [step1.evals[t] for t in range(16)],
                                    beta1)
                    if int(val[0]) == int(got[0]) and int(val[1]) == int(got[1]):
                        sols.append((use_rev, a, b))
        per_q.append((qi, c, sols))
        print(f"q{qi}: c={c:3d} sols={sols}", flush=True)

    # intersect (use_rev, a) across queries
    from collections import Counter
    ra = Counter()
    for _, _, sols in per_q:
        for ur, a, b in sols:
            ra[(ur, a)] += 1
    print("\n(use_rev, a) coverage:", ra.most_common(5))


if __name__ == "__main__":
    main()
