"""Test the global-root hypothesis on the FRI combine equation.

NOTES.md round-2 solved K9 ≡ 389 (mod 512) and K13 ≡ 6533 (mod 8192) for
the fork's FFT domain enumeration — and 6533 ≡ 389 (mod 512): both are one
global constant c, i.e. the fork's root_of_unity(n) = ω_n^(c mod 2^n) for
a single c (a different canonical 2-adic generator).  Then the "next"
opening point is ζ·ω14^(c mod 2^14), NOT ζ·ω14.  c mod 2^14 ∈
{6533, 14725}.  Re-run the layout-free combine solve for both.
"""

import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from zk_circuits_tpu.compat import serde
from zk_circuits_tpu.host import gl, gle

from compat_fold0_solve import transcript, reduce_pows, quad_roots

P = gl.P_INT
BD = "/root/reference/wormhole/bench-data"


def run(common, proof, zeta, alpha, qidx, g_exp):
    op = proof.openings
    fp = proof.opening_proof
    nc = common.num_challenges
    salt = common.salt_size
    widths = common.oracle_widths
    inst = [widths[0], widths[1] - salt, widths[2] - salt, widths[3] - salt]

    ro0 = reduce_pows(list(op.fri_batch0()), alpha)
    ro1 = reduce_pows(list(op.fri_batch1()), alpha)
    b1_len = op.fri_batch1().shape[0]
    apow_b1 = gle.powmod(alpha, b1_len)

    g = pow(gl.primitive_root_of_unity(common.degree_bits), g_exp, P)
    zeta_g = gle.mul_base(zeta, np.uint64(g))

    zsum = gle.add(zeta, zeta_g)
    zprod = gle.mul(zeta, zeta_g)

    results = []
    for qi, x_index in enumerate(qidx):
        rnd = fp.query_rounds[qi]
        ev0 = np.concatenate([
            rnd.initial.evals[0][: inst[0]],
            rnd.initial.evals[1][: inst[1]],
            rnd.initial.evals[2][: inst[2]],
            rnd.initial.evals[3][: inst[3]],
        ])
        re0 = reduce_pows([gle.from_base(x) for x in ev0], alpha)
        re1 = reduce_pows([gle.from_base(x) for x in rnd.initial.evals[2][:nc]],
                          alpha)
        A = gle.sub(re0, ro0)
        B = gle.sub(re1, ro1)
        Pterm = gle.mul(apow_b1, A)
        for t in range(fp.query_rounds[qi].steps[0].evals.shape[0]):
            v = fp.query_rounds[qi].steps[0].evals[t]
            S = gle.add(gle.add(gle.mul(v, zsum), Pterm), B)
            T = gle.add(gle.add(gle.mul(v, zprod), gle.mul(Pterm, zeta_g)),
                        gle.mul(B, zeta))
            a1, b1c, c1 = int(v[1]), int(S[1]), int(T[1])
            a0, b0c, c0 = int(v[0]), int(S[0]), int(T[0])
            for x in quad_roots((-a1) % P, b1c, (-c1) % P):
                if ((-a0) * x * x + b0c * x - c0) % P == 0:
                    results.append((qi, x_index, t, x))
    return results


def main():
    common = serde.read_common_data(open(f"{BD}/common.bin", "rb").read())
    vdata = serde.read_verifier_data(open(f"{BD}/verifier.bin", "rb").read())
    proof = serde.read_proof(open(f"{BD}/proof.bin", "rb").read(), common)
    zeta, alpha, fri_betas, qidx = transcript(common, vdata, proof)

    n = 1 << common.degree_bits
    for c in (6533, 6533 + 8192, 1):
        results = run(common, proof, zeta, alpha, qidx, c % n)
        groups = Counter()
        for (_, _, _, x) in results:
            groups[pow(x, 1 << common.lde_bits, P)] += 1
        top = groups.most_common(3)
        print(f"g_exp={c}: {len(results)} solutions; "
              f"top coset classes: {[(hex(k), v) for k, v in top]}", flush=True)
        if top and top[0][1] >= len(qidx) - 2:
            C = top[0][0]
            sel = [r for r in results
                   if pow(r[3], 1 << common.lde_bits, P) == C]
            per_q = defaultdict(list)
            for qi, xi, t, x in sel:
                per_q[qi].append((xi, t, x))
            print(f"  !!! coset C={hex(C)} covers {len(per_q)}/{len(qidx)} "
                  f"queries")
            import json
            json.dump(
                {"g_exp": c, "C": hex(C),
                 "solutions": {str(qi): [(xi, t, hex(x)) for xi, t, x in v]
                               for qi, v in sorted(per_q.items())}},
                open("/tmp/fold0_solutions.json", "w"), indent=1)
            print("  wrote /tmp/fold0_solutions.json")


if __name__ == "__main__":
    main()
