"""Solve the level-0 FRI slot rule from fold0->1 consistency.

Prerequisite: the CORRECTED level-1 layout (compat_level1_solve):
point1(j) = (P - S1) * w13^(4485 * rev13(j) mod 8192).

For each query, tree-0 leaf idx>>4 ships the 16 values of the fiber over
point1(idx>>4); its fold at beta0 must equal the shipped tree-1 value at
slot (idx>>4) & 15.  Fiber points: x_t = r_q * mu^e(t) with
r_q = tau * w17^(4485*rev13(idx>>4) mod 8192), tau a fixed 16th root of
(P - S1) (computed by Pohlig-Hellman dlog base 7), mu = w17^8192.
Search e(t) = a*sigma(t) + b per query; a, sigma must be global.
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
S1_OLD = 6649786511859475384
G = 7  # multiplicative generator


def dlog(a: int) -> int:
    """Discrete log base 7 in GF(p); p-1 = 2^32 * 3 * 5 * 17 * 257 * 65537."""
    n = P - 1
    residues = []
    moduli = []
    for q in (3, 5, 17, 257, 65537):
        e = n // q
        target = pow(a, e, P)
        base = pow(G, e, P)
        x = 0
        cur = 1
        while cur != target:
            cur = cur * base % P
            x += 1
            if x > q:
                raise ValueError("dlog fail")
        residues.append(x % q)
        moduli.append(q)
    # 2^32 part, bit by bit
    d2 = 0
    ginv = pow(G, P - 2, P)
    for k in range(32):
        t = pow(a * pow(ginv, d2, P) % P, n >> (k + 1), P)
        if t != 1:
            d2 += 1 << k
    residues.append(d2)
    moduli.append(1 << 32)
    # CRT
    from math import prod
    x = 0
    for r, m in zip(residues, moduli):
        M = n // m
        x = (x + r * M * pow(M, -1, m)) % n
    assert pow(G, x, P) == a % P, "dlog verify"
    return x


def main():
    common = serde.read_common_data(open(f"{BD}/common.bin", "rb").read())
    vdata = serde.read_verifier_data(open(f"{BD}/verifier.bin", "rb").read())
    proof = serde.read_proof(open(f"{BD}/proof.bin", "rb").read(), common)
    zeta, alpha, fri_betas, qidx = transcript(common, vdata, proof)
    fp = proof.opening_proof
    w17 = gl.primitive_root_of_unity(17)
    mu_pows = [pow(w17, 8192 * e, P) for e in range(16)]
    beta0 = fri_betas[0]
    K = 4485
    S1 = P - S1_OLD

    d = dlog(S1)
    print(f"dlog_7(-S1_old) = {hex(d)}  (mod 16 = {d % 16})", flush=True)
    assert d % 16 == 0, "-S1 not a 16th power?!"
    tau = pow(G, d // 16, P)
    assert pow(tau, 16, P) == S1

    per_q = []
    for qi, idx in enumerate(qidx):
        j1 = idx >> 4
        step0 = fp.query_rounds[qi].steps[0]
        step1 = fp.query_rounds[qi].steps[1]
        got = step1.evals[j1 & 15]
        r = gl.mul(np.uint64(tau),
                   np.uint64(pow(w17, (K * bit_reverse(j1, 13)) % 8192, P)))
        sols = []
        for use_rev in (0, 1):
            for a in range(1, 16, 2):
                for b in range(16):
                    xs = []
                    for t in range(16):
                        st = bit_reverse(t, 4) if use_rev else t
                        e = (a * st + b) % 16
                        xs.append(int(gl.mul(r, np.uint64(mu_pows[e]))))
                    val = interp_at(xs, [step0.evals[t] for t in range(16)],
                                    beta0)
                    if int(val[0]) == int(got[0]) and int(val[1]) == int(got[1]):
                        sols.append((use_rev, a, b))
        per_q.append((qi, j1, sols))
        print(f"q{qi}: j1={j1:5d} sols={sols}", flush=True)

    from collections import Counter
    ra = Counter()
    for _, _, sols in per_q:
        for ur, a, b in sols:
            ra[(ur, a)] += 1
    print("\n(use_rev, a) coverage:", ra.most_common(5))


if __name__ == "__main__":
    main()
