"""Validate the solved level-1/level-2 FRI layouts on the reference proof.

For every query: interpolate the tree-1 coset fiber (16 values) at beta1
using the solved level-1 point layout (K1=6533 mod 8192, s1) and compare
to the tree-2 value at the solved level-2 layout (K2=389 mod 512, s2).
If this holds 28/28, the level-1 value layout — and hence the Y_q used by
the fiber-sum combine solver — is correct.
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

P = gl.P_INT
BD = "/root/reference/wormhole/bench-data"

K = 6533  # global root constant (mod 8192)
S1 = 6649786511859475384
S2 = 3400848380421331992


def interp_at(xs, vs, beta):
    """Lagrange interpolation of (xs base, vs ext) evaluated at ext beta."""
    n = len(xs)
    acc = gle.ZERO.copy()
    for k in range(n):
        num = gle.ONE.copy()
        den = 1
        for l in range(n):
            if l == k:
                continue
            num = gle.mul(num, gle.sub(beta, gle.from_base(np.uint64(xs[l]))))
            den = den * (xs[k] - xs[l]) % P
        term = gle.mul_base(gle.mul(vs[k], num), np.uint64(pow(den, P - 2, P)))
        acc = gle.add(acc, term)
    return acc


def main():
    common = serde.read_common_data(open(f"{BD}/common.bin", "rb").read())
    vdata = serde.read_verifier_data(open(f"{BD}/verifier.bin", "rb").read())
    proof = serde.read_proof(open(f"{BD}/proof.bin", "rb").read(), common)
    zeta, alpha, fri_betas, qidx = transcript(common, vdata, proof)
    fp = proof.opening_proof
    print("arities:", common.reduction_arity_bits, "lde_bits:", common.lde_bits)

    w13 = gl.primitive_root_of_unity(13)
    w9 = gl.primitive_root_of_unity(9)
    beta1 = fri_betas[1]

    ok = bad = 0
    for qi, idx in enumerate(qidx):
        j1 = idx >> 4          # level-1 index (2^13 domain)
        j2 = idx >> 8          # level-2 index (2^9 domain)
        # tree-1 fiber: leaf c = j1 >> 4 ships slots t=0..15 with points
        # s1 * w13^(K*rev13(16c+t))
        c = j1 >> 4
        step1 = fp.query_rounds[qi].steps[1]
        xs, vs = [], []
        for t in range(16):
            jj = 16 * c + t
            xs.append(int(gl.mul(np.uint64(S1),
                                 np.uint64(pow(w13, (K * bit_reverse(jj, 13))
                                               % 8192, P)))))
            vs.append(step1.evals[t])
        val = interp_at(xs, vs, beta1)
        # expected: tree-2 value at index j2, slot j2 & 15 of leaf j2>>4 —
        # Q2(s2 * w9^(K*rev9(j2)))... the *value* is shipped in steps[2]
        step2 = fp.query_rounds[qi].steps[2]
        t2 = j2 & 15
        found = [t for t in range(16)
                 if int(val[0]) == int(step2.evals[t][0])
                 and int(val[1]) == int(step2.evals[t][1])]
        match = t2 in found
        if match:
            ok += 1
        else:
            bad += 1
        print(f"q{qi}: idx={idx:6d} j1={j1:5d} j2={j2:4d} exp_slot={t2:2d} "
              f"found={found} {'OK' if match else 'X'}")
    print(f"fold1->2 consistency: {ok}/{ok+bad}")


if __name__ == "__main__":
    main()
