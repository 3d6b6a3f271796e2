"""Solve the fork's FRI combine-initial formula with KNOWN query points.

Level-0 layout (compat_level0_solve + fit): tree-0 value at index i is
Q0(x(i)), x(i) = tau * w17^((70021*rev17(i) + 98304) mod 2^17), tau a
fixed 16th root of P - S1_old.  The verifier's combine at query index idx
must equal the shipped value at slot idx & 15:

    v_q = m1*A_q/(x_q - zeta) + m2*B_q/(x_q - eta)

with unknown global scalars m1, m2 and second opening point eta.
Multiply out -> linear in (eta, m1, m2, eta*m1); solve the 4-unknown
extension-linear system from 4 queries, verify on the other 24, check
eta*m1 consistency, and identify m1/m2 as alpha powers and eta/zeta as a
root of unity.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from zk_circuits_tpu.compat import serde
from zk_circuits_tpu.host import gl, gle

from compat_fold0_solve import transcript, reduce_pows
from compat_fold0_sum import bit_reverse
from compat_level0_solve import dlog

P = gl.P_INT
BD = "/root/reference/wormhole/bench-data"
S1_OLD = 6649786511859475384
K17 = 70021
C17 = 98304


def ext_solve(Mrows, rhs):
    """Gaussian elimination over GF(p^2): Mrows (n x n) ext, rhs (n,) ext."""
    n = len(rhs)
    M = [[Mrows[i][j].copy() for j in range(n)] for i in range(n)]
    b = [rhs[i].copy() for i in range(n)]
    for col in range(n):
        piv = next((r for r in range(col, n)
                    if int(M[r][col][0]) or int(M[r][col][1])), None)
        if piv is None:
            return None
        M[col], M[piv] = M[piv], M[col]
        b[col], b[piv] = b[piv], b[col]
        inv = gle.inverse(M[col][col])
        M[col] = [gle.mul(x, inv) for x in M[col]]
        b[col] = gle.mul(b[col], inv)
        for r in range(n):
            if r != col and (int(M[r][col][0]) or int(M[r][col][1])):
                f = M[r][col]
                M[r] = [gle.sub(x, gle.mul(f, y))
                        for x, y in zip(M[r], M[col])]
                b[r] = gle.sub(b[r], gle.mul(f, b[col]))
    return b


def main():
    common = serde.read_common_data(open(f"{BD}/common.bin", "rb").read())
    vdata = serde.read_verifier_data(open(f"{BD}/verifier.bin", "rb").read())
    proof = serde.read_proof(open(f"{BD}/proof.bin", "rb").read(), common)
    zeta, alpha, fri_betas, qidx = transcript(common, vdata, proof)
    op = proof.openings
    fp = proof.opening_proof
    nc = common.num_challenges
    salt = common.salt_size
    widths = common.oracle_widths
    inst = [widths[0], widths[1] - salt, widths[2] - salt, widths[3] - salt]
    nq = len(qidx)

    d = dlog(P - S1_OLD)
    tau = pow(7, d // 16, P)
    w17 = gl.primitive_root_of_unity(17)

    ro0 = reduce_pows(list(op.fri_batch0()), alpha)
    ro1 = reduce_pows(list(op.fri_batch1()), alpha)

    A, B, V, X = [], [], [], []
    for qi, idx in enumerate(qidx):
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
        A.append(gle.sub(re0, ro0))
        B.append(gle.sub(re1, ro1))
        V.append(fp.query_rounds[qi].steps[0].evals[idx & 15])
        e = (K17 * bit_reverse(idx, 17) + C17) % (1 << 17)
        X.append(int(gl.mul(np.uint64(tau), np.uint64(pow(w17, e, P)))))

    # unknown vector u = (eta, m1, m2, eta*m1)
    # v x^2 - v x zeta = eta*(v x - v zeta) + m1*(A x) + m2*(B x - B zeta)
    #                    - (eta*m1)*A
    def eqrow(q):
        x = gle.from_base(np.uint64(X[q]))
        vx = gle.mul(V[q], x)
        lhs = gle.mul(gle.sub(vx, gle.mul(V[q], zeta)), x)
        row = [
            gle.sub(vx, gle.mul(V[q], zeta)),
            gle.mul(A[q], x),
            gle.sub(gle.mul(B[q], x), gle.mul(B[q], zeta)),
            gle.neg(A[q]),
        ]
        return row, lhs

    rows, rhss = zip(*(eqrow(q) for q in range(4)))
    sol = ext_solve(list(rows), list(rhss))
    if sol is None:
        print("singular system")
        return
    eta, m1, m2, em1 = sol
    chk = gle.mul(eta, m1)
    print("eta  =", [hex(int(v)) for v in eta])
    print("m1   =", [hex(int(v)) for v in m1])
    print("m2   =", [hex(int(v)) for v in m2])
    print("eta*m1 consistent:", bool((chk == em1).all()))

    good = 0
    for q in range(nq):
        row, lhs = eqrow(q)
        acc = gle.ZERO.copy()
        for coef, u in zip(row, sol):
            acc = gle.add(acc, gle.mul(coef, u))
        good += int((acc == lhs).all())
    print(f"verified on {good}/{nq} queries")

    # identify: eta / zeta, eta / (zeta*g)
    g14 = np.uint64(gl.primitive_root_of_unity(common.degree_bits))
    ratio = gle.mul(eta, gle.inverse(zeta))
    print("eta/zeta =", [hex(int(v)) for v in ratio])
    if int(ratio[1]) == 0:
        r0 = int(ratio[0])
        # is it a power of w14?
        for e in range(1 << common.degree_bits):
            if pow(int(g14), e, P) == r0:
                print(f"eta = zeta * w14^{e}")
                break
    b0_len = sum(inst)
    b1_len = nc
    for name, m in (("m1", m1), ("m2", m2)):
        cur = gle.ONE.copy()
        for e in range(0, b0_len + b1_len + 3):
            if (cur == m).all():
                print(f"{name} = alpha^{e}")
            if (gle.neg(cur) == m).all():
                print(f"{name} = -alpha^{e}")
            cur = gle.mul(cur, alpha)


if __name__ == "__main__":
    main()
