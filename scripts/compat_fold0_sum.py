"""Permutation-free combine solve via fiber sums.

Tree-0's leaf for query q ships ALL 16 values of one coset fiber
{x0·mu^j} (mu^16 = 1).  If combine(x) = m1*A/(x - zeta) + m2*B/(x - eta)
for ANY fixed scalars m1, m2 and second opening point eta, then summing
over the fiber and using  sum_j 1/(x0 mu^j - a) = -16 a^15/(a^16 - y)
with y = x0^16:

    V_q := sum_t v_qt = m1*A_q*G(zeta, y_q) + m2*B_q*G(eta, y_q),
    G(a, y) = -16 a^15 / (a^16 - y).

y_q comes from the SOLVED level-1 layout (NOTES.md: K1 ≡ 6533 mod 8192,
s1 = 6649786511859475384, value at index j is Q1(s1·w13^(K1·rev13(j))),
j = idx >> 4) — no level-0 layout or slot assignment needed.

Scan eta = zeta * w14^c over all c in [0, 2^14) (the global-root theory
says c ≡ 6533 mod 8192, but the scan is cheap): solve (m1, m2) from two
queries, verify on the rest.  Also the swapped variant (A at eta, B at
zeta).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from zk_circuits_tpu.compat import serde
from zk_circuits_tpu.host import gl, gle

from compat_fold0_solve import transcript, reduce_pows

P = gl.P_INT
BD = "/root/reference/wormhole/bench-data"


def bit_reverse(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


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

    # --- per-query A, B, V, y ----------------------------------------------
    ro0 = reduce_pows(list(op.fri_batch0()), alpha)
    ro1 = reduce_pows(list(op.fri_batch1()), alpha)

    K1 = 6533
    S1 = 6649786511859475384
    w13 = gl.primitive_root_of_unity(13)

    A, B, V, Y = [], [], [], []
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
        vs = fp.query_rounds[qi].steps[0].evals  # (16, 2)
        acc = gle.ZERO.copy()
        for t in range(vs.shape[0]):
            acc = gle.add(acc, vs[t])
        V.append(acc)
        j = idx >> 4
        y = gl.mul(np.uint64(S1),
                   np.uint64(pow(w13, (K1 * bit_reverse(j, 13)) % (1 << 13), P)))
        Y.append(int(y))

    def G(a, y_int):
        """-16 a^15 / (a^16 - y); a is an extension element."""
        a15 = gle.powmod(a, 15)
        a16 = gle.mul(a15, a)
        denom = gle.sub(a16, gle.from_base(np.uint64(y_int)))
        num = gle.mul_base(a15, np.uint64(P - 16))
        return gle.mul(num, gle.inverse(denom))

    Gz = [G(zeta, Y[q]) for q in range(nq)]

    w14 = gl.primitive_root_of_unity(common.degree_bits)

    def try_eta(eta, swap):
        """combine = m1*A/(x-p1) + m2*B/(x-p2); p1,p2 = (zeta,eta) or
        swapped.  Returns (m1, m2) if consistent across all queries."""
        Ge = [G(eta, Y[q]) for q in range(nq)]
        if swap == 0:
            ca = [gle.mul(A[q], Gz[q]) for q in range(nq)]
            cb = [gle.mul(B[q], Ge[q]) for q in range(nq)]
        else:
            ca = [gle.mul(A[q], Ge[q]) for q in range(nq)]
            cb = [gle.mul(B[q], Gz[q]) for q in range(nq)]
        # Solve m1*ca0 + m2*cb0 = V0 ; m1*ca1 + m2*cb1 = V1  (ext 2x2)
        det = gle.sub(gle.mul(ca[0], cb[1]), gle.mul(ca[1], cb[0]))
        if int(det[0]) == 0 and int(det[1]) == 0:
            return None
        dinv = gle.inverse(det)
        m1 = gle.mul(gle.sub(gle.mul(V[0], cb[1]), gle.mul(V[1], cb[0])), dinv)
        m2 = gle.mul(gle.sub(gle.mul(ca[0], V[1]), gle.mul(ca[1], V[0])), dinv)
        for q in range(2, nq):
            lhs = gle.add(gle.mul(m1, ca[q]), gle.mul(m2, cb[q]))
            if not (int(lhs[0]) == int(V[q][0]) and int(lhs[1]) == int(V[q][1])):
                return None
        return m1, m2

    n14 = 1 << common.degree_bits
    hits = []
    for c in range(n14):
        eta = gle.mul_base(zeta, np.uint64(pow(w14, c, P)))
        for swap in (0, 1):
            r = try_eta(eta, swap)
            if r is not None:
                m1, m2 = r
                print(f"HIT c={c} swap={swap} "
                      f"m1={[hex(int(x)) for x in m1]} "
                      f"m2={[hex(int(x)) for x in m2]}", flush=True)
                hits.append((c, swap, m1, m2))
        if c % 2048 == 0:
            print(f"... c={c}", file=sys.stderr, flush=True)
    if hits:
        # identify m1, m2 as alpha powers if possible
        b0_len = sum(inst)
        b1_len = nc
        pows = {e: gle.powmod(alpha, e) for e in range(0, b0_len + b1_len + 2)}
        for c, swap, m1, m2 in hits:
            for name, m in (("m1", m1), ("m2", m2)):
                for e, ap in pows.items():
                    if int(ap[0]) == int(m[0]) and int(ap[1]) == int(m[1]):
                        print(f"  c={c} swap={swap}: {name} = alpha^{e}")
                    neg = gle.neg(ap)
                    if int(neg[0]) == int(m[0]) and int(neg[1]) == int(m[1]):
                        print(f"  c={c} swap={swap}: {name} = -alpha^{e}")
    print(f"done: {len(hits)} hits")


if __name__ == "__main__":
    main()
