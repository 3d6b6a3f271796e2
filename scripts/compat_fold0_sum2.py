"""Vectorized version of compat_fold0_sum.py: all 2^14 eta candidates at
once via bulk GF(p^2) numpy ops (the scalar loop timed out)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from zk_circuits_tpu.compat import serde
from zk_circuits_tpu.host import gl, gle

from compat_fold0_solve import transcript, reduce_pows
from compat_fold0_sum import bit_reverse

P = gl.P_INT
BD = "/root/reference/wormhole/bench-data"


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

    ro0 = reduce_pows(list(op.fri_batch0()), alpha)
    ro1 = reduce_pows(list(op.fri_batch1()), alpha)

    # Corrected level-1 layout (compat_level1_solve + offset decode,
    # validated 28/28): x_j = (P - S1) * w13^(4485 * rev13(j) mod 8192).
    K1 = 4485
    S1 = P - 6649786511859475384
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
        vs = fp.query_rounds[qi].steps[0].evals
        acc = gle.ZERO.copy()
        for t in range(vs.shape[0]):
            acc = gle.add(acc, vs[t])
        V.append(acc)
        j = idx >> 4
        Y.append(int(gl.mul(np.uint64(S1),
                            np.uint64(pow(w13, (K1 * bit_reverse(j, 13)) % 8192,
                                          P)))))
    A = np.stack(A)   # (nq, 2)
    B = np.stack(B)
    V = np.stack(V)
    Yb = np.array(Y, dtype=np.uint64)

    def G_batch(etas, y):
        """etas (M,2); y scalar u64 -> (M,2)."""
        e15 = gle.powmod(etas, 15)
        e16 = gle.mul(e15, etas)
        den = e16.copy()
        den[..., 0] = gl.sub(e16[..., 0], y)
        num = gle.mul_base(e15, np.uint64(P - 16))
        return gle.mul(num, gle.inverse(den))

    n14 = 1 << common.degree_bits
    w14 = np.uint64(gl.primitive_root_of_unity(common.degree_bits))
    gpow = gl.powers(w14, n14)                     # (n14,)
    etas = np.stack([gl.mul(np.uint64(zeta[0]), gpow),
                     gl.mul(np.uint64(zeta[1]), gpow)], axis=-1)  # (n14, 2)

    # G at zeta (scalar per query) and at every eta (n14, nq, 2)
    Gz = np.stack([np.asarray(
        G_batch(zeta[None, :], Yb[q]))[0] for q in range(nq)])   # (nq,2)
    Ge = np.stack([np.asarray(G_batch(etas, Yb[q]))
                   for q in range(nq)], axis=1)                  # (n14, nq, 2)

    for swap in (0, 1):
        if swap == 0:
            ca = gle.mul(A, Gz)[None, :, :]                  # (1, nq, 2)
            ca = np.broadcast_to(ca, Ge.shape).copy()
            cb = gle.mul(np.broadcast_to(B[None], Ge.shape), Ge)
        else:
            ca = gle.mul(np.broadcast_to(A[None], Ge.shape), Ge)
            cb = gle.mul(B, Gz)[None, :, :]
            cb = np.broadcast_to(cb, Ge.shape).copy()
        # solve 2x2 from queries 0,1 per eta
        det = gle.sub(gle.mul(ca[:, 0], cb[:, 1]), gle.mul(ca[:, 1], cb[:, 0]))
        dinv = gle.inverse(det)
        m1 = gle.mul(gle.sub(gle.mul(V[None, 0], cb[:, 1]),
                             gle.mul(V[None, 1], cb[:, 0])), dinv)
        m2 = gle.mul(gle.sub(gle.mul(ca[:, 0], V[None, 1]),
                             gle.mul(ca[:, 1], V[None, 0])), dinv)
        ok = np.ones(Ge.shape[0], dtype=bool)
        for q in range(2, nq):
            lhs = gle.add(gle.mul(m1, ca[:, q]), gle.mul(m2, cb[:, q]))
            ok &= (lhs[:, 0] == V[q, 0]) & (lhs[:, 1] == V[q, 1])
            if not ok.any():
                break
        hits = np.nonzero(ok)[0]
        for c in hits:
            print(f"HIT swap={swap} c={int(c)} "
                  f"m1={[hex(int(x)) for x in m1[c]]} "
                  f"m2={[hex(int(x)) for x in m2[c]]}", flush=True)
        print(f"swap={swap}: {len(hits)} hits", flush=True)


if __name__ == "__main__":
    main()
