"""Layout-free scan over FRI combine-initial formula variants (compat).

compat_fold0_solve.py showed the upstream-plonky2 combine formula yields
ZERO (query, slot) base-field solutions on the reference proof — the true
pair must fail, so the fork's combine deviates.  This scans a family of
variants without any level-0 layout hypothesis:

    v * (x - p1)(x - p2) = m1*A' * (x - p2) + m2*B' * (x - p1)

with
  - m1, m2 in {+-alpha^e : e in {0, b0, b1, b0+b1}}  (shift/sign variants),
  - A' from reduce(evals - openings) with 24 batch0 block orders x 2
    reduce directions, B' with 2 directions,
  - (p1, p2) in {(zeta, zeta*g), (zeta*g, zeta)}.

For each (variant, query, slot) the shared-root condition of the two
component quadratics is tested by the resultant (zero iff common root);
false positives ~ 1/p.  A correct variant must hit >= 1 slot for (almost)
every query.  Reports all variants with >= 20/28 query coverage.
"""

import itertools
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zk_circuits_tpu.compat import serde
from zk_circuits_tpu.host import gl, gle

from compat_fold0_solve import transcript, reduce_pows, quad_roots

P = gl.P_INT
BD = "/root/reference/wormhole/bench-data"


def emul(a, b):
    return gle.mul(a, b)


def eadd(a, b):
    return gle.add(a, b)


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

    g_ext = gle.from_base(np.uint64(gl.primitive_root_of_unity(common.degree_bits)))
    zeta_g = gle.mul(zeta, g_ext)

    # --- per-query eval blocks (strip salts) -------------------------------
    blocks = []  # blocks[q] = [evals_o0, evals_o1, evals_o2, evals_o3]
    for qi in range(nq):
        rnd = fp.query_rounds[qi]
        blocks.append([
            [gle.from_base(x) for x in rnd.initial.evals[0][: inst[0]]],
            [gle.from_base(x) for x in rnd.initial.evals[1][: inst[1]]],
            [gle.from_base(x) for x in rnd.initial.evals[2][: inst[2]]],
            [gle.from_base(x) for x in rnd.initial.evals[3][: inst[3]]],
        ])

    # opening blocks in the same 4-oracle split (batch0 order == oracle
    # order when lookups are absent: constants‖sigmas, wires, zs‖pp, quot)
    assert common.num_lookup_polys == 0
    ob = [
        list(op.constants) + list(op.plonk_sigmas),
        list(op.wires),
        list(op.plonk_zs) + list(op.partial_products),
        list(op.quotient_polys),
    ]
    assert [len(x) for x in ob] == inst, ([len(x) for x in ob], inst)

    b0_len = sum(inst)
    b1_len = nc

    # B (batch1) per direction
    zs_open = list(op.plonk_zs_next)

    def reduce_dir(terms, direction):
        return reduce_pows(terms if direction == 0 else list(reversed(terms)),
                           alpha)

    B = {}
    for d in (0, 1):
        ro1 = reduce_dir(zs_open, d)
        B[d] = []
        for qi in range(nq):
            zsl = [blocks[qi][2][i] for i in range(nc)]
            re1 = reduce_dir(zsl, d)
            B[d].append(gle.sub(re1, ro1))

    # A per (order, direction); diff lists first (evals - openings commute
    # with reduce since reduce is linear)
    diffs = []  # diffs[q][oracle] = list of (eval - opening)
    for qi in range(nq):
        diffs.append([
            [gle.sub(e_, np.asarray(o_, dtype=np.uint64))
             for e_, o_ in zip(blocks[qi][k], ob[k])]
            for k in range(4)
        ])

    orders = list(itertools.permutations(range(4)))
    A = {}
    for order in orders:
        for d in (0, 1):
            key = (order, d)
            A[key] = []
            for qi in range(nq):
                flat = []
                for k in order:
                    flat += diffs[qi][k]
                A[key].append(reduce_dir(flat, d))

    # scalar multipliers
    exps = sorted({0, b0_len, b1_len, b0_len + b1_len})
    apow = {e: gle.powmod(alpha, e) for e in exps}
    ms = []
    for e in exps:
        ms.append((1, e))
        ms.append((-1, e))

    mvals = {(s, e): (apow[e] if s > 0 else gle.neg(apow[e])) for (s, e) in ms}

    # per-(q,slot) precomputed v, S_v = v*(p1+p2), T_v = v*p1*p2 for both
    # point orders (sum/product symmetric -> same for both!)
    zsum = eadd(zeta, zeta_g)
    zprod = emul(zeta, zeta_g)
    slots = fp.query_rounds[0].steps[0].evals.shape[0]
    V = [[fp.query_rounds[qi].steps[0].evals[t] for t in range(slots)]
         for qi in range(nq)]
    SV = [[emul(v, zsum) for v in row] for row in V]
    TV = [[emul(v, zprod) for v in row] for row in V]

    def resultant_zero(a, b, c):
        # a,b,c are GF(p^2) coeff arrays -> two scalar quadratics
        a0, a1 = int(a[0]), int(a[1])
        b0_, b1_ = int(b[0]), int(b[1])
        c0, c1 = int(c[0]), int(c[1])
        ac = (a0 * c1 - a1 * c0) % P
        ab = (a0 * b1_ - a1 * b0_) % P
        bc = (b0_ * c1 - b1_ * c0) % P
        return (ac * ac - ab * bc) % P == 0

    best = []
    for order in orders:
        for d in (0, 1):
            Akey = A[(order, d)]
            Bd = B[d]
            for m1k in ms:
                m1 = mvals[m1k]
                P1s = [emul(m1, Akey[qi]) for qi in range(nq)]
                for m2k in ms:
                    m2 = mvals[m2k]
                    P2s = [emul(m2, Bd[qi]) for qi in range(nq)]
                    for swap in (0, 1):
                        p1, p2 = (zeta, zeta_g) if swap == 0 else (zeta_g, zeta)
                        hits = 0
                        covered = 0
                        for qi in range(nq):
                            P1, P2 = P1s[qi], P2s[qi]
                            P12 = eadd(P1, P2)
                            U = eadd(emul(P1, p2), emul(P2, p1))
                            got = False
                            for t in range(slots):
                                v = V[qi][t]
                                bq = gle.sub(
                                    np.zeros(2, np.uint64),
                                    eadd(SV[qi][t], P12))
                                cq = eadd(TV[qi][t], U)
                                if resultant_zero(v, bq, cq):
                                    hits += 1
                                    got = True
                            covered += got
                            if qi - covered >= 8:
                                break  # early exit: can't reach 20
                        if covered >= 20:
                            best.append((covered, hits, order, d, m1k, m2k, swap))
                            print("HIT", covered, hits, order, d, m1k, m2k,
                                  "swap" if swap else "", flush=True)
    print(f"done; {len(best)} variants with >=20/28 coverage")


if __name__ == "__main__":
    main()
