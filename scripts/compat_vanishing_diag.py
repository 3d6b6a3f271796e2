"""Diagnose the vanishing-identity mismatch on the reference proof.

With the upstream plonky2 term order (z1 ‖ pp ‖ gate, alpha ascending),
compute the residual D_i = reduce(terms, α_i) − Z_H(ζ)·Q_i(ζ) for both
challenges.  If exactly one term slot k carries an error e (independent of
alpha), then D_i = e·α_i^k, so D_1/D_0 = (α_1/α_0)^k — scan k.
Also scan for a pair of wrong slots (k1, k2): solve the 2x2 linear system
for (e1, e2) given each candidate pair and report pairs whose solution is
consistent (always solvable for k1≠k2 — instead report the pairs where
either error is "structured": equals a known term or a small multiple).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zk_circuits_tpu.compat import gates as gatesm
from zk_circuits_tpu.compat.serde import read_common_data, read_proof, read_verifier_data
from zk_circuits_tpu.hash.challenger import Challenger
from zk_circuits_tpu.host import gl, gle, poseidon as hposeidon

REF = "/root/reference/wormhole/bench-data"


def main():
    common = read_common_data(open(f"{REF}/common.bin", "rb").read())
    vd = read_verifier_data(open(f"{REF}/verifier.bin", "rb").read())
    proof = read_proof(open(f"{REF}/proof.bin", "rb").read(), common)

    nc = common.num_challenges
    n = common.degree
    op = proof.openings

    pis = np.asarray(proof.public_inputs, dtype=np.uint64)
    pi_hash = hposeidon.hash_no_pad(pis)

    ch = Challenger()
    ch.observe_hash(vd.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(proof.wires_cap)
    betas = ch.get_n_challenges(nc)
    gammas = ch.get_n_challenges(nc)
    ch.observe_cap(proof.plonk_zs_partial_products_cap)
    alphas = ch.get_n_challenges(nc)
    ch.observe_cap(proof.quotient_polys_cap)
    zeta = ch.get_extension_challenge()

    zeta_pow_n = gle.exp_power_of_2(zeta, common.degree_bits)
    zh_zeta = gle.sub(zeta_pow_n, gle.ONE)
    l0 = gle.mul(zh_zeta, gle.inverse(
        gle.mul_base(gle.sub(zeta, gle.ONE), np.uint64(n))))

    constants = [op.constants[i] for i in range(common.num_constants)]
    wires = [op.wires[i] for i in range(common.num_wires)]
    gate_terms = gatesm.evaluate_gate_constraints(common, constants, wires, pi_hash)

    z1_terms, pp_terms = [], []
    for i in range(nc):
        z_x = op.plonk_zs[i]
        z_gx = op.plonk_zs_next[i]
        z1_terms.append(gle.mul(l0, gle.sub(z_x, gle.ONE)))
        beta = gle.from_base(np.uint64(betas[i]))
        gamma = gle.from_base(np.uint64(gammas[i]))
        nums, dens = [], []
        for j in range(common.num_routed_wires):
            wire = op.wires[j]
            s_id = gle.mul_base(zeta, common.k_is[j])
            s_sigma = op.plonk_sigmas[j]
            nums.append(gle.add(gle.add(wire, gle.mul(beta, s_id)), gamma))
            dens.append(gle.add(gle.add(wire, gle.mul(beta, s_sigma)), gamma))
        accs = [z_x] + [op.partial_products[i * common.num_partial_products + k]
                        for k in range(common.num_partial_products)] + [z_gx]
        chunk = common.quotient_degree_factor
        n_chunks = common.num_routed_wires // chunk
        for k in range(n_chunks):
            np_ = gle.ONE.copy()
            dp_ = gle.ONE.copy()
            for j in range(k * chunk, (k + 1) * chunk):
                np_ = gle.mul(np_, nums[j])
                dp_ = gle.mul(dp_, dens[j])
            pp_terms.append(gle.sub(gle.mul(accs[k], np_), gle.mul(accs[k + 1], dp_)))

    terms = z1_terms + pp_terms + gate_terms
    m = len(terms)
    print(f"{m} terms: 2 z1 + {len(pp_terms)} pp + {len(gate_terms)} gate")

    qdf = common.quotient_degree_factor
    D = []
    A = []
    for i in range(nc):
        alpha = gle.from_base(np.uint64(alphas[i]))
        acc = gle.ZERO.copy()
        for t in reversed(terms):
            acc = gle.add(gle.mul(acc, alpha), t)
        q = gle.ZERO.copy()
        for t in reversed([op.quotient_polys[i * qdf + k] for k in range(qdf)]):
            q = gle.add(gle.mul(q, zeta_pow_n), t)
        D.append(gle.sub(acc, gle.mul(zh_zeta, q)))
        A.append(alpha)
        print(f"D[{i}] =", D[i])

    # single-slot scan: D1/D0 == (a1/a0)^k ?
    ratio = gle.mul(D[1], gle.inverse(D[0]))
    ar = gle.mul(A[1], gle.inverse(A[0]))
    cur = gle.ONE.copy()
    hit = None
    for k in range(m + qdf + 4):
        if np.array_equal(cur, ratio):
            hit = k
            break
        cur = gle.mul(cur, ar)
    if hit is not None:
        e = gle.mul(D[0], gle.inverse(gle.powmod(A[0], hit)))
        print(f"SINGLE-SLOT MATCH at k={hit}; error e = {e}")
        # which group?
        if hit < 2:
            print("  -> z1 term", hit)
        elif hit < 2 + len(pp_terms):
            print("  -> pp term", hit - 2)
        elif hit < m:
            print("  -> gate term", hit - 2 - len(pp_terms))
        else:
            print("  -> beyond terms (quotient side?)")
    else:
        print("no single-slot match")
        # also test: D_i proportional with ratio == (a1/a0)^k times a known
        # opening value change? report dlog-style info instead
        # pairs scan: D_i = e1*a^k1 + e2*a^k2 always solvable; look for pairs
        # where e2 == -e1 (a swap of two adjacent terms)
        inv = gle.inverse
        found = []
        for k1 in range(m):
            for k2 in range(k1 + 1, m):
                # solve e1*a0^k1 + e2*a0^k2 = D0 ; e1*a1^k1 + e2*a1^k2 = D1
                a0k1 = gle.powmod(A[0], k1); a0k2 = gle.powmod(A[0], k2)
                a1k1 = gle.powmod(A[1], k1); a1k2 = gle.powmod(A[1], k2)
                det = gle.sub(gle.mul(a0k1, a1k2), gle.mul(a0k2, a1k1))
                if not np.any(det):
                    continue
                det_i = inv(det)
                e1 = gle.mul(gle.sub(gle.mul(D[0], a1k2), gle.mul(D[1], a0k2)), det_i)
                e2 = gle.mul(gle.sub(gle.mul(D[1], a0k1), gle.mul(D[0], a1k1)), det_i)
                # swap signature: e1 = t_k2 - t_k1 and e2 = t_k1 - t_k2 = -e1
                if np.array_equal(e1, gle.neg(e2)):
                    dt = gle.sub(terms[k2], terms[k1])
                    tag = "SWAP-CONSISTENT" if np.array_equal(e1, dt) else "e1=-e2"
                    found.append((k1, k2, tag))
        for k1, k2, tag in found[:20]:
            print(f"pair ({k1},{k2}): {tag}")
        if not found:
            print("no e1=-e2 pair found either")


if __name__ == "__main__":
    main()
