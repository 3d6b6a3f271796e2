"""Structural residual analysis of the vanishing identity.

D_i = combined(alpha_i) - Z_H*Q_i is known for both challenges.  If the
fork's terms differ from ours by a UNIFORM transformation of one
contiguous slot group G — t'_k = c*t_k (scale/sign), or the group is
shifted by one slot — then D_i = sum_{k in G} alpha_i^k*(t'_k - t_k) has
a closed form linear in one unknown; solve it from challenge 0 and check
challenge 1.  Scans all ~10.6k contiguous groups for:
  (a) scale:    D = (c-1) * S_i(G),  S_i(G) = sum_{k in G} a_i^k t_k
  (b) shift+1:  terms of G appear one slot later (and a gap at G.start)
  (c) reversal: group G's terms in reverse order
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
    gate_terms = gatesm.evaluate_gate_constraints(common, constants, wires,
                                                  pi_hash)
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
            nums.append(gle.add(gle.add(wire, gle.mul(beta, s_id)), gamma))
            dens.append(gle.add(gle.add(wire, gle.mul(beta, op.plonk_sigmas[j])),
                                gamma))
        accs = [z_x] + [op.partial_products[i * common.num_partial_products + k]
                        for k in range(common.num_partial_products)] + [z_gx]
        q = common.quotient_degree_factor
        for k in range(common.num_routed_wires // q):
            np_ = gle.ONE.copy()
            dp_ = gle.ONE.copy()
            for j in range(k * q, (k + 1) * q):
                np_ = gle.mul(np_, nums[j])
                dp_ = gle.mul(dp_, dens[j])
            pp_terms.append(gle.sub(gle.mul(accs[k], np_),
                                    gle.mul(accs[k + 1], dp_)))
    terms = z1_terms + pp_terms + list(gate_terms)
    m = len(terms)

    qdf = common.quotient_degree_factor
    D, A = [], []
    for i in range(nc):
        alpha = gle.from_base(np.uint64(alphas[i]))
        acc = gle.ZERO.copy()
        for t in reversed(terms):
            acc = gle.add(gle.mul(acc, alpha), t)
        qv = gle.ZERO.copy()
        for t in reversed([op.quotient_polys[i * qdf + k] for k in range(qdf)]):
            qv = gle.add(gle.mul(qv, zeta_pow_n), t)
        D.append(gle.sub(acc, gle.mul(zh_zeta, qv)))
        A.append(alpha)

    # power tables: P[i][k] = alpha_i^k
    P = []
    for i in range(nc):
        row = [gle.ONE.copy()]
        for k in range(1, m + 2):
            row.append(gle.mul(row[-1], A[i]))
        P.append(row)

    def weighted(i, lo, hi, shift=0, reverse=False):
        acc = gle.ZERO.copy()
        for k in range(lo, hi):
            kk = hi - 1 - (k - lo) if reverse else k
            acc = gle.add(acc, gle.mul(P[i][k + shift], terms[kk]))
        return acc

    hits = 0
    for lo in range(m):
        for hi in range(lo + 1, m + 1):
            # (a) scale: D_i = c' * S_i  (c' = c-1)
            S0 = weighted(0, lo, hi)
            S1 = weighted(1, lo, hi)
            if np.any(S0):
                cp = gle.mul(D[0], gle.inverse(S0))
                if np.array_equal(gle.mul(cp, S1), D[1]):
                    print(f"SCALE group [{lo},{hi}): c-1 = "
                          f"{[hex(int(v)) for v in cp]}")
                    hits += 1
            # (b) shift by +1: D_i = sum (a^{k+1}-a^k) t_k over G
            Sh0 = gle.sub(weighted(0, lo, hi, shift=1), S0)
            Sh1 = gle.sub(weighted(1, lo, hi, shift=1), S1)
            if np.array_equal(Sh0, D[0]) and np.array_equal(Sh1, D[1]):
                print(f"SHIFT+1 group [{lo},{hi})")
                hits += 1
            # (c) reversal of the group
            R0 = gle.sub(weighted(0, lo, hi, reverse=True), S0)
            R1 = gle.sub(weighted(1, lo, hi, reverse=True), S1)
            if np.array_equal(R0, D[0]) and np.array_equal(R1, D[1]):
                print(f"REVERSED group [{lo},{hi})")
                hits += 1
    print(f"done; {hits} structural hits  (slots: 0-1 z1, 2-21 pp, "
          f"22-{m-1} gate)")


if __name__ == "__main__":
    main()
