"""Vanishing-identity scan over challenger pop-offset variants.

Duplex-challenger squeezes are transcript-invisible: absorbing resets the
output buffer, so the fork could pop EXTRA challenges before/<between>
betas, gammas, alphas (e.g. lookup deltas drawn unconditionally) without
affecting zeta / fri_alpha / PoW / query indices (all verified).  Scan
beta/gamma/alpha pop offsets within their 8-element squeeze windows.
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
    bg_window = ch.get_n_challenges(8)   # full squeeze window (pop order)
    ch.observe_cap(proof.plonk_zs_partial_products_cap)
    a_window = ch.get_n_challenges(8)
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
    qdf = common.quotient_degree_factor

    def rhs(i):
        q = gle.ZERO.copy()
        for t in reversed([op.quotient_polys[i * qdf + k] for k in range(qdf)]):
            q = gle.add(gle.mul(q, zeta_pow_n), t)
        return gle.mul(zh_zeta, q)

    R = [rhs(i) for i in range(nc)]

    def check(betas, gammas, alphas):
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
                dens.append(gle.add(
                    gle.add(wire, gle.mul(beta, op.plonk_sigmas[j])), gamma))
            accs = [z_x] + [op.partial_products[i * common.num_partial_products + k]
                            for k in range(common.num_partial_products)] + [z_gx]
            for k in range(common.num_routed_wires // qdf):
                np_ = gle.ONE.copy()
                dp_ = gle.ONE.copy()
                for j in range(k * qdf, (k + 1) * qdf):
                    np_ = gle.mul(np_, nums[j])
                    dp_ = gle.mul(dp_, dens[j])
                pp_terms.append(gle.sub(gle.mul(accs[k], np_),
                                        gle.mul(accs[k + 1], dp_)))
        terms = z1_terms + pp_terms + list(gate_terms)
        for i in range(nc):
            alpha = gle.from_base(np.uint64(alphas[i]))
            acc = gle.ZERO.copy()
            for t in reversed(terms):
                acc = gle.add(gle.mul(acc, alpha), t)
            if not np.array_equal(acc, R[i]):
                return False
        return True

    hits = 0
    for ob in range(5):            # extra pops before betas
        for og in range(5):        # extra pops between gammas start
            if ob + og + 4 > 8:
                continue
            betas = bg_window[ob : ob + nc]
            gammas = bg_window[ob + nc + og : ob + 2 * nc + og]
            if len(gammas) < nc:
                continue
            for oa in range(7):    # extra pops before alphas
                alphas = a_window[oa : oa + nc]
                if check(betas, gammas, alphas):
                    print(f"MATCH ob={ob} og={og} oa={oa}", flush=True)
                    hits += 1
    print(f"done: {hits} hits")


if __name__ == "__main__":
    main()
