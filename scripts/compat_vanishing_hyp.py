"""Targeted vanishing-identity hypothesis tests on the reference proof.

With the FRI side fully solved (fork generator g0), the vanishing identity
is the last failing check.  Test semantic variants never covered by the
round-2 recombination scan: challenge ASSIGNMENT (betas/gammas interleaved
vs blocked), term sign flips per group, num/den swap, and combinations.
"""

import itertools
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
    bg = ch.get_n_challenges(2 * nc)
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
    qdf = common.quotient_degree_factor
    quotients = []
    for i in range(nc):
        q = gle.ZERO.copy()
        for t in reversed([op.quotient_polys[i * qdf + k] for k in range(qdf)]):
            q = gle.add(gle.mul(q, zeta_pow_n), t)
        quotients.append(gle.mul(zh_zeta, q))

    def build_terms(betas, gammas, num_den_swap, pp_sign, z1_sign, gate_sign):
        z1_terms, pp_terms = [], []
        for i in range(nc):
            z_x = op.plonk_zs[i]
            z_gx = op.plonk_zs_next[i]
            t = gle.mul(l0, gle.sub(z_x, gle.ONE))
            z1_terms.append(gle.neg(t) if z1_sign else t)
            beta = gle.from_base(np.uint64(betas[i]))
            gamma = gle.from_base(np.uint64(gammas[i]))
            nums, dens = [], []
            for j in range(common.num_routed_wires):
                wire = op.wires[j]
                s_id = gle.mul_base(zeta, common.k_is[j])
                s_sigma = op.plonk_sigmas[j]
                a = gle.add(gle.add(wire, gle.mul(beta, s_id)), gamma)
                b = gle.add(gle.add(wire, gle.mul(beta, s_sigma)), gamma)
                if num_den_swap:
                    a, b = b, a
                nums.append(a)
                dens.append(b)
            accs = [z_x] + [op.partial_products[i * common.num_partial_products + k]
                            for k in range(common.num_partial_products)] + [z_gx]
            n_chunks = common.num_routed_wires // qdf
            for k in range(n_chunks):
                np_ = gle.ONE.copy()
                dp_ = gle.ONE.copy()
                for j in range(k * qdf, (k + 1) * qdf):
                    np_ = gle.mul(np_, nums[j])
                    dp_ = gle.mul(dp_, dens[j])
                t = gle.sub(gle.mul(accs[k], np_), gle.mul(accs[k + 1], dp_))
                pp_terms.append(gle.neg(t) if pp_sign else t)
        gts = [gle.neg(t) for t in gate_terms] if gate_sign else gate_terms
        return z1_terms + pp_terms + list(gts)

    assignments = {
        "blocked[bb|gg]": (bg[:nc], bg[nc:]),
        "interleaved[bg,bg]": ([bg[0], bg[2]], [bg[1], bg[3]]),
        "gammas-first": (bg[nc:], bg[:nc]),
        "interleaved[gb,gb]": ([bg[1], bg[3]], [bg[0], bg[2]]),
    }
    hits = []
    for aname, (betas, gammas) in assignments.items():
        for nds, pps, z1s, gs in itertools.product((0, 1), repeat=4):
            terms = build_terms(betas, gammas, nds, pps, z1s, gs)
            ok = True
            for i in range(nc):
                alpha = gle.from_base(np.uint64(alphas[i]))
                acc = gle.ZERO.copy()
                for t in reversed(terms):
                    acc = gle.add(gle.mul(acc, alpha), t)
                if not np.array_equal(acc, quotients[i]):
                    ok = False
                    break
            if ok:
                print(f"MATCH: {aname} num_den_swap={nds} pp_sign={pps} "
                      f"z1_sign={z1s} gate_sign={gs}", flush=True)
                hits.append((aname, nds, pps, z1s, gs))
    print(f"done: {len(hits)} hits")


if __name__ == "__main__":
    main()
