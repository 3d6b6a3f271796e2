"""Search for the qp-plonky2 fork's vanishing-identity term convention.

Loads the reference's own proof artifacts (bench-data), re-derives the
Fiat-Shamir challenges (already proven bit-exact), computes the three
candidate term groups (z1, partial-product, filtered gate constraints),
and brute-forces combination conventions until
    combine(terms, alpha_i) == Z_H(zeta) * Q_i(zeta)
holds for BOTH challenge indices.

Knobs searched:
- order of the three groups (6 permutations)
- alpha-power direction (terms[0] lowest vs highest power)
- quotient-chunk combination direction (zeta^n powers asc/desc)
- gate-constraint slot order (as-is vs reversed)
- all-challenge terms vs only challenge-i's z1/pp terms
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
    fp = proof.opening_proof

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
    print("challenges ok: zeta =", zeta)

    zeta_pow_n = gle.exp_power_of_2(zeta, common.degree_bits)
    zh_zeta = gle.sub(zeta_pow_n, gle.ONE)
    l0 = gle.mul(zh_zeta, gle.inverse(
        gle.mul_base(gle.sub(zeta, gle.ONE), np.uint64(n))))

    constants = [op.constants[i] for i in range(common.num_constants)]
    wires = [op.wires[i] for i in range(common.num_wires)]
    gate_terms = gatesm.evaluate_gate_constraints(common, constants, wires, pi_hash)
    print(f"{len(gate_terms)} gate terms, num_pp={common.num_partial_products}, "
          f"qdf={common.quotient_degree_factor}")

    # per-challenge z1 and pp term groups
    z1_by_c, pp_by_c = [], []
    for i in range(nc):
        z_x = op.plonk_zs[i]
        z_gx = op.plonk_zs_next[i]
        z1_by_c.append([gle.mul(l0, gle.sub(z_x, gle.ONE))])
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
        terms = []
        for k in range(n_chunks):
            np_ = gle.ONE.copy()
            dp_ = gle.ONE.copy()
            for j in range(k * chunk, (k + 1) * chunk):
                np_ = gle.mul(np_, nums[j])
                dp_ = gle.mul(dp_, dens[j])
            terms.append(gle.sub(gle.mul(accs[k], np_), gle.mul(accs[k + 1], dp_)))
        pp_by_c.append(terms)

    qdf = common.quotient_degree_factor

    def reduce_terms(terms, alpha, ascending):
        acc = gle.ZERO.copy()
        seq = terms if not ascending else list(reversed(terms))
        # descending fold: acc = acc*alpha + t gives terms[0] highest power
        for t in seq:
            acc = gle.add(gle.mul(acc, alpha), t)
        return acc

    def quotient_eval(i, asc):
        chunks = [op.quotient_polys[i * qdf + t] for t in range(qdf)]
        if not asc:
            chunks = list(reversed(chunks))
        # ascending powers of zeta^n over chunk list
        acc = gle.ZERO.copy()
        for t in reversed(chunks):
            acc = gle.add(gle.mul(acc, zeta_pow_n), t)
        return acc

    group_names = ["z1", "pp", "gate"]
    found = []
    for perm in itertools.permutations(range(3)):
        for asc in (True, False):
            for qasc in (True, False):
                for grev in (False, True):
                    for per_challenge in (False, True):
                        ok = True
                        for i in range(nc):
                            alpha = gle.from_base(np.uint64(alphas[i]))
                            gt = list(reversed(gate_terms)) if grev else gate_terms
                            if per_challenge:
                                groups = {0: z1_by_c[i], 1: pp_by_c[i], 2: gt}
                            else:
                                groups = {
                                    0: [t for c in range(nc) for t in z1_by_c[c]],
                                    1: [t for c in range(nc) for t in pp_by_c[c]],
                                    2: gt,
                                }
                            terms = []
                            for g in perm:
                                terms.extend(groups[g])
                            combined = reduce_terms(terms, alpha, asc)
                            rhs = gle.mul(zh_zeta, quotient_eval(i, qasc))
                            if not np.array_equal(combined, rhs):
                                ok = False
                                break
                        if ok:
                            tag = (tuple(group_names[g] for g in perm), asc, qasc,
                                   grev, per_challenge)
                            print("FOUND:", tag)
                            found.append(tag)
    if not found:
        print("no convention matched (searched "
              "6 perms x 2 dir x 2 qdir x 2 grev x 2 scope = 96 combos)")


if __name__ == "__main__":
    main()
