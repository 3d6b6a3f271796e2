"""Search gate-constraint evaluation variants for the reference proof's
vanishing identity, holding the upstream plonky2 term order fixed
(z1 ‖ pp ‖ gate, alpha ascending, quotient chunks ascending).

Variants:
- constants opening layout: [selectors ‖ constants] vs [constants ‖ selectors]
- UNUSED_SELECTOR value: 2^32-1, num_gate_types, or no UNUSED factor
- filter row indexing: global gate row vs position within selector group
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


def evaluate_gates(common, constants_vec, wires, pi_hash, sel_first: bool,
                   unused, within_group: bool):
    num_sel = common.num_selectors
    if sel_first:
        selectors = constants_vec[:num_sel]
        local_constants = constants_vec[num_sel:]
    else:
        k = len(constants_vec) - num_sel
        local_constants = constants_vec[:k]
        selectors = constants_vec[k:]
    acc = [gatesm._ext(0) for _ in range(common.num_gate_constraints)]
    many = num_sel > 1
    for row, gate in enumerate(common.gates):
        sel_idx = common.selector_indices[row]
        group = common.selector_groups[sel_idx]
        s = selectors[sel_idx]
        prod = gatesm._ext(1)
        for i in range(group[0], group[1]):
            if i == row:
                continue
            v = (i - group[0]) if within_group else i
            prod = gle.mul(prod, gle.sub(gatesm._ext(v), s))
        if many and unused is not None:
            prod = gle.mul(prod, gle.sub(gatesm._ext(unused), s))
        ev = gatesm.EVALUATORS[gate.kind]
        for k2, c in enumerate(ev(gate, local_constants, wires, pi_hash)):
            acc[k2] = gle.add(acc[k2], gle.mul(prod, c))
    return acc


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

    constants_vec = [op.constants[i] for i in range(common.num_constants)]
    wires = [op.wires[i] for i in range(common.num_wires)]

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

    qdf = common.quotient_degree_factor
    rhs = []
    for i in range(nc):
        q = gle.ZERO.copy()
        for t in reversed([op.quotient_polys[i * qdf + k] for k in range(qdf)]):
            q = gle.add(gle.mul(q, zeta_pow_n), t)
        rhs.append(gle.mul(zh_zeta, q))

    num_gate_types = len(common.gates)
    for sel_first in (True, False):
        for unused in ((1 << 32) - 1, num_gate_types, None):
            for within in (False, True):
                gate_terms = evaluate_gates(
                    common, constants_vec, wires, pi_hash,
                    sel_first, unused, within)
                terms = z1_terms + pp_terms + gate_terms
                ok = True
                for i in range(nc):
                    alpha = gle.from_base(np.uint64(alphas[i]))
                    acc = gle.ZERO.copy()
                    for t in reversed(terms):
                        acc = gle.add(gle.mul(acc, alpha), t)
                    if not np.array_equal(acc, rhs[i]):
                        ok = False
                        break
                tag = (sel_first, unused, within)
                print(("FOUND " if ok else "no    "), tag)


if __name__ == "__main__":
    main()
