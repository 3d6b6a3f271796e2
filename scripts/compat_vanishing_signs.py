"""Sign-variant scan for the vanishing identity: per-gate constraint
negation (c vs -c, e.g. `wire - value` vs `value - wire`), plus z1/pp
group signs and alpha-power direction.  These are NOT covered by the
contiguous-group scale scans (a sign flip of one gate's contribution to a
SHARED slot is not a scale of the aggregated slot value)."""

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zk_circuits_tpu.compat.serde import (read_common_data, read_proof,
                                          read_verifier_data)
from zk_circuits_tpu.compat import poseidon_fast as pf
from zk_circuits_tpu.hash.challenger import Challenger
from zk_circuits_tpu.host import gl, poseidon as hposeidon
from compat_poseidon_layout import (IntAlg, eadd, esub, emul, escale, einv,
                                    to_int, eval_poseidon_roles,
                                    section_indices, P, REF)


def main():
    common = read_common_data(open(f"{REF}/common.bin", "rb").read())
    vd = read_verifier_data(open(f"{REF}/verifier.bin", "rb").read())
    proof = read_proof(open(f"{REF}/proof.bin", "rb").read(), common)
    nc = common.num_challenges
    op = proof.openings
    pis = np.asarray(proof.public_inputs, dtype=np.uint64)
    pi_hash = hposeidon.hash_no_pad(pis)
    ch = Challenger()
    ch.observe_hash(vd.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(proof.wires_cap)
    betas = [int(b) for b in ch.get_n_challenges(nc)]
    gammas = [int(g) for g in ch.get_n_challenges(nc)]
    ch.observe_cap(proof.plonk_zs_partial_products_cap)
    alphas = [int(a) for a in ch.get_n_challenges(nc)]
    ch.observe_cap(proof.quotient_polys_cap)
    zeta = to_int(ch.get_extension_challenge())

    wires = [to_int(op.wires[i]) for i in range(common.num_wires)]
    consts = [to_int(op.constants[i]) for i in range(common.num_constants)]
    sigmas = [to_int(op.plonk_sigmas[i]) for i in range(common.num_routed_wires)]

    zeta_pow_n = zeta
    for _ in range(common.degree_bits):
        zeta_pow_n = emul(zeta_pow_n, zeta_pow_n)
    zh = esub(zeta_pow_n, (1, 0))
    l0 = emul(zh, einv(escale(esub(zeta, (1, 0)), common.degree)))

    qdf = common.quotient_degree_factor
    rhs = []
    for i in range(nc):
        q = (0, 0)
        for t in reversed([to_int(op.quotient_polys[i * qdf + k]) for k in range(qdf)]):
            q = eadd(emul(q, zeta_pow_n), t)
        rhs.append(emul(zh, q))

    zs = [to_int(op.plonk_zs[i]) for i in range(nc)]
    zs_next = [to_int(op.plonk_zs_next[i]) for i in range(nc)]
    npp = common.num_partial_products
    pps = [to_int(op.partial_products[i]) for i in range(nc * npp)]
    k_is = [int(k) for k in common.k_is]

    z1_terms, pp_terms = [], []
    for i in range(nc):
        z_x, z_gx = zs[i], zs_next[i]
        z1_terms.append(emul(l0, esub(z_x, (1, 0))))
        beta, gamma = betas[i], gammas[i]
        nums, dens = [], []
        for j in range(common.num_routed_wires):
            wv = wires[j]
            s_id = escale(zeta, k_is[j])
            nums.append(eadd(eadd(wv, escale(s_id, beta)), (gamma, 0)))
            dens.append(eadd(eadd(wv, escale(sigmas[j], beta)), (gamma, 0)))
        accs = [z_x] + [pps[i * npp + k] for k in range(npp)] + [z_gx]
        for k in range(common.num_routed_wires // qdf):
            np_, dp_ = (1, 0), (1, 0)
            for j in range(k * qdf, (k + 1) * qdf):
                np_ = emul(np_, nums[j])
                dp_ = emul(dp_, dens[j])
            pp_terms.append(esub(emul(accs[k], np_), emul(accs[k + 1], dp_)))

    # per-gate unfiltered constraints + filters (upstream conventions)
    selectors = consts[:common.num_selectors]
    gconsts = consts[common.num_selectors:]
    UNUSED = (1 << 32) - 1
    many = common.num_selectors > 1
    ngc = common.num_gate_constraints
    per_gate = {}     # kind -> (filter, constraints list)
    for row, gate in enumerate(common.gates):
        sel_idx = common.selector_indices[row]
        group = common.selector_groups[sel_idx]
        s = selectors[sel_idx]
        filt = (1, 0)
        for i in range(group[0], group[1]):
            if i == row:
                continue
            filt = emul(filt, esub((i, 0), s))
        if many:
            filt = emul(filt, esub((UNUSED, 0), s))
        if gate.kind == "PoseidonGate":
            roles = section_indices(("swap", "delta", "f0", "part", "f1"), {})
            cs = eval_poseidon_roles(wires, roles)
        elif gate.kind == "ArithmeticGate":
            cs = []
            for i in range(gate.params["num_ops"]):
                m0, m1, ad, outw = wires[4 * i:4 * i + 4]
                cs.append(esub(eadd(emul(gconsts[0], emul(m0, m1)),
                                    emul(gconsts[1], ad)), outw))
        elif gate.kind == "BaseSumGate":
            nl, b = gate.params["num_limbs"], gate.params["base"]
            sw = wires[0]
            limbs = [wires[1 + i] for i in range(nl)]
            acc = (0, 0)
            for limb in reversed(limbs):
                acc = eadd(escale(acc, b), limb)
            cs = [esub(acc, sw)]
            for limb in limbs:
                prod = limb
                for j in range(1, b):
                    prod = emul(prod, esub(limb, (j, 0)))
                cs.append(prod)
        elif gate.kind == "ConstantGate":
            cs = [esub(gconsts[i], wires[i]) for i in range(gate.params["num_consts"])]
        elif gate.kind == "PublicInputGate":
            cs = [esub(wires[i], ((int(pi_hash[i])) % P, 0)) for i in range(4)]
        else:
            cs = []
        per_gate[gate.kind] = (filt, cs)

    alpha_pows = []
    for i in range(nc):
        a = (alphas[i], 0)
        pw = [(1, 0)]
        for _ in range(160):
            pw.append(emul(pw[-1], a))
        alpha_pows.append(pw)

    # Per-challenge combined contribution of each group (for fast +/- scans)
    def comb(terms, offset, i):
        acc = (0, 0)
        pw = alpha_pows[i]
        for k, t in enumerate(terms):
            acc = eadd(acc, emul(pw[offset + k], t))
        return acc

    gate_kinds = [g.kind for g in common.gates if g.kind != "NoopGate"]
    contrib = {}
    for i in range(nc):
        contrib[("z1", i)] = comb(z1_terms, 0, i)
        contrib[("pp", i)] = comb(pp_terms, 2, i)
        for kind in gate_kinds:
            filt, cs = per_gate[kind]
            contrib[(kind, i)] = comb([emul(filt, c) for c in cs], 22, i)

    groups = ["z1", "pp"] + gate_kinds
    n_found = 0
    for signs in itertools.product((1, -1), repeat=len(groups)):
        ok = True
        for i in range(nc):
            acc = (0, 0)
            for g, s in zip(groups, signs):
                c = contrib[(g, i)]
                acc = eadd(acc, c if s > 0 else ((-c[0]) % P, (-c[1]) % P))
            if acc != rhs[i]:
                ok = False
                break
        if ok:
            print("FOUND signs:", dict(zip(groups, signs)), flush=True)
            n_found += 1
    print("sign combos tried:", 2 ** len(groups), "found:", n_found)

    # Also: alpha-direction flip (terms combined with descending powers)
    rev_pows = []
    for i in range(nc):
        pw = alpha_pows[i]
        rev_pows.append([pw[144 - k] for k in range(145)])
    all_terms = z1_terms + pp_terms
    pose_filt, pose_cs = per_gate["PoseidonGate"]
    acc123 = [(0, 0)] * ngc
    for kind in gate_kinds:
        filt, cs = per_gate[kind]
        for k, c in enumerate(cs):
            acc123[k] = eadd(acc123[k], emul(filt, c))
    full = all_terms + acc123
    for i in range(nc):
        acc = (0, 0)
        for k, t in enumerate(full):
            acc = eadd(acc, emul(rev_pows[i][k], t))
        print("alpha-desc challenge", i, "match:", acc == rhs[i])


if __name__ == "__main__":
    main()
