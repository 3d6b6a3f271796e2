"""Poseidon-gate WIRE-LAYOUT search for the reference vanishing identity.

The 184k-variant constraint-order sweep (compat_vanishing_perm.py) found
nothing, so the deviation is value-level: the fork's Poseidon gate reads its
sbox-checkpoint wires from different positions than upstream plonky2.  This
script evaluates the (upstream-semantics) Poseidon gate under enumerated
role->wire assignments:

  sections: swap(1), delta(4), f0(36 = rounds x lanes), part(22), f1(48)
  axes: section order over [24,135); f0/f1 round-major vs lane-major,
        lane/round reversal; partial reversal; f0 recording rounds 1..3
        (upstream) vs 0..2; delta wire order; delta sign conventions.

Checks the full vanishing identity (both alphas) at zeta for each variant.
"""

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

REF = "/root/reference/wormhole/bench-data"
P = gl.P_INT
W = 7
W12 = 12


def eadd(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def esub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def emul(a, b):
    return ((a[0] * b[0] + W * a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)


def escale(a, s):
    return ((a[0] * s) % P, (a[1] * s) % P)


def einv(a):
    n = (a[0] * a[0] - W * a[1] * a[1]) % P
    ninv = pow(n, P - 2, P)
    return ((a[0] * ninv) % P, (-a[1] * ninv) % P)


def to_int(v):
    return (int(v[0]), int(v[1]))


class IntAlg:
    add = staticmethod(eadd)
    sub = staticmethod(esub)
    mul = staticmethod(emul)

    @staticmethod
    def from_int(i):
        return (i % P, 0)


def load_ctx():
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

    # non-poseidon gate contributions (upstream conventions, validated order)
    selectors = consts[:common.num_selectors]
    gconsts = consts[common.num_selectors:]
    UNUSED = (1 << 32) - 1
    many = common.num_selectors > 1
    ngc = common.num_gate_constraints
    base_acc = [(0, 0)] * ngc
    pose_filt = None
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
            pose_filt = filt
            continue
        if gate.kind == "ArithmeticGate":
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
            cs = [esub(wires[i], (int(pi_hash[i]) % P, 0)) for i in range(4)]
        elif gate.kind == "NoopGate":
            cs = []
        else:
            raise ValueError(gate.kind)
        for k, c in enumerate(cs):
            base_acc[k] = eadd(base_acc[k], emul(filt, c))

    alpha_pows = []
    for i in range(nc):
        a = (alphas[i], 0)
        pw = [(1, 0)]
        for _ in range(160):
            pw.append(emul(pw[-1], a))
        alpha_pows.append(pw)

    head = z1_terms + pp_terms
    # precompute target minus head and non-poseidon gate contribution:
    targets = []
    for i in range(nc):
        acc = (0, 0)
        pw = alpha_pows[i]
        for k, t in enumerate(head):
            acc = eadd(acc, emul(pw[k], t))
        for k, t in enumerate(base_acc):
            acc = eadd(acc, emul(pw[len(head) + k], t))
        targets.append(esub(rhs[i], acc))
    # target_i must equal pose_filt * sum_k alpha^{22+k} pose_constraint_k
    gslot = [alpha_pows[i][len(head):] for i in range(nc)]
    pose_targets = [emul(targets[i], einv(pose_filt)) for i in range(nc)]
    return dict(common=common, wires=wires, alpha_slots=gslot,
                pose_targets=pose_targets)


def eval_poseidon_roles(wires, roles, delta_sign=+1, state_sign=+1,
                        f0_rounds="123"):
    """Upstream Poseidon gate semantics with a role->wire map.

    roles: dict with 'swap' (idx), 'delta' (4 idx), 'f0' (3x12 idx),
    'part' (22 idx), 'f1' (4x12 idx).  Returns the 123 constraints in
    upstream emission order.
    """
    alg = IntAlg
    out = []
    swap = wires[roles["swap"]]
    out.append(emul(swap, esub(swap, (1, 0))))
    deltas = [wires[i] for i in roles["delta"]]
    for i in range(4):
        d = esub(wires[i + 4], wires[i])
        if delta_sign < 0:
            d = esub(wires[i], wires[i + 4])
        out.append(esub(emul(swap, d), deltas[i]))
    state = []
    for i in range(4):
        state.append(eadd(wires[i], deltas[i]) if state_sign > 0
                     else esub(wires[i], deltas[i]))
    for i in range(4):
        state.append(esub(wires[i + 4], deltas[i]) if state_sign > 0
                     else eadd(wires[i + 4], deltas[i]))
    for i in range(8, 12):
        state.append(wires[i])

    round_ctr = 0
    rec_rounds = (1, 2, 3) if f0_rounds == "123" else (0, 1, 2)
    rec_i = 0
    f0_constraints = []
    for r in range(pf.HALF_N_FULL_ROUNDS):
        state = pf.constant_layer(alg, state, round_ctr)
        if r in rec_rounds:
            for i in range(W12):
                sbox_in = wires[roles["f0"][rec_i * W12 + i]]
                f0_constraints.append(esub(state[i], sbox_in))
                state[i] = sbox_in
            rec_i += 1
        state = [pf.sbox(alg, x) for x in state]
        state = pf.mds_layer(alg, state)
        round_ctr += 1
    out.extend(f0_constraints)

    state = pf.partial_first_constant_layer(alg, state)
    state = pf.mds_partial_layer_init(alg, state)
    for r in range(pf.N_PARTIAL_ROUNDS - 1):
        sbox_in = wires[roles["part"][r]]
        out.append(esub(state[0], sbox_in))
        state[0] = pf.sbox(alg, sbox_in)
        state[0] = eadd(state[0], ((int(pf.FAST_PARTIAL_ROUND_CONSTANTS[r])) % P, 0))
        state = pf.mds_partial_layer_fast(alg, state, r)
    sbox_in = wires[roles["part"][pf.N_PARTIAL_ROUNDS - 1]]
    out.append(esub(state[0], sbox_in))
    state[0] = pf.sbox(alg, sbox_in)
    state = pf.mds_partial_layer_fast(alg, state, pf.N_PARTIAL_ROUNDS - 1)
    round_ctr += pf.N_PARTIAL_ROUNDS

    for r in range(pf.HALF_N_FULL_ROUNDS):
        state = pf.constant_layer(alg, state, round_ctr)
        for i in range(W12):
            sbox_in = wires[roles["f1"][r * W12 + i]]
            out.append(esub(state[i], sbox_in))
            state[i] = sbox_in
        state = [pf.sbox(alg, x) for x in state]
        state = pf.mds_layer(alg, state)
        round_ctr += 1

    for i in range(W12):
        out.append(esub(state[i], wires[W12 + i]))
    return out


def section_indices(order, inner):
    """Build role index arrays for a section ORDER over offsets 24..135.

    order: tuple of section names; inner: dict of per-section inner layout
    flags."""
    sizes = {"swap": 1, "delta": 4, "f0": 36, "part": 22, "f1": 48}
    off = 24
    pos = {}
    for name in order:
        pos[name] = list(range(off, off + sizes[name]))
        off += sizes[name]
    roles = {"swap": pos["swap"][0]}
    d = pos["delta"]
    roles["delta"] = d[::-1] if inner.get("delta_rev") else d

    def grid(idx, nrounds, lane_major, lane_rev, round_rev):
        # idx has nrounds*12 entries; map (round r, lane i) -> wire index
        out = []
        for r in range(nrounds):
            rr = (nrounds - 1 - r) if round_rev else r
            for i in range(W12):
                ii = (W12 - 1 - i) if lane_rev else i
                if lane_major:
                    out.append(idx[ii * nrounds + rr])
                else:
                    out.append(idx[rr * W12 + ii])
        return out

    roles["f0"] = grid(pos["f0"], 3, inner.get("f0_lane_major", False),
                       inner.get("f0_lane_rev", False), inner.get("f0_round_rev", False))
    roles["f1"] = grid(pos["f1"], 4, inner.get("f1_lane_major", False),
                       inner.get("f1_lane_rev", False), inner.get("f1_round_rev", False))
    p = pos["part"]
    roles["part"] = p[::-1] if inner.get("part_rev") else p
    return roles


def main():
    ctx = load_ctx()
    wires = ctx["wires"]
    pose_targets = ctx["pose_targets"]
    alpha_slots = ctx["alpha_slots"]

    def check(constraints):
        for i in range(2):
            acc = (0, 0)
            pw = alpha_slots[i]
            for k, c in enumerate(constraints):
                acc = eadd(acc, emul(pw[k], c))
            if acc != pose_targets[i]:
                return False
        return True

    sections = ["swap", "delta", "f0", "part", "f1"]
    n_tried = 0
    found = []

    stage = sys.argv[1] if len(sys.argv) > 1 else "A"
    if stage == "A":
        # section order x f0/f1 majors x part_rev, defaults elsewhere
        for order in itertools.permutations(sections):
            for f0m in (False, True):
                for f1m in (False, True):
                    for pr in (False, True):
                        inner = dict(f0_lane_major=f0m, f1_lane_major=f1m,
                                     part_rev=pr)
                        roles = section_indices(order, inner)
                        cs = eval_poseidon_roles(wires, roles)
                        n_tried += 1
                        if check(cs):
                            print("FOUND", order, inner, flush=True)
                            found.append((order, inner))
            print(f"... {n_tried}", flush=True)
    elif stage == "B":
        # upstream section order; deep inner variants + semantics variants
        order = ("swap", "delta", "f0", "part", "f1")
        axes = itertools.product(
            (False, True), (False, True), (False, True),   # f0 m/lrev/rrev
            (False, True), (False, True), (False, True),   # f1 m/lrev/rrev
            (False, True), (False, True),                  # part_rev, delta_rev
            (1, -1), (1, -1), ("123", "012"))
        for (f0m, f0lr, f0rr, f1m, f1lr, f1rr, pr, dr, ds, ss, fr) in axes:
            inner = dict(f0_lane_major=f0m, f0_lane_rev=f0lr, f0_round_rev=f0rr,
                         f1_lane_major=f1m, f1_lane_rev=f1lr, f1_round_rev=f1rr,
                         part_rev=pr, delta_rev=dr)
            roles = section_indices(order, inner)
            cs = eval_poseidon_roles(wires, roles, delta_sign=ds,
                                     state_sign=ss, f0_rounds=fr)
            n_tried += 1
            if check(cs):
                print("FOUND", inner, ds, ss, fr, flush=True)
                found.append((inner, ds, ss, fr))
        print(f"stage B tried {n_tried}", flush=True)
    elif stage == "C":
        # all section orders x inner lane variants (coarse) x semantics
        for order in itertools.permutations(sections):
            for f0m in (False, True):
                for f0lr in (False, True):
                    for f1m in (False, True):
                        for f1lr in (False, True):
                            for pr in (False, True):
                                for fr in ("123", "012"):
                                    inner = dict(f0_lane_major=f0m, f0_lane_rev=f0lr,
                                                 f1_lane_major=f1m, f1_lane_rev=f1lr,
                                                 part_rev=pr)
                                    roles = section_indices(order, inner)
                                    cs = eval_poseidon_roles(wires, roles, f0_rounds=fr)
                                    n_tried += 1
                                    if check(cs):
                                        print("FOUND", order, inner, fr, flush=True)
                                        found.append((order, inner, fr))
            print(f"... {n_tried}", flush=True)
    print("tried", n_tried, "found", len(found))


if __name__ == "__main__":
    main()
