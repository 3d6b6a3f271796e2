"""Vanishing-identity scan over per-gate constraint-ORDER permutations and
openings-label variants, holding the FRI-verified pieces (transcript, flat
openings order, combine) fixed.

Motivated by the round-4 realization that qp-plonky2 uses UPSTREAM plonky2
field constants (14293326489335486720 = upstream MULTIPLICATIVE_GROUP_GENERATOR,
and g^((p-1)/2^32) = 7277203076849721926 = upstream POWER_OF_TWO_GENERATOR):
the fork is near-vanilla plonky2, so the vanishing deviation is most likely a
constraint-ordering / labeling detail, not exotic crypto.

Axes:
  - selector/constant split of the first 4 opened "constants" (4 variants)
  - sigma opening order ascending/descending (2)
  - BaseSum constraint order: [sum, limbs] / [limbs, sum] x limb reversal (4)
  - Arithmetic op order reversal (2)
  - Poseidon constraint-block order: permutations of the 6 blocks
    [swap(1), delta(4), full0(36), partial(22), full1(48), out(12)]
    x full0/full1 lane-major transpose x partial reversal (720 x 8)

All in pure-Python GF(p^2) ints (fast, exact).
"""

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zk_circuits_tpu.compat import gates as gatesm
from zk_circuits_tpu.compat.serde import (read_common_data, read_proof,
                                          read_verifier_data)
from zk_circuits_tpu.hash.challenger import Challenger
from zk_circuits_tpu.host import gl, gle, poseidon as hposeidon

REF = "/root/reference/wormhole/bench-data"
P = gl.P_INT
W = 7  # extension: x^2 = 7


def eadd(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def esub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def emul(a, b):
    return ((a[0] * b[0] + W * a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)


def escale(a, s):
    return ((a[0] * s) % P, (a[1] * s) % P)


def efrom(v):
    return (int(v) % P, 0)


def einv(a):
    # norm = a0^2 - W a1^2; inv = conj / norm
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


def load():
    common = read_common_data(open(f"{REF}/common.bin", "rb").read())
    vd = read_verifier_data(open(f"{REF}/verifier.bin", "rb").read())
    proof = read_proof(open(f"{REF}/proof.bin", "rb").read(), common)
    return common, vd, proof


def transcript(common, vd, proof):
    nc = common.num_challenges
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
    zeta = to_int(ch.get_extension_challenge())
    return pi_hash, [int(b) for b in betas], [int(g) for g in gammas], \
        [int(a) for a in alphas], zeta


# --- Poseidon gate with parameterizable constraint emission ---------------

from zk_circuits_tpu.compat import poseidon_fast as pf

W12 = 12


def poseidon_constraint_blocks(wires):
    """Evaluate the upstream Poseidon gate, returning constraints grouped in
    blocks: (swap[1], delta[4], full0[3][12], partial[22], full1[4][12],
    out[12]); each block in upstream emission order."""
    alg = IntAlg
    swap = wires[24]
    blk_swap = [emul(swap, esub(swap, (1, 0)))]
    deltas = [wires[25 + i] for i in range(4)]
    blk_delta = []
    for i in range(4):
        t = emul(swap, esub(wires[i + 4], wires[i]))
        blk_delta.append(esub(t, deltas[i]))
    state = []
    for i in range(4):
        state.append(eadd(wires[i], deltas[i]))
    for i in range(4):
        state.append(esub(wires[i + 4], deltas[i]))
    for i in range(8, 12):
        state.append(wires[i])

    blk_f0 = [[None] * W12 for _ in range(pf.HALF_N_FULL_ROUNDS - 1)]
    round_ctr = 0
    for r in range(pf.HALF_N_FULL_ROUNDS):
        state = pf.constant_layer(alg, state, round_ctr)
        if r != 0:
            for i in range(W12):
                sbox_in = wires[29 + (r - 1) * W12 + i]
                blk_f0[r - 1][i] = esub(state[i], sbox_in)
                state[i] = sbox_in
        state = [pf.sbox(alg, x) for x in state]
        state = pf.mds_layer(alg, state)
        round_ctr += 1

    blk_part = []
    state = pf.partial_first_constant_layer(alg, state)
    state = pf.mds_partial_layer_init(alg, state)
    for r in range(pf.N_PARTIAL_ROUNDS - 1):
        sbox_in = wires[65 + r]
        blk_part.append(esub(state[0], sbox_in))
        state[0] = pf.sbox(alg, sbox_in)
        state[0] = eadd(state[0], efrom(int(pf.FAST_PARTIAL_ROUND_CONSTANTS[r])))
        state = pf.mds_partial_layer_fast(alg, state, r)
    sbox_in = wires[65 + pf.N_PARTIAL_ROUNDS - 1]
    blk_part.append(esub(state[0], sbox_in))
    state[0] = pf.sbox(alg, sbox_in)
    state = pf.mds_partial_layer_fast(alg, state, pf.N_PARTIAL_ROUNDS - 1)
    round_ctr += pf.N_PARTIAL_ROUNDS

    blk_f1 = [[None] * W12 for _ in range(pf.HALF_N_FULL_ROUNDS)]
    for r in range(pf.HALF_N_FULL_ROUNDS):
        state = pf.constant_layer(alg, state, round_ctr)
        for i in range(W12):
            sbox_in = wires[87 + r * W12 + i]
            blk_f1[r][i] = esub(state[i], sbox_in)
            state[i] = sbox_in
        state = [pf.sbox(alg, x) for x in state]
        state = pf.mds_layer(alg, state)
        round_ctr += 1

    blk_out = [esub(state[i], wires[W12 + i]) for i in range(W12)]
    return blk_swap, blk_delta, blk_f0, blk_part, blk_f1, blk_out


def basesum_constraints(gate, wires, sum_first=True, limb_rev=False):
    num_limbs = gate.params["num_limbs"]
    base = gate.params["base"]
    s = wires[0]
    limbs = [wires[1 + i] for i in range(num_limbs)]
    acc = (0, 0)
    for limb in reversed(limbs):
        acc = eadd(escale(acc, base), limb)
    sum_c = [esub(acc, s)]
    limb_cs = []
    for limb in limbs:
        prod = limb
        for j in range(1, base):
            prod = emul(prod, esub(limb, (j, 0)))
        limb_cs.append(prod)
    if limb_rev:
        limb_cs = limb_cs[::-1]
    return sum_c + limb_cs if sum_first else limb_cs + sum_c


def arithmetic_constraints(gate, consts, wires, rev=False):
    c0, c1 = consts[0], consts[1]
    out = []
    for i in range(gate.params["num_ops"]):
        m0, m1, addend, output = wires[4 * i:4 * i + 4]
        t = eadd(emul(c0, emul(m0, m1)), emul(c1, addend))
        out.append(esub(t, output))
    return out[::-1] if rev else out


def main():
    common, vd, proof = load()
    nc = common.num_challenges
    n = common.degree
    op = proof.openings
    pi_hash, betas, gammas, alphas, zeta = transcript(common, vd, proof)

    wires = [to_int(op.wires[i]) for i in range(common.num_wires)]
    raw_consts = [to_int(op.constants[i]) for i in range(common.num_constants)]
    sigmas_asc = [to_int(op.plonk_sigmas[i]) for i in range(common.num_routed_wires)]

    zeta_pow_n = zeta
    for _ in range(common.degree_bits):
        zeta_pow_n = emul(zeta_pow_n, zeta_pow_n)
    zh = esub(zeta_pow_n, (1, 0))
    l0 = emul(zh, einv(escale(esub(zeta, (1, 0)), n)))

    # RHS per challenge
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

    def pp_terms_for(sigmas):
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
        return z1_terms, pp_terms

    # selector/constant labeling variants
    def split_sc(order):
        # order: 0 = [s0 s1 c0 c1]; 1 = [c0 c1 s0 s1]
        if order == 0:
            return raw_consts[:2], raw_consts[2:]
        return raw_consts[2:], raw_consts[:2]

    many = common.num_selectors > 1
    UNUSED = (1 << 32) - 1

    def filters(selectors):
        out = []
        for row, gate in enumerate(common.gates):
            sel_idx = common.selector_indices[row]
            group = common.selector_groups[sel_idx]
            s = selectors[sel_idx]
            prod = (1, 0)
            for i in range(group[0], group[1]):
                if i == row:
                    continue
                prod = emul(prod, esub((i, 0), s))
            if many:
                prod = emul(prod, esub((UNUSED, 0), s))
            out.append(prod)
        return out

    alpha_pows = []
    for i in range(nc):
        a = (alphas[i], 0)
        pw = [(1, 0)]
        for _ in range(160):
            pw.append(emul(pw[-1], a))
        alpha_pows.append(pw)

    ngc = common.num_gate_constraints

    # Pre-evaluate per-gate pieces for each (sc_order) since constants feed
    # arithmetic/constant gates and the filters.
    results = []
    pose_blocks = poseidon_constraint_blocks(wires)

    def check(terms):
        for i in range(nc):
            acc = (0, 0)
            pw = alpha_pows[i]
            for k, t in enumerate(terms):
                acc = eadd(acc, emul(pw[k], t))
            if acc != rhs[i]:
                return False
        return True

    n_tried = 0
    found = []
    block_names = ["swap", "delta", "f0", "part", "f1", "out"]

    for sc_order in (0, 1):
        selectors, consts = split_sc(sc_order)
        filts = filters(selectors)
        # per-gate constraint base lists
        gate_rows = []
        for row, gate in enumerate(common.gates):
            gate_rows.append((row, gate, filts[row]))
        for sig_rev in (False, True):
            sigmas = sigmas_asc[::-1] if sig_rev else sigmas_asc
            z1_terms, pp_terms = pp_terms_for(sigmas)
            head = z1_terms + pp_terms
            for bs_sum_first in (True, False):
                for bs_limb_rev in (False, True):
                    for ar_rev in (False, True):
                        # non-poseidon accumulation
                        base_acc = [(0, 0)] * ngc
                        for row, gate, filt in gate_rows:
                            if gate.kind == "PoseidonGate":
                                continue
                            if gate.kind == "ArithmeticGate":
                                cs = arithmetic_constraints(gate, consts, wires, ar_rev)
                            elif gate.kind == "BaseSumGate":
                                cs = basesum_constraints(gate, wires,
                                                         bs_sum_first, bs_limb_rev)
                            elif gate.kind == "ConstantGate":
                                cs = [esub(consts[i], wires[i])
                                      for i in range(gate.params["num_consts"])]
                            elif gate.kind == "PublicInputGate":
                                cs = [esub(wires[i], efrom(int(pi_hash[i])))
                                      for i in range(4)]
                            elif gate.kind == "NoopGate":
                                cs = []
                            else:
                                raise ValueError(gate.kind)
                            for k, c in enumerate(cs):
                                base_acc[k] = eadd(base_acc[k], emul(filt, c))
                        pose_filt = next(f for r, g, f in gate_rows
                                         if g.kind == "PoseidonGate")
                        bswap, bdelta, bf0, bpart, bf1, bout = pose_blocks
                        for perm in itertools.permutations(range(6)):
                            for f0_lane in (False, True):
                                for f1_lane in (False, True):
                                    for part_rev in (False, True):
                                        f0 = ([x for lane in zip(*bf0) for x in lane]
                                              if f0_lane else
                                              [x for rnd in bf0 for x in rnd])
                                        f1 = ([x for lane in zip(*bf1) for x in lane]
                                              if f1_lane else
                                              [x for rnd in bf1 for x in rnd])
                                        part = bpart[::-1] if part_rev else bpart
                                        blocks = [bswap, bdelta, f0, part, f1, bout]
                                        pose = []
                                        for bi in perm:
                                            pose.extend(blocks[bi])
                                        terms = list(head)
                                        acc = list(base_acc)
                                        for k, c in enumerate(pose):
                                            acc[k] = eadd(acc[k], emul(pose_filt, c))
                                        terms.extend(acc)
                                        n_tried += 1
                                        if check(terms):
                                            tag = dict(
                                                sc_order=sc_order, sig_rev=sig_rev,
                                                bs_sum_first=bs_sum_first,
                                                bs_limb_rev=bs_limb_rev,
                                                ar_rev=ar_rev,
                                                perm=[block_names[b] for b in perm],
                                                f0_lane=f0_lane, f1_lane=f1_lane,
                                                part_rev=part_rev)
                                            print("FOUND", tag, flush=True)
                                            found.append(tag)
                        print(f"... {n_tried} tried", flush=True)
    print("total tried:", n_tried, "found:", len(found))


if __name__ == "__main__":
    main()
