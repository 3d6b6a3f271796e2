"""Vanishing polynomial: gate constraints (selector-filtered) + the
permutation argument with partial products.

One generic implementation over the algebra abstraction serves:
- the prover's quotient evaluation on the 8n coset (DeviceBase / HostBase),
- the prover's witness-validity check on H,
- the verifier's evaluation at zeta (HostExt).

Structure mirrors the reference engine's eval_vanishing_poly: per challenge
c the combined polynomial is the Horner/alpha_c-reduction of
  [ L1(x) * (Z_c(x) - 1),
    partial-product transition constraints (10),
    gate constraint slots (num_gate_constraints) ]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

from ..iop.gates import EvalVars


@dataclass
class VanishingVars:
    x: Any                      # (npoints,) domain points
    wires: Any                  # (npoints, num_wires)
    selectors: Any              # (npoints, num_selectors)
    constants: Any              # (npoints, num_constants)
    sigmas: Any                 # (npoints, num_routed)
    zs: list                    # per challenge: (npoints,)
    zs_next: list               # per challenge: (npoints,)
    partial_products: list      # per challenge: (npoints, num_pp)
    l1: Any                     # (npoints,) Lagrange basis at 1
    pi_hash: Any                # (npoints, 4) broadcastable
    betas: list                 # per challenge: algebra value, broadcastable
    gammas: list
    alphas: list


def eval_gate_constraint_slots(alg, common, vv: VanishingVars) -> list:
    """Selector-filtered gate constraints accumulated into shared slots."""
    num_slots = common.num_gate_constraints
    slots = [None] * num_slots
    many_groups = len(common.selector_groups) > 1
    unused = common.unused_selector

    ev = EvalVars(alg, vv.constants, vv.wires, vv.pi_hash)
    for gate in common.gate_types:
        gi = common.gate_to_index[gate.id]
        grp_idx = common.gate_to_group[gate.id]
        group = common.selector_groups[grp_idx]
        s = alg.col(vv.selectors, grp_idx)
        filt = None
        for gj in group:
            if gj == gi:
                continue
            term = alg.sub_from_scalar(gj, s)
            filt = term if filt is None else alg.mul(filt, term)
        if many_groups:
            term = alg.sub_from_scalar(unused, s)
            filt = term if filt is None else alg.mul(filt, term)
        constraints = gate.eval(ev)
        for k, c in enumerate(constraints):
            term = alg.mul(filt, c) if filt is not None else c
            slots[k] = term if slots[k] is None else alg.add(slots[k], term)

    npoints = _npoints(vv)
    zero = alg.broadcast_scalar(0, npoints)
    return [s if s is not None else zero for s in slots]


def _npoints(vv: VanishingVars) -> int:
    x = vv.x
    return x.shape[0]


def eval_permutation_terms(alg, common, vv: VanishingVars, c: int) -> list:
    """Partial-product transition constraints for challenge c (10 terms for
    80 routed wires / chunk size 8), plus does NOT include the L1 term."""
    cfg = common.config
    beta = vv.betas[c]
    gamma = vv.gammas[c]
    q = common.quotient_degree_factor
    num_routed = cfg.num_routed_wires
    chunks = [(i, min(i + q, num_routed)) for i in range(0, num_routed, q)]
    pps = vv.partial_products[c]
    num_pp = common.num_partial_products

    terms = []
    prev = vv.zs[c]
    for t, (lo, hi) in enumerate(chunks):
        num_prod = None
        den_prod = None
        for j in range(lo, hi):
            wire = alg.col(vv.wires, j)
            kx = alg.mul_scalar(vv.x, int(common.k_is[j]))
            num_j = alg.add(wire, alg.add(alg.mul(kx, beta), gamma))
            sig = alg.col(vv.sigmas, j)
            den_j = alg.add(wire, alg.add(alg.mul(sig, beta), gamma))
            num_prod = num_j if num_prod is None else alg.mul(num_prod, num_j)
            den_prod = den_j if den_prod is None else alg.mul(den_prod, den_j)
        cur = alg.col(pps, t) if t < num_pp else vv.zs_next[c]
        terms.append(alg.sub(alg.mul(cur, den_prod), alg.mul(prev, num_prod)))
        prev = cur
    return terms


def eval_vanishing(alg, common, vv: VanishingVars) -> list:
    """Combined vanishing value per challenge: alpha-Horner over
    [L1*(Z-1), permutation terms, gate slots]."""
    gate_slots = eval_gate_constraint_slots(alg, common, vv)
    out = []
    for c in range(common.config.num_challenges):
        z1_term = alg.mul(vv.l1, alg.add_scalar(vv.zs[c], -1))
        terms = [z1_term] + eval_permutation_terms(alg, common, vv, c) + gate_slots
        alpha = vv.alphas[c]
        acc = terms[0]
        for t in terms[1:]:
            acc = alg.add(alg.mul(acc, alpha), t)
        out.append(acc)
    return out


def check_constraints_on_h(common, prover_only, wires: np.ndarray, pi_hash: np.ndarray):
    """Debug/validity check: every gate constraint must vanish on H.
    Raises with (row, gate, constraint index) on the first violation."""
    from ..host import gl
    from . import algebra

    alg = algebra.HOST_BASE
    n = common.degree
    x = prover_only.subgroup
    vvars = VanishingVars(
        x=x,
        wires=wires,
        selectors=prover_only.selectors_values.T.copy(),
        constants=prover_only.constants_values.T.copy(),
        sigmas=prover_only.sigmas_values.T.copy(),
        zs=[np.zeros(n, dtype=np.uint64)] * common.config.num_challenges,
        zs_next=[np.zeros(n, dtype=np.uint64)] * common.config.num_challenges,
        partial_products=[
            np.zeros((n, common.num_partial_products), dtype=np.uint64)
        ] * common.config.num_challenges,
        l1=np.zeros(n, dtype=np.uint64),
        pi_hash=np.broadcast_to(pi_hash[None, :], (n, 4)),
        betas=[np.zeros(1, dtype=np.uint64)] * common.config.num_challenges,
        gammas=[np.zeros(1, dtype=np.uint64)] * common.config.num_challenges,
        alphas=[np.zeros(1, dtype=np.uint64)] * common.config.num_challenges,
    )
    slots = eval_gate_constraint_slots(alg, common, vvars)
    for k, slot in enumerate(slots):
        nz = np.nonzero(slot)[0]
        if nz.size:
            row = int(nz[0])
            raise ValueError(
                f"constraint violated at row {row} "
                f"(gate {prover_only.gates_by_row[row].id}, slot {k})"
            )
