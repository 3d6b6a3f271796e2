"""Extract the reference proof's FRI query-point openings as a parity
fixture: for each of the 28 query indices, the LDE-domain point x and the
opened leaf values of all four oracles (constants+sigmas 84, wires 139,
zs/pp 20(+4 salt), quotient 16(+4 salt)).

These are *verified* values (every Merkle path checks against the caps),
so they form a 2k+-value gradient for reverse-engineering the reference
circuit's exact build layout (selector/constant/sigma polynomials):
a candidate rebuild's polys can be LDE-evaluated at the 28 points and
diffed per-column.  Writes compat_points.npz.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zk_circuits_tpu.compat.serde import (read_common_data, read_proof,
                                          read_verifier_data)
from zk_circuits_tpu.compat import verifier as cv
from zk_circuits_tpu.hash.challenger import Challenger
from zk_circuits_tpu.host import gl, poseidon as hposeidon

REF = "/root/reference/wormhole/bench-data"


def main():
    common = read_common_data(open(f"{REF}/common.bin", "rb").read())
    vd = read_verifier_data(open(f"{REF}/verifier.bin", "rb").read())
    proof = read_proof(open(f"{REF}/proof.bin", "rb").read(), common)
    nc = common.num_challenges
    fri_cfg = common.fri_config
    lde_bits = common.lde_bits

    pis = np.asarray(proof.public_inputs, dtype=np.uint64)
    pi_hash = hposeidon.hash_no_pad(pis)
    ch = Challenger()
    ch.observe_hash(vd.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(proof.wires_cap)
    ch.get_n_challenges(nc)
    ch.get_n_challenges(nc)
    ch.observe_cap(proof.plonk_zs_partial_products_cap)
    ch.get_n_challenges(nc)
    ch.observe_cap(proof.quotient_polys_cap)
    ch.get_extension_challenge()
    op = proof.openings
    ch.observe_extension_elements(op.fri_batch0())
    ch.observe_extension_elements(op.fri_batch1())
    ch.get_extension_challenge()
    for cap in proof.opening_proof.commit_phase_caps:
        ch.observe_cap(cap)
        ch.get_extension_challenge()
    ch.observe_extension_elements(proof.opening_proof.final_poly)
    ch.observe_element(proof.opening_proof.pow_witness)
    ch.get_challenge()
    query_indices = [int(ch.get_challenge()) % (1 << lde_bits)
                     for _ in range(fri_cfg.num_query_rounds)]

    g_lde = cv._fork_root_of_unity(common, lde_bits)
    shift = int(common.k_is[1])

    xs, idxs = [], []
    evals = {0: [], 1: [], 2: [], 3: []}
    for qi, x_index in enumerate(query_indices):
        rnd = proof.opening_proof.query_rounds[qi]
        x = (shift * pow(g_lde, cv._bit_reverse(x_index, lde_bits), gl.P_INT)) % gl.P_INT
        xs.append(x)
        idxs.append(x_index)
        for oi in range(4):
            evals[oi].append(np.asarray(rnd.initial.evals[oi], dtype=np.uint64))

    out = dict(
        x=np.array(xs, dtype=np.uint64),
        index=np.array(idxs, dtype=np.uint64),
        constants_sigmas=np.stack(evals[0]),   # (28, 84)
        wires=np.stack(evals[1]),              # (28, 139)  (4 salt cols)
        zs_pp=np.stack(evals[2]),              # (28, 24)
        quotient=np.stack(evals[3]),           # (28, 20)
    )
    np.savez(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "compat_points.npz"), **out)
    print("saved", {k: v.shape for k, v in out.items()})
    # sanity: recompute one committed value from the already-solved layout
    print("x[0] =", int(out["x"][0]), "index[0] =", int(out["index"][0]))


if __name__ == "__main__":
    main()
