"""Cross-shard FRI commit phase vs the host golden engine.

The sharded commit chain (fri/fri_sharded.py) must reproduce the host
``fri_prove`` commit phase bit-exactly: identical caps at every fold
level, identical betas (same transcript), identical final polynomial —
on an 8-device CPU mesh (conftest), with the codeword sharded over all
devices at every level.
"""

import numpy as np

from zk_circuits_tpu.fri.fri import ext_coset_ntt, fold_coeffs
from zk_circuits_tpu.fri.fri_sharded import fri_commit_sharded
from zk_circuits_tpu.hash import merkle as merklem
from zk_circuits_tpu.hash.challenger import Challenger
from zk_circuits_tpu.host import gl
from zk_circuits_tpu.parallel.mesh import make_mesh
from zk_circuits_tpu.plonk.config import FriConfig


def _host_commit(coeffs, degree_bits, fri_config, challenger, shift):
    n = 1 << degree_bits
    lde_size = n << fri_config.rate_bits
    arities = fri_config.reduction_arities(degree_bits)
    values = ext_coset_ntt(coeffs, shift, lde_size)
    caps, betas = [], []
    size = lde_size
    for a_bits in arities:
        arity = 1 << a_bits
        m = size // arity
        grouped = values.reshape(arity, m, 2)
        leaves = np.ascontiguousarray(np.moveaxis(grouped, 0, 1)).reshape(m, arity * 2)
        tree = merklem.MerkleTree.build(leaves, fri_config.cap_height)
        caps.append(np.asarray(tree.levels[-1], dtype=np.uint64).reshape(-1, 4))
        challenger.observe_cap(caps[-1])
        beta = challenger.get_extension_challenge()
        betas.append(beta)
        coeffs = fold_coeffs(coeffs, beta, a_bits)
        shift = pow(shift, arity, gl.P_INT)
        size = m
        values = ext_coset_ntt(coeffs, shift, size)
    return caps, betas, coeffs


def test_sharded_fri_commit_matches_host():
    degree_bits = 9          # 2^9 coeffs -> 2^12 codeword over 8 devices
    fri_config = FriConfig(rate_bits=3, cap_height=2, reduction_arity_bits=2,
                           final_poly_bits=3, num_query_rounds=4)
    rng = np.random.default_rng(11)
    coeffs = rng.integers(0, gl.P_INT, size=(1 << degree_bits, 2),
                          dtype=np.uint64)

    ch_host = Challenger()
    caps_h, betas_h, final_h = _host_commit(
        coeffs.copy(), degree_bits, fri_config, ch_host,
        gl.MULTIPLICATIVE_GROUP_GENERATOR)

    mesh = make_mesh(8)
    ch_dev = Challenger()
    caps_d, betas_d, final_d = fri_commit_sharded(
        coeffs, degree_bits, fri_config, ch_dev, mesh)

    assert len(caps_h) == len(caps_d) and len(caps_h) >= 2
    for h, d in zip(caps_h, caps_d):
        assert np.array_equal(h, d)
    for h, d in zip(betas_h, betas_d):
        assert np.array_equal(h, d)
    assert np.array_equal(final_h, final_d)
