"""Reference-artifact compatibility: parse and cryptographically cross-check
the reference's own binary artifacts (bench-data/{common,verifier,proof}.bin).

What these tests prove about interop parity:
- the byte formats parse EXACTLY (self-describing lengths consume every byte);
- our Poseidon/challenger reproduce the reference's Fiat-Shamir transcript
  bit-for-bit (the proof-of-work response has the required leading zeros —
  a 2^-16 coincidence otherwise);
- every Merkle path in the proof (4 initial oracles + 3 FRI commit phases
  × 28 query rounds) verifies against its cap with our Poseidon.
"""

import pathlib

import numpy as np
import pytest

from zk_circuits_tpu.compat import serde
from zk_circuits_tpu.compat.verifier import _bit_reverse, _verify_merkle_proof
from zk_circuits_tpu.hash.challenger import Challenger
from zk_circuits_tpu.host import gl, poseidon as hposeidon

BENCH = pathlib.Path("/root/reference/wormhole/bench-data")

pytestmark = pytest.mark.skipif(
    not BENCH.exists(), reason="reference bench-data not mounted"
)


@pytest.fixture(scope="module")
def artifacts():
    common = serde.read_common_data((BENCH / "common.bin").read_bytes())
    vd = serde.read_verifier_data((BENCH / "verifier.bin").read_bytes())
    proof = serde.read_proof((BENCH / "proof.bin").read_bytes(), common)
    return common, vd, proof


def test_common_data_shape(artifacts):
    common, _, _ = artifacts
    assert common.num_wires == 135
    assert common.num_routed_wires == 80
    assert common.degree_bits == 14
    assert common.zero_knowledge and common.hiding
    assert common.fri_config.rate_bits == 3
    assert common.fri_config.cap_height == 4
    assert common.fri_config.num_query_rounds == 28
    assert common.fri_config.proof_of_work_bits == 16
    assert common.reduction_arity_bits == [4, 4, 4]
    assert common.num_public_inputs == 16  # nullifier, root, amount, exit
    assert [g.kind for g in common.gates] == [
        "NoopGate", "ConstantGate", "PublicInputGate", "BaseSumGate",
        "ArithmeticGate", "PoseidonGate",
    ]
    assert common.gates[3].params["num_limbs"] == 63
    assert common.gates[4].params["num_ops"] == 20
    assert common.num_gate_constraints == 123
    assert common.oracle_widths == [84, 139, 24, 20]


def test_verifier_data_embeds_common(artifacts):
    common, vd, _ = artifacts
    assert vd.constants_sigmas_cap.shape == (16, 4)
    assert vd.common is not None
    assert vd.common.degree_bits == common.degree_bits
    np.testing.assert_array_equal(vd.common.k_is, common.k_is)


def test_proof_parses_byte_exact(artifacts):
    common, _, proof = artifacts
    assert proof.public_inputs.shape == (16,)
    assert proof.opening_proof.final_poly.shape == (4, 2)
    assert len(proof.opening_proof.query_rounds) == 28
    # canonical field elements everywhere
    for arr in (proof.openings.wires, proof.openings.constants,
                proof.opening_proof.final_poly):
        assert (arr < gl.P_INT).all()


def _transcript(common, vd, proof):
    op, fp = proof.openings, proof.opening_proof
    nc = common.num_challenges
    ch = Challenger()
    ch.observe_hash(vd.circuit_digest)
    ch.observe_hash(hposeidon.hash_no_pad(proof.public_inputs))
    ch.observe_cap(proof.wires_cap)
    ch.get_n_challenges(nc)
    ch.get_n_challenges(nc)
    ch.observe_cap(proof.plonk_zs_partial_products_cap)
    ch.get_n_challenges(nc)
    ch.observe_cap(proof.quotient_polys_cap)
    ch.get_extension_challenge()
    ch.observe_extension_elements(op.fri_batch0())
    ch.observe_extension_elements(op.fri_batch1())
    ch.get_extension_challenge()
    for cap in fp.commit_phase_caps:
        ch.observe_cap(cap)
        ch.get_extension_challenge()
    ch.observe_extension_elements(fp.final_poly)
    ch.observe_element(fp.pow_witness)
    pow_response = ch.get_challenge()
    indices = [ch.get_challenge() % (1 << common.lde_bits)
               for _ in range(common.fri_config.num_query_rounds)]
    return pow_response, indices


def test_fiat_shamir_transcript_parity_via_pow(artifacts):
    """The PoW response derived with OUR challenger satisfies the grinding
    bound recorded in the reference proof — bit-exact transcript parity
    (false-positive probability 2^-16)."""
    common, vd, proof = artifacts
    pow_response, _ = _transcript(common, vd, proof)
    leading_zeros = 64 - int(pow_response).bit_length()
    assert leading_zeros >= common.fri_config.proof_of_work_bits


def test_all_merkle_paths_verify(artifacts):
    """All 4 oracles' openings and all 3 FRI commit-phase openings verify
    against their caps, for every query round, with our Poseidon."""
    common, vd, proof = artifacts
    _, indices = _transcript(common, vd, proof)
    fp = proof.opening_proof
    oracle_caps = [vd.constants_sigmas_cap, proof.wires_cap,
                   proof.plonk_zs_partial_products_cap, proof.quotient_polys_cap]
    for qi, x_index in enumerate(indices):
        rnd = fp.query_rounds[qi]
        for oi in range(4):
            assert rnd.initial.evals[oi].shape[0] == common.oracle_widths[oi]
            _verify_merkle_proof(rnd.initial.evals[oi], x_index,
                                 oracle_caps[oi], rnd.initial.proofs[oi].siblings)
        idx = x_index
        for si, ab in enumerate(common.reduction_arity_bits):
            idx >>= ab
            _verify_merkle_proof(rnd.steps[si].evals.reshape(-1), idx,
                                 fp.commit_phase_caps[si],
                                 rnd.steps[si].proof.siblings)


def test_merkle_path_tamper_detected(artifacts):
    common, vd, proof = artifacts
    _, indices = _transcript(common, vd, proof)
    rnd = proof.opening_proof.query_rounds[0]
    bad = rnd.initial.evals[0].copy()
    bad[0] ^= np.uint64(1)
    with pytest.raises(Exception):
        _verify_merkle_proof(bad, indices[0], vd.constants_sigmas_cap,
                             rnd.initial.proofs[0].siblings)


def test_reference_proof_fri_verifies(artifacts):
    """The reference proof's COMPLETE FRI opening argument verifies:
    transcript, PoW, all 28 queries x 4 oracle Merkle paths, the combine
    at the solved level-0 points, all 3 fold levels, and the final-poly
    check — using the fork's conventions (generator g0 = k_is[1];
    compat/NOTES.md round-3).  Only the vanishing identity remains open
    (the strict xfail below)."""
    from zk_circuits_tpu.compat import verifier as cv

    common, vd, proof = artifacts
    cv.verify(common, vd, proof, _UNSOUND_skip_vanishing_for_tests=True)


def test_reference_proof_fri_rejects_tamper(artifacts):
    """Tampering one final-poly coefficient must break the (now-verifying)
    FRI argument."""
    import copy

    from zk_circuits_tpu.compat import verifier as cv

    common, vd, proof = artifacts
    bad = copy.deepcopy(proof)
    bad.opening_proof.final_poly[0, 0] ^= np.uint64(1)
    with pytest.raises(cv.RefVerificationError):
        cv.verify(common, vd, bad, _UNSOUND_skip_vanishing_for_tests=True)


def test_full_reference_proof_verifies(artifacts):
    """COMPLETE verification of the reference's own proof bytes
    (/root/reference/wormhole/bench-data/proof.bin against common.bin +
    verifier.bin): transcript, PoW, vanishing identity at zeta (all 145
    alpha-terms incl. the fork's negated ArithmeticGate convention — see
    compat/gates.py), combine, all FRI folds, Merkle paths, final poly.
    Matches VerifierCircuitData::verify semantics
    (/root/reference/wormhole/verifier/src/lib.rs:155-160)."""
    from zk_circuits_tpu.compat import verifier as cv

    common, vd, proof = artifacts
    cv.verify(common, vd, proof)


def test_full_reference_proof_rejects_tampered_pi(artifacts):
    """With the vanishing identity closed, a flipped public-input felt must
    fail full verification (the reference's verifier-negative contract,
    tests/src/verifier/verifier_tests.rs:49-68)."""
    import copy

    from zk_circuits_tpu.compat import verifier as cv

    common, vd, proof = artifacts
    bad = copy.deepcopy(proof)
    bad.public_inputs = list(bad.public_inputs)
    bad.public_inputs[0] = int(bad.public_inputs[0]) ^ 1
    with pytest.raises(cv.RefVerificationError):
        cv.verify(common, vd, bad)
