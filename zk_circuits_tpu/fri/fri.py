"""FRI opening proof: batched composition, commit/fold phase, PoW grind,
query rounds — and verification.

Mirrors the reference engine's FRI (qp-plonky2 fri/): the composition
polynomial sums all committed polynomials with powers of alpha per opening
point, quotients by (X - z), then folds with per-round betas at arity
2^reduction_arity_bits down to a clear-text final polynomial.  Folds are
performed in coefficient space (new_c[m] = sum_j beta^j c[A*m+j]) which is
exactly the fiber-interpolation fold evaluated at beta.

Codewords are kept in natural coset order x_i = shift * w_N^i; a fold fiber
for index i is the strided set {i mod M + k*M} (M = N/arity).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..hash import merkle as merklem
from ..hash.challenger import Challenger
from ..host import gl, gle, poseidon as hposeidon
from ..ntt import ntt as nttm
from ..plonk.config import FriConfig


@dataclass
class FriQueryStep:
    coset_values: np.ndarray      # (arity, 2) ext values of the opened fiber
    siblings: list[np.ndarray]


@dataclass
class FriQueryRound:
    initial_leaves: list[tuple[np.ndarray, list[np.ndarray]]]  # per oracle
    steps: list[FriQueryStep]


@dataclass
class FriProof:
    commit_phase_caps: list[np.ndarray]
    query_rounds: list[FriQueryRound]
    final_poly: np.ndarray        # (m, 2) ext coefficients
    pow_witness: int


# ---------------------------------------------------------------------------
# extension-polynomial helpers (host)
# ---------------------------------------------------------------------------


def ext_coset_ntt(coeffs: np.ndarray, shift: int, out_size: int) -> np.ndarray:
    """Evaluate ext-coeff poly (m, 2) on coset shift*<w_N>: (N, 2)."""
    m = coeffs.shape[0]
    padded = np.zeros((out_size, 2), dtype=np.uint64)
    padded[:m] = coeffs
    pw = gl.powers(shift, out_size)
    scaled = gl.mul(padded, pw[:, None])
    v0 = nttm.host_ntt(scaled[:, 0])
    v1 = nttm.host_ntt(scaled[:, 1])
    return np.stack([v0, v1], axis=-1)


def fold_coeffs(coeffs: np.ndarray, beta: np.ndarray, arity_bits: int) -> np.ndarray:
    """new_c[m] = sum_j beta^j * c[A*m + j]."""
    arity = 1 << arity_bits
    m = coeffs.shape[0] // arity
    c = coeffs[: m * arity].reshape(m, arity, 2)
    acc = c[:, arity - 1, :]
    for j in range(arity - 2, -1, -1):
        acc = gle.add(gle.mul(acc, np.broadcast_to(beta, acc.shape)), c[:, j, :])
    return acc


def eval_ext_poly(coeffs: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Horner evaluation of ext-coeff poly at ext point."""
    acc = gle.ZERO.copy()
    for c in coeffs[::-1]:
        acc = gle.add(gle.mul(acc, x), c)
    return acc


def divide_by_linear(coeffs: np.ndarray, z: np.ndarray) -> np.ndarray:
    """(P(X) - P(z)) / (X - z): drops the remainder.

    Vectorized (the textbook synthetic division is an n-step sequential
    recurrence): q_i = z^-(i+1) * sum_{j>=i+1} c_j z^j, computed as powers
    of z (log-doubling), a log-step modular suffix sum, and a final
    elementwise multiply."""
    from .oracle import ext_powers

    n = coeffs.shape[0]
    if n <= 1:
        return np.zeros((0, 2), np.uint64)
    if not np.any(z):  # z == 0: (P(X) - c0)/X
        return coeffs[1:].copy()
    zpow = ext_powers(z, n)                     # z^j
    w = gle.mul(coeffs, zpow)                   # c_j z^j
    # suffix sums S_i = sum_{j>=i} w_j (log-step doubling)
    s = w.copy()
    shift = 1
    while shift < n:
        s[:-shift] = gle.add(s[:-shift], s[shift:])
        shift *= 2
    zinv_pow = ext_powers(gle.inverse(z), n)    # z^-(i+1) = zinv^(i+1)
    return gle.mul(s[1:], zinv_pow[1:])


# ---------------------------------------------------------------------------
# proof-of-work grind (vectorized search)
# ---------------------------------------------------------------------------


def proof_of_work_grind(pow_base: np.ndarray, pow_bits: int) -> int:
    """Min witness w >= 0 with H(pow_base ‖ w)[0] having >= pow_bits leading
    zeros.  Deterministic (no_random parity).

    Measured break-even (TPU v5e via tunnel, 16-bit grind, 2026-08-20):
    warm device sweep (Pallas sponge, 2^17 hashes/dispatch) 55-76 ms vs
    native host scan 0.3-1.3 s on this image's 2 CPUs — the device wins
    ~15x warm, so it is the default on the tpu backend (first call pays a
    one-time jit, cached persistently).  ``ZKT_HOST_GRIND=1`` forces the
    host scan; ``ZKT_DEVICE_GRIND=1`` forces the device sweep on other
    backends (XLA fallback hash)."""
    import os

    threshold = np.uint64(1 << (64 - pow_bits))
    use_device = os.environ.get("ZKT_DEVICE_GRIND")
    if not use_device and not os.environ.get("ZKT_HOST_GRIND"):
        import jax

        use_device = jax.default_backend() == "tpu"
    if use_device:
        return _device_grind(pow_base, threshold)
    return _host_grind(pow_base, threshold, 0)


_DEVICE_GRIND_BATCH = 1 << 17


def _device_grind_fn():
    import jax
    import jax.numpy as jnp

    from ..field import goldilocks as gfd
    from ..hash import poseidon as dposeidon
    from ..hash import poseidon_pallas as pp

    if _device_grind_fn._cache is None:
        batch = _DEVICE_GRIND_BATCH
        use_pallas = jax.default_backend() == "tpu"

        def run(base: gfd.GF, start_lo, thr_lo, thr_hi):
            ws_lo = start_lo + jnp.arange(batch, dtype=jnp.uint32)
            inp = gfd.GF(
                jnp.concatenate(
                    [jnp.broadcast_to(base.lo, (batch, 4)), ws_lo[:, None]], axis=1
                ),
                jnp.concatenate(
                    [jnp.broadcast_to(base.hi, (batch, 4)),
                     jnp.zeros((batch, 1), jnp.uint32)], axis=1
                ),
            )
            # witness values start_lo + i < 2^31 always fit in the lo limb
            h = (pp.hash_leaves(inp, interpret=False) if use_pallas
                 else dposeidon.batch_hash_no_pad(inp))
            lo, hi = h.lo[:, 0], h.hi[:, 0]
            ok = (hi < thr_hi) | ((hi == thr_hi) & (lo < thr_lo))
            idx = jnp.argmax(ok)  # first True (ties: lowest index = min witness)
            return ok[idx], idx

        _device_grind_fn._cache = jax.jit(run)
    return _device_grind_fn._cache


_device_grind_fn._cache = None


def _device_grind(pow_base: np.ndarray, threshold: np.uint64) -> int:
    import jax.numpy as jnp

    from ..field import goldilocks as gfd

    fn = _device_grind_fn()
    base = gfd.from_u64(np.asarray(pow_base, dtype=np.uint64))
    thr_lo = jnp.uint32(int(threshold) & 0xFFFFFFFF)
    thr_hi = jnp.uint32(int(threshold) >> 32)
    start = 0
    while True:
        found, idx = fn(base, jnp.uint32(start), thr_lo, thr_hi)
        if bool(found):
            return start + int(idx)
        start += _DEVICE_GRIND_BATCH
        if start >= 1 << 31:  # unreachable for sane pow_bits; keep terminating
            return _host_grind(pow_base, threshold, start)


def _device_grind_batch_fn(B: int):
    import jax
    import jax.numpy as jnp

    from ..field import goldilocks as gfd
    from ..hash import poseidon as dposeidon
    from ..hash import poseidon_pallas as pp

    if B not in _device_grind_batch_fn._cache:
        batch = _DEVICE_GRIND_BATCH
        use_pallas = jax.default_backend() == "tpu"

        def run(bases: gfd.GF, start_lo, thr_lo, thr_hi):
            # bases: (B, 4); sweep the same witness window for every base
            # in ONE dispatch (B*batch hashes).
            ws_lo = start_lo + jnp.arange(batch, dtype=jnp.uint32)
            lo = jnp.concatenate(
                [jnp.broadcast_to(bases.lo[:, None, :], (B, batch, 4)),
                 jnp.broadcast_to(ws_lo[None, :, None], (B, batch, 1))],
                axis=-1).reshape(B * batch, 5)
            hi = jnp.concatenate(
                [jnp.broadcast_to(bases.hi[:, None, :], (B, batch, 4)),
                 jnp.zeros((B, batch, 1), jnp.uint32)],
                axis=-1).reshape(B * batch, 5)
            inp = gfd.GF(lo, hi)
            h = (pp.hash_leaves(inp, interpret=False) if use_pallas
                 else dposeidon.batch_hash_no_pad(inp))
            h0_lo = h.lo[:, 0].reshape(B, batch)
            h0_hi = h.hi[:, 0].reshape(B, batch)
            ok = (h0_hi < thr_hi) | ((h0_hi == thr_hi) & (h0_lo < thr_lo))
            idx = jnp.argmax(ok, axis=1)          # first hit per base
            found = jnp.take_along_axis(ok, idx[:, None], 1)[:, 0]
            return found, idx

        _device_grind_batch_fn._cache[B] = jax.jit(run)
    return _device_grind_batch_fn._cache[B]


_device_grind_batch_fn._cache = {}


def proof_of_work_grind_batch(pow_bases: np.ndarray,
                              pow_bits: int) -> list[int]:
    """Grind B independent PoW witnesses (one per proof of a batch).  On
    the TPU backend all B bases share each sweep dispatch (B*2^17 hashes
    per round trip) — the per-proof minimal-witness semantics of
    `proof_of_work_grind` are preserved because every base scans the same
    windows from 0 upward."""
    import os

    pow_bases = np.asarray(pow_bases, dtype=np.uint64).reshape(-1, 4)
    threshold = np.uint64(1 << (64 - pow_bits))
    use_device = os.environ.get("ZKT_DEVICE_GRIND")
    if not use_device and not os.environ.get("ZKT_HOST_GRIND"):
        import jax

        use_device = jax.default_backend() == "tpu"
    if not use_device:
        return [_host_grind(b, threshold, 0) for b in pow_bases]

    import jax.numpy as jnp

    from ..field import goldilocks as gfd

    B = pow_bases.shape[0]
    fn = _device_grind_batch_fn(B)
    bases = gfd.from_u64(pow_bases)
    thr_lo = jnp.uint32(int(threshold) & 0xFFFFFFFF)
    thr_hi = jnp.uint32(int(threshold) >> 32)
    out: list[int | None] = [None] * B
    start = 0
    while any(w is None for w in out):
        if start >= 1 << 31:  # unreachable for sane pow_bits
            for b in range(B):
                if out[b] is None:
                    out[b] = _host_grind(pow_bases[b], threshold, start)
            break
        found, idx = fn(bases, jnp.uint32(start), thr_lo, thr_hi)
        found = np.asarray(found)
        idx = np.asarray(idx)
        for b in range(B):
            if out[b] is None and bool(found[b]):
                out[b] = start + int(idx[b])
        start += _DEVICE_GRIND_BATCH
    return out  # type: ignore[return-value]


def _host_grind(pow_base: np.ndarray, threshold: np.uint64, start: int) -> int:
    batch = 1 << 15
    while True:
        ws = np.arange(start, start + batch, dtype=np.uint64)
        inp = np.zeros((batch, 5), dtype=np.uint64)
        inp[:, :4] = pow_base
        inp[:, 4] = ws
        h0 = hposeidon.batch_hash_no_pad(inp)[:, 0]
        hits = np.nonzero(h0 < threshold)[0]
        if hits.size:
            return int(ws[hits[0]])
        start += batch


def check_pow(pow_base: np.ndarray, witness: int, pow_bits: int) -> bool:
    inp = np.concatenate([pow_base, np.array([witness], dtype=np.uint64)])
    h0 = int(hposeidon.hash_no_pad(inp)[0])
    return h0 < (1 << (64 - pow_bits))


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------


def fri_prove(
    oracles: list,                 # list[PolynomialBatch] in instance order
    final_poly_coeffs: np.ndarray,  # (n, 2) composition quotient, ext coeffs
    degree_bits: int,
    fri_config: FriConfig,
    challenger: Challenger,
    coset_shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR,
) -> FriProof:
    from ..utils.profiling import stage_timer

    n = 1 << degree_bits
    lde_size = n << fri_config.rate_bits
    arities = fri_config.reduction_arities(degree_bits)

    # Initial codeword: LDE of the composition quotient on the main coset.
    coeffs = final_poly_coeffs
    values = ext_coset_ntt(coeffs, coset_shift, lde_size)

    trees: list[merklem.MerkleTree] = []
    codewords: list[np.ndarray] = []
    caps: list[np.ndarray] = []
    shift = coset_shift
    size = lde_size
    with stage_timer("fri/commit_phase"):
        for a_bits in arities:
            arity = 1 << a_bits
            m = size // arity
            # leaves: fiber groups, flattened ext values (arity*2 felts).
            grouped = values.reshape(arity, m, 2)          # [k, group, comp]
            leaves = np.ascontiguousarray(np.moveaxis(grouped, 0, 1)).reshape(m, arity * 2)
            tree = merklem.MerkleTree.build(leaves, fri_config.cap_height)
            trees.append(tree)
            codewords.append(values)
            caps.append(tree.cap)
            challenger.observe_cap(tree.cap)
            beta = challenger.get_extension_challenge()
            coeffs = fold_coeffs(coeffs, beta, a_bits)
            shift = pow(shift, arity, gl.P_INT)
            size = m
            values = ext_coset_ntt(coeffs, shift, size)

    final_poly = coeffs
    challenger.observe_extension_elements(final_poly)

    pow_base = challenger.get_hash()
    with stage_timer("fri/pow_grind"):
        pow_witness = proof_of_work_grind(pow_base, fri_config.proof_of_work_bits)
    challenger.observe_element(pow_witness)

    # Draw every query index first (the challenger stream is independent of
    # row extraction), then gather all touched rows + sibling paths per
    # oracle in ONE device gather each (oracle.open_rows).
    indices = [
        challenger.get_challenge() % lde_size
        for _ in range(fri_config.num_query_rounds)
    ]
    idx_arr = np.array(indices, dtype=np.int64)
    with stage_timer("fri/query_gather"):
        opened = [o.open_rows(idx_arr) for o in oracles]  # (rows (Q,w), sibs (Q,L,4))

    query_rounds = []
    for qi, idx in enumerate(indices):
        initial = [
            (rows[qi].copy(), [s.copy() for s in sibs[qi]])
            for rows, sibs in opened
        ]
        steps = []
        cur = idx
        cur_size = lde_size
        for r, a_bits in enumerate(arities):
            arity = 1 << a_bits
            m = cur_size // arity
            group = cur % m
            coset_values = codewords[r][group::m]  # (arity, 2)
            siblings = trees[r].prove(group)
            steps.append(FriQueryStep(coset_values.copy(), siblings))
            cur = group
            cur_size = m
        query_rounds.append(FriQueryRound(initial, steps))

    return FriProof(caps, query_rounds, final_poly, pow_witness)


# ---------------------------------------------------------------------------
# verifier
# ---------------------------------------------------------------------------


def fold_single(
    coset_values: np.ndarray, x0: int, a_bits: int, beta: np.ndarray, omega: int
) -> np.ndarray:
    """Evaluate the fiber interpolant at beta for one query point.

    coset_values[k] = f(x0 * omega^k) where omega has order 2^a_bits."""
    vals = [v.copy() for v in coset_values]
    pts = [pow(omega, k, gl.P_INT) * x0 % gl.P_INT for k in range(len(vals))]
    b = beta.copy()
    arity = len(vals)
    inv2 = pow(2, gl.P_INT - 2, gl.P_INT)
    while arity > 1:
        half = arity // 2
        new_vals = []
        new_pts = []
        for k in range(half):
            v_plus, v_minus = vals[k], vals[k + half]
            s = gle.mul_base(gle.add(v_plus, v_minus), np.uint64(inv2))
            inv_2x = pow(2 * pts[k] % gl.P_INT, gl.P_INT - 2, gl.P_INT)
            d = gle.mul_base(gle.sub(v_plus, v_minus), np.uint64(inv_2x))
            new_vals.append(gle.add(s, gle.mul(b, d)))
            new_pts.append(pts[k] * pts[k] % gl.P_INT)
        vals, pts = new_vals, new_pts
        b = gle.mul(b, b)
        arity = half
    return vals[0]


def verify_fri_proof(
    proof: FriProof,
    reduced_openings,              # list of (z_b (2,), batch_poly_indices, y_b (2,))
    oracle_caps: list[np.ndarray],
    oracle_num_polys: list[int],
    alpha: np.ndarray,
    degree_bits: int,
    fri_config: FriConfig,
    challenger: Challenger,
    coset_shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR,
) -> None:
    """Replays the transcript and checks every query round.  ``challenger``
    must be positioned right after alpha was drawn (same as prover's).
    reduced_openings entries: (point z_b, list of (oracle_idx, poly_idx),
    claimed reduced eval y_b)."""
    n = 1 << degree_bits
    lde_size = n << fri_config.rate_bits
    arities = fri_config.reduction_arities(degree_bits)
    assert len(proof.commit_phase_caps) == len(arities)

    betas = []
    for cap in proof.commit_phase_caps:
        challenger.observe_cap(cap)
        betas.append(challenger.get_extension_challenge())
    challenger.observe_extension_elements(proof.final_poly)

    pow_base = challenger.get_hash()
    if not check_pow(pow_base, proof.pow_witness, fri_config.proof_of_work_bits):
        raise ValueError("FRI proof-of-work check failed")
    challenger.observe_element(proof.pow_witness)

    # final poly degree bound
    final_bits = degree_bits - sum(arities)
    if proof.final_poly.shape[0] > (1 << final_bits):
        raise ValueError("FRI final polynomial too large")

    w_lde = gl.primitive_root_of_unity(degree_bits + fri_config.rate_bits)

    for qr in proof.query_rounds:
        idx = challenger.get_challenge() % lde_size
        if len(qr.initial_leaves) != len(oracle_caps):
            raise ValueError("FRI query round oracle count mismatch")
        # verify oracle openings
        for o, (leaf, siblings) in enumerate(qr.initial_leaves):
            if len(leaf) != oracle_num_polys[o]:
                raise ValueError("FRI initial leaf width mismatch")
            if not merklem.verify_merkle_proof(leaf, idx, oracle_caps[o], siblings):
                raise ValueError(f"FRI initial Merkle proof failed (oracle {o})")

        # composition value at x_idx from leaves
        x = pow(w_lde, idx, gl.P_INT) * coset_shift % gl.P_INT
        x_ext = np.array([x, 0], dtype=np.uint64)
        value = None
        for z_b, poly_refs, y_b in reduced_openings:
            comp = gle.ZERO.copy()
            apow = gle.ONE.copy()
            for (oi, pi) in poly_refs:
                leaf_val = qr.initial_leaves[oi][0][pi]
                comp = gle.add(comp, gle.mul_base(apow, np.uint64(leaf_val)))
                apow = gle.mul(apow, alpha)
            num = gle.sub(comp, y_b)
            den = gle.sub(x_ext, z_b)
            q_val = gle.mul(num, gle.inverse(den))
            if value is None:
                value = q_val
            else:
                # final = q_b + alpha^{|batch_b|} * previous
                shift_pow = gle.powmod(alpha, len(poly_refs))
                value = gle.add(q_val, gle.mul(shift_pow, value))
        cur_value = value
        cur_idx = idx
        cur_size = lde_size
        cur_shift = coset_shift
        cur_w = w_lde
        for r, a_bits in enumerate(arities):
            arity = 1 << a_bits
            m = cur_size // arity
            group = cur_idx % m
            k = cur_idx // m
            step = qr.steps[r]
            if step.coset_values.shape != (arity, 2):
                raise ValueError("FRI step shape mismatch")
            if not np.array_equal(step.coset_values[k], cur_value):
                raise ValueError("FRI fold consistency check failed")
            leaf = step.coset_values.reshape(-1)
            if not merklem.verify_merkle_proof(
                leaf, group, proof.commit_phase_caps[r], step.siblings
            ):
                raise ValueError("FRI commit-phase Merkle proof failed")
            # x0 of the fiber: point at index `group`; omega = w^m has order arity
            x0 = pow(cur_w, group, gl.P_INT) * cur_shift % gl.P_INT
            omega = pow(cur_w, m, gl.P_INT)
            cur_value = fold_single(step.coset_values, x0, a_bits, betas[r], omega)
            cur_idx = group
            cur_size = m
            cur_shift = pow(cur_shift, arity, gl.P_INT)
            cur_w = pow(cur_w, arity, gl.P_INT)
        # final check against the clear final polynomial
        xf = pow(cur_w, cur_idx, gl.P_INT) * cur_shift % gl.P_INT
        expect = eval_ext_poly(proof.final_poly, np.array([xf, 0], dtype=np.uint64))
        if not np.array_equal(expect, cur_value):
            raise ValueError("FRI final polynomial evaluation mismatch")
