"""Device-resident FRI opening proof + opening evaluations (TPU path).

Round-3 rework (VERDICT r2 item 1): the host FRI pipeline in fri/fri.py
kept the commit-phase NTTs, the Merkle trees and the opening evaluations
on host numpy; at wormhole scale that plus the per-level query gathers
dominated warm prove time.  This module runs SURVEY.md §3.2 steps 6-7 on
device:

- openings: every oracle polynomial evaluated at zeta / g*zeta in ONE
  jitted program (base-coeff matvec against host-precomputed power tables);
- composition: the alpha-reduced FRI quotient (batch 0 at zeta, batch 1 at
  g*zeta) with the vectorized divide-by-linear, fused with the round-0
  codeword NTT and Merkle commit;
- fold rounds: coefficient-space fold (new_c[m] = sum_j beta^j c[A*m+j])
  + next codeword NTT + Merkle commit, one program per round shape;
- query phase: all oracles gathered in one program, all commit-phase trees
  in another (two dispatches instead of ~50).

The Fiat-Shamir challenger stays on host; only caps (512 B), the final
polynomial and query rows cross the link.  Bit-identical to fri.fri_prove
(device NTT/Poseidon are golden-tested against the host model); parity is
pinned by tests/test_device_prover.py.

Extension elements travel as pairs of base GF arrays (components of
GF(p^2) = GF(p)[x]/(x^2 - 7), host/gle.py semantics).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..field import goldilocks as gfd
from ..field.goldilocks import GF
from ..hash import merkle as merklem
from ..host import gl, gle
from ..ntt import ntt as nttm
from . import fri as frim

_W = 7  # x^2 = 7


# ---------------------------------------------------------------------------
# device extension-field helpers (component pairs)
# ---------------------------------------------------------------------------


def _emul(a0: GF, a1: GF, b0: GF, b1: GF) -> tuple[GF, GF]:
    c0 = gfd.add(gfd.mul(a0, b0), gfd.mul_const(gfd.mul(a1, b1), _W))
    c1 = gfd.add(gfd.mul(a0, b1), gfd.mul(a1, b0))
    return c0, c1


def _eadd(a0: GF, a1: GF, b0: GF, b1: GF) -> tuple[GF, GF]:
    return gfd.add(a0, b0), gfd.add(a1, b1)


def _ext_pair(arr: np.ndarray) -> tuple[GF, GF]:
    """Host (..., 2) ext array -> device component pair."""
    arr = np.asarray(arr, dtype=np.uint64)
    return gfd.from_u64(arr[..., 0]), gfd.from_u64(arr[..., 1])


def _to_ext(c0: GF, c1: GF) -> np.ndarray:
    """Device component pair -> host (..., 2) ext array."""
    return np.stack([gfd.to_u64(c0), gfd.to_u64(c1)], axis=-1)


def _reduce_alpha(batch: GF, ap0: GF, ap1: GF) -> tuple[GF, GF]:
    """sum_i alpha^i * P_i: (k, n) base polys x (k,) ext powers -> (n,) ext."""
    w0 = gfd.mul(batch, GF(ap0.lo[:, None], ap0.hi[:, None]))
    w1 = gfd.mul(batch, GF(ap1.lo[:, None], ap1.hi[:, None]))
    return gfd.sum_mod(w0, axis=0), gfd.sum_mod(w1, axis=0)


def _suffix_sum(s0: GF, s1: GF) -> tuple[GF, GF]:
    """s_i <- sum_{j>=i} s_j via log-step doubling (matches fri.divide_by_linear)."""
    import jax.numpy as jnp

    n = s0.lo.shape[-1]
    shift = 1
    while shift < n:
        h0, h1 = _eadd(
            GF(s0.lo[:-shift], s0.hi[:-shift]), GF(s1.lo[:-shift], s1.hi[:-shift]),
            GF(s0.lo[shift:], s0.hi[shift:]), GF(s1.lo[shift:], s1.hi[shift:]),
        )
        s0 = GF(jnp.concatenate([h0.lo, s0.lo[-shift:]]),
                jnp.concatenate([h0.hi, s0.hi[-shift:]]))
        s1 = GF(jnp.concatenate([h1.lo, s1.lo[-shift:]]),
                jnp.concatenate([h1.hi, s1.hi[-shift:]]))
        shift *= 2
    return s0, s1


def _ddl(c0: GF, c1: GF, zp0: GF, zp1: GF, zi0: GF, zi1: GF) -> tuple[GF, GF]:
    """(P(X) - P(z)) / (X - z) in coefficient space:
    q_i = zinv^(i+1) * sum_{j>=i+1} c_j z^j (fri.divide_by_linear)."""
    w0, w1 = _emul(c0, c1, zp0, zp1)
    s0, s1 = _suffix_sum(w0, w1)
    tail0 = GF(s0.lo[1:], s0.hi[1:])
    tail1 = GF(s1.lo[1:], s1.hi[1:])
    zt0 = GF(zi0.lo[1:], zi0.hi[1:])
    zt1 = GF(zi1.lo[1:], zi1.hi[1:])
    return _emul(tail0, tail1, zt0, zt1)


def _ext_coset_ntt_dev(c0: GF, c1: GF, shift: int, out_size: int) -> tuple[GF, GF]:
    """Evaluate ext-coeff pair on coset shift*<w_N> (fri.ext_coset_ntt)."""
    import jax.numpy as jnp

    m = c0.lo.shape[-1]
    pad = [(0, out_size - m)]
    p0 = GF(jnp.pad(c0.lo, pad), jnp.pad(c0.hi, pad))
    p1 = GF(jnp.pad(c1.lo, pad), jnp.pad(c1.hi, pad))
    pw = nttm._device_powers(shift, out_size)
    return nttm.ntt(gfd.mul(p0, pw)), nttm.ntt(gfd.mul(p1, pw))


def _fiber_leaves(v0: GF, v1: GF, arity: int) -> GF:
    """Codeword (N,) pair -> (m, arity*2) leaf rows, fiber-grouped with
    interleaved ext components (fri.fri_prove leaf layout)."""
    import jax.numpy as jnp

    n = v0.lo.shape[-1]
    m = n // arity
    # grouped[k, j] = v[k*m + j]; leaf j holds [v(0,j), v(1,j), ...]
    def leaf(lo_a, lo_b):
        g0 = lo_a.reshape(arity, m).T      # (m, arity)
        g1 = lo_b.reshape(arity, m).T
        return jnp.stack([g0, g1], axis=-1).reshape(m, arity * 2)

    return GF(leaf(v0.lo, v1.lo), leaf(v0.hi, v1.hi))


def _fold_dev(c0: GF, c1: GF, b0: GF, b1: GF, arity_bits: int) -> tuple[GF, GF]:
    """new_c[m] = sum_j beta^j c[A*m + j] (fri.fold_coeffs)."""
    arity = 1 << arity_bits
    n = c0.lo.shape[-1]
    m = n // arity
    r0 = GF(c0.lo.reshape(m, arity), c0.hi.reshape(m, arity))
    r1 = GF(c1.lo.reshape(m, arity), c1.hi.reshape(m, arity))
    acc0 = GF(r0.lo[:, arity - 1], r0.hi[:, arity - 1])
    acc1 = GF(r1.lo[:, arity - 1], r1.hi[:, arity - 1])
    for j in range(arity - 2, -1, -1):
        acc0, acc1 = _emul(acc0, acc1, b0, b1)
        acc0, acc1 = _eadd(acc0, acc1,
                           GF(r0.lo[:, j], r0.hi[:, j]),
                           GF(r1.lo[:, j], r1.hi[:, j]))
    return acc0, acc1


# ---------------------------------------------------------------------------
# jitted programs (cached per shape)
# ---------------------------------------------------------------------------


def _make_openings_run(num_zs: int):
    def run(sets, zp0, zp1, znp0, znp1):
        batch = gfd.concatenate(list(sets), axis=0)
        e0 = gfd.sum_mod(gfd.mul(batch, GF(zp0.lo[None, :], zp0.hi[None, :])), axis=-1)
        e1 = gfd.sum_mod(gfd.mul(batch, GF(zp1.lo[None, :], zp1.hi[None, :])), axis=-1)
        zs = sets[2]
        zs2 = GF(zs.lo[:num_zs], zs.hi[:num_zs])
        zn0 = gfd.sum_mod(gfd.mul(zs2, GF(znp0.lo[None, :], znp0.hi[None, :])), axis=-1)
        zn1 = gfd.sum_mod(gfd.mul(zs2, GF(znp1.lo[None, :], znp1.hi[None, :])), axis=-1)
        return e0, e1, zn0, zn1

    return run


@lru_cache(maxsize=16)
def _openings_fn(widths: tuple, n: int, num_zs: int):
    """Evaluate all oracle polys at zeta (+ the Z polys at g*zeta)."""
    import jax

    return jax.jit(_make_openings_run(num_zs))


@lru_cache(maxsize=16)
def _openings_batch_fn(widths: tuple, n: int, num_zs: int, B: int,
                       shared0: bool):
    """Batched openings: proof axis leading everywhere except oracle 0
    (constants/sigmas — circuit-constant, shared across the batch when
    ``shared0``)."""
    import jax

    sets_axes = (None if shared0 else 0,) + (0,) * 3
    return jax.jit(jax.vmap(_make_openings_run(num_zs),
                            in_axes=(sets_axes, 0, 0, 0, 0)))


def _make_compose_run(num_zs: int, round0: tuple | None):
    """Composition-quotient body; with ``round0`` = (rate_bits, arity_bits,
    cap_height, coset_shift, lde_size) it additionally NTTs and commits the
    round-0 codeword."""

    def run(sets, ap0, ap1, zp0, zp1, zi0, zi1,
            azp0, azp1, anp0, anp1, ani0, ani1, sp0, sp1):
        batch0 = gfd.concatenate(list(sets), axis=0)
        comp0_0, comp0_1 = _reduce_alpha(batch0, ap0, ap1)
        q0_0, q0_1 = _ddl(comp0_0, comp0_1, zp0, zp1, zi0, zi1)
        zs = sets[2]
        zs2 = GF(zs.lo[:num_zs], zs.hi[:num_zs])
        comp1_0, comp1_1 = _reduce_alpha(zs2, azp0, azp1)
        q1_0, q1_1 = _ddl(comp1_0, comp1_1, anp0, anp1, ani0, ani1)
        # final[:n-1] = q1 + shift_pow * q0;  final[n-1] = 0
        sq0, sq1 = _emul(q0_0, q0_1, sp0, sp1)
        f0, f1 = _eadd(q1_0, q1_1, sq0, sq1)
        import jax.numpy as jnp

        pad = [(0, 1)]
        f0 = GF(jnp.pad(f0.lo, pad), jnp.pad(f0.hi, pad))
        f1 = GF(jnp.pad(f1.lo, pad), jnp.pad(f1.hi, pad))
        if round0 is None:
            return f0, f1
        rate_bits, arity_bits, cap_height, coset_shift, lde_size = round0
        v0, v1 = _ext_coset_ntt_dev(f0, f1, coset_shift, lde_size)
        leaves = _fiber_leaves(v0, v1, 1 << arity_bits)
        levels = merklem.device_merkle_levels(leaves, cap_height)
        return f0, f1, leaves, levels

    return run


@lru_cache(maxsize=16)
def _compose_round0_fn(total_polys: int, n: int, num_zs: int, rate_bits: int,
                       arity_bits: int, cap_height: int, coset_shift: int):
    import jax

    lde_size = n << rate_bits
    return jax.jit(_make_compose_run(
        num_zs, (rate_bits, arity_bits, cap_height, coset_shift, lde_size)))


@lru_cache(maxsize=16)
def _compose_only_fn(total_polys: int, n: int, num_zs: int):
    """Composition quotient without a round-0 commit — for circuits small
    enough that FRI has no fold rounds (degree_bits <= final_poly_bits)."""
    import jax

    return jax.jit(_make_compose_run(num_zs, None))


@lru_cache(maxsize=16)
def _compose_batch_fn(total_polys: int, n: int, num_zs: int, B: int,
                      shared0: bool, round0: tuple | None):
    import jax

    sets_axes = (None if shared0 else 0,) + (0,) * 3
    return jax.jit(jax.vmap(_make_compose_run(num_zs, round0),
                            in_axes=(sets_axes,) + (0,) * 14))


def _make_fold_commit_run(arity_bits: int, next_arity_bits: int,
                          cap_height: int, shift: int, rate_bits: int):
    def run(c0, c1, b0, b1):
        f0, f1 = _fold_dev(c0, c1, b0, b1, arity_bits)
        size = f0.lo.shape[-1] << rate_bits  # rate is preserved under folding
        v0, v1 = _ext_coset_ntt_dev(f0, f1, shift, size)
        leaves = _fiber_leaves(v0, v1, 1 << next_arity_bits)
        levels = merklem.device_merkle_levels(leaves, cap_height)
        return f0, f1, leaves, levels

    return run


@lru_cache(maxsize=16)
def _fold_commit_fn(n_coeffs: int, arity_bits: int, next_arity_bits: int,
                    cap_height: int, shift: int, rate_bits: int):
    """Fold with beta, NTT the next codeword, commit its fiber tree."""
    import jax

    return jax.jit(_make_fold_commit_run(arity_bits, next_arity_bits,
                                         cap_height, shift, rate_bits))


@lru_cache(maxsize=16)
def _fold_commit_batch_fn(n_coeffs: int, arity_bits: int,
                          next_arity_bits: int, cap_height: int, shift: int,
                          rate_bits: int, B: int):
    import jax

    return jax.jit(jax.vmap(_make_fold_commit_run(
        arity_bits, next_arity_bits, cap_height, shift, rate_bits)))


@lru_cache(maxsize=16)
def _final_fold_fn(n_coeffs: int, arity_bits: int):
    import jax

    def run(c0, c1, b0, b1):
        return _fold_dev(c0, c1, b0, b1, arity_bits)

    return jax.jit(run)


@lru_cache(maxsize=16)
def _final_fold_batch_fn(n_coeffs: int, arity_bits: int, B: int):
    import jax

    def run(c0, c1, b0, b1):
        return _fold_dev(c0, c1, b0, b1, arity_bits)

    return jax.jit(jax.vmap(run))


import functools


@functools.lru_cache(maxsize=16)
def _gather_fn(num_trees: int, shapes: tuple, colmajor: tuple):
    """Gather query rows + sibling paths for several trees in one program,
    returning ONE flat (2, total) u32 buffer (lo row, hi row) so the host
    needs a single d2h fetch — each fetch through the tunnel costs ~50 ms,
    so per-tree fetches dominated the query stage.  Memoized per shape so
    warm proves reuse the compiled program.

    shapes[t] = (num_levels, leaf_width); inputs: per tree (leaves, levels
    list), plus per tree an index vector (Q,).  ``colmajor[t]``: the leaf
    store is column-major values (w, N) — leaf row i = values[:, i] — the
    commit's natural residency since r5."""
    import jax
    import jax.numpy as jnp

    def run(trees, idxs):
        chunks_lo, chunks_hi = [], []
        for (leaves, levels), idx, cm in zip(trees, idxs, colmajor):
            if cm:
                chunks_lo.append(leaves.lo[:, idx].T.reshape(-1))
                chunks_hi.append(leaves.hi[:, idx].T.reshape(-1))
            else:
                chunks_lo.append(leaves.lo[idx].reshape(-1))
                chunks_hi.append(leaves.hi[idx].reshape(-1))
            i = idx
            for lv in levels[:-1]:
                chunks_lo.append(lv.lo[i ^ 1].reshape(-1))
                chunks_hi.append(lv.hi[i ^ 1].reshape(-1))
                i = i >> 1
        return jnp.stack(
            [jnp.concatenate(chunks_lo), jnp.concatenate(chunks_hi)])

    return jax.jit(run)


def gather_trees(trees: list, idxs: list[np.ndarray],
                 colmajor: tuple | None = None):
    """trees: list of (leaves GF (N, w) — or (w, N) when the matching
    ``colmajor`` flag is set — levels list[GF]); idxs: per-tree query
    indices.  Returns [(rows u64 (Q, w), sibs u64 (Q, L, 4))]."""
    import jax
    import jax.numpy as jnp

    if colmajor is None:
        colmajor = (False,) * len(trees)
    colmajor = tuple(bool(c) for c in colmajor)
    shapes = tuple(
        (len(lv), lf.lo.shape[0] if cm else lf.lo.shape[1])
        for (lf, lv), cm in zip(trees, colmajor))
    fn = _gather_fn(len(trees), shapes, colmajor)
    jidx = tuple(jnp.asarray(np.asarray(i, dtype=np.int64)) for i in idxs)
    flat = np.asarray(jax.device_get(fn(tuple(trees), jidx)))
    u64 = flat[0].astype(np.uint64) | (flat[1].astype(np.uint64) << np.uint64(32))
    out = []
    pos = 0
    for ((lf, lv), idx), cm in zip(zip(trees, idxs), colmajor):
        q = int(np.asarray(idx).shape[0])
        w = lf.lo.shape[0] if cm else lf.lo.shape[1]
        nlev = len(lv) - 1
        rows = u64[pos : pos + q * w].reshape(q, w)
        pos += q * w
        if nlev > 0:
            sibs = u64[pos : pos + nlev * q * 4].reshape(nlev, q, 4)
            sibs = np.ascontiguousarray(sibs.transpose(1, 0, 2))
            pos += nlev * q * 4
        else:
            sibs = np.zeros((q, 0, 4), dtype=np.uint64)
        out.append((rows, sibs))
    assert pos == u64.shape[0]
    return out


@functools.lru_cache(maxsize=16)
def _gather_batch_fn(num_trees: int, shapes: tuple, shared: tuple,
                     colmajor: tuple):
    """Batched-proof variant of `_gather_fn`: every non-shared tree carries
    a leading proof axis, every index vector is (B, Q), and the whole
    query harvest for ALL proofs lands in one flat (2, total) u32 buffer
    (one d2h round trip for the entire batch).  ``colmajor[t]``: the leaf
    store is column-major values — (w, N) shared / (B, w, N) batched."""
    import jax
    import jax.numpy as jnp

    def take_rows(arr, idx, sh, cm):
        if cm:
            if sh:
                return arr[:, idx].transpose(1, 2, 0)      # (B, Q, w)
            return jax.vmap(lambda v, i: v[:, i].T)(arr, idx)
        return arr[idx] if sh else jax.vmap(lambda l, i: l[i])(arr, idx)

    def run(trees, idxs):
        chunks_lo, chunks_hi = [], []
        for (leaves, levels), idx, sh, cm in zip(trees, idxs, shared,
                                                 colmajor):
            chunks_lo.append(take_rows(leaves.lo, idx, sh, cm).reshape(-1))
            chunks_hi.append(take_rows(leaves.hi, idx, sh, cm).reshape(-1))
            i = idx
            for lv in levels[:-1]:
                chunks_lo.append(take_rows(lv.lo, i ^ 1, sh, False).reshape(-1))
                chunks_hi.append(take_rows(lv.hi, i ^ 1, sh, False).reshape(-1))
                i = i >> 1
        return jnp.stack(
            [jnp.concatenate(chunks_lo), jnp.concatenate(chunks_hi)])

    return jax.jit(run)


def gather_trees_batch(trees: list, idxs: list[np.ndarray],
                       shared: list[bool],
                       colmajor: list[bool] | None = None):
    """trees: per tree (leaves GF, levels tuple[GF]) where non-``shared``
    trees have a leading proof axis B; idxs: per tree (B, Q) query
    indices.  Returns per tree (rows u64 (B, Q, w), sibs u64 (B, Q, L, 4)).
    """
    import jax
    import jax.numpy as jnp

    B = int(np.asarray(idxs[0]).shape[0])
    if colmajor is None:
        colmajor = [False] * len(trees)
    colmajor = tuple(bool(c) for c in colmajor)

    def leaf_w(lf, sh, cm):
        # row-major: (..., N, w) -> w is last; col-major: (..., w, N)
        return lf.lo.shape[-2] if cm else lf.lo.shape[-1]

    shapes = tuple(
        (len(lv), leaf_w(lf, sh, cm), bool(sh), cm)
        for (lf, lv), sh, cm in zip(trees, shared, colmajor))
    fn = _gather_batch_fn(len(trees), shapes, tuple(bool(s) for s in shared),
                          colmajor)
    jidx = tuple(jnp.asarray(np.asarray(i, dtype=np.int64)) for i in idxs)
    flat = np.asarray(jax.device_get(fn(tuple(trees), jidx)))
    u64 = flat[0].astype(np.uint64) | (flat[1].astype(np.uint64) << np.uint64(32))
    out = []
    pos = 0
    for ((lf, lv), idx), sh, cm in zip(zip(trees, idxs), shared, colmajor):
        q = int(np.asarray(idx).shape[1])
        w = leaf_w(lf, sh, cm)
        nlev = len(lv) - 1
        rows = u64[pos : pos + B * q * w].reshape(B, q, w)
        pos += B * q * w
        if nlev > 0:
            sibs = u64[pos : pos + nlev * B * q * 4].reshape(nlev, B, q, 4)
            sibs = np.ascontiguousarray(sibs.transpose(1, 2, 0, 3))
            pos += nlev * B * q * 4
        else:
            sibs = np.zeros((B, q, 0, 4), dtype=np.uint64)
        out.append((rows, sibs))
    assert pos == u64.shape[0]
    return out


# ---------------------------------------------------------------------------
# orchestration (host challenger, device compute)
# ---------------------------------------------------------------------------


def open_and_fri_device(common, oracles, ch) -> tuple:
    """Device analog of prover._open_and_fri: returns (OpeningSet, FriProof).

    ``oracles`` are PolynomialBatch instances with coeffs_dev/leaves_dev/
    levels_dev resident on device."""
    from ..plonk.proof import OpeningSet
    from ..utils.profiling import stage_timer
    from .oracle import ext_powers

    cfg = common.config
    n = common.degree
    num_zs = cfg.num_challenges
    zeta = ch.get_extension_challenge()
    g_ext = np.array([gl.primitive_root_of_unity(common.degree_bits), 0],
                     dtype=np.uint64)
    zeta_next = gle.mul(zeta, g_ext)

    sets = tuple(o.coeffs_dev for o in oracles)
    widths = tuple(s.lo.shape[0] for s in sets)

    with stage_timer("fri/openings_eval"):
        # Sub-timers so the warm profile localizes this stage's cost
        # (host power tables vs h2d+dispatch vs the serializing d2h that
        # the Fiat-Shamir transcript forces before alpha can be drawn).
        with stage_timer("fri/openings_eval/powers_host"):
            zpow = ext_powers(zeta, n)
            zpow_next = ext_powers(zeta_next, n)
            args = (*_ext_pair(zpow), *_ext_pair(zpow_next))
        with stage_timer("fri/openings_eval/dispatch"):
            fn = _openings_fn(widths, n, num_zs)
            e0, e1, zn0, zn1 = fn(sets, *args)
        with stage_timer("fri/openings_eval/fetch"):
            evals = _to_ext(e0, e1)          # (K, 2)
            zs_next = _to_ext(zn0, zn1)      # (num_zs, 2)
    k0, k1, k2, k3 = widths
    openings = OpeningSet(
        constants_sigmas=evals[:k0],
        wires=evals[k0 : k0 + k1],
        zs_partial_products=evals[k0 + k1 : k0 + k1 + k2],
        quotient=evals[k0 + k1 + k2 :],
        zs_next=zs_next,
    )
    ch.observe_extension_elements(openings.batch0_flat())
    ch.observe_extension_elements(openings.batch1_flat())
    alpha = ch.get_extension_challenge()

    fri_config = cfg.fri_config
    lde_size = n << fri_config.rate_bits
    arities = fri_config.reduction_arities(common.degree_bits)
    coset_shift = gl.MULTIPLICATIVE_GROUP_GENERATOR

    # --- compose + round-0 commit --------------------------------------------
    with stage_timer("fri/compose_r0"):
        total = sum(widths)
        apow = ext_powers(alpha, total)
        apow_zs = apow[:num_zs]
        shift_pow = gle.powmod(alpha, num_zs)
        zinv_pow = ext_powers(gle.inverse(zeta), n)
        zinv_pow_next = ext_powers(gle.inverse(zeta_next), n)
        compose_args = (
            sets, *_ext_pair(apow), *_ext_pair(zpow), *_ext_pair(zinv_pow),
            *_ext_pair(apow_zs), *_ext_pair(zpow_next), *_ext_pair(zinv_pow_next),
            *_ext_pair(shift_pow),
        )
        if arities:
            fn0 = _compose_round0_fn(total, n, num_zs, fri_config.rate_bits,
                                     arities[0], fri_config.cap_height,
                                     coset_shift)
            f0, f1, leaves0, levels0 = fn0(*compose_args)
        else:
            f0, f1 = _compose_only_fn(total, n, num_zs)(*compose_args)
            leaves0 = levels0 = None

    caps: list[np.ndarray] = []
    trees: list[tuple] = []   # (leaves GF, levels list)
    tree_leaf_arity: list[int] = []
    cur = (f0, f1)
    cur_leaves, cur_levels = leaves0, levels0
    shift = coset_shift
    size = lde_size
    with stage_timer("fri/commit_phase"):
        for r, a_bits in enumerate(arities):
            arity = 1 << a_bits
            cap = gfd.to_u64(cur_levels[-1])
            caps.append(cap)
            trees.append((cur_leaves, cur_levels))
            tree_leaf_arity.append(arity)
            ch.observe_cap(cap)
            beta = ch.get_extension_challenge()
            b0, b1 = _ext_pair(beta)
            shift = pow(shift, arity, gl.P_INT)
            size //= arity
            if r + 1 < len(arities):
                fn_r = _fold_commit_fn(cur[0].lo.shape[-1], a_bits,
                                       arities[r + 1], fri_config.cap_height,
                                       shift, fri_config.rate_bits)
                f0, f1, cur_leaves, cur_levels = fn_r(cur[0], cur[1], b0, b1)
                cur = (f0, f1)
            else:
                fn_f = _final_fold_fn(cur[0].lo.shape[-1], a_bits)
                cur = fn_f(cur[0], cur[1], b0, b1)

    final_poly = _to_ext(cur[0], cur[1])
    ch.observe_extension_elements(final_poly)

    pow_base = ch.get_hash()
    with stage_timer("fri/pow_grind"):
        pow_witness = frim.proof_of_work_grind(pow_base,
                                               fri_config.proof_of_work_bits)
    ch.observe_element(pow_witness)

    indices = [ch.get_challenge() % lde_size
               for _ in range(fri_config.num_query_rounds)]
    idx_arr = np.array(indices, dtype=np.int64)

    # --- query gathers: ONE program + ONE d2h fetch for oracles and FRI
    # commit trees together (per-fetch tunnel latency dominates) ---
    with stage_timer("fri/query_gather"):
        oracle_trees = [
            ((o.leaves_dev if o.leaves_dev is not None else o.values_dev),
             tuple(o.levels_dev)) for o in oracles]
        oracle_cm = [o.leaves_dev is None for o in oracles]
        step_idx = []
        cur_size = lde_size
        for a_bits in arities:
            m = cur_size >> a_bits
            step_idx.append(idx_arr % m)
            cur_size = m
        all_opened = gather_trees(
            [(lf, lv) for lf, lv in oracle_trees]
            + [(lf, tuple(lv)) for lf, lv in trees],
            [idx_arr] * len(oracles) + step_idx,
            colmajor=tuple(oracle_cm) + (False,) * len(trees),
        )
        opened = all_opened[: len(oracles)]
        fri_opened = all_opened[len(oracles):]

    query_rounds = []
    for qi, idx in enumerate(indices):
        initial = [(rows[qi].copy(), [s.copy() for s in sibs[qi]])
                   for rows, sibs in opened]
        steps = []
        for r, a_bits in enumerate(arities):
            rows, sibs = fri_opened[r]
            leaf = rows[qi]                      # (arity*2,) interleaved ext
            coset_values = leaf.reshape(-1, 2).copy()
            siblings = [s.copy() for s in sibs[qi]]
            steps.append(frim.FriQueryStep(coset_values, siblings))
        query_rounds.append(frim.FriQueryRound(initial, steps))

    proof = frim.FriProof(caps, query_rounds, final_poly, pow_witness)
    return openings, proof


# ---------------------------------------------------------------------------
# batched-proof orchestration (prover_batch)
# ---------------------------------------------------------------------------


class BatchedCommit:
    """Device-resident commitment of B same-shape polynomial batches:
    coeffs GF (B, k, n), values GF (B, k, 8n) — COLUMN-MAJOR leaf store,
    leaf row i of proof b = values[b, :, i] — and levels tuple[GF
    (B, m, 4)].  The per-proof analog of PolynomialBatch."""

    __slots__ = ("coeffs", "values", "levels", "caps")

    def __init__(self, coeffs, values, levels, caps=None):
        self.coeffs = coeffs
        self.values = values
        self.levels = tuple(levels)
        self.caps = caps  # (B, 2^cap, 4) u64 host, filled by the stage fetch


def open_and_fri_device_batch(common, cs_oracle, commits: list,
                              chs: list) -> list:
    """Batched analog of `open_and_fri_device`: B proofs' opening sets and
    FRI proofs with every device program batched over the proof axis and
    every transcript-stage d2h a single packed fetch.

    ``cs_oracle``: the circuit-constant constants/sigmas PolynomialBatch
    (device-resident, shared by all proofs); ``commits``: [wires, zs,
    quotient] BatchedCommit; ``chs``: per-proof host Challengers positioned
    immediately after observing the quotient cap.  Returns
    list[(OpeningSet, FriProof)] in batch order — bit-identical to the
    sequential device path (same transcript, same math, same leaf layouts).
    """
    from ..plonk.proof import OpeningSet
    from ..utils.fetch import fetch_packed
    from ..utils.profiling import stage_timer
    from .oracle import ext_powers

    cfg = common.config
    n = common.degree
    num_zs = cfg.num_challenges
    B = len(chs)
    g_ext = np.array([gl.primitive_root_of_unity(common.degree_bits), 0],
                     dtype=np.uint64)

    zetas = [ch.get_extension_challenge() for ch in chs]
    zetas_next = [gle.mul(z, g_ext) for z in zetas]

    sets = (cs_oracle.coeffs_dev,) + tuple(c.coeffs for c in commits)
    widths = (sets[0].lo.shape[0],) + tuple(s.lo.shape[1] for s in sets[1:])

    with stage_timer("fri/openings_eval(batch)"):
        zpow = np.stack([ext_powers(z, n) for z in zetas])            # (B,n,2)
        zpow_next = np.stack([ext_powers(z, n) for z in zetas_next])
        fn = _openings_batch_fn(widths, n, num_zs, B, True)
        e0, e1, zn0, zn1 = fn(sets, *_ext_pair(zpow), *_ext_pair(zpow_next))
        ev0, ev1, znv0, znv1 = fetch_packed([e0, e1, zn0, zn1])

    k0, k1, k2, k3 = widths
    openings_l, alphas = [], []
    for b in range(B):
        evals = np.stack([ev0[b], ev1[b]], axis=-1)        # (K, 2)
        zs_next = np.stack([znv0[b], znv1[b]], axis=-1)    # (num_zs, 2)
        openings = OpeningSet(
            constants_sigmas=evals[:k0],
            wires=evals[k0 : k0 + k1],
            zs_partial_products=evals[k0 + k1 : k0 + k1 + k2],
            quotient=evals[k0 + k1 + k2 :],
            zs_next=zs_next,
        )
        openings_l.append(openings)
        chs[b].observe_extension_elements(openings.batch0_flat())
        chs[b].observe_extension_elements(openings.batch1_flat())
        alphas.append(chs[b].get_extension_challenge())

    fri_config = cfg.fri_config
    lde_size = n << fri_config.rate_bits
    arities = fri_config.reduction_arities(common.degree_bits)
    coset_shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    total = sum(widths)

    with stage_timer("fri/compose_r0(batch)"):
        apow = np.stack([ext_powers(a, total) for a in alphas])
        apow_zs = apow[:, :num_zs]
        shift_pow = np.stack([gle.powmod(a, num_zs) for a in alphas])
        zinv_pow = np.stack([ext_powers(gle.inverse(z), n) for z in zetas])
        zinv_pow_next = np.stack(
            [ext_powers(gle.inverse(z), n) for z in zetas_next])
        compose_args = (
            sets, *_ext_pair(apow), *_ext_pair(zpow), *_ext_pair(zinv_pow),
            *_ext_pair(apow_zs), *_ext_pair(zpow_next),
            *_ext_pair(zinv_pow_next), *_ext_pair(shift_pow),
        )
        if arities:
            round0 = (fri_config.rate_bits, arities[0],
                      fri_config.cap_height, coset_shift, lde_size)
            fn0 = _compose_batch_fn(total, n, num_zs, B, True, round0)
            f0, f1, leaves0, levels0 = fn0(*compose_args)
        else:
            fn0 = _compose_batch_fn(total, n, num_zs, B, True, None)
            f0, f1 = fn0(*compose_args)
            leaves0 = levels0 = None

    caps_per_b: list[list[np.ndarray]] = [[] for _ in range(B)]
    trees: list[tuple] = []
    cur = (f0, f1)
    cur_leaves, cur_levels = leaves0, levels0
    shift = coset_shift
    size = lde_size
    with stage_timer("fri/commit_phase(batch)"):
        for r, a_bits in enumerate(arities):
            arity = 1 << a_bits
            (caps_np,) = fetch_packed([cur_levels[-1]])    # (B, m, 4)
            trees.append((cur_leaves, tuple(cur_levels)))
            betas = []
            for b in range(B):
                caps_per_b[b].append(caps_np[b])
                chs[b].observe_cap(caps_np[b])
                betas.append(chs[b].get_extension_challenge())
            b0, b1 = _ext_pair(np.stack(betas))            # (B,) pair
            shift = pow(shift, arity, gl.P_INT)
            size //= arity
            if r + 1 < len(arities):
                fn_r = _fold_commit_batch_fn(cur[0].lo.shape[-1], a_bits,
                                             arities[r + 1],
                                             fri_config.cap_height, shift,
                                             fri_config.rate_bits, B)
                f0, f1, cur_leaves, cur_levels = fn_r(cur[0], cur[1], b0, b1)
                cur = (f0, f1)
            else:
                fn_f = _final_fold_batch_fn(cur[0].lo.shape[-1], a_bits, B)
                cur = fn_f(cur[0], cur[1], b0, b1)

    fp0, fp1 = fetch_packed([cur[0], cur[1]])
    final_polys = np.stack([fp0, fp1], axis=-1)            # (B, len, 2)
    pow_bases = []
    for b in range(B):
        chs[b].observe_extension_elements(final_polys[b])
        pow_bases.append(chs[b].get_hash())

    with stage_timer("fri/pow_grind(batch)"):
        pow_witnesses = frim.proof_of_work_grind_batch(
            np.stack(pow_bases), fri_config.proof_of_work_bits)

    idx_rows = []
    for b in range(B):
        chs[b].observe_element(pow_witnesses[b])
        idx_rows.append([chs[b].get_challenge() % lde_size
                         for _ in range(fri_config.num_query_rounds)])
    idx_arr = np.array(idx_rows, dtype=np.int64)           # (B, Q)

    with stage_timer("fri/query_gather(batch)"):
        cs_leaves = (cs_oracle.leaves_dev
                     if cs_oracle.leaves_dev is not None
                     else cs_oracle.values_dev)
        gather_specs = [((cs_leaves, tuple(cs_oracle.levels_dev)),
                         idx_arr, True, cs_oracle.leaves_dev is None)]
        for c in commits:
            gather_specs.append(((c.values, c.levels), idx_arr, False, True))
        step_idx = []
        cur_size = lde_size
        for a_bits in arities:
            m = cur_size >> a_bits
            step_idx.append(idx_arr % m)
            cur_size = m
        for t, si in zip(trees, step_idx):
            gather_specs.append((t, si, False, False))
        all_opened = gather_trees_batch(
            [g[0] for g in gather_specs],
            [g[1] for g in gather_specs],
            [g[2] for g in gather_specs],
            [g[3] for g in gather_specs],
        )
        opened = all_opened[: 1 + len(commits)]
        fri_opened = all_opened[1 + len(commits):]

    out = []
    for b in range(B):
        query_rounds = []
        for qi in range(fri_config.num_query_rounds):
            initial = [(rows[b, qi].copy(), [s.copy() for s in sibs[b, qi]])
                       for rows, sibs in opened]
            steps = []
            for r, a_bits in enumerate(arities):
                rows, sibs = fri_opened[r]
                leaf = rows[b, qi]               # (arity*2,) interleaved ext
                coset_values = leaf.reshape(-1, 2).copy()
                siblings = [s.copy() for s in sibs[b, qi]]
                steps.append(frim.FriQueryStep(coset_values, siblings))
            query_rounds.append(frim.FriQueryRound(initial, steps))
        proof = frim.FriProof(caps_per_b[b], query_rounds, final_polys[b],
                              pow_witnesses[b])
        out.append((openings_l[b], proof))
    return out
