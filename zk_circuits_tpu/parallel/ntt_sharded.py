"""Distributed radix-2 NTT: four-step (Bailey) algorithm over a 1-D device mesh.

Within-polynomial sharding for very large polynomials: the coefficient
vector (length n = E·m, contiguous blocks over E devices) is viewed as an
(E, m) matrix A[s1, s0] = x[s1·m + s0] and transformed as

    y[t1, :]  = Σ_{s1} w_E^{s1·t1} · A[s1, :]     (cross-device size-E DFT)
    z         = y ⊙ T,  T[t1, s0] = w_n^{s0·t1}   (local twiddle)
    Z[t1, :]  = NTT_m(z[t1, :])                    (local row NTT)
    X[t1+E·t2] = Z[t1, t2]                         (global transpose)

All steps are expressed as *global-array* ops under ``jit`` with
``with_sharding_constraint`` pinning the row sharding; XLA's SPMD
partitioner inserts the all-gather/all-to-all collectives over ICI
(SURVEY.md §2.3).  An earlier ``shard_map`` formulation compiled ~50×
slower on the CPU backend (manual-SPMD lowering costs ~100 ms per HLO op),
so the collectives are deliberately left to GSPMD.

The batch axis (many polynomials) is instead sharded with zero
communication (`lde_batch_sharded`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import goldilocks as gfd
from ..field.goldilocks import GF
from ..host import gl
from ..ntt import ntt as ntt_mod


@functools.lru_cache(maxsize=None)
def _dft_matrix_e(n_dev: int, inverse: bool) -> np.ndarray:
    """Small dense DFT matrix W[s1, t1] = w_E^{±s1·t1} as host u64."""
    w = gl.primitive_root_of_unity(n_dev.bit_length() - 1)
    if inverse:
        w = pow(w, gl.P_INT - 2, gl.P_INT)
    return np.array(
        [[pow(w, j * k, gl.P_INT) for k in range(n_dev)] for j in range(n_dev)],
        dtype=np.uint64,
    )


@functools.lru_cache(maxsize=None)
def _twiddle_matrix(n: int, n_dev: int, inverse: bool) -> np.ndarray:
    """T[t1, s0] = w_n^{±s0·t1}, shape (E, n/E), host u64."""
    m = n // n_dev
    w = gl.primitive_root_of_unity(n.bit_length() - 1)
    if inverse:
        w = pow(w, gl.P_INT - 2, gl.P_INT)
    t = np.empty((n_dev, m), dtype=np.uint64)
    for t1 in range(n_dev):
        t[t1] = gl.powers(np.uint64(pow(w, t1, gl.P_INT)), m)
    return t


def _constrain(a: GF, mesh: Mesh, spec: P) -> GF:
    s = NamedSharding(mesh, spec)
    return GF(
        jax.lax.with_sharding_constraint(a.lo, s),
        jax.lax.with_sharding_constraint(a.hi, s),
    )


def _axis_size(mesh: Mesh, axis) -> int:
    """Total device count along one axis name or a tuple of axis names
    (hybrid DCN x ICI meshes shard the coefficient axis over both)."""
    if isinstance(axis, tuple):
        size = 1
        for a in axis:
            size *= mesh.shape[a]
        return size
    return mesh.shape[axis]


def _ntt_four_step(x: GF, mesh: Mesh, axis: str, inverse: bool) -> GF:
    """Transpose-form four-step: every cross-device move is a plain
    all-to-all row<->column transpose of a P(axis, None)-sharded matrix, and
    the size-E DFT runs on a fully LOCAL axis.  (An earlier variant computed
    the E-point DFT by slicing ROWS of the row-sharded matrix, which forced
    GSPMD into involuntary full rematerialization — gather + replicate — per
    MULTICHIP_r01.json.)"""
    n = x.shape[-1]
    n_dev = _axis_size(mesh, axis)
    m = n // n_dev
    w_mat = _dft_matrix_e(n_dev, inverse)
    tw = _twiddle_matrix(n, n_dev, inverse)

    a = _constrain(x.reshape(n_dev, m), mesh, P(axis, None))
    # Transpose to (m, E): the E axis becomes device-local (all-to-all).
    at = _constrain(GF(a.lo.T, a.hi.T), mesh, P(axis, None))
    # Local size-E DFT along the last axis: y_t[s0, t1] = Σ_s1 at[s0,s1]·W[s1,t1].
    cols = []
    for t1 in range(n_dev):
        acc = gfd.mul_const(at[:, 0], int(w_mat[0, t1]))
        for s1 in range(1, n_dev):
            acc = gfd.add(acc, gfd.mul_const(at[:, s1], int(w_mat[s1, t1])))
        cols.append(acc)
    y_t = _constrain(gfd.stack(cols, axis=1), mesh, P(axis, None))  # (m, E)
    # Transpose back to (E, m) rows (all-to-all), twiddle, local row NTT.
    y = _constrain(GF(y_t.lo.T, y_t.hi.T), mesh, P(axis, None))
    twd = gfd.from_u64(tw)
    z = gfd.mul(y, GF(jnp.broadcast_to(twd.lo, y.shape),
                      jnp.broadcast_to(twd.hi, y.shape)))

    def _pin_rows(a: GF) -> GF:
        # Keep the leading (row) axis sharded through every butterfly stage.
        return _constrain(a, mesh, P(axis, *([None] * (len(a.shape) - 1))))

    big = ntt_mod.ntt(z, constrain=_pin_rows)  # (E, m) row-wise
    if inverse:
        # Step 3 needs the INVERSE-root length-m row transform; the forward
        # NTT gives it after a local index reversal:
        # NTT_{w^-1}(x)[k] = NTT_w(x)[-k mod m].
        ridx = jnp.concatenate([jnp.arange(1), jnp.arange(m - 1, 0, -1)])
        big = GF(jnp.take(big.lo, ridx, axis=-1), jnp.take(big.hi, ridx, axis=-1))
        big = _pin_rows(big)
    # Global transpose: X[t1 + E·t2] = Z[t1, t2] (all-to-all under GSPMD).
    out = GF(big.lo.T, big.hi.T).reshape(n)
    return _constrain(out, mesh, P(axis))


@functools.lru_cache(maxsize=None)
def _jitted_four_step(mesh: Mesh, axis: str, inverse: bool):
    return jax.jit(
        functools.partial(_ntt_four_step, mesh=mesh, axis=axis, inverse=inverse)
    )


def ntt_sharded(x: GF, mesh: Mesh, axis: str = "x") -> GF:
    """Distributed NTT of a 1-D GF array sharded over `axis` (last dim)."""
    n = x.shape[-1]
    n_dev = _axis_size(mesh, axis)
    assert n % n_dev == 0 and n >= n_dev, "need n divisible by mesh size"
    return _jitted_four_step(mesh, axis, False)(x)


def intt_sharded(x: GF, mesh: Mesh, axis: str = "x") -> GF:
    """Distributed inverse NTT (natural order in and out)."""
    n = x.shape[-1]
    # INTT(x)[k] = (1/n) * NTT(x)[-k mod n] with inverse twiddles built in.
    y = _jitted_four_step(mesh, axis, True)(x)
    return _constrain(
        gfd.mul_const(y, int(gl.inverse(np.uint64(n)))), mesh, P(axis)
    )


def _coset_lde_body(coeffs: GF, rate_bits: int, mesh: Mesh, axis: str,
                    shift: int) -> GF:
    n = coeffs.shape[-1]
    scaled = ntt_mod._mul_powers(coeffs, shift)
    pad = n * ((1 << rate_bits) - 1)
    padded = GF(jnp.pad(scaled.lo, (0, pad)), jnp.pad(scaled.hi, (0, pad)))
    padded = _constrain(padded, mesh, P(axis))
    return _ntt_four_step(padded, mesh, axis, inverse=False)


@functools.lru_cache(maxsize=None)
def _jitted_coset_lde(rate_bits: int, mesh: Mesh, axis: str, shift: int):
    return jax.jit(functools.partial(
        _coset_lde_body, rate_bits=rate_bits, mesh=mesh, axis=axis, shift=shift
    ))


def coset_lde_sharded(
    coeffs: GF,
    rate_bits: int,
    mesh: Mesh,
    axis: str = "x",
    shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR,
) -> GF:
    """Distributed low-degree extension of a single long polynomial:
    scale by shift^k, zero-pad 2^rate_bits, distributed NTT."""
    return _jitted_coset_lde(rate_bits, mesh, axis, shift)(coeffs)


def _lde_batch_body(coeffs: GF, rate_bits: int, mesh: Mesh, axis: str,
                    shift: int) -> GF:
    c = _constrain(coeffs, mesh, P(axis, None))

    def _pin(a: GF) -> GF:
        return _constrain(a, mesh, P(axis, *([None] * (len(a.shape) - 1))))

    out = ntt_mod.lde(c, rate_bits, shift, constrain=_pin)
    return _constrain(out, mesh, P(axis, None))


@functools.lru_cache(maxsize=None)
def _jitted_lde_batch(rate_bits: int, mesh: Mesh, axis: str, shift: int):
    return jax.jit(functools.partial(
        _lde_batch_body, rate_bits=rate_bits, mesh=mesh, axis=axis, shift=shift
    ))


def lde_batch_sharded(
    coeffs: GF,
    rate_bits: int,
    mesh: Mesh,
    axis: str = "x",
    shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR,
) -> GF:
    """Batch-parallel LDE: (num_polys, n) with num_polys sharded over chips.
    Zero communication; every op acts along the (local) last axis."""
    return _jitted_lde_batch(rate_bits, mesh, axis, shift)(coeffs)
