"""Distributed radix-2 NTT: four-step algorithm over a 1-D device mesh.

Within-polynomial sharding for very large polynomials: the coefficient
vector (length n, contiguous blocks over E devices) is viewed as an
(E, n/E) matrix and the transform runs as

    transpose -> local size-E DFT along rows -> twiddle -> transpose ->
    local size-(n/E) NTT along rows -> transpose

with every global transpose an ``all_to_all`` over ICI inside
``shard_map``.  This is the "butterfly stages exchanged all-to-all" design
from SURVEY.md §7.1(3); the batch axis (many polynomials) is instead
sharded with zero communication (`lde_batch_sharded`).

Requires n >= E^2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import goldilocks as gfd
from ..field.goldilocks import GF
from ..host import gl
from ..ntt import ntt as ntt_mod


def _all_to_all_transpose(x: jax.Array, axis_name: str, n_dev: int) -> jax.Array:
    """Local block (rows_local, C) of a rows-sharded (R, C) matrix ->
    local block (C // n_dev, R) of the rows-sharded transpose."""
    rows_local, c = x.shape
    # Split columns into destination chunks, exchange, then stitch.
    x = x.reshape(rows_local, n_dev, c // n_dev)
    x = jnp.moveaxis(x, 1, 0)  # (n_dev, rows_local, c_chunk)
    x = lax.all_to_all(x, axis_name, split_axis=0, concat_axis=0, tiled=False)
    # x[s, r, j] = A[s*rows_local + r, my_block + j]
    x = x.reshape(n_dev * rows_local, c // n_dev)  # (R, c_chunk), rows = global rows
    return x.T  # (c_chunk, R): rows are this device's block of A^T


def _gf_transpose(x: GF, axis_name: str, n_dev: int) -> GF:
    return GF(
        _all_to_all_transpose(x.lo, axis_name, n_dev),
        _all_to_all_transpose(x.hi, axis_name, n_dev),
    )


@functools.lru_cache(maxsize=None)
def _dft_matrix_e(n_dev: int):
    """Small dense DFT matrix W[j, k] = w_E^{jk} as host u64."""
    w = gl.primitive_root_of_unity(n_dev.bit_length() - 1)
    mat = np.empty((n_dev, n_dev), dtype=np.uint64)
    for j in range(n_dev):
        for k in range(n_dev):
            mat[j, k] = pow(w, j * k, gl.P_INT)
    return mat


def _local_dft_rows(x: GF, mat_u64: np.ndarray) -> GF:
    """Size-E DFT along the last axis (row length E), unrolled matmul."""
    e = mat_u64.shape[0]
    cols = []
    for k in range(e):
        acc = gfd.mul_const(x[..., 0], int(mat_u64[0, k]))
        for j in range(1, e):
            acc = gfd.add(acc, gfd.mul_const(x[..., j], int(mat_u64[j, k])))
        cols.append(acc)
    return gfd.stack(cols, axis=-1)


def _twiddle_rows(x: GF, n: int, n_dev: int, axis_name: str, inverse: bool) -> GF:
    """Multiply B[j2, k1] by w_n^{±j2*k1}; x local shape (n/E^2, E), j2 global."""
    rows_local, e = x.shape
    d = lax.axis_index(axis_name)
    w = gl.primitive_root_of_unity(n.bit_length() - 1)
    if inverse:
        w = pow(w, gl.P_INT - 2, gl.P_INT)
    # w^(j2*k1) = (w^k1)^j2 ; compute per-k1 powers with exponent j2.
    # j2 = d*rows_local + r. Use log-space: pow tables built on host for w^k1,
    # then raise to j2 via on-device square-and-multiply over bits of j2.
    wk = np.array([pow(w, k1, gl.P_INT) for k1 in range(e)], dtype=np.uint64)
    j2 = d * rows_local + jnp.arange(rows_local)  # (rows_local,)
    out_cols = []
    max_bits = max((n - 1).bit_length(), 1)
    for k1 in range(e):
        # base^j2 via square-and-multiply with traced exponent bits.
        base = int(wk[k1])
        acc = gfd.ones((rows_local,))
        sq = gfd.full((rows_local,), base)
        for bit in range(max_bits):
            take = ((j2 >> bit) & 1).astype(bool)
            acc = gfd.select(take, gfd.mul(acc, sq), acc)
            sq = gfd.mul(sq, sq)
        out_cols.append(gfd.mul(x[..., k1], acc))
    return gfd.stack(out_cols, axis=-1)


def _ntt_sharded_local(x: GF, n: int, n_dev: int, axis_name: str) -> GF:
    """Per-device body: local block (n/E,) of coefficient vector -> local
    block (n/E,) of the natural-order NTT values."""
    n_local = n // n_dev
    mat = _dft_matrix_e(n_dev)
    a = x.reshape(1, n_local)  # row d of the (E, n/E) matrix
    at = _gf_transpose(a, axis_name, n_dev)            # (n/E^2, E)
    b = _local_dft_rows(at, mat)                       # size-E DFT along rows
    c = _twiddle_rows(b, n, n_dev, axis_name, inverse=False)
    ct = _gf_transpose(c, axis_name, n_dev)            # (1, n/E) rows k1
    d = ntt_mod.ntt(ct)                                # local size-(n/E) NTT
    out = _gf_transpose(d, axis_name, n_dev)           # (n/E^2, E) of (n2, E)
    return out.reshape(n_local)


def ntt_sharded(x: GF, mesh: Mesh, axis: str = "x") -> GF:
    """Distributed NTT of a 1-D GF array sharded over `axis` (last dim)."""
    n = x.shape[-1]
    n_dev = mesh.shape[axis]
    assert n % (n_dev * n_dev) == 0, "need n >= E^2"
    spec = P(axis)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
        check_vma=False,
    )
    def run(lo, hi):
        out = _ntt_sharded_local(GF(lo, hi), n, n_dev, axis)
        return out.lo, out.hi

    lo, hi = run(x.lo, x.hi)
    return GF(lo, hi)


def coset_lde_sharded(
    coeffs: GF,
    rate_bits: int,
    mesh: Mesh,
    axis: str = "x",
    shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR,
) -> GF:
    """Distributed low-degree extension of a single long polynomial:
    scale by shift^k, zero-pad 2^rate_bits, distributed NTT."""
    n = coeffs.shape[-1]
    scaled = ntt_mod._mul_powers(coeffs, shift)
    pad = n * ((1 << rate_bits) - 1)
    padded = GF(jnp.pad(scaled.lo, (0, pad)), jnp.pad(scaled.hi, (0, pad)))
    padded = jax.device_put(padded, NamedSharding(mesh, P(axis)))
    return ntt_sharded(padded, mesh, axis)


def lde_batch_sharded(
    coeffs: GF,
    rate_bits: int,
    mesh: Mesh,
    axis: str = "x",
    shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR,
) -> GF:
    """Batch-parallel LDE: (num_polys, n) with num_polys sharded over chips.
    Zero communication; each chip runs dense single-chip LDEs."""
    spec = P(axis, None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec),
        out_specs=spec, check_vma=False,
    )
    def run(lo, hi):
        out = ntt_mod.lde(GF(lo, hi), rate_bits, shift)
        return out.lo, out.hi

    lo, hi = run(coeffs.lo, coeffs.hi)
    return GF(lo, hi)
