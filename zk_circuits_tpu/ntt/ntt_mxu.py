"""MXU-resident Goldilocks NTT: DFT-128 steps as exact bf16 matmuls.

The stage-unrolled radix-2 NTT (ntt.py) is VPU/HBM-bound: 22 butterfly
stages each re-materialize the whole array, and every Goldilocks mul costs
~40 int32 VPU ops — BENCH_KERNELS.md r3 measured 3% of speed-of-light.
This module instead maps the NTT onto the MXU (where a TPU's FLOPs live)
via the classic four-step decomposition:

    N = N1 * N2,  c[j1 + N1*j2]  (j1 in [N1], j2 in [N2])
    X[k2 + N2*k1] = sum_{j1} w_N^{j1*k2} * w_{N1}^{j1*k1}
                     * sum_{j2} c[j1 + N1*j2] w_{N2}^{j2*k2}

  1. inner: batched recursive NTT_{N2} over j2 (one per j1)
  2. twiddle: elementwise mul by w_N^{j1*k2}
  3. outer: DFT_{N1} as a MATRIX PRODUCT contracting j1 (N1 <= 128)

Step 3 is exact integer linear algebra on the MXU: operands are split
into 8-bit limbs (a = sum_a a_i 2^{8i}), each limb plane cast to bf16
(integers < 256 are exact in bf16), and the 8x8 limb-pair products are
accumulated by the MXU in f32 (products < 2^16, row sums < 128*2^16 <
2^24 — exact).  Partial sums are then recombined mod p.  The result is
BIT-EXACT with the host radix-2 NTT (tests/test_ntt.py).

Reference role: qp-plonky2's FFT (external crate; SURVEY.md §2.1 prover
row).  Technique: standard TPU integer-matmul limb decomposition (cf.
PAPERS.md — "TPU as cryptographic accelerator" line of work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gfd
from ..field.goldilocks import GF
from ..host import gl

P = gl.P_INT

# Weight-class partial sums W_w (w = limb_i + limb_j in 0..15) fit in
# int32: W_w <= 8 * 128 * 255 * 255 < 2^27.
_N_LIMBS = 8
_N_WEIGHTS = 2 * _N_LIMBS - 1


# ---------------------------------------------------------------------------
# host-side tables (cached as numpy; converted to jnp at use sites)
# ---------------------------------------------------------------------------


def _geometric_row(base: int, n: int) -> np.ndarray:
    """[base^0 .. base^(n-1)] as uint64 (vector doubling: O(log n) gl.mul)."""
    row = np.ones(1, dtype=np.uint64)
    b = base % P
    length = 1
    while length < n:
        step = min(length, n - length)
        row = np.concatenate(
            [row, gl.mul(row[:step], np.uint64(pow(b, length, P)))])
        length += step
    return row


def _vandermonde(base_row: np.ndarray, rows: int) -> np.ndarray:
    """(rows, len) table t[j] = base_row ** j (elementwise), via the row
    recurrence t[j] = t[j-1] * base_row."""
    out = np.empty((rows, base_row.shape[0]), dtype=np.uint64)
    out[0] = 1
    for j in range(1, rows):
        out[j] = gl.mul(out[j - 1], base_row)
    return out


@functools.lru_cache(maxsize=None)
def _dft_matrix_limbs(n: int):
    """(8, n, n) bf16 limb planes of the DFT matrix M[j, k] = w_n^{jk}
    (laid out for right-multiplication: out[.., k] = sum_j x[.., j] M[j, k])."""
    w = gl.primitive_root_of_unity(n.bit_length() - 1)
    m = _vandermonde(_geometric_row(w, n), n)
    planes = np.empty((_N_LIMBS, n, n), dtype=np.float32)
    for i in range(_N_LIMBS):
        planes[i] = ((m >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.float32)
    return planes.astype(jnp.bfloat16)


@functools.lru_cache(maxsize=None)
def _twiddle_table(n1: int, n2: int) -> tuple[np.ndarray, np.ndarray]:
    """w_{n1*n2}^{j1*k2} as (n1, n2) u32 limb pair."""
    n = n1 * n2
    w = gl.primitive_root_of_unity(n.bit_length() - 1)
    t = _vandermonde(_geometric_row(w, n2), n1)
    return ((t & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (t >> np.uint64(32)).astype(np.uint32))


@functools.lru_cache(maxsize=None)
def _weight_consts() -> tuple[np.ndarray, np.ndarray]:
    """2^(8w) mod p for w in 0..14 as u32 limb pairs."""
    vals = np.array([pow(2, 8 * w, P) for w in range(_N_WEIGHTS)], dtype=np.uint64)
    return ((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (vals >> np.uint64(32)).astype(np.uint32))


# ---------------------------------------------------------------------------
# exact limb matmul
# ---------------------------------------------------------------------------


def _to_limb_planes(x: GF) -> jax.Array:
    """GF (..., C) -> bf16 limb planes (8, ..., C)."""
    planes = []
    for word in (x.lo, x.hi):
        for i in range(4):
            planes.append(((word >> np.uint32(8 * i)) & np.uint32(0xFF))
                          .astype(jnp.bfloat16))
    return jnp.stack(planes, axis=0)


def _gf_dot_matrix(x: GF, n: int) -> GF:
    """Exact out[..., k] = sum_j x[..., j] * M[j, k]  (mod p), contraction
    size n <= 128, via 8x8 bf16 limb matmuls + f32->i32 weight sums."""
    mat = jnp.asarray(_dft_matrix_limbs(n))          # (8, n, n) bf16
    xl = _to_limb_planes(x)                          # (8, ..., n)
    # P[a, b, ..., k] — 64 MXU matmuls, f32 accumulation (exact: < 2^24)
    prods = jnp.einsum("a...j,bjk->ab...k", xl, mat,
                       preferred_element_type=jnp.float32)
    prods = prods.astype(jnp.uint32)                 # exact (< 2^24)
    # weight classes w = a + b  (W_w < 8*128*255^2 < 2^27, exact in u32)
    shape = prods.shape[2:]
    w_planes = [jnp.zeros(shape, jnp.uint32) for _ in range(_N_WEIGHTS)]
    for a in range(_N_LIMBS):
        for b in range(_N_LIMBS):
            w_planes[a + b] = w_planes[a + b] + prods[a, b]
    # recombine: sum_w W_w * (2^(8w) mod p).  NB: a "cheaper" limb-lane
    # accumulation (two 128-bit lane sums + three _reduce128) was measured
    # SLOWER on v5e (2^22 NTT 27 -> 39 ms): its carry-ripple chains
    # serialize on the VPU, while these 15 independent mul_const+add
    # reductions pipeline freely.
    clo, chi = _weight_consts()
    acc = None
    for w_idx in range(_N_WEIGHTS):
        term = gfd.mul(
            GF(w_planes[w_idx], jnp.zeros_like(w_planes[w_idx])),
            GF(jnp.full(shape, int(clo[w_idx]), jnp.uint32),
               jnp.full(shape, int(chi[w_idx]), jnp.uint32)),
        )
        acc = term if acc is None else gfd.add(acc, term)
    return acc


# ---------------------------------------------------------------------------
# four-step NTT
# ---------------------------------------------------------------------------


def _split(n: int) -> tuple[int, int]:
    """n = n1 * n2 with the outer (matmul) factor n1 <= 128."""
    if n >= 128 * 128:
        return 128, n // 128
    n1 = n // 128
    return n1, 128


def ntt_mxu(coeffs: GF) -> GF:
    """NTT along the last axis; bit-exact with ntt.host_ntt/ntt.ntt."""
    n = coeffs.shape[-1]
    if n == 1:
        return coeffs
    assert n & (n - 1) == 0
    if n <= 128:
        return _gf_dot_matrix(coeffs, n)
    n1, n2 = _split(n)
    batch = coeffs.shape[:-1]
    # c[j1 + n1*j2]: reshape to (j2, j1), transpose to (j1, j2)
    x = coeffs.reshape(*batch, n2, n1)
    x = GF(jnp.swapaxes(x.lo, -1, -2), jnp.swapaxes(x.hi, -1, -2))
    # inner NTT over j2 (batched over j1)
    y = ntt_mxu(x)                                    # (..., j1, k2)
    # twiddle w_n^{j1*k2}
    tlo, thi = _twiddle_table(n1, n2)
    tw = GF(jnp.asarray(tlo), jnp.asarray(thi))
    y = gfd.mul(y, GF(jnp.broadcast_to(tw.lo, y.lo.shape),
                      jnp.broadcast_to(tw.hi, y.hi.shape)))
    # outer DFT over j1: out[k1, k2] = sum_j1 M[j1, k1] y[j1, k2]
    y_t = GF(jnp.swapaxes(y.lo, -1, -2), jnp.swapaxes(y.hi, -1, -2))
    out_t = _gf_dot_matrix(y_t, n1)                   # (..., k2, k1)
    out = GF(jnp.swapaxes(out_t.lo, -1, -2), jnp.swapaxes(out_t.hi, -1, -2))
    return out.reshape(*batch, n)                     # k = k2 + n2*k1


def intt_mxu(values: GF) -> GF:
    n = values.shape[-1]
    if n == 1:
        return values
    y = ntt_mxu(values)
    idx = jnp.concatenate([jnp.arange(1), jnp.arange(n - 1, 0, -1)])
    y = GF(jnp.take(y.lo, idx, axis=-1), jnp.take(y.hi, idx, axis=-1))
    n_inv = int(gl.inverse(np.uint64(n)))
    return gfd.mul_const(y, n_inv)
