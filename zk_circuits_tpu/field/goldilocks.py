"""Goldilocks field arithmetic as vectorized 2x32-bit limb kernels (JAX).

TPUs have no native 64-bit integer multiply, so a field element is stored as
two uint32 arrays ``(lo, hi)`` — a struct-of-arrays pytree that XLA lays out
as clean vector registers.  All operations keep values canonical (< p).

The 32x32->64 products are built from 16-bit sublimbs on the VPU; the
Goldilocks reduction uses 2^64 ≡ 2^32 - 1 (mod p).

Golden model: zk_circuits_tpu.host.gl (numpy, uint64).
Reference semantics: qp-plonky2-field (external crate, /root/reference/Cargo.lock).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

P_INT = 2**64 - 2**32 + 1
# numpy (not jnp) scalars: they inline as literals in traced code, which
# keeps Pallas kernel bodies free of captured device constants.
P_LO = np.uint32(1)           # low 32 bits of p
P_HI = np.uint32(0xFFFFFFFF)  # high 32 bits of p
EPS = np.uint32(0xFFFFFFFF)   # 2^64 mod p = 2^32 - 1
MASK16 = np.uint32(0xFFFF)


class GF(NamedTuple):
    """A Goldilocks field element array: value = lo + hi * 2^32, canonical."""

    lo: jax.Array  # uint32
    hi: jax.Array  # uint32

    @property
    def shape(self):
        return self.lo.shape

    def __getitem__(self, idx) -> "GF":
        return GF(self.lo[idx], self.hi[idx])

    def reshape(self, *shape) -> "GF":
        return GF(self.lo.reshape(*shape), self.hi.reshape(*shape))


def zeros(shape) -> GF:
    return GF(jnp.zeros(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32))


def ones(shape) -> GF:
    return GF(jnp.ones(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32))


def full(shape, value: int) -> GF:
    value %= P_INT
    return GF(
        jnp.full(shape, value & 0xFFFFFFFF, jnp.uint32),
        jnp.full(shape, value >> 32, jnp.uint32),
    )


def from_u64(x) -> GF:
    """Host numpy uint64 array -> device GF (canonicalizing)."""
    a = np.asarray(x, dtype=np.uint64)
    a = np.where(a >= np.uint64(P_INT), a - np.uint64(P_INT), a)
    return GF(
        jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((a >> np.uint64(32)).astype(np.uint32)),
    )


def to_u64(a: GF) -> np.ndarray:
    lo = np.asarray(jax.device_get(a.lo), dtype=np.uint64)
    hi = np.asarray(jax.device_get(a.hi), dtype=np.uint64)
    return lo | (hi << np.uint64(32))


# ---------------------------------------------------------------------------
# 64-bit helpers on (lo, hi) uint32 pairs
# ---------------------------------------------------------------------------

def _add64(a_lo, a_hi, b_lo, b_hi):
    """(a + b) mod 2^64 with carry-out."""
    lo = a_lo + b_lo
    c = (lo < a_lo).astype(jnp.uint32)
    hi = a_hi + b_hi
    c2 = (hi < a_hi).astype(jnp.uint32)
    hi2 = hi + c
    c3 = (hi2 < hi).astype(jnp.uint32)
    return lo, hi2, c2 + c3


def _sub64(a_lo, a_hi, b_lo, b_hi):
    """(a - b) mod 2^64 with borrow-out."""
    lo = a_lo - b_lo
    bb = (a_lo < b_lo).astype(jnp.uint32)
    hi = a_hi - b_hi
    b2 = (a_hi < b_hi).astype(jnp.uint32)
    hi2 = hi - bb
    b3 = (hi < bb).astype(jnp.uint32)
    return lo, hi2, b2 + b3


def _geq_p(lo, hi):
    # value >= p  <=>  hi == 0xffffffff and lo >= 1
    return (hi == P_HI) & (lo >= P_LO)


def _canon(lo, hi):
    big = _geq_p(lo, hi)
    lo2, hi2, _ = _sub64(lo, hi, P_LO, P_HI)
    return jnp.where(big, lo2, lo), jnp.where(big, hi2, hi)


def add(a: GF, b: GF) -> GF:
    lo, hi, carry = _add64(a.lo, a.hi, b.lo, b.hi)
    # carry => true sum >= 2^64: add epsilon (== subtract p mod 2^64).
    lo2 = lo + EPS
    c2 = (lo2 < lo).astype(jnp.uint32)
    hi2 = hi + c2
    lo = jnp.where(carry > 0, lo2, lo)
    hi = jnp.where(carry > 0, hi2, hi)
    return GF(*_canon(lo, hi))


def sub(a: GF, b: GF) -> GF:
    lo, hi, borrow = _sub64(a.lo, a.hi, b.lo, b.hi)
    # borrow => add p back.
    lo2, hi2, _ = _add64(lo, hi, P_LO, P_HI)
    return GF(jnp.where(borrow > 0, lo2, lo), jnp.where(borrow > 0, hi2, hi))


def neg(a: GF) -> GF:
    is_zero = (a.lo == 0) & (a.hi == 0)
    lo, hi, _ = _sub64(P_LO, P_HI, a.lo, a.hi)
    return GF(jnp.where(is_zero, a.lo, lo), jnp.where(is_zero, a.hi, hi))


def _mul32(x, y):
    """Exact 32x32 -> 64 product from 16-bit sublimbs; returns (lo32, hi32)."""
    x0 = x & MASK16
    x1 = x >> 16
    y0 = y & MASK16
    y1 = y >> 16
    ll = x0 * y0
    lh = x0 * y1
    hl = x1 * y0
    hh = x1 * y1
    t = (ll >> 16) + (lh & MASK16) + (hl & MASK16)
    lo = (ll & MASK16) | (t << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (t >> 16)
    return lo, hi


def _mul64(a_lo, a_hi, b_lo, b_hi):
    """Exact 64x64 -> 128 product; returns four uint32 limbs r0..r3."""
    l0, l1 = _mul32(a_lo, b_lo)
    m0, m1 = _mul32(a_lo, b_hi)
    n0, n1 = _mul32(a_hi, b_lo)
    h0, h1 = _mul32(a_hi, b_hi)
    # column 1: l1 + m0 + n0
    s = l1 + m0
    c1 = (s < l1).astype(jnp.uint32)
    r1 = s + n0
    c1 = c1 + (r1 < s).astype(jnp.uint32)
    # column 2: m1 + n1 + h0 + c1
    s = m1 + n1
    c2 = (s < m1).astype(jnp.uint32)
    s2 = s + h0
    c2 = c2 + (s2 < s).astype(jnp.uint32)
    r2 = s2 + c1
    c2 = c2 + (r2 < s2).astype(jnp.uint32)
    r3 = h1 + c2
    return l0, r1, r2, r3


def _reduce128_nc(r0, r1, r2, r3):
    """Reduce r0..r3 (128-bit LE u32 limbs) mod p; NON-CANONICAL output:
    a (lo, hi) u32 pair whose u64 value is ≡ x (mod p) but may lie in
    [p, 2^64).  Safe to feed back into _mul64/_sqr64 (exact for any u64
    inputs) — the Poseidon sponge kernel chains rounds through this and
    canonicalizes only its output lanes (hash/poseidon_pallas.py).

    With x = n_lo + 2^64 * (n_hi_lo + 2^32 * n_hi_hi):
      x ≡ n_lo - n_hi_hi + n_hi_lo * (2^32 - 1)  (mod p)
    """
    n_hi_lo = r2
    n_hi_hi = r3
    # t0 = n_lo - n_hi_hi (borrow => subtract epsilon, cannot underflow then)
    t0_lo, t0_hi, borrow = _sub64(r0, r1, n_hi_hi, jnp.zeros_like(r3))
    t0b_lo, t0b_hi, _ = _sub64(t0_lo, t0_hi, EPS, jnp.zeros_like(r3))
    t0_lo = jnp.where(borrow > 0, t0b_lo, t0_lo)
    t0_hi = jnp.where(borrow > 0, t0b_hi, t0_hi)
    # t1 = n_hi_lo * epsilon = (n_hi_lo << 32) - n_hi_lo  (as 64-bit)
    t1_lo, t1_hi, _ = _sub64(jnp.zeros_like(r2), n_hi_lo, n_hi_lo, jnp.zeros_like(r2))
    # t2 = t0 + t1, overflow => add epsilon
    t2_lo, t2_hi, over = _add64(t0_lo, t0_hi, t1_lo, t1_hi)
    t2b_lo = t2_lo + EPS
    cb = (t2b_lo < t2_lo).astype(jnp.uint32)
    t2b_hi = t2_hi + cb
    t2_lo = jnp.where(over > 0, t2b_lo, t2_lo)
    t2_hi = jnp.where(over > 0, t2b_hi, t2_hi)
    return t2_lo, t2_hi


def _reduce128(r0, r1, r2, r3) -> GF:
    """Canonical reduction (see _reduce128_nc for the algorithm)."""
    return GF(*_canon(*_reduce128_nc(r0, r1, r2, r3)))


def mul(a: GF, b: GF) -> GF:
    return _reduce128(*_mul64(a.lo, a.hi, b.lo, b.hi))


def _sqr32(x):
    """Exact 32-bit squaring: the cross 16-bit products coincide, so 3
    sublimb multiplies instead of _mul32's 4."""
    x0 = x & MASK16
    x1 = x >> 16
    ll = x0 * x0
    lh = x0 * x1
    hh = x1 * x1
    t = (ll >> 16) + ((lh & MASK16) << 1)     # < 2^16 + 2^17, fits u32
    lo = (ll & MASK16) | (t << 16)
    hi = hh + ((lh >> 16) << 1) + (t >> 16)
    return lo, hi


def _sqr64(a_lo, a_hi):
    """Exact 64-bit squaring: the two cross 32-bit products coincide —
    10 sublimb multiplies vs _mul64's 16.  The Poseidon S-box (x^7 via
    two squares + two muls) is the prover's arithmetic hot spot, so this
    feeds straight into commit throughput (BENCH_KERNELS.md r5: the wire
    commit is Poseidon-bound)."""
    l0, l1 = _sqr32(a_lo)
    m0, m1 = _mul32(a_lo, a_hi)
    h0, h1 = _sqr32(a_hi)
    # double the cross product as a 64-bit quantity (top bit -> column 3)
    d0 = m0 << 1
    d1 = (m1 << 1) | (m0 >> 31)
    dc = m1 >> 31
    # column 1: l1 + d0
    r1 = l1 + d0
    c1 = (r1 < l1).astype(jnp.uint32)
    # column 2: d1 + h0 + c1
    s = d1 + h0
    c2 = (s < d1).astype(jnp.uint32)
    r2 = s + c1
    c2 = c2 + (r2 < s).astype(jnp.uint32)
    r3 = h1 + dc + c2
    return l0, r1, r2, r3


def square(a: GF) -> GF:
    return _reduce128(*_sqr64(a.lo, a.hi))


def mul_const(a: GF, c: int) -> GF:
    """Multiply by a static constant (0 <= c < p)."""
    c %= P_INT
    if c == 0:
        return zeros(a.shape)
    if c == 1:
        return a
    b = full(a.shape, c)
    return mul(a, b)


def powmod(a: GF, e: int) -> GF:
    """a^e for a static exponent.  Small exponents unroll; large ones use a
    lax.scan over the exponent bits so the compiled graph stays O(1) muls
    (a fully unrolled 64-bit square-and-multiply chain takes XLA minutes to
    compile)."""
    if e < 16:
        result = ones(a.shape)
        base = a
        while e > 0:
            if e & 1:
                result = mul(result, base)
            base = mul(base, base)
            e >>= 1
        return result

    nbits = e.bit_length()
    bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=jnp.bool_)

    def step(carry, bit):
        acc, sq = carry
        acc = select(bit, mul(acc, sq), acc)
        sq = square(sq)
        return (acc, sq), None

    (acc, _), _ = jax.lax.scan(step, (ones(a.shape), a), bits)
    return acc


def inverse(a: GF) -> GF:
    """Fermat inverse a^(p-2); inverse(0) == 0."""
    return powmod(a, P_INT - 2)


def select(mask, a: GF, b: GF) -> GF:
    """Elementwise where(mask, a, b)."""
    return GF(jnp.where(mask, a.lo, b.lo), jnp.where(mask, a.hi, b.hi))


def equal(a: GF, b: GF) -> jax.Array:
    return (a.lo == b.lo) & (a.hi == b.hi)


def concatenate(parts: list, axis: int = 0) -> GF:
    return GF(
        jnp.concatenate([p.lo for p in parts], axis=axis),
        jnp.concatenate([p.hi for p in parts], axis=axis),
    )


def stack(parts: list, axis: int = 0) -> GF:
    return GF(
        jnp.stack([p.lo for p in parts], axis=axis),
        jnp.stack([p.hi for p in parts], axis=axis),
    )


def sum_mod(a: GF, axis: int = -1) -> GF:
    """Modular sum along an axis via pairwise folding (log2(n) add passes;
    device analog of host.gl.sum_mod)."""
    lo = jnp.moveaxis(a.lo, axis, -1)
    hi = jnp.moveaxis(a.hi, axis, -1)
    x = GF(lo, hi)
    while x.lo.shape[-1] > 1:
        n = x.lo.shape[-1]
        if n % 2 == 1:
            extra = GF(x.lo[..., -1], x.hi[..., -1])
            x = GF(x.lo[..., :-1], x.hi[..., :-1])
        else:
            extra = None
        x = add(GF(x.lo[..., 0::2], x.hi[..., 0::2]),
                GF(x.lo[..., 1::2], x.hi[..., 1::2]))
        if extra is not None:
            x = GF(jnp.concatenate([x.lo, extra.lo[..., None]], axis=-1),
                   jnp.concatenate([x.hi, extra.hi[..., None]], axis=-1))
    return GF(x.lo[..., 0], x.hi[..., 0])
