"""Device (JAX/XLA) Poseidon permutation over Goldilocks, batched.

The permutation operates on a ``GF`` struct-of-arrays with trailing
dimension 12.  The MDS layer decomposes the state into 16-bit sublimbs and
uses exact int32 matmuls (sums < 2^25), which XLA fuses and vectorizes; the
x^7 S-box is 4 limb multiplications on the VPU.

Golden model: zk_circuits_tpu.host.poseidon (tested bit-exact against the
reference's secret→address vectors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gf
from ..field.goldilocks import GF
from .constants import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    RATE,
    WIDTH,
)

# NB: module constants stay HOST numpy arrays.  jnp.asarray at import time
# would create device arrays — and if this module is first imported inside
# a jit trace (merkle imports it lazily), those become leaked tracers.
_RC_NP = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, WIDTH)
_RC_LO = (_RC_NP & 0xFFFFFFFF).astype(np.uint32)
_RC_HI = (_RC_NP >> 32).astype(np.uint32)

_MDS_NP = np.zeros((WIDTH, WIDTH), dtype=np.int32)
for _r in range(WIDTH):
    for _i in range(WIDTH):
        _MDS_NP[_r, _i] = MDS_MATRIX_CIRC[(_i - _r) % WIDTH]
    _MDS_NP[_r, _r] += MDS_MATRIX_DIAG[_r]
_MDS_T = np.ascontiguousarray(_MDS_NP.T)  # (in, out): state @ _MDS_T applies M


def _sbox(x: GF) -> GF:
    x2 = gf.square(x)
    x3 = gf.mul(x2, x)
    x6 = gf.square(x3)
    return gf.mul(x6, x)


def _mds_layer(state: GF) -> GF:
    """Exact MDS multiply via 16-bit sublimb int32 matmuls."""
    planes = [
        (state.lo & jnp.uint32(0xFFFF)).astype(jnp.int32),
        (state.lo >> 16).astype(jnp.int32),
        (state.hi & jnp.uint32(0xFFFF)).astype(jnp.int32),
        (state.hi >> 16).astype(jnp.int32),
    ]
    sums = [
        jnp.matmul(p, _MDS_T, preferred_element_type=jnp.int32).astype(jnp.uint32)
        for p in planes
    ]  # each < 2^25
    s0, s1, s2, s3 = sums
    # value = s0 + s1*2^16 + s2*2^32 + s3*2^48 — accumulate into u32 limbs.
    r0 = s0 + ((s1 & jnp.uint32(0xFFFF)) << 16)
    c0 = (r0 < s0).astype(jnp.uint32)
    t = s2 + (s1 >> 16) + c0                      # < 2^26, no overflow
    r1 = t + ((s3 & jnp.uint32(0xFFFF)) << 16)
    c1 = (r1 < t).astype(jnp.uint32)
    r2 = (s3 >> 16) + c1
    r3 = jnp.zeros_like(r2)
    return gf._reduce128(r0, r1, r2, r3)


def _constant_layer(state: GF, r: int) -> GF:
    rc = GF(
        jnp.broadcast_to(_RC_LO[r], state.lo.shape),
        jnp.broadcast_to(_RC_HI[r], state.hi.shape),
    )
    return gf.add(state, rc)


def _add_rc(state: GF, rc_lo, rc_hi) -> GF:
    rc = GF(
        jnp.broadcast_to(rc_lo, state.lo.shape),
        jnp.broadcast_to(rc_hi, state.hi.shape),
    )
    return gf.add(state, rc)


def permute(state: GF) -> GF:
    """Poseidon permutation on state with trailing dim 12 (any batch dims).

    Rounds run under ``lax.scan`` (round constants as the scanned xs) so the
    compiled graph holds ONE full-round body and ONE partial-round body —
    a fully unrolled permutation is ~9k HLO ops and a hash tree of them
    made XLA compile for minutes."""

    def full_round(s: GF, xs):
        rc_lo, rc_hi = xs
        s = _add_rc(s, rc_lo, rc_hi)
        s = _sbox(s)
        return _mds_layer(s), None

    def partial_round(s: GF, xs):
        rc_lo, rc_hi = xs
        s = _add_rc(s, rc_lo, rc_hi)
        s0 = _sbox(s[..., 0:1])
        s = GF(
            jnp.concatenate([s0.lo, s.lo[..., 1:]], axis=-1),
            jnp.concatenate([s0.hi, s.hi[..., 1:]], axis=-1),
        )
        return _mds_layer(s), None

    h = HALF_N_FULL_ROUNDS
    p = N_PARTIAL_ROUNDS
    state, _ = jax.lax.scan(full_round, state, (_RC_LO[:h], _RC_HI[:h]))
    state, _ = jax.lax.scan(partial_round, state, (_RC_LO[h : h + p], _RC_HI[h : h + p]))
    state, _ = jax.lax.scan(full_round, state, (_RC_LO[h + p :], _RC_HI[h + p :]))
    return state


def batch_hash_no_pad(inputs: GF) -> GF:
    """hash_no_pad over a batch: inputs (batch, n) -> (batch, 4).

    n is static; absorption runs ceil(n / 8) permutations.  Full-rate
    chunks are absorbed under ``lax.scan`` so the graph holds one
    permutation body regardless of n (unrolled absorption of wide leaves
    dominated XLA compile time)."""
    batch, n = inputs.shape
    state = gf.zeros((batch, WIDTH))
    nfull = n // RATE
    if nfull:
        full = inputs[:, : nfull * RATE]
        chunks = GF(
            jnp.moveaxis(full.lo.reshape(batch, nfull, RATE), 1, 0),
            jnp.moveaxis(full.hi.reshape(batch, nfull, RATE), 1, 0),
        )  # (nfull, batch, RATE)

        def absorb(st: GF, chunk: GF):
            st = GF(
                jnp.concatenate([chunk.lo, st.lo[:, RATE:]], axis=1),
                jnp.concatenate([chunk.hi, st.hi[:, RATE:]], axis=1),
            )
            return permute(st), None

        state, _ = jax.lax.scan(absorb, state, chunks)
    tail = n - nfull * RATE
    if tail:
        chunk = inputs[:, nfull * RATE :]
        state = GF(
            jnp.concatenate([chunk.lo, state.lo[:, tail:]], axis=1),
            jnp.concatenate([chunk.hi, state.hi[:, tail:]], axis=1),
        )
        state = permute(state)
    return state[:, :4]


def batch_compress(left: GF, right: GF) -> GF:
    """Two-to-one compression, batched: (batch, 4) x (batch, 4) -> (batch, 4)."""
    batch = left.shape[0]
    zeros = gf.zeros((batch, 4))
    state = GF(
        jnp.concatenate([left.lo, right.lo, zeros.lo], axis=1),
        jnp.concatenate([left.hi, right.hi, zeros.hi], axis=1),
    )
    return permute(state)[:, :4]


def batch_hash_or_noop(inputs: GF) -> GF:
    """hash_or_noop over a batch: (batch, n) -> (batch, 4)."""
    batch, n = inputs.shape
    if n <= 4:
        pad = gf.zeros((batch, 4 - n))
        return GF(
            jnp.concatenate([inputs.lo, pad.lo], axis=1),
            jnp.concatenate([inputs.hi, pad.hi], axis=1),
        )
    return batch_hash_no_pad(inputs)
