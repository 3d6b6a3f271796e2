"""Pallas TPU kernel for batched Poseidon leaf hashing.

The Merkle commit's leaf hashing is the prover's HBM-bandwidth hot spot:
hashing an (N, C) leaf matrix takes ceil(C/8) permutations of a width-12
state per row.  The stock XLA path (hash/poseidon.py) runs the rounds
under ``lax.scan`` whose (N, 12) carry streams through HBM every round —
~30 x 2 x 96 B of traffic per row per absorption.  This kernel keeps the
state tile resident in VMEM for the WHOLE sponge (all absorptions, all
rounds), reducing HBM traffic to one read of the leaf row plus one write
of the 4-felt digest.

Same field/round semantics as hash/poseidon.py (which is itself validated
against the reference golden vectors); parity is tested in
tests/test_poseidon.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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

_RC_NP = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, WIDTH)
_RC_LO_NP = (_RC_NP & 0xFFFFFFFF).astype(np.uint32)
_RC_HI_NP = (_RC_NP >> 32).astype(np.uint32)

_MDS_NP = np.zeros((WIDTH, WIDTH), dtype=np.int32)
for _r in range(WIDTH):
    for _i in range(WIDTH):
        _MDS_NP[_r, _i] = MDS_MATRIX_CIRC[(_i - _r) % WIDTH]
    _MDS_NP[_r, _r] += MDS_MATRIX_DIAG[_r]
_MDS_T_NP = np.ascontiguousarray(_MDS_NP.T)  # (in, out): state @ MDS_T

# Rows per kernel invocation.  State tile: TR x 12 x 2 x 4 B = 96*TR bytes;
# plus the leaf tile TR x C x 8 B.  For C = 139: TR=512 -> ~0.6 MB leaf +
# 48 KB state, comfortably in VMEM with double buffering.
_TILE_ROWS = 512

_M16 = np.uint32(0xFFFF)


def _mds_layer(state: GF, mds_t) -> GF:
    """Exact MDS multiply via 16-bit sublimb int32 matmuls (MXU)."""
    planes = [
        (state.lo & _M16).astype(jnp.int32),
        (state.lo >> 16).astype(jnp.int32),
        (state.hi & _M16).astype(jnp.int32),
        (state.hi >> 16).astype(jnp.int32),
    ]
    sums = [
        jnp.matmul(p, mds_t, preferred_element_type=jnp.int32).astype(jnp.uint32)
        for p in planes
    ]  # each < 2^25
    s0, s1, s2, s3 = sums
    r0 = s0 + ((s1 & _M16) << 16)
    c0 = (r0 < s0).astype(jnp.uint32)
    t = s2 + (s1 >> 16) + c0
    r1 = t + ((s3 & _M16) << 16)
    c1 = (r1 < t).astype(jnp.uint32)
    r2 = (s3 >> 16) + c1
    r3 = jnp.zeros_like(r2)
    return gf._reduce128(r0, r1, r2, r3)


def _sbox(x: GF) -> GF:
    x2 = gf.mul(x, x)
    x3 = gf.mul(x2, x)
    x6 = gf.mul(x3, x3)
    return gf.mul(x6, x)


def _add_rc(state: GF, r_lo, r_hi) -> GF:
    rc = GF(jnp.broadcast_to(r_lo, state.lo.shape),
            jnp.broadcast_to(r_hi, state.hi.shape))
    return gf.add(state, rc)


def _permute_unrolled(state: GF, rc_lo, rc_hi, mds_t) -> GF:
    """All 30 rounds unrolled — fine inside one Pallas kernel body."""
    h, p = HALF_N_FULL_ROUNDS, N_PARTIAL_ROUNDS
    for r in range(h):
        state = _sbox(_add_rc(state, rc_lo[r], rc_hi[r]))
        state = _mds_layer(state, mds_t)
    for r in range(h, h + p):
        state = _add_rc(state, rc_lo[r], rc_hi[r])
        s0 = _sbox(state[:, 0:1])
        state = GF(
            jnp.concatenate([s0.lo, state.lo[:, 1:]], axis=1),
            jnp.concatenate([s0.hi, state.hi[:, 1:]], axis=1),
        )
        state = _mds_layer(state, mds_t)
    for r in range(h + p, h + p + h):
        state = _sbox(_add_rc(state, rc_lo[r], rc_hi[r]))
        state = _mds_layer(state, mds_t)
    return state


def _leaf_hash_kernel(cols: int, lo_ref, hi_ref, rc_lo_ref, rc_hi_ref,
                      mds_ref, out_lo_ref, out_hi_ref):
    tr = lo_ref.shape[0]
    rc_lo = rc_lo_ref[:, :]
    rc_hi = rc_hi_ref[:, :]
    mds_t = mds_ref[:, :]
    state = gf.zeros((tr, WIDTH))
    for off in range(0, cols, RATE):
        chunk = min(RATE, cols - off)
        c_lo = lo_ref[:, off : off + chunk]
        c_hi = hi_ref[:, off : off + chunk]
        state = GF(
            jnp.concatenate([c_lo, state.lo[:, chunk:]], axis=1),
            jnp.concatenate([c_hi, state.hi[:, chunk:]], axis=1),
        )
        state = _permute_unrolled(state, rc_lo, rc_hi, mds_t)
    out_lo_ref[:, :] = state.lo[:, :4]
    out_hi_ref[:, :] = state.hi[:, :4]


@functools.partial(jax.jit, static_argnums=(1,))
def _hash_leaves_tiled(leaves: GF, interpret: bool) -> GF:
    n, cols = leaves.lo.shape
    tile = min(_TILE_ROWS, n)
    assert n % tile == 0, "row count must divide the tile size"
    grid = (n // tile,)
    kernel = functools.partial(_leaf_hash_kernel, cols)
    out_shape = (
        jax.ShapeDtypeStruct((n, 4), jnp.uint32),
        jax.ShapeDtypeStruct((n, 4), jnp.uint32),
    )
    leaf_spec = pl.BlockSpec((tile, cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((30, WIDTH), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    mds_spec = pl.BlockSpec((WIDTH, WIDTH), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, 4), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    lo, hi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[leaf_spec, leaf_spec, rc_spec, rc_spec, mds_spec],
        out_specs=(out_spec, out_spec),
        out_shape=out_shape,
        interpret=interpret,
    )(leaves.lo, leaves.hi,
      jnp.asarray(_RC_LO_NP), jnp.asarray(_RC_HI_NP), jnp.asarray(_MDS_T_NP))
    return GF(lo, hi)


def hash_leaves(leaves: GF, interpret: bool | None = None) -> GF:
    """(n, cols) leaf matrix -> (n, 4) digests (hash_no_pad semantics).

    Falls back to interpret mode off-TPU so the same code path is testable
    on the CPU backend.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _hash_leaves_tiled(leaves, interpret)


def available_for(n: int) -> bool:
    return n % min(_TILE_ROWS, n) == 0 and n >= 8
