"""Host-side (numpy) Poseidon over Goldilocks — batched golden model.

Matches the reference engine's ``PoseidonHash`` semantics exactly
(``hash_no_pad`` / ``hash_or_noop`` / two-to-one compression), as used by
e.g. /root/reference/wormhole/circuit/src/unspendable_account.rs:38-63 and
/root/reference/voting/src/lib.rs:277-283.

All entry points accept a leading batch dimension: ``state`` has shape
(..., 12).  Witness generation and Merkle golden checks run through here;
the JAX device kernels (zk_circuits_tpu.hash.poseidon) are tested against
this model.
"""

from __future__ import annotations

import numpy as np

from ..hash.constants import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    RATE,
    WIDTH,
)
from . import gl

_RC = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, WIDTH)
# Dense MDS matrix: M[r, i] = CIRC[(i - r) mod 12] + (r == i) * DIAG[r]
_MDS = np.zeros((WIDTH, WIDTH), dtype=np.uint64)
for _r in range(WIDTH):
    for _i in range(WIDTH):
        _MDS[_r, _i] = MDS_MATRIX_CIRC[(_i - _r) % WIDTH]
    _MDS[_r, _r] += MDS_MATRIX_DIAG[_r]
_MDS_T = _MDS.T.copy()


def _sbox(x: np.ndarray) -> np.ndarray:
    x2 = gl.mul(x, x)
    x3 = gl.mul(x2, x)
    x6 = gl.mul(x3, x3)
    return gl.mul(x6, x)


def _mds_layer(state: np.ndarray) -> np.ndarray:
    # state: (..., 12) canonical u64.  Split into 32-bit halves so the
    # integer matmul is exact in u64 (sum < 12*41*2^32 < 2^41).
    lo = state & gl.MASK32
    hi = state >> np.uint64(32)
    s_lo = lo @ _MDS_T  # (..., 12), < 2^41
    s_hi = hi @ _MDS_T
    # value = s_lo + s_hi * 2^32  (~73 bits) -> reduce via 128-bit path.
    t_lo32 = s_hi & gl.MASK32
    t_hi32 = s_hi >> np.uint64(32)
    x_lo = s_lo + (t_lo32 << np.uint64(32))
    carry = (x_lo < s_lo).astype(np.uint64)
    x_hi = t_hi32 + carry
    return gl._reduce128(x_lo, x_hi)


def permute(state: np.ndarray) -> np.ndarray:
    """Full Poseidon permutation on shape (..., 12) canonical u64 arrays.

    Routes through the native C++ kernel when built: the numpy path costs
    ~4.5 ms PER PERMUTATION, and the Fiat-Shamir challenger performs
    100+ sequential permutations per prove transcript — ~0.4-0.6 s of
    warm prove time hidden outside every stage timer (round-4 finding)."""
    state = np.asarray(state, dtype=np.uint64)
    from .. import native

    if native.available():
        flat = np.ascontiguousarray(state.reshape(-1, WIDTH))
        return native.poseidon_permute(flat).reshape(state.shape)
    rc = 0
    for _ in range(HALF_N_FULL_ROUNDS):
        state = gl.add(state, _RC[rc])
        state = _sbox(state)
        state = _mds_layer(state)
        rc += 1
    for _ in range(N_PARTIAL_ROUNDS):
        state = gl.add(state, _RC[rc])
        state0 = _sbox(state[..., 0])
        state = np.concatenate([state0[..., None], state[..., 1:]], axis=-1)
        state = _mds_layer(state)
        rc += 1
    for _ in range(HALF_N_FULL_ROUNDS):
        state = gl.add(state, _RC[rc])
        state = _sbox(state)
        state = _mds_layer(state)
        rc += 1
    return state


def hash_n_to_m_no_pad(inputs: np.ndarray, num_outputs: int) -> np.ndarray:
    """Sponge with no padding: absorb in chunks of RATE by overwriting the
    first len(chunk) state elements, permuting after each chunk."""
    inputs = np.asarray(inputs, dtype=np.uint64)
    assert inputs.ndim == 1
    state = np.zeros(WIDTH, dtype=np.uint64)
    for i in range(0, len(inputs), RATE):
        chunk = inputs[i : i + RATE]
        state[: len(chunk)] = chunk
        state = permute(state)
    outputs: list[np.ndarray] = []
    while True:
        for j in range(RATE):
            outputs.append(state[j])
            if len(outputs) == num_outputs:
                return np.array(outputs, dtype=np.uint64)
        state = permute(state)


def hash_no_pad(inputs: np.ndarray) -> np.ndarray:
    return hash_n_to_m_no_pad(inputs, 4)


def hash_or_noop(inputs: np.ndarray) -> np.ndarray:
    """HashOut of a leaf vector: identity-pad if <= 4 felts, else hash."""
    inputs = np.asarray(inputs, dtype=np.uint64)
    if len(inputs) <= 4:
        out = np.zeros(4, dtype=np.uint64)
        out[: len(inputs)] = inputs
        return out
    return hash_no_pad(inputs)


def compress(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Two-to-one compression: permute([left, right, 0^4])[:4].

    Batched: left/right shape (..., 4)."""
    left = np.asarray(left, dtype=np.uint64)
    right = np.asarray(right, dtype=np.uint64)
    zeros = np.zeros(left.shape[:-1] + (4,), dtype=np.uint64)
    state = np.concatenate([left, right, zeros], axis=-1)
    return permute(state)[..., :4]


def batch_hash_no_pad(inputs: np.ndarray) -> np.ndarray:
    """hash_no_pad over a batch: inputs (batch, n) -> (batch, 4)."""
    inputs = np.asarray(inputs, dtype=np.uint64)
    batch, n = inputs.shape
    from .. import native
    if native.available() and batch > 8:
        return native.hash_no_pad_batch(inputs)
    state = np.zeros((batch, WIDTH), dtype=np.uint64)
    for i in range(0, n, RATE):
        chunk = inputs[:, i : i + RATE]
        state[:, : chunk.shape[1]] = chunk
        state = permute(state)
    return state[:, :4]
