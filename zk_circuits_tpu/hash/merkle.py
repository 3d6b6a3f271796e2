"""Merkle tree with cap (Poseidon two-to-one), host + device builders.

Semantics match the reference engine's MerkleTree/MerkleCap: leaf digest =
hash_or_noop(leaf vector), internal nodes = compress(left, right), and the
``cap`` is the set of 2^cap_height subtree roots.  A proof for leaf i is the
sibling digest path up to the cap (verified against
cap[i >> (height - cap_height)]).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import goldilocks as gfd
from ..host import poseidon as hposeidon


@dataclass
class MerkleTree:
    """Host-side tree: levels[0] = leaf digests (n, 4) ... levels[-1] = cap."""

    leaves: np.ndarray  # (n, leaf_len) u64
    cap_height: int
    levels: list  # list of (m, 4) u64 arrays

    @property
    def cap(self) -> np.ndarray:
        return self.levels[-1]

    @staticmethod
    def build(leaves: np.ndarray, cap_height: int, leaf_digests: np.ndarray | None = None) -> "MerkleTree":
        n = leaves.shape[0]
        assert n & (n - 1) == 0 and n >= (1 << cap_height)
        from .. import native

        use_native = native.available()
        if leaf_digests is None:
            if leaves.shape[1] <= 4:
                leaf_digests = np.zeros((n, 4), dtype=np.uint64)
                leaf_digests[:, : leaves.shape[1]] = leaves
            elif use_native:
                leaf_digests = native.hash_leaves(leaves, or_noop=False)
            else:
                leaf_digests = hposeidon.batch_hash_no_pad(leaves)
        levels = [leaf_digests]
        while levels[-1].shape[0] > (1 << cap_height):
            cur = levels[-1]
            if use_native:
                levels.append(native.compress_level(cur))
            else:
                levels.append(hposeidon.compress(cur[0::2], cur[1::2]))
        return MerkleTree(leaves, cap_height, levels)

    def prove(self, index: int) -> list[np.ndarray]:
        """Sibling digests from leaf level up to (excluding) the cap."""
        siblings = []
        i = index
        for level in self.levels[:-1]:
            siblings.append(level[i ^ 1].copy())
            i >>= 1
        return siblings


def verify_merkle_proof(
    leaf: np.ndarray, index: int, cap: np.ndarray, siblings: list[np.ndarray]
) -> bool:
    """Verify leaf (vector of felts) against the cap."""
    current = hposeidon.hash_or_noop(np.asarray(leaf, dtype=np.uint64))
    i = index
    for sib in siblings:
        if i & 1:
            current = hposeidon.compress(sib, current)
        else:
            current = hposeidon.compress(current, sib)
        i >>= 1
    return bool(np.array_equal(current, cap[i]))


def device_merkle_levels(leaves: gfd.GF, cap_height: int,
                         use_pallas: bool | None = None) -> list[gfd.GF]:
    """Device tree builder: batched Poseidon over rows; returns all levels
    (leaf digests first, cap last) as GF arrays.  jit-able.

    On TPU the LEAF hash — ~95% of the permutations (a w-column leaf costs
    ceil(w/8) sponge absorptions per row vs one permutation per internal
    node, and internal nodes total only n) — runs in the fused Pallas
    sponge kernel (hash/poseidon_pallas.py, state resident in VMEM).  The
    compress levels use the XLA lax.scan path (bit-identical,
    tests/test_poseidon.py).  Rationale for the split: on this image the
    Mosaic kernel binary is compiled remotely at first execution and is
    NOT captured by the persistent XLA compile cache, so every distinct
    Pallas shape costs seconds per process; one Pallas kernel per leaf
    width (instead of one per tree level) cuts a cold prove's Mosaic
    compiles ~12x while giving up ~5% of the hash work to XLA."""
    import jax

    from .poseidon import batch_compress, batch_hash_or_noop

    n = leaves.shape[0]
    assert n & (n - 1) == 0 and n >= (1 << cap_height)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    # (callers pass use_pallas=False when the leaf rows are GSPMD-sharded
    # over a mesh — pallas_call has no automatic-partitioning rule, so the
    # sharded single-proof prover keeps the XLA hash path there)

    if use_pallas and leaves.shape[1] > 4:
        from . import poseidon_pallas as pp

        if pp.available_for(n):
            levels = [pp.hash_leaves(leaves, interpret=False)]
        else:
            levels = [batch_hash_or_noop(leaves)]
    else:
        levels = [batch_hash_or_noop(leaves)]
    while levels[-1].shape[0] > (1 << cap_height):
        cur = levels[-1]
        levels.append(batch_compress(cur[0::2], cur[1::2]))
    return levels


def device_merkle_levels_values(values: gfd.GF, cap_height: int,
                                use_pallas: bool | None = None) -> list[gfd.GF]:
    """Like :func:`device_merkle_levels` but takes the leaf matrix
    COLUMN-MAJOR — ``values`` (cols, n), leaf row i = values[:, i] — the
    natural orientation of the prover's LDE output.  On TPU the Pallas
    sponge reads this layout zero-copy (poseidon_pallas.hash_values), so
    the commit's hash path skips the materialized transpose entirely."""
    import jax

    from .poseidon import batch_compress, batch_hash_or_noop

    cols, n = values.shape
    assert n & (n - 1) == 0 and n >= (1 << cap_height)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if use_pallas and cols > 4:
        from . import poseidon_pallas as pp

        if pp.available_for(n):
            levels = [pp.hash_values(values, interpret=False)]
        else:
            levels = [batch_hash_or_noop(gfd.GF(values.lo.T, values.hi.T))]
    else:
        levels = [batch_hash_or_noop(gfd.GF(values.lo.T, values.hi.T))]
    while levels[-1].shape[0] > (1 << cap_height):
        cur = levels[-1]
        levels.append(batch_compress(cur[0::2], cur[1::2]))
    return levels
