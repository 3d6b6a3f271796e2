"""Polynomial commitment oracle: coefficients -> coset LDE -> Merkle cap.

The TPU analog of the reference engine's PolynomialBatch (qp-plonky2
fri/oracle): the LDE and the row hashing are the prover's HBM-bandwidth
hot path and run on device (JAX NTT + batched Poseidon); the tree levels
are then pulled to host once for query-path extraction.

Leaf order is the natural coset order x_i = g * w_{8n}^i (documented
convention; the reference stores rows bit-reversed).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..field import goldilocks as gfd
from ..hash import merkle as merklem
from ..host import gl, gle
from ..ntt import ntt as nttm


@lru_cache(maxsize=32)
def _device_commit_fn(num_polys: int, n: int, rate_bits: int, cap_height: int,
                      num_salts: int):
    import jax

    def commit(coeffs: gfd.GF, salts: gfd.GF):
        values = nttm.lde(coeffs, rate_bits)  # (num_polys, 8n)
        rows = gfd.GF(values.lo.T, values.hi.T)  # (8n, num_polys)
        if num_salts:
            rows = gfd.concatenate([rows, salts], axis=1)
        levels = merklem.device_merkle_levels(rows, cap_height)
        return rows, levels

    return jax.jit(commit)


@dataclass
class PolynomialBatch:
    coeffs: np.ndarray       # (num_polys, n) u64, coefficient form
    leaves: np.ndarray       # (8n, num_polys [+ salts]) u64, LDE rows
    tree: merklem.MerkleTree
    rate_bits: int
    blinding: bool

    @property
    def num_polys(self) -> int:
        return self.coeffs.shape[0]

    @property
    def degree(self) -> int:
        return self.coeffs.shape[1]

    @staticmethod
    def from_coeffs(
        coeffs: np.ndarray,
        rate_bits: int,
        cap_height: int,
        blinding: bool = False,
        use_device: bool = True,
    ) -> "PolynomialBatch":
        coeffs = np.asarray(coeffs, dtype=np.uint64)
        if blinding:
            # Salt *polynomials* (degree n), so every leaf column stays a
            # committed low-degree polynomial for FRI.  Deterministic per the
            # reference's `no_random` mode (SURVEY.md §2.1).
            salts = _deterministic_salt_polys(coeffs.shape[1], 4)
            coeffs = np.concatenate([coeffs, salts], axis=0)
        num_polys, n = coeffs.shape
        if use_device:
            fn = _device_commit_fn(num_polys, n, rate_bits, cap_height, 0)
            rows_d, levels_d = fn(gfd.from_u64(coeffs), gfd.from_u64(np.zeros((0, 0), np.uint64)))
            leaves = gfd.to_u64(rows_d)
            levels = [gfd.to_u64(lv) for lv in levels_d]
            tree = merklem.MerkleTree(leaves, cap_height, levels)
        else:
            values = nttm.host_lde(coeffs, rate_bits)
            leaves = np.ascontiguousarray(values.T)
            tree = merklem.MerkleTree.build(leaves, cap_height)
        return PolynomialBatch(coeffs, leaves, tree, rate_bits, blinding)

    @staticmethod
    def from_values(
        values: np.ndarray,
        rate_bits: int,
        cap_height: int,
        blinding: bool = False,
        use_device: bool = True,
    ) -> "PolynomialBatch":
        """values: (num_polys, n) evaluations over H (natural order)."""
        coeffs = nttm.host_intt(np.asarray(values, dtype=np.uint64))
        return PolynomialBatch.from_coeffs(
            coeffs, rate_bits, cap_height, blinding, use_device
        )

    @property
    def cap(self) -> np.ndarray:
        return self.tree.cap

    def open_row(self, index: int) -> tuple[np.ndarray, list[np.ndarray]]:
        return self.leaves[index].copy(), self.tree.prove(index)

    def eval_at_ext(self, zeta: np.ndarray) -> np.ndarray:
        """Evaluate every polynomial at an extension point: (num_polys, 2)."""
        return eval_polys_at_ext(self.coeffs, zeta)


@lru_cache(maxsize=16)
def _device_commit_batch_fn(num_polys: int, n: int, rate_bits: int,
                            cap_height: int):
    """Batched commit: vmap of the LDE+Merkle pipeline over a leading proof
    axis.  Every op is batch-parallel, so sharding the batch axis over a
    device mesh runs each proof's commit on its own chip with zero
    communication (the TPU analog of the reference aggregator's rayon
    par_chunks, tree.rs:92-103)."""
    import jax

    def commit_one(coeffs: gfd.GF):
        values = nttm.lde(coeffs, rate_bits)
        rows = gfd.GF(values.lo.T, values.hi.T)
        levels = merklem.device_merkle_levels(rows, cap_height)
        return rows, levels

    return jax.jit(jax.vmap(commit_one))


def _batch_commit(coeffs_batch: np.ndarray, rate_bits: int, cap_height: int,
                  blinding: bool, mesh, use_device: bool) -> list:
    """Shared tail of batch_from_coeffs/batch_from_values: commit a stacked
    (B, num_polys, n) coefficient batch, batch axis sharded over ``mesh``."""
    coeffs_batch = np.asarray(coeffs_batch, dtype=np.uint64)
    B = coeffs_batch.shape[0]
    if blinding:
        salts = _deterministic_salt_polys(coeffs_batch.shape[2], 4)
        coeffs_batch = np.concatenate(
            [coeffs_batch, np.broadcast_to(salts, (B,) + salts.shape)], axis=1
        )
    _, num_polys, n = coeffs_batch.shape
    if not use_device:
        return [
            PolynomialBatch.from_coeffs(coeffs_batch[b], rate_bits,
                                        cap_height, blinding=False,
                                        use_device=False)
            for b in range(B)
        ]
    import jax

    fn = _device_commit_batch_fn(num_polys, n, rate_bits, cap_height)
    dev = gfd.from_u64(coeffs_batch)
    if mesh is not None and B % mesh.devices.size == 0:
        from ..parallel.mesh import shard_batch

        dev = jax.device_put(dev, shard_batch(mesh, 3))
    rows_d, levels_d = fn(dev)
    rows = gfd.to_u64(rows_d)                       # (B, 8n, num_polys)
    levels = [gfd.to_u64(lv) for lv in levels_d]    # each (B, m, 4)
    out = []
    for b in range(B):
        tree = merklem.MerkleTree(
            rows[b], cap_height, [lv[b] for lv in levels]
        )
        out.append(PolynomialBatch(coeffs_batch[b], rows[b], tree,
                                   rate_bits, blinding))
    return out


def batch_from_coeffs(coeffs_batch: np.ndarray, rate_bits: int,
                      cap_height: int, blinding: bool = False, mesh=None,
                      use_device: bool = True) -> list:
    """Commit B polynomial batches (B, num_polys, n) in one device call,
    batch axis sharded over ``mesh``.  Returns list[PolynomialBatch]."""
    return _batch_commit(coeffs_batch, rate_bits, cap_height, blinding,
                         mesh, use_device)


def batch_from_values(values_batch: np.ndarray, rate_bits: int,
                      cap_height: int, blinding: bool = False, mesh=None,
                      use_device: bool = True) -> list:
    """Like batch_from_coeffs but from evaluations over H (natural order)."""
    values_batch = np.asarray(values_batch, dtype=np.uint64)
    B, num_polys, n = values_batch.shape
    coeffs = nttm.host_intt(
        values_batch.reshape(B * num_polys, n)
    ).reshape(B, num_polys, n)
    return _batch_commit(coeffs, rate_bits, cap_height, blinding, mesh,
                         use_device)


def eval_polys_at_ext(coeffs: np.ndarray, zeta: np.ndarray) -> np.ndarray:
    """Batch-evaluate base-coeff polys (k, n) at extension zeta -> (k, 2)."""
    k, n = coeffs.shape
    zpow = ext_powers(zeta, n)  # (n, 2)
    t0 = gl.sum_mod(gl.mul(coeffs, zpow[None, :, 0]), axis=-1)
    t1 = gl.sum_mod(gl.mul(coeffs, zpow[None, :, 1]), axis=-1)
    return np.stack([t0, t1], axis=-1)


def ext_powers(zeta: np.ndarray, n: int) -> np.ndarray:
    """[1, zeta, ..., zeta^(n-1)] in GF(p^2): (n, 2)."""
    out = np.empty((n, 2), dtype=np.uint64)
    acc = gle.ONE.copy()
    for i in range(n):
        out[i] = acc
        acc = gle.mul(acc, zeta)
    return out


def _deterministic_salt_polys(n: int, num_salts: int) -> np.ndarray:
    """Deterministic blinding salt polynomials, counter-mode Poseidon
    coefficients (the reference's `no_random` feature removes proving
    randomness; salts keep the commitment *shape* of the zk config)."""
    from ..host import poseidon as hposeidon

    seed = np.zeros((num_salts * n, 8), dtype=np.uint64)
    seed[:, 0] = 0x5A17  # salt domain tag
    seed[:, 1] = np.arange(num_salts * n, dtype=np.uint64)
    return hposeidon.batch_hash_no_pad(seed)[:, 0].reshape(num_salts, n)
