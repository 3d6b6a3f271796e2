"""Packed device->host fetches.

Every d2h transfer through the tunneled TPU backend costs ~50 ms of
round-trip latency regardless of size (BENCH_KERNELS.md notes), so the
prover pipelines concatenate all the small arrays a transcript stage
needs (caps, opening evaluations, final polynomials) into ONE flat
``(2, total)`` u32 device buffer inside a jitted program and fetch it
with a single transfer.  fri_device.gather_trees pioneered the trick for
query rows; this module generalizes it for the batched prover
(plonk/prover_batch.py).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..field.goldilocks import GF


@lru_cache(maxsize=64)
def _pack_fn(shapes: tuple):
    import jax
    import jax.numpy as jnp

    def run(arrs):
        lo = jnp.concatenate([a.lo.reshape(-1) for a in arrs])
        hi = jnp.concatenate([a.hi.reshape(-1) for a in arrs])
        return jnp.stack([lo, hi])

    return jax.jit(run)


def fetch_packed(arrs: list[GF]) -> list[np.ndarray]:
    """Fetch several device GF arrays as canonical u64 numpy arrays with a
    single d2h transfer (one packed (2, total) u32 buffer)."""
    import jax

    arrs = list(arrs)
    if not arrs:
        return []
    if len(arrs) == 1:
        from ..field import goldilocks as gfd

        return [gfd.to_u64(arrs[0])]
    shapes = tuple(tuple(a.lo.shape) for a in arrs)
    flat = np.asarray(jax.device_get(_pack_fn(shapes)(tuple(arrs))))
    u64 = flat[0].astype(np.uint64) | (flat[1].astype(np.uint64)
                                       << np.uint64(32))
    out, pos = [], 0
    for s in shapes:
        sz = int(np.prod(s)) if s else 1
        out.append(u64[pos : pos + sz].reshape(s))
        pos += sz
    assert pos == u64.shape[0]
    return out
