"""Radix-2 NTT / INTT and coset LDE over Goldilocks.

Semantics match the reference engine's polynomial ops (external qp-plonky2
crate): ``ntt(coeffs)[i] = p(w^i)`` in natural order with w the primitive
2^k-th root of unity derived from POWER_OF_TWO_GENERATOR; ``coset_lde``
evaluates on the coset ``shift * <w>`` after zero-padding by the rate
(rate_bits=3 for the standard configs, cf. SURVEY.md §0).

Two implementations, bit-identical:
- host_*: numpy golden model (zk_circuits_tpu.host.gl).
- device functions: JAX on GF limb arrays, jit-able, stage-unrolled
  butterflies that XLA fuses into large VPU kernels.

The NTT always runs along the LAST axis; leading axes are batch.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gfd
from ..field.goldilocks import GF
from ..host import gl

# ---------------------------------------------------------------------------
# Host (numpy) golden model
# ---------------------------------------------------------------------------


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _host_stage_twiddles(n: int) -> tuple:
    """Per-stage twiddle tables: stage s (half=2^s) uses w_{2^{s+1}}^j."""
    stages = []
    bits = n.bit_length() - 1
    for s in range(bits):
        half = 1 << s
        w = gl.primitive_root_of_unity(s + 1)
        tw = np.empty(half, dtype=np.uint64)
        acc = 1
        for j in range(half):
            tw[j] = acc
            acc = (acc * w) % gl.P_INT
        stages.append(tw)
    return tuple(stages)


def host_ntt(coeffs: np.ndarray) -> np.ndarray:
    """values[i] = p(w^i); operates along the last axis (power-of-two len)."""
    coeffs = np.asarray(coeffs, dtype=np.uint64)
    n = coeffs.shape[-1]
    if n == 1:
        return coeffs.copy()
    assert n & (n - 1) == 0
    from .. import native
    if native.available():
        return native.ntt(coeffs)
    x = coeffs[..., _bit_reverse_indices(n)]
    for s, tw in enumerate(_host_stage_twiddles(n)):
        half = 1 << s
        shape = x.shape[:-1] + (n // (2 * half), 2, half)
        x = x.reshape(shape)
        a = x[..., 0, :]
        b = gl.mul(x[..., 1, :], tw)
        x = np.concatenate([gl.add(a, b)[..., None, :], gl.sub(a, b)[..., None, :]], axis=-2)
        x = x.reshape(x.shape[:-3] + (n,))
    return x


def host_intt(values: np.ndarray) -> np.ndarray:
    values = np.asarray(values, dtype=np.uint64)
    n = values.shape[-1]
    if n == 1:
        return values.copy()
    # INTT(x)[k] = (1/n) * NTT(x)[-k mod n]
    y = host_ntt(values)
    y = np.concatenate([y[..., :1], y[..., :0:-1]], axis=-1)
    n_inv = gl.inverse(np.uint64(n))
    return gl.mul(y, n_inv)


def host_coset_ntt(coeffs: np.ndarray, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> np.ndarray:
    """values[i] = p(shift * w^i)."""
    coeffs = np.asarray(coeffs, dtype=np.uint64)
    n = coeffs.shape[-1]
    powers = np.empty(n, dtype=np.uint64)
    acc = 1
    for k in range(n):
        powers[k] = acc
        acc = (acc * shift) % gl.P_INT
    return host_ntt(gl.mul(coeffs, powers))


def host_coset_intt(values: np.ndarray, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> np.ndarray:
    coeffs = host_intt(values)
    n = coeffs.shape[-1]
    inv_shift = pow(shift, gl.P_INT - 2, gl.P_INT)
    powers = np.empty(n, dtype=np.uint64)
    acc = 1
    for k in range(n):
        powers[k] = acc
        acc = (acc * inv_shift) % gl.P_INT
    return gl.mul(coeffs, powers)


def host_lde(coeffs: np.ndarray, rate_bits: int,
             shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> np.ndarray:
    """Zero-pad by 2^rate_bits then coset-NTT (the low-degree extension)."""
    coeffs = np.asarray(coeffs, dtype=np.uint64)
    n = coeffs.shape[-1]
    padded = np.zeros(coeffs.shape[:-1] + (n << rate_bits,), dtype=np.uint64)
    padded[..., :n] = coeffs
    return host_coset_ntt(padded, shift)


# ---------------------------------------------------------------------------
# Device (JAX) implementation
# ---------------------------------------------------------------------------


# NB: these cache HOST arrays and convert at the use site — caching jnp
# arrays created inside a jit trace leaks tracers into later traces.

def _split_u64(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (
        (a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (a >> np.uint64(32)).astype(np.uint32),
    )


@functools.lru_cache(maxsize=None)
def _stage_twiddles_u32(n: int):
    return tuple(_split_u64(tw) for tw in _host_stage_twiddles(n))


def _device_stage_twiddles(n: int):
    return tuple(
        GF(jnp.asarray(lo), jnp.asarray(hi)) for lo, hi in _stage_twiddles_u32(n)
    )


def _device_bit_reverse(n: int):
    return jnp.asarray(_bit_reverse_indices(n))


@functools.lru_cache(maxsize=None)
def _powers_u32(base: int, n: int):
    powers = np.empty(n, dtype=np.uint64)
    acc = 1
    for k in range(n):
        powers[k] = acc
        acc = (acc * base) % gl.P_INT
    return _split_u64(powers)


def _device_powers(base: int, n: int) -> GF:
    lo, hi = _powers_u32(base, n)
    return GF(jnp.asarray(lo), jnp.asarray(hi))


def _use_mxu(n: int, constrain) -> bool:
    """Route LARGE unsharded NTTs through the MXU matmul kernel on TPU.

    Measured crossover (BENCH_KERNELS.md r4, v5e): the MXU kernel is
    4.9x faster at single-poly 2^22 (131 -> 27 ms) and 2.2x at 2^20, but
    LOSES on the prover's batched commit shapes (135 x 2^16 LDE: the
    8-plane limb expansion adds HBM traffic that the well-fused
    stage-unrolled path doesn't pay), so the threshold is n >= 2^19.
    The stage-unrolled butterflies also stay in use (a) on CPU — where
    tests run and the persistent XLA cache holds their compiled
    programs — and (b) for sharded callers, whose per-stage sharding
    constraints have no MXU-path equivalent yet.
    ZKT_NTT=mxu|stages overrides."""
    import os

    mode = os.environ.get("ZKT_NTT", "")
    if mode == "mxu":
        return n >= 256
    if mode == "stages":
        return False
    import jax

    return (constrain is None and n >= (1 << 19)
            and jax.default_backend() != "cpu")


def ntt(coeffs: GF, constrain=None) -> GF:
    """Device NTT along the last axis; MXU matmul kernel (ntt_mxu.py) for
    large sizes on TPU, stage-unrolled butterflies otherwise.

    ``constrain`` (optional, fn GF->GF) is applied after the bit-reversal
    and after every butterfly stage — sharded callers pass a
    with_sharding_constraint pin so GSPMD keeps the batch axis sharded
    instead of rematerializing intermediates (parallel/ntt_sharded.py)."""
    n = coeffs.shape[-1]
    if n == 1:
        return coeffs
    assert n & (n - 1) == 0
    if _use_mxu(n, constrain):
        from .ntt_mxu import ntt_mxu

        return ntt_mxu(coeffs)
    rev = _device_bit_reverse(n)
    x = GF(jnp.take(coeffs.lo, rev, axis=-1), jnp.take(coeffs.hi, rev, axis=-1))
    if constrain is not None:
        x = constrain(x)
    for s, tw in enumerate(_device_stage_twiddles(n)):
        half = 1 << s
        shape = x.shape[:-1] + (n // (2 * half), 2, half)
        x = x.reshape(shape)
        a = x[..., 0, :]
        b = gfd.mul(x[..., 1, :], GF(jnp.broadcast_to(tw.lo, a.shape),
                                     jnp.broadcast_to(tw.hi, a.shape)))
        apb = gfd.add(a, b)
        amb = gfd.sub(a, b)
        lo = jnp.stack([apb.lo, amb.lo], axis=-2)
        hi = jnp.stack([apb.hi, amb.hi], axis=-2)
        x = GF(lo.reshape(lo.shape[:-3] + (n,)), hi.reshape(hi.shape[:-3] + (n,)))
        if constrain is not None:
            x = constrain(x)
    return x


def intt(values: GF) -> GF:
    n = values.shape[-1]
    if n == 1:
        return values
    y = ntt(values)
    idx = jnp.concatenate([jnp.arange(1), jnp.arange(n - 1, 0, -1)])
    y = GF(jnp.take(y.lo, idx, axis=-1), jnp.take(y.hi, idx, axis=-1))
    n_inv = int(gl.inverse(np.uint64(n)))
    return gfd.mul_const(y, n_inv)


def _mul_powers(x: GF, base: int) -> GF:
    n = x.shape[-1]
    pw = _device_powers(base, n)
    return gfd.mul(x, GF(jnp.broadcast_to(pw.lo, x.shape), jnp.broadcast_to(pw.hi, x.shape)))


def coset_ntt(coeffs: GF, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR,
              constrain=None) -> GF:
    return ntt(_mul_powers(coeffs, shift), constrain=constrain)


def coset_intt(values: GF, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> GF:
    coeffs = intt(values)
    inv_shift = pow(shift, gl.P_INT - 2, gl.P_INT)
    return _mul_powers(coeffs, inv_shift)


def lde(coeffs: GF, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR,
        constrain=None) -> GF:
    n = coeffs.shape[-1]
    pad = [(0, 0)] * (len(coeffs.shape) - 1) + [(0, n * ((1 << rate_bits) - 1))]
    padded = GF(jnp.pad(coeffs.lo, pad), jnp.pad(coeffs.hi, pad))
    return coset_ntt(padded, shift, constrain=constrain)
