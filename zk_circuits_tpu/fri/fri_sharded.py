"""Cross-shard FRI commit phase: a single proof's FRI codeword sharded
over a device mesh (SURVEY §5 "long-context" row: FRI fold as a
shard-local reduce; VERDICT r3 missing item 4).

Layout analysis (why this maps cleanly onto a mesh):
- the codeword/coefficient vectors are BLOCK-sharded along their one axis;
- ``fold_coeffs`` (new_c[m] = sum_j beta^j c[arity*m + j]) reads
  CONTIGUOUS arity-groups, so the fold is 100% shard-local — the
  "strided reduce across shards" needs no communication at all in
  coefficient space;
- all cross-device traffic concentrates in (a) the NTT per level
  (parallel/ntt_sharded.py four-step all-to-alls) and (b) the fiber
  regrouping before Merkle hashing (leaves row g needs codeword values
  {k*m + g}, a strided transpose GSPMD lowers to one all-to-all);
- Merkle leaf hashing and compress levels run row-sharded; only the cap
  is fetched.

Codeword sizes shrink 16x per level (arity 2^4), so levels beyond the
first are cheap regardless of sharding.

Bit-exactness: tests/test_fri_sharded.py pins caps + final poly against
the host ``fri_prove`` on an 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import goldilocks as gfd
from ..field.goldilocks import GF
from ..host import gl
from ..ntt import ntt as ntt_mod
from ..parallel import ntt_sharded as nts


def _constrain(a: GF, mesh: Mesh, spec: P) -> GF:
    s = NamedSharding(mesh, spec)
    return GF(jax.lax.with_sharding_constraint(a.lo, s),
              jax.lax.with_sharding_constraint(a.hi, s))


# ext elements are (c0, c1) pairs of GF arrays.


def _ext_mul(a0, a1, b0, b1):
    # GF(p^2) with X^2 = 7 (the engine's extension, host/gle.py)
    w = gfd.mul_const(gfd.mul(a1, b1), 7)
    lo = gfd.add(gfd.mul(a0, b0), w)
    hi = gfd.add(gfd.mul(a0, b1), gfd.mul(a1, b0))
    return lo, hi


def _coset_ntt_ext_body(c0: GF, c1: GF, shift: int, out_size: int,
                        mesh: Mesh, axis: str):
    """Ext-coefficient coset NTT: scale by shift^k, pad, sharded NTT per
    component (the base-field NTT commutes with the extension split)."""
    m = c0.shape[-1]
    pw = nts.gl.powers(np.uint64(shift), m)
    pwg = gfd.from_u64(pw)
    s0 = gfd.mul(c0, pwg)
    s1 = gfd.mul(c1, pwg)
    pad = out_size - m
    if pad:
        s0 = GF(jnp.pad(s0.lo, (0, pad)), jnp.pad(s0.hi, (0, pad)))
        s1 = GF(jnp.pad(s1.lo, (0, pad)), jnp.pad(s1.hi, (0, pad)))
    s0 = _constrain(s0, mesh, P(axis))
    s1 = _constrain(s1, mesh, P(axis))
    v0 = nts._ntt_four_step(s0, mesh, axis, inverse=False)
    v1 = nts._ntt_four_step(s1, mesh, axis, inverse=False)
    return v0, v1


def _fiber_leaves_body(v0: GF, v1: GF, arity: int, mesh: Mesh, axis: str):
    """codeword (size,) -> Merkle leaves (m, 2*arity): leaf g holds the
    fiber {x : x^arity = y_g}: values [k*m+g for k in range(arity)],
    components interleaved (host layout: moveaxis(reshape(arity, m, 2)))."""
    size = v0.shape[-1]
    m = size // arity
    cols = []
    for k in range(arity):
        a0 = GF(jax.lax.dynamic_slice(v0.lo, (k * m,), (m,)),
                jax.lax.dynamic_slice(v0.hi, (k * m,), (m,)))
        a1 = GF(jax.lax.dynamic_slice(v1.lo, (k * m,), (m,)),
                jax.lax.dynamic_slice(v1.hi, (k * m,), (m,)))
        cols.append(a0)
        cols.append(a1)
    leaves = gfd.stack(cols, axis=1)                  # (m, 2*arity)
    return _constrain(leaves, mesh, P(axis, None))


@functools.lru_cache(maxsize=None)
def _level_fn(mesh: Mesh, axis: str, m_coeffs: int, out_size: int,
              shift: int, arity: int, cap_height: int):
    """jit: coeffs -> (codeword, merkle levels) for one FRI commit level."""
    from ..hash import merkle as merklem

    def run(c0, c1):
        v0, v1 = _coset_ntt_ext_body(c0, c1, shift, out_size, mesh, axis)
        leaves = _fiber_leaves_body(v0, v1, arity, mesh, axis)
        levels = merklem.device_merkle_levels(leaves, cap_height)
        return v0, v1, levels

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _fold_fn(mesh: Mesh, axis: str, m_coeffs: int, arity_bits: int):
    # beta arrives as a (1,)-GF pair (jit with a static beta would
    # recompile per challenge).
    def run_dyn(c0, c1, beta_arr0: GF, beta_arr1: GF):
        arity = 1 << arity_bits
        m = c0.shape[-1] // arity
        r0 = GF(c0.lo.reshape(m, arity), c0.hi.reshape(m, arity))
        r1 = GF(c1.lo.reshape(m, arity), c1.hi.reshape(m, arity))
        b0 = GF(jnp.broadcast_to(beta_arr0.lo, (m,)),
                jnp.broadcast_to(beta_arr0.hi, (m,)))
        b1 = GF(jnp.broadcast_to(beta_arr1.lo, (m,)),
                jnp.broadcast_to(beta_arr1.hi, (m,)))
        acc0 = r0[:, arity - 1]
        acc1 = r1[:, arity - 1]
        for j in range(arity - 2, -1, -1):
            acc0, acc1 = _ext_mul(acc0, acc1, b0, b1)
            acc0 = gfd.add(acc0, r0[:, j])
            acc1 = gfd.add(acc1, r1[:, j])
        return (_constrain(acc0, mesh, P(axis)),
                _constrain(acc1, mesh, P(axis)))

    return jax.jit(run_dyn)


def fri_commit_sharded(coeffs_ext: np.ndarray, degree_bits: int, fri_config,
                       challenger, mesh: Mesh, axis: str = "x",
                       coset_shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR):
    """Sharded FRI commit phase for one (n, 2) ext coefficient vector.

    Returns (caps, betas, final_poly) — bit-exact with the host
    fri_prove's commit phase (same challenger transcript)."""
    n = 1 << degree_bits
    lde_size = n << fri_config.rate_bits
    arities = fri_config.reduction_arities(degree_bits)
    cap_h = fri_config.cap_height

    spec = NamedSharding(mesh, P(axis))
    c0 = jax.device_put(gfd.from_u64(np.ascontiguousarray(coeffs_ext[:, 0])), spec)
    c1 = jax.device_put(gfd.from_u64(np.ascontiguousarray(coeffs_ext[:, 1])), spec)

    caps, betas = [], []
    shift, size, m = coset_shift, lde_size, n
    for a_bits in arities:
        arity = 1 << a_bits
        fn = _level_fn(mesh, axis, m, size, shift, arity, cap_h)
        v0, v1, levels = fn(c0, c1)
        cap = gfd.to_u64(levels[-1]).reshape(-1, 4)
        caps.append(cap)
        challenger.observe_cap(cap)
        beta = challenger.get_extension_challenge()
        betas.append(beta)
        ffn = _fold_fn(mesh, axis, m, a_bits)
        c0, c1 = ffn(c0, c1,
                     gfd.from_u64(np.array([beta[0]], dtype=np.uint64)),
                     gfd.from_u64(np.array([beta[1]], dtype=np.uint64)))
        shift = pow(shift, arity, gl.P_INT)
        size = size >> a_bits
        m = m >> a_bits

    final0 = gfd.to_u64(c0)
    final1 = gfd.to_u64(c1)
    final_poly = np.stack([final0, final1], axis=-1)
    return caps, betas, final_poly
