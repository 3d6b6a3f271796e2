"""On-device witness generation: the static schedule as ONE jitted program.

The host witness path costs ~0.27 s of numpy passes plus a ~9 MB h2d of
the wire matrix per warm prove (BENCH_STAGES_WARM.json) — together ~40%
of the 2.1 s warm wormhole prove on the tunneled chip.  This module bakes
the circuit's static schedule (iop/witness.py semantics) into a jitted
device program: the only h2d left is the PartialWitness seed values
(a few KB), and the wire polynomials never exist on the host at all.

Scope: schedules whose batch kinds are {const, arith, base_sum,
poseidon, eq_inv} — the wormhole + voting circuits.  Recursion circuits
(arith_ext / random_access) fall back to the host path.

Soundness note: the device program skips the host path's conflict /
completeness checks (they require data-dependent control flow); it is
used only when ``check_witness`` is off — same contract as the reference
prover, whose production ``prove()`` does not re-check constraints.  The
device zs program still verifies that the permutation argument closes,
and bench.py asserts byte-parity of device proofs against the fully
checked host pipeline.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..field import goldilocks as gfd
from ..field.goldilocks import GF
from ..hash.constants import HALF_N_FULL_ROUNDS, N_PARTIAL_ROUNDS, WIDTH
from ..iop.gates import PoseidonGate

_SUPPORTED = {"const", "arith", "base_sum", "poseidon", "eq_inv"}
# The recursion-schedule kinds are implemented and bit-exact
# (tests/test_witness_device.py), but the remote TPU compile helper is
# OOM-killed on a wormhole-scale recursion schedule's program (15.7k rows
# of ext ops -> SIGKILL from tpu_compile_helper), so they are opt-in
# until the program is restructured (fewer, larger fused scatters):
_EXT_KINDS = {"arith_ext", "ext_inv", "random_access"}


def _ext_mul_dev(a0: GF, a1: GF, b0: GF, b1: GF):
    """GF(p^2) multiply on component pairs (X^2 = 7)."""
    lo = gfd.add(gfd.mul(a0, b0), gfd.mul_const(gfd.mul(a1, b1), 7))
    hi = gfd.add(gfd.mul(a0, b1), gfd.mul(a1, b0))
    return lo, hi


def supported(circuit_data) -> bool:
    import os

    kinds = _SUPPORTED | (_EXT_KINDS
                          if os.environ.get("ZKT_DEVICE_WITNESS_EXT") else set())
    return all(b.kind in kinds for b in circuit_data.prover_only.schedule)


def _poseidon_trace_dev(inputs: GF, swap: GF):
    """Batched PoseidonGate wire trace on device: inputs (m, 12),
    swap (m,).  Returns (outputs (m,12), deltas (m,4), full0 (m,36),
    partial (m,22), full1 (m,48)).  Mirrors iop/witness.py
    _poseidon_trace; round bodies under lax.scan like hash/poseidon.py."""
    import jax
    import jax.numpy as jnp

    from ..hash.poseidon import _RC_HI, _RC_LO, _add_rc, _mds_layer, _sbox

    deltas_cols = []
    state_cols = []
    for i in range(4):
        d = gfd.mul(swap, gfd.sub(inputs[:, 4 + i], inputs[:, i]))
        deltas_cols.append(d)
    for i in range(4):
        state_cols.append(gfd.add(inputs[:, i], deltas_cols[i]))
    for i in range(4):
        state_cols.append(gfd.sub(inputs[:, 4 + i], deltas_cols[i]))
    for i in range(8, 12):
        state_cols.append(inputs[:, i])
    state = gfd.stack(state_cols, axis=-1)            # (m, 12)
    deltas = gfd.stack(deltas_cols, axis=-1)          # (m, 4)

    h, p = HALF_N_FULL_ROUNDS, N_PARTIAL_ROUNDS

    def full_round(s: GF, xs):
        rc_lo, rc_hi = xs
        pre = _add_rc(s, rc_lo, rc_hi)                # the recorded sbox input
        s2 = _mds_layer(_sbox(pre))
        return s2, pre

    def partial_round(s: GF, xs):
        rc_lo, rc_hi = xs
        pre = _add_rc(s, rc_lo, rc_hi)
        s0 = _sbox(pre[..., 0:1])
        s2 = GF(jnp.concatenate([s0.lo, pre.lo[..., 1:]], axis=-1),
                jnp.concatenate([s0.hi, pre.hi[..., 1:]], axis=-1))
        return _mds_layer(s2), GF(pre.lo[..., 0], pre.hi[..., 0])

    state, pre0 = jax.lax.scan(full_round, state, (_RC_LO[:h], _RC_HI[:h]))
    state, prep = jax.lax.scan(partial_round, state,
                               (_RC_LO[h:h + p], _RC_HI[h:h + p]))
    state, pre1 = jax.lax.scan(full_round, state,
                               (_RC_LO[h + p:], _RC_HI[h + p:]))
    m = inputs.shape[0]
    # pre0: (h, m, 12) -> rounds 1..3 recorded: (m, 36)
    full0 = GF(jnp.moveaxis(pre0.lo[1:], 0, 1).reshape(m, 36),
               jnp.moveaxis(pre0.hi[1:], 0, 1).reshape(m, 36))
    partial = GF(prep.lo.T, prep.hi.T)                # (m, 22)
    full1 = GF(jnp.moveaxis(pre1.lo, 0, 1).reshape(m, 48),
               jnp.moveaxis(pre1.hi, 0, 1).reshape(m, 48))
    return state, deltas, full0, partial, full1


def _witness_body(circuit_data, seed_reps):
    """Traced witness body: seeds (S,) GF in fixed rep order -> (wires
    (n, W) GF, pi values (P,) GF).  Shared by the single-proof jit
    (`_witness_fn`) and the batched vmap (`_witness_batch_fn` /
    prover_batch's fused wires program)."""
    import jax
    import jax.numpy as jnp
    common = circuit_data.common
    po = circuit_data.prover_only
    n = common.degree
    num_wires = common.config.num_wires
    seed_idx = np.asarray(seed_reps, dtype=np.int64)
    pi_reps = np.asarray([po.rep_of_target[t] for t in po.public_inputs],
                         dtype=np.int64)

    def run(seed_vals: GF):
        values = gfd.zeros((po.num_reps,))
        wires = gfd.zeros((n, num_wires))

        def set_reps(vals_gf: GF, reps: np.ndarray, v: GF):
            flat = np.asarray(reps).ravel()
            return GF(vals_gf.lo.at[flat].set(v.lo.ravel()),
                      vals_gf.hi.at[flat].set(v.hi.ravel()))

        def write_wires(w: GF, d, v: GF):
            rows, cols, pos = d["out_wires"]
            if rows.size:
                lin_v = GF(v.lo.ravel()[pos], v.hi.ravel()[pos])
                return GF(w.lo.at[rows, cols].set(lin_v.lo),
                          w.hi.at[rows, cols].set(lin_v.hi))
            return w

        values = set_reps(values, seed_idx, seed_vals)

        for batch in po.schedule:
            d = batch.data
            if batch.kind == "const":
                rows = d["rows"]
                consts = po.constants_values[:, rows].T
                vals_np = consts[:, : d["out_reps"].shape[1]]
                v = gfd.from_u64(np.ascontiguousarray(vals_np))
                values = set_reps(values, d["out_reps"], v)
                wires = write_wires(wires, d, v)
            elif batch.kind == "arith":
                ir = d["in_reps"]
                m0 = values[ir[:, 0]]
                m1 = values[ir[:, 1]]
                ad = values[ir[:, 2]]
                # c0/c1 are per-op u64 arrays (ops of one level share a
                # batch across different gate constants)
                c0 = gfd.from_u64(np.asarray(d["c0"], dtype=np.uint64))
                c1 = gfd.from_u64(np.asarray(d["c1"], dtype=np.uint64))
                out = gfd.add(gfd.mul(gfd.mul(m0, m1), c0),
                              gfd.mul(ad, c1))
                values = set_reps(values, d["out_reps"], out)
                wires = write_wires(wires, d, out)
            elif batch.kind == "base_sum":
                x = values[d["in_reps"]]
                nbits = d["num_bits"]
                cols = []
                for k in range(nbits):
                    if k < 32:
                        b = (x.lo >> np.uint32(k)) & np.uint32(1)
                    else:
                        b = (x.hi >> np.uint32(k - 32)) & np.uint32(1)
                    cols.append(GF(b, jnp.zeros_like(b)))
                bits = gfd.stack(cols, axis=-1)
                values = set_reps(values, d["out_reps"], bits)
                wires = write_wires(wires, d, bits)
            elif batch.kind == "poseidon":
                ir = d["in_reps"]
                inputs = values[ir[:, :12]]
                swap = values[ir[:, 12]]
                outputs, deltas, full0, partial, full1 = \
                    _poseidon_trace_dev(inputs, swap)
                values = set_reps(values, d["out_reps"], outputs)
                wires = write_wires(wires, d, outputs)
                rows = d["rows"]
                for block, s, e in (
                    (deltas, PoseidonGate.START_DELTA, PoseidonGate.START_FULL_0),
                    (full0, PoseidonGate.START_FULL_0, PoseidonGate.START_PARTIAL),
                    (partial, PoseidonGate.START_PARTIAL, PoseidonGate.START_FULL_1),
                    (full1, PoseidonGate.START_FULL_1, num_wires),
                ):
                    wires = GF(wires.lo.at[rows[:, None], np.arange(s, e)[None, :]]
                               .set(block.lo),
                               wires.hi.at[rows[:, None], np.arange(s, e)[None, :]]
                               .set(block.hi))
            elif batch.kind == "eq_inv":
                x = values[d["in_reps"]]
                inv = gfd.inverse(x)      # inverse(0) == 0
                values = set_reps(values, d["out_reps"], inv)
            elif batch.kind == "arith_ext":
                ir = d["in_reps"]         # (m, 6): m0(2) m1(2) addend(2)
                m0l, m0h = values[ir[:, 0]], values[ir[:, 1]]
                m1l, m1h = values[ir[:, 2]], values[ir[:, 3]]
                adl, adh = values[ir[:, 4]], values[ir[:, 5]]
                c0 = gfd.from_u64(np.asarray(d["c0"], dtype=np.uint64))
                c1 = gfd.from_u64(np.asarray(d["c1"], dtype=np.uint64))
                pl, ph = _ext_mul_dev(m0l, m0h, m1l, m1h)
                outl = gfd.add(gfd.mul(pl, c0), gfd.mul(adl, c1))
                outh = gfd.add(gfd.mul(ph, c0), gfd.mul(adh, c1))
                out = gfd.stack([outl, outh], axis=-1)   # (m, 2)
                values = set_reps(values, d["out_reps"], out)
                wires = write_wires(wires, d, out)
            elif batch.kind == "ext_inv":
                ir = d["in_reps"]         # (m, 2)
                a0, a1 = values[ir[:, 0]], values[ir[:, 1]]
                # 1/(a0 + a1 X) = (a0 - a1 X) / (a0^2 - 7 a1^2)
                norm = gfd.sub(gfd.mul(a0, a0),
                               gfd.mul_const(gfd.mul(a1, a1), 7))
                ninv = gfd.inverse(norm)
                il = gfd.mul(a0, ninv)
                ih = gfd.mul(gfd.sub(gfd.zeros(a1.shape), a1), ninv)
                values = set_reps(values, d["out_reps"],
                                  gfd.stack([il, ih], axis=-1))
            elif batch.kind == "random_access":
                ir = d["in_reps"]         # (m, 1 + V): index + list
                idx_gf = values[ir[:, 0]]
                idx = idx_gf.lo.astype(jnp.int32)   # indices < 2^bits < 2^32
                lists = values[ir[:, 1:]]
                claimed = GF(
                    jnp.take_along_axis(lists.lo, idx[:, None], 1)[:, 0],
                    jnp.take_along_axis(lists.hi, idx[:, None], 1)[:, 0])
                nbits = d["num_bits"]
                cols = [claimed]
                for k in range(nbits):
                    b = (idx_gf.lo >> np.uint32(k)) & np.uint32(1)
                    cols.append(GF(b, jnp.zeros_like(b)))
                out = gfd.stack(cols, axis=-1)
                values = set_reps(values, d["out_reps"], out)
                wires = write_wires(wires, d, out)
            else:
                raise ValueError(batch.kind)

        cells = po.wire_cell_reps
        if cells.shape[0]:
            cv = values[cells[:, 2]]
            wires = GF(wires.lo.at[cells[:, 0], cells[:, 1]].set(cv.lo),
                       wires.hi.at[cells[:, 0], cells[:, 1]].set(cv.hi))
        pis = values[pi_reps]
        return wires, pis

    return run


@lru_cache(maxsize=8)
def _witness_fn(key):
    """jit factory over `_witness_body` (single proof)."""
    import jax

    circuit_data, seed_reps = _witness_fn._ctx[key]
    return jax.jit(_witness_body(circuit_data, seed_reps))


_witness_fn._ctx = {}


def seed_batch(circuit_data, pws) -> tuple[tuple, np.ndarray]:
    """Validate that every PartialWitness seeds the SAME target set (the
    wormhole/voting/recursion APIs always do — fill_targets assigns a fixed
    layout) and stack the seed values: returns (seed_reps, (B, S) u64)."""
    po = circuit_data.prover_only
    seed_reps = None
    rows = []
    for pw in pws:
        items = []
        for t, v in pw.values.items():
            rep = po.rep_of_target.get(t)
            if rep is None:
                raise KeyError(f"target {t} is not part of the circuit")
            items.append((rep, v))
        items.sort()
        reps = tuple(r for r, _ in items)
        if seed_reps is None:
            seed_reps = reps
        elif reps != seed_reps:
            raise ValueError(
                "prove_batch witnesses seed different target sets")
        rows.append(np.array([v for _, v in items], dtype=np.uint64))
    return seed_reps, np.stack(rows)


def generate_witness_device(circuit_data, pw, fetch_pis: bool = True):
    """Device witness: returns (wires_dev GF (n, W), public_inputs).

    public_inputs is numpy when ``fetch_pis`` (default), else the device
    GF — callers that dispatch further device work first can overlap the
    d2h fetch with it (plonk/prover.py does).

    The jit program is keyed on (circuit digest, seeded-rep set) — the
    wormhole/voting APIs seed the same target set every prove."""
    po = circuit_data.prover_only
    items = []
    for t, v in pw.values.items():
        rep = po.rep_of_target.get(t)
        if rep is None:
            raise KeyError(f"target {t} is not part of the circuit")
        items.append((rep, v))
    items.sort()
    seed_reps = tuple(r for r, _ in items)
    seed_vals = np.array([v for _, v in items], dtype=np.uint64)

    from ..plonk.prover import _circuit_key

    key = _circuit_key(circuit_data.common, ("wit", hash(seed_reps)))
    _witness_fn._ctx[key] = (circuit_data, seed_reps)
    try:
        fn = _witness_fn(key)
    finally:
        _witness_fn._ctx.pop(key, None)
    wires_dev, pis_dev = fn(gfd.from_u64(seed_vals))
    return wires_dev, (gfd.to_u64(pis_dev) if fetch_pis else pis_dev)
