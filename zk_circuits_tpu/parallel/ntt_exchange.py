"""Pallas RDMA stage-exchange kernels for the distributed four-step NTT.

The GSPMD formulation in ``ntt_sharded.py`` leaves the three all-to-all
transposes of the four-step (Bailey) NTT to XLA's SPMD partitioner.  This
module provides the hand-scheduled alternative the survey planned
(SURVEY.md §2.3 comm-backend row): an explicit inter-chip block exchange
written with ``pltpu.make_async_remote_copy`` — every device fires all
E−1 RDMAs *concurrently* (the ICI fabric routes non-neighbor transfers),
overlaps its own-block copy with them, and blocks only on the DMA
completion semaphores.  Unlike a GSPMD ``all-to-all`` HLO, nothing
serializes on a single fused collective: each block is an independent DMA
the hardware can schedule across both ring directions, and the kernel is
the natural place to later fuse the twiddle multiply into the receive
path.

Layout contract of the primitive (`all_to_all_blocks`): every device
holds a local ``(E, B)`` block matrix; afterwards device ``d`` holds
``out[s] = x_s[d]`` — the canonical index-exchange, i.e. a block
transpose of the global ``(E, E, B)`` tensor.  The four-step NTT
(`ntt_sharded_pallas`) composes three such exchanges with purely local
compute (the small cross-device DFT as host-constant ``mul_const``
accumulations, the length-m row NTT via ``ntt.ntt`` on the local shard),
mirroring `ntt_sharded._ntt_four_step` (same math, explicit comms).

Validated bit-exactly against the host NTT on an 8-virtual-device CPU
mesh through the Mosaic interpret machinery
(``pltpu.InterpretParams`` simulates the remote DMAs + semaphores);
on a real TPU slice the same code compiles to Mosaic with hardware RDMA.

Reference role: qp-plonky2's FFT is rayon-parallel within one host
(SURVEY.md §2.1 prover row); this is its scale-out replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..field import goldilocks as gfd
from ..field.goldilocks import GF
from ..host import gl
from ..ntt import ntt as ntt_mod
from .ntt_sharded import _dft_matrix_e, _twiddle_matrix


def _exchange_kernel(n_dev: int, axis: str):
    """out[s] = (block s of device d's input) delivered to device s, i.e.
    after the kernel device d holds out[s] = x_s[d] for every source s."""

    def kernel(x_ref, out_ref, send_sem, recv_sem, copy_sem):
        my_id = jax.lax.axis_index(axis)
        # Start-of-kernel barrier (ADVICE r4): on real hardware devices
        # enter the kernel at different times, and an early device's RDMA
        # must not land in out_ref memory a late device is still using for
        # a prior XLA op (buffer reuse).  Signal every peer we exchange
        # with on the collective barrier semaphore (scoped by this call's
        # collective_id), then wait until all n_dev-1 peers signalled us.
        barrier_sem = pltpu.get_barrier_semaphore()
        for s in range(1, n_dev):
            pltpu.semaphore_signal(
                barrier_sem,
                inc=1,
                device_id=jax.lax.rem(my_id + s, n_dev),
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
        pltpu.semaphore_wait(barrier_sem, n_dev - 1)
        # Own block: local DMA, overlapped with the remote sends below.
        local = pltpu.make_async_copy(
            x_ref.at[my_id], out_ref.at[my_id], copy_sem)
        local.start()
        handles = []
        for s in range(1, n_dev):
            dst = jax.lax.rem(my_id + s, n_dev)
            # Send block `dst` of our input into slot `my_id` of the
            # destination's output.  All n_dev-1 DMAs are in flight at
            # once; the fabric routes them over both ring directions.
            rdma = pltpu.make_async_remote_copy(
                src_ref=x_ref.at[dst],
                dst_ref=out_ref.at[my_id],
                send_sem=send_sem.at[s - 1],
                recv_sem=recv_sem.at[s - 1],
                device_id=dst,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            handles.append(rdma)
        local.wait()
        # Each wait covers our outgoing send (slot s-1) AND the incoming
        # block from device (my_id - s) — the sender used the same step
        # index, so its RDMA signals our recv_sem[s-1].
        for h in handles:
            h.wait()

    return kernel


def _interpret_params(interpret: bool):
    if not interpret:
        return False
    return pltpu.InterpretParams()


def all_to_all_blocks(x: jnp.ndarray, mesh: Mesh, axis: str,
                      interpret: bool = False,
                      collective_id: int = 0) -> jnp.ndarray:
    """Global ``(E, E, B)`` uint32 tensor, axis 0 sharded over ``axis``;
    returns the block transpose (swap of the two leading axes) computed by
    the RDMA exchange kernel.  Call from OUTSIDE shard_map."""
    n_dev = mesh.shape[axis]
    assert x.shape[0] == n_dev and x.shape[1] == n_dev

    def body(xl):
        # xl: (1, E, B) local -> (E, B)
        out = pl.pallas_call(
            _exchange_kernel(n_dev, axis),
            out_shape=jax.ShapeDtypeStruct(xl.shape[1:], xl.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((n_dev - 1,)),
                pltpu.SemaphoreType.DMA((n_dev - 1,)),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                collective_id=collective_id),
            interpret=_interpret_params(interpret),
        )(xl[0])
        return out[None]

    f = jax.shard_map(body, mesh=mesh, in_specs=P(axis, None, None),
                      out_specs=P(axis, None, None), check_vma=False)
    return f(x)


def _exchange_gf(xl: GF, n_dev: int, axis: str, interpret: bool,
                 impl: str = "pallas", collective_id: int = 0) -> GF:
    """Local-view all-to-all of a GF block matrix: xl is the LOCAL
    ``(E, B)`` limb pair inside shard_map; returns local (E, B) with
    out[s] = x_s[d].  lo/hi are packed into one (E, 2B) buffer so the
    exchange is a single set of DMAs.

    impl="pallas": the RDMA kernel (compiled Mosaic on TPU, Mosaic
    interpret simulation on CPU — the latter is minutes-slow to compile,
    so tests exercise it only at tiny device counts).
    impl="collective": semantically identical ``lax.all_to_all`` — used
    to validate the surrounding four-step math at full mesh width fast,
    and as the fallback where the Mosaic toolchain is unavailable."""
    packed = jnp.concatenate([xl.lo, xl.hi], axis=-1)
    if impl == "collective":
        out = jax.lax.all_to_all(packed, axis, split_axis=0, concat_axis=0)
    else:
        out = pl.pallas_call(
            _exchange_kernel(n_dev, axis),
            out_shape=jax.ShapeDtypeStruct(packed.shape, packed.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((n_dev - 1,)),
                pltpu.SemaphoreType.DMA((n_dev - 1,)),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                collective_id=collective_id),
            interpret=_interpret_params(interpret),
        )(packed)
    b = xl.lo.shape[-1]
    return GF(out[:, :b], out[:, b:])


def _four_step_local(xl: GF, n: int, n_dev: int, axis: str, inverse: bool,
                     interpret: bool, impl: str) -> GF:
    """Per-device body of the four-step NTT (runs inside shard_map).

    Device d enters with its contiguous coefficient slice x[d·m:(d+1)·m]
    (shape (1, m) — the leading sharded axis) and leaves with the same
    slice of the transformed vector.  Identical math to
    `ntt_sharded._ntt_four_step`, but every cross-device move is the
    explicit RDMA exchange instead of a GSPMD transpose."""
    m = n // n_dev
    bm = m // n_dev
    w_mat = _dft_matrix_e(n_dev, inverse)
    tw = _twiddle_matrix(n, n_dev, inverse)
    d = jax.lax.axis_index(axis)

    a = xl.reshape(m)                       # A[d, :] of the (E, m) matrix
    # --- exchange 1: bring the device axis local ------------------------
    blocks = a.reshape(n_dev, bm)           # block t = A[d, t·bm:(t+1)·bm]
    r = _exchange_gf(blocks, n_dev, axis, interpret, impl,
                     collective_id=0)   # r[s] = A[s, d-slice]
    at = GF(r.lo.T, r.hi.T)                 # (bm, E): rows d·bm.. of Aᵀ
    # --- small cross-device DFT (now a purely local matmul) -------------
    cols = []
    for t1 in range(n_dev):
        acc = gfd.mul_const(at[:, 0], int(w_mat[0, t1]))
        for s1 in range(1, n_dev):
            acc = gfd.add(acc, gfd.mul_const(at[:, s1], int(w_mat[s1, t1])))
        cols.append(acc)
    y_t = gfd.stack(cols, axis=1)           # (bm, E): rows d·bm.. of yᵀ
    # --- exchange 2: back to row layout y[d, :] -------------------------
    r2 = _exchange_gf(GF(y_t.lo.T, y_t.hi.T), n_dev, axis, interpret, impl,
                      collective_id=1)
    y = r2.reshape(m)                       # y[d, :]  (r2[s] = yᵀ[s-slice,d]ᵀ)
    # --- local twiddle + length-m row NTT -------------------------------
    twd = gfd.from_u64(tw)
    tw_row = GF(jnp.take(twd.lo, d, axis=0), jnp.take(twd.hi, d, axis=0))
    z = gfd.mul(y, tw_row)
    big = ntt_mod.ntt(z.reshape(1, m)).reshape(m)      # Z[d, :]
    if inverse:
        ridx = jnp.concatenate([jnp.arange(1), jnp.arange(m - 1, 0, -1)])
        big = GF(jnp.take(big.lo, ridx, axis=-1),
                 jnp.take(big.hi, ridx, axis=-1))
    # --- exchange 3: final transpose X[t1 + E·t2] = Z[t1, t2] -----------
    r3 = _exchange_gf(big.reshape(n_dev, bm), n_dev, axis, interpret, impl,
                      collective_id=2)
    # r3[t1] = Z[t1, d·bm:(d+1)·bm]; interleave to t1-minor order.
    out = GF(r3.lo.T.reshape(m), r3.hi.T.reshape(m))
    return out.reshape(1, m)


@functools.lru_cache(maxsize=None)
def _jitted_pallas_four_step(mesh: Mesh, axis: str, inverse: bool,
                             n: int, interpret: bool, impl: str):
    n_dev = mesh.shape[axis]

    def run(x: GF) -> GF:
        body = functools.partial(_four_step_local, n=n, n_dev=n_dev,
                                 axis=axis, inverse=inverse,
                                 interpret=interpret, impl=impl)
        f = jax.shard_map(body, mesh=mesh, in_specs=P(axis, None),
                          out_specs=P(axis, None), check_vma=False)
        y = f(x.reshape(n_dev, n // n_dev))
        return y.reshape(n)

    return jax.jit(run)


def ntt_sharded_pallas(x: GF, mesh: Mesh, axis: str = "x",
                       interpret: bool | None = None,
                       impl: str = "pallas") -> GF:
    """Distributed NTT of a 1-D GF array with explicit Pallas RDMA
    stage exchanges.  Drop-in equivalent of `ntt_sharded.ntt_sharded`.

    `interpret=None` auto-selects by the mesh's device platform: Mosaic
    interpret simulation on CPU meshes (tests), compiled Mosaic kernels
    on TPU."""
    n = x.shape[-1]
    n_dev = mesh.shape[axis]
    m = n // n_dev
    assert n % n_dev == 0 and m % n_dev == 0, (
        "need n divisible by E^2 for the blocked exchange")
    if interpret is None:
        interpret = next(iter(mesh.devices.flat)).platform != "tpu"
    return _jitted_pallas_four_step(mesh, axis, False, n, interpret, impl)(x)


def intt_sharded_pallas(x: GF, mesh: Mesh, axis: str = "x",
                        interpret: bool | None = None,
                        impl: str = "pallas") -> GF:
    """Distributed inverse NTT (natural order), Pallas-exchange variant."""
    n = x.shape[-1]
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0 and (n // n_dev) % n_dev == 0
    if interpret is None:
        interpret = next(iter(mesh.devices.flat)).platform != "tpu"
    y = _jitted_pallas_four_step(mesh, axis, True, n, interpret, impl)(x)
    return gfd.mul_const(y, int(gl.inverse(np.uint64(n))))
