"""The PLONK+FRI prover pipeline.

Mirrors the reference engine's prove() structure (SURVEY.md §3.2):
witness fill → wire polys → LDE+Merkle commit → Fiat–Shamir challenges →
permutation Z/partial-product polys → quotient on the 8n coset → openings
at zeta / g·zeta → FRI opening proof with PoW grinding.

Device (JAX) hot paths: wire/Z/quotient LDE + Merkle hashing (fri/oracle),
and the vanishing-polynomial evaluation over the 8n coset.  Transcript and
small polynomial algebra stay on host.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..fri import fri as frim
from ..fri.oracle import PolynomialBatch, eval_polys_at_ext
from ..hash.challenger import Challenger
from ..host import gl, gle, poseidon as hposeidon
from ..iop.witness import PartialWitness, generate_witness
from ..ntt import ntt as nttm
from . import algebra
from .proof import OpeningSet, Proof, ProofWithPublicInputs
from .vanishing import VanishingVars, check_constraints_on_h, eval_vanishing

# Circuits below this LDE size evaluate the quotient on host (JIT overhead
# dominates); above it, on device.
_DEVICE_QUOTIENT_MIN_LDE = 1 << 14


def _default_use_device(common) -> bool:
    """Device path only on a real accelerator.  On the CPU backend the
    "device" path is XLA emulating u64 field ops on u32 limb pairs — far
    slower than the native C++ host golden model, and the virtual-device
    test meshes force it explicitly where sharding must be exercised.
    ``ZKT_FORCE_DEVICE=1`` overrides both gates (testing / profiling)."""
    import os

    import jax

    if os.environ.get("ZKT_FORCE_DEVICE"):
        return True
    return (jax.default_backend() == "tpu"
            and common.lde_size >= _DEVICE_QUOTIENT_MIN_LDE)


def _prefix_prod_exclusive(ratios: np.ndarray) -> np.ndarray:
    """Exclusive modular prefix product along the last axis (Z[0] = 1)."""
    a = ratios.copy()
    n = a.shape[-1]
    shift = 1
    while shift < n:
        a[..., shift:] = gl.mul(a[..., shift:], a[..., :-shift])
        shift *= 2
    out = np.empty_like(a)
    out[..., 0] = 1
    out[..., 1:] = a[..., :-1]
    return out


def compute_zs_and_partial_products(common, prover_only, wires: np.ndarray,
                                    betas, gammas):
    """Permutation-argument polynomials.

    wires: (n, num_wires).  Returns values matrix (num_polys, n) ordered
    [Z_0, Z_1, pp_0 (num_pp), pp_1 (num_pp)]."""
    cfg = common.config
    n = common.degree
    num_routed = cfg.num_routed_wires
    q = common.quotient_degree_factor
    num_pp = common.num_partial_products
    x = prover_only.subgroup  # (n,)
    sigmas = prover_only.sigmas_values  # (num_routed, n)
    w = wires.T[:num_routed]  # (num_routed, n)

    zs, pps = [], []
    for c in range(cfg.num_challenges):
        beta = np.uint64(betas[c])
        gamma = np.uint64(gammas[c])
        kx = gl.mul(common.k_is[:, None], x[None, :])
        nums = gl.add(w, gl.add(gl.mul(beta, kx), gamma))       # (80, n)
        dens = gl.add(w, gl.add(gl.mul(beta, sigmas), gamma))   # (80, n)
        # chunk products (num_chunks, n)
        num_chunks = (num_routed + q - 1) // q
        cn = np.empty((num_chunks, n), dtype=np.uint64)
        cd = np.empty((num_chunks, n), dtype=np.uint64)
        for t in range(num_chunks):
            lo, hi = t * q, min((t + 1) * q, num_routed)
            pn = nums[lo]
            pd = dens[lo]
            for j in range(lo + 1, hi):
                pn = gl.mul(pn, nums[j])
                pd = gl.mul(pd, dens[j])
            cn[t] = pn
            cd[t] = pd
        cd_inv = gl.inverse(cd)
        ratios = gl.mul(cn, cd_inv)  # (num_chunks, n)
        total = ratios[0]
        for t in range(1, num_chunks):
            total = gl.mul(total, ratios[t])
        z = _prefix_prod_exclusive(total)
        # permutation argument consistency (witness validity)
        if int(gl.mul(z[-1], total[-1])) != 1:
            raise ValueError("permutation argument product != 1 (invalid witness)")
        # partial products: p_t = Z * prod_{tau<=t} ratio_tau, t < num_pp
        p = z.copy()
        pp_c = np.empty((num_pp, n), dtype=np.uint64)
        for t in range(num_pp):
            p = gl.mul(p, ratios[t])
            pp_c[t] = p
        zs.append(z)
        pps.append(pp_c)
    values = np.concatenate([np.stack(zs), np.concatenate(pps, axis=0)], axis=0)
    return values


def _device_vanishing_eval(common, cs_lde, wires_lde, zsp_lde, x, l1,
                           pi_hash, betas, gammas, alphas):
    """Trace-time body: vanishing-polynomial evaluation over the 8n coset
    on device GF arrays (shared by the standalone and the fused-commit
    quotient programs)."""
    import jax.numpy as jnp

    from ..field.goldilocks import GF

    alg = algebra.DEVICE_BASE
    cfg = common.config
    s = common.num_selectors
    c = cfg.num_constants
    num_pp = common.num_partial_products

    def roll_rows(a, k):
        return GF(jnp.roll(a.lo, -k, axis=0), jnp.roll(a.hi, -k, axis=0))

    zsp_next = roll_rows(zsp_lde, 1 << cfg.rate_bits)
    vv = VanishingVars(
        x=x,
        wires=wires_lde,
        selectors=cs_lde[:, :s],
        constants=cs_lde[:, s : s + c],
        sigmas=cs_lde[:, s + c :],
        zs=[zsp_lde[:, i] for i in range(cfg.num_challenges)],
        zs_next=[zsp_next[:, i] for i in range(cfg.num_challenges)],
        partial_products=[
            zsp_lde[:, cfg.num_challenges + ch * num_pp : cfg.num_challenges + (ch + 1) * num_pp]
            for ch in range(cfg.num_challenges)
        ],
        l1=l1,
        pi_hash=pi_hash,
        betas=[betas[i] for i in range(cfg.num_challenges)],
        gammas=[gammas[i] for i in range(cfg.num_challenges)],
        alphas=[alphas[i] for i in range(cfg.num_challenges)],
    )
    return eval_vanishing(alg, common, vv)


def _circuit_key(common, *extra):
    """Stable cache key for jitted per-circuit programs: the transcript's
    circuit digest (collision-resistant) + shape bits, NOT id(common) —
    id() can be reused after gc, silently returning another circuit's
    compiled program (ADVICE r3)."""
    return (tuple(int(x) for x in common.circuit_digest),
            common.degree_bits, *extra)


@lru_cache(maxsize=8)
def _device_quotient_fn(key):
    """jit-compiled coset vanishing evaluation; key = static circuit identity."""
    import jax

    common = _device_quotient_fn._common[key]

    def run(cs_lde, wires_lde, zsp_lde, x, l1, pi_hash, betas, gammas, alphas):
        return _device_vanishing_eval(common, cs_lde, wires_lde, zsp_lde,
                                      x, l1, pi_hash, betas, gammas, alphas)

    return jax.jit(run)


_device_quotient_fn._common = {}


def _quotient_commit_body(common, blinding):
    """Traced body of the fused quotient program — shared by the
    single-proof jit below and the batched vmap (prover_batch)."""
    from ..field import goldilocks as gfd
    from ..field.goldilocks import GF
    from ..hash import merkle as merklem

    cfg = common.config
    n = common.degree
    # Circuit-constant coset columns baked into the program.
    x_h, l1_h, zh_inv_h = coset_domain_columns(common)
    x_c = gfd.from_u64(x_h)
    l1_c = gfd.from_u64(l1_h)
    zh_inv_c = gfd.from_u64(zh_inv_h)

    def run(cs_vals, wires_vals, zsp_vals, pi_hash, betas, gammas, alphas,
            salts):
        # inputs arrive COLUMN-MAJOR (num_polys, 8n) — the commit's natural
        # residency; transpose here, inside the fused program, where XLA
        # schedules it (the commit itself no longer materializes rows)
        cs_lde = GF(cs_vals.lo.T, cs_vals.hi.T)
        wires_lde = GF(wires_vals.lo.T, wires_vals.hi.T)
        zsp_lde = GF(zsp_vals.lo.T, zsp_vals.hi.T)
        vans = _device_vanishing_eval(common, cs_lde, wires_lde, zsp_lde,
                                      x_c, l1_c, pi_hash, betas, gammas, alphas)
        chunks = []
        for c in range(cfg.num_challenges):
            qv = gfd.mul(vans[c], zh_inv_c)
            qc = nttm.coset_intt(qv)  # (8n,) coefficients
            for t in range(common.quotient_degree_factor):
                chunks.append(GF(qc.lo[t * n : (t + 1) * n],
                                 qc.hi[t * n : (t + 1) * n]))
        coeffs = gfd.stack(chunks, axis=0)
        if blinding:
            coeffs = gfd.concatenate([coeffs, salts], axis=0)
        values = nttm.lde(coeffs, cfg.rate_bits)
        levels = merklem.device_merkle_levels_values(
            values, cfg.fri_config.cap_height)
        return coeffs, values, levels

    return run


@lru_cache(maxsize=8)
def _device_quotient_commit_fn(key):
    """Fused quotient program (VERDICT r2 item 1): vanishing eval over the
    8n coset -> divide by Z_H -> coset INTT -> chunk split (+ salts) -> LDE
    -> Merkle levels, all in ONE jitted device program.  The quotient
    coefficients never leave HBM (openings read them via fri_device).
    Reference structure: SURVEY.md §3.2 steps 6."""
    import jax

    common, blinding = _device_quotient_commit_fn._common[key]
    return jax.jit(_quotient_commit_body(common, blinding))


_device_quotient_commit_fn._common = {}


@lru_cache(maxsize=8)
def _device_wires_coeffs_fn(num_polys: int, n: int, blinding: bool):
    """values (num_polys, n) on device -> coefficients (+ deterministic
    salt polys when blinding); the LDE+Merkle commit then reuses the
    already-compiled oracle._device_commit_fn for this shape."""
    import jax

    from ..field import goldilocks as gfd
    from ..fri.oracle import _deterministic_salt_polys

    salts_np = _deterministic_salt_polys(n, 4) if blinding else None

    def run(values_t: "gfd.GF"):
        coeffs = nttm.intt(values_t)
        if salts_np is not None:
            coeffs = gfd.concatenate([coeffs, gfd.from_u64(salts_np)], axis=0)
        return coeffs

    return jax.jit(run)


def _zs_coeffs_body(common, sigmas_np, subgroup_np):
    """Traced body of the permutation-argument program — shared by the
    single-proof jit below and the batched vmap (prover_batch)."""
    import jax

    from ..field import goldilocks as gfd
    from ..field.goldilocks import GF
    from ..fri.oracle import _deterministic_salt_polys

    cfg = common.config
    n = common.degree
    q = common.quotient_degree_factor
    num_routed = cfg.num_routed_wires
    assert num_routed % q == 0
    num_chunks = num_routed // q
    num_pp = common.num_partial_products
    blinding = cfg.zero_knowledge
    salts_np = _deterministic_salt_polys(n, 4) if blinding else None
    k_np = np.asarray(common.k_is, dtype=np.uint64)

    def bcast(s: GF) -> GF:
        return GF(s.lo[None, None], s.hi[None, None])

    def row(a: GF, i: int) -> GF:
        return GF(a.lo[i], a.hi[i])

    def run(wire_coeffs: GF, betas: GF, gammas: GF):
        import jax.numpy as jnp

        sig = gfd.from_u64(sigmas_np)                      # (80, n) const
        x = gfd.from_u64(subgroup_np)                      # (n,) const
        k = gfd.from_u64(k_np)                             # (80,) const
        wvals = nttm.ntt(GF(wire_coeffs.lo[:num_routed],
                            wire_coeffs.hi[:num_routed]))  # (80, n)
        kx = gfd.mul(GF(k.lo[:, None], k.hi[:, None]),
                     GF(x.lo[None, :], x.hi[None, :]))     # (80, n)
        polys = []
        pps_all = []
        finals = []
        for c in range(cfg.num_challenges):
            beta = bcast(row(betas, c))
            gamma = bcast(row(gammas, c))
            nums = gfd.add(wvals, gfd.add(gfd.mul(kx, beta), gamma))
            dens = gfd.add(wvals, gfd.add(gfd.mul(sig, beta), gamma))
            nums = nums.reshape(num_chunks, q, n)
            dens = dens.reshape(num_chunks, q, n)
            cn = GF(nums.lo[:, 0], nums.hi[:, 0])
            cd = GF(dens.lo[:, 0], dens.hi[:, 0])
            for j in range(1, q):
                cn = gfd.mul(cn, GF(nums.lo[:, j], nums.hi[:, j]))
                cd = gfd.mul(cd, GF(dens.lo[:, j], dens.hi[:, j]))
            ratios = gfd.mul(cn, gfd.inverse(cd))          # (num_chunks, n)
            total = row(ratios, 0)
            for t in range(1, num_chunks):
                total = gfd.mul(total, row(ratios, t))
            s = jax.lax.associative_scan(gfd.mul, total)   # inclusive (n,)
            finals.append(GF(s.lo[-1:], s.hi[-1:]))
            one = gfd.ones(1)
            z = GF(jnp.concatenate([one.lo, s.lo[:-1]]),
                   jnp.concatenate([one.hi, s.hi[:-1]]))
            polys.append(z)
            p = z
            pps = []
            for t in range(num_pp):
                p = gfd.mul(p, row(ratios, t))
                pps.append(p)
            pps_all.extend(pps)
        values = gfd.stack(polys + pps_all, axis=0)        # (nc + nc*pp, n)
        coeffs = nttm.intt(values)
        if blinding:
            coeffs = gfd.concatenate([coeffs, gfd.from_u64(salts_np)], axis=0)
        # Second output: the closing value of each challenge's running
        # product — must be 1 for a valid witness (checked host-side).
        return coeffs, gfd.concatenate(finals, axis=0)
        # NB: the LDE+Merkle commit is NOT fused here on purpose — it runs
        # through oracle._device_commit_fn, whose jit (with the Pallas
        # sponge) is already compiled+cached for this shape by the wires/
        # quotient paths; fusing it would recompile the sponge per program.

    return run


@lru_cache(maxsize=8)
def _device_zs_commit_fn(key):
    """Device permutation-argument pipeline: wire values on H (NTT of the
    committed coefficients) -> nums/dens -> chunk products -> exclusive
    prefix product (associative scan) -> partial products -> INTT ->
    (+ salts) -> LDE -> Merkle, one jitted program.  Replaces the host
    numpy compute_zs_and_partial_products + h2d on the device path
    (~0.6 s/prove on the tunneled chip).  Bit-exact with the host path
    (multiplication mod p is associative, so scan order is immaterial)."""
    import jax

    common, sigmas_np, subgroup_np = _device_zs_commit_fn._ctx[key]
    return jax.jit(_zs_coeffs_body(common, sigmas_np, subgroup_np))


_device_zs_commit_fn._ctx = {}


def compute_quotient_values(common, cs_lde, wires_lde, zsp_lde, x, l1, pi_hash,
                            betas, gammas, alphas, use_device: bool):
    cfg = common.config
    if use_device:
        from ..field import goldilocks as gfd

        def _dev(a):
            return a if isinstance(a, gfd.GF) else gfd.from_u64(a)

        key = _circuit_key(common)
        _device_quotient_fn._common[key] = common
        from ..utils.profiling import stage_timer

        try:
            fn = _device_quotient_fn(key)
        finally:
            # The factory reads _common at compile time only; drop the
            # entry so this dict never pins circuit data (ADVICE r3).
            _device_quotient_fn._common.pop(key, None)
        with stage_timer("quotient/device_dispatch"):
            out = fn(
                _dev(cs_lde),
                _dev(wires_lde),
                _dev(zsp_lde),
                gfd.from_u64(x),
                gfd.from_u64(l1),
                gfd.from_u64(pi_hash),
                gfd.from_u64(np.array(betas, dtype=np.uint64).reshape(-1, 1)),
                gfd.from_u64(np.array(gammas, dtype=np.uint64).reshape(-1, 1)),
                gfd.from_u64(np.array(alphas, dtype=np.uint64).reshape(-1, 1)),
            )
            for v in out:
                v.lo.block_until_ready()
        with stage_timer("quotient/d2h"):
            return [gfd.to_u64(v) for v in out]
    from ..field import goldilocks as gfd

    def _np(a):
        return gfd.to_u64(a) if isinstance(a, gfd.GF) else a

    cs_lde, wires_lde, zsp_lde = _np(cs_lde), _np(wires_lde), _np(zsp_lde)
    alg = algebra.HOST_BASE
    s = common.num_selectors
    c = cfg.num_constants
    num_pp = common.num_partial_products
    rate = 1 << cfg.rate_bits
    zsp_next = np.roll(zsp_lde, -rate, axis=0)
    vv = VanishingVars(
        x=x,
        wires=wires_lde,
        selectors=cs_lde[:, :s],
        constants=cs_lde[:, s : s + c],
        sigmas=cs_lde[:, s + c :],
        zs=[zsp_lde[:, i] for i in range(cfg.num_challenges)],
        zs_next=[zsp_next[:, i] for i in range(cfg.num_challenges)],
        partial_products=[
            zsp_lde[:, cfg.num_challenges + ch * num_pp : cfg.num_challenges + (ch + 1) * num_pp]
            for ch in range(cfg.num_challenges)
        ],
        l1=l1,
        pi_hash=pi_hash,
        betas=[np.uint64(b) for b in betas],
        gammas=[np.uint64(g) for g in gammas],
        alphas=[np.uint64(a) for a in alphas],
    )
    return eval_vanishing(alg, common, vv)


def coset_domain_columns(common):
    """x values, L1(x), and 1/Z_H(x) over the 8n coset (host precompute)."""
    n = common.degree
    lde_size = common.lde_size
    g = gl.MULTIPLICATIVE_GROUP_GENERATOR
    x = gl.mul(
        np.uint64(g),
        gl.powers(gl.primitive_root_of_unity(common.degree_bits + common.config.rate_bits), lde_size),
    )
    # Z_H(x) = x^n - 1 is 8-periodic on the coset: x^n = g^n * w_8^i.
    rate = 1 << common.config.rate_bits
    gn = pow(g, n, gl.P_INT)
    w8 = gl.primitive_root_of_unity(common.config.rate_bits)
    zh_short = np.array(
        [(gn * pow(w8, i, gl.P_INT) - 1) % gl.P_INT for i in range(rate)], dtype=np.uint64
    )
    zh = np.tile(zh_short, lde_size // rate)
    zh_inv = np.tile(gl.inverse(zh_short), lde_size // rate)
    # L1(x) = (x^n - 1) / (n * (x - 1))
    denom = gl.mul(np.uint64(n), gl.sub(x, np.uint64(1)))
    l1 = gl.mul(zh, gl.inverse(denom))
    return x, l1, zh_inv


def _resolve_check_witness(check_witness: bool | None) -> bool:
    """Witness re-checking (every gate constraint re-evaluated on H on host)
    is a debugging aid, opt-in like the reference (whose prove() does not
    re-check constraints): pass check_witness=True or set ZKT_CHECK_WITNESS=1."""
    import os

    if check_witness is None:
        return bool(os.environ.get("ZKT_CHECK_WITNESS"))
    return check_witness


def _log_prove_path(common, use_device: bool) -> None:
    """One line per prove stating which compute path ran, so silent host
    fallbacks (VERDICT r2 weak #7) are visible.  INFO level; also printed
    under ZKT_TIMING."""
    import logging
    import os

    from .. import native

    path = "device" if use_device else ("host-native" if native.available() else "host-numpy")
    msg = (f"prove path={path} degree=2^{common.degree_bits} "
           f"lde=2^{common.degree_bits + common.config.rate_bits}")
    logging.getLogger("zk_circuits_tpu").info(msg)
    if os.environ.get("ZKT_TIMING"):
        print(f"[zkt] {msg}", flush=True)


def prove(circuit_data, pw: PartialWitness, check_witness: bool | None = None,
          use_device: bool | None = None) -> ProofWithPublicInputs:
    import os
    import time as _time

    check_witness = _resolve_check_witness(check_witness)
    _dbg = os.environ.get("ZKT_TIMING")
    _t0 = _time.perf_counter()

    def _mark(stage: str):
        nonlocal _t0
        from ..utils import profiling

        now = _time.perf_counter()
        profiling._TIMINGS[f"prove/{stage}"].append(now - _t0)
        if _dbg:
            print(f"[prove] {stage}: {now - _t0:.2f}s", flush=True)
        _t0 = now

    common = circuit_data.common
    po = circuit_data.prover_only
    cfg = common.config
    n = common.degree
    cap_h = cfg.fri_config.cap_height
    if use_device is None:
        use_device = _default_use_device(common)
    _log_prove_path(common, use_device)

    # 1. witness — on DEVICE when the schedule supports it and constraint
    # re-checking is off (the default; mirrors the reference's production
    # prove()).  Kills both the host numpy passes and the ~9 MB wire-matrix
    # h2d (BENCH_STAGES_WARM r4: together ~0.8 s of the 2.1 s warm prove).
    wires_dev = pis_dev = None
    if use_device and not check_witness:
        from ..iop import witness_device as wdev

        if wdev.supported(circuit_data):
            try:
                wires_dev, pis_dev = wdev.generate_witness_device(
                    circuit_data, pw, fetch_pis=False)
            except Exception as e:  # compile failure -> host witness
                import logging

                logging.getLogger("zk_circuits_tpu").warning(
                    "device witness program failed (%s); host fallback", e)
    if wires_dev is None:
        wires, public_inputs = generate_witness(circuit_data, pw)
        pi_hash = (hposeidon.hash_no_pad(public_inputs)
                   if len(public_inputs) else np.zeros(4, np.uint64))
        if check_witness:
            check_constraints_on_h(common, po, wires, pi_hash)
    _mark("witness+check")

    # 2. commit wires
    if wires_dev is not None:
        from ..field import goldilocks as gfd
        from ..fri.oracle import _device_commit_fn

        cfn = _device_wires_coeffs_fn(cfg.num_wires, n, cfg.zero_knowledge)
        coeffs_dev = cfn(gfd.GF(wires_dev.lo.T, wires_dev.hi.T))
        commit_fn = _device_commit_fn(
            coeffs_dev.lo.shape[0], n, cfg.rate_bits, cap_h)
        vals_d, levels_d = commit_fn(coeffs_dev)
        # fetch the PIs only now — the d2h overlaps the commit dispatch
        public_inputs = gfd.to_u64(pis_dev)
        pi_hash = (hposeidon.hash_no_pad(public_inputs)
                   if len(public_inputs) else np.zeros(4, np.uint64))
        wires_commitment = PolynomialBatch(
            None, cfg.rate_bits, cfg.zero_knowledge, cap_h,
            values_dev=vals_d, levels_dev=levels_d, coeffs_dev=coeffs_dev)
    else:
        wires_commitment = PolynomialBatch.from_values(
            np.ascontiguousarray(wires.T), cfg.rate_bits, cap_h,
            blinding=cfg.zero_knowledge, use_device=use_device,
        )

    # 3. challenges: betas, gammas
    ch = Challenger()
    ch.observe_hash(circuit_data.verifier_only.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(wires_commitment.cap)
    betas = ch.get_n_challenges(cfg.num_challenges)
    _mark("wires commit+challenges")
    gammas = ch.get_n_challenges(cfg.num_challenges)

    # 4. permutation polynomials
    if use_device and wires_commitment.coeffs_dev is not None:
        from ..field import goldilocks as gfd
        from ..fri.oracle import _device_commit_fn

        zkey = _circuit_key(common, cfg.zero_knowledge)
        _device_zs_commit_fn._ctx[zkey] = (
            common, po.sigmas_values, po.subgroup)
        try:
            zfn = _device_zs_commit_fn(zkey)
        finally:
            _device_zs_commit_fn._ctx.pop(zkey, None)
        zs_coeffs_dev, zs_final = zfn(
            wires_commitment.coeffs_dev,
            gfd.from_u64(np.array(betas, dtype=np.uint64)),
            gfd.from_u64(np.array(gammas, dtype=np.uint64)),
        )
        if check_witness:
            # Mirror the host path's permutation-argument validity check
            # (compute_zs_and_partial_products): the running product over
            # the whole subgroup must close to 1, else the witness violates
            # a copy constraint and the proof would be unverifiable.
            final = gfd.to_u64(zs_final)
            if not np.all(final == 1):
                raise ValueError(
                    "invalid witness: permutation argument does not close "
                    f"(final running products {final.tolist()} != 1)")
        commit_fn = _device_commit_fn(
            zs_coeffs_dev.lo.shape[0], n, cfg.rate_bits, cap_h)
        zs_vals, zs_levels = commit_fn(zs_coeffs_dev)
        zsp_commitment = PolynomialBatch(
            None, cfg.rate_bits, cfg.zero_knowledge, cap_h,
            values_dev=zs_vals, levels_dev=zs_levels,
            coeffs_dev=zs_coeffs_dev,
        )
    else:
        zsp_values = compute_zs_and_partial_products(common, po, wires,
                                                     betas, gammas)
        zsp_commitment = PolynomialBatch.from_values(
            zsp_values, cfg.rate_bits, cap_h,
            blinding=cfg.zero_knowledge, use_device=use_device,
        )
    ch.observe_cap(zsp_commitment.cap)
    _mark("zs+partial products commit")
    alphas = ch.get_n_challenges(cfg.num_challenges)

    # 5. quotient on the 8n coset
    if use_device:
        from ..field import goldilocks as gfd
        from ..fri.fri_device import open_and_fri_device
        from ..fri.oracle import _deterministic_salt_polys

        cs_commit = po.constants_sigmas_commitment.ensure_device()
        key = _circuit_key(common, cfg.zero_knowledge)
        _device_quotient_commit_fn._common[key] = (common, cfg.zero_knowledge)
        try:
            fn = _device_quotient_commit_fn(key)
        finally:
            _device_quotient_commit_fn._common.pop(key, None)
        salts = (gfd.from_u64(_deterministic_salt_polys(n, 4))
                 if cfg.zero_knowledge else gfd.zeros((0, n)))
        q_coeffs_dev, q_vals, q_levels = fn(
            cs_commit.values_for_eval(),
            wires_commitment.values_for_eval(),
            zsp_commitment.values_for_eval(),
            gfd.from_u64(pi_hash.reshape(1, 4)),
            gfd.from_u64(np.array(betas, dtype=np.uint64).reshape(-1, 1)),
            gfd.from_u64(np.array(gammas, dtype=np.uint64).reshape(-1, 1)),
            gfd.from_u64(np.array(alphas, dtype=np.uint64).reshape(-1, 1)),
            salts,
        )
        quotient_commitment = PolynomialBatch(
            None, cfg.rate_bits, cfg.zero_knowledge, cap_h,
            values_dev=q_vals, levels_dev=q_levels, coeffs_dev=q_coeffs_dev,
        )
        ch.observe_cap(quotient_commitment.cap)
        _mark("quotient eval+commit (fused)")
        oracles = [cs_commit, wires_commitment, zsp_commitment,
                   quotient_commitment]
        openings, opening_proof = open_and_fri_device(common, oracles, ch)
        _mark("openings+fri (device)")
    else:
        x, l1, zh_inv = coset_domain_columns(common)
        _mark("coset domain")
        vanishing = compute_quotient_values(
            common,
            po.constants_sigmas_commitment.leaves_for_eval(),
            wires_commitment.leaves_for_eval(),
            zsp_commitment.leaves_for_eval(),
            x, l1, pi_hash.reshape(1, 4),
            betas, gammas, alphas,
            use_device,
        )
        quotient_chunks = []
        _mark("quotient eval")
        for c in range(cfg.num_challenges):
            qv = gl.mul(vanishing[c], zh_inv)
            qc = nttm.host_coset_intt(qv)  # (8n,) coefficients
            for t in range(common.quotient_degree_factor):
                quotient_chunks.append(qc[t * n : (t + 1) * n])
        quotient_commitment = PolynomialBatch.from_coeffs(
            np.stack(quotient_chunks), cfg.rate_bits, cap_h,
            blinding=cfg.zero_knowledge, use_device=use_device,
        )
        ch.observe_cap(quotient_commitment.cap)
        _mark("quotient commit")

        oracles = [
            po.constants_sigmas_commitment,
            wires_commitment,
            zsp_commitment,
            quotient_commitment,
        ]
        openings, opening_proof = _open_and_fri(common, oracles, ch)
        _mark("openings+fri")

    proof = Proof(
        wires_cap=wires_commitment.cap.copy(),
        zs_partial_products_cap=zsp_commitment.cap.copy(),
        quotient_cap=quotient_commitment.cap.copy(),
        openings=openings,
        opening_proof=opening_proof,
    )
    return ProofWithPublicInputs(proof, public_inputs)


def _open_and_fri(common, oracles, ch: Challenger):
    """Steps 6-7 of SURVEY.md §3.2: draw zeta, open all oracles at zeta and
    g*zeta, compose the FRI quotient, and run the FRI opening proof."""
    from ..utils.profiling import stage_timer

    cfg = common.config
    n = common.degree
    zeta = ch.get_extension_challenge()

    g_ext = np.array([gl.primitive_root_of_unity(common.degree_bits), 0], dtype=np.uint64)
    zeta_next = gle.mul(zeta, g_ext)
    with stage_timer("fri/openings_eval"):
        openings = OpeningSet(
            constants_sigmas=oracles[0].eval_at_ext(zeta),
            wires=oracles[1].eval_at_ext(zeta),
            zs_partial_products=oracles[2].eval_at_ext(zeta),
            quotient=oracles[3].eval_at_ext(zeta),
            zs_next=eval_polys_at_ext(oracles[2].coeffs[: cfg.num_challenges], zeta_next),
        )
    ch.observe_extension_elements(openings.batch0_flat())
    ch.observe_extension_elements(openings.batch1_flat())
    alpha = ch.get_extension_challenge()

    # FRI composition: batch 0 at zeta (all polys), batch 1 at g*zeta (Zs)
    with stage_timer("fri/compose"):
        batch0_coeffs = np.concatenate([o.coeffs for o in oracles], axis=0)  # (k, n)
        comp0 = _reduce_with_alpha(batch0_coeffs, alpha)
        q0 = frim.divide_by_linear(comp0, zeta)
        comp1 = _reduce_with_alpha(oracles[2].coeffs[: cfg.num_challenges], alpha)
        q1 = frim.divide_by_linear(comp1, zeta_next)
        shift_pow = gle.powmod(alpha, cfg.num_challenges)
        final = np.zeros((n, 2), dtype=np.uint64)
        m0 = q0.shape[0]
        final[:m0] = gle.add(
            np.pad(q1, ((0, m0 - q1.shape[0]), (0, 0))),
            gle.mul(np.broadcast_to(shift_pow, (m0, 2)), q0),
        )

    opening_proof = frim.fri_prove(
        oracles, final, common.degree_bits, cfg.fri_config, ch
    )
    return openings, opening_proof


def _batch_pool(B: int):
    """Thread pool for the per-proof host stages of prove_batch (witness
    generation, Z/partial products, quotient INTT, openings+FRI — all
    numpy/native work that releases the GIL).  This replaces the
    reference's rayon per-chunk fan-out (tree.rs:92-103) on the host side;
    the device commits are already batched into single sharded programs.
    ``ZKT_BATCH_THREADS`` overrides (0/1 = sequential); default = CPU count.
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    env = os.environ.get("ZKT_BATCH_THREADS")
    workers = int(env) if env else (os.cpu_count() or 1)
    workers = max(1, min(workers, B))
    if workers == 1:
        return None
    return ThreadPoolExecutor(max_workers=workers)


def _pmap_host(pool, fn, n: int) -> list:
    """Ordered map of fn(i) for i in range(n) over the batch pool."""
    if pool is None:
        return [fn(i) for i in range(n)]
    return list(pool.map(fn, range(n)))


def prove_batch(circuit_data, pws: list, mesh=None,
                check_witness: bool | None = None,
                use_device: bool | None = None) -> list:
    """Prove ``B`` independent witnesses of the SAME circuit, batching the
    device hot paths (wire / Z / quotient commits — SURVEY.md §3.2 steps
    2-6) into single jitted calls with the batch axis sharded over ``mesh``.

    This is the TPU-native replacement for the reference aggregator's rayon
    ``par_chunks`` fan-out (wormhole/aggregator/src/circuits/tree.rs:92-103):
    instead of threads each proving one chunk, every chunk's polynomial
    commitments run as ONE device computation data-parallel across chips,
    and the remaining per-proof host stages fan out over a thread pool
    (VERDICT r2 item 5).  Proof bytes are identical to sequential
    :func:`prove` (deterministic ``no_random`` mode).

    Returns a list of ProofWithPublicInputs, one per witness.
    """
    from ..fri.oracle import batch_from_values, batch_from_coeffs

    common = circuit_data.common
    po = circuit_data.prover_only
    cfg = common.config
    n = common.degree
    cap_h = cfg.fri_config.cap_height
    check_witness = _resolve_check_witness(check_witness)
    if use_device is None:
        use_device = _default_use_device(common)
    _log_prove_path(common, use_device)
    B = len(pws)
    if B == 0:
        return []

    if use_device:
        if B == 1:
            # A 1-proof "batch" (e.g. the aggregation root chunk) reuses
            # the single-prove programs instead of compiling B=1 variants
            # of every batched stage (bytes are identical either way).
            return [prove(circuit_data, pws[0], check_witness=check_witness,
                          use_device=True)]
        # Round-5 path: the ENTIRE pipeline batched on device with one
        # packed d2h per transcript stage (prover_batch module) — the r4
        # host-stage mix below was ~3x slower per proof than sequential
        # device proves (VERDICT r4 weak #1).
        from .prover_batch import prove_batch_device

        return prove_batch_device(circuit_data, pws, mesh=mesh,
                                  check_witness=check_witness)

    pool = _batch_pool(B)

    # 1. witnesses (host, per proof, threaded)
    wits = _pmap_host(pool, lambda b: generate_witness(circuit_data, pws[b]), B)
    pi_hashes = [
        hposeidon.hash_no_pad(pis) if len(pis) else np.zeros(4, np.uint64)
        for _, pis in wits
    ]
    if check_witness:
        for (wires, _), pih in zip(wits, pi_hashes):
            check_constraints_on_h(common, po, wires, pih)

    # 2. batched wire commit: (B, num_wires, n), batch axis over the mesh
    wires_values = np.stack([np.ascontiguousarray(w.T) for w, _ in wits])
    wires_commits = batch_from_values(
        wires_values, cfg.rate_bits, cap_h,
        blinding=cfg.zero_knowledge, mesh=mesh, use_device=use_device,
    )

    # 3. per-proof transcripts -> betas/gammas; Z/partial-product values
    chs, betas_l, gammas_l = [], [], []
    for b in range(B):
        ch = Challenger()
        ch.observe_hash(circuit_data.verifier_only.circuit_digest)
        ch.observe_hash(pi_hashes[b])
        ch.observe_cap(wires_commits[b].cap)
        betas_l.append(ch.get_n_challenges(cfg.num_challenges))
        gammas_l.append(ch.get_n_challenges(cfg.num_challenges))
        chs.append(ch)
    zsp_values = np.stack(_pmap_host(
        pool,
        lambda b: compute_zs_and_partial_products(common, po, wits[b][0],
                                                  betas_l[b], gammas_l[b]),
        B,
    ))

    # 4. batched Z/partial-product commit
    zsp_commits = batch_from_values(
        zsp_values, cfg.rate_bits, cap_h,
        blinding=cfg.zero_knowledge, mesh=mesh, use_device=use_device,
    )
    alphas_l = []
    for b in range(B):
        chs[b].observe_cap(zsp_commits[b].cap)
        alphas_l.append(chs[b].get_n_challenges(cfg.num_challenges))

    # 5. quotient on the 8n coset (per proof), then one batched commit
    x, l1, zh_inv = coset_domain_columns(common)

    def _quotient_coeffs(b):
        vanishing = compute_quotient_values(
            common,
            po.constants_sigmas_commitment.leaves_for_eval(),
            wires_commits[b].leaves_for_eval(),
            zsp_commits[b].leaves_for_eval(),
            x, l1, pi_hashes[b].reshape(1, 4),
            betas_l[b], gammas_l[b], alphas_l[b],
            use_device,
        )
        chunks = []
        for c in range(cfg.num_challenges):
            qv = gl.mul(vanishing[c], zh_inv)
            qc = nttm.host_coset_intt(qv)
            for t in range(common.quotient_degree_factor):
                chunks.append(qc[t * n : (t + 1) * n])
        return np.stack(chunks)

    # Device dispatches serialize on the chip — thread only the host path.
    quotient_coeffs = _pmap_host(None if use_device else pool,
                                 _quotient_coeffs, B)
    quotient_commits = batch_from_coeffs(
        np.stack(quotient_coeffs), cfg.rate_bits, cap_h,
        blinding=cfg.zero_knowledge, mesh=mesh, use_device=use_device,
    )

    # 6-7. per-proof openings + FRI (host transcript work, threaded)
    def _finish(b):
        chs[b].observe_cap(quotient_commits[b].cap)
        oracles = [
            po.constants_sigmas_commitment,
            wires_commits[b],
            zsp_commits[b],
            quotient_commits[b],
        ]
        openings, opening_proof = _open_and_fri(common, oracles, chs[b])
        proof = Proof(
            wires_cap=wires_commits[b].cap.copy(),
            zs_partial_products_cap=zsp_commits[b].cap.copy(),
            quotient_cap=quotient_commits[b].cap.copy(),
            openings=openings,
            opening_proof=opening_proof,
        )
        return ProofWithPublicInputs(proof, wits[b][1])

    out = _pmap_host(pool, _finish, B)
    if pool is not None:
        pool.shutdown()
    return out


def _reduce_with_alpha(coeffs: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """Σ_i alpha^i * P_i over base-coeff polys (k, n) -> ext coeffs (n, 2)."""
    from ..fri.oracle import ext_powers

    k, n = coeffs.shape
    apow = ext_powers(alpha, k)  # (k, 2)
    c0 = gl.sum_mod(gl.mul(coeffs, apow[:, None, 0]), axis=0)
    c1 = gl.sum_mod(gl.mul(coeffs, apow[:, None, 1]), axis=0)
    return np.stack([c0, c1], axis=-1)
