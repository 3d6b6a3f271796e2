"""Device witness generation vs the host static schedule (bit-exact).

Covers every schedule kind the device program supports (const, arith,
base_sum, poseidon, eq_inv) on a small circuit; the full wormhole-scale
parity was validated the same way (host wire matrix == device wire
matrix) and the on-chip proof-byte parity is asserted by bench.py on
every run.
"""

import numpy as np

from zk_circuits_tpu.field import goldilocks as gfd
from zk_circuits_tpu.iop.builder import CircuitBuilder
from zk_circuits_tpu.iop.witness import PartialWitness, generate_witness
from zk_circuits_tpu.iop.witness_device import (generate_witness_device,
                                                supported)
from zk_circuits_tpu.plonk.config import CircuitConfig


def _circuit():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    y = b.mul(x, x)
    b.range_check(y, 32)
    eq = b.is_equal(x, y)
    t = eq.target if hasattr(eq, "target") else eq
    b.hash_n_to_hash_no_pad([x, y, t])
    b.register_public_input(y)
    return b.build(), x


def test_device_witness_matches_host():
    data, x = _circuit()
    assert supported(data)
    pw = PartialWitness()
    pw.set_target(x, 7)
    host_w, host_pi = generate_witness(data, pw)
    pw2 = PartialWitness()
    pw2.set_target(x, 7)
    dev_w, dev_pi = generate_witness_device(data, pw2)
    assert np.array_equal(host_pi, dev_pi)
    assert np.array_equal(host_w, gfd.to_u64(dev_w))


def test_recursion_kind_witness_matches_host():
    """Extension arithmetic + random-access generator kinds (the recursion
    circuits' extra vocabulary) must also match the host schedule."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = b.add_virtual_target()
    c = b.add_virtual_target()
    o = b.arithmetic_extension(3, 5, (a, c), (c, a), (a, a))
    o2 = b.arithmetic_extension(1, 1, o, (a, c), o)
    idx = b.add_virtual_target()
    vals = [b.add_virtual_target() for _ in range(4)]
    picked = b.random_access(idx, vals)
    b.register_public_input(picked)
    b.register_public_inputs(list(o2))
    data = b.build()
    import os
    os.environ["ZKT_DEVICE_WITNESS_EXT"] = "1"
    try:
        assert supported(data)
    finally:
        pass
    for seed_idx, seed_vals in ((2, (7, 9, 100, 200, 300, 400)),
                                (0, (1, 2, 3, 4, 5, 6))):
        pw = PartialWitness()
        pw.set_target(a, seed_vals[0])
        pw.set_target(c, seed_vals[1])
        pw.set_target(idx, seed_idx)
        for t, v in zip(vals, seed_vals[2:]):
            pw.set_target(t, v)
        host_w, host_pi = generate_witness(data, pw)
        pw2 = PartialWitness()
        pw2.set_target(a, seed_vals[0])
        pw2.set_target(c, seed_vals[1])
        pw2.set_target(idx, seed_idx)
        for t, v in zip(vals, seed_vals[2:]):
            pw2.set_target(t, v)
        dev_w, dev_pi = generate_witness_device(data, pw2)
        assert np.array_equal(host_pi, dev_pi)
        assert np.array_equal(host_w, gfd.to_u64(dev_w))
    os.environ.pop("ZKT_DEVICE_WITNESS_EXT", None)
    assert supported(data)       # ext kinds default ON since the r5 scan
    os.environ["ZKT_DEVICE_WITNESS_EXT"] = "0"   # restructure; "0" opts out
    try:
        assert not supported(data)
    finally:
        os.environ.pop("ZKT_DEVICE_WITNESS_EXT", None)


def test_scan_segment_witness_matches_host():
    """Schedules deep enough to trigger the r5 scan-segment compression
    (witness_device._compile_segments): a >=4-level chain of arith_ext ops
    (kind_run) and an alternating arith_ext/poseidon chain (pair_run) must
    produce bit-identical wires to the host schedule."""
    from zk_circuits_tpu.iop.witness_device import _compile_segments

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = b.add_virtual_target()
    c = b.add_virtual_target()
    # pair_run: 5 alternating [arith_ext -> poseidon] levels (sequential,
    # so each level holds exactly one batch of each kind)
    h = [a, c] + [b.zero()] * 10
    for k in range(5):
        e = b.arithmetic_extension(1 + k, 7, (h[0], h[1]), (h[2], h[3]),
                                   (h[4], h[5]))
        h = b.permute_poseidon([e[0], e[1]] + h[2:])
    # kind_run: 8 dependent arith_ext levels AFTER the pair chain (chained
    # through h so the two sections cannot overlap level-wise)
    o = (h[0], h[1])
    for k in range(8):
        o = b.arithmetic_extension(2 + k, 3 + k, o, (h[2], h[3]), o)
    b.register_public_inputs(list(o))
    b.register_public_inputs(h[:4])
    data = b.build()
    segs = _compile_segments(data.prover_only.schedule)
    kinds = [s[0] for s in segs]
    assert "kind_run" in kinds, kinds
    assert "pair_run" in kinds, kinds
    assert supported(data)

    def seed():
        pw = PartialWitness()
        pw.set_target(a, 12345)
        pw.set_target(c, 67890)
        return pw

    host_w, host_pi = generate_witness(data, seed())
    dev_w, dev_pi = generate_witness_device(data, seed())
    assert np.array_equal(host_pi, dev_pi)
    assert np.array_equal(host_w, gfd.to_u64(dev_w))
