"""Sweep refbuild VARIANTS combinations; for each, rebuild the emulated
wormhole layout and diff selector/constant columns (row-map signal) and
sigma0..79 (copy-constraint signal) against the 28 verified points."""

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zk_circuits_tpu.compat import refbuild
from zk_circuits_tpu.host import gl
from compat_layout_parity import eval_at_points, generic_intt

P = gl.P_INT
D = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "compat_points.npz"))
XS = D["x"]
REF = D["constants_sigmas"]


def try_variant(**kv):
    refbuild.VARIANTS.update(kv)
    # refcircuit reads VARIANTS at call time; rebuild fresh
    import importlib

    from zk_circuits_tpu.compat import refcircuit
    importlib.reload(refcircuit)
    layout = refcircuit.build_wormhole_layout()
    rows = layout.builder.rows
    kinds = {}
    for g in rows:
        kinds[g.kind] = kinds.get(g.kind, 0) + 1
    sel = layout.selector_polys()
    con = layout.constant_polys()
    root = refbuild.root_of_unity(layout.degree_bits)
    vals = eval_at_points(generic_intt(np.concatenate([sel, con]), root), XS)
    sel_ok = sum(np.array_equal(vals[i], REF[:, i].astype(np.uint64))
                 for i in range(2))
    con_ok = sum(np.array_equal(vals[2 + i], REF[:, 2 + i].astype(np.uint64))
                 for i in range(2))
    sig_ok = -1
    if sel_ok == 2:
        sig = layout.sigma_polys()
        sv = eval_at_points(generic_intt(sig, root), XS)
        sig_ok = sum(np.array_equal(sv[j], REF[:, 4 + j].astype(np.uint64))
                     for j in range(80))
    return layout.degree_bits, kinds, sel_ok, con_ok, sig_ok


def main():
    axes = dict(
        arith_dedup=[False, True],
        select=["mulsub2", "sub_muladd", "notb"],
        is_equal=["inv_proto", "safe_bool"],
        or_impl=["add_sub_mul", "demorgan"],
        const_order=["sorted"],
        mul_addend=["m0", "zero"],
    )
    keys = list(axes)
    for combo in itertools.product(*(axes[k] for k in keys)):
        kv = dict(zip(keys, combo))
        t0 = time.time()
        db, kinds, sel_ok, con_ok, sig_ok = try_variant(**kv)
        tag = " ".join(f"{k}={v}" for k, v in kv.items())
        print(f"2^{db} sel={sel_ok}/2 con={con_ok}/2 sig={sig_ok} "
              f"rows={kinds} [{time.time()-t0:.0f}s] {tag}", flush=True)


if __name__ == "__main__":
    main()
