"""Diff the emulated reference-circuit layout (compat/refcircuit.py)
against the proof's verified FRI query openings (compat_points.npz).

For each of the 84 constants_sigmas columns (2 selectors, 2 constants,
80 sigmas) the emulated polynomial is evaluated at the 28 verified LDE
points and compared to the openings — a per-column gradient on the
builder emulation.  Also checks degree_bits and, on full match, the
Merkle cap vs verifier.bin.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zk_circuits_tpu.compat import refbuild
from zk_circuits_tpu.compat.refcircuit import build_wormhole_layout
from zk_circuits_tpu.host import gl

P = gl.P_INT


def generic_intt(values: np.ndarray, root: int) -> np.ndarray:
    """INTT over the subgroup enumerated by `root` (values[..., r] at
    root^r), radix-2, numpy."""
    n = values.shape[-1]
    bits = n.bit_length() - 1
    inv_root = pow(root, P - 2, P)
    # NTT with inv_root then scale by 1/n gives coefficients
    x = values.copy()
    # iterative Cooley-Tukey (DIT), same structure as ntt.host_ntt
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    x = x[..., rev]
    for s in range(bits):
        half = 1 << s
        w = pow(inv_root, n // (2 * half), P)
        tw = np.empty(half, dtype=np.uint64)
        acc = 1
        for j in range(half):
            tw[j] = acc
            acc = acc * w % P
        shape = x.shape[:-1] + (n // (2 * half), 2, half)
        x = x.reshape(shape)
        a = x[..., 0, :]
        bmul = gl.mul(x[..., 1, :], tw)
        x = np.concatenate([gl.add(a, bmul)[..., None, :],
                            gl.sub(a, bmul)[..., None, :]], axis=-2)
        x = x.reshape(x.shape[:-3] + (n,))
    n_inv = pow(n, P - 2, P)
    return gl.mul(x, np.uint64(n_inv))


def eval_at_points(coeffs: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Horner: coeffs (polys, n), xs (m,) -> (polys, m)."""
    m = xs.shape[0]
    acc = np.zeros((coeffs.shape[0], m), dtype=np.uint64)
    for k in range(coeffs.shape[1] - 1, -1, -1):
        acc = gl.add(gl.mul(acc, xs[None, :]), coeffs[:, k][:, None])
    return acc


def main():
    t0 = time.time()
    layout = build_wormhole_layout()
    print(f"emulated build: degree 2^{layout.degree_bits} "
          f"({len([g for g in layout.builder.rows if g.kind != 'Noop'])} "
          f"non-noop rows) in {time.time()-t0:.1f}s", flush=True)
    print("gate list:", layout.gate_list)
    print("selector groups:", layout.selector_groups)

    d = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "compat_points.npz"))
    xs = d["x"]
    ref_cols = d["constants_sigmas"]     # (28, 84)

    if layout.degree_bits != 14:
        print(f"!! degree mismatch: emulated 2^{layout.degree_bits}, "
              f"reference 2^14 — row count off by "
              f"{len(layout.builder.rows)} vs 16384", flush=True)

    sel = layout.selector_polys()
    con = layout.constant_polys()
    t1 = time.time()
    sig = layout.sigma_polys()
    print(f"sigma polys in {time.time()-t1:.1f}s", flush=True)

    polys = np.concatenate([sel, con, sig], axis=0)   # (84, n)
    root = refbuild.root_of_unity(layout.degree_bits)
    t2 = time.time()
    coeffs = generic_intt(polys, root)
    vals = eval_at_points(coeffs, xs)                 # (84, 28)
    print(f"eval in {time.time()-t2:.1f}s", flush=True)

    names = (["sel0", "sel1", "c0", "c1"] +
             [f"sigma{j}" for j in range(80)])
    n_match = 0
    for i, name in enumerate(names):
        ok = np.array_equal(vals[i], ref_cols[:, i].astype(np.uint64))
        n_match += ok
        if i < 6 or (not ok and i < 12) or (ok and i >= 4 and i < 8):
            print(f"  {name}: {'MATCH' if ok else 'mismatch'}")
    print(f"TOTAL: {n_match}/84 columns match")
    if n_match == 84:
        print("FULL LAYOUT PARITY — checking cap next (run compat_cap_check)")


if __name__ == "__main__":
    main()
