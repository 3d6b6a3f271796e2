"""Row-level localization for the reference layout rebuild.

Given the emulated selector polynomials (values on H) and the verified
openings at the 28 FRI query points, test whether the candidate is ONE
row-edit away from the truth:

  eval(v)[q] = sum_r v_r * L_r(x_q)   with Lagrange weights
  L_r(x) = (x^n - 1) * g^r / (n * (x - g^r))

- substitution at row r: residual R[q] must equal delta * L_r(x_q) for a
  constant delta -> scan all 16384 rows;
- suffix insertion/deletion at row r (one row inserted/removed, suffix
  shifted): closed-form via suffix sums of v_r L_r / v_r L_{r+1}.

All checks run simultaneously on sel0, sel1, c0, c1 — a real edit must
explain all four residuals with the SAME row.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from zk_circuits_tpu.compat import refbuild
from zk_circuits_tpu.host import gl

P = gl.P_INT


def lagrange_weights(n: int, root: int, xs: np.ndarray) -> np.ndarray:
    """W[r, q] = L_r(x_q) over H = <root>, |H| = n."""
    g_pows = np.empty(n, dtype=np.uint64)
    acc = 1
    for r in range(n):
        g_pows[r] = acc
        acc = acc * root % P
    n_inv = pow(n, P - 2, P)
    out = np.empty((n, len(xs)), dtype=np.uint64)
    for q, x in enumerate(xs):
        x = int(x)
        zx = (pow(x, n, P) - 1) % P * n_inv % P
        # denom_r = x - g^r ; batch invert
        denom = gl.sub(np.full(n, x, dtype=np.uint64), g_pows)
        inv = batch_inverse(denom)
        out[:, q] = gl.mul(gl.mul(np.uint64(zx), g_pows), inv)
    return out


def batch_inverse(a: np.ndarray) -> np.ndarray:
    n = a.shape[0]
    prefix = np.empty(n, dtype=np.uint64)
    acc = np.uint64(1)
    for i in range(n):
        prefix[i] = acc
        acc = gl.mul(acc, a[i])
    inv_all = np.uint64(pow(int(acc), P - 2, P))
    out = np.empty(n, dtype=np.uint64)
    for i in range(n - 1, -1, -1):
        out[i] = gl.mul(inv_all, prefix[i])
        inv_all = gl.mul(inv_all, a[i])
    return out


def main():
    import importlib

    from zk_circuits_tpu.compat import refcircuit
    variant = dict(arith_dedup=False, select="mulsub2", is_equal="safe_bool")
    if len(sys.argv) > 1:
        for kv in sys.argv[1:]:
            k, v = kv.split("=")
            variant[k] = (v == "True") if v in ("True", "False") else v
    refbuild.VARIANTS.update(variant)
    importlib.reload(refcircuit)
    layout = refcircuit.build_wormhole_layout()
    print(f"candidate degree 2^{layout.degree_bits}, variants {variant}",
          flush=True)
    if layout.degree_bits != 14:
        print("degree != 2^14 — localization needs the right padded size")
        return

    d = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "compat_points.npz"))
    xs = d["x"]
    ref_cols = d["constants_sigmas"].astype(np.uint64)   # (28, 84)

    n = layout.degree
    root = refbuild.root_of_unity(layout.degree_bits)
    print("building Lagrange weights...", flush=True)
    W = lagrange_weights(n, root, xs)        # (n, 28)

    sel = layout.selector_polys()            # (2, n)
    con = layout.constant_polys()            # (2, n)
    polys = np.concatenate([sel, con])       # (4, n)
    names = ["sel0", "sel1", "c0", "c1"]

    evals = np.zeros((4, len(xs)), dtype=np.uint64)
    for i in range(4):
        # eval[q] = sum_r v_r W[r,q]
        acc = np.zeros(len(xs), dtype=np.uint64)
        vr = polys[i]
        # chunked accumulate to bound memory
        for s in range(0, n, 2048):
            e = min(s + 2048, n)
            acc = gl.add(acc, gl.mul(vr[s:e, None], W[s:e]).astype(np.uint64)
                         if False else
                         _dot(vr[s:e], W[s:e]))
        evals[i] = acc
    R = gl.sub(ref_cols[:, :4].T.astype(np.uint64), evals)   # (4, 28)
    print("residual zero cols:", [names[i] for i in range(4)
                                  if not R[i].any()])

    # substitution scan: for each row r, delta_i[q] = R_i[q] / W[r,q] must
    # be q-constant for every i.
    print("scanning single-substitution hypotheses...", flush=True)
    Winv = np.empty_like(W)
    for q in range(W.shape[1]):
        Winv[:, q] = batch_inverse(W[:, q])
    hits = []
    for r in range(n):
        ok = True
        for i in range(4):
            if not R[i].any():
                continue
            c = gl.mul(R[i], Winv[r])
            if not np.all(c == c[0]):
                ok = False
                break
        if ok:
            deltas = [int(gl.mul(R[i][0], Winv[r][0])) if R[i].any() else 0
                      for i in range(4)]
            hits.append((r, deltas))
    print(f"substitution hits: {len(hits)}")
    for r, deltas in hits[:10]:
        old = [int(polys[i][r]) for i in range(4)]
        new = [(o + dlt) % P for o, dlt in zip(old, deltas)]
        print(f"  row {r}: {old} -> {new}  (gate row kind: "
              f"{layout.builder.rows[r].kind})")


def _dot(v: np.ndarray, Wc: np.ndarray) -> np.ndarray:
    """sum_r v_r * W[r, :] mod p."""
    prod = gl.mul(v[:, None], Wc)
    acc = np.zeros(Wc.shape[1], dtype=np.uint64)
    for row in prod:
        acc = gl.add(acc, row)
    return acc


if __name__ == "__main__":
    main()
