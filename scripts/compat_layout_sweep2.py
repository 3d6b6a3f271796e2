"""Round-5 layout sweep: the r4 sweep ran with upstream's arithmetic
dedup + constant-folding always ON and no zk blinding rows; with those,
the emulated build has 6,954 non-noop rows -> padded degree 2^13, which
can NEVER match the reference's 2^14 — every one of the 48 r4 variants
was dead on arrival at the degree gate.

New axes (refbuild.VARIANTS):
- arith_fold:  fork may lack upstream's special-case constant folding
  (it demonstrably deviates from upstream in ArithmeticGate semantics —
  the negated constraint, NOTES.md r4);
- arith_dedup: same reasoning for the base_arithmetic_results cache;
- zk_blind:    upstream blind() rows (30 Noops + 31 copy-constrained
  Noop pairs) — always ON now (the artifacts are the zk config).

Measured: dedup=False fold=False + blinding = 8,154 rows — 39 short of
forcing 2^14, so the is_equal/select/or/mul variants (hundreds of rows of
spread) decide the degree.  Combos reaching 2^14 get the full
selector/constant column diff; sigmas only on selector match.
"""

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compat_layout_sweep import try_variant  # noqa: E402


def main():
    axes = dict(
        arith_dedup=[False, True],
        arith_fold=[False, True],
        select=["mulsub2", "sub_muladd", "notb"],
        is_equal=["inv_proto", "safe_bool"],
        or_impl=["add_sub_mul", "demorgan"],
        mul_addend=["m0", "zero"],
        const_order=["sorted"],
        zk_blind=[True],
    )
    keys = list(axes)
    best = []
    for combo in itertools.product(*(axes[k] for k in keys)):
        kv = dict(zip(keys, combo))
        t0 = time.time()
        db, kinds, sel_ok, con_ok, sig_ok = try_variant(**kv)
        nz = sum(v for k, v in kinds.items() if k != "Noop")
        tag = " ".join(f"{k}={v}" for k, v in kv.items()
                       if k not in ("const_order", "zk_blind"))
        line = (f"2^{db} rows={nz} sel={sel_ok}/2 con={con_ok}/2 "
                f"sig={sig_ok} [{time.time()-t0:.0f}s] {tag}")
        print(line, flush=True)
        if db == 14:
            best.append((sel_ok + con_ok, line))
    print("\n=== combos reaching the reference degree 2^14 ===")
    for score, line in sorted(best, reverse=True):
        print(line)


if __name__ == "__main__":
    main()
