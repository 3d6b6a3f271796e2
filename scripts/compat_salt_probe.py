"""zk-salt determinism probe (VERDICT r4 item 3).

The reference proof (wormhole/bench-data/proof.bin, built with the
`no_random` feature) carries NONZERO blinding salts: the last 4 columns of
the wires / zs / quotient initial-tree leaves.  `no_random` only makes
sense if that salt stream is deterministic, i.e. drawn from a seeded PRNG
— a small hypothesis space, each member cheaply falsifiable against the
28 query openings x 4 salt columns x 3 oracles = 336 verified salt VALUES
the proof exposes (they are Merkle-verified by
tests/test_compat.py::test_full_reference_proof_verifies, and excluded
from the FRI combine — compat/verifier.py:204).

Method: for each candidate generator (ChaCha rounds x key derivation,
upstream plonky2 constant-sampling pipeline = rand_chacha +
rand's gen_range Lemire reduction — utils/chacha.py reproduces it for the
Poseidon round constants), generate a LONG u64 stream prefix (vectorized
numpy ChaCha), derive every plausible u64->felt reduction
(gen_range / mod p / rejection / noncanonical), and membership-test all
336 salt values against the stream.  A global/per-oracle/per-column rng
with ANY offset layout would surface as hits (336 * 16M / 2^64 ~ 3e-10
expected false positives); zero hits falsifies the whole family.

Run: python scripts/compat_salt_probe.py [--prefix-m 16]
Findings recorded in zk_circuits_tpu/compat/NOTES.md.
"""

from __future__ import annotations

import argparse
import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zk_circuits_tpu.compat.serde import (  # noqa: E402
    read_common_data, read_proof, read_verifier_data)
from zk_circuits_tpu.hash.challenger import Challenger  # noqa: E402
from zk_circuits_tpu.host import gl, poseidon as hposeidon  # noqa: E402
from zk_circuits_tpu.utils.chacha import (  # noqa: E402
    ChaCha8Rng, pcg32_seed_expand)

BD = Path("/root/reference/wormhole/bench-data")
P = (1 << 64) - (1 << 32) + 1


# ---------------------------------------------------------------------------
# vectorized ChaCha keystream (numpy, u32 lanes over the block counter)
# ---------------------------------------------------------------------------


def chacha_stream_u64(key32: bytes, rounds: int, n_u64: int) -> np.ndarray:
    """First n_u64 outputs of rand_chacha's next_u64 for the given key:
    64-byte blocks at counters 0..; words little-endian u32; u64 = lo|hi<<32
    of consecutive u32s (matches utils/chacha.ChaCha8Rng bit-for-bit)."""
    n_blocks = (2 * n_u64 + 15) // 16
    ctr = np.arange(n_blocks, dtype=np.uint64)
    const = np.frombuffer(b"expand 32-byte k", dtype="<u4").astype(np.uint32)
    key = np.frombuffer(key32, dtype="<u4").astype(np.uint32)
    state = np.zeros((16, n_blocks), dtype=np.uint32)
    for i in range(4):
        state[i] = const[i]
    for i in range(8):
        state[4 + i] = key[i]
    state[12] = (ctr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    state[13] = (ctr >> np.uint64(32)).astype(np.uint32)
    ws = state.copy()

    def rotl(x, k):
        return (x << np.uint32(k)) | (x >> np.uint32(32 - k))

    def qr(a, b, c, d):
        ws[a] += ws[b]
        ws[d] = rotl(ws[d] ^ ws[a], 16)
        ws[c] += ws[d]
        ws[b] = rotl(ws[b] ^ ws[c], 12)
        ws[a] += ws[b]
        ws[d] = rotl(ws[d] ^ ws[a], 8)
        ws[c] += ws[d]
        ws[b] = rotl(ws[b] ^ ws[c], 7)

    with np.errstate(over="ignore"):
        for _ in range(rounds // 2):
            qr(0, 4, 8, 12)
            qr(1, 5, 9, 13)
            qr(2, 6, 10, 14)
            qr(3, 7, 11, 15)
            qr(0, 5, 10, 15)
            qr(1, 6, 11, 12)
            qr(2, 7, 8, 13)
            qr(3, 4, 9, 14)
        out32 = (ws + state).T.reshape(-1)  # block-major word order
    lo = out32[0::2].astype(np.uint64)
    hi = out32[1::2].astype(np.uint64)
    return (lo | (hi << np.uint64(32)))[:n_u64]


def splitmix64_stream(seed: int, n: int) -> np.ndarray:
    """SplitMix64 output stream (vectorized: out[i] = mix(seed+(i+1)*GAMMA))."""
    GAMMA = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        z = np.uint64(seed) + (np.arange(1, n + 1, dtype=np.uint64) * GAMMA)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def xoshiro256_stream(seed: int, n: int, variant: str) -> np.ndarray:
    """xoshiro256++ / xoshiro256** (rand's SmallRng on 64-bit, rand 0.8),
    state seeded rand_core-style (seed_from_u64 -> 32-byte LE state).
    Sequential recurrence — plain Python, so keep n modest."""
    sd = pcg32_seed_expand(seed)
    s = list(struct.unpack("<4Q", sd))
    M = (1 << 64) - 1

    def rotl(x, k):
        return ((x << k) | (x >> (64 - k))) & M

    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        if variant == "++":
            out[i] = (rotl((s[0] + s[3]) & M, 23) + s[0]) & M
        else:  # **
            out[i] = (rotl((s[1] * 5) & M, 7) * 9) & M
        t = (s[1] << 17) & M
        s[2] ^= s[0]
        s[3] ^= s[1]
        s[1] ^= s[2]
        s[0] ^= s[3]
        s[2] ^= t
        s[3] = rotl(s[3], 45)
    return out


def derive_felt_streams(u: np.ndarray) -> dict[str, np.ndarray]:
    """Every plausible u64 -> Goldilocks reduction of a raw rng stream."""
    out = {}
    with np.errstate(over="ignore"):
        # rand's gen_range(0..P) (Lemire widening-multiply, zone = P-1):
        # sample = hi64(v*P) where lo64(v*P) <= P-1, else skip v.
        v = u
        lo_prod = v * np.uint64(P)
        # hi64(v*P) via 32-bit limb school multiplication
        a0 = v & np.uint64(0xFFFFFFFF)
        a1 = v >> np.uint64(32)
        b0 = np.uint64(P & 0xFFFFFFFF)
        b1 = np.uint64(P >> 32)
        ll = a0 * b0
        lh = a0 * b1
        hl = a1 * b0
        hh = a1 * b1
        mid = lh + hl
        mid_c = (mid < lh).astype(np.uint64)
        x_lo = ll + (mid << np.uint64(32))
        c1 = (x_lo < ll).astype(np.uint64)
        hi_prod = hh + (mid >> np.uint64(32)) + (mid_c << np.uint64(32)) + c1
        accept = lo_prod <= np.uint64(P - 1)
        out["gen_range"] = hi_prod[accept]
        # v % P
        out["mod_p"] = u % np.uint64(P)
        # rejection: keep v < P
        out["reject"] = u[u < np.uint64(P)]
        # from_noncanonical_u64: canonicalize
        out["noncanon"] = np.where(u >= np.uint64(P), u - np.uint64(P), u)
    return out


# ---------------------------------------------------------------------------
# salt extraction from proof.bin
# ---------------------------------------------------------------------------


def extract_salts():
    common = read_common_data((BD / "common.bin").read_bytes())
    vdata = read_verifier_data((BD / "verifier.bin").read_bytes())
    proof = read_proof((BD / "proof.bin").read_bytes(), common)
    assert common.salt_size == 4, "proof is not blinded - no salts to probe"
    op = proof.openings
    fp = proof.opening_proof
    nc = common.num_challenges
    lde_bits = common.lde_bits

    pis = np.asarray(proof.public_inputs, dtype=np.uint64)
    pi_hash = hposeidon.hash_no_pad(pis) if pis.size else np.zeros(4, np.uint64)
    ch = Challenger()
    ch.observe_hash(vdata.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(proof.wires_cap)
    ch.get_n_challenges(nc)
    ch.get_n_challenges(nc)
    ch.observe_cap(proof.plonk_zs_partial_products_cap)
    ch.get_n_challenges(nc)
    ch.observe_cap(proof.quotient_polys_cap)
    ch.get_extension_challenge()
    ch.observe_extension_elements(op.fri_batch0())
    ch.observe_extension_elements(op.fri_batch1())
    ch.get_extension_challenge()
    for cap in fp.commit_phase_caps:
        ch.observe_cap(cap)
        ch.get_extension_challenge()
    ch.observe_extension_elements(fp.final_poly)
    ch.observe_element(fp.pow_witness)
    ch.get_challenge()
    query_indices = [ch.get_challenge() % (1 << lde_bits)
                     for _ in range(common.fri_config.num_query_rounds)]

    # salts[oracle][query, col]; oracle order: wires(1), zs(2), quotient(3)
    salts = {o: np.zeros((len(query_indices), 4), dtype=np.uint64)
             for o in (1, 2, 3)}
    for qi, _idx in enumerate(query_indices):
        evals = proof.opening_proof.query_rounds[qi].initial.evals
        for o in (1, 2, 3):
            salts[o][qi] = evals[o][-4:]
    return common, np.array(query_indices, dtype=np.int64), salts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix-m", type=int, default=16,
                    help="stream prefix length in millions of u64 draws")
    args = ap.parse_args()
    n_u64 = args.prefix_m * 1_000_000

    common, qidx, salts = extract_salts()
    lde_bits = common.lde_bits
    print(f"lde=2^{lde_bits}; 28 query indices; salt openings per oracle: "
          f"{ {o: v.shape for o, v in salts.items()} }")

    all_salts = np.concatenate([salts[o].reshape(-1) for o in (1, 2, 3)])
    uniq = np.unique(all_salts)
    print(f"total salt values: {all_salts.size}, unique: {uniq.size}")

    # structural checks -----------------------------------------------------
    for o in (1, 2, 3):
        same_cols = all(
            np.array_equal(salts[o][:, 0], salts[o][:, c]) for c in (1, 2, 3))
        print(f"oracle {o}: 4 columns identical: {same_cols}")
    for o in (2, 3):
        print(f"oracle 1 vs {o} identical: "
              f"{np.array_equal(salts[1], salts[o])}")

    # sanity: vectorized chacha == scalar reference implementation
    ref = ChaCha8Rng(0)
    got = chacha_stream_u64(pcg32_seed_expand(0), 8, 4)
    exp = [ref.next_u64() for _ in range(4)]
    assert got.tolist() == exp, (got, exp)
    print("vectorized ChaCha8 matches utils/chacha.ChaCha8Rng")

    salt_set = set(int(x) for x in uniq)
    keys = {
        "seed_from_u64(0)": pcg32_seed_expand(0),
        "seed_from_u64(1)": pcg32_seed_expand(1),
        "zero_key": b"\x00" * 32,
    }
    hits_total = 0
    for rounds in (8, 12, 20):
        for kname, key in keys.items():
            u = chacha_stream_u64(key, rounds, n_u64)
            for dname, stream in derive_felt_streams(u).items():
                mask = np.isin(stream, uniq)
                nhit = int(mask.sum())
                tag = f"ChaCha{rounds}/{kname}/{dname}"
                if nhit:
                    pos = np.nonzero(mask)[0]
                    print(f"  HIT {tag}: {nhit} matches at stream "
                          f"positions {pos[:20].tolist()}")
                    hits_total += nhit
                else:
                    print(f"  no hits: {tag}")
            del u
    # non-ChaCha rand-family generators ------------------------------------
    extra = []
    for seed in (0, 1):
        extra.append((f"SplitMix64({seed})",
                      splitmix64_stream(seed, n_u64)))
    xn = min(n_u64, 2_000_000)  # sequential python; covers fresh-rng layouts
    for seed in (0, 1):
        for var in ("++", "**"):
            extra.append((f"xoshiro256{var}({seed})",
                          xoshiro256_stream(seed, xn, var)))
    n_extra = 0
    for gname, u in extra:
        for dname, stream in derive_felt_streams(u).items():
            mask = np.isin(stream, uniq)
            nhit = int(mask.sum())
            n_extra += 1
            tag = f"{gname}/{dname}"
            if nhit:
                pos = np.nonzero(mask)[0]
                print(f"  HIT {tag}: {nhit} matches at positions "
                      f"{pos[:20].tolist()}")
                hits_total += nhit
            else:
                print(f"  no hits: {tag}")

    print(f"\nTOTAL HITS: {hits_total} across "
          f"{3 * len(keys) * 4 + n_extra} stream hypotheses x {n_u64:,} draws")
    if hits_total == 0:
        print("=> every ChaCha-family deterministic-salt hypothesis is "
              "FALSIFIED for this prefix length")


if __name__ == "__main__":
    main()
