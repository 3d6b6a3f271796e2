// zknative — host-side native runtime for the TPU proving stack.
//
// The reference's engine (qp-plonky2 / qp-plonky2-field, Rust; see
// /root/repo/SURVEY.md §2.1) keeps all host numerics native.  This library is
// the C++ equivalent for the parts of our pipeline that stay on the host:
// Goldilocks field ops, the width-12 Poseidon permutation, batched leaf
// hashing + Merkle level construction, and radix-2 (I)NTT / coset LDE.
// The TPU device path (JAX/Pallas) is authoritative for large batches; this
// library feeds witness generation, the Fiat-Shamir challenger, FRI query
// extraction and the host verifier at native speed.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

#include "poseidon_constants.h"

using u64 = uint64_t;
using u128 = unsigned __int128;

static constexpr u64 P = 0xFFFFFFFF00000001ULL;   // 2^64 - 2^32 + 1
static constexpr u64 EPS = 0xFFFFFFFFULL;          // 2^64 mod p

// ---------------------------------------------------------------------------
// Goldilocks field
// ---------------------------------------------------------------------------

static inline u64 gl_add(u64 a, u64 b) {
    u64 s = a + b;
    bool carry = s < a;
    if (carry) {
        u64 s2 = s + EPS;           // add 2^64 mod p
        if (s2 < s) s2 += EPS;      // cannot happen twice for canonical inputs
        s = s2;
    }
    if (s >= P) s -= P;
    return s;
}

static inline u64 gl_sub(u64 a, u64 b) {
    u64 d = a - b;
    if (a < b) d -= EPS;            // borrow: subtract 2^64 mod p
    if (d >= P) d -= P;
    return d;
}

static inline u64 gl_reduce128(u128 x) {
    u64 lo = (u64)x;
    u64 hi = (u64)(x >> 64);
    u64 hi_lo = hi & EPS;
    u64 hi_hi = hi >> 32;
    // x ≡ lo - hi_hi + hi_lo * (2^32 - 1)  (mod p)
    u64 t0 = lo - hi_hi;
    if (lo < hi_hi) t0 -= EPS;
    u64 t1 = (hi_lo << 32) - hi_lo;
    u64 t2 = t0 + t1;
    if (t2 < t0) t2 += EPS;
    if (t2 >= P) t2 -= P;
    return t2;
}

static inline u64 gl_mul(u64 a, u64 b) {
    return gl_reduce128((u128)a * (u128)b);
}

static inline u64 gl_pow(u64 a, u64 e) {
    u64 acc = 1, sq = a;
    while (e) {
        if (e & 1) acc = gl_mul(acc, sq);
        sq = gl_mul(sq, sq);
        e >>= 1;
    }
    return acc;
}

static inline u64 gl_inv(u64 a) { return a ? gl_pow(a, P - 2) : 0; }

extern "C" {

void zkn_gl_add(const u64* a, const u64* b, u64* out, int64_t n) {
    for (int64_t i = 0; i < n; i++) out[i] = gl_add(a[i], b[i]);
}

void zkn_gl_sub(const u64* a, const u64* b, u64* out, int64_t n) {
    for (int64_t i = 0; i < n; i++) out[i] = gl_sub(a[i], b[i]);
}

void zkn_gl_mul(const u64* a, const u64* b, u64* out, int64_t n) {
    for (int64_t i = 0; i < n; i++) out[i] = gl_mul(a[i], b[i]);
}

void zkn_gl_inv(const u64* a, u64* out, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) out[i] = gl_inv(a[i]);
}

// out[i] = base^i (batch powers — twiddle/domain generation)
void zkn_gl_powers(u64 base, u64* out, int64_t n) {
    u64 acc = 1;
    for (int64_t i = 0; i < n; i++) { out[i] = acc; acc = gl_mul(acc, base); }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Poseidon (width 12, 8 full + 22 partial rounds) — matches the constants
// module validated against the reference golden vectors.
// ---------------------------------------------------------------------------

static inline u64 sbox7(u64 x) {
    u64 x2 = gl_mul(x, x);
    u64 x3 = gl_mul(x2, x);
    u64 x6 = gl_mul(x3, x3);
    return gl_mul(x6, x);
}

static inline void mds_layer(u64* st) {
    // Circulant(MDS_CIRC) + Diag(MDS_DIAG); coefficients are tiny (< 2^6),
    // so accumulate u128 row sums of coeff * state without intermediate
    // reduction (12 * 2^6 * p < 2^134? no — 2^6 * 2^64 * 12 < 2^74, safe).
    u128 rows[POSEIDON_WIDTH];
    for (int r = 0; r < POSEIDON_WIDTH; r++) {
        u128 acc = 0;
        for (int i = 0; i < POSEIDON_WIDTH; i++)
            acc += (u128)MDS_CIRC[i] * st[(r + i) % POSEIDON_WIDTH];
        acc += (u128)MDS_DIAG[r] * st[r];
        rows[r] = acc;
    }
    for (int r = 0; r < POSEIDON_WIDTH; r++) st[r] = gl_reduce128(rows[r]);
}

static inline void permute_one(u64* st) {
    int rc = 0;
    for (int r = 0; r < POSEIDON_HALF_FULL; r++) {
        for (int i = 0; i < POSEIDON_WIDTH; i++)
            st[i] = sbox7(gl_add(st[i], ALL_ROUND_CONSTANTS[rc + i]));
        rc += POSEIDON_WIDTH;
        mds_layer(st);
    }
    for (int r = 0; r < POSEIDON_PARTIAL; r++) {
        for (int i = 0; i < POSEIDON_WIDTH; i++)
            st[i] = gl_add(st[i], ALL_ROUND_CONSTANTS[rc + i]);
        rc += POSEIDON_WIDTH;
        st[0] = sbox7(st[0]);
        mds_layer(st);
    }
    for (int r = 0; r < POSEIDON_HALF_FULL; r++) {
        for (int i = 0; i < POSEIDON_WIDTH; i++)
            st[i] = sbox7(gl_add(st[i], ALL_ROUND_CONSTANTS[rc + i]));
        rc += POSEIDON_WIDTH;
        mds_layer(st);
    }
}

// Sponge: absorb `len` felts RATE at a time, squeeze 4 (HashOut).
static inline void hash_no_pad_one(const u64* in, int64_t len, u64* out4) {
    u64 st[POSEIDON_WIDTH] = {0};
    for (int64_t off = 0; off < len; off += POSEIDON_RATE) {
        int64_t chunk = len - off < POSEIDON_RATE ? len - off : POSEIDON_RATE;
        for (int64_t j = 0; j < chunk; j++) st[j] = in[off + j];
        permute_one(st);
    }
    for (int i = 0; i < 4; i++) out4[i] = st[i];
}

extern "C" {

// In-place permutation of n states, each 12 consecutive u64.
// Small batches run serial: an OpenMP parallel region costs ~2 ms in
// thread wake/sync on this host, which dominated the Fiat-Shamir
// challenger's one-state-at-a-time calls (round-4 finding).
void zkn_poseidon_permute(u64* states, int64_t n) {
    if (n < 16) {
        for (int64_t s = 0; s < n; s++) permute_one(states + s * POSEIDON_WIDTH);
        return;
    }
#pragma omp parallel for schedule(static)
    for (int64_t s = 0; s < n; s++) permute_one(states + s * POSEIDON_WIDTH);
}

// rows x cols leaf matrix -> rows HashOut digests (rows x 4).
// hash_or_noop semantics: cols <= 4 copies the row zero-padded (plonky2
// Merkle leaf rule); otherwise hash_no_pad.
void zkn_hash_leaves(const u64* leaves, int64_t rows, int64_t cols,
                     int or_noop, u64* out) {
    if (or_noop && cols <= 4) {
#pragma omp parallel for schedule(static)
        for (int64_t r = 0; r < rows; r++) {
            for (int64_t j = 0; j < 4; j++)
                out[r * 4 + j] = j < cols ? leaves[r * cols + j] : 0;
        }
        return;
    }
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < rows; r++)
        hash_no_pad_one(leaves + r * cols, cols, out + r * 4);
}

// n_pairs two-to-one compressions: out[i] = permute(left_i || right_i)[0..4]
// where digests is (2*n_pairs) x 4 row-major (left, right interleaved).
void zkn_compress_level(const u64* digests, int64_t n_pairs, u64* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_pairs; i++) {
        u64 st[POSEIDON_WIDTH] = {0};
        std::memcpy(st, digests + i * 8, 8 * sizeof(u64));
        permute_one(st);
        std::memcpy(out + i * 4, st, 4 * sizeof(u64));
    }
}

// hash_no_pad over a batch of equal-length inputs: n x len -> n x 4.
void zkn_hash_no_pad_batch(const u64* in, int64_t n, int64_t len, u64* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++)
        hash_no_pad_one(in + i * len, len, out + i * 4);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Radix-2 NTT / INTT / coset LDE along the last axis (batch leading axis).
// Natural-order in, natural-order out: values[i] = p(w^i).
// ---------------------------------------------------------------------------

static void bit_reverse_permute(u64* x, int64_t n) {
    int bits = 0;
    while ((1LL << bits) < n) bits++;
    for (int64_t i = 0; i < n; i++) {
        int64_t r = 0;
        for (int b = 0; b < bits; b++) r |= ((i >> b) & 1) << (bits - 1 - b);
        if (r > i) { u64 t = x[i]; x[i] = x[r]; x[r] = t; }
    }
}

// primitive 2^k-th root of unity: g^( (p-1) / 2^k ) with g = 7.
static u64 root_of_unity(int k) {
    // 2^32-th root table seed: g=7 is the multiplicative group generator.
    u64 e = (P - 1) >> k;
    return gl_pow(7, e);
}

struct Twiddles {
    std::vector<std::vector<u64>> stages;  // stages[s][j], j < 2^s
    int64_t n = 0;
};

static void fill_twiddles(Twiddles& tw, int64_t n) {
    if (tw.n == n) return;
    tw.stages.clear();
    int bits = 0;
    while ((1LL << bits) < n) bits++;
    for (int s = 0; s < bits; s++) {
        int64_t half = 1LL << s;
        u64 w = root_of_unity(s + 1);
        std::vector<u64> v((size_t)half);
        u64 acc = 1;
        for (int64_t j = 0; j < half; j++) { v[(size_t)j] = acc; acc = gl_mul(acc, w); }
        tw.stages.push_back(std::move(v));
    }
    tw.n = n;
}

static void ntt_one(u64* x, int64_t n, const Twiddles& tw) {
    bit_reverse_permute(x, n);
    int bits = (int)tw.stages.size();
    for (int s = 0; s < bits; s++) {
        int64_t half = 1LL << s, step = half << 1;
        const u64* w = tw.stages[(size_t)s].data();
        for (int64_t blk = 0; blk < n; blk += step) {
            for (int64_t j = 0; j < half; j++) {
                u64 a = x[blk + j];
                u64 b = gl_mul(x[blk + j + half], w[j]);
                x[blk + j] = gl_add(a, b);
                x[blk + j + half] = gl_sub(a, b);
            }
        }
    }
}

extern "C" {

// In-place batched NTT (inverse=0) / INTT (inverse=1): data is batch x n.
void zkn_ntt(u64* data, int64_t batch, int64_t n, int inverse) {
    Twiddles tw;
    fill_twiddles(tw, n);  // O(n) muls, negligible vs the O(n log n) transform
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < batch; b++) {
        u64* x = data + b * n;
        if (!inverse) {
            ntt_one(x, n, tw);
        } else {
            // INTT(x)[i] = NTT(x)[-i] / n
            ntt_one(x, n, tw);
            u64 n_inv = gl_inv((u64)n % P);
            for (int64_t i = 1; i < n - i; i++) { u64 t = x[i]; x[i] = x[n - i]; x[n - i] = t; }
            for (int64_t i = 0; i < n; i++) x[i] = gl_mul(x[i], n_inv);
        }
    }
}

// Coset LDE: coeffs (batch x n) -> values (batch x n*2^rate_bits) on
// shift * <w>.  out must hold batch * (n << rate_bits).
void zkn_coset_lde(const u64* coeffs, int64_t batch, int64_t n,
                   int rate_bits, u64 shift, u64* out) {
    int64_t m = n << rate_bits;
    Twiddles tw;
    fill_twiddles(tw, m);
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < batch; b++) {
        u64* x = out + b * m;
        // scale coefficients by shift^i, zero-pad to m
        u64 acc = 1;
        for (int64_t i = 0; i < n; i++) {
            x[i] = gl_mul(coeffs[b * n + i], acc);
            acc = gl_mul(acc, shift);
        }
        std::memset(x + n, 0, (size_t)(m - n) * sizeof(u64));
        ntt_one(x, m, tw);
    }
}

}  // extern "C"
