// Native runtime components for the TPU zk-SNARK framework.
//
// The reference implements its host runtime in native code (Rust +
// OpenCL C); this library provides the equivalent native pieces around
// our Python/JAX orchestration, exposed through a plain C ABI consumed
// via ctypes (zcash_gpu_thesis_tpu/native.py):
//
//   * BLAKE2b-512 (RFC 7693) with personalization — the HashReader
//     parameter-integrity hash (librustzcash/src/hashreader.rs) and the
//     equihash base state;
//   * the Equihash solution verifier (librustzcash/src/equihash.rs);
//   * bulk byte<->12-bit-limb repacking for the fixture loader
//     (the load_data path, bellman/src/multiexp.rs:392-440).
//
// Build: `make -C native` -> libzktpu_native.so.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// BLAKE2b (RFC 7693), sequential, with personalization support.
// ---------------------------------------------------------------------------

struct Blake2b {
  uint64_t h[8];
  uint8_t buf[128];
  size_t buflen = 0;
  uint64_t t = 0;  // bytes compressed so far
  size_t outlen;

  static constexpr uint64_t IV[8] = {
      0x6a09e667f3bcc908ULL, 0xbb67ae8584caa73bULL, 0x3c6ef372fe94f82bULL,
      0xa54ff53a5f1d36f1ULL, 0x510e527fade682d1ULL, 0x9b05688c2b3e6c1fULL,
      0x1f83d9abfb41bd6bULL, 0x5be0cd19137e2179ULL};

  Blake2b(size_t digest_len, const uint8_t* person, size_t person_len) {
    outlen = digest_len;
    uint8_t p[64] = {0};  // parameter block
    p[0] = (uint8_t)digest_len;
    p[1] = 0;  // key length
    p[2] = 1;  // fanout
    p[3] = 1;  // depth
    if (person && person_len) {
      memcpy(p + 48, person, person_len > 16 ? 16 : person_len);
    }
    for (int i = 0; i < 8; i++) {
      uint64_t w = 0;
      for (int j = 0; j < 8; j++) w |= (uint64_t)p[i * 8 + j] << (8 * j);
      h[i] = IV[i] ^ w;
    }
  }

  static inline uint64_t rotr64(uint64_t x, int n) {
    return (x >> n) | (x << (64 - n));
  }

  void compress(const uint8_t* block, bool last) {
    static const uint8_t sigma[12][16] = {
        {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
        {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
        {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
        {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
        {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
        {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
        {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
        {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
        {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
        {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
        {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
        {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3}};
    uint64_t m[16], v[16];
    for (int i = 0; i < 16; i++) {
      uint64_t w = 0;
      for (int j = 0; j < 8; j++) w |= (uint64_t)block[i * 8 + j] << (8 * j);
      m[i] = w;
    }
    for (int i = 0; i < 8; i++) v[i] = h[i];
    for (int i = 0; i < 8; i++) v[8 + i] = IV[i];
    v[12] ^= t;  // low counter word (high word stays 0 for < 2^64 bytes)
    if (last) v[14] = ~v[14];

#define G(a, b, c, d, x, y)                \
  v[a] = v[a] + v[b] + (x);                \
  v[d] = rotr64(v[d] ^ v[a], 32);          \
  v[c] = v[c] + v[d];                      \
  v[b] = rotr64(v[b] ^ v[c], 24);          \
  v[a] = v[a] + v[b] + (y);                \
  v[d] = rotr64(v[d] ^ v[a], 16);          \
  v[c] = v[c] + v[d];                      \
  v[b] = rotr64(v[b] ^ v[c], 63);

    for (int r = 0; r < 12; r++) {
      const uint8_t* s = sigma[r];
      G(0, 4, 8, 12, m[s[0]], m[s[1]]);
      G(1, 5, 9, 13, m[s[2]], m[s[3]]);
      G(2, 6, 10, 14, m[s[4]], m[s[5]]);
      G(3, 7, 11, 15, m[s[6]], m[s[7]]);
      G(0, 5, 10, 15, m[s[8]], m[s[9]]);
      G(1, 6, 11, 12, m[s[10]], m[s[11]]);
      G(2, 7, 8, 13, m[s[12]], m[s[13]]);
      G(3, 4, 9, 14, m[s[14]], m[s[15]]);
    }
#undef G
    for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[8 + i];
  }

  void update(const uint8_t* data, size_t len) {
    while (len) {
      if (buflen == 128) {
        t += 128;
        compress(buf, false);
        buflen = 0;
      }
      size_t take = 128 - buflen;
      if (take > len) take = len;
      memcpy(buf + buflen, data, take);
      buflen += take;
      data += take;
      len -= take;
    }
  }

  void finalize(uint8_t* out) {
    t += buflen;
    memset(buf + buflen, 0, 128 - buflen);
    compress(buf, true);
    for (size_t i = 0; i < outlen; i++) out[i] = (uint8_t)(h[i / 8] >> (8 * (i % 8)));
  }
};

constexpr uint64_t Blake2b::IV[8];

// ---------------------------------------------------------------------------
// Equihash (librustzcash/src/equihash.rs semantics).
// ---------------------------------------------------------------------------

struct EhParams {
  uint32_t n, k;
  uint32_t indices_per_hash_output() const { return 512 / n; }
  uint32_t hash_output() const { return indices_per_hash_output() * n / 8; }
  size_t collision_bit_length() const { return n / (k + 1); }
  size_t collision_byte_length() const { return (collision_bit_length() + 7) / 8; }
};

void expand_array(const uint8_t* vin, size_t vin_len, size_t bit_len,
                  size_t byte_pad, std::vector<uint8_t>& vout) {
  size_t out_width = (bit_len + 7) / 8 + byte_pad;
  size_t out_len = 8 * out_width * vin_len / bit_len;
  vout.assign(out_len, 0);
  if (out_len == vin_len) {
    memcpy(vout.data(), vin, vin_len);
    return;
  }
  uint32_t bit_len_mask = ((uint32_t)1 << bit_len) - 1;
  size_t acc_bits = 0;
  uint32_t acc_value = 0;
  size_t j = 0;
  for (size_t i = 0; i < vin_len; i++) {
    acc_value = (acc_value << 8) | vin[i];
    acc_bits += 8;
    if (acc_bits >= bit_len) {
      acc_bits -= bit_len;
      for (size_t x = byte_pad; x < out_width; x++) {
        vout[j + x] = (uint8_t)((acc_value >> (acc_bits + 8 * (out_width - x - 1))) &
                                ((bit_len_mask >> (8 * (out_width - x - 1))) & 0xFF));
      }
      j += out_width;
    }
  }
}

struct EhNode {
  std::vector<uint8_t> hash;
  std::vector<uint32_t> indices;
};

bool eh_node_new(const EhParams& p, const Blake2b& base, uint32_t i, EhNode& out) {
  Blake2b st = base;
  uint8_t lei[4] = {(uint8_t)(i / p.indices_per_hash_output()),
                    (uint8_t)((i / p.indices_per_hash_output()) >> 8),
                    (uint8_t)((i / p.indices_per_hash_output()) >> 16),
                    (uint8_t)((i / p.indices_per_hash_output()) >> 24)};
  st.update(lei, 4);
  std::vector<uint8_t> digest(p.hash_output());
  st.finalize(digest.data());
  size_t start = (i % p.indices_per_hash_output()) * p.n / 8;
  expand_array(digest.data() + start, p.n / 8, p.collision_bit_length(), 0,
               out.hash);
  out.indices.assign(1, i);
  return true;
}

bool eh_validate(const EhParams& p, const Blake2b& base,
                 const uint32_t* indices, size_t count, EhNode& out) {
  if (count == 1) return eh_node_new(p, base, indices[0], out);
  EhNode a, b;
  if (!eh_validate(p, base, indices, count / 2, a)) return false;
  if (!eh_validate(p, base, indices + count / 2, count - count / 2, b))
    return false;
  size_t cl = p.collision_byte_length();
  if (memcmp(a.hash.data(), b.hash.data(), cl) != 0) return false;
  if (b.indices[0] < a.indices[0]) return false;
  for (uint32_t x : a.indices)
    for (uint32_t y : b.indices)
      if (x == y) return false;
  out.hash.resize(a.hash.size() - cl);
  for (size_t i = 0; i < out.hash.size(); i++)
    out.hash[i] = a.hash[i + cl] ^ b.hash[i + cl];
  if (a.indices[0] < b.indices[0]) {
    out.indices = a.indices;
    out.indices.insert(out.indices.end(), b.indices.begin(), b.indices.end());
  } else {
    out.indices = b.indices;
    out.indices.insert(out.indices.end(), a.indices.begin(), a.indices.end());
  }
  return true;
}

}  // namespace

extern "C" {

// BLAKE2b one-shot with personalization (HashReader / group hash support).
void zktpu_blake2b(const uint8_t* data, size_t len, const uint8_t* person,
                   size_t person_len, uint8_t* out64, size_t outlen) {
  Blake2b h(outlen, person, person_len);
  h.update(data, len);
  h.finalize(out64);
}

// Streaming HashReader: create/update/finalize.
void* zktpu_blake2b_init(size_t outlen, const uint8_t* person,
                         size_t person_len) {
  return new Blake2b(outlen, person, person_len);
}
void zktpu_blake2b_update(void* st, const uint8_t* data, size_t len) {
  ((Blake2b*)st)->update(data, len);
}
void zktpu_blake2b_final(void* st, uint8_t* out) {
  ((Blake2b*)st)->finalize(out);
  delete (Blake2b*)st;
}

// Equihash solution validation (minimal-encoding form).
int zktpu_eh_is_valid(uint32_t n, uint32_t k, const uint8_t* input,
                      size_t input_len, const uint8_t* nonce,
                      size_t nonce_len, const uint8_t* soln,
                      size_t soln_len) {
  EhParams p{n, k};
  if (k >= n || n % 8 != 0) return 0;
  size_t expected = ((size_t)1 << k) * (p.collision_bit_length() + 1) / 8;
  if (soln_len != expected) return 0;
  // indices_from_minimal
  size_t cb = p.collision_bit_length() + 1;
  size_t byte_pad = 4 - (cb + 7) / 8;
  std::vector<uint8_t> expanded;
  expand_array(soln, soln_len, cb, byte_pad, expanded);
  std::vector<uint32_t> indices;
  for (size_t i = 0; i + 4 <= expanded.size(); i += 4) {
    indices.push_back(((uint32_t)expanded[i] << 24) |
                      ((uint32_t)expanded[i + 1] << 16) |
                      ((uint32_t)expanded[i + 2] << 8) |
                      (uint32_t)expanded[i + 3]);
  }
  Blake2b base(p.hash_output(), nullptr, 0);
  {
    // personalization "ZcashPoW" || n || k
    uint8_t person[16];
    memcpy(person, "ZcashPoW", 8);
    for (int i = 0; i < 4; i++) person[8 + i] = (uint8_t)(n >> (8 * i));
    for (int i = 0; i < 4; i++) person[12 + i] = (uint8_t)(k >> (8 * i));
    base = Blake2b(p.hash_output(), person, 16);
  }
  base.update(input, input_len);
  base.update(nonce, nonce_len);
  EhNode root;
  if (!eh_validate(p, base, indices.data(), indices.size(), root)) return 0;
  for (size_t i = 0; i < p.collision_byte_length(); i++)
    if (root.hash[i] != 0) return 0;
  return 1;
}

// Bulk repack: little-endian byte rows -> 12-bit limb rows (int32), the
// fixture-loader hot path (load_data, multiexp.rs:392-440).
void zktpu_bytes_to_limbs(const uint8_t* rows, size_t n_rows,
                          size_t row_bytes, int32_t* out, size_t n_limbs) {
  for (size_t r = 0; r < n_rows; r++) {
    const uint8_t* src = rows + r * row_bytes;
    int32_t* dst = out + r * n_limbs;
    for (size_t l = 0; l < n_limbs; l++) {
      size_t bit = l * 12;
      size_t byte = bit / 8;
      if (byte >= row_bytes) {
        dst[l] = 0;
        continue;
      }
      uint32_t v = src[byte];
      if (byte + 1 < row_bytes) v |= (uint32_t)src[byte + 1] << 8;
      if (byte + 2 < row_bytes) v |= (uint32_t)src[byte + 2] << 16;
      dst[l] = (int32_t)((v >> (bit % 8)) & 0xFFF);
    }
  }
}

void zktpu_limbs_to_bytes(const int32_t* limbs, size_t n_rows, size_t n_limbs,
                          uint8_t* out, size_t row_bytes) {
  for (size_t r = 0; r < n_rows; r++) {
    const int32_t* src = limbs + r * n_limbs;
    uint8_t* dst = out + r * row_bytes;
    memset(dst, 0, row_bytes);
    for (size_t l = 0; l < n_limbs; l++) {
      size_t bit = l * 12;
      uint32_t v = (uint32_t)src[l] & 0xFFF;
      dst[bit / 8] |= (uint8_t)(v << (bit % 8));
      if (bit / 8 + 1 < row_bytes) dst[bit / 8 + 1] |= (uint8_t)(v >> (8 - bit % 8));
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native host Pippenger MSM (BLS12-381 G1/G2).
//
// The reference's CPU multiexp (bellman/src/multiexp.rs:140-232: per-window
// bucket accumulation + suffix sums on a thread pool) is the baseline our
// TPU kernels are scored against; this is the same algorithm as a native
// host component, used (a) standalone as the CPU reference path and (b) as
// the host half of the thesis's proposed hybrid window split
// (tex/Chapters/Chapter7.tex:86): the device sweeps the low scalar windows
// while host threads accumulate the high windows concurrently.
//
// Field: 6x64-bit Montgomery (CIOS with __uint128), constants from the
// standard BLS12-381 parameterization (pairing/src/bls12_381/fq.rs:6-56 —
// there is one correct value).  Points: Jacobian with branchy edge cases
// (fine on a CPU; the branchless-complete constraint is a TPU-lane concern).
// ---------------------------------------------------------------------------

#include <thread>

namespace msm {

typedef unsigned __int128 u128;

static const uint64_t Q[6] = {
    0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static const uint64_t QINV = 0x89f3fffcfffcfffdULL;  // -q^-1 mod 2^64
static const uint64_t R2[6] = {
    0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL, 0x8de5476c4c95b6d5ULL,
    0x67eb88a9939d83c0ULL, 0x9a793e85b519952dULL, 0x11988fe592cae3aaULL};

struct Fq {
  uint64_t l[6];
};

static inline bool fq_is_zero(const Fq& a) {
  uint64_t acc = 0;
  for (int i = 0; i < 6; i++) acc |= a.l[i];
  return acc == 0;
}

static inline bool fq_eq(const Fq& a, const Fq& b) {
  uint64_t acc = 0;
  for (int i = 0; i < 6; i++) acc |= a.l[i] ^ b.l[i];
  return acc == 0;
}

static inline bool fq_gte_q(const Fq& a) {
  for (int i = 5; i >= 0; i--) {
    if (a.l[i] > Q[i]) return true;
    if (a.l[i] < Q[i]) return false;
  }
  return true;  // equal
}

static inline void fq_sub_q(Fq& a) {
  u128 borrow = 0;
  for (int i = 0; i < 6; i++) {
    u128 cur = (u128)a.l[i] - Q[i] - borrow;
    a.l[i] = (uint64_t)cur;
    borrow = (cur >> 64) & 1;
  }
}

static inline void fq_add(Fq& r, const Fq& a, const Fq& b) {
  u128 carry = 0;
  for (int i = 0; i < 6; i++) {
    u128 cur = (u128)a.l[i] + b.l[i] + carry;
    r.l[i] = (uint64_t)cur;
    carry = cur >> 64;
  }
  if (fq_gte_q(r)) fq_sub_q(r);
}

static inline void fq_sub(Fq& r, const Fq& a, const Fq& b) {
  u128 borrow = 0;
  for (int i = 0; i < 6; i++) {
    u128 cur = (u128)a.l[i] - b.l[i] - borrow;
    r.l[i] = (uint64_t)cur;
    borrow = (cur >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 6; i++) {
      u128 cur = (u128)r.l[i] + Q[i] + carry;
      r.l[i] = (uint64_t)cur;
      carry = cur >> 64;
    }
  }
}

static inline void fq_neg(Fq& r, const Fq& a) {
  if (fq_is_zero(a)) {
    r = a;
    return;
  }
  u128 borrow = 0;
  for (int i = 0; i < 6; i++) {
    u128 cur = (u128)Q[i] - a.l[i] - borrow;
    r.l[i] = (uint64_t)cur;
    borrow = (cur >> 64) & 1;
  }
}

static inline void fq_dbl(Fq& r, const Fq& a) { fq_add(r, a, a); }

// CIOS Montgomery multiply: r = a * b * R^-1 mod q.
static inline void fq_mul(Fq& r, const Fq& a, const Fq& b) {
  uint64_t t[6] = {0, 0, 0, 0, 0, 0};
  uint64_t t6 = 0, t7 = 0;
  for (int i = 0; i < 6; i++) {
    u128 carry = 0;
    for (int j = 0; j < 6; j++) {
      u128 cur = (u128)t[j] + (u128)a.l[i] * b.l[j] + carry;
      t[j] = (uint64_t)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t6 + carry;
    t6 = (uint64_t)cur;
    t7 = (uint64_t)(cur >> 64);
    uint64_t m = t[0] * QINV;
    carry = ((u128)t[0] + (u128)m * Q[0]) >> 64;
    for (int j = 1; j < 6; j++) {
      u128 cur2 = (u128)t[j] + (u128)m * Q[j] + carry;
      t[j - 1] = (uint64_t)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t6 + carry;
    t[5] = (uint64_t)cur3;
    t6 = t7 + (uint64_t)(cur3 >> 64);
  }
  for (int i = 0; i < 6; i++) r.l[i] = t[i];
  if (t6 || fq_gte_q(r)) fq_sub_q(r);
}

static inline void fq_sqr(Fq& r, const Fq& a) { fq_mul(r, a, a); }

static inline void fq_to_mont(Fq& r, const Fq& a) {
  Fq rr;
  for (int i = 0; i < 6; i++) rr.l[i] = R2[i];
  fq_mul(r, a, rr);
}

static inline void fq_from_mont(Fq& r, const Fq& a) {
  Fq one = {{1, 0, 0, 0, 0, 0}};
  fq_mul(r, a, one);
}

// Fq2 = Fq[u]/(u^2+1).
struct Fq2 {
  Fq c0, c1;
};

static inline bool fq2_is_zero(const Fq2& a) {
  return fq_is_zero(a.c0) && fq_is_zero(a.c1);
}
static inline bool fq2_eq(const Fq2& a, const Fq2& b) {
  return fq_eq(a.c0, b.c0) && fq_eq(a.c1, b.c1);
}
static inline void fq2_add(Fq2& r, const Fq2& a, const Fq2& b) {
  fq_add(r.c0, a.c0, b.c0);
  fq_add(r.c1, a.c1, b.c1);
}
static inline void fq2_sub(Fq2& r, const Fq2& a, const Fq2& b) {
  fq_sub(r.c0, a.c0, b.c0);
  fq_sub(r.c1, a.c1, b.c1);
}
static inline void fq2_neg(Fq2& r, const Fq2& a) {
  fq_neg(r.c0, a.c0);
  fq_neg(r.c1, a.c1);
}
static inline void fq2_dbl(Fq2& r, const Fq2& a) { fq2_add(r, a, a); }

static inline void fq2_mul(Fq2& r, const Fq2& a, const Fq2& b) {
  // 3-mul Karatsuba with u^2 = -1
  Fq t0, t1, t2, s1, s2;
  fq_mul(t0, a.c0, b.c0);
  fq_mul(t1, a.c1, b.c1);
  fq_add(s1, a.c0, a.c1);
  fq_add(s2, b.c0, b.c1);
  fq_mul(t2, s1, s2);
  fq_sub(r.c0, t0, t1);
  fq_sub(t2, t2, t0);
  fq_sub(r.c1, t2, t1);
}
static inline void fq2_sqr(Fq2& r, const Fq2& a) { fq2_mul(r, a, a); }

// Jacobian point ops over a generic field F (Fq for G1, Fq2 for G2).
template <typename F>
struct Ops;

template <>
struct Ops<Fq> {
  static bool is_zero(const Fq& a) { return fq_is_zero(a); }
  static bool eq(const Fq& a, const Fq& b) { return fq_eq(a, b); }
  static void add(Fq& r, const Fq& a, const Fq& b) { fq_add(r, a, b); }
  static void sub(Fq& r, const Fq& a, const Fq& b) { fq_sub(r, a, b); }
  static void neg(Fq& r, const Fq& a) { fq_neg(r, a); }
  static void dbl(Fq& r, const Fq& a) { fq_dbl(r, a); }
  static void mul(Fq& r, const Fq& a, const Fq& b) { fq_mul(r, a, b); }
  static void sqr(Fq& r, const Fq& a) { fq_sqr(r, a); }
  static void set_zero(Fq& a) { memset(a.l, 0, sizeof(a.l)); }
};

template <>
struct Ops<Fq2> {
  static bool is_zero(const Fq2& a) { return fq2_is_zero(a); }
  static bool eq(const Fq2& a, const Fq2& b) { return fq2_eq(a, b); }
  static void add(Fq2& r, const Fq2& a, const Fq2& b) { fq2_add(r, a, b); }
  static void sub(Fq2& r, const Fq2& a, const Fq2& b) { fq2_sub(r, a, b); }
  static void neg(Fq2& r, const Fq2& a) { fq2_neg(r, a); }
  static void dbl(Fq2& r, const Fq2& a) { fq2_dbl(r, a); }
  static void mul(Fq2& r, const Fq2& a, const Fq2& b) { fq2_mul(r, a, b); }
  static void sqr(Fq2& r, const Fq2& a) { fq2_sqr(r, a); }
  static void set_zero(Fq2& a) { memset(&a, 0, sizeof(a)); }
};

template <typename F>
struct JPoint {
  F x, y, z;  // Jacobian; z == 0 => infinity
  bool is_inf() const { return Ops<F>::is_zero(z); }
};

template <typename F>
static void set_mont_one(F& a);

template <typename F>
struct APoint {
  F x, y;
  bool inf;
};

// dbl-2009-l (a = 0): standard EFD Jacobian doubling.
template <typename F>
static void pt_double(JPoint<F>& p) {
  typedef Ops<F> O;
  if (p.is_inf()) return;
  F a, b, c, d, e, f, t;
  O::sqr(a, p.x);
  O::sqr(b, p.y);
  O::sqr(c, b);
  O::add(d, p.x, b);
  O::sqr(d, d);
  O::sub(d, d, a);
  O::sub(d, d, c);
  O::dbl(d, d);
  O::dbl(e, a);
  O::add(e, e, a);
  O::sqr(f, e);
  O::mul(p.z, p.y, p.z);
  O::dbl(p.z, p.z);
  O::sub(p.x, f, d);
  O::sub(p.x, p.x, d);
  O::sub(t, d, p.x);
  O::mul(t, t, e);
  O::dbl(c, c);
  O::dbl(c, c);
  O::dbl(c, c);
  O::sub(p.y, t, c);
}

// madd-2007-bl mixed addition (acc += affine), with edge cases.
template <typename F>
static void pt_add_mixed(JPoint<F>& p, const F& x2, const F& y2) {
  typedef Ops<F> O;
  if (p.is_inf()) {
    p.x = x2;
    p.y = y2;
    set_mont_one(p.z);
    return;
  }
  F z1z1, u2, s2, h, hh, i, j, r, v, t;
  O::sqr(z1z1, p.z);
  O::mul(u2, x2, z1z1);
  O::mul(s2, y2, p.z);
  O::mul(s2, s2, z1z1);
  if (O::eq(u2, p.x)) {
    if (O::eq(s2, p.y)) {
      pt_double(p);
      return;
    }
    if ([&] {
          F ny;
          O::neg(ny, p.y);
          return O::eq(s2, ny);
        }()) {
      O::set_zero(p.z);
      return;
    }
  }
  O::sub(h, u2, p.x);
  O::sqr(hh, h);
  O::dbl(i, hh);
  O::dbl(i, i);
  O::mul(j, h, i);
  O::sub(r, s2, p.y);
  O::dbl(r, r);
  O::mul(v, p.x, i);
  F x3, y3, z3;
  O::sqr(x3, r);
  O::sub(x3, x3, j);
  O::sub(x3, x3, v);
  O::sub(x3, x3, v);
  O::sub(t, v, x3);
  O::mul(t, t, r);
  O::mul(j, j, p.y);
  O::dbl(j, j);
  O::sub(y3, t, j);
  O::add(z3, p.z, h);
  O::sqr(z3, z3);
  O::sub(z3, z3, z1z1);
  O::sub(z3, z3, hh);
  p.x = x3;
  p.y = y3;
  p.z = z3;
}

// add-2007-bl full Jacobian addition (for suffix sums), with edge cases.
template <typename F>
static void pt_add(JPoint<F>& p, const JPoint<F>& q) {
  typedef Ops<F> O;
  if (q.is_inf()) return;
  if (p.is_inf()) {
    p = q;
    return;
  }
  F z1z1, z2z2, u1, u2, s1, s2, h, i, j, r, v, t;
  O::sqr(z1z1, p.z);
  O::sqr(z2z2, q.z);
  O::mul(u1, p.x, z2z2);
  O::mul(u2, q.x, z1z1);
  O::mul(s1, p.y, q.z);
  O::mul(s1, s1, z2z2);
  O::mul(s2, q.y, p.z);
  O::mul(s2, s2, z1z1);
  if (O::eq(u1, u2)) {
    if (O::eq(s1, s2)) {
      pt_double(p);
      return;
    }
    O::set_zero(p.z);
    return;
  }
  O::sub(h, u2, u1);
  O::dbl(i, h);
  O::sqr(i, i);
  O::mul(j, h, i);
  O::sub(r, s2, s1);
  O::dbl(r, r);
  O::mul(v, u1, i);
  F x3, y3, z3;
  O::sqr(x3, r);
  O::sub(x3, x3, j);
  O::sub(x3, x3, v);
  O::sub(x3, x3, v);
  O::sub(t, v, x3);
  O::mul(t, t, r);
  O::mul(j, j, s1);
  O::dbl(j, j);
  O::sub(y3, t, j);
  O::add(z3, p.z, q.z);
  O::sqr(z3, z3);
  O::sub(z3, z3, z1z1);
  O::sub(z3, z3, z2z2);
  O::mul(z3, z3, h);
  p.x = x3;
  p.y = y3;
  p.z = z3;
}

static const Fq FQ_MONT_ONE = [] {
  Fq one = {{1, 0, 0, 0, 0, 0}};
  Fq r;
  fq_to_mont(r, one);
  return r;
}();

template <typename F>
static void set_mont_one(F& a);
template <>
void set_mont_one<Fq>(Fq& a) {
  a = FQ_MONT_ONE;
}
template <>
void set_mont_one<Fq2>(Fq2& a) {
  a.c0 = FQ_MONT_ONE;
  memset(&a.c1, 0, sizeof(a.c1));
}

template <typename F>
struct Staged {
  std::vector<APoint<F>> pts;
};

// Per-thread window job: bucket-accumulate windows [w_lo, w_hi) of the
// signed-digit matrix and write each window's suffix-summed total.
template <typename F>
static void window_job(const Staged<F>* st, const int8_t* digits, size_t n,
                       size_t w_count, int c, size_t w_lo, size_t w_hi,
                       size_t stride, JPoint<F>* out) {
  size_t nb = (size_t)1 << (c - 1);
  std::vector<JPoint<F>> buckets(nb);
  for (size_t w = w_lo; w < w_hi; w += stride) {
    for (auto& b : buckets) Ops<F>::set_zero(b.z);
    for (size_t i = 0; i < n; i++) {
      int d = digits[i * w_count + w];
      if (d == 0 || st->pts[i].inf) continue;
      const APoint<F>& p = st->pts[i];
      JPoint<F>& b = buckets[(d < 0 ? -d : d) - 1];
      if (d < 0) {
        F ny;
        Ops<F>::neg(ny, p.y);
        pt_add_mixed(b, p.x, ny);
      } else {
        pt_add_mixed(b, p.x, p.y);
      }
    }
    // suffix sums: sum_b b * bucket_b via running + total
    JPoint<F> running, total;
    Ops<F>::set_zero(running.z);
    Ops<F>::set_zero(total.z);
    for (size_t bi = nb; bi > 0; bi--) {
      pt_add(running, buckets[bi - 1]);
      pt_add(total, running);
    }
    out[w] = total;
  }
}

template <typename F>
static void msm_window_sums(const Staged<F>* st, const int8_t* digits,
                            size_t n, size_t w_count, int lo_w, int hi_w,
                            int c, int n_threads, JPoint<F>* out) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> ths;
  for (int t = 0; t < n_threads; t++) {
    ths.emplace_back(window_job<F>, st, digits, n, w_count, c,
                     (size_t)lo_w + t, (size_t)hi_w, (size_t)n_threads, out);
  }
  for (auto& th : ths) th.join();
}

}  // namespace msm

extern "C" {

// Stage G1 affine points (canonical-form u64 limbs, little-endian) into
// Montgomery form.  xs/ys: [n, 6] u64; inf: [n] u8.
void* zktpu_msm_stage_g1(const uint64_t* xs, const uint64_t* ys,
                         const uint8_t* inf, size_t n) {
  auto* st = new msm::Staged<msm::Fq>();
  st->pts.resize(n);
  for (size_t i = 0; i < n; i++) {
    msm::Fq x, y;
    memcpy(x.l, xs + 6 * i, 48);
    memcpy(y.l, ys + 6 * i, 48);
    msm::fq_to_mont(st->pts[i].x, x);
    msm::fq_to_mont(st->pts[i].y, y);
    st->pts[i].inf = inf[i] != 0;
  }
  return st;
}

// Stage G2 affine points: xs/ys are [n, 12] u64 (c0 limbs then c1 limbs).
void* zktpu_msm_stage_g2(const uint64_t* xs, const uint64_t* ys,
                         const uint8_t* inf, size_t n) {
  auto* st = new msm::Staged<msm::Fq2>();
  st->pts.resize(n);
  for (size_t i = 0; i < n; i++) {
    msm::Fq t;
    memcpy(t.l, xs + 12 * i, 48);
    msm::fq_to_mont(st->pts[i].x.c0, t);
    memcpy(t.l, xs + 12 * i + 6, 48);
    msm::fq_to_mont(st->pts[i].x.c1, t);
    memcpy(t.l, ys + 12 * i, 48);
    msm::fq_to_mont(st->pts[i].y.c0, t);
    memcpy(t.l, ys + 12 * i + 6, 48);
    msm::fq_to_mont(st->pts[i].y.c1, t);
    st->pts[i].inf = inf[i] != 0;
  }
  return st;
}

void zktpu_msm_free_g1(void* st) { delete (msm::Staged<msm::Fq>*)st; }
void zktpu_msm_free_g2(void* st) { delete (msm::Staged<msm::Fq2>*)st; }

// Window sums for windows [lo_w, hi_w) of a SIGNED digit matrix
// [n, w_count] (int8, |d| <= 2^(c-1)).  out: [w_count, 3, 6] u64 Jacobian
// coords in CANONICAL form (only rows lo_w..hi_w-1 written; z == 0 means
// infinity).
void zktpu_msm_g1_window_sums(void* stp, const int8_t* digits, size_t n,
                              size_t w_count, int lo_w, int hi_w, int c,
                              int n_threads, uint64_t* out) {
  auto* st = (msm::Staged<msm::Fq>*)stp;
  std::vector<msm::JPoint<msm::Fq>> sums(w_count);
  msm::msm_window_sums(st, digits, n, w_count, lo_w, hi_w, c, n_threads,
                       sums.data());
  for (int w = lo_w; w < hi_w; w++) {
    msm::Fq x, y, z;
    msm::fq_from_mont(x, sums[w].x);
    msm::fq_from_mont(y, sums[w].y);
    msm::fq_from_mont(z, sums[w].z);
    memcpy(out + 18 * w, x.l, 48);
    memcpy(out + 18 * w + 6, y.l, 48);
    memcpy(out + 18 * w + 12, z.l, 48);
  }
}

// Same for G2; out rows are [3, 12] u64 (c0 then c1 per coordinate).
void zktpu_msm_g2_window_sums(void* stp, const int8_t* digits, size_t n,
                              size_t w_count, int lo_w, int hi_w, int c,
                              int n_threads, uint64_t* out) {
  auto* st = (msm::Staged<msm::Fq2>*)stp;
  std::vector<msm::JPoint<msm::Fq2>> sums(w_count);
  msm::msm_window_sums(st, digits, n, w_count, lo_w, hi_w, c, n_threads,
                       sums.data());
  for (int w = lo_w; w < hi_w; w++) {
    msm::Fq t;
    uint64_t* row = out + 36 * w;
    msm::fq_from_mont(t, sums[w].x.c0);
    memcpy(row, t.l, 48);
    msm::fq_from_mont(t, sums[w].x.c1);
    memcpy(row + 6, t.l, 48);
    msm::fq_from_mont(t, sums[w].y.c0);
    memcpy(row + 12, t.l, 48);
    msm::fq_from_mont(t, sums[w].y.c1);
    memcpy(row + 18, t.l, 48);
    msm::fq_from_mont(t, sums[w].z.c0);
    memcpy(row + 24, t.l, 48);
    msm::fq_from_mont(t, sums[w].z.c1);
    memcpy(row + 30, t.l, 48);
  }
}


// Single scalar multiplication (the prover's blinding algebra: s*g_a,
// r*g_b1 and the delta muls, prover.rs:326-354 — a handful per proof, so
// the python-int wNAF path's ~120 us-per-add modinv arithmetic cost
// ~0.24 s/proof; this double-and-add runs in ~0.3 ms).  Inputs canonical
// affine + 4x64-bit scalar; output canonical Jacobian (z=0 => infinity).
void zktpu_g1_mul(const uint64_t* x, const uint64_t* y, const uint64_t* k,
                  uint64_t* out) {
  msm::Fq ax, ay;
  memcpy(ax.l, x, 48);
  memcpy(ay.l, y, 48);
  msm::APoint<msm::Fq> p;
  msm::fq_to_mont(p.x, ax);
  msm::fq_to_mont(p.y, ay);
  msm::JPoint<msm::Fq> acc;
  msm::Ops<msm::Fq>::set_zero(acc.z);
  for (int bit = 255; bit >= 0; bit--) {
    msm::pt_double(acc);
    if ((k[bit / 64] >> (bit % 64)) & 1) msm::pt_add_mixed(acc, p.x, p.y);
  }
  msm::Fq cx, cy, cz;
  msm::fq_from_mont(cx, acc.x);
  msm::fq_from_mont(cy, acc.y);
  msm::fq_from_mont(cz, acc.z);
  memcpy(out, cx.l, 48);
  memcpy(out + 6, cy.l, 48);
  memcpy(out + 12, cz.l, 48);
}

void zktpu_g2_mul(const uint64_t* x, const uint64_t* y, const uint64_t* k,
                  uint64_t* out) {
  msm::Fq t;
  msm::APoint<msm::Fq2> p;
  memcpy(t.l, x, 48);
  msm::fq_to_mont(p.x.c0, t);
  memcpy(t.l, x + 6, 48);
  msm::fq_to_mont(p.x.c1, t);
  memcpy(t.l, y, 48);
  msm::fq_to_mont(p.y.c0, t);
  memcpy(t.l, y + 6, 48);
  msm::fq_to_mont(p.y.c1, t);
  msm::JPoint<msm::Fq2> acc;
  msm::Ops<msm::Fq2>::set_zero(acc.z);
  for (int bit = 255; bit >= 0; bit--) {
    msm::pt_double(acc);
    if ((k[bit / 64] >> (bit % 64)) & 1) msm::pt_add_mixed(acc, p.x, p.y);
  }
  const msm::Fq2* cs[3] = {&acc.x, &acc.y, &acc.z};
  for (int i = 0; i < 3; i++) {
    msm::fq_from_mont(t, cs[i]->c0);
    memcpy(out + 12 * i, t.l, 48);
    msm::fq_from_mont(t, cs[i]->c1);
    memcpy(out + 12 * i + 6, t.l, 48);
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Witness-tape interpreter.
//
// The reference's witness generation is compiled Rust inside create_proof
// (bellman/src/groth16/prover.rs:84-190,226) and costs milliseconds; the
// python gadget walk is this framework's only interpreted host stage.  The
// tape recorded once per circuit shape (zcash_gpu_thesis_tpu/wv.py) replays
// here as a flat op stream over Fr (4x64 Montgomery via double-REDC for
// mul; binary extended-gcd inverse), emitting the canonical 12-bit-limb
// assignment array the device pipeline uploads directly.
// ---------------------------------------------------------------------------

#include <vector>

namespace tape {

typedef unsigned __int128 u128;

static const uint64_t RMOD[4] = {
    0xffffffff00000001ULL, 0x53bda402fffe5bfeULL,
    0x3339d80809a1d805ULL, 0x73eda753299d7d48ULL};
static const uint64_t RINV = 0xfffffffeffffffffULL;  // -r^-1 mod 2^64
static const uint64_t RR2[4] = {                     // 2^512 mod r
    0xc999e990f3f29c6dULL, 0x2b6cedcb87925c23ULL,
    0x05d314967254398fULL, 0x0748d9d99f59ff11ULL};

struct Fr {
  uint64_t l[4];
};

static inline bool fr_is_zero(const Fr& a) {
  return (a.l[0] | a.l[1] | a.l[2] | a.l[3]) == 0;
}

static inline bool fr_is_one(const Fr& a) {
  return a.l[0] == 1 && (a.l[1] | a.l[2] | a.l[3]) == 0;
}

static inline int fr_cmp(const Fr& a, const Fr& b) {
  for (int i = 3; i >= 0; i--) {
    if (a.l[i] != b.l[i]) return a.l[i] < b.l[i] ? -1 : 1;
  }
  return 0;
}

static inline bool fr_gte_r(const Fr& a) {
  for (int i = 3; i >= 0; i--) {
    if (a.l[i] != RMOD[i]) return a.l[i] > RMOD[i];
  }
  return true;
}

static inline void fr_sub_r(Fr& a) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 cur = (u128)a.l[i] - RMOD[i] - borrow;
    a.l[i] = (uint64_t)cur;
    borrow = (cur >> 64) ? 1 : 0;
  }
}

static inline void fr_add(Fr& r, const Fr& a, const Fr& b) {
  u128 carry = 0;
  for (int i = 0; i < 4; i++) {
    u128 cur = (u128)a.l[i] + b.l[i] + carry;
    r.l[i] = (uint64_t)cur;
    carry = cur >> 64;
  }
  if (carry || fr_gte_r(r)) fr_sub_r(r);
}

static inline void fr_sub(Fr& r, const Fr& a, const Fr& b) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 cur = (u128)a.l[i] - b.l[i] - borrow;
    r.l[i] = (uint64_t)cur;
    borrow = (cur >> 64) ? 1 : 0;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
      u128 cur = (u128)r.l[i] + RMOD[i] + carry;
      r.l[i] = (uint64_t)cur;
      carry = cur >> 64;
    }
  }
}

static inline void fr_neg(Fr& r, const Fr& a) {
  if (fr_is_zero(a)) {
    r = a;
    return;
  }
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 cur = (u128)RMOD[i] - a.l[i] - borrow;
    r.l[i] = (uint64_t)cur;
    borrow = (cur >> 64) ? 1 : 0;
  }
}

// CIOS Montgomery product a*b*2^-256 mod r.
static inline void fr_mont_mul(Fr& r, const Fr& a, const Fr& b) {
  uint64_t t[4] = {0, 0, 0, 0};
  uint64_t t4 = 0, t5 = 0;
  for (int i = 0; i < 4; i++) {
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 cur = (u128)t[j] + (u128)a.l[i] * b.l[j] + carry;
      t[j] = (uint64_t)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t4 + carry;
    t4 = (uint64_t)cur;
    t5 = (uint64_t)(cur >> 64);
    uint64_t m = t[0] * RINV;
    carry = ((u128)t[0] + (u128)m * RMOD[0]) >> 64;
    for (int j = 1; j < 4; j++) {
      u128 cur2 = (u128)t[j] + (u128)m * RMOD[j] + carry;
      t[j - 1] = (uint64_t)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t4 + carry;
    t[3] = (uint64_t)cur3;
    t4 = t5 + (uint64_t)(cur3 >> 64);
  }
  for (int i = 0; i < 4; i++) r.l[i] = t[i];
  if (t4 || fr_gte_r(r)) fr_sub_r(r);
}

// canonical a*b mod r: REDC twice (the second against 2^512 mod r)
static inline void fr_mul(Fr& r, const Fr& a, const Fr& b) {
  Fr t, rr;
  for (int i = 0; i < 4; i++) rr.l[i] = RR2[i];
  fr_mont_mul(t, a, b);
  fr_mont_mul(r, t, rr);
}

static inline void shr1_carry(Fr& a, uint64_t carry_in) {
  for (int i = 0; i < 3; i++) a.l[i] = (a.l[i] >> 1) | (a.l[i + 1] << 63);
  a.l[3] = (a.l[3] >> 1) | (carry_in << 63);
}

// binary extended gcd inverse (canonical in/out); a must be nonzero
static inline void fr_inv(Fr& out, const Fr& a) {
  Fr u = a, v, x1, x2;
  for (int i = 0; i < 4; i++) v.l[i] = RMOD[i];
  x1.l[0] = 1;
  x1.l[1] = x1.l[2] = x1.l[3] = 0;
  x2.l[0] = x2.l[1] = x2.l[2] = x2.l[3] = 0;
  while (!fr_is_one(u) && !fr_is_one(v)) {
    while ((u.l[0] & 1) == 0) {
      shr1_carry(u, 0);
      if (x1.l[0] & 1) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
          u128 cur = (u128)x1.l[i] + RMOD[i] + carry;
          x1.l[i] = (uint64_t)cur;
          carry = cur >> 64;
        }
        shr1_carry(x1, (uint64_t)carry);
      } else {
        shr1_carry(x1, 0);
      }
    }
    while ((v.l[0] & 1) == 0) {
      shr1_carry(v, 0);
      if (x2.l[0] & 1) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
          u128 cur = (u128)x2.l[i] + RMOD[i] + carry;
          x2.l[i] = (uint64_t)cur;
          carry = cur >> 64;
        }
        shr1_carry(x2, (uint64_t)carry);
      } else {
        shr1_carry(x2, 0);
      }
    }
    if (fr_cmp(u, v) >= 0) {
      u128 borrow = 0;
      for (int i = 0; i < 4; i++) {
        u128 cur = (u128)u.l[i] - v.l[i] - borrow;
        u.l[i] = (uint64_t)cur;
        borrow = (cur >> 64) ? 1 : 0;
      }
      fr_sub(x1, x1, x2);
    } else {
      u128 borrow = 0;
      for (int i = 0; i < 4; i++) {
        u128 cur = (u128)v.l[i] - u.l[i] - borrow;
        v.l[i] = (uint64_t)cur;
        borrow = (cur >> 64) ? 1 : 0;
      }
      fr_sub(x2, x2, x1);
    }
  }
  out = fr_is_one(u) ? x1 : x2;
}

}  // namespace tape

namespace tape {

static inline void emit_limbs(const Fr& x, int16_t* o) {
  for (int j = 0; j < 24; j++) {
    const int bitpos = 12 * j;
    const int w = bitpos >> 6, r = bitpos & 63;
    uint64_t val = w < 4 ? x.l[w] >> r : 0;
    if (r > 52 && w + 1 < 4) val |= x.l[w + 1] << (64 - r);
    o[j] = (int16_t)(val & 0xFFF);
  }
}

static void batch_inv(std::vector<Fr>& v, const int32_t* a, size_t i0,
                      size_t i1, int& zdiv);

// Opcode numbering mirrors zcash_gpu_thesis_tpu/wv.py.
static int tape_exec(const uint8_t* op, const int32_t* a, const int32_t* b,
                     const int32_t* c, const int16_t* aux, size_t n_ops,
                     const uint64_t* consts, const uint64_t* leaves,
                     std::vector<Fr>& v) {
  int zdiv = 0;
  for (size_t i = 0; i < n_ops; i++) {
    if (op[i] == 6) {
      // batch a run of INDEPENDENT adjacent inversions (operands all
      // before the run start; depth-sorted tapes group them)
      size_t j = i;
      while (j < n_ops && op[j] == 6 && (size_t)a[j] < i) j++;
      if (j > i + 1) {
        batch_inv(v, a, i, j, zdiv);
        i = j - 1;
        continue;
      }
    }
    Fr& o = v[i];
    const int32_t ai = a[i], bi = b[i], ci = c[i];
    const int sh = aux[i];
    switch (op[i]) {
      case 0:  // CONST
        memcpy(o.l, consts + 4 * (size_t)ai, 32);
        break;
      case 1:  // INPUT
        memcpy(o.l, leaves + 4 * (size_t)ai, 32);
        break;
      case 2:
        tape::fr_add(o, v[ai], v[bi]);
        break;
      case 3:
        tape::fr_sub(o, v[ai], v[bi]);
        break;
      case 4:
        tape::fr_mul(o, v[ai], v[bi]);
        break;
      case 5:
        tape::fr_neg(o, v[ai]);
        break;
      case 6:  // INV: 0 -> 0 with the zero-division flag
        if (tape::fr_is_zero(v[ai])) {
          zdiv = 1;
          o = v[ai];
        } else {
          tape::fr_inv(o, v[ai]);
        }
        break;
      case 7: {  // BIT
        const int w = sh >> 6;
        o.l[0] = w < 4 ? (v[ai].l[w] >> (sh & 63)) & 1 : 0;
        o.l[1] = o.l[2] = o.l[3] = 0;
        break;
      }
      case 8:  // SELECT (c ? a : b)
        o = tape::fr_is_zero(v[ci]) ? v[bi] : v[ai];
        break;
      case 9:
        for (int k = 0; k < 4; k++) o.l[k] = v[ai].l[k] ^ v[bi].l[k];
        break;
      case 10:
        for (int k = 0; k < 4; k++) o.l[k] = v[ai].l[k] & v[bi].l[k];
        break;
      case 11:  // ANDN (0/1 domain): a & ~b
        for (int k = 0; k < 4; k++) o.l[k] = v[ai].l[k] & ~v[bi].l[k];
        break;
      case 12:  // NOR
        o.l[0] = (tape::fr_is_zero(v[ai]) && tape::fr_is_zero(v[bi])) ? 1 : 0;
        o.l[1] = o.l[2] = o.l[3] = 0;
        break;
      case 13:  // NOT1
        o.l[0] = 1 - v[ai].l[0];
        o.l[1] = o.l[2] = o.l[3] = 0;
        break;
      case 14:
        for (int k = 0; k < 4; k++) o.l[k] = v[ai].l[k] | v[bi].l[k];
        break;
      case 15: {  // SHR
        const int w = sh >> 6, r = sh & 63;
        for (int k = 0; k < 4; k++) {
          uint64_t lo = (k + w < 4) ? v[ai].l[k + w] : 0;
          uint64_t hi = (r && k + w + 1 < 4) ? v[ai].l[k + w + 1] : 0;
          o.l[k] = r ? (lo >> r) | (hi << (64 - r)) : lo;
        }
        break;
      }
      case 16: {  // ROTR32
        const uint32_t x = (uint32_t)v[ai].l[0];
        o.l[0] = sh ? ((x >> sh) | (x << (32 - sh))) : x;
        o.l[1] = o.l[2] = o.l[3] = 0;
        break;
      }
      case 17: {  // CH32
        const uint32_t x = (uint32_t)v[ai].l[0], y = (uint32_t)v[bi].l[0],
                       z = (uint32_t)v[ci].l[0];
        o.l[0] = (x & y) ^ (~x & z);
        o.l[1] = o.l[2] = o.l[3] = 0;
        break;
      }
      case 18: {  // MAJ32
        const uint32_t x = (uint32_t)v[ai].l[0], y = (uint32_t)v[bi].l[0],
                       z = (uint32_t)v[ci].l[0];
        o.l[0] = (x & y) ^ (x & z) ^ (y & z);
        o.l[1] = o.l[2] = o.l[3] = 0;
        break;
      }
      case 19:  // ISNZ
        o.l[0] = tape::fr_is_zero(v[ai]) ? 0 : 1;
        o.l[1] = o.l[2] = o.l[3] = 0;
        break;
      case 20:  // MASK64
        o.l[0] = v[ai].l[0];
        o.l[1] = o.l[2] = o.l[3] = 0;
        break;
      default:
        return 2;
    }
  }
  return zdiv;
}


// Montgomery batch inversion over a run of independent INV ops
// (depth-sorted tapes make them adjacent): 3 muls per element + ONE
// EGCD per run, bit-identical outputs.  Zero inputs yield 0 and set
// the zero-division flag (matching the single-op semantics).
static void batch_inv(std::vector<Fr>& v, const int32_t* a, size_t i0,
                      size_t i1, int& zdiv) {
  const size_t m = i1 - i0;
  std::vector<Fr> pre(m);
  std::vector<uint8_t> isz(m);
  Fr acc;
  acc.l[0] = 1;
  acc.l[1] = acc.l[2] = acc.l[3] = 0;
  for (size_t k = 0; k < m; k++) {
    const Fr& x = v[a[i0 + k]];
    isz[k] = fr_is_zero(x) ? 1 : 0;
    pre[k] = acc;
    if (isz[k]) {
      zdiv = 1;
    } else {
      fr_mul(acc, acc, x);
    }
  }
  Fr inv_all;
  fr_inv(inv_all, acc);  // product of nonzeros (1 if none) — never 0
  for (size_t k = m; k-- > 0;) {
    Fr& o = v[i0 + k];
    if (isz[k]) {
      o.l[0] = o.l[1] = o.l[2] = o.l[3] = 0;
      continue;
    }
    const Fr x = v[a[i0 + k]];
    fr_mul(o, inv_all, pre[k]);
    fr_mul(inv_all, inv_all, x);
  }
}

}  // namespace tape

extern "C" {

int zktpu_tape_run(const uint8_t* op, const int32_t* a, const int32_t* b,
                   const int32_t* c, const int16_t* aux, size_t n_ops,
                   const uint64_t* consts, size_t n_consts,
                   const uint64_t* leaves, size_t n_leaves,
                   const int32_t* slots, size_t n_slots,
                   int16_t* out_limbs) {
  using tape::Fr;
  (void)n_consts;
  (void)n_leaves;
  std::vector<Fr> v(n_ops);
  int rc = tape::tape_exec(op, a, b, c, aux, n_ops, consts, leaves, v);
  if (rc > 1) return rc;
  for (size_t s = 0; s < n_slots; s++)
    tape::emit_limbs(v[slots[s]], out_limbs + s * 24);
  return rc;
}

// Split-output replay: the full wire limb array (for the host hybrid
// MSM digit planes; pass full_limbs=NULL to skip), the provably-boolean
// wires as one bit each, and the non-boolean sidecar as limbs — the
// upload form for bit-dominated circuits (Sprout).
int zktpu_tape_run_split(
    const uint8_t* op, const int32_t* a, const int32_t* b,
    const int32_t* c, const int16_t* aux, size_t n_ops,
    const uint64_t* consts, size_t n_consts,
    const uint64_t* leaves, size_t n_leaves,
    const int32_t* full_slots, size_t n_full, int16_t* full_limbs,
    const int32_t* bit_slots, size_t n_bit, uint8_t* bits_out,
    const int32_t* nonbit_slots, size_t n_nonbit, int16_t* nonbit_limbs) {
  using tape::Fr;
  (void)n_consts;
  (void)n_leaves;
  std::vector<Fr> v(n_ops);
  int rc = tape::tape_exec(op, a, b, c, aux, n_ops, consts, leaves, v);
  if (rc > 1) return rc;
  if (full_limbs != nullptr) {
    for (size_t s = 0; s < n_full; s++)
      tape::emit_limbs(v[full_slots[s]], full_limbs + s * 24);
  }
  for (size_t s = 0; s < n_bit; s++)
    bits_out[s] = (uint8_t)(v[bit_slots[s]].l[0] & 1);
  for (size_t s = 0; s < n_nonbit; s++)
    tape::emit_limbs(v[nonbit_slots[s]], nonbit_limbs + s * 24);
  return rc;
}

}  // extern "C"
