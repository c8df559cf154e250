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
