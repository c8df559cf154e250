"""Host-side Sprout primitives: raw SHA-256 compression, the four PRFs,
note commitments and the incremental merkle layer hash.

The reference computes these inside the JoinSplit circuit only
(sapling-crypto sprout/mod.rs + prfs.rs/commitment.rs, reached from
``librustzcash_sprout_prove``, rustzcash.rs:945-1090); the host versions
here produce the *public inputs* a verifier needs (nullifiers, macs,
commitments) and independently cross-check the circuit's hash gadgets
(tests/test_sprout_primitives.py).

Bit conventions follow the circuit exactly: byte strings are consumed
MSB-first per byte; u252 values skip the first four bits of their first
byte; the PRF tag bits (a, b, c, d) occupy the first byte's top nibble
(circuits/sprout.py:80-106).
"""

from __future__ import annotations

import hashlib
import struct

_K = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]

SHA256_IV = (0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
             0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)

_M32 = 0xFFFFFFFF


def _rotr(x, n):
    return ((x >> n) | (x << (32 - n))) & _M32


def sha256_compress(block: bytes, state=SHA256_IV) -> bytes:
    """One raw SHA-256 compression (NO length padding) of a 64-byte block
    — the circuit's ``sha256_block_no_padding`` (sha256.rs)."""
    assert len(block) == 64
    w = list(struct.unpack(">16I", block))
    for i in range(16, 64):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & _M32)
    a, b, c, d, e, f, g, h = state
    for i in range(64):
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = (h + s1 + ch + _K[i] + w[i]) & _M32
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (s0 + maj) & _M32
        a, b, c, d, e, f, g, h = (
            (t1 + t2) & _M32, a, b, c, (d + t1) & _M32, e, f, g,
        )
    out = tuple((x + y) & _M32 for x, y in zip((a, b, c, d, e, f, g, h),
                                               state))
    return struct.pack(">8I", *out)


def _prf(a: bool, b: bool, c: bool, d: bool, x: bytes, y: bytes) -> bytes:
    """PRF block layout (prfs.rs): tag nibble a b c d, then the low nibble
    of x's first byte (x is u252 — its top four bits are skipped), then
    x[1:], then all of y."""
    assert len(x) == 32 and len(y) == 32
    lead = ((a << 7) | (b << 6) | (c << 5) | (d << 4)) | (x[0] & 0x0F)
    return sha256_compress(bytes([lead]) + x[1:] + y)


def prf_a_pk(a_sk: bytes) -> bytes:
    return _prf(True, True, False, False, a_sk, b"\x00" * 32)


def prf_nf(a_sk: bytes, rho: bytes) -> bytes:
    return _prf(True, True, True, False, a_sk, rho)


def prf_pk(a_sk: bytes, h_sig: bytes, nonce: bool) -> bytes:
    return _prf(False, nonce, False, False, a_sk, h_sig)


def prf_rho(phi: bytes, h_sig: bytes, nonce: bool) -> bytes:
    return _prf(False, nonce, True, False, phi, h_sig)


def note_comm(a_pk: bytes, value: int, rho: bytes, r: bytes) -> bytes:
    """Sprout note commitment: full SHA-256 of
    0xB0 || a_pk || value (LE u64) || rho || r (commitment.rs; the
    circuit's bits_le() emits exactly the little-endian bytes)."""
    image = b"\xb0" + a_pk + value.to_bytes(8, "little") + rho + r
    return hashlib.sha256(image).digest()


def merkle_combine(left: bytes, right: bytes) -> bytes:
    """One incremental-merkle layer: raw compression of left || right."""
    return sha256_compress(left + right)


def uncommitted() -> bytes:
    """Sprout empty leaf (IncrementalMerkleTree::empty_root depth 0)."""
    return bytes(32)
