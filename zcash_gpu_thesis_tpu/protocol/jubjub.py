"""Jubjub embedded curve + Sapling group hashes + Pedersen hash (host).

Re-design of ``sapling-crypto/src/jubjub/{mod,edwards,montgomery,fs}.rs``,
``group_hash.rs`` and ``pedersen_hash.rs``.  Jubjub is the twisted Edwards
curve -x^2 + y^2 = 1 + d x^2 y^2 over Fr (the BLS12-381 scalar field) with
d = -(10240/10241), birationally equivalent to the Montgomery curve
y^2 = x^3 + 40962 x^2 + x; scalar field Fs (252 bits, cofactor 8).

This is witness-side scalar code — it runs on the host exactly where the
reference runs it on the CPU (circuit synthesis / note crypto); the
in-circuit versions are the ``circuits.ecc`` gadgets.

All arithmetic is python ints mod r; points are affine (x, y) tuples —
(0, 1) is the Edwards identity, Montgomery infinity is ``None``.
"""

from __future__ import annotations

import functools
import hashlib

from ..constants import R as FR  # Jubjub's base field = BLS12-381 Fr
from ..constants import modinv

# Scalar field of Jubjub (fs.rs:8): 252 bits, 2-adicity S = 1.
FS = 0x0E7DB4EA6533AFA906673B0101343B00A6682093CCC81082D0970E5ED6F72CB7

# Edwards d = -(10240/10241) mod r (jubjub/mod.rs:196).
EDWARDS_D = (-10240 * modinv(10241, FR)) % FR
assert EDWARDS_D == 19257038036680949359750312669786877991949435402254120286184196891950884077233

MONTGOMERY_A = 40962
# scale = sqrt(4 / (a - d)) with a = -1 (jubjub/mod.rs:203).
MONTGOMERY_SCALE = 17814886934372412843466061268024708274627479829237077604635722030778476050649

# BLAKE2s personalizations (sapling-crypto/src/constants.rs).
GH_FIRST_BLOCK = b"096b36a5804bfacef1691e173c366a47ff5ba84a44f26ddd7e8d9f79d5b42df0"
CRH_IVK_PERSONALIZATION = b"Zcashivk"
PRF_NF_PERSONALIZATION = b"Zcash_nf"
PEDERSEN_HASH_GENERATORS_PERSONALIZATION = b"Zcash_PH"
KEY_DIVERSIFICATION_PERSONALIZATION = b"Zcash_gd"
SPENDING_KEY_GENERATOR_PERSONALIZATION = b"Zcash_G_"
PROOF_GENERATION_KEY_BASE_GENERATOR_PERSONALIZATION = b"Zcash_H_"
VALUE_COMMITMENT_GENERATOR_PERSONALIZATION = b"Zcash_cv"
NULLIFIER_POSITION_IN_TREE_GENERATOR_PERSONALIZATION = b"Zcash_J_"

# FixedGenerators enum (jubjub/mod.rs:57-86).
PROOF_GENERATION_KEY = 0
NOTE_COMMITMENT_RANDOMNESS = 1
NULLIFIER_POSITION = 2
VALUE_COMMITMENT_VALUE = 3
VALUE_COMMITMENT_RANDOMNESS = 4
SPENDING_KEY_GENERATOR = 5
MAX_FIXED_GENERATOR = 6

PEDERSEN_HASH_CHUNKS_PER_GENERATOR = 63
FIXED_BASE_CHUNKS_PER_GENERATOR = 84
PEDERSEN_HASH_EXP_WINDOW_SIZE = 8


# -- Fr sqrt (Tonelli–Shanks; r-1 = 2^32 * odd) ------------------------------


def _sqrt_fr(a: int):
    a %= FR
    if a == 0:
        return 0
    if pow(a, (FR - 1) // 2, FR) != 1:
        return None
    # Tonelli–Shanks
    s, q = 0, FR - 1
    while q % 2 == 0:
        s += 1
        q //= 2
    z = 5  # quadratic non-residue mod r (the Fr generator 7 is a QR? use search)
    while pow(z, (FR - 1) // 2, FR) == 1:
        z += 1
    m, c, t, rr = s, pow(z, q, FR), pow(a, q, FR), pow(a, (q + 1) // 2, FR)
    while t != 1:
        i, tmp = 0, t
        while tmp != 1:
            tmp = tmp * tmp % FR
            i += 1
        b = pow(c, 1 << (m - i - 1), FR)
        m, c = i, b * b % FR
        t = t * c % FR
        rr = rr * b % FR
    return rr


# -- Edwards affine group law (complete; edwards.rs) -------------------------

ZERO = (0, 1)


def edwards_add(p, q):
    x1, y1 = p
    x2, y2 = q
    prod = EDWARDS_D * x1 % FR * x2 % FR * y1 % FR * y2 % FR
    x3 = (x1 * y2 + y1 * x2) * modinv((1 + prod) % FR, FR) % FR
    y3 = (y1 * y2 + x1 * x2) * modinv((1 - prod) % FR, FR) % FR
    return (x3, y3)


def edwards_double(p):
    return edwards_add(p, p)


def edwards_neg(p):
    return ((-p[0]) % FR, p[1])


def edwards_mul(p, k: int):
    k = int(k)
    acc = ZERO
    while k:
        if k & 1:
            acc = edwards_add(acc, p)
        p = edwards_add(p, p)
        k >>= 1
    return acc


def on_curve(p) -> bool:
    x, y = p
    lhs = (-x * x + y * y) % FR
    rhs = (1 + EDWARDS_D * x % FR * x % FR * y % FR * y) % FR
    return lhs == rhs


# -- codecs (edwards.rs read/write: 32-byte LE y with x-sign top bit) --------


def point_write(p) -> bytes:
    x, y = p
    v = y | ((x & 1) << 255)
    return v.to_bytes(32, "little")


def point_read(b: bytes):
    """None if not a valid point (edwards.rs:93-117)."""
    v = int.from_bytes(b, "little")
    sign = bool(v >> 255)
    y = v & ((1 << 255) - 1)
    if y >= FR:
        return None
    return get_for_y(y, sign)


def get_for_y(y: int, sign: bool):
    """Solve x^2 = (y^2 - 1) / (d y^2 + 1) (edwards.rs:119-160)."""
    num = (y * y - 1) % FR
    den = (EDWARDS_D * y % FR * y + 1) % FR
    x2 = num * modinv(den, FR) % FR
    x = _sqrt_fr(x2)
    if x is None:
        return None
    if bool(x & 1) != sign:
        x = (FR - x) % FR
    return (x, y)


# -- Montgomery form (montgomery.rs; circuit generators use these coords) ----


def montgomery_from_edwards(p):
    """(x, y) -> (u, v) = ((1+y)/(1-y), scale*(1+y)/((1-y)x)); None = inf."""
    x, y = p
    if y == 1 and x == 0:
        return None
    if x == 0:  # (0, -1), the order-2 point
        return (0, 0)
    u = (1 + y) * modinv((1 - y) % FR, FR) % FR
    v = u * modinv(x, FR) % FR * MONTGOMERY_SCALE % FR
    return (u, v)


def edwards_from_montgomery(p):
    if p is None:
        return ZERO
    u, v = p
    if v == 0:  # (0, 0) order-2 -> (0, -1)
        return (0, (FR - 1) % FR)
    x = MONTGOMERY_SCALE * u % FR * modinv(v, FR) % FR
    y = (u - 1) * modinv((u + 1) % FR, FR) % FR
    return (x, y)


def montgomery_add(p, q):
    """Montgomery affine chord/tangent (montgomery.rs add)."""
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if y1 != y2 or y1 == 0:
            return None
        lam = (3 * x1 * x1 + 2 * MONTGOMERY_A * x1 + 1) * modinv(2 * y1 % FR, FR) % FR
    else:
        lam = (y2 - y1) * modinv((x2 - x1) % FR, FR) % FR
    x3 = (lam * lam - MONTGOMERY_A - x1 - x2) % FR
    y3 = (lam * (x1 - x3) - y1) % FR
    return (x3, y3)


def montgomery_on_curve(p) -> bool:
    if p is None:
        return True
    x, y = p
    return (y * y - (x * x % FR * x + MONTGOMERY_A * x % FR * x + x)) % FR == 0


# -- group hash (group_hash.rs) ----------------------------------------------


def group_hash(tag: bytes, personalization: bytes):
    """BLAKE2s -> point -> *8; None if invalid or identity."""
    assert len(personalization) == 8
    h = hashlib.blake2s(person=personalization)
    h.update(GH_FIRST_BLOCK)
    h.update(tag)
    p = point_read(h.digest())
    if p is None:
        return None
    p = edwards_mul(p, 8)  # cofactor
    if p == ZERO:
        return None
    return p


def find_group_hash(m: bytes, personalization: bytes):
    """Increment a trailing counter byte until the hash lands on the curve
    (jubjub/mod.rs find_group_hash)."""
    tag = bytearray(m)
    tag.append(0)
    while True:
        gh = group_hash(bytes(tag), personalization)
        assert tag[-1] != 255
        tag[-1] += 1
        if gh is not None:
            return gh


# -- parameters (JubjubBls12::new, jubjub/mod.rs:190-420) --------------------


@functools.lru_cache(maxsize=1)
class JubjubParams:
    def __init__(self):
        self.pedersen_hash_generators = [
            find_group_hash(
                m.to_bytes(4, "little"),
                PEDERSEN_HASH_GENERATORS_PERSONALIZATION,
            )
            for m in range(5)
        ]
        self.fixed_base_generators = [None] * MAX_FIXED_GENERATOR
        fb = self.fixed_base_generators
        fb[PROOF_GENERATION_KEY] = find_group_hash(
            b"", PROOF_GENERATION_KEY_BASE_GENERATOR_PERSONALIZATION)
        fb[NOTE_COMMITMENT_RANDOMNESS] = find_group_hash(
            b"r", PEDERSEN_HASH_GENERATORS_PERSONALIZATION)
        fb[NULLIFIER_POSITION] = find_group_hash(
            b"", NULLIFIER_POSITION_IN_TREE_GENERATOR_PERSONALIZATION)
        fb[VALUE_COMMITMENT_VALUE] = find_group_hash(
            b"v", VALUE_COMMITMENT_GENERATOR_PERSONALIZATION)
        fb[VALUE_COMMITMENT_RANDOMNESS] = find_group_hash(
            b"r", VALUE_COMMITMENT_GENERATOR_PERSONALIZATION)
        fb[SPENDING_KEY_GENERATOR] = find_group_hash(
            b"", SPENDING_KEY_GENERATOR_PERSONALIZATION)
        assert len(set(self.pedersen_hash_generators + fb)) == 11, "duplicate generators"

    # window tables are derived lazily (pure functions of the generators)

    @functools.cached_property
    def pedersen_circuit_generators(self):
        """Per segment: 63 chunk-windows of Montgomery (x, y) for multiples
        g, 2g, 3g, 4g, with the base doubled 4x between chunks
        (jubjub/mod.rs:350-380)."""
        out = []
        for gen in self.pedersen_hash_generators:
            gen_m = None  # build in montgomery via edwards mul for exactness
            cur = gen
            windows = []
            for _ in range(PEDERSEN_HASH_CHUNKS_PER_GENERATOR):
                coeffs = []
                g = cur
                for _ in range(4):
                    coeffs.append(montgomery_from_edwards(g))
                    g = edwards_add(g, cur)
                windows.append(coeffs)
                for _ in range(4):
                    cur = edwards_double(cur)
            out.append(windows)
        return out

    @functools.cached_property
    def fixed_base_circuit_generators(self):
        """Per fixed generator: 84 3-bit windows of Edwards (x, y) for
        multiples 0..7, base multiplied by 8 between windows
        (jubjub/mod.rs:385-410)."""
        out = []
        for gen in self.fixed_base_generators:
            windows = []
            cur = gen
            for _ in range(FIXED_BASE_CHUNKS_PER_GENERATOR):
                coeffs = [(0, 1)]
                g = cur
                for _ in range(7):
                    coeffs.append(g)
                    g = edwards_add(g, cur)
                windows.append(coeffs)
                cur = g  # = 8 * cur
            out.append(windows)
        return out

    def generator(self, idx: int):
        return self.fixed_base_generators[idx]


def pedersen_hash(personalization_bits, bits):
    """pedersen_hash.rs:24 — 3-bit signed-digit chunks, 63 chunks per
    segment, each segment's scalar applied to its own generator."""
    params = JubjubParams()
    all_bits = list(personalization_bits) + list(bits)
    result = ZERO
    seg = 0
    i = 0
    n = len(all_bits)
    while i < n:
        acc = 0
        cur = 1
        for _ in range(PEDERSEN_HASH_CHUNKS_PER_GENERATOR):
            if i >= n:
                break
            a = all_bits[i]
            b = all_bits[i + 1] if i + 1 < n else False
            c = all_bits[i + 2] if i + 2 < n else False
            i += 3
            tmp = cur * (1 + int(a) + 2 * int(b)) % FS
            if c:
                tmp = (-tmp) % FS
            acc = (acc + tmp) % FS
            cur = cur * 16 % FS
        gen = params.pedersen_hash_generators[seg]
        seg += 1
        result = edwards_add(result, edwards_mul(gen, acc))
    return result


def note_commitment_personalization():
    """Personalization::NoteCommitment bits (pedersen_hash.rs:12-14)."""
    return [True] * 6


def merkle_tree_personalization(depth: int):
    assert depth < 63
    return [bool((depth >> i) & 1) for i in range(6)]
