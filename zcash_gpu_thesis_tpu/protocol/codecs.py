"""Point / proof / parameter byte codecs (host-side I/O layer).

Re-design of the reference's serialization: the G1/G2 compressed and
uncompressed encodings with their flag bits and validation rules
(``pairing/src/bls12_381/ec.rs:646-925``: ``G1Uncompressed``,
``G1Compressed``, G2 variants) and the Groth16 ``Proof`` /
``VerifyingKey`` / ``Parameters`` formats (``bellman/src/groth16/
mod.rs:42-382``).  Byte-compatible with the reference (zcash BLS12-381
encoding): big-endian 48-byte field elements; the first byte carries
0x80 = compressed flag, 0x40 = infinity flag, 0x20 = y-sign
(lexicographically-largest) flag; G2 x is serialized c1 then c0.
"""

from __future__ import annotations

import io
import struct

from ..constants import Q, R, modinv
from ..groth16.params import Parameters, Proof, VerifyingKey

FLAG_COMPRESSED = 0x80
FLAG_INFINITY = 0x40
FLAG_SIGN = 0x20


class CodecError(ValueError):
    """GroupDecodingError (pairing/src/lib.rs:240-265)."""


# -- field elements ---------------------------------------------------------


def fq_to_bytes(x: int) -> bytes:
    return int(x % Q).to_bytes(48, "big")


def fq_from_bytes(b: bytes, strict: bool = True) -> int:
    x = int.from_bytes(b, "big")
    if strict and x >= Q:
        raise CodecError("coordinate not in field")
    return x


def fr_to_bytes_le(x: int) -> bytes:
    """FrRepr little-endian u64-limb write (PrimeFieldRepr::write_le)."""
    return int(x % R).to_bytes(32, "little")


def fr_from_bytes_le(b: bytes) -> int:
    x = int.from_bytes(b, "little")
    if x >= R:
        raise CodecError("scalar not in field")
    return x


def _sqrt_fq(a: int):
    """sqrt mod q (q = 3 mod 4): a^((q+1)/4); None if a is a non-residue."""
    r = pow(a, (Q + 1) // 4, Q)
    return r if r * r % Q == a else None


def _sqrt_fq2(a):
    """sqrt in Fq2 = Fq[u]/(u^2+1) (Adj–Rodríguez for q = 3 mod 4)."""
    a0, a1 = a

    def mul(x, y):
        return ((x[0] * y[0] - x[1] * y[1]) % Q, (x[0] * y[1] + x[1] * y[0]) % Q)

    def powq2(x, e):
        acc = (1, 0)
        base = x
        while e:
            if e & 1:
                acc = mul(acc, base)
            base = mul(base, base)
            e >>= 1
        return acc

    if a == (0, 0):
        return (0, 0)
    a1p = powq2(a, (Q - 3) // 4)
    alpha = mul(mul(a1p, a1p), a)
    x0 = mul(a1p, a)
    if alpha == ((Q - 1) % Q, 0):
        cand = ((-x0[1]) % Q, x0[0])  # i * x0
    else:
        one_alpha = ((1 + alpha[0]) % Q, alpha[1])
        b = powq2(one_alpha, (Q - 1) // 2)
        cand = mul(b, x0)
    return cand if mul(cand, cand) == a else None


def _y_is_greater(y: int) -> bool:
    """The "lexicographically largest" rule: y > -y (ec.rs get_point)."""
    return y > (Q - y) % Q


def _y2_is_greater(y) -> bool:
    """Fq2 ordering: compare c1 first, then c0 (ec.rs G2 codec)."""
    y0, y1 = y
    n0, n1 = (Q - y0) % Q, (Q - y1) % Q
    if y1 != n1:
        return y1 > n1
    return y0 > n0


# -- G1 ---------------------------------------------------------------------


def g1_compress(p) -> bytes:
    if p is None:
        out = bytearray(48)
        out[0] = FLAG_COMPRESSED | FLAG_INFINITY
        return bytes(out)
    x, y = p
    out = bytearray(fq_to_bytes(x))
    out[0] |= FLAG_COMPRESSED
    if _y_is_greater(y):
        out[0] |= FLAG_SIGN
    return bytes(out)


def g1_uncompress(b: bytes, check: bool = True):
    if len(b) != 48:
        raise CodecError("bad G1 compressed length")
    flags = b[0]
    if not flags & FLAG_COMPRESSED:
        raise CodecError("compressed flag not set")
    if flags & FLAG_INFINITY:
        if any(b[1:]) or flags & ~(FLAG_COMPRESSED | FLAG_INFINITY) or b[0] != (
            FLAG_COMPRESSED | FLAG_INFINITY
        ):
            raise CodecError("malformed infinity encoding")
        return None
    xb = bytes([b[0] & 0x1F]) + b[1:]
    x = fq_from_bytes(xb)
    y = _sqrt_fq((x * x % Q * x + 4) % Q)
    if y is None:
        raise CodecError("x not on curve")
    if bool(flags & FLAG_SIGN) != _y_is_greater(y):
        y = (Q - y) % Q
    p = (x, y)
    if check and not _in_g1_subgroup(p):
        raise CodecError("not in the r-order subgroup")
    return p


def g1_serialize(p) -> bytes:
    """Uncompressed: x || y, 96 bytes (ec.rs G1Uncompressed)."""
    if p is None:
        out = bytearray(96)
        out[0] = FLAG_INFINITY
        return bytes(out)
    return fq_to_bytes(p[0]) + fq_to_bytes(p[1])


def g1_deserialize(b: bytes, check: bool = True):
    if len(b) != 96:
        raise CodecError("bad G1 uncompressed length")
    flags = b[0]
    if flags & FLAG_COMPRESSED:
        raise CodecError("compressed flag set on uncompressed encoding")
    if flags & FLAG_INFINITY:
        if any(b[1:]) or flags != FLAG_INFINITY:
            raise CodecError("malformed infinity encoding")
        return None
    if flags & FLAG_SIGN:
        raise CodecError("sign flag set on uncompressed encoding")
    x = fq_from_bytes(b[:48])
    y = fq_from_bytes(b[48:])
    p = (x, y)
    if check:
        if (y * y - (x * x % Q * x + 4)) % Q:
            raise CodecError("point not on curve")
        if not _in_g1_subgroup(p):
            raise CodecError("not in the r-order subgroup")
    return p


def _in_g1_subgroup(p) -> bool:
    from ..oracle.curve import g1_add

    # r*P == infinity, with an unreduced ladder (the oracle's mul reduces
    # scalars mod r, which would trivialize this check).
    acc, base, k = None, p, R
    while k:
        if k & 1:
            acc = g1_add(acc, base)
        base = g1_add(base, base)
        k >>= 1
    return acc is None


# -- G2 ---------------------------------------------------------------------


def g2_compress(p) -> bytes:
    if p is None:
        out = bytearray(96)
        out[0] = FLAG_COMPRESSED | FLAG_INFINITY
        return bytes(out)
    (x0, x1), y = p
    out = bytearray(fq_to_bytes(x1) + fq_to_bytes(x0))  # c1 first
    out[0] |= FLAG_COMPRESSED
    if _y2_is_greater(y):
        out[0] |= FLAG_SIGN
    return bytes(out)


def g2_uncompress(b: bytes, check: bool = True):
    if len(b) != 96:
        raise CodecError("bad G2 compressed length")
    flags = b[0]
    if not flags & FLAG_COMPRESSED:
        raise CodecError("compressed flag not set")
    if flags & FLAG_INFINITY:
        if any(b[1:]) or b[0] != (FLAG_COMPRESSED | FLAG_INFINITY):
            raise CodecError("malformed infinity encoding")
        return None
    x1 = fq_from_bytes(bytes([b[0] & 0x1F]) + b[1:48])
    x0 = fq_from_bytes(b[48:])
    x = (x0, x1)
    # y^2 = x^3 + 4(u+1)
    x3 = _f2mul(_f2mul(x, x), x)
    rhs = ((x3[0] + 4) % Q, (x3[1] + 4) % Q)
    y = _sqrt_fq2(rhs)
    if y is None:
        raise CodecError("x not on twist")
    if bool(flags & FLAG_SIGN) != _y2_is_greater(y):
        y = ((Q - y[0]) % Q, (Q - y[1]) % Q)
    p = (x, y)
    if check and not _in_g2_subgroup(p):
        raise CodecError("not in the r-order subgroup")
    return p


def g2_serialize(p) -> bytes:
    if p is None:
        out = bytearray(192)
        out[0] = FLAG_INFINITY
        return bytes(out)
    (x0, x1), (y0, y1) = p
    return (
        fq_to_bytes(x1) + fq_to_bytes(x0) + fq_to_bytes(y1) + fq_to_bytes(y0)
    )


def g2_deserialize(b: bytes, check: bool = True):
    if len(b) != 192:
        raise CodecError("bad G2 uncompressed length")
    flags = b[0]
    if flags & FLAG_COMPRESSED:
        raise CodecError("compressed flag set on uncompressed encoding")
    if flags & FLAG_INFINITY:
        if any(b[1:]) or flags != FLAG_INFINITY:
            raise CodecError("malformed infinity encoding")
        return None
    x1 = fq_from_bytes(b[:48])
    x0 = fq_from_bytes(b[48:96])
    y1 = fq_from_bytes(b[96:144])
    y0 = fq_from_bytes(b[144:])
    p = ((x0, x1), (y0, y1))
    if check:
        x3 = _f2mul(_f2mul(p[0], p[0]), p[0])
        rhs = ((x3[0] + 4) % Q, (x3[1] + 4) % Q)
        if _f2mul(p[1], p[1]) != rhs:
            raise CodecError("point not on twist")
        if not _in_g2_subgroup(p):
            raise CodecError("not in the r-order subgroup")
    return p


def _f2mul(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % Q, (a[0] * b[1] + a[1] * b[0]) % Q)


def _in_g2_subgroup(p) -> bool:
    from ..oracle.curve import g2_add

    acc, base, k = None, p, R
    while k:
        if k & 1:
            acc = g2_add(acc, base)
        base = g2_add(base, base)
        k >>= 1
    return acc is None


# -- Groth16 containers (mod.rs:42-382) -------------------------------------


def proof_to_bytes(proof: Proof) -> bytes:
    """192 bytes: a compressed || b compressed || c compressed
    (mod.rs:567: the zcashd proof wire format)."""
    return g1_compress(proof.a) + g2_compress(proof.b) + g1_compress(proof.c)


def proof_from_bytes(b: bytes, check: bool = True) -> Proof:
    if len(b) != 192:
        raise CodecError("bad proof length")
    return Proof(
        a=g1_uncompress(b[:48], check),
        b=g2_uncompress(b[48:144], check),
        c=g1_uncompress(b[144:], check),
    )


def vk_to_bytes(vk: VerifyingKey) -> bytes:
    out = io.BytesIO()
    out.write(g1_serialize(vk.alpha_g1))
    out.write(g1_serialize(vk.beta_g1))
    out.write(g2_serialize(vk.beta_g2))
    out.write(g2_serialize(vk.gamma_g2))
    out.write(g1_serialize(vk.delta_g1))
    out.write(g2_serialize(vk.delta_g2))
    out.write(struct.pack(">I", len(vk.ic)))
    for p in vk.ic:
        out.write(g1_serialize(p))
    return out.getvalue()


def vk_from_bytes(b: bytes, check: bool = True) -> VerifyingKey:
    s = io.BytesIO(b)
    alpha_g1 = g1_deserialize(s.read(96), check)
    beta_g1 = g1_deserialize(s.read(96), check)
    beta_g2 = g2_deserialize(s.read(192), check)
    gamma_g2 = g2_deserialize(s.read(192), check)
    delta_g1 = g1_deserialize(s.read(96), check)
    delta_g2 = g2_deserialize(s.read(192), check)
    (n,) = struct.unpack(">I", s.read(4))
    ic = [g1_deserialize(s.read(96), check) for _ in range(n)]
    return VerifyingKey(alpha_g1, beta_g1, beta_g2, gamma_g2, delta_g1,
                        delta_g2, ic)


def params_to_bytes(params: Parameters) -> bytes:
    """Byte-identical to bellman's ``Parameters::write``
    (groth16/mod.rs:216-250): vk, then u32-BE-length-prefixed
    h/l/a/b_g1/b_g2 vectors of uncompressed points.  ``num_inputs`` /
    ``num_aux`` are not stored — they are ``len(vk.ic)`` and ``len(l)``
    by construction, as in the reference."""
    out = io.BytesIO()
    out.write(vk_to_bytes(params.vk))
    for vec, ser in (
        (params.h, g1_serialize), (params.l, g1_serialize),
        (params.a, g1_serialize), (params.b_g1, g1_serialize),
        (params.b_g2, g2_serialize),
    ):
        out.write(struct.pack(">I", len(vec)))
        for p in vec:
            out.write(ser(p))
    return out.getvalue()


def params_from_bytes(b: bytes, check: bool = True) -> Parameters:
    """``Parameters::read`` (groth16/mod.rs:252-382) with checked
    (``check=True``: curve/subgroup validation per point) and unchecked
    modes.  Also accepts this library's pre-bellman-exact files that
    carried a redundant 8-byte num_inputs/num_aux trailer."""
    s = io.BytesIO(b)
    # vk is length-prefixed only in its ic vector; re-parse sequentially
    head = s.read(96 * 3 + 192 * 3)
    (n_ic,) = struct.unpack(">I", s.read(4))
    vk = vk_from_bytes(head + struct.pack(">I", n_ic) + s.read(96 * n_ic),
                       check)
    vecs = []
    for ser_len, de in ((96, g1_deserialize), (96, g1_deserialize),
                        (96, g1_deserialize), (96, g1_deserialize),
                        (192, g2_deserialize)):
        (n,) = struct.unpack(">I", s.read(4))
        vecs.append([de(s.read(ser_len), check) for _ in range(n)])
    h, l, a, b_g1, b_g2 = vecs
    num_inputs, num_aux = len(vk.ic), len(l)
    trailer = s.read(8)
    if trailer:
        # legacy trailer: must agree with the derived counts
        t_in, t_aux = struct.unpack(">II", trailer)
        if (t_in, t_aux) != (num_inputs, num_aux):
            raise CodecError("legacy trailer disagrees with vector lengths")
    return Parameters(vk=vk, h=h, l=l, a=a, b_g1=b_g1, b_g2=b_g2,
                      num_inputs=num_inputs, num_aux=num_aux)
