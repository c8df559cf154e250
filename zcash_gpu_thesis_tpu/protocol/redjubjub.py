"""RedJubjub (RedDSA over Jubjub) signatures.

Re-design of ``sapling-crypto/src/redjubjub.rs`` (+ ``util.rs``
hash_to_scalar): key randomization, sign, verify and batch entries, per
§5.4.6 of the Sapling protocol specification.  Host-side python ints.
"""

from __future__ import annotations

import hashlib
import os

from . import jubjub as J


def hash_to_scalar(persona: bytes, a: bytes, b: bytes) -> int:
    """BLAKE2b-512 with personalization, 64 LE bytes mod s (util.rs:5;
    Fs::to_uniform)."""
    h = hashlib.blake2b(person=persona, digest_size=64)
    h.update(a)
    h.update(b)
    return int.from_bytes(h.digest(), "little") % J.FS


def h_star(a: bytes, b: bytes) -> int:
    return hash_to_scalar(b"Zcash_RedJubjubH", a, b)


def scalar_write(s: int) -> bytes:
    return (s % J.FS).to_bytes(32, "little")


def scalar_read(b: bytes):
    s = int.from_bytes(b, "little")
    return s if s < J.FS else None


class PrivateKey:
    def __init__(self, sk: int):
        self.sk = sk % J.FS

    def randomize(self, alpha: int) -> "PrivateKey":
        return PrivateKey(self.sk + alpha)

    def sign(self, msg: bytes, p_g: int, rng=None, t: bytes | None = None):
        """(rbar, sbar) 64-byte signature (redjubjub.rs:74-105)."""
        if t is None:
            t = rng.randbytes(80) if rng is not None else os.urandom(80)
        r = h_star(t, msg)
        r_g = J.edwards_mul(J.JubjubParams().generator(p_g), r)
        rbar = J.point_write(r_g)
        s = (r + h_star(rbar, msg) * self.sk) % J.FS
        return rbar + scalar_write(s)


class PublicKey:
    def __init__(self, point):
        self.point = point

    @staticmethod
    def from_private(priv: PrivateKey, p_g: int) -> "PublicKey":
        return PublicKey(
            J.edwards_mul(J.JubjubParams().generator(p_g), priv.sk)
        )

    def randomize(self, alpha: int, p_g: int) -> "PublicKey":
        return PublicKey(
            J.edwards_add(
                J.edwards_mul(J.JubjubParams().generator(p_g), alpha),
                self.point,
            )
        )

    def write(self) -> bytes:
        return J.point_write(self.point)

    @staticmethod
    def read(b: bytes):
        p = J.point_read(b)
        return None if p is None else PublicKey(p)

    def verify(self, msg: bytes, sig: bytes, p_g: int) -> bool:
        """0 == [8](-S.P_g + R + c.vk) (redjubjub.rs:128-157)."""
        if len(sig) != 64:
            return False
        rbar, sbar = sig[:32], sig[32:]
        c = h_star(rbar, msg)
        r = J.point_read(rbar)
        if r is None:
            return False
        s = scalar_read(sbar)
        if s is None:
            return False
        acc = J.edwards_mul(self.point, c)
        acc = J.edwards_add(acc, r)
        neg_sg = J.edwards_neg(
            J.edwards_mul(J.JubjubParams().generator(p_g), s)
        )
        acc = J.edwards_add(acc, neg_sg)
        return J.edwards_mul(acc, 8) == J.ZERO


def batch_verify(entries, p_g: int) -> bool:
    """Batch verification (redjubjub.rs BatchEntry / batch_verify):
    random-linear-combination check of many (vk, msg, sig) entries."""
    import random as _random

    rng = _random.SystemRandom()
    acc = J.ZERO
    for pub, msg, sig in entries:
        if len(sig) != 64:
            return False
        rbar, sbar = sig[:32], sig[32:]
        c = h_star(rbar, msg)
        r = J.point_read(rbar)
        s = scalar_read(sbar)
        if r is None or s is None:
            return False
        z = rng.randrange(1, 1 << 128)
        # z * (R + c.vk - S.P_g)
        t = J.edwards_add(r, J.edwards_mul(pub.point, c))
        t = J.edwards_add(
            t, J.edwards_neg(J.edwards_mul(J.JubjubParams().generator(p_g), s))
        )
        acc = J.edwards_add(acc, J.edwards_mul(t, z))
    return J.edwards_mul(acc, 8) == J.ZERO
