"""Python-int field oracle with the reference's Montgomery semantics.

Mirrors `pairing/src/bls12_381/fq.rs` / `fr.rs`: elements live in Montgomery
form with R = 2^384 (Fq) / 2^256 (Fr); all results are canonical (< p).
"""

from __future__ import annotations

from ..constants import FQ_LIMBS, FR_LIMBS, LIMB_BITS, Q, R, modinv

FQ_R = pow(2, FQ_LIMBS * LIMB_BITS, Q)
FR_R = pow(2, FR_LIMBS * LIMB_BITS, R)


class MontField:
    def __init__(self, modulus: int, rbits: int):
        self.p = modulus
        self.rbits = rbits
        self.r = pow(2, rbits, modulus)
        self.rinv = modinv(self.r, modulus)

    # values are plain ints in Montgomery form, 0 <= v < p
    def to_mont(self, x: int) -> int:
        return (x % self.p) * self.r % self.p

    def from_mont(self, v: int) -> int:
        return v * self.rinv % self.p

    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def neg(self, a):
        return (-a) % self.p

    def mul(self, a, b):
        return a * b * self.rinv % self.p

    def square(self, a):
        return self.mul(a, a)

    def inv(self, a):
        # Montgomery-form inverse: (aR)^-1 R^2 = a^-1 R
        return modinv(a, self.p) * self.r % self.p * self.r % self.p if a else 0

    def pow(self, a, e):
        acc = self.r  # one in Montgomery form
        for bit in bin(e)[2:]:
            acc = self.mul(acc, acc)
            if bit == "1":
                acc = self.mul(acc, a)
        return acc


FQ_ORACLE = MontField(Q, FQ_LIMBS * LIMB_BITS)
FR_ORACLE = MontField(R, FR_LIMBS * LIMB_BITS)
