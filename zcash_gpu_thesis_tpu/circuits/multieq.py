"""MultiEq — batched bit-bounded equality enforcement
(re-design of ``circuit/multieq.rs``).

Packs many small equalities lhs_k == rhs_k (each bounded by num_bits_k)
into single field constraints at distinct bit offsets, flushing when Fr's
capacity (254 bits) would overflow.  Used by uint32::addmany / blake2s /
sha256 to amortize carry constraints.
"""

from __future__ import annotations

from ..constants import R as FR
from ..groth16.r1cs import ONE, LinearCombination

FR_CAPACITY = FR.bit_length() - 1  # 254


class MultiEq:
    """Wraps a constraint system; flushes accumulated equalities on
    close() (the Drop impl in the reference)."""

    def __init__(self, cs, prefix: str = ""):
        self.cs = cs
        self.prefix = prefix
        self.ops = 0
        self.bits_used = 0
        self.lhs = LinearCombination()
        self.rhs = LinearCombination()

    # passthrough allocation so gadgets can treat MultiEq as a CS
    def alloc(self, name, f):
        return self.cs.alloc(name, f)

    def alloc_input(self, name, f):
        return self.cs.alloc_input(name, f)

    def enforce(self, name, a, b, c):
        return self.cs.enforce(name, a, b, c)

    def _accumulate(self):
        self.cs.enforce(
            f"{self.prefix}multieq {self.ops}",
            self.lhs,
            LinearCombination([(ONE, 1)]),
            self.rhs,
        )
        self.lhs = LinearCombination()
        self.rhs = LinearCombination()
        self.bits_used = 0
        self.ops += 1

    def enforce_equal(self, num_bits: int, lhs: LinearCombination,
                      rhs: LinearCombination):
        if FR_CAPACITY <= self.bits_used + num_bits:
            self._accumulate()
        assert FR_CAPACITY > self.bits_used + num_bits
        coeff = pow(2, self.bits_used, FR)
        self.lhs = self.lhs + LinearCombination(
            [(v, c * coeff) for (v, c) in lhs.terms]
        )
        self.rhs = self.rhs + LinearCombination(
            [(v, c * coeff) for (v, c) in rhs.terms]
        )
        self.bits_used += num_bits

    def close(self):
        if self.bits_used > 0:
            self._accumulate()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
