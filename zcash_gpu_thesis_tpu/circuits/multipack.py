"""Multipacking of booleans into field inputs
(re-design of ``circuit/multipack.rs``)."""

from __future__ import annotations

from ..constants import R as FR
from ..groth16.r1cs import ONE, LinearCombination
from .num import Num

FR_CAPACITY = FR.bit_length() - 1  # 254


def pack_into_inputs(cs, name: str, bits):
    """Expose bits as packed public inputs, one per 254-bit chunk
    (multipack.rs:9-39)."""
    for i in range(0, len(bits), FR_CAPACITY):
        chunk = bits[i : i + FR_CAPACITY]
        num = Num.zero()
        coeff = 1
        for bit in chunk:
            num = num.add_bool_with_coeff(ONE, bit, coeff)
            coeff = coeff * 2 % FR
        idx = i // FR_CAPACITY
        v = num.get_value()
        inp = cs.alloc_input(f"{name}/input {idx}", lambda: v)
        cs.enforce(
            f"{name}/packing constraint {idx}",
            num.lc(1),
            LinearCombination([(ONE, 1)]),
            LinearCombination([(inp, 1)]),
        )


def bytes_to_bits(data: bytes):
    return [bool((v >> i) & 1) for v in data for i in range(7, -1, -1)]


def bytes_to_bits_le(data: bytes):
    return [bool((v >> i) & 1) for v in data for i in range(8)]


def compute_multipacking(bits):
    """Host-side packed input values (multipack.rs:56-79)."""
    out = []
    for i in range(0, len(bits), FR_CAPACITY):
        cur = 0
        coeff = 1
        for bit in bits[i : i + FR_CAPACITY]:
            if bit:
                cur = (cur + coeff) % FR
            coeff = coeff * 2 % FR
        out.append(cur)
    return out
