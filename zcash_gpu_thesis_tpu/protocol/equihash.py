"""Equihash solution verifier (re-design of ``librustzcash/src/equihash.rs``).

Validates Zcash PoW solutions: BLAKE2b-personalized index hashing with
bit-expansion, pairwise collision/ordering/distinctness checks up the
binary tree, and a zero root.  Pure python here; a native C++ variant
lives in ``native/`` for the production path.
"""

from __future__ import annotations

import hashlib


class Params:
    def __init__(self, n: int, k: int):
        self.n, self.k = n, k

    @property
    def indices_per_hash_output(self) -> int:
        return 512 // self.n

    @property
    def hash_output(self) -> int:
        return self.indices_per_hash_output * self.n // 8

    @property
    def collision_bit_length(self) -> int:
        return self.n // (self.k + 1)

    @property
    def collision_byte_length(self) -> int:
        return (self.collision_bit_length + 7) // 8

    @property
    def hash_length(self) -> int:
        return (self.k + 1) * self.collision_byte_length


def expand_array(vin: bytes, bit_len: int, byte_pad: int) -> bytes:
    """Unpack a bit-packed big-endian array into padded elements
    (equihash.rs:118-163)."""
    assert bit_len >= 8
    out_width = (bit_len + 7) // 8 + byte_pad
    out_len = 8 * out_width * len(vin) // bit_len
    if out_len == len(vin):
        return bytes(vin)
    vout = bytearray(out_len)
    bit_len_mask = (1 << bit_len) - 1
    acc_bits = 0
    acc_value = 0
    j = 0
    for b in vin:
        acc_value = ((acc_value << 8) | b) & 0xFFFFFFFF
        acc_bits += 8
        if acc_bits >= bit_len:
            acc_bits -= bit_len
            for x in range(byte_pad, out_width):
                vout[j + x] = (
                    acc_value >> (acc_bits + 8 * (out_width - x - 1))
                ) & ((bit_len_mask >> (8 * (out_width - x - 1))) & 0xFF)
            j += out_width
    return bytes(vout)


def indices_from_minimal(minimal: bytes, c_bit_len: int) -> list:
    byte_pad = 4 - ((c_bit_len + 1) + 7) // 8
    expanded = expand_array(minimal, c_bit_len + 1, byte_pad)
    return [
        int.from_bytes(expanded[i : i + 4], "big")
        for i in range(0, len(expanded), 4)
    ]


def _initialise_state(n: int, k: int, digest_len: int):
    person = b"ZcashPoW" + n.to_bytes(4, "little") + k.to_bytes(4, "little")
    return hashlib.blake2b(digest_size=digest_len, person=person)


class Node:
    __slots__ = ("hash", "indices")

    def __init__(self, hash_: bytes, indices: list):
        self.hash = hash_
        self.indices = indices

    @staticmethod
    def new(p: Params, base_state, i: int) -> "Node":
        state = base_state.copy()
        state.update((i // p.indices_per_hash_output).to_bytes(4, "little"))
        full = state.digest()
        start = (i % p.indices_per_hash_output) * p.n // 8
        h = expand_array(full[start : start + p.n // 8],
                         p.collision_bit_length, 0)
        return Node(h, [i])

    @staticmethod
    def from_children(a: "Node", b: "Node", trim: int) -> "Node":
        h = bytes(x ^ y for x, y in zip(a.hash, b.hash))[trim:]
        if a.indices[0] < b.indices[0]:
            indices = a.indices + b.indices
        else:
            indices = b.indices + a.indices
        return Node(h, indices)

    def indices_before(self, other: "Node") -> bool:
        return self.indices[0] < other.indices[0]

    def is_zero(self, length: int) -> bool:
        return all(v == 0 for v in self.hash[:length])


def _has_collision(a: Node, b: Node, length: int) -> bool:
    return a.hash[:length] == b.hash[:length]


def _distinct_indices(a: Node, b: Node) -> bool:
    return not (set(a.indices) & set(b.indices))


def _validate_subtrees(p: Params, a: Node, b: Node) -> bool:
    if not _has_collision(a, b, p.collision_byte_length):
        return False
    if b.indices_before(a):
        return False
    return _distinct_indices(a, b)


def _tree_validator(p: Params, state, indices):
    if len(indices) > 1:
        mid = len(indices) // 2
        a = _tree_validator(p, state, indices[:mid])
        if a is None:
            return None
        b = _tree_validator(p, state, indices[mid:])
        if b is None:
            return None
        if not _validate_subtrees(p, a, b):
            return None
        return Node.from_children(a, b, p.collision_byte_length)
    return Node.new(p, state, indices[0])


def is_valid_solution(n: int, k: int, input_: bytes, nonce: bytes,
                      soln: bytes) -> bool:
    """equihash.rs is_valid_solution (recursive variant)."""
    p = Params(n, k)
    expected_len = (1 << k) * (p.collision_bit_length + 1) // 8
    if k >= n or n % 8 != 0 or len(soln) != expected_len:
        return False
    indices = indices_from_minimal(soln, p.collision_bit_length)
    state = _initialise_state(n, k, p.hash_output)
    state.update(input_)
    state.update(nonce)
    root = _tree_validator(p, state, indices)
    if root is None:
        return False
    return root.is_zero(p.collision_byte_length)
