"""In-circuit BLAKE2s-256 (re-design of ``circuit/blake2s.rs``).

UInt32 word mixing with MultiEq-batched carry equalities.  Goldens: empty
input with personalization "12345678" hashes to the hashlib blake2s value
with 0 constraints; 512 allocated input bits cost exactly 21518
constraints (blake2s.rs tests).
"""

from __future__ import annotations

from .boolean import Boolean
from .multieq import MultiEq
from .uint32 import UInt32

R1, R2, R3, R4 = 16, 12, 8, 7

SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]

IV = [
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
]


def _mixing_g(mcs, name, v, a, b, c, d, x, y):
    v[a] = UInt32.addmany(mcs, f"{name}/mixing step 1", [v[a], v[b], x])
    v[d] = v[d].xor(mcs, f"{name}/mixing step 2", v[a]).rotr(R1)
    v[c] = UInt32.addmany(mcs, f"{name}/mixing step 3", [v[c], v[d]])
    v[b] = v[b].xor(mcs, f"{name}/mixing step 4", v[c]).rotr(R2)
    v[a] = UInt32.addmany(mcs, f"{name}/mixing step 5", [v[a], v[b], y])
    v[d] = v[d].xor(mcs, f"{name}/mixing step 6", v[a]).rotr(R3)
    v[c] = UInt32.addmany(mcs, f"{name}/mixing step 7", [v[c], v[d]])
    v[b] = v[b].xor(mcs, f"{name}/mixing step 8", v[c]).rotr(R4)


def _compression(cs, name, h, m, t, f):
    assert len(h) == 8 and len(m) == 16
    v = list(h) + [UInt32.constant(x) for x in IV]
    v[12] = v[12].xor(cs, f"{name}/first xor", UInt32.constant(t & 0xFFFFFFFF))
    v[13] = v[13].xor(cs, f"{name}/second xor", UInt32.constant(t >> 32))
    if f:
        v[14] = v[14].xor(cs, f"{name}/third xor", UInt32.constant(0xFFFFFFFF))

    with MultiEq(cs, f"{name}/") as mcs:
        for i in range(10):
            rn = f"{name}/round {i}"
            s = SIGMA[i % 10]
            _mixing_g(mcs, f"{rn}/mixing invocation 1", v, 0, 4, 8, 12, m[s[0]], m[s[1]])
            _mixing_g(mcs, f"{rn}/mixing invocation 2", v, 1, 5, 9, 13, m[s[2]], m[s[3]])
            _mixing_g(mcs, f"{rn}/mixing invocation 3", v, 2, 6, 10, 14, m[s[4]], m[s[5]])
            _mixing_g(mcs, f"{rn}/mixing invocation 4", v, 3, 7, 11, 15, m[s[6]], m[s[7]])
            _mixing_g(mcs, f"{rn}/mixing invocation 5", v, 0, 5, 10, 15, m[s[8]], m[s[9]])
            _mixing_g(mcs, f"{rn}/mixing invocation 6", v, 1, 6, 11, 12, m[s[10]], m[s[11]])
            _mixing_g(mcs, f"{rn}/mixing invocation 7", v, 2, 7, 8, 13, m[s[12]], m[s[13]])
            _mixing_g(mcs, f"{rn}/mixing invocation 8", v, 3, 4, 9, 14, m[s[14]], m[s[15]])

    for i in range(8):
        hn = f"{name}/h[{i}] ^ v[{i}] ^ v[{i} + 8]"
        h[i] = h[i].xor(cs, f"{hn}/first xor", v[i])
        h[i] = h[i].xor(cs, f"{hn}/second xor", v[i + 8])


def blake2s(cs, name: str, input_bits, personalization: bytes):
    """BLAKE2s-256 of LE-bit input; returns 256 LE-bit Booleans
    (blake2s.rs:263-318)."""
    assert len(personalization) == 8
    assert len(input_bits) % 8 == 0

    h = [
        UInt32.constant(IV[0] ^ 0x01010000 ^ 32),
        UInt32.constant(IV[1]),
        UInt32.constant(IV[2]),
        UInt32.constant(IV[3]),
        UInt32.constant(IV[4]),
        UInt32.constant(IV[5]),
        UInt32.constant(
            IV[6] ^ int.from_bytes(personalization[0:4], "little")
        ),
        UInt32.constant(
            IV[7] ^ int.from_bytes(personalization[4:8], "little")
        ),
    ]

    blocks = []
    for off in range(0, len(input_bits), 512):
        block_bits = input_bits[off : off + 512]
        this_block = []
        for woff in range(0, len(block_bits), 32):
            word = list(block_bits[woff : woff + 32])
            while len(word) < 32:
                word.append(Boolean.constant(False))
            this_block.append(UInt32.from_bits(word))
        while len(this_block) < 16:
            this_block.append(UInt32.constant(0))
        blocks.append(this_block)

    if not blocks:
        blocks.append([UInt32.constant(0) for _ in range(16)])

    for i, block in enumerate(blocks[:-1]):
        _compression(cs, f"{name}/block {i}", h, block, (i + 1) * 64, False)
    _compression(
        cs, f"{name}/final block", h, blocks[-1], len(input_bits) // 8, True
    )

    out = []
    for word in h:
        out.extend(word.into_bits())
    return out
