"""Witness-value ops: concrete python ints or recorded tape nodes.

The reference synthesizes witness values in compiled Rust — the gadget
walk (``bellman/src/groth16/prover.rs:84-190,226``) costs "several
milliseconds at most" per proof (``tex/Chapters/Chapter6.tex``).  A
python gadget interpreter doing the same walk costs ~1 s for Sapling
Spend and ~14 s for Sprout — the single place a python host layer cannot
hide behind the TPU.

TPU-native re-design: the gadget walk runs ONCE per circuit shape with
witness leaves wrapped as :class:`TV` trace nodes.  Every value
computation routes through this module (or the overloaded TV operators),
recording a flat straight-line tape of field/bit/word ops.  Per proof,
the tape replays over the new leaf values in native C++
(``native/zktpu_native.cpp:zktpu_tape_run``) — a few ms, like the
reference's compiled witness-gen — and emits the canonical 12-bit-limb
assignment array the device pipeline uploads directly.

Ops operate on plain ints exactly as the eager gadget code did, so the
interpreted path (and every engine without device scalars) is unchanged;
a TV operand anywhere switches the op into record mode.  Tapes depend
only on the circuit *shape* (same invariant the compiled-R1CS structures
rely on), never on witness values: any data-dependent choice must go
through :func:`select` / :func:`sel_table` — TV deliberately raises on
``bool()`` / ``int()`` so a forgotten branch fails loudly during
tracing instead of baking one witness's control flow into the tape.
"""

from __future__ import annotations

from .constants import R, modinv

# -- opcodes (mirrored by native/zktpu_native.cpp) ---------------------------

CONST = 0    # value = consts[aux32]  (a = const table index)
INPUT = 1    # value = leaves[a]
ADD = 2      # (a + b) mod r
SUB = 3      # (a - b) mod r
MUL = 4      # (a * b) mod r
NEG = 5      # (-a) mod r
INV = 6      # a^-1 mod r; 0 -> 0 with the run's zero-division flag set
BIT = 7      # (a >> aux) & 1
SELECT = 8   # c ? a : b   (slot c holds 0/1)
LXOR = 9     # limb-wise a ^ b
LAND = 10    # limb-wise a & b
ANDN = 11    # a & ~b  (0/1 operands)
NOR = 12     # (a | b) == 0  (0/1 result)
NOT1 = 13    # 1 - a  (0/1 operand)
LOR = 14     # limb-wise a | b
SHR = 15     # a >> aux
ROTR32 = 16  # 32-bit rotate right by aux (operand < 2^32)
CH32 = 17    # (a & b) ^ (~a & c) masked to 32 bits
MAJ32 = 18   # (a & b) ^ (a & c) ^ (b & c)
ISNZ = 19    # a != 0 -> 1 else 0
MASK64 = 20  # a & (2^64 - 1)

N_OPCODES = 21


class Tape:
    """Recorded straight-line witness program for one circuit shape."""

    def __init__(self):
        self.op = []
        self.a = []
        self.b = []
        self.c = []
        self.aux = []
        self.vals = []       # concrete value per slot (tracing witness)
        self.consts = []
        self._const_ids = {}
        self.n_leaves = 0
        # wire bindings, filled by the tracing constraint system
        self.input_slots = []
        self.aux_slots = []

    def __len__(self):
        return len(self.op)

    def emit(self, op, a=0, b=0, c=0, aux=0, val=0):
        i = len(self.op)
        self.op.append(op)
        self.a.append(a)
        self.b.append(b)
        self.c.append(c)
        self.aux.append(aux)
        self.vals.append(val)
        return TV(self, i, val)

    def const(self, v: int) -> int:
        """Slot index of a constant value (deduplicated)."""
        v = int(v) % R
        i = self._const_ids.get(v)
        if i is None:
            ci = len(self.consts)
            self.consts.append(v)
            tv = self.emit(CONST, a=ci, val=v)
            i = self._const_ids[v] = tv.i
        return i

    def leaf(self, j: int, v: int) -> "TV":
        """Register witness leaf j.  Leaves enter RAW (not reduced mod
        r): byte-string leaves are full 256-bit hashes consumed only
        through BIT ops; field-typed leaves are already canonical."""
        assert j == self.n_leaves, "leaves must be registered in order"
        assert 0 <= int(v) < (1 << 256)
        self.n_leaves += 1
        return self.emit(INPUT, a=j, val=int(v))

    def leaves(self, vals) -> list:
        return [self.leaf(j, v) for j, v in enumerate(vals)]


class TV:
    """A traced witness value: concrete int + its tape slot."""

    __slots__ = ("t", "i", "v")

    def __init__(self, t: Tape, i: int, v: int):
        self.t = t
        self.i = i
        self.v = int(v)

    # A TV escaping into python control flow would bake this witness's
    # branches into the shape-level tape — fail loudly instead.
    def __bool__(self):
        raise TypeError("witness TV used as a branch condition; "
                        "use wv.select / wv.sel_table")

    def __int__(self):
        raise TypeError("witness TV concretized with int(); "
                        "use wv ops end-to-end")

    __index__ = __int__

    def __repr__(self):
        return f"TV(slot={self.i}, v={self.v})"

    # field arithmetic (always reduced mod r — the gadget code's trailing
    # `% FR` becomes a no-op via __mod__)
    def __add__(self, o):
        return _bin(ADD, self, o, lambda x, y: (x + y) % R)

    __radd__ = __add__

    def __sub__(self, o):
        return _bin(SUB, self, o, lambda x, y: (x - y) % R)

    def __rsub__(self, o):
        return _bin(SUB, o, self, lambda x, y: (x - y) % R)

    def __mul__(self, o):
        return _bin(MUL, self, o, lambda x, y: (x * y) % R)

    __rmul__ = __mul__

    def __neg__(self):
        return self.t.emit(NEG, a=self.i, val=(-self.v) % R)

    def __mod__(self, m):
        if m == R:
            return self  # already canonical
        raise TypeError(f"TV % {m}: only the field modulus is supported")

    # bitwise (limb-wise on the canonical value: exact for the 0/1 bit
    # domain and for u32/u64 words alike)
    def __xor__(self, o):
        return _bin(LXOR, self, o, lambda x, y: x ^ y)

    __rxor__ = __xor__

    def __and__(self, o):
        return _bin(LAND, self, o, lambda x, y: x & y)

    __rand__ = __and__

    def __or__(self, o):
        return _bin(LOR, self, o, lambda x, y: x | y)

    __ror__ = __or__

    def __rshift__(self, k):
        return self.t.emit(SHR, a=self.i, aux=int(k), val=self.v >> int(k))


def is_tv(x) -> bool:
    return type(x) is TV


def _val(x) -> int:
    return x.v if type(x) is TV else int(x)


def _tape(*xs):
    for x in xs:
        if type(x) is TV:
            return x.t
    return None


def _slot(t: Tape, x) -> int:
    if type(x) is TV:
        assert x.t is t, "mixing values from different tapes"
        return x.i
    return t.const(x)


def _bin(op, x, y, f):
    t = _tape(x, y)
    v = f(_val(x), _val(y))
    if t is None:
        return v
    return t.emit(op, a=_slot(t, x), b=_slot(t, y), val=v)


# -- public ops ---------------------------------------------------------------


def bit(v, i: int):
    """Bit i of the canonical value (0/1)."""
    if type(v) is TV:
        return v.t.emit(BIT, a=v.i, aux=int(i), val=(v.v >> int(i)) & 1)
    return (int(v) >> int(i)) & 1


def select(c, a, b):
    """a if c else b (c is a 0/1 value)."""
    t = _tape(c, a, b)
    v = _val(a) if _val(c) else _val(b)
    if t is None:
        return v
    return t.emit(SELECT, a=_slot(t, a), b=_slot(t, b), c=_slot(t, c),
                  val=v)


def not_(a):
    if type(a) is TV:
        return a.t.emit(NOT1, a=a.i, val=1 - a.v)
    return 1 - int(a)


def xor(a, b):
    return _bin(LXOR, a, b, lambda x, y: x ^ y)


def and_(a, b):
    return _bin(LAND, a, b, lambda x, y: x & y)


def andn(a, b):
    """a & not b (0/1 domain)."""
    return _bin(ANDN, a, b, lambda x, y: x & (1 - y))


def nor(a, b):
    return _bin(NOR, a, b, lambda x, y: int((x | y) == 0))


def neg(a):
    if type(a) is TV:
        return -a
    return (-int(a)) % R


def inv(a):
    """Modular inverse; traced zero flags the replay, concrete zero
    returns None (callers raise, matching num.rs DivisionByZero)."""
    if type(a) is TV:
        v = modinv(a.v, R) if a.v else 0
        return a.t.emit(INV, a=a.i, val=v)
    a = int(a) % R
    return modinv(a, R) if a else None


def isnz(a):
    if type(a) is TV:
        return a.t.emit(ISNZ, a=a.i, val=int(a.v != 0))
    return int(int(a) != 0)


def mask64(a):
    if type(a) is TV:
        return a.t.emit(MASK64, a=a.i, val=a.v & 0xFFFFFFFFFFFFFFFF)
    return int(a) & 0xFFFFFFFFFFFFFFFF


def shr(a, k: int):
    if type(a) is TV:
        return a >> k
    return int(a) >> k


def rotr32(a, k: int):
    k %= 32
    if type(a) is TV:
        v = ((a.v >> k) | (a.v << (32 - k))) & 0xFFFFFFFF
        return a.t.emit(ROTR32, a=a.i, aux=k, val=v)
    return ((int(a) >> k) | (int(a) << (32 - k))) & 0xFFFFFFFF


def ch32(a, b, c):
    t = _tape(a, b, c)
    av, bv, cv = _val(a), _val(b), _val(c)
    v = (av & bv) ^ ((~av & 0xFFFFFFFF) & cv)
    if t is None:
        return v
    return t.emit(CH32, a=_slot(t, a), b=_slot(t, b), c=_slot(t, c), val=v)


def maj32(a, b, c):
    t = _tape(a, b, c)
    av, bv, cv = _val(a), _val(b), _val(c)
    v = (av & bv) ^ (av & cv) ^ (bv & cv)
    if t is None:
        return v
    return t.emit(MAJ32, a=_slot(t, a), b=_slot(t, b), c=_slot(t, c), val=v)


def add_if(acc, cond, coeff: int):
    """acc + (coeff if cond else 0), cond in {0, 1}."""
    if type(acc) is TV or type(cond) is TV:
        return acc + cond * (coeff % R)
    return (int(acc) + (coeff if cond else 0)) % R


def sel_table(bits, table):
    """table[sum 2^k bits[k]] via a nested-select tree (the tape form of
    a data-dependent index)."""
    if not any(type(b) is TV for b in bits):
        i = 0
        for k, b in enumerate(bits):
            i += (1 << k) * int(b)
        return table[i]
    cur = list(table)
    for b in bits:
        cur = [select(b, cur[2 * j + 1], cur[2 * j])
               for j in range(len(cur) // 2)]
    assert len(cur) == 1
    return cur[0]


def byte_bits_msb(value, num_bits: int, skip_bits: int = 0):
    """Bits of a byte string, MSB-first per byte in byte order, skipping
    the first ``skip_bits`` — sprout's witness layout (mod.rs:301-334).
    ``value``: bytes, or a TV/int holding the big-endian integer."""
    if isinstance(value, (bytes, bytearray)):
        flat = [(b >> i) & 1 for b in value for i in range(7, -1, -1)]
        return flat[skip_bits:]
    total = num_bits + skip_bits
    return [bit(value, total - 1 - skip_bits - j) for j in range(num_bits)]


def pack_bits_le(bits):
    """sum 2^i * bits[i] (u32/u64 word reconstruction from LE bits)."""
    acc = 0
    for b in reversed(bits):
        acc = acc * 2 + (b if type(b) is TV else int(b))
    return acc


# -- replay -------------------------------------------------------------------


def replay_py(tape: Tape, leaves):
    """Python-int tape interpreter — the oracle the native interpreter is
    tested against.  Returns (slot value list, zero_division flag)."""
    vals = [0] * len(tape.op)
    zdiv = False
    leaves = [int(x) for x in leaves]  # raw — see Tape.leaf
    assert len(leaves) == tape.n_leaves
    for i in range(len(tape.op)):
        op = tape.op[i]
        a, b, c, aux = tape.a[i], tape.b[i], tape.c[i], tape.aux[i]
        if op == CONST:
            v = tape.consts[a]
        elif op == INPUT:
            v = leaves[a]
        elif op == ADD:
            v = (vals[a] + vals[b]) % R
        elif op == SUB:
            v = (vals[a] - vals[b]) % R
        elif op == MUL:
            v = (vals[a] * vals[b]) % R
        elif op == NEG:
            v = (-vals[a]) % R
        elif op == INV:
            if vals[a] == 0:
                zdiv = True
                v = 0
            else:
                v = modinv(vals[a], R)
        elif op == BIT:
            v = (vals[a] >> aux) & 1
        elif op == SELECT:
            v = vals[a] if vals[c] else vals[b]
        elif op == LXOR:
            v = vals[a] ^ vals[b]
        elif op == LAND:
            v = vals[a] & vals[b]
        elif op == ANDN:
            v = vals[a] & (1 - vals[b])
        elif op == NOR:
            v = int((vals[a] | vals[b]) == 0)
        elif op == NOT1:
            v = 1 - vals[a]
        elif op == LOR:
            v = vals[a] | vals[b]
        elif op == SHR:
            v = vals[a] >> aux
        elif op == ROTR32:
            x = vals[a]
            v = ((x >> aux) | (x << (32 - aux))) & 0xFFFFFFFF
        elif op == CH32:
            x, y, z = vals[a], vals[b], vals[c]
            v = (x & y) ^ ((~x & 0xFFFFFFFF) & z)
        elif op == MAJ32:
            x, y, z = vals[a], vals[b], vals[c]
            v = (x & y) ^ (x & z) ^ (y & z)
        elif op == ISNZ:
            v = int(vals[a] != 0)
        elif op == MASK64:
            v = vals[a] & 0xFFFFFFFFFFFFFFFF
        else:
            raise ValueError(f"bad opcode {op}")
        vals[i] = v
    return vals, zdiv
