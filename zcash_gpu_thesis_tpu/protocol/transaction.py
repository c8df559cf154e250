"""Zcash transaction format + signature hash.

Re-design of ``zcash_primitives/src/{serialize,transaction/*}.rs``:
CompactSize/Vector serialization, the Sapling v4 / Overwinter v3 / Sprout
transaction wire formats (components: TxIn/TxOut, SpendDescription,
OutputDescription, JSDescription), and the BLAKE2b ZIP-143/243
``signature_hash`` with its personalized sub-hashes.
"""

from __future__ import annotations

import hashlib
import io
import struct
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

MAX_SIZE = 0x02000000
MAX_MONEY = 21000000 * 100000000

OVERWINTER_VERSION_GROUP_ID = 0x03C48270
OVERWINTER_TX_VERSION = 3
SAPLING_VERSION_GROUP_ID = 0x892F2085
SAPLING_TX_VERSION = 4

GROTH_PROOF_SIZE = 192
PHGR_PROOF_SIZE = 296

SIGHASH_ALL = 1
SIGHASH_NONE = 2
SIGHASH_SINGLE = 3
SIGHASH_MASK = 0x1F
SIGHASH_ANYONECANPAY = 0x80


class TxFormatError(ValueError):
    pass


# -- CompactSize / Vector (serialize.rs) -------------------------------------


def compact_size_read(r) -> int:
    flag = r.read(1)[0]
    if flag < 253:
        n = flag
    elif flag == 253:
        n = struct.unpack("<H", r.read(2))[0]
        if n < 253:
            raise TxFormatError("non-canonical CompactSize")
    elif flag == 254:
        n = struct.unpack("<I", r.read(4))[0]
        if n < 0x10000:
            raise TxFormatError("non-canonical CompactSize")
    else:
        n = struct.unpack("<Q", r.read(8))[0]
        if n < 0x100000000:
            raise TxFormatError("non-canonical CompactSize")
    if n > MAX_SIZE:
        raise TxFormatError("CompactSize too large")
    return n


def compact_size_write(w, size: int):
    if size < 253:
        w.write(bytes([size]))
    elif size <= 0xFFFF:
        w.write(b"\xfd" + struct.pack("<H", size))
    elif size <= 0xFFFFFFFF:
        w.write(b"\xfe" + struct.pack("<I", size))
    else:
        w.write(b"\xff" + struct.pack("<Q", size))


def vector_read(r, func) -> list:
    return [func(r) for _ in range(compact_size_read(r))]


def vector_write(w, vec, func):
    compact_size_write(w, len(vec))
    for e in vec:
        func(w, e)


# -- components (components.rs) ----------------------------------------------


def amount_read_i64(r, allow_negative: bool) -> int:
    (amount,) = struct.unpack("<q", r.read(8))
    if 0 <= amount <= MAX_MONEY:
        return amount
    if allow_negative and -MAX_MONEY <= amount < 0:
        return amount
    raise TxFormatError("Amount out of range")


def amount_read_u64(r) -> int:
    (amount,) = struct.unpack("<Q", r.read(8))
    if amount > MAX_MONEY:
        raise TxFormatError("Amount out of range")
    return amount


@dataclass
class OutPoint:
    hash: bytes = bytes(32)
    n: int = 0

    @staticmethod
    def read(r):
        return OutPoint(hash=r.read(32), n=struct.unpack("<I", r.read(4))[0])

    def write(self, w):
        w.write(self.hash)
        w.write(struct.pack("<I", self.n))


@dataclass
class TxIn:
    prevout: OutPoint = field(default_factory=OutPoint)
    script_sig: bytes = b""
    sequence: int = 0

    @staticmethod
    def read(r):
        prevout = OutPoint.read(r)
        script = bytes(vector_read(r, lambda rr: rr.read(1)[0]))
        (sequence,) = struct.unpack("<I", r.read(4))
        return TxIn(prevout, script, sequence)

    def write(self, w):
        self.prevout.write(w)
        vector_write(w, list(self.script_sig), lambda ww, b: ww.write(bytes([b])))
        w.write(struct.pack("<I", self.sequence))


@dataclass
class TxOut:
    value: int = 0
    script_pubkey: bytes = b""

    @staticmethod
    def read(r):
        value = amount_read_i64(r, False)
        script = bytes(vector_read(r, lambda rr: rr.read(1)[0]))
        return TxOut(value, script)

    def write(self, w):
        w.write(struct.pack("<q", self.value))
        vector_write(w, list(self.script_pubkey), lambda ww, b: ww.write(bytes([b])))


@dataclass
class SpendDescription:
    """Raw byte-level Sapling spend (components.rs:143-205); point/field
    canonicity checks happen in the FFI verification path."""

    cv: bytes = bytes(32)
    anchor: bytes = bytes(32)
    nullifier: bytes = bytes(32)
    rk: bytes = bytes(32)
    zkproof: bytes = bytes(GROTH_PROOF_SIZE)
    spend_auth_sig: bytes = bytes(64)

    @staticmethod
    def read(r):
        return SpendDescription(
            cv=r.read(32), anchor=r.read(32), nullifier=r.read(32),
            rk=r.read(32), zkproof=r.read(GROTH_PROOF_SIZE),
            spend_auth_sig=r.read(64),
        )

    def write(self, w):
        for b in (self.cv, self.anchor, self.nullifier, self.rk,
                  self.zkproof, self.spend_auth_sig):
            w.write(b)


@dataclass
class OutputDescription:
    cv: bytes = bytes(32)
    cmu: bytes = bytes(32)
    ephemeral_key: bytes = bytes(32)
    enc_ciphertext: bytes = bytes(580)
    out_ciphertext: bytes = bytes(80)
    zkproof: bytes = bytes(GROTH_PROOF_SIZE)

    @staticmethod
    def read(r):
        return OutputDescription(
            cv=r.read(32), cmu=r.read(32), ephemeral_key=r.read(32),
            enc_ciphertext=r.read(580), out_ciphertext=r.read(80),
            zkproof=r.read(GROTH_PROOF_SIZE),
        )

    def write(self, w):
        for b in (self.cv, self.cmu, self.ephemeral_key,
                  self.enc_ciphertext, self.out_ciphertext, self.zkproof):
            w.write(b)


@dataclass
class JSDescription:
    vpub_old: int = 0
    vpub_new: int = 0
    anchor: bytes = bytes(32)
    nullifiers: Tuple[bytes, bytes] = (bytes(32), bytes(32))
    commitments: Tuple[bytes, bytes] = (bytes(32), bytes(32))
    ephemeral_key: bytes = bytes(32)
    random_seed: bytes = bytes(32)
    macs: Tuple[bytes, bytes] = (bytes(32), bytes(32))
    proof: bytes = bytes(PHGR_PROOF_SIZE)  # Groth (192) or PHGR (296)
    ciphertexts: Tuple[bytes, bytes] = (bytes(601), bytes(601))

    @staticmethod
    def read(r, use_groth: bool):
        vpub_old = amount_read_u64(r)
        vpub_new = amount_read_u64(r)
        anchor = r.read(32)
        nullifiers = (r.read(32), r.read(32))
        commitments = (r.read(32), r.read(32))
        ephemeral_key = r.read(32)
        random_seed = r.read(32)
        macs = (r.read(32), r.read(32))
        proof = r.read(GROTH_PROOF_SIZE if use_groth else PHGR_PROOF_SIZE)
        ciphertexts = (r.read(601), r.read(601))
        return JSDescription(vpub_old, vpub_new, anchor, nullifiers,
                             commitments, ephemeral_key, random_seed, macs,
                             proof, ciphertexts)

    def write(self, w):
        w.write(struct.pack("<q", self.vpub_old))
        w.write(struct.pack("<q", self.vpub_new))
        w.write(self.anchor)
        w.write(self.nullifiers[0])
        w.write(self.nullifiers[1])
        w.write(self.commitments[0])
        w.write(self.commitments[1])
        w.write(self.ephemeral_key)
        w.write(self.random_seed)
        w.write(self.macs[0])
        w.write(self.macs[1])
        w.write(self.proof)
        w.write(self.ciphertexts[0])
        w.write(self.ciphertexts[1])


# -- transaction (transaction/mod.rs) ----------------------------------------


@dataclass
class TransactionData:
    overwintered: bool = True
    version: int = SAPLING_TX_VERSION
    version_group_id: int = SAPLING_VERSION_GROUP_ID
    vin: List[TxIn] = field(default_factory=list)
    vout: List[TxOut] = field(default_factory=list)
    lock_time: int = 0
    expiry_height: int = 0
    value_balance: int = 0
    shielded_spends: List[SpendDescription] = field(default_factory=list)
    shielded_outputs: List[OutputDescription] = field(default_factory=list)
    joinsplits: List[JSDescription] = field(default_factory=list)
    joinsplit_pubkey: Optional[bytes] = None
    joinsplit_sig: Optional[bytes] = None
    binding_sig: Optional[bytes] = None

    def header(self) -> int:
        return self.version | ((1 << 31) if self.overwintered else 0)

    def _flavor(self):
        is_v3 = (self.overwintered
                 and self.version_group_id == OVERWINTER_VERSION_GROUP_ID
                 and self.version == OVERWINTER_TX_VERSION)
        is_v4 = (self.overwintered
                 and self.version_group_id == SAPLING_VERSION_GROUP_ID
                 and self.version == SAPLING_TX_VERSION)
        if self.overwintered and not (is_v3 or is_v4):
            raise TxFormatError("Unknown transaction format")
        return is_v3, is_v4

    @staticmethod
    def read(r) -> "TransactionData":
        (header,) = struct.unpack("<I", r.read(4))
        overwintered = (header >> 31) == 1
        version = header & 0x7FFFFFFF
        version_group_id = (
            struct.unpack("<I", r.read(4))[0] if overwintered else 0
        )
        tx = TransactionData(
            overwintered=overwintered, version=version,
            version_group_id=version_group_id,
        )
        is_v3, is_v4 = tx._flavor()
        tx.vin = vector_read(r, TxIn.read)
        tx.vout = vector_read(r, TxOut.read)
        (tx.lock_time,) = struct.unpack("<I", r.read(4))
        if is_v3 or is_v4:
            (tx.expiry_height,) = struct.unpack("<I", r.read(4))
        if is_v4:
            tx.value_balance = amount_read_i64(r, True)
            tx.shielded_spends = vector_read(r, SpendDescription.read)
            tx.shielded_outputs = vector_read(r, OutputDescription.read)
        if version >= 2:
            use_groth = overwintered and version >= SAPLING_TX_VERSION
            tx.joinsplits = vector_read(
                r, lambda rr: JSDescription.read(rr, use_groth)
            )
            if tx.joinsplits:
                tx.joinsplit_pubkey = r.read(32)
                tx.joinsplit_sig = r.read(64)
        if is_v4 and (tx.shielded_spends or tx.shielded_outputs):
            tx.binding_sig = r.read(64)
        return tx

    @staticmethod
    def from_bytes(b: bytes) -> "TransactionData":
        return TransactionData.read(io.BytesIO(b))

    def write(self, w):
        is_v3, is_v4 = self._flavor()
        w.write(struct.pack("<I", self.header()))
        if self.overwintered:
            w.write(struct.pack("<I", self.version_group_id))
        vector_write(w, self.vin, lambda ww, e: e.write(ww))
        vector_write(w, self.vout, lambda ww, e: e.write(ww))
        w.write(struct.pack("<I", self.lock_time))
        if is_v3 or is_v4:
            w.write(struct.pack("<I", self.expiry_height))
        if is_v4:
            w.write(struct.pack("<q", self.value_balance))
            vector_write(w, self.shielded_spends, lambda ww, e: e.write(ww))
            vector_write(w, self.shielded_outputs, lambda ww, e: e.write(ww))
        if self.version >= 2:
            vector_write(w, self.joinsplits, lambda ww, e: e.write(ww))
            if self.joinsplits:
                if self.joinsplit_pubkey is None or self.joinsplit_sig is None:
                    raise TxFormatError("Missing JoinSplit pubkey/sig")
                w.write(self.joinsplit_pubkey)
                w.write(self.joinsplit_sig)
        if is_v4 and (self.shielded_spends or self.shielded_outputs):
            if self.binding_sig is None:
                raise TxFormatError("Missing binding signature")
            w.write(self.binding_sig)

    def to_bytes(self) -> bytes:
        w = io.BytesIO()
        self.write(w)
        return w.getvalue()


# -- signature hash (sighash.rs) ---------------------------------------------


def _b2b(person: bytes, data: bytes) -> bytes:
    return hashlib.blake2b(data, digest_size=32, person=person).digest()


def _prevout_hash(tx):
    w = io.BytesIO()
    for t_in in tx.vin:
        t_in.prevout.write(w)
    return _b2b(b"ZcashPrevoutHash", w.getvalue())


def _sequence_hash(tx):
    data = b"".join(struct.pack("<I", t.sequence) for t in tx.vin)
    return _b2b(b"ZcashSequencHash", data)


def _outputs_hash(tx):
    w = io.BytesIO()
    for t_out in tx.vout:
        t_out.write(w)
    return _b2b(b"ZcashOutputsHash", w.getvalue())


def _single_output_hash(tx_out):
    w = io.BytesIO()
    tx_out.write(w)
    return _b2b(b"ZcashOutputsHash", w.getvalue())


def _joinsplits_hash(tx):
    w = io.BytesIO()
    for js in tx.joinsplits:
        js.write(w)
    data = w.getvalue() + tx.joinsplit_pubkey
    return _b2b(b"ZcashJSplitsHash", data)


def _shielded_spends_hash(tx):
    w = io.BytesIO()
    for s in tx.shielded_spends:
        # without the spend_auth_sig (sighash.rs:127-139)
        w.write(s.cv)
        w.write(s.anchor)
        w.write(s.nullifier)
        w.write(s.rk)
        w.write(s.zkproof)
    return _b2b(b"ZcashSSpendsHash", w.getvalue())


def _shielded_outputs_hash(tx):
    w = io.BytesIO()
    for o in tx.shielded_outputs:
        o.write(w)
    return _b2b(b"ZcashSOutputHash", w.getvalue())


def signature_hash(tx: TransactionData, consensus_branch_id: int,
                   hash_type: int,
                   transparent_input: Optional[Tuple[int, bytes, int]] = None
                   ) -> bytes:
    """ZIP-143/243 sighash (sighash.rs:151-226).  transparent_input is
    (index, script_code bytes, amount)."""
    is_v3, is_v4 = tx._flavor()
    if not tx.overwintered:
        raise NotImplementedError("Sprout sighash")

    if (hash_type & SIGHASH_MASK) not in (SIGHASH_SINGLE, SIGHASH_NONE):
        hash_outputs = _outputs_hash(tx)
    elif ((hash_type & SIGHASH_MASK) == SIGHASH_SINGLE
          and transparent_input is not None
          and transparent_input[0] < len(tx.vout)):
        hash_outputs = _single_output_hash(tx.vout[transparent_input[0]])
    else:
        hash_outputs = bytes(32)

    person = b"ZcashSigHash" + struct.pack("<I", consensus_branch_id)
    h = hashlib.blake2b(digest_size=32, person=person)
    h.update(struct.pack("<I", tx.header()))
    h.update(struct.pack("<I", tx.version_group_id))
    h.update(_prevout_hash(tx) if not hash_type & SIGHASH_ANYONECANPAY
             else bytes(32))
    h.update(
        _sequence_hash(tx)
        if (not hash_type & SIGHASH_ANYONECANPAY
            and (hash_type & SIGHASH_MASK) != SIGHASH_SINGLE
            and (hash_type & SIGHASH_MASK) != SIGHASH_NONE)
        else bytes(32)
    )
    h.update(hash_outputs)
    h.update(_joinsplits_hash(tx) if tx.joinsplits else bytes(32))
    if is_v4:
        h.update(_shielded_spends_hash(tx) if tx.shielded_spends
                 else bytes(32))
        h.update(_shielded_outputs_hash(tx) if tx.shielded_outputs
                 else bytes(32))
    h.update(struct.pack("<I", tx.lock_time))
    h.update(struct.pack("<I", tx.expiry_height))
    if is_v4:
        h.update(struct.pack("<q", tx.value_balance))
    h.update(struct.pack("<I", hash_type))
    if transparent_input is not None:
        n, script_code, amount = transparent_input
        w = io.BytesIO()
        tx.vin[n].prevout.write(w)
        vector_write(w, list(script_code), lambda ww, b: ww.write(bytes([b])))
        w.write(struct.pack("<q", amount))
        w.write(struct.pack("<I", tx.vin[n].sequence))
        h.update(w.getvalue())
    return h.digest()
