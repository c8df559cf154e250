"""Transaction format + sighash tests against the reference's golden
vectors (zcash_primitives/src/transaction/tests.rs — the ZIP-143/243
vectors from zcash-hackworks/zcash-test-vectors).

The vectors are parsed out of the reference source at test time (data,
not code); skipped when the reference checkout is not mounted.
"""

import io
import os
import re

import pytest

from zcash_gpu_thesis_tpu.protocol.transaction import (TransactionData,
                                                       compact_size_read,
                                                       compact_size_write,
                                                       signature_hash)

TESTS_RS = "/root/reference/librustzcash/zcash_primitives/src/transaction/tests.rs"


def _bytes_from_rust(text: str) -> bytes:
    return bytes(int(t, 16) for t in re.findall(r"0x([0-9a-fA-F]{2})", text))


def _load_vectors():
    with open(TESTS_RS) as f:
        src = f.read()
    # the sighash test vectors come after the TestVector struct definition
    body = src.split("let test_vectors = vec![", 1)[1]
    out = []
    for m in re.finditer(
        r"TestVector \{\s*tx: vec!\[(.*?)\],\s*script_code: vec!\[(.*?)\],"
        r"\s*transparent_input: (None|Some\(\d+\)),\s*hash_type: (\d+),"
        r"\s*amount: (-?\d+),\s*consensus_branch_id: (\d+),"
        r"\s*sighash: \[(.*?)\],",
        body, re.S,
    ):
        tx, script, tin, ht, amt, cbid, sh = m.groups()
        out.append(
            dict(
                tx=_bytes_from_rust(tx),
                script_code=_bytes_from_rust(script),
                transparent_input=(
                    None if tin == "None" else int(tin[5:-1])
                ),
                hash_type=int(ht),
                amount=int(amt),
                consensus_branch_id=int(cbid),
                sighash=_bytes_from_rust(sh),
            )
        )
    return out


needs_reference = pytest.mark.skipif(
    not os.path.exists(TESTS_RS), reason="reference checkout not mounted"
)


def test_compact_size():
    """serialize.rs compact_size golden cases."""
    cases = [
        (0, b"\x00"), (1, b"\x01"), (252, b"\xfc"),
        (253, b"\xfd\xfd\x00"), (254, b"\xfd\xfe\x00"),
        (255, b"\xfd\xff\x00"), (256, b"\xfd\x00\x01"),
        (65535, b"\xfd\xff\xff"), (65536, b"\xfe\x00\x00\x01\x00"),
        (65537, b"\xfe\x01\x00\x01\x00"),
        (33554432, b"\xfe\x00\x00\x00\x02"),
    ]
    for value, encoded in cases:
        w = io.BytesIO()
        compact_size_write(w, value)
        assert w.getvalue() == encoded, value
        assert compact_size_read(io.BytesIO(encoded)) == value
    with pytest.raises(Exception):
        compact_size_read(io.BytesIO(b"\xfe\x01\x00\x00\x02"))  # > MAX_SIZE


@needs_reference
def test_tx_read_write_roundtrip():
    """tests.rs tx_read_write: testnet block 280003 transaction."""
    with open(TESTS_RS) as f:
        src = f.read()
    data = _bytes_from_rust(
        src.split("let data = [", 1)[1].split("];", 1)[0]
    )
    tx = TransactionData.from_bytes(data)
    assert tx.version == 4 and tx.overwintered
    assert tx.to_bytes() == data


@needs_reference
def test_sighash_golden_vectors():
    """All ZIP-143/243 sighash vectors from tests.rs."""
    vectors = _load_vectors()
    assert len(vectors) >= 20
    ran = 0
    for i, tv in enumerate(vectors):
        tx = TransactionData.from_bytes(tv["tx"])
        assert tx.to_bytes() == tv["tx"], f"vector {i} roundtrip"
        tin = tv["transparent_input"]
        arg = None if tin is None else (tin, tv["script_code"], tv["amount"])
        got = signature_hash(
            tx, tv["consensus_branch_id"], tv["hash_type"], arg
        )
        assert got == tv["sighash"], f"vector {i} sighash"
        ran += 1
    assert ran == len(vectors)
