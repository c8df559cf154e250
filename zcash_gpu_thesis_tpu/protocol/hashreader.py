"""Hash-while-reading stream wrapper
(re-design of ``librustzcash/src/hashreader.rs``).

Used when loading proving parameters: the blake2b digest of everything
read is checked against the expected hash (rustzcash.rs:220-263).
"""

from __future__ import annotations

import hashlib


class HashReader:
    def __init__(self, stream):
        self._stream = stream
        self._hasher = hashlib.blake2b(digest_size=64)

    def read(self, n: int = -1) -> bytes:
        data = self._stream.read(n)
        self._hasher.update(data)
        return data

    def into_hash(self) -> str:
        return self._hasher.hexdigest()
