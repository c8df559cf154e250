"""Protocol layer: codecs, hashing, Zcash-specific crypto plumbing."""
