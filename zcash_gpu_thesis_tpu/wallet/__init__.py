"""Placeholder crate mirror (reference: zcash_wallet/src/lib.rs, an empty
stub crate)."""
