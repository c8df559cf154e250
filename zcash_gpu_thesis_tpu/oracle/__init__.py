"""Pure-Python reference oracle.

Plays the role the CPU Rust implementation plays in the reference: the
bit-exact oracle every TPU kernel is differentially tested against
(SURVEY.md §4 tier 2 — `pairing/src/lib.rs:773+` test_ocl_* pattern).
Python big-ints are the ground truth; nothing here runs on device.
"""

from . import field, curve  # noqa: F401
