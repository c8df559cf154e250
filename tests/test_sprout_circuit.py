"""Sprout JoinSplit circuit parity tests.

The reference pins the JoinSplit to 1,989,085 constraints, 10 packed
public inputs, and the blake2s constraint-system-shape hash golden
``1a228d...b84c`` (circuit/sprout/mod.rs:465-467).  The shape hash covers
every linear-combination coefficient and variable index of the whole
circuit — matching it means bit-exact QAP parity with bellman.
"""

import pytest

from zcash_gpu_thesis_tpu.circuits.sprout import JoinSplit
from zcash_gpu_thesis_tpu.circuits.test_cs import TestConstraintSystem

SPROUT_HASH = "1a228d3c6377130d1778c7885811dc8b8864049cb5af8aff7e6cd46c5bc4b84c"


@pytest.mark.slow
def test_sprout_shape_golden():
    cs = TestConstraintSystem()
    JoinSplit().synthesize(cs)
    assert cs.num_constraints() == 1989085
    assert cs.num_inputs() == 10
    assert cs.hash() == SPROUT_HASH
