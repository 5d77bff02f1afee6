"""Named tracker configurations — the single source of truth coupling
every published fps number to its pinned ATE (round-4 VERDICT #2).

bench.py reads these dicts to run its timed legs, records them in
BENCH_details.json next to the fps they produced, and asserts they match;
tests/test_ate_parity.py measures the SAME dicts' ATE on the CI and
production anchors.  A reader of the bench artifact therefore always sees
"this fps was produced by this config, whose production-anchor ATE is
pinned at X" — the two can no longer be paired wrongly.

The production-anchor ATE numbers quoted in the comments are measured by
tests/test_ate_parity.py::test_ate_production_anchor (640x480 @ 128^3,
120-frame handheld trajectory, dropout + speckle; PSGSDF_TEST_BIG_ATE=1)
and recorded in BASELINE.md.
"""

from __future__ import annotations

# The reference's own semantics (RigidPointOptimizer.cpp:27-76): up to 50
# GN iterations, early exit on ||xi||^2 < 1e-6, fresh correspondences
# every iteration.  ATE parity: beats the C++ reference on the production
# anchor (0.372 mm vs 0.375 mm, round 4).
REFERENCE = dict(
    num_iterations=50, conv_threshold_sq=1e-6, damping=1.0,
    early_exit=True, regather_every=1, stride=1,
)

# The production streaming configuration used by bench.py's headline fps:
# fixed-trip frozen-correspondence rounds (static control flow keeps the
# hot voxel-payload gather in XLA's fast emitter — BASELINE.md).  Two
# gathers + 8 GN steps per frame.
STREAMING = dict(
    num_iterations=8, conv_threshold_sq=1e-6, damping=1.0,
    early_exit=False, regather_every=4, stride=1,
)

# Cheaper variant measured by the round-4 bench (ONE gather + 4 steps);
# kept for the recorded fps/ATE tradeoff curve.
STREAMING_FAST = dict(
    num_iterations=4, conv_threshold_sq=1e-6, damping=1.0,
    early_exit=False, regather_every=4, stride=1,
)
