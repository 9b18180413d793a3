"""Scaling-curve gate (round 6): wall time must grow ≤ ~linearly from
sf0.1 to the key-shifted ×10 fixture — the cheapest way to catch a
hidden O(n²) before a real cluster does. See scaling_bench.py for the
fixture construction (near-dup structure deliberately kept linear).

Slow (regenerates nothing after the first run, but times ~15 heavy
queries twice at two sizes, ~5-10 min) — env-gated:

    BURLA_SCALING=1 python -m pytest tests/test_scaling_curve.py -q
"""

from __future__ import annotations

import json
import os

import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("BURLA_SCALING") != "1",
        reason="scaling sweep is opt-in: BURLA_SCALING=1",
    ),
]

# linear would be ratio == SCALE (10); allow 2.5× slack for shuffle
# width effects, AQE re-plans, and fixed costs amortizing differently.
# A quadratic query measures ~100 and fails unambiguously.
MAX_RATIO_SLACK = 2.5


def test_scaling_ratios_stay_linear():
    import scaling_bench

    result = scaling_bench.main()
    limit = scaling_bench.SCALE * MAX_RATIO_SLACK
    offenders = {
        name: row
        for name, row in result["queries"].items()
        if max(row["ratio"], row["ratio_cold"]) > limit
    }
    assert not offenders, (
        f"super-linear scaling (limit {limit}): "
        + json.dumps(offenders, indent=2)
    )
