"""Smoke-test the replication-scale harness end to end on CPU.

experiments/validate_131k_scale.py is the artifact behind the BASELINE
scale rows (N=131k/262k/524k on the chip); this keeps its cascade —
planted bank → plan → schedule → prune → screen → confirm → planted-pair
check — runnable at a small n so the harness cannot rot between the
on-chip sessions that actually produce the rows.
"""

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "experiments"))

import validate_131k_scale  # noqa: E402


@pytest.mark.slow
def test_scale_harness_small_n(capsys):
    validate_131k_scale.main(["--n", "2048"])  # raises SystemExit on miss
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["planted_recovered"] is True
    assert rec["pairs_emitted"] >= rec["planted_dups"] == 128
    assert rec["min_jacc"] > 0.9
    # every stage actually ran and was timed
    for k in ("plan_secs", "schedule_secs", "prune_secs",
              "screen_secs", "confirm_secs"):
        assert k in rec


def test_triangle_block_ids_matches_scalar_oracle():
    """The vectorized scheduler must emit the scalar scan's tile list
    bit-for-bit (same f64 divisions/comparisons, same break/continue
    semantics around zero-cardinality blocks)."""
    import numpy as np
    from cuda_selection_criteria_tpu.parallel import scheduler

    rng = np.random.default_rng(0x5C4ED)
    for _ in range(200):
        n = int(rng.integers(0, 160))
        block = int(rng.integers(1, 33))
        tau = float(rng.choice([0.0, 0.3, 0.9, 0.999, 1.0]))
        nz = int(rng.integers(0, n + 1)) if n else 0
        vals = np.sort(rng.choice([1.0, 2.0, 3.0, 5.0, 1e3, 1e3 + 1],
                                  size=n - nz)) if n else np.zeros(0)
        e = np.concatenate([np.zeros(nz), vals])
        for cb in (True, False):
            got = scheduler.triangle_blocks(e, tau, block, use_cb_skip=cb)
            want = scheduler.triangle_blocks_scalar(
                e, tau, block, use_cb_skip=cb)
            assert got == want
