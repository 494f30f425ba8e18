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
