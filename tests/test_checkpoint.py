"""Sweep checkpoint/resume + transient-fault retry (SURVEY section 5
failure recovery - the reference has none: unchecked CUDA rc's, NDEBUG'd
error peeks)."""

import numpy as np
import pytest

from cuda_selection_criteria_tpu.parallel import screened
from cuda_selection_criteria_tpu.parallel.screened import (
    ScreenPlan,
    select_pairs_screened,
)
from cuda_selection_criteria_tpu.parallel.selection import SelectionParams
from cuda_selection_criteria_tpu.utils import resilience
from tests.test_screen import _make_bank


def test_checkpointed_sweep_matches_and_resumes(tmp_path):
    rng = np.random.default_rng(71)
    bank = _make_bank(24, 10, 16, rng)
    params = SelectionParams(tau=0.15, criterion="smh_a")
    ckpt = str(tmp_path / "sweep.jsonl")

    plain = select_pairs_screened(bank, params, ti=8, chunk=1)
    with_ckpt = select_pairs_screened(bank, params, ti=8, chunk=1,
                                      checkpoint=ckpt)
    assert plain == with_ckpt
    lines = open(ckpt).read().strip().splitlines()
    assert len(lines) > 2  # header + several span records

    # Simulate a crash: keep the header and the first 2 span records plus
    # a TORN final line; the resumed run must skip the recorded spans,
    # recompute the rest, and produce the identical result.
    with open(ckpt, "w") as fh:
        fh.write("\n".join(lines[:3]) + "\n")
        fh.write('{"span": [999')  # torn write
    calls = []
    orig = ScreenPlan.screen_chunk

    def counting(self, r_chunk, c_chunk):
        calls.append(len(r_chunk))
        return orig(self, r_chunk, c_chunk)

    ScreenPlan.screen_chunk = counting
    try:
        resumed = select_pairs_screened(bank, params, ti=8, chunk=1,
                                        checkpoint=ckpt)
    finally:
        ScreenPlan.screen_chunk = orig
    assert resumed == plain
    # prune_tiles dispatches gate counts too; the screen dispatches must
    # cover strictly fewer spans than a fresh run would (2 were resumed).
    n_screen_calls = sum(1 for c in calls if c <= 1)
    full_spans = len([ln for ln in lines[1:]])
    assert n_screen_calls <= full_spans - 2

    # A different run must refuse the old checkpoint.
    params2 = SelectionParams(tau=0.2, criterion="smh_a")
    with pytest.raises(ValueError, match="different run"):
        select_pairs_screened(bank, params2, ti=8, chunk=1,
                              checkpoint=ckpt)


def test_transient_retry_classifier_and_loop():
    class FakeXlaRuntimeError(Exception):
        pass

    FakeXlaRuntimeError.__name__ = "XlaRuntimeError"
    assert resilience.is_transient(FakeXlaRuntimeError("boom"))
    assert resilience.is_transient(RuntimeError("FAILED_PRECONDITION: x"))
    assert not resilience.is_transient(ValueError("bad argument"))

    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) == 1:
            raise RuntimeError("UNAVAILABLE: relay hiccup")
        return 42

    assert resilience.run_with_transient_retry(flaky, backoff=0.01) == 42
    assert len(attempts) == 2

    def hard():
        raise ValueError("not transient")

    with pytest.raises(ValueError):
        resilience.run_with_transient_retry(hard, backoff=0.01)
