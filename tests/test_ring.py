"""Ring-rotated row-sharded engine (bank sharded across the 8 virtual
devices, column strips circulating via ppermute): output must equal the
host reference and the replicated-bank engines exactly."""

import numpy as np
import pytest

from cuda_selection_criteria_tpu.parallel.ring import select_pairs_ring
from cuda_selection_criteria_tpu.parallel.screened import (
    select_pairs_screened,
)
from cuda_selection_criteria_tpu.parallel.selection import SelectionParams
from cuda_selection_criteria_tpu.utils.hostref import select_pairs_host
from tests.test_screen import _make_bank


def _round(results):
    return [(a, b, round(j, 12)) for a, b, j in results]


@pytest.mark.parametrize("crit,tau", [
    ("smh_a", 0.15), ("cb", 0.25), ("baseline", 0.3), ("smh_only", 0.15),
])
def test_ring_matches_host_and_replicated(crit, tau):
    rng = np.random.default_rng(47)
    bank = _make_bank(24, 10, 16, rng)
    params = SelectionParams(tau=tau, criterion=crit)
    host = select_pairs_host(
        bank, tau, crit, apply_cb=(crit not in ("baseline", "smh_only"))
    )
    repl = select_pairs_screened(bank, params, ti=128, chunk=4)
    ring = select_pairs_ring(bank, params, ti=32)
    assert _round(host) == _round(ring)
    assert _round(repl) == _round(ring)


def test_ring_pair_coverage_is_exhaustive():
    """Every i<j pair must be screened exactly once across devices/steps:
    with the screen thresholds fully open (tau'=-inf semantics via tiny
    tau and no gates), the candidate set must be the FULL triangle."""
    rng = np.random.default_rng(13)
    bank = _make_bank(16, 10, 16, rng)
    # baseline (no gates) at a tau small enough that every pair's screen
    # bound passes -> candidates == all pairs -> host confirm sees all.
    params = SelectionParams(tau=1e-6, criterion="baseline")
    got = select_pairs_ring(bank, params, ti=32)
    want = select_pairs_host(bank, 1e-6, "baseline", apply_cb=False)
    assert _round(want) == _round(got)
    assert len(got) > 0


@pytest.mark.parametrize("crit", ["hll_a", "hll_an"])
def test_ring_hll_aux_matches_host(crit):
    """hll_a/hll_an on the ring engine: the aux-HLL registers circulate
    as a second strip; output must equal the host reference exactly."""
    from tests.test_screen import _make_bank_hll_aux

    rng = np.random.default_rng(31)
    bank = _make_bank_hll_aux(24, 10, 6, rng)
    params = SelectionParams(tau=0.2, criterion=crit)
    host = select_pairs_host(bank, 0.2, crit)
    ring = select_pairs_ring(bank, params, ti=32)
    assert _round(host) == _round(ring)
    assert len(ring) > 0
