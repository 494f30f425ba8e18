"""SuperMinHash: the parallel min-reduce formulation must equal the
sequential reference algorithm (with its a_/b_ early exit) bit-for-bit."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_selection_criteria_tpu.models import SuperMinHashSketch
from cuda_selection_criteria_tpu.models.smh import vecsize
from cuda_selection_criteria_tpu.ops import smh_build
from cuda_selection_criteria_tpu.utils import fasta, formats
import refmodels as rm
from conftest import REFERENCE, reference_available

RNG = np.random.default_rng(1234)


def test_vecsize_matches_pow2_policy():
    # SizePow2Policy::arg2vecsize (policy.h:15-19)
    for arg, want in [(1, 1), (2, 2), (3, 4), (4, 4), (5, 8), (31, 32),
                      (32, 32), (33, 64), (64, 64)]:
        assert vecsize(arg) == want


@pytest.mark.parametrize("m", [4, 8, 32])
def test_parallel_equals_sequential(m):
    kms = RNG.integers(0, 1 << 62, size=800, dtype=np.uint64)
    want = rm.build_smh_sequential([int(x) for x in kms], m)
    got = np.asarray(
        smh_build.smh_build_batch(
            jnp.asarray(kms),
            jnp.ones(kms.shape, bool),
            jnp.zeros(kms.shape, jnp.int32),
            m,
            1,
        )[0]
    )
    np.testing.assert_array_equal(got, want)


def test_parallel_with_zero_seed_item():
    # kmer == 0 must use WyRand's seed remap 0 -> 1337
    kms = np.array([0, 5, 9], dtype=np.uint64)
    want = rm.build_smh_sequential([0, 5, 9], 8)
    got = np.asarray(
        smh_build.smh_build_batch(
            jnp.asarray(kms), jnp.ones(3, bool), jnp.zeros(3, jnp.int32), 8, 1
        )[0]
    )
    np.testing.assert_array_equal(got, want)


def test_merge_min_equals_oneshot():
    kms = RNG.integers(0, 1 << 62, size=600, dtype=np.uint64)
    ones = jnp.ones(300, bool)
    zeros = jnp.zeros(300, jnp.int32)
    a = smh_build.smh_build_batch(jnp.asarray(kms[:300]), ones, zeros, 16, 1)[0]
    b = smh_build.smh_build_batch(jnp.asarray(kms[300:]), ones, zeros, 16, 1)[0]
    merged = np.asarray(smh_build.smh_merge_min(a, b))
    full = rm.build_smh_sequential([int(x) for x in kms], 16)
    np.testing.assert_array_equal(merged, full)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("m", [4, 64])
def test_smh_from_fasta_matches_committed_sketches(m):
    files = [
        line.strip()
        for line in open(os.path.join(REFERENCE, "test_influeza_filelist.txt"))
        if line.strip()
    ][:2]
    for f in files:
        path = os.path.join(REFERENCE, f)
        codes = fasta.fasta_codes(path)
        sk = SuperMinHashSketch.from_codes(codes, m)
        ref_h = formats.read_smh(path + f".smh{m}")
        np.testing.assert_array_equal(sk.h, ref_h)
