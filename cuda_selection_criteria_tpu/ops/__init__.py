"""Device-side numerical kernels (JAX/XLA + Pallas)."""

from . import hashes, kmers, hll_build, smh_build, estimators, pairwise, criteria, screen

__all__ = [
    "hashes",
    "kmers",
    "hll_build",
    "smh_build",
    "estimators",
    "pairwise",
    "criteria",
]
