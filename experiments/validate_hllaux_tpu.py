#!/usr/bin/env python
"""Scale differential validation of the hll_a/hll_an aux-screened engine:
planted near-duplicate clusters with HLL aux sketches, TPU screened engine
vs the sequential host reference, exact-equality required (run on the
accelerator; see validate_screened_tpu.py for the smh_a twin)."""
import sys, time
import numpy as np
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax.numpy as jnp
from cuda_selection_criteria_tpu.models.bank import SketchBank
from cuda_selection_criteria_tpu.ops import hll_build
from cuda_selection_criteria_tpu.parallel.selection import SelectionParams
from cuda_selection_criteria_tpu.parallel.screened import select_pairs_screened
from cuda_selection_criteria_tpu.utils.hostref import select_pairs_host

rng = np.random.default_rng(11)
n, items, p, p_aux = 1024, 4096, 14, 8
genomes = []
for c in range(24):
    base = rng.integers(0, 1 << 63, items, np.uint64)
    for _ in range(int(rng.integers(2, 5))):
        g = base.copy()
        idx = rng.choice(items, size=int(0.04 * items), replace=False)
        g[idx] = rng.integers(0, 1 << 63, idx.size, np.uint64)
        genomes.append(g)
while len(genomes) < n:
    genomes.append(rng.integers(0, 1 << 63, items, np.uint64))
genomes = genomes[:n]
regs_l, aux_l = [], []
for b0 in range(0, n, 256):
    chunk = genomes[b0:b0+256]
    kms = jnp.asarray(np.concatenate(chunk))
    gids = jnp.asarray(np.repeat(np.arange(len(chunk), dtype=np.int32), items))
    valid = jnp.ones(kms.shape, bool)
    regs_l.append(np.asarray(hll_build.hll_build_batch(kms, valid, gids, p, len(chunk))))
    aux_l.append(np.asarray(hll_build.hll_build_batch(kms, valid, gids, p_aux, len(chunk))))
bank = SketchBank(names=[f"g{i:05d}" for i in range(n)], p=p,
                  regs=np.concatenate(regs_l), aux_kind="hll",
                  aux=np.concatenate(aux_l), aux_param=p_aux)
for crit in ("hll_a", "hll_an"):
    params = SelectionParams(tau=0.8, criterion=crit)
    t0 = time.perf_counter()
    got = select_pairs_screened(bank, params)
    dt = time.perf_counter() - t0
    want = select_pairs_host(bank, 0.8, crit)
    ok = [(a,b,round(j,12)) for a,b,j in want] == [(a,b,round(j,12)) for a,b,j in got]
    print(f"{crit}: screened={len(got)} host={len(want)} match={ok} ({dt:.1f}s)", flush=True)
    assert ok
print("HLL-AUX SCALE OK")
