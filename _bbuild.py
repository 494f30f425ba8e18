import time
import numpy as np, jax, jax.numpy as jnp
from cuda_selection_criteria_tpu.models import bank as bank_mod
from cuda_selection_criteria_tpu.ops import hll_build, smh_build

rng = np.random.default_rng(0)
P, M = 14, 32
N_GENOMES = 64
CODES = 1 << 20  # ~1M bases per genome

genomes = [rng.integers(0, 4, CODES, np.uint8) for _ in range(N_GENOMES)]

# Path A: current per-genome sketch_codes_device
t0 = time.perf_counter()
outs = [bank_mod.sketch_codes_device(g, 31, P, "smh", M) for g in genomes[:8]]
jax.block_until_ready(outs)
float(outs[-1][0].sum())
t_warm = time.perf_counter() - t0
t0 = time.perf_counter()
outs = [bank_mod.sketch_codes_device(g, 31, P, "smh", M) for g in genomes]
float(sum(o[0].sum() for o in outs))
dt = time.perf_counter() - t0
print(f"per-genome path: {dt:.2f}s for {N_GENOMES} genomes x {CODES} codes "
      f"= {N_GENOMES*CODES/dt/1e6:.1f} Mbases/s (warm {t_warm:.2f}s)")
