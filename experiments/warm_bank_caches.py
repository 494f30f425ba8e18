"""Rebuild the /tmp bench bank caches host-side (fresh machine warm-up).

jax is forced to CPU before first use so this never touches the TPU
tunnel (CLAUDE.md: never two TPU processes; bank building is pure
numpy + the batched host MLE)."""
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

for n in (16384, 131072, 262144, 524288):
    t0 = time.time()
    regs, aux, e = bench.build_synthetic_bank(n)
    print(f"bank {n}: {time.time()-t0:.1f}s regs={regs.nbytes/2**30:.2f}GiB",
          flush=True)
