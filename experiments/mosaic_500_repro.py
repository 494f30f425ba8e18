"""Minimal repro matrix for the Mosaic remote-compile HTTP 500s.

Three screen-kernel variants die with `remote_compile: HTTP 500:
tpu_compile_helper subprocess exit code 1` on this toolchain
(artifacts/r3/chain5/ktune2.out): deferred scratch accumulation,
r_sub >= 2048, and the int8c16 compare dtype. This probes each failing
axis at the SMALLEST shape that exercises it, plus targeted workarounds
(int32 scratch instead of int16, fewer telescope bins, r_sub exactly at
the boundary), so the failure can be pinned to a toolchain limit or a
fixable kernel property. One JSON line per config.

Run serialized on the TPU tunnel: python experiments/mosaic_500_repro.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from cuda_selection_criteria_tpu.ops import screen

    if jax.default_backend() == "cpu":
        raise SystemExit("repro must run on the TPU backend")

    rng = np.random.default_rng(5)
    n = 1024
    regs = rng.integers(0, 20, size=(n, 1 << 14), dtype=np.uint8)
    values = tuple(range(0, 12))
    small_values = tuple(range(0, 4))
    rt = jnp.asarray(np.zeros(2, np.int32))
    ct = jnp.asarray(np.ones(2, np.int32))
    d = jnp.asarray(regs)

    cases = [
        # control: the production kernel shape
        ("control_int8_512", dict(ti=512, tj=512, precision="int8")),
        # axis 1: deferred scratch, smallest shape / fewest bins
        ("deferred_256_4bins", dict(ti=256, tj=256, precision="int8",
                                    deferred=True), small_values),
        ("deferred_512", dict(ti=512, tj=512, precision="int8",
                              deferred=True)),
        ("deferred_128", dict(ti=128, tj=128, precision="int8",
                              deferred=True), small_values),
        # axis 2: r_sub boundary
        ("rsub_1024", dict(ti=512, tj=512, precision="int8", r_sub=1024)),
        ("rsub_2048", dict(ti=512, tj=512, precision="int8", r_sub=2048)),
        ("rsub_2048_small_tile", dict(ti=128, tj=128, precision="int8",
                                      r_sub=2048), small_values),
        ("rsub_4096_small_tile", dict(ti=128, tj=128, precision="int8",
                                      r_sub=4096), small_values),
        # axis 3: compare dtype
        ("int8c16_512", dict(ti=512, tj=512, precision="int8c16")),
        ("int8c16_128_4bins", dict(ti=128, tj=128, precision="int8c16"),
         small_values),
    ]

    for case in cases:
        name, kw = case[0], dict(case[1])
        vals = case[2] if len(case) > 2 else values
        try:
            s, z = screen.screen_s_z(d, rt, ct, 14, vals, **kw)
            tot = float(jnp.sum(s)) + (float(jnp.sum(z))
                                       if z is not None else 0.0)
            print(json.dumps({"case": name, "ok": True,
                              "checksum": round(tot, 1)}), flush=True)
        except Exception as exc:  # noqa: BLE001 - recording compile faults
            msg = f"{type(exc).__name__}: {exc}"
            print(json.dumps({"case": name, "ok": False,
                              "error": msg[:300]}), flush=True)


if __name__ == "__main__":
    main()
