"""Minimal repro matrix for the Mosaic remote-compile HTTP 500s.

Round-3 ktune had three screen-kernel variants dying with
`remote_compile: HTTP 500: tpu_compile_helper subprocess exit code 1`.
The round-4 matrix (`artifacts/r4/chain1/mosaic.out`) localized them:

  - r_sub: NOT at fault - 1024/2048/4096 all compile (at any tile size
    small enough for VMEM), so the r3 failures were the deferred-scratch
    variant riding along in those configs;
  - deferred scratch accumulation: compiles at <= 256x256 tiles, HTTP 500
    at 512x512 (scratch + operands past what this Mosaic build handles);
    256-tile shapes run ~2x below the ti=1024 optimum, so the variant was
    RETIRED (ops/screen.py round 4) rather than kept dead;
  - int8c16 (int16 compares) fails at EVERY shape - a toolchain limit;
    the int4-indicator probe path was retired with it.

What remains live is probed here so a toolchain upgrade is noticed: the
r_sub boundary on the production kernel. One JSON line per config.

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
        ("control_int8_512", dict(ti=512, tj=512, precision="int8")),
        ("control_int8_1024", dict(ti=1024, tj=1024, precision="int8")),
        ("rsub_1024", dict(ti=512, tj=512, precision="int8", r_sub=1024)),
        ("rsub_2048", dict(ti=512, tj=512, precision="int8", r_sub=2048)),
        ("rsub_2048_small_tile", dict(ti=128, tj=128, precision="int8",
                                      r_sub=2048), small_values),
        ("rsub_4096_small_tile", dict(ti=128, tj=128, precision="int8",
                                      r_sub=4096), small_values),
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
