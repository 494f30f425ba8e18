"""Floating-point exactness helpers.

XLA:CPU contracts a multiply feeding an add into an FMA (one rounding
instead of two), which silently changes f64 results vs the reference's
scalar C++ (verified: the ERTL-MLE secant updates diverge by 1 ulp under
jit). `jax.lax.optimization_barrier` does NOT reliably survive to codegen
(XLA removes barriers before fusion), so on CPU `rounded` forces an
explicit rounding point with `nextafter(v, v)` - an IEEE identity (returns
v exactly for every input) that the compiler must evaluate, severing the
mul->add contraction.

On TPU, f64 is double-float emulation (not IEEE f64 at all) and nextafter's
s64 bitcast does not compile, so `rounded` degrades to an optimization
barrier there; the selection engine's host adjudication pass
(utils.hostref.PairOracle) guarantees exact outputs regardless.

Regression coverage: tests/test_estimators.py::test_mle_bit_exact_vs_oracle
fails within 1 ulp if CPU contraction re-appears.
"""

import jax
import jax.numpy as jnp


def rounded(x):
    """Force x to round to its IEEE value before use (blocks FMA fusion)."""
    if jax.default_backend() == "cpu":
        return jnp.nextafter(x, x)
    return jax.lax.optimization_barrier(x)
