"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

This is the TPU-world equivalent of a fake backend (the reference has no
distributed layer to fake - SURVEY.md section 4): multi-chip sharding paths
are validated on virtual CPU devices, exactly as the driver's
dryrun_multichip does.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: tests never use the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments install a site plugin that overrides JAX_PLATFORMS at
# interpreter startup; the config knob below wins over it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"


def reference_available():
    return os.path.isdir(REFERENCE)
