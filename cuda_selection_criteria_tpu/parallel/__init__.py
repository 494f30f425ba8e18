"""Parallel/distributed layer: pair-block scheduling, selection engines,
device-mesh sharding."""

from . import mesh, scheduler, screened, selection

__all__ = ["mesh", "scheduler", "selection"]
