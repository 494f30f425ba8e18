"""Parallel/distributed layer: pair-block scheduling, selection engines,
device-mesh sharding."""

from . import distributed, mesh, scheduler, screened, selection

__all__ = ["mesh", "scheduler", "selection"]
