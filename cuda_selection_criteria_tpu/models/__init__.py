"""Sketch model types: HyperLogLog, SuperMinHash, and stacked sketch banks."""

from .hll import HllSketch
from .smh import SuperMinHashSketch
from .bank import SketchBank, build_bank_from_files

__all__ = ["HllSketch", "SuperMinHashSketch", "SketchBank", "build_bank_from_files"]
