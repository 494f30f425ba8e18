"""Native (C++) host runtime bindings."""

from . import fastx

__all__ = ["fastx"]
