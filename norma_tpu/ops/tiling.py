"""Shared TPU tiling helpers for the Pallas kernels in this package."""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to the next multiple of ``m`` (lane/sublane padding)."""
    return (x + m - 1) // m * m
