"""Shared Pallas kernel helpers."""


def _round_up(x: int, m: int) -> int:
    """Round x up to a multiple of m (lane/sublane tile padding)."""
    return ((x + m - 1) // m) * m
