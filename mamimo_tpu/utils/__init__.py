"""Numeric + infra utilities."""

from mamimo_tpu.utils.numerics import unit_phasor  # noqa: F401
