"""Numeric + infra utilities."""

from mamimo_tpu.utils.numerics import (  # noqa: F401
    fetch_tree,
    get_complex,
    put_complex,
    unit_phasor,
)
