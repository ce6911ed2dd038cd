"""Bench timing mechanics: the chained step serializes iterations with
a value-visible perturbation and one dispatch per iteration."""

import jax
import jax.numpy as jnp
import numpy as np

from mamimo_tpu.bench import _chained_step, _time_fn


def test_chained_step_perturbs_and_reduces():
    calls = []

    def core(scale, rx):
        calls.append(1)
        return rx * scale

    step = _chained_step(core, (jnp.float32(2.0),))
    rx0 = jnp.ones((4, 8), jnp.float32)
    rx1, s1 = step(rx0)
    # reduction is the squared-magnitude sum of the output
    np.testing.assert_allclose(float(s1), 4.0 * rx0.size, rtol=1e-6)
    # perturbation is value-visible but tiny
    d = np.abs(np.asarray(rx1) - np.asarray(rx0))
    assert d.max() > 0.0
    assert d.max() < 1e-3
    # chaining: the next call sees a different input -> different sum
    _, s2 = step(rx1)
    assert float(s2) != float(s1)


def test_time_fn_counts_iterations():
    n = {"calls": 0}

    def step(rx):
        n["calls"] += 1
        return rx, jnp.float32(1.0)

    dt = _time_fn(step, jnp.zeros((2,)), iters=5)
    assert dt >= 0.0
    assert n["calls"] == 6  # 1 warmup + 5 timed


def test_chained_complex_input():
    step = _chained_step(lambda rx: jnp.abs(rx) ** 2)
    z = jnp.full((3, 3), 1 + 1j, jnp.complex64)
    z1, s = step(z)
    assert z1.dtype == jnp.complex64
    # core output is |1+1j|^2 = 2.0 per element; reduction sums squares
    np.testing.assert_allclose(float(s), 36.0, rtol=1e-5)


def test_chained_step_unroll_matches_sequential():
    """A K-unrolled step (lax.scan inside one program) computes exactly
    the same chain as K sequential single-dispatch steps."""
    core = lambda scale, rx: rx * scale
    extra = (jnp.float32(1.5),)
    step1 = _chained_step(core, extra)
    step3 = _chained_step(core, extra, unroll=3)
    rx0 = jnp.linspace(0.1, 1.0, 16, dtype=jnp.float32).reshape(4, 4)
    r, s = rx0, None
    for _ in range(3):
        r, s = step1(r)
    r3, s3 = step3(rx0)
    np.testing.assert_allclose(np.asarray(r3), np.asarray(r), rtol=1e-6)
    np.testing.assert_allclose(float(s3), float(s), rtol=1e-6)


def test_time_fn_per_call_divides():
    def step(rx):
        return rx, jnp.float32(1.0)

    dt1 = _time_fn(step, jnp.zeros((2,)), iters=4)
    dt4 = _time_fn(step, jnp.zeros((2,)), iters=4, per_call=4)
    assert dt4 <= dt1  # same wall time divided by 4x the work count
