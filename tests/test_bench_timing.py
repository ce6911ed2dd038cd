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
