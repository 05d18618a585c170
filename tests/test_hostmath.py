"""core/hostmath.setup_fn: one-program CPU setup, numpy in/out.

The wrapper exists because the tunneled-TPU environment makes eager op
dispatch and device-constant fetches cost seconds each (see module
docstring); these tests pin its CONTRACT on the CPU backend: host numpy
outputs, value parity with the undecorated function, argument (not
constant) treatment of array inputs, and transparency under tracing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from liwslam.core import hostmath


def _f(a, scale, shift=0.0):
    return {"y": jnp.sin(a) * scale + shift, "n": jnp.asarray(a.shape[0])}


def test_numpy_out_and_value_parity():
    g = hostmath.setup_fn(_f)
    a = np.linspace(0.0, 1.0, 7).astype(np.float32)
    out = g(a, 2.0, shift=1.0)
    ref = _f(jnp.asarray(a), 2.0, shift=1.0)
    assert isinstance(out["y"], np.ndarray)
    assert isinstance(out["n"], (np.ndarray, np.integer))
    np.testing.assert_allclose(out["y"], np.asarray(ref["y"]), rtol=1e-6)
    assert int(out["n"]) == 7


def test_array_values_are_arguments_not_baked():
    # same structure, different values must give different results (the
    # jit program is shared; values ride as arguments)
    g = hostmath.setup_fn(lambda a: a * 2.0)
    np.testing.assert_allclose(g(np.ones(3, np.float32)), 2.0)
    np.testing.assert_allclose(g(np.full(3, 4.0, np.float32)), 8.0)


def test_jax_array_inputs_are_fetched():
    g = hostmath.setup_fn(lambda a: a + 1.0)
    out = g(jnp.arange(4, dtype=jnp.float32))
    assert isinstance(out, np.ndarray)
    np.testing.assert_allclose(out, [1, 2, 3, 4])


def test_transparent_under_jit():
    g = hostmath.setup_fn(lambda a: a * 3.0)

    @jax.jit
    def h(x):
        return g(x) + 1.0

    out = h(jnp.ones(2))
    assert isinstance(out, jax.Array)
    np.testing.assert_allclose(np.asarray(out), 4.0)
