"""Wright-omega: accuracy vs the scipy oracle, gradients, quality knob."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import wrightomega

from diffwdf_tpu.roots.omega import wright_omega, wright_omega_u


def _oracle(x):
    return np.real(wrightomega(np.asarray(x, dtype=np.float64)))


def test_f32_accuracy_across_real_line():
    # the audio path needs x in roughly [-70, +40] (log(R*Is/Vt) +- a/Vt)
    x = np.linspace(-80.0, 40.0, 20001).astype(np.float32)
    got = np.asarray(wright_omega(jnp.asarray(x)))
    want = _oracle(x)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    assert np.nanmax(rel) < 5e-6, float(np.nanmax(rel))


def test_f64_accuracy():
    with jax.enable_x64(True):
        x = np.linspace(-200.0, 200.0, 40001)
        got = np.asarray(wright_omega(jnp.asarray(x, dtype=jnp.float64), iters=4))
        want = _oracle(x)
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
        assert np.max(rel) < 1e-13, float(np.max(rel))


def test_special_values():
    # omega(1) = 1 exactly; omega(-inf-ish) ~ e^x
    assert np.allclose(float(wright_omega(jnp.float32(1.0))), 1.0, atol=1e-6)
    assert np.allclose(
        float(wright_omega(jnp.float32(-30.0))), np.exp(-30.0), rtol=1e-5
    )


def test_gradient_is_implicit_and_correct():
    x = jnp.asarray(np.linspace(-10, 10, 101), dtype=jnp.float32)
    g = jax.vmap(jax.grad(lambda t: wright_omega(t)))(x)
    w = wright_omega(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w / (1 + w)), rtol=1e-6)
    # finite-difference check in f64
    with jax.enable_x64(True):
        x0 = jnp.asarray(0.7, dtype=jnp.float64)
        eps = 1e-6
        fd = (wright_omega(x0 + eps, 4) - wright_omega(x0 - eps, 4)) / (2 * eps)
        an = jax.grad(lambda t: wright_omega(t, 4))(x0)
        np.testing.assert_allclose(float(fd), float(an), rtol=1e-7)


def test_quality_knob_monotone():
    x = jnp.asarray(np.linspace(-40, 30, 2001), dtype=jnp.float32)
    want = _oracle(np.asarray(x))
    errs = []
    for it in (1, 2, 3):
        got = np.asarray(wright_omega(x, it))
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
        errs.append(np.max(rel))
    assert errs[2] <= errs[1] <= errs[0] * 1.001
    assert errs[0] < 2e-2  # "low" quality still audio-usable


def test_log_domain_variant():
    x = jnp.asarray(np.linspace(-60, 20, 501), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(wright_omega_u(x))),
        np.asarray(wright_omega(x)),
        rtol=1e-6,
    )
