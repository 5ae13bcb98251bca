"""Distilled (polynomial-compiled) root nonlinearities.

For a *fixed* port impedance — the serving configuration of the clipper
(``DiodeClipperWDF.cpp:10-16`` sets R once per parameter change) — the root
is a one-dimensional map b = f(a).  The hot loop can then evaluate a short
polynomial instead of Wright-omega solves or MLP matmuls: no transcendentals,
pure fused multiply-adds — the speed-of-light formulation of this recurrence
on the VPU.

The catch: f has complex singularities at the diode knee (|Im a| ~ nabla*Vt,
around |a| ~ 0.4 V for the 1N4148 clipper), so a single Chebyshev expansion
over an audio-scale wave range converges hopelessly slowly.  The compiled
form is therefore a **piecewise odd Chebyshev** model:

    f(a) = a - sign(a) * h(|a|),      h fitted per segment on [0, a_max]

with segment breaks bracketing the knee.  Three segments of degree ~(20,16,12)
reach ~1e-5 absolute error over +-20 V; ``distill_root`` measures and returns
the true max error so quality is a number, not a hope.  (Exactly odd
symmetry is also physically right for symmetric pairs; asymmetric N_up/N_down
roots use the general even+odd variant.)

This plays the role RTNeural's specialized inference engine plays in the
reference: deployment-time compilation of a trained/analytic model.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.circuit import Root


def chebyshev_fit(fn: Callable, lo: float, hi: float, degree: int) -> np.ndarray:
    """Fit fn on [lo, hi] by Chebyshev interpolation at degree+1 nodes.

    fn: vectorized float64 numpy function.  Returns coefficients c[0..degree]
    for sum_k c_k T_k(t), t the affine map of x onto [-1, 1].
    """
    k = np.arange(degree + 1)
    t = np.cos(np.pi * (k + 0.5) / (degree + 1))  # Chebyshev-Gauss nodes
    x = 0.5 * (hi + lo) + 0.5 * (hi - lo) * t
    y = np.asarray(fn(x), dtype=np.float64)
    T = np.cos(np.pi * np.outer(k + 0.5, k) / (degree + 1)).T  # T[j,i]=T_j(t_i)
    c = (2.0 / (degree + 1)) * (T @ y)
    c[0] *= 0.5
    return c


def _clenshaw_np(c, t):
    b1 = np.zeros_like(t)
    b2 = np.zeros_like(t)
    for ck in c[:0:-1]:
        b1, b2 = 2.0 * t * b1 - b2 + ck, b1
    return t * b1 - b2 + c[0]


def clenshaw(c, t):
    """Evaluate sum_k c_k T_k(t) by Clenshaw recurrence (jnp; c is a python
    sequence/np array of *static* coefficients, unrolled at trace time)."""
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    t2 = 2.0 * t
    for ck in tuple(np.asarray(c)[:0:-1].tolist()):
        b1, b2 = t2 * b1 - b2 + ck, b1
    return t * b1 - b2 + float(np.asarray(c)[0])


DEFAULT_BREAKS = (0.8, 4.0)
DEFAULT_DEGREES = (24, 16, 12)


@dataclasses.dataclass(eq=False)
class PiecewiseChebRoot(Root):
    """Root evaluating a piecewise-odd Chebyshev compilation of b = f(a).

    Coefficients are *static* (baked into the compiled program — they are a
    deployment artifact, not trainable parameters).  Valid only at the port
    impedance it was distilled for.
    """

    name: str = "dp"
    a_max: float = 20.0
    breaks: Tuple[float, ...] = DEFAULT_BREAKS
    coeffs: Tuple = ()  # per-segment np arrays for h(|a|)

    def init_params(self):
        return {}

    def reflect(self, a, R, params, controls):
        s = jnp.clip(jnp.abs(a), 0.0, self.a_max)
        edges = (0.0,) + tuple(self.breaks) + (self.a_max,)
        h = None
        for j, c in enumerate(self.coeffs):
            lo, hi = edges[j], edges[j + 1]
            t = jnp.clip((2.0 * s - (hi + lo)) / (hi - lo), -1.0, 1.0)
            hj = clenshaw(c, t)
            h = hj if h is None else jnp.where(s < lo, h, hj)
        return a - jnp.sign(a) * h


def distill_root(
    root: Root,
    params,
    R: float,
    a_max: float = 20.0,
    breaks: Sequence[float] = DEFAULT_BREAKS,
    degrees: Sequence[int] = DEFAULT_DEGREES,
    n_check: int = 8001,
) -> Tuple[PiecewiseChebRoot, float]:
    """Compile ``root`` at port impedance R into a PiecewiseChebRoot.

    Assumes odd symmetry (symmetric diode pairs and the reference's neural
    roots are near-odd; the measured error reflects any asymmetry).
    Returns (distilled_root, max_abs_error over [-a_max, a_max]).
    """

    def f64(x):
        out = root.reflect(jnp.asarray(x, jnp.float32), jnp.float32(R), params, {})
        return np.asarray(out, np.float64)

    def h64(s):
        # odd-symmetrized residual: h(s) = s - (f(s) - f(-s))/2
        return s - 0.5 * (f64(s) - f64(-s))

    edges = (0.0,) + tuple(breaks) + (float(a_max),)
    coeffs = []
    for j, deg in enumerate(degrees):
        coeffs.append(chebyshev_fit(h64, edges[j], edges[j + 1], deg))

    droot = PiecewiseChebRoot(
        name=root.name,
        a_max=float(a_max),
        breaks=tuple(float(b) for b in breaks),
        coeffs=tuple(coeffs),
    )
    xs = np.linspace(-a_max, a_max, n_check)
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    got = np.asarray(droot.reflect(jnp.asarray(xs, dt), dt(R), {}, {}))
    err = float(np.max(np.abs(got - f64(xs))))
    return droot, err
