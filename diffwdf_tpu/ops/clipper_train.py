"""Differentiable fused clipper: Pallas forward + associative-scan backward.

The reference's flagship training workload differentiates through the
per-sample WDF recursion by brute-force BPTT over an unrolled TF graph
(``clipper_pot.py:245-269``).  Round 1 of this framework ran BPTT through a
``lax.scan`` — correct, but sequential in both directions.  This module makes
the *fused Pallas kernel* the training forward, and replaces the sequential
backward with closed-form adjoint algebra that maps perfectly onto the TPU:

Forward recursion (per step; s = capacitor state, p = p1R scatter coeff):

    b_temp_t = -p (s_t - v_t)
    a_t      = s_t + b_temp_t
    y_t      = MLP([a_t, log R])
    s_{t+1}  = -y_t + b_temp_t
    o_t      = (s_{t+1} + s_t) / 2

Reverse-mode adjoint: with m_t = dMLP/da at a_t, the state cotangent
``lam_t = dL/ds_t`` satisfies the FIRST-ORDER LINEAR recurrence

    lam_t = c_t lam_{t+1} + 0.5 (1 + c_t) go_t,
    c_t   = -(m_t (1 - p) + p),

so the entire backward-through-time pass is one ``associative_scan``
(O(log T) depth) once m_t is known — and m_t, the parameter gradients, and
the input gradients are all *batched* MLP evaluations over every (B, T)
sample at once: pure MXU work.  The only residual the forward must store is
a_t, which the training kernel writes as a third output.

Gradient targets: vin, z0, and the MLP parameters.  r_rows (measured pot
data) and cap get zero cotangents here BY DESIGN: this engine serves the
measured-data regime where R is data and C is frozen (the reference freezes
both, ``clipper_pot.py``).  Component-learning workloads that need those
cotangents use the generic engine (``ops.parallel_bptt``,
engine="fused_generic"), which differentiates through ``circuit.adapt`` and
reaches every parameter — components, diode physics, and MLP weights.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..roots.neural import mlp_apply
from .fused_clipper import fused_clipper_neural_train_fwd


def _mlp_y(mlp_params, activations, a, log_r):
    """Batched MLP evaluation y = MLP([a, log_r]) over any-shaped a."""
    x = jnp.stack([a, jnp.broadcast_to(log_r, a.shape)], axis=-1)
    return mlp_apply(mlp_params, activations, x)[..., 0]


def _linrec_reverse(c, d, lam_T):
    """Solve lam_t = c_t lam_{t+1} + d_t for t = T-1..0 (axis 1) in
    O(log T) depth.  Returns lam of the same shape as c/d."""

    def combine(e1, e2):
        # e1 earlier in scan order; x_k = A_k x_{k-1} + B_k composition
        a1, b1 = e1
        a2, b2 = e2
        return a2 * a1, a2 * b1 + b2

    cf = jnp.flip(c, axis=1)
    df = jnp.flip(d, axis=1)
    A, Bc = jax.lax.associative_scan(combine, (cf, df), axis=1)
    lam_f = A * lam_T[:, None] + Bc
    return jnp.flip(lam_f, axis=1)


def make_fused_clipper_train(
    activations: Tuple[str, ...],
    cap: float,
    fs: float,
    *,
    time_chunk: int = 128,
    lanes: int = 0,
    chunks: int = 2,
    interpret: bool = False,
):
    """Build the differentiable fused clipper op for one (cap, fs) config.

    Returns ``f(vin, z0, mlp_params, r_rows) -> (out, z_final)`` with a
    custom VJP: Pallas forward, associative-scan backward.  ``activations``
    must be the reference NxH family (all-tanh hidden, linear head) — the
    kernel hard-codes tanh.
    """
    assert all(a == "tanh" for a in activations[:-1]) and activations[-1] in (
        "", "linear",
    ), f"fused kernel supports the all-tanh NxH family, got {activations}"

    kern = functools.partial(
        fused_clipper_neural_train_fwd,
        fs=fs,
        time_chunk=time_chunk,
        lanes=lanes,
        chunks=chunks,
        interpret=interpret,
    )

    def _log_r_p1r(r_rows):
        r_c = 1.0 / (2.0 * cap * fs)
        g = 1.0 / r_rows + 1.0 / r_c
        return jnp.log(1.0 / g), (1.0 / r_rows) / g

    @jax.custom_vjp
    def f(vin, z0, mlp_params, r_rows):
        out, zf, _ = kern(vin, z0, mlp_params, r_rows, cap)
        return out, zf

    def f_fwd(vin, z0, mlp_params, r_rows):
        out, zf, a_seq = kern(vin, z0, mlp_params, r_rows, cap)
        return (out, zf), (a_seq, mlp_params, r_rows)

    def f_bwd(res, cot):
        a_seq, mlp_params, r_rows = res
        g_out, g_zf = cot
        log_r, p1r = _log_r_p1r(r_rows)
        log_r_bt = jnp.broadcast_to(log_r[:, None], a_seq.shape)
        p = p1r[:, None]

        # m_t = dMLP/da at every stored root input — one batched JVP
        _, m = jax.jvp(
            lambda a: _mlp_y(mlp_params, activations, a, log_r_bt),
            (a_seq,),
            (jnp.ones_like(a_seq),),
        )

        c = -(m * (1.0 - p) + p)
        d = 0.5 * (1.0 + c) * g_out
        lam = _linrec_reverse(c, d, g_zf)  # lam_t, t = 0..T-1
        lam_next = jnp.concatenate([lam[:, 1:], g_zf[:, None]], axis=1)
        G = lam_next + 0.5 * g_out  # total cotangent of s_{t+1}

        g_vin = p * (1.0 - m) * G
        g_z0 = lam[:, 0]

        # parameter cotangents: batched VJP with dL/dy = -G
        _, pullback = jax.vjp(
            lambda mp: _mlp_y(mp, activations, a_seq, log_r_bt), mlp_params
        )
        (g_mlp,) = pullback(-G)
        return g_vin, g_z0, g_mlp, jnp.zeros_like(r_rows)

    f.defvjp(f_fwd, f_bwd)
    return f
