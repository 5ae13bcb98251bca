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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..roots.neural import mlp_apply
from .fused_clipper import (
    _SUB,
    _pack,
    _pack_c1,
    _pack_state,
    _unpack,
    _unpack_state,
    fused_clipper_neural_train_fwd,
)


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


def _clipper_adjoint_pallas(a_seq_p, g_out_p, g_zf_p, p1r_p, c1_p,
                            mlp_params, *, time_chunk, interpret):
    """The clipper's closed-form adjoint as ONE Pallas kernel.

    Marches lam_t = c_t lam_{t+1} + 0.5 (1+c_t) go_t backwards over time
    (batch-tile vectorized), computing m_t = dMLP/da INLINE per step via a
    jvp through the scalar-broadcast SMEM MLP — replacing the XLA backward's
    separate batched-jvp m pass + associative scan + elementwise passes.
    All arrays in the fused kernels' packed layout.

    Returns (g_vin_p, G_p, g_z0_p): input cotangent, the total s_{t+1}
    cotangent stream (residual for the parameter VJP), and lam_0.
    """
    nb, TS8, lanes = a_seq_p.shape
    T = TS8 // _SUB
    while time_chunk > 8 and (time_chunk * lanes > 16384 or T % time_chunk):
        time_chunk //= 2
    assert T % time_chunk == 0, (T, time_chunk)
    nt = T // time_chunk

    layers = mlp_params["layers"]
    W1 = layers[0]["kernel"]  # (2, H)
    H = W1.shape[1]
    w1a = W1[0][None, :]  # (1, H)
    w2f = (
        jnp.stack([l["kernel"].reshape(-1) for l in layers[1:-1]])
        if len(layers) > 2 else jnp.zeros((0, H * H), jnp.float32)
    )
    b2 = (
        jnp.stack([l["bias"] for l in layers[1:-1]])
        if len(layers) > 2 else jnp.zeros((0, H), jnp.float32)
    )
    w3 = layers[-1]["kernel"][:, 0][None, :]  # (1, H)
    L = w2f.shape[0]

    def kernel(w1a_ref, w2f_ref, b2_ref, w3_ref, a_ref, go_ref, gzf_ref,
               p1r_ref, c1_ref, gv_ref, G_ref, gz0_ref, lam_scr):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            lam_scr[...] = gzf_ref[0]

        p = p1r_ref[0]
        c1_tiles = [c1_ref[0, pl.ds(h * _SUB, _SUB), :] for h in range(H)]

        def y_of(av):
            h = [jnp.tanh(w1a_ref[0, jj] * av + c1_tiles[jj])
                 for jj in range(H)]
            for l in range(L):
                h = [
                    jnp.tanh(
                        sum(w2f_ref[l, jj * H + ii] * h[jj]
                            for jj in range(H)) + b2_ref[l, ii]
                    )
                    for ii in range(H)
                ]
            return sum(w3_ref[0, jj] * h[jj] for jj in range(H))

        def body(tr, _):
            t = time_chunk - 1 - tr  # reversed within the chunk
            a = a_ref[0, pl.ds(t * _SUB, _SUB), :]
            go = go_ref[0, pl.ds(t * _SUB, _SUB), :]
            _, m = jax.jvp(y_of, (a,), (jnp.ones_like(a),))
            c = -(m * (1.0 - p) + p)
            lam_next = lam_scr[...]
            G = lam_next + 0.5 * go
            G_ref[0, pl.ds(t * _SUB, _SUB), :] = G
            gv_ref[0, pl.ds(t * _SUB, _SUB), :] = p * (1.0 - m) * G
            lam_scr[...] = c * lam_next + 0.5 * (1.0 + c) * go
            return 0

        jax.lax.fori_loop(0, time_chunk, body, 0)
        gz0_ref[0] = lam_scr[...]

    def tspec():
        return pl.BlockSpec(
            (1, time_chunk * _SUB, lanes),
            lambda i, j: (i, nt - 1 - j, 0),  # time runs backwards
            memory_space=pltpu.VMEM,
        )

    per_tile = pl.BlockSpec((1, _SUB, lanes), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.SMEM)

    gv, G, gz0 = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[
            smem(w1a.shape), smem(w2f.shape), smem(b2.shape), smem(w3.shape),
            tspec(),   # a_seq
            tspec(),   # g_out
            per_tile,  # g_zf
            per_tile,  # p1r
            pl.BlockSpec((1, H * _SUB, lanes), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # c1 (per-row bias)
        ],
        out_specs=[tspec(), tspec(), per_tile],
        out_shape=[
            jax.ShapeDtypeStruct(a_seq_p.shape, jnp.float32),
            jax.ShapeDtypeStruct(a_seq_p.shape, jnp.float32),
            jax.ShapeDtypeStruct((nb, _SUB, lanes), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_SUB, lanes), jnp.float32)],
        interpret=interpret,
    )(
        jnp.asarray(w1a, jnp.float32), jnp.asarray(w2f, jnp.float32),
        jnp.asarray(b2, jnp.float32), jnp.asarray(w3, jnp.float32),
        a_seq_p, g_out_p, g_zf_p, p1r_p, c1_p,
    )
    return gv, G, gz0


def make_fused_clipper_train(
    activations: Tuple[str, ...],
    cap: float,
    fs: float,
    *,
    time_chunk: int = 128,
    lanes: int = 0,
    chunks: int = 2,
    interpret: bool = False,
    backward: str = "pallas",
):
    """Build the differentiable fused clipper op for one (cap, fs) config.

    Returns ``f(vin, z0, mlp_params, r_rows) -> (out, z_final)`` with a
    custom VJP: Pallas forward, and (default) the Pallas adjoint kernel
    backward (``_clipper_adjoint_pallas`` — the m_t pass, the lam
    recurrence and the input cotangent fused into one launch, leaving only
    the parameter VJP to XLA).  ``backward="xla"`` keeps the round-2
    associative-scan path as an oracle.  ``activations`` must be the
    reference NxH family (all-tanh hidden, linear head) — the kernels
    hard-code tanh.
    """
    assert all(a == "tanh" for a in activations[:-1]) and activations[-1] in (
        "", "linear",
    ), f"fused kernel supports the all-tanh NxH family, got {activations}"
    assert backward in ("pallas", "xla"), backward

    kern = functools.partial(
        fused_clipper_neural_train_fwd,
        fs=fs,
        time_chunk=time_chunk,
        lanes=lanes,
        chunks=chunks,
        interpret=interpret,
        seq_packed=(backward == "pallas"),
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

    def f_bwd_pallas(res, cot):
        a_seq_p, mlp_params, r_rows = res  # a_seq packed (nb, T*8, lanes)
        g_out, g_zf = cot
        B, T = g_out.shape
        nb, TS8, lanes_eff = a_seq_p.shape
        log_r, p1r = _log_r_p1r(r_rows)
        layers = mlp_params["layers"]
        c1_p = _pack_c1(log_r, layers[0]["kernel"][1], layers[0]["bias"],
                        lanes_eff)
        gv_p, G_p, gz0_p = _clipper_adjoint_pallas(
            a_seq_p,
            _pack(jnp.asarray(g_out), lanes_eff),
            _pack_state(jnp.asarray(g_zf), lanes_eff),
            _pack_state(p1r.astype(jnp.float32), lanes_eff),
            c1_p,
            mlp_params,
            time_chunk=time_chunk,
            interpret=interpret,
        )
        g_vin = _unpack(gv_p, B, T, lanes_eff)
        g_z0 = _unpack_state(gz0_p)

        # parameter cotangents: one batched VJP with dL/dy = -G, evaluated
        # directly on the packed layout (elementwise MLP; sums are
        # layout-invariant)
        log_r_p = _pack_state(log_r.astype(jnp.float32), lanes_eff)
        log_r_bt_p = jnp.broadcast_to(
            log_r_p[:, None, :, :], (nb, T, _SUB, lanes_eff)
        ).reshape(nb, TS8, lanes_eff)
        _, pullback = jax.vjp(
            lambda mp: _mlp_y(mp, activations, a_seq_p, log_r_bt_p),
            mlp_params,
        )
        (g_mlp,) = pullback(-G_p)
        return g_vin, g_z0, g_mlp, jnp.zeros_like(r_rows)

    def f_bwd(res, cot):
        if backward == "pallas":
            return f_bwd_pallas(res, cot)
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
