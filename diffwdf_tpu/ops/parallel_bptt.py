"""Generic differentiable fused engine: Pallas forward, PARALLEL backward.

``ops.clipper_train`` hand-derives the LPF clipper's scalar adjoint; this
module generalizes the same "fused forward + log-depth backward" design to
ANY adapted WDF `Circuit` (multi-state trees, R-type adaptors, analytic or
neural roots) so the Tube Screamer / HPF training workloads and the joint
physics+neural fit leave the sequential-BPTT scan path.

The reference's training differentiates an unrolled per-sample TF graph
(``clipper_pot.py:245-269``) — strictly sequential in both directions.  Here:

- **Forward**: the fused Pallas kernel (``ops.fused_circuit``) runs the whole
  recursion in VMEM and additionally streams out the pre-step state
  trajectory z_{t-1} (the only residual the backward needs).

- **Backward** is the classic adjoint of a recurrence, evaluated WITHOUT a
  sequential loop.  Writing one step as (z_t, o_t) = F(z_{t-1}, v_t, theta),
  the state cotangent lam_t = dL/dz_t obeys the reverse affine recurrence

      lam_{t-1} = J_t^T lam_t + A_t^T obar_t,        lam_T = zbar_f,

  with J_t = dF_z/dz and A_t = dF_o/dz *at the stored trajectory* — all of
  which are embarrassingly parallel over (B, T): S jvp basis passes through
  the batched step build J and A everywhere at once (MXU work for MLP
  roots), one ``associative_scan`` over time solves the S x S affine
  recurrence in O(log T) depth, and the parameter/input cotangents are one
  more batched jvp + one grad of a scalar inner product

      g(theta) = sum_{b,t} <F(z_{t-1}, v_t, theta), (lam_t, obar_t)>,

  which XLA reverse-differentiates through ``circuit.adapt`` and the step in
  a single pass — so component values (R, C), diode physics, AND the neural
  root all receive exact cotangents (the zero-cotangent restriction of the
  clipper-only engine is lifted).

Restrictions: impedance-affecting drives must be batch-constant per call
(hoisted ``static_controls`` or trainable params — the measured-pot per-row
R workload stays on ``ops.clipper_train``); one scalar output probe.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..roots.neural import NeuralDiodeRoot


def _batched_step(circuit, coeffs, params, static_controls, input_node):
    """The circuit step as a pure array function: (state leaves list, v) ->
    (new state leaves list, out), broadcasting over any leading shape (the
    scatter algebra and roots are elementwise / batched jnp ops)."""
    s_treedef = jax.tree_util.tree_structure(circuit.init_state())

    def step(st_vec, v):
        st = jax.tree_util.tree_unflatten(s_treedef, list(st_vec))
        controls = {k: dict(vv) for k, vv in (static_controls or {}).items()}
        controls.setdefault(input_node, {})
        controls[input_node]["v"] = v
        waves: Dict[str, Any] = {}
        a_root = circuit.tree.reflected(coeffs, st, controls, waves)
        r_up = coeffs[circuit.tree.name]["R"]
        b_root = circuit.root.reflect(a_root, r_up, params, controls)
        new_entries = circuit.tree.incident(coeffs, st, controls, waves, b_root)
        new_state = {**st, **new_entries}
        waves[circuit.root.name] = (a_root, b_root)
        S = len(st_vec)
        out_leaves = jax.tree_util.tree_leaves(new_state)[:S]
        return list(out_leaves), circuit.probe(waves)

    return step


def _affine_reverse_scan(M, b, lam_T):
    """Solve lam_{t-1} = M_t lam_t + b_t for t = T..1 in O(log T) depth.

    M: (B, T, S, S); b: (B, T, S); lam_T: (B, S).
    Returns lam_prev (B, T, S) where lam_prev[:, i] = lam_i (i = 0..T-1).
    """

    def combine(e1, e2):
        # scan order = flipped time; x_k = M_k x_{k-1} + b_k composition
        a1, b1 = e1
        a2, b2 = e2
        return (
            jnp.einsum("...ij,...jk->...ik", a2, a1),
            jnp.einsum("...ij,...j->...i", a2, b1) + b2,
        )

    Mf = jnp.flip(M, axis=1)
    bf = jnp.flip(b, axis=1)
    A, Bc = jax.lax.associative_scan(combine, (Mf, bf), axis=1)
    lam_f = jnp.einsum("btij,bj->bti", A, lam_T) + Bc
    return jnp.flip(lam_f, axis=1)


def make_fused_circuit_train_generic(
    circuit,
    *,
    input_node: str = "Vs",
    static_controls: Optional[Dict[str, Dict[str, Any]]] = None,
    time_chunk: int = 128,
    lanes: int = 0,
    interpret: bool = False,
):
    """Build the differentiable fused engine for ``circuit``.

    Returns ``f(params, vin, z0_leaves) -> (out, zf_leaves)`` with a custom
    VJP: ``vin`` (B, T) with B a multiple of 1024, ``z0_leaves`` a list of S
    (B,) arrays in state-pytree leaf order.  Gradients flow to ``params``
    (all of them — tree components, diode physics, MLP weights), ``vin``,
    and ``z0_leaves``.  Semantics match ``circuit.process`` with hoisted
    adaptation.
    """
    from .fused_circuit import fused_circuit_process, fused_circuit_process_neural

    assert len(circuit.outputs) == 1, (
        "parallel-BPTT engine assumes one scalar output probe"
    )
    neural = isinstance(circuit.root, NeuralDiodeRoot)
    root_name = circuit.root.name
    s_treedef = jax.tree_util.tree_structure(circuit.init_state())
    S = s_treedef.num_leaves

    def fwd_kernel(params, vin, z0_leaves, want_seq):
        state0 = jax.tree_util.tree_unflatten(s_treedef, list(z0_leaves))
        kw = dict(
            input_node=input_node,
            static_controls=static_controls,
            time_chunk=time_chunk,
            lanes=lanes,
            interpret=interpret,
            return_state_seq=want_seq,
        )
        if neural:
            tree_params = {k: v for k, v in params.items() if k != root_name}
            res = fused_circuit_process_neural(
                circuit, tree_params, params[root_name], vin, state0, **kw
            )
        else:
            res = fused_circuit_process(circuit, params, vin, state0, **kw)
        out, state_f = res[0], res[1]
        zf_leaves = jax.tree_util.tree_leaves(state_f)[:S]
        seqs = res[2] if want_seq else None
        return out, list(zf_leaves), seqs

    @jax.custom_vjp
    def f(params, vin, z0_leaves):
        out, zf, _ = fwd_kernel(params, vin, z0_leaves, False)
        return out, zf

    def f_fwd(params, vin, z0_leaves):
        out, zf, seqs = fwd_kernel(params, vin, z0_leaves, True)
        return (out, zf), (params, vin, seqs)

    def f_bwd(res, cot):
        params, vin, seqs = res
        g_out, g_zf = cot  # (B, T), list of S (B,)
        lam_T = jnp.stack(
            [jnp.asarray(g) for g in g_zf], axis=-1
        )  # (B, S)

        coeffs = circuit.adapt(params, static_controls or {})
        step = _batched_step(circuit, coeffs, params, static_controls,
                             input_node)
        z_prev = seqs  # list of S (B, T) — state BEFORE each step

        # --- J_t, A_t everywhere at once: ONE linearization, S+1 tangent
        # pulls (the primal is evaluated once, not per basis vector) -------
        _, lin = jax.linearize(step, z_prev, vin)
        cols_z, cols_o = [], []
        for k in range(S):
            dz, do = lin(
                [jnp.full_like(z_prev[0], 1.0 if i == k else 0.0)
                 for i in range(S)],
                jnp.zeros_like(vin),
            )
            cols_z.append(jnp.stack(dz, axis=-1))  # (B, T, S): dF_i/dz_k
            cols_o.append(do)  # (B, T): dF_o/dz_k
        J = jnp.stack(cols_z, axis=-1)  # (B, T, S[i], S[k])
        A = jnp.stack(cols_o, axis=-1)  # (B, T, S)

        M = jnp.swapaxes(J, -1, -2)  # J^T
        b = A * g_out[..., None]  # A^T obar
        lam_prev = _affine_reverse_scan(M, b, lam_T)  # lam_0..lam_{T-1}
        # lam for step i is lam_{i+1}: shift left, lam_T at the end
        lam_step = jnp.concatenate(
            [lam_prev[:, 1:], lam_T[:, None, :]], axis=1
        )  # (B, T, S)

        # --- input cotangent: one more tangent pull along v --------------
        dz_dv, do_dv = lin(
            [jnp.zeros_like(z) for z in z_prev], jnp.ones_like(vin)
        )
        g_vin = (
            sum(jnp.stack(dz_dv, axis=-1)[..., k] * lam_step[..., k]
                for k in range(S))
            + do_dv * g_out
        )

        # --- parameter cotangents: grad of a scalar inner product -------
        # (one reverse pass through adapt + the batched step; sums over
        # (B, T) without materializing per-step parameter gradients)
        def inner(p):
            c = circuit.adapt(p, static_controls or {})
            st = _batched_step(circuit, c, p, static_controls, input_node)
            z_new, o = st(z_prev, vin)
            acc = jnp.sum(o * g_out)
            for k in range(S):
                acc = acc + jnp.sum(z_new[k] * lam_step[..., k])
            return acc

        g_params = jax.grad(inner)(params)
        g_z0 = [lam_prev[:, 0, k] for k in range(S)]
        return g_params, g_vin, g_z0

    f.defvjp(f_fwd, f_bwd)
    return f
