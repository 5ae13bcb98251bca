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

Impedance-affecting drives may be batch-constant (``static_controls``),
PER-ROW, or PER-SAMPLE (``row_fields`` — the reference's measured-pot
workload, ``clipper_pot.py:113-124``): adaptation runs batched outside the
kernels and the resulting coefficients stream through forward and adjoint
as batch tiles ((B,) values) or full (B, T) per-sample streams.  Remaining
restrictions: one scalar output probe; per-row/per-sample controls must not
reach matrix-valued coefficients (keep pots outside R-type adaptors, as the
Tube Screamer's drive pot is).

Chip-parity note: with the NEURAL root the forward kernel's Kronecker dots
run the MXU's single-pass bf16 multiply, so on-chip outputs carry the same
documented ~4e-3 class error as every Kron forward kernel — identically
with no pot, per-row pots, and per-sample pots (measured,
``runs/probes/fused_train_chip_parity_probe.json``); analytic-root paths
are VPU f32 and bit-exact vs the scan.  Training converges to the same
val-ESR floor as the scan engine regardless (501-epoch runs under
``runs/``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..roots.neural import NeuralDiodeRoot


def _prec_ctx(mxu_precision):
    """Precision context for the XLA-side passes: open a context ONLY for
    "highest" — entering ``default_matmul_precision(None)`` would reset an
    ambient global the user set, silently downgrading their precision."""
    import contextlib

    if mxu_precision == "highest":
        return jax.default_matmul_precision("highest")
    return contextlib.nullcontext()


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


def _affine_reverse_scan(M, b, lam_T, S):
    """Solve lam_{t-1} = M_t lam_t + b_t for t = T..1 in O(log T) depth.

    Layout: the S x S matrices live as NESTED TUPLES of (B, T) arrays, not
    as (B, T, S, S) tensors — trailing dims of size S (3 for the Tube
    Screamer) force XLA:TPU into padded tiny-matmul/relayout code paths
    (measured 7x slower than the sequential scan at B=1024, T=2048); with
    (B, T) as the minor dims every combine is full-width VPU work.

    M[i][j]: (B, T); b[i]: (B, T); lam_T[i]: (B,).
    Returns lam_prev, a list of S (B, T) arrays (lam_prev[k][:, t] = lam_t).
    """

    def combine(e1, e2):
        # scan order = flipped time; x_k = M_k x_{k-1} + b_k composition
        a1, b1 = e1
        a2, b2 = e2
        a = tuple(
            tuple(
                sum(a2[i][k] * a1[k][j] for k in range(S)) for j in range(S)
            )
            for i in range(S)
        )
        bb = tuple(
            sum(a2[i][k] * b1[k] for k in range(S)) + b2[i] for i in range(S)
        )
        return (a, bb)

    Mf = tuple(
        tuple(jnp.flip(M[i][j], axis=1) for j in range(S)) for i in range(S)
    )
    bf = tuple(jnp.flip(b[i], axis=1) for i in range(S))
    A, Bc = jax.lax.associative_scan(combine, (Mf, bf), axis=1)
    lam_f = [
        sum(A[i][k] * lam_T[k][:, None] for k in range(S)) + Bc[i]
        for i in range(S)
    ]
    return [jnp.flip(l, axis=1) for l in lam_f]


@functools.partial(
    jax.jit,
    static_argnames=("circuit", "input_node", "time_chunk", "lanes",
                     "interpret", "root_override", "root_kinds", "n_state"),
)
def _fused_backward_kernel(
    circuit,
    params,
    vin_p,
    g_out_p,
    z_prev_p,
    lam_T_p,
    *,
    input_node: str,
    static_controls,
    row_controls=None,
    time_chunk: int,
    lanes: int,
    interpret: bool,
    root_override=None,
    root_arrays: tuple = (),
    root_kinds: tuple = (),
    n_state: int = 1,
):
    """Reverse adjoint of the circuit recurrence as ONE Pallas kernel.

    Solves lam_{t-1} = J_t^T lam_t + A_t^T obar_t sequentially over time
    (vectorized over the batch tile — the same structure that makes the
    forward kernel fast), with J_t = dF_z/dz and A_t = dF_o/dz computed
    INLINE at the stored trajectory by S+1 jvp basis pulls of the circuit
    step traced in the kernel body (the DEER kernels' ``f_and_jac``
    pattern).  This replaces the round-3 XLA backward — S+1 whole-array
    linearize pulls plus an ``associative_scan`` over S^2+S (B, T) arrays
    (11 combine levels of HBM traffic) — with a single pass that touches
    each trajectory element once.

    All arrays are in the fused kernels' packed layout ((nb, T*8, lanes),
    ``fused_clipper._pack``); time block j of the grid maps to time chunk
    nt-1-j so the carried adjoint runs backwards with zero relayout.

    Returns (lam_step list of S packed (nb, T*8, lanes) — lam_t for step t,
    g_vin packed, g_z0 (nb, S*8, lanes)).
    """
    from .fused_circuit import _classify_leaves, _merge_controls, _rebuild_leaves
    from .fused_clipper import _pack_state

    _SUB = 8
    nb, TS8, _lanes = vin_p.shape
    assert _lanes == lanes
    T = TS8 // _SUB
    B = nb * _SUB * lanes
    S = n_state

    adapt_controls = _merge_controls(static_controls, row_controls)
    coeffs = circuit.adapt(params, adapt_controls)
    bundle = (coeffs, params, static_controls or {})
    leaves, treedef = jax.tree_util.tree_flatten(bundle)
    vec, specs, row_leaves, time_leaves = _classify_leaves(
        leaves, batch=B if row_controls else 0, time=T if row_controls else 0
    )
    sc = jnp.stack(vec).astype(jnp.float32)[None, :]
    rows_p = tuple(_pack_state(r, lanes) for r in row_leaves)
    n_row = len(rows_p)
    from .fused_clipper import _pack as _pack_bt

    times_p = tuple(_pack_bt(t, lanes) for t in time_leaves)
    n_time = len(times_p)

    # VMEM budget: (2 + S + n_time) in + (S + 1) out time-blocked tiles,
    # double buffered -> keep tc * lanes small enough that they all fit
    budget = 65536 // (2 * S + 3 + n_time)
    while time_chunk > 8 and (time_chunk * lanes > budget or T % time_chunk):
        time_chunk //= 2
    assert T % time_chunk == 0, (T, time_chunk)
    nt = T // time_chunk

    s_treedef = jax.tree_util.tree_structure(circuit.init_state())
    root_arrays = tuple(jnp.asarray(a, jnp.float32) for a in root_arrays)
    n_root = len(root_arrays)
    kinds = tuple(root_kinds) + ("vmem",) * (n_root - len(root_kinds))

    def kernel(sc_ref, in_ref, go_ref, *rest):
        zp_refs = rest[:S]
        lamT_ref = rest[S]
        row_refs = rest[S + 1 : S + 1 + n_row]
        time_refs = rest[S + 1 + n_row : S + 1 + n_row + n_time]
        nrt = n_row + n_time
        root_refs = rest[S + 1 + nrt : S + 1 + nrt + n_root]
        lam_refs = rest[S + 1 + nrt + n_root : 2 * S + 1 + nrt + n_root]
        gv_ref = rest[2 * S + 1 + nrt + n_root]
        gz0_ref = rest[2 * S + 2 + nrt + n_root]
        lam_scr = rest[-1]
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            lam_scr[...] = lamT_ref[0]

        row_views = tuple(r[0] for r in row_refs)
        root_views = tuple(
            r if k == "smem" else (r[0] if k == "tile" else r[...])
            for r, k in zip(root_refs, kinds)
        )

        def make_step_fn(tv):
            coeffs_k, params_k, static_k = jax.tree_util.tree_unflatten(
                treedef, _rebuild_leaves(sc_ref, specs, row_views, tv)
            )

            def step_fn(st_vec, v):
                st = jax.tree_util.tree_unflatten(s_treedef, list(st_vec))
                controls = {k: dict(vv) for k, vv in static_k.items()}
                controls.setdefault(input_node, {})
                controls[input_node]["v"] = v
                waves: Dict[str, Any] = {}
                a_root = circuit.tree.reflected(coeffs_k, st, controls, waves)
                r_up = coeffs_k[circuit.tree.name]["R"]
                if root_override is not None:
                    b_root = root_override(a_root, r_up, root_views)
                else:
                    b_root = circuit.root.reflect(
                        a_root, r_up, params_k, controls
                    )
                new_entries = circuit.tree.incident(
                    coeffs_k, st, controls, waves, b_root
                )
                new_state = {**st, **new_entries}
                waves[circuit.root.name] = (a_root, b_root)
                out_leaves = jax.tree_util.tree_leaves(new_state)[:S]
                return list(out_leaves), circuit.probe(waves)

            return step_fn

        if n_time == 0:
            _step_invariant = make_step_fn(())

        def body(tr, _):
            t = time_chunk - 1 - tr  # reversed within the chunk
            if n_time == 0:
                step_fn = _step_invariant
            else:
                step_fn = make_step_fn(tuple(
                    ref[0, pl.ds(t * _SUB, _SUB), :] for ref in time_refs
                ))
            v = in_ref[0, pl.ds(t * _SUB, _SUB), :]
            go = go_ref[0, pl.ds(t * _SUB, _SUB), :]
            zp = [zp_refs[k][0, pl.ds(t * _SUB, _SUB), :] for k in range(S)]
            lam = [lam_scr[pl.ds(k * _SUB, _SUB), :] for k in range(S)]
            # lam_step[t] = lam_t (post-step cotangent; written pre-update)
            for k in range(S):
                lam_refs[k][0, pl.ds(t * _SUB, _SUB), :] = lam[k]
            # one linearization of the step at (z_{t-1}, v_t); S+1 pulls of
            # the linear map give J columns, A, and the v sensitivities
            _, lin = jax.linearize(step_fn, zp, v)
            zeros_v = jnp.zeros_like(v)
            lam_new = [jnp.zeros_like(lam[0]) for _ in range(S)]
            for k in range(S):
                basis = [
                    jnp.full_like(zp[0], 1.0 if i == k else 0.0)
                    for i in range(S)
                ]
                dz_k, do_k = lin(basis, zeros_v)
                # lam_new[k] = sum_i (dF_i/dz_k) lam_i + (dF_o/dz_k) obar
                lam_new[k] = (
                    sum(dz_k[i] * lam[i] for i in range(S)) + do_k * go
                )
            dz_v, do_v = lin([jnp.zeros_like(z) for z in zp],
                             jnp.ones_like(v))
            gv_ref[0, pl.ds(t * _SUB, _SUB), :] = (
                sum(dz_v[i] * lam[i] for i in range(S)) + do_v * go
            )
            for k in range(S):
                lam_scr[pl.ds(k * _SUB, _SUB), :] = lam_new[k]
            return 0

        jax.lax.fori_loop(0, time_chunk, body, 0)
        gz0_ref[0] = lam_scr[...]

    zrows = S * _SUB

    def tspec():
        return pl.BlockSpec(
            (1, time_chunk * _SUB, lanes),
            lambda i, j: (i, nt - 1 - j, 0),  # time runs backwards
            memory_space=pltpu.VMEM,
        )

    def _full(shape, space):
        return pl.BlockSpec(
            shape, lambda i, j: tuple(0 for _ in shape), memory_space=space
        )

    def _tile_spec(shape):
        return pl.BlockSpec(
            (1,) + tuple(shape[1:]),
            lambda i, j: (i,) + tuple(0 for _ in shape[1:]),
            memory_space=pltpu.VMEM,
        )

    def _root_spec(shape, kind):
        if kind == "smem":
            return _full(shape, pltpu.SMEM)
        if kind == "tile":
            return _tile_spec(shape)
        return _full(shape, pltpu.VMEM)

    results = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec(
                (1, sc.shape[1]), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            tspec(),  # vin
            tspec(),  # g_out
            *[tspec() for _ in range(S)],  # z_prev
            pl.BlockSpec(
                (1, zrows, lanes), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # lam_T
            *[_tile_spec(r.shape) for r in rows_p],
            *[tspec() for _ in times_p],  # per-sample pot streams (reversed)
            *[_root_spec(a.shape, k) for a, k in zip(root_arrays, kinds)],
        ],
        out_specs=[
            *[tspec() for _ in range(S)],  # lam_step
            tspec(),  # g_vin
            pl.BlockSpec(
                (1, zrows, lanes), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # g_z0
        ],
        out_shape=[
            *[jax.ShapeDtypeStruct(vin_p.shape, jnp.float32)
              for _ in range(S)],
            jax.ShapeDtypeStruct(vin_p.shape, jnp.float32),
            jax.ShapeDtypeStruct((nb, zrows, lanes), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((zrows, lanes), jnp.float32)],
        interpret=interpret,
    )(sc, vin_p, g_out_p, *z_prev_p, lam_T_p, *rows_p, *times_p, *root_arrays)

    lam_step = list(results[:S])
    g_vin_p = results[S]
    g_z0_p = results[S + 1]
    return lam_step, g_vin_p, g_z0_p


def _mlp_root_smem_rowc1(a, r_up, refs):
    """NxH MLP root with a PER-ROW first-layer bias: the c1 tile
    (H*8, lanes) carries W1[logR-col] * log R_row + b1 per batch element
    (per-row pot data), hidden unit h in sublane rows [h*8, h*8+8).  SMEM
    scalar-broadcast math otherwise identical to
    ``deer_circuit._mlp_root_smem``."""
    w1a, w2f, b2, w3, b3, c1t = refs
    H = w1a.shape[1]
    h = [
        jnp.tanh(w1a[0, j] * a + c1t[j * 8 : (j + 1) * 8, :])
        for j in range(H)
    ]
    for l in range(w2f.shape[0]):
        h = [
            jnp.tanh(
                sum(w2f[l, j * H + i] * h[j] for j in range(H)) + b2[l, i]
            )
            for i in range(H)
        ]
    y = sum(w3[0, j] * h[j] for j in range(H)) + b3[0, 0]
    return -y


def _mlp_root_smem_timevar(a, r_up, refs):
    """NxH MLP root with PER-SAMPLE R conditioning for the adjoint kernel:
    r_up arrives as the current step's (8, lanes) impedance tile (a "time"
    coeff leaf), and the first layer adds w1r * log(r_up) per unit — all
    SMEM scalar-broadcast VPU math."""
    w1a, w1r, b1, w2f, b2, w3, b3 = refs
    H = w1a.shape[1]
    lr = jnp.log(r_up)
    h = [
        jnp.tanh(w1a[0, j] * a + w1r[0, j] * lr + b1[0, j])
        for j in range(H)
    ]
    for l in range(w2f.shape[0]):
        h = [
            jnp.tanh(
                sum(w2f[l, j * H + i] * h[j] for j in range(H)) + b2[l, i]
            )
            for i in range(H)
        ]
    y = sum(w3[0, j] * h[j] for j in range(H)) + b3[0, 0]
    return -y


def make_fused_circuit_train_generic(
    circuit,
    *,
    input_node: str = "Vs",
    static_controls: Optional[Dict[str, Dict[str, Any]]] = None,
    row_fields: tuple = (),
    time_chunk: int = 128,
    lanes: int = 0,
    interpret: bool = False,
    backward: str = "pallas",
    mxu_precision: str = "default",
):
    """Build the differentiable fused engine for ``circuit``.

    Returns ``f(params, vin, z0_leaves) -> (out, zf_leaves)`` with a custom
    VJP: ``vin`` (B, T) with B a multiple of 1024, ``z0_leaves`` a list of S
    (B,) arrays in state-pytree leaf order.  Gradients flow to ``params``
    (all of them — tree components, diode physics, MLP weights), ``vin``,
    and ``z0_leaves``.  Semantics match ``circuit.process`` with hoisted
    adaptation.

    row_fields: static tuple of (node, field) pairs naming PER-ROW or
    PER-SAMPLE impedance controls — the reference's measured-pot training
    semantics (``clipper_pot.py:113-124``).  When non-empty the returned fn
    takes a fourth argument ``row_vals`` (one array per pair, data — zero
    cotangent): a (B,) value adapts once per row ("row" coefficient tiles),
    a (B, T) value re-adapts EVERY SAMPLE — the adapted coefficients become
    (B, T) streams fed to both kernels alongside the drive signal, and the
    neural root's log-R conditioning is recomputed per step from the
    streamed tree-top impedance.  This lifts the round-4 batch-constant-
    impedance restriction completely: ANY circuit trains the per-sample
    re-adaptation workload at fused-adjoint speed.

    backward: "pallas" (default) runs the adjoint recurrence as one fused
    kernel (``_fused_backward_kernel``) and keeps every residual in the
    kernels' packed layout end-to-end; "xla" is the round-3 path (S+1
    linearize pulls + log-depth associative scan) kept as an oracle — both
    are gradchecked against scan BPTT.

    mxu_precision: "default" (single-pass bf16 MXU dots in the neural
    forward — the ~4e-3 on-chip class the convergence runs accept; the
    scan oracle's own XLA matmuls run the same bf16 by default, so the
    "error vs scan" is bf16 on both sides) or "highest" (3-pass bf16x3,
    f32-class — 2e-5 parity against a highest-precision scan at +4% step
    cost, measured in runs/probes/fused_train_chip_parity_probe.json; the
    same knob the pretraining workload exposes).
    """
    from .fused_circuit import (
        _merge_controls,
        fused_circuit_process,
        fused_circuit_process_neural,
    )

    assert len(circuit.outputs) == 1, (
        "parallel-BPTT engine assumes one scalar output probe"
    )
    assert backward in ("pallas", "xla"), backward
    neural = isinstance(circuit.root, NeuralDiodeRoot)
    root_name = circuit.root.name
    s_treedef = jax.tree_util.tree_structure(circuit.init_state())
    S = s_treedef.num_leaves

    def _rc(row_vals):
        rc: Dict[str, Dict[str, Any]] = {}
        for (node, field), val in zip(row_fields, row_vals):
            rc.setdefault(node, {})[field] = jnp.asarray(val, jnp.float32)
        return rc

    def fwd_kernel(params, vin, z0_leaves, row_vals, want_seq):
        state0 = jax.tree_util.tree_unflatten(s_treedef, list(z0_leaves))
        kw = dict(
            input_node=input_node,
            static_controls=static_controls,
            row_controls=_rc(row_vals) or None,
            time_chunk=time_chunk,
            lanes=lanes,
            interpret=interpret,
            return_state_seq=want_seq,
            seq_packed=(backward == "pallas"),
        )
        if neural:
            kw["mxu_precision"] = mxu_precision
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
    def f4(params, vin, z0_leaves, row_vals):
        out, zf, _ = fwd_kernel(params, vin, z0_leaves, row_vals, False)
        return out, zf

    def f_fwd(params, vin, z0_leaves, row_vals):
        out, zf, seqs = fwd_kernel(params, vin, z0_leaves, row_vals, True)
        return (out, zf), (params, vin, row_vals, seqs)

    def f_bwd_pallas(res, cot):
        from .deer_circuit import _mlp_root_smem
        from .fused_clipper import (
            _pack, _pack_c1, _pack_state, _unpack, auto_lanes,
        )

        params, vin, row_vals, seqs = res  # seqs: S packed (nb, T*8, lanes)
        g_out, g_zf = cot
        B, T = vin.shape
        lanes_eff = lanes or auto_lanes(B, T, time_chunk)
        rc = _rc(row_vals)
        vin_p = _pack(vin, lanes_eff)
        g_out_p = _pack(jnp.asarray(g_out), lanes_eff)
        lam_T_p = jnp.concatenate(
            [_pack(jnp.asarray(g).reshape(B, 1), lanes_eff) for g in g_zf],
            axis=1,
        )
        if neural:
            coeffs = circuit.adapt(params, _merge_controls(static_controls, rc))
            log_r = jnp.log(coeffs[circuit.tree.name]["R"])
            layers = params[root_name]["layers"]
            W1, b1 = layers[0]["kernel"], layers[0]["bias"]
            W3, b3 = layers[-1]["kernel"], layers[-1]["bias"]
            w2f_s = jnp.stack([l["kernel"].reshape(-1) for l in layers[1:-1]])
            b2_s = jnp.stack([l["bias"] for l in layers[1:-1]])
            if jnp.ndim(log_r) == 2:  # per-SAMPLE pot: log R from the
                # streamed impedance tile, inside the root
                ras = (
                    W1[0:1, :], W1[1:2, :], b1[None, :],
                    w2f_s, b2_s, W3[:, 0][None, :], b3.reshape(1, 1),
                )
                kinds = ("smem",) * 7
                ro = _mlp_root_smem_timevar
            elif rc:
                c1_p = _pack_c1(
                    jnp.broadcast_to(log_r, (B,)), W1[1], b1, lanes_eff
                )
                ras = (
                    W1[0:1, :], w2f_s, b2_s, W3[:, 0][None, :],
                    b3.reshape(1, 1), c1_p,
                )
                kinds = ("smem",) * 5 + ("tile",)
                ro = _mlp_root_smem_rowc1
            else:
                ras = (
                    W1[0:1, :],
                    (W1[1] * log_r + b1)[None, :],
                    w2f_s, b2_s, W3[:, 0][None, :], b3.reshape(1, 1),
                )
                kinds = ("smem",) * 6
                ro = _mlp_root_smem
            k_params = {k: v for k, v in params.items() if k != root_name}
        else:
            k_params, ro, ras, kinds = params, None, (), ()
        lam_step_p, g_vin_p, g_z0_p = _fused_backward_kernel(
            circuit, k_params, vin_p, g_out_p, tuple(seqs), lam_T_p,
            input_node=input_node, static_controls=static_controls,
            row_controls=rc or None,
            time_chunk=time_chunk, lanes=lanes_eff, interpret=interpret,
            root_override=ro, root_arrays=ras, root_kinds=kinds, n_state=S,
        )
        g_vin = _unpack(g_vin_p, B, T, lanes_eff)
        g_z0 = [
            g_z0_p[:, k * 8 : (k + 1) * 8, :].reshape(B) for k in range(S)
        ]

        # parameter cotangents: grad of the scalar inner product, evaluated
        # directly ON the packed layout (the batched step is elementwise,
        # the sums are layout-invariant) — zero transpose traffic.  The
        # neural root stays in its DENSE mlp_apply form here: a
        # scalar-broadcast elementwise rewrite (_mlp_reflect_elemwise) was
        # chip-measured ~2x SLOWER for this reverse pass (grad_inner 3.05
        # -> 5.94 ms — the unrolled 16-wide FMA chains cost more than the
        # padded K=2/H matmuls they replaced; negative result kept in
        # runs/probes/parallel_bptt_profile_elemwise_negative.json).
        # With per-row controls the packed arrays are viewed (nb, T, 8,
        # lanes) so the (nb, 1, 8, lanes)-packed per-row coefficients
        # broadcast across time.
        nb = vin_p.shape[0]
        shp = (nb, T, 8, lanes_eff)

        def inner(p):
            if rc:
                rc_p = {
                    n: {
                        fld: (
                            _pack(v, lanes_eff).reshape(shp)
                            if jnp.ndim(v) == 2
                            else _pack_state(v, lanes_eff)[:, None]
                        )
                        for fld, v in d.items()
                    }
                    for n, d in rc.items()
                }
                c = circuit.adapt(p, _merge_controls(static_controls, rc_p))
                st = _batched_step(circuit, c, p, static_controls, input_node)
                z_new, o = st(
                    [s.reshape(shp) for s in seqs], vin_p.reshape(shp)
                )
                acc = jnp.sum(o * g_out_p.reshape(shp))
                for k in range(S):
                    acc = acc + jnp.sum(
                        z_new[k] * lam_step_p[k].reshape(shp)
                    )
                return acc
            c = circuit.adapt(p, static_controls or {})
            st = _batched_step(circuit, c, p, static_controls, input_node)
            z_new, o = st(list(seqs), vin_p)
            acc = jnp.sum(o * g_out_p)
            for k in range(S):
                acc = acc + jnp.sum(z_new[k] * lam_step_p[k])
            return acc

        # the parameter pass runs XLA dense matmuls (mlp_apply); honor the
        # precision knob here too so "highest" delivers f32-class GRADS,
        # not only the forward.  At "default" we must NOT open a context at
        # all — entering default_matmul_precision(None) would actively
        # RESET an ambient global the user set (e.g. the pretraining
        # workload's jax_default_matmul_precision="highest"), a silent
        # downgrade
        with _prec_ctx(mxu_precision):
            g_params = jax.grad(inner)(params)
        return g_params, g_vin, g_z0, tuple(
            jnp.zeros_like(jnp.asarray(v)) for v in row_vals
        )

    def f_bwd(res, cot):
        if backward == "pallas":
            return f_bwd_pallas(res, cot)
        with _prec_ctx(mxu_precision):
            return _f_bwd_xla(res, cot)

    def _f_bwd_xla(res, cot):
        # entire XLA backward under the precision knob: the linearize
        # pulls that build J_t/A_t contain the neural root's matmuls, so
        # wrapping only the parameter pass would leave the adjoint
        # coefficients bf16-class while claiming "highest"
        params, vin, row_vals, seqs = res
        g_out, g_zf = cot  # (B, T), list of S (B,)
        lam_T = [jnp.asarray(g) for g in g_zf]  # S x (B,)

        # per-row controls enter the XLA path as (B, 1) so the adapted
        # coefficients broadcast against the (B, T) trajectory arrays;
        # per-SAMPLE (B, T) streams already line up
        rc1 = {
            n: {
                fld: (
                    jnp.asarray(v)
                    if jnp.ndim(v) == 2 else jnp.asarray(v)[:, None]
                )
                for fld, v in d.items()
            }
            for n, d in _rc(row_vals).items()
        }
        coeffs = circuit.adapt(params, _merge_controls(static_controls, rc1))
        step = _batched_step(circuit, coeffs, params, static_controls,
                             input_node)
        z_prev = seqs  # list of S (B, T) — state BEFORE each step

        # --- J_t, A_t everywhere at once: ONE linearization, S+1 tangent
        # pulls (the primal is evaluated once, not per basis vector).  All
        # results stay (B, T)-shaped — see _affine_reverse_scan for why ---
        _, lin = jax.linearize(step, z_prev, vin)
        Jz = [[None] * S for _ in range(S)]  # Jz[i][k] = dF_i/dz_k  (B, T)
        Ao = [None] * S  # Ao[k] = dF_o/dz_k  (B, T)
        for k in range(S):
            dz, do = lin(
                [jnp.full_like(z_prev[0], 1.0 if i == k else 0.0)
                 for i in range(S)],
                jnp.zeros_like(vin),
            )
            for i in range(S):
                Jz[i][k] = dz[i]
            Ao[k] = do

        M = tuple(  # J^T: M[k][i] = dF_i/dz_k
            tuple(Jz[i][k] for i in range(S)) for k in range(S)
        )
        b = tuple(Ao[k] * g_out for k in range(S))  # A^T obar
        lam_prev = _affine_reverse_scan(M, b, lam_T, S)  # lam_0..lam_{T-1}
        # lam for step i is lam_{i+1}: shift left, lam_T at the end
        lam_step = [
            jnp.concatenate([lam_prev[k][:, 1:], lam_T[k][:, None]], axis=1)
            for k in range(S)
        ]  # S x (B, T)

        # --- input cotangent: one more tangent pull along v --------------
        dz_dv, do_dv = lin(
            [jnp.zeros_like(z) for z in z_prev], jnp.ones_like(vin)
        )
        g_vin = (
            sum(dz_dv[k] * lam_step[k] for k in range(S)) + do_dv * g_out
        )

        # --- parameter cotangents: grad of a scalar inner product -------
        # (one reverse pass through adapt + the batched step; sums over
        # (B, T) without materializing per-step parameter gradients)
        def inner(p):
            c = circuit.adapt(p, _merge_controls(static_controls, rc1))
            st = _batched_step(circuit, c, p, static_controls, input_node)
            z_new, o = st(z_prev, vin)
            acc = jnp.sum(o * g_out)
            for k in range(S):
                acc = acc + jnp.sum(z_new[k] * lam_step[k])
            return acc

        g_params = jax.grad(inner)(params)
        g_z0 = [lam_prev[k][:, 0] for k in range(S)]
        return g_params, g_vin, g_z0, tuple(
            jnp.zeros_like(jnp.asarray(v)) for v in row_vals
        )

    f4.defvjp(f_fwd, f_bwd)
    if row_fields:

        def f(params, vin, z0_leaves, row_vals):
            assert len(row_vals) == len(row_fields), (
                f"expected {len(row_fields)} row_vals for {row_fields}"
            )
            return f4(params, vin, z0_leaves, tuple(row_vals))

    else:

        def f(params, vin, z0_leaves):
            return f4(params, vin, z0_leaves, ())

    return f
