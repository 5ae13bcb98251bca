"""Generic fused-circuit Pallas kernel: compile ANY WDF `Circuit` to one
TPU kernel that runs the whole sample recursion in VMEM.

The hand-written kernels in ``fused_clipper.py`` cover the diode-clipper
topology; this module generalizes the same design (batch tiled (8, lanes),
capacitor states in VMEM scratch persisting across time-chunk grid steps) to
arbitrary adapted trees — series/parallel/R-type adaptors, any number of
reactive states, analytic diode or other scalar-param roots.  The circuit's
own pure ``step`` function (up-traversal, root solve, down-traversal —
``core/circuit.py``) is traced directly inside the kernel body: the tree
walk is static Python emitting elementwise VPU ops, so the per-sample body
lowers to a handful of FMAs plus the root's transcendentals with zero
HBM traffic per step.

This is the serving path for the complex-topology circuits (Tube Screamer's
4-port R-type stage, HPF clipper) — reference hot loops
``TubeScreamer.cpp:43-56`` and ``HPFDiodeClipper.cpp:44-55``.

Restrictions (by design, not fundamental):
- impedance-affecting controls are block-rate (``static_controls``) or
  per-row / per-sample pot streams (``row_controls`` — round 5; the
  reference C++ engine re-adapts only on parameter changes);
- per-sample drive is a single voltage input node;
- root/adaptor parameters must be scalars or small matrices (the R-type
  S-matrix); 2xH neural-MLP roots ride through the root-override hook
  (:func:`fused_circuit_process_neural`), other MLP shapes use the
  dedicated ``fused_clipper_neural``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_clipper import (
    _SUB,
    _pack,
    _pack_state,
    _unpack,
    auto_lanes,
    clamp_time_chunk,
)

_MAX_STATIC_MATRIX = 64  # matrix coeff leaves up to 8x8 are scalarized


class _StaticMatrix:
    """Trace-time 2-D container of scalar reads, supporting the static
    ``S[i, j]`` indexing the adaptors use."""

    def __init__(self, rows):
        self.rows = rows

    def __getitem__(self, ij):
        i, j = ij
        return self.rows[i][j]


def _classify_leaves(leaves, batch: int = 0, time: int = 0):
    """Split bundle leaves into a flat scalar vector; matrices are
    scalarized row-major; with ``batch`` > 0, (batch,)-shaped leaves (coeffs
    adapted from per-row pot controls) become "row" leaves streamed to the
    kernel as per-batch-tile VMEM blocks instead of SMEM scalars; with
    ``time`` > 0, (batch, time)-shaped leaves (a genuinely per-SAMPLE pot)
    become "time" leaves streamed like the drive signal and re-read per
    step.  Returns (vector values, spec list, row leaves, time leaves)
    where each spec is (kind, start, shape)."""
    vec = []
    specs = []
    rows = []
    times = []
    for leaf in leaves:
        arr = jnp.asarray(leaf, jnp.float32)
        if arr.size == 1:
            specs.append(("scalar", len(vec), ()))
            vec.append(arr.reshape(()))
        elif batch and arr.shape == (batch,):
            specs.append(("row", len(rows), ()))
            rows.append(arr)
        elif batch and time and arr.shape == (batch, time):
            specs.append(("time", len(times), ()))
            times.append(arr)
        elif arr.ndim == 2 and arr.size <= _MAX_STATIC_MATRIX:
            specs.append(("matrix", len(vec), arr.shape))
            for v in arr.reshape(-1):
                vec.append(v)
        else:
            raise ValueError(
                f"fused_circuit: unsupported coeff/param leaf shape {arr.shape}"
                " (neural roots have their own kernel; per-row/per-sample pot"
                " controls must not reach matrix-valued coeffs — keep the pot"
                " outside R-type adaptors or use static_s)"
            )
    return vec, specs, rows, times


def _rebuild_leaves(sc_ref, specs, row_views=(), time_views=()):
    """time_views: per-STEP (8, lanes) tiles of each time leaf (the caller
    slices the streamed block at the current step before rebuilding)."""
    out = []
    for kind, start, shape in specs:
        if kind == "scalar":
            out.append(sc_ref[0, start])
        elif kind == "row":
            out.append(row_views[start])  # (8, lanes) batch tile
        elif kind == "time":
            out.append(time_views[start])  # (8, lanes) tile AT this step
        else:
            r, c = shape
            rows = [
                [sc_ref[0, start + i * c + j] for j in range(c)]
                for i in range(r)
            ]
            out.append(_StaticMatrix(rows))
    return out


def _merge_controls(static_controls, row_controls):
    """Deep-merge {node: {field: val}} dicts (row values win)."""
    out = {k: dict(v) for k, v in (static_controls or {}).items()}
    for node, fields in (row_controls or {}).items():
        out.setdefault(node, {})
        out[node].update(fields)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "circuit",
        "input_node",
        "time_chunk",
        "lanes",
        "interpret",
        "root_override",
        "root_tiled",
        "return_state_seq",
        "seq_packed",
    ),
)
def fused_circuit_process(
    circuit,
    params,
    vin,
    state0,
    *,
    input_node: str = "Vin",
    static_controls: Optional[Dict[str, Dict[str, Any]]] = None,
    row_controls: Optional[Dict[str, Dict[str, Any]]] = None,
    time_chunk: int = 128,
    lanes: int = 0,
    interpret: bool = False,
    root_override=None,
    root_arrays: tuple = (),
    root_tiled: tuple = (),
    return_state_seq: bool = False,
    seq_packed: bool = False,
):
    """Run ``circuit`` over ``vin`` (B, T) entirely inside one Pallas kernel.

    state0: the circuit state pytree with each leaf of shape (B,).
    Returns (out (B, T), final state pytree).  Matches
    ``circuit.process(...)`` with hoisted adaptation (same math, fused
    execution); impedance-affecting params go in ``static_controls``.

    root_override: optional ``(a, R_up, array_views) -> b`` replacing the
    circuit root's reflect inside the kernel; ``root_arrays`` are passed as
    whole VMEM blocks and handed to it (e.g. Kronecker-expanded MLP weights
    — see :func:`fused_circuit_process_neural`).  ``root_tiled`` flags (per
    root array) arrays of shape (nb, ...) carrying per-batch-tile data (e.g.
    the per-row first-layer bias); their view inside the kernel is the
    current batch tile's block.

    row_controls: {node: {field: (B,) | (B, T)}} PER-ROW or PER-SAMPLE
    impedance controls (the reference's measured pot — one R per chunk
    after hoisting, ``dataimport.py:109``, or genuinely time-varying,
    ``clipper_pot.py:113-124``).  Adaptation runs batched outside the
    kernel; per-row coefficients stream in as (8, lanes) batch tiles,
    per-sample ones as full (B, T) streams sliced at each step, so every
    batch element runs its own scatter algebra at full VPU width.

    return_state_seq: additionally return the PRE-step state trajectory
    [S leaves of (B, T)] — z_{t-1} for every step t, the residual the
    parallel-BPTT backward (ops.parallel_bptt) linearizes around.
    """
    B, T = vin.shape
    lanes = lanes or auto_lanes(B, T, time_chunk)
    time_chunk = clamp_time_chunk(time_chunk, lanes, T)
    bt = _SUB * lanes
    assert B % bt == 0 and T % time_chunk == 0, (B, T, lanes, time_chunk)
    nb, nt = B // bt, T // time_chunk

    adapt_controls = _merge_controls(static_controls, row_controls)
    coeffs = circuit.adapt(params, adapt_controls)
    bundle = (coeffs, params, static_controls or {})
    leaves, treedef = jax.tree_util.tree_flatten(bundle)
    vec, specs, row_leaves, time_leaves = _classify_leaves(
        leaves,
        batch=B if row_controls else 0,
        time=T if row_controls else 0,
    )
    sc = jnp.stack(vec).astype(jnp.float32)[None, :]
    rows_p = tuple(_pack_state(r, lanes) for r in row_leaves)
    n_row = len(rows_p)
    times_p = tuple(_pack(t, lanes) for t in time_leaves)
    n_time = len(times_p)

    s_leaves, s_treedef = jax.tree_util.tree_flatten(state0)
    n_s = len(s_leaves)
    for leaf in s_leaves:
        assert leaf.shape == (B,), f"state leaf shape {leaf.shape} != ({B},)"
    # (nb, n_s*8, lanes): state leaf k lives in sublane rows [k*8, k*8+8)
    z0 = (
        jnp.concatenate(
            [_pack(l.reshape(B, 1), lanes) for l in s_leaves], axis=1
        )
        if n_s
        else jnp.zeros((nb, _SUB, lanes), jnp.float32)
    )
    zrows = max(n_s, 1) * _SUB

    n_root_arrays = len(root_arrays)

    n_seq = n_s if return_state_seq else 0

    tiled = tuple(root_tiled) + (False,) * (n_root_arrays - len(root_tiled))

    def kernel(sc_ref, in_ref, z0_ref, *rest):
        row_refs = rest[:n_row]
        time_refs = rest[n_row : n_row + n_time]
        nrt = n_row + n_time
        root_refs = rest[nrt : nrt + n_root_arrays]
        out_ref, zf_ref = rest[nrt + n_root_arrays : nrt + n_root_arrays + 2]
        seq_refs = rest[
            nrt + n_root_arrays + 2 : nrt + n_root_arrays + 2 + n_seq
        ]
        z_scr = rest[-1]
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            z_scr[...] = z0_ref[0]

        row_views = tuple(r[0] for r in row_refs)  # (8, lanes) batch tiles

        if n_time == 0:  # step-invariant: rebuild once, outside the loop
            _ctx = jax.tree_util.tree_unflatten(
                treedef, _rebuild_leaves(sc_ref, specs, row_views)
            )

            def ctx_at(t):
                return _ctx

        else:

            def ctx_at(t):
                """(coeffs, params, static) with the per-sample pot
                streams sliced at step t."""
                tv = tuple(
                    tr[0, pl.ds(t * _SUB, _SUB), :] for tr in time_refs
                )
                rebuilt = _rebuild_leaves(sc_ref, specs, row_views, tv)
                return jax.tree_util.tree_unflatten(treedef, rebuilt)

        root_views = tuple(
            (r[0] if t else r[...]) for r, t in zip(root_refs, tiled)
        )

        def body(t, _):
            v = in_ref[0, pl.ds(t * _SUB, _SUB), :]
            coeffs_k, params_k, static_k = ctx_at(t)
            st_leaves = [
                z_scr[pl.ds(k * _SUB, _SUB), :] for k in range(n_s)
            ]
            for k in range(n_seq):  # pre-step state = the BPTT residual
                seq_refs[k][0, pl.ds(t * _SUB, _SUB), :] = st_leaves[k]
            st = jax.tree_util.tree_unflatten(s_treedef, st_leaves)
            controls = {k: dict(v2) for k, v2 in static_k.items()}
            controls.setdefault(input_node, {})
            controls[input_node]["v"] = v
            # inlined circuit.step, allowing the root to be overridden
            waves: Dict[str, Any] = {}
            a_root = circuit.tree.reflected(coeffs_k, st, controls, waves)
            r_up = coeffs_k[circuit.tree.name]["R"]
            if root_override is not None:
                b_root = root_override(a_root, r_up, root_views)
            else:
                b_root = circuit.root.reflect(a_root, r_up, params_k, controls)
            new_entries = circuit.tree.incident(
                coeffs_k, st, controls, waves, b_root
            )
            new_state = {**st, **new_entries}
            waves[circuit.root.name] = (a_root, b_root)
            out_ref[0, pl.ds(t * _SUB, _SUB), :] = circuit.probe(waves)
            for k, leaf in enumerate(
                jax.tree_util.tree_leaves(new_state)[:n_s]
            ):
                z_scr[pl.ds(k * _SUB, _SUB), :] = leaf
            return 0

        jax.lax.fori_loop(0, time_chunk, body, 0)
        zf_ref[0] = z_scr[...]

    x = _pack(vin, lanes)
    root_arrays = tuple(jnp.asarray(a, jnp.float32) for a in root_arrays)

    def _full(shape):
        return pl.BlockSpec(
            shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    def _tile_spec(shape):
        # (nb, ...) per-batch-tile array: block = one batch tile's slice
        return pl.BlockSpec(
            (1,) + tuple(shape[1:]),
            lambda i, j: (i,) + tuple(0 for _ in shape[1:]),
            memory_space=pltpu.VMEM,
        )

    results = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec(
                (1, sc.shape[1]), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, time_chunk * _SUB, lanes),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, zrows, lanes), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            *[_tile_spec(r.shape) for r in rows_p],
            *[
                pl.BlockSpec(
                    (1, time_chunk * _SUB, lanes),
                    lambda i, j: (i, j, 0),
                    memory_space=pltpu.VMEM,
                )
                for _ in times_p
            ],
            *[
                _tile_spec(a.shape) if t else _full(a.shape)
                for a, t in zip(root_arrays, tiled)
            ],
        ],
        out_specs=[
            pl.BlockSpec(
                (1, time_chunk * _SUB, lanes),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, zrows, lanes), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            *[
                pl.BlockSpec(
                    (1, time_chunk * _SUB, lanes),
                    lambda i, j: (i, j, 0),
                    memory_space=pltpu.VMEM,
                )
                for _ in range(n_seq)
            ],
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct(z0.shape, jnp.float32),
            *[jax.ShapeDtypeStruct(x.shape, jnp.float32) for _ in range(n_seq)],
        ],
        scratch_shapes=[pltpu.VMEM((zrows, lanes), jnp.float32)],
        interpret=interpret,
    )(sc, x, z0, *rows_p, *times_p, *root_arrays)

    out, zf, *seqs = results
    out = _unpack(out, B, T, lanes)
    if n_s:
        zf_leaves = [
            _unpack(zf[:, k * _SUB : (k + 1) * _SUB, :], B, 1, lanes).reshape(B)
            for k in range(n_s)
        ]
        state_f = jax.tree_util.tree_unflatten(s_treedef, zf_leaves)
    else:
        state_f = state0
    if return_state_seq:
        # seq_packed hands the trajectory to the Pallas backward kernel in
        # the kernels' native (nb, T*8, lanes) layout, skipping an unpack/
        # repack transpose round trip per state leaf
        if seq_packed:
            return out, state_f, list(seqs)
        return out, state_f, [_unpack(s, B, T, lanes) for s in seqs]
    return out, state_f


def _make_mlp_root(precision):
    """Kron-expanded NxH MLP root inside the kernel: b = -MLP([a, log R]).
    views: (k1, c1, kh, ch, w3, b3) from ``_kron_weights`` (kh/ch stack the
    hidden H->H layers along a leading axis; unrolled at trace time).

    precision=None: the MXU's default single-pass bf16 multiply with f32
    accumulate — right for the FORWARD kernels, where the golden tests
    bound the end-to-end error (~4e-3 class on chip,
    ``runs/probes/fused_train_chip_parity_probe.json``).  Do NOT reuse
    this root inside an iterative solver: Newton-over-trajectory amplifies
    the per-step bf16 input rounding into a ~1.5e-2 residual floor (the
    parallel-in-time path uses ``deer_circuit._mlp_root_smem``, exact-f32
    VPU math, instead).  precision=HIGHEST runs the 3-pass bf16x3
    expansion (~f32-exact) for users who want chip gradcheck-tight
    training — the same knob the pretraining workload already exposes
    (``matmul_precision="highest"``)."""

    def root(a, r_up, views):
        k1, c1, kh, ch, w3, b3 = views
        kw = dict(preferred_element_type=jnp.float32, precision=precision)
        h = jnp.tanh(jnp.dot(k1, a, **kw) + c1)
        for l in range(kh.shape[0]):
            h = jnp.tanh(jnp.dot(kh[l], h, **kw) + ch[l])
        y = jnp.dot(w3, h, **kw) + b3[0, 0]
        return -y

    return root


_mlp_root = _make_mlp_root(None)
_mlp_root_hp = _make_mlp_root(jax.lax.Precision.HIGHEST)


def _make_mlp_root_timevar(precision):
    """Kron-expanded NxH MLP root with PER-SAMPLE R conditioning: the
    first-layer pre-activation is k1 @ a + k1r @ log(r_up) + b1, where
    k1r = kron(W1[logR-col], I8) turns the per-step (8, lanes) log-R tile
    into the per-unit bias contribution in one extra MXU pass (r_up is the
    tree-top impedance coefficient, a "time" leaf here, so it arrives
    already sliced at the current step).  precision as in
    :func:`_make_mlp_root`."""

    def root(a, r_up, views):
        k1, k1r, c1b, kh, ch, w3, b3 = views
        kw = dict(preferred_element_type=jnp.float32, precision=precision)
        lr = jnp.log(r_up)
        h = jnp.tanh(jnp.dot(k1, a, **kw) + jnp.dot(k1r, lr, **kw) + c1b)
        for l in range(kh.shape[0]):
            h = jnp.tanh(jnp.dot(kh[l], h, **kw) + ch[l])
        y = jnp.dot(w3, h, **kw) + b3[0, 0]
        return -y

    return root


_mlp_root_timevar = _make_mlp_root_timevar(None)
_mlp_root_timevar_hp = _make_mlp_root_timevar(jax.lax.Precision.HIGHEST)


def fused_circuit_process_neural(
    circuit,
    params,
    mlp_params,
    vin,
    state0,
    *,
    input_node: str = "Vin",
    static_controls: Optional[Dict[str, Dict[str, Any]]] = None,
    row_controls: Optional[Dict[str, Dict[str, Any]]] = None,
    time_chunk: int = 128,
    lanes: int = 0,
    interpret: bool = False,
    mxu_precision: str = "default",
    return_state_seq: bool = False,
    seq_packed: bool = False,
):
    """Fused execution of ``circuit`` with an NxH neural diode root
    (``NeuralDiodeRoot`` semantics, b = -MLP([a, log R])) — e.g. the Tube
    Screamer's "1N4148 2x16" model choice (``TubeScreamer.h:73-74``).

    The MLP rides the MXU via the same Kronecker expansion as
    ``fused_clipper_neural``; the tree scatter stays elementwise VPU work.
    With per-row pot data (``row_controls``) the tree-top impedance — and
    with it the MLP's log-R conditioning — is per batch row: the first
    layer's bias is then packed per row (``_pack_c1``) and streamed as a
    per-batch-tile block, exactly the clipper training kernel's scheme.
    """
    from .fused_clipper import _kron_weights, _kron_weights_unbiased, _pack_c1

    acts = tuple(getattr(circuit.root, "activations", ()))
    if acts and (set(acts[:-1]) != {"tanh"} or acts[-1] not in ("", "linear")):
        # the Kron kernel hardcodes tanh hidden layers + a linear head;
        # JSON-loaded roots may carry relu layers (roots/neural.py:88-90)
        raise ValueError(
            "fused_circuit_process_neural supports all-tanh hidden layers "
            f"with a linear head only; root has activations {acts} — use "
            "the scan engine for this model"
        )
    assert mxu_precision in ("default", "highest"), mxu_precision
    hp = mxu_precision == "highest"
    adapt_controls = _merge_controls(static_controls, row_controls)
    coeffs = circuit.adapt(params, adapt_controls)
    log_r = jnp.log(coeffs[circuit.tree.name]["R"])
    root = _mlp_root_hp if hp else _mlp_root
    if jnp.ndim(log_r) == 2:  # per-SAMPLE R reaches the conditioning
        layers = mlp_params["layers"]
        H, k1, kh, ch, w3, b3 = _kron_weights_unbiased(mlp_params)
        eye8 = jnp.eye(8, dtype=jnp.float32)
        k1r = jnp.kron(layers[0]["kernel"][1:2, :].T, eye8)  # (H*8, 8)
        c1b = jnp.repeat(layers[0]["bias"], 8)[:, None]  # (H*8, 1)
        arrays = (k1, k1r, c1b, kh, ch, w3, jnp.reshape(b3, (1, 1)))
        tiled = ()
        root = _mlp_root_timevar_hp if hp else _mlp_root_timevar
    elif jnp.ndim(log_r) == 1:  # per-row R reaches the conditioning
        B, T = vin.shape
        lanes = lanes or auto_lanes(B, T, time_chunk)
        layers = mlp_params["layers"]
        _, k1, kh, ch, w3, b3 = _kron_weights_unbiased(mlp_params)
        c1 = _pack_c1(
            jnp.broadcast_to(log_r, (B,)),
            layers[0]["kernel"][1], layers[0]["bias"], lanes,
        )  # (nb, H*8, lanes)
        arrays = (k1, c1, kh, ch, w3, jnp.reshape(b3, (1, 1)))
        tiled = (False, True, False, False, False, False)
    else:
        _, k1, c1, kh, ch, w3, b3 = _kron_weights(mlp_params, log_r)
        arrays = (k1, c1, kh, ch, w3, jnp.reshape(b3, (1, 1)))
        tiled = ()
    # the MLP weights travel as VMEM blocks, not scalarized params — drop
    # the root's fragment from the scalar bundle
    tree_params = {k: v for k, v in params.items() if k != circuit.root.name}
    return fused_circuit_process(
        circuit,
        tree_params,
        vin,
        state0,
        input_node=input_node,
        static_controls=static_controls,
        row_controls=row_controls,
        time_chunk=time_chunk,
        lanes=lanes,
        interpret=interpret,
        root_override=root,
        root_arrays=arrays,
        root_tiled=tiled,
        return_state_seq=return_state_seq,
        seq_packed=seq_packed,
    )
