"""Differentiable fused clipper (ops.clipper_train): forward parity with the
scan engine and gradient parity with BPTT-through-``lax.scan``.

Runs in Pallas interpret mode on CPU; the identical code path compiles for
TPU (benchmarked by bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffwdf_tpu.models.diode_clipper import make_training_clipper
from diffwdf_tpu.ops.clipper_train import make_fused_clipper_train
from diffwdf_tpu.ops.fused_clipper import fused_clipper_neural_train_fwd
from diffwdf_tpu.roots.neural import NeuralDiodeRoot, mlp_arch
from diffwdf_tpu.training.losses import esr, mse

FS = 48000.0
CAP = 4.7e-9
INTERP = jax.default_backend() != "tpu"


def _setup(n_layers=2, width=16, B=1024, T=256, seed=3):
    root = NeuralDiodeRoot(name="dp", n_layers=n_layers, layer_size=width)
    mlp = root.init_params(jax.random.PRNGKey(seed))["dp"]
    ckt = make_training_clipper(root, FS, cap=CAP)
    tree_params = ckt.init_params()
    rng = np.random.default_rng(seed)
    vin = jnp.asarray((2.0 * rng.standard_normal((B, T))).astype(np.float32))
    z0 = jnp.asarray(rng.standard_normal(B).astype(np.float32) * 0.1)
    # per-row pot resistance spanning the measured range (10k..99k)
    r_rows = jnp.asarray(
        np.geomspace(10e3, 99e3, B).astype(np.float32)
    )
    return root, mlp, ckt, tree_params, vin, z0, r_rows


def _scan_forward(ckt, root, tree_params, mlp, vin, z0, r_rows):
    params = {**tree_params, "dp": mlp}

    def one(v, z, r):
        out, st = ckt.process(
            params, {"C": {"z": z}}, {"Vs": {"v": v}},
            static_controls={"Vs": {"R": r}},
        )
        return out, st["C"]["z"]

    return jax.vmap(one)(vin, z0, r_rows)


def test_train_fwd_matches_engine_per_row_r():
    """The per-row-R training kernel == the scan engine with hoisted R."""
    root, mlp, ckt, tp, vin, z0, r_rows = _setup()
    want, want_z = _scan_forward(ckt, root, tp, mlp, vin, z0, r_rows)
    got, got_z, a_seq = fused_clipper_neural_train_fwd(
        vin, z0, mlp, r_rows, CAP, fs=FS, interpret=INTERP
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_z), np.asarray(want_z), atol=2e-5)
    # residual sanity: a_t = s_t + b_temp_t must satisfy the MLP relation
    # out = 0.5 (s_{t+1} + s_t); spot-check step 0: a_0 = (1-p) z0 + p v0
    r_c = 1.0 / (2.0 * CAP * FS)
    g = 1.0 / r_rows + 1.0 / r_c
    p = (1.0 / r_rows) / g
    np.testing.assert_allclose(
        np.asarray(a_seq[:, 0]),
        np.asarray((1.0 - p) * z0 + p * vin[:, 0]),
        atol=1e-5,
    )


def test_train_fwd_k2_interleave_matches():
    """chunks=2 at lanes=256 (B=2048): the interleaved-ILP path is exact
    (ADVICE r1: the K>1 path previously had no correctness coverage)."""
    root, mlp, ckt, tp, vin, z0, r_rows = _setup(B=2048, T=128)
    want, want_z = _scan_forward(ckt, root, tp, mlp, vin, z0, r_rows)
    got, got_z, _ = fused_clipper_neural_train_fwd(
        vin, z0, mlp, r_rows, CAP, fs=FS, lanes=256, chunks=2,
        interpret=INTERP,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_z), np.asarray(want_z), atol=2e-5)


def test_fused_grad_matches_scan_bptt():
    """The associative-scan backward == BPTT through lax.scan to ~1e-5
    (VERDICT r1 item 3)."""
    root, mlp, ckt, tp, vin, z0, r_rows = _setup(T=192)
    _, acts = mlp_arch(2, 16)
    fused = make_fused_clipper_train(acts, CAP, FS, interpret=INTERP)
    skip = 32
    y_t = jnp.tanh(vin * 0.5)  # arbitrary smooth target

    def loss_fused(mlp_, vin_, z0_):
        out, zf = fused(vin_, z0_, mlp_, r_rows)
        o, t = out[:, skip:], y_t[:, skip:]
        return mse(t, o) + esr(t, o) + 0.1 * jnp.mean(zf**2)

    def loss_scan(mlp_, vin_, z0_):
        out, zf = _scan_forward(ckt, root, tp, mlp_, vin_, z0_, r_rows)
        o, t = out[:, skip:], y_t[:, skip:]
        return mse(t, o) + esr(t, o) + 0.1 * jnp.mean(zf**2)

    lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(mlp, vin, z0)
    ls, gs = jax.value_and_grad(loss_scan, argnums=(0, 1, 2))(mlp, vin, z0)
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(gf),
        jax.tree_util.tree_leaves_with_path(gs),
    ):
        assert pa == pb
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            atol=2e-5, err_msg=str(pa),
        )


def test_fused_grad_deep_family():
    """Gradient parity holds for the deeper 4xH family too."""
    root, mlp, ckt, tp, vin, z0, r_rows = _setup(n_layers=4, width=8, T=64)
    _, acts = mlp_arch(4, 8)
    fused = make_fused_clipper_train(acts, CAP, FS, interpret=INTERP)

    def loss_fused(mlp_):
        out, _ = fused(vin, z0, mlp_, r_rows)
        return jnp.mean(out**2)

    def loss_scan(mlp_):
        out, _ = _scan_forward(ckt, root, tp, mlp_, vin, z0, r_rows)
        return jnp.mean(out**2)

    gf = jax.grad(loss_fused)(mlp)
    gs = jax.grad(loss_scan)(mlp)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(gf),
        jax.tree_util.tree_leaves_with_path(gs),
    ):
        assert pa == pb
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            atol=2e-5, err_msg=str(pa),
        )


def test_fused_engine_training_matches_scan_engine():
    """train_clipper with engine='fused' follows the scan engine's loss
    trajectory on a fixed seed (VERDICT r1 done-criterion: loss curves
    unchanged) — including non-tile-multiple row counts (padding path)."""
    from diffwdf_tpu.training.circuit_train import (
        CircuitTrainConfig,
        train_clipper,
    )

    root = NeuralDiodeRoot(name="dp", n_layers=1, layer_size=8)
    ckt = make_training_clipper(root, 8000.0, cap=CAP)
    params0 = {**ckt.init_params(), **root.init_params(jax.random.PRNGKey(4))}

    rng = np.random.default_rng(7)
    n_seq, T = 3, 128  # deliberately NOT a multiple of the 1024-row tile
    batches = {
        "x": jnp.asarray(rng.standard_normal((n_seq, T)).astype(np.float32)),
        "y": jnp.asarray(
            np.tanh(rng.standard_normal((n_seq, T))).astype(np.float32)
        ),
        "r0": jnp.asarray(np.float32([10e3, 45e3, 99e3])),
    }
    def only_root_grads(grads):
        # the reference's circuit training updates only the NN
        # (``clipper_pot.py:268-269`` over model.model.trainable_variables)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, grads)
        zeros["dp"] = grads["dp"]
        return zeros

    hists = {}
    for engine in ("scan", "fused"):
        cfg = CircuitTrainConfig(
            epochs=6, batch_size=T, learning_rate=3e-3, skip_samples=16,
            engine=engine,
        )
        _, hist = train_clipper(ckt, dict(params0), batches, cfg=cfg,
                                trainable_filter=only_root_grads)
        hists[engine] = hist
    np.testing.assert_allclose(
        hists["fused"]["loss"], hists["scan"]["loss"], rtol=5e-4
    )
    assert hists["fused"]["loss"][-1] < hists["fused"]["loss"][0]


def test_clipper_pallas_adjoint_matches_xla_backward():
    """The fused clipper adjoint kernel (backward='pallas', default) and the
    round-2 associative-scan XLA path produce the same cotangents for vin,
    z0 and every MLP parameter, across the 2x16 and 4x8 families."""
    for n_layers, width in ((2, 16), (4, 8)):
        root, mlp, ckt, tree_params, vin, z0, r_rows = _setup(
            n_layers=n_layers, width=width, B=1024, T=256, seed=7)
        acts = root.activations
        f_pl = make_fused_clipper_train(acts, CAP, FS, interpret=INTERP,
                                        backward="pallas")
        f_xla = make_fused_clipper_train(acts, CAP, FS, interpret=INTERP,
                                         backward="xla")
        y = jnp.asarray(np.random.default_rng(8).standard_normal(
            vin.shape).astype(np.float32))

        def loss(f):
            def L(v, z, mp):
                out, zf = f(v, z, mp, r_rows)
                return jnp.sum((out - y) ** 2) + jnp.sum(3.0 * zf)
            return L

        g_pl = jax.grad(loss(f_pl), argnums=(0, 1, 2))(vin, z0, mlp)
        g_xla = jax.grad(loss(f_xla), argnums=(0, 1, 2))(vin, z0, mlp)
        for a, b in zip(jax.tree_util.tree_leaves(g_pl),
                        jax.tree_util.tree_leaves(g_xla)):
            denom = float(jnp.max(jnp.abs(b))) + 1e-12
            rel = float(jnp.max(jnp.abs(a - b))) / denom
            assert rel < 1e-4, (n_layers, width, rel)
