"""Multi-device tests on the virtual 8-device CPU mesh.

These validate the sharding/collective design the driver separately dry-runs
(time-block handoff, DP gradient reduction, sharded sweeps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffwdf_tpu as dwdf
from diffwdf_tpu.models.diode_clipper import make_diode_clipper
from diffwdf_tpu.parallel.mesh import make_mesh, shard_batches
from diffwdf_tpu.parallel.sweep import (
    ensemble_process,
    stack_mlp_params,
    sweep_process,
)
from diffwdf_tpu.parallel.time_block import (
    time_block_process,
    time_block_process_exact,
    warmup_for_tolerance,
)
from diffwdf_tpu.roots.neural import NeuralDiodeRoot, mlp_arch, mlp_init

FS = 48000.0


def _clipper():
    root = dwdf.DiodePairRoot(name="dp", diode=dwdf.diode_1n4148_1u1d)
    ckt = make_diode_clipper(root, FS)
    params = {**ckt.init_params(), **root.init_params()}
    return ckt, params


def test_time_block_overlap_matches_serial(devices8):
    ckt, params = _clipper()
    mesh = make_mesh((1, 8), ("data", "time"))
    T = 8 * 512
    n = np.arange(T)
    vin = jnp.asarray(
        (2.0 * np.sin(2 * np.pi * 330.0 * n / FS)).astype(np.float32)
    )
    inputs = {"Vs": {"v": vin}}

    serial, _ = ckt.process(params, ckt.init_state(), inputs)
    warm = warmup_for_tolerance(787.0, FS, tol=1e-6)  # clipper corner ~787 Hz
    assert warm <= 512
    par = time_block_process(ckt, params, inputs, mesh, warmup=warm)
    err = np.max(np.abs(np.asarray(par) - np.asarray(serial)))
    assert err < 1e-5, err


def test_time_block_exact_matches_serial(devices8):
    ckt, params = _clipper()
    mesh = make_mesh((1, 8), ("data", "time"))
    T = 8 * 128
    rng = np.random.default_rng(0)
    vin = jnp.asarray((1.5 * rng.standard_normal(T)).astype(np.float32))
    inputs = {"Vs": {"v": vin}}
    serial, _ = ckt.process(params, ckt.init_state(), inputs)
    exact = time_block_process_exact(ckt, params, inputs, mesh)
    np.testing.assert_allclose(
        np.asarray(exact), np.asarray(serial), atol=1e-6
    )


def test_warmup_error_decays_with_window(devices8):
    """Quantifies the overlap-save error vs warm-up length — the measurement
    justifying block-parallel decode (SURVEY.md hard-parts list)."""
    ckt, params = _clipper()
    mesh = make_mesh((1, 8), ("data", "time"))
    T = 8 * 256
    rng = np.random.default_rng(1)
    vin = jnp.asarray((2.0 * rng.standard_normal(T)).astype(np.float32))
    inputs = {"Vs": {"v": vin}}
    serial, _ = ckt.process(params, ckt.init_state(), inputs)
    errs = []
    for w in (8, 32, 128):
        par = time_block_process(ckt, params, inputs, mesh, warmup=w)
        errs.append(float(np.max(np.abs(np.asarray(par) - np.asarray(serial)))))
    assert errs[2] < errs[0]
    assert errs[2] < 1e-4, errs


def test_dp_training_matches_single_device(devices8):
    """Gradient psum over the data axis == single-device step (same math)."""
    from diffwdf_tpu.data.synthetic import synth_clipper_measurement
    from diffwdf_tpu.models.diode_clipper import make_training_clipper
    from diffwdf_tpu.parallel.data_parallel import make_dp_train_step
    from diffwdf_tpu.training.circuit_train import (
        CircuitTrainConfig,
        make_clipper_batches,
        make_train_step,
    )

    fs = 8000.0
    diode = dwdf.diode_1n4148_1u1d
    vin, vout = synth_clipper_measurement(diode, 45e3, fs=fs, duration_s=0.5)
    data = {"x": vin, "r": np.full_like(vin, 45e3), "y": vout}

    root = NeuralDiodeRoot(name="dp", n_layers=1, layer_size=4)
    ckt = make_training_clipper(root, fs)
    params0 = {**ckt.init_params(), **root.init_params(jax.random.PRNGKey(0))}
    cfg = CircuitTrainConfig(epochs=2, batch_size=128, max_chunks=8)
    batches = make_clipper_batches(data, cfg.batch_size, cfg.max_chunks)

    # single device
    opt, step, _ = make_train_step(ckt, cfg)
    s = opt.init(params0)
    p1, s, m1 = step(params0, s, batches)

    # 8-way DP
    mesh = make_mesh((8, 1), ("data", "time"))
    opt2, dp_step, _, prepare = make_dp_train_step(ckt, cfg, mesh)
    s2 = opt2.init(params0)
    p2, s2, bsh = prepare(params0, s2, batches)
    p2, s2, m2 = dp_step(p2, s2, bsh)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sweep_1024_instances(devices8):
    """BASELINE config 4: vmap sweep over circuit instances, sharded."""
    ckt, params = _clipper()
    mesh = make_mesh((8, 1), ("data", "time"))
    N, T = 64, 128
    r_values = np.linspace(1e3, 100e3, N).astype(np.float32)
    n = np.arange(T)
    vin = jnp.asarray((2.0 * np.sin(2 * np.pi * 440.0 * n / FS)).astype(np.float32))
    outs = sweep_process(
        ckt, params, {"Vs.R": jnp.asarray(r_values)}, {"Vs": {"v": vin}}, mesh=mesh
    )
    assert outs.shape == (N, T)
    assert np.all(np.isfinite(np.asarray(outs)))
    # more source resistance -> stronger lowpass -> less output energy
    e = np.mean(np.asarray(outs[:, 32:]) ** 2, axis=1)
    assert e[0] > e[-1]


def test_ensemble_over_model_zoo(devices8):
    """EP-style ensemble: one clipper per stacked MLP root."""
    sizes, acts = mlp_arch(1, 4)
    mlps = [mlp_init(jax.random.PRNGKey(i), sizes) for i in range(4)]
    stack = stack_mlp_params(mlps)
    T = 64
    vin = jnp.asarray(np.random.default_rng(0).normal(size=T).astype(np.float32))
    outs = ensemble_process(
        lambda root: make_diode_clipper(root, FS),
        stack,
        acts,
        {"Vs": {"v": vin}},
    )
    assert outs.shape == (4, T)
    # different weights -> different outputs
    assert float(jnp.max(jnp.abs(outs[0] - outs[1]))) > 1e-6


def test_ensemble_sharded_over_mesh(devices8):
    """ensemble_process with a mesh shards the expert axis (it previously
    ignored the mesh argument); numbers match the unsharded run."""
    sizes, acts = mlp_arch(1, 4)
    mlps = [mlp_init(jax.random.PRNGKey(i), sizes) for i in range(8)]
    stack = stack_mlp_params(mlps)
    T = 64
    vin = jnp.asarray(np.random.default_rng(0).normal(size=T).astype(np.float32))
    factory = lambda root: make_diode_clipper(root, FS)
    ref = ensemble_process(factory, stack, acts, {"Vs": {"v": vin}})
    mesh = make_mesh((8, 1), ("data", "time"))
    outs = ensemble_process(factory, stack, acts, {"Vs": {"v": vin}}, mesh=mesh)
    assert outs.shape == (8, T)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(ref), atol=1e-6)


def test_scaling_harness(devices8):
    """Weak-scaling measurement machinery on the virtual mesh (numbers are
    not meaningful on CPU; the harness behavior is what's under test)."""
    import jax.numpy as jnp

    from diffwdf_tpu.parallel.distributed import measure_scaling
    from diffwdf_tpu.parallel.mesh import shard_batches

    ckt, params = _clipper()

    def make_step(mesh):
        n = mesh.devices.size
        vin = jnp.asarray(
            np.random.default_rng(0).normal(size=(2 * n, 64)).astype(np.float32)
        )
        batch = shard_batches({"x": vin}, mesh)

        @jax.jit
        def step(b):
            def one(v):
                out, _ = ckt.process(params, ckt.init_state(), {"Vs": {"v": v}})
                return out

            return jax.vmap(one)(b["x"])

        return lambda: step(batch)

    res = measure_scaling(make_step, (1, 4, 8), iters=3, items_per_call=128)
    assert set(res) == {1, 4, 8}
    for n, rec in res.items():
        assert rec["mean_s"] > 0 and np.isfinite(rec["efficiency"])


def test_time_block_pot_driven_r_stream(devices8):
    """Impedance-control streams (the pot 'R') must NOT be zeroed in device
    0's warm-up prefix — R=0 would make per-sample re-adaptation divide by
    zero and propagate NaN through the whole first block (regression)."""
    ckt, params = _clipper()
    mesh = make_mesh((1, 8), ("data", "time"))
    T = 8 * 512
    n = np.arange(T)
    vin = jnp.asarray(
        (2.0 * np.sin(2 * np.pi * 330.0 * n / FS)).astype(np.float32)
    )
    # slowly-swept pot: R from 30k to 60k over the signal
    r = jnp.asarray(np.linspace(30e3, 60e3, T).astype(np.float32))
    inputs = {"Vs": {"v": vin, "R": r}}

    serial, _ = ckt.process(params, ckt.init_state(), inputs)
    par = time_block_process(ckt, params, inputs, mesh, warmup=256)
    assert np.all(np.isfinite(np.asarray(par)))
    err = np.max(np.abs(np.asarray(par) - np.asarray(serial)))
    assert err < 1e-4, err
