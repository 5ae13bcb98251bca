"""Fully-fused parallel-in-time DEER kernel (ops.parallel_time_deer).

Interpret mode on CPU; the identical kernel compiles for TPU (benchmarked in
bench.py's single-stream entry).  Parity target: the sequential
``circuit.process`` scan, the same oracle the XLA DEER path
(``ops.parallel_time``) is held to.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffwdf_tpu as dwdf
from diffwdf_tpu.models.diode_clipper import make_diode_clipper
from diffwdf_tpu.ops.parallel_time_deer import fused_deer_clipper

FS = 96000.0
R_SRC, CAP = 47.0e3, 2.2e-9


def _ckt(diode):
    root = dwdf.DiodePairRoot(name="dp", diode=diode, quality="best")
    ckt = make_diode_clipper(root, FS, R_SRC, CAP)
    return ckt, {**ckt.init_params(), **root.init_params()}


def _run(ckt, params, vin):
    out, _ = ckt.process(params, ckt.init_state(), {"Vs": {"v": vin}})
    return np.asarray(out)


@pytest.mark.parametrize("T", [2048, 16384])
def test_matches_sequential_scan(T):
    d = dwdf.diode_1n4148_1u1d
    ckt, params = _ckt(d)
    rng = np.random.default_rng(3)
    vin = jnp.asarray((2.0 * rng.standard_normal(T)).astype(np.float32))
    ref = _run(ckt, params, vin)
    out, zf, res = fused_deer_clipper(
        vin, R_SRC, CAP, d.Is, d.Vt * d.nabla, d.N_up, d.N_down,
        fs=FS, interpret=True,
    )
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-6
    assert np.isfinite(float(zf))


def test_hard_overdrive_converges():
    """amp-10 drive: the undamped XLA DEER path diverges here; the fused
    solver's relaxation warm-start + iterate clamp keep Newton in its basin."""
    d = dwdf.diode_1n4148_1u1d
    ckt, params = _ckt(d)
    rng = np.random.default_rng(1)
    vin = jnp.asarray((10.0 * rng.standard_normal(16384)).astype(np.float32))
    ref = _run(ckt, params, vin)
    out, _, _ = fused_deer_clipper(
        vin, R_SRC, CAP, d.Is, d.Vt * d.nabla, d.N_up, d.N_down,
        fs=FS, sweeps=8, relax_passes=4, interpret=True,
    )
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-6


def test_multi_diode_config():
    d = dwdf.diode_1n4148_3u3d
    ckt, params = _ckt(d)
    rng = np.random.default_rng(5)
    vin = jnp.asarray((2.0 * rng.standard_normal(2048)).astype(np.float32))
    ref = _run(ckt, params, vin)
    out, _, _ = fused_deer_clipper(
        vin, R_SRC, CAP, d.Is, d.Vt * d.nabla, d.N_up, d.N_down,
        fs=FS, interpret=True,
    )
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-6


def test_streaming_state_continuity():
    """z_final of one call seeds z0 of the next: two chained 1024-blocks
    equal one 2048 solve (the plugin's block-streaming contract)."""
    d = dwdf.diode_1n4148_1u1d
    rng = np.random.default_rng(7)
    vin = (2.0 * rng.standard_normal(2048)).astype(np.float32)
    kw = dict(fs=FS, interpret=True)
    args = (R_SRC, CAP, d.Is, d.Vt * d.nabla, d.N_up, d.N_down)
    full, _, _ = fused_deer_clipper(jnp.asarray(vin), *args, **kw)
    a, za, _ = fused_deer_clipper(jnp.asarray(vin[:1024]), *args, **kw)
    b, _, _ = fused_deer_clipper(jnp.asarray(vin[1024:]), *args,
                              z0=float(za), **kw)
    chained = np.concatenate([np.asarray(a), np.asarray(b)])
    np.testing.assert_allclose(chained, np.asarray(full), atol=2e-6)


def test_rejects_bad_length():
    d = dwdf.diode_1n4148_1u1d
    with pytest.raises(AssertionError):
        fused_deer_clipper(
            jnp.zeros(1000), R_SRC, CAP, d.Is, d.Vt * d.nabla, 1.0, 1.0,
            fs=FS, interpret=True,
        )


def test_streaming_processor_deer_engine():
    """engine='deer' serves the analytic clipper through the fused kernel:
    output matches the scan-engine processor block-for-block (gain ramp,
    cutoff param, DC blocker and carried state all identical)."""
    from diffwdf_tpu.runtime.stream import make_clipper_processor

    fs = 48000.0
    rng = np.random.default_rng(11)
    x = (1.5 * rng.standard_normal(4096)).astype(np.float32)
    p_scan = make_clipper_processor(fs, models=("toms",))
    p_deer = make_clipper_processor(fs, models=("toms",), engine="deer")
    for blk in (0, 1):
        a = p_scan.process_block(x[blk * 2048:(blk + 1) * 2048], "toms",
                                 gain_db=6.0, cutoff_hz=3000.0)
        b = p_deer.process_block(x[blk * 2048:(blk + 1) * 2048], "toms",
                                 gain_db=6.0, cutoff_hz=3000.0)
        np.testing.assert_allclose(a, b, atol=5e-6)
    # residual certificate surfaced as a serving health metric
    assert 0.0 <= p_deer.last_residual["toms"] < 1e-5
    assert p_scan.last_residual["toms"] == 0.0  # scan engine is exact
    # non-multiple-of-1024 blocks fall back to the scan transparently
    c = p_deer.process_block(x[:1000], "toms")
    assert np.all(np.isfinite(c))
    assert p_deer.last_residual["toms"] == 0.0  # fallback is the exact scan


def test_component_bounds_parity_and_residual_certificate():
    """Fused solver parity holds across the serving R range (the cutoff
    param maps 200 Hz - 20 kHz to R in [3.6k, 360k] Ohm) and up to the
    element upper bound, with a TINY reported residual; at the pathological
    low-R element bound (R = 180 Ohm: every sample clips hard and
    |df/dz| -> 1, ill-conditioned for any parallel-in-time method) the
    runtime residual certificate flags the failure instead of silently
    returning a wrong trajectory."""
    d = dwdf.diode_1n4148_1u1d
    rng = np.random.default_rng(21)
    vin = jnp.asarray((2.0 * rng.standard_normal(1024)).astype(np.float32))

    def run(r_src):
        root = dwdf.DiodePairRoot(name="dp", diode=d, quality="best")
        ckt = make_diode_clipper(root, FS, r_src, CAP)
        params = {**ckt.init_params(), **root.init_params()}
        ref, _ = ckt.process(params, ckt.init_state(), {"Vs": {"v": vin}})
        out, _, res = fused_deer_clipper(
            vin, r_src, CAP, d.Is, d.Vt * d.nabla, d.N_up, d.N_down,
            fs=FS, interpret=True,
        )
        err = float(jnp.max(jnp.abs(out - np.asarray(ref))))
        return err, float(res)

    for r_src in (3.6e3, 47e3, 1e6):
        err, res = run(r_src)
        assert err < 2e-6, (r_src, err)
        assert res < 1e-5, (r_src, res)
    # pathological operating point: large error, but the certificate says so
    err, res = run(180.0)
    assert res > 1e-2, res  # residual flags non-convergence
    assert res > err / 100  # certificate magnitude tracks the failure


def test_residual_triggered_scan_fallback():
    """Always-correct serving (round-2 VERDICT #2): at the pathological
    operating point (cutoff mapped to the 180-Ohm element bound, sustained
    hard clipping, |df/dz| -> 1) the deer engine's residual certificate
    exceeds the tolerance and the StreamingProcessor recomputes the block
    with the exact scan — the served audio is scan-exact, the fallback is
    counted, and the raw residual stays surfaced."""
    from diffwdf_tpu.models.diode_clipper import cutoff_to_resistance
    from diffwdf_tpu.runtime.stream import make_clipper_processor

    # cutoff that maps to R = 180 Ohm (the reference Resistor's lower clip
    # bound, tf_wdf.py:69-75)
    bad_cutoff = 1.0 / (2.0 * np.pi * 180.0 * 2.2e-9)
    assert abs(cutoff_to_resistance(bad_cutoff, 2.2e-9) - 180.0) < 1e-6

    rng = np.random.default_rng(21)
    x = (2.0 * rng.standard_normal(1024)).astype(np.float32)

    p_scan = make_clipper_processor(FS, models=("toms",))
    p_deer = make_clipper_processor(FS, models=("toms",), engine="deer")
    a = p_scan.process_block(x, "toms", cutoff_hz=bad_cutoff)
    b = p_deer.process_block(x, "toms", cutoff_hz=bad_cutoff)
    assert p_deer.fallbacks.get("toms", 0) == 1
    assert p_deer.last_residual["toms"] > p_deer.fallback_tol  # surfaced
    np.testing.assert_allclose(a, b, atol=1e-6)  # served scan-exact

    # benign operating point: no fallback, deer output served directly
    p_deer2 = make_clipper_processor(FS, models=("toms",), engine="deer")
    p_deer2.process_block(x, "toms", cutoff_hz=4000.0)
    assert p_deer2.fallbacks.get("toms", 0) == 0
    assert p_deer2.last_residual["toms"] < 1e-5

    # fallback disabled: the flagged block is served as-is (residual-only)
    p_deer3 = make_clipper_processor(FS, models=("toms",), engine="deer")
    p_deer3.fallback_tol = None
    c = p_deer3.process_block(x, "toms", cutoff_hz=bad_cutoff)
    assert p_deer3.fallbacks.get("toms", 0) == 0
    assert np.max(np.abs(c - a)) > 1e-3  # visibly not the scan output
