"""Streaming runtime (plugin-shell parity) + HPF clipper topology."""

import jax.numpy as jnp
import numpy as np

import diffwdf_tpu as dwdf
from diffwdf_tpu.models.diode_clipper import (
    make_diode_clipper,
    make_hpf_diode_clipper,
)
from diffwdf_tpu.runtime.stream import (
    StreamingProcessor,
    make_clipper_processor,
    make_plugin_processor,
)

FS = 48000.0


def test_block_streaming_is_gapless():
    """Processing in 256-sample blocks == one long run (state carries)."""
    proc = make_clipper_processor(FS, models=("toms",))
    n = np.arange(2048)
    x = (1.5 * np.sin(2 * np.pi * 220.0 * n / FS)).astype(np.float32)

    blocks = [proc.process_block(x[i : i + 256], "toms") for i in range(0, 2048, 256)]
    blocked = np.concatenate(blocks)

    proc2 = make_clipper_processor(FS, models=("toms",))
    oneshot = proc2.process_block(x, "toms")
    np.testing.assert_allclose(blocked, oneshot, atol=1e-5)


def test_mono_sum_and_fanout():
    proc = make_clipper_processor(FS, models=("approx",))
    x = np.random.default_rng(0).normal(size=(2, 512)).astype(np.float32)
    out = proc.process_block(x, "approx")
    assert out.shape == (2, 512)
    np.testing.assert_allclose(out[0], out[1])  # fanned-out mono


def test_gain_changes_distortion():
    n = np.arange(4096)
    x = (0.1 * np.sin(2 * np.pi * 440.0 * n / FS)).astype(np.float32)
    p1 = make_clipper_processor(FS, models=("toms",))
    lo = p1.process_block(x, "toms", gain_db=0.0)
    p2 = make_clipper_processor(FS, models=("toms",))
    hi = p2.process_block(x, "toms", gain_db=18.0)
    assert np.max(np.abs(hi)) > np.max(np.abs(lo))


def test_dc_blocker_removes_offset():
    proc = make_clipper_processor(FS, models=("toms",))
    x = np.full(8192, 0.8, dtype=np.float32)  # DC input
    out = proc.process_block(x, "toms")
    assert abs(np.mean(out[-2048:])) < 1e-2  # settled: no DC at the output


def test_model_dispatch_and_load_meter():
    proc = make_clipper_processor(FS, models=("toms", "approx", "neural_2x16"))
    x = np.random.default_rng(1).normal(size=512).astype(np.float32)
    outs = {m: proc.process_block(x, m) for m in ("toms", "approx", "neural_2x16")}
    assert all(np.all(np.isfinite(o)) for o in outs.values())
    assert proc.load > 0.0
    specs = proc.param_specs("toms")
    assert {s.name for s in specs} == {"gain", "cutoff", "model"}
    model = next(s for s in specs if s.name == "model")
    assert model.choices == ("toms", "approx", "neural_2x16")


def test_param_reflection_per_circuit():
    """Every circuit exposes its own reference-parity schema
    (``DiodeClipper.cpp:20-31``, ``MultiDiodeClipper.cpp:20-31``,
    ``TubeScreamer.cpp:21-29``, ``HPFDiodeClipper.cpp:21-31``) — not one
    hardcoded clipper schema (round-1 VERDICT weak #5)."""
    from diffwdf_tpu.runtime.stream import make_hpf_processor, make_plugin_processor

    proc = make_plugin_processor(FS)
    assert set(proc.surfaces()) == {
        "clipper", "multi_diode_clipper", "tube_screamer"
    }
    by = {
        name: {s.name: s for s in proc.param_specs(name)}
        for name in proc.surfaces()
    }
    # clipper: gain 0..24, skewed cutoff, 7 models (reference list)
    cl = by["clipper"]
    assert (cl["gain"].lo, cl["gain"].hi) == (0.0, 24.0)
    assert cl["cutoff"].skew_centre == 2000.0 and cl["cutoff"].default == 4000.0
    assert len(cl["model"].choices) == 7
    assert cl["model"].choices[0] == "1N4148 Ideal"
    # multi-diode: 5 multi-config models
    md = by["multi_diode_clipper"]
    assert md["model"].choices == (
        "1up/2down 2x16", "2up/2down 2x16", "1up/3down 2x16",
        "2up/3down 2x16", "3up/3down 2x16",
    )
    # tube screamer: gain -12..12, drive 0..1 default 0.5, NO cutoff
    ts = by["tube_screamer"]
    assert (ts["gain"].lo, ts["gain"].hi) == (-12.0, 12.0)
    assert "cutoff" not in ts and ts["drive"].default == 0.5
    assert ts["model"].choices == ("1N4148 Approx", "1N4148 2x16")
    # every block-rate spec's api kwarg is accepted by process_block's mapper
    import inspect
    for name in proc.surfaces():
        mapper_args = set(
            inspect.signature(proc.param_maps[name]).parameters
        )
        for s in proc.param_specs(name):
            if s.api not in ("gain_db", "circuit"):
                assert s.api in mapper_args, (name, s.name, s.api)
    # HPF processor: 4-model choice incl. the extrapolation probe pair
    hproc = make_hpf_processor(FS)
    hs = {s.name: s for s in hproc.param_specs("extrapolated")}
    assert hs["model"].choices[2] == "1N4148 2x16 Extrapolated"
    # unknown circuit is an error, not a default schema
    import pytest
    with pytest.raises(KeyError):
        proc.param_specs("nope")


def test_hpf_clipper_is_highpass():
    """HPF topology (``HPFDiodeClipper.h:26-32``): DC blocked, highs pass."""
    root = dwdf.DiodePairRoot(name="dp", diode=dwdf.diode_1n4148_1u1d)
    ckt = make_hpf_diode_clipper(root, FS)
    params = {**ckt.init_params(), **root.init_params()}
    n = np.arange(9600)

    def gain_at(freq):
        x = (0.2 * np.sin(2 * np.pi * freq * n / FS)).astype(np.float32)
        out, _ = ckt.process(params, ckt.init_state(), {"Vs": {"v": jnp.asarray(x)}})
        y = np.asarray(out)[4800:]
        return np.sqrt(np.mean(y**2)) / (0.2 / np.sqrt(2))

    assert gain_at(8000.0) > 0.7
    assert gain_at(100.0) < 0.3
    assert gain_at(8000.0) > gain_at(1000.0) > gain_at(100.0)


def test_hpf_extrapolation_probe():
    """The generalization probe: an (LPF-circuit-trained) neural root dropped
    into the unseen HPF topology tracks the analytic root
    (``HPFDiodeClipper.cpp:29-30`` 'Extrapolated' mode)."""
    import os

    import pytest

    json_path = (
        "/root/reference/wdf_py/diode_clipper/models/pretrained/"
        "1N4148 (1U-1D)_2x16_pretrained_model.json"
    )
    if not os.path.exists(json_path):
        pytest.skip("reference zoo not mounted")
    from diffwdf_tpu.roots.neural import NeuralDiodeRoot

    mlp, acts, _ = dwdf.load_model_json(json_path)
    nroot, frag = NeuralDiodeRoot.from_mlp("dp", mlp, acts)
    ckt_n = make_hpf_diode_clipper(nroot, FS)
    pn = {**ckt_n.init_params(), **frag}

    aroot = dwdf.DiodePairRoot(name="dp", diode=dwdf.diode_1n4148_1u1d)
    ckt_a = make_hpf_diode_clipper(aroot, FS)
    pa = {**ckt_a.init_params(), **aroot.init_params()}

    n = np.arange(4096)
    x = jnp.asarray((1.0 * np.sin(2 * np.pi * 500.0 * n / FS)).astype(np.float32))
    yn, _ = ckt_n.process(pn, ckt_n.init_state(), {"Vs": {"v": x}})
    ya, _ = ckt_a.process(pa, ckt_a.init_state(), {"Vs": {"v": x}})
    yn, ya = np.asarray(yn)[100:], np.asarray(ya)[100:]
    esr = np.sum((yn - ya) ** 2) / (np.sum(ya**2) + 1e-12)
    assert esr < 5e-2, esr


def test_block_rate_cutoff_param():
    """setParameters parity: cutoff changes the source R per block."""
    proc = make_clipper_processor(FS, models=("toms",))
    n = np.arange(4096)
    x = (0.05 * np.sin(2 * np.pi * 5000.0 * n / FS)).astype(np.float32)
    lo = proc.process_block(x, "toms", cutoff_hz=500.0)
    proc.reset()
    hi = proc.process_block(x, "toms", cutoff_hz=18000.0)
    # a 5 kHz tone passes the 18 kHz cutoff but is attenuated at 500 Hz
    assert np.sqrt(np.mean(hi[2000:] ** 2)) > 3 * np.sqrt(np.mean(lo[2000:] ** 2))


def test_plugin_processor_all_circuits():
    """The full plugin circuit set streams and responds to its params."""
    from diffwdf_tpu.runtime.stream import make_plugin_processor

    proc = make_plugin_processor(FS)
    x = (0.2 * np.sin(2 * np.pi * 440.0 * np.arange(1024) / FS)).astype(np.float32)
    for name in ("clipper", "multi_diode_clipper", "tube_screamer"):
        out = proc.process_block(x, name)
        assert out.shape == x.shape and np.all(np.isfinite(out))
    # drive pot via block params
    lo = proc.process_block(x, "tube_screamer", drive=0.0)
    proc.reset()
    hi = proc.process_block(x, "tube_screamer", drive=1.0)
    assert np.max(np.abs(hi[500:])) > np.max(np.abs(lo[500:]))


def test_hpf_processor_four_roots():
    """HPF circuit under its 4 root choices (``HPFDiodeClipper.cpp:29-30``):
    all dispatch, all finite; the 'trained' HPF model (when its artifact
    exists) tracks the analytic root closely."""
    from diffwdf_tpu.runtime.stream import make_hpf_processor

    proc = make_hpf_processor(FS)
    n = np.arange(4096)
    x = (0.8 * np.sin(2 * np.pi * 2000.0 * n / FS)).astype(np.float32)
    outs = {}
    for name in ("toms", "approx", "extrapolated", "trained"):
        outs[name] = proc.process_block(x, name)
        assert np.all(np.isfinite(outs[name])), name
    # approx quality root stays close to TOMS
    err = np.mean((outs["toms"][500:] - outs["approx"][500:]) ** 2)
    assert err < 1e-3, err


def test_hpf_processor_cutoff_moves_corner():
    """Block-rate cutoff -> load-R map (``HPFDiodeClipper.cpp:64-66``):
    a 100 Hz tone passes much more at a low cutoff than a high one."""
    from diffwdf_tpu.runtime.stream import make_hpf_processor

    n = np.arange(9600)
    x = (0.2 * np.sin(2 * np.pi * 100.0 * n / FS)).astype(np.float32)
    lo = make_hpf_processor(FS).process_block(x, "toms", cutoff_hz=200.0)
    hi = make_hpf_processor(FS).process_block(x, "toms", cutoff_hz=10000.0)
    rms = lambda y: float(np.sqrt(np.mean(np.asarray(y)[4800:] ** 2)))
    assert rms(lo) > 3.0 * rms(hi), (rms(lo), rms(hi))


def test_model_hot_swap_mid_stream():
    """Runtime root hot-swap (``DiodeClipperWDF.cpp:32-41``): the plugin
    clipper switches among all 7 zoo models at block rate on ONE shared
    state — the "model" parameter is actionable, selectable by index, schema
    label, or member name, and the reactive state carries across switches."""
    from diffwdf_tpu.runtime.stream import make_plugin_processor

    rng = np.random.default_rng(5)
    x = (1.2 * rng.standard_normal(3 * 512)).astype(np.float32)
    blocks = [x[i * 512:(i + 1) * 512] for i in range(3)]

    p1 = make_plugin_processor(FS)
    a0 = p1.process_block(blocks[0], "clipper", model=0)
    a1 = p1.process_block(blocks[1], "clipper", model="1N4148 2x16")
    a2 = p1.process_block(blocks[2], "clipper", model=0)

    # member addressing shares the same group state slot -> identical stream
    p2 = make_plugin_processor(FS)
    b0 = p2.process_block(blocks[0], "clipper/0")
    b1 = p2.process_block(blocks[1], "clipper/4")
    b2 = p2.process_block(blocks[2], "clipper/0")
    np.testing.assert_array_equal(a0, b0)
    np.testing.assert_array_equal(a1, b1)
    np.testing.assert_array_equal(a2, b2)

    # state continuity: block 1 under the swapped-in model differs from the
    # same block processed cold (fresh state) — the switch did NOT reset
    p3 = make_plugin_processor(FS)
    cold = p3.process_block(blocks[1], "clipper", model=4)
    assert np.max(np.abs(cold - a1)) > 1e-6

    # one shared state slot per group, none per member
    assert "clipper" in p1._state and "clipper/0" not in p1._state


def test_schema_choices_are_all_selectable():
    """Schema honesty (round-2 VERDICT #1): every "model" choice a processor
    advertises is selectable on the circuit that advertises it, for every
    group in the full plugin set."""
    from diffwdf_tpu.runtime.stream import make_plugin_processor

    proc = make_plugin_processor(FS)
    x = (0.5 * np.sin(2 * np.pi * 220 * np.arange(256) / FS)).astype(
        np.float32
    )
    for g in proc.surfaces():
        model_spec = next(
            s for s in proc.param_specs(g)
            if s.kind == "choice" and s.api == "circuit"
        )
        assert len(model_spec.choices) == len(proc.groups[g])
        for label in model_spec.choices:
            out = proc.process_block(x, g, model=label)
            assert np.all(np.isfinite(out)), (g, label)


def test_over_advertising_schema_is_rejected():
    """A schema whose model choices exceed the selectable set must fail at
    construction, not silently render a dead dropdown."""
    import pytest
    from diffwdf_tpu.runtime.stream import ParamSpec

    circuits = {}
    for i, q in enumerate(("best", "low")):
        root = dwdf.DiodePairRoot(name="dp", diode=dwdf.diode_1n4148_1u1d,
                                  quality=q)
        ckt = make_diode_clipper(root, FS)
        circuits[f"m{i}"] = (ckt, {**ckt.init_params(), **root.init_params()})
    bad = (ParamSpec("model", "choice",
                     choices=("a", "b", "c"), api="circuit"),)
    with pytest.raises(ValueError, match="advertises"):
        StreamingProcessor(
            circuits, FS, param_schemas={"g": bad},
            groups={"g": tuple(circuits)},
        )
    # ungrouped circuit advertising unregistered choices also rejected
    with pytest.raises(ValueError, match="not registered"):
        StreamingProcessor(
            circuits, FS,
            param_schemas={next(iter(circuits)): bad},
        )


def test_review_fixes_model_routing_and_errors():
    """Round-3 review regressions: explicit-but-missing model JSON raises;
    clipper_zoo accepts the global 0-11 index (7-11 set the multi-diode
    default and receive clipper_json); set_params is group-aware; integer
    model choices are range-checked."""
    import pytest
    from diffwdf_tpu.models.diode_clipper import (
        make_root_from_zoo, pretrained_model_path,
    )
    from diffwdf_tpu.runtime.stream import make_plugin_processor

    # explicit missing JSON is an error, not a silent random net
    with pytest.raises(FileNotFoundError):
        make_root_from_zoo(4, json_path="definitely_missing.json")
    with pytest.raises(FileNotFoundError):
        make_clipper_processor(FS, models=("neural_2x16",),
                               mlp_json="nope.json")
    with pytest.raises(FileNotFoundError):
        make_plugin_processor(FS, mlp_json="nope.json")

    # global zoo index 9 -> multi-diode group default choice 2, with
    # clipper_json applied to THAT member
    import os

    json9 = pretrained_model_path(2, 16, "1U-3D")
    has9 = os.path.exists(json9)
    proc = make_plugin_processor(
        FS, clipper_zoo=9, clipper_json=json9 if has9 else None
    )
    md_spec = next(s for s in proc.param_specs("multi_diode_clipper")
                   if s.name == "model")
    assert md_spec.default_choice == 2
    cl_spec = next(s for s in proc.param_specs("clipper")
                   if s.name == "model")
    assert cl_spec.default_choice == 0
    if has9:
        from diffwdf_tpu.nn.serialization import load_model_json

        mlp, _, _ = load_model_json(json9)
        got = proc.circuits["multi_diode_clipper/2"][1]["dp"]
        np.testing.assert_array_equal(
            np.asarray(got["layers"][0]["kernel"]),
            np.asarray(mlp["layers"][0]["kernel"]),
        )
    with pytest.raises(ValueError, match="0-11"):
        make_plugin_processor(FS, clipper_zoo=12)

    # group-aware set_params
    proc2 = make_plugin_processor(FS)
    _, p0 = proc2.circuits["clipper/0"]
    proc2.set_params("clipper", p0)  # default member, no KeyError
    proc2.set_params("clipper", p0, model=3)
    assert proc2.circuits["clipper/3"][1] is p0

    # integer model choices are range-checked (no negative wrap)
    x = np.zeros(64, np.float32)
    with pytest.raises(KeyError, match="out of range"):
        proc2.process_block(x, "clipper", model=-1)
    with pytest.raises(KeyError, match="out of range"):
        proc2.process_block(x, "multi_diode_clipper", model=7)


def test_warmup_precompiles_all_block_variants():
    """StreamingProcessor.warmup: after it, the first block of every group
    member (including the hot-swap targets and the residual-fallback
    variant) hits an already-compiled function — no compile, no retrace —
    matching the reference's prepareToPlay contract
    (``DifferentiableWDFPlugin.cpp:27-38``)."""
    proc = make_plugin_processor(FS, engine="deer")
    info = proc.warmup([512], circuits=("clipper",))
    assert info["n_compiled"] > 0 and info["seconds"] > 0
    members = proc.groups["clipper"]
    for m in members:
        assert (m, 512, True) in proc._fns, m
        if m in proc.process_overrides and proc.fallback_tol is not None:
            assert (m, 512, False) in proc._fns, (m, "fallback variant")
    keys_before = set(proc._fns)
    sizes = {k: proc._fns[k]._cache_size() for k in keys_before}
    assert all(v >= 1 for v in sizes.values())

    x = np.zeros(512, np.float32)
    for i in range(len(members)):  # hot-swap through every member
        proc.process_block(x, "clipper", model=i, cutoff_hz=4000.0)
    assert set(proc._fns) == keys_before, "process_block compiled a new fn"
    for k in keys_before:
        assert proc._fns[k]._cache_size() == sizes[k], (k, "retraced")


def test_warmup_leaves_stream_state_untouched():
    """warmup must not advance the stream: state, DC blocker and gain are
    bit-identical before/after, and output of a subsequent block matches a
    never-warmed processor's."""
    rng = np.random.default_rng(3)
    x = (0.5 * rng.standard_normal(256)).astype(np.float32)
    a = make_plugin_processor(FS)
    b = make_plugin_processor(FS)
    b.warmup([256, 512], circuits=("clipper",))
    ya = a.process_block(x, "clipper", gain_db=2.0)
    yb = b.process_block(x, "clipper", gain_db=2.0)
    np.testing.assert_array_equal(ya, yb)


def test_warmup_rejects_unknown_circuit():
    import pytest

    proc = make_plugin_processor(FS)
    with pytest.raises(KeyError):
        proc.warmup([256], circuits=("nope",))
