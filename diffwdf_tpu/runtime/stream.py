"""Streaming block processor — the serving path.

Capability parity with the reference's C++ plugin shell
(``plugin/src/DifferentiableWDFPlugin.cpp:40-82`` and the circuit wrappers
``DiodeClipper.cpp:20-50`` etc.): mono summing, ramped input gain, circuit
dispatch by name, a 25 Hz one-pole DC blocker, per-block parameter updates
(cutoff -> source R, drive pot), and state carried across blocks so arbitrary
block sizes stream gap-free.

On TPU the "real-time engine" is a jit-compiled block function; each circuit
(and block size) compiles once and is then a single device call per block.
The processor also exposes the parameter schema of each circuit
(name/kind/range) — the TPU-side equivalent of the reference's GUI parameter
reflection (``CircuitModelGUI.cpp:55-66``).
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.circuit import Circuit

DC_BLOCKER_HZ = 25.0  # reference: DifferentiableWDFPlugin.cpp:31


@dataclasses.dataclass
class ParamSpec:
    """Introspectable parameter descriptor (GUI-reflection parity).

    ``name`` is the reference's parameter tag (``DiodeClipper.cpp:5-7``);
    ``api`` is how the parameter is driven through this framework:
    the ``process_block`` keyword for block-rate params ("gain_db",
    "cutoff_hz", "drive"), or "circuit" for the model choice (selected as
    the circuit name passed to ``process_block`` — the TPU analogue of the
    reference's root hot-swap).  ``skew_centre`` mirrors JUCE's
    ``NormalisableRange::setSkewForCentre`` so a GUI can reproduce the
    reference's log-feel cutoff slider.
    """

    name: str
    kind: str  # "float" | "choice"
    lo: float = 0.0
    hi: float = 1.0
    default: float = 0.0
    choices: Tuple[str, ...] = ()
    default_choice: int = 0
    skew_centre: Optional[float] = None
    api: str = ""

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["choices"] = list(self.choices)
        return d


def _cutoff_spec() -> ParamSpec:
    # 200 Hz .. 20 kHz, skewed for centre 2 kHz, default 4 kHz
    # (DiodeClipper.cpp:25-27, identical in MultiDiodeClipper/HPFDiodeClipper)
    return ParamSpec("cutoff", "float", 200.0, 20000.0, 4000.0,
                     skew_centre=2000.0, api="cutoff_hz")


def clipper_param_specs(
    choices: Tuple[str, ...] = (
        "1N4148 Ideal", "1N4148 Approx", "1N4148 2x4", "1N4148 2x8",
        "1N4148 2x16", "1N4148 4x4", "1N4148 4x8",
    ),
) -> Tuple[ParamSpec, ...]:
    """The DiodeClipper parameter set (``DiodeClipper.cpp:20-31``):
    gain 0..24 dB, skewed cutoff, 7-model choice."""
    return (
        ParamSpec("gain", "float", 0.0, 24.0, 0.0, api="gain_db"),
        _cutoff_spec(),
        ParamSpec("model", "choice", choices=tuple(choices), api="circuit"),
    )


def multi_diode_param_specs() -> Tuple[ParamSpec, ...]:
    """MultiDiodeClipper parameters (``MultiDiodeClipper.cpp:20-31``):
    same gain/cutoff as the clipper, 5 multi-diode-config models."""
    return (
        ParamSpec("gain", "float", 0.0, 24.0, 0.0, api="gain_db"),
        _cutoff_spec(),
        ParamSpec("model", "choice", choices=(
            "1up/2down 2x16", "2up/2down 2x16", "1up/3down 2x16",
            "2up/3down 2x16", "3up/3down 2x16",
        ), api="circuit"),
    )


def tube_screamer_param_specs() -> Tuple[ParamSpec, ...]:
    """TubeScreamer parameters (``TubeScreamer.cpp:21-29``):
    gain -12..12 dB, drive 0..1 (default 0.5), 2-model choice."""
    return (
        ParamSpec("gain", "float", -12.0, 12.0, 0.0, api="gain_db"),
        ParamSpec("drive", "float", 0.0, 1.0, 0.5, api="drive"),
        ParamSpec("model", "choice",
                  choices=("1N4148 Approx", "1N4148 2x16"), api="circuit"),
    )


def hpf_param_specs() -> Tuple[ParamSpec, ...]:
    """HPFDiodeClipper parameters (``HPFDiodeClipper.cpp:21-31``):
    gain/cutoff as the clipper, 4-model choice incl. the extrapolation
    probe pair."""
    return (
        ParamSpec("gain", "float", 0.0, 24.0, 0.0, api="gain_db"),
        _cutoff_spec(),
        ParamSpec("model", "choice", choices=(
            "1N4148 Ideal", "1N4148 Approx",
            "1N4148 2x16 Extrapolated", "1N4148 2x16 Trained",
        ), api="circuit"),
    )


def default_clipper_params() -> Tuple[ParamSpec, ...]:
    """Deprecated alias for :func:`clipper_param_specs`."""
    return clipper_param_specs()


def _dc_blocker_coeff(fs: float, f_hz: float = DC_BLOCKER_HZ) -> float:
    return 1.0 - 2.0 * math.pi * f_hz / fs


class StreamingProcessor:
    """Block-streaming WDF processor with gain ramp + DC blocker.

    circuits: {name: (Circuit, params)}; the active circuit is selected per
    block (each compiles once — the TPU analogue of the reference's root
    hot-swap, ``DiodeClipperWDF.cpp:36-41``).
    """

    def __init__(self, circuits: Dict[str, Tuple[Circuit, Any]], fs: float,
                 param_maps: Optional[Dict[str, Callable]] = None,
                 param_schemas: Optional[Dict[str, Tuple[ParamSpec, ...]]] = None,
                 process_overrides: Optional[Dict[str, Callable]] = None):
        self.circuits = dict(circuits)
        self.fs = fs
        #: per-circuit mapping of block-rate params (cutoff_hz, drive, ...)
        #: to static controls {node: {field: value}} (setParameters parity)
        self.param_maps = param_maps or {}
        #: per-circuit parameter schemas (GUI-reflection parity); factories
        #: register the reference's exact schema per circuit, ad-hoc circuits
        #: get a schema derived from their param_map signature
        self.param_schemas = dict(param_schemas or {})
        #: per-circuit replacement for ``Circuit.process`` inside the block
        #: fn — e.g. the fused parallel-in-time solver as a low-latency
        #: serving engine; signature (params, state, inputs, static_controls)
        #: -> (out, state) or (out, state, residual)
        self.process_overrides = dict(process_overrides or {})
        #: last solver-residual certificate per circuit (deer engines emit
        #: max|f(z_prev) - z| — the serving health metric next to `load`;
        #: 0.0 for the exact scan engine)
        self.last_residual: Dict[str, float] = {}
        self._fns: Dict[Tuple[str, int], Callable] = {}
        self._state: Dict[str, Any] = {
            name: ckt.init_state() for name, (ckt, _) in circuits.items()
        }
        self._dc_state = (jnp.zeros(()), jnp.zeros(()))  # (x1, y1)
        self._gain = 1.0
        self._load_acc = 0.0
        self._load = 0.0

    # -- parameter schema (GUI reflection parity) --------------------------
    def param_specs(self, name: str) -> Tuple[ParamSpec, ...]:
        """The parameter schema of circuit ``name`` — the TPU-side analogue
        of the reference's auto-generated GUI (``CircuitModelGUI.cpp:55-66``
        reflects over each circuit's paramTags; here a GUI/CLI reflects over
        these specs).  Registered schemas come from the circuit factories;
        unregistered circuits derive a schema from their param_map signature
        so every circuit exposes something renderable."""
        if name not in self.circuits:
            raise KeyError(
                f"unknown circuit {name!r}; have {sorted(self.circuits)}"
            )
        if name in self.param_schemas:
            return self.param_schemas[name]
        import inspect

        specs = [ParamSpec("gain", "float", 0.0, 24.0, 0.0, api="gain_db")]
        mapper = self.param_maps.get(name)
        if mapper is not None:
            for arg in inspect.signature(mapper).parameters:
                if arg == "cutoff_hz":
                    specs.append(_cutoff_spec())
                elif arg == "drive":
                    specs.append(
                        ParamSpec("drive", "float", 0.0, 1.0, 0.5, api="drive")
                    )
                else:
                    specs.append(ParamSpec(arg, "float", api=arg))
        return tuple(specs)

    @property
    def load(self) -> float:
        """Smoothed processing-load estimate (CPU-meter parity,
        ``CPUMeter.h:42-80``): device time / block duration."""
        return self._load

    # -- core ---------------------------------------------------------------
    def _block_fn(self, name: str, block_len: int) -> Callable:
        key = (name, block_len)
        if key not in self._fns:
            ckt, params = self.circuits[name]
            rho = _dc_blocker_coeff(self.fs)

            node = "Vin" if "Vin" in ckt.init_params() else "Vs"  # drive node

            override = self.process_overrides.get(name)

            @jax.jit
            def fn(params, state, dc_state, vin, gain0, gain1, static_controls):
                t = (jnp.arange(block_len) + 1.0) / block_len
                g = gain0 + (gain1 - gain0) * t  # per-sample gain ramp
                if override is not None:
                    res = override(
                        params, state, {node: {"v": vin * g}}, static_controls
                    )
                    out, state = res[0], res[1]
                    residual = res[2] if len(res) > 2 else jnp.float32(0.0)
                else:
                    out, state = ckt.process(
                        params, state, {node: {"v": vin * g}},
                        static_controls=static_controls,
                    )
                    residual = jnp.float32(0.0)

                def dc_step(carry, x):
                    x1, y1 = carry
                    y = x - x1 + rho * y1
                    return (x, y), y

                dc_state, out = jax.lax.scan(dc_step, dc_state, out)
                return out, state, dc_state, residual

            self._fns[key] = fn
        return self._fns[key]

    def process_block(
        self,
        audio: np.ndarray,
        circuit: str,
        gain_db: float = 0.0,
        **block_params,
    ) -> np.ndarray:
        """Process one audio block.

        audio: (T,) mono or (C, T) multichannel — summed to mono, processed,
        fanned back out to all channels (``DifferentiableWDFPlugin.cpp:50-81``).
        """
        x = np.asarray(audio, dtype=np.float32)
        multi = x.ndim == 2
        mono = x.mean(axis=0) if multi else x
        T = mono.shape[-1]

        gain1 = float(10.0 ** (gain_db / 20.0))
        fn = self._block_fn(circuit, T)
        _, params = self.circuits[circuit]
        static_controls = {}
        if block_params:
            mapper = self.param_maps.get(circuit)
            if mapper is None:
                raise ValueError(f"no param map for circuit {circuit!r}")
            static_controls = mapper(**block_params)
        t0 = time.perf_counter()
        out, state, dc_state, residual = fn(
            params,
            self._state[circuit],
            self._dc_state,
            jnp.asarray(mono),
            self._gain,
            gain1,
            static_controls,
        )
        out = np.asarray(out)
        dt = time.perf_counter() - t0
        block_dur = T / self.fs
        self._load = 0.9 * self._load + 0.1 * (dt / block_dur)

        self._state[circuit] = state
        self._dc_state = dc_state
        self.last_residual[circuit] = float(residual)
        self._gain = gain1
        if multi:
            return np.broadcast_to(out, x.shape).copy()
        return out

    def reset(self):
        for name, (ckt, _) in self.circuits.items():
            self._state[name] = ckt.init_state()
        self._dc_state = (jnp.zeros(()), jnp.zeros(()))

    def set_params(self, circuit: str, params) -> None:
        self.circuits[circuit] = (self.circuits[circuit][0], params)


def make_clipper_processor(
    fs: float,
    cutoff_hz: float = 4000.0,
    models: Tuple[str, ...] = ("toms", "approx", "neural_2x16"),
    mlp_json: Optional[str] = None,
    engine: str = "scan",
) -> StreamingProcessor:
    """Build the reference plugin's circuit set: diode clipper under all
    root models, with cutoff mapped to source resistance.

    engine="deer" serves the analytic circuits ("toms"/"approx") through the
    fused parallel-in-time kernel (``ops.parallel_time_deer`` — the whole
    block solved in one kernel launch, ~2 orders of magnitude lower latency
    than the sequential scan on TPU) whenever the block length is a multiple
    of 1024; other block sizes and the neural root fall back to the scan."""
    import diffwdf_tpu as dwdf
    from ..models.diode_clipper import cutoff_to_resistance, make_diode_clipper
    from ..nn.serialization import load_model_json
    from ..roots.neural import NeuralDiodeRoot

    cap = 2.2e-9
    r = cutoff_to_resistance(cutoff_hz, cap)
    circuits = {}
    for m in models:
        if m == "toms":
            root = dwdf.DiodePairRoot(
                name="dp", diode=dwdf.diode_1n4148_1u1d, quality="best"
            )
            ckt = make_diode_clipper(root, fs, r_source=r, cap=cap)
            params = {**ckt.init_params(), **root.init_params()}
        elif m == "approx":
            root = dwdf.DiodePairRoot(
                name="dp", diode=dwdf.diode_1n4148_1u1d, quality="low"
            )
            ckt = make_diode_clipper(root, fs, r_source=r, cap=cap)
            params = {**ckt.init_params(), **root.init_params()}
        elif m.startswith("neural"):
            if mlp_json is not None:
                mlp, acts, _ = load_model_json(mlp_json)
                root, frag = NeuralDiodeRoot.from_mlp("dp", mlp, acts)
            else:
                root = NeuralDiodeRoot(name="dp", n_layers=2, layer_size=16)
                frag = root.init_params()
            ckt = make_diode_clipper(root, fs, r_source=r, cap=cap)
            params = {**ckt.init_params(), **frag}
        else:
            raise ValueError(m)
        circuits[m] = (ckt, params)

    def clipper_map(cutoff_hz):
        return {"Vs": {"R": cutoff_to_resistance(cutoff_hz, cap)}}

    overrides = {}
    if engine == "deer":
        from ..ops.parallel_time_deer import fused_deer_clipper

        # (sweeps, omega iters) per root: the omega iteration count must
        # match the scan engine's quality knob so switching engines never
        # changes the model ("approx" = chowdsp-style 1-iter omega)
        cfg_of = {"toms": (8, 3), "approx": (4, 1)}

        def make_deer(ckt, sweeps, qiters):
            def run(params, state, inputs, static_controls):
                v = inputs["Vs"]["v"]
                if v.shape[0] % 1024:  # static shape: clean trace-time fallback
                    return ckt.process(
                        params, state, inputs, static_controls=static_controls
                    )
                r = (static_controls or {}).get("Vs", {}).get(
                    "R", params["Vs"]["R"]
                )
                d = params["dp"]
                out, zf, res = fused_deer_clipper(
                    v, r, params["C"]["C"], d["Is"], d["Vt"] * d["nabla"],
                    d["N_up"], d["N_down"], fs=fs,
                    z0=state["C"]["z"], sweeps=sweeps, quality_iters=qiters,
                    interpret=jax.default_backend() != "tpu",
                )
                return out, {"C": {"z": zf}}, res

            return run

        for m in circuits:
            if m in cfg_of:
                overrides[m] = make_deer(circuits[m][0], *cfg_of[m])

    specs = clipper_param_specs(choices=tuple(circuits))
    return StreamingProcessor(
        circuits, fs, param_maps={m: clipper_map for m in circuits},
        param_schemas={m: specs for m in circuits},
        process_overrides=overrides,
    )


def make_hpf_processor(
    fs: float,
    cutoff_hz: float = 4000.0,
    lpf_trained_json: Optional[str] = None,
    hpf_trained_json: Optional[str] = None,
    engine: str = "scan",
) -> StreamingProcessor:
    """The HPF clipper circuit under its 4 root choices
    (``HPFDiodeClipper.cpp:29-30,60-66``): TOMS, approx, the LPF-trained
    2x16 run in the unseen topology ("extrapolated"), and the HPF-trained
    2x16 ("trained").  Cutoff maps to the load resistor R = 1/(2 pi f C)
    with C fixed at 2.2 nF."""
    from ..models.diode_clipper import (
        cutoff_to_resistance,
        make_hpf_diode_clipper,
        make_hpf_root_from_zoo,
    )

    cap = 2.2e-9
    r_load = cutoff_to_resistance(cutoff_hz, cap)
    names = ("toms", "approx", "extrapolated", "trained")
    json_for = {
        "extrapolated": lpf_trained_json,
        "trained": hpf_trained_json,
    }
    circuits = {}
    for i, name in enumerate(names):
        root, frag = make_hpf_root_from_zoo(i, json_path=json_for.get(name))
        ckt = make_hpf_diode_clipper(root, fs, r_load=r_load, cap=cap)
        circuits[name] = (ckt, {**ckt.init_params(), **frag})

    def hpf_map(cutoff_hz):
        return {"R": {"R": cutoff_to_resistance(cutoff_hz, cap)}}

    overrides = {}
    if engine == "deer":
        # HPF's series capacitor is a marginal slow state mode: the generic
        # fused solver needs damped Newton (see ops.deer_circuit docstring)
        from ..ops.deer_circuit import fused_deer_circuit

        interp = jax.default_backend() != "tpu"

        def make_deer(ckt):
            def run(params, state, inputs, static_controls):
                v = inputs["Vs"]["v"]
                if v.shape[0] % 1024:
                    return ckt.process(params, state, inputs,
                                       static_controls=static_controls)
                out, st, res = fused_deer_circuit(
                    ckt, params, v, input_node="Vs",
                    static_controls=static_controls, state0=state,
                    sweeps=24, damping=0.5, interpret=interp,
                )
                return out, st, res

            return run

        for n in ("toms", "approx"):
            if n in circuits:
                overrides[n] = make_deer(circuits[n][0])

    specs = hpf_param_specs()
    return StreamingProcessor(
        circuits, fs, param_maps={n: hpf_map for n in circuits},
        param_schemas={n: specs for n in circuits},
        process_overrides=overrides,
    )


def make_plugin_processor(
    fs: float,
    cutoff_hz: float = 4000.0,
    drive: float = 0.5,
    mlp_json: Optional[str] = None,
    clipper_zoo: Optional[int] = None,
    clipper_json: Optional[str] = None,
    engine: str = "scan",
) -> StreamingProcessor:
    """The full reference-plugin circuit set (``DifferentiableWDFPlugin.h:41-43``):
    diode clipper, multi-diode clipper, and Tube Screamer, with block-rate
    cutoff/drive parameter maps.  ``clipper_zoo`` selects the clipper's root
    from the 12-entry model zoo (the reference DiodeClipper's model choice,
    ``DiodeClipperWDF.h:24-36``), with ``clipper_json`` supplying neural
    weights; default is the analytic best root (zoo entry 0)."""
    import diffwdf_tpu as dwdf
    from ..models.diode_clipper import (
        cutoff_to_resistance,
        make_diode_clipper,
        make_root_from_zoo,
    )
    from ..models.tube_screamer import drive_to_r6, make_tube_screamer
    from ..nn.serialization import load_model_json
    from ..roots.neural import NeuralDiodeRoot

    cap = 2.2e-9
    r = cutoff_to_resistance(cutoff_hz, cap)
    circuits = {}
    param_maps = {}

    # clipper (zoo-selectable root; analytic best by default)
    root, frag = make_root_from_zoo(
        clipper_zoo if clipper_zoo is not None else 0, json_path=clipper_json
    )
    ckt = make_diode_clipper(root, fs, r_source=r, cap=cap)
    circuits["clipper"] = (ckt, {**ckt.init_params(), **frag})

    # multi-diode clipper: the reference's MultiDiodeClipper exposes the five
    # multi-config 2x16 neural roots (zoo entries 7-11,
    # ``MultiDiodeClipper.cpp:48``); use the pretrained zoo JSON when present,
    # else the 3U-3D analytic root.
    import os

    mjson = "models/pretrained/1N4148 (3U-3D)_2x16_pretrained_model.json"
    if os.path.exists(mjson):
        mlp, acts, _ = load_model_json(mjson)
        mroot, mfrag = NeuralDiodeRoot.from_mlp("dp", mlp, acts)
    else:
        mroot = dwdf.DiodePairRoot(name="dp", diode=dwdf.diode_1n4148_3u3d)
        mfrag = mroot.init_params()
    mckt = make_diode_clipper(mroot, fs, r_source=r, cap=cap)
    circuits["multi_diode_clipper"] = (
        mckt, {**mckt.init_params(), **mfrag}
    )

    def clipper_map(cutoff_hz):
        return {"Vs": {"R": cutoff_to_resistance(cutoff_hz, cap)}}

    param_maps["clipper"] = clipper_map
    param_maps["multi_diode_clipper"] = clipper_map

    # tube screamer (analytic or zoo-neural root)
    if mlp_json is not None:
        mlp, acts, _ = load_model_json(mlp_json)
        ts_root, ts_frag = NeuralDiodeRoot.from_mlp("dp", mlp, acts)
    else:
        ts_root = dwdf.DiodePairRoot(name="dp", diode=dwdf.diode_1n4148_1u1d)
        ts_frag = ts_root.init_params()
    ts = make_tube_screamer(ts_root, fs, drive=drive)
    circuits["tube_screamer"] = (ts, {**ts.init_params(), **ts_frag})
    param_maps["tube_screamer"] = lambda drive: {"R6": {"R": drive_to_r6(drive)}}

    overrides = {}
    if engine == "deer":
        # low-latency single-stream serving: the analytic-rooted circuits
        # run through the fused parallel-in-time kernels (the neural-rooted
        # ones keep the scan; blocks not divisible by 1024 fall back)
        from ..ops.deer_circuit import fused_deer_circuit
        from ..ops.parallel_time_deer import fused_deer_clipper

        interp = jax.default_backend() != "tpu"
        if (clipper_zoo in (None, 0, 1)) and clipper_json is None:
            # (sweeps, omega iters) must mirror make_clipper_processor's
            # cfg_of so the engine switch never changes the model: zoo 1
            # ("approx") is the 1-iter omega root in the scan engine too
            sweeps, qiters = (8, 3) if clipper_zoo in (None, 0) else (4, 1)

            def clipper_deer(params, state, inputs, static_controls,
                             _ckt=ckt, _sweeps=sweeps, _qiters=qiters):
                v = inputs["Vs"]["v"]
                if v.shape[0] % 1024:
                    return _ckt.process(params, state, inputs,
                                        static_controls=static_controls)
                rr = (static_controls or {}).get("Vs", {}).get(
                    "R", params["Vs"]["R"])
                d = params["dp"]
                out, zf, res = fused_deer_clipper(
                    v, rr, params["C"]["C"], d["Is"], d["Vt"] * d["nabla"],
                    d["N_up"], d["N_down"], fs=fs, z0=state["C"]["z"],
                    sweeps=_sweeps, quality_iters=_qiters, interpret=interp,
                )
                return out, {"C": {"z": zf}}, res

            overrides["clipper"] = clipper_deer

        if mlp_json is None:  # analytic TS root

            def ts_deer(params, state, inputs, static_controls, _ts=ts):
                v = inputs["Vin"]["v"]
                if v.shape[0] % 1024:
                    return _ts.process(params, state, inputs,
                                       static_controls=static_controls)
                out, st, res = fused_deer_circuit(
                    _ts, params, v, input_node="Vin",
                    static_controls=static_controls, state0=state,
                    interpret=interp,
                )
                return out, st, res

            overrides["tube_screamer"] = ts_deer

    return StreamingProcessor(
        circuits, fs, param_maps=param_maps,
        param_schemas={
            "clipper": clipper_param_specs(),
            "multi_diode_clipper": multi_diode_param_specs(),
            "tube_screamer": tube_screamer_param_specs(),
        },
        process_overrides=overrides,
    )
