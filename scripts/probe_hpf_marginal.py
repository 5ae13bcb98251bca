"""HPF marginal-mode accuracy probe (round-3 VERDICT weak #4 / task 7).

The HPF clipper's series capacitor is a marginal slow mode (|df/dz| -> 1);
the fused DEER solve (damping 0.5, ~3x sweeps) floors at ~1e-4.  Question:
is that the DEER composition's own f32 round-off (fixable with compensated
arithmetic), or the f32 floor of the recursion itself (the sequential f32
scan drifts just as far from a float64 oracle)?

Measures, at several signal lengths and sweep budgets:
  e_scan  = max |f32 scan   - f64 oracle|   (the mode's intrinsic f32 drift)
  e_deer  = max |f32 DEER   - f64 oracle|
  e_rel   = max |f32 DEER   - f32 scan|     (the number the suite pins)

If e_deer <~ 2x e_scan the solver is at the floor and the published claim
stands (negative result recorded); a compensated-precision kernel change is
only warranted if e_deer >> e_scan.

Runs on CPU (interpret-mode kernel + x64 oracle):
    JAX_PLATFORMS=cpu python scripts/probe_hpf_marginal.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import diffwdf_tpu as dwdf
from diffwdf_tpu.models.diode_clipper import make_hpf_diode_clipper
from diffwdf_tpu.ops.deer_circuit import fused_deer_circuit

FS = 96000.0


def main():
    root = dwdf.DiodePairRoot(name="dp", diode=dwdf.diode_1n4148_1u1d,
                              quality="best")
    hpf = make_hpf_diode_clipper(root, FS)
    params = {**hpf.init_params(), **root.init_params()}

    def to64(t):
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), t)

    out = {"fs": FS, "cases": []}
    rng = np.random.default_rng(2)
    for T in (2048, 16384):
        x32 = (2.0 * rng.standard_normal(T)).astype(np.float32)
        ref32, _ = hpf.process(params, hpf.init_state(),
                               {"Vs": {"v": jnp.asarray(x32)}})
        ref32 = np.asarray(ref32, np.float64)
        with jax.enable_x64():
            o64, _ = hpf.process(
                to64(params), to64(hpf.init_state()),
                {"Vs": {"v": jnp.asarray(x32.astype(np.float64))}})
            o64 = np.asarray(o64)
        e_scan = float(np.max(np.abs(ref32 - o64)))
        for sweeps, damping in ((24, 0.5), (48, 0.5), (96, 0.5)):
            d32, _, res = fused_deer_circuit(
                hpf, params, jnp.asarray(x32), input_node="Vs",
                sweeps=sweeps, damping=damping, interpret=True)
            d32 = np.asarray(d32, np.float64)
            rec = {
                "T": T, "sweeps": sweeps, "damping": damping,
                "residual": float(res),
                "e_scan_vs_f64": e_scan,
                "e_deer_vs_f64": float(np.max(np.abs(d32 - o64))),
                "e_deer_vs_scan": float(np.max(np.abs(d32 - ref32))),
            }
            rec["deer_over_scan_floor"] = (
                rec["e_deer_vs_f64"] / max(e_scan, 1e-30))
            out["cases"].append(rec)
            print(json.dumps(rec), flush=True)

    os.makedirs("runs/probes", exist_ok=True)
    with open("runs/probes/hpf_marginal_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"out": "runs/probes/hpf_marginal_probe.json"}))


if __name__ == "__main__":
    main()
