"""Throughput vs batch width for the fused clipper kernels on the real chip;
writes BATCH_SCALING.json.  Documents the batching story (the TPU wins come
from lanes, not serial speed — SURVEY.md §7 'hard parts')."""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import jax.random as jr

import diffwdf_tpu as dwdf
from diffwdf_tpu.ops.fused_clipper import fused_clipper_analytic, fused_clipper_neural
from diffwdf_tpu.roots.neural import NeuralDiodeRoot

fs, T = 96000.0, 2048
diode = dwdf.diode_1n4148_1u1d
vt = diode.Vt * diode.nabla
nparams = NeuralDiodeRoot(name="dp", n_layers=2, layer_size=16).init_params(
    jr.PRNGKey(0))["dp"]


from bench import _timeit  # pipelined dispatch + drain fetch, RTT-corrected

results = {}
for B in (1024, 2048, 4096, 8192, 16384):
    key = jr.PRNGKey(B)
    vins = [jr.normal(jr.fold_in(key, i), (B, T), jnp.float32) * 2 for i in range(4)]
    z0 = jnp.zeros((B,), jnp.float32)
    rec = {}
    dt = _timeit(lambda v: fused_clipper_neural(
        v, z0, nparams, 47e3, 2.2e-9, fs=fs), vins)
    rec["neural_msps"] = B * T / dt / 1e6
    dt = _timeit(lambda v: fused_clipper_analytic(
        v, z0, 47e3, 2.2e-9, diode.Is, vt, 1.0, 1.0, fs=fs), vins)
    rec["analytic_msps"] = B * T / dt / 1e6
    results[str(B)] = rec
    print(B, rec, flush=True)
    json.dump(results, open("BATCH_SCALING.json", "w"), indent=2)
print("done", flush=True)
