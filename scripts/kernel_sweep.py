"""Sweep fused-kernel tile parameters (time_chunk x lanes) on the real chip
and report the best configs; writes KERNEL_SWEEP.json."""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import jax.random as jr

import diffwdf_tpu as dwdf
from diffwdf_tpu.models.tube_screamer import make_tube_screamer
from diffwdf_tpu.ops.fused_circuit import fused_circuit_process
from diffwdf_tpu.ops.fused_clipper import (
    fused_clipper_analytic,
    fused_clipper_neural,
)
from diffwdf_tpu.roots.neural import NeuralDiodeRoot

fs = 96000.0
B, T = 8192, 2048
diode = dwdf.diode_1n4148_1u1d
vt = diode.Vt * diode.nabla
key = jr.PRNGKey(0)
vins = [jr.normal(jr.fold_in(key, i), (B, T), jnp.float32) * 2 for i in range(4)]
z0 = jnp.zeros((B,), jnp.float32)
nroot = NeuralDiodeRoot(name="dp", n_layers=2, layer_size=16)
nparams = nroot.init_params(jr.PRNGKey(0))["dp"]

ts_root = dwdf.DiodePairRoot(name="dp", diode=diode, quality="best")
ts = make_tube_screamer(ts_root, fs, drive=0.5)
ts_params = {**ts.init_params(), **ts_root.init_params()}
ts_state0 = jax.tree_util.tree_map(
    lambda z: jnp.zeros((B,), jnp.float32), ts.init_state()
)


def timeit(fn, n=10):
    out = fn(vins[0])
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for i in range(n):
        out = fn(vins[i % len(vins)])
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.time() - t0) / n


results = {}
for tc in (64, 128, 256, 512):
    for lanes in (256, 512, 1024):
        if B % (8 * lanes) or T % tc:
            continue
        cfg = f"tc{tc}_l{lanes}"
        try:
            dt = timeit(lambda v: fused_clipper_neural(
                v, z0, nparams, 47e3, 2.2e-9, fs=fs, time_chunk=tc, lanes=lanes))
            results.setdefault("neural", {})[cfg] = B * T / dt / 1e6
        except Exception as e:
            results.setdefault("neural", {})[cfg] = f"ERR {type(e).__name__}"
        try:
            dt = timeit(lambda v: fused_clipper_analytic(
                v, z0, 47e3, 2.2e-9, diode.Is, vt, 1.0, 1.0, fs=fs,
                time_chunk=tc, lanes=lanes))
            results.setdefault("analytic", {})[cfg] = B * T / dt / 1e6
        except Exception as e:
            results.setdefault("analytic", {})[cfg] = f"ERR {type(e).__name__}"
        try:
            dt = timeit(lambda v: fused_circuit_process(
                ts, ts_params, v, ts_state0, time_chunk=tc, lanes=lanes))
            results.setdefault("tube_screamer", {})[cfg] = B * T / dt / 1e6
        except Exception as e:
            results.setdefault("tube_screamer", {})[cfg] = f"ERR {type(e).__name__}"
        print(cfg, {k: results[k].get(cfg) for k in results}, flush=True)
        json.dump(results, open("KERNEL_SWEEP.json", "w"), indent=2)

# XLA scan-path unroll sweep (the non-Pallas engine)
from diffwdf_tpu.models.diode_clipper import make_diode_clipper

nroot_full = NeuralDiodeRoot(name="dp", n_layers=2, layer_size=16)
ckt_n = make_diode_clipper(nroot_full, fs, r_source=47e3, cap=2.2e-9)
pn = {**ckt_n.init_params(), "dp": nparams}
st0 = ckt_n.init_state()
for unroll in (1, 2, 4, 8, 16):
    f = jax.jit(lambda v, u=unroll: jax.vmap(
        lambda vv: ckt_n.process(pn, st0, {"Vs": {"v": vv}}, unroll=u)[0])(v))
    try:
        dt = timeit(f)
        results.setdefault("xla_neural_unroll", {})[str(unroll)] = B * T / dt / 1e6
    except Exception as e:
        results.setdefault("xla_neural_unroll", {})[str(unroll)] = f"ERR {type(e).__name__}"
    print("unroll", unroll, results["xla_neural_unroll"][str(unroll)], flush=True)
    json.dump(results, open("KERNEL_SWEEP.json", "w"), indent=2)

for k, v in results.items():
    best = max((x for x in v.items() if isinstance(x[1], float)),
               key=lambda x: x[1], default=None)
    print("BEST", k, best, flush=True)
