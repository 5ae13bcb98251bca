"""Circuit-train the Tube Screamer's "1N4148 2x16" neural root IN-TOPOLOGY.

The reference's Tube Screamer offers an approx-analytic root and a 2x16
neural root (``TubeScreamer.h:73-74``); its shipped net was trained in the
LPF clipper and dropped into the TS.  Here the net is fine-tuned inside the
TS circuit itself (R-type op-amp stage, 3 reactive states) on synthesized
measurements — the workload the generic differentiable fused engine
(``ops/parallel_bptt``, engine="fused_generic") exists for: gradients
through the full 3-state recursion with a parallel (log-depth) backward.

Writes runs/ts_2x16/1N4148_1U1D_2x16_ts_trained.json + metrics/plots.
"""
import argparse, json, os, sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--epochs", type=int, default=501)
ap.add_argument("--duration", type=float, default=16.0, help="train seconds")
ap.add_argument("--val-duration", type=float, default=4.0)
ap.add_argument("--drive", type=float, default=0.5)
ap.add_argument("--platform", choices=("tpu", "cpu"))
ap.add_argument("--engine", default="fused_generic",
                choices=("scan", "fused_generic"))
ap.add_argument("--batch-size", type=int, default=2048)
ap.add_argument("--out", default="runs/ts_2x16", help="output dir")
cli = ap.parse_args()

import jax

if cli.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from diffwdf_tpu.analysis import plot_history
from diffwdf_tpu.data.synthetic import synth_ts_measurement
from diffwdf_tpu.models.tube_screamer import make_tube_screamer
from diffwdf_tpu.nn.serialization import load_model_json, save_model_json
from diffwdf_tpu.roots.diode import diode_1n4148_1u1d
from diffwdf_tpu.roots.neural import NeuralDiodeRoot
from diffwdf_tpu.training.circuit_train import (
    CircuitTrainConfig,
    make_clipper_batches,
    train_clipper,
)

FS = 48000.0
OUT_DIR = cli.out
os.makedirs(OUT_DIR, exist_ok=True)

diode = diode_1n4148_1u1d
vin_tr, vout_tr = synth_ts_measurement(
    diode, cli.drive, FS, duration_s=cli.duration, seed=0)
vin_va, vout_va = synth_ts_measurement(
    diode, cli.drive, FS, duration_s=cli.val_duration, seed=7)

mlp, acts, _ = load_model_json(
    "models/pretrained/1N4148 (1U-1D)_2x16_pretrained_model.json")
root, frag = NeuralDiodeRoot.from_mlp("dp", mlp, acts)
circuit = make_tube_screamer(root, FS, drive=cli.drive)
params = {**circuit.init_params(), **frag}

cfg = CircuitTrainConfig(epochs=cli.epochs, batch_size=cli.batch_size,
                         learning_rate=1e-4, engine=cli.engine)
tb = make_clipper_batches({"x": vin_tr, "y": vout_tr}, cfg.batch_size)
vb = make_clipper_batches({"x": vin_va, "y": vout_va}, cfg.batch_size)
print(f"train {tb['x'].size} samples in {tb['x'].shape[0]} chunks "
      f"(engine={cli.engine})", flush=True)


def only_root(grads):
    z = jax.tree_util.tree_map(jnp.zeros_like, grads)
    z["dp"] = grads["dp"]
    return z


hist_path = os.path.join(OUT_DIR, "metrics.jsonl")
open(hist_path, "w").close()


def on_epoch(epoch, p, hist):
    rec = {"epoch": epoch, **{k: v[-1] for k, v in hist.items() if v}}
    with open(hist_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[step {epoch}] " + " ".join(
        f"{k}={v:.6g}" for k, v in rec.items() if k != "epoch"), flush=True)


params, hist = train_clipper(circuit, params, tb, vb, cfg,
                             trainable_filter=only_root, on_epoch=on_epoch)
out_json = os.path.join(OUT_DIR, "1N4148_1U1D_2x16_ts_trained.json")
save_model_json(params["dp"], root.activations, out_json)
print(f"saved {out_json}; final loss {hist['loss'][-1]:.6g} "
      f"val_esr {hist['val_esr'][-1]:.6g}", flush=True)
plot_history(hist, os.path.join(OUT_DIR, "ts_history.png"))
