"""Reproduce the reference's pretraining MSE/ESR ladder (BASELINE.md) on TPU.

Runs every architecture/diode combination the reference records results for
(``diode_pretraining.py:189-201``), with the reference hyperparameters
(20x1000 grid, Adam 2e-5, 2000 epochs, batch 32, orthogonal init), and writes
PRETRAIN_RESULTS.json + the trained model JSONs under models/pretrained/.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffwdf_tpu.nn.serialization import save_model_json
from diffwdf_tpu.roots.diode import ALL_1N4148, diode_1n4148_1u1d
from diffwdf_tpu.training.pretrain import (
    PretrainConfig,
    evaluate_pretrained,
    pretrain_diode,
)

# reference results table (diode_pretraining.py:189-201): (diode, layers, width)
LADDER = [
    ("1N4148 (1U-1D)", 2, 4, {"mse": 1.34e-3, "esr": 1.23e-3}),
    ("1N4148 (1U-1D)", 2, 8, {"mse": 5.51e-5, "esr": 2.49e-4}),
    ("1N4148 (1U-1D)", 2, 16, {"mse": 7.98e-6, "esr": 9.49e-5}),
    ("1N4148 (1U-1D)", 4, 4, {"mse": 6.38e-4, "esr": 8.48e-4}),
    ("1N4148 (1U-1D)", 4, 8, {"mse": 4.43e-5, "esr": 2.24e-4}),
    ("1N4148 (3U-3D)", 2, 16, {"mse": 6.14e-5, "esr": 2.46e-4}),
    ("1N4148 (2U-3D)", 2, 16, {"mse": 7.65e-6, "esr": 9.29e-5}),
    ("1N4148 (2U-2D)", 2, 16, {"mse": 1.79e-5, "esr": 1.53e-4}),
    ("1N4148 (1U-3D)", 2, 16, {"mse": 1.15e-5, "esr": 1.10e-4}),
    ("1N4148 (1U-2D)", 2, 16, {"mse": 1.87e-5, "esr": 1.51e-4}),
]


def main():
    epochs = int(os.environ.get("LADDER_EPOCHS", "2000"))
    out_dir = "models/pretrained"
    os.makedirs(out_dir, exist_ok=True)
    results = []
    for diode_name, layers, width, ref in LADDER:
        diode = ALL_1N4148[diode_name]
        cfg = PretrainConfig(
            n_layers=layers, layer_size=width, epochs=epochs, seed=0
        )
        t0 = time.time()
        params, acts, metrics = pretrain_diode(diode, cfg)
        dt = time.time() - t0
        final = evaluate_pretrained(params, acts, diode, cfg)
        rec = {
            "diode": diode_name,
            "arch": f"{layers}x{width}",
            "epochs": epochs,
            "train_seconds": round(dt, 1),
            "mse": final["mse"],
            "esr": final["esr"],
            "ref_mse": ref["mse"],
            "ref_esr": ref["esr"],
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
        name = f"{diode_name}_{layers}x{width}_pretrained_model.json"
        save_model_json(params, acts, os.path.join(out_dir, name))
        with open("PRETRAIN_RESULTS.json", "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
