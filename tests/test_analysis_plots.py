"""Analysis plotting smoke tests (Agg backend, file outputs)."""

import os

import jax
import numpy as np

from diffwdf_tpu.analysis import (
    plot_history,
    plot_target_pred,
    plot_transconductance,
)
from diffwdf_tpu.roots.diode import diode_1n4148_1u1d
from diffwdf_tpu.roots.neural import mlp_arch, mlp_init


def test_plot_outputs(tmp_path):
    hist = {"loss": list(np.geomspace(1, 1e-3, 50)),
            "val_loss": list(np.geomspace(2, 2e-3, 50))}
    p1 = str(tmp_path / "hist.png")
    plot_history(hist, p1)

    sizes, acts = mlp_arch(2, 16)
    mlp = mlp_init(jax.random.PRNGKey(0), sizes)
    p2 = str(tmp_path / "trans.png")
    plot_transconductance(mlp, acts, diode_1n4148_1u1d, p2)

    t = np.sin(np.linspace(0, 20, 500))
    p3 = str(tmp_path / "tp.png")
    plot_target_pred(t, t * 0.9, p3, "test")

    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000
