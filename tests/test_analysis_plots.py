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


def test_cli_plot_transconductance(tmp_path, capsys):
    """CLI parity with the reference's plot_transconductance.py script."""
    import json as _json

    from diffwdf_tpu.cli import main

    mj = "models/pretrained/1N4148 (1U-1D)_2x16_pretrained_model.json"
    if not os.path.exists(mj):
        pytest.skip("zoo absent")
    out = str(tmp_path / "tc.png")
    main(["plot", "transconductance", "--model-json", mj, "--out", out])
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(out) and rec["plot"] == "transconductance"


def test_zoo_physics_consistency_at_serving_impedance():
    """Our retrained zoo must stay physically consistent in the clipper's
    serving impedance regime (port R ~ 10-47 kOhm).  NOTE: the tuned
    pretraining recipe beats the reference on grid MSE but is *less*
    Shockley-consistent at low R (r <= 1 kOhm) — this guard pins the regime
    the circuits actually run in."""
    from diffwdf_tpu.analysis import transconductance_error
    from diffwdf_tpu.nn.serialization import load_model_json
    from diffwdf_tpu.roots.diode import diode_1n4148_1u1d

    mj = "models/pretrained/1N4148 (1U-1D)_2x16_pretrained_model.json"
    if not os.path.exists(mj):
        pytest.skip("zoo absent")
    mlp, acts, _ = load_model_json(mj)
    for r in (10e3, 47e3):
        err = transconductance_error(mlp, acts, diode_1n4148_1u1d, r=r)
        assert err < 1.0, (r, err)
