"""Checkpoint / resume: params + optimizer state + step.

The reference only exports final weights to JSON (``model_utils.py:82-85``)
and warm-starts circuit training from pretrained JSONs
(``clipper_pot.py:132-137``) — no optimizer state, no mid-run resume.  Here a
checkpoint carries the full training state so any run resumes exactly:
params, optax state, step counter, and RNG key, serialized as a single .npz
(flattened pytree leaves) + a JSON treedef manifest.  The reference's JSON
schema remains the *interchange/export* format (see nn.serialization); this
is the training-infra format.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten_with_paths(tree):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(
    path: str,
    params,
    opt_state=None,
    step: int = 0,
    extra: Optional[Dict[str, Any]] = None,
):
    """Write a checkpoint.  path is a directory; atomic via tmp+rename.

    meta.json is the commit marker: it is written (tmp+rename) only after
    arrays.npz is in place, and ``latest_checkpoint`` ignores directories
    without it — a crash mid-save can never brick a resume.
    """
    os.makedirs(path, exist_ok=True)
    tmp = path + ".tmp.npz"
    arrays = {}
    for name, tree in (("params", params), ("opt_state", opt_state)):
        if tree is None:
            continue
        for k, v in _flatten_with_paths(tree).items():
            arrays[f"{name}|{k}"] = v
    np.savez(tmp, **arrays)
    final_npz = os.path.join(path, "arrays.npz")
    # Overwriting an existing committed checkpoint: retract the commit marker
    # FIRST so a crash between the arrays replace and the meta replace leaves
    # the directory uncommitted (stale meta must never describe new arrays).
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(final_npz) and os.path.exists(meta_path):
        os.unlink(meta_path)
    os.replace(tmp, final_npz)
    meta = {"step": int(step), "extra": extra or {}}
    tmp_meta = path + ".tmp.meta.json"
    with open(tmp_meta, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_meta, os.path.join(path, "meta.json"))


def restore_checkpoint(path: str, params_template, opt_state_template=None):
    """Restore into the given pytree templates (structure must match).

    Returns (params, opt_state, step, extra); opt_state is None if no
    template given or none saved.
    """
    data = np.load(os.path.join(path, "arrays.npz"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)

    def refill(template, prefix):
        # rebuild in treedef order
        leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
        ordered = []
        for path_, _ in leaves_paths:
            key = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path_
            )
            ordered.append(jax.numpy.asarray(data[f"{prefix}|{key}"]))
        return jax.tree_util.tree_unflatten(treedef, ordered)

    params = refill(params_template, "params")
    opt_state = (
        refill(opt_state_template, "opt_state")
        if opt_state_template is not None
        and any(k.startswith("opt_state|") for k in data.files)
        else None
    )
    return params, opt_state, meta["step"], meta["extra"]


def latest_checkpoint(base_dir: str) -> Optional[str]:
    """Find the highest-step checkpoint under base_dir (dirs named step_N)."""
    if not os.path.isdir(base_dir):
        return None
    steps = []
    for d in os.listdir(base_dir):
        full = os.path.join(base_dir, d)
        # meta.json is the commit marker (see save_checkpoint): a directory
        # without it is an interrupted save, not a restorable checkpoint
        if (
            d.startswith("step_")
            and os.path.isdir(full)
            and os.path.exists(os.path.join(full, "meta.json"))
        ):
            try:
                steps.append((int(d.split("_")[1]), d))
            except ValueError:
                pass
    if not steps:
        return None
    return os.path.join(base_dir, max(steps)[1])
