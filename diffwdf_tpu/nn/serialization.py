"""JSON weight interchange, schema-compatible with the reference model zoo.

The reference's cross-stack contract is a JSON file of dense layers
(produced by ``wdf_py/lib/model_utils.py:17-85`` and
``clipper_pot.py:298-331``, consumed by ``layers.py:45-70`` in Python and by
RTNeural ``parseJson`` in C++):

    {"in_shape": [null, 2],
     "layers": [{"type": "dense", "shape": [null, H],
                 "activation": "tanh"|"relu"|"", "weights": [kernel, bias]},
                ...]}

kernel is nested [in][out]; bias is [out].  Keras-exported files may carry a
leading non-dense entry (the InputLayer, tagged "unknown" with empty weights)
— skipped on load, exactly as the reference's DenseRootModel does.

We keep this schema verbatim so (a) the reference's ~60 checked-in model files
load as golden test vectors and warm starts, and (b) models trained here can
be deployed to the reference's C++ plugin unchanged.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..roots.neural import MLPParams


def load_model_json(path_or_dict) -> Tuple[MLPParams, Tuple[str, ...], int]:
    """Load a reference-schema model file.

    Returns (mlp_params, activations, d_in).
    """
    if isinstance(path_or_dict, (str,)) or hasattr(path_or_dict, "read_text"):
        with open(path_or_dict, "r") as f:
            d = json.load(f)
    else:
        d = path_or_dict

    # legacy exporter variants in the reference zoo: in_shape may be a bare
    # int (models/old/clipper.json) or nested one deeper ([[None, 2]],
    # models/1N4148_clipper_pot.json)
    d_in = d["in_shape"]
    while isinstance(d_in, (list, tuple)):
        d_in = d_in[-1]
    layers: List[Dict[str, Any]] = []
    activations: List[str] = []
    for l in d["layers"]:
        if l.get("type") != "dense":
            continue  # InputLayer/unknown entries (keras exports)
        kernel = np.asarray(l["weights"][0], dtype=np.float32)
        bias = np.asarray(l["weights"][1], dtype=np.float32)
        if kernel.ndim == 3:  # some exports carry a leading singleton dim
            kernel = kernel[0]
        if bias.ndim == 2:
            bias = bias[0]
        layers.append({"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)})
        activations.append(l.get("activation", "") or "")
    return {"layers": layers}, tuple(activations), int(d_in)


def save_model_json(
    mlp_params: MLPParams,
    activations: Sequence[str],
    path=None,
    d_in: int = 2,
) -> Dict[str, Any]:
    """Serialize to the reference schema.  Writes to ``path`` if given;
    returns the dict either way."""
    layers = []
    for layer, act in zip(mlp_params["layers"], activations):
        kernel = np.asarray(layer["kernel"], dtype=np.float64)
        bias = np.asarray(layer["bias"], dtype=np.float64)
        layers.append(
            {
                "type": "dense",
                "shape": [None, int(bias.shape[-1])],
                "activation": act if act in ("tanh", "relu", "sigmoid", "softmax") else "",
                "weights": [kernel.tolist(), bias.tolist()],
            }
        )
    out = {"in_shape": [None, int(d_in)], "layers": layers}
    if path is not None:
        with open(path, "w") as f:
            json.dump(out, f, indent=4)
    return out


#: layer-kind tags of the reference exporter (``model_utils.py:18-55``) — the
#: schema also carries recurrent/conv layers even though the WDF zoo is all
#: dense; kept for full interchange parity.
LAYER_TYPES = ("dense", "gru", "lstm", "conv1d", "time-distributed-dense")
ACTIVATIONS = ("tanh", "relu", "sigmoid", "softmax")


def save_layers_json(
    layer_specs: Sequence[Dict[str, Any]],
    path=None,
    in_shape: Sequence = (None, 2),
) -> Dict[str, Any]:
    """Generic exporter for the reference schema, covering the full tag set
    (``model_utils.py:17-79``): each spec is
    ``{"type", "activation", "shape", "weights", ["kernel_size","dilation"]}``
    with weights as arrays.  Unknown types are tagged "unknown" (the loader
    skips them, as the reference's DenseRootModel does)."""
    layers = []
    for spec in layer_specs:
        kind = spec.get("type", "unknown")
        entry = {
            "type": kind if kind in LAYER_TYPES else "unknown",
            "activation": (
                spec.get("activation", "")
                if spec.get("activation", "") in ACTIVATIONS
                else ""
            ),
            "shape": list(spec.get("shape", [])),
            "weights": [np.asarray(w, np.float64).tolist()
                        for w in spec.get("weights", [])],
        }
        if entry["type"] == "conv1d":
            entry["kernel_size"] = [int(k) for k in np.atleast_1d(spec["kernel_size"])]
            entry["dilation"] = [int(d) for d in np.atleast_1d(spec.get("dilation", 1))]
        layers.append(entry)
    out = {"in_shape": list(in_shape), "layers": layers}
    if path is not None:
        with open(path, "w") as f:
            json.dump(out, f, indent=4)
    return out
