"""Device-mesh helpers.

The reference is entirely single-process (SURVEY.md §2.4); all scaling here is
new capability, built the JAX way: one ``Mesh`` + ``NamedSharding`` and XLA
inserts the collectives.  Axes used by the framework:

- "data":  independent sequences / circuit instances (DP; gradient psum)
- "time":  time-block sharding of long signals (state handoff via ppermute)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "time"),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the "data" axis, "time" trivial.  Pass shape to
    split, e.g. make_mesh((4, 2)) for 4-way DP x 2-way time-block.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int = 2, axis: str = "data") -> NamedSharding:
    """Shard the leading axis over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *(None,) * (ndim - 1)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batches(batches, mesh: Mesh, axis: str = "data"):
    """Place a {name: array[n_seq, ...]} batch pytree with the sequence axis
    sharded over ``axis`` and everything else replicated."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim, axis)), batches
    )


def replicate_params(params, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), params
    )
