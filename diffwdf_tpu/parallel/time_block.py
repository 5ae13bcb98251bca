"""Time-block sharding: long-signal WDF processing across devices.

The WDF sample recursion is strictly sequential, but its state (one capacitor
``z`` per reactive element) is exponentially forgetting — the reference itself
exploits this by resetting state at 2048-sample chunk boundaries and skipping
the first 50 samples in the loss (``clipper_pot.py:110,232``).  We turn that
observation into a parallel decode scheme (BASELINE.json config 5):

- **overlap-save (parallel)**: split the signal into D contiguous blocks, one
  per device on the mesh "time" axis.  Each device prepends the last W
  samples of its left neighbor's block (fetched with one
  ``lax.ppermute``), scans W + T/D samples from zero state, and discards the
  W warm-up outputs.  Fully parallel; error decays like the circuit's state
  memory, exp(-W * 2*pi*fc / fs) for an RC corner at fc, so W is chosen from
  an error budget (see :func:`warmup_for_tolerance`).

- **exact (sequential handoff)**: the mathematically exact chain — device d
  starts from device d-1's final state, passed with ``ppermute``; D rounds,
  no speedup, used to validate the overlap mode's error bound.

Both are built on ``shard_map`` over a ``Mesh`` and work with any `Circuit`.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.circuit import Circuit, _collect_impedance_controls

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map_fn

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_fn(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def warmup_for_tolerance(fc_hz: float, fs: float, tol: float = 1e-6) -> int:
    """Samples of warm-up needed for the state error to decay below ``tol``
    for a circuit whose slowest pole sits at fc_hz."""
    rate = 2.0 * math.pi * fc_hz / fs  # per-sample decay exponent
    return max(1, int(math.ceil(-math.log(tol) / rate)))


def time_block_process(
    circuit: Circuit,
    params,
    inputs: Dict[str, Dict[str, jnp.ndarray]],
    mesh: Mesh,
    *,
    warmup: int = 256,
    axis: str = "time",
):
    """Overlap-save parallel processing of a long signal.

    inputs: {node: {field: array[T]}} with T divisible by the mesh's time
    axis.  Returns outputs[T].  Device 0's warm-up prefix is silence (zero
    drive), matching the reference's cold-start-and-skip convention — but
    only *signal* fields are zeroed: impedance-control streams (a pot "R")
    must stay at valid values through the warm-up, else per-sample
    re-adaptation divides by zero (G = 1/R) and the NaN contaminates the
    carried state far past the discarded prefix.
    """
    D = mesh.shape[axis]
    state0 = circuit.init_state()

    # fields that are impedance controls of their tree node keep their
    # (wrapped-tail) values on device 0; everything else is a drive signal
    # and gets the cold-start zero prefix
    imp_raw: Dict[str, tuple] = {}
    _collect_impedance_controls(circuit.tree, imp_raw)
    imp_fields = {k: frozenset(v) for k, v in imp_raw.items()}

    def run(blk):  # blk: {node: {field: [T/D]}} local shard
        st0 = jax.tree_util.tree_map(
            lambda x: jax.lax.pcast(x, (axis,), to="varying"), state0
        )

        def tail(x):
            return x[-warmup:]

        prev_tail = jax.tree_util.tree_map(
            lambda x: jax.lax.ppermute(
                tail(x), axis, [(i, (i + 1) % D) for i in range(D)]
            ),
            blk,
        )
        idx = jax.lax.axis_index(axis)
        gate = jnp.where(idx == 0, 0.0, 1.0)
        ext = {
            node: {
                f: jnp.concatenate(
                    [
                        prev_tail[node][f]
                        if f in imp_fields.get(node, frozenset())
                        else gate * prev_tail[node][f],
                        x,
                    ]
                )
                for f, x in fields.items()
            }
            for node, fields in blk.items()
        }
        out, _ = circuit.process(params, st0, ext)
        return out[warmup:]

    spec = jax.tree_util.tree_map(lambda _: P(axis), inputs)
    fn = shard_map(run, mesh, in_specs=(spec,), out_specs=P(axis))
    return fn(inputs)


def time_block_process_exact(
    circuit: Circuit,
    params,
    inputs: Dict[str, Dict[str, jnp.ndarray]],
    mesh: Mesh,
    *,
    axis: str = "time",
):
    """Exact sequential-handoff processing (validation reference).

    Every device scans its block D times in a round-robin; round d uses the
    true carried state once it has arrived from the left neighbor.  Exact but
    offers no speedup — it exists to measure the overlap mode's error.
    """
    D = mesh.shape[axis]
    state0 = circuit.init_state()

    def run(blk):
        idx = jax.lax.axis_index(axis)
        st0 = jax.tree_util.tree_map(
            lambda x: jax.lax.pcast(x, (axis,), to="varying"), state0
        )

        def round_fn(d, state_in):
            # device d's state_out is true at round d (its init state is);
            # hand every final state right, and only device d+1 adopts it
            _, state_out = circuit.process(params, state_in, blk)
            handed = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(
                    x, axis, [(i, (i + 1) % D) for i in range(D)]
                ),
                state_out,
            )
            return jax.tree_util.tree_map(
                lambda h, s: jnp.where(idx == d + 1, h, s), handed, state_in
            )

        # propagate states: after round d, device d+1 has its true init state
        state = jax.lax.fori_loop(0, D - 1, round_fn, st0)
        out, _ = circuit.process(params, state, blk)
        return out

    spec = jax.tree_util.tree_map(lambda _: P(axis), inputs)
    fn = shard_map(run, mesh, in_specs=(spec,), out_specs=P(axis))
    return fn(inputs)
