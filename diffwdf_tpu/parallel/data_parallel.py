"""Data-parallel training over the mesh "data" axis.

The reference trains single-device (SURVEY.md §2.4); here the [n_seq, T]
sequence batch is sharded over devices and the gradient all-reduce is inserted
by XLA from the shardings alone — no explicit collectives in user code.
Works for both the pretraining regression and circuit-in-the-loop training.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.circuit import Circuit
from ..training.circuit_train import CircuitTrainConfig, make_train_step
from .mesh import replicate_params, shard_batches


def make_dp_train_step(
    circuit: Circuit,
    cfg: CircuitTrainConfig,
    mesh: Mesh,
    trainable_filter: Optional[Callable] = None,
):
    """Data-parallel version of training.circuit_train.make_train_step.

    The returned step expects batches sharded over the "data" axis and
    replicated params/opt state; out-shardings keep them replicated so the
    gradient psum happens inside the compiled step.
    """
    opt, train_step, eval_step = make_train_step(circuit, cfg, trainable_filter)

    repl = NamedSharding(mesh, P())

    dp_train = jax.jit(train_step, out_shardings=(repl, repl, repl))
    dp_eval = jax.jit(eval_step, out_shardings=repl)

    def prepare(params, opt_state, batches):
        return (
            replicate_params(params, mesh),
            replicate_params(opt_state, mesh),
            shard_batches(batches, mesh),
        )

    return opt, dp_train, dp_eval, prepare


def train_clipper_dp(
    circuit: Circuit,
    params,
    train_batches,
    mesh: Mesh,
    val_batches=None,
    cfg: CircuitTrainConfig = CircuitTrainConfig(),
    trainable_filter: Optional[Callable] = None,
):
    """Data-parallel twin of training.circuit_train.train_clipper."""
    opt, dp_train, dp_eval, prepare = make_dp_train_step(
        circuit, cfg, mesh, trainable_filter
    )
    opt_state = opt.init(params)
    params, opt_state, train_batches = prepare(params, opt_state, train_batches)
    if val_batches is not None:
        val_batches = shard_batches(val_batches, mesh)
    history = {k: [] for k in ("loss", "mse", "esr", "val_loss", "val_mse", "val_esr")}
    for _ in range(cfg.epochs):
        params, opt_state, m = dp_train(params, opt_state, train_batches)
        for k in ("loss", "mse", "esr"):
            history[k].append(float(m[k]))
        if val_batches is not None:
            vm = dp_eval(params, val_batches)
            for k in ("loss", "mse", "esr"):
                history["val_" + k].append(float(vm[k]))
    return params, history
