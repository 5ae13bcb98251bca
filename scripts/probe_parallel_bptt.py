"""Attribute the generic fused training step's cost on the TPU chip.

Round-3 VERDICT weak #2: the generic engine's 39 ms step (TS neural 2x16,
B=1024, T=2048) had no committed profile.  This probe times the full train
step under BOTH backwards (round-3 "xla": S+1 linearize pulls + associative
scan; round-4 "pallas": one fused adjoint kernel) and each component in
isolation, with the pipelined-dispatch timing the tunnel requires
(``bench._timeit``).  Results -> runs/probes/parallel_bptt_profile.json.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_parallel_bptt.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import jax.random as jr

    import bench
    from diffwdf_tpu.models.tube_screamer import make_tube_screamer
    from diffwdf_tpu.ops.fused_circuit import fused_circuit_process_neural
    from diffwdf_tpu.ops.parallel_bptt import (
        _affine_reverse_scan,
        _batched_step,
        _fused_backward_kernel,
        make_fused_circuit_train_generic,
    )
    from diffwdf_tpu.roots.neural import NeuralDiodeRoot
    from diffwdf_tpu.training.circuit_train import (
        CircuitTrainConfig,
        make_train_step,
    )

    B, T = 1024, 2048
    fs = 48000.0
    root = NeuralDiodeRoot(name="dp", n_layers=2, layer_size=16)
    ts = make_tube_screamer(root, fs, drive=0.5)
    params = {**ts.init_params(), **root.init_params(jr.PRNGKey(1))}
    key = jr.PRNGKey(0)
    batch = {
        "x": jr.normal(key, (B, T), jnp.float32),
        "y": jr.normal(jr.fold_in(key, 9), (B, T), jnp.float32),
    }
    res = {"config": {"B": B, "T": T, "fs": fs,
                      "backend": str(jax.devices())}}

    def log(k, dt):
        res[k] = {"ms": dt * 1e3,
                  "msamples_per_s": B * T / dt / 1e6}
        print(f"# {k}: {dt * 1e3:.2f} ms "
              f"({B * T / dt / 1e6:.1f} Msamples/s)", file=sys.stderr,
              flush=True)
        with open("runs/probes/parallel_bptt_profile.json", "w") as f:
            json.dump(res, f, indent=2)

    # --- full train steps: scan baseline, xla backward, pallas backward ---
    import functools

    _, step_scan, _ = make_train_step(ts, CircuitTrainConfig(unroll=4))
    _, step_xla, _ = make_train_step(
        ts, CircuitTrainConfig(engine="fused_generic",
                               engine_backward="xla"))
    _, step_pl, _ = make_train_step(
        ts, CircuitTrainConfig(engine="fused_generic"))
    import optax

    opt_state = optax.adam(1e-4).init(params)

    small = {k: v[:128] for k, v in batch.items()}
    dt = bench._timeit(
        lambda b: step_scan(params, opt_state, b)[2]["loss"], [small], n=10)
    res["scan_step_B128"] = {"ms": dt * 1e3,
                             "msamples_per_s": 128 * T / dt / 1e6}
    print(f"# scan_step_B128: {dt * 1e3:.2f} ms", file=sys.stderr, flush=True)

    dt = bench._timeit(
        lambda b: step_xla(params, opt_state, b)[2]["loss"], [batch], n=10)
    log("step_backward_xla", dt)
    dt = bench._timeit(
        lambda b: step_pl(params, opt_state, b)[2]["loss"], [batch], n=10)
    log("step_backward_pallas", dt)

    # --- components ------------------------------------------------------
    tree_params = {k: v for k, v in params.items() if k != "dp"}
    state0 = jax.tree_util.tree_map(
        lambda z: jnp.zeros((B,), jnp.float32), ts.init_state())
    S = len(jax.tree_util.tree_leaves(state0))

    fwd_noseq = jax.jit(lambda v: fused_circuit_process_neural(
        ts, tree_params, params["dp"], v, state0, input_node="Vin")[0])
    dt = bench._timeit(fwd_noseq, [batch["x"]], n=20)
    log("fwd_kernel_noseq", dt)

    fwd_seq = jax.jit(lambda v: fused_circuit_process_neural(
        ts, tree_params, params["dp"], v, state0, input_node="Vin",
        return_state_seq=True, seq_packed=True)[2])
    dt = bench._timeit(fwd_seq, [batch["x"]], n=20)
    log("fwd_kernel_with_seq", dt)

    # prepared packed inputs for the backward pieces
    from diffwdf_tpu.ops.deer_circuit import _mlp_root_smem
    from diffwdf_tpu.ops.fused_clipper import _pack, auto_lanes

    lanes = auto_lanes(B, T, 128)
    seqs = jax.tree_util.tree_map(jnp.asarray, fwd_seq(batch["x"]))
    vin_p = _pack(batch["x"], lanes)
    g_out_p = _pack(batch["y"], lanes)
    lam_T_p = jnp.concatenate(
        [_pack(jnp.ones((B, 1), jnp.float32), lanes) for _ in range(S)],
        axis=1)
    coeffs = ts.adapt(params, {})
    log_r = jnp.log(coeffs[ts.tree.name]["R"])
    layers = params["dp"]["layers"]
    W1, b1 = layers[0]["kernel"], layers[0]["bias"]
    W3, b3 = layers[-1]["kernel"], layers[-1]["bias"]
    ras = (
        W1[0:1, :], (W1[1] * log_r + b1)[None, :],
        jnp.stack([l["kernel"].reshape(-1) for l in layers[1:-1]]),
        jnp.stack([l["bias"] for l in layers[1:-1]]),
        W3[:, 0][None, :], b3.reshape(1, 1),
    )

    def bwd(args):
        v, go = args
        return _fused_backward_kernel(
            ts, tree_params, v, go, tuple(seqs), lam_T_p,
            input_node="Vin", static_controls=None, time_chunk=128,
            lanes=lanes, interpret=False, root_override=_mlp_root_smem,
            root_arrays=ras, root_kinds=("smem",) * len(ras), n_state=S)[1]

    dt = bench._timeit(bwd, [(vin_p, g_out_p)], n=20)
    log("bwd_adjoint_kernel", dt)

    # grad(inner): the parameter-cotangent reverse pass (packed layout)
    lam_step = list(seqs)  # stand-in with the right shape/layout

    @jax.jit
    def ginner(v):
        def inner(p):
            c = ts.adapt(p, {})
            st = _batched_step(ts, c, p, None, "Vin")
            z_new, o = st(list(seqs), v)
            acc = jnp.sum(o * g_out_p)
            for k in range(S):
                acc = acc + jnp.sum(z_new[k] * lam_step[k])
            return acc

        return jax.grad(inner)(params)

    dt = bench._timeit(ginner, [vin_p], n=20)
    log("grad_inner_params", dt)

    # old-backward pieces: S+1 linearize pulls, then the associative scan
    zp_flat = [jnp.zeros((B, T), jnp.float32) for _ in range(S)]

    @jax.jit
    def lin_pulls(v):
        c = ts.adapt(params, {})
        st = _batched_step(ts, c, params, None, "Vin")
        _, lin = jax.linearize(st, zp_flat, v)
        outs = []
        for k in range(S):
            dz, do = lin(
                [jnp.full_like(zp_flat[0], 1.0 if i == k else 0.0)
                 for i in range(S)], jnp.zeros_like(v))
            outs.append((dz, do))
        return outs

    dt = bench._timeit(lin_pulls, [batch["x"]], n=20)
    log("xla_linearize_pulls", dt)

    M = tuple(tuple(jnp.full((B, T), 0.1, jnp.float32) for _ in range(S))
              for _ in range(S))
    bvec = tuple(jnp.full((B, T), 0.1, jnp.float32) for _ in range(S))
    lamT = [jnp.ones((B,), jnp.float32) for _ in range(S)]

    @jax.jit
    def rev_scan(m0):
        MM = ((m0,) + M[0][1:],) + M[1:]
        return _affine_reverse_scan(MM, bvec, lamT, S)

    dt = bench._timeit(rev_scan, [M[0][0]], n=20)
    log("xla_affine_reverse_scan", dt)

    print(json.dumps({
        "out": "runs/probes/parallel_bptt_profile.json",
        "xla_ms": res["step_backward_xla"]["ms"],
        "pallas_ms": res["step_backward_pallas"]["ms"],
        "speedup": res["step_backward_xla"]["ms"]
        / res["step_backward_pallas"]["ms"],
    }))


if __name__ == "__main__":
    os.makedirs("runs/probes", exist_ok=True)
    main()
