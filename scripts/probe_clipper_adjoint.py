"""Chip A/B for the clipper training engine's adjoint: XLA associative-scan
backward (round 2) vs the fused Pallas adjoint kernel (round 4).

Appends results to runs/probes/parallel_bptt_profile.json (clipper section).

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_clipper_adjoint.py
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
    import optax

    import bench
    from diffwdf_tpu.ops.clipper_train import make_fused_clipper_train
    from diffwdf_tpu.roots.neural import NeuralDiodeRoot

    B, T = 1024, 2048
    fs, cap = 48000.0, 4.7e-9
    root = NeuralDiodeRoot(name="dp", n_layers=2, layer_size=16)
    mlp = root.init_params(jr.PRNGKey(1))["dp"]
    key = jr.PRNGKey(0)
    vin = jr.normal(key, (B, T), jnp.float32)
    y = jr.normal(jr.fold_in(key, 9), (B, T), jnp.float32)
    z0 = jnp.zeros((B,), jnp.float32)
    r_rows = jnp.full((B,), 45e3, jnp.float32)
    opt = optax.adam(1e-4)
    opt_state = opt.init(mlp)

    res = {}
    for backward in ("xla", "pallas"):
        f = make_fused_clipper_train(root.activations, cap, fs,
                                     backward=backward)

        @jax.jit
        def step(mp, s, v):
            def loss(mp):
                out, _ = f(v, z0, mp, r_rows)
                return jnp.mean((out - y) ** 2)

            l, g = jax.value_and_grad(loss)(mp)
            up, s = opt.update(g, s, mp)
            return optax.apply_updates(mp, up), s, l

        dt = bench._timeit(lambda v: step(mlp, opt_state, v)[2], [vin], n=20)
        res[f"clipper_step_backward_{backward}"] = {
            "ms": dt * 1e3, "msamples_per_s": B * T / dt / 1e6}
        print(f"# clipper step {backward}: {dt * 1e3:.2f} ms "
              f"({B * T / dt / 1e6:.1f} Msamples/s)", file=sys.stderr,
              flush=True)

    path = "runs/probes/parallel_bptt_profile.json"
    try:
        d = json.load(open(path))
    except Exception:
        d = {}
    d["clipper_engine"] = {"B": B, "T": T, **res}
    with open(path, "w") as fjs:
        json.dump(d, fjs, indent=2)
    print(json.dumps({"out": path, **{k: round(v["ms"], 3)
                                      for k, v in res.items()}}))


if __name__ == "__main__":
    os.makedirs("runs/probes", exist_ok=True)
    main()
