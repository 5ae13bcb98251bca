"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: diode-clipper audio throughput per chip (Msamples/s) at the
reference bench configuration (96 kHz audio, neural 2x16 root — the setup of
``plugin/bench/diode_clipper_bench.cpp:7-31``), batched the TPU way.

vs_baseline: ratio against the same workload executed by this framework's
scan engine on the host CPU backend (the closest stand-in for the reference's
single-process CPU engine; the reference publishes no timing numbers).

Details (all root models, XLA vs Pallas, batch sweep) go to BENCH_DETAILS.json.
"""

import os
import json
import sys
import time

import numpy as np


_RTT = None


_LIVE_DETAILS = None


def _p(msg):
    """Liveness/progress line (stderr): lets the tpu_run watchdog tell a
    long kernel compile apart from a wedged chip claim.  Also flushes the
    partial details artifact so a wedge keeps completed sections."""
    print(f"# bench: {msg}", file=sys.stderr, flush=True)
    if _LIVE_DETAILS is not None:
        _flush_details(_LIVE_DETAILS)


def _measure_rtt():
    """One tunnel round trip (tiny compute + scalar fetch).  The chip sits
    behind a network tunnel where ``block_until_ready`` does NOT round-trip,
    so per-call sync times are meaningless; only dispatch pipelines closed
    by a host fetch measure real device time."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(jnp.float32(0.0)))
    ts = []
    for i in range(5):
        t0 = time.time()
        float(tiny(jnp.float32(i)))
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


#: per-entry timing dispersion (label -> reps/median/IQR), written to
#: BENCH_DETAILS["dispersion"] so every published number carries its spread
_STATS = {}


def _baseline_fingerprint():
    """Configuration fingerprint for the CPU-baseline best-ever ratchet: the
    ratchet is only valid while the baseline MACHINE and toolchain are the
    same, so it is keyed to (compiler version, CPU model, core count) and
    resets when any of them change (advisor round-4 finding: an unkeyed
    ratchet silently carries a stale historical max across host swaps)."""
    import subprocess

    parts = []
    try:
        parts.append(
            subprocess.run(["g++", "--version"], capture_output=True,
                           text=True).stdout.splitlines()[0].strip()
        )
    except Exception:
        parts.append("g++:unknown")
    try:
        model = ""
        for line in open("/proc/cpuinfo"):
            if line.lower().startswith("model name"):
                model = line.split(":", 1)[1].strip()
                break
        parts.append(model or "cpu:unknown")
    except Exception:
        parts.append("cpu:unknown")
    parts.append(f"ncpu={os.cpu_count()}")
    return " | ".join(parts)


def _prev_best(section: str, key: str, fingerprint: str) -> float:
    """Read a best-ever ratchet value from the committed BENCH_DETAILS.json,
    honoring it only if the stored baseline fingerprint matches."""
    try:
        rec = json.load(open("BENCH_DETAILS.json"))[section]
        if rec.get("baseline_fingerprint") != fingerprint:
            return 0.0
        return float(rec.get(key, 0.0))
    except Exception:
        return 0.0


#: adaptive-repeat policy: keep measuring until the spread is tight or the
#: per-entry time budget is spent (the reference benches >= 5 s per
#: measurement, ``plugin/bench/diode_clipper_bench.cpp:7-9``)
_MIN_REPS = 7
_MAX_REPS = 60
_IQR_TARGET = 0.05  # stop once IQR <= 5 % of median
_TIME_BUDGET_S = 10.0
_MIN_REP_S = 0.75  # each pipelined rep must dwarf the tunnel-RTT jitter


def _timeit(fn, args_list, n=100, reps=_MIN_REPS, label=None):
    """Steady-state device time per call: dispatch n calls back-to-back,
    close the pipeline with a scalar drain fetch, subtract one RTT, and
    PUBLISH THE MEDIAN of adaptively many repeats — repeats accumulate until
    IQR <= 5 % of the median (or the ~10 s budget runs out), so published
    numbers are stationary across chip refreshes instead of reshuffling
    with best-of-5 tunnel jitter (round-3 VERDICT weak #3).  All repeats are
    recorded under ``label`` (best/median/IQR) as dispersion evidence."""
    import jax
    import jax.numpy as jnp

    global _RTT
    if _RTT is None:
        _RTT = _measure_rtt()

    drain = jax.jit(
        lambda o: jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x).astype(jnp.float32), o,
            jnp.float32(0.0),
        )
    )
    out = fn(args_list[0])
    float(drain(out))  # warm kernel + drain
    # calibration rep: if the caller's pipeline depth finishes in well under
    # _MIN_REP_S, the +-tens-of-ms tunnel-RTT jitter lands directly on the
    # per-call number (a 0.36 ms kernel at n=300 swung 74 % IQR) — deepen n
    # until one rep is ~_MIN_REP_S so the jitter amortizes away
    t0 = time.time()
    for i in range(n):
        out = fn(args_list[i % len(args_list)])
    float(drain(out))
    tot0 = time.time() - t0
    if tot0 < _MIN_REP_S:
        n = int(n * _MIN_REP_S / max(tot0, 1e-6)) + 1
    per_call = []
    t_start = time.time()
    while True:
        t0 = time.time()
        for i in range(n):
            out = fn(args_list[i % len(args_list)])
        float(drain(out))
        tot = time.time() - t0
        per_call.append(max(tot - _RTT, 1e-9) / n)
        if len(per_call) < max(reps, _MIN_REPS):
            continue
        med = float(np.median(per_call))
        q25, q75 = np.percentile(per_call, [25, 75])
        if (
            (q75 - q25) <= _IQR_TARGET * med
            or len(per_call) >= _MAX_REPS
            or (time.time() - t_start) > _TIME_BUDGET_S
        ):
            break
    per_call.sort()
    med = float(np.median(per_call))
    q25, q75 = np.percentile(per_call, [25, 75])
    if label is not None:
        _STATS[label] = {
            "n_pipelined": n,
            "reps": len(per_call),
            "reps_ms": [round(t * 1e3, 6) for t in per_call],
            "best_ms": round(per_call[0] * 1e3, 6),
            "p25_ms": round(float(q25) * 1e3, 6),
            "median_ms": round(med * 1e3, 6),
            "iqr_ms": round(float(q75 - q25) * 1e3, 6),
            "iqr_over_median": round(float(q75 - q25) / med, 4),
        }
    # published estimator: P25, not the median.  The shared tunneled chip
    # drifts ONE-SIDEDLY under load: every rep distribution is a tight
    # fast cluster (the unloaded device) plus a slow drift tail (measured:
    # bottom-quartile spread 4-10 % while the median swung 30-50 % between
    # refreshes).  P25 tracks the reproducible clean-window envelope;
    # median/best/IQR are recorded above as dispersion evidence.
    return float(q25)



def _timeit_kernel(fn, args_list, K, n=30, label=None, pin=None):
    """Device-kernel time for SUB-MILLISECOND kernels: run ``fn`` K times
    CHAINED inside one dispatch (each iterate feeds the next through a
    bounded tanh, so the chain cannot be dead-code-eliminated or diverge and
    the per-iteration cost is data-independent), then divide by K.

    Rationale: at these sizes per-dispatch overhead through the tunnel
    (~0.1-0.4 ms, load-dependent) dominates and fluctuates run-to-run —
    measured 50 % swings in best/p25 across refreshes while >10 ms entries
    held to 0.1 %.  Chaining amortizes the overhead to <1/K and leaves the
    stationary device time.  ``fn`` must map an array to a same-shaped
    array.

    pin: for DATA-DEPENDENT kernels (e.g. the residual-adaptive DEER
    solve, whose sweep count depends on the input), pass the original
    input: each iterate then runs on ``pin`` plus a 1e-30-scaled function
    of the previous iterate — numerically identical input (the
    perturbation rounds away against O(1) samples) but a true data
    dependence, so the chain can be neither reordered nor folded and the
    measured cost reflects the real input's sweep count rather than the
    tamer tanh-compressed chain signal."""
    import jax
    import jax.numpy as jnp

    if pin is None:
        body = lambda i, x: jnp.tanh(fn(x))
    else:
        body = lambda i, x: pin + 1e-30 * jnp.tanh(fn(x))
    chained = jax.jit(lambda v: jax.lax.fori_loop(0, K, body, v))
    dt = _timeit(chained, args_list, n=n, label=label) / K
    if label is not None and label in _STATS:
        s = _STATS[label]
        for key in ("reps_ms", "best_ms", "p25_ms", "median_ms", "iqr_ms"):
            if isinstance(s.get(key), list):
                s[key] = [round(v / K, 6) for v in s[key]]
            elif key in s:
                s[key] = round(s[key] / K, 6)
        s["chained"] = K
        s["timing"] = (
            "device-kernel (chained; excludes per-dispatch overhead)"
            if pin is None
            else "device-kernel (input-pinned chain; excludes per-dispatch "
                 "overhead)"
        )
    return dt


#: annotation stamped on every details entry whose numerator comes from
#: _timeit_kernel, so a serving-latency reader knows the ~0.1-0.4 ms
#: per-dispatch cost each real block pays is excluded from the chained number
#: (advisor round-4 finding); the honest per-block figure is published
#: alongside as *_per_dispatch_ms.
_CHAINED_NOTE = (
    "deer_fused_ms is pure device-kernel time (chained dispatch; "
    "per-dispatch overhead amortized to <1/K); real block serving adds the "
    "per-dispatch cost — see deer_fused_per_dispatch_ms"
)


def _timeit_kernel_pinned(fn, x_pin, K, n=30, label=None):
    """Input-pinned chained timing (see ``_timeit_kernel``'s ``pin``)."""
    return _timeit_kernel(fn, [x_pin], K, n=n, label=label, pin=x_pin)


def _timeit_kernel_both(fn, args_list, K, n=30, label=None):
    """Chained device-kernel time PLUS the pipelined per-dispatch time for
    the same kernel (what one real serving block pays through this host)."""
    dt_k = _timeit_kernel(fn, args_list, K=K, n=n, label=label)
    dt_d = _timeit(fn, args_list, n=max(n, 50),
                   label=None if label is None else label + "_per_dispatch")
    return dt_k, dt_d


def _flush_details(details):
    """Incremental artifact flush: a wedge/crash mid-bench keeps every
    completed section (the final write below merges preserved keys)."""
    try:
        with open("BENCH_DETAILS.partial.json", "w") as f:
            json.dump(details, f, indent=2)
    except Exception:
        pass

def main():
    import jax

    # persistent compilation cache: the harness compiles ~15 kernels; warm
    # runs (e.g. the driver's round-end invocation) skip straight to timing
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import jax.random as jr

    import diffwdf_tpu as dwdf
    from diffwdf_tpu.models.diode_clipper import make_diode_clipper
    from diffwdf_tpu.ops.fused_clipper import (
        fused_clipper_analytic,
        fused_clipper_neural,
    )
    from diffwdf_tpu.roots.neural import NeuralDiodeRoot

    fs = 96000.0
    r_src, cap = 47.0e3, 2.2e-9
    diode = dwdf.diode_1n4148_1u1d
    vt = diode.Vt * diode.nabla
    B, T = 8192, 2048

    details = {"config": {"fs": fs, "B": B, "T": T, "backend": str(jax.devices())}}
    global _LIVE_DETAILS
    _LIVE_DETAILS = details
    _p(f"devices {jax.devices()}")

    key = jr.PRNGKey(0)
    vins = [jr.normal(jr.fold_in(key, i), (B, T), jnp.float32) * 2 for i in range(4)]
    for v in vins:
        v.block_until_ready()
    z0 = jnp.zeros((B,), jnp.float32)

    _p("neural 2x16")
    # --- neural 2x16 (flagship) -------------------------------------------
    nroot = NeuralDiodeRoot(name="dp", n_layers=2, layer_size=16)
    nparams = nroot.init_params(jr.PRNGKey(0))
    ckt_n = make_diode_clipper(nroot, fs, r_src, cap)
    pn = {**ckt_n.init_params(), **nparams}
    st = ckt_n.init_state()

    @jax.jit
    def xla_neural(v):
        def one(vv):
            out, _ = ckt_n.process(pn, st, {"Vs": {"v": vv}}, unroll=8)
            return out

        return jax.vmap(one)(v)

    dt_xla_n = _timeit(xla_neural, vins, label="neural_2x16_xla")
    dt_pl_n = _timeit(
        lambda v: fused_clipper_neural(v, z0, nparams["dp"], r_src, cap, fs=fs),
        vins, label="neural_2x16_pallas",
    )
    neural_msps = B * T / min(dt_xla_n, dt_pl_n) / 1e6
    details["neural_2x16"] = {
        "xla_ms": dt_xla_n * 1e3,
        "pallas_ms": dt_pl_n * 1e3,
        "msamples_per_s": neural_msps,
    }

    _p("analytic")
    # --- analytic (TOMS-equivalent) ---------------------------------------
    aroot = dwdf.DiodePairRoot(name="dp", diode=diode, quality="best")
    ckt_a = make_diode_clipper(aroot, fs, r_src, cap)
    pa = {**ckt_a.init_params(), **aroot.init_params()}

    @jax.jit
    def xla_analytic(v):
        def one(vv):
            out, _ = ckt_a.process(pa, st, {"Vs": {"v": vv}}, unroll=8)
            return out

        return jax.vmap(one)(v)

    dt_xla_a = _timeit(xla_analytic, vins, label="analytic_xla")
    dt_pl_a = _timeit_kernel(
        lambda v: fused_clipper_analytic(
            v, z0, r_src, cap, diode.Is, vt, 1.0, 1.0, fs=fs
        )[0],
        vins, K=8, n=20, label="analytic_pallas",
    )
    details["analytic_toms"] = {
        "xla_ms": dt_xla_a * 1e3,
        "pallas_ms": dt_pl_a * 1e3,
        "msamples_per_s": B * T / min(dt_xla_a, dt_pl_a) / 1e6,
    }

    _p("distilled cheb")
    # --- distilled (piecewise-Chebyshev) serving path ----------------------
    from diffwdf_tpu.ops.fused_clipper import fused_clipper_cheb
    from diffwdf_tpu.roots.distilled import distill_root

    r_cp = 1.0 / (2.0 * cap * fs)
    r_port = 1.0 / (1.0 / r_src + 1.0 / r_cp)
    droot, cheb_err = distill_root(aroot, pa, r_port)
    dt_cheb = _timeit(
        lambda v: fused_clipper_cheb(v, z0, droot, r_src, cap, fs=fs), vins,
        label="distilled_cheb",
    )
    details["distilled_cheb"] = {
        "pallas_ms": dt_cheb * 1e3,
        "msamples_per_s": B * T / dt_cheb / 1e6,
        "fit_max_abs_err": cheb_err,
    }

    # --- full model-zoo ladder (reference bench args 0-6,
    # ``diode_clipper_bench.cpp:31``) — opt-in: adds ~6 compiles -----------
    if os.environ.get("DIFFWDF_BENCH_ZOO"):
        ladder = {
            "0_toms": B * T / dt_pl_a / 1e6,
            "4_neural_2x16": B * T / min(dt_xla_n, dt_pl_n) / 1e6,
        }

        approx_root = dwdf.DiodePairRoot(name="dp", diode=diode, quality="low")
        ckt_ap = make_diode_clipper(approx_root, fs, r_src, cap)
        p_ap = {**ckt_ap.init_params(), **approx_root.init_params()}

        def scan_fn(ckt, p):
            @jax.jit
            def f(v):
                return jax.vmap(
                    lambda vv: ckt.process(p, st, {"Vs": {"v": vv}}, unroll=8)[0]
                )(v)

            return f

        ladder["1_approx"] = B * T / _timeit(scan_fn(ckt_ap, p_ap), vins, n=50) / 1e6

        for label, (nl, width) in (
            ("2_neural_2x4", (2, 4)),
            ("3_neural_2x8", (2, 8)),
            ("5_neural_4x4", (4, 4)),
            ("6_neural_4x8", (4, 8)),
        ):
            rz = NeuralDiodeRoot(name="dp", n_layers=nl, layer_size=width)
            pz = rz.init_params(jr.PRNGKey(2))
            # the fused kernel covers the whole NxH family (stacked hidden
            # layers, unrolled at trace time)
            dt = _timeit(
                lambda v, _pz=pz: fused_clipper_neural(
                    v, z0, _pz["dp"], r_src, cap, fs=fs
                ),
                vins, n=50,
            )
            ladder[label] = B * T / dt / 1e6
        details["zoo_ladder_msamples_per_s"] = ladder

    _p("tube screamer batch")
    # --- Tube Screamer (R-type showcase): XLA scan vs generic fused kernel --
    from diffwdf_tpu.models.tube_screamer import make_tube_screamer
    from diffwdf_tpu.ops.fused_circuit import fused_circuit_process

    ts_root = dwdf.DiodePairRoot(name="dp", diode=diode, quality="best")
    ts = make_tube_screamer(ts_root, fs, drive=0.5)
    ts_params = {**ts.init_params(), **ts_root.init_params()}
    ts_state0 = jax.tree_util.tree_map(
        lambda z: jnp.zeros((B,), jnp.float32), ts.init_state()
    )

    @jax.jit
    def xla_ts(v):
        def one(vv):
            out, _ = ts.process(ts_params, ts.init_state(), {"Vin": {"v": vv}}, unroll=8)
            return out

        return jax.vmap(one)(v)

    dt_xla_ts = _timeit(xla_ts, vins, label="ts_xla")
    dt_pl_ts = _timeit(
        lambda v: fused_circuit_process(ts, ts_params, v, ts_state0), vins,
        label="ts_pallas",
    )
    details["tube_screamer"] = {
        "xla_ms": dt_xla_ts * 1e3,
        "pallas_ms": dt_pl_ts * 1e3,
        "msamples_per_s": B * T / min(dt_xla_ts, dt_pl_ts) / 1e6,
    }

    _p("training steps")
    # --- training-step throughput (BPTT through the scan, pot-driven) ------
    from diffwdf_tpu.models.diode_clipper import make_training_clipper
    from diffwdf_tpu.training.circuit_train import (
        CircuitTrainConfig,
        make_train_step,
    )

    tr_root = NeuralDiodeRoot(name="dp", n_layers=2, layer_size=16)
    tr_ckt = make_training_clipper(tr_root, 48000.0)
    tr_params = {**tr_ckt.init_params(), **tr_root.init_params(jr.PRNGKey(1))}
    n_seq, T_tr = 128, 2048
    tb_ps = {
        "x": jr.normal(key, (n_seq, T_tr), jnp.float32),
        "r": jnp.full((n_seq, T_tr), 45.0e3, jnp.float32),
        "y": jr.normal(jr.fold_in(key, 9), (n_seq, T_tr), jnp.float32),
    }
    # the measured-data regime: R constant per chunk -> adaptation hoisted
    # out of the scan (make_clipper_batches collapses "r" to per-chunk "r0")
    tb = {"x": tb_ps["x"], "y": tb_ps["y"],
          "r0": jnp.full((n_seq,), 45.0e3, jnp.float32)}

    tr_opt, train_step, _ = make_train_step(tr_ckt, CircuitTrainConfig(unroll=4))
    _opt_state = tr_opt.init(tr_params)
    dt_train = _timeit(
        lambda b: train_step(tr_params, _opt_state, b)[2]["loss"],
        [tb],
        n=20, label="training_step_hoisted",
    )
    dt_train_ps = _timeit(
        lambda b: train_step(tr_params, _opt_state, b)[2]["loss"],
        [tb_ps],
        n=20, label="training_step_per_sample_pot",
    )
    details["training_step"] = {
        "n_seq": n_seq,
        "T": T_tr,
        "ms": dt_train * 1e3,
        "samples_per_s": n_seq * T_tr / dt_train,
        "per_sample_pot_ms": dt_train_ps * 1e3,
        "per_sample_pot_samples_per_s": n_seq * T_tr / dt_train_ps,
    }

    # fused engine: Pallas forward + associative-scan backward
    # (ops.clipper_train) at a realistic full-dataset chunk count
    n_seq_f = 1024
    tbf = {
        "x": jr.normal(key, (n_seq_f, T_tr), jnp.float32),
        "y": jr.normal(jr.fold_in(key, 9), (n_seq_f, T_tr), jnp.float32),
        "r0": jnp.full((n_seq_f,), 45.0e3, jnp.float32),
    }
    _, train_step_f, _ = make_train_step(
        tr_ckt, CircuitTrainConfig(engine="fused")
    )
    dt_train_f = _timeit(
        lambda b: train_step_f(tr_params, _opt_state, b)[2]["loss"],
        [tbf],
        n=20, label="training_step_fused",
    )
    details["training_step_fused"] = {
        "n_seq": n_seq_f,
        "T": T_tr,
        "ms": dt_train_f * 1e3,
        "samples_per_s": n_seq_f * T_tr / dt_train_f,
    }

    _p("generic fused training (tube screamer)")
    # generic differentiable fused engine (ops.parallel_bptt): the Tube
    # Screamer neural-root training workload that previously rode the scan
    ts_tr_root = NeuralDiodeRoot(name="dp", n_layers=2, layer_size=16)
    ts_tr = make_tube_screamer(ts_tr_root, 48000.0, drive=0.5)
    ts_tr_params = {**ts_tr.init_params(),
                    **ts_tr_root.init_params(jr.PRNGKey(1))}
    n_seq_ts = 1024
    tbt = {
        "x": jr.normal(key, (n_seq_ts, T_tr), jnp.float32),
        "y": jr.normal(jr.fold_in(key, 9), (n_seq_ts, T_tr), jnp.float32),
    }
    _, ts_step_scan, _ = make_train_step(
        ts_tr, CircuitTrainConfig(unroll=4)
    )
    _, ts_step_gen, _ = make_train_step(
        ts_tr, CircuitTrainConfig(engine="fused_generic")
    )
    _ts_opt_state = tr_opt.init(ts_tr_params)
    # scan BPTT baseline at a smaller chunk count (it is >10x slower; scale)
    tbt_small = {k: v[:128] for k, v in tbt.items()}
    dt_ts_scan = _timeit(
        lambda b: ts_step_scan(ts_tr_params, _ts_opt_state, b)[2]["loss"],
        [tbt_small], n=10, label="training_step_scan_ts",
    )
    dt_ts_gen = _timeit(
        lambda b: ts_step_gen(ts_tr_params, _ts_opt_state, b)[2]["loss"],
        [tbt], n=10, label="training_step_fused_ts",
    )
    scan_sps = 128 * T_tr / dt_ts_scan
    gen_sps = n_seq_ts * T_tr / dt_ts_gen
    details["training_step_fused_ts"] = {
        "n_seq": n_seq_ts,
        "T": T_tr,
        "ms": dt_ts_gen * 1e3,
        "samples_per_s": gen_sps,
        "scan_n_seq": 128,
        "scan_ms": dt_ts_scan * 1e3,
        "scan_samples_per_s": scan_sps,
        "speedup_vs_scan": gen_sps / scan_sps,
    }

    _p("generic fused training, PER-ROW drive pot (round-5)")
    # the reference's actual flagship semantics on a non-clipper circuit:
    # every data row carries its own pot value (clipper_pot.py:113-124
    # generalized to the TS drive pot, TubeScreamer.cpp:66).  Round 4
    # rejected this on the generic engine ("use engine='scan'"); the
    # per-row coefficient streams now run it at fused-adjoint speed.
    from diffwdf_tpu.models.tube_screamer import drive_to_r6

    r6_rows = jnp.asarray(
        drive_to_r6(
            np.random.default_rng(3).uniform(0.0, 1.0, n_seq_ts)
        ).astype(np.float32)
    )
    tbt_row = {**tbt, "r0": r6_rows}
    tbt_row_small = {k: v[:128] for k, v in tbt_row.items()}
    _, ts_step_scan_r, _ = make_train_step(
        ts_tr, CircuitTrainConfig(unroll=4, pot_node="R6")
    )
    _, ts_step_gen_r, _ = make_train_step(
        ts_tr, CircuitTrainConfig(engine="fused_generic", pot_node="R6")
    )
    dt_ts_scan_r = _timeit(
        lambda b: ts_step_scan_r(ts_tr_params, _ts_opt_state, b)[2]["loss"],
        [tbt_row_small], n=10, label="training_step_scan_ts_rowpot",
    )
    dt_ts_gen_r = _timeit(
        lambda b: ts_step_gen_r(ts_tr_params, _ts_opt_state, b)[2]["loss"],
        [tbt_row], n=10, label="training_step_fused_ts_rowpot",
    )
    scan_r_sps = 128 * T_tr / dt_ts_scan_r
    gen_r_sps = n_seq_ts * T_tr / dt_ts_gen_r
    details["training_step_fused_ts_rowpot"] = {
        "n_seq": n_seq_ts,
        "T": T_tr,
        "pot": "R6 per row, drive uniform [0,1]",
        "ms": dt_ts_gen_r * 1e3,
        "samples_per_s": gen_r_sps,
        "scan_n_seq": 128,
        "scan_ms": dt_ts_scan_r * 1e3,
        "scan_samples_per_s": scan_r_sps,
        "speedup_vs_scan": gen_r_sps / scan_r_sps,
    }

    _p("fused training, PER-SAMPLE pot (round-5)")
    # the un-hoistable case: R genuinely time-varying inside a chunk — the
    # reference re-adapts inside its sample loop (clipper_pot.py:113-124);
    # the scan engine's per-sample-pot row above is its honest analogue.
    # The fused engine now streams the (B, T) adapted coefficients + the
    # per-step log-R conditioning through both kernels.
    r_walk = jnp.asarray(
        np.exp(
            np.log(45e3)
            + np.cumsum(
                0.003 * np.random.default_rng(5).standard_normal(
                    (n_seq_f, T_tr)
                ),
                axis=1,
            )
        ).astype(np.float32)
    )
    tbf_ps = {"x": tbf["x"], "y": tbf["y"], "r": r_walk}
    _, step_f_ps, _ = make_train_step(
        tr_ckt, CircuitTrainConfig(engine="fused_generic")
    )
    dt_f_ps = _timeit(
        lambda b: step_f_ps(tr_params, _opt_state, b)[2]["loss"],
        [tbf_ps], n=10, label="training_step_fused_per_sample_pot",
    )
    f_ps_sps = n_seq_f * T_tr / dt_f_ps
    scan_ps_sps = n_seq * T_tr / dt_train_ps  # the scan per-sample-pot row
    details["training_step_fused_per_sample_pot"] = {
        "n_seq": n_seq_f,
        "T": T_tr,
        "pot": "Vs.R per sample (random-walk, 45k center)",
        "ms": dt_f_ps * 1e3,
        "samples_per_s": f_ps_sps,
        "scan_samples_per_s": scan_ps_sps,
        "speedup_vs_scan": f_ps_sps / scan_ps_sps,
    }

    _p("single-stream parallel-in-time")
    # --- single-stream latency regime: sequential scan vs parallel-in-time
    from diffwdf_tpu.ops.parallel_time import parallel_time_process

    T1 = 16384
    xs_single = [
        jr.normal(jr.fold_in(key, 100 + i), (T1,), jnp.float32) * 2
        for i in range(4)
    ]

    @jax.jit
    def seq_single(v):
        out, _ = ckt_a.process(pa, st, {"Vs": {"v": v}}, unroll=8)
        return out

    @jax.jit
    def pint_single(v):
        return parallel_time_process(ckt_a, pa, {"Vs": {"v": v}}, n_iters=12)

    from diffwdf_tpu.ops.parallel_time_deer import fused_deer_clipper

    @jax.jit
    def deer_single(v):
        out, _, _ = fused_deer_clipper(
            v, r_src, cap, diode.Is, vt, diode.N_up, diode.N_down,
            fs=fs, sweeps=8, relax_passes=2,
        )
        return out

    dt_seq = _timeit(seq_single, xs_single, n=30, label="single_seq_T16384")
    dt_pint = _timeit(pint_single, xs_single, n=30, label="single_pint_T16384")
    # sub-ms kernels: pipeline deep enough to clear tunnel-RTT jitter
    dt_deer, dt_deer_pd = _timeit_kernel_both(
        deer_single, xs_single, K=32, n=20, label="single_deer_T16384")
    # parity evidence alongside the timing
    deer_err = float(
        jnp.max(jnp.abs(deer_single(xs_single[0]) - seq_single(xs_single[0])))
    )
    details["single_stream_T16384"] = {
        "sequential_ms": dt_seq * 1e3,
        "parallel_in_time_ms": dt_pint * 1e3,
        "deer_fused_ms": dt_deer * 1e3,
        "deer_fused_per_dispatch_ms": dt_deer_pd * 1e3,
        "speedup_xla_deer": dt_seq / dt_pint,
        "speedup_fused_deer": dt_seq / dt_deer,
        "speedup_fused_deer_per_dispatch": dt_seq / dt_deer_pd,
        "fused_max_abs_err": deer_err,
        "timing_note": _CHAINED_NOTE,
    }

    _p("single-stream T=2048")
    # plugin-block regime (diode_clipper_bench.cpp:7-9: block 2048)
    T2 = 2048
    xs_blk = [
        jr.normal(jr.fold_in(key, 200 + i), (T2,), jnp.float32) * 2
        for i in range(4)
    ]

    @jax.jit
    def seq_blk(v):
        out, _ = ckt_a.process(pa, st, {"Vs": {"v": v}}, unroll=8)
        return out

    @jax.jit
    def deer_blk(v):
        out, _, _ = fused_deer_clipper(
            v, r_src, cap, diode.Is, vt, diode.N_up, diode.N_down,
            fs=fs, sweeps=8, relax_passes=2,
        )
        return out

    # Tube Screamer single-stream (S=3 states): generic fused DEER kernel
    from diffwdf_tpu.ops.deer_circuit import fused_deer_circuit

    @jax.jit
    def ts_seq_single(v):
        out, _ = ts.process(ts_params, ts.init_state(), {"Vin": {"v": v}},
                            unroll=8)
        return out

    def ts_deer_single(v):
        out, _, _ = fused_deer_circuit(ts, ts_params, v, input_node="Vin",
                                    sweeps=10, relax_passes=4)
        return out

    _p("tube screamer single-stream")
    dt_ts_seq = _timeit(ts_seq_single, xs_single, n=30, label="ts_single_seq_T16384")
    dt_ts_deer, dt_ts_deer_pd = _timeit_kernel_both(
        ts_deer_single, xs_single, K=32, n=20, label="ts_single_deer_T16384")
    ts_err = float(
        jnp.max(jnp.abs(ts_deer_single(xs_single[0]) - ts_seq_single(xs_single[0])))
    )
    details["ts_single_stream_T16384"] = {
        "sequential_ms": dt_ts_seq * 1e3,
        "deer_fused_ms": dt_ts_deer * 1e3,
        "deer_fused_per_dispatch_ms": dt_ts_deer_pd * 1e3,
        "speedup_fused_deer": dt_ts_seq / dt_ts_deer,
        "speedup_fused_deer_per_dispatch": dt_ts_seq / dt_ts_deer_pd,
        "fused_max_abs_err": ts_err,
        "timing_note": _CHAINED_NOTE,
    }

    _p("hpf single-stream (marginal mode, damped DEER)")
    # --- HPF clipper single-stream: the marginal slow mode served at 48
    # damped sweeps (sweep-limited, not f32-limited — see
    # runs/probes/hpf_marginal_probe.json) --------------------------------
    from diffwdf_tpu.models.diode_clipper import make_hpf_diode_clipper

    hpf = make_hpf_diode_clipper(aroot, fs)
    p_hpf = {**hpf.init_params(), **aroot.init_params()}

    @jax.jit
    def hpf_seq_single(v):
        out, _ = hpf.process(p_hpf, hpf.init_state(), {"Vs": {"v": v}},
                             unroll=8)
        return out

    def hpf_deer_single(v):
        out, _, _ = fused_deer_circuit(hpf, p_hpf, v, input_node="Vs",
                                       sweeps=48, damping=0.5)
        return out

    def hpf_deer_adaptive(v):
        # the serving configuration (stream.make_hpf_processor): 48-sweep
        # CAP with residual-adaptive early exit on the state-update delta
        out, _, _ = fused_deer_circuit(hpf, p_hpf, v, input_node="Vs",
                                       sweeps=48, damping=0.5,
                                       adapt_tol=1e-5)
        return out

    dt_hpf_seq = _timeit(hpf_seq_single, xs_single, n=30,
                         label="hpf_single_seq_T16384")
    dt_hpf_deer, dt_hpf_deer_pd = _timeit_kernel_both(
        hpf_deer_single, xs_single, K=32, n=20,
        label="hpf_single_deer_T16384")
    dt_hpf_ad = _timeit_kernel_pinned(
        hpf_deer_adaptive, xs_single[0], K=32, n=20,
        label="hpf_single_deer_adaptive_T16384")
    hpf_err = float(jnp.max(jnp.abs(
        hpf_deer_single(xs_single[0]) - hpf_seq_single(xs_single[0]))))
    _, _, _, hpf_ad_sweeps = fused_deer_circuit(
        hpf, p_hpf, xs_single[0], input_node="Vs", sweeps=48, damping=0.5,
        adapt_tol=1e-5, return_info=True)
    # moderate-drive block (0.5x the bench's hard +-2 sigma drive): the
    # early exit pays here — typical audio, not the worst case
    x_mod = xs_single[0] * 0.25
    _, _, _, hpf_ad_sweeps_mod = fused_deer_circuit(
        hpf, p_hpf, x_mod, input_node="Vs", sweeps=48, damping=0.5,
        adapt_tol=1e-5, return_info=True)
    dt_hpf_ad_mod = _timeit_kernel_pinned(
        hpf_deer_adaptive, x_mod, K=32, n=20,
        label="hpf_single_deer_adaptive_moderate_T16384")
    hpf_ad_err = float(jnp.max(jnp.abs(
        hpf_deer_adaptive(xs_single[0]) - hpf_seq_single(xs_single[0]))))
    details["hpf_single_stream_T16384"] = {
        "sequential_ms": dt_hpf_seq * 1e3,
        "deer_fused_ms": dt_hpf_deer * 1e3,
        "deer_fused_per_dispatch_ms": dt_hpf_deer_pd * 1e3,
        "speedup_fused_deer": dt_hpf_seq / dt_hpf_deer,
        "speedup_fused_deer_per_dispatch": dt_hpf_seq / dt_hpf_deer_pd,
        "fused_max_abs_err": hpf_err,
        "sweeps": 48,
        "damping": 0.5,
        "adaptive_ms": dt_hpf_ad * 1e3,
        "adaptive_sweeps_run": float(hpf_ad_sweeps),
        "adaptive_max_abs_err": hpf_ad_err,
        "adaptive_tol": 1e-5,
        "adaptive_moderate_ms": dt_hpf_ad_mod * 1e3,
        "adaptive_moderate_sweeps_run": float(hpf_ad_sweeps_mod),
        "adaptive_note": "the bench drive (+-2 sigma) is the marginal "
                         "mode's worst case and needs the full 48-sweep "
                         "cap; at moderate drive the early exit stops at "
                         "~16-20 sweeps with residual at the ~1e-6 "
                         "certificate floor",
        "timing_note": _CHAINED_NOTE,
    }

    _p("neural single-stream")
    # --- NEURAL-root single-stream: the reference's headline real-time
    # engine (DiodePairNeuralModel.h:68-73) through the generic fused DEER
    # solver with the Kronecker-MLP root (round-2 VERDICT #3) ---------------
    from diffwdf_tpu.models.diode_clipper import make_root_from_zoo
    from diffwdf_tpu.ops.deer_circuit import fused_deer_neural

    nz_root, nz_frag = make_root_from_zoo(4)  # 2x16, pretrained weights
    ckt_nz = make_diode_clipper(nz_root, fs, r_src, cap)
    p_nz = {**ckt_nz.init_params(), **nz_frag}

    @jax.jit
    def nz_seq_single(v):
        out, _ = ckt_nz.process(p_nz, st, {"Vs": {"v": v}}, unroll=8)
        return out

    def nz_deer_single(v):
        out, _, _ = fused_deer_neural(ckt_nz, p_nz, v, input_node="Vs",
                                      sweeps=8, relax_passes=2)
        return out

    dt_nz_seq = _timeit(nz_seq_single, xs_single, n=30,
                        label="neural_single_seq_T16384")
    dt_nz_deer, dt_nz_deer_pd = _timeit_kernel_both(
        nz_deer_single, xs_single, K=32, n=20,
        label="neural_single_deer_T16384")
    nz_err = float(jnp.max(jnp.abs(
        nz_deer_single(xs_single[0]) - nz_seq_single(xs_single[0]))))
    details["neural_single_stream_T16384"] = {
        "sequential_ms": dt_nz_seq * 1e3,
        "deer_fused_ms": dt_nz_deer * 1e3,
        "deer_fused_per_dispatch_ms": dt_nz_deer_pd * 1e3,
        "speedup_fused_deer": dt_nz_seq / dt_nz_deer,
        "speedup_fused_deer_per_dispatch": dt_nz_seq / dt_nz_deer_pd,
        "fused_max_abs_err": nz_err,
        "timing_note": _CHAINED_NOTE,
    }

    _p("f64-oracle parity floors at bench length")
    # --- pin every published fused_max_abs_err to the f32 round-off floor
    # AT BENCH LENGTH (round-2 VERDICT #4): against a float64 CPU oracle,
    # the sequential f32 scan itself drifts by e_scan; the fused solver is
    # "at the floor" when e_fused is within ~2x of e_scan ------------------
    try:
        from diffwdf_tpu.models.tube_screamer import make_tube_screamer as _mts

        cpu0 = jax.devices("cpu")[0]

        def _to64(t):
            return jax.tree_util.tree_map(
                lambda x: jnp.asarray(np.asarray(x), jnp.float64), t)

        floors = {}
        # served-engine f32 outputs (device): fetch before rerouting to CPU
        scan32 = np.asarray(seq_single(xs_single[0]), np.float64)
        deer32 = np.asarray(deer_single(xs_single[0]), np.float64)
        ts_scan32 = np.asarray(ts_seq_single(xs_single[0]), np.float64)
        ts_deer32 = np.asarray(ts_deer_single(xs_single[0]), np.float64)
        nz_scan32 = np.asarray(nz_seq_single(xs_single[0]), np.float64)
        nz_deer32 = np.asarray(nz_deer_single(xs_single[0]), np.float64)
        hpf_scan32 = np.asarray(hpf_seq_single(xs_single[0]), np.float64)
        hpf_deer32 = np.asarray(hpf_deer_single(xs_single[0]), np.float64)
        with jax.default_device(cpu0):
            x64 = np.asarray(xs_single[0], np.float64)
            # clipper (S=1)
            with jax.enable_x64():
                oracle, _ = ckt_a.process(
                    _to64(pa), _to64(ckt_a.init_state()),
                    {"Vs": {"v": jnp.asarray(x64)}})
                o_clip = np.asarray(oracle)
            e_scan = float(np.max(np.abs(scan32 - o_clip)))
            e_deer = float(np.max(np.abs(deer32 - o_clip)))
            floors["clipper_T16384"] = {
                "scan_f32_vs_f64": e_scan, "fused_f32_vs_f64": e_deer,
                "fused_over_scan": e_deer / max(e_scan, 1e-30),
            }
            # tube screamer (S=3; S-matrix derived in f64 via static_s=False)
            ts64 = _mts(ts_root, fs, drive=0.5, static_s=False)
            p64 = {**ts64.init_params(), **ts_root.init_params()}
            with jax.enable_x64():
                oracle_ts, _ = ts64.process(
                    _to64(p64), _to64(ts64.init_state()),
                    {"Vin": {"v": jnp.asarray(x64)}})
                o_ts = np.asarray(oracle_ts)
            e_ts_scan = float(np.max(np.abs(ts_scan32 - o_ts)))
            e_ts_deer = float(np.max(np.abs(ts_deer32 - o_ts)))
            floors["tube_screamer_T16384"] = {
                "scan_f32_vs_f64": e_ts_scan, "fused_f32_vs_f64": e_ts_deer,
                "fused_over_scan": e_ts_deer / max(e_ts_scan, 1e-30),
            }
            # neural clipper
            with jax.enable_x64():
                oracle_nz, _ = ckt_nz.process(
                    _to64(p_nz), _to64(ckt_nz.init_state()),
                    {"Vs": {"v": jnp.asarray(x64)}})
                o_nz = np.asarray(oracle_nz)
            floors["neural_clipper_T16384"] = {
                "scan_f32_vs_f64": float(np.max(np.abs(nz_scan32 - o_nz))),
                "fused_f32_vs_f64": float(np.max(np.abs(nz_deer32 - o_nz))),
            }
            floors["neural_clipper_T16384"]["fused_over_scan"] = (
                floors["neural_clipper_T16384"]["fused_f32_vs_f64"]
                / max(floors["neural_clipper_T16384"]["scan_f32_vs_f64"],
                      1e-30))
            # HPF (marginal slow mode, damped DEER at 48 sweeps)
            with jax.enable_x64():
                oracle_h, _ = hpf.process(
                    _to64(p_hpf), _to64(hpf.init_state()),
                    {"Vs": {"v": jnp.asarray(x64)}})
                o_h = np.asarray(oracle_h)
            e_h_scan = float(np.max(np.abs(hpf_scan32 - o_h)))
            e_h_deer = float(np.max(np.abs(hpf_deer32 - o_h)))
            floors["hpf_T16384"] = {
                "scan_f32_vs_f64": e_h_scan, "fused_f32_vs_f64": e_h_deer,
                "fused_over_scan": e_h_deer / max(e_h_scan, 1e-30),
            }
        details["f64_parity_floors"] = floors
    except Exception as e:  # oracle needs a CPU device + x64 support
        details["f64_parity_floors"] = {"error": str(e)[:200]}

    dt_seq2 = _timeit(seq_blk, xs_blk, n=30, label="single_seq_T2048")
    # the fused solve at T=2048 is microseconds; pipeline thousands of
    # dispatches so the total clears the tunnel RTT jitter
    dt_deer2, dt_deer2_pd = _timeit_kernel_both(
        deer_blk, xs_blk, K=128, n=20, label="single_deer_T2048")
    details["single_stream_T2048"] = {
        "sequential_ms": dt_seq2 * 1e3,
        "deer_fused_ms": dt_deer2 * 1e3,
        "deer_fused_per_dispatch_ms": dt_deer2_pd * 1e3,
        "speedup_fused_deer": dt_seq2 / dt_deer2,
        "speedup_fused_deer_per_dispatch": dt_seq2 / dt_deer2_pd,
        "timing_note": _CHAINED_NOTE,
    }

    _p("serving warmup / first-block latency")
    # --- serving compile-latency budget (round-3 VERDICT missing #1): the
    # reference is real-time safe from sample one (prepareToPlay does all
    # setup); here warmup() pre-compiles the block fns — measure first-block
    # latency cold vs post-warmup vs steady state -------------------------
    try:
        from diffwdf_tpu.runtime.stream import make_clipper_processor

        x_serve = np.asarray(xs_blk[0])
        cold = make_clipper_processor(fs, models=("toms",))
        t0 = time.time()
        cold.process_block(x_serve, "toms")
        cold_first_ms = (time.time() - t0) * 1e3

        warm = make_clipper_processor(fs, models=("toms",))
        winfo = warm.warmup([len(x_serve)])
        t0 = time.time()
        warm.process_block(x_serve, "toms")
        warm_first_ms = (time.time() - t0) * 1e3
        steady = []
        for _ in range(30):
            t0 = time.time()
            warm.process_block(x_serve, "toms")
            steady.append(time.time() - t0)
        steady_ms = float(np.median(steady)) * 1e3
        # device-side steady block time + real-time factor (round-5 VERDICT
        # #4): the SAME compiled process_block path (gain ramp -> circuit ->
        # DC blocker), timed with the pipelined RTT-corrected policy the
        # kernel entries use, so the real-time claim stands on the actual
        # serving function without the tunnel round trip the host-API
        # steady_block_ms above pays per block
        g1 = jnp.float32(1.0)

        def _block_call(proc):
            """The compiled process_block fn as audio -> audio (fixed
            state/gain), ready for the timing helpers."""
            fn_dev = proc._block_fn("toms", len(x_serve))
            _, params_dev = proc.circuits["toms"]
            st_dev = proc._state[proc._state_key.get("toms", "toms")]
            dc_dev = proc._dc_state
            return lambda v: fn_dev(
                params_dev, st_dev, dc_dev, v, g1, g1, {}
            )[0]

        args_blk = [jnp.asarray(x) for x in xs_blk]
        dev_block = _timeit(
            _block_call(warm), args_blk, n=200, label="serving_device_block"
        )
        # the latency serving engine (cli process --engine deer): circuit
        # solve fused into one kernel; with the parallel DC blocker the
        # whole block fn is log-depth.  The chained number is the
        # stationary device-kernel time (the sub-ms block's per-dispatch
        # pipelined figures carry 30-100 % IQR from tunnel load — same
        # policy and helper as the single-stream rows; the serving sweep
        # budget is fixed, so the chain cost is data-independent)
        deer_proc = make_clipper_processor(fs, models=("toms",), engine="deer")
        deer_proc.warmup([len(x_serve)])
        dev_block_deer, dev_block_deer_pd = _timeit_kernel_both(
            _block_call(deer_proc), args_blk, K=32, n=20,
            label="serving_device_block_deer")
        block_audio_ms = len(x_serve) / fs * 1e3
        details["serving_warmup"] = {
            "block": len(x_serve),
            "cold_first_block_ms": cold_first_ms,
            "warmup_s": winfo["seconds"],
            "warmup_n_compiled": winfo["n_compiled"],
            "warmed_first_block_ms": warm_first_ms,
            "steady_block_ms": steady_ms,
            "device_block_ms": dev_block * 1e3,
            "device_block_deer_ms": dev_block_deer * 1e3,
            "device_block_deer_per_dispatch_ms": dev_block_deer_pd * 1e3,
            "block_audio_ms": block_audio_ms,
            "rt_factor_device": block_audio_ms / (dev_block * 1e3),
            "rt_factor_device_deer": block_audio_ms / (dev_block_deer * 1e3),
            "rt_factor_device_deer_per_dispatch": (
                block_audio_ms / (dev_block_deer_pd * 1e3)
            ),
            "note": "per-block times include one tunnel round trip (the "
                    "block API fetches its output); the contract is "
                    "warmed_first ~ steady << cold_first.  device_block_ms "
                    "is the same compiled block fn timed pipelined/RTT-"
                    "corrected (no per-block output fetch): the real-time "
                    "factor rt_factor_device = block audio duration / "
                    "device block time is the reference CPU meter's "
                    "headroom number (CPUMeter.h:42-80).  "
                    "device_block_deer_ms is CHAINED device-kernel time "
                    "(per-dispatch overhead amortized to <1/K, same "
                    "policy as the single-stream rows); each real served "
                    "block additionally pays the per-dispatch cost "
                    "recorded in device_block_deer_per_dispatch_ms",
        }
    except Exception as e:
        details["serving_warmup"] = {"error": str(e)[:200]}

    _p("full-group warmup + hot-swap sweep")
    # --- full-group warm-up evidence (round-5 VERDICT #5): warm the WHOLE
    # 7-member clipper group at two block sizes, then hot-swap through every
    # member asserting first post-swap block ~ steady ----------------------
    try:
        from diffwdf_tpu.runtime.stream import make_plugin_processor

        grp = make_plugin_processor(fs)
        winfo_g = grp.warmup([2048, 1024], circuits=["clipper"])
        swap = {}
        x_sw = np.asarray(xs_blk[0])
        for i in range(7):
            # Two genuine swap cycles (swap in, time the first block, swap
            # away, swap back, time again); publish the min so a one-off
            # tunnel stall (observed: a 212 s wedge on an otherwise steady
            # 55 ms block) cannot masquerade as a compile miss.
            firsts = []
            for cycle in range(2):
                t0 = time.time()
                grp.process_block(x_sw, "clipper", model=i)
                firsts.append((time.time() - t0) * 1e3)
                if cycle == 0:
                    grp.process_block(x_sw, "clipper", model=(i + 1) % 7)
            steady_i = []
            for _ in range(10):
                t0 = time.time()
                grp.process_block(x_sw, "clipper", model=i)
                steady_i.append(time.time() - t0)
            swap[f"clipper/{i}"] = {
                "first_block_after_swap_ms": min(firsts),
                # Raw per-cycle times kept for audit: min() cannot tell a
                # tunnel stall from a genuine cycle-0 compile miss (the
                # compile CONTRACT is asserted separately in
                # tests/test_runtime.py warmup tests), so the evidence
                # stays inspectable rather than folded away.
                "first_block_cycles_ms": firsts,
                "steady_ms": float(np.median(steady_i)) * 1e3,
            }
        worst = max(
            v["first_block_after_swap_ms"] / max(v["steady_ms"], 1e-9)
            for v in swap.values()
        )
        worst_c0 = max(
            v["first_block_cycles_ms"][0] / max(v["steady_ms"], 1e-9)
            for v in swap.values()
        )
        details["serving_group_warmup"] = {
            "group": "clipper (7 members: toms, approx, 5 neural sizes)",
            "block_sizes": [2048, 1024],
            "n_compiled": winfo_g["n_compiled"],
            "warmup_s": winfo_g["seconds"],
            "hot_swap_sweep": swap,
            "worst_first_over_steady": worst,
            "worst_cycle0_over_steady": worst_c0,
            "note": "every member pre-compiled by warmup(); the sweep then "
                    "switches models each block with state continuity — "
                    "first post-swap block should sit at steady latency "
                    "(times include one tunnel round trip per block; "
                    "first-block time is the min over 2 swap cycles to "
                    "reject one-off tunnel stalls)",
        }
    except Exception as e:
        details["serving_group_warmup"] = {"error": str(e)[:200]}

    _p("cpu baselines")
    # --- CPU baseline: native C++ per-sample engine (the reference's
    # architecture: single-threaded sample loop, RTNeural-style MLP) ---------
    from diffwdf_tpu.native import lib as native

    if native.available():
        mlp_host = jax.tree_util.tree_map(np.asarray, nparams["dp"])
        x_cpu = np.asarray(vins[0][0])  # one stream, T samples
        native.clipper_process_neural(x_cpu, 0.0, mlp_host, r_src, cap, fs)
        # best-of-reps: the baseline is "how fast CAN the reference
        # architecture go on this host"; a mean absorbs transient load from
        # the bench process's own background threads (observed 3x swings)
        # and silently inflates vs_baseline.  Min is the honest estimator
        # and makes the published ratio conservative.
        reps_s = []
        for _ in range(30):
            t0 = time.time()
            native.clipper_process_neural(x_cpu, 0.0, mlp_host, r_src, cap, fs)
            reps_s.append(time.time() - t0)
        reps_s.sort()
        dt_cpu = reps_s[0]
        cpu_msps = T / dt_cpu / 1e6
        q25_c, q75_c = np.percentile(reps_s, [25, 75])
        _STATS["cpu_baseline_neural"] = {
            "reps": 30,
            "best_ms": reps_s[0] * 1e3,
            "median_ms": float(np.median(reps_s)) * 1e3,
            "iqr_ms": float(q75_c - q25_c) * 1e3,
        }
        # best-ever across refreshes: the 2-core host's measured speed
        # swings ~25 % with external load, but the baseline MACHINE's
        # capability does not change run to run — the published ratio is
        # computed against the best the reference architecture has ever
        # demonstrated here (conservative for us, stationary for the README).
        # The ratchet is keyed to a toolchain/host fingerprint and resets
        # when the baseline configuration changes.
        fp = _baseline_fingerprint()
        prev_best = _prev_best(
            "cpu_baseline_neural", "best_ever_msamples_per_s", fp)
        details["cpu_baseline_neural"] = {
            "engine": "native C++ single-core (reference architecture)",
            "ms": dt_cpu * 1e3,
            "msamples_per_s": cpu_msps,
            "best_ever_msamples_per_s": max(cpu_msps, prev_best),
            "baseline_fingerprint": fp,
        }
        cpu_msps = details["cpu_baseline_neural"]["best_ever_msamples_per_s"]
    else:  # fall back to the JAX CPU backend
        cpu = jax.devices("cpu")[0]
        Bc, Tc = 64, 2048
        vin_c = jax.device_put(np.asarray(vins[0][:Bc, :Tc]), cpu)
        cpu_fn = jax.jit(
            lambda v: jax.vmap(
                lambda vv: ckt_n.process(pn, st, {"Vs": {"v": vv}})[0]
            )(v),
            device=cpu,
        )
        cpu_fn(vin_c).block_until_ready()
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = cpu_fn(vin_c)
        out.block_until_ready()
        dt_cpu = (time.time() - t0) / reps
        cpu_msps = Bc * Tc / dt_cpu / 1e6
        details["cpu_baseline_neural"] = {
            "engine": "jax-cpu",
            "ms": dt_cpu * 1e3,
            "msamples_per_s": cpu_msps,
        }

    # --- CPU codegen engines (circuit -> generated C, single core) ---------
    try:
        from diffwdf_tpu.native.codegen import compile_circuit

        x_cg = np.asarray(vins[0][0])
        eng_c = compile_circuit(ckt_a, pa, input_node="Vs")
        eng_ts = compile_circuit(ts, ts_params)
        for e in (eng_c, eng_ts):
            e.process(x_cg)
        rec = {}
        for label, e in (("clipper", eng_c), ("tube_screamer", eng_ts)):
            ts_cg = []
            for _ in range(30):
                t0 = time.time()
                e.process(x_cg)
                ts_cg.append(time.time() - t0)
            ts_cg.sort()
            # these are the framework's OWN engines: publish the median
            # (same policy as the device entries) and record best/IQR as
            # dispersion evidence; min-only is reserved for the competing
            # CPU baseline where it is the conservative choice
            med_cg = float(np.median(ts_cg))
            q25_g, q75_g = np.percentile(ts_cg, [25, 75])
            cg_msps = len(x_cg) / med_cg / 1e6
            rec[label + "_msamples_per_s"] = cg_msps
            # same host-load rationale and fingerprint keying as
            # cpu_baseline_neural above
            rec.setdefault("baseline_fingerprint", _baseline_fingerprint())
            prev_cg = _prev_best(
                "cpu_codegen", label + "_best_ever_msamples_per_s",
                rec["baseline_fingerprint"])
            rec[label + "_best_ever_msamples_per_s"] = max(cg_msps, prev_cg)
            _STATS["cpu_codegen_" + label] = {
                "reps": len(ts_cg),
                "best_ms": ts_cg[0] * 1e3,
                "median_ms": med_cg * 1e3,
                "iqr_ms": float(q75_g - q25_g) * 1e3,
            }
        details["cpu_codegen"] = rec
    except Exception as e:  # no compiler etc.
        details["cpu_codegen"] = {"error": str(e)[:200]}

    vs_baseline = neural_msps / cpu_msps

    _p("roofline accounting")
    # --- roofline accounting (round-5 VERDICT #8): anchor "fast" to the
    # hardware limits, not only the vs-CPU ratio.  Peaks: TPU v5e public
    # spec, one chip — 197 TFLOP/s bf16 MXU (the kernels' dots run
    # single-pass bf16-multiply/f32-accumulate) and 819 GB/s HBM.  MXU
    # flops count the PADDED Kronecker work the kernel actually issues
    # (2x16 family: k1 H*8 + 2 hidden HS^2/8 + head HS MACs per sample);
    # HBM bytes count the streamed arrays (state lives in VMEM scratch).
    try:
        PEAK_MXU_BF16 = 197e12
        PEAK_HBM = 819e9
        H, HS, Lh = 16, 128, 2  # "2x16": two hidden HxH layers
        kron_flops = 2.0 * (H * 8 + Lh * HS * HS // 8 + HS)

        roof = {
            "peaks": {
                "mxu_bf16_flops_per_s": PEAK_MXU_BF16,
                "hbm_bytes_per_s": PEAK_HBM,
                "source": "TPU v5e spec (197 TFLOP/s bf16, 819 GB/s HBM)",
            },
            "entries": {},
        }

        def _roof(name, sps, mxu_fps, hbm_bps, bound, estimate=False):
            roof["entries"][name] = {
                "samples_per_s": sps,
                "mxu_flops_per_sample": mxu_fps,
                "hbm_bytes_per_sample": hbm_bps,
                "achieved_mxu_tflops": sps * mxu_fps / 1e12,
                "pct_mxu_roofline": 100.0 * sps * mxu_fps / PEAK_MXU_BF16,
                "achieved_hbm_gb_per_s": sps * hbm_bps / 1e9,
                "pct_hbm_roofline": 100.0 * sps * hbm_bps / PEAK_HBM,
                "bound": bound,
                **({"flops_estimate": True} if estimate else {}),
            }

        _roof(
            "neural_2x16_pallas", B * T / dt_pl_n, kron_flops, 8.0,
            "compute (MXU-latency): the per-step Kronecker matmul chain is "
            "sequential over time, so utilization is dependence-limited, "
            "not issue-limited (KERNEL_SWEEP ILP probe: <1% from "
            "interleaving); HBM at <1% is nowhere near binding",
        )
        _roof(
            "analytic_pallas", B * T / dt_pl_a, 0.0, 8.0,
            "compute (VPU): omega transcendentals + scatter, sequential "
            "dependence; no MXU work, HBM not binding",
        )
        _roof(
            "tube_screamer_pallas", B * T / dt_pl_ts, 0.0, 8.0,
            "compute (VPU): R-type scatter + omega; no MXU work",
        )
        # training fused (clipper 2x16): Pallas fwd (streams x in, out +
        # a_seq residual out) + Pallas adjoint (reads a_seq/g_out, writes
        # gv/G) + XLA batched param VJP (reads a_seq/G) ~= 36 B/sample;
        # MXU work ~= fwd Kron + jvp m-pass + param VJP ~= 3x kron
        _roof(
            "training_step_fused", n_seq_f * T_tr / dt_train_f,
            3.0 * kron_flops, 36.0,
            "mixed: dependence-limited Pallas kernels + throughput-bound "
            "XLA param VJP; HBM ~10% — not binding", estimate=True,
        )
        # generic fused training on the TS (S=3): fwd streams 1+1+3 arrays,
        # adjoint reads 5 + writes 4, param pass reads ~7 => ~88 B/sample;
        # the adjoint's MLP root runs scalar-broadcast VPU math (no MXU),
        # so MXU work ~= fwd Kron + dense param-VJP MLP (~1.5x kron)
        _roof(
            "training_step_fused_generic_ts", n_seq_ts * T_tr / dt_ts_gen,
            1.5 * kron_flops, 88.0,
            "mixed: VPU adjoint recurrence + MXU fwd/param-VJP; HBM ~3% — "
            "dependence-limited", estimate=True,
        )
        details["roofline"] = roof
    except Exception as e:
        details["roofline"] = {"error": str(e)[:200]}

    details["dispersion"] = _STATS

    # preserve opt-in sections (zoo ladder) measured by previous runs so a
    # default run never erases them from the artifact
    try:
        prev = json.load(open("BENCH_DETAILS.json"))
        for k in ("zoo_ladder_msamples_per_s",):
            if k in prev and k not in details:
                details[k] = prev[k]
    except Exception:
        pass
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "diode_clipper_neural2x16_throughput_per_chip",
                "value": round(neural_msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


def main_scaling():
    """Opt-in scaling evidence (`bench.py --scaling`): weak-scaling curves on
    an 8-virtual-device CPU mesh -> SCALING_r05.json (real multi-chip uses the
    same path when a pod is attached; see parallel/scaling_bench.py)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from measure_scaling import main as _run

    _run(["--out", "SCALING_r05.json"])


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    else:
        main()
