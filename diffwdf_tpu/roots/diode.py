"""Analytic diode-pair WDF roots (Wright-omega closed form).

Implements the wave-domain diode-pair solutions from Werner et al., "An
Improved and Generalized Diode Clipper Model for Wave Digital Filters":

- the symmetric pair (paper eqn 39) used by the reference's C++ root
  (``plugin/src/dsp/diode_clipper/Toms917DiodePair.h:51-58``), and
- the generalized asymmetric pair (eqn 45: N_up / N_down diodes per branch)
  used for synthetic pretraining targets
  (``wdf_py/diode_clipper/diode_pretraining.py:39-60``).

Diode physics (Is, Vt, ideality nabla, N_up, N_down) live in the params
pytree, so they are themselves differentiable — component-level physics can be
fit from data, a capability the reference only has for R/C values.

The quality knob maps to Newton iteration counts in the omega solve (parity
with the reference's TOMS "Best" root vs chowdsp's fast approximation root).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple

import jax.numpy as jnp

from ..core.circuit import Root
from .omega import wright_omega


class DiodeConfig(NamedTuple):
    """Diode physics parameters.

    Field-for-field parity with the reference's config tuples
    (``wdf_py/diode_clipper/diode_config.py:5-9``).
    """

    name: str = ""
    Is: float = 1.0e-9
    nabla: float = 1.0
    Vt: float = 25.85e-3
    N_up: int = 1
    N_down: int = 1


default_diode = DiodeConfig("DefaultDiode")

# 1N4148 parameter set (same SPICE fit the reference cites,
# ``diode_config.py:13-31``)
_1N4148 = dict(Is=4.352e-9, nabla=1.906)
diode_1n4148_1u1d = DiodeConfig("1N4148 (1U-1D)", **_1N4148)
diode_1n4148_1u2d = DiodeConfig("1N4148 (1U-2D)", N_up=1, N_down=2, **_1N4148)
diode_1n4148_1u3d = DiodeConfig("1N4148 (1U-3D)", N_up=1, N_down=3, **_1N4148)
diode_1n4148_2u2d = DiodeConfig("1N4148 (2U-2D)", N_up=2, N_down=2, **_1N4148)
diode_1n4148_2u3d = DiodeConfig("1N4148 (2U-3D)", N_up=2, N_down=3, **_1N4148)
diode_1n4148_3u3d = DiodeConfig("1N4148 (3U-3D)", N_up=3, N_down=3, **_1N4148)

# OA1154 gold-bonded germanium diode (the reference's second measurement
# family, ``diode_dataset/OA1154``).  The reference defines no DiodeConfig
# for it (its physics enter only through measured data); these constants are
# consistent with the mounted NJ Semi-Conductors datasheet
# (``diode_dataset/OA1154/OA1154_datasheet.pdf``): reverse current <= 30 uA
# at 40 V bounds Is (gold-bonded Ge saturation currents sit in the uA range,
# vs nA for silicon), and Shockley with Is = 2 uA, nabla = 1.3 gives
# Vf(10 mA) = 1.3 * 0.02585 * ln(1e-2 / 2e-6) ~= 0.29 V — the typical Ge
# forward drop, within the datasheet's Vf <= 1.2 V @ 10 mA limit.
diode_oa1154_1u1d = DiodeConfig("OA1154 (1U-1D)", Is=2.0e-6, nabla=1.3)

ALL_1N4148 = {
    d.name: d
    for d in (
        diode_1n4148_1u1d,
        diode_1n4148_1u2d,
        diode_1n4148_1u3d,
        diode_1n4148_2u2d,
        diode_1n4148_2u3d,
        diode_1n4148_3u3d,
    )
}


def diode_pair_reflected(a, R, Is, Vt_eff, n_up, n_down, iters: int = 3):
    """Reflected wave of an asymmetric diode pair (Werner et al. eqn 45).

    a: incident wave; R: port impedance; Vt_eff = nabla * Vt;
    n_up / n_down: diodes in each anti-parallel branch.  Vectorized (any
    broadcastable shapes); the up/down branch selection is a sign select, not
    control flow.
    """
    lam = jnp.sign(a)
    # mu0 acts on the branch conducting for the current polarity
    mu0 = jnp.where(a >= 0, n_down, n_up).astype(a.dtype)
    mu1 = jnp.where(a >= 0, n_up, n_down).astype(a.dtype)
    r_is_over_vt = R * Is / Vt_eff
    x0 = jnp.log(r_is_over_vt / mu0) + lam * a / (mu0 * Vt_eff)
    x1 = jnp.log(r_is_over_vt / mu1) - lam * a / (mu1 * Vt_eff)
    return a - 2.0 * Vt_eff * lam * (
        mu0 * wright_omega(x0, iters) - mu1 * wright_omega(x1, iters)
    )


def diode_pair_reflected_symmetric(a, R, Is, Vt_eff, n_diodes=1.0, iters: int = 3):
    """Symmetric diode pair (eqn 39); matches the reference's TOMS root
    (``Toms917DiodePair.h:51-58``) where Vt is pre-scaled by nDiodes."""
    Vt = Vt_eff * n_diodes
    lam = jnp.sign(a)
    log_r_is_over_vt = jnp.log(R * Is / Vt)
    lam_a_over_vt = lam * a / Vt
    return a - 2.0 * Vt * lam * (
        wright_omega(log_r_is_over_vt + lam_a_over_vt, iters)
        - wright_omega(log_r_is_over_vt - lam_a_over_vt, iters)
    )


def shockley_current(v, Is, Vt_eff):
    """Ideal anti-parallel pair I/V curve i = 2 Is sinh(v / Vt_eff); the
    physics-consistency oracle used by the reference's transconductance plots
    (``plot_transconductance.py:52``)."""
    return 2.0 * Is * jnp.sinh(v / Vt_eff)


@dataclasses.dataclass(eq=False)
class DiodePairRoot(Root):
    """Analytic diode-pair root for a WDF tree.

    quality: "best" (3 Newton iters — TOMS-equivalent precision), "good", or
    "low" (fast approximation — the chowdsp ``DiodePairT`` role).
    """

    name: str = "dp"
    diode: DiodeConfig = default_diode
    quality: str = "best"

    def init_params(self) -> Dict[str, Dict[str, Any]]:
        d = self.diode
        return {
            self.name: {
                "Is": jnp.asarray(d.Is, jnp.float32),
                "Vt": jnp.asarray(d.Vt, jnp.float32),
                "nabla": jnp.asarray(d.nabla, jnp.float32),
                "N_up": jnp.asarray(float(d.N_up), jnp.float32),
                "N_down": jnp.asarray(float(d.N_down), jnp.float32),
            }
        }

    @property
    def iters(self) -> int:
        from .omega import omega_quality_iters

        return omega_quality_iters[self.quality]

    def reflect(self, a, R, params, controls):
        p = params[self.name]
        return diode_pair_reflected(
            a, R, p["Is"], p["nabla"] * p["Vt"], p["N_up"], p["N_down"], self.iters
        )
