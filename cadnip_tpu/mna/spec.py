"""Simulator option block.

Mirrors the reference's `MNASpec` (Cadnip `src/mna/solve.jl:57-70`): temperature,
analysis mode, time, gmin/gshunt, source scaling factor and tolerances, with the
same split of per-class absolute tolerances (vntol for node voltages, abstol for
branch currents, chgtol for charges).

The spec is split into two pieces so that homotopy loops (gmin/source stepping)
never trigger recompilation:

  * `SimSpec` — static, hashable python config (mode, tolerances, limits).
    Changing it builds a new jitted solver.
  * `DynSpec` — a pytree of dynamic scalars (temp, time, gmin, gshunt, srcfact)
    threaded through every device residual as traced values.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from ..config import DTYPE

KB = 1.380649e-23
QE = 1.602176634e-19
T0_K = 273.15


class DynSpec(NamedTuple):
    """Dynamic simulation scalars, a pytree of 0-d f64 arrays.

    Threaded through device residuals; vmappable and homotopy-steppable
    without recompilation.
    """

    temp: jnp.ndarray      # device temperature [K]
    time: jnp.ndarray      # current simulation time [s] (0 for DC)
    gmin: jnp.ndarray      # junction gmin [S]
    gshunt: jnp.ndarray    # node-to-ground shunt for gmin stepping [S]
    srcfact: jnp.ndarray   # independent-source scale factor (source stepping)
    mode: jnp.ndarray      # analysis mode code (MODE_* below), int32

    @property
    def vt(self):
        return KB * self.temp / QE


# analysis mode codes (traced int32 so devices can branch with jnp.where)
MODE_DCOP = 0     # DC operating point: capacitors open, inductors short
MODE_TRANOP = 1   # operating point for transient: time sources evaluated at t=0
MODE_TRAN = 2     # transient time stepping
MODE_AC = 3       # small-signal linearization


def make_dynspec(temp_c: float = 27.0, time: float = 0.0, gmin: float = 1e-12,
                 gshunt: float = 0.0, srcfact: float = 1.0,
                 mode: int = MODE_DCOP) -> DynSpec:
    f = lambda v: jnp.asarray(v, DTYPE)
    return DynSpec(temp=f(temp_c + T0_K), time=f(time), gmin=f(gmin),
                   gshunt=f(gshunt), srcfact=f(srcfact),
                   mode=jnp.asarray(mode, jnp.int32))


@dataclasses.dataclass(frozen=True)
class SimSpec:
    """Static solver configuration (hashable; part of the jit cache key).

    Tolerance semantics follow SPICE/the reference: an unknown `i` of class
    voltage converges when |dx_i| <= reltol*max(|x_i|,|x_prev_i|) + vntol,
    currents use abstol, charge-like states chgtol.
    """

    temp_c: float = 27.0
    tnom_c: float = 27.0
    reltol: float = 1e-4
    abstol: float = 1e-12   # branch currents [A]
    vntol: float = 1e-6     # node voltages [V]
    chgtol: float = 1e-14   # charges [C]
    gmin: float = 1e-12
    gshunt: float = 0.0
    max_newton_iters: int = 60
    # DC robustness chain (reference `solve.jl:871-929`)
    gmin_steps: int = 10        # gshunt ladder length for gmin stepping
    gshunt_start: float = 1e-2  # first rung of the ladder
    src_steps: int = 10         # source-stepping ramp points
    # Newton voltage-step clamp (helps exp nonlinearities; 0 disables)
    max_dv: float = 5.0

    def dyn(self, **kw) -> DynSpec:
        base = dict(temp_c=self.temp_c, gmin=self.gmin, gshunt=self.gshunt)
        base.update(kw)
        return make_dynspec(**base)
