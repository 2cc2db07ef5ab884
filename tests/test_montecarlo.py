"""Netlist-level Monte Carlo (agauss) and differentiability through the
transient solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.frontend.elaborate import montecarlo_elaborate
from cadnip_tpu.mna.newton import make_dc_solver


NETLIST = """mc divider
.param rnom=1k
.param r1v={agauss(rnom, 100)}
.param r2v={agauss(rnom, 100)}
v1 in 0 5
r1 in out {r1v}
r2 out 0 {r2v}
"""


def test_agauss_nominal_without_rng():
    cc = ct.parse_spice(NETLIST)
    sol = ct.dc(cc)
    assert float(sol["out"]) == pytest.approx(2.5, rel=1e-9)


def test_montecarlo_elaborate_spread():
    n = 256
    cc, bparams, axes = montecarlo_elaborate(NETLIST, n, seed=3)
    solver = jax.jit(jax.vmap(make_dc_solver(cc), in_axes=(None, axes,
                                                           None)))
    r = solver(jnp.zeros(cc.n), bparams, cc.spec.dyn())
    vout = np.asarray(r.x)[:, cc.index_of("out")]
    assert np.all(np.asarray(r.converged))
    assert abs(vout.mean() - 2.5) < 0.02
    # sigma(vout) for 10% sigma on each resistor of a 50% divider:
    # dv/dr = ±1.25e-3 per ohm -> sigma = sqrt(2)*100*1.25e-3 = 0.177
    assert 0.1 < vout.std() < 0.3


def test_jacfwd_through_transient():
    # d v_out(t) / d R through the whole adaptive transient solver
    cir = ct.Circuit("sens")
    cir.V("vs", "in", "0", wave=ct.Pulse(0.0, 1.0, tr=1e-9))
    cir.R("r1", "in", "out", 1e3)
    cir.C("c1", "out", "0", 1e-6)
    cc = cir.compile()
    params = cc.params0()
    gi, pn, slot = cc.param_slots["r1.r"]

    def vout_at_end(rval):
        p = [dict(d) for d in params]
        p[gi] = dict(p[gi])
        p[gi][pn] = p[gi][pn].at[slot].set(rval)
        sol = ct.tran(cc, (0, 1e-3), params=p, dt=1e-5, n_save=11)
        return sol.xs[-1, cc.index_of("out")]

    r0 = 1e3
    d_auto = jax.jacfwd(vout_at_end)(jnp.asarray(r0))
    # analytic: v(T) = 1 - exp(-T/RC); dv/dR = -T/(R^2 C) * exp(-T/RC)
    T, C = 1e-3, 1e-6
    d_exact = -T / (r0 ** 2 * C) * np.exp(-T / (r0 * C))
    assert float(d_auto) == pytest.approx(d_exact, rel=5e-2)
