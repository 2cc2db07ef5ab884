"""User-defined devices through the public DeviceModel API.

Parity with the reference's ModelingToolkit extension
(`ext/CadnipModelingToolkitExt.jl`: `@declare_MSLConnector` wraps an
external equation system as a circuit element). Here the contract is
simpler and stronger: ANY pure function `(u, p, dyn) -> (f, q)` is a
device — Jacobians, AC linearization, transient companions, and sweep
batching all come from JAX transforms, so a custom device is a
first-class citizen of every analysis with no extra code.
"""
import jax.numpy as jnp
import numpy as np

import cadnip_tpu as ct

# a saturating (tanh) conductance: i = isat*tanh(g0*v/isat), plus a
# parallel charge q = c*v. Nothing like it exists in the builtin set.
def _sat_res(u, p, dyn):
    v = u[0] - u[1]
    i = p["isat"] * jnp.tanh(p["g0"] * v / p["isat"])
    q = p["c"] * v
    return jnp.stack([i, -i]), jnp.stack([q, -q])


SATR = ct.DeviceModel(
    name="satres", terminals=("p", "n"), residual=_sat_res,
    defaults={"g0": 1e-3, "isat": 1e-3, "c": 0.0})


def test_custom_device_dc_small_and_large_signal():
    c = ct.Circuit("custom dc")
    c.V("vs", "in", "0", dc=0.1)
    c.R("r1", "in", "out", 1e3)
    c.add(SATR, "x1", ("out", "0"), g0=1e-3, isat=1e-3)
    cc = c.compile()
    sol = ct.dc(cc)
    assert bool(np.asarray(sol.converged))
    # hand Newton on  (0.1 - v)/1e3 = 1e-3*tanh(v)
    v = 0.05
    for _ in range(60):
        f = (0.1 - v) / 1e3 - 1e-3 * np.tanh(v)
        df = -1e-3 - 1e-3 / np.cosh(v) ** 2
        v -= f / df
    assert abs(float(np.asarray(sol["out"])) - v) < 1e-9

    # drive it deep into saturation: device current pins at isat
    sol2 = ct.dc(cc, cc.alter(cc.params0(), **{"vs.dc": 50.0}))
    i_dev = (50.0 - float(np.asarray(sol2["out"]))) / 1e3
    assert abs(i_dev - 1e-3) < 1e-5


def test_custom_device_tran_and_ac():
    # the same device with its charge term: a linear RC built from the
    # custom element (g0 tiny, so the tanh leak is negligible)
    c2 = ct.Circuit("custom tran2")
    c2.V("vs", "in", "0", dc=1.0, acmag=1.0)
    c2.R("r1", "in", "out", 1e3)
    c2.add(SATR, "x1", ("out", "0"), g0=1e-12, isat=1.0, c=1e-6)
    cc2 = c2.compile()
    sol = ct.tran(cc2, (0.0, 5e-3), dt=5e-6, uic=True)
    ts = np.asarray(sol.ts)
    v = np.asarray(sol["out"])
    # RC charging, tau = 1e3 * 1e-6 = 1 ms (the tanh leak is ~1e-12 S)
    i = int(np.argmin(np.abs(ts - 1e-3)))
    assert abs(v[i] - (1 - np.exp(-1.0))) < 5e-3

    # AC: single-pole lowpass; |H| at the pole = 1/sqrt(2)
    f0 = 1.0 / (2 * np.pi * 1e-3)
    acs = ct.ac(cc2, np.array([f0]))
    h = np.asarray(acs["out"])[0]
    assert abs(abs(h) - 1 / np.sqrt(2)) < 1e-3


def test_custom_device_sweeps_and_errors():
    c = ct.Circuit("custom sweep")
    c.V("vs", "in", "0", dc=0.1)
    c.R("r1", "in", "out", 1e3)
    c.add(SATR, "x1", ("out", "0"))
    cc = c.compile()
    sols = ct.dcsweep(cc, ct.Sweep("x1.g0", [1e-4, 1e-3, 1e-2]))
    v = np.asarray(sols["out"])
    assert v.shape == (3,)
    assert v[0] > v[1] > v[2]     # more conductance pulls out lower

    # unknown param at add() time is a build error
    try:
        c_bad = ct.Circuit("bad")
        c_bad.add(SATR, "x1", ("a", "0"), nope=1.0)
    except ValueError as e:
        assert "nope" in str(e)
    else:
        raise AssertionError("expected ValueError for unknown param")
