"""Sweep, Monte-Carlo, and sensitivity tests (reference test/sweep.jl and
sensitivity strategy analogues)."""
import numpy as np
import pytest

from cadnip_tpu import Circuit, Pulse
from cadnip_tpu.analyses.sensitivity import dc_sensitivity
from cadnip_tpu.analyses.sweeps import (ProductSweep, SerialSweep, Sweep,
                                        TandemSweep, dcsweep,
                                        montecarlo_table, transweep)


def _divider():
    cir = Circuit("div")
    cir.V("v1", "in", "0", dc=5.0)
    cir.R("r1", "in", "out", 1e3)
    cir.R("r2", "out", "0", 1e3)
    return cir.compile()


def test_dcsweep_1d():
    cc = _divider()
    r2 = np.linspace(0.5e3, 4e3, 8)
    sol = dcsweep(cc, Sweep("r2.r", tuple(r2)))
    assert np.all(np.asarray(sol.converged))
    expect = 5.0 * r2 / (1e3 + r2)
    assert np.allclose(np.asarray(sol["out"]), expect, rtol=1e-9)


def test_dcsweep_product():
    cc = _divider()
    r1 = np.array([1e3, 2e3])
    r2 = np.array([1e3, 3e3, 5e3])
    sol = dcsweep(cc, ProductSweep(Sweep("r1.r", tuple(r1)),
                                   Sweep("r2.r", tuple(r2))))
    vs = np.asarray(sol["out"]).reshape(2, 3)
    expect = 5.0 * r2[None, :] / (r1[:, None] + r2[None, :])
    assert np.allclose(vs, expect, rtol=1e-9)


def test_dcsweep_tandem_and_serial():
    cc = _divider()
    sol = dcsweep(cc, TandemSweep(Sweep("r1.r", (1e3, 2e3)),
                                  Sweep("r2.r", (1e3, 2e3))))
    assert np.allclose(np.asarray(sol["out"]), [2.5, 2.5], rtol=1e-9)
    sol2 = dcsweep(cc, SerialSweep(Sweep("r1.r", (2e3,)),
                                   Sweep("r2.r", (3e3,))))
    # point 1: r1=2k (r2 default 1k) -> 5/3; point 2: r2=3k (r1 default 1k)
    assert np.allclose(np.asarray(sol2["out"]), [5.0 / 3.0, 3.75], rtol=1e-9)


def test_dcsweep_nonlinear_diode():
    cir = Circuit("dsw")
    cir.V("v1", "in", "0", dc=2.0)
    cir.R("r1", "in", "d", 1e3)
    cir.D("d1", "d", "0", **{"is": 1e-14})
    cc = cir.compile()
    vs = np.linspace(0.5, 5.0, 10)
    sol = dcsweep(cc, Sweep("v1.wave", ()) if False else
                  {"r1.r": np.full(10, 1e3)})  # placeholder batch shape
    # sweep the source DC value is via waveform; sweep resistor instead
    sol = dcsweep(cc, {"r1.r": np.geomspace(100, 1e5, 12)})
    assert np.all(np.asarray(sol.converged))
    vd = np.asarray(sol["d"])
    assert np.all(np.diff(vd) < 0)  # more R -> less diode current -> lower vd


def test_transweep_rc():
    # batched RC charging with different R: time constants scale
    cir = Circuit("rcs")
    cir.V("vs", "in", "0", wave=Pulse(0.0, 1.0, tr=1e-9))
    cir.R("r1", "in", "out", 1e3)
    cir.C("c1", "out", "0", 1e-6)
    cc = cir.compile()
    rs = np.array([0.5e3, 1e3, 2e3])
    sol = transweep(cc, {"r1.r": rs}, (0, 2e-3), dt=2e-6)
    assert np.all(np.asarray(sol.converged))
    vout = np.asarray(sol["out"])          # [3, n_save]
    for k, r in enumerate(rs):
        expect = 1.0 - np.exp(-sol.ts / (r * 1e-6))
        assert np.max(np.abs(vout[k] - expect)) < 2e-3


def test_montecarlo_table_shape():
    cc = _divider()
    tab = montecarlo_table(cc, {"r1.r": 0.05, "r2.r": (2e3, 100.0)}, 64,
                           seed=1)
    assert len(tab["r1.r"]) == 64
    assert abs(np.mean(tab["r1.r"]) - 1e3) < 50
    assert abs(np.mean(tab["r2.r"]) - 2e3) < 60
    sol = dcsweep(cc, tab)
    assert np.asarray(sol["out"]).shape == (64,)


def test_dc_sensitivity_divider():
    cc = _divider()
    sens = dc_sensitivity(cc, ["r2.r", "r1.r"])
    i_out = cc.index_of("out")
    # vout = 5 r2/(r1+r2): dv/dr2 = 5 r1/(r1+r2)^2, dv/dr1 = -5 r2/(r1+r2)^2
    assert float(sens["r2.r"][i_out]) == pytest.approx(
        5 * 1e3 / 4e6, rel=1e-6)
    assert float(sens["r1.r"][i_out]) == pytest.approx(
        -5 * 1e3 / 4e6, rel=1e-6)


def test_dc_sensitivity_nonlinear_fd_check():
    # diode circuit: compare IFT sensitivity against finite differences
    def build(is_):
        cir = Circuit("dsens")
        cir.V("v1", "in", "0", dc=5.0)
        cir.R("r1", "in", "d", 1e3)
        cir.D("d1", "d", "0", **{"is": is_})
        return cir.compile()

    from cadnip_tpu import dc
    cc = build(1e-14)
    sens = dc_sensitivity(cc, "r1.r")
    i_d = cc.index_of("d")
    h = 1e-3
    p_hi = cc.alter(cc.params0(), **{"r1.r": 1e3 + h})
    p_lo = cc.alter(cc.params0(), **{"r1.r": 1e3 - h})
    fd = (float(dc(cc, p_hi)["d"]) - float(dc(cc, p_lo)["d"])) / (2 * h)
    assert float(sens["r1.r"][i_d]) == pytest.approx(fd, rel=1e-4)


def test_transweep_chunked_matches_full():
    cir = Circuit("rcs2")
    cir.V("vs", "in", "0", wave=Pulse(0.0, 1.0, tr=1e-9))
    cir.R("r1", "in", "out", 1e3)
    cir.C("c1", "out", "0", 1e-6)
    cc = cir.compile()
    rs = np.linspace(0.5e3, 2e3, 7)   # odd count: exercises padding
    full = transweep(cc, {"r1.r": rs}, (0, 1e-3), dt=2e-6)
    chk = transweep(cc, {"r1.r": rs}, (0, 1e-3), dt=2e-6, chunk=3)
    assert np.allclose(np.asarray(full.xs), np.asarray(chk.xs))
    assert np.asarray(chk.xs).shape[0] == 7
    assert np.all(np.asarray(chk.converged))


def test_dcsweep_neighbor_rescue():
    """Per-lane continuation rescue (reference warm-start sweeps,
    `src/sweeps.jl:492-532`): lanes whose cold solve fails are rerun
    seeded from the nearest CONVERGED neighbor. A 5-diode chain at up
    to 100 V with a deliberately crippled fallback chain fails cold on
    most lanes but converges from a neighbor's solution."""
    import jax
    import jax.numpy as jnp
    import cadnip_tpu as ct
    from cadnip_tpu.analyses.sweeps import batch_params
    from cadnip_tpu.mna.newton import make_dc_solver
    from cadnip_tpu.mna.spec import MODE_DCOP

    deck = """diode chain
.model dd d is=1e-15 n=1
vs in 0 dc 0
r1 in a 10
d1 a b dd
d2 b c dd
d3 c d dd
d4 d e dd
d5 e 0 dd
.end
"""
    spec = ct.SimSpec(max_newton_iters=5, gmin_steps=2, src_steps=2)
    cc = ct.parse_spice(deck, spec=spec)
    vals = np.linspace(0.0, 100.0, 21)

    # the raw cold vmapped solve (pre-rescue behavior) must fail on the
    # hard lanes — otherwise this test exercises nothing
    bparams, axes = batch_params(cc, {"vs.dc": vals})
    solver = cc.jit(jax.vmap(make_dc_solver(cc), in_axes=(None, axes, None)))
    cold = solver(jnp.zeros(cc.n), bparams, cc.spec.dyn(mode=MODE_DCOP))
    cold_conv = np.asarray(cold.converged)
    assert cold_conv.any() and not cold_conv.all()

    sw = dcsweep(cc, {"vs.dc": vals})
    assert np.asarray(sw.converged).all()
    # physics: v_j = n*vt*ln(I/Is) ~ 0.944 V per junction at ~9.5 A
    va = np.asarray(sw["a"])
    assert va[-1] == pytest.approx(5 * 0.9517, rel=0.02)
    assert np.all(np.diff(va[1:]) > 0)      # monotone in drive
