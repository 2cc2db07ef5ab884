"""DC operating-point tests against analytical solutions
(mirrors reference test/mna/core.jl + test/basic.jl strategy)."""
import numpy as np
import pytest

from cadnip_tpu import Circuit, SimSpec, dc
from cadnip_tpu.mna.devices import CCCS, CCVS, VCCS, VCVS


def test_voltage_divider():
    # the reference README quick-start: 5V over two 1k -> 2.5V
    cir = Circuit("divider")
    cir.V("v1", "in", "0", dc=5.0)
    cir.R("r1", "in", "out", 1e3)
    cir.R("r2", "out", "0", 1e3)
    cc = cir.compile()
    sol = dc(cc)
    assert bool(sol.converged)
    assert sol["out"] == pytest.approx(2.5, rel=1e-9)
    assert sol["in"] == pytest.approx(5.0, rel=1e-9)
    # branch current through the source: 5V / 2k, flowing p->n inside
    assert sol.i("v1") == pytest.approx(-2.5e-3, rel=1e-9)


def test_current_source_and_parallel_resistors():
    cir = Circuit("isrc")
    cir.I("i1", "0", "a", dc=1e-3)   # pushes 1 mA into node a
    cir.R("r1", "a", "0", 1e3)
    cir.R("r2", "a", "0", 1e3)
    sol = dc(cir.compile())
    assert sol["a"] == pytest.approx(0.5, rel=1e-9)


def test_vcvs_gain():
    cir = Circuit("vcvs")
    cir.V("vin", "in", "0", dc=0.25)
    cir.add(VCVS, "e1", ("out", "0", "in", "0"), gain=4.0)
    cir.R("rl", "out", "0", 1e3)
    sol = dc(cir.compile())
    assert sol["out"] == pytest.approx(1.0, rel=1e-9)


def test_vccs():
    cir = Circuit("vccs")
    cir.V("vin", "in", "0", dc=1.0)
    # gm*vin = 2mA pulled from node out -> out = -2mA * 1k = -2V... sign:
    # current flows out->gnd inside the device when (cp-cn) positive
    cir.add(VCCS, "g1", ("out", "0", "in", "0"), gm=2e-3)
    cir.R("rl", "out", "0", 1e3)
    sol = dc(cir.compile())
    assert sol["out"] == pytest.approx(-2.0, rel=1e-9)


def test_cccs_senses_vsource():
    cir = Circuit("cccs")
    cir.V("vin", "in", "0", dc=1.0)
    cir.R("r1", "in", "0", 1e3)           # 1 mA through vin (i = -1mA conv.)
    cir.add(CCCS, "f1", ("out", "0"), sense="vin", gain=2.0)
    cir.R("rl", "out", "0", 1e3)
    sol = dc(cir.compile())
    # i(vin) = -1mA; F injects gain*i out of node out: v = -gain*i*R = +2V
    assert sol["out"] == pytest.approx(2.0, rel=1e-9)


def test_ccvs_senses_vsource():
    cir = Circuit("ccvs")
    cir.V("vin", "in", "0", dc=1.0)
    cir.R("r1", "in", "0", 1e3)
    cir.add(CCVS, "h1", ("out", "0"), sense="vin", r=5e3)
    cir.R("rl", "out", "0", 1e3)
    sol = dc(cir.compile())
    assert sol["out"] == pytest.approx(5e3 * -1e-3, rel=1e-9)


def test_diode_resistor_op():
    # series V-R-D: solve IS*(exp(v/vt)-1) = (5-v)/R with numpy Newton
    is_, n, r, vsrc = 1e-14, 1.0, 1e3, 5.0
    vt = 1.380649e-23 * (27 + 273.15) / 1.602176634e-19
    v = 0.6
    for _ in range(200):
        f = is_ * (np.exp(v / (n * vt)) - 1) - (vsrc - v) / r
        df = is_ / (n * vt) * np.exp(v / (n * vt)) + 1 / r
        v -= f / df
    cir = Circuit("dr")
    cir.V("v1", "in", "0", dc=vsrc)
    cir.R("r1", "in", "d", r)
    cir.D("d1", "d", "0", **{"is": is_, "n": n})
    sol = dc(cir.compile())
    assert bool(sol.converged)
    assert sol["d"] == pytest.approx(v, rel=1e-6)


def test_diode_with_rs():
    # same but with series rs inside the device: total R = r + rs
    is_, r, rs, vsrc = 1e-14, 1e3, 100.0, 5.0
    vt = 1.380649e-23 * (27 + 273.15) / 1.602176634e-19
    v = 0.6
    for _ in range(200):
        f = is_ * (np.exp(v / vt) - 1) - (vsrc - v) / (r + rs)
        df = is_ / vt * np.exp(v / vt) + 1 / (r + rs)
        v -= f / df
    i_d = is_ * (np.exp(v / vt) - 1)
    cir = Circuit("drs")
    cir.V("v1", "in", "0", dc=vsrc)
    cir.R("r1", "in", "d", r)
    cir.D("d1", "d", "0", **{"is": is_, "rs": rs})
    sol = dc(cir.compile())
    assert bool(sol.converged)
    assert sol["d"] == pytest.approx(v + i_d * rs, rel=1e-6)


def test_mosfet_square_law():
    # NMOS common source in saturation: Id = 0.5*kp*W/L*(vgs-vth)^2
    kp, w, l, vth, vdd, rd = 110e-6, 10e-6, 1e-6, 0.7, 5.0, 1e3
    vgs = 1.7
    i_d = 0.5 * kp * w / l * (vgs - vth) ** 2
    cir = Circuit("cs")
    cir.V("vdd", "vdd", "0", dc=vdd)
    cir.V("vg", "g", "0", dc=vgs)
    cir.R("rd", "vdd", "d", rd)
    cir.M("m1", "d", "g", "0", "0", kp=kp, w=w, l=l, vth=vth)
    sol = dc(cir.compile(SimSpec(gmin=0.0)))
    assert bool(sol.converged)
    assert sol["d"] == pytest.approx(vdd - rd * i_d, rel=1e-6)


def test_inductor_is_dc_short():
    cir = Circuit("l")
    cir.V("v1", "in", "0", dc=3.0)
    cir.L("l1", "in", "out", 1e-3)
    cir.R("r1", "out", "0", 1e3)
    sol = dc(cir.compile())
    assert sol["out"] == pytest.approx(3.0, rel=1e-9)
    assert sol.i("l1") == pytest.approx(3e-3, rel=1e-9)


def test_capacitor_is_dc_open():
    cir = Circuit("c")
    cir.V("v1", "in", "0", dc=3.0)
    cir.R("r1", "in", "mid", 1e3)
    cir.C("c1", "mid", "0", 1e-6)
    cir.R("r2", "mid", "0", 1e3)
    sol = dc(cir.compile())
    assert sol["mid"] == pytest.approx(1.5, rel=1e-9)


def test_alter():
    cir = Circuit("alter")
    cir.V("v1", "in", "0", dc=5.0)
    cir.R("r1", "in", "out", 1e3)
    cir.R("r2", "out", "0", 1e3)
    cc = cir.compile()
    p = cc.alter(cc.params0(), **{"r2.r": 3e3})
    sol = dc(cc, p)
    assert sol["out"] == pytest.approx(3.75, rel=1e-9)


def test_alter_unknown_param_raises():
    cir = Circuit("alter2")
    cir.V("v1", "in", "0", dc=5.0)
    cir.R("r1", "in", "0", 1e3)
    cc = cir.compile()
    with pytest.raises(KeyError):
        cc.alter(cc.params0(), **{"r1.typo": 1.0})


def test_gmin_stepping_rescues_hard_start():
    # back-to-back diode stack from 0V start needs homotopy help
    cir = Circuit("stack")
    cir.V("v1", "in", "0", dc=30.0)
    prev = "in"
    for k in range(40):
        nxt = f"n{k}"
        cir.D(f"d{k}", prev, nxt, **{"is": 1e-15})
        prev = nxt
    cir.R("rl", prev, "0", 10.0)
    sol = dc(cir.compile())
    assert bool(sol.converged)
    # each junction drops ~ same voltage; sanity-check the ladder midpoint
    assert float(sol["n19"]) < 30.0
    assert float(sol["n19"]) > 0.0


def test_currents_and_opinfo_on_sources():
    # regression: 2-D packed waveform params must slice the INSTANCE axis
    # (currents() on any V/I source used to raise)
    cir = Circuit("cur")
    cir.V("v1", "in", "0", dc=5.0)
    cir.R("r1", "in", "out", 1e3)
    cir.R("r2", "out", "0", 1e3)
    sol = dc(cir.compile())
    iv = sol.currents("v1")
    assert iv["p"] == pytest.approx(-2.5e-3, rel=1e-6)
    assert iv["n"] == pytest.approx(+2.5e-3, rel=1e-6)
    ir = sol.currents("r1")
    assert ir["p"] == pytest.approx(+2.5e-3, rel=1e-6)


def test_dc_resnorm_is_real():
    # resnorm must be the actual final KCL residual, not a placeholder
    cir = Circuit("rn")
    cir.V("v1", "in", "0", dc=5.0)
    cir.R("r1", "in", "out", 1e3)
    cir.D("d1", "out", "0", **{"is": 1e-14})
    sol = dc(cir.compile())
    rn = float(sol.resnorm)
    assert bool(sol.converged)
    # residual at the final Newton evaluation point: small but nonzero
    assert 0.0 < rn < 1e-3
