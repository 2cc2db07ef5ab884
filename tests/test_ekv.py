"""EKV compact model (VA-compiled) behavior tests."""
import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.models.ekv import compile_ekv

KB = 1.380649e-23
T0 = 300.15


@pytest.fixture(scope="module")
def ekv():
    return compile_ekv()


def _given(**kw):
    out = {}
    for k, v in kw.items():
        out[k] = v
        out[k + "__given"] = 1.0
    return out


def test_strong_inversion_saturation(ekv):
    # strong inversion saturation: ID ~ beta/(2n) (VG - VTO)^2
    vto, n, kp, w, l = 0.5, 1.3, 200e-6, 10e-6, 1e-6
    vg = 1.5
    cir = ct.Circuit("ekv-sat")
    cir.V("vdd", "d", "0", dc=2.5)
    cir.V("vg", "g", "0", dc=vg)
    cir.add(ekv, "m1", ("d", "g", "0", "0"),
            **_given(vto=vto, n=n, kp=kp, w=w, l=l))
    sol = ct.dc(cir.compile())
    assert bool(sol.converged)
    i_d = sol.currents("m1")["d"]
    expect = kp * w / l / (2 * n) * (vg - vto) ** 2
    assert i_d == pytest.approx(expect, rel=0.05)
    ov = sol.op_info("m1")
    assert ov["id_op"] == pytest.approx(i_d, rel=1e-6)


def test_weak_inversion_slope(ekv):
    # subthreshold: ID proportional to exp(vg/(n vt)): 60*n mV/decade
    vto, n = 0.5, 1.3
    ids = []
    for vg in (0.25, 0.35):
        cir = ct.Circuit(f"ekv-wi-{vg}")
        cir.V("vdd", "d", "0", dc=1.0)
        cir.V("vg", "g", "0", dc=vg)
        cir.add(ekv, "m1", ("d", "g", "0", "0"), **_given(vto=vto, n=n))
        sol = ct.dc(cir.compile())
        ids.append(sol.currents("m1")["d"])
    vt = KB * T0 / 1.602176634e-19
    slope = np.log(ids[1] / ids[0]) / 0.1
    assert slope == pytest.approx(1 / (n * vt), rel=0.05)


def test_pmos_sign(ekv):
    cir = ct.Circuit("ekv-p")
    cir.V("vss", "d", "0", dc=-2.0)
    cir.V("vg", "g", "0", dc=-1.5)
    cir.add(ekv, "m1", ("d", "g", "0", "0"), **_given(sign=-1))
    sol = ct.dc(cir.compile())
    i_d = sol.currents("m1")["d"]
    assert i_d < -1e-6   # PMOS conducts: current out of the drain node


def test_ekv_inverter_transient(ekv):
    cir = ct.Circuit("ekv-inv")
    cir.V("vdd", "vdd", "0", dc=2.5)
    cir.V("vin", "g", "0", wave=ct.Pulse(0.0, 2.5, td=1e-9, tr=50e-12,
                                         tf=50e-12, pw=4e-9, per=1e30))
    cir.R("rd", "vdd", "d", 20e3)
    cir.add(ekv, "m1", ("d", "g", "0", "0"), **_given(vto=0.6))
    cir.C("cl", "d", "0", 10e-15)
    sol = ct.tran(cir.compile(), (0, 8e-9), dt=2e-11)
    assert bool(sol.converged)
    vd = np.asarray(sol["d"])
    assert vd[sol.ts < 0.9e-9].min() > 2.4     # off: high
    mid = (sol.ts > 2e-9) & (sol.ts < 4.5e-9)
    assert vd[mid].max() < 0.6                  # on: low


def test_ekv_noise(ekv):
    cir = ct.Circuit("ekv-n")
    cir.V("vdd", "vdd", "0", dc=2.5)
    cir.V("vg", "g", "0", dc=1.2)
    cir.R("rd", "vdd", "d", 5e3)
    cir.add(ekv, "m1", ("d", "g", "0", "0"),
            **_given(kf=1e-24, af=1.0))
    cc = cir.compile()
    sol = ct.noise(cc, "d", [1e2, 1e6])
    c = sol.contributions["m1"]
    assert c[0] > c[1] > 0     # flicker dominates at low f
