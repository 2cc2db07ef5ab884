"""Operating-point info: terminal currents and model op-vars
(reference test/opinfo.jl analogue)."""
import numpy as np
import pytest

from cadnip_tpu import Circuit, SimSpec, dc
from cadnip_tpu.va.codegen import compile_va


def test_terminal_currents_resistor():
    cir = Circuit("tc")
    cir.V("v1", "in", "0", dc=5.0)
    cir.R("r1", "in", "out", 1e3)
    cir.R("r2", "out", "0", 1e3)
    sol = dc(cir.compile())
    c = sol.currents("r1")
    assert c["p"] == pytest.approx(2.5e-3, rel=1e-9)
    assert c["n"] == pytest.approx(-2.5e-3, rel=1e-9)


def test_mosfet_opvars():
    kp, w, l, vth, vgs = 110e-6, 20e-6, 1e-6, 0.7, 1.0
    cir = Circuit("op")
    cir.V("vdd", "vdd", "0", dc=5.0)
    cir.V("vg", "g", "0", dc=vgs)
    cir.R("rd", "vdd", "d", 10e3)
    cir.M("m1", "d", "g", "0", "0", kp=kp, w=w, l=l, vth=vth)
    sol = dc(cir.compile(SimSpec(gmin=0.0)))
    ov = sol.op_info("m1")
    assert ov["ids"] == pytest.approx(0.5 * kp * w / l * 0.3 ** 2, rel=1e-6)
    assert ov["gm"] == pytest.approx(kp * w / l * 0.3, rel=1e-6)
    assert ov["vgs"] == pytest.approx(1.0, rel=1e-9)


def test_va_opvars():
    src = """
module opv(p, n);
  inout p, n;
  electrical p, n;
  parameter real r = 2k;
  (* desc="branch current", units="A" *) real ibr;
  analog begin
    ibr = V(p, n) / r;
    I(p, n) <+ ibr;
  end
endmodule
"""
    model = compile_va(src)["opv"]
    cir = Circuit("vaop")
    cir.V("v1", "a", "0", dc=4.0)
    cir.add(model, "x1", ("a", "0"))
    sol = dc(cir.compile())
    ov = sol.op_info("x1")
    assert ov["ibr"] == pytest.approx(2e-3, rel=1e-9)
