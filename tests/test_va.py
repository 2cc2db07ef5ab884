"""Verilog-A compiler tests: preprocess, parse, compile to DeviceModel,
solve through the standard analyses (reference test strategy for vasim)."""
import numpy as np
import pytest

from cadnip_tpu import Circuit, SimSpec, dc, tran, ac
from cadnip_tpu.va.codegen import compile_va
from cadnip_tpu.va.parser import parse_va, parse_va_number

VA_RESISTOR = """
`include "disciplines.vams"
module my_res(p, n);
  inout p, n;
  electrical p, n;
  parameter real r = 1k from (0:inf);
  analog begin
    I(p, n) <+ V(p, n) / r;
  end
endmodule
"""

VA_RC = """
`include "disciplines.vams"
module my_rc(p, n);
  inout p, n;
  electrical p, n;
  parameter real r = 1k;
  parameter real c = 1n;
  analog begin
    I(p, n) <+ V(p, n) / r + ddt(c * V(p, n));
  end
endmodule
"""

VA_DIODE = """
`include "disciplines.vams"
module my_diode(a, c);
  inout a, c;
  electrical a, c;
  parameter real is_ = 1e-14 from (0:1];
  parameter real n = 1.0;
  parameter real cj = 0.0;
  real id, vd;
  analog begin
    vd = V(a, c);
    id = is_ * (limexp(vd / (n * $vt)) - 1.0);
    I(a, c) <+ id;
    I(a, c) <+ ddt(cj * vd);
    I(a, c) <+ white_noise(2.0 * 1.602176634e-19 * abs(id), "shot");
  end
endmodule
"""

VA_VSRC = """
module my_vsrc(p, n);
  inout p, n;
  electrical p, n;
  parameter real level = 2.5;
  analog begin
    V(p, n) <+ level;
  end
endmodule
"""

VA_DEFAULTS = """
module defdep(p, n);
  inout p, n;
  electrical p, n;
  parameter real w = 2u;
  parameter real l = 1u;
  parameter real rsh = 100;
  parameter real r = rsh * l / w;   // depends on other params
  analog
    I(p, n) <+ V(p, n) / r;
endmodule
"""

VA_INTERNAL = """
module rdiv(p, n);
  inout p, n;
  electrical p, n, mid;
  parameter real r1 = 1k;
  parameter real r2 = 1k;
  analog begin
    I(p, mid) <+ V(p, mid) / r1;
    I(mid, n) <+ V(mid, n) / r2;
  end
endmodule
"""


def test_va_number_suffixes():
    assert parse_va_number("1K") == 1e3
    assert parse_va_number("2.5u") == pytest.approx(2.5e-6)
    assert parse_va_number("1M") == 1e6     # VA: M is mega (not milli!)
    assert parse_va_number("3m") == 3e-3
    assert parse_va_number("10f") == pytest.approx(10e-15)


def test_parse_module_structure():
    mods = parse_va(VA_DIODE)
    assert len(mods) == 1
    m = mods[0]
    assert m.name == "my_diode"
    assert [p[0] for p in m.ports] == ["a", "c"]
    assert set(m.parameters) == {"is_", "n", "cj"}
    assert m.parameters["is_"].ranges


def test_va_resistor_dc():
    model = compile_va(VA_RESISTOR)["my_res"]
    cir = Circuit("va-r")
    cir.V("v1", "in", "0", dc=5.0)
    cir.add(model, "x1", ("in", "out"), **{"r": 1e3, "r__given": 1.0})
    cir.add(model, "x2", ("out", "0"))   # default r=1k
    sol = dc(cir.compile())
    assert sol["out"] == pytest.approx(2.5, rel=1e-9)


def test_va_rc_transient():
    model = compile_va(VA_RC)["my_rc"]
    cir = Circuit("va-rc")
    from cadnip_tpu import Pulse
    cir.V("v1", "in", "0", wave=Pulse(0.0, 1.0, tr=1e-9))
    cir.R("rs", "in", "a", 1e3)
    # parallel RC to ground through the VA device (r=1meg so ~pure C)
    cir.add(model, "x1", ("a", "0"), **{"r": 1e9, "r__given": 1.0,
                                        "c": 1e-6, "c__given": 1.0})
    sol = tran(cir.compile(), (0, 5e-3), dt=5e-6)
    v = np.asarray(sol["a"])
    expect = 1.0 - np.exp(-sol.ts / 1e-3)
    assert np.max(np.abs(v - expect)) < 5e-3


def test_va_diode_matches_builtin():
    model = compile_va(VA_DIODE)["my_diode"]
    cir = Circuit("va-d")
    cir.V("v1", "in", "0", dc=5.0)
    cir.R("r1", "in", "d", 1e3)
    cir.add(model, "d1", ("d", "0"))
    sol = dc(cir.compile())
    assert bool(sol.converged)
    cir2 = Circuit("builtin-d")
    cir2.V("v1", "in", "0", dc=5.0)
    cir2.R("r1", "in", "d", 1e3)
    cir2.D("d1", "d", "0", **{"is": 1e-14})
    sol2 = dc(cir2.compile())
    assert float(sol["d"]) == pytest.approx(float(sol2["d"]), rel=1e-6)


def test_va_diode_noise():
    from cadnip_tpu import noise
    model = compile_va(VA_DIODE)["my_diode"]
    cir = Circuit("va-dn")
    cir.V("v1", "in", "0", dc=5.0)
    cir.R("r1", "in", "d", 1e3)
    cir.add(model, "d1", ("d", "0"))
    cc = cir.compile()
    sol = noise(cc, "d", [1e3])
    assert "d1" in sol.contributions
    assert sol.contributions["d1"][0] > 0


def test_va_voltage_contribution():
    model = compile_va(VA_VSRC)["my_vsrc"]
    cir = Circuit("va-v")
    cir.add(model, "vs", ("a", "0"))
    cir.R("r1", "a", "0", 1e3)
    sol = dc(cir.compile())
    assert sol["a"] == pytest.approx(2.5, rel=1e-9)


def test_va_param_default_dependencies():
    model = compile_va(VA_DEFAULTS)["defdep"]
    cir = Circuit("va-dep")
    cir.V("v1", "in", "0", dc=1.0)
    # override w -> r default must recompute: r = 100 * 1u / 4u = 25
    cir.add(model, "x1", ("in", "0"), **{"w": 4e-6, "w__given": 1.0})
    cc = cir.compile()
    sol = dc(cc)
    assert sol.i("v1") == pytest.approx(-1.0 / 25.0, rel=1e-9)


def test_va_internal_node():
    model = compile_va(VA_INTERNAL)["rdiv"]
    cir = Circuit("va-int")
    cir.V("v1", "in", "0", dc=4.0)
    cir.add(model, "x1", ("in", "0"))
    cc = cir.compile()
    sol = dc(cc)
    assert sol["x1#mid"] == pytest.approx(2.0, rel=1e-9)


def test_va_conditionals_and_loops():
    src = """
module condloop(p, n);
  inout p, n;
  electrical p, n;
  parameter real r = 1k;
  parameter integer segs = 4;
  real g;
  integer k;
  analog begin
    g = 0.0;
    for (k = 0; k < segs; k = k + 1)
      g = g + 1.0 / (r * segs);
    if (V(p, n) > 0)
      I(p, n) <+ g * V(p, n);
    else
      I(p, n) <+ g * V(p, n) * 2.0;
  end
endmodule
"""
    model = compile_va(src)["condloop"]
    cir = Circuit("cl")
    cir.I("i1", "0", "a", dc=1e-3)
    cir.add(model, "x1", ("a", "0"))
    sol = dc(cir.compile())
    assert sol["a"] == pytest.approx(1.0, rel=1e-6)   # g = 1/1k
    cir2 = Circuit("cl2")
    cir2.I("i1", "a", "0", dc=1e-3)   # pull current out -> negative v
    cir2.add(model, "x1", ("a", "0"))
    sol2 = dc(cir2.compile())
    assert sol2["a"] == pytest.approx(-0.5, rel=1e-6)  # double conductance


def test_va_preprocessor_macros():
    src = """
`define TWO_R(x) ((x)*2)
`define EXTRA 100
`ifdef EXTRA
module m(p, n);
  inout p, n;
  electrical p, n;
  parameter real r = 1k;
  analog I(p, n) <+ V(p, n) / (`TWO_R(r) + `EXTRA);
endmodule
`endif
"""
    model = compile_va(src)["m"]
    cir = Circuit("pp")
    cir.V("v1", "a", "0", dc=2.1)
    cir.add(model, "x1", ("a", "0"))
    sol = dc(cir.compile())
    assert sol.i("v1") == pytest.approx(-2.1 / 2100.0, rel=1e-9)


def test_barrier_fencing_preserves_values(monkeypatch):
    """CADNIP_VA_BARRIER=K fences every K-th traced assignment with
    lax.optimization_barrier (the axon-TPU big-model fusion workaround);
    it must be semantically invisible."""
    import cadnip_tpu as ct

    def solve():
        model = compile_va(VA_DIODE)["my_diode"]
        c = Circuit("dio")
        c.V("vs", "in", "0", dc=1.0)
        c.R("rs", "in", "a", 1e3)
        c.add(model, "d1", ("a", "0"))
        sol = dc(c.compile())
        assert bool(sol.converged)
        return float(sol["a"])

    base = solve()
    monkeypatch.setenv("CADNIP_VA_BARRIER", "3")
    fenced = solve()
    assert fenced == pytest.approx(base, rel=0, abs=1e-12)
