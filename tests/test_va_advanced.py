"""VA advanced operators: $table_model, laplace filters
(reference test/mna/table_model.jl, test/mna/laplace.jl analogues)."""
import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.va.codegen import compile_va


def test_table_model_1d(tmp_path):
    tbl = tmp_path / "r.tbl"
    # nonlinear conductance: i(v) sampled on a grid (i = v^2 shape)
    vs = np.linspace(-2, 2, 41)
    tbl.write_text("\n".join(f"{v} {v**3}" for v in vs))
    src = f"""
module tabres(p, n);
  inout p, n; electrical p, n;
  analog I(p, n) <+ $table_model(V(p, n), "{tbl}");
endmodule
"""
    model = compile_va(src)["tabres"]
    cir = ct.Circuit("tab")
    cir.V("v1", "a", "0", dc=1.2)
    cir.add(model, "x1", ("a", "0"))
    sol = ct.dc(cir.compile())
    # current through the source equals -i(1.2) = -(1.2^3) interpolated
    assert float(sol.i("v1")) == pytest.approx(-(1.2 ** 3), rel=1e-2)


def test_table_model_2d(tmp_path):
    tbl = tmp_path / "g.tbl"
    rows = []
    for x in np.linspace(0, 2, 11):
        for y in np.linspace(0, 1, 6):
            rows.append(f"{x} {y} {2*x + 3*y}")
    tbl.write_text("\n".join(rows))
    src = f"""
module tab2(p, n, c);
  inout p, n, c; electrical p, n, c;
  analog I(p, n) <+ $table_model(V(p, n), V(c), "{tbl}") * 1e-3;
endmodule
"""
    model = compile_va(src)["tab2"]
    cir = ct.Circuit("tab2")
    cir.V("v1", "a", "0", dc=1.5)
    cir.V("vc", "c", "0", dc=0.5)
    cir.add(model, "x1", ("a", "0", "c"))
    sol = ct.dc(cir.compile())
    assert float(sol.i("v1")) == pytest.approx(-(2*1.5 + 3*0.5)*1e-3,
                                               rel=1e-6)


def test_laplace_nd_lowpass():
    # H(s) = 1/(1 + s/w0): VA-filtered source vs analytic RC response
    w0 = 2 * np.pi * 1e3
    src = f"""
module lp1(p, n, ctl);
  inout p, n, ctl; electrical p, n, ctl;
  analog V(p, n) <+ laplace_nd(V(ctl), {{1.0}}, {{1.0, {1.0/w0}}});
endmodule
"""
    model = compile_va(src)["lp1"]
    cir = ct.Circuit("lp")
    cir.V("vs", "in", "0", dc=0.0, acmag=1.0)
    cir.add(model, "f1", ("out", "0", "in"))
    cir.R("rl", "out", "0", 1e6)
    cc = cir.compile()
    freqs = np.array([1e2, 1e3, 1e4])
    a = ct.ac(cc, freqs)
    h = a["out"]
    expect = 1.0 / (1.0 + 1j * 2 * np.pi * freqs / w0)
    assert np.allclose(h, expect, rtol=1e-6)


def test_laplace_transient_step():
    # first-order lowpass step response: 1 - exp(-w0 t)
    w0 = 1e6
    src = f"""
module lp2(p, n, ctl);
  inout p, n, ctl; electrical p, n, ctl;
  analog V(p, n) <+ laplace_nd(V(ctl), {{1.0}}, {{1.0, {1.0/w0}}});
endmodule
"""
    model = compile_va(src)["lp2"]
    cir = ct.Circuit("lps")
    cir.V("vs", "in", "0", wave=ct.Pulse(0.0, 1.0, tr=1e-9))
    cir.add(model, "f1", ("out", "0", "in"))
    cir.R("rl", "out", "0", 1e6)
    sol = ct.tran(cir.compile(), (0, 5e-6), dt=5e-9)
    assert bool(sol.converged)
    v = np.asarray(sol["out"])
    expect = 1.0 - np.exp(-w0 * sol.ts)
    assert np.max(np.abs(v - expect)) < 5e-3


def test_va_module_hierarchy():
    # parent instantiates two child resistor modules -> divider
    src = """
module res(p, n);
  inout p, n; electrical p, n;
  parameter real r = 1k;
  analog I(p, n) <+ V(p, n) / r;
endmodule

module divider(hi, lo, mid);
  inout hi, lo, mid; electrical hi, lo, mid;
  parameter real rtop = 1k;
  res #(.r(rtop)) rt(hi, mid);
  res #(.r(3k)) rb(mid, lo);
endmodule
"""
    models = compile_va(src)
    cir = ct.Circuit("vah")
    cir.V("v1", "in", "0", dc=4.0)
    cir.add(models["divider"], "x1", ("in", "0", "m"))
    sol = ct.dc(cir.compile())
    assert float(sol["m"]) == pytest.approx(3.0, rel=1e-9)


def test_va_hierarchy_internal_nodes():
    # child with an internal node: names are prefixed per instance
    src = """
module halfpi(a, b);
  inout a, b; electrical a, b, mid;
  analog begin
    I(a, mid) <+ V(a, mid) / 100;
    I(mid, b) <+ V(mid, b) / 300;
  end
endmodule

module two(x, y);
  inout x, y; electrical x, y, j;
  halfpi u1(x, j);
  halfpi u2(j, y);
endmodule
"""
    models = compile_va(src)
    cir = ct.Circuit("vah2")
    cir.V("v1", "in", "0", dc=8.0)
    cir.add(models["two"], "x1", ("in", "0"))
    sol = ct.dc(cir.compile())
    # total 800 ohm chain: 100/300/100/300 -> node j at 8*(400/800)=4
    assert float(sol["x1#j"]) == pytest.approx(4.0, rel=1e-9)
    assert float(sol["x1#u1_mid"]) == pytest.approx(8 - 8 * 100 / 800,
                                                    rel=1e-9)


def test_va_dollar_limit_accelerates_convergence():
    # exponential junction with $limit: must converge from a cold start
    src = """
module vadiode_lim(a, c);
  inout a, c; electrical a, c;
  parameter real is_ = 1e-15;
  analog I(a, c) <+ is_ * (limexp($limit(V(a, c), "pnjlim", $vt, 0.7)
                                  / $vt) - 1.0);
endmodule
"""
    model = compile_va(src)["vadiode_lim"]
    assert model.residual_lim is not None
    assert model.n_lim_sites == 1
    cir = ct.Circuit("valim")
    cir.V("v1", "in", "0", dc=30.0)
    prev = "in"
    for k in range(10):   # stiff series chain, hopeless without limiting
        nxt = f"n{k}"
        cir.add(model, f"d{k}", (prev, nxt))
        prev = nxt
    cir.R("rl", prev, "0", 10.0)
    sol = ct.dc(cir.compile())
    assert bool(sol.converged)
    assert 0.0 < float(sol["n4"]) < 30.0
