"""VA node collapse: `V(a,b) <+ 0` short-circuit branches merge their nodes
at elaboration instead of carrying a constraint row + branch current
(reference detect_short_circuits, `src/vasim.jl:2723`). Collapse guards are
decided per instance from its effective parameters (PSP/BSIM RDSMOD-style
mode switches)."""
import numpy as np
import pytest

from cadnip_tpu import dc, parse_spice

VA = """
`include "disciplines.vams"
module res2(a, b);
  inout a, b;
  electrical a, b, m;
  parameter real r1 = 1k;
  parameter real r2 = 0;
  analog begin
    I(a, m) <+ V(a, m) / r1;
    if (r2 == 0)
      V(m, b) <+ 0;
    else
      I(m, b) <+ V(m, b) / r2;
  end
endmodule

module shnt(a);
  inout a;
  electrical a, x;
  parameter real r = 1k;
  parameter real en = 0;
  analog begin
    I(a, x) <+ V(a, x) / r;
    if (en == 0)
      V(x) <+ 0;
    else
      I(x) <+ V(x) * 1e-3;
  end
endmodule
"""


@pytest.fixture()
def va_path(tmp_path):
    p = tmp_path / "col.va"
    p.write_text(VA)
    return str(p)


def test_pair_collapse_merges_nodes(va_path):
    cc = parse_spice(f"""collapse pair
.hdl "{va_path}"
v1 in 0 dc 3
x1 in out res2 r1=1k
r1 out 0 2k
""")
    # collapsed: no internal 'm' unknown, no branch current -> only
    # in, out, v1#i = 3 unknowns
    assert cc.n == 3
    sol = dc(cc)
    assert sol["out"] == pytest.approx(2.0, rel=1e-9)
    # the merged internal is still addressable, aliased to its target
    assert float(np.asarray(sol["x1#m"])) == pytest.approx(
        float(np.asarray(sol["out"])))


def test_no_collapse_when_param_disables(va_path):
    cc = parse_spice(f"""no collapse
.hdl "{va_path}"
v1 in 0 dc 3
x1 in out res2 r1=1k r2=2k
r1 out 0 3k
""")
    # m survives, plus the (open) switch-branch current for the untaken
    # V(m,b)<+0 arm: in, out, m, i_m_b, v1#i = 5 unknowns
    assert cc.n == 5
    sol = dc(cc)
    assert sol["out"] == pytest.approx(1.5, rel=1e-9)


def test_mixed_instances_split_groups(va_path):
    # one collapsed + one non-collapsed instance of the same module must
    # land in different vmapped groups with different structures
    cc = parse_spice(f"""mixed
.hdl "{va_path}"
v1 in 0 dc 3
x1 in a res2 r1=1k
ra a 0 2k
x2 in b res2 r1=1k r2=2k
rb b 0 3k
""")
    sol = dc(cc)
    assert sol["a"] == pytest.approx(2.0, rel=1e-9)
    assert sol["b"] == pytest.approx(1.5, rel=1e-9)


def test_ground_collapse(va_path):
    cc = parse_spice(f"""collapse to ground
.hdl "{va_path}"
i1 0 in dc 1m
x1 in shnt r=1k
""")
    # x grounded: only 'in' remains
    assert cc.n == 1
    sol = dc(cc)
    assert sol["in"] == pytest.approx(1.0, rel=1e-9)


def test_ground_collapse_disabled(va_path):
    cc = parse_spice(f"""shunt kept
.hdl "{va_path}"
i1 0 in dc 1m
x1 in shnt r=1k en=1
""")
    sol = dc(cc)
    # 1mA through r then the 1e-3 S shunt: V(x)=1V, V(in)=2V
    assert sol["in"] == pytest.approx(2.0, rel=1e-9)
