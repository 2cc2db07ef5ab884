"""Miniature PDK flow (modeled on the reference's `test/testpdk/`): a
.lib file with typical/fast/slow corner sections, a PDK-shipped
Verilog-A resistor, jlpkg://-style package path resolution, and corner
selection changing simulation results."""
import os

import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.frontend.elaborate import register_pdk, simulate

PDK_LIB = """* testpdk.spice
.lib typical
.param rsheet=1k
.param kp_n=200u
.model nch nmos vto=0.5 kp={kp_n}
.endl

.lib fast
.param rsheet=800
.param kp_n=260u
.model nch nmos vto=0.42 kp={kp_n}
.endl

.lib slow
.param rsheet=1.25k
.param kp_n=150u
.model nch nmos vto=0.6 kp={kp_n}
.endl
"""

PDK_VA = """
`include "disciplines.vams"
module pdkres(p, n);
  inout p, n;
  electrical p, n;
  parameter real rs = 1k from (0:inf);
  parameter real mult = 1 from (0:inf);
  analog I(p, n) <+ V(p, n) * mult / rs;
endmodule
"""


@pytest.fixture(scope="module")
def pdk_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("testpdk")
    (d / "testpdk.spice").write_text(PDK_LIB)
    (d / "pdkres.va").write_text(PDK_VA)
    register_pdk("testpdk", str(d))
    return str(d)


def _divider(section):
    return f"""pdk divider ({section})
.lib "jlpkg://testpdk/testpdk.spice" {section}
.hdl "jlpkg://testpdk/pdkres.va"
v1 in 0 dc 2
x1 in mid pdkres rs={{rsheet}}
x2 mid 0 pdkres rs={{rsheet}}
.op
"""


def test_corner_selection_changes_results(pdk_dir):
    for section, rs in (("typical", 1000.0), ("fast", 800.0),
                        ("slow", 1250.0)):
        res = simulate(_divider(section))
        sol = res["op"]
        assert bool(sol.converged)
        # symmetric divider: mid = 1 V regardless; current = 2/(2*rs)
        assert float(sol["mid"]) == pytest.approx(1.0, rel=1e-9)
        i = float(sol.i("v1"))
        assert i == pytest.approx(-2.0 / (2 * rs), rel=1e-9)


def test_corner_mos_model(pdk_dir):
    deck = """pdk mos
.lib "jlpkg://testpdk/testpdk.spice" {sec}
vd d 0 dc 2
vg g 0 dc 1.5
m1 d g 0 0 nch w=10u l=1u
.op
"""
    ids = {}
    for sec in ("typical", "fast", "slow"):
        res = simulate(deck.replace("{sec}", sec))
        sol = res["op"]
        ids[sec] = sol.op_info("m1")["ids"]
    assert ids["fast"] > ids["typical"] > ids["slow"] > 0


def test_unknown_pdk_package_errors(pdk_dir):
    with pytest.raises(ValueError, match="unknown PDK package"):
        simulate("""bad
.lib "jlpkg://nosuchpdk/x.spice" typical
r1 a 0 1k
.op
""")
