"""VADistiller model-package tests: the reference's tier-1 compact models
(`/root/reference/models/VADistillerModels.jl/va/`) compiled by OUR VA
compiler and solved against hand-derived physics.

These are the industrial ngspice-distilled models (SPICE levels 1/2/3/6/9,
BSIM3/4, BJT, JFET, VDMOS) — the reference's whole L7 tier (SURVEY §2.6).
"""
import glob
import os

import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.va.codegen import load_va_file

VA_DIR = "/root/reference/models/VADistillerModels.jl/va"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VA_DIR), reason="reference model sources not present")

_cache = {}


def _load(name):
    if name not in _cache:
        models = load_va_file(os.path.join(VA_DIR, f"{name}.va"))
        _cache[name] = list(models.values())[0]
    return _cache[name]


def _given(kw):
    kw = dict(kw)
    kw.update({k + "__given": 1.0 for k in list(kw)})
    return kw


@pytest.mark.skipif(os.environ.get("CADNIP_INTEGRATION", "") != "1",
                    reason="integration group: compiles all 16 models "
                           "(BSIM3/BSIM4-scale; keeps the core suite in "
                           "minutes)")
def test_all_sixteen_models_compile():
    names = sorted(os.path.basename(f)[:-3]
                   for f in glob.glob(os.path.join(VA_DIR, "*.va")))
    assert len(names) == 16
    for n in names:
        m = _load(n)
        assert m.n_local >= len(m.terminals)


def test_mos1_square_law_saturation():
    # common source: id = 0.5*kp*(W/L)*(vgs-vto)^2 = 250uA -> vd = 2.5
    mos1 = _load("mos1")
    cir = ct.Circuit("mos1cs")
    cir.V("vdd", "vdd", "0", dc=5.0)
    cir.V("vg", "g", "0", dc=2.0)
    cir.R("rd", "vdd", "d", 10e3)
    cir.add(mos1, "m1", ("d", "g", "0", "0"),
            **_given(dict(vto=1.0, kp=50e-6, w=10e-6, l=1e-6)))
    sol = ct.dc(cir.compile())
    assert bool(sol.converged)
    assert float(sol["d"]) == pytest.approx(2.5, abs=1e-3)
    op = sol.op_info("m1")
    assert op["i_d"] == pytest.approx(250e-6, rel=1e-3)


@pytest.mark.integration
def test_diode_matches_builtin():
    dio = _load("diode")
    cir = ct.Circuit("vadist_diode")
    cir.V("v1", "in", "0", dc=5.0)
    cir.R("r1", "in", "out", 1e3)
    cir.add(dio, "d1", ("out", "0"))
    sol = ct.dc(cir.compile())
    assert bool(sol.converged)

    cir2 = ct.Circuit("builtin_diode")
    cir2.V("v1", "in", "0", dc=5.0)
    cir2.R("r1", "in", "out", 1e3)
    cir2.D("d1", "out", "0", **{"is": 1e-14})
    sol2 = ct.dc(cir2.compile())
    assert float(sol["out"]) == pytest.approx(float(sol2["out"]), rel=1e-4)


@pytest.mark.integration
def test_bjt_common_emitter():
    # ib = (5 - vbe)/430k ~ 9.8uA; ic = bf*ib ~ 0.98mA; vc = 10 - 2k*ic
    bjt = _load("bjt")
    cir = ct.Circuit("ce")
    cir.V("vcc", "vcc", "0", dc=10.0)
    cir.V("vb", "vbb", "0", dc=5.0)
    cir.R("rb", "vbb", "b", 430e3)
    cir.R("rc", "vcc", "c", 2e3)
    cir.add(bjt, "q1", ("c", "b", "0", "0"),
            **_given({"bf": 100.0, "is": 1e-16}))
    sol = ct.dc(cir.compile())
    assert bool(sol.converged)
    vb = float(sol["b"])
    vc = float(sol["c"])
    assert 0.7 < vb < 0.85
    ib = (5.0 - vb) / 430e3
    ic = (10.0 - vc) / 2e3
    assert ic == pytest.approx(100.0 * ib, rel=0.05)


@pytest.mark.integration
def test_jfet1_idss_point():
    # vgs = 0: id = beta*vt0^2 = 4 mA -> vd = 10 - 4 = 6
    j1 = _load("jfet1")
    cir = ct.Circuit("jf")
    cir.V("vdd", "vdd", "0", dc=10.0)
    cir.R("rd", "vdd", "d", 1e3)
    cir.add(j1, "jf1", ("d", "0", "0"),
            **_given(dict(vt0=-2.0, beta=1e-3)))
    sol = ct.dc(cir.compile())
    assert bool(sol.converged)
    assert float(sol["d"]) == pytest.approx(6.0, rel=1e-6)


def test_model_card_level_resolution():
    # .model level=3 resolves through the tier-1 registry to mos3.va
    # (reference ModelRegistry dispatch, `src/model_registry.jl:37-120`)
    deck = """* level3 cs
vdd vdd 0 dc 5
vg g 0 dc 2
rd vdd d 10k
m1 d g 0 0 nch w=10u l=1u
.model nch nmos level=3 vto=1 kp=50u
"""
    cc = ct.parse_spice(deck)
    assert any(g.model.name == "va:sp_mos3" for g in cc.groups)
    sol = ct.dc(cc)
    assert bool(sol.converged)
    assert float(sol["d"]) == pytest.approx(2.5, abs=1e-3)


def test_model_card_level1_stays_builtin():
    deck = """* level1 cs
vdd vdd 0 dc 5
vg g 0 dc 2
rd vdd d 10k
m1 d g 0 0 nch w=10u l=1u
.model nch nmos level=1 vto=1 kp=50u
"""
    cc = ct.parse_spice(deck)
    assert any(g.model.name == "mos1" for g in cc.groups)
    assert float(ct.dc(cc)["d"]) == pytest.approx(2.5, abs=1e-3)


def test_jfet_element_through_netlist():
    deck = """* jfet bias
vdd vdd 0 dc 10
rd vdd d 1k
j1 d 0 0 jm
.model jm njf vt0=-2 beta=1m
"""
    sol = ct.dc(ct.parse_spice(deck))
    assert bool(sol.converged)
    assert float(sol["d"]) == pytest.approx(6.0, rel=1e-6)


def test_leading_comment_is_title():
    # SPICE reads the first line as title even when it starts with '*';
    # elements on line 2 must not be swallowed
    deck = "* my title\nv1 in 0 dc 5\nr1 in 0 1k\n"
    cc = ct.parse_spice(deck)
    sol = ct.dc(cc)
    assert float(sol["in"]) == pytest.approx(5.0)
