"""Spectre dialect front-end tests."""
import numpy as np
import pytest

from cadnip_tpu import dc, simulate, tran
from cadnip_tpu.frontend.elaborate import parse_spice
from cadnip_tpu.frontend.spectre import (looks_like_spectre,
                                         parse_spectre_number)


def test_spectre_numbers_case_sensitive():
    assert parse_spectre_number("1M") == 1e6     # mega, unlike SPICE
    assert parse_spectre_number("1m") == 1e-3
    assert parse_spectre_number("2K") == 2e3
    assert parse_spectre_number("2k") == 2e3
    assert parse_spectre_number("10u") == pytest.approx(10e-6)


def test_detect_dialect():
    assert looks_like_spectre("simulator lang=spectre\nr1 (a b) resistor")
    assert looks_like_spectre("r1 (a b) resistor r=1k\n")
    assert not looks_like_spectre("title\nr1 a b 1k\n")


def test_spectre_divider():
    cc = parse_spice("""
simulator lang=spectre
v1 (in 0) vsource dc=5
r1 (in out) resistor r=1K
r2 (out 0) resistor r=1K
""")
    sol = dc(cc)
    assert sol["out"] == pytest.approx(2.5, rel=1e-9)


def test_spectre_parameters_and_subckt():
    cc = parse_spice("""
simulator lang=spectre
parameters rr=2K vv=6
subckt halver (a b)
  parameters r0=1K
  rt (a mid) resistor r=r0
  rb (mid b) resistor r=r0
ends halver
v1 (in 0) vsource dc=vv
x1 (in 0) halver r0=rr
""")
    sol = dc(cc)
    assert sol["x1.mid"] == pytest.approx(3.0, rel=1e-9)


def test_spectre_sources_and_tran():
    res = simulate("""
simulator lang=spectre
v1 (in 0) vsource type=pulse val0=0 val1=1 delay=0 rise=1n fall=1n
r1 (in out) resistor r=1K
c1 (out 0) capacitor c=1u
tr tran stop=5m step=5u
""")
    sol = res["tran"]
    assert bool(sol.converged)
    v = np.asarray(sol["out"])
    expect = 1.0 - np.exp(-sol.ts / 1e-3)
    assert np.max(np.abs(v - expect)) < 5e-3


def test_spectre_model_card():
    cc = parse_spice("""
simulator lang=spectre
model dmod d is=1e-14
v1 (in 0) vsource dc=5
r1 (in a) resistor r=1K
d1 (a 0) dmod
""")
    sol = dc(cc)
    assert bool(sol.converged)
    assert 0.5 < float(sol["a"]) < 0.8


def test_spectre_controlled_sources():
    cc = parse_spice("""
simulator lang=spectre
v1 (in 0) vsource dc=0.5
e1 (out 0 in 0) vcvs gain=4
rl (out 0) resistor r=1K
""")
    sol = dc(cc)
    assert sol["out"] == pytest.approx(2.0, rel=1e-9)


def test_spectre_unit_suffix_numbers():
    assert parse_spectre_number("1.8_V") == pytest.approx(1.8)
    assert parse_spectre_number("10k_Ohm") == pytest.approx(10e3)


def test_spectre_bsource_asap7_idiom():
    # `bsource v=expr` with $time/pi/** — the idiom of the reference's
    # asap7 deck (`test/bsimcmg/asap7_inv.scs`)
    import numpy as np
    src = """simulator lang=spectre
VScc (VDD 0) vsource type=dc dc=1.8_V
R1 (VDD mid) resistor r=10k
R2 (mid 0) resistor r=10k
VSgate (Vgate 0) bsource v=1.8*(1-sin(10.0**7*2*pi*$time))
Rg (Vgate 0) resistor r=1k
"""
    cc = parse_spice(src)
    sol = dc(cc)
    assert float(sol["mid"]) == pytest.approx(0.9)
    assert float(sol["Vgate"]) == pytest.approx(1.8)   # sin(0) = 0
    t = tran(cc, (0, 2e-7), dt=1e-9)
    vg = np.asarray(t["Vgate"])
    ts = np.asarray(t.ts)
    exact = 1.8 * (1 - np.sin(1e7 * 2 * np.pi * ts))
    # save-grid interpolation of adaptive steps bounds the error, not
    # the bsource itself (pinned algebraically at solver points)
    assert np.abs(vg - exact).max() < 0.05


def test_expression_constants_available():
    cc = parse_spice("""consts
.param f0={1/(2*pi*1k*1u)}
v1 in 0 dc {pi}
r1 in 0 1k
""")
    import numpy as np
    sol = dc(cc)
    assert float(sol["in"]) == pytest.approx(3.141592653589793)
