"""Netlist writer / dialect conversion round-trip tests."""
import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.frontend.writer import convert, to_spice


def test_spice_roundtrip():
    src = """roundtrip
.model dx d (is=2e-14 n=1.1)
v1 in 0 dc 5 ac 1 0
r1 in mid 1k
c1 mid 0 1u
l1 mid out 1m
d1 out 0 dx
e1 e1p 0 mid 0 2.0
rl e1p 0 1k
"""
    cc1 = ct.parse_spice(src)
    text = to_spice(ct.parse_spice(src, compile=False))
    cc2 = ct.parse_spice(text)
    s1 = ct.dc(cc1)
    s2 = ct.dc(cc2)
    for node in ("in", "mid", "out", "e1p"):
        assert float(s1[node]) == pytest.approx(float(s2[node]), rel=1e-9)


def test_spectre_to_spice_conversion():
    spectre = """
simulator lang=spectre
v1 (in 0) vsource dc=5
r1 (in out) resistor r=1K
r2 (out 0) resistor r=3K
"""
    spice = convert(spectre, to="spice")
    assert "resistor" not in spice
    cc = ct.parse_spice(spice)
    sol = ct.dc(cc)
    assert float(sol["out"]) == pytest.approx(3.75, rel=1e-9)


def test_waveform_roundtrip():
    src = """waves
vs in 0 dc 0 pulse 0 1 1u 1u 1u 1m 2m
r1 in out 1k
c1 out 0 1u
"""
    text = to_spice(ct.parse_spice(src, compile=False))
    cc = ct.parse_spice(text)
    sol = ct.tran(cc, (0, 2e-3), dt=2e-6)
    assert bool(sol.converged)
    v = np.asarray(sol["out"])
    assert 0.5 < v[np.argmin(np.abs(sol.ts - 1e-3))] < 0.7


def test_to_veriloga_round_trip(tmp_path):
    # Circuit -> Verilog-A -> compile through our own VA compiler ->
    # same DC solution (SpiceArmyKnife cg_veriloga parity)
    import cadnip_tpu as ct
    from cadnip_tpu.frontend.writer import to_veriloga
    from cadnip_tpu import dc, parse_spice

    cir = ct.Circuit("divider")
    cir.V("vs", "in", "0", dc=6.0)
    cir.R("r1", "in", "mid", 1e3)
    cir.R("r2", "mid", "0", 2e3)
    va = to_veriloga(cir, module_name="divider", ports=[])
    p = tmp_path / "divider.va"
    p.write_text(va)
    cc = parse_spice(f"""va round trip
.hdl "{p}"
x1 divider
rbig probe 0 1k
""")
    sol = dc(cc)
    assert bool(sol.converged)
    assert float(sol["x1#mid"]) == pytest.approx(4.0, rel=1e-9)


def test_spice_to_spectre_roundtrip():
    # SPICE -> Spectre (cg_spectre backend) -> our Spectre reader -> same
    # DC solution. Covers primitives, model-card devices, and waveforms.
    from cadnip_tpu.frontend.writer import to_spectre
    src = """spectre target
.model dx d (is=2e-14 n=1.1)
.model nch nmos (level=1 vto=0.7 kp=110u)
v1 in 0 dc 5
vg g 0 dc 2
r1 in mid 1k
c1 mid 0 1u
d1 mid 0 dx
m1 in g sn 0 nch w=10u l=1u
rs sn 0 2k
g1 gp 0 mid 0 1m
rg gp 0 1k
"""
    cc1 = ct.parse_spice(src)
    text = to_spectre(ct.parse_spice(src, compile=False))
    assert "simulator lang=spectre" in text
    cc2 = ct.parse_spice(text)     # auto-detects the Spectre dialect
    s1, s2 = ct.dc(cc1), ct.dc(cc2)
    assert bool(s1.converged) and bool(s2.converged)
    for node in ("in", "mid", "sn", "gp"):
        assert float(s1[node]) == pytest.approx(float(s2[node]), rel=1e-9)


def test_spice_to_spectre_waveforms():
    from cadnip_tpu.frontend.writer import to_spectre
    src = """waves
v1 a 0 dc 0 pulse 0 5 1u 1n 1n 1m 2m
v2 b 0 dc 0 sin 0 2 1k
r1 a 0 1k
r2 b 0 1k
"""
    text = to_spectre(ct.parse_spice(src, compile=False))
    assert "type=pulse" in text and "type=sine" in text
    cc1 = ct.parse_spice(src)
    cc2 = ct.parse_spice(text)
    t1 = ct.tran(cc1, (0, 2e-3), dt=2e-6)
    t2 = ct.tran(cc2, (0, 2e-3), dt=2e-6)
    a1 = np.interp(np.asarray(t2.ts), np.asarray(t1.ts),
                   np.asarray(t1["a"]))
    b1 = np.interp(np.asarray(t2.ts), np.asarray(t1.ts),
                   np.asarray(t1["b"]))
    assert np.allclose(np.asarray(t2["a"]), a1, atol=1e-6)
    assert np.allclose(np.asarray(t2["b"]), b1, atol=1e-6)


def test_convert_cli(tmp_path, capsys):
    from cadnip_tpu.convert import main
    src = tmp_path / "in.ckt"
    src.write_text("""cli test
v1 in 0 dc 5
r1 in out 1k
r2 out 0 1k
""")
    out = tmp_path / "out.scs"
    assert main([str(src), "--to", "spectre", "-o", str(out)]) == 0
    text = out.read_text()
    assert "simulator lang=spectre" in text
    sol = ct.dc(ct.parse_spice(text))
    assert float(sol["out"]) == pytest.approx(2.5)
    # stdout path + veriloga target
    assert main([str(src), "--to", "veriloga", "--module", "divi"]) == 0
    cap = capsys.readouterr()
    assert "module divi" in cap.out
