"""SPICE front-end tests: parse -> elaborate -> solve through the full
pipeline with sol[name] access (the reference's house rule for behavior
tests, SURVEY §4.4)."""
import numpy as np
import pytest

from cadnip_tpu import dc, tran
from cadnip_tpu.frontend.elaborate import parse_spice, simulate
from cadnip_tpu.frontend.expressions import parse_number


def test_number_magnitudes():
    assert parse_number("1k") == 1e3
    assert parse_number("2.5u") == pytest.approx(2.5e-6, rel=1e-12)
    assert parse_number("1meg") == 1e6
    assert parse_number("1MEG") == 1e6
    assert parse_number("10pF") == pytest.approx(10e-12, rel=1e-12)
    assert parse_number("1m") == 1e-3
    assert parse_number("1mil") == pytest.approx(25.4e-6, rel=1e-12)
    assert parse_number("3e-6") == 3e-6
    assert parse_number("1.5G") == 1.5e9
    assert parse_number("abc") is None


def test_divider_netlist():
    cc = parse_spice("""divider test
v1 in 0 5
r1 in out 1k
r2 out 0 1k
.end
""")
    sol = dc(cc)
    assert sol["out"] == pytest.approx(2.5, rel=1e-9)


def test_params_and_expressions():
    cc = parse_spice("""params
.param rbase=1k rtop={rbase*3} vin={2+3}
v1 in 0 {vin}
r1 in out {rtop}
r2 out 0 {rbase}
""")
    sol = dc(cc)
    assert sol["out"] == pytest.approx(5.0 / 4.0, rel=1e-9)


def test_param_order_independent():
    cc = parse_spice("""toposort
.param a={b*2}
.param b=1k
v1 in 0 1
r1 in out {a}
r2 out 0 {b}
""")
    sol = dc(cc)
    assert sol["out"] == pytest.approx(1.0 / 3.0, rel=1e-9)


def test_subckt_expansion():
    cc = parse_spice("""sub test
.subckt divider hi lo mid ratio=0.5
rtop hi mid {1k*(1-ratio)}
rbot mid lo {1k*ratio}
.ends
v1 in 0 4
x1 in 0 a divider
x2 in 0 b divider ratio=0.25
""")
    sol = dc(cc)
    assert sol["a"] == pytest.approx(2.0, rel=1e-9)
    assert sol["b"] == pytest.approx(1.0, rel=1e-9)


def test_nested_subckt_nodes():
    cc = parse_spice("""nested
.subckt inner a b
r1 a mid 1k
r2 mid b 1k
.ends
.subckt outer x y
xi x y inner
.ends
v1 in 0 2
xo in 0 outer
""")
    sol = dc(cc)
    # internal node of nested subckt is addressable with dotted path
    assert sol["xo.xi.mid"] == pytest.approx(1.0, rel=1e-9)


def test_diode_model_card():
    cc = parse_spice("""rectifier
.model d1n4007 d is=76.9p rs=42.0m bv=1.00k ibv=5.00u cjo=26.5p m=0.333 n=1.45
v1 in 0 5
r1 in a 1k
d1 a 0 d1n4007
""")
    sol = dc(cc)
    assert bool(sol.converged)
    assert 0.3 < float(sol["a"]) < 0.9


def test_mosfet_model_card_and_inverter():
    cc = parse_spice("""inv
.model mynmos nmos (level=1 vto=1.0 kp=200u lambda=0.01)
vdd vdd 0 5
vin g 0 0
rd vdd d 10k
m1 d g 0 0 mynmos w=10u l=1u
""")
    sol = dc(cc)
    assert sol["d"] == pytest.approx(5.0, rel=1e-5)   # off transistor


def test_bjt_model_card():
    cc = parse_spice("""bjt
.model qn npn (is=1e-15 bf=150)
vcc vcc 0 5
rb vcc b 100k
rc vcc c 100
q1 c b 0 qn
""")
    sol = dc(cc)
    assert bool(sol.converged)
    vbe = float(sol["b"])
    assert 0.5 < vbe < 0.9
    ib = (5 - vbe) / 100e3
    assert float(sol["c"]) == pytest.approx(5 - 150 * ib * 100, rel=0.05)


def test_controlled_sources_netlist():
    cc = parse_spice("""ctl
v1 in 0 1
e1 a 0 in 0 10
r1 a 0 1k
g1 b 0 in 0 1m
r2 b 0 2k
f1 c 0 v1 5
r3 c 0 1k
""")
    sol = dc(cc)
    assert sol["a"] == pytest.approx(10.0, rel=1e-9)
    assert sol["b"] == pytest.approx(-2.0, rel=1e-9)


def test_behavioral_bsource():
    cc = parse_spice("""bsrc
v1 in 0 2
r1 in 0 1k
bsq out 0 v={v(in)*v(in) + 1}
rl out 0 1k
""")
    sol = dc(cc)
    assert sol["out"] == pytest.approx(5.0, rel=1e-8)


def test_source_waveforms_netlist():
    cc = parse_spice("""waves
vs in 0 dc 0 pulse 0 1 1u 1u 1u 1m 2m
r1 in out 1k
c1 out 0 1u
""")
    sol = tran(cc, (0, 2e-3), dt=2e-6)
    assert bool(sol.converged)
    v = np.asarray(sol["out"])
    assert v[-1] < 0.7   # pulse ended at ~1ms, cap discharging


def test_if_blocks():
    cc = parse_spice("""cond
.param fast=1
.if (fast > 0)
r1 in out 1k
.else
r1 in out 2k
.endif
v1 in 0 3
r2 out 0 1k
""")
    sol = dc(cc)
    assert sol["out"] == pytest.approx(1.5, rel=1e-9)


def test_simulate_runs_cards():
    res = simulate("""auto
v1 in 0 dc 5 ac 1
r1 in out 1k
c1 out 0 1u
.op
.ac dec 5 10 10k
.tran 10u 1m
""")
    assert float(res["op"]["out"]) == pytest.approx(5.0, rel=1e-9)
    assert res["ac"]["out"].shape[0] > 10
    assert abs(res["ac"]["out"][0]) > 0.9   # low-freq passes
    assert res["tran"].xs.shape[1] >= 2


def test_dc_sweep_card():
    res = simulate("""sweepcard
v1 in 0 1
r1 in out 1k
r2 out 0 1k
.dc v1 0 5 1
""")
    sol = res["dc"]
    assert np.allclose(np.asarray(sol["out"]),
                       np.arange(0, 6) / 2.0, rtol=1e-9)


def test_mutual_inductor():
    # ideal-ish transformer: k=0.999, check secondary voltage ratio ~ n
    cc = parse_spice("""xfmr
vs in 0 dc 0 ac 1
rs in p 1
l1 p 0 1m
l2 s 0 0.25m
k1 l1 l2 0.999
rl s 0 1meg
""")
    from cadnip_tpu import ac as ac_run
    sol = ac_run(cc, [1e6])
    ratio = abs(sol["s"][0]) / abs(sol["p"][0])
    assert ratio == pytest.approx(0.5 * 0.999, rel=1e-2)


def test_title_and_comments():
    # SPICE semantics: the FIRST line is the title, even when it starts
    # with '*'; elements begin on line 2 (ngspice behavior)
    cc = parse_spice("""* the title is this comment line
v1 in 0 1 ; trailing comment
r1 in 0 1k $ another
""")
    sol = dc(cc)
    assert bool(sol.converged)
    assert float(sol["in"]) == pytest.approx(1.0)


def test_model_binning_selects_by_geometry():
    # binned model cards 'nch.N' (reference BinnedModel/find_bin,
    # src/spectre.jl:390-471): the instance referencing 'nch' gets the bin
    # whose lmin <= l < lmax and wmin <= w < wmax
    deck = """binned
vd d 0 dc 1.8
vg g 0 dc 1.8
m1 d g 0 0 nch w=2u l=0.5u
m2 d g 0 0 nch w=2u l=2u
.model nch.1 nmos lmin=0.1u lmax=1u wmin=0.1u wmax=10u vto=0.4 kp=200u
.model nch.2 nmos lmin=1u lmax=100u wmin=0.1u wmax=10u vto=0.7 kp=100u
"""
    cc = parse_spice(deck)
    sol = dc(cc)
    assert bool(sol.converged)
    # m1 -> bin 1 (vto 0.4), m2 -> bin 2 (vto 0.7): different saturation
    # currents through the shared supply
    i1 = sol.op_info("m1")
    i2 = sol.op_info("m2")
    assert i1["vth"] == pytest.approx(0.4)
    assert i2["vth"] == pytest.approx(0.7)
    assert i1["ids"] > i2["ids"] > 0


def test_model_binning_no_bin_errors():
    deck = """binned miss
vd d 0 dc 1.8
m1 d d 0 0 nch w=2u l=50u
.model nch.1 nmos lmin=0.1u lmax=1u vto=0.4
"""
    with pytest.raises(ValueError, match="no bin"):
        parse_spice(deck)


def test_meas_cards():
    # ngspice-style .meas post-processing over the tran result
    from cadnip_tpu.frontend.elaborate import simulate
    res = simulate("""meas test
vs in 0 dc 0 pulse 0 1 1u 1n 1n 4u 10u
r1 in out 1k
c1 out 0 1n
.tran 0.05u 8u
.meas tran vmax max v(out) from=0 to=8u
.meas tran vend find v(out) at=4u
.meas tran tcross when v(out)=0.5 rise=1
.meas tran tdel trig v(in) val=0.5 rise=1 targ v(out) val=0.5 rise=1
.meas tran vsq param = vmax*vmax
""")
    m = res["meas"]
    # RC tau = 1u: by 4u fully charged
    assert m["vmax"] == pytest.approx(1.0, abs=2e-2)
    assert m["vend"] == pytest.approx(1.0 - np.exp(-3), abs=2e-2)
    # 50% crossing at td + tau*ln2
    assert m["tcross"] == pytest.approx(1e-6 + 0.693e-6, rel=0.05)
    assert m["tdel"] == pytest.approx(0.693e-6, rel=0.05)
    assert m["vsq"] == pytest.approx(m["vmax"] ** 2)


def test_data_driven_dc_sweep():
    from cadnip_tpu.frontend.elaborate import simulate
    res = simulate("""data sweep
v1 in 0 dc 1
r1 in out 1k
r2 out 0 1k
.data tab r1.r v1.dc
+ 1k 1
+ 3k 2
+ 1k 4
.enddata
.dc data=tab
""")
    sol = res["dc"]
    v = np.asarray(sol["out"])
    assert v == pytest.approx([0.5, 0.5, 2.0])


def test_introspection_query_and_summary():
    # reference query.jl SpRef + circsummary surface
    import cadnip_tpu as ct
    cc = parse_spice("""q
v1 in 0 dc 5
r1 in out 1k
rload out 0 1k
""")
    s = ct.summary(cc)
    assert "3 devices" in s and "unknowns" in s
    refs = ct.query(cc, "r*")
    assert {r.name for r in refs if r.kind == "instance"} == {"r1", "rload"}
    sol = dc(cc)
    ref = ct.find(cc, "out")
    assert float(ref(sol)) == pytest.approx(2.5)
    r = ct.find(cc, "rload")
    info = r(sol)
    assert info["currents"]["p"] == pytest.approx(2.5e-3, rel=1e-9)
    with pytest.raises(KeyError, match="no node"):
        ct.find(cc, "nonexistent")
    tbl = ct.op_table(sol)
    assert "V(out)" in tbl
