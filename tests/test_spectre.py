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


# ---- reference parser example corpus (NyanSpectreNetlistParser.jl/
# test/examples/) — parse-only structural checks + a mixed-language
# behavior test (reference mixed mode: `simulator lang=` switching).

_EXAMPLES = "/root/reference/NyanSpectreNetlistParser.jl/test/examples"


def _example(name):
    import os
    path = os.path.join(_EXAMPLES, name)
    if not os.path.exists(path):
        pytest.skip(f"reference example {name} unavailable")
    return open(path).read()


def _kinds(cards):
    out = {}
    for c in cards:
        k = getattr(c, "kind", "?")
        out[k] = out.get(k, 0) + 1
    return out


def test_parse_example_inverter_ring():
    from cadnip_tpu.frontend.spectre import parse_spectre
    nl = parse_spectre(_example("inverter_ring.scs"))
    k = _kinds(nl.cards)
    assert k["spectre_inst"] == 19          # 16 xinv + aliasGnd + supplies
    assert k["subckt"] == 1                 # inv
    assert k["spectre_tran"] == 3           # typ/ss/ff corner trans
    assert k["spectre_altergroup"] == 2 and k["spectre_alter"] == 2
    assert k["ic"] == 1 and k["option"] == 1
    names = [c.name for c in nl.cards if getattr(c, "kind", "") ==
             "spectre_inst"]
    assert "xinv17" in names
    ag = [c for c in nl.cards if c.kind == "spectre_altergroup"][0]
    body_kinds = _kinds(ag.kwargs["body"])
    assert body_kinds.get("lib") == 1 and body_kinds.get("param") == 1


def test_parse_example_subckt_nested():
    from cadnip_tpu.frontend.spectre import parse_spectre
    nl = parse_spectre(_example("subckt_example.scs"))
    k = _kinds(nl.cards)
    assert k["subckt"] == 3                 # cell, stage, amplifier
    sub = {c.name: c for c in nl.cards if getattr(c, "kind", "") ==
           "subckt"}
    assert set(sub) == {"cell", "stage", "filter"}
    assert sub["cell"].ports == ["o", "g1", "g2"]
    # `ends cell` named terminator parsed; tline instances inside
    inner = _kinds(sub["cell"].body)
    assert inner["spectre_inst"] == 8


def test_parse_example_inv1x2_units_and_save():
    from cadnip_tpu.frontend.spectre import parse_spectre
    nl = parse_spectre(_example("inv1x2.scs"))
    k = _kinds(nl.cards)
    assert k["save"] == 1 and k["option"] == 1 and k["include"] == 1
    v2 = [c for c in nl.cards if getattr(c, "name", "") == "v2"][0]
    assert v2.kwargs["type"][1] == "pulse"
    # `60ps` / `30ns` unit-suffixed literals
    assert parse_spectre_number("60ps") == pytest.approx(60e-12)
    assert parse_spectre_number("30ns") == pytest.approx(30e-9)


def test_mixed_language_deck_solves():
    """`simulator lang=spice`/`lang=spectre` switching: four parallel 1k
    resistors (two per dialect) across a 1 V SPICE source."""
    src = _example("mixed_langs.cir")
    cc = parse_spice(src)
    sol = dc(cc)
    assert float(sol["1"]) == pytest.approx(1.0)
    # all four resistors landed: total conductance 4 mS -> i(v1) = -4 mA
    i = float(sol["v1#i"])
    assert i == pytest.approx(-4e-3, rel=1e-9)


def test_spectre_ic_card_applies():
    from cadnip_tpu.frontend.spectre import parse_spectre
    nl = parse_spectre("""simulator lang=spectre
v1 (in 0) vsource type=dc dc=1
r1 (in out) resistor r=1k
c1 (out 0) capacitor c=1u
ic out=0.25
""")
    k = _kinds(nl.cards)
    assert k["ic"] == 1


# ---------------------------------------------------------------------------
# round-4 grammar depth (reference NyanSpectreNetlistParser
# src/parse/parse.jl: parse_conditional_block, parse_function_decl,
# parse_array, library files, sweep/montecarlo statements)

def test_spectre_if_else_blocks():
    """Braced conditionals select elements against parameters, same
    evaluation path as SPICE .if (parse_conditional_block)."""
    deck = """
simulator lang=spectre
parameters mode=2
v1 (in 0) vsource dc=6
if (mode == 1) {
  r1 (in out) resistor r=1K
  r2 (out 0) resistor r=1K
} else if (mode == 2) {
  r1 (in out) resistor r=2K
  r2 (out 0) resistor r=1K
} else {
  r1 (in out) resistor r=5K
  r2 (out 0) resistor r=1K
}
"""
    cc = parse_spice(deck)
    sol = dc(cc)
    assert sol["out"] == pytest.approx(2.0, rel=1e-9)   # 6 * 1k/3k


def test_spectre_user_function():
    """`real f(...) { return expr; }` declarations become netlist
    functions usable in parameter expressions (parse_function_decl)."""
    cc = parse_spice("""
simulator lang=spectre
real rpar(real a, real b) {
    return a*b/(a+b);
}
parameters rload=rpar(2K, 2K)
v1 (in 0) vsource dc=3
r1 (in out) resistor r=1K
r2 (out 0) resistor r=rload
""")
    sol = dc(cc)
    assert sol["out"] == pytest.approx(1.5, rel=1e-9)   # 3 * 1k/2k


def test_spectre_vector_pwl_wave():
    """Bracketed vectors (parse_array): `wave=[t v t v ...]` builds a
    PWL source; solved value checked mid-ramp."""
    res = simulate("""
simulator lang=spectre
v1 (in 0) vsource type=pwl wave=[0 0 1m 1 2m 1]
r1 (in out) resistor r=1
tr tran stop=2m step=10u
""")
    sol = res["tran"]
    ts = np.asarray(sol.ts)
    v = np.asarray(sol["out"])
    k = int(np.argmin(np.abs(ts - 0.5e-3)))
    assert v[k] == pytest.approx(0.5, abs=0.02)
    assert v[-1] == pytest.approx(1.0, abs=1e-6)


def test_spectre_library_sections(tmp_path):
    """`library/section/endsection/endlibrary` + `include section=`
    (reference Spectre library files): the selected section's cards
    elaborate, others do not."""
    lib = tmp_path / "corners.scs"
    lib.write_text("""
library mylib
section tt
parameters rv=1K
endsection
section ss
parameters rv=3K
endsection
endlibrary
""")
    deck = f"""
simulator lang=spectre
include "{lib}" section=ss
v1 (in 0) vsource dc=4
r1 (in out) resistor r=rv
r2 (out 0) resistor r=1K
"""
    cc = parse_spice(deck)
    sol = dc(cc)
    assert sol["out"] == pytest.approx(1.0, rel=1e-9)   # 4 * 1k/4k


def test_spectre_string_params_and_noop_stmts():
    """Double-quoted string parameters parse and pass through; audit
    statements (check/set/shell/info) are consumed without effect."""
    cc = parse_spice("""
simulator lang=spectre
myopts options reltol=1e-4 rawfmt="psfbin"
c1 check windows=yes
s1 set dc=1
sh shell cmd="ls"
v1 (in 0) vsource dc=2
r1 (in 0) resistor r=1K
""")
    sol = dc(cc)
    assert sol["in"] == pytest.approx(2.0)


def test_spectre_sweep_device_param():
    """`name sweep dev=.. param=.. values=[..] { child }` runs the child
    analysis per point through the zero-recompile alter path."""
    res = simulate("""
simulator lang=spectre
v1 (in 0) vsource dc=6
r1 (in out) resistor r=2K
r2 (out 0) resistor r=1K
sw sweep dev=r1 param=r values=[1K 2K 5K] {
  o1 dc
}
""")
    sw = res["sweep"]
    outs = [float(np.asarray(r["dc"]["out"])) for r in sw["runs"]]
    assert outs == pytest.approx([3.0, 2.0, 1.0], rel=1e-9)


def test_spectre_sweep_netlist_param():
    """Sweeping a netlist `parameters` name re-elaborates per point via
    textual alter (reference alter, src/spectre.jl:515-571)."""
    res = simulate("""
simulator lang=spectre
parameters rtop=1K
v1 (in 0) vsource dc=4
r1 (in out) resistor r=rtop
r2 (out 0) resistor r=1K
sw sweep param=rtop start=1K stop=3K step=1K {
  o1 dc
}
""")
    sw = res["sweep"]
    outs = [float(np.asarray(r["dc"]["out"])) for r in sw["runs"]]
    assert outs == pytest.approx([2.0, 4.0 / 3.0, 1.0], rel=1e-9)


def test_spectre_montecarlo():
    """`montecarlo numruns=..` re-elaborates with a seeded RNG driving
    the deck's distribution functions (SpectreEnvironment agauss)."""
    res = simulate("""
simulator lang=spectre
parameters rv=agauss(1K, 100, 1)
v1 (in 0) vsource dc=2
r1 (in out) resistor r=rv
r2 (out 0) resistor r=1K
mc montecarlo numruns=8 seed=7 {
  o1 dc
}
""")
    mc = res["montecarlo"]
    outs = np.array([float(np.asarray(r["dc"]["out"]))
                     for r in mc["runs"]])
    assert len(outs) == 8
    assert outs.std() > 1e-3          # actually randomized
    assert abs(outs.mean() - 1.0) < 0.2


def test_spectre_inline_subckt():
    """`inline subckt` elaborates like subckt (naming-only delta)."""
    cc = parse_spice("""
simulator lang=spectre
inline subckt pair (a b)
  ra (a m) resistor r=1K
  rb (m b) resistor r=1K
ends pair
v1 (in 0) vsource dc=2
x1 (in 0) pair
""")
    sol = dc(cc)
    assert sol["x1.m"] == pytest.approx(1.0, rel=1e-9)
