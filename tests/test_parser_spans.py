"""Lossless source spans, netlist-text alter, and parse-only coverage of
the reference's real decks (VERDICT round-2 items 5/6: red-tree CST spans
`NyanSpectreNetlistParser.jl`, `alter(io, ast; kwargs)`
`src/spectre.jl:515-571`, fixtures under `/root/reference/test/`)."""
import os

import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.frontend.netlist import (NetlistError, alter_text,
                                         parse_netlist)

DECK = """demo deck
.param vdd=3.3
r1 a b 1k
c1 b 0 {2*cload}
vs a 0 dc 5 acmag=1
m1 d g 0 0 nch w=2u l=0.18u
.model nch nmos (level=1 vto=0.62 kp=110u)
.subckt inv in out
rload out 0 10k
.ends
.end
"""


def test_tokens_carry_source_positions():
    nl = parse_netlist(DECK)
    m1 = next(c for c in nl.cards if getattr(c, "name", "") == "m1")
    w = m1.kwargs["w"]
    ln, col = w.source_pos()
    assert DECK.split("\n")[ln - 1][col:col + 2] == "2u"


def test_alter_element_kw_and_positional():
    out = alter_text(DECK, {"m1.w": "5u", "r1.r": "2.2k"})
    assert "m1 d g 0 0 nch w=5u l=0.18u" in out
    assert "r1 a b 2.2k" in out
    # everything else byte-identical
    for a, b in zip(DECK.split("\n"), out.split("\n")):
        if not a.startswith(("m1", "r1")):
            assert a == b


def test_alter_model_card_param_card_and_subckt_body():
    out = alter_text(DECK, {"nch.vto": "0.71", ".": "x"} if False else
                     {"nch.vto": "0.71", "vdd": "2.5",
                      "rload.r": "99k"})
    assert "vto=0.71" in out
    assert ".param vdd=2.5" in out
    assert "rload out 0 99k" in out
    # altered text must still parse and simulate identically in shape
    nl = parse_netlist(out)
    assert nl.title == "demo deck"


def test_alter_unknown_key_raises():
    with pytest.raises(NetlistError, match="alter"):
        alter_text(DECK, {"zz.w": "1u"})


def test_alter_continuation_line_value():
    deck = (".model big nmos (level=1\n+ vto=0.5 kp=100u)\n"
            "m1 d g 0 0 big\n.end\n")
    out = alter_text(deck, {"big.vto": "0.9"})
    assert "+ vto=0.9 kp=100u)" in out


def test_alter_roundtrip_simulates():
    base = ct.dc(ct.parse_spice("div\nv1 in 0 dc 6\nr1 in out 1k\n"
                                "r2 out 0 1k\n.end\n"))
    text2 = alter_text("div\nv1 in 0 dc 6\nr1 in out 1k\nr2 out 0 1k\n"
                       ".end\n", {"r2.r": "2k"})
    sol2 = ct.dc(ct.parse_spice(text2))
    assert abs(float(base["out"]) - 3.0) < 1e-12
    assert abs(float(sol2["out"]) - 4.0) < 1e-12


REF_DECKS = [
    "/root/reference/test/sky130/gf180ref.spice",
    "/root/reference/test/sky130/scale.spice",
    "/root/reference/test/ngspice/astable_multivibrator.cir",
    "/root/reference/test/bsimcmg/inverter_cmg_cedar.cir",
    "/root/reference/test/DFF/DFF_cap_all.cir",
]


@pytest.mark.parametrize("path", [p for p in REF_DECKS
                                  if os.path.exists(p)])
def test_reference_decks_parse(path):
    nl = parse_netlist(open(path).read())
    assert nl.cards                      # structure produced


SPECTRE_DECKS = [
    "/root/reference/test/bsimcmg/asap7_inv.scs",
    "/root/reference/test/mna/fixtures/table_model/tm_1d.scs",
    "/root/reference/test/mna/fixtures/table_model/tm_2d.scs",
]


@pytest.mark.parametrize("path", [p for p in SPECTRE_DECKS
                                  if os.path.exists(p)])
def test_reference_spectre_decks_parse(path):
    from cadnip_tpu.frontend.spectre import parse_spectre
    nl = parse_spectre(open(path).read())
    assert nl.cards
