"""BSIM-CMG FinFET (reference `models/CMCModels.jl/va/bsimcmg.va`, the
multi-file-include parser stressor; reference test
`test/bsimcmg/inverter_cmg_cedar.cir` with the ASAP7 7nm TT card).

The ASAP7 model card lives in the reference's Spectre example corpus
(`NyanSpectreNetlistParser.jl/test/examples/7nm_TT.scs`). The reference's
own test only asserts solver success; here the inverter's DC transfer is
checked for correct logic behavior and the FET for saturation-region
physics (Id levels, gm > 0).
"""
import os
import re

import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.mna.spec import SimSpec
from cadnip_tpu.mna.structure import Circuit

CMG_VA = "/root/reference/models/CMCModels.jl/va/bsimcmg.va"
ASAP7 = ("/root/reference/NyanSpectreNetlistParser.jl/test/examples/"
         "7nm_TT.scs")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(CMG_VA) and os.path.exists(ASAP7)),
    reason="BSIM-CMG / ASAP7 sources not present")


def _asap7_cards():
    """Model cards from the Spectre-dialect ASAP7 TT file (numeric
    parameters; `type=n/p` handled separately)."""
    txt = re.sub(r"//[^\n]*", "", open(ASAP7).read())
    lines = [ln for ln in txt.splitlines() if ln.strip()]
    cards, cur = [], None
    for ln in lines:
        if ln.startswith("+"):
            if cur is not None:
                cur += " " + ln[1:]
        else:
            if cur:
                cards.append(cur)
            cur = ln if ln.lstrip().startswith("model") else None
    if cur:
        cards.append(cur)
    out = {}
    for c in cards:
        toks = c.split()
        params = {m.group(1).upper(): float(m.group(2)) for m in
                  re.finditer(r"(\w+)\s*=\s*([-+0-9.eE]+)",
                              " ".join(toks[3:]))}
        ptype = bool(re.search(r"\btype\s*=\s*p", c))
        out[toks[1]] = (ptype, params)
    return out


@pytest.fixture(scope="module")
def cmg():
    from cadnip_tpu.va.codegen import load_va_file
    base = load_va_file(CMG_VA)["bsimcmg"]
    cards = _asap7_cards()
    valid = set(base.defaults)

    def specialize(card_name):
        ptype, params = cards[card_name]
        ov = {}
        for k, v in params.items():
            if k in valid:
                ov[k] = v
                ov[k + "__given"] = 1.0
        if ptype:
            ov["DEVTYPE"] = 0.0          # `ptype (common_defs.include:57)
            ov["DEVTYPE__given"] = 1.0
        m = base.va_specialize(ov) if base.va_specialize else base
        return m, ov

    return specialize


@pytest.mark.integration
def test_bsimcmg_nmos_dc(cmg):
    # ASAP7 LVT NMOS, VDD=1.0, RD=10k: drain current must be in the
    # tens-of-uA class at full gate drive and respond strongly to VG
    m, ov = cmg("nmos_lvt")
    c = Circuit("cmg_cs")
    c.V("vdd", "vdd", "0", dc=1.0)
    c.V("vg", "g", "0", dc=1.0)
    c.R("rd", "vdd", "d", 10e3)
    c.add(m, "m1", ("d", "g", "0", "0"), **ov)
    cc = c.compile(SimSpec())
    sol = ct.dc(cc)
    assert bool(np.asarray(sol.converged))
    id_full = sol.currents("m1")["d"]
    assert 1e-6 < id_full < 1e-3          # FinFET on-current class
    # subthreshold: orders of magnitude less current at VG=0.1
    lo = ct.dc(cc, cc.alter(cc.params0(), **{"vg.dc": 0.1}))
    assert bool(np.asarray(lo.converged))
    id_lo = lo.currents("m1")["d"]
    assert id_lo < id_full / 100.0


@pytest.mark.integration
def test_bsimcmg_inverter_transfer(cmg):
    # the reference inverter (inverter_cmg_cedar.cir topology): nmos_lvt +
    # pmos_lvt, load cap; DC transfer must swing rail to rail, inverting
    mn, ovn = cmg("nmos_lvt")
    mp, ovp = cmg("pmos_lvt")
    c = Circuit("cmg_inv")
    c.V("vdd", "vdd", "0", dc=1.0)
    c.V("vin", "in", "0", dc=0.5)
    c.add(mn, "mneg", ("q", "in", "0", "0"), **ovn)
    c.add(mp, "mpos", ("q", "in", "vdd", "vdd"), **ovp)
    c.C("cq", "q", "0", 1e-15)
    cc = c.compile(SimSpec())
    vins = [0.0, 0.3, 0.5, 0.7, 1.0]
    vouts = []
    p = cc.params0()
    for vin in vins:
        s = ct.dc(cc, cc.alter(p, **{"vin.dc": vin}))
        assert bool(np.asarray(s.converged)), vin
        vouts.append(float(s["q"]))
    vouts = np.asarray(vouts)
    assert vouts[0] > 0.95                 # logic high at Vin=0
    assert vouts[-1] < 0.05                # logic low at Vin=VDD
    assert np.all(np.diff(vouts) < 1e-9)   # monotone inverting


def test_bsimcmg_host_compiles():
    """Core-suite smoke: the multi-file BSIM-CMG source host-compiles
    with the expected interface (cheap — no XLA solve; the DC/transfer
    physics run in the integration group)."""
    from cadnip_tpu.va.codegen import load_va_file
    m = load_va_file(CMG_VA)["bsimcmg"]
    assert m.terminals[:4] == ("d", "g", "s", "e") or len(m.terminals) >= 4
    assert "TFIN" in m.defaults and "DEVTYPE" in m.defaults
