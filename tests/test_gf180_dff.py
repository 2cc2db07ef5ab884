"""The REAL gf180 DFF fixture topology
(`/root/reference/test/DFF/gf180mcu_fd_sc_mcu7t5v0__dffnq_4.ngspice`):
28 FETs — negating input buffer, clocked transmission gates, full-strength
cross-coupled latch recharge, 4x parallel output stage, clock buffers —
parsed from the reference file verbatim (only the commented-out
.SUBCKT/.ENDS markers are uncommented) and driven with the benchmark's
clock/data waveforms. nfet_06v0/pfet_06v0 resolve to wrapper subckts over
the level-1 stand-in models (the PDK-accurate device models are exercised
separately by the PSP103/BSIM-CMG tests); W/L from the fixture instance
lines are honored.
"""
import os

import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.models.dff import DFF_MODELS

FIXTURE = ("/root/reference/test/DFF/"
           "gf180mcu_fd_sc_mcu7t5v0__dffnq_4.ngspice")

pytestmark = pytest.mark.skipif(not os.path.exists(FIXTURE),
                                reason="gf180 DFF fixture not present")


def gf180_dff_netlist(vdd=5.0):
    sub = open(FIXTURE).read()
    # the fixture ships with its .SUBCKT/.ENDS lines commented out
    sub = sub.replace("*.SUBCKT", ".SUBCKT").replace("*.ENDS", ".ENDS")
    return "\n".join([
        "gf180 dffnq_4 fixture",
        DFF_MODELS,
        # gf180 device wrappers: fixture instance order is (d g s b)
        ".subckt nfet_06v0 d g s b W=1u L=1u",
        "m1 d g s b n1 w={W} l={L}",
        ".ends",
        ".subckt pfet_06v0 d g s b W=1u L=1u",
        "m1 d g s b p1 w={W} l={L}",
        ".ends",
        sub,
        f"vvdd vdd 0 {vdd}",
        "vvss vss 0 0",
        "xdff d clkn q vdd vdd vss vss gf180mcu_fd_sc_mcu7t5v0__dffnq_4",
        "cq q 0 1.72e-13",
        # benchmark drive shapes: falling CLKN edges latch at 51/401 ns
        f"""vclkn clkn 0 PWL(
+ 0 {vdd} 50n {vdd} 51.02n 0 100n 0 101.02n {vdd} 400n {vdd}
+ 401.02n 0 500n 0 501.02n {vdd} 600n {vdd})""",
        f"""vd d 0 PWL(
+ 0 0 200n 0 201.02n {vdd} 300n {vdd} 301.02n 0 390n 0
+ 391.02n {vdd} 600n {vdd})""",
        ".end",
    ])


def test_gf180_fixture_parses():
    cc = ct.parse_spice(gf180_dff_netlist())
    n_fets = sum(g.n_inst for g in cc.groups if g.model.name == "mos1")
    assert n_fets == 30                  # every fixture transistor present


def test_gf180_fixture_latches():
    cc = ct.parse_spice(gf180_dff_netlist())
    sol = ct.tran(cc, (0, 6e-7), dt=3.333e-10, max_steps=100000)
    assert bool(np.asarray(sol.converged))
    q = np.asarray(sol["q"])
    ts = sol.ts

    def at(t):
        return float(q[np.argmin(np.abs(ts - t))])

    assert at(150e-9) < 0.5      # D=0 latched at the 51 ns edge
    assert at(350e-9) < 0.5      # held while transparent
    assert at(450e-9) > 4.5      # D=1 latched at the 401 ns edge
    assert at(550e-9) > 4.5
