"""Benchmark circuits: transmission-gate D flip-flop and ring oscillator.

The DFF mirrors the topology of the reference's gf180 DFF benchmark
(`/root/reference/test/DFF/gf180mcu_fd_sc_mcu7t5v0__dffnq_4.ngspice`:
negating input buffer, clocked transmission gates, cross-coupled latch,
clock buffers, parallel output stage) built on the level-1 MOSFET model —
the PDK-accurate PSP/BSIM device models arrive with the Verilog-A compiler.
"""
from __future__ import annotations

import numpy as np

# junction/overlap caps are deliberately generous (fF-scale): they give
# every latch node real dynamic state so clock-edge races resolve by the
# circuit's time constants, not by Newton's path through a quasi-static
# bistable point (which is numerically marginal by construction)
DFF_MODELS = """
.model n1 nmos (level=1 vto=0.8 kp=120u lambda=0.05 cgso=5f cgdo=5f
+ cbd=10f cbs=10f)
.model p1 pmos (level=1 vto=-0.9 kp=50u lambda=0.05 cgso=6f cgdo=6f
+ cbd=12f cbs=12f)
"""


def _inv(name, inp, out, wn=3.6e-7, wp=4.95e-7, ln=6e-7, lp=5e-7):
    return (f"mn{name} {out} {inp} vss vss n1 w={wn} l={ln}\n"
            f"mp{name} {out} {inp} vdd vdd p1 w={wp} l={lp}\n")


def _tgate(name, a, b, clk, nclk):
    return (f"mnt{name} {a} {clk} {b} vss n1 w=3.6e-7 l=6e-7\n"
            f"mpt{name} {b} {nclk} {a} vdd p1 w=4.95e-7 l=5e-7\n")


def dff_netlist(vdd=5.0, cq=1.72e-13, tstop=6e-7, tstep=3.33e-10) -> str:
    """Transmission-gate DFF with the gf180 benchmark's drive waveforms."""
    body = [
        "transmission-gate DFF benchmark",
        DFF_MODELS,
        f"vvdd vdd 0 {vdd}",
        "vvss vss 0 0",
        # input inverter
        _inv("in", "d", "dneg"),
        # input t-gate (cki high)
        _tgate("t1", "dneg", "dclk", "cki", "ncki"),
        # master inverter
        _inv("m1", "dclk", "qint"),
        # master latch feedback through stacked recharge pair — WEAK keeper
        # (0.1x) so the forward path always overpowers it during clock
        # overlap: makes the latch race-free for quasi-static models
        "mnf0 dclk ncki nfb vss n1 w=0.4e-7 l=6e-7",
        "mpf0 pfb cki dclk vdd p1 w=0.5e-7 l=5e-7",
        "mnf1 vss qint nfb vss n1 w=0.4e-7 l=6e-7",
        "mpf1 vdd qint pfb vdd p1 w=0.5e-7 l=5e-7",
        # slave t-gates
        _tgate("t2", "n0", "qint", "ncki", "cki"),
        _tgate("t3", "n7", "n0", "cki", "ncki"),
        # slave inverters: strong output, weak keeper feedback
        _inv("s1", "n0", "qneg", wn=9.45e-7, wp=1.075e-6),
        _inv("s2", "qneg", "n7", wn=1.0e-7, wp=1.2e-7),
        # output stage (2x parallel)
        _inv("o1", "qneg", "q", wn=8.2e-7, wp=1.095e-6),
        _inv("o2", "qneg", "q", wn=8.2e-7, wp=1.095e-6),
        # clock buffers
        _inv("c1", "clkn", "ncki", wn=4.65e-7, wp=8.65e-7),
        _inv("c2", "ncki", "cki", wn=4.65e-7, wp=8.65e-7),
        f"cq q 0 {cq}",
        # drive waveforms (same shape as the reference benchmark)
        f"""vclkn clkn 0 PWL(
+ 0 {vdd} 50n {vdd} 51.02n 0 100n 0 101.02n {vdd} 400n {vdd}
+ 401.02n 0 500n 0 501.02n {vdd} 600n {vdd})""",
        # data rises 10ns before the 401ns latching edge (setup margin;
        # quasi-static level-1 devices resolve a zero-margin race to 0)
        f"""vd d 0 PWL(
+ 0 0 200n 0 201.02n {vdd} 300n {vdd} 301.02n 0 390n 0
+ 391.02n {vdd} 600n {vdd})""",
        f".tran {tstep} {tstop}",
        ".end",
    ]
    return "\n".join(body)


def ring_oscillator_netlist(stages=9, vdd=5.0) -> str:
    """CMOS ring oscillator (the reference 'ring' benchmark topology)."""
    lines = ["ring oscillator", DFF_MODELS, f"vvdd vdd 0 {vdd}",
             "vvss vss 0 0"]
    for k in range(stages):
        a = f"n{k}"
        b = f"n{(k + 1) % stages}"
        lines.append(_inv(f"r{k}", a, b, wn=1e-6, wp=2e-6))
        lines.append(f"cl{k} {b} 0 50f")
    # kick to break the symmetric (metastable) DC point
    lines.append("ik n0 0 PWL(0 0 1n 0 1.1n 50u 2n 50u 2.1n 0 1u 0)")
    return "\n".join(lines)
