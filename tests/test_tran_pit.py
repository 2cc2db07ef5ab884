"""Parallel-in-time window-Newton transient (analyses/tran_pit.py).

Behavior tests through the full pipeline per the house rules: netlist
text -> elaborate -> solve -> sol[name] against hand-derived values.
"""
import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.analyses.tran_pit import supported, tran_pit

RC = """RC circuit excited by a pulse train
vs 1 0 dc 0 pulse 0 1 1u 1u 1u 1m 2m
r1 1 2 1k
c1 2 0 1u
.end
"""

GRAETZ = """Full-wave rectifier
.model d1n4007 d is=76.9p rs=42.0m bv=1.00k ibv=5.00u cjo=26.5p m=0.333 n=1.45
vs inp inn 0 sin 0.0 20 50.0
d1 inp outp d1n4007
d2 outn inp d1n4007
d3 inn outp d1n4007
d4 outn inn d1n4007
cl outp outn 100u
rl outp outn 1k
rgnd1 inn 0 1meg
rgnd2 outn 0 1meg
.end
"""


def test_rc_closed_form():
    """Fixed-grid trap on the VACASK rc circuit vs the exact pulse
    response (same golden as bench.py's rc gate)."""
    cc = ct.parse_spice(RC)
    assert supported(cc)
    sol = tran_pit(cc, (0, 0.005), 1e-6, window=512)
    assert not bool(np.asarray(sol.stats.fail))
    v2 = np.asarray(sol["2"])
    ts = np.asarray(sol.ts)
    seg = (ts >= 5e-6) & (ts <= 9e-4)
    tau, tr = 1e-3, 1e-6
    v_ramp_end = 1.0 - tau / tr * (1 - np.exp(-tr / tau))
    v_exact = 1.0 + (v_ramp_end - 1.0) * np.exp(-(ts[seg] - 2e-6) / tau)
    rmse = float(np.sqrt(np.mean((v2[seg] - v_exact) ** 2)))
    assert rmse < 1e-6, rmse


@pytest.mark.integration
def test_graetz_vs_serial():
    """Window Newton on the diode rectifier: converges through diode
    switching, matches the adaptive serial runner to its own LTE, and
    the rectified output sits in the physical ripple band."""
    cc = ct.parse_spice(GRAETZ)
    sol = tran_pit(cc, (0, 0.02), 1e-6, window=1024, max_iters=60,
                   windows_per_exec=8)
    assert not bool(np.asarray(sol.stats.fail))
    ref = ct.tran(cc, (0, 0.02), dt=1e-6)
    v = np.asarray(sol.v("outp", "outn"))
    vr = np.asarray(ref.v("outp", "outn"))
    n = min(len(v), len(vr))
    rmse = float(np.sqrt(np.mean((v[:n] - vr[:n]) ** 2)))
    # the adaptive runner's LTE at reltol=1e-4 dominates this difference
    # (tran_pit self-converges to ~6e-7 RMSE under dt refinement)
    assert rmse < 0.05, rmse
    # physics: by 15 ms the smoothing cap holds ~2*Vpeak-ish rectified DC
    late = np.asarray(sol.ts) > 0.015
    assert 10.0 < v[late].min() < v[late].max() < 20.0


def test_unsupported_bbd():
    """BBD-partitioned circuits fall back to the serial runner."""
    cc = ct.parse_spice(RC)
    if cc.bbd is None:
        deck = tran_pit  # supported path exercised above
        assert supported(cc)
    with pytest.raises(ValueError):
        bad = ct.parse_spice(RC)
        bad.bbd = object()          # simulate a partitioned circuit
        tran_pit(bad, (0, 1e-3), 1e-6)
