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


@pytest.mark.integration
def test_periodic_seeding_matches_ladder():
    """PERIODIC WINDOW SEEDING (windows snapped to the source period,
    each window Newton-seeded by the envelope extrapolation of the two
    previous windows) must produce the same waveform as the plain
    coarse-to-fine ladder — same grid, same trap recursion, only the
    Newton seeds differ."""
    deck = """half-wave rectifier, fast source
.model dfast d is=1e-14 n=1.8 cjo=1p
vs in 0 dc 0 sin 0 5 1e6
d1 in out dfast
cl out 0 100p
rl out 0 10k
.end
"""
    cc = ct.parse_spice(deck)
    # 10 periods of 1 MHz at dt=1ns: psteps=1000, window snaps to 1000
    sol = tran_pit(cc, (0, 1e-5), 1e-9, window=1000, windows_per_exec=4)
    assert not bool(np.asarray(sol.stats.fail))
    ref = tran_pit(cc, (0, 1e-5), 1e-9, window=1000, windows_per_exec=4,
                   periodic="off")
    assert not bool(np.asarray(ref.stats.fail))
    v = np.asarray(sol["out"])
    vr = np.asarray(ref["out"])
    rmse = float(np.sqrt(np.mean((v - vr) ** 2)))
    # both paths stop at Newton tolerance, not at roundoff: gate at
    # 1e-6 RELATIVE to the 5 V amplitude (measured 1.5e-6 absolute)
    assert rmse < 5e-6, rmse
    # physics: RC equals one period, so the ripple is large — the last
    # period peaks near 5 V minus a diode drop and sags to ~1.9 V
    last = v[-1000:]
    assert 3.0 < last.max() < 5.0 and 1.0 < last.min() < 3.0
    # the seeded run must actually have taken the seeded path (fewer
    # total window-iters than the ladder's constant-seed crawl)
    assert int(np.asarray(sol.stats.nnewton)) < int(
        np.asarray(ref.stats.nnewton))


def test_detect_period_synthetic():
    """Host-side period detection used by the oscillator mode: a clean
    sine plus harmonics + an aperiodic startup ramp, sub-step accuracy."""
    from cadnip_tpu.analyses.tran_pit import detect_period
    dt = 0.05e-9
    P = 3.4423e-9
    t = dt * np.arange(1200)
    grow = np.minimum(t / (4 * P), 1.0)   # startup envelope
    v = grow * (0.6 * np.sin(2 * np.pi * t / P)
                + 0.1 * np.sin(4 * np.pi * t / P + 0.7))
    xs = np.stack([v, 0.01 * v, np.zeros_like(v)], axis=1)
    Ph = detect_period(xs, dt)
    assert Ph is not None
    assert abs(Ph - P) < 0.01 * P
    # too few crossings -> None
    assert detect_period(xs[:120], dt) is None
    # flat -> None
    assert detect_period(np.zeros((500, 3)), dt) is None


@pytest.mark.integration
def test_oscillator_mode_ring():
    """Autonomous-oscillator PIT (osc=True) on the level-1 9-stage ring:
    phase A short-window ladder -> period detection -> phase B
    periodic-seeded windows. Gates are PHASE-AGNOSTIC (an oscillator
    amplifies discretization differences into linearly growing phase
    shift, so pointwise RMSE vs the adaptive runner is meaningless):
    the detected period, amplitude band, and late crossing count must
    match the serial runner."""
    from cadnip_tpu.analyses.tran_pit import detect_period
    from cadnip_tpu.models.dff import ring_oscillator_netlist
    cc = ct.parse_spice(ring_oscillator_netlist())
    span, dt = 150e-9, 0.1e-9
    ref = ct.tran(cc, (0, span), dt=dt, dtmax=dt)
    P_ref = detect_period(np.asarray(ref.xs), dt)
    assert P_ref is not None
    sol = tran_pit(cc, (0, span), dt, window=1024, windows_per_exec=8,
                   osc=True, osc_window=64)
    assert not bool(np.asarray(sol.stats.fail))
    v = np.asarray(sol["n0"])
    P_pit = detect_period(np.asarray(sol.xs), dt)
    assert P_pit is not None
    assert abs(P_pit - P_ref) < 0.02 * P_ref, (P_pit, P_ref)
    vr = np.asarray(ref["n0"])
    h = len(v) // 2
    assert abs(v[h:].max() - vr[h:].max()) < 0.1
    assert abs(v[h:].min() - vr[h:].min()) < 0.1
    s, sr = v[h:] - 2.5, vr[h:] - 2.5
    nc = int(np.sum((s[:-1] < 0) & (s[1:] >= 0)))
    ncr = int(np.sum((sr[:-1] < 0) & (sr[1:] >= 0)))
    assert abs(nc - ncr) <= 1, (nc, ncr)


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
