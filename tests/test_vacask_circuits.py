"""The VACASK benchmark circuits (reference benchmarks/vacask/*), run
verbatim at reduced time spans, checked against physics."""
import numpy as np
import pytest

from cadnip_tpu import simulate
from cadnip_tpu.analyses.tran_linear import is_linear, tran_linear
from cadnip_tpu.frontend.elaborate import parse_spice

RC = """RC circuit excited by a pulse train
vs 1 0 dc 0 pulse 0 1 1u 1u 1u 1m 2m
r1 1 2 1k
c1 2 0 1u
.end
"""

GRAETZ = """Full-wave rectifier with smoothing and load
.model d1n4007 d is=76.9p rs=42.0m bv=1.00k ibv=5.00u cjo=26.5p  m=0.333 n=1.45
vs inp inn 0 sin 0.0 20 50.0
d1 inp outp d1n4007
d2 outn inp d1n4007
d3 inn outp d1n4007
d4 outn inn d1n4007
cl outp outn 100u
rl outp outn 1k
rgnd1 inn 0 1meg
rgnd2 outn 0 1meg
.tran 100u 0.06
.end
"""

MUL = """Diode cascade
.model D1N4007 D IS=76.9p RS=42.0m BV=1.00k IBV=5.00u CJO=26.5p  M=0.333 N=1.45
.param c=100n
vs a 0 dc=0 sin 0 50 100k
r1 a 1 r=0.01
c1 1 2 c={c}
d1 0 1 d1n4007
c2 0 10 c={c}
d2 1 10 d1n4007
c3 1 2  c={c}
d3 10 2 d1n4007
c4 10 20 c={c}
d4 2 20 d1n4007
.options method=gear maxord=2
.tran 0.1u 100u
.end
"""


def test_rc_linear_path_matches_pulse_train():
    cc = parse_spice(RC)
    assert is_linear(cc)
    sol = tran_linear(cc, (0, 8e-3), 1e-6)
    v = np.asarray(sol["2"])
    ts = sol.ts
    # pulse: on 1->~1ms (1 tau): peak ~1-exp(-1); off 1ms: decays by e
    i_at = lambda t: np.argmin(np.abs(ts - t))
    peak = v[i_at(1.001e-3)]
    assert peak == pytest.approx(1 - np.exp(-1), abs=5e-3)
    assert v[i_at(2.001e-3)] == pytest.approx(peak * np.exp(-1), abs=5e-3)
    # steady repetition: same values one period later
    assert v[i_at(3.001e-3)] == pytest.approx(
        v[i_at(1.001e-3)] + v[i_at(2.001e-3)] * (1 - np.exp(-1)) * 0, abs=0.1)


def test_graetz_runs_and_rectifies():
    res = simulate(GRAETZ)
    sol = res["tran"]
    assert bool(sol.converged)
    v = np.asarray(sol.v("outp", "outn"))
    late = sol.ts > 0.04
    assert 16.5 < v[late].min() < v[late].max() < 19.0


def test_mul_voltage_multiplier():
    res = simulate(MUL)
    sol = res["tran"]
    assert bool(sol.converged)
    v20 = np.asarray(sol["20"])
    # Cockcroft-Walton ladder pumps node 20 toward +4*Vpeak (~200V);
    # after 10 cycles it is well above +100V and still rising
    assert v20[-1] > 100.0
    assert v20[-1] > v20[len(v20) // 2]


DARLINGTON = """Darlington pair switch driven by a pulse train
.model qmod npn bf=100 is=1e-15 cje=10p cjc=5p tf=0.3n
vcc vcc 0 dc 5
vs vin 0 dc 0 pulse 0 3 0 10n 10n 0.99u 2u
rb vin b1 10k
q1 coll b1 b2 qmod
q2 coll b2 0 qmod
rbleed b2 0 10k
rl vcc coll 1k
cl coll 0 100p
.end
"""


def test_darlington_switches():
    """Reference `benchmarks/vacask/darlington`: two cascaded NPNs
    switched by a 500 kHz pulse train (tran 2n 1m full span in the
    benchmark; 3 periods here). ON: both BJTs driven into saturation,
    collector near ground; OFF: collector pulled to VCC through rl."""
    from cadnip_tpu import tran
    cc = parse_spice(DARLINGTON)
    sol = tran(cc, (0, 6e-6), dt=2e-9, max_steps=40000)
    ts = np.asarray(sol.ts)
    vc = np.asarray(sol["coll"])
    # ON mid-pulse (t=0.5u): composite saturation floor — a Darlington
    # cannot saturate below vbe2 + vce1,sat ~ 0.77 V; OFF mid-gap: high
    assert 0.5 < vc[np.argmin(np.abs(ts - 0.5e-6))] < 1.0
    assert vc[np.argmin(np.abs(ts - 1.5e-6))] > 4.5
    # darlington base stack: b1 ~ 2*vbe when driven
    vb1 = np.asarray(sol["b1"])
    assert 1.2 < vb1[np.argmin(np.abs(ts - 0.5e-6))] < 1.9


@pytest.mark.integration
def test_darlington_pit_matches_serial():
    """The darlington through the periodic-seeded PIT runner (the bench
    path: pulse period 2 us = 1000 steps) against the serial adaptive
    runner on the same grid."""
    from cadnip_tpu import tran
    from cadnip_tpu.analyses.tran_pit import tran_pit
    cc = parse_spice(DARLINGTON)
    span = (0, 8e-6)
    ser = tran(cc, span, dt=2e-9, max_steps=80000,
               save_ts=np.arange(0, 8e-6 + 1e-12, 2e-9))
    pit = tran_pit(cc, span, 2e-9, window=2000, windows_per_exec=4,
                   max_iters=96)
    assert not bool(np.asarray(pit.stats.fail))
    vs_, vp = np.asarray(ser["coll"]), np.asarray(pit["coll"])
    # pointwise agreement except at the 10 ns switching edges (the
    # serial runner's LTE-adaptive steps interpolate the edge slightly
    # differently); compare away from edges
    t = np.asarray(pit.ts)
    tm = t % 2e-6
    mask = ((tm > 0.05e-6) & (tm < 0.95e-6)) | \
           ((tm > 1.05e-6) & (tm < 1.95e-6))
    err = np.abs(vs_[mask] - vp[mask])
    assert np.quantile(err, 0.99) < 0.15 and err.max() < 0.6
