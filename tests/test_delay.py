"""VA `absdelay` transport delay (reference DDE path,
`src/mna/delay.jl:20-28` threaded through `src/mna/solve.jl:2351-2361`).

TPU-native design: the transient runner carries a fixed-size chronological
history ring of every delayed expression's value; each trial step reads the
interpolated value at t - tau as explicit history (the step size is capped
at the shortest delay so the query never lands inside the current step).
"""
import numpy as np
import pytest

from cadnip_tpu import dc, parse_spice, tran

DLINE_VA = """
`include "disciplines.vams"
module dline(a, y);
  inout a, y;
  electrical a, y;
  parameter real td = 5u from (0:inf);
  analog V(y) <+ absdelay(V(a), td);
endmodule

module dmix(a, y);
  inout a, y;
  electrical a, y;
  parameter real td = 4u;
  parameter real k = 0.5;
  analog V(y) <+ V(a) + k * absdelay(V(a), td);
endmodule
"""


@pytest.fixture()
def va_path(tmp_path):
    p = tmp_path / "dline.va"
    p.write_text(DLINE_VA)
    return str(p)


def test_absdelay_dc_is_identity(va_path):
    # at DC the delayed value equals the instantaneous value
    cc = parse_spice(f"""delay dc
.hdl "{va_path}"
v1 in 0 dc 2.5
x1 in out dline td=1u
r1 out 0 1k
""")
    sol = dc(cc)
    assert sol["out"] == pytest.approx(2.5, abs=1e-9)


def test_absdelay_shifts_waveform(va_path):
    td = 5e-6
    cc = parse_spice(f"""delay line
.hdl "{va_path}"
v1 in 0 dc 0 pulse 0 1 2u 1u 1u 10u 40u
x1 in out dline td=5u
r1 out 0 1k
""")
    sol = tran(cc, (0, 30e-6), dt=0.1e-6)
    assert bool(np.asarray(sol.converged))
    ts = np.asarray(sol.ts)
    vin = np.asarray(sol["in"])
    vout = np.asarray(sol["out"])
    # out(t) == in(t - td): compare on the uniform grid (td = 50 samples)
    shift = int(round(td / (ts[1] - ts[0])))
    err = vout[shift:] - vin[:-shift]
    assert np.max(np.abs(err)) < 0.03
    # plateau values exact: in is high on [3u, 12u] -> out high on [8u, 17u]
    i = np.argmin(np.abs(ts - 12e-6))
    assert vout[i] == pytest.approx(1.0, abs=1e-6)
    i = np.argmin(np.abs(ts - 25e-6))
    assert vout[i] == pytest.approx(0.0, abs=1e-6)
    # before the delayed edge arrives, out holds the initial (DC) history
    i = np.argmin(np.abs(ts - 5e-6))
    assert vout[i] == pytest.approx(0.0, abs=1e-6)


def test_absdelay_in_expression(va_path):
    # delayed term mixed with an instantaneous one: y = a + k*a(t-td)
    cc = parse_spice(f"""delay mix
.hdl "{va_path}"
v1 in 0 dc 0 pulse 0 1 1u 0.5u 0.5u 20u 50u
x1 in out dmix td=4u k=0.5
r1 out 0 1k
""")
    sol = tran(cc, (0, 12e-6), dt=0.1e-6)
    assert bool(np.asarray(sol.converged))
    ts = np.asarray(sol.ts)
    vout = np.asarray(sol["out"])
    # 2u < t < 5u: only the instantaneous edge has arrived -> 1.0
    i = np.argmin(np.abs(ts - 3e-6))
    assert vout[i] == pytest.approx(1.0, abs=1e-3)
    # t > 6u: both terms high -> 1.5
    i = np.argmin(np.abs(ts - 9e-6))
    assert vout[i] == pytest.approx(1.5, abs=1e-3)


def test_absdelay_ac_phase(va_path):
    # small-signal transport delay: H(jw) = e^{-jw td} exactly
    from cadnip_tpu.analyses.ac import ac
    cc = parse_spice(f"""delay ac
.hdl "{va_path}"
v1 in 0 dc 1 ac 1
x1 in out dline td=5u
r1 out 0 1k
""")
    freqs = np.array([1e3, 1e4, 5e4])
    sol = ac(cc, freqs)
    h = np.asarray(sol["out"])
    td = 5e-6
    expect = np.exp(-1j * 2 * np.pi * freqs * td)
    assert np.abs(h).max() == pytest.approx(1.0, rel=1e-6)
    assert np.allclose(np.angle(h), np.angle(expect), atol=1e-6)
