"""Transient tests against analytical solutions
(reference test strategy: test/transients.jl analogues)."""
import numpy as np
import pytest

from cadnip_tpu import Circuit, Pulse, Sin, PWL, tran


def test_rc_charging():
    # V step through R into C: v_c(t) = 5(1 - exp(-t/RC)), RC = 1 ms
    r, c = 1e3, 1e-6
    cir = Circuit("rc")
    cir.V("vs", "in", "0", wave=Pulse(0.0, 5.0, td=0.0, tr=1e-9))
    cir.R("r1", "in", "out", r)
    cir.C("c1", "out", "0", c)
    cc = cir.compile()
    sol = tran(cc, (0, 5e-3), dt=5e-6)
    assert bool(sol.converged)
    vc = np.asarray(sol["out"])
    expect = 5.0 * (1.0 - np.exp(-sol.ts / (r * c)))
    err = np.max(np.abs(vc - expect))
    assert err < 5e-3  # 0.1% of 5V


def test_rc_sine_steady_state():
    # sine through RC lowpass: check amplitude and phase in late cycles
    r, c, f = 1e3, 1e-6, 1e3   # fc = 159 Hz, f = 1 kHz -> strong attenuation
    cir = Circuit("rcsin")
    cir.V("vs", "in", "0", wave=Sin(0.0, 1.0, f))
    cir.R("r1", "in", "out", r)
    cir.C("c1", "out", "0", c)
    sol = tran(cir.compile(), (0, 10e-3), dt=2e-6)
    assert bool(sol.converged)
    vc = np.asarray(sol["out"])
    w = 2 * np.pi * f
    gain = 1.0 / np.hypot(1.0, w * r * c)
    late = sol.ts > 6e-3  # several time constants in
    amp = 0.5 * (vc[late].max() - vc[late].min())
    assert amp == pytest.approx(gain, rel=2e-2)


def test_lc_oscillation_frequency():
    # L-C tank with initial kick: check oscillation period via PWL source
    l, c = 1e-3, 1e-9   # f0 = 159.2 kHz, Z0 = 1 kOhm
    cir = Circuit("lc")
    cir.V("vs", "in", "0", wave=PWL([0, 0, 1e-7, 1, 1e-3, 1]))
    cir.R("rs", "in", "a", 100e3)   # R >> Z0: underdamped parallel tank
    cir.L("l1", "a", "0", l)
    cir.C("c1", "a", "0", c)
    sol = tran(cir.compile(), (0, 60e-6), dt=2e-8)
    assert bool(sol.converged)
    va = np.asarray(sol["a"])
    # count zero crossings of (va - mean) in the ringing phase
    sig = va - va.mean()
    crossings = np.where(np.diff(np.sign(sig)) != 0)[0]
    assert len(crossings) > 6
    periods = 2 * np.diff(sol.ts[crossings])
    f_est = 1.0 / np.median(periods)
    f0 = 1.0 / (2 * np.pi * np.sqrt(l * c))
    assert f_est == pytest.approx(f0, rel=0.05)


def test_diode_rectifier():
    # half-wave rectifier with RC smoothing: output stays near peak-vdiode
    cir = Circuit("rect")
    cir.V("vs", "in", "0", wave=Sin(0.0, 5.0, 1e3))
    cir.D("d1", "in", "out", **{"is": 1e-14})
    cir.C("c1", "out", "0", 10e-6)
    cir.R("rl", "out", "0", 10e3)
    sol = tran(cir.compile(), (0, 5e-3), dt=5e-6)
    assert bool(sol.converged)
    vout = np.asarray(sol["out"])
    late = sol.ts > 2e-3
    assert vout[late].min() > 3.5
    assert vout[late].max() < 5.0


def test_pulse_breakpoints_hit():
    # sharp pulse edges must be resolved exactly (breakpoint handling)
    cir = Circuit("pulse")
    cir.V("vs", "in", "0", wave=Pulse(0.0, 1.0, td=1e-4, tr=1e-9, tf=1e-9,
                                      pw=1e-4, per=1e30))
    cir.R("r1", "in", "out", 1e3)
    cir.R("r2", "out", "0", 1e3)
    sol = tran(cir.compile(), (0, 4e-4), dt=1e-6)
    assert bool(sol.converged)
    vout = np.asarray(sol["out"])
    ts = sol.ts
    assert np.all(np.abs(vout[ts < 0.99e-4]) < 1e-9)
    mid = (ts > 1.05e-4) & (ts < 1.95e-4)
    assert np.allclose(vout[mid], 0.5, atol=1e-6)
    assert np.all(np.abs(vout[ts > 2.1e-4]) < 1e-6)


def test_mosfet_inverter_switching():
    # resistive-load NMOS inverter driven by a pulse: logic levels flip
    cir = Circuit("inv")
    cir.V("vdd", "vdd", "0", dc=5.0)
    cir.V("vin", "g", "0", wave=Pulse(0.0, 5.0, td=1e-6, tr=1e-9, tf=1e-9,
                                      pw=4e-6, per=1e30))
    cir.R("rd", "vdd", "d", 10e3)
    cir.M("m1", "d", "g", "0", "0", kp=200e-6, w=10e-6, l=1e-6, vth=1.0,
          cgs=1e-15, cgd=1e-15)
    sol = tran(cir.compile(), (0, 8e-6), dt=1e-8)
    assert bool(sol.converged)
    vd = np.asarray(sol["d"])
    ts = sol.ts
    assert np.all(vd[ts < 0.9e-6] > 4.99)       # off -> high
    on = (ts > 1.5e-6) & (ts < 4.5e-6)
    assert np.all(vd[on] < 0.5)                  # on -> low
    assert np.all(vd[ts > 6.0e-6] > 4.9)         # off again
