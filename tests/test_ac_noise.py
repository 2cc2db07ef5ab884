"""AC and noise analysis tests against closed-form answers
(reference test/ac.jl, test/noise.jl, test/design_flow.jl analogues)."""
import numpy as np
import pytest

from cadnip_tpu import Circuit, SimSpec
from cadnip_tpu.analyses.ac import ac, acdec
from cadnip_tpu.analyses.noise import noise

KB = 1.380649e-23
T0 = 300.15  # 27 C


def test_rc_lowpass_ac():
    r, c = 1e3, 1e-6  # fc = 159.15 Hz
    cir = Circuit("rc")
    cir.V("vs", "in", "0", dc=0.0, acmag=1.0)
    cir.R("r1", "in", "out", r)
    cir.C("c1", "out", "0", c)
    cc = cir.compile()
    freqs = acdec(10, 1.0, 1e5)
    sol = ac(cc, freqs)
    h = sol["out"]
    w = 2 * np.pi * freqs
    expect = 1.0 / (1.0 + 1j * w * r * c)
    assert np.allclose(h, expect, rtol=1e-6, atol=1e-9)
    # -3dB point
    fc = 1.0 / (2 * np.pi * r * c)
    sol3 = ac(cc, [fc])
    assert sol3.magnitude_db("out")[0] == pytest.approx(-3.0103, abs=1e-3)
    assert sol3.phase_deg("out")[0] == pytest.approx(-45.0, abs=1e-3)


def test_ac_phase_source():
    # 90-degree AC source phase shows up in the phasor
    cir = Circuit("ph")
    cir.V("vs", "in", "0", dc=0.0, acmag=2.0, acphase=90.0)
    cir.R("r1", "in", "0", 1e3)
    sol = ac(cir.compile(), [1e3])
    assert sol["in"][0] == pytest.approx(2j, rel=1e-9)


def test_common_source_amp_gain():
    # square-law MOSFET CS amp: Av = -gm*RD at midband (design_flow style)
    kp, w, l, vth = 110e-6, 20e-6, 1e-6, 0.7
    vgs, rd, vdd = 1.0, 10e3, 5.0   # vov=0.3: Id=99uA, Vd=4.01V (saturated)
    gm = kp * w / l * (vgs - vth)
    cir = Circuit("cs")
    cir.V("vdd", "vdd", "0", dc=vdd)
    cir.V("vg", "g", "0", dc=vgs, acmag=1.0)
    cir.R("rd", "vdd", "d", rd)
    cir.M("m1", "d", "g", "0", "0", kp=kp, w=w, l=l, vth=vth)
    sol = ac(cir.compile(SimSpec(gmin=0.0)), [1e3])
    av = sol["d"][0]
    assert av.real == pytest.approx(-gm * rd, rel=1e-6)
    assert abs(av.imag) < 1e-9


def test_resistor_thermal_noise_psd():
    # R1 from driven node to out, R2 to ground: S_out = 4kT*(R1||R2)
    r1, r2 = 1e3, 3e3
    cir = Circuit("rn")
    cir.V("vs", "in", "0", dc=0.0)
    cir.R("r1", "in", "out", r1)
    cir.R("r2", "out", "0", r2)
    sol = noise(cir.compile(), "out", [1e3], input="vs")
    rpar = r1 * r2 / (r1 + r2)
    assert sol.onoise_psd[0] == pytest.approx(4 * KB * T0 * rpar, rel=1e-6)
    # input-referred: divide by |R2/(R1+R2)|^2
    gain = r2 / (r1 + r2)
    assert sol.inoise_psd[0] == pytest.approx(
        4 * KB * T0 * rpar / gain**2, rel=1e-6)
    # per-device breakdown sums to the total
    tot = sum(v[0] for v in sol.contributions.values())
    assert tot == pytest.approx(sol.onoise_psd[0], rel=1e-12)


def test_kt_over_c_total_noise():
    # total integrated noise of an RC is kT/C independent of R
    r, c = 1e3, 1e-9
    cir = Circuit("ktc")
    cir.V("vs", "in", "0", dc=0.0)
    cir.R("r1", "in", "out", r)
    cir.C("c1", "out", "0", c)
    cc = cir.compile()
    fc = 1.0 / (2 * np.pi * r * c)
    freqs = acdec(40, fc * 1e-3, fc * 1e3)
    sol = noise(cc, "out", freqs)
    vrms = sol.total_noise()
    assert vrms == pytest.approx(np.sqrt(KB * T0 / c), rel=2e-2)


def test_diode_shot_noise():
    # forward-biased diode: S_i = 2qId into r_d||RL
    cir = Circuit("dn")
    cir.V("vs", "in", "0", dc=5.0)
    cir.R("r1", "in", "out", 1e3)
    cir.D("d1", "out", "0", **{"is": 1e-14})
    cc = cir.compile()
    from cadnip_tpu import dc as dc_solve
    op = dc_solve(cc)
    vd = float(op["out"])
    i_d = 1e-14 * (np.exp(vd / (KB * T0 / 1.602176634e-19)) - 1)
    q = 1.602176634e-19
    vt = KB * T0 / q
    gd = i_d / vt  # diode small-signal conductance (approx, >> gmin)
    sol = noise(cc, "out", [1e3])
    # both thermal (R) and shot (D) act into the same node impedance
    zout = 1.0 / (gd + 1e-3)
    expect = (4 * KB * T0 / 1e3 + 2 * q * i_d) * zout**2
    assert sol.onoise_psd[0] == pytest.approx(expect, rel=1e-2)


def test_flicker_noise_slope():
    cir = Circuit("fn")
    cir.V("vs", "in", "0", dc=5.0)
    cir.R("r1", "in", "out", 1e3)
    cir.D("d1", "out", "0", **{"is": 1e-14, "kf": 1e-16, "af": 1.0})
    sol = noise(cir.compile(), "out", [1.0, 10.0, 100.0])
    d = sol.contributions["d1"]
    # at low f the 1/f term dominates: each decade drops ~10x
    assert d[0] / d[1] == pytest.approx(10.0, rel=0.05)


def test_subsystem_siso_export():
    """`subsystem` SISO descriptor export (reference `src/ac.jl:374-388`):
    the exported (A, E, B, C, D) must reproduce the AC transfer exactly
    — RC lowpass vs the closed form and vs ac() itself."""
    from cadnip_tpu.analyses.ac import subsystem
    r, c = 1e3, 1e-6
    cir = Circuit("rc_sub")
    cir.V("vs", "in", "0", dc=0.0, acmag=1.0)
    cir.R("r1", "in", "out", r)
    cir.C("c1", "out", "0", c)
    cc = cir.compile()
    sys_out = subsystem(cc, "out")
    assert sys_out.A.shape == (cc.n, cc.n)
    freqs = acdec(5, 1.0, 1e4)
    h = sys_out.freqresp(freqs)
    w = 2 * np.pi * freqs
    assert np.allclose(h, 1.0 / (1.0 + 1j * w * r * c),
                       rtol=1e-6, atol=1e-9)
    assert np.allclose(h, ac(cc, freqs)["out"], rtol=1e-6, atol=1e-9)
    # branch-current output: I(vs) = -jwC/(1+jwRC) into the source
    sys_i = subsystem(cc, "vs#i")
    hi = sys_i.freqresp(freqs)
    assert np.allclose(hi, -1j * w * c / (1.0 + 1j * w * r * c),
                       rtol=1e-6, atol=1e-12)
