"""Golden-value design flow (modeled on the reference's
`test/design_flow.jl:1-70`): an NMOS common-source amplifier whose
operating point, gain, bandwidth, transient swing, and output noise are
all asserted against HAND-DERIVED square-law values — end-to-end numeric
verification through dc -> dcsweep -> ac -> tran -> noise with no
external oracle."""
import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.analyses.ac import ac
from cadnip_tpu.analyses.noise import noise
from cadnip_tpu.analyses.sweeps import dcsweep
from cadnip_tpu.mna.spec import KB

# design: vdd=5, vto=1, kp'=W/L*kp = 2e-3 A/V^2, vgs=1.5 -> vov=0.5
#   ID  = 0.5 * 2e-3 * 0.25       = 250 uA
#   gm  = 2e-3 * 0.5              = 1 mS
#   Rd  = 10k  -> Av = -gm*Rd     = -10, vout = 5 - 2.5 = 2.5 V
#   CL  = 1nF  -> f3dB = 1/(2*pi*Rd*CL) = 15.92 kHz
VDD = 5.0
VTO = 1.0
KP = 200e-6
WL = 10.0
VGS = 1.5
RD = 10e3
CL = 1e-9
ID = 0.5 * KP * WL * (VGS - VTO) ** 2
GM = KP * WL * (VGS - VTO)
AV = GM * RD
F3 = 1.0 / (2 * np.pi * RD * CL)

DECK = f"""common source amp
vdd vdd 0 dc {VDD}
vg g 0 dc {VGS} ac 1
rd vdd out {RD}
cl out 0 {CL}
m1 out g 0 0 nch w={WL}u l=1u
.model nch nmos vto={VTO} kp={KP}
"""


@pytest.fixture(scope="module")
def cc():
    return ct.parse_spice(DECK)


def test_dc_operating_point(cc):
    sol = ct.dc(cc)
    assert bool(sol.converged)
    assert float(sol["out"]) == pytest.approx(VDD - ID * RD, rel=1e-4)
    op = sol.op_info("m1")
    assert op["ids"] == pytest.approx(ID, rel=1e-4)
    assert op["gm"] == pytest.approx(GM, rel=1e-4)


def test_dc_sweep_slope_is_av(cc):
    vg = np.linspace(VGS - 0.01, VGS + 0.01, 5)
    sol = dcsweep(cc, {"vg.dc": vg})
    vout = np.asarray(sol["out"])
    slope = np.gradient(vout, vg).mean()
    assert slope == pytest.approx(-AV, rel=1e-2)


def test_ac_gain_and_bandwidth(cc):
    freqs = np.logspace(2, 6, 81)
    sol = ac(cc, freqs)
    h = np.asarray(sol["out"])
    mag = np.abs(h)
    # low-frequency gain
    assert mag[0] == pytest.approx(AV, rel=1e-3)
    # -3dB point
    i3 = np.argmin(np.abs(mag - AV / np.sqrt(2.0)))
    assert freqs[i3] == pytest.approx(F3, rel=0.1)
    # phase: inverting at DC, -135 deg at f3dB
    ph = np.angle(h, deg=True)
    assert abs(abs(ph[0]) - 180.0) < 1.0


def test_tran_small_signal_amplification(cc):
    cc2 = ct.parse_spice(DECK.replace(
        f"vg g 0 dc {VGS} ac 1",
        f"vg g 0 dc {VGS} sin {VGS} 0.01 1k"))
    sol = ct.tran(cc2, (0, 2e-3), dt=2e-6)
    assert bool(np.asarray(sol.converged))
    v = np.asarray(sol["out"])
    late = np.asarray(sol.ts) > 1e-3
    swing = (v[late].max() - v[late].min()) / 2.0
    assert swing == pytest.approx(0.01 * AV, rel=2e-2)


def test_output_noise_breakdown(cc):
    freqs = np.asarray([100.0])
    sol = noise(cc, "out", freqs)
    t = 300.15
    # Rd thermal 4kT/R * Rd^2 plus channel thermal 8/3 kT gm * Rd^2
    s_rd = 4 * KB * t * RD
    s_ch = 8.0 / 3.0 * KB * t * GM * RD * RD
    expect = s_rd + s_ch
    got = float(np.asarray(sol.onoise_psd)[0])
    assert got == pytest.approx(expect, rel=1e-2)
