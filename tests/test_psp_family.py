"""PSP family completeness: PSP103T (self-heating), standalone
JUNCAP200, PSP103 NQS (reference `models/PSPModels.jl/va/psp103t.va`,
`juncap200.va`, `psp103_nqs.va` — thin wrappers selecting `SelfHeating`
/ `JUNCAP_StandAlone` / NQS defines over the shared PSP103/JUNCAP200
includes).

The self-heating variant exercises the standard `thermal` discipline
access functions Temp()/Pwr() (disciplines.vams builtins — va/parser.py
acc_kind seeding) and the 5th terminal DT carrying the device
temperature rise; JUNCAP200 standalone is the PSP junction model as a
2-terminal diode.
"""
import os

import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.mna.spec import SimSpec
from cadnip_tpu.mna.structure import Circuit

VA_DIR = "/root/reference/models/PSPModels.jl/va"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(VA_DIR, "psp103t.va")),
    reason="PSP sources not present")


def _load(name, module):
    from cadnip_tpu.va.codegen import load_va_file
    return load_va_file(os.path.join(VA_DIR, name))[module]


def test_psp_family_modules_compile():
    """All three PSP-family wrappers host-compile with the expected
    terminal lists and internal-node counts (cheap: no XLA solve)."""
    j = _load("juncap200.va", "JUNCAP200")
    assert j.terminals == ("A", "K") and j.n_local == 2
    t = _load("psp103t.va", "PSP103TVA")
    assert t.terminals == ("D", "G", "S", "B", "DT")
    n = _load("psp103_nqs.va", "PSPNQS103VA")
    assert n.terminals == ("D", "G", "S", "B")
    assert n.n_local > t.n_local            # NQS segmentation nodes


@pytest.mark.integration
def test_juncap200_standalone_diode():
    """JUNCAP200 as a 2-terminal junction, one compiled DC sweep over
    both polarities (`juncap200.va` JUNCAP_StandAlone): exponential
    forward turn-on, small mid-reverse leakage, and the
    trap-assisted-tunneling reverse current rising again at -5 V —
    the measured physics of the model at default parameters."""
    from cadnip_tpu.analyses.sweeps import dcsweep
    m = _load("juncap200.va", "JUNCAP200")
    assert m.terminals == ("A", "K")
    c = Circuit("jc")
    c.V("vs", "in", "0", dc=0.0)
    c.R("rs", "in", "a", 100.0)
    c.add(m, "j1", ("a", "0"),
          AB=1e-12, AB__given=1.0, LS=4e-6, LS__given=1.0)
    cc = c.compile(SimSpec())
    vals = np.array([-5.0, -1.0, 0.9, 1.1])
    sw = dcsweep(cc, {"vs.dc": vals})
    assert np.asarray(sw.converged).all()
    i_vs = np.asarray(sw.i("vs"))           # current INTO the source
    i_dev = -i_vs                           # junction current at each V
    # forward: exponential turn-on over the last 0.2 V
    assert i_dev[3] > 1e-5
    assert i_dev[3] > 100 * abs(i_dev[2])
    # mid-reverse: leakage level
    assert abs(i_dev[1]) < 1e-7
    # deep reverse: tunneling current exceeds mid-reverse leakage
    assert abs(i_dev[0]) > 10 * abs(i_dev[1])


@pytest.mark.integration
def test_psp103t_self_heating_dc():
    """PSP103T common-source stage: converged OP, drain current
    consistent with the load resistor, and a POSITIVE device
    temperature rise on the DT terminal scaling with dissipation
    (`psp103t.va` SelfHeating thermal network Pwr/Temp/RTH)."""
    m = _load("psp103t.va", "PSP103TVA")
    assert m.terminals == ("D", "G", "S", "B", "DT")
    # SWGEO=0 (local-parameter mode) is REQUIRED for RTH to act: in the
    # default global mode (SWGEO=1) PSP103 computes RTH_p = RTHO +
    # RTHW1/deltaRth (both default 0) and gates Pdiss on RTH_p > 1e-3,
    # so the local RTH is ignored and dt == 0 is the model's own answer
    # (PSP103_module.include:1302 vs :1497, gate at :2597).
    params = {"W": 10e-6, "W__given": 1.0, "L": 1e-6, "L__given": 1.0,
              "RTH": 500.0, "RTH__given": 1.0,
              "SWGEO": 0.0, "SWGEO__given": 1.0}
    if m.va_specialize is not None:
        m = m.va_specialize(params)
    c = Circuit("psp_t")
    c.V("vdd", "vdd", "0", dc=1.2)
    c.V("vg", "g", "0", dc=0.9)
    c.R("rd", "vdd", "d", 2e3)
    c.add(m, "m1", ("d", "g", "0", "0", "dt"), **params)
    cc = c.compile(SimSpec())
    sol = ct.dc(cc)
    assert bool(np.asarray(sol.converged))
    vd = float(np.asarray(sol["d"]))
    assert 0.0 < vd < 1.2
    i_d = (1.2 - vd) / 2e3
    assert i_d > 1e-5                       # FET is on
    # self-heating: T rise ~ RTH * P > 0 on the thermal terminal
    dt_rise = float(np.asarray(sol["dt"]))
    p_diss = i_d * vd
    assert dt_rise > 0.0
    # exact at default STRTH=0: Pwr(br_rth) <+ Temp/RTH_T balances
    # Pwr(br_ith) <+ -Pdiss with Pdiss = Ids*Vds == i(rd)*v(d)
    assert dt_rise == pytest.approx(500.0 * p_diss, rel=0.01)


@pytest.mark.integration
def test_psp103_nqs_dc():
    """PSP103 NQS variant: the charge-segmentation internals (9 extra
    nodes/FET) compile and the DC OP matches the physics of the same
    stage (`psp103_nqs.va`; NQS only alters transient charge
    dynamics, so the OP must be QS-identical to ~tolerance)."""
    m = _load("psp103_nqs.va", "PSPNQS103VA")
    assert m.terminals == ("D", "G", "S", "B")
    if m.va_specialize is not None:
        m = m.va_specialize({"W": 10e-6, "W__given": 1.0,
                             "L": 1e-6, "L__given": 1.0,
                             "SWNQS": 9.0, "SWNQS__given": 1.0})
    c = Circuit("psp_nqs")
    c.V("vdd", "vdd", "0", dc=1.2)
    c.V("vg", "g", "0", dc=0.8)
    c.R("rd", "vdd", "d", 10e3)
    c.add(m, "m1", ("d", "g", "0", "0"),
          W=10e-6, W__given=1.0, L=1e-6, L__given=1.0,
          SWNQS=9.0, SWNQS__given=1.0)
    cc = c.compile(SimSpec())
    sol = ct.dc(cc)
    assert bool(np.asarray(sol.converged))
    vd = float(np.asarray(sol["d"]))
    assert 0.0 < vd < 1.0
