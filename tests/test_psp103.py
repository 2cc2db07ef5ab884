"""PSP 103.4 — the reference's heavy compile case (PSPModels.jl,
`models/PSPModels.jl/va/psp103.va`, 782 parameters, 12 nodes).

Compile-time strategy under test (va/codegen.py): the (params, temp)-only
setup pass (~35k of ~51k traced ops) is hoisted out of the jit and
evaluated eagerly on CPU per solve (`DeviceModel.va_setup`); XLA:CPU's
fusion pass is disabled for big-model circuits (`CompiledCircuit.jit`).
A 1-FET DC used to exceed 45 minutes / 24 GB; it must now run in ~2 min
including all compiles (most of it XLA) and converge in <10 Newton steps.
"""
import os

import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.mna.spec import SimSpec
from cadnip_tpu.mna.structure import Circuit

PSP_VA = "/root/reference/models/PSPModels.jl/va/psp103.va"

pytestmark = pytest.mark.skipif(not os.path.exists(PSP_VA),
                                reason="PSP103 source not present")


@pytest.fixture(scope="module")
def psp_model():
    from cadnip_tpu.va.codegen import load_va_file
    return load_va_file(PSP_VA)["PSP103VA"]


@pytest.mark.integration
def test_psp103_common_source_dc(psp_model):
    # NMOS common-source stage at default (1 um-class) PSP parameters:
    # VDD=1.2, VG=0.8, RD=10k. Checks convergence, a sane operating
    # point, and KCL-consistent terminal currents.
    m = psp_model
    assert m.va_setup is not None          # host-setup hoisting is on
    c = Circuit("psp_cs")
    c.V("vdd", "vdd", "0", dc=1.2)
    c.V("vg", "g", "0", dc=0.8)
    c.R("rd", "vdd", "d", 10e3)
    if m.va_specialize is not None:
        m = m.va_specialize({"W": 10e-6, "W__given": 1.0,
                             "L": 1e-6, "L__given": 1.0})
        # source/drain access resistances collapse at default params
        assert len(m.collapses) >= 5
    c.add(m, "m1", ("d", "g", "0", "0"),
          W=10e-6, W__given=1.0, L=1e-6, L__given=1.0)
    cc = c.compile(SimSpec())
    assert cc.n <= 8                       # collapse shrank the system
    sol = ct.dc(cc)
    assert bool(np.asarray(sol.converged))
    assert int(np.asarray(sol.iters)) < 15
    vd = float(sol["d"])
    assert 0.0 < vd < 1.0                  # FET is on, drain pulled down
    id_rd = (1.2 - vd) / 10e3
    cur = sol.currents("m1")
    # drain current into the FET equals the resistor current (KCL);
    # gate/bulk leakage negligible at these conditions
    assert cur["D"] == pytest.approx(id_rd, rel=1e-6)
    assert abs(cur["G"]) < 1e-9
    assert cur["S"] == pytest.approx(-id_rd, rel=1e-4)


@pytest.mark.skipif(os.environ.get("CADNIP_INTEGRATION", "") != "1",
                    reason="integration group (second full XLA compile)")
def test_psp103_vg_sweep(psp_model):
    m = psp_model
    if m.va_specialize is not None:
        m = m.va_specialize({"W": 10e-6, "W__given": 1.0,
                             "L": 1e-6, "L__given": 1.0})
    c = Circuit("psp_cs")
    c.V("vdd", "vdd", "0", dc=1.2)
    c.V("vg", "g", "0", dc=0.8)
    c.R("rd", "vdd", "d", 10e3)
    c.add(m, "m1", ("d", "g", "0", "0"),
          W=10e-6, W__given=1.0, L=1e-6, L__given=1.0)
    cc = c.compile(SimSpec())
    # vmapped VG sweep through the jitted solver: more gate drive must
    # pull the drain lower, monotonically
    sw = ct.dcsweep(cc, {"vg.dc": np.array([0.5, 0.7, 0.9, 1.1])})
    vds = np.asarray(sw["d"])
    assert np.all(np.diff(vds) < 0)
