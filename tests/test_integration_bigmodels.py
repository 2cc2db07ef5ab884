"""Opt-in integration tests with big compact models (the reference's
`integration` test group, `test/runtests.jl:128-143`): slow compiles,
excluded from the default core run. Enable with CADNIP_INTEGRATION=1.
"""
import os

import numpy as np
import pytest

import cadnip_tpu as ct

VA_DIR = "/root/reference/models/VADistillerModels.jl/va"

pytestmark = pytest.mark.skipif(
    os.environ.get("CADNIP_INTEGRATION", "") != "1"
    or not os.path.isdir(VA_DIR),
    reason="integration group (CADNIP_INTEGRATION=1) with model sources")


def test_bsim3_ring_oscillator():
    # 3-stage CMOS ring with BSIM3v3 (.model level=49), 0.35u-class params:
    # must oscillate rail-to-rail with a sub-ns period
    stages = 3
    lines = ["* bsim3 ring oscillator", "vdd vdd 0 dc 3.3"]
    for i in range(stages):
        a, b = f"n{i}", f"n{(i + 1) % stages}"
        lines.append(f"mp{i} {b} {a} vdd vdd pch w=4u l=0.35u")
        lines.append(f"mn{i} {b} {a} 0 0 nch w=2u l=0.35u")
        lines.append(f"c{i} {b} 0 5f")
    lines.append(".model nch nmos level=49 vth0=0.6 tox=7.5n u0=400")
    lines.append(".model pch pmos level=49 vth0=-0.6 tox=7.5n u0=150")
    cc = ct.parse_spice("\n".join(lines) + "\n")
    assert any(g.model.name == "va:sp_bsim3v3" for g in cc.groups)
    sol = ct.tran(cc, (0, 5e-9), dt=5e-12, ic={"n0": 3.3},
                  max_steps=100000)
    assert bool(np.asarray(sol.converged))
    v = np.asarray(sol["n1"])
    crossings = int(np.abs(np.diff((v > 1.65).astype(int))).sum())
    assert crossings >= 10          # sustained oscillation
    assert v.max() > 3.0 and v.min() < 0.3   # rail-to-rail
