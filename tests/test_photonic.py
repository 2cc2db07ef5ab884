"""Photonic model package (reference `models/PhotonicModels.jl`, 28 .va
files): custom optical discipline (nature access OptE), vector nets
([0:3] buses scalarized by the parser), cross-file module instantiation,
and huge-coefficient laplace filters. End-to-end: a CW laser through an
attenuator into a photodetector reproduces the analytic detected power.
"""
import os

import numpy as np
import pytest

import cadnip_tpu as ct

VA_DIR = "/root/reference/models/PhotonicModels.jl/va"

pytestmark = pytest.mark.skipif(not os.path.isdir(VA_DIR),
                                reason="photonic model sources missing")


def test_photonic_package_compiles():
    from cadnip_tpu.va.codegen import load_va_file
    files = [f for f in sorted(os.listdir(VA_DIR)) if f.endswith(".va")]
    assert len(files) >= 25
    for f in files:
        load_va_file(os.path.join(VA_DIR, f))


def test_laser_attenuator_detector_chain():
    # CwLaser (10 dBm) -> 3 dB Attenuator -> PhotoDetector (1 A/W):
    # detected current = responsivity * P = 10^((10-3)/10) mW ~= 5.01 mA
    cc = ct.parse_spice(f"""photonic chain
.hdl "{VA_DIR}/CwLaser.va"
.hdl "{VA_DIR}/Attenuator.va"
.hdl "{VA_DIR}/PhotoDetector.va"
x1 l0 l1 l2 l3 CwLaser power=10
x2 l0 l1 l2 l3 a0 a1 a2 a3 Attenuator attenuation=3
x3 a0 a1 a2 a3 det PhotoDetector responsivity=1
rl det 0 1k
* PhotoDetector.va terminates opt_in[2] twice and never opt_in[3]
* (upstream model quirk); tie the floating reverse-wave net
rterm a3 0 1g
""")
    sol = ct.dc(cc)
    assert bool(sol.converged)
    p_mw = 10 ** ((10.0 - 3.0) / 10.0)          # 5.0119 mW
    i_expect = p_mw * 1e-3                      # A (responsivity 1)
    v_det = float(sol["det"])
    assert v_det == pytest.approx(i_expect * 1e3, rel=1e-3)
