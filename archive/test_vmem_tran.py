"""VMEM integrator kernel (ops/pallas_tran.py): the whole adaptive
transient loop as one Pallas TPU program. On CPU these tests run the
kernel in interpret mode — same trace, no Mosaic — and compare against
the f64 XLA runner (f32 kernel: expect ~1e-3-relative waveforms)."""
import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.ops.pallas_tran import supported, vmem_tran

RC = """RC
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


def test_rc_matches_xla_runner():
    cc = ct.parse_spice(RC)
    assert supported(cc)
    ref = ct.tran(cc, (0, 8e-3), dt=8e-6)
    sol = vmem_tran(cc, (0, 8e-3), dt=8e-6, interpret=True,
                    rows_per_chunk=256)
    assert bool(np.asarray(sol.converged))
    v = np.asarray(sol["2"])
    vr = np.asarray(ref["2"])
    assert np.sqrt(np.mean((v - vr) ** 2)) < 2e-3
    assert np.abs(v - vr).max() < 1e-2


@pytest.mark.integration
def test_graetz_matches_xla_runner():
    cc = ct.parse_spice(GRAETZ)
    assert supported(cc)
    ref = ct.tran(cc, (0, 0.06), dt=100e-6)
    sol = vmem_tran(cc, (0, 0.06), dt=100e-6, interpret=True,
                    rows_per_chunk=128)
    assert bool(np.asarray(sol.converged))
    v = np.asarray(sol.v("outp", "outn"))
    vr = np.asarray(ref.v("outp", "outn"))
    # f32 kernel vs f64 runner on a ~18 V waveform
    assert np.sqrt(np.mean((v - vr) ** 2)) < 0.05
    late = np.asarray(sol.ts) > 0.04
    assert 16.5 < v[late].min() < v[late].max() < 19.0


def test_unsupported_falls_out():
    big = ct.Circuit("big")
    big.V("v0", "n0", "0", dc=1.0)
    for i in range(200):
        big.R(f"r{i}", f"n{i}", f"n{i+1}", 10.0)
    cc = big.compile(solver="dense")
    assert not supported(cc)       # > 128 unknowns
    with pytest.raises(ValueError):
        vmem_tran(cc, (0, 1e-6), dt=1e-8, interpret=True)
