"""External-oracle waveform check: the reference's work-precision
anchor circuit (`/root/reference/benchmarks/vacask/wpd/filter.sp`, a
3rd-order Butterworth LC ladder with a known closed-form transient,
driven by a unit sine at omega = 1). The golden here is computed from
the circuit's 3-state LTI system by numpy eigendecomposition — a
machine-precision oracle independent of this simulator's integrators
(unlike tests/goldens/*.npz, which are self-generated f64 waveforms).

States x = (iL1, vC2, iL3), input u = sin(t), vout = R*iL3 = iL3:
  x' = A x + b sin(t),  A = [[0, -1/L1, 0],
                             [1/C2, 0, -1/C2],
                             [0, 1/L3, -R/L3]],  b = (1/L1, 0, 0)
Closed form: particular sinusoid from (jw I - A)^-1 b at w=1 plus the
homogeneous decay e^{At} fitted to x(0) = 0.
"""
import os

import numpy as np
import pytest

import cadnip_tpu as ct

FILTER_SP = "/root/reference/benchmarks/vacask/wpd/filter.sp"

L1, C2, L3, R = 1.5, 4.0 / 3.0, 0.5, 1.0


def exact_vout(ts):
    A = np.array([[0.0, -1.0 / L1, 0.0],
                  [1.0 / C2, 0.0, -1.0 / C2],
                  [0.0, 1.0 / L3, -R / L3]])
    b = np.array([1.0 / L1, 0.0, 0.0])
    # particular solution x_p(t) = Im(xc * e^{jt})
    xc = np.linalg.solve(1j * np.eye(3) - A, b)
    # homogeneous: x_h(0) = -x_p(0) so that x(0) = 0
    w, V = np.linalg.eig(A)
    c = np.linalg.solve(V, -np.imag(xc))
    ts = np.asarray(ts)
    xh = (V[2, :][None, :] * np.exp(np.outer(ts, w))) @ c
    xp = np.imag(xc[2] * np.exp(1j * ts))
    return np.real(xh) + xp


def _deck():
    if os.path.exists(FILTER_SP):
        return open(FILTER_SP).read()
    # inline copy of the published benchmark circuit
    return """Third order low pass Butterworth filter
V1 vin 0 SIN(0, 1, 0.15915494309189535)
L1 vin n1 1.5
C2 n1 0 1.3333333333333333
L3 n1 vout 0.5
R4 vout 0 1.0
.end
"""


def rel_l2(v, ref):
    return float(np.sqrt(np.mean((v - ref) ** 2))
                 / np.sqrt(np.mean(ref ** 2)))


def test_butterworth_adaptive_vs_closed_form():
    """Adaptive trap runner against the closed form at two tolerances:
    both inside gates, and the tighter tolerance strictly better (the
    work-precision property the reference's wpd benchmark measures)."""
    cc = ct.parse_spice(_deck())
    errs = []
    for rtol in (1e-4, 1e-6):
        from cadnip_tpu.mna.spec import SimSpec
        cc2 = ct.parse_spice(_deck(), spec=SimSpec(reltol=rtol))
        sol = ct.tran(cc2, (0, 30.0))
        ts = np.asarray(sol.ts)
        ref = exact_vout(ts)
        errs.append(rel_l2(np.asarray(sol["vout"]), ref))
    # measured: 5.0e-3 @ reltol 1e-4, 2.6e-4 @ 1e-6 (the 1001-point
    # save-grid interpolation contributes at the tight end)
    assert errs[0] < 1.5e-2, errs
    assert errs[1] < 1e-3, errs
    assert errs[1] < 0.25 * errs[0]


@pytest.mark.integration
def test_butterworth_pit_vs_closed_form():
    """Fixed-step PIT runner against the closed form (dt = 3 ms,
    trapezoidal: O(dt^2) global error ~ 1e-6-level)."""
    from cadnip_tpu.analyses.tran_pit import tran_pit
    cc = ct.parse_spice(_deck())
    sol = tran_pit(cc, (0, 8.0), 1e-3, window=1000)
    assert not bool(np.asarray(sol.stats.fail))
    ts = np.asarray(sol.ts)
    err = rel_l2(np.asarray(sol["vout"]), exact_vout(ts))
    assert err < 1e-5, err
