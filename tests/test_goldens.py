"""Golden parity gates: checked-in f64 CPU reference waveforms for the
VACASK benchmark circuits (graetz, mul) and the DFF, regenerated per run
over a prefix span and compared by relative RMSE. The goldens are the
cross-backend anchor: bench.py compares its TPU runs against the same
files (tests/goldens/*.npz), so the benchmarked waveform is pinned to the
f64 CPU solution. Generation: /root/repo inline script (tran with
n_save=2001 over the full VACASK spans, default tolerances).
"""
import os

import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.models.dff import dff_netlist
from cadnip_tpu.models.vacask import GRAETZ, MUL

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def rel_rmse(a, b, scale):
    return float(np.sqrt(np.mean((a - b) ** 2))) / scale


def _compare(name, netlist, span, nodes, scale, tol, dt=None):
    g = np.load(os.path.join(GOLD, f"{name}.npz"))
    ts = g["ts"]
    m = ts <= span + 1e-15
    cc = ct.parse_spice(netlist)
    sol = ct.tran(cc, (0, span), dt=dt, save_ts=ts[m],
                  max_steps=2_000_000)
    assert bool(np.asarray(sol.converged))
    worst = 0.0
    for n in nodes:
        r = rel_rmse(np.asarray(sol[n]), g[n][m], scale)
        worst = max(worst, r)
    assert worst < tol, f"{name}: worst rel RMSE {worst:.3e} >= {tol}"
    return worst


@pytest.mark.integration
@pytest.mark.skipif(not os.path.exists(os.path.join(GOLD, "graetz.npz")),
                    reason="goldens not generated")
def test_graetz_matches_golden():
    # integration group: full 1 s serial replay is minutes of CPU on the
    # 1-core box (house rule: main suite finishes in minutes)
    # full-span replay on the identical grid: the same f64 CPU program is
    # deterministic, so any drift here is a real behavior change. (A
    # PREFIX-span run diverges at the 3e-4 relative level — that is the
    # integrator's path-dependent global accuracy at reltol=1e-4, which
    # bench.py reports for the TPU runs.)
    _compare("graetz", GRAETZ, 1.0, ["outp", "outn"], 20.0, 1e-8,
             dt=1e-6)


@pytest.mark.integration
@pytest.mark.skipif(not os.path.exists(os.path.join(GOLD, "mul.npz")),
                    reason="goldens not generated")
def test_mul_matches_golden():
    _compare("mul", MUL, 5e-3, ["2", "20"], 50.0, 1e-8, dt=1e-8)


@pytest.mark.skipif(not os.path.exists(os.path.join(GOLD, "dff.npz")),
                    reason="goldens not generated")
def test_dff_matches_golden():
    g = np.load(os.path.join(GOLD, "dff.npz"))
    cc = ct.parse_spice(dff_netlist())
    sol = ct.tran(cc, (0, 6e-7), dt=3.333e-10, max_steps=100000)
    assert bool(np.asarray(sol.converged))
    r = rel_rmse(np.asarray(sol["q"]), g["q"], 5.0)
    # identical span + grid + platform: near-deterministic replay
    assert r < 1e-9, r
