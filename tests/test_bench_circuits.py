"""Benchmark-circuit behavior tests: DFF latching, linear fast path,
mesh-sharded sweeps (the north-star workloads)."""
import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.analyses.tran_linear import is_linear, tran_linear
from cadnip_tpu.models.dff import dff_netlist, ring_oscillator_netlist
from cadnip_tpu.parallel.mesh import (sharded_dcsweep, sharded_transweep,
                                      sweep_mesh)


def test_dff_latches_data():
    res = ct.simulate(dff_netlist())
    sol = res["tran"]
    assert bool(sol.converged)
    q = np.asarray(sol["q"])
    ts = sol.ts

    def at(t):
        return float(q[np.argmin(np.abs(ts - t))])

    assert at(150e-9) < 0.5      # D=0 latched at the 51ns edge
    assert at(350e-9) < 0.5      # held through the transparent phase
    assert at(450e-9) > 4.5      # D=1 latched at the 401ns edge
    assert at(550e-9) > 4.5


def test_ring_oscillator_oscillates():
    cc = ct.parse_spice(ring_oscillator_netlist(stages=5))
    sol = ct.tran(cc, (0, 20e-9), dt=2e-11, max_steps=100000)
    assert bool(sol.converged)
    v = np.asarray(sol["n0"])
    late = sol.ts > 8e-9
    swing = v[late].max() - v[late].min()
    assert swing > 3.0           # rail-to-railish oscillation
    sig = v[late] - v[late].mean()
    crossings = np.sum(np.diff(np.sign(sig)) != 0)
    assert crossings >= 4


def test_tran_linear_matches_adaptive():
    cc = ct.parse_spice("""rc pulse
vs 1 0 dc 0 pulse 0 1 1u 1u 1u 1m 2m
r1 1 2 1k
c1 2 0 1u
""")
    assert is_linear(cc)
    lin = tran_linear(cc, (0, 5e-3), 1e-6)
    ad = ct.tran(cc, (0, 5e-3), dt=5e-6, dtmax=5e-6)
    vi = np.interp(ad.ts, lin.ts, np.asarray(lin["2"]))
    assert np.max(np.abs(vi - np.asarray(ad["2"]))) < 2e-3


def test_tran_linear_rejects_nonlinear():
    cir = ct.Circuit("nl")
    cir.V("v", "a", "0", dc=1.0)
    cir.D("d", "a", "0")
    cc = cir.compile()
    assert not is_linear(cc)
    with pytest.raises(ValueError):
        tran_linear(cc, (0, 1e-3), 1e-6)


def test_sharded_sweeps_match_local():
    import jax
    cir = ct.Circuit("shard")
    cir.V("v1", "in", "0", dc=5.0)
    cir.R("r1", "in", "out", 1e3)
    cir.D("d1", "out", "0", **{"is": 1e-14})
    cc = cir.compile()
    rs = np.geomspace(200, 20e3, 13)   # 13 points: exercises padding
    mesh = sweep_mesh(jax.devices())
    ssol = sharded_dcsweep(cc, {"r1.r": rs}, mesh=mesh)
    lsol = ct.dcsweep(cc, {"r1.r": rs})
    assert np.allclose(np.asarray(ssol["out"]), np.asarray(lsol["out"]),
                       rtol=1e-9)
    st = sharded_transweep(cc, {"r1.r": rs}, (0, 1e-6), mesh=mesh,
                           dt=1e-8, max_steps=5000)
    assert np.asarray(st.xs).shape[0] == 13
    assert np.isfinite(np.asarray(st.xs)).all()
