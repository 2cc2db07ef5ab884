"""Multi-chip sharding at realistic width: the 1024-way DFF Monte-Carlo
sweep through `sharded_transweep` over the 8-virtual-device CPU mesh
(conftest provisions it), asserted equivalent to the unsharded vmapped
run. This is the bench workload (`bench.py bench_dff_sweep`) — sweep
parallelism is this domain's data parallelism (SURVEY §2.10.1), and
GSPMD must not change the numerics: each lane's adaptive integration is
independent, so sharded and local runs are the same program partitioned.
"""
import jax
import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.models.dff import dff_netlist
from cadnip_tpu.parallel.mesh import sharded_transweep, sweep_mesh


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-virtual-device CPU mesh")
@pytest.mark.integration
def test_sharded_1024way_dff_matches_local():
    cc = ct.parse_spice(dff_netlist())
    # 1024 Monte-Carlo lanes over load cap + driver widths; span covers
    # the first latch edge (51 ns) so real switching happens per lane
    tab = ct.montecarlo_table(cc, {"cq.c": 0.1, "mno1.w": 0.1,
                                   "mpo1.w": 0.1}, 1024, seed=7)
    mesh = sweep_mesh(jax.devices()[:8])
    span = (0, 1.0e-7)
    kw = dict(dt=3.333e-10, max_steps=8000)
    ssol = sharded_transweep(cc, tab, span, mesh=mesh, **kw)
    lsol = ct.transweep(cc, tab, span, **kw)
    sx = np.asarray(ssol.xs)
    lx = np.asarray(lsol.xs)
    assert sx.shape == lx.shape == (1024,) + lx.shape[1:]
    # same program, partitioned: results must agree to fp roundoff
    assert np.allclose(sx, lx, rtol=1e-7, atol=1e-9)
    q = np.asarray(ssol["q"])
    ts = ssol.ts
    after_edge = q[:, ts > 9e-8]
    assert np.isfinite(sx).all()
    # every lane latched D=0 at the first edge despite parameter spread
    assert float(np.max(after_edge)) < 0.5
