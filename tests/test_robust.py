"""Robustness tiers beyond the homotopy scan: pseudo-transient rescue
(reference CedarRobustNLSolve PseudoTransient member, `src/mna/solve.jl:
463-527`) and UIC implicit-Euler warmup (CedarUICOp,
`src/mna/dcop.jl:311-411`)."""
import jax.numpy as jnp
import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.mna.newton import make_ptran_rescue, make_uic_warmup


def _diode_chain():
    return ct.parse_spice("""diode chain
v1 in 0 dc 5
r1 in a 1k
d1 a b d
d2 b 0 d
.model d d is=1e-14
""")


def test_ptran_rescue_matches_dc():
    cc = _diode_chain()
    ref = ct.dc(cc)
    assert bool(ref.converged)
    rescue = make_ptran_rescue(cc)
    r = rescue(jnp.zeros(cc.n), cc.params0(), cc.spec.dyn())
    assert bool(np.asarray(r.converged))
    assert np.allclose(np.asarray(r.x), np.asarray(ref.x), atol=1e-6)


def test_dc_rescue_kwarg_accepted():
    cc = _diode_chain()
    sol = ct.dc(cc, rescue=True)
    assert bool(sol.converged)
    sol = ct.dc(cc, rescue=False)
    assert bool(sol.converged)


def test_uic_warmup_projects_algebraic_rows():
    # UIC start: caps hold their .ic, but the source node is algebraic and
    # must snap to the source value during warmup instead of starting the
    # integrator from an inconsistent zero
    cc = ct.parse_spice("""uic rc
v1 in 0 dc 5
r1 in out 1k
c1 out 0 1u
""")
    sol = ct.tran(cc, (0, 5e-3), dt=5e-6, uic=True, ic={"out": 2.0})
    assert bool(np.asarray(sol.converged))
    ts = np.asarray(sol.ts)
    v = np.asarray(sol["out"])
    # discharge/charge from 2 V toward 5 V with tau = 1 ms
    ref = 5.0 + (2.0 - 5.0) * np.exp(-ts / 1e-3)
    assert np.max(np.abs(v - ref)) < 0.02
    # the source node was consistent from the first save
    vin = np.asarray(sol["in"])
    assert vin[0] == pytest.approx(5.0, abs=1e-6)


def test_uic_cold_start_oscillator():
    # 3-stage ring with builtin level-1 MOS: with uic the integrator must
    # start from the raw asymmetric IC and oscillate (no DC solve, which
    # would find the metastable point)
    stages = 3
    lines = ["uic ring", "vdd vdd 0 dc 3.3"]
    for i in range(stages):
        a, b = f"n{i}", f"n{(i + 1) % stages}"
        lines.append(f"mp{i} {b} {a} vdd vdd pch w=10u l=1u")
        lines.append(f"mn{i} {b} {a} 0 0 nch w=5u l=1u")
        lines.append(f"c{i} {b} 0 30f")
    lines.append(".model nch nmos vto=0.7 kp=100u")
    lines.append(".model pch pmos vto=-0.7 kp=40u")
    cc = ct.parse_spice("\n".join(lines) + "\n")
    sol = ct.tran(cc, (0, 1.2e-8), dt=1e-11, uic=True,
                  ic={"n0": 3.3, "vdd": 3.3}, max_steps=100000)
    assert bool(np.asarray(sol.converged))
    v = np.asarray(sol["n1"])
    crossings = int(np.abs(np.diff((v > 1.65).astype(int))).sum())
    assert crossings >= 4


def test_lm_rescue_matches_dc():
    # the LM member of the reference polyalgorithm
    # (`src/mna/solve.jl:463-472`): from a cold start it must walk the
    # damped-Newton path to the same operating point as the full chain
    from cadnip_tpu.mna.newton import make_lm_rescue
    cc = _diode_chain()
    ref = ct.dc(cc)
    lm = make_lm_rescue(cc)
    r = lm(jnp.zeros(cc.n), cc.params0(), cc.spec.dyn())
    assert bool(np.asarray(r.converged))
    assert np.allclose(np.asarray(r.x), np.asarray(ref.x), atol=1e-6)
    assert float(np.asarray(r.resnorm)) < 1e-6


def test_lm_rescue_bridge_cold_start():
    # 4-diode bridge at 20 V drive: steep exponentials plus a floating
    # output pair — LM must converge from zeros without the gmin ladder
    from cadnip_tpu.mna.newton import make_lm_rescue
    cc = ct.parse_spice("""bridge
.model dd d is=76.9p n=1.45
v1 a b dc 20
d1 a p dd
d2 n a dd
d3 b p dd
d4 n b dd
rl p n 1k
rg1 b 0 1meg
rg2 n 0 1meg
""")
    ref = ct.dc(cc)
    assert bool(ref.converged)
    lm = make_lm_rescue(cc)
    r = lm(jnp.zeros(cc.n), cc.params0(), cc.spec.dyn())
    assert bool(np.asarray(r.converged))
    assert np.allclose(np.asarray(r.x), np.asarray(ref.x), atol=1e-5)


def test_dc_full_chain_with_capped_newton():
    # handicap the homotopy chain (few rungs, tight iteration cap): the
    # lazy rescue tiers must still land the full dc() on the right point
    from cadnip_tpu.mna.spec import SimSpec
    import cadnip_tpu.frontend.netlist as _  # noqa: F401
    src = """bridge
.model dd d is=76.9p n=1.45
v1 a b dc 20
d1 a p dd
d2 n a dd
d3 b p dd
d4 n b dd
rl p n 1k
rg1 b 0 1meg
rg2 n 0 1meg
"""
    ref = ct.dc(ct.parse_spice(src))
    cc = ct.parse_spice(src, spec=SimSpec(max_newton_iters=8,
                                          gmin_steps=2, src_steps=2))
    sol = ct.dc(cc)
    assert bool(sol.converged)
    assert np.allclose(np.asarray(sol.x), np.asarray(ref.x), atol=1e-5)
