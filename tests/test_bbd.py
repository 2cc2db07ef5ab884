"""Block-bordered-diagonal solver tests: large-circuit path vs dense
(the KLU-replacement story, SURVEY §2.9/M4)."""
import jax.numpy as jnp
import numpy as np
import pytest

import cadnip_tpu as ct
from cadnip_tpu.mna.bbd_assemble import partition_circuit


def _grid(nx, ny, load_diodes=False):
    """Resistor grid driven at one corner, grounded at the other."""
    cir = ct.Circuit(f"grid{nx}x{ny}")
    cir.V("vs", "n0_0", "0", dc=1.0)

    def nm(i, j):
        return f"n{i}_{j}"

    for i in range(nx):
        for j in range(ny):
            if i + 1 < nx:
                cir.R(f"rx{i}_{j}", nm(i, j), nm(i + 1, j), 1e3)
            if j + 1 < ny:
                cir.R(f"ry{i}_{j}", nm(i, j), nm(i, j + 1), 1e3)
    cir.R("rl", nm(nx - 1, ny - 1), "0", 1e3)
    if load_diodes:
        for i in range(0, nx, 3):
            for j in range(0, ny, 3):
                cir.D(f"d{i}_{j}", nm(i, j), "0", **{"is": 1e-14})
    return cir


def test_partition_covers_all_unknowns():
    cc = _grid(12, 12).compile(solver="bbd", block_size=24)
    part = cc.bbd
    assert part is not None
    ninterior = int(np.sum(part.block_of >= 0))
    assert ninterior + part.nb == cc.n
    assert part.nb < cc.n * 0.5     # border stays a minority


def test_bbd_matches_dense_linear():
    cir = _grid(10, 10)
    cc_d = cir.compile(solver="dense")
    cc_b = _grid(10, 10).compile(solver="bbd", block_size=16)
    sd = ct.dc(cc_d)
    sb = ct.dc(cc_b)
    assert bool(sb.converged)
    xd = np.asarray(sd.x)
    xb = np.asarray(sb.x)
    assert np.max(np.abs(xd - xb)) < 1e-9


def test_bbd_matches_dense_nonlinear():
    cc_d = _grid(8, 8, load_diodes=True).compile(solver="dense")
    cc_b = _grid(8, 8, load_diodes=True).compile(solver="bbd",
                                                 block_size=12)
    sd = ct.dc(cc_d)
    sb = ct.dc(cc_b)
    assert bool(sd.converged) and bool(sb.converged)
    assert np.max(np.abs(np.asarray(sd.x) - np.asarray(sb.x))) < 1e-8


def test_bbd_transient_matches_dense():
    def build(solver):
        cir = _grid(6, 6)
        cir.C("cl", "n5_5", "0", 1e-9)
        # replace the DC source with a pulse for dynamics
        return cir.compile(solver=solver, block_size=10)

    cc_d = build("dense")
    cc_b = build("bbd")
    sd = ct.tran(cc_d, (0, 1e-6), dt=1e-8)
    sb = ct.tran(cc_b, (0, 1e-6), dt=1e-8)
    assert bool(sb.converged)
    # both adaptive runs are tolerance-accurate; trajectories differ at
    # the LTE tolerance level
    assert np.max(np.abs(np.asarray(sd.xs) - np.asarray(sb.xs))) < 1e-3


def test_bbd_auto_threshold():
    # small circuits stay dense
    cir = ct.Circuit("small")
    cir.V("v", "a", "0", dc=1.0)
    cir.R("r", "a", "0", 1.0)
    assert cir.compile().bbd is None


# ---------------------------------------------------------------------------
# scale axis: the reference's c6288 proof point (10,112 FETs; VACASK runs it
# at 212k unknowns with PSP103, `benchmarks/vacask/README.md:87-122`). Here
# the real ISCAS-85 topology with level-1 stand-ins: 5,156 unknowns through
# the BBD path — logic-netlist partition stress, exact linear solves, and a
# reduced-span UIC power-up transient (the benchmark's own `tran 2p 2n uic`
# methodology).

def test_c6288_scale_partition_and_solve():
    from c6288_util import build_deck, have_sources
    if not have_sources():
        pytest.skip("reference benchmark netlist not available")
    import cadnip_tpu as ct
    from cadnip_tpu.mna.assemble import pad_state
    from cadnip_tpu.mna.bbd_assemble import make_bbd_assembler
    from cadnip_tpu.ops.bbd import bbd_matvec, make_bbd_solver

    cc = ct.parse_spice(build_deck())
    assert cc.n >= 5000
    part = cc.bbd
    assert part is not None
    # partition quality on logic topology: bounded border, no singular
    # branch-current rows (every CLASS_I unknown shares a block with a
    # coupling partner or sits in the border)
    assert part.nb < cc.n * 0.25
    assemble = make_bbd_assembler(cc, part)
    solve = make_bbd_solver(part, None)
    params = cc.params0()
    dyn = cc.spec.dyn(gshunt=1e-2)
    x = jnp.zeros(cc.n)
    lim = assemble.init_lim(pad_state(x))
    F, Q, G, C, lim = assemble(pad_state(x), lim, params, dyn)
    dx = solve(*G, -F)
    assert bool(jnp.isfinite(dx).all())
    r = bbd_matvec(part, G, dx) + F
    # exact solve: residual at roundoff relative to the rhs
    assert float(jnp.max(jnp.abs(r))) < 1e-10 * float(jnp.max(jnp.abs(F)))


@pytest.mark.integration
def test_c6288_uic_transient_reduced_span():
    from c6288_util import build_deck, have_sources
    if not have_sources():
        pytest.skip("reference benchmark netlist not available")
    import cadnip_tpu as ct

    cc = ct.parse_spice(build_deck())
    sol = ct.tran(cc, (0, 4e-12), dt=2e-12, uic=True, max_steps=100,
                  n_save=3)
    assert bool(np.asarray(sol.converged))
    assert int(np.asarray(sol.stats.naccept)) >= 2
    xs = np.asarray(sol.xs)
    assert np.isfinite(xs).all()


@pytest.mark.integration
def test_c6288_access_r_partition_at_reference_node_count():
    """The access-resistor variant (two internal nodes per FET — the
    physical role of the reference wrappers' ld/ls access geometry)
    reaches exactly the reference's 25,380-node count
    (`benchmarks/vacask/README.md:87-89`) and still partitions to an
    exact BBD solve."""
    from c6288_util import build_deck, have_sources
    if not have_sources():
        pytest.skip("reference benchmark netlist not available")
    import cadnip_tpu as ct
    from cadnip_tpu.mna.assemble import pad_state
    from cadnip_tpu.mna.bbd_assemble import make_bbd_assembler
    from cadnip_tpu.ops.bbd import bbd_matvec, make_bbd_solver

    cc = ct.parse_spice(build_deck(access_r=True))
    assert cc.n == 25380
    part = cc.bbd
    assert part is not None
    assert part.nb < cc.n * 0.2
    assemble = make_bbd_assembler(cc, part)
    solve = make_bbd_solver(part, None)
    params = cc.params0()
    dyn = cc.spec.dyn(gshunt=1e-2)
    x = jnp.zeros(cc.n)
    lim = assemble.init_lim(pad_state(x))
    F, Q, G, C, lim = assemble(pad_state(x), lim, params, dyn)
    dx = solve(*G, -F)
    assert bool(jnp.isfinite(dx).all())
    r = bbd_matvec(part, G, dx) + F
    assert float(jnp.max(jnp.abs(r))) < 1e-10 * float(jnp.max(jnp.abs(F)))


@pytest.mark.integration
def test_c6288_dual_macro_partition_beyond_50k_unknowns():
    """Two c6288 access-resistor macros sharing the supply rails — a
    32-bit-datapath-slice-sized netlist. 50,756 unknowns, past the
    reference's half-scale point toward its 212k-unknown c6288 proof
    (`benchmarks/vacask/README.md:87-89`); the BBD path must still
    partition (rails are hubs -> border) and solve exactly."""
    from c6288_util import build_deck, have_sources
    if not have_sources():
        pytest.skip("reference benchmark netlist not available")
    import cadnip_tpu as ct
    from cadnip_tpu.mna.assemble import pad_state
    from cadnip_tpu.mna.bbd_assemble import make_bbd_assembler
    from cadnip_tpu.ops.bbd import bbd_matvec, make_bbd_solver

    cc = ct.parse_spice(build_deck(access_r=True, copies=2))
    assert cc.n > 50000
    part = cc.bbd
    assert part is not None
    assert part.nb < cc.n * 0.2
    assemble = make_bbd_assembler(cc, part)
    solve = make_bbd_solver(part, None)
    params = cc.params0()
    dyn = cc.spec.dyn(gshunt=1e-2)
    x = jnp.zeros(cc.n)
    lim = assemble.init_lim(pad_state(x))
    F, Q, G, C, lim = assemble(pad_state(x), lim, params, dyn)
    dx = solve(*G, -F)
    assert bool(jnp.isfinite(dx).all())
    r = bbd_matvec(part, G, dx) + F
    assert float(jnp.max(jnp.abs(r))) < 1e-10 * float(jnp.max(jnp.abs(F)))


def test_nested_schur_matches_dense_border():
    """Level-2 (nested) Schur border solve returns the same correction
    as the single dense border factorization (exact direct method both
    ways), on the 5k c6288 whose border is 931 unknowns."""
    from c6288_util import build_deck, have_sources
    if not have_sources():
        pytest.skip("reference benchmark netlist not available")
    import cadnip_tpu as ct
    from cadnip_tpu.mna.assemble import pad_state
    from cadnip_tpu.mna.bbd_assemble import make_bbd_assembler, \
        nested_border_partition
    from cadnip_tpu.ops.bbd import bbd_matvec, make_bbd_solver

    cc = ct.parse_spice(build_deck())
    part = cc.bbd
    p2 = nested_border_partition(cc, part)
    assert p2 is not None and p2.nb < part.nb
    assemble = make_bbd_assembler(cc, part)
    params = cc.params0()
    dyn = cc.spec.dyn(gshunt=1e-2)
    x = jnp.zeros(cc.n)
    lim = assemble.init_lim(pad_state(x))
    F, Q, G, C, lim = assemble(pad_state(x), lim, params, dyn)
    dx_dense = make_bbd_solver(part, None)(*G, -F)
    dx_nested = make_bbd_solver(part, None, nested=p2)(*G, -F)
    scale = float(jnp.max(jnp.abs(dx_dense)))
    assert float(jnp.max(jnp.abs(dx_nested - dx_dense))) < 1e-9 * scale
    r = bbd_matvec(part, G, dx_nested) + F
    assert float(jnp.max(jnp.abs(r))) < 1e-10 * float(jnp.max(jnp.abs(F)))
