"""DC operating-point analysis and named solutions.

`dc(circuit)` == the reference's `dc!` (Cadnip `src/sweeps.jl:450` ->
`MNA.solve_dc`, `src/mna/solve.jl:2389`); `DCSolution` mirrors the reference's
name-addressable `DCSolution` (`solve.jl:156-332`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DTYPE, effective_platform
from ..mna.newton import make_dc_solver
from ..mna.spec import MODE_DCOP, MODE_TRANOP
from ..mna.structure import CompiledCircuit


class DCSolution:
    """Name-addressable operating point: sol['out'] is a node voltage,
    sol['v1#i'] a V-source/inductor branch current, sol.v('a','b') a
    difference. Batched solutions (from vmapped sweeps) index the same way
    with a leading sweep axis."""

    def __init__(self, cc: CompiledCircuit, x, converged, iters,
                 resnorm=None, params=None):
        self.cc = cc
        self.x = x
        self.converged = converged
        self.iters = iters
        self.resnorm = resnorm
        self.params = params

    def __getitem__(self, name):
        return self.x[..., self.cc.index_of(str(name))]

    def v(self, p, n=None):
        vp = self[p]
        return vp if n is None else vp - self[n]

    def i(self, source_name):
        """Branch current through a V source or inductor."""
        return self[f"{source_name}#i"]

    def keys(self):
        return self.cc.names.keys()

    def _eval_device(self, inst):
        """Evaluate one instance's residual at the operating point."""
        import jax.numpy as jnp
        from ..mna.assemble import pad_state
        gi, slot = self.cc.inst_group[inst]
        g = self.cc.groups[gi]
        params = self.params if self.params is not None \
            else self.cc.params0()
        if jnp.asarray(self.x).ndim != 1:
            raise ValueError(
                "per-device evaluation needs an unbatched solution; index "
                "one sweep lane first")
        xp = pad_state(jnp.asarray(self.x))
        u = xp[jnp.asarray(g.conn[slot])]
        # Params are packed with the instance axis FIRST ([n_inst] scalars,
        # [n_inst, width] waveform coefficient tables) — slice axis 0, not
        # the trailing axis, so 2-D packed params keep their row intact.
        p = jax.tree.map(lambda a: jnp.asarray(a)[slot], params[gi])
        dyn = self.cc.spec.dyn()
        return g, u, p, dyn, g.conn[slot]

    def currents(self, inst):
        """Terminal currents of a device at the DC operating point:
        {terminal_name: current flowing INTO the device}. Local slots that
        merged onto the terminal's global unknown (VA node collapse) are
        accumulated into it — the reference's per-port terminal-current
        accumulation incl. collapsed internals (`vasim.jl:3057-3095`)."""
        g, u, p, dyn, conn = self._eval_device(inst)
        f, _ = g.model.residual(u, p, dyn)
        f = np.asarray(f)
        out = {}
        for i, t in enumerate(g.model.terminals):
            out[t] = float(f[np.asarray(conn) == conn[i]].sum())
        return out

    def op_info(self, inst):
        """Model-defined operating-point variables (gm, ids, ...) for one
        instance, if its model publishes them."""
        g, u, p, dyn, _ = self._eval_device(inst)
        if g.model.opvars is None:
            return {}
        vals = g.model.opvars(u, p, dyn)
        return {k: float(v) for k, v in vals.items()}

    def __repr__(self):
        conv = np.asarray(self.converged)
        stat = "converged" if conv.all() else "NOT CONVERGED"
        lines = [f"DCSolution({self.cc.title!r}, {stat}, "
                 f"iters={np.asarray(self.iters)})"]
        if self.x.ndim == 1:
            for name, idx in sorted(self.cc.names.items(),
                                    key=lambda kv: kv[1])[:40]:
                lines.append(f"  {name:>16s} = {float(self.x[idx]):.6g}")
        return "\n".join(lines)


def _get_dc_solver(cc: CompiledCircuit):
    key = ("dc_solver", effective_platform())
    if key not in cc.cache:
        cc.cache[key] = cc.jit(make_dc_solver(cc))
    return cc.cache[key]


def dc(cc: CompiledCircuit, params=None, x0=None, *, mode: int = MODE_DCOP,
       time: float = 0.0, nodeset: dict | None = None,
       rescue: bool = True) -> DCSolution:
    """DC operating point with the full robustness chain: Newton ->
    GMIN stepping -> source stepping (one jitted homotopy scan), then —
    only if that fails — a pseudo-transient continuation rescue tier
    (reference polyalgorithm `CedarRobustNLSolve`, `src/mna/solve.jl:
    463-527`; the rescue jits lazily so well-behaved circuits never pay
    its compile).

    nodeset: {node: voltage} initial-guess seeding (SPICE .nodeset)."""
    if params is None:
        params = cc.params0()
    if x0 is None:
        x0 = jnp.zeros(cc.n, DTYPE)
    if nodeset:
        x0 = jnp.asarray(x0, DTYPE)
        for node, v in nodeset.items():
            x0 = x0.at[cc.index_of(str(node))].set(float(v))
    dyn = cc.spec.dyn(mode=mode, time=time)
    from ..mna.assemble import ensure_setup
    params = ensure_setup(cc, params, dyn)
    r = _get_dc_solver(cc)(x0, params, dyn)
    if rescue and not np.asarray(r.converged).all():
        big = any(g.model.va_setup is not None for g in cc.groups)
        batched = np.asarray(r.converged).ndim > 0
        if big and not batched:
            r2 = _ptran_rescue_host(cc, x0, params, dyn)
        else:
            r2 = _fused_rescue(cc, x0, params, dyn)
        take = jnp.asarray(r2.converged)
        r = type(r)(x=jnp.where(take, r2.x, r.x),
                    converged=r.converged | r2.converged,
                    iters=r.iters + r2.iters,
                    resnorm=jnp.where(take, r2.resnorm, r.resnorm))
    if rescue and cc.bbd is None and not np.asarray(r.converged).all():
        # final tier: Levenberg–Marquardt damped Newton (the LM member
        # of the reference polyalgorithm, `src/mna/solve.jl:463-472`).
        # Runs AFTER pseudo-transient: ptran's charge damping selects
        # the physically-reachable basin on bistable circuits, while LM
        # handles near-singular Jacobians charge-free circuits hit.
        key = ("dc_lm_rescue", effective_platform())
        if key not in cc.cache:
            from ..mna.newton import make_lm_rescue
            cc.cache[key] = cc.jit(make_lm_rescue(cc))
        r3 = cc.cache[key](r.x, params, dyn)
        take = jnp.asarray(r3.converged)
        r = type(r)(x=jnp.where(take, r3.x, r.x),
                    converged=r.converged | r3.converged,
                    iters=r.iters + r3.iters,
                    resnorm=jnp.where(take, r3.resnorm, r.resnorm))
    return DCSolution(cc, r.x, r.converged, r.iters, r.resnorm,
                      params=params)


def _fused_rescue(cc, x0, params, dyn):
    """The one-jit pseudo-transient rescue scan (small circuits; vmapped
    sweeps use it too since the host loop cannot branch per lane)."""
    key = ("dc_ptran_rescue", effective_platform())
    if key not in cc.cache:
        from ..mna.newton import make_ptran_rescue
        cc.cache[key] = cc.jit(make_ptran_rescue(cc))
    return cc.cache[key](x0, params, dyn)


def _ptran_rescue_host(cc, x0, params, dyn, n_steps=15, h0=1e-12,
                       h1=1e3):
    """Host-driven pseudo-transient rescue for big-model circuits: the
    fused rescue scan's single XLA module (tran-newton + final newton +
    rhs in one graph) OOM-kills the remote TPU compile helper for
    PSP-class circuits. Here each piece jits separately — the largest
    module is one tran-newton body — and the final confirmation reuses
    the ALREADY-COMPILED dc solver. Same math as make_ptran_rescue
    (reference PseudoTransient tier, `src/mna/solve.jl:463-527`)."""
    from ..mna.assemble import make_assembler, make_rhs_assembler, \
        pad_state
    from ..mna.newton import make_tran_newton
    key = ("rescue_parts", effective_platform())
    if key not in cc.cache:
        assemble = make_assembler(cc) if cc.bbd is None else None
        newton_t = make_tran_newton(cc, assemble=assemble)
        if assemble is None:
            from ..mna.newton import _make_assemble_solve
            assemble, _, _ = _make_assemble_solve(cc, None, None)
        rhs = make_rhs_assembler(cc)
        cc.cache[key] = (
            cc.jit(newton_t),
            cc.jit(lambda x: assemble.init_lim(pad_state(x))),
            cc.jit(lambda x, p, d: rhs(pad_state(x), p, d)))
    newton_t, init_lim, rhsj = cc.cache[key]
    x = jnp.asarray(x0, DTYPE)
    lim = init_lim(x)
    _, q = rhsj(x, params, dyn)
    iters = 0
    for h in np.geomspace(h0, h1, n_steps):
        rr = newton_t(x, lim, params, dyn,
                      jnp.asarray(1.0 / h, DTYPE), q / h)
        iters += int(np.asarray(rr.iters))
        if bool(np.asarray(rr.converged)) and \
                bool(np.isfinite(np.asarray(rr.x)).all()):
            x, lim, q = rr.x, rr.lim, rr.q
    r = _get_dc_solver(cc)(x, params, dyn)
    return type(r)(x=r.x, converged=r.converged,
                   iters=r.iters + jnp.int32(iters), resnorm=r.resnorm)


def op_tran(cc: CompiledCircuit, params=None, x0=None,
            t0: float = 0.0) -> DCSolution:
    """Operating point for transient start: time sources evaluated at t0
    (reference CedarTranOp, `src/mna/dcop.jl:98`)."""
    return dc(cc, params, x0, mode=MODE_TRANOP, time=t0)
