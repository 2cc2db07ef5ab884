"""Newton–Raphson DC solve with the SPICE robustness chain.

Pure JAX (lax.while_loop / lax.scan) so the whole solve vmaps over parameter
sweeps and jits into one XLA program. Mirrors the reference's fallback chain
PCNR -> Newton -> GMIN stepping -> source stepping
(Cadnip `src/mna/solve.jl:599-929`); device-level pnjlim limiting plays the
role of PCNR's predictor/corrector limiting.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import effective_platform, DTYPE, solve_method_for_backend
from ..ops.linalg import solve as dense_solve
from .assemble import make_assembler, pad_state
from .devices import CLASS_I, CLASS_Q, CLASS_V
from .spec import DynSpec, SimSpec
from .structure import CompiledCircuit


def abstol_vector(cc: CompiledCircuit) -> jnp.ndarray:
    """Per-unknown absolute tolerance by class (reference `build.jl:276`)."""
    s = cc.spec
    tab = np.array([s.vntol, s.abstol, s.chgtol])
    return jnp.asarray(tab[cc.classes], DTYPE)


def damp_step(dx, is_v, max_dv):
    """Uniform Newton step damping: scale the WHOLE step so no voltage
    moves more than max_dv. Scaling (rather than per-component clipping)
    preserves the Newton direction — clipping individual components
    decouples voltages from their consistently-solved branch currents and
    limit-cycles (measured on the c6288 NOR stacks)."""
    vstep = jnp.max(jnp.where(is_v, jnp.abs(dx), 0.0))
    return dx * jax.lax.stop_gradient(
        jnp.minimum(1.0, max_dv / jnp.maximum(vstep, 1e-300)))


class NewtonResult(NamedTuple):
    x: jnp.ndarray
    converged: jnp.ndarray   # bool
    iters: jnp.ndarray       # int32
    resnorm: jnp.ndarray     # max-abs KCL residual at the solution


def _make_assemble_solve(cc: CompiledCircuit, assemble, method):
    """Backend dispatch: returns (assemble, solve_J, matvec) where
    solve_J(G_repr, C_repr, c0, rhs) solves (G + c0*C) dx = rhs and
    matvec(M_repr, v) applies a matrix in the backend representation —
    for both the dense and the block-bordered-diagonal forms."""
    method = method or solve_method_for_backend()
    if method == "auto" and effective_platform() != "cpu" and \
            any(g.model.va_setup is not None for g in cc.groups):
        # PSP/BSIM-class Jacobians mix ~1e-3-ohm access-resistance rows
        # with 1e-12-S gmin entries; the f32 Gauss-Jordan inverse +
        # refinement path loses them (measured: the PSP103 ring Newton
        # walks to NaN on TPU while CPU f64 LU converges in 4 iters).
        # Use the unrolled full-f64 gauss solve for these circuits.
        method = "gauss"
    if cc.bbd is not None:
        from ..ops.bbd import bbd_matvec, make_bbd_solver
        from .bbd_assemble import make_bbd_assembler
        assemble = assemble or make_bbd_assembler(cc, cc.bbd)
        bbd_solve = make_bbd_solver(cc.bbd, method,
                                    nested=cc.bbd_nested)
        part = cc.bbd

        def solve_J(G, C, c0, rhs):
            # match the tensor dtype (f32 on TPU) so the scalar does not
            # promote the whole Jacobian back to emulated f64
            c0c = jnp.asarray(c0).astype(G[0].dtype)
            J = tuple(g + c0c * c for g, c in zip(G, C))
            return bbd_solve(*J, rhs)

        def matvec(M, v):
            return bbd_matvec(part, M, v)

        return assemble, solve_J, matvec

    assemble = assemble or make_assembler(cc)

    def solve_J(G, C, c0, rhs):
        return dense_solve(G + c0 * C, rhs, method=method)

    def matvec(M, v):
        return M @ v

    return assemble, solve_J, matvec


def make_newton(cc: CompiledCircuit, assemble=None, method: str | None = None):
    """Build newton(x0, params, dyn) -> NewtonResult (traced, vmappable)."""
    spec = cc.spec
    assemble, solve_J, matvec = _make_assemble_solve(cc, assemble, method)
    atol = abstol_vector(cc)
    is_v = jnp.asarray(cc.classes == CLASS_V)
    max_iters = spec.max_newton_iters

    def step(x, lim, params, dyn):
        xp = pad_state(x)
        F, _, G, C, lim_new = assemble(xp, lim, params, dyn)
        dx = solve_J(G, C, 0.0, -F)
        if spec.max_dv > 0:
            dx = damp_step(dx, is_v, spec.max_dv)
        x_new = x + dx
        ok_dx = jnp.abs(dx) <= spec.reltol * jnp.maximum(jnp.abs(x_new),
                                                         jnp.abs(x)) + atol
        return x_new, lim_new, jnp.all(ok_dx), jnp.max(jnp.abs(F))

    def newton(x0, params, dyn: DynSpec, lim0=None) -> NewtonResult:
        def cond(c):
            _, _, it, done, _ = c
            return (~done) & (it < max_iters)

        def body(c):
            x, lim, it, _, _ = c
            x_new, lim_new, ok, resnorm = step(x, lim, params, dyn)
            bad = ~jnp.all(jnp.isfinite(x_new))
            x_new = jnp.where(bad, x, x_new)
            lim_new = jnp.where(bad, lim, lim_new)
            return (x_new, lim_new, it + 1, ok & ~bad, resnorm)

        x0 = jnp.asarray(x0, DTYPE)
        if lim0 is None:
            lim0 = assemble.init_lim(pad_state(x0))
        init = (x0, lim0, jnp.int32(0), jnp.asarray(False),
                jnp.asarray(jnp.inf, DTYPE))
        x, _, it, done, resnorm = jax.lax.while_loop(cond, body, init)
        return NewtonResult(x=x, converged=done, iters=it, resnorm=resnorm)

    return newton


class TranNewtonResult(NamedTuple):
    x: jnp.ndarray
    lim: jnp.ndarray
    q: jnp.ndarray           # charge vector at the solution
    f: jnp.ndarray           # resistive residual at the solution
    converged: jnp.ndarray
    iters: jnp.ndarray


def make_tran_newton(cc: CompiledCircuit, assemble=None,
                     method: str | None = None):
    """Newton for one implicit integration step: solves
        f(x) + c0*q(x) - rhs_q = 0     with Jacobian  G + c0*C.
    c0 and rhs_q encode the integration method (BE: c0=1/h, rhs=q_n/h;
    trap: c0=2/h, rhs=c0*q_n + qdot_n). Replaces the reference's
    fast_residual!/fast_jacobian! pair (`src/mna/precompile.jl:546-618`)."""
    spec = cc.spec
    assemble, solve_J, matvec = _make_assemble_solve(cc, assemble, method)
    atol = abstol_vector(cc)
    is_v = jnp.asarray(cc.classes == CLASS_V)
    max_iters = spec.max_newton_iters

    def newton_t(x0, lim0, params, dyn: DynSpec, c0, rhs_q
                 ) -> TranNewtonResult:
        zq = jnp.zeros(cc.n, DTYPE)

        def cond(c):
            return (~c[5]) & (c[2] < max_iters)

        def body(c):
            x, lim, it, _, _, _, _ = c
            F, Q, G, C, lim_new = assemble(pad_state(x), lim, params, dyn)
            Ft = F + c0 * Q - rhs_q
            dx = solve_J(G, C, c0, -Ft)
            if spec.max_dv > 0:
                dx = damp_step(dx, is_v, spec.max_dv)
            x_new = x + dx
            ok = jnp.all(jnp.abs(dx) <= spec.reltol * jnp.maximum(
                jnp.abs(x_new), jnp.abs(x)) + atol)
            bad = ~jnp.all(jnp.isfinite(x_new))
            x_new = jnp.where(bad, x, x_new)
            lim_new = jnp.where(bad, lim, lim_new)
            # first-order charge correction: Q was evaluated at the
            # pre-update iterate; q(x_new) ~= Q + C dx (errors O(dx^2) so
            # qdot = c0*(q - q_n) - ... stays clean even at tiny h)
            Qc = Q + matvec(C, dx)
            return (x_new, lim_new, it + 1, Qc, F, ok & ~bad, bad)

        init = (jnp.asarray(x0, DTYPE), lim0, jnp.int32(0), zq, zq,
                jnp.asarray(False), jnp.asarray(False))
        x, lim, it, Q, F, done, _ = jax.lax.while_loop(cond, body, init)
        return TranNewtonResult(x=x, lim=lim, q=Q, f=F, converged=done,
                                iters=it)

    return newton_t


def make_lm_rescue(cc: CompiledCircuit, method: str | None = None,
                   max_iters: int | None = None,
                   lam0: float = 1e-3):
    """Levenberg–Marquardt damped Newton: the LM member of the
    reference's `CedarRobustNLSolve` polyalgorithm (`src/mna/solve.jl:
    463-472` — RobustMultiNewton + LevenbergMarquardt + PseudoTransient).

    Solves (G + lam*diag(d)) dx = -F with d the Jacobian row scales;
    steps that reduce ||F||_2 are accepted and shrink lam toward plain
    Newton, rejected steps grow lam toward steepest descent — so the
    iteration makes progress from starting points where the undamped
    Newton direction diverges (near-singular Jacobians at bistable/
    cut-off operating points). Dense circuits only (the BBD backend's
    block form has no cheap diagonal-shift solve)."""
    spec = cc.spec
    if cc.bbd is not None:
        raise ValueError("LM rescue supports the dense backend only")
    assemble, solve_J, _ = _make_assemble_solve(cc, None, method)
    atol = abstol_vector(cc)
    is_v = jnp.asarray(cc.classes == CLASS_V)
    max_iters = max_iters or 4 * spec.max_newton_iters
    eye = jnp.eye(cc.n, dtype=DTYPE)

    def lm(x0, params, dyn: DynSpec) -> NewtonResult:
        x0 = jnp.asarray(x0, DTYPE)
        lim0 = assemble.init_lim(pad_state(x0))

        def cond(c):
            it, done = c[3], c[4]
            return (~done) & (it < max_iters)

        def body(c):
            x, lim, lam, it, _, _ = c
            F, _, G, _, lim_new = assemble(pad_state(x), lim, params, dyn)
            d = jnp.maximum(jnp.max(jnp.abs(G), axis=1), 1e-12)
            dx = solve_J(G, eye * d[:, None], lam, -F)
            if spec.max_dv > 0:
                dx = damp_step(dx, is_v, spec.max_dv)
            x_t = x + dx
            F_t, _, _, _, lim_t = assemble(pad_state(x_t), lim_new,
                                           params, dyn)
            f0 = jnp.sum(F * F)
            f1 = jnp.sum(F_t * F_t)
            better = (f1 < f0) & jnp.all(jnp.isfinite(x_t)) \
                & jnp.isfinite(f1)
            x_n = jnp.where(better, x_t, x)
            # the limiter anchor ALWAYS advances (SPICE practice): a
            # frozen anchor makes the companion-limited residual look
            # converged at a false solution (cutoff-extrapolated diode
            # currents), deadlocking the accept test
            lim_n = jnp.where(better, lim_t, lim_new)
            lam_n = jnp.where(better, jnp.maximum(lam * 0.25, 1e-12),
                              jnp.minimum(lam * 8.0, 1e10))
            # converged: an ACCEPTED, nearly-undamped step passed the
            # usual dx test (a damped step can be tiny while far away)
            ok = better & (lam < 1e-6) & jnp.all(
                jnp.abs(dx) <= spec.reltol * jnp.maximum(
                    jnp.abs(x_t), jnp.abs(x)) + atol)
            rn = jnp.where(better, jnp.max(jnp.abs(F_t)),
                           jnp.max(jnp.abs(F)))
            return (x_n, lim_n, lam_n, it + 1, ok, rn)

        init = (x0, lim0, jnp.asarray(lam0, DTYPE), jnp.int32(0),
                jnp.asarray(False), jnp.asarray(jnp.inf, DTYPE))
        x, _, _, it, done, rn = jax.lax.while_loop(cond, body, init)
        return NewtonResult(x=x, converged=done, iters=it, resnorm=rn)

    return lm


def make_ptran_rescue(cc: CompiledCircuit, method: str | None = None,
                      n_steps: int = 15, h0: float = 1e-12,
                      h1: float = 1e3):
    """Pseudo-transient continuation rescue (the reference's
    PseudoTransient tier in CedarRobustNLSolve, `src/mna/solve.jl:463-527`,
    and the CedarUICOp relaxation idea, `src/mna/dcop.jl:145-151`): march
    backward-Euler steps with geometrically growing h — the circuit's own
    charges damp the iteration; as h -> inf the fixed point is the DC
    solution — then confirm with a plain Newton at the target conditions.
    Used by `dc()` when the standard homotopy chain fails (oscillators,
    latches, multivibrators)."""
    from .assemble import make_rhs_assembler
    newton_t = make_tran_newton(cc, method=method)
    newton = make_newton(cc, method=method)
    assemble, _, _ = _make_assemble_solve(cc, None, method)
    rhs = make_rhs_assembler(cc)
    hs = jnp.geomspace(h0, h1, n_steps).astype(DTYPE)

    def rescue(x0, params, dyn: DynSpec) -> NewtonResult:
        x0 = jnp.asarray(x0, DTYPE)
        lim0 = assemble.init_lim(pad_state(x0))
        _, q0 = rhs(pad_state(x0), params, dyn)

        def body(carry, h):
            x, lim, q = carry
            r = newton_t(x, lim, params, dyn, 1.0 / h, q / h)
            ok = r.converged & jnp.all(jnp.isfinite(r.x))
            return (jnp.where(ok, r.x, x), jnp.where(ok, r.lim, lim),
                    jnp.where(ok, r.q, q)), None

        (x, lim, _), _ = jax.lax.scan(body, (x0, lim0, q0), hs)
        return newton(x, params, dyn, lim0=lim)

    return rescue


def make_uic_warmup(cc: CompiledCircuit, method: str | None = None,
                    n_steps: int = 8):
    """Fixed small-step implicit-Euler warmup from a UIC initial state
    (reference CedarUICOp, `src/mna/dcop.jl:311-411`): projects the
    algebraic unknowns onto the constraint manifold while the tiny step
    freezes every differential state at its .ic value, so the adaptive
    integrator starts from a consistent point instead of Newton-failing
    off the raw IC vector."""
    from .assemble import make_rhs_assembler
    newton_t = make_tran_newton(cc, method=method)
    assemble, _, _ = _make_assemble_solve(cc, None, method)
    rhs = make_rhs_assembler(cc)

    def warmup(x0, params, dyn: DynSpec, h):
        x0 = jnp.asarray(x0, DTYPE)
        lim0 = assemble.init_lim(pad_state(x0))
        _, q0 = rhs(pad_state(x0), params, dyn)

        def body(carry, _):
            x, lim, q = carry
            r = newton_t(x, lim, params, dyn, 1.0 / h, q / h)
            ok = r.converged & jnp.all(jnp.isfinite(r.x))
            return (jnp.where(ok, r.x, x), jnp.where(ok, r.lim, lim),
                    jnp.where(ok, r.q, q)), None

        (x, _, _), _ = jax.lax.scan(body, (x0, lim0, q0), None,
                                    length=n_steps)
        return x

    return warmup


def make_dc_solver(cc: CompiledCircuit, assemble=None,
                   method: str | None = None):
    """Full DC chain: Newton -> gmin(gshunt) stepping -> source stepping
    (reference `_dc_solve_with_fallbacks`, `solve.jl:871-929`).

    Expressed as ONE lax.scan over a (gshunt, srcfact) homotopy schedule:
    the solution is declared when any schedule entry at the *target*
    operating conditions (gshunt == spec.gshunt, srcfact == 1) converges;
    later entries are skipped via lax.cond. This compiles a single Newton
    instance (the naive chain compiled 3+ Newton bodies, dominating jit
    time) and vmaps cleanly over sweeps.
    """
    spec = cc.spec
    newton = make_newton(cc, assemble=assemble, method=method)

    # schedule: plain newton; gmin ladder ending at target; source ramp
    gl = list(np.geomspace(spec.gshunt_start, max(spec.gshunt, 1e-15),
                           spec.gmin_steps))
    ramp = list(np.linspace(1.0 / spec.src_steps, 1.0, spec.src_steps))
    sched_gs = [spec.gshunt] + gl + [spec.gshunt] + [spec.gshunt] * len(ramp)
    sched_sf = [1.0] * (2 + len(gl)) + ramp
    sched_fin = ([True] + [False] * len(gl) + [True]
                 + [False] * (len(ramp) - 1) + [True])
    schedule = (jnp.asarray(sched_gs, DTYPE), jnp.asarray(sched_sf, DTYPE),
                jnp.asarray(sched_fin))

    def dc_solve(x0, params, dyn: DynSpec) -> NewtonResult:
        def body(carry, inp):
            x, done, iters, rn = carry
            gs, sf, fin = inp

            def run(op):
                x, rn = op
                r = newton(x, params,
                           dyn._replace(gshunt=gs, srcfact=sf))
                return r.x, r.converged, r.iters, r.resnorm

            def skip(op):
                x, rn = op
                return x, jnp.asarray(True), jnp.int32(0), rn

            x_new, conv, it, rn = jax.lax.cond(done, skip, run, (x, rn))
            done = done | (fin & conv)
            return (x_new, done, iters + it, rn), None

        init = (jnp.asarray(x0, DTYPE), jnp.asarray(False), jnp.int32(0),
                jnp.asarray(jnp.inf, DTYPE))
        (x, done, iters, rn), _ = jax.lax.scan(body, init, schedule)
        return NewtonResult(x=x, converged=done, iters=iters, resnorm=rn)

    return dc_solve
