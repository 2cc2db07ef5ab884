"""Transient analysis: adaptive trapezoidal integration with LTE control,
entirely inside `lax.while_loop` — the TPU-native replacement for the
reference's Sundials IDA path (Cadnip `src/sweeps.jl:588-679`,
`src/mna/solve.jl:2102-2146`).

Scheme (ngspice-style TRAP):
  * charge-based formulation: f(x) + dq/dt = 0; each implicit step solves
    f(x) + c0*q(x) = rhs_q with Newton (warm-started from a linear predictor)
  * first step and every post-breakpoint restart use backward Euler (order
    1, damps the discontinuity trap would ring on); steady state uses trap
  * local truncation error from third divided differences of the state
    (|LTE| = h^3/2 |DD3| for trap, h^2 |DD2| for BE), normalized by
    reltol*|x| + per-class abstol and the SPICE trtol=7 factor
  * waveform breakpoints are hit exactly (reference `expand_breakpoints`,
    `src/mna/solve.jl:1847-1918`) and reset the method to BE
  * results are captured on a fixed user grid by linear interpolation, so
    output memory is static regardless of step count (optionally every
    accepted step can be stored instead)

Entirely jit-compiled; vmaps over parameter sweeps (every lane steps with its
own adaptive h; the while_loop runs until all lanes finish).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import effective_platform, DTYPE, solve_method_for_backend
from ..mna.assemble import make_assembler, make_rhs_assembler, pad_state
from ..mna.newton import abstol_vector, damp_step, make_tran_newton
from ..mna.spec import MODE_TRAN, MODE_TRANOP
from ..mna.structure import CompiledCircuit
from .dc import DCSolution, dc

TRTOL = 7.0          # SPICE LTE slack factor
TRACE_LEN = 4096     # solver-trace ring buffer length
GROW_MAX = 2.0
SHRINK_MIN = 0.2
NEWTON_FAIL_CUT = 0.125


class TranStats(NamedTuple):
    naccept: jnp.ndarray
    nreject: jnp.ndarray
    nnewton: jnp.ndarray
    fail: jnp.ndarray        # True if the integrator gave up (h < hmin)


class TranSolution:
    """Waveforms on the save grid; name-addressable like DCSolution.
    sol['out'] -> array over save times; sol.ts -> the grid."""

    def __init__(self, cc, ts, xs, stats: TranStats, op_converged=True):
        self.cc = cc
        self.ts = ts
        self.xs = xs
        self.stats = stats
        self.op_converged = op_converged

    def __getitem__(self, name):
        return self.xs[..., self.cc.index_of(str(name))]

    def v(self, p, n=None):
        vp = self[p]
        return vp if n is None else vp - self[n]

    @property
    def converged(self):
        return (~self.stats.fail) & self.op_converged

    def __repr__(self):
        s = self.stats
        return (f"TranSolution({self.cc.title!r}, {self.ts.shape[-1]} pts, "
                f"accepted={np.asarray(s.naccept)}, "
                f"rejected={np.asarray(s.nreject)}, "
                f"newton={np.asarray(s.nnewton)}, "
                f"fail={np.asarray(s.fail)})")

    def save(self, path):
        """Persist waveforms + name table to .npz."""
        names = sorted(self.cc.names, key=self.cc.names.get)
        np.savez_compressed(path, ts=np.asarray(self.ts),
                            xs=np.asarray(self.xs),
                            names=np.asarray(names, dtype=str))

    @staticmethod
    def load(path):
        """Load saved waveforms: returns (ts, {name: values})."""
        z = np.load(path)
        names = list(z["names"])
        xs = z["xs"]
        return z["ts"], {nm: xs[..., i] for i, nm in enumerate(names)}


def collect_breakpoints(cc: CompiledCircuit, tstop: float) -> np.ndarray:
    """Gather waveform kink times from every source in the circuit."""
    bps = [np.array([tstop])]
    for g in cc.groups:
        if g.waves is None:
            continue
        for w in g.waves:
            bps.append(w.breakpoints(tstop))
    b = np.unique(np.concatenate(bps))
    b = b[(b > 0) & (b <= tstop)]
    if b.size == 0 or b[-1] != tstop:
        b = np.append(b, tstop)
    return b


def _interp_hist(ht, hv, tq):
    """Per-site linear interpolation into the absdelay history ring:
    ht [H] ascending times, hv [H, D] recorded values, tq [D] query times.
    Queries outside the recorded range clamp to the nearest endpoint (the
    pre-t0 history is the DC value — standard SPICE DDE initial history)."""
    H = ht.shape[0]
    i = jnp.clip(jnp.searchsorted(ht, tq, side="right"), 1, H - 1)
    t_lo = ht[i - 1]
    t_hi = ht[i]
    w = jnp.clip((tq - t_lo) / jnp.maximum(t_hi - t_lo, 1e-300), 0.0, 1.0)
    d = jnp.arange(tq.shape[0])
    return hv[i - 1, d] + w * (hv[i, d] - hv[i - 1, d])


def _divided_diff3(xc, tc, x0, t0, x1, t1, x2, t2):
    """Third divided difference over (tc,xc),(t0,x0),(t1,x1),(t2,x2)."""
    tiny = 1e-300
    d1a = (xc - x0) / jnp.maximum(tc - t0, tiny)
    d1b = (x0 - x1) / jnp.maximum(t0 - t1, tiny)
    d1c = (x1 - x2) / jnp.maximum(t1 - t2, tiny)
    d2a = (d1a - d1b) / jnp.maximum(tc - t1, tiny)
    d2b = (d1b - d1c) / jnp.maximum(t0 - t2, tiny)
    d3 = (d2a - d2b) / jnp.maximum(tc - t2, tiny)
    return d2a, d3


def make_tran_runner(cc: CompiledCircuit, n_save: int, max_steps: int,
                     method: str | None = None, integ: str = "trap",
                     trace: bool = False, save_window: int = 0,
                     delay_hist: int = 1024, pause_iters: int = 0):
    """Build run(x0, lim0, q0, qdot0, params, dyn0, t0, tstop, h0, hmax,
    hmin, bp_times, save_ts) -> (xs[n_save, n], TranStats). Fully traced.

    The integrator is a FLATTENED state machine: one lax.while_loop whose
    every iteration performs exactly one Newton iteration; step-control
    (LTE accept/reject, h update, history rotation, saving) runs as masked
    updates on the iterations where Newton completes. Flattening removes
    the Newton-inside-timestep while-loop nesting — XLA:TPU compile time
    drops by an order of magnitude, and under vmap every sweep lane
    advances through its own Newton iterations without lockstep barriers.
    """
    from ..mna.assemble import make_delay_meta
    from ..mna.devices import CLASS_V
    from ..mna.newton import _make_assemble_solve
    assemble, solve_J, matvec = _make_assemble_solve(cc, None, method)
    dmeta = make_delay_meta(cc)   # absdelay history (None for most circuits)
    H = int(delay_hist)
    atol = abstol_vector(cc)
    is_v = jnp.asarray(cc.classes == CLASS_V)
    spec = cc.spec
    n = cc.n

    W = save_window

    def _run_impl(state_in, x0, lim0, q0, qdot0, params, dyn0, t0, tstop,
                  h0, hmax, hmin, bp_times, save_ts, diff_mask):
        n_bp = bp_times.shape[0]
        # the save grid is the biggest carry tensor and gets functionally
        # rewritten every Newton iteration; store it in f32 on TPU (half
        # the HBM traffic; 1e-7-relative waveform quantization) and f64
        # elsewhere
        xs_dtype = DTYPE if effective_platform() == "cpu" else jnp.float32
        # W extra trash rows so windowed writes never clamp at the end
        xs = jnp.zeros((n_save + max(W, 0), n), xs_dtype)
        save_ts_pad = jnp.concatenate(
            [save_ts, jnp.full(max(W, 0), jnp.inf, DTYPE)])
        if dmeta is not None:
            # absdelay history ring, seeded with the initial (DC) probe
            # values — the constant pre-t0 history function (reference
            # `src/mna/delay.jl:20-28` h(p, t-τ))
            v0_dly, taus = dmeta.probe(pad_state(x0), params,
                                       dyn0._replace(time=t0))
            tau_cap = jnp.min(jnp.where(taus > 0, taus, jnp.inf))

        def save_points(si, xs, t_old, x_old, t_new, x_new):
            """Fill every grid point in (t_old, t_new] by linear
            interpolation. Two strategies (no inner while-loop — that
            nests and blows up XLA:TPU compile time):
              * W == 0: one masked write over the whole grid
              * W > 0: a dynamic-slice window of W rows at the save cursor
                (a step is guaranteed to cross < W grid points because the
                caller caps hmax at (W-2)*save_dt) — far less memory
                traffic per iteration for long grids / wide sweeps."""
            if W <= 0:
                mask = (save_ts > t_old + 1e-30) & (save_ts <= t_new + 1e-30)
                w = jnp.where(t_new > t_old,
                              (save_ts - t_old) /
                              jnp.maximum(t_new - t_old, 1e-300), 1.0)
                w = jnp.clip(w, 0.0, 1.0)
                xi = x_old[None, :] + w[:, None] * (x_new - x_old)[None, :]
                xs = jnp.where(mask[:, None], xi.astype(xs.dtype), xs)
                return si + jnp.sum(mask, dtype=jnp.int32), xs
            si = jnp.asarray(si, jnp.int32)
            ts_win = jax.lax.dynamic_slice(save_ts_pad, (si,), (W,))
            mask = (ts_win > t_old + 1e-30) & (ts_win <= t_new + 1e-30)
            w = jnp.where(t_new > t_old,
                          (ts_win - t_old) /
                          jnp.maximum(t_new - t_old, 1e-300), 1.0)
            w = jnp.clip(w, 0.0, 1.0)
            xi = x_old[None, :] + w[:, None] * (x_new - x_old)[None, :]
            zero = jnp.int32(0)
            win_old = jax.lax.dynamic_slice(xs, (si, zero), (W, n))
            win = jnp.where(mask[:, None], xi.astype(xs.dtype), win_old)
            xs = jax.lax.dynamic_update_slice(xs, win, (si, zero))
            return si + jnp.sum(mask, dtype=jnp.int32), xs

        bp_iota = jnp.arange(n_bp, dtype=jnp.int32)

        def setup_trial(s):
            """Compute the next trial step's (h_eff, t_new, c0, rhs_q,
            hit_bp, x_pred) from the accepted state in s."""
            t, h, x = s["t"], s["h"], s["x"]
            # masked-sum lookup, NOT bp_times[i]: a dynamic gather inside
            # the while_loop faults the axon TPU backend (reproducible
            # whenever n_bp > 1; same pathology class as LU-in-loop)
            bp_j = jnp.minimum(s["bp_i"], n_bp - 1)
            bp_t = jnp.sum(jnp.where(bp_iota == bp_j, bp_times, 0.0))
            h_eff = jnp.minimum(jnp.minimum(h, hmax), tstop - t)
            if dmeta is not None:
                # never step past the shortest transport delay: the
                # delayed values are explicit history, so t - τ must land
                # at or before the last accepted point
                h_eff = jnp.minimum(h_eff, jnp.maximum(tau_cap, hmin))
            to_bp = bp_t - t
            h_eff = jnp.where((to_bp > 0) & (to_bp < h_eff * 1.5),
                              jnp.minimum(h_eff, to_bp), h_eff)
            h_eff = jnp.maximum(h_eff, hmin)
            t_new = t + h_eff
            hit_bp = t_new >= bp_t - 1e-15 * jnp.maximum(bp_t, 1.0)

            use_be = s["ord"] == 1
            if integ == "trap":
                c0 = jnp.where(use_be, 1.0 / h_eff, 2.0 / h_eff)
                rhs_q = c0 * s["q"] + jnp.where(use_be, 0.0,
                                                1.0) * s["qdot"]
            else:  # gear2: variable-step BDF2 over charge history
                h2 = jnp.maximum(t - s["t1"], 1e-300)
                a0 = (2 * h_eff + h2) / (h_eff * (h_eff + h2))
                b0 = -(h_eff + h2) / (h_eff * h2)
                g0 = h_eff / (h2 * (h_eff + h2))
                c0 = jnp.where(use_be, 1.0 / h_eff, a0)
                rhs_q = jnp.where(use_be, s["q"] / h_eff,
                                  -(b0 * s["q"] + g0 * s["q1"]))

            dt1 = jnp.maximum(t - s["t1"], 1e-300)
            slope = (x - s["x1"]) / dt1
            x_pred = jnp.where(s["naccept"] >= 1, x + slope * h_eff, x)
            trial = dict(h_eff=h_eff, t_new=t_new, c0=c0, rhs_q=rhs_q,
                         hit_bp=hit_bp, use_be=use_be, xi=x_pred,
                         it=jnp.int32(0))
            if dmeta is not None:
                trial["dly"] = _interp_hist(s["hist_t"], s["hist_v"],
                                            t_new - taus)
            return trial

        # flattened state: accepted quantities + in-flight trial
        if state_in is None:
            si0, xs = save_points(0, xs, t0 - 1.0, x0, t0, x0)
            state = dict(
                t=t0, h=h0, x=x0, lim=lim0, lim_acc=lim0, q=q0,
                qdot=qdot0, q1=q0,
                x1=x0, t1=t0 - 1.0, x2=x0, t2=t0 - 2.0,
                ord=jnp.int32(1), bp_i=jnp.int32(0), si=si0, xs=xs,
                naccept=jnp.int32(0), nreject=jnp.int32(0),
                nnewton=jnp.int32(0), fail=jnp.asarray(False),
                nsteps=jnp.int32(0), nrej_run=jnp.int32(0),
                hold=jnp.int32(0), itc=jnp.int32(0))
            if dmeta is not None:
                state["hist_t"] = jnp.full(H, t0, DTYPE)
                state["hist_v"] = jnp.tile(v0_dly[None, :], (H, 1))
            if trace:
                # solver observability: per-Newton-iteration log of
                # (t_new, h_eff, it, conv, enorm, accept) — ring buffer
                state["trace"] = jnp.zeros((TRACE_LEN, 6), DTYPE)
                state["ti"] = jnp.int32(0)
            state.update(setup_trial(state))
        else:
            # resume a paused run (the axon TPU backend faults when one
            # device program executes for more than ~45 s, so long
            # transients advance in bounded bursts with full state
            # continuity)
            state = dict(state_in)
            state["itc"] = jnp.zeros_like(state["itc"])

        def cond(s):
            c = ((s["t"] < tstop * (1.0 - 1e-12)) & (~s["fail"])
                 & (s["nsteps"] < max_steps) & (s["si"] < n_save))
            if pause_iters:
                c = c & (s["itc"] < pause_iters)
            return c

        def body(s):
            # ---- exactly ONE Newton iteration on the in-flight trial
            c0, rhs_q = s["c0"], s["rhs_q"]
            dyn = dyn0._replace(time=s["t_new"],
                                mode=jnp.asarray(MODE_TRAN, jnp.int32))
            F, Q, G, C, lim_new = assemble(
                pad_state(s["xi"]), s["lim"], params, dyn,
                s["dly"] if dmeta is not None else None)
            Ft = F + c0 * Q - rhs_q
            dx = solve_J(G, C, c0, -Ft)
            if spec.max_dv > 0:
                dx = damp_step(dx, is_v, spec.max_dv)
            xi_new = s["xi"] + dx
            ok_dx = jnp.all(jnp.abs(dx) <= spec.reltol * jnp.maximum(
                jnp.abs(xi_new), jnp.abs(s["xi"])) + atol)
            # residual test: accept when every row's residual is small
            # relative to the magnitudes of its own constituent currents
            # (SPICE residual convergence; the row scale includes the
            # capacitor companion terms). The implied solution error is
            # ~0.1*reltol*V — below the dx tolerance — and this saves
            # Newton when the linear-solve noise floor exceeds the dx
            # tolerance at small h.
            rowscale = jnp.abs(F) + jnp.abs(c0 * Q) + jnp.abs(rhs_q)
            ok_res = jnp.all(jnp.abs(Ft) <= 1e-9 * rowscale + atol)
            ok = ok_dx | ok_res
            bad = ~jnp.all(jnp.isfinite(xi_new))
            xi_new = jnp.where(bad, s["xi"], xi_new)
            lim_new = jnp.where(bad, s["lim"], lim_new)
            it = s["it"] + 1
            conv = ok & ~bad
            newton_done = conv | bad | (it >= spec.max_newton_iters)

            # ---- step control (masked: applies only when newton_done)
            t, x, h_eff, t_new = s["t"], s["x"], s["h_eff"], s["t_new"]
            d2, d3 = _divided_diff3(xi_new, t_new, x, t, s["x1"], s["t1"],
                                    s["x2"], s["t2"])
            lte = jnp.where(s["use_be"], h_eff * h_eff * jnp.abs(d2),
                            0.5 * h_eff ** 3 * jnp.abs(d3))
            etol = TRTOL * (spec.reltol * jnp.maximum(jnp.abs(xi_new),
                                                      jnp.abs(x)) + atol)
            # LTE only on differential variables (reference
            # detect_differential_vars, `src/mna/solve.jl:2041`)
            enorm = jnp.max(jnp.where(diff_mask, lte / etol, 0.0))
            enorm = jnp.where(s["naccept"] >= 2, enorm, 0.0)
            # NaN guard: a NaN enorm/h would deadlock the controller (NaN
            # comparisons are all False, so neither the hmin force-accept
            # nor the failure detector would ever fire)
            enorm = jnp.where(jnp.isnan(enorm), jnp.inf, enorm)

            accept = newton_done & conv & (
                (enorm <= 1.0) | (h_eff <= hmin * 1.01))
            reject = newton_done & ~accept
            # LTE-indicated factor: on reject shrink the WHOLE way to the
            # indicated step (clamping the shrink causes accept/reject
            # limit cycles at sharp edges where the divided-difference LTE
            # underestimates right after shrinking); growth is suppressed
            # while `hold` > 0 (set by any reject) — a PI-controller-style
            # anti-windup
            fac = jnp.where(conv,
                            jnp.clip(0.9 * jnp.power(
                                jnp.maximum(enorm, 1e-10), -1.0 / 3.0),
                                0.02, GROW_MAX),
                            NEWTON_FAIL_CUT)
            fac = jnp.where(accept & (s["hold"] > 0),
                            jnp.minimum(fac, 1.0), fac)
            h_next = jnp.clip(h_eff * fac, hmin, hmax)
            h_next = jnp.where(jnp.isfinite(h_next) & (h_next > 0),
                               h_next, hmin)
            fail_now = reject & (h_eff <= hmin * 1.01)

            # first-order charge correction (Q is at the pre-update
            # iterate; the O(dx) charge error times c0=2/h poisons qdot
            # and the next step's trap history at small h)
            Qc = Q + matvec(C, dx)
            # qdot from the discretization identity (BE/trap/gear2 alike)
            qdot_new = c0 * Qc - rhs_q
            si_new, xs_new = save_points(s["si"], s["xs"], t, x, t_new,
                                         xi_new)

            def pick(a, b):
                return jnp.where(accept, a, b)

            ns = dict(
                t=pick(t_new, t), h=jnp.where(newton_done, h_next, s["h"]),
                x=pick(xi_new, x),
                lim=jnp.where(newton_done & ~conv, s["lim"], lim_new),
                q=pick(Qc, s["q"]), qdot=pick(qdot_new, s["qdot"]),
                q1=pick(s["q"], s["q1"]),
                x1=pick(x, s["x1"]), t1=pick(t, s["t1"]),
                x2=pick(s["x1"], s["x2"]), t2=pick(s["t1"], s["t2"]),
                # BE after breakpoints and after Newton failures
                ord=jnp.where(accept & s["hit_bp"], jnp.int32(1),
                              jnp.where(accept, jnp.int32(2),
                                        jnp.where(reject & ~conv,
                                                  jnp.int32(1), s["ord"]))),
                bp_i=jnp.where(accept & s["hit_bp"], s["bp_i"] + 1,
                               s["bp_i"]),
                si=jnp.where(accept, si_new, s["si"]),
                xs=jnp.where(accept, xs_new, s["xs"]),
                naccept=s["naccept"] + accept.astype(jnp.int32),
                nreject=s["nreject"] + reject.astype(jnp.int32),
                nnewton=s["nnewton"] + 1,
                # a long unbroken run of rejects = "timestep too small"
                # (belt-and-braces stuck-step detector)
                nrej_run=jnp.where(accept, jnp.int32(0),
                                   s["nrej_run"] + reject.astype(jnp.int32)),
                hold=jnp.where(reject, jnp.int32(3),
                               jnp.where(accept,
                                         jnp.maximum(s["hold"] - 1, 0),
                                         s["hold"])),
                fail=s["fail"] | fail_now | (s["nrej_run"] > 100),
                nsteps=s["nsteps"] + newton_done.astype(jnp.int32),
                itc=s["itc"] + 1)
            if dmeta is not None:
                # record the accepted point's delayed-expression values
                # into the (chronologically ordered, shift-left) ring
                v_now, _ = dmeta.probe(pad_state(xi_new), params, dyn)
                ns["hist_t"] = jnp.where(
                    accept,
                    jnp.concatenate([s["hist_t"][1:],
                                     jnp.reshape(t_new, (1,))]),
                    s["hist_t"])
                ns["hist_v"] = jnp.where(
                    accept,
                    jnp.concatenate([s["hist_v"][1:], v_now[None, :]]),
                    s["hist_v"])

            # next trial: fresh setup when this one finished, else continue
            trial = setup_trial(ns)
            keep = dict(h_eff=s["h_eff"], t_new=s["t_new"], c0=s["c0"],
                        rhs_q=s["rhs_q"], hit_bp=s["hit_bp"],
                        use_be=s["use_be"], xi=xi_new, it=it)
            if dmeta is not None:
                keep["dly"] = s["dly"]
            for k in trial:
                ns[k] = jax.tree.map(
                    lambda a, b: jnp.where(newton_done, a, b),
                    trial[k], keep[k])
            # limiter state: keep updating while Newton continues; commit
            # on accept; restore the LAST ACCEPTED step's state on reject
            # (s["lim"] at reject time is the rejected trial's own previous
            # iterate — limiting against a discarded trajectory hurts
            # convergence of the retry)
            ns["lim_acc"] = jnp.where(accept, lim_new, s["lim_acc"])
            ns["lim"] = jnp.where(accept, lim_new,
                                  jnp.where(newton_done, s["lim_acc"],
                                            lim_new))
            if trace:
                viol = jnp.max(jnp.abs(dx) / (spec.reltol * jnp.maximum(
                    jnp.abs(xi_new), jnp.abs(s["xi"])) + atol))
                rec = jnp.stack([t_new, h_eff, it.astype(DTYPE),
                                 conv.astype(DTYPE), viol,
                                 accept.astype(DTYPE)])
                ti = jnp.mod(s["ti"], TRACE_LEN)
                ns["trace"] = s["trace"].at[ti].set(rec)
                ns["ti"] = s["ti"] + 1
            return ns

        out = jax.lax.while_loop(cond, body, state)
        ran_out = (out["nsteps"] >= max_steps) & (out["t"] < tstop * (1 - 1e-12))
        stats = TranStats(naccept=out["naccept"], nreject=out["nreject"],
                          nnewton=out["nnewton"],
                          fail=out["fail"] | ran_out)
        xs_out = out["xs"][:n_save].astype(DTYPE)
        if trace:
            return xs_out, stats, (out["trace"], out["ti"]), out
        return xs_out, stats, out

    def run(x0, lim0, q0, qdot0, params, dyn0, t0, tstop, h0, hmax, hmin,
            bp_times, save_ts, diff_mask):
        return _run_impl(None, x0, lim0, q0, qdot0, params, dyn0, t0,
                         tstop, h0, hmax, hmin, bp_times, save_ts,
                         diff_mask)

    def resume(state, x0, lim0, q0, qdot0, params, dyn0, t0, tstop, h0,
               hmax, hmin, bp_times, save_ts, diff_mask):
        return _run_impl(state, x0, lim0, q0, qdot0, params, dyn0, t0,
                         tstop, h0, hmax, hmin, bp_times, save_ts,
                         diff_mask)

    run.resume = resume
    return run


def tran(cc: CompiledCircuit, tspan, params=None, *, dt=None, dtmax=None,
         n_save: int | None = None, save_ts=None, max_steps: int = 200_000,
         x0=None, method: str | None = None, integ: str = "trap",
         ic: dict | None = None, uic: bool = False, trace: bool = False,
         delay_hist: int = 1024, _vmap_axes=None) -> TranSolution:
    """Transient analysis over tspan=(t0, tstop).

    dt: suggested output resolution (SPICE .tran tstep); dtmax: max internal
    step (SPICE tmax). Output is interpolated onto a uniform grid of
    n_save points (default from dt).
    """
    t0, tstop = float(tspan[0]), float(tspan[1])
    if tstop <= t0:
        raise ValueError(f"tran needs tstop > t0, got tspan=({t0}, {tstop})")
    if params is None:
        params = cc.params0()
    if _vmap_axes is None:
        from ..mna.assemble import ensure_setup
        params = ensure_setup(cc, params)
    if dt is None:
        dt = (tstop - t0) / 1000.0
    if dtmax is None:
        dtmax = max((tstop - t0) / 50.0, dt)
    if save_ts is None:
        if n_save is None:
            n_save = int(round((tstop - t0) / dt)) + 1
        save_ts = np.linspace(t0, tstop, n_save)
    save_ts = jnp.asarray(save_ts, DTYPE)
    n_save = int(save_ts.shape[0])

    # operating point at t0 with transient source values; `uic` skips the
    # DC solve and starts from zeros + .ic values (SPICE UIC / reference
    # CedarUICOp territory); `ic` forces node voltages into x0 either way
    op_conv = True
    if x0 is None and uic:
        x0 = jnp.zeros(cc.n, DTYPE)
    # hybrid flow (same pattern as tran_pit): for small dense circuits
    # on the TPU backend, solve the t0 operating point on the host CPU —
    # the XLA:CPU compile is seconds and the solve milliseconds, vs a
    # 40-250 s serialized remote compile of the DC homotopy chain (the
    # 1024-wide dff sweep's op compile dominated its cold bill). The
    # jit wrappers are cached per platform: trace-time choices
    # (resolve_method, Pallas lowerings) are platform-dependent, so a
    # CPU-traced program must never serve a TPU call.
    hybrid_op = (x0 is None and effective_platform() != "cpu"
                 and cc.bbd is None and cc.n <= 150
                 and not any(g.model.va_setup is not None
                             for g in cc.groups))
    if x0 is None:
        dyn_op0 = cc.spec.dyn(mode=MODE_TRANOP, time=t0)
        if _vmap_axes is not None:
            from ..mna.newton import make_dc_solver
            okey = ("dcsweep_for_tran", str(_vmap_axes),
                    "cpu" if hybrid_op else "")
            if hybrid_op:
                cpu0 = jax.devices("cpu")[0]
                with jax.default_device(cpu0):
                    if okey not in cc.cache:
                        cc.cache[okey] = cc.jit(jax.vmap(
                            make_dc_solver(cc),
                            in_axes=(None, _vmap_axes, None)))
                    r0 = cc.cache[okey](
                        jnp.zeros(cc.n, DTYPE),
                        jax.device_put(params, cpu0), dyn_op0)
                x0 = jnp.asarray(np.asarray(r0.x), DTYPE)
                op_conv = jnp.asarray(np.asarray(r0.converged))
            else:
                if okey not in cc.cache:
                    cc.cache[okey] = cc.jit(jax.vmap(
                        make_dc_solver(cc),
                        in_axes=(None, _vmap_axes, None)))
                r0 = cc.cache[okey](jnp.zeros(cc.n, DTYPE), params,
                                    dyn_op0)
                x0, op_conv = r0.x, r0.converged
        else:
            if hybrid_op:
                cpu0 = jax.devices("cpu")[0]
                with jax.default_device(cpu0):
                    op = dc(cc, jax.device_put(params, cpu0),
                            mode=MODE_TRANOP, time=t0)
                x0 = jnp.asarray(np.asarray(op.x), DTYPE)
                op_conv = bool(np.asarray(op.converged))
            else:
                op = dc(cc, params, mode=MODE_TRANOP, time=t0)
                x0 = op.x
                op_conv = op.converged
    x0 = jnp.asarray(x0, DTYPE)
    if ic:
        for node, v in ic.items():
            x0 = x0.at[..., cc.index_of(str(node))].set(float(v))
    if uic and _vmap_axes is None:
        # consistency projection before the adaptive loop: a few tiny
        # implicit-Euler steps settle the algebraic unknowns while the
        # differential states stay at their .ic values (reference
        # CedarUICOp warmup, `src/mna/dcop.jl:311-411`)
        wkey = ("uic_warmup", method)
        if wkey not in cc.cache:
            from ..mna.newton import make_uic_warmup
            cc.cache[wkey] = cc.jit(make_uic_warmup(cc, method=method))
        h_w = max((tstop - t0) * 1e-12, dt * 1e-6)
        x0 = cc.cache[wkey](x0, params,
                            cc.spec.dyn(mode=MODE_TRAN, time=t0),
                            jnp.asarray(h_w, DTYPE))
        if ic:   # warmup must not move the pinned nodes
            for node, v in ic.items():
                x0 = x0.at[..., cc.index_of(str(node))].set(float(v))

    bp = collect_breakpoints(cc, tstop)
    bp = bp[bp > t0]
    # transport-delay breakpoint echoes: a source kink at b re-emerges at
    # the output of every absdelay site at b + k*tau (reference expands
    # breakpoints into solver tstops, `src/mna/solve.jl:1847-1918`; the
    # DDE path needs the delayed images too)
    if _vmap_axes is None:
        from ..mna.assemble import make_delay_meta, pad_state as _padst
        dmeta0 = make_delay_meta(cc)
        if dmeta0 is not None:
            _, taus0 = dmeta0.probe(_padst(x0), params,
                                    cc.spec.dyn(mode=MODE_TRANOP, time=t0))
            taus0 = np.unique(np.asarray(taus0))
            taus0 = taus0[taus0 > 0]
            ext = [bp, np.asarray([t0])]
            for k_echo in (1, 2):
                for tau_v in taus0:
                    ext.append(bp + k_echo * float(tau_v))
                    ext.append(np.asarray([t0 + k_echo * float(tau_v)]))
            bp = np.unique(np.concatenate(ext))
            bp = bp[(bp > t0) & (bp <= tstop)]
            if bp.size == 0 or bp[-1] != tstop:
                bp = np.append(bp, tstop)
    # windowed saving: a step crosses at most ceil(dtmax/save_dt)+1 grid
    # points; when that window is much smaller than the grid, write only a
    # W-row dynamic slice per iteration instead of the whole grid
    # windowed saving wins on CPU (7x on the DFF MC sweep: small
    # read-modify-write beats rewriting the whole grid); on TPU the dense
    # masked full-grid write is faster than vmapped dynamic slices
    save_np = np.asarray(save_ts)
    dt_min = float(np.min(np.diff(save_np))) if len(save_np) > 1 else dtmax
    W = int(np.ceil(dtmax / max(dt_min, 1e-300))) + 2
    use_window = (W <= n_save // 4) and effective_platform() == "cpu"
    save_window = W if use_window else 0
    # pad the breakpoint table to a coarse length quantum: odd tiny input
    # shapes (e.g. f64[2]) have produced device faults on the axon TPU
    # backend, and padding also coalesces jit cache entries across decks
    # with similar breakpoint counts (pad entries repeat tstop, which the
    # bp_i cursor never passes)
    bp_len = max(8, int(2 ** np.ceil(np.log2(max(len(bp), 1)))))
    if len(bp) < bp_len:
        bp = np.concatenate([bp, np.full(bp_len - len(bp), bp[-1])])
    # bounded device bursts on the axon TPU backend: one XLA execution
    # running longer than ~45 s faults the device, so the runner pauses
    # every pause_iters Newton iterations and the host re-enters with
    # full state continuity (no accuracy or step-control impact).
    # Scaled down with vmap batch width: a 1200-iter burst measured
    # ~0.65 ms/iter at batch 1 but ~17 ms/iter at batch 1024, so the
    # batch-1 sizing blew past the ~45 s fault ceiling at 4096 lanes
    # (BENCH_r04: "TPU worker process crashed" on the 4096-way sweep)
    if effective_platform() == "cpu":
        pause_iters = 0
    else:
        # small dense circuits run ~0.65 ms/iter (measured, dff n=19):
        # 4000 iters ≈ 2.6 s per burst, far under the ceiling — and the
        # gf180 dff (2067 iters) then never pauses, which also skips the
        # LAZY resume compile (~80 s of its cold bill, BENCH r5 phase
        # log). Big-VA / BBD / large circuits keep the conservative 1200.
        big_va = any(g.model.va_setup is not None for g in cc.groups)
        pause_iters = (1200 if (big_va or cc.bbd is not None or cc.n > 64)
                       else 4000)
        if cc.n > 6000:
            # scale the burst down with system size: c6288 at 5,156
            # unknowns measured 31.5 ms/NR (1200-iter burst = 38 s,
            # just under the ~45 s fault ceiling); the 25,380-unknown
            # access-R variant at ~2-3x the per-iter cost CRASHED the
            # TPU worker on its first full burst
            pause_iters = max(150, (pause_iters * 5000) // cc.n)
    if pause_iters and _vmap_axes is not None and x0.ndim == 2:
        batch = int(x0.shape[0])
        if batch > 256:
            pause_iters = max(64, (1200 * 256) // batch)
    key = ("tran_runner", n_save, int(max_steps), len(bp), method, integ,
           trace, save_window, int(delay_hist), pause_iters,
           None if _vmap_axes is None else str(_vmap_axes))
    if key not in cc.cache:
        runner = make_tran_runner(cc, n_save, max_steps, method=method,
                                  integ=integ, trace=trace,
                                  save_window=save_window,
                                  delay_hist=delay_hist,
                                  pause_iters=pause_iters)
        rhs = make_rhs_assembler(cc)
        if cc.bbd is not None:
            from ..mna.bbd_assemble import make_bbd_assembler
            from ..ops.bbd import global_row_sums
            assemble = make_bbd_assembler(cc, cc.bbd)

            def row_mask(C0):
                return global_row_sums(cc.bbd, C0) > 0.0
        else:
            assemble = make_assembler(cc)

            def row_mask(C0):
                return jnp.sum(jnp.abs(C0), axis=1) > 0.0

        def full(x0, params, dyn0, t0_, tstop_, h0, hmax, hmin, bp_times,
                 save_ts):
            xp = pad_state(x0)
            lim0 = assemble.init_lim(xp)
            dyn_op = dyn0._replace(time=t0_,
                                   mode=jnp.asarray(MODE_TRANOP, jnp.int32))
            f0, q0 = rhs(xp, params, dyn_op)
            qdot0 = -f0  # consistent initialization: f + dq/dt = 0
            _, _, _, C0, _ = assemble(xp, lim0, params, dyn_op)
            diff_mask = row_mask(C0)
            return runner(x0, lim0, q0, qdot0, params, dyn0, t0_, tstop_,
                          h0, hmax, hmin, bp_times, save_ts, diff_mask)

        def full_resume(state, x0, params, dyn0, t0_, tstop_, h0, hmax,
                        hmin, bp_times, save_ts):
            xp = pad_state(x0)
            lim0 = assemble.init_lim(xp)
            dyn_op = dyn0._replace(time=t0_,
                                   mode=jnp.asarray(MODE_TRANOP, jnp.int32))
            f0, q0 = rhs(xp, params, dyn_op)
            _, _, _, C0, _ = assemble(xp, lim0, params, dyn_op)
            diff_mask = row_mask(C0)
            return runner.resume(state, x0, lim0, q0, -f0, params, dyn0,
                                 t0_, tstop_, h0, hmax, hmin, bp_times,
                                 save_ts, diff_mask)

        if _vmap_axes is not None:
            full = jax.vmap(full, in_axes=(0, _vmap_axes, None, None, None,
                                           None, None, None, None, None))
            full_resume = jax.vmap(full_resume,
                                   in_axes=(0, 0, _vmap_axes, None, None,
                                            None, None, None, None, None,
                                            None))
        # resume compiles LAZILY: it is a second full-size module (the
        # whole runner again) and is only needed when a run actually
        # pauses — on the remote TPU compile helper that second compile
        # costs as much as the first
        cc.cache[key] = (cc.jit(full), [cc.jit, full_resume, None])

    dyn0 = cc.spec.dyn(mode=MODE_TRAN, time=t0)
    # hmin floor: below ~1e-5*dt the trapezoidal system G + (2/h)C becomes
    # so stiff (cond ~ 1/(h*gmin)) that f64 Newton cannot converge at all —
    # h that small carries no information anyway (SPICE delmin in spirit)
    hmin = max((tstop - t0) * 1e-12, dt * 1e-5, 1e-18)
    h0 = min(dt / 10.0, dtmax)
    run_jit, resume_cell = cc.cache[key]
    args = (params, dyn0, jnp.asarray(t0, DTYPE), jnp.asarray(tstop, DTYPE),
            jnp.asarray(h0, DTYPE), jnp.asarray(dtmax, DTYPE),
            jnp.asarray(hmin, DTYPE), jnp.asarray(bp, DTYPE), save_ts)
    out = run_jit(x0, *args)
    st = out[-1]
    if pause_iters:
        while True:
            t_now = np.asarray(st["t"])
            done = ((t_now >= tstop * (1 - 1e-12))
                    | np.asarray(st["fail"])
                    | (np.asarray(st["nsteps"]) >= max_steps)
                    | (np.asarray(st["si"]) >= n_save))
            if np.all(done):
                break
            if resume_cell[2] is None:
                resume_cell[2] = resume_cell[0](resume_cell[1])
            out = resume_cell[2](st, x0, *args)
            st = out[-1]
    if trace:
        xs, stats, tr = out[0], out[1], out[2]
    else:
        xs, stats = out[0], out[1]
        tr = None
    sol = TranSolution(cc, np.asarray(save_ts), xs, stats,
                       op_converged=op_conv)
    sol.trace = tr
    return sol
