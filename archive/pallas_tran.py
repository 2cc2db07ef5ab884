"""Whole-integrator Pallas TPU kernel for small dense circuits.

The XLA transient runner costs ~300 us per Newton iteration on TPU for a
20-unknown circuit: the while_loop body lowers to ~100 fusion-breaking
ops (gathers, scatters, reductions, the solve), each with us-scale
sequencing latency. The VACASK/ngspice class of serial benchmarks (rc,
graetz, mul: ~1M timepoints of a tiny nonlinear circuit) therefore runs
1000x slower than its FLOP count warrants. This module runs the ENTIRE
adaptive integrator — device evaluation, Jacobian assembly, dense solve,
LTE step control, save-grid interpolation — as ONE Pallas kernel whose
state lives in VMEM, bringing the per-iteration cost to a few us.

Mosaic lowering constraints shape the design:
  * per-instance quantities are [sublane, lane] rows with device
    instances in LANES; the device residual/limit functions from
    `mna/devices.py` run unmodified under a lane-axis jax.vmap, and the
    local Jacobians come from ONE row-level `jax.linearize` with 2-D
    iota basis tangents (no 1-D constants, no per-lane seeds)
  * gathers/scatters are one-hot matmuls against selector matrices
    Sel_{g,l} [NP, NI] passed as kernel inputs (scatter-add has no
    Mosaic lowering; closure-captured arrays are rejected); the
    Jacobian assembles as sum_ab (Sel_a * J_b[a]) @ Sel_b^T on the MXU
  * the solve computes the explicit inverse by Gauss-Jordan with
    partial pivoting + row equilibration (fori over pivots on a
    [NP, 2NP] block), so dx = -Ft @ inv needs no transposes
  * breakpoints and all lookups are masked sums, never dynamic gathers
    (a gather inside a device loop faults this backend)
  * output streams through the pallas grid: chunk i owns save rows
    [i*rc, (i+1)*rc); the step size is capped at the chunk's last save
    time so no step crosses a chunk boundary; integrator state persists
    in VMEM/SMEM scratch across the sequential grid
  * all f32; convergence thresholds carry an f32 floor. Newton with a
    consistent f32 residual stays within ~1e-4 relative of the f64
    runner (validated against the XLA path in tests)

Scope: dense circuits with n+1 <= 128 and <= 128 instances per group,
no VA modules, no $limit sites, no transport delays, default parameters
(packed at build). `analyses/tran.py` falls back to the XLA runner
otherwise.

Replaces — for this regime — the reference's Sundials IDA + KLU hot
loop (`src/sweeps.jl:599-601`, SURVEY §2.9) with one on-core program.

STATUS: functionally validated on real v5e Mosaic (RC + graetz match the
f64 XLA runner to f32 accuracy) but not yet faster: measured ~560
us/Newton-iteration steady-state vs ~300 us for the XLA runner. The
per-iteration cost tracks the kernel's ~1500-op body on full [128, 256]
tiles (Mosaic executes each jaxpr op as real VPU work — no XLA-style
fusion), not the MXU matmuls or the solve. Known levers, in order:
shrink the sublane dimension to the circuit size (NP=32 tiles are ~4x
cheaper), hand-fuse the step-control arithmetic, and drop the
double-eval of untaken where() branches in the waveform/limiter chains.
The module stays out of the default tran() path until it wins.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DTYPE

_LANE = 128
F32 = jnp.float32
I32 = jnp.int32

TRTOL = 7.0
GROW_MAX = 2.0
NEWTON_FAIL_CUT = 0.125
RES_EPS = 8e-7      # f32 residual-test floor (vs 1e-9 in the f64 runner)

# SMEM scalar-config slots
(S_T0, S_TSTOP, S_H0, S_HMAX, S_HMIN, S_DTSAVE, S_RELTOL, S_MAXDV,
 S_GSHUNT, S_GMIN, S_TEMP, S_SRCFACT, S_NBP, S_MAXSTEPS, S_MAXNEWT,
 S_NSAVE) = range(16)


def supported(cc) -> bool:
    """Can this circuit run in the VMEM integrator kernel?"""
    if cc.bbd is not None or cc.n + 1 > _LANE:
        return False
    for g in cc.groups:
        m = g.model
        if m.residual_lim is not None or m.n_delay_sites:
            return False
        if m.name.startswith("va:") or m.name.startswith("bsrc"):
            return False
        if g.n_inst > _LANE:
            return False
    return True


class _GroupMeta:
    """Static (host) description of one device group in the kernel."""

    def __init__(self, g, NP):
        self.model = g.model
        self.nl = g.model.n_local
        self.NI = _LANE
        self.NP = NP
        self.n_inst = g.n_inst
        self.pnames = sorted(g.params)
        self.has_wave = g.waves is not None
        self.limited = g.model.limit is not None
        S = np.zeros((self.nl * NP, self.NI), np.float32)
        ST = np.zeros((self.nl * self.NI, NP), np.float32)
        for l in range(self.nl):
            for i in range(g.n_inst):
                S[l * NP + g.conn[i, l], i] = 1.0
                ST[l * self.NI + i, g.conn[i, l]] = 1.0
        self.selG = jnp.asarray(S)
        self.selGT = jnp.asarray(ST)
        rows = []
        for k in self.pnames:
            v = np.asarray(g.params[k], np.float64)
            # pad lanes replicate instance 0: zero params make residuals
            # inf/NaN (1/r), and NaN * zero-selector = NaN in the matmul
            # scatter; the act mask only removes FINITE pad garbage
            r = np.full((1, self.NI), float(v[0]) if len(v) else 0.0,
                        np.float32)
            r[0, :g.n_inst] = v
            rows.append(r)
        act = np.zeros((1, self.NI), np.float32)
        act[0, :g.n_inst] = 1.0
        rows.append(act)
        self.Pact = jnp.asarray(np.concatenate(rows, 0))
        self.kinds = ()
        self.W = 1
        if self.has_wave:
            from ..mna.waveforms import pack_waveforms
            w = pack_waveforms(g.waves)
            self.W = int(w["coeffs"].shape[1])
            self.kinds = tuple(sorted(set(
                int(k) for k in np.asarray(w["kind"]))))
            wr = np.zeros((3 + self.W, self.NI), np.float32)
            wr[0] = float(np.asarray(w["kind"])[0])
            wr[1] = float(np.asarray(w["ncoef"])[0])
            wr[2] = float(np.asarray(w["dc"])[0])
            wr[3:] = np.asarray(w["coeffs"]).T[:, :1]
            wr[0, :g.n_inst] = np.asarray(w["kind"])
            wr[1, :g.n_inst] = np.asarray(w["ncoef"])
            wr[2, :g.n_inst] = np.asarray(w["dc"])
            wr[3:, :g.n_inst] = np.asarray(w["coeffs"]).T
            self.wrow = jnp.asarray(wr)
        else:
            self.wrow = jnp.zeros((1, self.NI), F32)


def _eval_wave_rows(kinds, W, wrow, t):
    """Lane-parallel waveform value at scalar time t from the packed
    [3+W, NI] rows; every kind present is evaluated and mask-combined
    (lax.switch does not lower per-lane in Mosaic)."""
    from ..mna import waveforms as wf
    kind = wrow[0:1, :]
    c = [wrow[3 + i:4 + i, :] for i in range(W)]
    out = jnp.zeros_like(kind)
    for k in kinds:
        if k == wf.WAVE_DC:
            v = c[0]
        elif k == wf.WAVE_PULSE:
            v1, v2, td, tr, tf, pw, per = (c[0], c[1], c[2], c[3], c[4],
                                           c[5], c[6])
            tr = jnp.maximum(tr, 1e-15)
            tf = jnp.maximum(tf, 1e-15)
            per = jnp.maximum(per, 1e-15)
            tl = jnp.where(t < td, -jnp.ones_like(td), (t - td) % per)
            up = v1 + (v2 - v1) * jnp.clip(tl / tr, 0.0, 1.0)
            dn = v2 + (v1 - v2) * jnp.clip((tl - tr - pw) / tf, 0.0, 1.0)
            v = jnp.where(tl < tr + pw, up, dn)
            v = jnp.where(tl < 0.0, v1, v)
        elif k == wf.WAVE_SIN:
            vo, va, fr, td, theta, ph = c[0], c[1], c[2], c[3], c[4], c[5]
            tl = t - td
            ramp = vo + va * jnp.sin(2 * np.pi * ph / 360.0)
            wave = vo + va * jnp.exp(-tl * theta) * jnp.sin(
                2 * np.pi * (fr * tl + ph / 360.0))
            v = jnp.where(tl < 0.0, ramp, wave)
        elif k == wf.WAVE_EXP:
            v1, v2, td1, tau1, td2, tau2 = (c[0], c[1], c[2], c[3], c[4],
                                            c[5])
            tau1 = jnp.maximum(tau1, 1e-15)
            tau2 = jnp.maximum(tau2, 1e-15)
            rise = (v2 - v1) * (1.0 - jnp.exp(
                -jnp.maximum(t - td1, 0.0) / tau1))
            fall = (v1 - v2) * (1.0 - jnp.exp(
                -jnp.maximum(t - td2, 0.0) / tau2))
            zero = jnp.zeros_like(v1)
            v = (v1 + jnp.where(t > td1, rise, zero)
                 + jnp.where(t > td2, fall, zero))
        elif k == wf.WAVE_SFFM:
            vo, va, fc, mdi, fs = c[0], c[1], c[2], c[3], c[4]
            v = vo + va * jnp.sin(2 * np.pi * fc * t
                                  + mdi * jnp.sin(2 * np.pi * fs * t))
        elif k == wf.WAVE_PWL:
            v = c[1]
            for j in range(0, W - 3, 2):
                t0s, v0s = c[j], c[j + 1]
                t1s, v1s = c[j + 2], c[j + 3]
                seg = v0s + (v1s - v0s) * jnp.clip(
                    (t - t0s) / jnp.maximum(t1s - t0s, 1e-30), 0.0, 1.0)
                v = jnp.where(t >= t0s, seg, v)
        else:
            continue
        out = jnp.where(kind == float(k), v, out)
    return out[0]      # [NI]


def _group_assemble(gm: _GroupMeta, selG, selGT, Pact, wave_vals,
                    wdc_row, lim_prev, x_row, dynk, F, Q, G, C):
    """Gather -> (limit) -> residual + row-level linearize -> one-hot
    matmul scatter for one group. Returns updated (F, Q, G, C, lim_new).
    Every scatter matmul stays in standard (M,K)@(K,N) orientation via
    the transposed selectors (contracting lane dims forces Mosaic into
    per-iteration relayouts, measured 5.4 ms vs a few us per Newton
    iteration); only the solve and charge-correction products contract
    transposed, once each per iteration."""
    NP = gm.NP
    nl = gm.nl
    NI = gm.NI
    model = gm.model
    pnames = gm.pnames
    act = Pact[len(pnames):len(pnames) + 1, :]
    dn = (((1,), (0,)), ((), ()))

    sels = [selG[l * NP:(l + 1) * NP, :] for l in range(nl)]
    selTs = [selGT[l * NI:(l + 1) * NI, :] for l in range(nl)]
    u = jnp.concatenate([x_row @ sels[l] for l in range(nl)], axis=0)

    pdict = {k: Pact[i] for i, k in enumerate(pnames)}

    def build_p(pleaf, wv, wdc):
        p = dict(pleaf)
        if gm.has_wave:
            p["wave"] = {"kind": 0, "coeffs": jnp.stack([wv, wv]),
                         "ncoef": 1, "dc": wdc}
        return p

    waxis = 0 if gm.has_wave else None

    def ev_resid(u_rows):
        def one(ucol, pleaf, wv, wdc):
            return model.residual(ucol, build_p(pleaf, wv, wdc), dynk)

        return jax.vmap(one, in_axes=(1, {k: 0 for k in pnames}, waxis,
                                      waxis), out_axes=1)(
            u_rows, pdict, wave_vals, wdc_row)

    if model.limit is not None:
        def one_lim(ucol, upcol, pleaf, wv, wdc):
            return model.limit(ucol, upcol, build_p(pleaf, wv, wdc), dynk)

        ue = jax.vmap(one_lim, in_axes=(1, 1, {k: 0 for k in pnames},
                                        waxis, waxis), out_axes=1)(
            u, lim_prev, pdict, wave_vals, wdc_row)
        lim_new = ue
    else:
        ue = u
        lim_new = lim_prev

    (f, q), lin = jax.linearize(ev_resid, ue)
    rid = jax.lax.broadcasted_iota(jnp.int32, (nl, gm.NI), 0)
    du = u - ue
    for b in range(nl):
        basis = (rid == b).astype(F32)
        Jb, Cb = lin(basis)
        Jb = Jb * act
        Cb = Cb * act
        f = f + Jb * du[b:b + 1, :]
        q = q + Cb * du[b:b + 1, :]
        for a in range(nl):
            # J[row=conn_a, col=conn_b] += dF_a/du_b
            G = G + jax.lax.dot_general(sels[a] * Jb[a:a + 1, :],
                                        selTs[b], dn)
            C = C + jax.lax.dot_general(sels[a] * Cb[a:a + 1, :],
                                        selTs[b], dn)
    f = f * act
    q = q * act
    for l in range(nl):
        F = F + jax.lax.dot_general(f[l:l + 1, :], selTs[l], dn)
        Q = Q + jax.lax.dot_general(q[l:l + 1, :], selTs[l], dn)
    return F, Q, G, C, lim_new


def _gj_inverse(A, n_real, ghost):
    """In-VMEM Gauss-Jordan inverse with partial pivoting and row
    equilibration; ghost rows (lane >= n) carry identity."""
    NP = A.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (NP, 2 * NP), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (NP, 2 * NP), 1)
    A = A + ghost
    # two-sided equilibration: this routine runs on J^T, where partial
    # pivoting is column pivoting of J — scale both axes so the f32
    # elimination sees O(1) entries (c0*C junction terms reach 1e5 next
    # to 1e-12 gmin)
    r = jnp.max(jnp.abs(A), axis=1, keepdims=True)
    rinv = 1.0 / jnp.maximum(r, 1e-30)
    A = A * rinv
    c = jnp.max(jnp.abs(A), axis=0, keepdims=True)
    cinv = 1.0 / jnp.maximum(c, 1e-30)
    A = A * cinv
    eye = (jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 1)
           ).astype(F32)
    # GJ on [Dr A Dc | Dr I] returns Dc^-1 A^-1, so scale rows by Dc
    ab = jnp.concatenate([A, eye * rinv], axis=1)

    def step(k, ab):
        colmask = col_ids == k
        colk = jnp.sum(jnp.where(colmask, ab, 0.0), axis=1, keepdims=True)
        rk = row_ids[:, :1]
        cand = jnp.where(rk >= k, jnp.abs(colk), -1.0)
        p = jax.lax.argmax(cand[:, 0], 0, jnp.int32)
        rowk = jnp.sum(jnp.where(row_ids == k, ab, 0.0), axis=0,
                       keepdims=True)
        rowp = jnp.sum(jnp.where(row_ids == p, ab, 0.0), axis=0,
                       keepdims=True)
        ab = jnp.where(row_ids == k, rowp, ab)
        ab = jnp.where(row_ids == p, rowk, ab)
        piv = jnp.sum(jnp.where(col_ids[:1, :] == k, rowp, 0.0))
        colk2 = jnp.sum(jnp.where(colmask, ab, 0.0), axis=1, keepdims=True)
        factor = colk2 / piv
        factor = jnp.where(rk == k, 0.0, factor)
        return ab - factor * rowp

    ab = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_real), step, ab,
                           unroll=False)
    diag = jnp.sum(jnp.where(row_ids == col_ids, ab, 0.0), axis=1,
                   keepdims=True)
    # undo the column scaling: inv(A) = Dc (GJ result)
    return (ab[:, NP:] / diag) * cinv[0][:, None]


def make_kernel(cc, rows_per_chunk: int, nb_pad: int,
                win_rows: int = 8):
    """Build the pallas-call wrapper for one circuit.

    run(n_chunks, interpret, scal, bp_row, x0, q0, qdot0, diff, atol) ->
    (xs [n_chunks*rc, NP], stats [1, 128], final [8, NP])."""
    from ..mna.spec import DynSpec

    rc = int(rows_per_chunk)
    wr_ = max(8, int(win_rows))
    n = cc.n
    # sublane dimension sized to the circuit (multiple of 8): every
    # [NP, *] matrix op costs NP/8 vector registers instead of 16 — the
    # single biggest lever on the kernel's per-iteration cost (graetz at
    # NP=8 vs NP=128: the Gauss-Jordan loop alone is ~16x cheaper)
    NP = max(8, 8 * ((n + 1 + 7) // 8))
    gms = [_GroupMeta(g, NP) for g in cc.groups]
    NG = len(gms)

    # static masks
    vmask_np = np.zeros((1, NP), np.float32)
    ghost_np = np.zeros((NP, NP), np.float32)
    gdiag_np = np.zeros((NP, NP), np.float32)
    for i in range(NP):
        if i < n:
            if cc.classes[i] == 0:
                vmask_np[0, i] = 1.0
                gdiag_np[i, i] = 1.0
        else:
            ghost_np[i, i] = 1.0
    nmask_np = np.zeros((1, NP), np.float32)
    nmask_np[0, :n] = 1.0

    n_fixed = 9   # bp,x0,q0,qd0,diff,atol,vmask,nmask + (ghost,gdiag as 2)
    # actual VMEM inputs: bp_row, x0, q0, qd0, diff, atol, vmask, nmask,
    # ghost, gdiag = 10, then per group: selG, Pact, wrow, lim0 = 4*NG

    def kernel(scal_ref, *refs):
        from jax.experimental import pallas as pl
        vrefs = refs[:10 + 5 * NG]
        (bp_ref, x0_ref, q0_ref, qd0_ref, diff_ref, atol_ref, vmask_ref,
         nmask_ref, ghost_ref, gdiag_ref) = vrefs[:10]
        grp_refs = vrefs[10:]
        outs = refs[10 + 5 * NG:10 + 5 * NG + 3]
        xs_ref, stats_ref, fin_ref = outs
        scr = refs[10 + 5 * NG + 3:]
        srows_ref, sints_ref, sflt_ref = scr[0], scr[1], scr[2]
        limrefs = scr[3:3 + NG]
        limaccrefs = scr[3 + NG:3 + 2 * NG]

        ci = pl.program_id(0)
        t0 = scal_ref[S_T0]
        tstop = scal_ref[S_TSTOP]
        hmax = scal_ref[S_HMAX]
        hmin = scal_ref[S_HMIN]
        dt_save = scal_ref[S_DTSAVE]
        reltol = scal_ref[S_RELTOL]
        max_dv = scal_ref[S_MAXDV]
        n_bp = jnp.int32(scal_ref[S_NBP])
        max_steps = jnp.int32(scal_ref[S_MAXSTEPS])
        max_newton = jnp.int32(scal_ref[S_MAXNEWT])
        n_save = jnp.int32(scal_ref[S_NSAVE])
        dynk = DynSpec(temp=scal_ref[S_TEMP], time=t0,
                       gmin=scal_ref[S_GMIN], gshunt=scal_ref[S_GSHUNT],
                       srcfact=scal_ref[S_SRCFACT], mode=jnp.int32(2))
        vrow = vmask_ref[:]
        nrow = nmask_ref[:]
        ghost = ghost_ref[:]
        gdiag = gdiag_ref[:]
        atol = atol_ref[:]
        diffm = diff_ref[:]
        bprow = bp_ref[:]                            # [1, nb_pad]
        bpiota = jax.lax.broadcasted_iota(jnp.int32, (1, nb_pad), 1)

        @pl.when(ci == 0)
        def _init():
            srows_ref[0:1, :] = x0_ref[:] * nrow
            srows_ref[1:2, :] = x0_ref[:] * nrow
            srows_ref[2:3, :] = x0_ref[:] * nrow
            srows_ref[3:4, :] = q0_ref[:]
            srows_ref[4:5, :] = q0_ref[:]
            srows_ref[5:6, :] = qd0_ref[:]
            srows_ref[6:7, :] = jnp.zeros((1, NP), F32)
            srows_ref[7:8, :] = jnp.zeros((1, NP), F32)
            for slot, val in ((0, 0), (1, 1), (2, 0), (3, 0), (4, 0),
                              (5, 0), (6, 0), (7, 0), (8, 0), (9, 1)):
                sints_ref[slot] = jnp.int32(val)
            sflt_ref[0] = t0
            sflt_ref[1] = scal_ref[S_H0]
            sflt_ref[2] = t0 - 1.0
            sflt_ref[3] = t0 - 2.0
            for gi in range(NG):
                limrefs[gi][:] = grp_refs[5 * gi + 4][:]
                limaccrefs[gi][:] = grp_refs[5 * gi + 4][:]

        last_row = jnp.minimum((ci + 1) * rc - 1, n_save - 1)
        chunk_t_last = t0 + last_row.astype(F32) * dt_save
        row0 = ci * rc
        wiota = jax.lax.broadcasted_iota(jnp.int32, (wr_, 1), 0)

        x = srows_ref[0:1, :]
        x1 = srows_ref[1:2, :]
        x2 = srows_ref[2:3, :]
        qv = srows_ref[3:4, :]
        q1 = srows_ref[4:5, :]
        qdot = srows_ref[5:6, :]
        t = sflt_ref[0]
        h = sflt_ref[1]
        t1 = sflt_ref[2]
        t2 = sflt_ref[3]
        bp_i = sints_ref[0]
        si = sints_ref[1]
        naccept = sints_ref[2]
        nreject = sints_ref[3]
        nnewton = sints_ref[4]
        nsteps = sints_ref[5]
        nrej_run = sints_ref[6]
        hold = sints_ref[7]
        fail = sints_ref[8]
        iord = sints_ref[9]
        lims = tuple(limrefs[gi][:] for gi in range(NG))
        limaccs = tuple(limaccrefs[gi][:] for gi in range(NG))

        # pre-fill this chunk's block with the entry state (rows the
        # integrator never crosses — f32 edge cases — hold it); the save
        # grid lives in the OUTPUT ref, not the while carry: a carry
        # tensor is functionally copied every Newton iteration (measured
        # ~5 ms/iter for a [256,128] block)
        xs_ref[:] = jnp.zeros((rc, NP), F32) + x

        def eval_waves(t_now):
            # waveform values depend only on the trial time: evaluated
            # once per trial step, not once per Newton iteration
            out = []
            for gi, gm in enumerate(gms):
                if gm.has_wave:
                    wrow = grp_refs[5 * gi + 3][:]
                    out.append(_eval_wave_rows(gm.kinds, gm.W, wrow,
                                               t_now))
            return tuple(out)

        def assemble_all(x_row, lim_list, wvs, dynt):
            F = jnp.zeros((1, NP), F32)
            Q = jnp.zeros((1, NP), F32)
            G = jnp.zeros((NP, NP), F32)
            C = jnp.zeros((NP, NP), F32)
            lim_out = []
            wi = 0
            for gi, gm in enumerate(gms):
                selG = grp_refs[5 * gi][:]
                selGT = grp_refs[5 * gi + 1][:]
                Pact = grp_refs[5 * gi + 2][:]
                wv = wdc = None
                if gm.has_wave:
                    wv = wvs[wi]
                    wdc = grp_refs[5 * gi + 3][2]
                    wi += 1
                F, Q, G, C, ln = _group_assemble(
                    gm, selG, selGT, Pact, wv, wdc, lim_list[gi], x_row,
                    dynt, F, Q, G, C)
                lim_out.append(ln)
            gsh = dynt.gshunt
            F = F + gsh * x_row * vrow
            G = G + gsh * gdiag
            return F, Q, G, C, tuple(lim_out)

        def setup_trial(t, h, x, x1, t1, qv, qdot, iord, bp_i, naccept):
            bp_j = jnp.minimum(bp_i, n_bp - 1)
            bp_t = jnp.sum(jnp.where(bpiota == bp_j, bprow, 0.0))
            h_eff = jnp.minimum(jnp.minimum(h, hmax), chunk_t_last - t)
            to_bp = bp_t - t
            h_eff = jnp.where((to_bp > 0) & (to_bp < h_eff * 1.5),
                              jnp.minimum(h_eff, to_bp), h_eff)
            h_eff = jnp.maximum(h_eff, hmin)
            t_new = t + h_eff
            hit_bp = t_new >= bp_t - 1e-6 * jnp.maximum(bp_t, 1e-30)
            use_be = iord == 1
            c0 = jnp.where(use_be, 1.0 / h_eff, 2.0 / h_eff)
            rhs_q = c0 * qv + jnp.where(use_be, jnp.zeros_like(qdot),
                                        qdot)
            dt1 = jnp.maximum(t - t1, 1e-30)
            xi = jnp.where(naccept >= 1, x + (x - x1) / dt1 * h_eff, x)
            return (h_eff, t_new, c0, rhs_q, hit_bp, use_be, xi * nrow,
                    eval_waves(t_new))

        (h_eff, t_new, c0, rhs_q, hit_bp, use_be, xi, wvs) = setup_trial(
            t, h, x, x1, t1, qv, qdot, iord, bp_i, naccept)
        it = jnp.int32(0)

        carry0 = (x, x1, x2, qv, q1, qdot, xi, rhs_q,
                  t, h, t1, t2, h_eff, t_new, c0,
                  hit_bp, use_be, it, iord, bp_i, si,
                  naccept, nreject, nnewton, nsteps, nrej_run, hold,
                  fail, lims, limaccs, wvs)

        def cond(cs):
            return ((cs[8] < chunk_t_last - 0.01 * dt_save)
                    & (cs[27] == 0) & (cs[24] < max_steps)
                    & (cs[20] < n_save))

        def body(cs):
            (x, x1, x2, qv, q1, qdot, xi, rhs_q, t, h, t1, t2, h_eff,
             t_new, c0, hit_bp, use_be, it, iord, bp_i, si, naccept,
             nreject, nnewton, nsteps, nrej_run, hold, fail,
             lims, limaccs, wvs) = cs
            dynt = dynk._replace(time=t_new)
            F, Q, G, C, lim_new = assemble_all(xi, lims, wvs, dynt)
            Ft = (F + c0 * Q - rhs_q) * nrow
            # row-pivoted GJ on J itself (column pivoting via J^T loses
            # the diode turn-on moments in f32); the one transposed
            # contraction per iteration is cheap
            inv = _gj_inverse(G + c0 * C, n, ghost)
            dx = -jax.lax.dot_general(
                Ft, inv, (((1,), (1,)), ((), ()))) * nrow
            vstep = jnp.max(jnp.abs(dx) * vrow)
            scale = jnp.minimum(1.0, max_dv / jnp.maximum(vstep, 1e-30))
            scale = jnp.where(max_dv > 0, scale, 1.0)
            dx = dx * scale
            xi_new = (xi + dx) * nrow
            tol = reltol * jnp.maximum(jnp.abs(xi_new),
                                       jnp.abs(xi)) + atol
            # f32 min-reductions, not jnp.all: Mosaic's reduce_and helper
            # mints f64 constants under the global x64 flag and then
            # rejects its own f64 scalar squeeze
            ok_dx = jnp.min((jnp.abs(dx) * nrow
                             <= tol).astype(F32)) > 0.5
            rowscale = jnp.abs(F) + jnp.abs(c0 * Q) + jnp.abs(rhs_q)
            ok_res = jnp.min((jnp.abs(Ft)
                              <= RES_EPS * rowscale + atol
                              ).astype(F32)) > 0.5
            ok = ok_dx | ok_res
            bad = jnp.min(jnp.isfinite(xi_new).astype(F32)) < 0.5
            xi_new = jnp.where(bad, xi, xi_new)
            lim_new = tuple(jnp.where(bad, lo, ln)
                            for lo, ln in zip(lims, lim_new))
            it = it + 1
            conv = ok & ~bad
            newton_done = conv | bad | (it >= max_newton)

            tiny = 1e-30
            d1a = (xi_new - x) / jnp.maximum(t_new - t, tiny)
            d1b = (x - x1) / jnp.maximum(t - t1, tiny)
            d1c = (x1 - x2) / jnp.maximum(t1 - t2, tiny)
            d2a = (d1a - d1b) / jnp.maximum(t_new - t1, tiny)
            d2b = (d1b - d1c) / jnp.maximum(t - t2, tiny)
            d3 = (d2a - d2b) / jnp.maximum(t_new - t2, tiny)
            lte = jnp.where(use_be, h_eff * h_eff * jnp.abs(d2a),
                            0.5 * h_eff ** 3 * jnp.abs(d3))
            etol = TRTOL * (reltol * jnp.maximum(jnp.abs(xi_new),
                                                 jnp.abs(x)) + atol)
            enorm = jnp.max(jnp.where(diffm > 0, lte / etol, 0.0))
            enorm = jnp.where(naccept >= 2, enorm, 0.0)
            enorm = jnp.where(jnp.isnan(enorm), jnp.inf, enorm)
            accept = newton_done & conv & ((enorm <= 1.0)
                                           | (h_eff <= hmin * 1.01))
            reject = newton_done & ~accept
            # no math.powf in Mosaic: x**(-1/3) via exp/log
            fac = jnp.where(conv,
                            jnp.clip(0.9 * jnp.exp(
                                (-1.0 / 3.0) * jnp.log(
                                    jnp.maximum(enorm, 1e-10))),
                                0.02, GROW_MAX),
                            NEWTON_FAIL_CUT)
            fac = jnp.where(accept & (hold > 0),
                            jnp.minimum(fac, 1.0), fac)
            h_next = jnp.clip(h_eff * fac, hmin, hmax)
            h_next = jnp.where(jnp.isfinite(h_next) & (h_next > 0),
                               h_next, hmin)
            fail_now = reject & (h_eff <= hmin * 1.01)

            Qc = Q + jax.lax.dot_general(dx, C,
                                         (((1,), (1,)), ((), ())))
            qdot_new = c0 * Qc - rhs_q

            # windowed save: crossed grid rows are contiguous; a
            # wr_-row dynamic-slice RMW on the OUTPUT ref replaces the
            # full-block masked rewrite (the step size is capped at
            # (wr_-2)*dt_save by the driver)
            k0 = jnp.maximum(
                jnp.int32(jnp.floor((t - t0) / dt_save)) + 1 - row0,
                0)
            k0 = jnp.minimum(k0, rc - wr_)
            wt = t0 + (row0 + k0 + wiota).astype(F32) * dt_save
            mwin = (wt > t + 1e-37) & (wt <= t_new + 1e-37)
            wfac = jnp.clip((wt - t) / jnp.maximum(t_new - t, tiny),
                            0.0, 1.0)
            xi_win = x + wfac * (xi_new - x)
            nsaved = jnp.int32(jnp.sum(mwin.astype(F32)))

            @pl.when(accept)
            def _save():
                cur = xs_ref[pl.dslice(k0, wr_), :]
                xs_ref[pl.dslice(k0, wr_), :] = jnp.where(mwin, xi_win,
                                                          cur)

            acc = accept
            xB = jnp.where(acc, xi_new, x)
            x1B = jnp.where(acc, x, x1)
            x2B = jnp.where(acc, x1, x2)
            qB = jnp.where(acc, Qc, qv)
            q1B = jnp.where(acc, qv, q1)
            qdB = jnp.where(acc, qdot_new, qdot)
            tB = jnp.where(acc, t_new, t)
            t1B = jnp.where(acc, t, t1)
            t2B = jnp.where(acc, t1, t2)
            hB = jnp.where(newton_done, h_next, h)
            iordB = jnp.where(acc & hit_bp, jnp.int32(1),
                              jnp.where(acc, jnp.int32(2),
                                        jnp.where(reject & ~conv,
                                                  jnp.int32(1), iord)))
            bpB = jnp.where(acc & hit_bp, bp_i + 1, bp_i)
            siB = jnp.where(acc, si + nsaved, si)
            naB = naccept + acc.astype(I32)
            nrB = nreject + reject.astype(I32)
            nnB = nnewton + 1
            nsB = nsteps + newton_done.astype(I32)
            nrrB = jnp.where(acc, jnp.int32(0),
                             nrej_run + reject.astype(I32))
            holdB = jnp.where(reject, jnp.int32(3),
                              jnp.where(acc, jnp.maximum(hold - 1, 0),
                                        hold))
            failB = jnp.where(fail_now | (nrej_run > 100), jnp.int32(1),
                              fail)
            lims_acc2 = tuple(jnp.where(acc, ln, la)
                              for ln, la in zip(lim_new, limaccs))
            lims2 = tuple(jnp.where(acc, ln,
                                    jnp.where(newton_done, la, ln))
                          for ln, la in zip(lim_new, limaccs))

            (h_eff2, t_new2, c02, rhs_q2, hit2, be2, xi2,
             wvs2) = setup_trial(tB, hB, xB, x1B, t1B, qB, qdB, iordB,
                                 bpB, naB)
            wvsB = tuple(jnp.where(newton_done, w2, w0)
                         for w2, w0 in zip(wvs2, wvs))
            h_effB = jnp.where(newton_done, h_eff2, h_eff)
            t_newB = jnp.where(newton_done, t_new2, t_new)
            c0B = jnp.where(newton_done, c02, c0)
            rhs_qB = jnp.where(newton_done, rhs_q2, rhs_q)
            hitB = jnp.where(newton_done, hit2, hit_bp)
            beB = jnp.where(newton_done, be2, use_be)
            xiB = jnp.where(newton_done, xi2, xi_new)
            itB = jnp.where(newton_done, jnp.int32(0), it)

            return (xB, x1B, x2B, qB, q1B, qdB, xiB, rhs_qB, tB, hB, t1B,
                    t2B, h_effB, t_newB, c0B, hitB, beB, itB, iordB, bpB,
                    siB, naB, nrB, nnB, nsB, nrrB, holdB, failB,
                    lims2, lims_acc2, wvsB)

        out = jax.lax.while_loop(cond, body, carry0)
        (x, x1, x2, qv, q1, qdot, xi, rhs_q, t, h, t1, t2, h_eff, t_new,
         c0, hit_bp, use_be, it, iord, bp_i, si, naccept, nreject,
         nnewton, nsteps, nrej_run, hold, fail, lims, limaccs,
         wvs) = out

        srows_ref[0:1, :] = x
        srows_ref[1:2, :] = x1
        srows_ref[2:3, :] = x2
        srows_ref[3:4, :] = qv
        srows_ref[4:5, :] = q1
        srows_ref[5:6, :] = qdot
        sflt_ref[0] = t
        sflt_ref[1] = h
        sflt_ref[2] = t1
        sflt_ref[3] = t2
        for slot, val in ((0, bp_i), (1, si), (2, naccept), (3, nreject),
                          (4, nnewton), (5, nsteps), (6, nrej_run),
                          (7, hold), (8, fail), (9, iord)):
            sints_ref[slot] = val
        for gi in range(NG):
            limrefs[gi][:] = lims[gi]
            limaccrefs[gi][:] = limaccs[gi]
        stats_ref[0] = naccept.astype(F32)
        stats_ref[1] = nreject.astype(F32)
        stats_ref[2] = nnewton.astype(F32)
        ran_out = (nsteps >= max_steps) & (t < tstop * (1.0 - 1e-6))
        stats_ref[3] = (fail + ran_out.astype(I32)).astype(F32)
        fin_ref[0:1, :] = x
        fin_ref[1:2, :] = qv
        fin_ref[2:3, :] = qdot
        fin_ref[3:8, :] = jnp.zeros((5, NP), F32)

    @partial(jax.jit, static_argnames=("n_chunks", "interpret"))
    def run(scal, bp_row, x0, q0, qdot0, diff_row, atol_row, *,
            n_chunks: int, interpret: bool = False):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def c00(i):
            return (0, 0)

        grp_inputs = []
        for gm in gms:
            lim0 = jnp.zeros((gm.nl, gm.NI), F32)
            grp_inputs += [gm.selG, gm.selGT, gm.Pact, gm.wrow, lim0]
        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                    * (10 + 5 * NG))
        out_shapes = [jax.ShapeDtypeStruct((n_chunks * rc, NP), F32),
                      jax.ShapeDtypeStruct((16,), F32),
                      jax.ShapeDtypeStruct((8, NP), F32)]
        out_specs = [pl.BlockSpec((rc, NP), lambda i: (i, 0)),
                     pl.BlockSpec(memory_space=pltpu.SMEM),
                     pl.BlockSpec((8, NP), c00)]
        scratch = ([pltpu.VMEM((8, NP), F32), pltpu.SMEM((16,), I32),
                    pltpu.SMEM((16,), F32)]
                   + [pltpu.VMEM((gm.nl, gm.NI), F32) for gm in gms]
                   + [pltpu.VMEM((gm.nl, gm.NI), F32) for gm in gms])
        call = pl.pallas_call(
            kernel, grid=(n_chunks,), in_specs=in_specs,
            out_shape=out_shapes, out_specs=out_specs,
            scratch_shapes=scratch, interpret=interpret,
        )
        # trace under disable_x64: with the global x64 flag on, some
        # python-float-weak intermediates promote to f64 and Mosaic
        # rejects f64 scalar squeezes; every kernel quantity is f32
        # float32 matmul precision is load-bearing: the one-hot
        # gather/scatter matmuls select VALUES — at the TPU default
        # (bf16 passes) every state variable would round to 8 mantissa
        # bits and Newton never meets tolerance
        with jax.enable_x64(False), \
                jax.default_matmul_precision("float32"):
            return call(scal, bp_row, x0, q0, qdot0, diff_row, atol_row,
                        jnp.asarray(vmask_np), jnp.asarray(nmask_np),
                        jnp.asarray(ghost_np), jnp.asarray(gdiag_np),
                        *grp_inputs)

    return run


def vmem_tran(cc, tspan, *, dt=None, dtmax=None, n_save=None,
              max_steps=2_000_000, x0=None, uic=False, ic=None,
              rows_per_chunk=512, interpret=False):
    """Transient analysis via the VMEM integrator kernel.

    Same semantics as `analyses.tran.tran` for the supported circuit
    class (default parameters, uniform save grid). Returns a
    TranSolution."""
    from ..analyses.dc import dc
    from ..analyses.tran import TranSolution, TranStats, \
        collect_breakpoints
    from ..mna.assemble import make_assembler, make_rhs_assembler, \
        pad_state
    from ..mna.spec import MODE_TRANOP

    if not supported(cc):
        raise ValueError("circuit not supported by the VMEM kernel")
    spec = cc.spec
    t0, tstop = float(tspan[0]), float(tspan[1])
    if dt is None:
        dt = (tstop - t0) / 1000.0
    if dtmax is None:
        dtmax = max((tstop - t0) / 50.0, dt)
    if n_save is None:
        n_save = int(round((tstop - t0) / dt)) + 1
    dt_save = (tstop - t0) / (n_save - 1)
    params = cc.params0()

    # operating point / UIC start (host, f64)
    op_conv = True
    if x0 is None:
        if uic:
            x0 = jnp.zeros(cc.n, DTYPE)
        else:
            op = dc(cc, params, mode=MODE_TRANOP, time=t0)
            x0 = op.x
            op_conv = bool(np.asarray(op.converged))
    x0 = jnp.asarray(x0, DTYPE)
    if ic:
        for node, v in ic.items():
            x0 = x0.at[cc.index_of(str(node))].set(float(v))

    rhs = make_rhs_assembler(cc)
    dyn_op = spec.dyn(mode=MODE_TRANOP, time=t0)
    f0, q0 = rhs(pad_state(x0), params, dyn_op)
    qdot0 = -f0
    assemble = make_assembler(cc)
    lim0 = assemble.init_lim(pad_state(x0))
    _, _, _, C0, _ = assemble(pad_state(x0), lim0, params, dyn_op)
    diff = (jnp.sum(jnp.abs(C0), axis=1) > 0.0)

    bp = collect_breakpoints(cc, tstop)
    bp = bp[bp > t0]
    nb_pad = max(128, int(8 * ((len(bp) + 7) // 8)))
    bp_row = np.full((1, nb_pad), tstop, np.float32)
    bp_row[0, :len(bp)] = bp

    n = cc.n
    NP = max(8, 8 * ((n + 1 + 7) // 8))

    def row(v, length=NP):
        r = np.zeros((1, length), np.float32)
        r[0, :len(np.asarray(v))] = np.asarray(v, np.float64)
        return jnp.asarray(r)

    from ..mna.newton import abstol_vector
    atol = np.asarray(abstol_vector(cc))
    atol_row = np.full((1, NP), spec.abstol, np.float32)
    atol_row[0, :n] = atol
    diff_row = row(np.asarray(diff).astype(np.float64))

    hmin = max((tstop - t0) * 1e-7, dt * 1e-4, 1e-30)
    h0 = min(dt / 10.0, dtmax)
    scal = np.zeros(16, np.float32)
    scal[S_T0] = t0
    scal[S_TSTOP] = tstop
    scal[S_H0] = h0
    scal[S_HMAX] = dtmax
    scal[S_HMIN] = hmin
    scal[S_DTSAVE] = dt_save
    scal[S_RELTOL] = max(spec.reltol, 4e-6)
    scal[S_MAXDV] = spec.max_dv
    scal[S_GSHUNT] = spec.gshunt
    scal[S_GMIN] = 1e-12
    scal[S_TEMP] = spec.temp_c + 273.15
    scal[S_SRCFACT] = 1.0
    scal[S_NBP] = len(bp)
    scal[S_MAXSTEPS] = max_steps
    scal[S_MAXNEWT] = spec.max_newton_iters
    scal[S_NSAVE] = n_save

    rc = int(rows_per_chunk)
    n_chunks = (n_save + rc - 1) // rc
    win_rows = min(rc, max(8, int(8 * np.ceil(
        (np.ceil(dtmax / dt_save) + 2) / 8))))
    # a step may cross at most win_rows-2 grid rows
    scal[S_HMAX] = min(dtmax, (win_rows - 2) * dt_save)
    key = ("vmem_tran", rc, nb_pad, win_rows)
    if key not in cc.cache:
        cc.cache[key] = make_kernel(cc, rc, nb_pad, win_rows)
    run = cc.cache[key]
    xs, stats, fin = run(jnp.asarray(scal), jnp.asarray(bp_row),
                         row(np.asarray(x0)), row(np.asarray(q0)),
                         row(np.asarray(qdot0)), diff_row,
                         jnp.asarray(atol_row),
                         n_chunks=n_chunks, interpret=interpret)
    xs = xs[:n_save, :n].astype(DTYPE)
    st = TranStats(naccept=jnp.int32(stats[0]),
                   nreject=jnp.int32(stats[1]),
                   nnewton=jnp.int32(stats[2]),
                   fail=stats[3] > 0)
    ts = np.linspace(t0, tstop, n_save)
    sol = TranSolution(cc, ts, xs, st, op_converged=op_conv)
    sol.final = fin
    return sol
