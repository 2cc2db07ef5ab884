"""Time-dependent source waveforms (DC / PULSE / SIN / PWL / EXP / SFFM).

Design: every independent source in a circuit carries one `Waveform`, encoded
as (int type code, fixed-width coefficient vector). All sources in a device
group share one padded coefficient width, so a single vmapped `eval_wave`
lax.switch evaluates any mix of waveform types without per-type groups.

Host-side, each waveform also publishes its `breakpoints()` — the kink times a
transient integrator must land on exactly (PWL corners, PULSE edges, SIN
start) — mirroring the reference's `Wave`/`BreakpointSpec` protocol
(Cadnip `src/mna/breakpoints.jl:44-51`, `src/mna/devices.jl:122-216`).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DTYPE

WAVE_DC = 0
WAVE_PULSE = 1
WAVE_SIN = 2
WAVE_PWL = 3
WAVE_EXP = 4
WAVE_SFFM = 5

_MIN_COEFFS = 8


@dataclasses.dataclass(frozen=True)
class Waveform:
    kind: int
    coeffs: tuple            # raw python floats, variable length
    dc: float = 0.0          # DC analysis value

    def breakpoints(self, tstop: float) -> np.ndarray:
        return _breakpoints(self, tstop)


def DC(value: float = 0.0) -> Waveform:
    return Waveform(WAVE_DC, (float(value),), dc=float(value))


def Pulse(v1, v2, td=0.0, tr=1e-9, tf=1e-9, pw=np.inf, per=np.inf) -> Waveform:
    """SPICE PULSE(v1 v2 td tr tf pw per)."""
    return Waveform(WAVE_PULSE,
                    tuple(float(x) for x in (v1, v2, td, tr, tf, pw, per)),
                    dc=float(v1))


def Sin(vo, va, freq, td=0.0, theta=0.0, phase_deg=0.0) -> Waveform:
    """SPICE SIN(vo va freq td theta phase)."""
    return Waveform(WAVE_SIN,
                    tuple(float(x) for x in (vo, va, freq, td, theta, phase_deg)),
                    dc=float(vo))


def PWL(points: Sequence[float]) -> Waveform:
    """SPICE PWL(t1 v1 t2 v2 ...). Flat extrapolation beyond the ends."""
    pts = tuple(float(x) for x in points)
    if len(pts) < 2 or len(pts) % 2:
        raise ValueError("PWL needs an even number of >= 2 values")
    return Waveform(WAVE_PWL, pts, dc=pts[1])


def Exp(v1, v2, td1=0.0, tau1=1e-9, td2=1e-9, tau2=1e-9) -> Waveform:
    return Waveform(WAVE_EXP,
                    tuple(float(x) for x in (v1, v2, td1, tau1, td2, tau2)),
                    dc=float(v1))


def Sffm(vo, va, fc, mdi=0.0, fs=0.0) -> Waveform:
    return Waveform(WAVE_SFFM, tuple(float(x) for x in (vo, va, fc, mdi, fs)),
                    dc=float(vo))


# ---------------------------------------------------------------------------
# packing: list of Waveforms -> (kind[int32 n], coeffs[f64 n, width])

def pack_waveforms(waves: Sequence[Waveform]):
    width = max(_MIN_COEFFS, max((len(w.coeffs) for w in waves), default=0))
    width += width % 2  # keep even so PWL (t,v) pairs split cleanly
    kinds = np.array([w.kind for w in waves], np.int32)
    ncoef = np.array([len(w.coeffs) for w in waves], np.int32)
    coeffs = np.zeros((len(waves), width), np.float64)
    for i, w in enumerate(waves):
        c = np.asarray(w.coeffs, np.float64)
        if w.kind == WAVE_PULSE:
            # replace inf pw/per with huge-but-finite so arithmetic stays clean
            c = np.where(np.isinf(c), 1e30, c)
        coeffs[i, :len(c)] = c
        if w.kind == WAVE_PWL:
            # pad the tail by repeating the final (t, v) with strictly
            # increasing times so searchsorted-free interpolation stays flat
            tl, vl = c[-2], c[-1]
            for j in range(len(c), width - 1, 2):
                coeffs[i, j] = tl + 1e25 * (j - len(c) + 2)
                coeffs[i, j + 1] = vl
    dc = np.array([w.dc for w in waves], np.float64)
    return {"kind": jnp.asarray(kinds), "coeffs": jnp.asarray(coeffs, DTYPE),
            "ncoef": jnp.asarray(ncoef), "dc": jnp.asarray(dc, DTYPE)}


# ---------------------------------------------------------------------------
# traced evaluation

def _eval_dc(t, c, n):
    return c[0]


def _eval_pulse(t, c, n):
    v1, v2, td, tr, tf, pw, per = c[0], c[1], c[2], c[3], c[4], c[5], c[6]
    tr = jnp.maximum(tr, 1e-15)
    tf = jnp.maximum(tf, 1e-15)
    per = jnp.maximum(per, 1e-15)
    tl = jnp.where(t < td, -1.0, jnp.mod(t - td, per))
    up = v1 + (v2 - v1) * jnp.clip(tl / tr, 0.0, 1.0)
    dn = v2 + (v1 - v2) * jnp.clip((tl - tr - pw) / tf, 0.0, 1.0)
    v = jnp.where(tl < tr + pw, up, dn)
    return jnp.where(tl < 0.0, v1, v)


def _eval_sin(t, c, n):
    vo, va, fr, td, theta, ph = c[0], c[1], c[2], c[3], c[4], c[5]
    tl = t - td
    ramp = vo + va * jnp.sin(2 * jnp.pi * ph / 360.0)
    wave = vo + va * jnp.exp(-tl * theta) * jnp.sin(
        2 * jnp.pi * (fr * tl + ph / 360.0))
    return jnp.where(tl < 0.0, ramp, wave)


def _eval_pwl(t, c, n):
    # piecewise-linear with flat extrapolation; padded tail times are huge
    # and strictly increasing, so jnp.interp handles the whole vector.
    ts = c[0::2]
    vs = c[1::2]
    return jnp.interp(t, ts, vs)


def _eval_exp(t, c, n):
    v1, v2, td1, tau1, td2, tau2 = c[0], c[1], c[2], c[3], c[4], c[5]
    tau1 = jnp.maximum(tau1, 1e-15)
    tau2 = jnp.maximum(tau2, 1e-15)
    rise = (v2 - v1) * (1.0 - jnp.exp(-jnp.maximum(t - td1, 0.0) / tau1))
    fall = (v1 - v2) * (1.0 - jnp.exp(-jnp.maximum(t - td2, 0.0) / tau2))
    return v1 + jnp.where(t > td1, rise, 0.0) + jnp.where(t > td2, fall, 0.0)


def _eval_sffm(t, c, n):
    vo, va, fc, mdi, fs = c[0], c[1], c[2], c[3], c[4]
    return vo + va * jnp.sin(2 * jnp.pi * fc * t
                             + mdi * jnp.sin(2 * jnp.pi * fs * t))


_EVALS = [_eval_dc, _eval_pulse, _eval_sin, _eval_pwl, _eval_exp, _eval_sffm]


def eval_wave(kind, coeffs, ncoef, t):
    """Evaluate one packed waveform at time t (all args traced).

    A concrete python-int kind dispatches statically — the VMEM
    integrator kernel injects pre-evaluated waveforms as kind 0 and must
    not drag every branch (PWL's interp gathers do not lower in Mosaic)
    into the trace."""
    if isinstance(kind, int):
        return _EVALS[kind](t, coeffs, ncoef)
    return jax.lax.switch(kind, _EVALS, t, coeffs, ncoef)


# ---------------------------------------------------------------------------
# host-side breakpoints

def _breakpoints(w: Waveform, tstop: float) -> np.ndarray:
    c = np.asarray(w.coeffs, np.float64)
    if w.kind == WAVE_PULSE:
        v1, v2, td, tr, tf, pw, per = c
        edges = np.array([0.0, tr, tr + pw, tr + pw + tf])
        if not np.isfinite(per) or per >= 1e29:
            bps = td + edges
        else:
            n = int(np.floor(max(tstop - td, 0.0) / per)) + 1
            bps = (td + edges[None, :] + per * np.arange(n + 1)[:, None]).ravel()
        return bps[(bps >= 0) & (bps <= tstop)]
    if w.kind == WAVE_PWL:
        ts = c[0::2]
        return ts[(ts >= 0) & (ts <= tstop)]
    if w.kind == WAVE_SIN:
        td = c[3]
        return np.array([td]) if 0 <= td <= tstop else np.empty(0)
    if w.kind == WAVE_EXP:
        td1, td2 = c[2], c[4]
        bps = np.array([td1, td2])
        return bps[(bps >= 0) & (bps <= tstop)]
    return np.empty(0)
