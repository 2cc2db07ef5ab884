"""Built-in device models as pure residual functions.

The central abstraction of the framework — replacing the reference's `stamp!`
methods (Cadnip `src/mna/devices.jl`) and its dual-number contribution engine
(`src/mna/contrib.jl`): a device is a *pure function*

    residual(u_local, params, dyn) -> (f_local, q_local)

where `u_local` holds the device's local unknowns (terminal voltages followed
by internal unknowns such as branch currents), `f_local` is the resistive
current flowing out of each unknown's KCL/branch row, and `q_local` the charge
(or flux) whose time derivative adds to that row:

    sum_devices scatter(f) + d/dt sum_devices scatter(q) = 0.

The MNA matrices are *derived*, not hand-stamped: G = ∂f/∂u and C = ∂q/∂u via
`jax.jacfwd`, vmapped over all instances of a model class (the reference needed
a hand-rolled two-tag dual system for this, `contrib.jl:71-101`; in JAX it is
the native transform). Newton limiting (SPICE pnjlim) is an optional

    limit(u, u_prev, params, dyn) -> u_eval

hook; the assembler anchors the companion model at `u_eval`
(f_eff = f(u_eval) + J(u_eval)(u - u_eval)), mirroring the reference's
`stamp_limited_companion!` (`src/mna/devices.jl:1251-1258`).

Noise is a third optional channel: `noise(u, p, dyn) -> psd` giving each
instance's noise-current PSD sources between local node pairs (used by
`analyses/noise.py`), mirroring noise registration inside reference stamps
(e.g. `devices.jl:503`, `:1396-1443`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax.numpy as jnp

from .spec import DynSpec, KB, MODE_DCOP, QE
from .waveforms import eval_wave

# unknown classes: select the per-class absolute tolerance (reference
# `src/mna/build.jl:276` state_abstol)
CLASS_V = 0   # node voltage      -> vntol
CLASS_I = 1   # branch current    -> abstol
CLASS_Q = 2   # charge-like state -> chgtol


@dataclasses.dataclass(frozen=True, eq=False)
class DeviceModel:
    """Static description of a device class. Hash/eq by identity: each model
    object defines a vmapped evaluation group."""

    name: str
    terminals: tuple                      # external terminal names
    residual: Callable                    # (u, p, dyn) -> (f, q)
    internals: tuple = ()                 # (name, CLASS_*) extra unknowns
    defaults: dict = dataclasses.field(default_factory=dict)
    limit: Optional[Callable] = None      # (u, u_prev, p, dyn) -> u_eval
    noise: Optional[Callable] = None      # (u, p, dyn) -> white PSDs [n_pairs]
    noise_pairs: tuple = ()               # ((p_idx, n_idx), ...) per psd entry
    # optional 1/f channel: (u, p, dyn) -> (num [n_pairs], exp [n_pairs]);
    # S_flicker(f) = num / f**exp  (reference flicker_noise registration)
    flicker: Optional[Callable] = None
    ac_source: bool = False               # contributes to the AC rhs
    # ((local_idx, sign), ...): rows receiving +sign*acmag∠acphase in b_ac
    ac_rhs: tuple = ()
    # residual is affine in u (f = A u - b(t), q = C u): enables the
    # fixed-step linear transient fast path (tran_linear)
    linear: bool = False
    # optional operating-point info: (u, p, dyn) -> dict of named scalars
    # (reference op-info channel, `context.jl:1200-1342`)
    opvars: Optional[Callable] = None
    # parameter names baked into structure (VA loop bounds, laplace
    # coefficients): per-instance overrides cannot take effect -> warn
    structural_params: tuple = ()
    # VA `$limit` site-based limiting (reference vasim.jl:3012-3146 dual
    # slots + lim_rhs): residual_lim(u, d, w, p, dyn) -> ((f, q), aux) where
    # w [n_lim_branches] is per-branch limiter state (previous evaluation
    # voltages), d [n_lim_sites] is the companion-linearization hook, and
    # aux = (w_new, vnew, wsite). `limit` above stays the simpler
    # node-moving hook for built-in devices.
    residual_lim: Optional[Callable] = None
    lim_branches: tuple = ()              # ((p_local, n_local|None), ...)
    n_lim_sites: int = 0
    # VA `absdelay` transport-delay sites (reference DDE path,
    # `src/mna/delay.jl:20-28`): delay_probe(u, p, dyn) -> (vals, taus),
    # each [n_delay_sites] — the current value of every delayed expression
    # and its delay. The transient runner records vals into a history ring
    # after each accepted step and feeds interpolated past values back into
    # the residual through the params dict under '__dly__'.
    n_delay_sites: int = 0
    delay_probe: Optional[Callable] = None
    # VA node collapse (reference detect_short_circuits, vasim.jl:2723):
    # ((internal_name, target), ...) where target is a terminal name,
    # another internal name (chains resolve transitively), or None for
    # ground. The elaborator wires the collapsed internal's conn column to
    # the target's global unknown instead of allocating a fresh one.
    collapses: tuple = ()
    # (overrides: dict) -> DeviceModel specialized for that parameter
    # signature (set on base VA models with collapse candidates; the
    # frontend calls it per instance)
    va_specialize: Optional[Callable] = None
    # Host-setup hoisting for big VA models (PSP/BSIM class): the
    # (params, temperature)-only setup pass evaluated eagerly on CPU once
    # per solve, outside jit. va_setup(p_arrays, dyn) -> [..., n_inst, K]
    # value matrix the residual reads back through p['__setup__'] (the
    # reference's per-instance temp/geometry precompute split, e.g.
    # DIOtempUpdate vs DIOload). `ensure_setup` (mna/assemble.py) injects
    # it at every solver entry.
    va_setup: Optional[Callable] = None

    @property
    def n_terminals(self):
        return len(self.terminals)

    @property
    def n_local(self):
        return len(self.terminals) + len(self.internals)


# ---------------------------------------------------------------------------
# helpers

def _src_value(p, dyn: DynSpec):
    """Independent-source value respecting analysis mode and srcfact.

    DCOP uses the DC value; TRANOP/TRAN evaluate the waveform at dyn.time
    (reference CedarDCOp vs CedarTranOp semantics, `src/mna/dcop.jl:74-98`).
    srcfact scales the source for source-stepping homotopy.
    """
    vdc = p["wave"]["dc"]
    vt = eval_wave(p["wave"]["kind"], p["wave"]["coeffs"], p["wave"]["ncoef"],
                   dyn.time)
    v = jnp.where(dyn.mode == MODE_DCOP, vdc, vt)
    return v * dyn.srcfact


def _z(u):
    return jnp.zeros_like(u)


# ---------------------------------------------------------------------------
# linear two-terminal devices

def _resistor_residual(u, p, dyn):
    g = 1.0 / p["r"]
    i = g * (u[0] - u[1])
    return jnp.stack([i, -i]), _z(u)


def _resistor_noise(u, p, dyn):
    # thermal: S_i = 4kT/R (one source between the two terminals)
    return jnp.stack([4.0 * KB * dyn.temp / p["r"]])


RESISTOR = DeviceModel(
    name="resistor", terminals=("p", "n"), residual=_resistor_residual,
    defaults={"r": 1e3}, noise=_resistor_noise, noise_pairs=((0, 1),), linear=True)


def _capacitor_residual(u, p, dyn):
    q = p["c"] * (u[0] - u[1])
    return _z(u), jnp.stack([q, -q])


CAPACITOR = DeviceModel(
    name="capacitor", terminals=("p", "n"), residual=_capacitor_residual,
    defaults={"c": 1e-12}, linear=True)


def _inductor_residual(u, p, dyn):
    # unknowns: [vp, vn, i]; branch row: vp - vn - L di/dt = 0
    vp, vn, i = u[0], u[1], u[2]
    f = jnp.stack([i, -i, vp - vn])
    q = jnp.stack([0.0 * i, 0.0 * i, -p["l"] * i])
    return f, q


INDUCTOR = DeviceModel(
    name="inductor", terminals=("p", "n"), residual=_inductor_residual,
    internals=(("i", CLASS_I),), defaults={"l": 1e-9}, linear=True)


def _mutual_residual(u, p, dyn):
    # u = [i1, i2]: adds -M*i_other to each inductor's branch (flux) row
    m = p["m"]
    return _z(u), jnp.stack([-m * u[1], -m * u[0]])


MUTUAL = DeviceModel(
    name="mutual", terminals=("isense1", "isense2"),
    residual=_mutual_residual, defaults={"m": 0.0}, linear=True)


# ---------------------------------------------------------------------------
# independent sources

def _vsource_residual(u, p, dyn):
    vp, vn, i = u[0], u[1], u[2]
    v = _src_value(p, dyn)
    return jnp.stack([i, -i, vp - vn - v]), _z(u)


VSOURCE = DeviceModel(
    name="vsource", terminals=("p", "n"), residual=_vsource_residual,
    internals=(("i", CLASS_I),),
    defaults={"acmag": 0.0, "acphase": 0.0}, ac_source=True,
    ac_rhs=((2, 1.0),), linear=True)


def _isource_residual(u, p, dyn):
    i = _src_value(p, dyn)
    return jnp.stack([i, -i]), _z(u)


ISOURCE = DeviceModel(
    name="isource", terminals=("p", "n"), residual=_isource_residual,
    defaults={"acmag": 0.0, "acphase": 0.0}, ac_source=True,
    ac_rhs=((0, -1.0), (1, 1.0)), linear=True)


# ---------------------------------------------------------------------------
# controlled sources (E/G/F/H). Current-controlled variants sense the branch
# current of a V source (SPICE semantics): that current unknown is wired in as
# an extra local connection at elaboration time.

def _vcvs_residual(u, p, dyn):
    vp, vn, vcp, vcn, i = u[0], u[1], u[2], u[3], u[4]
    f = jnp.stack([i, -i, 0 * i, 0 * i, vp - vn - p["gain"] * (vcp - vcn)])
    return f, _z(u)


VCVS = DeviceModel(
    name="vcvs", terminals=("p", "n", "cp", "cn"), residual=_vcvs_residual,
    internals=(("i", CLASS_I),), defaults={"gain": 1.0}, linear=True)


def _vccs_residual(u, p, dyn):
    vp, vn, vcp, vcn = u[0], u[1], u[2], u[3]
    i = p["gm"] * (vcp - vcn)
    return jnp.stack([i, -i, 0 * i, 0 * i]), _z(u)


VCCS = DeviceModel(
    name="vccs", terminals=("p", "n", "cp", "cn"), residual=_vccs_residual,
    defaults={"gm": 1.0}, linear=True)


def _cccs_residual(u, p, dyn):
    # u = [vp, vn, i_sense]; i_sense is the sensed V-source branch current,
    # a read-only coupling: this device adds nothing to the sensed row.
    i = p["gain"] * u[2]
    return jnp.stack([i, -i, 0 * u[2]]), _z(u)


CCCS = DeviceModel(
    name="cccs", terminals=("p", "n", "isense"), residual=_cccs_residual,
    defaults={"gain": 1.0}, linear=True)


def _ccvs_residual(u, p, dyn):
    vp, vn, isense, i = u[0], u[1], u[2], u[3]
    f = jnp.stack([i, -i, 0 * i, vp - vn - p["r"] * isense])
    return f, _z(u)


CCVS = DeviceModel(
    name="ccvs", terminals=("p", "n", "isense"), residual=_ccvs_residual,
    internals=(("i", CLASS_I),), defaults={"r": 1.0}, linear=True)


# ---------------------------------------------------------------------------
# diode (SPICE level-1 junction): forward exponential + breakdown + junction
# and diffusion charge; pnjlim limiting. Series rs (when nonzero) uses the
# 3-unknown variant with an internal node, selected at elaboration.

def _diode_ivq(vd, p, dyn):
    vt = p["n"] * dyn.vt
    is_ = p["is"] * p["area"]
    # forward/reverse exponential with overflow-safe limexp-style clamp
    x = jnp.clip(vd / vt, -80.0, 80.0)
    idf = is_ * (jnp.exp(x) - 1.0)
    # breakdown: exponential onset below -bv (bv<=0 disables)
    bv = p["bv"]
    xb = jnp.clip(-(vd + bv) / dyn.vt, -80.0, 80.0)
    ibr = jnp.where(bv > 0.0, -p["ibv"] * jnp.exp(xb), 0.0)
    i = idf + ibr + dyn.gmin * vd
    # junction charge (standard fc linearization) + diffusion charge
    cj0, vj, m, fc = p["cjo"] * p["area"], p["vj"], p["m"], p["fc"]
    fcv = fc * vj
    qj_below = cj0 * vj / (1.0 - m) * (1.0 - _powx(
        jnp.maximum(1.0 - jnp.minimum(vd, fcv) / vj, 1e-6), 1.0 - m))
    f1 = cj0 * vj / (1.0 - m) * (1.0 - _powx(1.0 - fc, 1.0 - m))
    f2 = _powx(1.0 - fc, -1.0 - m)
    qj_above = f1 + cj0 * f2 * ((1.0 - fc * (1.0 + m)) * (vd - fcv)
                                + 0.5 * m / vj * (vd * vd - fcv * fcv))
    qj = jnp.where(vd < fcv, qj_below, qj_above)
    q = qj + p["tt"] * idf
    return i, q


def _diode_residual(u, p, dyn):
    i, q = _diode_ivq(u[0] - u[1], p, dyn)
    return jnp.stack([i, -i]), jnp.stack([q, -q])


def pnjlim(vnew, vold, vt, vcrit):
    """SPICE3 junction-voltage limiter (reference `devices.jl:1169-1189`)."""
    big = (vnew > vcrit) & (jnp.abs(vnew - vold) > 2.0 * vt)
    arg = 1.0 + (vnew - vold) / vt
    v_pos = jnp.where(arg > 0.0, vold + vt * jnp.log(jnp.maximum(arg, 1e-300)),
                      vcrit)
    v_neg = vt * jnp.log(jnp.maximum(vnew / vt, 1e-300))
    vlim = jnp.where(vold > 0.0, v_pos, v_neg)
    return jnp.where(big, vlim, vnew)


def fetlim(vnew, vold, vto):
    """SPICE3 FET gate-voltage limiter (public DEVfetlim algorithm;
    reference ngspice port at `devices.jl`), branch-free."""
    vtsthi = jnp.abs(2.0 * (vold - vto)) + 2.0
    vtstlo = jnp.abs(vold - vto) + 1.0
    vtox = vto + 3.5
    delv = vnew - vold
    # vold >= vtox ("on")
    on_dec = jnp.where(vnew >= vtox,
                       jnp.where(-delv > vtstlo, vold - vtstlo, vnew),
                       jnp.maximum(vnew, vto + 2.0))
    on_inc = jnp.where(delv >= vtsthi, vold + vtsthi, vnew)
    on = jnp.where(delv <= 0.0, on_dec, on_inc)
    # vto <= vold < vtox ("middle")
    mid = jnp.where(delv <= 0.0, jnp.maximum(vnew, vto - 0.5),
                    jnp.minimum(vnew, vto + 4.0))
    # vold < vto ("off")
    off_dec = jnp.where(-delv > vtsthi, vold - vtsthi, vnew)
    off_inc = jnp.where(vnew <= vto + 0.5,
                        jnp.where(delv > vtstlo, vold + vtstlo, vnew),
                        vto + 0.5)
    off = jnp.where(delv <= 0.0, off_dec, off_inc)
    return jnp.where(vold >= vto,
                     jnp.where(vold >= vtox, on, mid), off)


def limvds(vnew, vold):
    """SPICE3 drain-source voltage limiter (public DEVlimvds algorithm),
    branch-free."""
    hi = jnp.where(vnew > vold, jnp.minimum(vnew, 3.0 * vold + 2.0),
                   jnp.where(vnew < 3.5, jnp.maximum(vnew, 2.0), vnew))
    lo = jnp.where(vnew > vold, jnp.minimum(vnew, 4.0),
                   jnp.maximum(vnew, -0.5))
    return jnp.where(vold >= 3.5, hi, lo)


def _vcrit(p, dyn):
    vt = p["n"] * dyn.vt
    return vt * jnp.log(vt / (math.sqrt(2.0) * jnp.maximum(
        p["is"] * p["area"], 1e-300)))


def _diode_limit(u, u_prev, p, dyn):
    vd = pnjlim(u[0] - u[1], u_prev[0] - u_prev[1], p["n"] * dyn.vt,
                _vcrit(p, dyn))
    # move the limited junction delta onto the anode side (stack, not
    # .at[].set: indexed set lowers to scatter, which Mosaic — the VMEM
    # integrator kernel — cannot lower)
    return jnp.stack([u[1] + vd, u[1]])


def _diode_noise(u, p, dyn):
    # shot noise 2qId (+ flicker kf*Id^af/f handled by the FLICKER kind)
    i, _ = _diode_ivq(u[0] - u[1], p, dyn)
    return jnp.stack([2.0 * QE * jnp.abs(i)])


def _diode_flicker(u, p, dyn):
    i, _ = _diode_ivq(u[0] - u[1], p, dyn)
    return (jnp.stack([p["kf"] * jnp.power(jnp.abs(i), p["af"])]),
            jnp.stack([jnp.ones_like(i)]))


_DIODE_DEFAULTS = {"is": 1e-14, "n": 1.0, "rs": 0.0, "cjo": 0.0, "vj": 1.0,
                   "m": 0.5, "fc": 0.5, "tt": 0.0, "bv": 0.0, "ibv": 1e-3,
                   "area": 1.0, "kf": 0.0, "af": 1.0}

DIODE = DeviceModel(
    name="diode", terminals=("p", "n"), residual=_diode_residual,
    defaults=dict(_DIODE_DEFAULTS), limit=_diode_limit,
    noise=_diode_noise, noise_pairs=((0, 1),), flicker=_diode_flicker)


def _diode_rs_residual(u, p, dyn):
    # u = [vp, vn, vint]; rs between p and internal anode
    vp, vn, vi = u[0], u[1], u[2]
    g = 1.0 / jnp.maximum(p["rs"], 1e-12)
    ir = g * (vp - vi)
    i, q = _diode_ivq(vi - vn, p, dyn)
    f = jnp.stack([ir, -i, i - ir])
    qv = jnp.stack([0.0 * q, -q, q])
    return f, qv


def _diode_rs_limit(u, u_prev, p, dyn):
    vd = pnjlim(u[2] - u[1], u_prev[2] - u_prev[1], p["n"] * dyn.vt,
                _vcrit(p, dyn))
    return jnp.stack([u[0], u[1], u[1] + vd])


def _diode_rs_noise(u, p, dyn):
    i, _ = _diode_ivq(u[2] - u[1], p, dyn)
    return jnp.stack([2.0 * QE * jnp.abs(i),
                      4.0 * KB * dyn.temp / jnp.maximum(p["rs"], 1e-12)])


DIODE_RS = DeviceModel(
    name="diode_rs", terminals=("p", "n"), residual=_diode_rs_residual,
    internals=(("int", CLASS_V),), defaults=dict(_DIODE_DEFAULTS),
    limit=_diode_rs_limit, noise=_diode_rs_noise,
    noise_pairs=((2, 1), (0, 2)))


# ---------------------------------------------------------------------------
# BJT: Ebers-Moll transport formulation with Early effect and junction +
# diffusion charge (a Gummel-Poon subset: bf/br/is/vaf/var/ikf currents,
# cje/cjc depletion caps, tf/tr diffusion charge). Terminals c, b, e.

def _junction_q(v, cj0, vj, m, fc):
    fcv = fc * vj
    q_below = cj0 * vj / (1.0 - m) * (1.0 - _powx(
        jnp.maximum(1.0 - jnp.minimum(v, fcv) / vj, 1e-6), 1.0 - m))
    f1 = cj0 * vj / (1.0 - m) * (1.0 - _powx(1.0 - fc, 1.0 - m))
    f2 = _powx(1.0 - fc, -1.0 - m)
    q_above = f1 + cj0 * f2 * ((1.0 - fc * (1.0 + m)) * (v - fcv)
                               + 0.5 * m / vj * (v * v - fcv * fcv))
    return jnp.where(v < fcv, q_below, q_above)


def _bjt_currents(vbe, vbc, p, dyn):
    ty = p["type"]
    vt = dyn.vt
    is_ = p["is"] * p["area"]
    ex_be = jnp.exp(jnp.clip(vbe / (p["nf"] * vt), -80.0, 80.0))
    ex_bc = jnp.exp(jnp.clip(vbc / (p["nr"] * vt), -80.0, 80.0))
    icc = is_ * (ex_be - 1.0)
    iec = is_ * (ex_bc - 1.0)
    # Early + Webster (high-injection) base charge factor
    qb_inv = (1.0 - vbc / p["vaf"] - vbe / p["var"])
    qb = 1.0 / jnp.maximum(qb_inv, 0.1)
    it = (icc - iec) / qb
    ib = icc / p["bf"] + iec / p["br"]
    ic = it - iec / p["br"]
    ie = -(it + icc / p["bf"])
    return ic, ib, ie, icc, iec


def _bjt_residual(u, p, dyn):
    ty = p["type"]   # +1 npn, -1 pnp
    vc, vb, ve = ty * u[0], ty * u[1], ty * u[2]
    vbe = vb - ve
    vbc = vb - vc
    ic, ib, ie, icc, iec = _bjt_currents(vbe, vbc, p, dyn)
    gm = dyn.gmin
    f = jnp.stack([ty * (ic + gm * (vc - vb)),
                   ty * (ib - gm * (vc - vb) - gm * (ve - vb)),
                   ty * (ie + gm * (ve - vb))])
    vt = dyn.vt
    qbe = (_junction_q(vbe, p["cje"] * p["area"], p["vje"], p["mje"],
                       p["fc"]) + p["tf"] * icc)
    qbc = (_junction_q(vbc, p["cjc"] * p["area"], p["vjc"], p["mjc"],
                       p["fc"]) + p["tr"] * iec)
    q = jnp.stack([-ty * qbc, ty * (qbe + qbc), -ty * qbe])
    return f, q


def _bjt_limit(u, u_prev, p, dyn):
    ty = p["type"]
    vt = dyn.vt
    is_ = p["is"] * p["area"]
    vcrit = vt * jnp.log(vt / (math.sqrt(2.0) * jnp.maximum(is_, 1e-300)))
    vbe = pnjlim(ty * (u[1] - u[2]), ty * (u_prev[1] - u_prev[2]), vt, vcrit)
    vbc = pnjlim(ty * (u[1] - u[0]), ty * (u_prev[1] - u_prev[0]), vt, vcrit)
    # keep base voltage, move emitter/collector to honor limited junctions
    return jnp.stack([u[1] - ty * vbc, u[1], u[1] - ty * vbe])


def _bjt_noise(u, p, dyn):
    ty = p["type"]
    vc, vb, ve = ty * u[0], ty * u[1], ty * u[2]
    ic, ib, _, _, _ = _bjt_currents(vb - ve, vb - vc, p, dyn)
    return jnp.stack([2.0 * QE * jnp.abs(ic), 2.0 * QE * jnp.abs(ib)])


BJT = DeviceModel(
    name="bjt", terminals=("c", "b", "e"), residual=_bjt_residual,
    defaults={"type": 1.0, "is": 1e-16, "bf": 100.0, "br": 1.0,
              "nf": 1.0, "nr": 1.0, "vaf": 1e12, "var": 1e12,
              "cje": 0.0, "vje": 0.75, "mje": 0.33,
              "cjc": 0.0, "vjc": 0.75, "mjc": 0.33,
              "tf": 0.0, "tr": 0.0, "fc": 0.5, "area": 1.0},
    limit=_bjt_limit, noise=_bjt_noise, noise_pairs=((0, 2), (1, 2)))


# ---------------------------------------------------------------------------
# MOSFET level 1 (square law with channel-length modulation), matching the
# reference's SimpleMOSFET (`src/mna/devices.jl` SimpleMOSFET) but 4-terminal
# with fixed overlap capacitances for transient realism.

def _mos1_ids(vgs, vds, p, vth):
    beta = p["kp"] * p["w"] / p["l"]
    vov = vgs - vth
    clm = 1.0 + p["lambda"] * vds
    i_sat = 0.5 * beta * vov * vov * clm
    i_tri = beta * (vov - 0.5 * vds) * vds * clm
    i_on = jnp.where(vds > vov, i_sat, i_tri)
    return jnp.where(vov <= 0.0, 0.0, i_on)


def _powx(x, p):
    """x**p for strictly-positive x via exp(p*log(x)) — Mosaic (the VMEM
    integrator kernel) has no lowering for math.powf, and every call site
    already guards the base positive."""
    return jnp.exp(p * jnp.log(jnp.maximum(x, 1e-30)))


def _limexp_dev(x):
    """Overflow-safe exp with linear continuation above x=80."""
    xc = jnp.minimum(x, 80.0)
    return jnp.exp(xc) * (1.0 + jnp.maximum(x - 80.0, 0.0))


def _mos1_residual(u, p, dyn):
    # u = [vd, vg, vs, vb]; `type` is +1 NMOS / -1 PMOS
    ty = p["type"]
    vd, vg, vs, vb = ty * u[0], ty * u[1], ty * u[2], ty * u[3]
    # source/drain swap for reverse operation (square law is symmetric)
    fwd = vd >= vs
    vgs = jnp.where(fwd, vg - vs, vg - vd)
    vds = jnp.abs(vd - vs)
    # SPICE convention: vto is negative for PMOS; in the sign-flipped
    # (primed) frame the effective threshold is ty*vto
    # sign via arithmetic, not where(b, 1.0, -1.0): a select between two
    # python-float literals SIGABRTs the Mosaic (Pallas TPU) compiler, and
    # this residual also runs inside the VMEM integrator kernel
    ids = _mos1_ids(vgs, vds, p, ty * p["vth"]) \
        * (2.0 * fwd - 1.0) * ty
    ids = ids + dyn.gmin * (u[0] - u[2])
    # bulk junction diodes (SPICE level-1 drain-bulk / source-bulk,
    # ngspice MOS1load): the exponential clamp that keeps internal nodes
    # within a diode drop of the rails — without them nothing in the
    # square-law model bounds a floating drain and Newton walks off.
    # limexp (linear continuation above ~2 V) instead of pnjlim state:
    # bounded Jacobian without limiter bookkeeping.
    vt = dyn.vt
    isat = p["is"]
    ibd = isat * (_limexp_dev((vb - vd) / vt) - 1.0) + dyn.gmin * (vb - vd)
    ibs = isat * (_limexp_dev((vb - vs) / vt) - 1.0) + dyn.gmin * (vb - vs)
    f = jnp.stack([ids - ty * ibd, 0.0 * ids, -ids - ty * ibs,
                   ty * (ibd + ibs)])
    # fixed gate caps (cgs, cgd, cgb) plus junction caps to bulk (cbd,
    # cbs) — the latter keep every drain/source node differential so
    # digital latches never present purely-algebraic bistable nodes
    qgs = p["cgs"] * (u[1] - u[2])
    qgd = p["cgd"] * (u[1] - u[0])
    qgb = p["cgb"] * (u[1] - u[3])
    qbd = p["cbd"] * (u[3] - u[0])
    qbs = p["cbs"] * (u[3] - u[2])
    q = jnp.stack([-qgd - qbd, qgs + qgd + qgb, -qgs - qbs,
                   -qgb + qbd + qbs])
    return f, q


def _mos1_limit(u, u_prev, p, dyn):
    """SPICE MOS Newton limiting: fetlim on the (oriented) gate overdrive
    and limvds on the drain-source step (ngspice MOS1load's
    DEVfetlim/DEVlimvds calls). Without this, a saturated square-law
    device (gds == 0 at lambda=0) lets Newton launch series-stack internal
    nodes to huge voltages — the c6288 NOR stacks are the canonical case."""
    ty = p["type"]
    vd, vg, vs, vb = ty * u[0], ty * u[1], ty * u[2], ty * u[3]
    vdp, vgp, vsp = ty * u_prev[0], ty * u_prev[1], ty * u_prev[2]
    vto = ty * p["vth"]
    fwd = vd >= vs
    src = jnp.where(fwd, vs, vd)
    src_p = jnp.where(fwd, vsp, vdp)
    vgs_l = fetlim(vg - src, vgp - src_p, vto)
    vds_l = limvds(jnp.abs(vd - vs), jnp.abs(vdp - vsp))
    vg2 = src + vgs_l
    vdrain2 = src + vds_l          # oriented drain terminal
    vd2 = jnp.where(fwd, vdrain2, vd)
    vs2 = jnp.where(fwd, vs, vdrain2)
    # bulk-junction pnjlim (ngspice limits vbs/vbd last, and they win on
    # conflicts): prevents evaluating the clamp diodes volts into forward
    # bias, where exp() currents stall Newton at ~vt progress per
    # iteration
    vbp = ty * u_prev[3]
    vt = dyn.vt
    vcrit = vt * jnp.log(vt / (1.41421356 * p["is"]))
    vbd_l = pnjlim(vb - vd2, vbp - ty * u_prev[0], vt, vcrit)
    vbs_l = pnjlim(vb - vs2, vbp - ty * u_prev[2], vt, vcrit)
    vd3 = vb - vbd_l
    vs3 = vb - vbs_l
    return jnp.stack([ty * vd3, ty * vg2, ty * vs3, ty * vb])


def _mos1_noise(u, p, dyn):
    # channel thermal noise 8/3 kT gm (reference `devices.jl:1718-1732`)
    ty = p["type"]
    vd, vg, vs = ty * u[0], ty * u[1], ty * u[2]
    fwd = vd >= vs
    vgs = jnp.where(fwd, vg - vs, vg - vd)
    vov = jnp.maximum(vgs - ty * p["vth"], 0.0)
    gm = p["kp"] * p["w"] / p["l"] * vov
    return jnp.stack([8.0 / 3.0 * KB * dyn.temp * gm])


def _mos1_opvars(u, p, dyn):
    ty = p["type"]
    vd, vg, vs = ty * u[0], ty * u[1], ty * u[2]
    fwd = vd >= vs
    vgs = jnp.where(fwd, vg - vs, vg - vd)
    vds = jnp.abs(vd - vs)
    vth = ty * p["vth"]
    vov = jnp.maximum(vgs - vth, 0.0)
    beta = p["kp"] * p["w"] / p["l"]
    ids = _mos1_ids(vgs, vds, p, vth)
    gm = jnp.where(vds > vov, beta * vov, beta * vds)
    gds = jnp.where(vds > vov,
                    0.5 * beta * vov * vov * p["lambda"],
                    beta * (vov - vds))
    return {"ids": ids, "vgs": vgs, "vds": vds, "vth": vth, "gm": gm,
            "gds": gds, "vdsat": vov}


MOSFET1 = DeviceModel(
    name="mos1", terminals=("d", "g", "s", "b"), residual=_mos1_residual,
    defaults={"type": 1.0, "vth": 0.7, "kp": 110e-6, "lambda": 0.0,
              "w": 1e-6, "l": 1e-6, "cgs": 0.0, "cgd": 0.0, "cgb": 0.0,
              "cbd": 0.0, "cbs": 0.0, "is": 1e-14},
    limit=_mos1_limit,
    noise=_mos1_noise, noise_pairs=((0, 2),), opvars=_mos1_opvars)


BUILTINS = {m.name: m for m in
            (RESISTOR, CAPACITOR, INDUCTOR, VSOURCE, ISOURCE, VCVS, VCCS,
             CCCS, CCVS, DIODE, DIODE_RS, BJT, MOSFET1, MUTUAL)}
