"""AC small-signal analysis.

Linearize at the DC operating point (G = ∂f/∂x, C = ∂q/∂x), then solve
(G + jωC) x = b_ac per frequency — vmapped over the frequency axis (the
reference loops frequencies serially, `src/ac.jl:190-220`; on TPU the whole
sweep is one batched dense solve). TPU has no complex LU, so each solve uses
the real 2Nx2N embedding from `ops/linalg.py`.

Reference: `src/ac.jl` (ac!, ACSol, magnitude_db/phase_deg, acdec).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DTYPE, solve_method_for_backend
from ..mna.assemble import (make_ac_rhs, make_assembler, pad_state)
from ..mna.spec import MODE_AC, MODE_DCOP
from ..mna.structure import CompiledCircuit
from ..ops.linalg import solve as dense_solve
from .dc import dc


class ACSolution:
    """Complex phasors per frequency: sol['out'] -> complex [n_freq]."""

    def __init__(self, cc, freqs, x_re, x_im, op, converged=True):
        self.cc = cc
        self.freqs = np.asarray(freqs)
        self.x_re = x_re
        self.x_im = x_im
        self.op = op
        self.converged = converged

    def __getitem__(self, name):
        i = self.cc.index_of(str(name))
        return np.asarray(self.x_re[..., i]) + 1j * np.asarray(
            self.x_im[..., i])

    def v(self, p, n=None):
        vp = self[p]
        return vp if n is None else vp - self[n]

    def magnitude_db(self, name):
        return 20.0 * np.log10(np.maximum(np.abs(self[name]), 1e-300))

    def phase_deg(self, name):
        return np.angle(self[name], deg=True)

    def __repr__(self):
        return (f"ACSolution({self.cc.title!r}, {len(self.freqs)} freqs "
                f"{self.freqs.min():.3g}..{self.freqs.max():.3g} Hz)")


def acdec(points_per_decade: int, fstart: float, fstop: float) -> np.ndarray:
    """SPICE-style logarithmic frequency grid (reference `ac.jl:402-407`)."""
    ndec = np.log10(fstop / fstart)
    n = int(np.ceil(points_per_decade * ndec)) + 1
    return np.logspace(np.log10(fstart), np.log10(fstop), n)


def make_ac_sweep(cc: CompiledCircuit, method: str | None = None):
    """Build ac_sweep(x_op, params, dyn, omegas) -> (x_re, x_im) with shape
    [n_freq, n].

    Transport delays (`absdelay`) enter the small-signal system as
    Y(jω) = S · diag(e^{-jωτ}) · P, where S = ∂f/∂dly and P = ∂probe/∂x
    at the operating point (reference threads the DDE history through the
    AC rebuild; here the phase factor is exact per frequency)."""
    from ..mna.assemble import make_delay_meta
    assemble = make_assembler(cc)
    b_ac_fn = make_ac_rhs(cc)
    dmeta = make_delay_meta(cc)
    method = method or solve_method_for_backend()

    def ac_sweep(x_op, params, dyn, omegas):
        xp = pad_state(x_op)
        lim = assemble.init_lim(xp)
        n = cc.n
        if dmeta is None:
            _, _, G, C, _ = assemble(xp, lim, params, dyn)
            SP = None
        else:
            vals, taus = dmeta.probe(xp, params, dyn)
            # hold the delayed inputs fixed for the base linearization
            _, _, G, C, _ = assemble(xp, lim, params, dyn, vals)
            S = jax.jacfwd(
                lambda d: assemble(xp, lim, params, dyn, d)[0])(vals)
            P = jax.jacfwd(
                lambda x: dmeta.probe(pad_state(x), params, dyn)[0])(x_op)
            SP = (S, P, taus)
        br, bi = b_ac_fn(params)

        def one(w):
            Gw, Cw = G, C
            if SP is not None:
                S, P, taus = SP
                # S diag(e^{-jw tau}) P: real -> G, imag -> w*C slot
                cosr = S * jnp.cos(w * taus)[None, :]
                sinr = S * jnp.sin(w * taus)[None, :]
                Gw = G + cosr @ P
                Cw = C - (sinr @ P) / jnp.maximum(w, 1e-300)
            return dense_solve(
                jnp.block([[Gw, -w * Cw], [w * Cw, Gw]]),
                jnp.concatenate([br, bi]), method=method)

        xs = jax.vmap(one)(omegas)
        return xs[:, :n], xs[:, n:]

    return ac_sweep


def ac(cc: CompiledCircuit, freqs, params=None, *, op_x=None) -> ACSolution:
    """AC analysis over the given frequency grid [Hz]."""
    if params is None:
        params = cc.params0()
    from ..mna.assemble import ensure_setup
    params = ensure_setup(cc, params)
    freqs = np.atleast_1d(np.asarray(freqs, np.float64))
    op = None
    if op_x is None:
        op = dc(cc, params)
        op_x = op.x
    key = ("ac_sweep",)
    if key not in cc.cache:
        cc.cache[key] = cc.jit(make_ac_sweep(cc))
    dyn = cc.spec.dyn(mode=MODE_AC)
    omegas = jnp.asarray(2.0 * np.pi * freqs, DTYPE)
    x_re, x_im = cc.cache[key](jnp.asarray(op_x, DTYPE), params, dyn, omegas)
    return ACSolution(cc, freqs, x_re, x_im, op,
                      converged=(op.converged if op is not None else True))


class DescriptorSISO:
    """Single-output descriptor state-space (s E - A) x = B u, y = C x:
    the control-systems interop surface (reference `subsystem`,
    `src/ac.jl:374-388`, which returns a DescriptorSystems dss the user
    feeds to bode/ss). Matrices are plain numpy — ready for
    python-control / scipy.signal style tooling."""

    def __init__(self, A, E, B, C, D, name):
        self.A, self.E, self.B, self.C, self.D = A, E, B, C, D
        self.name = name

    def freqresp(self, freqs):
        """Complex response y(jω) = C (jωE − A)⁻¹ B + D per frequency
        [Hz] (the `freqresp` the reference gets from DescriptorSystems,
        `ac.jl:190-220`)."""
        freqs = np.atleast_1d(np.asarray(freqs, np.float64))
        out = np.empty(len(freqs), np.complex128)
        for k, f in enumerate(freqs):
            s = 2j * np.pi * f
            x = np.linalg.solve(s * self.E - self.A, self.B)
            out[k] = (self.C @ x + self.D)[0, 0]
        return out

    def __repr__(self):
        return (f"DescriptorSISO(output={self.name!r}, "
                f"n={self.A.shape[0]})")


def subsystem(cc: CompiledCircuit, name, params=None, *,
              op_x=None) -> DescriptorSISO:
    """SISO descriptor export: A = −G, E = C (charge Jacobian), B = the
    deck's AC excitation vector, C selecting node/branch `name`, D = 0
    (reference `subsystem`, `src/ac.jl:374-388`)."""
    if params is None:
        params = cc.params0()
    from ..mna.assemble import ensure_setup, make_ac_rhs, make_assembler
    params = ensure_setup(cc, params)
    if op_x is None:
        op_x = dc(cc, params).x
    key = ("ac_subsystem_mats",)
    if key not in cc.cache:
        assemble = make_assembler(cc)
        b_ac_fn = make_ac_rhs(cc)

        def mats(x, p, dyn):
            xp = pad_state(x)
            _, _, G, Cm, _ = assemble(xp, assemble.init_lim(xp), p, dyn)
            br, bi = b_ac_fn(p)
            return G, Cm, br, bi

        cc.cache[key] = cc.jit(mats)
    dyn = cc.spec.dyn(mode=MODE_AC)
    G, Cm, br, bi = cc.cache[key](jnp.asarray(op_x, DTYPE), params, dyn)
    n = cc.n
    i = cc.index_of(str(name))
    C_row = np.zeros((1, n))
    C_row[0, i] = 1.0
    B = (np.asarray(br) + 1j * np.asarray(bi)).reshape(n, 1)
    if np.allclose(B.imag, 0.0):
        B = B.real
    return DescriptorSISO(-np.asarray(G), np.asarray(Cm), B, C_row,
                          np.zeros((1, 1)), str(name))
