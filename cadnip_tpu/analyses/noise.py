"""Small-signal noise analysis via adjoint solves.

At the DC operating point, for each frequency ONE adjoint solve
    (G + jωC)^T x_adj = e_out
gives every noise source's transfer to the output at O(1) cost each
(H_k = x_adj[p_k] - x_adj[n_k]); the output PSD is the incoherent sum
S_out = Σ|H_k|² S_k(f), with optional input referral through the same adjoint
(reference `src/noise.jl:118-184`). The frequency axis is vmapped.

Device noise sources come from each model's `noise` (white PSD) and `flicker`
(num/f^exp) channels between local node pairs — mirroring noise registration
inside reference stamps (`src/mna/devices.jl:503`, `:1396-1443`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DTYPE, solve_method_for_backend
from ..mna.assemble import make_assembler, pad_state
from ..mna.spec import MODE_AC
from ..mna.structure import CompiledCircuit
from ..ops.linalg import solve as dense_solve
from .dc import dc


class NoiseSolution:
    """onoise_psd [nf] in V^2/Hz (or A^2/Hz), per-device contributions,
    optional input-referred PSD."""

    def __init__(self, cc, freqs, onoise_psd, contributions, inoise_psd,
                 converged=True):
        self.cc = cc
        self.freqs = np.asarray(freqs)
        self.onoise_psd = np.asarray(onoise_psd)
        self.contributions = {k: np.asarray(v)
                              for k, v in contributions.items()}
        self.inoise_psd = (None if inoise_psd is None
                           else np.asarray(inoise_psd))
        self.converged = converged

    def total_noise(self, fmin=None, fmax=None):
        """Band-integrated RMS output noise (trapezoidal, reference
        `noise.jl:265-276`)."""
        f, s = self.freqs, self.onoise_psd
        m = np.ones_like(f, bool)
        if fmin is not None:
            m &= f >= fmin
        if fmax is not None:
            m &= f <= fmax
        return float(np.sqrt(np.trapezoid(s[m], f[m])))

    def __repr__(self):
        return (f"NoiseSolution({self.cc.title!r}, {len(self.freqs)} freqs, "
                f"{len(self.contributions)} sources)")


def _out_selector(cc: CompiledCircuit, out):
    e = np.zeros(cc.n, np.float64)
    if isinstance(out, (tuple, list)):
        e[cc.index_of(out[0])] += 1.0
        if len(out) > 1 and str(out[1]) not in ("0", "gnd", "GND"):
            e[cc.index_of(out[1])] -= 1.0
    else:
        e[cc.index_of(out)] = 1.0
    return e


def make_noise_sweep(cc: CompiledCircuit, method: str | None = None):
    assemble = make_assembler(cc)
    method = method or solve_method_for_backend()
    n = cc.n

    # host-side noise source table
    src_groups = []   # (gi, model, conn, labels)
    labels = []
    for gi, g in enumerate(cc.groups):
        if g.model.noise is None:
            continue
        rows_p, rows_n = [], []
        for lp, ln in g.model.noise_pairs:
            rows_p.append(g.conn[:, lp])
            rows_n.append(g.conn[:, ln])
        rp = jnp.asarray(np.stack(rows_p, 1), jnp.int32)   # [n_inst, n_pairs]
        rn = jnp.asarray(np.stack(rows_n, 1), jnp.int32)
        src_groups.append((gi, g.model, jnp.asarray(g.conn, jnp.int32),
                           rp, rn))
        labels.extend(g.names)

    # static: concatenated source row tables and per-group sizes
    sizes = [(gi, g_conn.shape[0], rp.shape[1])
             for gi, _, g_conn, rp, _ in src_groups]
    if src_groups:
        rp = jnp.concatenate([rp.reshape(-1) for _, _, _, rp, _ in
                              src_groups])
        rn = jnp.concatenate([rn.reshape(-1) for _, _, _, _, rn in
                              src_groups])
    else:
        rp = jnp.zeros(0, jnp.int32)
        rn = jnp.zeros(0, jnp.int32)

    def sweep(x_op, params, dyn, omegas, e_out, b_in_r, b_in_i, want_inoise):
        xp = pad_state(x_op)
        lim = assemble.init_lim(xp)
        _, _, G, C, _ = assemble(xp, lim, params, dyn)

        # white + flicker PSD coefficients per source (evaluated at the OP)
        whites, fl_nums, fl_exps = [], [], []
        for gi, model, conn, _, _ in src_groups:
            u = xp[conn]
            p = params[gi]
            w = jax.vmap(model.noise, in_axes=(0, 0, None))(u, p, dyn)
            whites.append(w.reshape(-1))
            if model.flicker is not None:
                num, ex = jax.vmap(model.flicker, in_axes=(0, 0, None))(
                    u, p, dyn)
            else:
                num = jnp.zeros_like(w)
                ex = jnp.ones_like(w)
            fl_nums.append(num.reshape(-1))
            fl_exps.append(ex.reshape(-1))
        white = jnp.concatenate(whites) if whites else jnp.zeros(0, DTYPE)
        fl_num = jnp.concatenate(fl_nums) if whites else jnp.zeros(0, DTYPE)
        fl_exp = jnp.concatenate(fl_exps) if whites else jnp.ones(0, DTYPE)

        def one(w_omega):
            f_hz = w_omega / (2.0 * jnp.pi)
            # adjoint: (G + jwC)^T z = e_out in real 2N form
            A = jnp.block([[G.T, -w_omega * C.T], [w_omega * C.T, G.T]])
            z = dense_solve(A, jnp.concatenate([e_out, jnp.zeros(n, DTYPE)]),
                            method=method)
            zr = jnp.concatenate([z[:n], jnp.zeros(1, DTYPE)])
            zi = jnp.concatenate([z[n:], jnp.zeros(1, DTYPE)])
            hr = zr[rp] - zr[rn]
            hi = zi[rp] - zi[rn]
            h2 = hr * hr + hi * hi
            s_k = white + fl_num / jnp.power(jnp.maximum(f_hz, 1e-300),
                                             fl_exp)
            contrib = h2 * s_k
            onoise = jnp.sum(contrib)
            # input referral through the same adjoint: H_in = b_in . z
            hinr = jnp.dot(b_in_r, z[:n]) - jnp.dot(b_in_i, z[n:])
            hini = jnp.dot(b_in_r, z[n:]) + jnp.dot(b_in_i, z[:n])
            h_in2 = jnp.maximum(hinr * hinr + hini * hini, 1e-300)
            inoise = jnp.where(want_inoise, onoise / h_in2, 0.0)
            return onoise, inoise, contrib

        onoise, inoise, contrib = jax.vmap(one)(omegas)
        return onoise, inoise, contrib

    return sweep, labels, sizes


def noise(cc: CompiledCircuit, out, freqs, params=None, *, input=None,
          op_x=None) -> NoiseSolution:
    """Noise analysis: output PSD at `out` (node name or (p, n) pair) over
    `freqs`; if `input` names a V/I source, also input-referred PSD."""
    if params is None:
        params = cc.params0()
    from ..mna.assemble import ensure_setup
    params = ensure_setup(cc, params)
    freqs = np.atleast_1d(np.asarray(freqs, np.float64))
    op = None
    if op_x is None:
        op = dc(cc, params)
        op_x = op.x

    key = ("noise_sweep",)
    if key not in cc.cache:
        sweep, labels, sizes = make_noise_sweep(cc)
        cc.cache[key] = (cc.jit(sweep, static_argnames=("want_inoise",)),
                         labels, sizes)
    sweep, labels, sizes = cc.cache[key]

    e_out = jnp.asarray(_out_selector(cc, out), DTYPE)
    # unit-amplitude input excitation vector (like b_ac with acmag=1)
    b_in_r = np.zeros(cc.n, np.float64)
    b_in_i = np.zeros(cc.n, np.float64)
    if input is not None:
        gi, slot = cc.inst_group[input]
        g = cc.groups[gi]
        if not g.model.ac_rhs:
            raise ValueError(f"input {input!r} is not an independent source")
        for local, sign in g.model.ac_rhs:
            b_in_r[g.conn[slot, local]] += sign
    dyn = cc.spec.dyn(mode=MODE_AC)
    omegas = jnp.asarray(2 * np.pi * freqs, DTYPE)
    onoise, inoise, contrib = sweep(
        jnp.asarray(op_x, DTYPE), params, dyn, omegas, e_out,
        jnp.asarray(b_in_r, DTYPE), jnp.asarray(b_in_i, DTYPE),
        want_inoise=input is not None)

    # split contributions back to named devices (summed over pairs)
    contributions = {}
    col = 0
    for (gi, n_inst, n_pairs) in sizes:
        g = cc.groups[gi]
        block = contrib[:, col:col + n_inst * n_pairs].reshape(
            len(freqs), n_inst, n_pairs)
        for si, iname in enumerate(g.names):
            contributions[iname] = block[:, si, :].sum(-1)
        col += n_inst * n_pairs
    return NoiseSolution(cc, freqs, onoise,
                         contributions,
                         inoise if input is not None else None,
                         converged=(op.converged if op is not None else True))
