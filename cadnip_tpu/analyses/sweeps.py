"""Parameter sweeps and Monte Carlo as vmapped solves.

The reference iterates `alter`ed circuits serially with warm-start
continuation (`src/sweeps.jl:387-532`); here a sweep is a *batched parameter
pytree* and the whole DC/transient solve is vmapped over it — one XLA program
whose batch dimension maps onto TPU vector lanes (and shards over chips via
`parallel.mesh`). This removes the reference's per-point recompile
(SURVEY §3.4) entirely.

Sweep composition mirrors the reference API: Sweep (1-D), ProductSweep
(cartesian), TandemSweep (zip), SerialSweep (concat).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DTYPE
from ..mna.newton import make_dc_solver
from ..mna.spec import MODE_DCOP, MODE_TRANOP
from ..mna.structure import CompiledCircuit
from .dc import DCSolution


@dataclasses.dataclass(frozen=True)
class Sweep:
    """One swept parameter: Sweep('r1.r', values)."""
    name: str
    values: tuple

    def table(self):
        return {self.name: np.asarray(self.values, np.float64)}


def _merge_tables(tables, mode):
    if mode == "product":
        names, grids = [], []
        for t in tables:
            for k, v in t.items():
                names.append(k)
                grids.append(v)
        mesh = np.meshgrid(*grids, indexing="ij")
        return {k: m.reshape(-1) for k, m in zip(names, mesh)}
    if mode == "tandem":
        out = {}
        length = None
        for t in tables:
            for k, v in t.items():
                if length is None:
                    length = len(v)
                if len(v) != length:
                    raise ValueError("TandemSweep axes must share length")
                out[k] = v
        return out
    if mode == "serial":
        keys = set()
        for t in tables:
            keys |= set(t)
        out = {k: [] for k in keys}
        for t in tables:
            length = len(next(iter(t.values())))
            for k in keys:
                if k in t:
                    out[k].append(np.asarray(t[k]))
                else:
                    out[k].append(np.full(length, np.nan))
        return {k: np.concatenate(v) for k, v in out.items()}
    raise ValueError(mode)


@dataclasses.dataclass(frozen=True)
class ProductSweep:
    sweeps: tuple

    def __init__(self, *sweeps):
        object.__setattr__(self, "sweeps", tuple(sweeps))

    def table(self):
        return _merge_tables([s.table() for s in self.sweeps], "product")


@dataclasses.dataclass(frozen=True)
class TandemSweep:
    sweeps: tuple

    def __init__(self, *sweeps):
        object.__setattr__(self, "sweeps", tuple(sweeps))

    def table(self):
        return _merge_tables([s.table() for s in self.sweeps], "tandem")


@dataclasses.dataclass(frozen=True)
class SerialSweep:
    sweeps: tuple

    def __init__(self, *sweeps):
        object.__setattr__(self, "sweeps", tuple(sweeps))

    def table(self):
        return _merge_tables([s.table() for s in self.sweeps], "serial")


def batch_params(cc: CompiledCircuit, table: dict, params=None):
    """Turn {name: values[B]} into (batched params pytree, vmap in_axes).

    NaN entries (from SerialSweep) keep the base value for that point.
    """
    if params is None:
        params = cc.params0()
    params = [dict(d) for d in params]
    axes = []
    for d in params:
        a = {}
        for k, v in d.items():
            a[k] = {kk: None for kk in v} if isinstance(v, dict) else None
        axes.append(a)
    batch = None
    for name, vals in table.items():
        vals = np.asarray(vals, np.float64)
        if batch is None:
            batch = len(vals)
        elif len(vals) != batch:
            raise ValueError("all sweep axes must have equal length")
        gi, pn, slot = cc.param_slots[name]
        holder, ax_holder = params[gi], axes[gi]
        if "." in pn:
            head, pn = pn.split(".", 1)
            holder[head] = dict(holder[head])
            holder, ax_holder = holder[head], ax_holder[head]
        arr = holder[pn]
        base = float(arr[slot] if arr.ndim == 1 else arr[0, slot])
        if arr.ndim == 1:
            arr = jnp.broadcast_to(arr, (batch,) + arr.shape)
        vals = np.where(np.isnan(vals), base, vals)
        holder[pn] = arr.at[:, slot].set(jnp.asarray(vals, DTYPE))
        ax_holder[pn] = 0
    # host-setup injection AFTER batching so swept VA parameters re-enter
    # the hoisted setup pass (broadcast: [batch, n_inst, K] when any group
    # param is batched, else [n_inst, K] shared across lanes)
    from ..mna.assemble import ensure_setup
    params = ensure_setup(cc, params)
    for gi in range(len(params)):
        if "__setup__" in params[gi]:
            axes[gi]["__setup__"] = (
                0 if params[gi]["__setup__"].ndim == 3 else None)
    return params, axes


def dcsweep(cc: CompiledCircuit, sweep, params=None, *, mode=MODE_DCOP,
            x0=None) -> DCSolution:
    """Vmapped DC sweep: returns a DCSolution whose arrays carry a leading
    sweep axis. `sweep` is a Sweep/Product/Tandem/SerialSweep or a
    {name: values} table."""
    table = sweep.table() if hasattr(sweep, "table") else {
        k: np.asarray(v) for k, v in sweep.items()}
    bparams, axes = batch_params(cc, table, params)
    key = ("dcsweep", tuple(sorted(table)))
    if key not in cc.cache:
        solver = make_dc_solver(cc)
        cc.cache[key] = cc.jit(jax.vmap(solver, in_axes=(None, axes, None)))
    if x0 is None:
        x0 = jnp.zeros(cc.n, DTYPE)
    dyn = cc.spec.dyn(mode=mode)
    r = cc.cache[key](x0, bparams, dyn)
    conv = np.asarray(r.converged)
    if conv.any() and not conv.all():
        # per-lane continuation rescue (reference warm-start sweeps,
        # `src/sweeps.jl:492-532`, in batch form): rerun the failed
        # lanes seeded from their nearest CONVERGED neighbor's solution
        # — one extra vmapped solve, every lane at once (failed lanes
        # keep their own seed only if no lane converged at all)
        lanes = np.arange(conv.shape[0])
        good = lanes[conv]
        nearest = good[np.argmin(np.abs(lanes[:, None] - good[None, :]),
                                 axis=1)]
        x_seed = jnp.asarray(np.asarray(r.x)[nearest], DTYPE)
        key2 = ("dcsweep_rescue", tuple(sorted(table)))
        if key2 not in cc.cache:
            solver = make_dc_solver(cc)
            cc.cache[key2] = cc.jit(
                jax.vmap(solver, in_axes=(0, axes, None)))
        r2 = cc.cache[key2](x_seed, bparams, dyn)
        took = (~jnp.asarray(conv)) & r2.converged
        r = r._replace(
            x=jnp.where(took[:, None], r2.x, r.x),
            converged=r.converged | r2.converged,
            iters=r.iters + jnp.where(took, r2.iters, 0),
            resnorm=jnp.where(took, r2.resnorm, r.resnorm))
    sol = DCSolution(cc, r.x, r.converged, r.iters, r.resnorm)
    sol.table = table
    return sol


def transweep(cc: CompiledCircuit, sweep, tspan, params=None, *,
              chunk: int | None = None, **tran_kw):
    """Vmapped transient sweep (corners / Monte Carlo): every sweep point
    integrates with its own adaptive steps inside one vmapped while_loop.

    chunk: split very wide sweeps into sequential vmapped chunks of this
    size (same compiled program reused per chunk) — bounds device memory
    and keeps each launch within TPU limits. The last chunk is padded by
    repeating the final point."""
    from .tran import tran

    table = sweep.table() if hasattr(sweep, "table") else {
        k: np.asarray(v) for k, v in sweep.items()}
    n_pts = len(next(iter(table.values())))
    if chunk is not None and n_pts > chunk:
        import sys as _sys
        import time as _time
        sols = []
        for s0 in range(0, n_pts, chunk):
            sub = {k: v[s0:s0 + chunk] for k, v in table.items()}
            pad = chunk - len(next(iter(sub.values())))
            if pad:
                sub = {k: np.concatenate([v, np.repeat(v[-1:], pad,
                                                       axis=0)])
                       for k, v in sub.items()}
            _tc = _time.perf_counter()
            sols.append(transweep(cc, sub, tspan, params, **tran_kw))
            sols[-1].xs.block_until_ready()
            print(f"[transweep] chunk {s0}..{s0 + chunk}: "
                  f"{_time.perf_counter() - _tc:.1f}s",
                  file=_sys.stderr, flush=True)
        first = sols[0]
        # keep jax arrays so downstream code (block_until_ready etc.)
        # behaves the same as on the unchunked path
        first.xs = jnp.concatenate(
            [jnp.asarray(s.xs) for s in sols], axis=0)[:n_pts]
        from .tran import TranStats
        first.stats = TranStats(
            *[jnp.concatenate([jnp.atleast_1d(jnp.asarray(
                getattr(s.stats, f))) for s in sols])[:n_pts]
              for f in TranStats._fields])
        first.op_converged = jnp.concatenate(
            [jnp.atleast_1d(jnp.asarray(s.op_converged))
             for s in sols])[:n_pts]
        first.table = table
        return first

    bparams, axes = batch_params(cc, table, params)
    # vmap the full pipeline (op + runner) over the batched params
    sol = tran(cc, tspan, params=bparams, _vmap_axes=axes, **tran_kw)
    sol.table = table
    return sol


def montecarlo_table(cc: CompiledCircuit, spreads: dict, n: int,
                     seed: int = 0) -> dict:
    """Gaussian Monte-Carlo table: spreads maps 'inst.param' -> (mean, sigma)
    or sigma (relative to the default value) — the `agauss` analogue."""
    rng = np.random.default_rng(seed)
    table = {}
    p0 = cc.params0()
    for name, spread in spreads.items():
        gi, pn, slot = cc.param_slots[name]
        if isinstance(spread, tuple):
            mean, sigma = spread
        else:
            mean = float(np.asarray(p0[gi][pn])[slot])
            sigma = spread * abs(mean)
        table[name] = rng.normal(mean, sigma, n)
    return table
