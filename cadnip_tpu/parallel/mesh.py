"""Multi-chip execution: parameter sweeps sharded over a device mesh.

A circuit solve is irreducibly sequential, but sweep points are independent
(SURVEY §2.10.1: sweep parallelism is this domain's data parallelism). The
sweep axis shards over a 1-D `jax.sharding.Mesh` ("sweep"); each chip runs
its shard of the vmapped solver; results gather only at the end (no
collectives inside a solve — they would only serialize ICI traffic).
Multi-host corners ride DCN the same way: the mesh just spans more devices.

GSPMD does the partitioning: we jit the vmapped solver with sharded inputs
(NamedSharding over the batch axis) and XLA emits the per-chip program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DTYPE
from ..mna.newton import make_dc_solver
from ..mna.structure import CompiledCircuit
from ..analyses.dc import DCSolution
from ..analyses.sweeps import batch_params


def sweep_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), ("sweep",))


def _pad_batch(table: dict, n_dev: int):
    """Pad every sweep axis to a multiple of the device count (extra points
    repeat the last value and are dropped from the result)."""
    b = len(next(iter(table.values())))
    pad = (-b) % n_dev
    if pad == 0:
        return table, b
    return {k: np.concatenate([v, np.repeat(v[-1:], pad)])
            for k, v in table.items()}, b


def _shard_batched(params, axes, mesh: Mesh):
    """Place batched leaves with a 'sweep' sharding, replicate the rest."""
    shard = NamedSharding(mesh, P("sweep"))
    repl = NamedSharding(mesh, P())

    def place(leaf, ax):
        return jax.device_put(leaf, shard if ax == 0 else repl)

    return jax.tree.map(place, params, axes,
                        is_leaf=lambda x: x is None)


def sharded_dcsweep(cc: CompiledCircuit, sweep, params=None, *, mesh=None,
                    x0=None) -> DCSolution:
    """dcsweep with the batch axis sharded over all devices."""
    table = sweep.table() if hasattr(sweep, "table") else {
        k: np.asarray(v) for k, v in sweep.items()}
    mesh = mesh or sweep_mesh()
    n_dev = mesh.devices.size
    table, n_real = _pad_batch(table, n_dev)
    bparams, axes = batch_params(cc, table, params)
    bparams = _shard_batched(bparams, axes, mesh)
    key = ("sharded_dcsweep", tuple(sorted(table)), n_dev)
    if key not in cc.cache:
        solver = make_dc_solver(cc)
        cc.cache[key] = cc.jit(jax.vmap(solver, in_axes=(None, axes, None)))
    if x0 is None:
        x0 = jnp.zeros(cc.n, DTYPE)
    dyn = cc.spec.dyn()
    r = cc.cache[key](x0, bparams, dyn)
    sol = DCSolution(cc, r.x[:n_real], r.converged[:n_real],
                     r.iters, r.resnorm)
    sol.table = {k: v[:n_real] for k, v in table.items()}
    return sol


def sharded_transweep(cc: CompiledCircuit, sweep, tspan, params=None, *,
                      mesh=None, **tran_kw):
    """transweep with the batch axis sharded over all devices."""
    from ..analyses.tran import tran

    table = sweep.table() if hasattr(sweep, "table") else {
        k: np.asarray(v) for k, v in sweep.items()}
    mesh = mesh or sweep_mesh()
    n_dev = mesh.devices.size
    table, n_real = _pad_batch(table, n_dev)
    bparams, axes = batch_params(cc, table, params)
    bparams = _shard_batched(bparams, axes, mesh)
    sol = tran(cc, tspan, params=bparams, _vmap_axes=axes, **tran_kw)
    sol.xs = sol.xs[:n_real]
    sol.table = {k: v[:n_real] for k, v in table.items()}
    return sol
