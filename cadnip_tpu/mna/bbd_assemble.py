"""Assembly into block-bordered-diagonal form for large circuits.

Same gather -> vmapped eval -> scatter pipeline as `assemble.py`, but the
Jacobian values scatter into the BBD tensors (D blocks, E/F coupling
strips, border matrix B) instead of a dense [n, n] matrix. The COO->slot
mapping is computed host-side at elaboration (the analogue of the
reference's COO->nzval maps, `src/mna/precompile.jl:253`), so the traced
code performs four flat scatter-adds per device group.

Ground and cross-tensor entries route to trailing trash slots.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import effective_platform, DTYPE
from ..ops.bbd import BBDPartition, partition_graph
from .assemble import _group_eval
from .devices import CLASS_V
from .spec import DynSpec
from .structure import CompiledCircuit


def default_block_size() -> int:
    """BBD block size. Measured on the c6288 CMOS multiplier (5,156
    unknowns, logic-netlist topology): small blocks win by a wide margin —
    batched block cost scales with K*bs^2*nbl while the border stays flat,
    so bs=32 beats bs=256 by ~20x wall-clock on both backends. On TPU 32
    also keeps factorizations on the unrolled-Gauss/Pallas path (the XLA
    LU expander inside while_loops faults the chip)."""
    return 32


def partition_circuit(cc: CompiledCircuit, block_size: int | None = None
                      ) -> BBDPartition:
    """Partition a compiled circuit's unknown-connectivity graph.

    Re-partitions with forced border promotion for any branch-current
    (CLASS_I, zero structural diagonal) unknown whose every coupling
    partner landed in the border — its D row would be all zero and the
    block singular (the c6288 rails' source branch currents are the
    canonical case)."""
    from .devices import CLASS_I as _CI
    if block_size is None:
        block_size = default_block_size()
    edges = []
    device_unknowns = []
    for g in cc.groups:
        for row in g.conn:
            idx = [int(i) for i in row if i < cc.n]
            device_unknowns.append(idx)
            for a in range(len(idx)):
                for b in range(a + 1, len(idx)):
                    edges.append((idx[a], idx[b]))
    pre_border: set = set()
    for _ in range(3):
        part = partition_graph(cc.n, edges, block_size=block_size,
                               device_unknowns=device_unknowns,
                               pre_border=pre_border)
        partners: dict = {}
        for idx in device_unknowns:
            for i in idx:
                if cc.classes[i] == _CI:
                    partners.setdefault(i, set()).update(
                        j for j in idx if j != i)
        viol = {i for i, ps in partners.items()
                if part.block_of[i] >= 0
                and all(part.block_of[j] < 0 for j in ps)}
        if not viol - pre_border:
            break
        pre_border |= viol
    return part


def nested_border_partition(cc: CompiledCircuit, part: BBDPartition,
                            block_size: int = 128
                            ) -> BBDPartition | None:
    """Partition the BORDER unknowns for the nested Schur solve.

    The Schur complement S = B - sum_k F_k D_k^{-1} E_k has an exactly
    known fill pattern: B's entries (devices whose unknowns all sit in
    the border) plus, per block k, a dense clique over that block's
    bmap set (the F D^{-1} E rectangle). Both are passed to
    `partition_graph` as device groups so its block-spanning promotion
    guarantees no S nonzero is dropped by the level-2 gathers.

    The CLASS_I singular-row guard repeats at this level: a border
    branch-current row (zero structural diagonal) whose every S-coupling
    partner lands in the level-2 border would make its D2 block
    singular (the supply-rail source currents are the canonical case).
    """
    from .devices import CLASS_I as _CI
    nb = part.nb
    lob = part.local_of
    dev2: list = []
    for g in cc.groups:
        for row in g.conn:
            idx = [int(lob[i]) for i in row
                   if i < cc.n and part.block_of[i] < 0]
            if len(idx) > 1:
                dev2.append(sorted(set(idx)))
    for k in range(part.K):
        clique = sorted(int(j) for j in part.bmap[k] if j < nb)
        if len(clique) > 1:
            dev2.append(clique)
    edges2 = []
    for idx in dev2:
        for a in range(len(idx)):
            for b in range(a + 1, len(idx)):
                edges2.append((idx[a], idx[b]))
    classes_b = np.zeros(nb, np.int8)
    for i in range(cc.n):
        if part.block_of[i] < 0:
            classes_b[lob[i]] = cc.classes[i]
    pre_border: set = set()
    part2 = None
    for _ in range(3):
        part2 = partition_graph(nb, edges2, block_size=block_size,
                                device_unknowns=dev2,
                                pre_border=pre_border)
        partners: dict = {}
        for idx in dev2:
            for i in idx:
                if classes_b[i] == _CI:
                    partners.setdefault(i, set()).update(
                        j for j in idx if j != i)
        viol = {i for i, ps in partners.items()
                if part2.block_of[i] >= 0
                and all(part2.block_of[j] < 0 for j in ps)}
        if not viol - pre_border:
            break
        pre_border |= viol
    # only worth it if the level-2 border actually shrank
    if part2 is None or part2.nb > 0.7 * nb:
        return None
    return part2


def _dest(part: BBDPartition, gi: int, gj: int, dev_block: int):
    """(tensor_id, flat_index) for a stamp at global (gi, gj).
    tensor ids: 0=D, 1=E, 2=F, 3=B; flat index into the flattened tensor
    (each tensor gets one trailing trash slot)."""
    K, bs, nb, nbl = part.K, part.bs, part.nb, part.nbl
    n = part.n
    if gi >= n or gj >= n:
        return 0, K * bs * bs  # ground -> D trash
    bi = part.block_of[gi]
    bj = part.block_of[gj]
    li = part.local_of[gi]
    lj = part.local_of[gj]
    if bi >= 0 and bj >= 0:
        if bi != bj:
            raise AssertionError("cross-block stamp (promotion failed)")
        return 0, (bi * bs + li) * bs + lj
    if bi >= 0 and bj < 0:
        pos = np.searchsorted(part.bmap[bi], lj)
        if pos >= nbl or part.bmap[bi, pos] != lj:
            raise AssertionError("border slot missing from bmap")
        return 1, (bi * bs + li) * nbl + pos
    if bi < 0 and bj >= 0:
        pos = np.searchsorted(part.bmap[bj], li)
        if pos >= nbl or part.bmap[bj, pos] != li:
            raise AssertionError("border slot missing from bmap")
        return 2, (bj * nbl + pos) * bs + lj
    return 3, li * (nb + 1) + lj


def make_bbd_assembler(cc: CompiledCircuit, part: BBDPartition):
    """Build assemble(x_pad, lim, params, dyn) ->
    (F, Q, (GD,GE,GF,GB), (CD,CE,CF,CB), lim_new)."""
    n = cc.n
    K, bs, nb, nbl = part.K, part.bs, part.nb, part.nbl
    sizes = {0: K * bs * bs, 1: K * bs * nbl, 2: K * nbl * bs,
             3: (nb + 1) * (nb + 1)}
    consts = []
    lim_off = 0
    for g in cc.groups:
        conn = jnp.asarray(g.conn, jnp.int32)
        nl = g.model.n_local
        idx = {t: np.full((g.n_inst, nl, nl), sizes[t], np.int64)
               for t in range(4)}
        for si in range(g.n_inst):
            row = g.conn[si]
            # device block: the block of its interior unknowns
            dev_block = -1
            for gidx in row:
                if gidx < n and part.block_of[gidx] >= 0:
                    dev_block = part.block_of[gidx]
                    break
            for a in range(nl):
                for b in range(nl):
                    t, flat = _dest(part, int(row[a]), int(row[b]),
                                    dev_block)
                    idx[t][si, a, b] = flat
        sl = None
        if g.model.residual_lim is not None:
            B = len(g.model.lim_branches)
            size = g.conn.shape[0] * B
            sl = (lim_off, lim_off + size, (g.conn.shape[0], B))
            lim_off += size
        elif g.model.limit is not None:
            size = g.conn.size
            sl = (lim_off, lim_off + size, g.conn.shape)
            lim_off += size
        consts.append((g.model, conn,
                       {t: v.reshape(-1) for t, v in idx.items()}, sl))
    n_lim = lim_off
    from .assemble import make_sorted_scatter
    fq_scatter = make_sorted_scatter([g.conn for g in cc.groups], n + 1)
    # Jacobian stamps: per-tensor subset plans (gather only the stamps
    # destined for tensor t, drop trash-routed ones) scattered in f32 on
    # TPU — f64 scatter-add is ~7x slower there, and Newton tolerates an
    # approximate Jacobian as long as the residual F stays exact f64
    # (inexact-Newton argument; the residual convergence test and LTE all
    # run off F/Q, which remain f64)
    gc_dtype = DTYPE if effective_platform() == "cpu" else jnp.float32
    gc_plans = []
    for t in range(4):
        idx = np.concatenate([np.asarray(c[2][t], np.int64)
                              for c in consts])
        keep = np.where(idx != sizes[t])[0]
        gc_plans.append((jnp.asarray(keep, jnp.int32),
                         jnp.asarray(idx[keep], jnp.int32)))
    vnode_idx = np.where(cc.classes == CLASS_V)[0]
    # gshunt diagonal destinations
    gsh = {t: [] for t in range(4)}
    for i in vnode_idx:
        t, flat = _dest(part, int(i), int(i), -1)
        gsh[t].append(flat)
    gsh = {t: jnp.asarray(v, jnp.int32) for t, v in gsh.items() if v}
    vnode_j = jnp.asarray(vnode_idx, jnp.int32)

    def init_lim(x_pad):
        if n_lim == 0:
            return jnp.zeros(0, DTYPE)
        from .assemble import _lim_seed
        parts = []
        for model, conn, _, sl in consts:
            if sl is not None:
                parts.append(_lim_seed(model, conn, x_pad))
        return jnp.concatenate(parts)

    dly_off = 0
    dly_slices = []
    for g in cc.groups:
        if g.model.n_delay_sites:
            S = g.model.n_delay_sites
            dly_slices.append((dly_off, dly_off + g.conn.shape[0] * S,
                               (g.conn.shape[0], S)))
            dly_off += g.conn.shape[0] * S
        else:
            dly_slices.append(None)

    def assemble(x_pad, lim, params, dyn: DynSpec, dly=None):
        lim_new = lim
        fs, qs, Js, Cs = [], [], [], []
        for (model, conn, idx, sl), p, dsl in zip(consts, params,
                                                  dly_slices):
            u = x_pad[conn]
            if dsl is not None and dly is not None:
                p = dict(p)
                p["__dly__"] = dly[dsl[0]:dsl[1]].reshape(dsl[2])
            if sl is not None:
                u_lim_prev = lim[sl[0]:sl[1]].reshape(sl[2])
            else:
                u_lim_prev = u
            f, q, J, C, u_eval = jax.vmap(
                partial(_group_eval, model), in_axes=(0, 0, 0, None)
            )(u, u_lim_prev, p, dyn)
            if sl is not None:
                lim_new = lim_new.at[sl[0]:sl[1]].set(u_eval.reshape(-1))
            fs.append(f)
            qs.append(q)
            Js.append(J)
            Cs.append(C)
        F = fq_scatter(jnp.zeros(n + 1, DTYPE), fs)
        Q = fq_scatter(jnp.zeros(n + 1, DTYPE), qs)
        Jv = jnp.concatenate([v.reshape(-1) for v in Js])
        Cv = jnp.concatenate([v.reshape(-1) for v in Cs])
        Gt, Ct = {}, {}
        for t in range(4):
            pos, idx = gc_plans[t]
            Gt[t] = jnp.zeros(sizes[t] + 1, gc_dtype).at[idx].add(
                Jv[pos].astype(gc_dtype))
            Ct[t] = jnp.zeros(sizes[t] + 1, gc_dtype).at[idx].add(
                Cv[pos].astype(gc_dtype))
        F = F[:n].at[vnode_j].add(dyn.gshunt * x_pad[vnode_j])
        for t, flats in gsh.items():
            Gt[t] = Gt[t].at[flats].add(
                jnp.asarray(dyn.gshunt).astype(gc_dtype))

        def shape(tensors):
            return (tensors[0][:-1].reshape(K, bs, bs),
                    tensors[1][:-1].reshape(K, bs, nbl),
                    tensors[2][:-1].reshape(K, nbl, bs),
                    tensors[3][:-1].reshape(nb + 1, nb + 1))

        return F, Q[:n], shape(Gt), shape(Ct), lim_new

    assemble.init_lim = init_lim
    assemble.n_lim = n_lim
    assemble.n_delay = dly_off
    return assemble
