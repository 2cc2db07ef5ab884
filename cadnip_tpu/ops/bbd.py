"""Block-bordered-diagonal (BBD) sparse solve — the TPU-native KLU.

Large circuit matrices are sparse and irregular; TPUs want batched dense
compute. The classic reconciliation is domain decomposition: partition the
circuit graph into K blocks of ~block_size unknowns plus a global border,
reorder the MNA system into block-bordered-diagonal form

    [D_1          E_1] [x_1]   [f_1]
    [     ...     ...] [...] = [...]
    [         D_K E_K] [x_K]   [f_K]
    [F_1  ... F_K  B ] [x_b]   [f_b]

and solve by batched dense block factorization + a dense Schur complement:

    S = B - sum_k F_k D_k^{-1} E_k          (batched MXU matmuls)
    S x_b = f_b - sum_k F_k D_k^{-1} f_k    (one dense solve)
    x_k = D_k^{-1} (f_k - E_k x_b)          (batched back-substitution)

Every step is fixed-shape batched dense linear algebra. The coupling strips
E_k/F_k are compressed to each block's local border set (circuits are local:
a block touches few border nodes), so memory is K*bs*nbl, not K*bs*nb.

Replaces SuiteSparse KLU for circuits beyond the dense-solver range
(reference `src/mna/solve.jl:612` KLU usage; SURVEY §2.9). Partitioning is
a host-side BFS over the device connectivity graph with border promotion
for block-spanning devices.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DTYPE, LU_DTYPE, solve_method_for_backend
from .linalg import factorize


@dataclasses.dataclass
class BBDPartition:
    n: int
    K: int                 # number of blocks
    bs: int                # padded block size
    nb: int                # border size (excl. pad slot)
    nbl: int               # per-block border cap (padded)
    kind: np.ndarray       # [n] 0 = block interior, 1 = border
    block_of: np.ndarray   # [n] block index (-1 for border)
    local_of: np.ndarray   # [n] slot within block / border index
    bmap: np.ndarray       # [K, nbl] global border slots per block (pad=nb)

    @property
    def shapes(self):
        return dict(D=(self.K, self.bs, self.bs),
                    E=(self.K, self.bs, self.nbl),
                    F=(self.K, self.nbl, self.bs),
                    B=(self.nb + 1, self.nb + 1))


def partition_graph(n: int, edges, block_size: int = 256,
                    device_unknowns=None, pre_border=()) -> BBDPartition:
    """Greedy BFS partition of the unknown-connectivity graph.

    edges: iterable of (i, j) pairs (device co-occurrence).
    device_unknowns: list of per-device unknown index arrays; after BFS
    blocking, unknowns of devices that span multiple blocks are promoted to
    the border until every device touches at most one block.
    pre_border: unknowns forced to the border up front (the caller's
    structural-singularity guard: a zero-diagonal branch-current row whose
    every coupling partner is border would make its D block singular).
    """
    adj = [[] for _ in range(n)]
    for i, j in edges:
        if i != j and i < n and j < n:
            adj[i].append(j)
            adj[j].append(i)

    # hub nets (power/ground rails, global clocks) touch a large fraction
    # of the circuit: any block containing one would couple to everything,
    # so they go straight to the border and the BFS never crosses them —
    # without this, seeding a block at vdd drags the whole rail fan-out
    # into the promotion pass (c6288: border 980 -> ~500, and per-block
    # border sets shrink by the rail fan-out factor)
    deg = np.array([len(a) for a in adj])
    is_border = np.zeros(n, bool)
    hub_cut = max(4 * block_size, 64)
    is_border[deg >= hub_cut] = True
    for i in pre_border:
        if 0 <= i < n:
            is_border[i] = True

    # BFS region growing from LOW-degree seeds (periphery first — the
    # standard region-growing heuristic: high-degree seeds maximize the
    # frontier and therefore the eventual cut)
    block_of = np.full(n, -1, np.int64)
    order = np.argsort(deg, kind="stable")
    bidx = 0
    from collections import deque
    for seed in order:
        if block_of[seed] >= 0 or is_border[seed]:
            continue
        q = deque([seed])
        count = 0
        while q and count < block_size:
            u = q.popleft()
            if block_of[u] >= 0 or is_border[u]:
                continue
            block_of[u] = bidx
            count += 1
            for v in adj[u]:
                if block_of[v] < 0 and not is_border[v]:
                    q.append(v)
        bidx += 1
    K = bidx

    # promote block-spanning device unknowns to the border
    if device_unknowns is not None:
        for _ in range(40):  # usually converges in a couple of sweeps
            changed = False
            for idx in device_unknowns:
                idx = [i for i in idx if i < n and not is_border[i]]
                blocks = {block_of[i] for i in idx}
                if len(blocks) <= 1:
                    continue
                # promote everything but the majority block
                counts = {}
                for i in idx:
                    counts[block_of[i]] = counts.get(block_of[i], 0) + 1
                keep = max(counts, key=counts.get)
                for i in idx:
                    if block_of[i] != keep:
                        is_border[i] = True
                        changed = True
            if not changed:
                break
        # demotion sweep: greedy promotion overshoots — a border unknown
        # whose every device now touches a single block can rejoin it
        block_of[is_border] = -1
        touching = [[] for _ in range(n)]
        for di, idx in enumerate(device_unknowns):
            for i in idx:
                if i < n:
                    touching[i].append(di)
        bcnt = (np.bincount(block_of[block_of >= 0], minlength=K)
                if K else np.zeros(0, np.int64))
        frozen = set(pre_border)
        for _ in range(4):
            changed = False
            for u in range(n):
                if not is_border[u] or deg[u] >= hub_cut or u in frozen:
                    continue
                tgt = set()
                ok = True
                for di in touching[u]:
                    for i in device_unknowns[di]:
                        if i < n and i != u and block_of[i] >= 0:
                            tgt.add(block_of[i])
                    if len(tgt) > 1:
                        ok = False
                        break
                if not ok or not tgt:
                    continue
                b = next(iter(tgt))
                if bcnt[b] >= block_size:
                    continue
                is_border[u] = False
                block_of[u] = b
                bcnt[b] += 1
                changed = True
            if not changed:
                break
    else:
        for i in range(n):
            for j in adj[i]:
                if block_of[j] != block_of[i]:
                    is_border[i] = True

    # compact numbering
    local_of = np.zeros(n, np.int64)
    bcount = np.zeros(K, np.int64)
    border_ids = []
    for i in range(n):
        if is_border[i]:
            local_of[i] = len(border_ids)
            border_ids.append(i)
        else:
            local_of[i] = bcount[block_of[i]]
            bcount[block_of[i]] += 1
    nb = len(border_ids)
    bs = max(int(bcount.max()) if K else 1, 1)
    block_of = np.where(is_border, -1, block_of)

    # per-block border sets (grown on demand during assembly mapping);
    # here pre-populate from adjacency
    bsets = [set() for _ in range(K)]
    if device_unknowns is not None:
        for idx in device_unknowns:
            blocks = {block_of[i] for i in idx if block_of[i] >= 0}
            if len(blocks) == 1:
                b = next(iter(blocks))
                for i in idx:
                    if block_of[i] < 0:
                        bsets[b].add(local_of[i])
    nbl = max(max((len(s) for s in bsets), default=1), 1)
    bmap = np.full((K, nbl), nb, np.int64)   # pad -> slot nb
    for b, s in enumerate(bsets):
        for pos, g in enumerate(sorted(s)):
            bmap[b, pos] = g

    return BBDPartition(n=n, K=K, bs=bs, nb=nb, nbl=nbl,
                        kind=is_border.astype(np.int8),
                        block_of=block_of, local_of=local_of, bmap=bmap)


def row_maps(part: BBDPartition):
    """(blk_rows [K, bs], border_rows [nb+1]) global indices (pad -> n)."""
    blk_rows = np.full((part.K, part.bs), part.n, np.int64)
    for i in range(part.n):
        if part.block_of[i] >= 0:
            blk_rows[part.block_of[i], part.local_of[i]] = i
    border_rows = np.full(part.nb + 1, part.n, np.int64)
    for i in range(part.n):
        if part.block_of[i] < 0:
            border_rows[part.local_of[i]] = i
    return blk_rows, border_rows


def global_row_sums(part: BBDPartition, T):
    """Sum |entries| per global row of a BBD-form matrix tuple
    (D, E, F, B) -> [n] vector."""
    D, E, F, B = T
    blk_rows, border_rows = row_maps(part)
    s = jnp.zeros(part.n + 1, D.dtype)
    blk_sum = jnp.sum(jnp.abs(D), axis=2) + jnp.sum(jnp.abs(E), axis=2)
    s = s.at[jnp.asarray(blk_rows.reshape(-1))].add(blk_sum.reshape(-1))
    bor_sum = jnp.sum(jnp.abs(B), axis=1)
    # F strips: rows are border, per block
    bmap_j = jnp.asarray(part.bmap)
    f_sum = jnp.sum(jnp.abs(F), axis=2)          # [K, nbl]
    bor_sum = bor_sum.at[bmap_j.reshape(-1)].add(f_sum.reshape(-1))
    s = s.at[jnp.asarray(border_rows)].add(bor_sum)
    return s[:part.n]


def bbd_matvec(part: BBDPartition, T, v):
    """y = M @ v for a BBD-form matrix tuple (D, E, F, B)."""
    D, E, F, B = T
    blk_rows, border_rows = row_maps(part)
    vp = jnp.concatenate([v, jnp.zeros(1, v.dtype)])
    vk = vp[jnp.asarray(blk_rows)]                  # [K, bs]
    vb = vp[jnp.asarray(border_rows)]               # [nb+1]
    bmap_j = jnp.asarray(part.bmap)
    vbl = vb[bmap_j]                                # [K, nbl]
    yk = jnp.einsum("kij,kj->ki", D, vk) + jnp.einsum("kij,kj->ki", E, vbl)
    yb = B @ vb
    yf = jnp.einsum("kij,kj->ki", F, vk)            # [K, nbl]
    yb = yb.at[bmap_j.reshape(-1)].add(yf.reshape(-1))
    y = jnp.zeros(part.n + 1, v.dtype)
    y = y.at[jnp.asarray(blk_rows).reshape(-1)].add(yk.reshape(-1))
    y = y.at[jnp.asarray(border_rows)].add(yb)
    return y[:part.n]


def make_bbd_solver(part: BBDPartition, method: str | None = None,
                    nested: "BBDPartition | None" = None):
    """Build solve(D, E, F, B, f) -> dx for the BBD system.

    D [K,bs,bs], E [K,bs,nbl], F [K,nbl,bs], B [(nb+1),(nb+1)] (slot nb is
    the pad target), f is the GLOBAL residual vector [n]; returns global dx.

    `nested`: a BBDPartition over the nb BORDER unknowns (build it with
    `mna.bbd_assemble.nested_border_partition` — its fill graph must cover
    every Schur-complement nonzero: B's device edges plus one clique per
    block bmap). When given, the dense (nb+1)^2 Schur factorization is
    replaced by a second BBD level: gather S into (D2, E2, F2, B2) and
    recurse, so the border cost drops from O(nb^3) to
    O(K2*bs2^3 + nb2^3) — the KLU-at-scale answer for 50k+ unknown
    circuits whose single dense border would otherwise dominate
    (reference c6288 regime, `benchmarks/vacask/README.md:87-122`).
    S is still formed densely, so memory stays O(nb^2).
    """
    method = method or solve_method_for_backend()
    K, bs, nb, nbl = part.K, part.bs, part.nb, part.nbl
    # gather maps: global vector -> block-major / border-major
    blk_rows = np.full((K, bs), part.n, np.int64)  # pad -> ghost slot n
    for i in range(part.n):
        if part.block_of[i] >= 0:
            blk_rows[part.block_of[i], part.local_of[i]] = i
    border_rows = np.full(nb + 1, part.n, np.int64)
    for i in range(part.n):
        if part.block_of[i] < 0:
            border_rows[part.local_of[i]] = i
    blk_rows_j = jnp.asarray(blk_rows)
    border_rows_j = jnp.asarray(border_rows)
    bmap_j = jnp.asarray(part.bmap)
    # ghost pad slots (slots with no unknown assigned) get identity rows —
    # structural mask, NOT value-based: MNA voltage-source rows have
    # legitimately zero diagonals
    ghost = jnp.asarray((blk_rows == part.n).astype(np.float64))  # [K, bs]
    # host-precomputed pad-free scatter plans: bmap/blk_rows pad entries
    # all collide on one slot, and a scatter-add with a 100k-duplicate
    # index is the slow path on TPU — gather the valid entries instead
    # and scatter only those
    bmap_np = np.asarray(part.bmap)
    valid2 = ((bmap_np[:, :, None] != nb)
              & (bmap_np[:, None, :] != nb))            # [K, nbl, nbl]
    fs_pos = jnp.asarray(np.where(valid2.reshape(-1))[0], jnp.int32)
    rows_np = (bmap_np[:, :, None] * (nb + 1)
               + bmap_np[:, None, :]).reshape(-1)
    s_rows = jnp.asarray(rows_np[np.asarray(valid2.reshape(-1))],
                         jnp.int32)
    valid1 = (bmap_np != nb).reshape(-1)                # [K*nbl]
    ff_pos = jnp.asarray(np.where(valid1)[0], jnp.int32)
    rb_rows = jnp.asarray(bmap_np.reshape(-1)[valid1], jnp.int32)
    validk = (blk_rows != part.n).reshape(-1)           # [K*bs]
    xk_pos = jnp.asarray(np.where(validk)[0], jnp.int32)
    dx_rows = jnp.asarray(blk_rows.reshape(-1)[validk], jnp.int32)

    if nested is not None:
        assert nested.n == nb, (nested.n, nb)
        # border-local gather maps for the level-2 system; pad -> slot nb,
        # whose S row/column is zeroed before the gathers (so ghost slots
        # read 0 and the recursive solver's own ghost-identity fix and
        # pad handling apply unchanged)
        blk2 = np.full((nested.K, nested.bs), nb, np.int64)
        bor2 = np.full(nested.nb + 1, nb, np.int64)
        for i in range(nb):
            if nested.block_of[i] >= 0:
                blk2[nested.block_of[i], nested.local_of[i]] = i
            else:
                bor2[nested.local_of[i]] = i
        bmap2g = bor2[np.asarray(nested.bmap)]          # [K2, nbl2]
        blk2_j = jnp.asarray(blk2)
        bor2_j = jnp.asarray(bor2)
        bmap2g_j = jnp.asarray(bmap2g)
        solve2 = make_bbd_solver(nested, method)

    def solve(D, E, F, B, f):
        # run the factorization/Schur math in the matrix dtype (f32 on
        # TPU: assembly stores the Jacobian tensors in f32 there; the
        # inexact-Newton outer loop with the exact f64 residual recovers
        # full accuracy) and cast the correction back at the end
        dt = D.dtype
        out_dt = f.dtype
        fpad = jnp.concatenate([f, jnp.zeros(1, f.dtype)]).astype(dt)
        fk = fpad[blk_rows_j]                       # [K, bs]
        fb = fpad[border_rows_j]                    # [nb+1]

        D = D + ghost.astype(dt)[:, :, None] * jnp.eye(bs, dtype=dt)[None]

        # batched solves: columns of E and the rhs together
        def blk_solve(A, rhs):
            lu = factorize(A, method)
            return jax.vmap(lu.solve, in_axes=1, out_axes=1)(rhs)

        rhs_all = jnp.concatenate([E, fk[:, :, None]], axis=2)
        # factorize().solve may refine in f64 — pull back to the working
        # dtype so the Schur einsums stay on the fast (f32) path
        sol_all = jax.vmap(blk_solve)(D, rhs_all).astype(dt)
        DinvE = sol_all[:, :, :nbl]
        Dinvf = sol_all[:, :, nbl]

        # Schur complement S = B - sum_k F_k DinvE_k scattered via bmap
        FS = jnp.einsum("kib,kbj->kij", F, DinvE)   # [K, nbl, nbl]
        S = B.reshape(-1).at[s_rows].add(
            -FS.reshape(-1)[fs_pos]).reshape(nb + 1, nb + 1)
        Ff = jnp.einsum("kib,kb->ki", F, Dinvf)     # [K, nbl]
        rb = fb.at[rb_rows].add(-Ff.reshape(-1)[ff_pos])
        rb = rb.at[nb].set(0.0)
        if nested is None:
            # pad slot: identity row
            S = S.at[nb, :].set(0.0).at[:, nb].set(0.0).at[nb, nb].set(1.0)
            xb = factorize(S, method).solve(rb).astype(dt)
        else:
            # zero the pad row/column so every ghost gather reads 0
            S = S.at[nb, :].set(0.0).at[:, nb].set(0.0)
            D2 = S[blk2_j[:, :, None], blk2_j[:, None, :]]
            E2 = S[blk2_j[:, :, None], bmap2g_j[:, None, :]]
            F2 = S[bmap2g_j[:, :, None], blk2_j[:, None, :]]
            B2 = S[bor2_j[:, None], bor2_j[None, :]]
            xb2 = solve2(D2, E2, F2, B2, rb[:nb])
            xb = jnp.concatenate([xb2.astype(dt), jnp.zeros(1, dt)])

        xb_local = xb[bmap_j]                        # [K, nbl]
        xk = Dinvf - jnp.einsum("kbj,kj->kb", DinvE, xb_local)

        # reassemble global dx (pad-free plans; border_rows has exactly
        # one pad slot, routed to the ghost position n)
        dx = jnp.zeros(part.n + 1, dt)
        dx = dx.at[dx_rows].add(xk.reshape(-1)[xk_pos])
        dx = dx.at[border_rows_j].add(xb)
        return dx[:part.n].astype(out_dt)

    return solve
