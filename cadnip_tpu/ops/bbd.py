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
                    device_unknowns=None) -> BBDPartition:
    """Greedy BFS partition of the unknown-connectivity graph.

    edges: iterable of (i, j) pairs (device co-occurrence).
    device_unknowns: list of per-device unknown index arrays; after BFS
    blocking, unknowns of devices that span multiple blocks are promoted to
    the border until every device touches at most one block.
    """
    adj = [[] for _ in range(n)]
    for i, j in edges:
        if i != j and i < n and j < n:
            adj[i].append(j)
            adj[j].append(i)

    # BFS region growing
    block_of = np.full(n, -1, np.int64)
    order = np.argsort([-len(a) for a in adj])  # start from high degree
    bidx = 0
    from collections import deque
    for seed in order:
        if block_of[seed] >= 0:
            continue
        q = deque([seed])
        count = 0
        while q and count < block_size:
            u = q.popleft()
            if block_of[u] >= 0:
                continue
            block_of[u] = bidx
            count += 1
            for v in adj[u]:
                if block_of[v] < 0:
                    q.append(v)
        bidx += 1
    K = bidx

    # promote block-spanning device unknowns to the border
    is_border = np.zeros(n, bool)
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


def make_bbd_solver(part: BBDPartition, method: str | None = None):
    """Build solve(D, E, F, B, f) -> dx for the BBD system.

    D [K,bs,bs], E [K,bs,nbl], F [K,nbl,bs], B [(nb+1),(nb+1)] (slot nb is
    the pad target), f is the GLOBAL residual vector [n]; returns global dx.
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

    def solve(D, E, F, B, f):
        fpad = jnp.concatenate([f, jnp.zeros(1, f.dtype)])
        fk = fpad[blk_rows_j]                       # [K, bs]
        fb = fpad[border_rows_j]                    # [nb+1]

        D = D + ghost[:, :, None] * jnp.eye(bs, dtype=D.dtype)[None]

        # batched solves: columns of E and the rhs together
        def blk_solve(A, rhs):
            lu = factorize(A, method)
            return jax.vmap(lu.solve, in_axes=1, out_axes=1)(rhs)

        rhs_all = jnp.concatenate([E, fk[:, :, None]], axis=2)
        sol_all = jax.vmap(blk_solve)(D, rhs_all)   # [K, bs, nbl+1]
        DinvE = sol_all[:, :, :nbl]
        Dinvf = sol_all[:, :, nbl]

        # Schur complement S = B - sum_k F_k DinvE_k scattered via bmap
        FS = jnp.einsum("kib,kbj->kij", F, DinvE)   # [K, nbl, nbl]
        rows = bmap_j[:, :, None] * (nb + 1) + bmap_j[:, None, :]
        S = B.reshape(-1).at[rows.reshape(-1)].add(
            -FS.reshape(-1)).reshape(nb + 1, nb + 1)
        Ff = jnp.einsum("kib,kb->ki", F, Dinvf)     # [K, nbl]
        rb = fb.at[bmap_j.reshape(-1)].add(-Ff.reshape(-1))
        # pad slot: identity row
        S = S.at[nb, :].set(0.0).at[:, nb].set(0.0).at[nb, nb].set(1.0)
        rb = rb.at[nb].set(0.0)
        xb = factorize(S, method).solve(rb)

        xb_local = xb[bmap_j]                        # [K, nbl]
        xk = Dinvf - jnp.einsum("kbj,kj->kb", DinvE, xb_local)

        # reassemble global dx
        dx = jnp.zeros(part.n + 1, f.dtype)
        dx = dx.at[blk_rows_j.reshape(-1)].add(xk.reshape(-1))
        dx = dx.at[border_rows_j].add(xb)
        return dx[:part.n]

    return solve
