"""Pallas TPU dense-solve kernel: Gauss-Jordan with partial pivoting.

The per-Newton-iteration bottleneck on TPU for circuit-sized systems is op
COUNT, not FLOPs: the unrolled Gauss path in `linalg.gauss_solve` emits
~6 ops per elimination step (n steps), each a tiny dispatched vector op
with ~µs fixed latency. This kernel runs the whole elimination as ONE
Pallas call: the augmented matrix [A | B] lives in VMEM, a fori_loop walks
the n pivots on-core, and every step is a handful of VPU ops on
(N, N+128)-shaped tiles. XLA's LU expander (which faults the chip inside
while_loops — see CLAUDE.md) is never involved.

Precision: the kernel is f32; callers (ops.linalg method "gjpl32ir") wrap
it with row/column equilibration and f64 iterative refinement, the same
scheme as the lu32ir path. Padding to (N, 128)-aligned tiles with identity
rows keeps shapes static.

Replaces the reference's KLU hot solve (`src/mna/solve.jl:612`) for the
dense/batched regime on TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gj_kernel(n: int, R: int, NA: int, M: int, ab_ref, out_ref):
    """In-VMEM Gauss-Jordan over the augmented [R, M] block: R rows
    (sublane-padded), A-part in lanes [0, NA), rhs in [NA, M). Eliminates
    above AND below the pivot so no back-substitution pass is needed; rows
    >= n are identity padding. Functional fori_loop carry and strictly 2-D
    intermediates (Mosaic lowering requirements)."""
    N = NA  # A-part lane width
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, M), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, M), 1)

    def step(k, ab):
        # |column k| with rows < k masked out -> pivot row index
        colmask = col_ids == k
        colk = jnp.sum(jnp.where(colmask, ab, 0.0), axis=1,
                       keepdims=True)                             # [N, 1]
        rk = row_ids[:, :1]
        cand = jnp.where(rk >= k, jnp.abs(colk), -1.0)            # [N, 1]
        p = jax.lax.argmax(cand[:, 0], 0, jnp.int32)

        # swap rows k and p (masked full-array select)
        rowk = jnp.sum(jnp.where(row_ids == k, ab, 0.0), axis=0,
                       keepdims=True)                             # [1, M]
        rowp = jnp.sum(jnp.where(row_ids == p, ab, 0.0), axis=0,
                       keepdims=True)                             # [1, M]
        ab = jnp.where(row_ids == k, rowp, ab)
        ab = jnp.where(row_ids == p, rowk, ab)

        # eliminate column k from every other row
        piv = jnp.sum(jnp.where(col_ids[:1, :] == k, rowp, 0.0))
        colk2 = jnp.sum(jnp.where(colmask, ab, 0.0), axis=1,
                        keepdims=True)                            # [N, 1]
        factor = colk2 / piv
        factor = jnp.where(rk == k, 0.0, factor)
        return ab - factor * rowp

    # int32 bounds: x64 mode would give the loop index (and every
    # comparison against it) int64, which Mosaic cannot lower
    ab = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), step, ab_ref[:],
                           unroll=False)
    # normalize: X = B-part / diag(A-part). Full-width masked diagonal —
    # half-width lane slices like ab[:, :N] SIGABRT the Mosaic compiler;
    # (i, i) always lands in the A-part since rows < N <= M.
    diag = jnp.sum(jnp.where(row_ids == col_ids, ab, 0.0), axis=1,
                   keepdims=True)                                 # [N, 1]
    out_ref[:] = ab[:, N:] / diag


def _gj_call(ab, n, R, NA, M, K, interpret):
    """Dispatch one padded augmented block [R, M] to the kernel;
    returns [R, K]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        partial(_gj_kernel, n, R, NA, M),
        out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ab)


@partial(jax.jit, static_argnames=("interpret",))
def gj_solve_f32(A, B, *, interpret: bool = False):
    """Solve A @ X = B in f32 via one Pallas Gauss-Jordan kernel.

    A: [n, n]; B: [n, k] (or [n] vector). Returns X with B's shape.
    Shapes are padded to lane-aligned tiles; pad rows are identity.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vec = B.ndim == 1
    Bm = B[:, None] if vec else B
    n = A.shape[-1]
    k = Bm.shape[-1]
    # rows pad to the f32 sublane quantum (8), lanes to 128: for circuit-
    # sized n the per-step VPU work scales with R*M, so a 19-unknown system
    # runs on [24, 256] tiles instead of [128, 256]
    R = max(_round_up(n, 8), 8)
    NA = max(_round_up(max(n, R), _LANE), _LANE)
    K = max(_round_up(k, _LANE), _LANE)
    M = NA + K

    Ap = jnp.zeros((R, NA), jnp.float32)
    Ap = Ap.at[:n, :n].set(A.astype(jnp.float32))
    # identity pad rows keep the elimination nonsingular
    idx = jnp.arange(n, R)
    Ap = Ap.at[idx, idx].set(1.0)
    Bp = jnp.zeros((R, K), jnp.float32)
    Bp = Bp.at[:n, :k].set(Bm.astype(jnp.float32))
    ab = jnp.concatenate([Ap, Bp], axis=1)

    out = _solver_for(n, R, NA, M, K, interpret)(ab)
    X = out[:n, :k]
    return X[:, 0] if vec else X


from functools import lru_cache  # noqa: E402


def _gj_xla_batched(ab, n, R, NA, K):
    N = NA
    """Masked Gauss-Jordan as plain (batch-vectorized) XLA, fori-loop over
    pivots — the vmap fallback. Operates on the unpadded [B, n, n+K]
    subblock (padding would multiply memory by N/n per lane); batched
    lanes amortize the per-op latency that makes this layout slow for a
    single system."""
    B = ab.shape[0]
    sub = jnp.concatenate([ab[:, :n, :n], ab[:, :n, N:]], axis=2)
    m = sub.shape[2]
    rids = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)[None]
    cids = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)[None]
    rvec = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def step(k, s):
        colk = jnp.sum(jnp.where(cids == k, s, 0.0), axis=2)      # [B, n]
        cand = jnp.where(rvec >= k, jnp.abs(colk), -1.0)
        p = jnp.argmax(cand, axis=1).astype(jnp.int32)            # [B]
        pm = p[:, None, None]
        rowk = jnp.sum(jnp.where(rids == k, s, 0.0), axis=1,
                       keepdims=True)                             # [B,1,m]
        rowp = jnp.sum(jnp.where(rids == pm, s, 0.0), axis=1,
                       keepdims=True)
        s = jnp.where(rids == k, rowp, s)
        s = jnp.where(rids == pm, rowk, s)
        piv = jnp.sum(jnp.where(cids[:, :1, :] == k, rowp, 0.0),
                      axis=2)                                     # [B, 1]
        colk2 = jnp.sum(jnp.where(cids == k, s, 0.0), axis=2)     # [B, n]
        factor = jnp.where(rvec == k, 0.0, colk2 / piv)
        return s - factor[:, :, None] * rowp

    sub = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), step, sub,
                            unroll=False)
    diag = jnp.sum(jnp.where(rids[:, :, :n] == cids[:, :, :n],
                             sub[:, :, :n], 0.0), axis=2)         # [B, n]
    X = sub[:, :, n:] / diag[:, :, None]
    out = jnp.zeros((B, R, K), jnp.float32)
    return out.at[:, :n, :].set(X)


@lru_cache(maxsize=None)
def _solver_for(n, R, NA, M, K, interpret):
    """custom_vmap wrapper: a single solve runs the Pallas kernel; under
    vmap (sweeps) it lowers to the batched masked-XLA path (neither vmap
    of pallas_call nor gridded kernels compile through this backend)."""

    @jax.custom_batching.custom_vmap
    def f(ab):
        return _gj_call(ab, n, R, NA, M, K, interpret)

    @f.def_vmap
    def rule(axis_size, in_batched, ab):
        (ab_b,) = in_batched
        if not ab_b:
            ab = jnp.broadcast_to(ab, (axis_size,) + ab.shape)
        lead = ab.shape[:-2]
        flat = ab.reshape((-1,) + ab.shape[-2:])
        out = _gj_xla_batched(flat, n, R, NA, K)
        return out.reshape(lead + (R, K)), True

    return f
