"""Dense linear solves for MNA systems, TPU-aware.

TPU's XLA backend implements LU decomposition only for f32 (f64 LU does not
compile, c64 is unimplemented on v5e). Circuit Jacobians span ~15 orders of
magnitude (gmin 1e-12 .. source rows 1e3), so a raw f32 factorization is not
accurate enough for SPICE tolerances. We therefore:

  1. equilibrate: scale rows and columns to unit max-norm (exact powers would
     be ideal; plain scaling is sufficient since the scaling cancels in the
     refinement residual),
  2. factorize the equilibrated matrix in f32,
  3. run iterative refinement in f64 (f64 matmuls are supported, emulated):
     r = b - A x;  dx = C * lu_solve(R r);  x += dx,

recovering ~f64 solution accuracy for the well-scaled systems Newton produces.
On CPU we use native f64 LU. Complex systems (AC/noise) are solved via the
equivalent real 2Nx2N form ([[Ar, -Ai], [Ai, Ar]]), same machinery.

Replaces the reference's SuiteSparse KLU usage (Cadnip `src/mna/solve.jl:612`,
`src/sweeps.jl:599-601`); a Pallas sparse-LU backend for large circuits plugs
in behind the same interface later.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..config import DTYPE, LU_DTYPE


def gauss_solve(A, b):
    """Unrolled Gauss-Jordan elimination with partial pivoting, full f64.

    For circuit-sized systems (n <= ~128) this is the right TPU solve: it
    lowers to pure elementwise/select arithmetic — no LU expander
    while-loops (which, nested inside Newton inside a transient loop, blow
    XLA:TPU compile times up by orders of magnitude) — and it runs in f64
    end-to-end (no f32 factorization, no refinement needed).

    b may be a vector [n] or a matrix [n, k].
    """
    n = A.shape[-1]
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    Ab = jnp.concatenate([A, B.astype(A.dtype)], axis=1)
    rows = jnp.arange(n)
    for k in range(n):
        col = jnp.abs(Ab[:, k])
        p = jnp.argmax(jnp.where(rows >= k, col, -1.0))
        rowk = Ab[k]
        rowp = Ab[p]
        Ab = Ab.at[k].set(rowp).at[p].set(rowk)
        piv = Ab[k, k]
        factor = Ab[:, k] / piv
        factor = factor.at[k].set(0.0)
        Ab = Ab - factor[:, None] * Ab[k][None, :]
    x = Ab[:, n:] / jnp.diagonal(Ab[:, :n])[:, None]
    return x[:, 0] if vec else x


def _equilibrate(A):
    """Row/column max-norm scaling. Returns (A_scaled, r, c) with
    A_scaled = diag(r) @ A @ diag(c)."""
    tiny = jnp.asarray(1e-300, A.dtype)
    r = 1.0 / jnp.maximum(jnp.max(jnp.abs(A), axis=1), tiny)
    As = A * r[:, None]
    c = 1.0 / jnp.maximum(jnp.max(jnp.abs(As), axis=0), tiny)
    return As * c[None, :], r, c


#: below this size, unrolled Gauss-Jordan beats LU on TPU (compile AND
#: accuracy: full f64, no expander while-loops)
GAUSS_MAX_N = 160


class DenseLU:
    """Factorization handle supporting repeated solves (Newton reuses it for
    iterative refinement; transient reuses across rejected steps)."""

    __slots__ = ("lu", "piv", "r", "c", "A", "method")

    def __init__(self, lu, piv, r, c, A, method):
        self.lu, self.piv, self.r, self.c, self.A, self.method = (
            lu, piv, r, c, A, method)

    def solve(self, b, refine: int = 2):
        if self.method == "gauss":
            return gauss_solve(self.A, b)
        if self.method == "gjpl32ir":
            # factorize() computed the equilibrated f32 inverse with ONE
            # Pallas Gauss-Jordan kernel; each solve/refinement is a single
            # matvec — total op count per Newton iteration drops from ~6n
            # dispatched ops (unrolled gauss) to a handful
            Ainv = self.lu                     # [n, n] f32 of diag(r)A diag(c)
            if b.ndim == 2:
                return jax.vmap(self.solve, in_axes=1, out_axes=1)(b)

            def apply(v):
                return self.c * (Ainv @ (self.r * v).astype(LU_DTYPE)
                                 ).astype(DTYPE)

            x = apply(b)
            for _ in range(refine):
                x = x + apply(b - self.A @ x)
            return x
        if self.method == "lu64":
            if b.ndim == 2:
                return jax.vmap(lambda bb: jsl.lu_solve(
                    (self.lu, self.piv), bb), in_axes=1, out_axes=1)(b)
            return jsl.lu_solve((self.lu, self.piv), b)
        # f32 LU + f64 iterative refinement
        if b.ndim == 2:
            return jax.vmap(self.solve, in_axes=1, out_axes=1)(b)
        x = self.c * jsl.lu_solve((self.lu, self.piv),
                                  (self.r * b).astype(LU_DTYPE)).astype(DTYPE)
        for _ in range(refine):
            res = b - self.A @ x
            dx = self.c * jsl.lu_solve((self.lu, self.piv),
                                       (self.r * res).astype(LU_DTYPE)
                                       ).astype(DTYPE)
            x = x + dx
        return x


_warned_tpu_lu = False


def resolve_method(method: str | None, n: int) -> str:
    """'auto'/None -> concrete method for an n-sized system."""
    if method in (None, "auto"):
        from ..config import effective_platform
        backend = effective_platform()
        if backend == "cpu":
            return "lu64"
        if n <= 1024:
            # one Pallas Gauss-Jordan kernel + f64 refinement: ~4-10x
            # faster than the unrolled gauss path (op-count, not FLOPs,
            # bounds small dense solves on TPU) and f64-accurate
            return "gjpl32ir"
        if n <= GAUSS_MAX_N:
            return "gauss"
        # XLA's LU expander lowers to nested while-loops; traced inside a
        # Newton/transient while_loop on TPU it faults the chip and blows
        # compile time (see CLAUDE.md).  Callers that iterate should keep
        # their dense systems <= GAUSS_MAX_N (BBD does, by capping block
        # size); warn once so the pathology is visible before it bites.
        global _warned_tpu_lu
        if not _warned_tpu_lu:
            import warnings
            warnings.warn(
                f"TPU dense solve n={n} > GAUSS_MAX_N={GAUSS_MAX_N} falls "
                "back to f32 LU + refinement; if this solve sits inside a "
                "while_loop the XLA LU expander may fault the TPU — reduce "
                "the block/border size or use the BBD path", stacklevel=2)
            _warned_tpu_lu = True
        return "lu32ir"
    return method


def factorize(A, method: str = "auto") -> DenseLU:
    method = resolve_method(method, A.shape[-1])
    if method == "gauss":
        return DenseLU(None, None, None, None, A, method)
    if method == "lu64":
        lu, piv = jsl.lu_factor(A)
        return DenseLU(lu, piv, None, None, A, method)
    if method == "gjpl32ir":
        from .pallas_solve import gj_solve_f32
        As, r, c = _equilibrate(A)
        n = A.shape[-1]
        eye = jnp.eye(n, dtype=LU_DTYPE)
        Ainv = gj_solve_f32(As.astype(LU_DTYPE), eye)
        return DenseLU(Ainv, None, r, c, A, method)
    As, r, c = _equilibrate(A)
    lu, piv = jsl.lu_factor(As.astype(LU_DTYPE))
    return DenseLU(lu, piv, r, c, A, method)


@partial(jax.jit, static_argnames=("method", "refine"))
def solve(A, b, method: str = "auto", refine: int = 2):
    return factorize(A, method).solve(b, refine=refine)


def solve_complex(Ar, Ai, br, bi, method: str = "lu64", refine: int = 2):
    """Solve (Ar + j Ai) x = (br + j bi) via the real 2Nx2N embedding.

    TPU has no complex LU; this is also what lets AC frequency sweeps batch
    with vmap over the stacked real system.
    """
    n = Ar.shape[0]
    A = jnp.block([[Ar, -Ai], [Ai, Ar]])
    b = jnp.concatenate([br, bi])
    x = solve(A, b, method=method, refine=refine)
    return x[:n], x[n:]
