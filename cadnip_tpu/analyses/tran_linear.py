"""Fixed-step transient for linear (affine) circuits — the TPU fast path.

For a circuit whose devices are all affine (R, C, L, V, I, E/G/F/H, K), the
MNA system is G x + C dx/dt = b(t) with constant G, C. A fixed-step
trapezoidal discretization is the affine recurrence

    z_k = T z_{k-1} + U b_k,        z = [x; qdot]  (2n state)

with constant T, U. Instead of stepping serially (the reference's IDA walks
~1e6 steps one by one, `benchmarks/vacask/rc`), the recurrence is evaluated
by *blocked prefix products*:

  * all source values b_k are evaluated vectorized over the whole time grid
    (embarrassingly parallel),
  * matrix powers T^i (i <= B) and the lower-triangular block-convolution
    tensor W[i,j] = T^(i-j) are precomputed once,
  * a lax.scan over n_steps/B blocks does ONE batched einsum per block
    (MXU work), recovering every intermediate state exactly.

Wall-clock becomes O(n_steps/B) sequential steps of dense batched compute —
this is how a 1M-point RC transient beats CPU simulators by orders of
magnitude on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DTYPE, solve_method_for_backend
from ..mna.assemble import make_assembler, make_rhs_assembler, pad_state
from ..mna.spec import MODE_TRAN, MODE_TRANOP
from ..mna.structure import CompiledCircuit
from ..ops.linalg import factorize
from .dc import dc
from .tran import TranSolution, TranStats


def is_linear(cc: CompiledCircuit) -> bool:
    return all(g.model.linear for g in cc.groups)


def make_linear_runner(cc: CompiledCircuit, n_steps: int, block: int = 256):
    """Build run(x0, params, t0, dt) -> xs [n_steps+1, n] (exact trap)."""
    assemble = make_assembler(cc)
    rhs = make_rhs_assembler(cc)
    n = cc.n
    nb = int(np.ceil(n_steps / block))
    n_pad = nb * block

    def run(x0, params, t0, dt):
        dyn = cc.spec.dyn(mode=MODE_TRAN)
        xp0 = pad_state(x0)
        lim = assemble.init_lim(xp0)
        _, _, G, C, _ = assemble(xp0, lim, params,
                                 dyn._replace(time=t0))
        # b(t) = -F(0, t) (affine residual: F = Gx - b)
        zeros = jnp.zeros(n + 1, DTYPE)

        def b_at(t):
            F, _ = rhs(zeros, params, dyn._replace(time=t))
            return -F

        ts = t0 + dt * jnp.arange(1, n_pad + 1, dtype=DTYPE)
        B = jax.vmap(b_at)(ts)                       # [n_pad, n]

        c = 2.0 / dt
        K = G + c * C
        # K^-1 via the TPU-safe mixed-precision solver (no f64 LU on TPU)
        lu = factorize(K, solve_method_for_backend())
        Kinv = jax.vmap(lu.solve)(jnp.eye(n, dtype=DTYPE)).T
        A1 = Kinv @ (c * C)
        A2 = Kinv
        eye = jnp.eye(n, dtype=DTYPE)
        T = jnp.block([[A1, A2],
                       [c * C @ (A1 - eye), c * C @ A2 - eye]])
        U = jnp.concatenate([A2, c * C @ A2], axis=0)    # [2n, n]

        # initial state: x0 and consistent qdot0 = -f(x0, t0)
        F0, _ = rhs(xp0, params, dyn._replace(time=t0))
        z0 = jnp.concatenate([x0, -F0])

        u = B @ U.T                                   # [n_pad, 2n]

        # matrix powers T^0..T^block
        def pow_body(P, _):
            return P @ T, P

        _, Tp = jax.lax.scan(pow_body, jnp.eye(2 * n, dtype=DTYPE),
                             None, length=block + 1)
        # W[i, j] = T^(i-j) for j <= i else 0   (i, j in 0..block-1)
        ii = np.arange(block)[:, None]
        jj = np.arange(block)[None, :]
        idx = np.where(jj <= ii, ii - jj, 0)
        mask = (jj <= ii)[..., None, None]
        W = jnp.where(jnp.asarray(mask), Tp[idx], 0.0)   # [B,B,2n,2n]
        Tp_shift = Tp[1:block + 1]                       # T^1..T^B

        u_blocks = u.reshape(nb, block, 2 * n)

        def scan_body(z, ub):
            zs = jnp.einsum("iab,b->ia", Tp_shift, z) + \
                jnp.einsum("ijab,jb->ia", W, ub)
            return zs[-1], zs

        _, Z = jax.lax.scan(scan_body, z0, u_blocks)
        Z = Z.reshape(n_pad, 2 * n)[:n_steps]
        xs = jnp.concatenate([x0[None, :], Z[:, :n]], axis=0)
        return xs

    return run


def auto_block(n: int, budget_bytes: float = 64e6) -> int:
    """Largest power-of-two block with W tensor under the memory budget."""
    b = int(np.sqrt(budget_bytes / ((2 * n) ** 2 * 8)))
    b = max(16, min(512, b))
    return 1 << (b.bit_length() - 1)


def tran_linear(cc: CompiledCircuit, tspan, dt, params=None, *,
                block: int | None = None, x0=None) -> TranSolution:
    """Fixed-step trapezoidal transient for linear circuits."""
    if not is_linear(cc):
        raise ValueError("tran_linear requires an all-linear circuit; "
                         "use tran() instead")
    if block is None:
        block = auto_block(cc.n)
    t0, tstop = float(tspan[0]), float(tspan[1])
    n_steps = int(round((tstop - t0) / dt))
    if params is None:
        params = cc.params0()
    op_conv = True
    if x0 is None:
        op = dc(cc, params, mode=MODE_TRANOP, time=t0)
        x0, op_conv = op.x, op.converged
    key = ("tran_linear", n_steps, block)
    if key not in cc.cache:
        cc.cache[key] = jax.jit(make_linear_runner(cc, n_steps, block))
    xs = cc.cache[key](jnp.asarray(x0, DTYPE), params,
                       jnp.asarray(t0, DTYPE), jnp.asarray(dt, DTYPE))
    ts = t0 + dt * np.arange(n_steps + 1)
    z = jnp.int32(0)
    stats = TranStats(naccept=jnp.int32(n_steps), nreject=z, nnewton=z,
                      fail=jnp.asarray(False))
    return TranSolution(cc, ts, xs, stats, op_converged=op_conv)
