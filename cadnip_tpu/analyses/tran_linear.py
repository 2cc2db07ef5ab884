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
        # W[i, j] = T^(i-j) for j <= i else 0   (i, j in 0..block-1),
        # flattened to one [B*2n, B*2n] lower-block-triangular matrix so the
        # convolution is a single large matmul (fast compile, MXU-friendly)
        m2 = 2 * n
        ii = np.arange(block)[:, None]
        jj = np.arange(block)[None, :]
        idx = np.where(jj <= ii, ii - jj, 0)
        mask = (jj <= ii)[..., None, None]
        W = jnp.where(jnp.asarray(mask), Tp[idx], 0.0)   # [B,B,2n,2n]
        Wm = W.transpose(0, 2, 1, 3).reshape(block * m2, block * m2)

        u_flat = u.reshape(nb, block * m2)

        # 1) within-block causal convolutions, batched over ALL blocks at
        #    once: conv[m, i] = sum_{j<=i} T^(i-j) u[mB+j]
        conv = u_flat @ Wm.T                              # [nb, B*2n]
        conv = conv.reshape(nb, block, m2)

        # 2) block-end recurrence Z_{m+1} = T^B Z_m + conv[m, -1]: the only
        #    sequential piece — nb tiny matvecs in a scan
        TB = Tp[block]

        def scan_body(z, s):
            return TB @ z + s, z

        _, Zstart = jax.lax.scan(scan_body, z0, conv[:, -1])  # [nb, 2n]

        # 3) expand every in-block state: z_{mB+i+1} = T^(i+1) Z_m + conv
        Pm = Tp[1:block + 1].reshape(block * m2, m2)      # [B*2n, 2n]
        Z = (Zstart @ Pm.T).reshape(nb, block, m2) + conv
        Z = Z.reshape(n_pad, m2)[:n_steps]
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
        # linear circuit: the operating point is ONE linear solve (no
        # Newton chain — also avoids compiling the DC fallback machinery)
        okey = ("linear_op",)
        if okey not in cc.cache:
            assemble = make_assembler(cc)
            method = solve_method_for_backend()

            def linear_op(params, dyn):
                zp = jnp.zeros(cc.n + 1, DTYPE)
                lim = assemble.init_lim(zp)
                F, _, G, _, _ = assemble(zp, lim, params, dyn)
                from ..ops.linalg import solve as _solve
                return _solve(G, -F, method=method)

            cc.cache[okey] = jax.jit(linear_op)
        x0 = cc.cache[okey](params, cc.spec.dyn(mode=MODE_TRANOP,
                                                time=t0))
        op_conv = bool(np.isfinite(np.asarray(x0)).all())
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
