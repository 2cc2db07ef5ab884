"""Pallas Gauss-Jordan solve kernel: correctness in interpreter mode (the
real-kernel path is exercised on TPU hardware by bench runs)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cadnip_tpu.ops.pallas_solve import gj_solve_f32


def test_gj_pivoting_zero_diagonal():
    rng = np.random.default_rng(0)
    n = 19
    A = rng.standard_normal((n, n)) + np.eye(n) * 3
    A[5, 5] = 0.0          # MNA V-source row: zero diagonal forces pivoting
    b = rng.standard_normal(n)
    x = gj_solve_f32(jnp.asarray(A), jnp.asarray(b), interpret=True)
    assert np.max(np.abs(np.asarray(x) - np.linalg.solve(A, b))) < 1e-4


def test_gj_matrix_rhs_and_vmap():
    rng = np.random.default_rng(1)
    n = 12
    A = rng.standard_normal((n, n)) + np.eye(n) * 4
    B = rng.standard_normal((n, 3))
    X = gj_solve_f32(jnp.asarray(A), jnp.asarray(B), interpret=True)
    assert np.max(np.abs(np.asarray(X) - np.linalg.solve(A, B))) < 1e-4
    # vmap path (batched masked-XLA fallback)
    bs = jnp.asarray(rng.standard_normal((4, n)))
    xs = jax.vmap(lambda b: gj_solve_f32(jnp.asarray(A), b,
                                         interpret=True))(bs)
    ref = np.linalg.solve(A, np.asarray(bs).T).T
    assert np.max(np.abs(np.asarray(xs) - ref)) < 1e-4
