"""Global numeric configuration.

Circuit simulation needs ~double precision for Newton convergence and
LTE-controlled integration (node voltages 1e-9..1e3 V, currents 1e-15..1 A).
On TPU:
  * f64 elementwise ops and matmuls work (software emulated),
  * LU decomposition is only implemented for f32 (and nominally c64, which is
    unimplemented on v5e).
So the framework evaluates residuals/Jacobians in float64 and solves linear
systems with equilibrated f32 LU + iterative refinement in f64
(see `cadnip_tpu.ops.linalg`). On CPU the solve is native f64.

This module must be imported before any JAX computation is traced.
"""
from __future__ import annotations

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache (opt-in via CADNIP_COMPILE_CACHE=<dir>):
# TPU compiles for the jitted solvers are tens of seconds through the remote
# compile service; bench.py enables this. Not on by default because CPU AOT
# entries are machine-feature-specific and may not transfer.
_cache_dir = os.environ.get("CADNIP_COMPILE_CACHE", "")
if _cache_dir and _cache_dir != "0":
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

import jax.numpy as jnp  # noqa: E402

#: working dtype for residual evaluation and state vectors
DTYPE = jnp.float64
#: dtype used inside LU factorization on TPU
LU_DTYPE = jnp.float32


def default_backend() -> str:
    return jax.default_backend()


def effective_platform() -> str:
    """Platform that a jit traced RIGHT NOW will target: honors a
    `with jax.default_device(...)` context (the hybrid CPU-op/TPU-window
    flows), falling back to the process default backend. Backend-
    dependent lowering choices (Pallas kernels, f32 Jacobians, loop
    styles) must use this, not jax.default_backend() — the latter keeps
    reporting the TPU inside the CPU context (measured: the CPU-side DC
    solve picked the Mosaic Gauss-Jordan kernel and failed to lower)."""
    eff = getattr(jax.config, "jax_default_device", None)
    if eff is not None:
        return eff.platform
    return jax.default_backend()


def solve_method_for_backend(backend: str | None = None) -> str:
    """Linear-solve method selector. 'auto' resolves per system size in
    ops.linalg.resolve_method: native f64 LU on CPU; on TPU, unrolled
    Gauss-Jordan (full f64, no LU-expander while-loops) for circuit-sized
    systems and equilibrated f32 LU + f64 refinement above that."""
    return "auto"
