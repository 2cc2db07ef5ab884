"""Parameter sensitivities of DC solutions.

The reference differentiates *through* the whole solve with ForwardDiff
(SURVEY §4.9 note). Here DC sensitivities use the implicit function theorem
at the converged Newton point — exact, and one extra linear solve per
parameter against the already-assembled Jacobian:

    F(x*, p) = 0   =>   dx*/dp = -G(x*)^{-1} ∂F/∂p.

∂F/∂p comes from jax.jvp of the assembler w.r.t. the parameter pytree
(one-hot tangents), vmapped over the requested parameters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DTYPE, solve_method_for_backend
from ..mna.assemble import make_assembler, pad_state
from ..mna.spec import MODE_DCOP
from ..mna.structure import CompiledCircuit
from ..ops.linalg import solve as dense_solve
from .dc import dc


def _float_leaf_index(params, gi, pn):
    """Flat index (among float leaves) of params[gi][pn]."""
    paths_leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    fi = 0
    for path, leaf in paths_leaves:
        is_float = jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
        match = (len(path) == 2
                 and getattr(path[0], "idx", None) == gi
                 and getattr(path[1], "key", None) == pn)
        if match:
            if not is_float:
                raise TypeError(f"parameter {pn!r} is not differentiable")
            return fi
        if is_float:
            fi += 1
    raise KeyError((gi, pn))


def _float_partition(params):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    float_ix = [i for i, l in enumerate(leaves)
                if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]

    def rebuild(float_leaves):
        out = list(leaves)
        for i, fl in zip(float_ix, float_leaves):
            out[i] = fl
        return jax.tree_util.tree_unflatten(treedef, out)

    return tuple(leaves[i] for i in float_ix), rebuild


def dc_sensitivity(cc: CompiledCircuit, names, params=None, *, sol=None,
                   mode=MODE_DCOP, time=0.0):
    """d(x*)/d(param) for each 'inst.param' in names.

    Returns {name: array [n]} (leading sweep axes pass through if sol/params
    are batched is NOT yet supported — single-point only).
    """
    if isinstance(names, str):
        names = [names]
    if params is None:
        params = cc.params0()
    if sol is None:
        sol = dc(cc, params, mode=mode, time=time)
    x = jnp.asarray(sol.x, DTYPE)

    key = ("dc_sens",)
    if key not in cc.cache:
        assemble = make_assembler(cc)
        method = solve_method_for_backend()

        def sens(x, params, dyn, tangents):
            xp = pad_state(x)
            lim = assemble.init_lim(xp)
            pf, rebuild = _float_partition(params)

            def Ffun(pf_):
                F, _, _, _, _ = assemble(xp, lim, rebuild(pf_), dyn)
                return F

            _, _, G, _, _ = assemble(xp, lim, params, dyn)

            def one(tan):
                _, dF = jax.jvp(Ffun, (pf,), (tan,))
                return dense_solve(G, -dF, method=method)

            return jax.vmap(one)(tangents)

        cc.cache[key] = cc.jit(sens)

    # one-hot tangents over the float leaves, stacked over requested params
    pf, _ = _float_partition(params)
    tangents = []
    for nm in names:
        gi, pn, slot = cc.param_slots[nm]
        fi = _float_leaf_index(params, gi, pn)
        tan = tuple(jnp.zeros_like(l) for l in pf)
        tan = tuple(l.at[..., slot].set(1.0) if i == fi else l
                    for i, l in enumerate(tan))
        tangents.append(tan)
    tangents = jax.tree.map(lambda *xs: jnp.stack(xs), *tangents) \
        if len(tangents) > 1 else jax.tree.map(lambda a: a[None],
                                               tangents[0])
    dyn = cc.spec.dyn(mode=mode, time=time)
    S = cc.cache[key](x, params, dyn, tangents)
    return {nm: S[i] for i, nm in enumerate(names)}
