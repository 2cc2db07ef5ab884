"""Batched residual/Jacobian assembly.

Per device group: gather local unknowns, evaluate the residual and its local
Jacobian with `jax.linearize` (one primal pass + n_local tangent passes, all
vmapped over instances), then scatter-add into the global system. Ground is a
padding slot (index n): gathers read 0.0 from it and scatters into row/col n
are sliced away — the fixed-shape equivalent of the reference's
`GroundIndex` no-op stamps (Cadnip `src/mna/context.jl:40-101`).

Dense backend first (right answer for the vmapped-sweep regime where batched
dense LU dominates); the scatter index arrays are exactly the COO->nzval maps
a sparse backend needs (`src/mna/precompile.jl:253`), so sparse plugs in here.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DTYPE
from .devices import CLASS_I, CLASS_Q, CLASS_V
from .spec import DynSpec
from .structure import CompiledCircuit


def host_fetch(tree):
    """Device->host copy of a param pytree with ASYNC prefetch: on the
    axon TPU backend every blocking np.asarray is a tunnel roundtrip
    (~0.2-0.5 s), and a PSP-class circuit's per-name param tree has
    >3,000 leaves — serial fetches cost tens of minutes. Issuing
    copy_to_host_async on every leaf first pipelines the transfers."""
    import jax as _jax
    leaves = _jax.tree_util.tree_leaves(tree)
    for v in leaves:
        if hasattr(v, "copy_to_host_async"):
            try:
                v.copy_to_host_async()
            except Exception:
                pass
    return _jax.tree_util.tree_map(lambda v: np.asarray(v), tree)


def ensure_setup(cc, params, dyn=None):
    """Inject the host-setup value matrix p['__setup__'] for every group
    whose model hoists its setup pass (big VA models — see
    DeviceModel.va_setup). Called at every solver entry point so altered/
    swept parameters are honored; results are cached per (group, params,
    temperature). A no-op when params are tracers (the traced in-graph
    setup path then runs instead) or when no group hoists."""
    if not any(g.model.va_setup is not None for g in cc.groups):
        return params
    if dyn is None:
        dyn = cc.spec.dyn()
    try:
        temp = float(np.asarray(dyn.temp))
    except Exception:
        return params
    out = list(params)
    cache = cc.cache.setdefault("__setup_cache__", {})
    for gi, g in enumerate(cc.groups):
        if g.model.va_setup is None:
            continue
        p = dict(out[gi])
        try:
            arrs = host_fetch({k: v for k, v in p.items()
                               if k != "__setup__"})
        except Exception:
            continue      # traced params: leave the in-graph path
        fp = (gi, temp, tuple(sorted(
            (k, v.tobytes()) for k, v in arrs.items())))
        mat = cache.get(fp)
        if mat is None:
            mat = _setup_disk_get(g.model, fp)
        if mat is None:
            mat = g.model.va_setup(arrs, dyn)
            _setup_disk_put(g.model, fp, mat)
        cache[fp] = mat
        p["__setup__"] = jnp.asarray(mat, DTYPE)
        out[gi] = p
    return out


def _setup_disk_path(model, fp):
    """Disk-cache path for a hoisted setup matrix: the PSP103-class
    eager setup pass costs ~100 s of host CPU per PROCESS (measured on
    the VACASK ring: 107 s), so it rides the same persistent cache dir
    as the XLA executables (CADNIP_COMPILE_CACHE), keyed by model name
    + a content hash of (group params, temperature)."""
    import hashlib
    d = os.environ.get("CADNIP_COMPILE_CACHE", "")
    if not d or d == "0" or not os.path.isdir(d):
        return None
    h = hashlib.sha256(repr(fp).encode()).hexdigest()[:24]
    return os.path.join(d, f"vasetup_{model.name}_{h}.npy")


def _setup_disk_get(model, fp):
    path = _setup_disk_path(model, fp)
    if path and os.path.exists(path):
        try:
            return np.load(path)
        except Exception:
            return None
    return None


def _setup_disk_put(model, fp, mat):
    path = _setup_disk_path(model, fp)
    if path:
        try:
            np.save(path + ".tmp.npy", np.asarray(mat))
            os.replace(path + ".tmp.npy", path)
        except Exception:
            pass


def make_sorted_scatter(idx_arrays, out_size):
    """Host-precomputed scatter-add plan: concatenate the flattened stamp
    destinations of every group, argsort ONCE at build time, and at trace
    time gather values through the permutation and segment-sum into the
    unique destinations. The final scatter is sorted + unique, which XLA
    lowers to a fast path on TPU — naive `.at[idx].add` with duplicate
    unsorted f64 indices is the dominant assembly cost at c6288 scale
    (the host plan is the analogue of the reference's COO->nzval maps,
    `src/mna/precompile.jl:253`)."""
    idx = np.concatenate([np.asarray(a, np.int64).reshape(-1)
                          for a in idx_arrays])
    perm = np.argsort(idx, kind="stable")
    si = idx[perm]
    uniq, seg_starts = np.unique(si, return_index=True)
    seg_ids = np.zeros(len(si), np.int64)
    seg_ids[seg_starts[1:]] = 1
    seg_ids = np.cumsum(seg_ids)
    permj = jnp.asarray(perm, jnp.int32)
    segj = jnp.asarray(seg_ids, jnp.int32)
    uniqj = jnp.asarray(uniq, jnp.int32)
    U = int(len(uniq))

    def scatter(out, vals_list):
        vals = jnp.concatenate([v.reshape(-1) for v in vals_list])
        sums = jax.ops.segment_sum(vals[permj], segj, num_segments=U,
                                   indices_are_sorted=True)
        return out.at[uniqj].add(sums, indices_are_sorted=True,
                                 unique_indices=True)

    return scatter


def _lim_seed(model, conn, x_pad):
    """Initial limiter state for one group, flattened.

    Node-moving models seed with a copy of the gathered state; site-based
    VA models seed each branch variable with its branch voltage (the
    reference's tracking-row semantics, `vasim.jl:3097-3140`)."""
    if model.residual_lim is None:
        return x_pad[conn].reshape(-1)
    cols = []
    for (pl, nl) in model.lim_branches:
        vp = x_pad[conn[:, pl]]
        vn = x_pad[conn[:, nl]] if nl is not None else 0.0
        cols.append(vp - vn)
    return jnp.stack(cols, axis=1).reshape(-1)


def _group_eval_sites(model, u, w_prev, p, dyn):
    """VA `$limit` site-based limiting for ONE instance (reference dual
    slots + lim_rhs, `vasim.jl:3012-3146`).

    w_prev [B]: per-branch limiter state (last evaluation voltages). The
    residual_lim interpreter returns straight-through passthroughs (value at
    the limited point, conductance wired to the nodes); the companion
    anchoring F += (∂F/∂w_site)·(vnew − w_site) comes out of ONE extra
    tangent pass through the d-argument."""
    S = model.n_lim_sites
    zd = jnp.zeros(S, u.dtype)

    def fq(uu, dd):
        (f, q), aux = model.residual_lim(uu, dd, w_prev, p, dyn)
        return (f, q), aux

    (f, q), lin, aux = jax.linearize(fq, u, zd, has_aux=True)
    w_new, vnew, wsite = aux
    eye = jnp.eye(u.shape[0], dtype=u.dtype)
    Jt, Ct = jax.vmap(lambda e: lin(e, zd))(eye)
    J, C = Jt.T, Ct.T
    df, dq = lin(jnp.zeros_like(u), vnew - wsite)
    return f + df, q + dq, J, C, w_new


_FD_JAC = os.environ.get("CADNIP_FD_JAC", "1") != "0"
_FD_H = 1e-4


def _group_eval_fd(model, u, p, dyn):
    """Batched central-difference local Jacobian for ONE instance of a
    BIG VA model (PSP/BSIM class, `va_setup` hoisted).

    Why not `jax.linearize` here: the jvp graph of a ~28k-op compiled
    PSP103 residual roughly triples the HLO op count, which (a) is the
    graph the axon remote-TPU compile helper fails to return on, and
    (b) is where the backend's fusion-reordering NaN pathology lives
    (see va/codegen.py CADNIP_VA_BARRIER note). Central differences keep
    the compiled graph at ONE batched primal evaluation — the 2*n_local
    perturbed points ride the batch dimension, so runtime cost matches
    the tangent passes they replace.

    Accuracy: h = 1e-4*(1+|u|) central => truncation ~(h/nVt)^2/6 ~ 3e-6
    relative on junction exponentials; on the TPU backend's emulated f64
    (transcendentals at f32 accuracy, ~5e-8 relative noise) the noise
    term is ~6e-6 relative. Newton convergence tests (dx/residual) are
    unaffected — the solution converges on the exact residual."""
    nl = u.shape[0]
    f0, q0 = model.residual(u, p, dyn)
    h = _FD_H * (1.0 + jnp.abs(u))
    E = jnp.eye(nl, dtype=u.dtype) * h[None, :]
    U = jnp.concatenate([u[None, :] + E, u[None, :] - E], 0)
    fs, qs = jax.vmap(lambda uu: model.residual(uu, p, dyn))(U)
    inv2h = 1.0 / (2.0 * h)
    J = (fs[:nl] - fs[nl:]).T * inv2h[None, :]
    C = (qs[:nl] - qs[nl:]).T * inv2h[None, :]
    return f0, q0, J, C, u


def _group_eval(model, u, u_lim_prev, p, dyn):
    """Residual, charge, and their local Jacobians for ONE instance, with
    limiting applied and the companion anchored at the limited point.

    `u_lim_prev` is the evaluation point the device was limited to on the
    PREVIOUS Newton iteration — SPICE limiter state semantics (the reference
    materializes these as extra limit unknowns, `vasim.jl:3012-3017`). Using
    the previous raw iterate instead breaks limiting whenever the iterate
    oscillates back to the same value.
    """
    if model.residual_lim is not None:
        return _group_eval_sites(model, u, u_lim_prev, p, dyn)
    if model.va_setup is not None and _FD_JAC:
        return _group_eval_fd(model, u, p, dyn)
    u_eval = (model.limit(u, u_lim_prev, p, dyn)
              if model.limit is not None else u)

    def fq(uu):
        return model.residual(uu, p, dyn)

    (f, q), lin = jax.linearize(fq, u_eval)
    eye = jnp.eye(u.shape[0], dtype=u.dtype)
    # lin(e_j) = (J @ e_j, C @ e_j): stacking over j gives the transposes
    Jt, Ct = jax.vmap(lin)(eye)
    J, C = Jt.T, Ct.T
    du = u - u_eval
    f = f + J @ du
    q = q + C @ du
    return f, q, J, C, u_eval


def make_assembler(cc: CompiledCircuit):
    """Build the assembly closures for a compiled circuit.

    Returns an object with:
      assemble(x_pad, lim, params, dyn) -> (F, Q, G, C, lim_new)
      init_lim(x_pad) -> lim          (limiter state seeded from a state)

    x_pad has length n+1 (ground slot last, always 0). F/Q have length n;
    G/C are dense [n, n]. `lim` holds each limited device's last evaluation
    point, concatenated over groups ([n_lim_total] flat). All shapes fixed at
    trace time.
    """
    n = cc.n
    np1 = n + 1
    consts = []
    lim_off = 0
    dly_off = 0
    for g in cc.groups:
        conn = jnp.asarray(g.conn, jnp.int32)
        lin = (g.conn[:, :, None] * np1 + g.conn[:, None, :]).reshape(-1)
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
        dsl = None
        if g.model.n_delay_sites:
            S = g.model.n_delay_sites
            size = g.conn.shape[0] * S
            dsl = (dly_off, dly_off + size, (g.conn.shape[0], S))
            dly_off += size
        consts.append((g.model, conn, lin, sl, dsl))
    n_lim = lim_off
    n_delay = dly_off
    fq_scatter = make_sorted_scatter([g.conn for g in cc.groups], np1)
    gc_scatter = make_sorted_scatter([c[2] for c in consts], np1 * np1)
    # gshunt lands on node-voltage diagonals only (reference build.jl gshunt)
    vnode_idx = jnp.asarray(np.where(cc.classes == CLASS_V)[0], jnp.int32)

    def init_lim(x_pad):
        if n_lim == 0:
            return jnp.zeros(0, DTYPE)
        parts = []
        for model, conn, _, sl, _ in consts:
            if sl is None:
                continue
            parts.append(_lim_seed(model, conn, x_pad))
        return jnp.concatenate(parts)

    def assemble(x_pad, lim, params, dyn: DynSpec, dly=None):
        lim_new = lim
        fs, qs, Js, Cs = [], [], [], []
        for (model, conn, lin, sl, dsl), p in zip(consts, params):
            u = x_pad[conn]
            if dsl is not None and dly is not None:
                # delayed-expression history values, per instance
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
        F = fq_scatter(jnp.zeros(np1, DTYPE), fs)
        Q = fq_scatter(jnp.zeros(np1, DTYPE), qs)
        Gf = gc_scatter(jnp.zeros(np1 * np1, DTYPE), Js)
        Cf = gc_scatter(jnp.zeros(np1 * np1, DTYPE), Cs)
        G = Gf.reshape(np1, np1)[:n, :n]
        C = Cf.reshape(np1, np1)[:n, :n]
        F = F[:n]
        Q = Q[:n]
        # gshunt homotopy shunts on node diagonals (residual AND jacobian)
        F = F.at[vnode_idx].add(dyn.gshunt * x_pad[vnode_idx])
        G = G.at[vnode_idx, vnode_idx].add(dyn.gshunt)
        return F, Q, G, C, lim_new

    assemble.init_lim = init_lim
    assemble.n_lim = n_lim
    assemble.n_delay = n_delay
    return assemble


def make_delay_meta(cc: CompiledCircuit):
    """Delay-history metadata for circuits with absdelay devices: returns
    None, or an object with `.size` (total delay sites over all instances)
    and `.probe(x_pad, params, dyn) -> (vals [size], taus [size])` — the
    instantaneous values and delays of every absdelay'd expression, in the
    flat order the assembler's '__dly__' injection expects."""
    metas = []
    size = 0
    for gi, g in enumerate(cc.groups):
        if not g.model.n_delay_sites:
            continue
        metas.append((gi, g.model, jnp.asarray(g.conn, jnp.int32)))
        size += g.conn.shape[0] * g.model.n_delay_sites
    if not metas:
        return None

    def probe(x_pad, params, dyn):
        vals, taus = [], []
        for gi, model, conn in metas:
            u = x_pad[conn]
            v, t = jax.vmap(model.delay_probe,
                            in_axes=(0, 0, None))(u, params[gi], dyn)
            vals.append(v.reshape(-1))
            taus.append(t.reshape(-1))
        return jnp.concatenate(vals), jnp.concatenate(taus)

    class _Meta:
        pass

    m = _Meta()
    m.size = size
    m.probe = probe
    return m


def make_rhs_assembler(cc: CompiledCircuit):
    """Residual-only assembly: rhs(x_pad, params, dyn) -> (F, Q), no
    Jacobians, no limiting. Used for consistent qdot computation
    (qdot = -f at a converged point) and for vectorized source evaluation in
    the linear fast path."""
    n = cc.n
    np1 = n + 1
    consts = [(g.model, jnp.asarray(g.conn, jnp.int32)) for g in cc.groups]
    vnode_idx = jnp.asarray(np.where(cc.classes == CLASS_V)[0], jnp.int32)

    def rhs(x_pad, params, dyn: DynSpec):
        F = jnp.zeros(np1, DTYPE)
        Q = jnp.zeros(np1, DTYPE)
        for (model, conn), p in zip(consts, params):
            u = x_pad[conn]
            f, q = jax.vmap(model.residual, in_axes=(0, 0, None))(u, p, dyn)
            flat = conn.reshape(-1)
            F = F.at[flat].add(f.reshape(-1))
            Q = Q.at[flat].add(q.reshape(-1))
        F = F[:n].at[vnode_idx].add(dyn.gshunt * x_pad[vnode_idx])
        return F, Q[:n]

    return rhs


def make_ac_rhs(cc: CompiledCircuit):
    """Build b_ac(params) -> (br, bi): the small-signal excitation vector from
    sources with nonzero acmag (reference `stamp_b_ac!`, `context.jl:945-1014`
    deferred AC channel)."""
    n = cc.n
    rows_signs = []
    for gi, g in enumerate(cc.groups):
        if not g.model.ac_rhs:
            continue
        for local, sign in g.model.ac_rhs:
            rows = jnp.asarray(g.conn[:, local], jnp.int32)
            rows_signs.append((gi, rows, sign))

    def b_ac(params):
        br = jnp.zeros(n + 1, DTYPE)
        bi = jnp.zeros(n + 1, DTYPE)
        for gi, rows, sign in rows_signs:
            mag = params[gi]["acmag"]
            ph = params[gi]["acphase"] * (jnp.pi / 180.0)
            br = br.at[rows].add(sign * mag * jnp.cos(ph))
            bi = bi.at[rows].add(sign * mag * jnp.sin(ph))
        return br[:n], bi[:n]

    return b_ac


def pad_state(x):
    """Append the ground slot (0.0)."""
    return jnp.concatenate([x, jnp.zeros(x.shape[:-1] + (1,), x.dtype)],
                           axis=-1)
