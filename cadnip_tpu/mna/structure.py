"""Circuit construction and elaboration to a fixed-structure compiled form.

The reference discovers structure by running the builder through `MNAContext`
once, then restamps values through `DirectStampContext`
(Cadnip `src/mna/context.jl`, `src/mna/value_only.jl`). Here the split is
host/device: *all* structure (node table, unknown indices, device grouping,
scatter index arrays) is computed in Python at elaboration, and the traced
numeric code only ever sees fixed-shape gathers/scatters — the JAX analogue of
`compile_structure` (`src/mna/precompile.jl:312-443`).

Instances of the same `DeviceModel` form one *group*, evaluated as a single
vmapped batch (the TPU answer to the reference's serial chain of inlined stamp
calls, see SURVEY §2.10.4).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import DTYPE
from .devices import CLASS_I, CLASS_V, DeviceModel
from .spec import SimSpec
from .waveforms import Waveform, pack_waveforms

GROUND_NAMES = ("0", "gnd", "GND", "Gnd")


@dataclasses.dataclass
class Instance:
    model: DeviceModel
    name: str
    nodes: tuple                       # node names (terminals only)
    params: dict                       # scalar overrides
    wave: Optional[Waveform] = None
    # branch-current couplings (CCCS/CCVS sense a V source; mutual
    # inductance senses both inductors): instance names whose '#i' branch
    # unknowns are wired into 'isense*' terminals in order
    sense: tuple = ()


@dataclasses.dataclass
class Group:
    """All instances of one model, batched."""
    model: DeviceModel
    names: list
    conn: np.ndarray                   # [n_inst, n_local] global unknown idx
    params: dict                       # param name -> np.ndarray [n_inst]
    waves: Optional[list] = None       # list[Waveform] if model uses waveforms

    @property
    def n_inst(self):
        return len(self.names)


class Circuit:
    """Programmatic netlist. The SPICE/Spectre/VA front ends all lower to
    this API; users can also drive it directly."""

    def __init__(self, title: str = "circuit"):
        self.title = title
        self.instances: list[Instance] = []
        self._names = set()

    def add(self, model: DeviceModel, name: str, nodes, *,
            wave: Waveform | None = None, sense: str | None = None,
            **params):
        if name in self._names:
            raise ValueError(f"duplicate instance name {name!r}")
        unknown = set(params) - set(model.defaults)
        if unknown:
            raise ValueError(
                f"{name}: unknown parameter(s) {sorted(unknown)} for model "
                f"{model.name!r}; valid: {sorted(model.defaults)}")
        nodes = tuple(str(n) for n in nodes)
        if sense is None:
            sense = ()
        elif isinstance(sense, str):
            sense = (sense,)
        n_sense = sum(1 for t in model.terminals
                      if t.startswith("isense"))
        if len(sense) != n_sense:
            raise ValueError(f"{name}: model {model.name!r} needs "
                             f"{n_sense} sensed branch(es), got {len(sense)}")
        n_term = len(model.terminals) - n_sense
        if len(nodes) != n_term:
            raise ValueError(f"{name}: model {model.name!r} needs {n_term} "
                             f"nodes, got {len(nodes)}")
        self._names.add(name)
        self.instances.append(Instance(model, name, nodes, dict(params),
                                       wave, tuple(sense)))
        return self

    # convenience wrappers -------------------------------------------------
    def R(self, name, p, n, r):
        from .devices import RESISTOR
        return self.add(RESISTOR, name, (p, n), r=float(r))

    def C(self, name, p, n, c):
        from .devices import CAPACITOR
        return self.add(CAPACITOR, name, (p, n), c=float(c))

    def L(self, name, p, n, l):
        from .devices import INDUCTOR
        return self.add(INDUCTOR, name, (p, n), l=float(l))

    def V(self, name, p, n, wave=None, dc=0.0, acmag=0.0, acphase=0.0):
        from .devices import VSOURCE
        from .waveforms import DC
        if wave is None:
            wave = DC(dc)
        return self.add(VSOURCE, name, (p, n), wave=wave,
                        acmag=float(acmag), acphase=float(acphase))

    def I(self, name, p, n, wave=None, dc=0.0, acmag=0.0, acphase=0.0):
        from .devices import ISOURCE
        from .waveforms import DC
        if wave is None:
            wave = DC(dc)
        return self.add(ISOURCE, name, (p, n), wave=wave,
                        acmag=float(acmag), acphase=float(acphase))

    def D(self, name, anode, cathode, **params):
        from .devices import DIODE, DIODE_RS
        model = DIODE_RS if params.get("rs", 0.0) else DIODE
        return self.add(model, name, (anode, cathode), **params)

    def M(self, name, d, g, s, b="0", **params):
        from .devices import MOSFET1
        return self.add(MOSFET1, name, (d, g, s, b), **params)

    def compile(self, spec: SimSpec | None = None, *, solver: str = "auto",
                block_size: int | None = None) -> "CompiledCircuit":
        """solver: 'dense' | 'bbd' | 'auto' (BBD block-bordered-diagonal
        decomposition kicks in automatically for large circuits)."""
        cc = elaborate(self, spec or SimSpec())
        use_bbd = solver == "bbd" or (solver == "auto"
                                      and cc.n > 1536)
        if use_bbd:
            from .bbd_assemble import nested_border_partition, \
                partition_circuit
            cc.bbd = partition_circuit(cc, block_size=block_size)
            if cc.bbd is not None and cc.bbd.nb >= 1024:
                # past ~1k border unknowns the single dense Schur
                # factorization starts to dominate — add a second BBD
                # level over the border (nested Schur)
                cc.bbd_nested = nested_border_partition(cc, cc.bbd)
        return cc


@dataclasses.dataclass
class CompiledCircuit:
    """Fixed structure + default parameters; all solver entry points hang off
    this (the analogue of the reference's `MNACircuit`, `solve.jl:1585`)."""

    title: str
    n: int                              # number of unknowns (excl. ground)
    node_names: dict                    # node name -> unknown index
    names: dict                         # every named unknown -> index
    classes: np.ndarray                 # [n] CLASS_* per unknown
    groups: list                        # list[Group]
    spec: SimSpec
    param_slots: dict                   # "inst.param" -> (gi, pname, slot)
    inst_group: dict                    # inst name -> (gi, slot)
    cache: dict = dataclasses.field(default_factory=dict)  # jitted solvers
    bbd: object = None                  # BBDPartition for large circuits
    bbd_nested: object = None           # level-2 border partition (Schur)

    # ------------------------------------------------------------------ params
    def params0(self):
        """Default parameter pytree: list over groups of {name: f64[n_inst]},
        with packed waveforms under 'wave'."""
        out = []
        for g in self.groups:
            d = {k: jnp.asarray(v, DTYPE) for k, v in g.params.items()}
            if g.waves is not None:
                d["wave"] = pack_waveforms(g.waves)
            out.append(d)
        return out

    @staticmethod
    def _get_leaf(gparams, pname):
        """Resolve a (possibly dotted, e.g. 'wave.dc') param path."""
        if "." in pname:
            head, tail = pname.split(".", 1)
            return gparams[head], head, tail
        return gparams, None, pname

    def alter(self, params, **overrides):
        """Functionally update instance parameters: alter(p, **{'r1.r': 2e3}).
        Values may be scalars or arrays (for vmapped sweeps, add a leading
        batch axis and vmap the solver). Source DC values are addressable as
        'v1.dc' (stored under the packed waveform)."""
        params = [dict(d) for d in params]
        for key, val in overrides.items():
            if key not in self.param_slots:
                valid = ", ".join(sorted(self.param_slots)[:8])
                raise KeyError(f"unknown parameter {key!r}; e.g. {valid}")
            gi, pname, slot = self.param_slots[key]
            params[gi] = dict(params[gi])
            holder = params[gi]
            if "." in pname:
                head, pname = pname.split(".", 1)
                holder[head] = dict(holder[head])
                holder = holder[head]
            arr = holder[pname]
            val = jnp.asarray(val, DTYPE)
            if val.ndim == 0:
                holder[pname] = arr.at[..., slot].set(val)
            else:
                # batched override: broadcast group param to [batch, n_inst]
                batch = val.shape[0]
                if arr.ndim == 1:
                    arr = jnp.broadcast_to(arr, (batch,) + arr.shape)
                holder[pname] = arr.at[:, slot].set(val)
        return params

    def index_of(self, name: str) -> int:
        if name in self.names:
            return self.names[name]
        raise KeyError(f"unknown node/unknown {name!r}; known: "
                       f"{sorted(self.names)[:12]}...")

    def jit(self, fn, **kw):
        """jax.jit with per-circuit compiler options. Circuits carrying
        big VA models (PSP/BSIM class, host-setup hoisted) disable
        XLA:CPU's `fusion` pass: it is superlinear on 20k+ scalar-op
        graphs (PSP103's 1-FET group-eval: 65 s without the pass, >10 min
        with). The reference hits the same blowup class in LLVM and builds
        c6288 at -O0 (`benchmarks/vacask/run_benchmarks.jl:244-252`)."""
        import jax as _jax
        big = any(g.model.va_setup is not None for g in self.groups)
        # effective platform: a `with jax.default_device(cpu)` context
        # (the hybrid CPU-DC/TPU-transient flow for PSP-class circuits)
        # must hit the CPU compiler options even when the process default
        # backend is the TPU
        eff = getattr(_jax.config, "jax_default_device", None)
        plat = eff.platform if eff is not None else _jax.default_backend()
        if big and plat == "cpu":
            kw.setdefault("compiler_options",
                          {"xla_disable_hlo_passes": "fusion"})
        return _jax.jit(fn, **kw)


def elaborate(cir: Circuit, spec: SimSpec) -> CompiledCircuit:
    # ---- node table (ground excluded; padding slot == n_unknowns)
    node_names: dict[str, int] = {}
    for inst in cir.instances:
        for nd in inst.nodes:
            if nd in GROUND_NAMES or nd in node_names:
                continue
            node_names[nd] = len(node_names)
    n_nodes = len(node_names)

    # ---- group instances by model, preserving first-seen order
    order: list[DeviceModel] = []
    by_model: dict[DeviceModel, list[Instance]] = {}
    for inst in cir.instances:
        if inst.model not in by_model:
            by_model[inst.model] = []
            order.append(inst.model)
        by_model[inst.model].append(inst)

    # ---- allocate internal unknowns
    names = dict(node_names)
    classes = [CLASS_V] * n_nodes
    next_idx = n_nodes
    internal_idx: dict[tuple, int] = {}   # (inst_name, internal_name) -> idx
    branch_of: dict[str, int] = {}        # inst -> its 'i' branch unknown
    for model in order:
        cmap = dict(model.collapses)
        for inst in by_model[model]:
            for iname, icls in model.internals:
                if iname in cmap:
                    continue      # merged into its collapse target below
                idx = next_idx
                next_idx += 1
                internal_idx[(inst.name, iname)] = idx
                names[f"{inst.name}#{iname}"] = idx
                classes.append(icls)
                if iname == "i":
                    branch_of[inst.name] = idx
    n = next_idx
    ground = n  # padding slot

    def node_idx(nd: str) -> int:
        return ground if nd in GROUND_NAMES else node_names[nd]

    # resolve collapsed internals (VA `V(a,b) <+ 0` node merges, reference
    # detect_short_circuits `src/vasim.jl:2723`): the collapsed internal's
    # unknown IS its target's — terminal node, another internal (chains
    # resolve transitively), or ground
    for model in order:
        cmap = dict(model.collapses)
        if not cmap:
            continue
        terms = {t: i for i, t in enumerate(model.terminals)}
        for inst in by_model[model]:
            for iname, _ in model.internals:
                if iname not in cmap:
                    continue
                tgt, seen = iname, set()
                while tgt in cmap and tgt not in seen:
                    seen.add(tgt)
                    tgt = cmap[tgt]
                if tgt is None:
                    idx = ground
                elif tgt in terms:
                    idx = node_idx(inst.nodes[terms[tgt]])
                elif (inst.name, tgt) in internal_idx:
                    idx = internal_idx[(inst.name, tgt)]
                else:
                    raise ValueError(
                        f"{inst.name}: cannot resolve collapse target "
                        f"{tgt!r} for internal node {iname!r}")
                internal_idx[(inst.name, iname)] = idx
                names[f"{inst.name}#{iname}"] = idx

    # ---- build groups
    groups: list[Group] = []
    param_slots: dict[str, tuple] = {}
    inst_group: dict[str, tuple] = {}
    for gi, model in enumerate(order):
        insts = by_model[model]
        conn = np.full((len(insts), model.n_local), ground, np.int64)
        pvals = {k: np.full(len(insts), float(v))
                 for k, v in model.defaults.items()}
        waves = [] if any(i.wave is not None for i in insts) else None
        for si, inst in enumerate(insts):
            col = 0
            node_i = 0
            sense_i = 0
            for t in range(len(model.terminals)):
                tname = model.terminals[t]
                if tname.startswith("isense"):
                    target = inst.sense[sense_i]
                    sense_i += 1
                    if target not in branch_of:
                        raise ValueError(
                            f"{inst.name}: sensed device {target!r} has no "
                            f"branch current (must be a V source or "
                            f"inductor)")
                    conn[si, col] = branch_of[target]
                else:
                    conn[si, col] = node_idx(inst.nodes[node_i])
                    node_i += 1
                col += 1
            for iname, _ in model.internals:
                conn[si, col] = internal_idx[(inst.name, iname)]
                col += 1
            for k, v in inst.params.items():
                pvals[k][si] = float(v)
            for k in model.defaults:
                param_slots[f"{inst.name}.{k}"] = (gi, k, si)
            if waves is not None:
                # expose the DC value of the source waveform for alter/sweep
                param_slots[f"{inst.name}.dc"] = (gi, "wave.dc", si)
            inst_group[inst.name] = (gi, si)
            if waves is not None:
                from .waveforms import DC as _DC
                waves.append(inst.wave if inst.wave is not None else _DC(0.0))
        groups.append(Group(model=model, names=[i.name for i in insts],
                            conn=conn, params=pvals, waves=waves))

    return CompiledCircuit(
        title=cir.title, n=n, node_names=node_names, names=names,
        classes=np.asarray(classes, np.int32), groups=groups, spec=spec,
        param_slots=param_slots, inst_group=inst_group)
