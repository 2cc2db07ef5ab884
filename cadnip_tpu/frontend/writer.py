"""Netlist writers: Circuit -> SPICE text (and, combined with the parsers,
dialect conversion Spectre -> SPICE etc. — the core of what the reference's
SpiceArmyKnife `spak-convert` does, SURVEY §2.8)."""
from __future__ import annotations

from ..mna import devices as dv
from ..mna import waveforms as wf
from ..mna.structure import Circuit


def _fmt(v: float) -> str:
    return f"{v:.12g}"


def _wave_str(w) -> str:
    if w is None or w.kind == wf.WAVE_DC:
        return ""
    c = w.coeffs
    if w.kind == wf.WAVE_PULSE:
        return "PULSE(" + " ".join(_fmt(x) for x in c) + ")"
    if w.kind == wf.WAVE_SIN:
        return "SIN(" + " ".join(_fmt(x) for x in c) + ")"
    if w.kind == wf.WAVE_PWL:
        return "PWL(" + " ".join(_fmt(x) for x in c) + ")"
    if w.kind == wf.WAVE_EXP:
        return "EXP(" + " ".join(_fmt(x) for x in c) + ")"
    if w.kind == wf.WAVE_SFFM:
        return "SFFM(" + " ".join(_fmt(x) for x in c) + ")"
    return ""


def to_spice(cir: Circuit) -> str:
    """Serialize a Circuit to SPICE netlist text. Built-in devices emit
    native SPICE cards; VA/behavioral devices emit N-cards with inline
    parameter overrides (round-trippable through our own parser)."""
    lines = [cir.title or "converted netlist"]
    model_cards = {}
    for inst in cir.instances:
        m = inst.model
        nm = inst.name
        nd = list(inst.nodes)
        p = inst.params
        if m is dv.RESISTOR:
            lines.append(f"{_r(nm, 'r')} {nd[0]} {nd[1]} "
                         f"{_fmt(p.get('r', 1e3))}")
        elif m is dv.CAPACITOR:
            lines.append(f"{_r(nm, 'c')} {nd[0]} {nd[1]} "
                         f"{_fmt(p.get('c', 1e-12))}")
        elif m is dv.INDUCTOR:
            lines.append(f"{_r(nm, 'l')} {nd[0]} {nd[1]} "
                         f"{_fmt(p.get('l', 1e-9))}")
        elif m in (dv.VSOURCE, dv.ISOURCE):
            letter = "v" if m is dv.VSOURCE else "i"
            parts = [f"{_r(nm, letter)} {nd[0]} {nd[1]}",
                     f"dc {_fmt(inst.wave.dc if inst.wave else 0.0)}"]
            if p.get("acmag"):
                parts.append(f"ac {_fmt(p['acmag'])} "
                             f"{_fmt(p.get('acphase', 0.0))}")
            ws = _wave_str(inst.wave)
            if ws:
                parts.append(ws)
            lines.append(" ".join(parts))
        elif m is dv.VCVS:
            lines.append(f"{_r(nm, 'e')} {' '.join(nd)} "
                         f"{_fmt(p.get('gain', 1.0))}")
        elif m is dv.VCCS:
            lines.append(f"{_r(nm, 'g')} {' '.join(nd)} "
                         f"{_fmt(p.get('gm', 1.0))}")
        elif m is dv.CCCS:
            lines.append(f"{_r(nm, 'f')} {' '.join(nd)} {inst.sense[0]} "
                         f"{_fmt(p.get('gain', 1.0))}")
        elif m is dv.CCVS:
            lines.append(f"{_r(nm, 'h')} {' '.join(nd)} {inst.sense[0]} "
                         f"{_fmt(p.get('r', 1.0))}")
        elif m is dv.MUTUAL:
            lines.append(f"{_r(nm, 'k')} {inst.sense[0]} {inst.sense[1]} "
                         f"{_fmt(p.get('m', 0.0))}")
        elif m in (dv.DIODE, dv.DIODE_RS):
            mdl = _model_for(model_cards, m, "d", p,
                             skip={"area"})
            area = p.get("area", 1.0)
            lines.append(f"{_r(nm, 'd')} {nd[0]} {nd[1]} {mdl}"
                         + (f" area={_fmt(area)}" if area != 1.0 else ""))
        elif m is dv.BJT:
            mtype = "pnp" if p.get("type", 1.0) < 0 else "npn"
            mdl = _model_for(model_cards, m, mtype, p,
                             skip={"type", "area"})
            lines.append(f"{_r(nm, 'q')} {' '.join(nd)} {mdl}")
        elif m is dv.MOSFET1:
            mtype = "pmos" if p.get("type", 1.0) < 0 else "nmos"
            mdl = _model_for(model_cards, m, mtype, p,
                             skip={"type", "w", "l"})
            lines.append(f"{_r(nm, 'm')} {' '.join(nd)} {mdl} "
                         f"w={_fmt(p.get('w', m.defaults['w']))} "
                         f"l={_fmt(p.get('l', m.defaults['l']))}")
        else:
            # VA / behavioral: N-card with inline params
            kv = " ".join(f"{k}={_fmt(v)}" for k, v in p.items()
                          if not str(k).endswith("__given"))
            lines.append(f"n{nm} {' '.join(nd)} {m.name} {kv}".strip())
    # model cards
    rev = {"vth": "vto", "cgs": "cgso", "cgd": "cgdo", "cgb": "cgbo",
           "cjo": "cjo"}
    for (mdl_name, mtype, items) in model_cards.values():
        kv = " ".join(f"{rev.get(k, k)}={_fmt(v)}" for k, v in items)
        lines.append(f".model {mdl_name} {mtype} ({kv})")
    lines.append(".end")
    return "\n".join(lines) + "\n"


def _r(name: str, letter: str) -> str:
    """Instance name with the right leading letter."""
    return name if name.lower().startswith(letter) else letter + name


def _model_for(cards: dict, model, mtype: str, params: dict, skip=()):
    items = tuple(sorted((k, float(v)) for k, v in params.items()
                         if k not in skip and
                         float(v) != float(model.defaults.get(k, v))))
    key = (mtype, items)
    if key not in cards:
        cards[key] = (f"m{mtype}{len(cards)}", mtype, items)
    return cards[key][0]


def convert(text: str, *, to: str = "spice") -> str:
    """Dialect conversion: parse (auto-detect SPICE/Spectre), re-emit."""
    from .elaborate import elaborate_netlist

    cir, _ = elaborate_netlist(text)
    if to != "spice":
        raise ValueError(f"unsupported target dialect {to!r}")
    return to_spice(cir)


# ---------------------------------------------------------------------------
# Circuit -> Verilog-A subcircuit export (the reference SpiceArmyKnife's
# `cg_veriloga.jl` backend, SURVEY §2.8): built-in R/C/L/V/I/E/G devices
# become contribution statements of one analog block; the result compiles
# back through our own VA compiler (round-trip tested).

def to_veriloga(cir: Circuit, module_name: str = None,
                ports=None) -> str:
    """Serialize a Circuit of built-in linear/source devices to a
    Verilog-A module. `ports`: external net names (default: all nets)."""
    name = module_name or (cir.title or "converted").split()[0]
    nets = []
    for inst in cir.instances:
        for nd in inst.nodes:
            if nd not in nets and nd not in ("0", "gnd"):
                nets.append(nd)
    ports = list(ports) if ports is not None else nets
    internal = [n for n in nets if n not in ports]

    def net(nd):
        return None if nd in ("0", "gnd") else nd

    def acc(p, n):
        p, n = net(p), net(n)
        if n is None:
            return f"V({p})"
        if p is None:
            return f"-V({n})"
        return f"V({p},{n})"

    lines = ['`include "disciplines.vams"',
             f"module {name}({', '.join(ports)});"]
    if ports:
        lines.append(f"  inout {', '.join(ports)};")
    decl = ports + internal
    if decl:
        lines.append(f"  electrical {', '.join(decl)};")
    body = []
    for inst in cir.instances:
        m = inst.model.name
        p = dict(inst.model.defaults, **inst.params)
        nd = inst.nodes

        def contrib(pn, nn, expr):
            pn, nn = net(pn), net(nn)
            tgt = (f"I({pn},{nn})" if pn and nn
                   else f"I({pn})" if pn else f"I({nn})")
            sgn = "" if pn else "-"
            body.append(f"  {tgt} <+ {sgn}{expr};")

        if m == "resistor":
            contrib(nd[0], nd[1], f"{acc(nd[0], nd[1])}/{_fmt(p['r'])}")
        elif m == "capacitor":
            contrib(nd[0], nd[1], f"ddt({_fmt(p['c'])}*{acc(nd[0], nd[1])})")
        elif m == "inductor":
            contrib(nd[0], nd[1],
                    f"idt({acc(nd[0], nd[1])})/{_fmt(p['l'])}")
        elif m == "vsource":
            w = inst.wave
            expr = _fmt(w.dc if w is not None else 0.0)
            if w is not None and w.kind == wf.WAVE_SIN:
                vo, va, fr = w.coeffs[0], w.coeffs[1], w.coeffs[2]
                expr = (f"{_fmt(vo)}+{_fmt(va)}"
                        f"*sin(6.283185307179586*{_fmt(fr)}*$abstime)")
            pn, nn = net(nd[0]), net(nd[1])
            tgt = (f"V({pn},{nn})" if pn and nn
                   else f"V({pn})" if pn else f"V({nn})")
            body.append(f"  {tgt} <+ {'' if pn else '-'}{expr};")
        elif m == "isource":
            w = inst.wave
            contrib(nd[0], nd[1], _fmt(w.dc if w is not None else 0.0))
        elif m == "vccs":
            contrib(nd[0], nd[1],
                    f"{_fmt(p['gm'])}*{acc(nd[2], nd[3])}")
        elif m == "vcvs":
            pn, nn = net(nd[0]), net(nd[1])
            tgt = (f"V({pn},{nn})" if pn and nn
                   else f"V({pn})" if pn else f"V({nn})")
            body.append(
                f"  {tgt} <+ {'' if pn else '-'}{_fmt(p['gain'])}"
                f"*{acc(nd[2], nd[3])};")
        else:
            raise ValueError(
                f"to_veriloga: unsupported device {inst.name!r} "
                f"({m}); supported: R, C, L, V, I, E, G")
    lines.append("  analog begin")
    lines.extend(body)
    lines.append("  end")
    lines.append("endmodule")
    return "\n".join(lines) + "\n"
