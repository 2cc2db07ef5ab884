"""Spectre netlist dialect -> the same card AST as the SPICE parser.

Covers the Spectre grammar scope of the reference
(NyanSpectreNetlistParser Spectre mode + `src/spc/codegen.jl:1877-2188`
Spectre primitives): `//`/`*` comments, line continuation `\\` and leading
`+`, `simulator lang=...`, `global`, `parameters`, `model`, `subckt/ends`,
`include`/`ahdl_include`, instance lines `name (nodes) master p=v ...`,
analysis statements (`name tran ...`, `name dc`, `name ac ...`, `name
noise ...`), and the Spectre primitive masters resistor/capacitor/
inductor/vsource/isource/vcvs/vccs/cccs/ccvs/mutual_inductor.

Spectre number literals are case-sensitive (M = mega, m = milli) —
`parse_spectre_number` handles them; expressions use the shared Pratt
parser.
"""
from __future__ import annotations

import re

from .expressions import parse_expr
from .netlist import (DotCard, Element, Netlist, NetlistError, SubcktDef,
                      split_fields)

_SPECTRE_MAG = {"T": 1e12, "G": 1e9, "M": 1e6, "K": 1e3, "k": 1e3,
                "m": 1e-3, "u": 1e-6, "n": 1e-9, "p": 1e-12, "f": 1e-15,
                "a": 1e-18, "%": 1e-2}

_NUM_RE = re.compile(
    r"^([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)([TGMKkmunpfa%]?)"
    r"(?:_?[A-Za-z]*)?$")   # optional unit tag: 1.8_V, 10k_Ohm, 60ps, 30ns


def parse_spectre_number(tok: str):
    m = _NUM_RE.match(tok)
    if not m:
        return None
    v = float(m.group(1))
    if m.group(2):
        v *= _SPECTRE_MAG[m.group(2)]
    return v


# Spectre primitive master -> (SPICE letter, param translation)
_PRIMITIVES = {
    "resistor": "R", "capacitor": "C", "inductor": "L",
    "vsource": "V", "isource": "I",
    "vcvs": "E", "vccs": "G", "cccs": "F", "ccvs": "H",
    "iprobe": "V",   # 0V source used as current probe
}

_ANALYSES = {"tran", "dc", "ac", "noise", "op", "sp", "pss", "xf"}


def _logical_lines(text: str):
    out = []
    for ln, raw in enumerate(text.splitlines(), 1):
        s = raw.rstrip()
        s = re.sub(r"//.*", "", s)
        if not s.strip() or s.lstrip().startswith("*"):
            continue
        if s.rstrip().endswith("\\"):
            s = s.rstrip()[:-1]
            if out and out[-1][2]:
                out[-1] = (out[-1][0], out[-1][1] + " " + s.strip(), True)
            else:
                out.append((ln, s.strip(), True))
            continue
        if out and out[-1][2]:
            out[-1] = (out[-1][0], out[-1][1] + " " + s.strip(), False)
        elif s.lstrip().startswith("+"):
            out[-1] = (out[-1][0], out[-1][1] + " " + s.lstrip()[1:], False)
        else:
            out.append((ln, s.strip(), False))
    return [(ln, s) for ln, s, _ in out]


def looks_like_spectre(text: str) -> bool:
    head = text[:2000]
    if re.search(r"simulator\s+lang\s*=\s*spectre", head):
        return True
    return bool(re.search(r"^\s*\w+\s*\([^)]*\)\s*\w+", head, re.M))


_LANG_RE = re.compile(r"^\s*simulator\s+lang\s*=\s*(\w+)", re.I)


def initial_lang(text: str) -> str:
    """Dialect of the text BEFORE the first `simulator lang=` directive
    (mixed-language decks, reference NyanSpectreNetlistParser
    `test/examples/mixed_langs.cir`): a leading SPICE element/dot card
    means the deck starts in SPICE mode."""
    for raw in text.splitlines():
        s = re.sub(r"//.*", "", raw).strip()
        if not s or s.startswith("*"):
            continue
        if _LANG_RE.match(s):
            return "spectre"
        if s.startswith("."):
            return "spice"
        if re.match(r"^\w+\s*\(", s):
            return "spectre"
        w0 = s.split()[0].lower()
        if w0 in ("simulator", "global", "parameters", "model", "subckt",
                  "include", "ahdl_include", "save", "ends", "real",
                  "paramset"):
            return "spectre"
        # SPICE element line: letter + digits/name then bare nodes
        return "spice"
    return "spectre"


def parse_spectre(text: str, start_lang: str | None = None) -> Netlist:
    """Parse a Spectre (or mixed-language) deck. `simulator lang=spice`
    switches the line dialect to SPICE until the next `simulator
    lang=spectre` (reference NyanSpectreNetlistParser mixed mode)."""
    # split into language segments on `simulator lang=` directives
    lang = start_lang or initial_lang(text)
    segs = []           # (lang, first_line_no, [raw lines])
    cur, start = [], 1
    for i, raw in enumerate(text.splitlines(), 1):
        m = _LANG_RE.match(re.sub(r"//.*", "", raw))
        if m:
            segs.append((lang, start, cur))
            lang, cur, start = m.group(1).lower(), [], i + 1
        else:
            cur.append(raw)
    segs.append((lang, start, cur))
    cards = []
    for lg, start, ls in segs:
        if not any(x.strip() for x in ls):
            continue
        body = "\n" * (start - 1) + "\n".join(ls)   # preserve line numbers
        if lg == "spice":
            from .netlist import parse_netlist
            cards.extend(parse_netlist(body, title_line=False).cards)
        else:
            cards.extend(_parse_block(_logical_lines(body), 0, None)[0])
    return Netlist(title="", cards=cards)


def _parse_block(lines, pos, end_name):
    cards = []
    while pos < len(lines):
        ln, s = lines[pos]
        words = s.split()
        w0 = words[0]
        low = w0.lower()
        if low == "ends":
            if end_name is None:
                raise NetlistError("unexpected 'ends'", ln, s)
            return cards, pos + 1
        if low == "simulator":
            pos += 1
            continue
        if low == "global":
            cards.append(DotCard("global", ln, s,
                                 fields=[("word", w) for w in words[1:]
                                         if w != "0"]))
            pos += 1
            continue
        if low == "parameters":
            fields = split_fields(s[len(w0):], ln)
            kwargs = {f[1]: f[2] for f in fields if f[0] == "kw"}
            cards.append(DotCard("param", ln, s, kwargs=kwargs))
            pos += 1
            continue
        if low == "model":
            # model name mtype p=v ... -> .model card shape
            fields = split_fields(s[len(w0):], ln)
            cards.append(DotCard("model", ln, s,
                                 fields=[f for f in fields
                                         if f[0] != "kw"],
                                 kwargs={f[1]: f[2] for f in fields
                                         if f[0] == "kw"}))
            pos += 1
            continue
        if low in ("include",):
            path = words[1]
            sect = None
            m = re.search(r"section\s*=\s*(\w+)", s)
            if m:
                sect = m.group(1)
            fields = [("word", path.strip('"'))]
            if sect:
                fields.append(("word", sect))
            cards.append(DotCard("lib" if sect else "include", ln, s,
                                 fields=fields))
            pos += 1
            continue
        if low == "ahdl_include":
            cards.append(DotCard("ahdl_include", ln, s,
                                 fields=[("word", words[1].strip('"'))]))
            pos += 1
            continue
        if low == "subckt":
            name = words[1]
            # ports in parens or bare
            m = re.match(r"subckt\s+\w+\s*\(([^)]*)\)", s)
            if m:
                ports = m.group(1).split()
                rest = s[m.end():]
            else:
                ports = words[2:]
                rest = ""
            params = {}
            body_cards = []
            pos += 1
            # optional 'parameters' line inside handled by recursion
            inner, pos = _parse_block(lines, pos, name)
            for c in inner:
                if isinstance(c, DotCard) and c.kind == "param":
                    params.update(c.kwargs)
                else:
                    body_cards.append(c)
            cards.append(SubcktDef("subckt", ln, s, name=name, ports=ports,
                                   params=params, body=body_cards))
            continue
        if low in ("ic", "nodeset"):
            # `ic node=v ...` -> same card shape as SPICE .ic/.nodeset
            fields = split_fields(s[len(w0):], ln)
            cards.append(DotCard(low, ln, s,
                                 kwargs={f[1]: f[2] for f in fields
                                         if f[0] == "kw"}))
            pos += 1
            continue
        if low == "save":
            # `save A Y` signal-save directive -> .save card shape
            cards.append(DotCard("save", ln, s,
                                 fields=[("word", w) for w in words[1:]]))
            pos += 1
            continue
        # statement-position keywords: `name options|info|alter k=v ...`
        if len(words) >= 2 and words[1].lower() in ("options", "option"):
            fields = split_fields(" ".join(words[2:]), ln)
            cards.append(DotCard("option", ln, s,
                                 fields=[f for f in fields
                                         if f[0] != "kw"],
                                 kwargs={f[1]: f[2] for f in fields
                                         if f[0] == "kw"}))
            pos += 1
            continue
        if len(words) >= 2 and words[1].lower() == "info":
            pos += 1          # audit/info statements: no circuit effect
            continue
        if len(words) >= 2 and words[1].lower() == "alter":
            fields = split_fields(" ".join(words[2:]), ln)
            cards.append(DotCard("spectre_alter", ln, s,
                                 kwargs={f[1]: f[2] for f in fields
                                         if f[0] == "kw"}))
            pos += 1
            continue
        if len(words) >= 2 and words[1].lower() == "altergroup":
            # `name altergroup { include/parameters ... }` — body cards
            # preserved for introspection (sequential re-elaboration is
            # not run; reference `src/spectre.jl` altergroup semantics)
            j = pos + 1
            inner = []
            while j < len(lines) and lines[j][1].strip() != "}":
                inner.append(lines[j])
                j += 1
            body_cards, _ = _parse_block(inner, 0, None)
            cards.append(DotCard("spectre_altergroup", ln, s,
                                 fields=[("word", w0)],
                                 kwargs={"body": body_cards}))
            pos = j + 1
            continue
        # analysis statement: name analysistype p=v ...
        if len(words) >= 2 and words[1].lower() in _ANALYSES:
            kind = words[1].lower()
            fields = split_fields(" ".join(words[2:]), ln)
            kwargs = {f[1]: f[2] for f in fields if f[0] == "kw"}
            cards.append(DotCard("spectre_" + kind, ln, s,
                                 fields=[f for f in fields
                                         if f[0] != "kw"], kwargs=kwargs))
            pos += 1
            continue
        # instance line: name (nodes) master p=v ... | name n1 n2 master ...
        m = re.match(r"(\S+)\s*\(([^)]*)\)\s*(\S+)(.*)", s)
        if m:
            name, nodes, master, rest = (m.group(1), m.group(2).split(),
                                         m.group(3), m.group(4))
        else:
            fields0 = split_fields(s[len(w0):], ln)
            poss = [f[1] for f in fields0 if f[0] == "word"]
            if len(poss) < 2:
                raise NetlistError(f"cannot parse instance line", ln, s)
            name = w0
            nodes = poss[:-1]
            master = poss[-1]
            rest = " ".join(p for p in s.split()[1:]
                            if "=" in p)
        fields = split_fields(rest, ln)
        kwargs = {f[1]: f[2] for f in fields if f[0] == "kw"}
        cards.append(_SpectreInst("spectre_inst", ln, s, name=name,
                                  nodes=nodes, master=master,
                                  kwargs=kwargs))
        pos += 1
    if end_name is not None:
        raise NetlistError(f"missing 'ends {end_name}'")
    return cards, pos


import dataclasses  # noqa: E402


@dataclasses.dataclass
class _SpectreInst:
    kind: str
    line_no: int
    line: str
    name: str = ""
    nodes: list = dataclasses.field(default_factory=list)
    master: str = ""
    kwargs: dict = dataclasses.field(default_factory=dict)
