"""SPICE netlist parser: text -> card AST.

Covers the grammar scope of the reference's SPICE dialect front end
(NyanSpectreNetlistParser SPICE mode + `src/spc/sema.jl`): title line,
`*`/`$`/`;` comments, `+` continuations, case-insensitive names, SPICE
magnitudes, elements R C L V I E G F H D M Q X B K, dot cards .param .model
.subckt/.ends .include .lib/.endl .option(s) .temp .global .if/.elseif/
.else/.endif .ic .nodeset .end, analysis cards (.op .dc .ac .tran .noise)
stored for `simulate()`, output cards (.print/.plot/.probe/.save/.width)
ignored; .meas cards are kept and evaluated post-analysis — matching the reference's sema behavior (`sema.jl:536-545`).

The parser is line-oriented (SPICE is a line language) and error-tolerant in
the same spirit as the reference's lossless CST: every card remembers its
source line for error messages.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Optional

from .expressions import parse_expr, parse_number


class NetlistError(ValueError):
    def __init__(self, msg, line_no=None, line="", col=None):
        self.line_no = line_no
        self.col = col
        loc = (f"line {line_no}" if col is None
               else f"line {line_no}, col {col}")
        marker = ""
        if col is not None and line:
            marker = "\n    " + " " * col + "^"
        super().__init__(
            f"{loc}: {msg}\n    {line}{marker}" if line_no else msg)


class Tok(tuple):
    """A parsed field tuple carrying its source span: (joined-string
    start, end) plus the segment map back to physical (line, column) —
    the spirit of the reference's lossless red-tree spans
    (`NyanSpectreNetlistParser` SNode), kept per token instead of per
    tree node. Enables `alter_text` (netlist-text alter, reference
    `src/spectre.jl:515-571`) and column-precise error locations.
    Behaves exactly like the plain tuple it wraps."""

    span = None        # (start, end) in the joined logical line
    segmap = None      # [(jstart, jend, phys_line, phys_col)]

    @staticmethod
    def make(items, span=None, segmap=None):
        t = Tok(items)
        t.span = span
        t.segmap = segmap
        return t

    def source_pos(self):
        """(physical_line_no, column) of this token's start."""
        if self.span is None or self.segmap is None:
            return None
        a = self.span[0]
        for (js, je, ln, col) in self.segmap:
            if js <= a < je or (a == js == je):
                return (ln, col + (a - js))
        return None


@dataclasses.dataclass
class Card:
    kind: str             # 'element' | dot-card name ('param', 'model', ...)
    line_no: int
    line: str


@dataclasses.dataclass
class Element(Card):
    letter: str = ""      # R, C, L, V, ...
    name: str = ""
    fields: list = dataclasses.field(default_factory=list)   # positional
    kwargs: dict = dataclasses.field(default_factory=dict)   # key=value


@dataclasses.dataclass
class DotCard(Card):
    fields: list = dataclasses.field(default_factory=list)
    kwargs: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class SubcktDef(Card):
    name: str = ""
    ports: list = dataclasses.field(default_factory=list)
    params: dict = dataclasses.field(default_factory=dict)
    body: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class LibSection(Card):
    name: str = ""
    body: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class IfBlock(Card):
    # list of (cond_expr_or_None, body_cards); None = else branch
    branches: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class Netlist:
    title: str
    cards: list


# ---------------------------------------------------------------------------
# logical-line assembly

_COMMENT_INLINE = re.compile(r"[;$].*")


def logical_lines(text: str):
    """Yield (line_no, line, segmap) with comments stripped and
    continuations joined. line_no refers to the first physical line;
    segmap is [(joined_start, joined_end, phys_line_no, phys_col)] so any
    joined-string position maps back to its source line and column."""
    out = []
    for ln, raw in enumerate(text.splitlines(), 1):
        s = raw.rstrip("\n\r")
        if s.lstrip().startswith("*"):
            continue
        s = _COMMENT_INLINE.sub("", s)
        if not s.strip():
            continue
        if s.lstrip().startswith("+"):
            if not out:
                raise NetlistError("continuation with no previous line", ln,
                                   raw)
            lead = len(s) - len(s.lstrip())
            content = s.lstrip()[1:]
            ln0, joined, segs = out[-1]
            start = len(joined) + 1
            out[-1] = (ln0, joined + " " + content,
                       segs + [(start, start + len(content), ln, lead + 1)])
        else:
            stripped = s.strip()
            col = len(s) - len(s.lstrip())
            out.append((ln, stripped,
                        [(0, len(stripped), ln, col)]))
    return out


# ---------------------------------------------------------------------------
# field splitting: names, numbers, key=value, (...) groups, {expr}, 'expr'

_FIELD_RE = re.compile(
    r"""\s*(?:
        (?P<brace>\{[^}]*\})
      | (?P<quote>'[^']*')
      | (?P<eq>=)
      | (?P<paren>\()
      | (?P<cparen>\))
      | (?P<comma>,)
      | (?P<word>[^\s=(),{}']+)
    )""", re.X)


def split_fields(s: str, line_no: int, offset: int = 0, segmap=None):
    """Tokenize an element/dot-card line body into a flat field list where
    parenthesized groups become nested lists and `a = b` pairs are merged
    to ('kw', key, value). Word/expr tokens carry source spans (offset
    shifts them into the full logical-line coordinate system)."""
    toks = []
    i = 0
    while i < len(s):
        m = _FIELD_RE.match(s, i)
        if not m:
            if s[i].isspace():
                i += 1
                continue
            raise NetlistError(f"bad character {s[i]!r}", line_no, s)
        i = m.end()

        def mk(items, g, shrink=0):
            return Tok.make(items, (m.start(g) + shrink + offset,
                                    m.end(g) - shrink + offset), segmap)

        if m.group("brace"):
            toks.append(mk(("expr", m.group("brace")[1:-1]), "brace", 1))
        elif m.group("quote"):
            toks.append(mk(("expr", m.group("quote")[1:-1]), "quote", 1))
        elif m.group("eq"):
            toks.append(("op", "="))
        elif m.group("paren"):
            toks.append(("op", "("))
        elif m.group("cparen"):
            toks.append(("op", ")"))
        elif m.group("comma"):
            continue
        else:
            toks.append(mk(("word", m.group("word")), "word"))

    # nest parens
    def nest(pos):
        items = []
        while pos < len(toks):
            t = toks[pos]
            if t == ("op", "("):
                sub, pos = nest(pos + 1)
                items.append(("group", sub))
            elif t == ("op", ")"):
                return items, pos + 1
            else:
                items.append(t)
                pos += 1
        return items, pos

    items, _ = nest(0)

    # merge key = value (recursively: model cards put kv pairs inside
    # parenthesized groups)
    def merge(items):
        out = []
        j = 0
        while j < len(items):
            it = items[j]
            if it[0] == "group":
                it = ("group", merge(it[1]))
            if (j + 1 < len(items) and items[j + 1] == ("op", "=")
                    and it[0] == "word"):
                val = items[j + 2] if j + 2 < len(items) else ("word", "")
                if val[0] == "group":
                    val = ("group", merge(val[1]))
                out.append(Tok.make(("kw", it[1].lower(), val),
                                    getattr(it, "span", None), segmap))
                j += 3
            else:
                out.append(it)
                j += 1
        return out

    return merge(items)


# ---------------------------------------------------------------------------
# parser

_ANALYSIS = {"op", "dc", "ac", "tran", "noise", "pz", "tf", "sens", "disto",
             "four"}
_IGNORED = {"print", "plot", "probe", "save", "width",
            "backanno", "options_ignored", "control", "endc", "ends_ignored",
            "enddata"}


def parse_netlist(text: str, *, title_line: bool | None = None) -> Netlist:
    """Parse SPICE text. If title_line is None, auto-detect: the first line
    is treated as the title unless it parses as a card."""
    # SPICE convention: the first (non-comment) line is the title — always,
    # unless it is a dot card (lenient, like the reference's implicit_title)
    lines = logical_lines(text)
    title = ""
    raw_first = next((ln.strip() for ln in text.split("\n") if ln.strip()),
                     "")
    if title_line is not False and raw_first.startswith("*"):
        # a leading comment line IS the title (SPICE reads the first line
        # unconditionally); logical_lines already stripped it, so every
        # remaining line is a card
        title = raw_first.lstrip("*").strip()
    elif lines and title_line is not False:
        first = lines[0][1]
        if title_line is True or not first.startswith("."):
            title = first
            lines = lines[1:]

    cards, _ = _parse_block(lines, 0, None)
    return Netlist(title=title, cards=cards)


def _parse_block(lines, pos, end_token):
    """Parse until `.end_token` (or EOF). Returns (cards, next_pos)."""
    cards = []
    while pos < len(lines):
        ln, s, seg = lines[pos]
        low = s.lower()
        w0 = low.split()[0] if low.split() else ""
        if s.startswith("."):
            dot = w0[1:]
            if end_token is not None and dot == end_token:
                return cards, pos + 1
            if dot == "end":
                return cards, pos + 1
            if dot == "subckt":
                card, pos = _parse_subckt(lines, pos)
                cards.append(card)
                continue
            if dot == "lib" and len(s.split()) == 2:
                # in-file library section: .lib name ... .endl
                name = s.split()[1]
                body, pos = _parse_block(lines[:], pos + 1, "endl")
                cards.append(LibSection("libsection", ln, s, name=name,
                                        body=body))
                continue
            if dot == "if":
                card, pos = _parse_if(lines, pos)
                cards.append(card)
                continue
            if dot in ("elseif", "else", "endif", "ends", "endl"):
                # handled by callers; reaching here is a structural error
                raise NetlistError(f"unexpected .{dot}", ln, s)
            if dot in _IGNORED or dot == "control":
                # skip .control ... .endc blocks wholesale
                if dot == "control":
                    while pos < len(lines) and not lines[pos][1].lower()\
                            .startswith(".endc"):
                        pos += 1
                    pos += 1
                    continue
                pos += 1
                continue
            fields = split_fields(s[len(w0):], ln, offset=len(w0),
                                  segmap=seg)
            kwargs = {k: v for t, k, v in
                      [f for f in fields if f[0] == "kw"]}
            plain = [f for f in fields if f[0] != "kw"]
            cards.append(DotCard(dot, ln, s, fields=plain, kwargs=kwargs))
            pos += 1
            continue
        # element line
        w = s.split(None, 1)
        name = w[0]
        letter = name[0].upper()
        if letter not in "RCLVIEGHFDMQXBKWSTOUJZN":
            raise NetlistError(f"unknown element letter {letter!r}", ln, s)
        body = w[1] if len(w) > 1 else ""
        fields = split_fields(body, ln, offset=len(s) - len(body),
                              segmap=seg)
        kwargs = {}
        plain = []
        for f in fields:
            if f[0] == "kw":
                kwargs[f[1]] = f[2]
            else:
                plain.append(f)
        cards.append(Element("element", ln, s, letter=letter, name=name,
                             fields=plain, kwargs=kwargs))
        pos += 1
    if end_token is not None and end_token not in ("end",):
        raise NetlistError(f"missing .{end_token}")
    return cards, pos


def _parse_subckt(lines, pos):
    ln, s, seg = lines[pos]
    body0 = s.split(None, 1)[1]
    fields = split_fields(body0, ln, offset=len(s) - len(body0),
                          segmap=seg)
    # ports until the first kw or 'params:' marker
    name = None
    ports = []
    params = {}
    seen_params_kw = False
    for f in fields:
        if f[0] == "kw":
            params[f[1]] = f[2]
        elif f[0] == "word":
            wl = f[1].lower()
            if wl == "params:":
                seen_params_kw = True
                continue
            if name is None:
                name = f[1]
            elif not seen_params_kw:
                ports.append(f[1])
    if name is None:
        raise NetlistError("subckt needs a name", ln, s)
    body, pos = _parse_block(lines, pos + 1, "ends")
    return SubcktDef("subckt", ln, s, name=name, ports=ports, params=params,
                     body=body), pos


def _parse_if(lines, pos):
    ln0, s0, _seg0 = lines[pos]
    branches = []

    def cond_of(s):
        body = s.split(None, 1)[1] if len(s.split(None, 1)) > 1 else ""
        body = body.strip()
        if body.startswith("(") and body.endswith(")"):
            body = body[1:-1]
        elif body.startswith("{") and body.endswith("}"):
            body = body[1:-1]
        return parse_expr(body)

    cond = cond_of(s0)
    body = []
    pos += 1
    while pos < len(lines):
        ln, s, _seg = lines[pos]
        low = s.lower()
        if low.startswith(".elseif"):
            branches.append((cond, body))
            cond = cond_of(s)
            body = []
            pos += 1
        elif low.startswith(".else"):
            branches.append((cond, body))
            cond = None
            body = []
            pos += 1
        elif low.startswith(".endif"):
            branches.append((cond, body))
            return IfBlock("if", ln0, s0, branches=branches), pos + 1
        elif low.startswith(".subckt"):
            card, pos = _parse_subckt(lines, pos)
            body.append(card)
        elif low.startswith(".if"):
            card, pos = _parse_if(lines, pos)
            body.append(card)
        else:
            sub, npos = _parse_block(lines[pos:pos + 1], 0, None)
            body.extend(sub)
            pos += 1
    raise NetlistError("missing .endif", ln0, s0)


# ---------------------------------------------------------------------------
# netlist-text alter (reference `alter(io, ast; kwargs)`,
# `src/spectre.jl:515-571`): rewrite parameter VALUES in the source text,
# leaving everything else byte-identical.

def _walk_cards(cards):
    for c in cards:
        yield c
        if isinstance(c, SubcktDef):
            yield from _walk_cards(c.body)
        elif isinstance(c, LibSection):
            yield from _walk_cards(c.body)
        elif isinstance(c, IfBlock):
            for _, body in c.branches:
                yield from _walk_cards(body)


def _group_kws(fields):
    """kw tokens inside parenthesized groups (model-card form)."""
    for f in fields:
        if f[0] == "group":
            for g in f[1]:
                if g[0] == "kw":
                    yield g
                elif g[0] == "group":
                    yield from _group_kws([g])


def _value_token(card, pname):
    """The value token for `pname` on a card: kw (incl. inside groups) or,
    for two-terminal R/C/L elements, the positional value field."""
    kwargs = getattr(card, "kwargs", None) or {}
    if pname in kwargs:
        return kwargs[pname]
    for kw in _group_kws(getattr(card, "fields", ())):
        if kw[1] == pname:
            return kw[2]
    if (isinstance(card, Element) and card.letter in "RCL"
            and pname in ("r", "c", "l", "value")):
        words = [f for f in card.fields if f[0] in ("word", "expr")]
        if len(words) >= 3:
            return words[2]
    return None


def _tok_phys(tok):
    """(physical_line_no, col_start, col_end) of a value token."""
    if getattr(tok, "span", None) is None or tok.segmap is None:
        return None
    a, b = tok.span
    for (js, je, ln, col) in tok.segmap:
        if js <= a and b <= je:
            return (ln, col + (a - js), col + (b - js))
    return None


def alter_text(text: str, overrides: dict | None = None, **kw) -> str:
    """Rewrite parameter values in netlist SOURCE text.

    Keys: 'inst.param' (element key=value, or the positional value of a
    two-terminal R/C/L), 'model.param' (model-card entry), or a bare
    '.param' name. Unknown keys raise with the valid address forms. The
    returned text differs from the input ONLY in the rewritten value
    characters (source spans from the lossless tokenizer)."""
    ov = dict(overrides or {})
    ov.update(kw)
    nl = parse_netlist(text)
    lines = text.split("\n")
    edits = []
    for key, val in ov.items():
        if "." in key:
            target, pname = key.split(".", 1)
        else:
            target, pname = None, key
        target_l = target.lower() if target else None
        pname_l = pname.lower()
        tok = None
        for c in _walk_cards(nl.cards):
            if isinstance(c, Element) and target_l and \
                    c.name.lower() == target_l:
                tok = _value_token(c, pname_l)
            elif isinstance(c, DotCard) and c.kind == "model" and target_l:
                words = [f for f in c.fields if f[0] == "word"]
                if words and words[0][1].lower() == target_l:
                    tok = _value_token(c, pname_l)
            elif isinstance(c, DotCard) and c.kind == "param" and \
                    target is None:
                if pname_l in (c.kwargs or {}):
                    tok = c.kwargs[pname_l]
            if tok is not None:
                break
        if tok is None:
            raise NetlistError(
                f"alter: no value found for {key!r} (use 'inst.param', "
                f"'model.param', or a .param name)")
        pos = _tok_phys(tok)
        if pos is None:
            raise NetlistError(f"alter: {key!r} has no source span")
        ln, c0, c1 = pos
        edits.append((ln, c0, c1, str(val)))
    # splice right-to-left per line so earlier columns stay valid
    for ln, c0, c1, new in sorted(edits, key=lambda e: (e[0], -e[1])):
        cur = lines[ln - 1]
        lines[ln - 1] = cur[:c0] + new + cur[c1:]
    return "\n".join(lines)
