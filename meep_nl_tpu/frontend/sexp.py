"""S-expression reader for the ctl (libctl/Scheme) frontend.

Parses the Scheme subset used by Meep ctl scripts (reference
scheme/meep.scm.in and scheme/examples/*.ctl): nested lists, `;` line
comments, `#|...|#` block comments, strings with escapes, integers and
floats (including exponent forms), `#t`/`#f`, characters (`#\\x`), and
quote/quasiquote/unquote reader macros.

Symbols are represented as the `Symbol` str subclass so the evaluator can
distinguish identifiers from string literals; lists are Python lists.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple


class Symbol(str):
    """A Scheme identifier (distinct from a string literal)."""
    __slots__ = ()

    def __repr__(self):  # pragma: no cover - debug aid
        return str(self)


class Keyword(str):
    """A guile `#:name` keyword argument marker."""
    __slots__ = ()

    def __repr__(self):  # pragma: no cover - debug aid
        return "#:" + str(self)


class SexpError(SyntaxError):
    pass


_DELIMS = "()\"';`,"


def tokenize(text: str) -> List[Tuple[str, Any, int]]:
    """Yield (kind, value, line) tokens.

    kind is one of '(' ')' 'quote' 'quasiquote' 'unquote'
    'unquote-splicing' 'atom' 'string'.
    """
    toks: List[Tuple[str, Any, int]] = []
    i, n, line = 0, len(text), 1
    while i < n:
        c = text[i]
        if c == "\n":
            line += 1
            i += 1
        elif c in " \t\r\f":
            i += 1
        elif c == ";":
            while i < n and text[i] != "\n":
                i += 1
        elif c == "#" and text.startswith("#|", i):
            depth, i0 = 1, i
            i += 2
            while i < n and depth:
                if text.startswith("#|", i):
                    depth += 1
                    i += 2
                elif text.startswith("|#", i):
                    depth -= 1
                    i += 2
                else:
                    if text[i] == "\n":
                        line += 1
                    i += 1
            if depth:
                raise SexpError(f"unterminated block comment at line "
                                f"{text.count(chr(10), 0, i0) + 1}")
        elif c in "()":
            toks.append((c, c, line))
            i += 1
        elif c == "'":
            toks.append(("quote", c, line))
            i += 1
        elif c == "`":
            toks.append(("quasiquote", c, line))
            i += 1
        elif c == ",":
            if text.startswith(",@", i):
                toks.append(("unquote-splicing", ",@", line))
                i += 2
            else:
                toks.append(("unquote", c, line))
                i += 1
        elif c == '"':
            j, buf = i + 1, []
            while j < n and text[j] != '"':
                if text[j] == "\\" and j + 1 < n:
                    esc = text[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r",
                                '"': '"', "\\": "\\"}.get(esc, esc))
                    j += 2
                else:
                    if text[j] == "\n":
                        line += 1
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise SexpError(f"unterminated string at line {line}")
            toks.append(("string", "".join(buf), line))
            i = j + 1
        else:
            j = i
            while j < n and text[j] not in _DELIMS and not text[j].isspace():
                j += 1
            toks.append(("atom", text[i:j], line))
            i = j
    return toks


def _atom(tok: str, line: int) -> Any:
    if tok == "#t":
        return True
    if tok == "#f":
        return False
    if tok.startswith("#:"):             # guile keyword argument
        return Keyword(tok[2:])
    if tok.startswith("#\\"):            # character literal -> 1-char string
        ch = tok[2:]
        return {"space": " ", "newline": "\n", "tab": "\t"}.get(ch, ch[:1])
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    if tok and tok[-1] in "iI" and any(ch.isdigit() for ch in tok):
        # guile complex literal: 0-1i, +2.5i, 1+i, 3e2-1.5e-1i
        body = tok[:-1]
        if not body or body[-1] in "+-":
            body += "1"
        try:
            return complex(body + "j")
        except ValueError:
            pass
    return Symbol(tok)


_QUOTE_SYMS = {
    "quote": Symbol("quote"),
    "quasiquote": Symbol("quasiquote"),
    "unquote": Symbol("unquote"),
    "unquote-splicing": Symbol("unquote-splicing"),
}


def parse_all(text: str) -> List[Any]:
    """Parse every top-level form in `text`."""
    toks = tokenize(text)
    pos = 0

    def read() -> Any:
        nonlocal pos
        if pos >= len(toks):
            raise SexpError("unexpected end of input")
        kind, val, line = toks[pos]
        pos += 1
        if kind == "(":
            items = []
            while True:
                if pos >= len(toks):
                    raise SexpError(f"missing ')' for '(' at line {line}")
                if toks[pos][0] == ")":
                    pos += 1
                    return items
                items.append(read())
        if kind == ")":
            raise SexpError(f"unexpected ')' at line {line}")
        if kind in _QUOTE_SYMS:
            return [_QUOTE_SYMS[kind], read()]
        if kind == "string":
            return val
        return _atom(val, line)

    forms = []
    while pos < len(toks):
        forms.append(read())
    return forms


def parse_one(text: str) -> Any:
    forms = parse_all(text)
    if len(forms) != 1:
        raise SexpError(f"expected exactly one form, got {len(forms)}")
    return forms[0]


def to_string(x: Any) -> str:
    """Render a value back as Scheme-ish text (for display/errors)."""
    if isinstance(x, bool):
        return "#t" if x else "#f"
    if isinstance(x, Symbol):
        return str(x)
    if isinstance(x, str):
        return '"' + x.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(x, float):
        return repr(x)
    if isinstance(x, (list, tuple)):
        return "(" + " ".join(to_string(e) for e in x) + ")"
    return str(x)
