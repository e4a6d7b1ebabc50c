"""CLI entry: python -m meep_nl_tpu.frontend script.ctl [name=value ...]

Mirrors the reference `meep script.ctl param=value` invocation
(reference scheme frontend): name=value pairs override `define-param`
defaults; values are parsed as Scheme literals (numbers, #t/#f, strings,
quoted lists).
"""

from __future__ import annotations

import sys

from . import run_ctl_file
from .sexp import parse_one


def parse_param(arg: str):
    name, _, raw = arg.partition("=")
    try:
        val = parse_one(raw)
    except Exception:
        val = raw
    if isinstance(val, str) and val in ("true", "false"):
        val = val == "true"
    return name, val


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0 if argv else 1
    script, rest = argv[0], argv[1:]
    params = dict(parse_param(a) for a in rest if "=" in a)
    run_ctl_file(script, params)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
