"""Scheme evaluator for the ctl frontend.

Implements the language subset that Meep ctl scripts exercise (reference
scheme/examples/*.ctl + libctl idioms in scheme/meep.scm.in): define /
define-param, set!, lambda with rest args, let / let* / letrec / named
let, if / cond / case / when / unless, and / or, begin, do, quasiquote,
and a numeric+list standard library including libctl's vector3 algebra
and `interpolate`.

Procedure application and the branching forms are evaluated in an
explicit tail-call loop, so ctl-style named-let time loops of arbitrary
depth run in constant Python stack.
"""

from __future__ import annotations

import cmath
import functools
import math
import operator
from typing import Any, Callable, Dict, List, Optional

from .sexp import Keyword, Symbol, parse_all, to_string


class SchemeError(Exception):
    pass


class Environment(dict):
    __slots__ = ("outer",)

    def __init__(self, bindings=None, outer: Optional["Environment"] = None):
        super().__init__(bindings or {})
        self.outer = outer

    def lookup(self, name: str) -> "Environment":
        env: Optional[Environment] = self
        while env is not None:
            if name in env:
                return env
            env = env.outer
        raise SchemeError(f"unbound variable: {name}")


class Procedure:
    """A lambda: parameter list (with optional rest arg), body, closure."""
    __slots__ = ("params", "rest", "body", "env", "name")

    def __init__(self, params: List[str], rest: Optional[str],
                 body: List[Any], env: Environment, name: str = "lambda"):
        self.params, self.rest = params, rest
        self.body, self.env, self.name = body, env, name

    def bind(self, args: List[Any]) -> Environment:
        if self.rest is None:
            if len(args) != len(self.params):
                raise SchemeError(
                    f"{self.name}: expected {len(self.params)} args, "
                    f"got {len(args)}")
            return Environment(dict(zip(self.params, args)), self.env)
        if len(args) < len(self.params):
            raise SchemeError(
                f"{self.name}: expected >= {len(self.params)} args, "
                f"got {len(args)}")
        env = Environment(dict(zip(self.params, args)), self.env)
        env[self.rest] = list(args[len(self.params):])
        return env

    def __call__(self, *args):
        # entry point for Python-side callers (step functions, map, ...)
        return eval_sexp([Symbol("begin")] + self.body, self.bind(list(args)))


def _parse_params(spec) -> (List[str], Optional[str]):
    """(a b) -> ([a, b], None); (a . rest) is spelled (a #!rest r) in some
    dialects — ctl scripts only use fixed arity, but support dotted via
    the reader's flat list convention ['a', '.', 'rest']."""
    if isinstance(spec, Symbol):
        return [], str(spec)
    params, rest = [], None
    it = iter(spec)
    for p in it:
        if str(p) == ".":
            rest = str(next(it))
            break
        params.append(str(p))
    return params, rest


def eval_sexp(x: Any, env: Environment) -> Any:
    """Evaluate with explicit tail-call iteration."""
    while True:
        if isinstance(x, Symbol):
            return env.lookup(x)[x]
        if not isinstance(x, list):
            return x                      # literal
        if not x:
            return []
        head = x[0]
        if isinstance(head, Symbol):
            op = str(head)
            if op == "quote":
                return x[1]
            if op == "if":
                test = eval_sexp(x[1], env)
                if test is not False:
                    x = x[2]
                elif len(x) > 3:
                    x = x[3]
                else:
                    return None
                continue
            if op in ("define", "define-param"):
                target = x[1]
                if isinstance(target, list):      # (define (f a b) body...)
                    name = str(target[0])
                    params, rest = _parse_params(target[1:])
                    env[name] = Procedure(params, rest, x[2:], env, name)
                else:
                    name = str(target)
                    if op == "define-param" and name in env.get(
                            "__ctl_params__", {}):
                        env[name] = env["__ctl_params__"][name]
                    else:
                        env[name] = eval_sexp(x[2], env) if len(x) > 2 \
                            else None
                return None
            if op in ("set!", "set-param!"):
                name = str(x[1])
                val = eval_sexp(x[2], env)
                if op == "set-param!" and name in env.get(
                        "__ctl_params__", {}):
                    val = env["__ctl_params__"][name]
                scope = env.lookup(name) if _bound(env, name) else env
                hooks = _root(env).get("__set_hooks__")
                if hooks and name in hooks:
                    val = hooks[name](val)
                scope[name] = val
                return None
            if op == "lambda":
                params, rest = _parse_params(x[1])
                return Procedure(params, rest, x[2:], env)
            if op == "begin":
                if len(x) == 1:
                    return None
                for form in x[1:-1]:
                    eval_sexp(form, env)
                x = x[-1]
                continue
            if op == "let":
                if len(x) > 2 and isinstance(x[1], Symbol):   # named let
                    name, bindings, body = str(x[1]), x[2], x[3:]
                    params = [str(b[0]) for b in bindings]
                    args = [eval_sexp(b[1], env) for b in bindings]
                    proc = Procedure(params, None, body, env, name)
                    proc.env = Environment({name: proc}, env)
                    env = proc.bind(args)
                    x = [Symbol("begin")] + proc.body
                    continue
                bindings, body = x[1], x[2:]
                vals = {str(b[0]): eval_sexp(b[1], env) for b in bindings}
                env = Environment(vals, env)
                x = [Symbol("begin")] + body
                continue
            if op in ("let*", "letrec", "letrec*"):
                env = Environment({}, env)
                for b in x[1]:
                    env[str(b[0])] = eval_sexp(b[1], env)
                x = [Symbol("begin")] + x[2:]
                continue
            if op == "cond":
                for clause in x[1:]:
                    if str(clause[0]) == "else":
                        x = [Symbol("begin")] + clause[1:]
                        break
                    test = eval_sexp(clause[0], env)
                    if test is not False:
                        if len(clause) == 1:
                            return test
                        if str(clause[1]) == "=>":
                            return apply_proc(eval_sexp(clause[2], env),
                                              [test])
                        x = [Symbol("begin")] + clause[1:]
                        break
                else:
                    return None
                continue
            if op == "case":
                key = eval_sexp(x[1], env)
                for clause in x[2:]:
                    if str(clause[0]) == "else" or key in clause[0]:
                        x = [Symbol("begin")] + clause[1:]
                        break
                else:
                    return None
                continue
            if op == "when":
                if eval_sexp(x[1], env) is False:
                    return None
                x = [Symbol("begin")] + x[2:]
                continue
            if op == "unless":
                if eval_sexp(x[1], env) is not False:
                    return None
                x = [Symbol("begin")] + x[2:]
                continue
            if op == "and":
                val = True
                for form in x[1:-1]:
                    val = eval_sexp(form, env)
                    if val is False:
                        return False
                if len(x) > 1:
                    x = x[-1]
                    continue
                return val
            if op == "or":
                for form in x[1:-1]:
                    val = eval_sexp(form, env)
                    if val is not False:
                        return val
                if len(x) > 1:
                    x = x[-1]
                    continue
                return False
            if op == "do":
                # (do ((var init step)...) (test result...) body...)
                specs = [(str(s[0]), s[1], (s[2] if len(s) > 2 else s[0]))
                         for s in x[1]]
                env = Environment(
                    {n: eval_sexp(i, env) for n, i, _ in specs}, env)
                test, results = x[2][0], x[2][1:]
                while eval_sexp(test, env) is False:
                    for form in x[3:]:
                        eval_sexp(form, env)
                    nxt = [eval_sexp(s, env) for _, _, s in specs]
                    for (n, _, _), v in zip(specs, nxt):
                        env[n] = v
                if not results:
                    return None
                x = [Symbol("begin")] + results
                continue
            if op == "quasiquote":
                return _quasi(x[1], env, 1)
            if op == "delay":
                body = x[1]
                return functools.lru_cache(maxsize=1)(
                    lambda: eval_sexp(body, env))
            # special forms registered by the binding layer (e.g. `make`)
            sf = _root(env).get("__special_forms__", {}).get(op)
            if sf is not None:
                return sf(x[1:], env)
        # application
        proc = eval_sexp(head, env)
        args = [a if isinstance(a, Keyword) else eval_sexp(a, env)
                for a in x[1:]]
        if any(isinstance(a, Keyword) for a in args):
            # guile #:keyword args -> python kwargs (builtins only)
            pos, kw, it = [], {}, iter(args)
            for a in it:
                if isinstance(a, Keyword):
                    kw[str(a).replace("-", "_")] = next(it)
                else:
                    pos.append(a)
            if callable(proc) and not isinstance(proc, Procedure):
                return proc(*pos, **kw)
            raise SchemeError("keyword args require a builtin procedure")
        if isinstance(proc, Procedure):
            env = proc.bind(args)
            x = [Symbol("begin")] + proc.body
            continue
        if callable(proc):
            return proc(*args)
        raise SchemeError(f"not a procedure: {to_string(head)}")


def _bound(env: Environment, name: str) -> bool:
    e: Optional[Environment] = env
    while e is not None:
        if name in e:
            return True
        e = e.outer
    return False


def _root(env: Environment) -> Environment:
    while env.outer is not None:
        env = env.outer
    return env


def _quasi(x: Any, env: Environment, depth: int) -> Any:
    if not isinstance(x, list) or not x:
        return x
    if isinstance(x[0], Symbol):
        if str(x[0]) == "unquote":
            if depth == 1:
                return eval_sexp(x[1], env)
            return [x[0], _quasi(x[1], env, depth - 1)]
        if str(x[0]) == "quasiquote":
            return [x[0], _quasi(x[1], env, depth + 1)]
    out = []
    for item in x:
        if (isinstance(item, list) and item and
                isinstance(item[0], Symbol) and
                str(item[0]) == "unquote-splicing" and depth == 1):
            out.extend(eval_sexp(item[1], env))
        else:
            out.append(_quasi(item, env, depth))
    return out


def apply_proc(proc: Any, args: List[Any]) -> Any:
    if isinstance(proc, Procedure):
        return eval_sexp([Symbol("begin")] + proc.body,
                         proc.bind(list(args)))
    if callable(proc):
        return proc(*args)
    raise SchemeError(f"not a procedure: {proc!r}")


# ---------------------------------------------------------------------------
# standard library


def _num_fold(fn, unit=None):
    def wrap(*args):
        if unit is not None and len(args) == 1:
            return fn(unit, args[0])
        return functools.reduce(fn, args)
    return wrap


def _chain(cmp):
    def wrap(*args):
        return all(cmp(a, b) for a, b in zip(args, args[1:]))
    return wrap


def _display(*args):
    print("".join(_disp_str(a) for a in args), end="")
    return None


def _disp_str(x) -> str:
    if isinstance(x, bool):
        return "#t" if x else "#f"
    if isinstance(x, str):
        return str(x)
    if isinstance(x, float):
        return repr(x)
    if isinstance(x, (list, tuple)):
        return "(" + " ".join(_disp_str(e) for e in x) + ")"
    return str(x)


def _sqrt(v):
    if isinstance(v, complex) or (isinstance(v, (int, float)) and v < 0):
        return cmath.sqrt(v)
    return math.sqrt(v)


def _safe_div(*args):
    if len(args) == 1:
        return 1 / args[0]
    return functools.reduce(operator.truediv, args)


def standard_env(extra: Optional[Dict[str, Any]] = None) -> Environment:
    env = Environment()
    env["__ctl_params__"] = {}
    env["__special_forms__"] = {}
    env["__set_hooks__"] = {}
    env.update({
        "true": True, "false": False, "else": True,
        "pi": math.pi, "infinity": 1e20,
        "+": _num_fold(operator.add),
        "-": _num_fold(operator.sub, unit=0),
        "*": _num_fold(operator.mul),
        "/": _safe_div,
        "<": _chain(operator.lt), ">": _chain(operator.gt),
        "<=": _chain(operator.le), ">=": _chain(operator.ge),
        "=": _chain(operator.eq),
        "abs": abs, "magnitude": abs,
        "min": min, "max": max,
        "expt": lambda a, b: a ** b,
        "exp": lambda v: cmath.exp(v) if isinstance(v, complex)
        else math.exp(v),
        "log": lambda v, *b: math.log(v, *b),
        "sqrt": _sqrt,
        "sin": math.sin, "cos": math.cos, "tan": math.tan,
        "asin": math.asin, "acos": math.acos,
        "atan": lambda y, *x: math.atan2(y, x[0]) if x else math.atan(y),
        "floor": lambda v: float(math.floor(v)),
        "ceiling": lambda v: float(math.ceil(v)),
        "round": lambda v: float(round(v)),
        "truncate": lambda v: float(math.trunc(v)),
        "exact->inexact": float, "inexact->exact": lambda v: v,
        "exact": lambda v: int(round(v)), "inexact": float,
        "number->string": _disp_str,
        "string->number": lambda s: float(s) if any(c in s for c in ".eE")
        else int(s),
        "string-append": lambda *s: "".join(s),
        "symbol->string": str,
        "string->symbol": Symbol,
        "quotient": lambda a, b: int(a) // int(b),
        "remainder": lambda a, b: int(math.fmod(a, b)),
        "modulo": lambda a, b: int(a) % int(b),
        "gcd": math.gcd,
        "zero?": lambda v: v == 0,
        "positive?": lambda v: v > 0,
        "negative?": lambda v: v < 0,
        "even?": lambda v: int(v) % 2 == 0,
        "odd?": lambda v: int(v) % 2 == 1,
        "number?": lambda v: isinstance(v, (int, float, complex))
        and not isinstance(v, bool),
        "integer?": lambda v: isinstance(v, int) and not isinstance(v, bool)
        or (isinstance(v, float) and v.is_integer()),
        "real?": lambda v: isinstance(v, (int, float))
        and not isinstance(v, bool),
        "string?": lambda v: isinstance(v, str)
        and not isinstance(v, Symbol),
        "symbol?": lambda v: isinstance(v, Symbol),
        "boolean?": lambda v: isinstance(v, bool),
        "procedure?": callable,
        "null?": lambda v: v == [] or v == (),
        "pair?": lambda v: isinstance(v, (list, tuple)) and len(v) > 0,
        "list?": lambda v: isinstance(v, (list, tuple)),
        "eq?": lambda a, b: a is b or (
            isinstance(a, (int, float, str, bool)) and a == b),
        "eqv?": lambda a, b: a is b or (
            isinstance(a, (int, float, str, bool)) and a == b),
        "equal?": operator.eq,
        "not": lambda v: v is False,
        "list": lambda *a: list(a),
        "cons": lambda a, d: [a] + list(d) if isinstance(d, (list, tuple))
        else [a, Symbol("."), d],
        "car": lambda l: l[0],
        "cdr": lambda l: list(l[1:]),
        "cadr": lambda l: l[1],
        "caddr": lambda l: l[2],
        "cadddr": lambda l: l[3],
        "first": lambda l: l[0], "second": lambda l: l[1],
        "third": lambda l: l[2],
        "last": lambda l: l[-1],
        "length": len,
        "append": lambda *ls: sum((list(l) for l in ls), []),
        "reverse": lambda l: list(reversed(l)),
        "list-ref": lambda l, i: l[int(i)],
        "list-tail": lambda l, i: list(l[int(i):]),
        "member": lambda x, l: (list(l[l.index(x):])
                                if x in l else False),
        "memq": lambda x, l: (list(l[l.index(x):])
                              if x in l else False),
        "assoc": lambda k, al: next((p for p in al if p and p[0] == k),
                                    False),
        "assq": lambda k, al: next((p for p in al if p and p[0] == k),
                                   False),
        "map": lambda f, *ls: [apply_proc(f, list(xs)) for xs in zip(*ls)],
        "for-each": lambda f, *ls: ([apply_proc(f, list(xs))
                                     for xs in zip(*ls)], None)[1],
        "filter": lambda f, l: [v for v in l
                                if apply_proc(f, [v]) is not False],
        "fold-left": lambda f, init, l: functools.reduce(
            lambda acc, v: apply_proc(f, [acc, v]), l, init),
        "fold-right": lambda f, init, l: functools.reduce(
            lambda acc, v: apply_proc(f, [v, acc]), reversed(l), init),
        "reduce": lambda f, init, l: functools.reduce(
            lambda acc, v: apply_proc(f, [v, acc]), l, init),
        "apply": lambda f, *a: apply_proc(
            f, list(a[:-1]) + list(a[-1])),
        "sort": lambda l, cmp: sorted(
            l, key=functools.cmp_to_key(
                lambda a, b: -1 if apply_proc(cmp, [a, b]) is not False
                else 1)),
        "iota": lambda n, *a: [
            (a[0] if a else 0) + i * (a[1] if len(a) > 1 else 1)
            for i in range(int(n))],
        "arith-sequence": lambda start, step, n: [
            start + i * step for i in range(int(n))],
        "display": _display,
        "print": lambda *a: _display(*a) or print(),
        "newline": lambda: print(),
        "write": lambda v: print(to_string(v), end=""),
        "make-string": lambda n, *c: (c[0] if c else " ") * int(n),
        "string-length": len,
        "substring": lambda s, a, b=None: s[int(a):(None if b is None
                                                    else int(b))],
        "real-part": lambda z: z.real if isinstance(z, complex) else z,
        "imag-part": lambda z: z.imag if isinstance(z, complex) else 0.0,
        "make-polar": lambda r, t: complex(r * math.cos(t),
                                           r * math.sin(t)),
        "make-rectangular": complex,
        "angle": cmath.phase,
        "error": _scheme_error,
        "exit": _scheme_exit,
        "begin-time": lambda msg, thunk: apply_proc(thunk, []),
        "values": lambda *a: a[0] if len(a) == 1 else list(a),
    })
    if extra:
        env.update(extra)
    return env


def _scheme_error(*args):
    raise SchemeError(" ".join(_disp_str(a) for a in args))


def _scheme_exit(code=0):
    raise SystemExit(int(code) if isinstance(code, (int, float)) else 0)


def eval_program(text: str, env: Environment) -> Any:
    result = None
    for form in parse_all(text):
        result = eval_sexp(form, env)
    return result
