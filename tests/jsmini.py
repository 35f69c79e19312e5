"""Minimal tree-walking JavaScript interpreter — TEST INFRASTRUCTURE.

No browser or JS engine ships in this environment, yet the exported
HTML viewer (padne_tpu/io/htmlview.py) is real product code whose
script must actually EXECUTE under test (reference bar: the Qt/OpenGL
GUI, ui.py:929-2309, which runs under its own test harness).  This
module interprets the deliberately restricted ES subset the viewer
template is written in:

  - const/let/var (multi-declarator), function declarations, arrow
    functions (expression and block bodies), closures
  - if/else, for(;;), for-of, while, return, break, continue
  - numbers (f64), strings, template literals with ${...}, booleans,
    null/undefined, object and array literals
  - member/index access + assignment, compound assignment, postfix ++/--
  - ===/!==/==/!=, relational, arithmetic, %, |, &, ^, &&, ||, ternary,
    unary -/+/!
  - `new` with constructor values (typed arrays), Math.*, parseFloat,
    isFinite, atob, Array.prototype push/forEach/length,
    String.prototype charCodeAt/length, Number.prototype
    toFixed/toPrecision
  - typed arrays (Float32Array & friends) backed by numpy, including
    construction from .buffer

It is NOT a general JS engine: no prototypes, no `this`, no classes,
no regex, no async, no getters, no ASI (the template is fully
semicolon-terminated).  Unknown syntax raises JSError loudly rather
than guessing.
"""

from __future__ import annotations

import base64
import math
import re

import numpy as np


class JSError(Exception):
    pass


# ---------------------------------------------------------------------------
# Values
# ---------------------------------------------------------------------------
class _Singleton:
    _name = "?"

    def __repr__(self):
        return self._name

    def __bool__(self):
        return False


class _Undefined(_Singleton):
    _name = "undefined"


class _Null(_Singleton):
    _name = "null"


UNDEF = _Undefined()
NULL = _Null()


class JSObject:
    __slots__ = ("props", "__weakref__")

    def __init__(self, props=None):
        self.props = dict(props or {})


class JSArray:
    __slots__ = ("items",)

    def __init__(self, items=None):
        self.items = list(items or [])


class JSBuffer:
    __slots__ = ("data",)

    def __init__(self, data: bytes):
        self.data = data


class JSTypedArray:
    __slots__ = ("arr",)

    def __init__(self, arr: np.ndarray):
        self.arr = arr


class TypedArrayCtor:
    def __init__(self, dtype, name):
        self.dtype = np.dtype(dtype)
        self.name = name

    def construct(self, args):
        a = args[0] if args else 0.0
        if isinstance(a, JSBuffer):
            return JSTypedArray(np.frombuffer(a.data, dtype=self.dtype).copy())
        if isinstance(a, JSTypedArray):
            return JSTypedArray(a.arr.astype(self.dtype))
        if isinstance(a, JSArray):
            return JSTypedArray(
                np.array([to_number(x) for x in a.items], dtype=self.dtype)
            )
        return JSTypedArray(np.zeros(int(to_number(a)), dtype=self.dtype))


class JSFunction:
    __slots__ = ("params", "body", "env", "name", "is_expr_body")

    def __init__(self, params, body, env, name="", is_expr_body=False):
        self.params = params
        self.body = body
        self.env = env
        self.name = name
        self.is_expr_body = is_expr_body


# ---------------------------------------------------------------------------
# Coercions
# ---------------------------------------------------------------------------
_NUMERIC_STR = re.compile(
    r"\s*[+-]?(Infinity|\d+\.?\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?)\s*$"
)


def to_number(v):
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if v is NULL:
        return 0.0
    if v is UNDEF:
        return math.nan
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return 0.0
        if _NUMERIC_STR.match(v):
            if s.lstrip("+-") == "Infinity":
                return math.inf if not s.startswith("-") else -math.inf
            return float(s)
        return math.nan
    raise JSError(f"cannot convert {v!r} to number")


def truthy(v):
    if v is UNDEF or v is NULL:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return not (v == 0 or v != v)
    if isinstance(v, str):
        return len(v) > 0
    return True


def format_number(v: float) -> str:
    if v != v:
        return "NaN"
    if v == math.inf:
        return "Infinity"
    if v == -math.inf:
        return "-Infinity"
    if v == int(v) and abs(v) < 1e21:
        return str(int(v))
    return repr(v)


def to_display(v) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return format_number(float(v))
    if v is NULL:
        return "null"
    if v is UNDEF:
        return "undefined"
    if isinstance(v, JSArray):
        return ",".join(to_display(x) for x in v.items)
    return "[object Object]"


def strict_eq(a, b):
    num_a = isinstance(a, (int, float)) and not isinstance(a, bool)
    num_b = isinstance(b, (int, float)) and not isinstance(b, bool)
    if num_a and num_b:
        return float(a) == float(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if isinstance(a, bool) and isinstance(b, bool):
        return a == b
    return a is b


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------
_PUNCTS = [
    "===", "!==",
    "<=", ">=", "&&", "||", "+=", "-=", "*=", "/=", "%=", "++", "--",
    "=>", "==", "!=",
    "<", ">", "+", "-", "*", "/", "%", "(", ")", "[", "]", "{", "}",
    ",", ";", ":", "?", ".", "=", "!", "|", "&", "^", "~",
]
_NUM_RE = re.compile(r"\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?")
_ID_RE = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            "v": "\v", "0": "\0"}


def _scan_string(src, i):
    quote = src[i]
    i += 1
    out = []
    n = len(src)
    while i < n:
        c = src[i]
        if c == quote:
            return "".join(out), i + 1
        if c == "\\":
            e = src[i + 1]
            if e == "u":
                out.append(chr(int(src[i + 2:i + 6], 16)))
                i += 6
            elif e == "x":
                out.append(chr(int(src[i + 2:i + 4], 16)))
                i += 4
            else:
                out.append(_ESCAPES.get(e, e))
                i += 2
            continue
        if c == "\n" and quote != "`":
            raise JSError(f"unterminated string at {i}")
        out.append(c)
        i += 1
    raise JSError("unterminated string at EOF")


def _scan_template(src, i):
    """Scan a template literal starting at the backtick; returns
    (parts, next_index) where parts alternate ('s', text) and
    ('e', token_list)."""
    i += 1  # past `
    parts = []
    chunk = []
    n = len(src)
    while i < n:
        c = src[i]
        if c == "`":
            if chunk:
                parts.append(("s", "".join(chunk)))
            return parts, i + 1
        if c == "\\":
            e = src[i + 1]
            chunk.append(_ESCAPES.get(e, e))
            i += 2
            continue
        if c == "$" and i + 1 < n and src[i + 1] == "{":
            if chunk:
                parts.append(("s", "".join(chunk)))
                chunk = []
            depth = 1
            j = i + 2
            while j < n and depth:
                if src[j] in "\"'":
                    _, j = _scan_string(src, j)
                    continue
                if src[j] == "{":
                    depth += 1
                elif src[j] == "}":
                    depth -= 1
                    if not depth:
                        break
                j += 1
            if depth:
                raise JSError("unterminated ${ in template literal")
            parts.append(("e", tokenize(src[i + 2:j])))
            i = j + 1
            continue
        chunk.append(c)
        i += 1
    raise JSError("unterminated template literal")


def tokenize(src):
    toks = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            if j < 0:
                raise JSError("unterminated block comment")
            i = j + 2
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            m = _NUM_RE.match(src, i)
            toks.append(("num", float(m.group(0))))
            i = m.end()
            continue
        if c.isalpha() or c in "_$":
            m = _ID_RE.match(src, i)
            toks.append(("ident", m.group(0)))
            i = m.end()
            continue
        if c in "\"'":
            s, i = _scan_string(src, i)
            toks.append(("str", s))
            continue
        if c == "`":
            parts, i = _scan_template(src, i)
            toks.append(("tmpl", parts))
            continue
        for p in _PUNCTS:
            if src.startswith(p, i):
                toks.append(("punct", p))
                i += len(p)
                break
        else:
            raise JSError(f"unexpected character {c!r} at offset {i}")
    toks.append(("eof", ""))
    return toks


# ---------------------------------------------------------------------------
# Parser -> tuple AST
# ---------------------------------------------------------------------------
class Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    # -- token helpers --
    def peek(self, ahead=0):
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def at(self, kind, val=None):
        k, v = self.peek()
        return k == kind and (val is None or v == val)

    def at_punct(self, val):
        return self.at("punct", val)

    def at_kw(self, val):
        return self.at("ident", val)

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise JSError(f"expected {val or kind}, got {k} {v!r} "
                          f"(token {self.i - 1})")
        return v

    # -- program / statements --
    def program(self):
        stmts = []
        while not self.at("eof"):
            stmts.append(self.statement())
        return stmts

    def statement(self):
        if self.at_punct("{"):
            return ("block", self.block())
        if self.at_kw("const") or self.at_kw("let") or self.at_kw("var"):
            d = self.var_decl()
            self.expect("punct", ";")
            return d
        if self.at_kw("function"):
            self.next()
            name = self.expect("ident")
            params = self.param_list()
            body = self.block()
            return ("funcdecl", name, params, body)
        if self.at_kw("if"):
            self.next()
            self.expect("punct", "(")
            cond = self.expression()
            self.expect("punct", ")")
            then = self.statement()
            other = None
            if self.at_kw("else"):
                self.next()
                other = self.statement()
            return ("if", cond, then, other)
        if self.at_kw("for"):
            return self.for_stmt()
        if self.at_kw("while"):
            self.next()
            self.expect("punct", "(")
            cond = self.expression()
            self.expect("punct", ")")
            return ("while", cond, self.statement())
        if self.at_kw("return"):
            self.next()
            val = None
            if not self.at_punct(";"):
                val = self.expression()
            self.expect("punct", ";")
            return ("return", val)
        if self.at_kw("break"):
            self.next()
            self.expect("punct", ";")
            return ("break",)
        if self.at_kw("continue"):
            self.next()
            self.expect("punct", ";")
            return ("continue",)
        if self.at_punct(";"):
            self.next()
            return ("empty",)
        e = self.expression()
        self.expect("punct", ";")
        return ("expr", e)

    def block(self):
        self.expect("punct", "{")
        stmts = []
        while not self.at_punct("}"):
            stmts.append(self.statement())
        self.expect("punct", "}")
        return stmts

    def var_decl(self):
        self.next()  # const/let/var
        decls = []
        while True:
            name = self.expect("ident")
            init = None
            if self.at_punct("="):
                self.next()
                init = self.assignment()
            decls.append((name, init))
            if self.at_punct(","):
                self.next()
                continue
            break
        return ("var", decls)

    def for_stmt(self):
        self.next()
        self.expect("punct", "(")
        if self.at_kw("const") or self.at_kw("let") or self.at_kw("var"):
            save = self.i
            self.next()
            name = self.expect("ident")
            if self.at_kw("of"):
                self.next()
                iterable = self.expression()
                self.expect("punct", ")")
                return ("forof", name, iterable, self.statement())
            self.i = save
            init = self.var_decl()
        elif self.at_punct(";"):
            init = None
        else:
            init = ("expr", self.expression())
        self.expect("punct", ";")
        cond = None if self.at_punct(";") else self.expression()
        self.expect("punct", ";")
        update = None if self.at_punct(")") else self.expression()
        self.expect("punct", ")")
        return ("for", init, cond, update, self.statement())

    def param_list(self):
        self.expect("punct", "(")
        params = []
        while not self.at_punct(")"):
            params.append(self.expect("ident"))
            if self.at_punct(","):
                self.next()
        self.expect("punct", ")")
        return params

    # -- expressions --
    def expression(self):
        return self.assignment()

    def assignment(self):
        left = self.ternary()
        k, v = self.peek()
        if k == "punct" and v in ("=", "+=", "-=", "*=", "/=", "%="):
            if left[0] not in ("ident", "member", "index"):
                raise JSError(f"invalid assignment target {left[0]}")
            self.next()
            right = self.assignment()
            return ("assign", v, left, right)
        return left

    def ternary(self):
        cond = self.logical_or()
        if self.at_punct("?"):
            self.next()
            a = self.assignment()
            self.expect("punct", ":")
            b = self.assignment()
            return ("ternary", cond, a, b)
        return cond

    def _binary(self, sub, ops, node="binop"):
        left = sub()
        while True:
            k, v = self.peek()
            if k == "punct" and v in ops:
                self.next()
                left = (node, v, left, sub())
            else:
                return left

    def logical_or(self):
        return self._binary(self.logical_and, ("||",), "logic")

    def logical_and(self):
        return self._binary(self.bitwise, ("&&",), "logic")

    def bitwise(self):
        return self._binary(self.equality, ("|", "&", "^"))

    def equality(self):
        return self._binary(self.relational, ("===", "!==", "==", "!="))

    def relational(self):
        return self._binary(self.additive, ("<", ">", "<=", ">="))

    def additive(self):
        return self._binary(self.multiplicative, ("+", "-"))

    def multiplicative(self):
        return self._binary(self.unary, ("*", "/", "%"))

    def unary(self):
        k, v = self.peek()
        if k == "punct" and v in ("-", "+", "!", "~"):
            self.next()
            return ("unary", v, self.unary())
        if k == "ident" and v == "new":
            self.next()
            callee = self.primary()
            while self.at_punct("."):
                self.next()
                callee = ("member", callee, self.expect("ident"))
            self.expect("punct", "(")
            args = self.arg_list()
            return ("new", callee, args)
        if k == "ident" and v == "typeof":
            self.next()
            return ("typeof", self.unary())
        return self.postfix()

    def arg_list(self):
        args = []
        while not self.at_punct(")"):
            args.append(self.assignment())
            if self.at_punct(","):
                self.next()
        self.expect("punct", ")")
        return args

    def postfix(self):
        e = self.primary()
        while True:
            if self.at_punct("."):
                self.next()
                e = ("member", e, self.expect("ident"))
            elif self.at_punct("["):
                self.next()
                idx = self.expression()
                self.expect("punct", "]")
                e = ("index", e, idx)
            elif self.at_punct("("):
                self.next()
                e = ("call", e, self.arg_list())
            elif self.at_punct("++") or self.at_punct("--"):
                op = self.next()[1]
                e = ("postfix", op, e)
            else:
                return e

    def _maybe_arrow_params(self):
        """At '(': if the matching ')' is followed by '=>', consume and
        return the parameter list; else None."""
        depth = 0
        j = self.i
        while j < len(self.toks):
            k, v = self.toks[j]
            if k == "punct" and v == "(":
                depth += 1
            elif k == "punct" and v == ")":
                depth -= 1
                if depth == 0:
                    nk, nv = self.toks[j + 1]
                    if nk == "punct" and nv == "=>":
                        return self.param_list()
                    return None
            j += 1
        return None

    def _arrow_tail(self, params):
        self.expect("punct", "=>")
        if self.at_punct("{"):
            return ("arrow", params, self.block(), False)
        return ("arrow", params, self.assignment(), True)

    def primary(self):
        k, v = self.peek()
        if k == "num":
            self.next()
            return ("num", v)
        if k == "str":
            self.next()
            return ("str", v)
        if k == "tmpl":
            self.next()
            parsed = []
            for kind, payload in v:
                if kind == "s":
                    parsed.append(("s", payload))
                else:
                    parsed.append(("e", Parser(payload).expression()))
            return ("tmpl", parsed)
        if k == "ident":
            if v == "true":
                self.next()
                return ("bool", True)
            if v == "false":
                self.next()
                return ("bool", False)
            if v == "null":
                self.next()
                return ("null",)
            if v == "undefined":
                self.next()
                return ("undefined",)
            if v == "function":
                self.next()
                name = ""
                if self.at("ident"):
                    name = self.next()[1]
                params = self.param_list()
                return ("funcexpr", name, params, self.block())
            nk, nv = self.peek(1)
            if nk == "punct" and nv == "=>":
                self.next()
                return self._arrow_tail([v])
            self.next()
            return ("ident", v)
        if k == "punct" and v == "(":
            params = self._maybe_arrow_params()
            if params is not None:
                return self._arrow_tail(params)
            self.next()
            e = self.expression()
            self.expect("punct", ")")
            return e
        if k == "punct" and v == "[":
            self.next()
            elems = []
            while not self.at_punct("]"):
                elems.append(self.assignment())
                if self.at_punct(","):
                    self.next()
            self.expect("punct", "]")
            return ("array", elems)
        if k == "punct" and v == "{":
            self.next()
            pairs = []
            while not self.at_punct("}"):
                kk, kv = self.next()
                if kk not in ("ident", "str", "num"):
                    raise JSError(f"bad object key {kk} {kv!r}")
                key = format_number(kv) if kk == "num" else str(kv)
                self.expect("punct", ":")
                pairs.append((key, self.assignment()))
                if self.at_punct(","):
                    self.next()
            self.expect("punct", "}")
            return ("object", pairs)
        raise JSError(f"unexpected token {k} {v!r} (token {self.i})")


# ---------------------------------------------------------------------------
# Evaluator
# ---------------------------------------------------------------------------
class Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def lookup(self, name):
        env = self
        while env is not None:
            if name in env.vars:
                return env.vars[name]
            env = env.parent
        raise JSError(f"{name} is not defined")

    def assign(self, name, value):
        env = self
        while env is not None:
            if name in env.vars:
                env.vars[name] = value
                return
            if env.parent is None:  # sloppy-mode global assignment
                env.vars[name] = value
                return
            env = env.parent

    def declare(self, name, value):
        self.vars[name] = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


def _num_like(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)


class Interp:
    def __init__(self, host_globals=None):
        self.genv = Env()
        for name, val in self._std_globals().items():
            self.genv.declare(name, val)
        for name, val in (host_globals or {}).items():
            self.genv.declare(name, val)

    # -- public API --
    def run(self, src: str):
        for stmt in Parser(tokenize(src)).program():
            self.exec_stmt(stmt, self.genv)

    def eval_expr(self, src: str):
        return self.eval(Parser(tokenize(src)).expression(), self.genv)

    def call_function(self, f, args):
        if isinstance(f, JSFunction):
            env = Env(f.env)
            for i, p in enumerate(f.params):
                env.declare(p, args[i] if i < len(args) else UNDEF)
            if f.is_expr_body:
                return self.eval(f.body, env)
            try:
                for stmt in f.body:
                    self.exec_stmt(stmt, env)
            except _Return as r:
                return r.value
            return UNDEF
        if callable(f):
            out = f(*args)
            if out is None:
                return UNDEF
            if isinstance(out, np.generic):
                return float(out)
            return out
        raise JSError(f"{f!r} is not a function")

    # -- standard library --
    def _std_globals(self):
        def js_min(*a):
            return min((to_number(x) for x in a), default=math.inf)

        def js_max(*a):
            return max((to_number(x) for x in a), default=-math.inf)

        math_obj = JSObject({
            "min": js_min,
            "max": js_max,
            "abs": lambda x: abs(to_number(x)),
            "pow": lambda a, b: float(to_number(a) ** to_number(b)),
            "sqrt": lambda x: math.sqrt(to_number(x)),
            "sin": lambda x: math.sin(to_number(x)),
            "cos": lambda x: math.cos(to_number(x)),
            "floor": lambda x: float(math.floor(to_number(x))),
            "ceil": lambda x: float(math.ceil(to_number(x))),
            "round": lambda x: float(math.floor(to_number(x) + 0.5)),
            "hypot": lambda *a: math.hypot(*(to_number(x) for x in a)),
            "PI": math.pi,
        })

        def parse_float(s):
            m = re.match(
                r"\s*[+-]?(Infinity|\d+\.?\d*([eE][+-]?\d+)?"
                r"|\.\d+([eE][+-]?\d+)?)",
                str(s) if isinstance(s, str) else to_display(s),
            )
            if not m:
                return math.nan
            t = m.group(0).strip()
            if t.lstrip("+-") == "Infinity":
                return -math.inf if t.startswith("-") else math.inf
            return float(t)

        def atob(s):
            return base64.b64decode(s).decode("latin-1")

        return {
            "Math": math_obj,
            "Infinity": math.inf,
            "NaN": math.nan,
            "parseFloat": parse_float,
            "parseInt": lambda s, base=10.0: float(
                int(str(s).strip() or "0", int(base))
            ),
            "isFinite": lambda x: math.isfinite(to_number(x)),
            "isNaN": lambda x: to_number(x) != to_number(x),
            "String": lambda x="": to_display(x),
            "atob": atob,
            "console": JSObject({"log": lambda *a: None,
                                 "warn": lambda *a: None,
                                 "error": lambda *a: None}),
            "Float32Array": TypedArrayCtor(np.float32, "Float32Array"),
            "Float64Array": TypedArrayCtor(np.float64, "Float64Array"),
            "Uint8Array": TypedArrayCtor(np.uint8, "Uint8Array"),
            "Uint16Array": TypedArrayCtor(np.uint16, "Uint16Array"),
            "Uint32Array": TypedArrayCtor(np.uint32, "Uint32Array"),
            "Int32Array": TypedArrayCtor(np.int32, "Int32Array"),
        }

    # -- member / index protocols --
    def get_member(self, obj, name):
        if isinstance(obj, JSObject):
            return obj.props.get(name, UNDEF)
        if isinstance(obj, JSArray):
            if name == "length":
                return float(len(obj.items))
            if name == "push":
                def push(*vals, _o=obj):
                    _o.items.extend(vals)
                    return float(len(_o.items))
                return push
            if name == "forEach":
                def for_each(fn, _o=obj):
                    for i, item in enumerate(list(_o.items)):
                        self.call_function(fn, [item, float(i)])
                    return UNDEF
                return for_each
            if name == "indexOf":
                def index_of(x, _o=obj):
                    for i, item in enumerate(_o.items):
                        if strict_eq(item, x):
                            return float(i)
                    return -1.0
                return index_of
            if name == "join":
                return lambda sep=",": to_display(sep).join(
                    to_display(x) for x in obj.items)
            raise JSError(f"array has no member {name}")
        if isinstance(obj, JSTypedArray):
            if name == "length":
                return float(obj.arr.size)
            if name == "buffer":
                return JSBuffer(obj.arr.tobytes())
            raise JSError(f"typed array has no member {name}")
        if isinstance(obj, str):
            if name == "length":
                return float(len(obj))
            if name == "charCodeAt":
                return lambda i=0.0, _s=obj: float(ord(_s[int(to_number(i))]))
            if name == "charAt":
                return lambda i=0.0, _s=obj: _s[int(to_number(i))]
            if name == "indexOf":
                return lambda sub, _s=obj: float(_s.find(to_display(sub)))
            if name == "trim":
                return lambda _s=obj: _s.strip()
            if name == "endsWith":
                return lambda sub, _s=obj: _s.endswith(to_display(sub))
            if name == "slice":
                def str_slice(start=0.0, end=UNDEF, _s=obj):
                    n = len(_s)
                    a = int(to_number(start))
                    a = max(n + a, 0) if a < 0 else min(a, n)
                    b = n if end is UNDEF else int(to_number(end))
                    b = max(n + b, 0) if b < 0 else min(b, n)
                    return _s[a:b] if a < b else ""
                return str_slice
            raise JSError(f"string has no member {name}")
        if _num_like(obj):
            if name == "toFixed":
                return lambda d=0.0, _v=float(obj): f"{_v:.{int(d)}f}"
            if name == "toPrecision":
                return lambda p, _v=float(obj): f"{_v:.{int(p)}g}"
            raise JSError(f"number has no member {name}")
        raise JSError(f"cannot read {name!r} of {obj!r}")

    def set_member(self, obj, name, value):
        if isinstance(obj, JSObject):
            obj.props[name] = value
            return
        raise JSError(f"cannot set {name!r} on {obj!r}")

    def get_index(self, obj, idx):
        if isinstance(obj, JSTypedArray):
            i = int(to_number(idx))
            return float(obj.arr[i]) if 0 <= i < obj.arr.size else UNDEF
        if isinstance(obj, JSArray):
            i = int(to_number(idx))
            return obj.items[i] if 0 <= i < len(obj.items) else UNDEF
        if isinstance(obj, JSObject):
            return obj.props.get(
                idx if isinstance(idx, str) else format_number(to_number(idx)),
                UNDEF,
            )
        if isinstance(obj, str):
            i = int(to_number(idx))
            return obj[i] if 0 <= i < len(obj) else UNDEF
        raise JSError(f"cannot index {obj!r}")

    def set_index(self, obj, idx, value):
        if isinstance(obj, JSTypedArray):
            obj.arr[int(to_number(idx))] = to_number(value)
            return
        if isinstance(obj, JSArray):
            i = int(to_number(idx))
            if i == len(obj.items):
                obj.items.append(value)
            else:
                obj.items[i] = value
            return
        if isinstance(obj, JSObject):
            key = idx if isinstance(idx, str) else format_number(to_number(idx))
            obj.props[key] = value
            return
        raise JSError(f"cannot index-assign {obj!r}")

    # -- statements --
    def exec_stmt(self, node, env):
        op = node[0]
        if op == "expr":
            self.eval(node[1], env)
        elif op == "var":
            for name, init in node[1]:
                env.declare(name, self.eval(init, env) if init else UNDEF)
        elif op == "block":
            block_env = Env(env)
            for stmt in node[1]:
                self.exec_stmt(stmt, block_env)
        elif op == "if":
            if truthy(self.eval(node[1], env)):
                self.exec_stmt(node[2], env)
            elif node[3] is not None:
                self.exec_stmt(node[3], env)
        elif op == "for":
            loop_env = Env(env)
            if node[1] is not None:
                self.exec_stmt(node[1], loop_env)
            while node[2] is None or truthy(self.eval(node[2], loop_env)):
                try:
                    self.exec_stmt(node[4], loop_env)
                except _Break:
                    break
                except _Continue:
                    pass
                if node[3] is not None:
                    self.eval(node[3], loop_env)
        elif op == "forof":
            iterable = self.eval(node[2], env)
            if isinstance(iterable, JSArray):
                items = list(iterable.items)
            elif isinstance(iterable, JSTypedArray):
                items = [float(x) for x in iterable.arr]
            elif isinstance(iterable, str):
                items = list(iterable)
            else:
                raise JSError(f"{iterable!r} is not iterable")
            for item in items:
                loop_env = Env(env)
                loop_env.declare(node[1], item)
                try:
                    self.exec_stmt(node[3], loop_env)
                except _Break:
                    break
                except _Continue:
                    pass
        elif op == "while":
            while truthy(self.eval(node[1], env)):
                try:
                    self.exec_stmt(node[2], env)
                except _Break:
                    break
                except _Continue:
                    pass
        elif op == "funcdecl":
            env.declare(node[1], JSFunction(node[2], node[3], env, node[1]))
        elif op == "return":
            raise _Return(self.eval(node[1], env) if node[1] else UNDEF)
        elif op == "break":
            raise _Break()
        elif op == "continue":
            raise _Continue()
        elif op == "empty":
            pass
        else:
            raise JSError(f"unknown statement {op}")

    # -- expressions --
    def eval(self, node, env):
        op = node[0]
        if op == "num":
            return node[1]
        if op == "str":
            return node[1]
        if op == "bool":
            return node[1]
        if op == "null":
            return NULL
        if op == "undefined":
            return UNDEF
        if op == "ident":
            return env.lookup(node[1])
        if op == "member":
            return self.get_member(self.eval(node[1], env), node[2])
        if op == "index":
            return self.get_index(self.eval(node[1], env),
                                  self.eval(node[2], env))
        if op == "call":
            f = self.eval(node[1], env)
            args = [self.eval(a, env) for a in node[2]]
            return self.call_function(f, args)
        if op == "new":
            ctor = self.eval(node[1], env)
            args = [self.eval(a, env) for a in node[2]]
            if hasattr(ctor, "construct"):
                return ctor.construct(args)
            raise JSError(f"{ctor!r} is not a constructor")
        if op == "assign":
            return self._assign(node[1], node[2], node[3], env)
        if op == "binop":
            return self._binop(node[1], self.eval(node[2], env),
                               self.eval(node[3], env))
        if op == "logic":
            left = self.eval(node[2], env)
            if node[1] == "&&":
                return self.eval(node[3], env) if truthy(left) else left
            return left if truthy(left) else self.eval(node[3], env)
        if op == "ternary":
            branch = node[2] if truthy(self.eval(node[1], env)) else node[3]
            return self.eval(branch, env)
        if op == "unary":
            u = node[1]
            if u == "!":
                return not truthy(self.eval(node[2], env))
            v = to_number(self.eval(node[2], env))
            if u == "-":
                return -v
            if u == "+":
                return v
            if u == "~":
                return float(~_int32(v))
        if op == "postfix":
            getter, setter = self._ref(node[2], env)
            old = to_number(getter())
            setter(old + (1.0 if node[1] == "++" else -1.0))
            return old
        if op == "array":
            return JSArray([self.eval(e, env) for e in node[1]])
        if op == "object":
            return JSObject({k: self.eval(v, env) for k, v in node[1]})
        if op == "arrow":
            return JSFunction(node[1], node[2], env, "", node[3])
        if op == "funcexpr":
            return JSFunction(node[2], node[3], env, node[1])
        if op == "tmpl":
            out = []
            for kind, payload in node[1]:
                out.append(payload if kind == "s"
                           else to_display(self.eval(payload, env)))
            return "".join(out)
        if op == "typeof":
            try:
                v = self.eval(node[1], env)
            except JSError:
                return "undefined"
            if v is UNDEF:
                return "undefined"
            if isinstance(v, bool):
                return "boolean"
            if _num_like(v):
                return "number"
            if isinstance(v, str):
                return "string"
            if isinstance(v, JSFunction) or callable(v):
                return "function"
            return "object"
        raise JSError(f"unknown expression {op}")

    def _ref(self, node, env):
        if node[0] == "ident":
            name = node[1]
            return (lambda: env.lookup(name),
                    lambda v: env.assign(name, v))
        if node[0] == "member":
            obj = self.eval(node[1], env)
            name = node[2]
            return (lambda: self.get_member(obj, name),
                    lambda v: self.set_member(obj, name, v))
        if node[0] == "index":
            obj = self.eval(node[1], env)
            idx = self.eval(node[2], env)
            return (lambda: self.get_index(obj, idx),
                    lambda v: self.set_index(obj, idx, v))
        raise JSError(f"not a reference: {node[0]}")

    def _assign(self, op, target, value_node, env):
        getter, setter = self._ref(target, env)
        value = self.eval(value_node, env)
        if op != "=":
            value = self._binop(op[0], getter(), value)
        setter(value)
        return value

    def _binop(self, op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return to_display(a) + to_display(b)
            return to_number(a) + to_number(b)
        if op == "-":
            return to_number(a) - to_number(b)
        if op == "*":
            return to_number(a) * to_number(b)
        if op == "/":
            x, y = to_number(a), to_number(b)
            if y == 0:
                if x == 0 or x != x:
                    return math.nan
                return math.inf if (x > 0) == (not _neg_zero(y)) else -math.inf
            return x / y
        if op == "%":
            x, y = to_number(a), to_number(b)
            if y == 0 or x != x or y != y or x in (math.inf, -math.inf):
                return math.nan
            return math.fmod(x, y)
        if op == "===":
            return strict_eq(a, b)
        if op == "!==":
            return not strict_eq(a, b)
        if op == "==":
            if (a is NULL or a is UNDEF) and (b is NULL or b is UNDEF):
                return True
            return strict_eq(a, b)
        if op == "!=":
            return not self._binop("==", a, b)
        if op in ("<", ">", "<=", ">="):
            if isinstance(a, str) and isinstance(b, str):
                x, y = a, b
            else:
                x, y = to_number(a), to_number(b)
                if x != x or y != y:
                    return False
            return {"<": x < y, ">": x > y,
                    "<=": x <= y, ">=": x >= y}[op]
        if op == "|":
            return float(_int32(to_number(a)) | _int32(to_number(b)))
        if op == "&":
            return float(_int32(to_number(a)) & _int32(to_number(b)))
        if op == "^":
            return float(_int32(to_number(a)) ^ _int32(to_number(b)))
        raise JSError(f"unknown operator {op}")


def _neg_zero(y):
    return y == 0 and math.copysign(1.0, y) < 0


def _int32(v: float) -> int:
    if v != v or v in (math.inf, -math.inf):
        return 0
    u = int(v) & 0xFFFFFFFF
    return u - 0x100000000 if u >= 0x80000000 else u
