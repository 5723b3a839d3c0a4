"""Mini-JavaScript interpreter for Beats ``script`` processors.

The reference embeds goja and exposes a small event API to
``function process(event) {...}`` sources (script/javascript/beatevent_v0.go:
81-87 — Get/Put/Rename/Delete/Cancel/Tag/AppendTo plus the ``fields`` map).
Real-world Beats script processors are overwhelmingly straight-line field
surgery in that API, so this module implements a compact recursive-descent
parser + tree-walking interpreter for the JS SUBSET those scripts use:

  statements:  var declarations, assignments, expression statements,
               if/else (with blocks), return
  expressions: string/number/bool/null literals, identifiers, member
               access, [] indexing, function calls, ===, !==, ==, !=,
               <, >, <=, >=, +, -, *, %, &&, ||, !, ternary ?:
  event API:   event.Get/Put/Rename/Delete/Cancel/Tag/AppendTo,
               event.fields["k"] read/write
  string API:  toUpperCase, toLowerCase, trim, split, indexOf, substring,
               startsWith, endsWith, replace, length

Anything outside the subset raises ``JSUnsupported`` at COMPILE time with
the offending token, so unsupported configs fail loudly at pipeline build,
never silently mid-run.  Dotted field paths map to the engine's flattened
columns via ``field_to_column`` (same convention as every other stage).
"""

from __future__ import annotations

import re

from ..event import field_to_column

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<ident>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<punct>===|!==|==|!=|<=|>=|&&|\|\||[{}()\[\];,.=<>+\-*/%!?:])
""", re.X | re.S)

_KEYWORDS = {"function", "var", "let", "const", "if", "else", "return",
             "true", "false", "null", "undefined", "new", "for", "while",
             "throw", "typeof"}


class JSUnsupported(ValueError):
    pass


def _tokenize(src: str):
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise JSUnsupported(f"cannot tokenize at: {src[i:i+20]!r}")
        i = m.end()
        if m.lastgroup == "ws":
            continue
        out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self, k=0):
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]            # clamps to the eof sentinel

    def next(self):
        t = self.toks[min(self.i, len(self.toks) - 1)]
        if t[0] == "eof":
            raise JSUnsupported("unexpected end of script")
        self.i += 1
        return t

    def expect(self, val):
        t = self.next()
        if t[1] != val:
            raise JSUnsupported(f"expected {val!r}, got {t[1]!r}")
        return t

    # ---- statements ----
    def parse_function(self):
        self.expect("function")
        name = self.next()[1]           # process
        self.expect("(")
        arg = self.next()[1]
        self.expect(")")
        body = self.parse_block()
        return name, arg, body

    def parse_block(self):
        self.expect("{")
        stmts = []
        while self.peek()[1] != "}":
            stmts.append(self.parse_stmt())
        self.expect("}")
        return stmts

    def parse_stmt(self):
        kind, val = self.peek()
        if val in ("var", "let", "const"):
            self.next()
            name = self.next()[1]
            init = None
            if self.peek()[1] == "=":
                self.next()
                init = self.parse_expr()
            self._semi()
            return ("var", name, init)
        if val == "if":
            self.next()
            self.expect("(")
            cond = self.parse_expr()
            self.expect(")")
            then = self.parse_block() if self.peek()[1] == "{" \
                else [self.parse_stmt()]
            other = []
            if self.peek()[1] == "else":
                self.next()
                if self.peek()[1] == "if":
                    other = [self.parse_stmt()]
                else:
                    other = self.parse_block() if self.peek()[1] == "{" \
                        else [self.parse_stmt()]
            return ("if", cond, then, other)
        if val == "return":
            self.next()
            expr = None
            if self.peek()[1] not in (";", "}"):
                expr = self.parse_expr()
            self._semi()
            return ("return", expr)
        if val in ("for", "while", "throw", "function", "new", "typeof"):
            raise JSUnsupported(f"JS construct {val!r} is outside the "
                                "supported subset (see stages/minijs.py)")
        expr = self.parse_expr()
        if self.peek()[1] == "=":
            self.next()
            rhs = self.parse_expr()
            self._semi()
            return ("assign", expr, rhs)
        self._semi()
        return ("expr", expr)

    def _semi(self):
        if self.peek()[1] == ";":
            self.next()

    # ---- expressions (precedence climbing) ----
    def parse_expr(self):
        return self.parse_ternary()

    def parse_ternary(self):
        cond = self.parse_or()
        if self.peek()[1] == "?":
            self.next()
            a = self.parse_expr()
            self.expect(":")
            b = self.parse_expr()
            return ("ternary", cond, a, b)
        return cond

    def parse_or(self):
        l = self.parse_and()
        while self.peek()[1] == "||":
            self.next()
            l = ("or", l, self.parse_and())
        return l

    def parse_and(self):
        l = self.parse_cmp()
        while self.peek()[1] == "&&":
            self.next()
            l = ("and", l, self.parse_cmp())
        return l

    def parse_cmp(self):
        l = self.parse_add()
        while self.peek()[1] in ("===", "!==", "==", "!=", "<", ">", "<=", ">="):
            op = self.next()[1]
            l = ("cmp", op, l, self.parse_add())
        return l

    def parse_add(self):
        l = self.parse_mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            l = ("arith", op, l, self.parse_mul())
        return l

    def parse_mul(self):
        l = self.parse_unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            l = ("arith", op, l, self.parse_unary())
        return l

    def parse_unary(self):
        if self.peek()[1] == "!":
            self.next()
            return ("not", self.parse_unary())
        if self.peek()[1] == "-":
            self.next()
            return ("neg", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        while True:
            kind, val = self.peek()
            if val == ".":
                self.next()
                name = self.next()[1]
                e = ("member", e, name)
            elif val == "[":
                self.next()
                idx = self.parse_expr()
                self.expect("]")
                e = ("index", e, idx)
            elif val == "(":
                self.next()
                args = []
                while self.peek()[1] != ")":
                    args.append(self.parse_expr())
                    if self.peek()[1] == ",":
                        self.next()
                self.expect(")")
                e = ("call", e, args)
            else:
                return e

    def parse_primary(self):
        kind, val = self.next()
        if kind == "str":
            body = val[1:-1]
            return ("lit", re.sub(r"\\(.)", r"\1", body))
        if kind == "num":
            return ("lit", float(val) if "." in val else int(val))
        if val == "true":
            return ("lit", True)
        if val == "false":
            return ("lit", False)
        if val in ("null", "undefined"):
            return ("lit", None)
        if val == "(":
            e = self.parse_expr()
            self.expect(")")
            return e
        if val == "[":
            items = []
            while self.peek()[1] != "]":
                items.append(self.parse_expr())
                if self.peek()[1] == ",":
                    self.next()
            self.expect("]")
            return ("array", items)
        if kind == "ident" and val not in _KEYWORDS:
            return ("ident", val)
        raise JSUnsupported(f"unsupported expression token {val!r}")


class _Cancelled(Exception):
    pass


class _Returned(Exception):
    def __init__(self, value):
        self.value = value


class _EventProxy:
    """The beatevent_v0 API over the engine's flattened row dict."""

    def __init__(self, row: dict):
        self.row = row
        self.cancelled = False

    def Get(self, key=None):
        if key is None:
            return dict(self.row)
        return self.row.get(field_to_column(key))

    def Put(self, key, value):
        col = field_to_column(key)
        old = self.row.get(col)
        self.row[col] = value
        return old

    def Rename(self, frm, to):
        c1, c2 = field_to_column(frm), field_to_column(to)
        if c1 not in self.row or self.row.get(c1) is None:
            return False
        self.row[c2] = self.row.pop(c1)
        return True

    def Delete(self, key):
        col = field_to_column(key)
        if col in self.row:
            del self.row[col]
            return True
        return False

    def Cancel(self):
        self.cancelled = True
        raise _Cancelled()

    def Tag(self, tag):
        tags = self.row.get("tags") or []
        if tag not in tags:
            tags = list(tags) + [tag]
        self.row["tags"] = tags

    def AppendTo(self, key, value):
        col = field_to_column(key)
        cur = self.row.get(col)
        cur = list(cur) if isinstance(cur, (list, tuple)) else \
            ([cur] if cur is not None else [])
        cur.append(value)
        self.row[col] = cur


_STRING_METHODS = {
    "toUpperCase": lambda s: s.upper(),
    "toLowerCase": lambda s: s.lower(),
    "trim": lambda s: s.strip(),
}


class _Interp:
    def __init__(self, arg_name: str, body):
        self.arg = arg_name
        self.body = body

    def run(self, row: dict):
        proxy = _EventProxy(row)
        env = {self.arg: proxy, "String": str, "Number": float,
               "parseInt": lambda v, base=10: int(str(v), int(base)),
               "parseFloat": float}
        try:
            for st in self.body:
                self.exec_stmt(st, env)
        except _Cancelled:
            return None
        except _Returned:
            pass
        return None if proxy.cancelled else proxy.row

    def exec_stmt(self, st, env):
        op = st[0]
        if op == "var":
            env[st[1]] = self.eval(st[2], env) if st[2] is not None else None
        elif op == "if":
            if _truthy(self.eval(st[1], env)):
                for s in st[2]:
                    self.exec_stmt(s, env)
            else:
                for s in st[3]:
                    self.exec_stmt(s, env)
        elif op == "return":
            raise _Returned(self.eval(st[1], env) if st[1] else None)
        elif op == "assign":
            self.assign(st[1], self.eval(st[2], env), env)
        elif op == "expr":
            self.eval(st[1], env)
        else:  # pragma: no cover
            raise JSUnsupported(f"statement {op}")

    def assign(self, target, value, env):
        if target[0] == "ident":
            env[target[1]] = value
            return
        if target[0] == "index" or target[0] == "member":
            base = target[1]
            # event.fields["k"] = v  /  event.fields.k = v
            if base[0] == "member" and base[2] == "fields" and \
                    isinstance(self.eval_base(base[1], env), _EventProxy):
                proxy = self.eval_base(base[1], env)
                key = self.eval(target[2], env) if target[0] == "index" \
                    else target[2]
                proxy.Put(key, value)
                return
            obj = self.eval(base, env)
            if isinstance(obj, dict):
                key = self.eval(target[2], env) if target[0] == "index" \
                    else target[2]
                obj[key] = value
                return
        raise JSUnsupported("unsupported assignment target")

    def eval_base(self, node, env):
        try:
            return self.eval(node, env)
        except JSUnsupported:
            return None

    def eval(self, node, env):
        op = node[0]
        if op == "lit":
            return node[1]
        if op == "array":
            return [self.eval(x, env) for x in node[1]]
        if op == "ident":
            if node[1] not in env:
                raise JSUnsupported(f"unknown identifier {node[1]!r}")
            return env[node[1]]
        if op == "member":
            obj = self.eval(node[1], env)
            name = node[2]
            if isinstance(obj, _EventProxy):
                if name == "fields":
                    return obj.row_view()
                return getattr(obj, name)
            if isinstance(obj, str):
                if name == "length":
                    return len(obj)
                if name in _STRING_METHODS:
                    return lambda o=obj, f=_STRING_METHODS[name]: f(o)
                if name == "split":
                    return lambda sep, o=obj: o.split(sep)
                if name == "indexOf":
                    return lambda sub, o=obj: o.find(sub)
                if name == "substring":
                    return lambda a, b=None, o=obj: o[int(a):None if b is None else int(b)]
                if name == "startsWith":
                    return lambda p, o=obj: o.startswith(p)
                if name == "endsWith":
                    return lambda p, o=obj: o.endswith(p)
                if name == "replace":
                    return lambda a, b, o=obj: o.replace(a, b, 1)
            if isinstance(obj, (list, tuple)):
                if name == "length":
                    return len(obj)
                if name == "indexOf":
                    return lambda v, o=obj: o.index(v) if v in o else -1
                if name == "includes" or name == "contains":
                    return lambda v, o=obj: v in o
                if name == "join":
                    return lambda sep, o=obj: sep.join(str(x) for x in o)
            if isinstance(obj, dict):
                return obj.get(name)
            raise JSUnsupported(f"member {name!r} on {type(obj).__name__}")
        if op == "index":
            obj = self.eval(node[1], env)
            key = self.eval(node[2], env)
            if isinstance(obj, _EventProxy):
                return obj.Get(key)
            if isinstance(obj, dict):
                return obj.get(key)
            if isinstance(obj, (list, str)):
                try:
                    return obj[int(key)]
                except (IndexError, ValueError):
                    return None
            return None
        if op == "call":
            fn = self.eval(node[1], env)
            args = [self.eval(a, env) for a in node[2]]
            if not callable(fn):
                raise JSUnsupported("call of non-function")
            return fn(*args)
        if op == "ternary":
            return self.eval(node[2], env) if _truthy(self.eval(node[1], env)) \
                else self.eval(node[3], env)
        if op == "or":
            l = self.eval(node[1], env)
            return l if _truthy(l) else self.eval(node[2], env)
        if op == "and":
            l = self.eval(node[1], env)
            return self.eval(node[2], env) if _truthy(l) else l
        if op == "not":
            return not _truthy(self.eval(node[1], env))
        if op == "neg":
            return -self.eval(node[1], env)
        if op == "cmp":
            _, o, a, b = node
            l, r = self.eval(a, env), self.eval(b, env)
            if o in ("==", "==="):
                return l == r
            if o in ("!=", "!=="):
                return l != r
            if l is None or r is None:
                return False
            return {"<": l < r, ">": l > r, "<=": l <= r, ">=": l >= r}[o]
        if op == "arith":
            _, o, a, b = node
            l, r = self.eval(a, env), self.eval(b, env)
            if o == "+":
                if isinstance(l, str) or isinstance(r, str):
                    return _jstr(l) + _jstr(r)
                return (l or 0) + (r or 0)
            if o == "-":
                return (l or 0) - (r or 0)
            if o == "*":
                return (l or 0) * (r or 0)
            if o == "%":
                return (l or 0) % (r or 1)
            if o == "/":
                return (l or 0) / (r or 1)
        raise JSUnsupported(f"expression {op}")


def _truthy(v) -> bool:
    if v is None or v is False or v == "" or v == 0:
        return False
    return True


def _jstr(v) -> str:
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    return str(v)


# event.fields view: expose the raw row dict through Put-style key mapping
def _row_view(self):
    proxy = self

    class View(dict):
        def __getitem__(self, k):
            return proxy.Get(k)

        def get(self, k, default=None):
            v = proxy.Get(k)
            return default if v is None else v

        def __setitem__(self, k, v):
            proxy.Put(k, v)

    return View()


_EventProxy.row_view = _row_view


def compile_js(source: str):
    """Compile a ``function process(event) {...}`` JS source into a Python
    callable ``fn(row_dict) -> dict | None`` (None = event cancelled).
    Raises JSUnsupported at compile time for anything outside the subset."""
    toks = _tokenize(source)
    p = _Parser(toks)
    # allow leading helper assignments? subset: single process function
    name, arg, body = p.parse_function()
    if name != "process":
        raise JSUnsupported(f"expected function process, got {name!r}")
    interp = _Interp(arg, body)
    return interp.run
