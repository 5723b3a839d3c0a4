"""Mini-JavaScript interpreter for Beats ``script`` processors.

The reference embeds goja and exposes a small event API to
``function process(event) {...}`` sources (script/javascript/beatevent_v0.go:
81-87 — Get/Put/Rename/Delete/Cancel/Tag/AppendTo plus the ``fields`` map).
Real-world Beats script processors are overwhelmingly straight-line field
surgery in that API, so this module implements a compact recursive-descent
parser + tree-walking interpreter for the JS SUBSET those scripts use:

  statements:  var declarations, assignments (incl. += -= *= /= %=),
               expression statements, if/else (with blocks), return,
               while, do/while, for(;;), for-in, switch, break, continue,
               function declarations/expressions (closures), throw,
               try/catch/finally (runtime errors surface as catchable
               Error-shaped {name, message} values — goja parity)
  expressions: string/number/bool/null literals, regex literals,
               identifiers, member access, [] indexing, function calls,
               `new` (user/host constructors), ===, !==, ==, !=,
               <, >, <=, >=, +, -, *, %, &&, ||, !, ternary ?:,
               typeof, instanceof, ++/-- (prefix and postfix),
               ``arguments`` inside functions
  event API:   event.Get/Put/Rename/Delete/Cancel/Tag/AppendTo,
               event.fields["k"] read/write
  string API:  toUpperCase, toLowerCase, trim, split, indexOf,
               lastIndexOf, charAt, charCodeAt, substring, substr,
               startsWith, endsWith, replace, match, search, repeat,
               length
  array API:   push/pop/shift/unshift, indexOf, includes, join, concat,
               slice, forEach/map/filter (ES5 (value, index, array)
               callback args), some/every/reduce, sort (comparator),
               reverse, length

Anything outside the subset raises ``JSUnsupported`` at COMPILE time with
the offending token, so unsupported configs fail loudly at pipeline build,
never silently mid-run.  Loops carry a per-invocation iteration budget
(``_MAX_ITER``) so a runaway script fails loudly instead of hanging a
worker.  Dotted field paths map to the engine's flattened columns via
``field_to_column`` (same convention as every other stage).

Semantics notes (goja/ES5 parity, round-2/3 ADVICE): string literals decode
real JS escapes (\\n is a newline, not 'n'); ``==``/``!=`` apply JS abstract
coercion (1 == "1"); relational ops on mixed string/number coerce to number
(never a Python TypeError); ``%`` keeps the dividend's sign; ``x/0`` is
Infinity (0/0 NaN).
"""

from __future__ import annotations

import bisect
import datetime as _dt_mod
import math
import re

class _Env(dict):
    """A lexical scope: the dict holds the scope's OWN bindings; lookups of
    absent names fall outward through ``outer`` (``__missing__`` only fires
    on a miss, so local reads stay at C dict speed — the ChainMap this
    replaced walked every scope in Python per read)."""

    __slots__ = ("outer",)

    def __init__(self, init=None, outer=None):
        super().__init__(init or ())
        self.outer = outer

    def __missing__(self, k):
        outer = self.outer
        if outer is None:
            raise KeyError(k)
        return outer[k]

from ..event import field_to_column

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<num>0[xX][0-9A-Fa-f]+|\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<ident>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<punct>===|!==|==|!=|<=|>=|&&|\|\||\+\+|--|\+=|-=|\*=|/=|%=
              |[{}()\[\];,.=<>+\-*/%!?:])
""", re.X | re.S)

_KEYWORDS = {"function", "var", "let", "const", "if", "else", "return",
             "true", "false", "null", "undefined", "new", "for", "while",
             "throw", "typeof", "break", "continue", "in", "do", "delete"}

_MAX_ITER = 1_000_000       # per-process() loop-iteration budget

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            "v": "\v", "0": "\0", "\\": "\\", "'": "'", '"': '"', "/": "/"}


def _unescape_js(body: str) -> str:
    """Decode JS string escapes the way goja does (round-3 ADVICE: the old
    ``\\(.) -> \\1`` turned \\n into a literal 'n')."""
    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e[0] == "x":
            return chr(int(e[1:3], 16))
        if e[0] == "u":
            return chr(int(e[1:5], 16))
        return _ESCAPES.get(e, e)
    return re.sub(r"\\(x[0-9A-Fa-f]{2}|u[0-9A-Fa-f]{4}|.)", sub, body)


class JSUnsupported(ValueError):
    pass


def _js_propkey(k):
    """JS property-name coercion: object keys are strings, so a numeric
    lookup (evt RecordType 15) must find the literal key '15'."""
    if isinstance(k, bool):
        return "true" if k else "false"
    if isinstance(k, float) and k.is_integer() and abs(k) < 2 ** 53:
        return str(int(k))
    if isinstance(k, (int, float)):
        return str(k)
    return k


def _regex_position(out) -> bool:
    """A '/' starts a REGEX LITERAL (not division) when the previous token
    cannot end an expression — goja/ES lexer rule."""
    if not out:
        return True
    kind, val = out[-1]
    if kind in ("num", "str", "regex"):
        return False
    if kind == "ident":
        return val in ("return", "typeof", "in", "of", "case", "new",
                       "delete", "void", "instanceof")
    return val not in (")", "]", "++", "--")


def _scan_regex(src: str, i: int):
    """Scan ``/pattern/flags`` starting at src[i] == '/'; returns
    (token_text, end_index) or None if unterminated."""
    j, in_class = i + 1, False
    while j < len(src):
        ch = src[j]
        if ch == "\\":
            j += 2
            continue
        if ch == "\n":
            return None
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "/":
            k = j + 1
            while k < len(src) and src[k].isalpha():
                k += 1
            return src[i:k], k
        j += 1
    return None


def _tokenize(src: str):
    out, i = [], 0
    while i < len(src):
        if src[i] == "/" and src[i:i + 2] not in ("//", "/*") \
                and _regex_position(out):
            scanned = _scan_regex(src, i)
            if scanned is not None:
                out.append(("regex", scanned[0]))
                i = scanned[1]
                continue
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise JSUnsupported(f"cannot tokenize at: {src[i:i+20]!r}")
        i = m.end()
        if m.lastgroup == "ws":
            continue
        out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


class _JSRegExp:
    """Runtime object for a JS regex literal — python ``re`` backed (the
    common subset is syntax-compatible); the ``g`` flag switches
    String.replace/match to global semantics like goja."""

    def __init__(self, pattern: str, flags: str):
        f = 0
        if "i" in flags:
            f |= re.I
        if "m" in flags:
            f |= re.M
        if "s" in flags:
            f |= re.S
        self.source = pattern
        self.global_ = "g" in flags
        self.rx = re.compile(pattern, f)

    def test(self, s) -> bool:
        return s is not None and self.rx.search(str(s)) is not None

    def exec(self, s):
        if s is None:
            return None
        m = self.rx.search(str(s))
        if m is None:
            return None
        return [m.group(0)] + [g for g in m.groups()]


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0
        self._no_in = False   # suppress the `in` OPERATOR in for-headers

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
        name = self.next()[1]           # process / helper name
        self.expect("(")
        params = []
        while self.peek()[1] != ")":
            params.append(self.next()[1])
            if self.peek()[1] == ",":
                self.next()
        self.expect(")")
        body = self.parse_block()
        return name, params, body

    def parse_program(self):
        """Top level: function declarations + plain statements (var x =
        require("net"); ...), in source order."""
        funcs = {}
        top = []
        while self.peek()[0] != "eof":
            if self.peek()[1] == "function":
                name, params, body = self.parse_function()
                funcs[name] = (params, body)
            else:
                top.append(self.parse_stmt())
        return funcs, top

    def parse_block(self):
        self.expect("{")
        stmts = []
        while self.peek()[1] != "}":
            stmts.append(self.parse_stmt())
        self.expect("}")
        return stmts

    def parse_stmt(self):
        kind, val = self.peek()
        if val == "function":
            # nested function DECLARATION: a binding in the enclosing env
            name, params, body = self.parse_function()
            return ("var", name, ("funclit", params, body))
        if val in ("var", "let", "const"):
            self.next()
            decls = []
            while True:
                name = self.next()[1]
                init = None
                if self.peek()[1] == "=":
                    self.next()
                    init = self.parse_expr()
                decls.append((name, init))
                if self.peek()[1] == ",":   # var a = x, b = y;
                    self.next()
                    continue
                break
            self._semi()
            if len(decls) == 1:
                return ("var", decls[0][0], decls[0][1])
            return ("vars", decls)
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
        if val == "while":
            self.next()
            self.expect("(")
            cond = self.parse_expr()
            self.expect(")")
            body = self.parse_block() if self.peek()[1] == "{" \
                else [self.parse_stmt()]
            return ("while", cond, body)
        if val == "for":
            return self.parse_for()
        if val == "break":
            self.next()
            self._semi()
            return ("break",)
        if val == "continue":
            self.next()
            self._semi()
            return ("continue",)
        if val == "switch":
            return self.parse_switch()
        if val == "throw":
            self.next()
            expr = self.parse_expr()
            self._semi()
            return ("throw", expr)
        if val == "try":
            self.next()
            block = self.parse_block()
            cname = cblock = fblock = None
            if self.peek()[1] == "catch":
                self.next()
                self.expect("(")
                cname = self.next()[1]
                self.expect(")")
                cblock = self.parse_block()
            if self.peek()[1] == "finally":
                self.next()
                fblock = self.parse_block()
            if cblock is None and fblock is None:
                raise JSUnsupported("try without catch/finally")
            return ("try", block, cname, cblock, fblock)
        if val == "do":
            self.next()
            body = self.parse_block() if self.peek()[1] == "{" \
                else [self.parse_stmt()]
            if self.next()[1] != "while":
                raise JSUnsupported("do without while")
            self.expect("(")
            cond = self.parse_expr()
            self.expect(")")
            self._semi()
            return ("dowhile", cond, body)
        expr = self.parse_expr()
        nxt = self.peek()[1]
        if nxt == "=":
            self.next()
            rhs = self.parse_expr()
            self._semi()
            return ("assign", expr, rhs)
        if nxt in ("+=", "-=", "*=", "/=", "%="):
            self.next()
            rhs = self.parse_expr()
            self._semi()
            return ("assign", expr, ("arith", nxt[0], expr, rhs))
        self._semi()
        return ("expr", expr)

    def parse_switch(self):
        """switch/case with C-style fallthrough; case match is ===."""
        self.next()                    # 'switch'
        self.expect("(")
        disc = self.parse_expr()
        self.expect(")")
        self.expect("{")
        cases = []
        while self.peek()[1] != "}":
            if self.peek()[1] == "case":
                self.next()
                e = self.parse_expr()
                self.expect(":")
            elif self.peek()[1] == "default":
                self.next()
                self.expect(":")
                e = None
            else:
                raise JSUnsupported("expected case/default in switch")
            stmts = []
            while self.peek()[1] not in ("case", "default", "}"):
                stmts.append(self.parse_stmt())
            cases.append((e, stmts))
        self.expect("}")
        return ("switch", disc, cases)

    def parse_for(self):
        self.next()                    # 'for'
        self.expect("(")
        # for (var k in obj) / for (k in obj)
        save = self.i
        if self.peek()[1] in ("var", "let", "const"):
            self.next()
        if self.peek()[0] == "ident" and self.peek(1)[1] == "in":
            name = self.next()[1]
            self.next()                # 'in'
            obj = self.parse_expr()
            self.expect(")")
            body = self.parse_block() if self.peek()[1] == "{" \
                else [self.parse_stmt()]
            return ("forin", name, obj, body)
        self.i = save
        init = None
        if self.peek()[1] != ";":
            init = self.parse_stmt()   # consumes the ';'
        else:
            self.next()
        cond = None
        if self.peek()[1] != ";":
            cond = self.parse_expr()
        self.expect(";")
        update = None
        if self.peek()[1] != ")":
            update = self._parse_update()
        self.expect(")")
        body = self.parse_block() if self.peek()[1] == "{" \
            else [self.parse_stmt()]
        return ("for", init, cond, update, body)

    def _parse_update(self):
        """The third for-clause: assignment / compound / ++/-- / expr,
        without a trailing semicolon."""
        expr = self.parse_expr()       # ++/-- handled inside parse_postfix
        nxt = self.peek()[1]
        if nxt == "=":
            self.next()
            return ("assign", expr, self.parse_expr())
        if nxt in ("+=", "-=", "*=", "/=", "%="):
            self.next()
            return ("assign", expr, ("arith", nxt[0], expr, self.parse_expr()))
        return ("expr", expr)

    def _semi(self):
        if self.peek()[1] == ";":
            self.next()

    # ---- expressions (precedence climbing) ----
    def parse_expr(self):
        e = self.parse_ternary()
        # assignment EXPRESSION — `(name = src[i].Name) == null` (o365):
        # plain '=' only ('==' lexes as one token); right-associative
        if self.peek()[1] == "=" and e[0] in ("ident", "member", "index"):
            self.next()
            return ("assignexpr", e, self.parse_expr())
        return e

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
        while True:
            nxt = self.peek()[1]
            if nxt in ("===", "!==", "==", "!=", "<", ">", "<=", ">="):
                op = self.next()[1]
                l = ("cmp", op, l, self.parse_add())
            elif nxt == "instanceof":
                self.next()
                tname = self.next()[1]
                l = ("instanceof", l, tname)
            elif nxt == "in" and not self._no_in:
                self.next()
                l = ("in_op", l, self.parse_add())
            else:
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
        if self.peek()[1] == "new":
            self.next()
            e = self.parse_postfix()
            if e[0] == "call":
                return ("new", e[1], e[2])
            # postfix accesses after the constructor call bind to the
            # construction RESULT: `new processor.Dissect({...}).Run` is
            # (new processor.Dissect({...})).Run (cisco/ios pipeline.js)
            trail, inner = [], e
            while inner[0] in ("member", "index"):
                trail.append((inner[0], inner[2]))
                inner = inner[1]
            if inner[0] == "call":
                node = ("new", inner[1], inner[2])
                for kind, x in reversed(trail):
                    node = (kind, node, x)
                return node
            return ("new", e, [])
        if self.peek()[1] == "!":
            self.next()
            return ("not", self.parse_unary())
        if self.peek()[1] == "-":
            self.next()
            return ("neg", self.parse_unary())
        if self.peek()[1] == "typeof":
            self.next()
            return ("typeof", self.parse_unary())
        if self.peek()[1] == "delete":
            self.next()
            return ("delete", self.parse_unary())
        if self.peek()[1] in ("++", "--"):
            op = self.next()[1]
            return ("incdec", self.parse_unary(), 1 if op == "++" else -1, False)
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        while True:
            kind, val = self.peek()
            if val in ("++", "--"):
                self.next()
                return ("incdec", e, 1 if val == "++" else -1, True)
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
        if kind == "regex":
            body, _, flags = val[1:].rpartition("/")
            try:
                return ("lit", _JSRegExp(body, flags))
            except re.error as e:
                raise JSUnsupported(f"regex literal {val!r}: {e}")
        if val == "function":
            # function EXPRESSION (optionally named): closures over the
            # defining env — gcp/o365-style `var f = function(evt){...}`
            if self.peek()[0] == "ident":
                self.next()
            self.expect("(")
            params = []
            while self.peek()[1] != ")":
                params.append(self.next()[1])
                if self.peek()[1] == ",":
                    self.next()
            self.expect(")")
            body = self.parse_block()
            return ("funclit", params, body)
        if kind == "str":
            return ("lit", _unescape_js(val[1:-1]))
        if kind == "num":
            if val[:2] in ("0x", "0X"):
                return ("lit", int(val, 16))
            return ("lit", float(val) if "." in val or "e" in val
                    or "E" in val else int(val))
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
        if val == "{":
            pairs = []
            while self.peek()[1] != "}":
                kt = self.next()
                if kt[0] == "ident":
                    key = kt[1]
                elif kt[0] == "str":
                    key = _unescape_js(kt[1][1:-1])
                elif kt[0] == "num":
                    # numeric keys are STRING property names in JS
                    # (o365 RecordType map: {1: 'ExchangeAdmin', ...})
                    f = float(kt[1])
                    key = str(int(f)) if f.is_integer() else str(f)
                else:
                    raise JSUnsupported(f"object key {kt[1]!r}")
                self.expect(":")
                pairs.append((key, self.parse_expr()))
                if self.peek()[1] == ",":
                    self.next()
            self.expect("}")
            return ("object", pairs)
        if kind == "ident" and val not in _KEYWORDS:
            return ("ident", val)
        raise JSUnsupported(f"unsupported expression token {val!r}")


class _Cancelled(Exception):
    pass


class _Returned(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Thrown(Exception):
    """A JS ``throw`` in flight.  ``value`` is the thrown JS value (often a
    ``{name, message}`` Error dict).  Escaping uncaught to the stage layer
    it reads as a script failure, poisoning the row like any other
    processor error (goja: uncaught exception -> processor error)."""

    def __init__(self, value):
        self.value = value
        m = value.get("message") if isinstance(value, dict) else value
        super().__init__(str(m))


class _EventProxy:
    """The beatevent_v0 API over the engine's flattened row dict."""

    def __init__(self, row: dict):
        self.row = row
        self.cancelled = False
        # sorted key cache for the container-Get prefix scan; invalidated
        # whenever the KEY SET changes (value overwrites keep it)
        self._keys_sorted: list | None = None
        # column -> the dotted-path segments it was Put under: goja splits
        # ONLY on dots, so Put("a.b.target_domain") must not make
        # "target_domain" look like a child of "a.b.target" when a later
        # Get("a.b.target") rebuilds a container view (google_workspace
        # drive).  Decode-flattened columns have no entry and keep the
        # underscore-as-separator heuristic (o365 ExceptionInfo).
        self.segs: dict = {}

    def Get(self, key=None):
        if key is None:
            return dict(self.row)
        col = field_to_column(key)
        v = self.row.get(col)
        if v is not None:
            return v
        # dict-valued ancestor: an earlier Put stored a MAP at a shorter
        # path (o365 makeObjFromNameValuePairArray puts ExtendedProperties
        # as a dict; altUserAgent then Gets .ExtendedProperties.UserAgent)
        parts = str(key).split(".")
        for i in range(len(parts) - 1, 0, -1):
            av = self.row.get(field_to_column(".".join(parts[:i])))
            if isinstance(av, dict):
                cur = av
                for seg in parts[i:]:
                    cur = cur.get(seg) if isinstance(cur, dict) else None
                    if cur is None:
                        break
                if cur is not None:
                    return cur
        # container Get: the decoder flattens nested OBJECTS into prefix
        # columns (o365audit.ExceptionInfo -> ..._FalsePositive), but goja's
        # evt.Get returns the map — rebuild a (single-level) dict view so
        # null-checks and iteration see the container
        pre = col + "_"
        kp = str(key).split(".")
        cache = self._keys_sorted
        if cache is None:
            # (sorted keys for the bisect prefix scan, key -> insertion
            # index so the rebuilt dict view keeps goja's insertion-order
            # object semantics).  Rebuilt whenever the key SET changes;
            # overwriting an existing key keeps its dict slot, so the
            # position map stays valid between rebuilds.
            ks = sorted(self.row)
            cache = self._keys_sorted = (ks, {k: i for i, k in enumerate(self.row)})
        ks, pos = cache
        matched = []
        for j in range(bisect.bisect_left(ks, pre), len(ks)):
            k = ks[j]
            if not k.startswith(pre):
                break   # sorted: past the prefix range
            val = self.row.get(k)
            if val is None:
                continue
            segs = self.segs.get(k)
            if segs is not None and not (
                    len(segs) > len(kp) and list(segs[:len(kp)]) == kp):
                continue   # literal underscore key, not a child
            matched.append(k)
        matched.sort(key=pos.__getitem__)
        subs = {k[len(pre):]: self.row[k] for k in matched}
        return subs or None

    def Put(self, key, value):
        col = field_to_column(key)
        old = self.row.get(col)
        if col not in self.row:
            self._keys_sorted = None
        self.row[col] = value
        self.segs[col] = tuple(str(key).split("."))
        return old

    def Rename(self, frm, to):
        c1, c2 = field_to_column(frm), field_to_column(to)
        if c1 not in self.row or self.row.get(c1) is None:
            return False
        if self.row.get(c2) is not None:
            # beatevent_v0.go:166-170: fields cannot be overwritten — the
            # target must be deleted or renamed first; Rename returns false
            # and leaves BOTH fields untouched (null slot == absent in this
            # engine's event model, consistent with Get)
            return False
        self._keys_sorted = None
        self.row[c2] = self.row.pop(c1)
        return True

    def Delete(self, key):
        col = field_to_column(key)
        if col in self.row:
            del self.row[col]
            self._keys_sorted = None
            return True
        return False

    def Cancel(self):
        self.cancelled = True
        raise _Cancelled()

    def Tag(self, tag):
        tags = self.row.get("tags") or []
        if tag not in tags:
            tags = list(tags) + [tag]
        if "tags" not in self.row:
            self._keys_sorted = None
        self.row["tags"] = tags

    def AppendTo(self, key, value):
        # beatevent_v0.go appendString: nil -> scalar string, scalar ->
        # 2-element array, array -> append; duplicates are dropped; the
        # value is stringified (call.Argument(1).String())
        col = field_to_column(key)
        value = value if isinstance(value, str) else _jstr(value)
        cur = self.row.get(col)
        if cur is None:
            if col not in self.row:
                self._keys_sorted = None
            self.row[col] = value
        elif isinstance(cur, (list, tuple)):
            if value not in cur:
                self.row[col] = list(cur) + [value]
        else:
            if value != cur:
                self.row[col] = [cur, value]


_STRING_METHODS = {
    "toUpperCase": lambda s: s.upper(),
    "toLowerCase": lambda s: s.lower(),
    "trim": lambda s: s.strip(),
    "toString": lambda s: s,
    "valueOf": lambda s: s,
}




def _go_layouts(layouts):
    """Go reference-time layouts -> the timestamp stage's strptime layouts
    (UNIX/UNIX_MS/ISO8601 pass through)."""
    out = []
    for lay in layouts or []:
        if lay in ("UNIX", "UNIX_MS", "ISO8601", "TAI64N"):
            out.append(lay)
            continue
        t = lay
        for go, py in ((".999999999", ".%f"), (".999999", ".%f"),
                       (".999", ".%f"), ("Z07:00", "%z"), ("-07:00", "%z"),
                       ("Z0700", "%z"), ("-0700", "%z"), ("2006", "%Y"),
                       ("Jan", "%b"), ("Mon", "%a"), ("January", "%B"),
                       ("15", "%H"), ("01", "%m"), ("02", "%d"),
                       ("_2", "%e"), ("04", "%M"), ("05", "%S"),
                       ("MST", "%Z"), ("06", "%y"), ("PM", "%p")):
            t = t.replace(go, py)
        out.append(t)
    return out


def _run_stage_on_event(stage, proxy):
    """Execute a batch Stage against ONE event (the goja processor-registry
    shim: ``new processor.Convert({...}).Run(evt)``).  The row is rebuilt
    from the stage's 1-row output; non-arrow-able values are held aside."""
    import pyarrow as pa
    row = proxy.row
    cols, names, held = [], [], {}
    for k, v in row.items():
        if v is None:
            # null == ABSENT in the event model: a None slot (another
            # row's column) must not count as present, or a Convert with
            # ignore_missing would null its target (o365 DLP user.id)
            held[k] = v
            continue
        try:
            cols.append(pa.array([v]))
            names.append(k)
        except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError, ValueError):
            held[k] = v
    t = pa.table(cols, names=names) if names else pa.table({"_d": [0]})
    out = stage.apply(t)
    if len(out) == 0:
        proxy.Cancel()
        return
    new = out.to_pylist()[0]
    new.pop("_d", None)
    for k, v in held.items():
        new.setdefault(k, v)   # held-aside slots must not clobber stage output
    row.clear()
    row.update(new)
    # the stage may have added/removed columns behind the proxy's back —
    # drop the sorted-key/insertion-order cache or later container Gets
    # silently miss the new fields
    proxy._keys_sorted = None


_STAGE_CACHE: dict = {}


def _make_stage(name, cfg):
    # module JS rebuilds processor chains per event (google_workspace admin
    # constructs its whole pipeline inside the per-event dispatch): stages
    # are stateless once built, so memoize on the canonical config
    try:
        import json as _j
        key = (name, _j.dumps(cfg, sort_keys=True, default=str))
    except (TypeError, ValueError):
        key = None
    if key is not None and key in _STAGE_CACHE:
        return _STAGE_CACHE[key]
    st = _build_stage(name, cfg)
    if key is not None and len(_STAGE_CACHE) < 4096:
        _STAGE_CACHE[key] = st
    return st


def _build_stage(name, cfg):
    from .base import stage_factory
    cfg = dict(cfg or {})
    if name == "timestamp" and cfg.get("layouts"):
        cfg["layouts"] = _go_layouts(cfg["layouts"])
        cfg.pop("tests", None)
        cfg.setdefault("ignore_missing", True)
    if name == "decode_json_fields":
        # beats' readjson decodes the FULL object (max_depth caps nested
        # JSON *strings*, not object depth) — this engine's flat-column
        # model uses the knob as flatten depth (gcp pipeline.js decode)
        cfg.setdefault("max_depth", 99)
        cfg.setdefault("keep_arrays", True)
    return stage_factory(name)(cfg)


_SHIM_NAMES = {
    "Convert": "convert", "AddFields": "add_fields", "Dissect": "dissect",
    "Timestamp": "timestamp", "DecodeJSONFields": "decode_json_fields",
    "CommunityID": "community_id", "AddNetworkDirection":
    "add_network_direction", "Rename": "rename", "CopyFields":
    "copy_fields", "DropFields": "drop_fields", "Truncate":
    "truncate_fields", "Fingerprint": "fingerprint",
}


def _processor_obj(stage):
    return {"Run": lambda evt, _s=stage: _run_stage_on_event(_s, evt)}


def _chain_builder(stages=()):
    stages = list(stages)

    def _add(p):
        # p: processor object dict ({Run}), plain callable, or JS closure
        return _chain_builder(stages + [p])

    def _build():
        def _run(evt):
            for p in stages:
                fn = p.get("Run") if isinstance(p, dict) else p
                if fn is None:
                    continue
                fn(evt)
                if getattr(evt, "cancelled", False):
                    return
        return {"Run": _run}

    out = {"Add": _add, "Build": _build}
    for attr, reg in _SHIM_NAMES.items():
        out[attr] = (lambda cfg=None, _r=reg:
                     _chain_builder(stages + [_processor_obj(
                         _make_stage(_r, cfg))]))
    return out


class _ProcessorModule:
    """require("processor") — constructors onto the registered stage set;
    ``new processor.X(cfg)`` builds the stage once, ``.Run(evt)`` executes
    it per event (the reference's jsprocessor registry,
    script/javascript/module/processor)."""

    def __getattr__(self, name):
        if name == "Chain":
            return lambda: _chain_builder()
        reg = _SHIM_NAMES.get(name)
        if reg is None:
            raise JSUnsupported(f"processor.{name} is not shimmed")
        return lambda cfg=None, _r=reg: _processor_obj(_make_stage(_r, cfg))


def _require(name):
    """goja's require() shim for the node builtins Beats module scripts use
    (zeek configs do var net = require("net"); net.isIP(x))."""
    import ipaddress as _ip
    if name == "net":
        def is_ip(v):
            # hot in zeek-style per-answer loops: dotted-quad strings take a
            # manual check (ipaddress.ip_address costs ~6 µs/call); exotic
            # shapes (IPv6, ints, IPv4-mapped "::ffff:1.2.3.4") keep the
            # stdlib path.  Matches ipaddress strictness: ASCII digits only,
            # no leading zeros, octets <= 255.
            if type(v) is str and ":" not in v:
                parts = v.split(".")
                if len(parts) != 4:
                    return 0
                for p in parts:
                    if (not p.isdigit() or not p.isascii() or len(p) > 3
                            or (len(p) > 1 and p[0] == "0") or int(p) > 255):
                        return 0
                return 4
            try:
                return 4 if _ip.ip_address(v).version == 4 else 6
            except (ValueError, TypeError):
                return 0
        return {"isIP": is_ip,
                "isIPv4": lambda v: is_ip(v) == 4,
                "isIPv6": lambda v: is_ip(v) == 6}
    if name == "path":
        import posixpath
        return {"basename": posixpath.basename,
                "dirname": posixpath.dirname,
                "extname": lambda p: posixpath.splitext(p)[1]}
    if name == "processor":
        return _ProcessorModule()
    if name == "console":
        noop = lambda *a, **k: None  # noqa: E731
        return {"debug": noop, "info": noop, "warn": noop, "error": noop,
                "log": noop}
    raise JSUnsupported(f"require({name!r}) is outside the supported subset")


_MAX_CALL_DEPTH = 32


def _pure_literal(node):
    """True for an expression tree of only literals/arrays/objects — its
    evaluation is row-independent (processor-config memoization)."""
    op = node[0]
    if op == "lit":
        return True
    if op == "neg":
        return _pure_literal(node[1])
    if op == "array":
        return all(_pure_literal(x) for x in node[1])
    if op == "object":
        return all(_pure_literal(v) for _, v in node[1])
    return False


class _Closure:
    """A JS function value: pre-compiled body + captured environment.
    Locals chain to the CAPTURED env (itself chained to globals), so
    closure writes reach the defining scope (JS semantics; o365's builder
    mutates captured state)."""

    _is_js_closure = True
    __slots__ = ("interp", "params", "cbody", "cap")

    def __init__(self, interp, params, cbody, cap):
        self.interp = interp
        self.params = params
        self.cbody = cbody
        self.cap = cap

    def __call__(self, *args, _this=None):
        interp = self.interp
        if interp._depth >= _MAX_CALL_DEPTH:
            raise JSUnsupported("script call depth exceeded")
        fenv = _Env({"this": _this}, outer=self.cap)
        m0 = fenv
        m0["arguments"] = list(args)
        params = self.params
        for p, a in zip(params, args):
            m0[p] = a
        for p in params[len(args):]:
            m0[p] = None
        interp._depth += 1
        try:
            for s in self.cbody:
                s(fenv)
        except _Returned as r:
            return r.value
        finally:
            interp._depth -= 1
        return None


def _member(obj, name):
    """Resolve ``obj.name`` on an already-evaluated value — the runtime half
    of member access (the per-type method surface goja exposes)."""
    if isinstance(obj, _EventProxy):
        if name == "fields":
            return obj.row_view()
        return getattr(obj, name)
    if isinstance(obj, _JSRegExp):
        if name == "test":
            return obj.test
        if name == "exec":
            return obj.exec
        if name == "source":
            return obj.source
        if name == "global":
            return obj.global_
        raise JSUnsupported(f"RegExp.{name}")
    if isinstance(obj, str):
        if name == "length":
            return len(obj)
        if name in _STRING_METHODS:
            return lambda o=obj, f=_STRING_METHODS[name]: f(o)
        if name == "split":
            def _split(sep=None, limit=None, o=obj):
                # JS: no separator -> [whole string]; '' -> characters;
                # limit TRUNCATES the result array (not Python's maxsplit)
                if sep is None:
                    parts = [o]
                elif isinstance(sep, _JSRegExp):
                    parts = sep.rx.split(o)
                elif sep == "":
                    parts = list(o)
                else:
                    parts = o.split(_jstr(sep))
                if limit is not None:
                    parts = parts[:max(0, int(_tonum(limit)))]
                return parts
            return _split
        if name == "match":
            def _match(rx, o=obj):
                if not isinstance(rx, _JSRegExp):
                    rx = _JSRegExp(re.escape(str(rx)), "")
                if rx.global_:
                    hits = rx.rx.findall(o)
                    return [h if isinstance(h, str) else h[0]
                            for h in hits] or None
                return rx.exec(o)
            return _match
        if name == "search":
            def _search(rx, o=obj):
                m = rx.rx.search(o) if isinstance(rx, _JSRegExp) \
                    else None
                return m.start() if m else (
                    o.find(str(rx)) if not isinstance(rx, _JSRegExp)
                    else -1)
            return _search
        if name == "indexOf":
            return lambda sub, frm=0, o=obj: \
                o.find(_jstr(sub), max(0, int(_tonum(frm))))
        if name == "lastIndexOf":
            return lambda sub, frm=None, o=obj: (
                o.rfind(_jstr(sub)) if frm is None
                else o.rfind(_jstr(sub), 0,
                             max(0, int(_tonum(frm))) + len(_jstr(sub))))
        if name == "charCodeAt":
            return lambda i=0, o=obj: \
                ord(o[int(i)]) if 0 <= int(i) < len(o) else None
        if name == "repeat":
            return lambda n, o=obj: o * int(n)
        if name == "substring":
            return lambda a, b=None, o=obj: o[int(a):None if b is None else int(b)]
        if name == "substr":
            return lambda a, ln=None, o=obj: \
                o[int(a):] if ln is None else o[int(a):int(a) + int(ln)]
        if name == "charAt":
            return lambda i, o=obj: o[int(i)] if 0 <= int(i) < len(o) else ""
        if name == "startsWith":
            return lambda p, o=obj: o.startswith(p)
        if name == "endsWith":
            return lambda p, o=obj: o.endswith(p)
        if name == "replace":
            def _replace(a, b, o=obj):
                if isinstance(a, _JSRegExp):
                    if callable(b) and not isinstance(b, _JSRegExp):
                        # replacer FUNCTION: (match, p1..pn) -> replacement
                        def pyrep(m, fn=b):
                            return _jstr(fn(m.group(0), *m.groups()))
                        return a.rx.sub(pyrep, o,
                                        count=0 if a.global_ else 1)
                    # JS replacement tokens -> python re: literal backslash
                    # first (else a '\' in b becomes a bogus re escape),
                    # then $$ -> $, $& -> whole match, $N -> group N
                    rep = _jstr(b).replace("\\", "\\\\")
                    rep = re.sub(r"\$(\$|&|\d+)",
                                 lambda m: {"$": "$", "&": r"\g<0>"}.get(
                                     m.group(1), "\\" + m.group(1)),
                                 rep)
                    return a.rx.sub(rep, o,
                                    count=0 if a.global_ else 1)
                return o.replace(_jstr(a), _jstr(b), 1)
            return _replace
    if isinstance(obj, (list, tuple)):
        if name == "length":
            return len(obj)
        if name == "indexOf":
            return lambda v, o=obj: o.index(v) if v in o else -1
        if name == "includes" or name == "contains":
            return lambda v, o=obj: v in o
        if name == "join":
            # JS: default separator ',', null/undefined elements render ''
            return lambda sep=",", o=obj: _jstr(sep).join(
                "" if x is None else _jstr(x) for x in o)
        if name == "push":
            def _push(*vs, o=obj):
                o.extend(vs)
                return len(o)
            return _push
        if name == "pop":
            return lambda o=obj: o.pop() if o else None
        if name == "forEach":
            def _each(fn, o=obj):
                for i, x in enumerate(o):
                    # ES5 callback signature (value, index, array)
                    # for JS closures; host fns take the value only
                    if getattr(fn, "_is_js_closure", False):
                        fn(x, i, o)
                    else:
                        fn(x)
            return _each
        if name == "map":
            def _map(fn, o=obj):
                js = getattr(fn, "_is_js_closure", False)
                return [fn(x, i, o) if js else fn(x)
                        for i, x in enumerate(o)]
            return _map
        if name == "filter":
            def _filter(fn, o=obj):
                js = getattr(fn, "_is_js_closure", False)
                return [x for i, x in enumerate(o)
                        if _truthy(fn(x, i, o) if js else fn(x))]
            return _filter
        if name == "some":
            def _some(fn, o=obj):
                js = getattr(fn, "_is_js_closure", False)
                return any(_truthy(fn(x, i, o) if js else fn(x))
                           for i, x in enumerate(o))
            return _some
        if name == "every":
            def _every(fn, o=obj):
                js = getattr(fn, "_is_js_closure", False)
                return all(_truthy(fn(x, i, o) if js else fn(x))
                           for i, x in enumerate(o))
            return _every
        if name == "reduce":
            def _reduce(fn, *init, o=obj):
                js = getattr(fn, "_is_js_closure", False)
                it = enumerate(o)
                if init:
                    acc = init[0]
                else:
                    _, acc = next(it)
                for i, x in it:
                    acc = fn(acc, x, i, o) if js else fn(acc, x)
                return acc
            return _reduce
        if name == "reverse":
            def _rev(o=obj):
                o.reverse()
                return o
            return _rev
        if name == "shift":
            return lambda o=obj: o.pop(0) if o else None
        if name == "unshift":
            def _unshift(*vs, o=obj):
                o[:0] = list(vs)
                return len(o)
            return _unshift
        if name == "sort":
            def _sort(fn=None, o=obj):
                if fn is None:
                    o.sort(key=_jstr)   # JS default: ToString comparison
                else:
                    import functools

                    def c(a, b, fn=fn):
                        r = _tonum(fn(a, b))   # one call per comparison
                        if isinstance(r, float) and math.isnan(r):
                            return 0
                        return (r > 0) - (r < 0)
                    o.sort(key=functools.cmp_to_key(c))
                return o
            return _sort
        if name == "concat":
            def _concat(*others, o=obj):
                out = list(o)
                for x in others:       # JS concat takes N args, arrays spread
                    out.extend(x) if isinstance(x, (list, tuple)) \
                        else out.append(x)
                return out
            return _concat
        if name == "slice":
            return lambda a=0, b=None, o=obj: \
                o[int(a):None if b is None else int(b)]
    if isinstance(obj, (int, float)) and not isinstance(obj, bool):
        # Number.prototype surface (n.toString(16) hex renders etc.)
        if name == "toString":
            def _numstr(radix=None, o=obj):
                if radix is None or int(_tonum(radix)) == 10:
                    return _jstr(o)
                r = int(_tonum(radix))
                n = int(o)
                if n == 0:
                    return "0"
                digs = "0123456789abcdefghijklmnopqrstuvwxyz"
                neg, n = n < 0, abs(n)
                out = []
                while n:
                    n, d = divmod(n, r)
                    out.append(digs[d])
                return ("-" if neg else "") + "".join(reversed(out))
            return _numstr
        if name == "toFixed":
            return lambda nd=0, o=obj: f"{float(o):.{int(_tonum(nd))}f}"
    if isinstance(obj, bool):
        if name == "toString":
            return lambda o=obj: _jstr(o)
    if isinstance(obj, dict):
        if name == "toString" and "toString" not in obj:
            return lambda o=obj: _jstr(o)
        if name == "hasOwnProperty":
            return lambda k, o=obj: k in o or _js_propkey(k) in o
        if name == "keySet":
            return lambda o=obj: list(o)
        return obj.get(name)
    if isinstance(obj, _ProcessorModule):
        return getattr(obj, name)   # processor.Chain / .Convert / ...
    if isinstance(obj, _dt_mod.datetime):
        # Go time.Time methods goja exposes on event timestamps
        # (google_workspace admin: end.UnixNano() - start.UnixNano())
        d = obj if obj.tzinfo else obj.replace(
            tzinfo=_dt_mod.timezone.utc)
        if name == "UnixNano":
            return lambda d=d: int(d.timestamp() * 1e6) * 1000
        if name == "UnixMilli":
            return lambda d=d: int(d.timestamp() * 1000)
        if name == "Unix":
            return lambda d=d: int(d.timestamp())
        if name == "getTime":
            return lambda d=d: d.timestamp() * 1000
    raise JSUnsupported(f"member {name!r} on {type(obj).__name__}")


def _index_get(obj, key):
    """Resolve ``obj[key]`` on already-evaluated values."""
    if isinstance(obj, _EventProxy):
        return obj.Get(key)
    if isinstance(obj, dict):
        if key in obj:
            return obj[key]
        return obj.get(_js_propkey(key))
    if isinstance(obj, (list, str)):
        try:
            i = int(key)
            if i < 0:
                return None   # JS arr[-1] is undefined (no Python wraparound)
            return obj[i]
        except (IndexError, ValueError):
            return None
    return None


_REL = {"<": lambda a, b: a < b, ">": lambda a, b: a > b,
        "<=": lambda a, b: a <= b, ">=": lambda a, b: a >= b}

_INSTANCEOF = {"Array": lambda v: isinstance(v, list),
               "String": lambda v: isinstance(v, str),
               "Object": lambda v: isinstance(v, dict),
               "Number": lambda v: isinstance(v, (int, float))
               and not isinstance(v, bool),
               "Boolean": lambda v: isinstance(v, bool),
               "Function": callable}


class _Interp:
    """Closure compiler: every AST node compiles ONCE into a Python closure
    (statements run for effect and raise control-flow exceptions;
    expressions return the JS value).  Per-row execution then runs
    pre-compiled closure chains with zero per-node tag dispatch — the
    tree-walker this replaced spent ~40% of script-stage time re-matching
    tuple tags on every visit (zeek/dns, google_workspace admin)."""

    def __init__(self, funcs: dict, top, params=None):
        self.funcs = funcs              # name -> (params, body)
        fparams, body = funcs["process"]
        self.arg = fparams[0] if fparams else "event"
        self.top = top                  # top-level statements (run once/VM)
        self.params = params or {}
        self._registered = False
        self._depth = 0
        self._iters = _MAX_ITER
        self.globals: dict = {}
        self._cfuncs: dict = {}         # name -> (params, compiled body)
        self._top_c = self._cstmts(top)
        self._body_c = self._cfunc("process")[1]

    def _base_globals(self):
        import json as _json
        return {"String": _jstr, "Number": _tonum,
                "parseInt": _js_parse_int,
                "parseFloat": _js_parse_float, "require": _require,
                "JSON": {"stringify": lambda v, *a: _json.dumps(
                             v, default=_json_default),
                         "parse": lambda v: _json.loads(v)},
                "Array": {"isArray": lambda v: isinstance(v, list)},
                "Object": {
                    "keys": lambda v: list(v) if isinstance(v, dict) else [],
                    "values": lambda v: list(v.values())
                    if isinstance(v, dict) else [],
                    "entries": lambda v: [[k, x] for k, x in v.items()]
                    if isinstance(v, dict) else []},
                # new Date(millis | ISO string) -> UTC datetime (the golden
                # normalizer renders it as ES ISO-millis; google_workspace
                # event.start).  goja parses ISO-8601 strings; a numeric
                # string still takes the millis path via _tonum.
                "Date": _js_date,
                "Error": lambda msg=None: {"name": "Error",
                                           "message": msg},
                # new RegExp("pat"[, flags]) — same runtime object as a
                # regex literal (elasticsearch/audit config script)
                "RegExp": lambda pattern, flags="": _JSRegExp(
                    str(pattern), str(flags)),
                "TypeError": lambda msg=None: {"name": "TypeError",
                                               "message": msg},
                "Math": {"round": _js_round,
                         "floor": lambda v: math.floor(_tonum(v)),
                         "ceil": lambda v: math.ceil(_tonum(v)),
                         "abs": lambda v: abs(_tonum(v)),
                         "pow": lambda a, b: _tonum(a) ** _tonum(b),
                         "sqrt": lambda v: math.sqrt(_tonum(v)),
                         "trunc": lambda v: math.trunc(_tonum(v)),
                         "max": lambda *a: max(map(_tonum, a)),
                         "min": lambda *a: min(map(_tonum, a))}}

    def run(self, row: dict):
        proxy = _EventProxy(row)
        has_register = "register" in self.funcs
        if self._registered:
            # goja runs a module's top level ONCE per VM: top-level state
            # (IIFE-built processor chains — google_workspace admin builds
            # ~1000 of them — and the register-protocol pipelines of
            # o365/gcp) persists across events, mirroring the reference's
            # per-worker JS session
            pass
        else:
            self.globals = self._base_globals()
            self._iters = _MAX_ITER
            self._depth = 0
            env = dict(self.globals)
            try:
                for sf in self._top_c:  # var net = require("net"); ...
                    sf(env)
            except (_Cancelled, _Returned):
                pass
            self.globals = env
            if has_register:
                self.call_user("register", [self.params])
            self._registered = True
        self._iters = _MAX_ITER
        self._depth = 0
        env2 = _Env({self.arg: proxy}, outer=self.globals)
        try:
            for sf in self._body_c:
                sf(env2)
        except _Cancelled:
            return None
        except _Returned:
            pass
        if not has_register:
            self.globals.update({k: v for k, v in env2.items()
                                 if k != self.arg})
        return None if proxy.cancelled else proxy.row

    def call_user(self, name, args, this_obj=None):
        if self._depth >= _MAX_CALL_DEPTH:
            raise JSUnsupported("script call depth exceeded")
        params, cbody = self._cfunc(name)
        env = _Env({"this": this_obj}, outer=self.globals)
        m0 = env
        m0["arguments"] = list(args)
        for p, a in zip(params, args):
            m0[p] = a
        for p in params[len(args):]:
            m0[p] = None
        self._depth += 1
        try:
            for sf in cbody:
                sf(env)
        except _Returned as r:
            return r.value
        finally:
            self._depth -= 1
        return None

    def _cfunc(self, name):
        c = self._cfuncs.get(name)
        if c is None:
            params, body = self.funcs[name]
            c = (params, self._cstmts(body))
            self._cfuncs[name] = c
        return c

    def _tick(self):
        self._iters -= 1
        if self._iters <= 0:
            raise JSUnsupported(
                f"script exceeded the {_MAX_ITER} loop-iteration budget")

    # ---- statement compiler -------------------------------------------

    def _cstmts(self, stmts):
        return tuple(self._cstmt(s) for s in stmts)

    def _cstmt(self, st):
        op = st[0]
        if op == "var":
            name = st[1]
            if st[2] is None:
                def f(env, n=name):
                    env[n] = None
            else:
                vf = self._cexpr(st[2])

                def f(env, n=name, vf=vf):
                    env[n] = vf(env)
            return f
        if op == "vars":
            decls = tuple((n, self._cexpr(i) if i is not None else None)
                          for n, i in st[1])

            def f(env, decls=decls):
                for n, vf in decls:
                    env[n] = vf(env) if vf is not None else None
            return f
        if op == "if":
            cf = self._cexpr(st[1])
            tb = self._cstmts(st[2])
            eb = self._cstmts(st[3])

            def f(env, cf=cf, tb=tb, eb=eb):
                for s in (tb if _truthy(cf(env)) else eb):
                    s(env)
            return f
        if op == "return":
            if st[1] is None:
                def f(env):
                    raise _Returned(None)
            else:
                vf = self._cexpr(st[1])

                def f(env, vf=vf):
                    raise _Returned(vf(env))
            return f
        if op == "assign":
            set_ = self._csetter(st[1])
            vf = self._cexpr(st[2])

            def f(env, set_=set_, vf=vf):
                set_(env, vf(env))
            return f
        if op == "expr":
            return self._cexpr(st[1])
        if op == "while":
            cf = self._cexpr(st[1])
            body = self._cstmts(st[2])

            def f(env, cf=cf, body=body, tick=self._tick):
                while _truthy(cf(env)):
                    tick()
                    try:
                        for s in body:
                            s(env)
                    except _Break:
                        break
                    except _Continue:
                        continue
            return f
        if op == "dowhile":
            cf = self._cexpr(st[1])
            body = self._cstmts(st[2])

            def f(env, cf=cf, body=body, tick=self._tick):
                while True:
                    tick()
                    try:
                        for s in body:
                            s(env)
                    except _Break:
                        break
                    except _Continue:
                        pass
                    if not _truthy(cf(env)):
                        break
            return f
        if op == "for":
            _, init, cond, update, body = st
            initf = self._cstmt(init) if init is not None else None
            cf = self._cexpr(cond) if cond is not None else None
            updf = self._cstmt(update) if update is not None else None
            bodyc = self._cstmts(body)

            def f(env, initf=initf, cf=cf, updf=updf, bodyc=bodyc,
                  tick=self._tick):
                if initf is not None:
                    initf(env)
                while cf is None or _truthy(cf(env)):
                    tick()
                    try:
                        for s in bodyc:
                            s(env)
                    except _Break:
                        break
                    except _Continue:
                        pass
                    if updf is not None:
                        updf(env)
            return f
        if op == "forin":
            _, name, obj_node, body = st
            of = self._cexpr(obj_node)
            bodyc = self._cstmts(body)

            def f(env, name=name, of=of, bodyc=bodyc, tick=self._tick):
                obj = of(env)
                if isinstance(obj, _EventProxy):
                    keys = list(obj.row.keys())
                elif isinstance(obj, dict):
                    keys = list(obj.keys())
                elif isinstance(obj, (list, tuple, str)):
                    keys = list(range(len(obj)))
                elif obj is None:
                    keys = []
                else:
                    raise JSUnsupported(f"for-in over {type(obj).__name__}")
                for k in keys:
                    tick()
                    env[name] = k
                    try:
                        for s in bodyc:
                            s(env)
                    except _Break:
                        break
                    except _Continue:
                        continue
            return f
        if op == "throw":
            vf = self._cexpr(st[1])

            def f(env, vf=vf):
                raise _Thrown(vf(env))
            return f
        if op == "try":
            _, block, cname, cblock, fblock = st
            bc = self._cstmts(block)
            cc = self._cstmts(cblock) if cblock is not None else None
            fc = self._cstmts(fblock) if fblock is not None else None

            def f(env, bc=bc, cc=cc, fc=fc, cname=cname):
                try:
                    for s in bc:
                        s(env)
                except _Thrown as t:
                    if cc is None:
                        raise
                    env[cname] = t.value
                    for s in cc:
                        s(env)
                except JSUnsupported:
                    raise  # compile-surface gaps stay loud, never catchable
                except (TypeError, ValueError, KeyError, AttributeError,
                        IndexError, ZeroDivisionError) as e:
                    # goja surfaces runtime errors as catchable JS errors;
                    # the interpreter's Python-level faults map to Error-
                    # shaped dicts (e.message / e.name both work)
                    if cc is None:
                        raise
                    env[cname] = {"name": type(e).__name__,
                                  "message": str(e)}
                    for s in cc:
                        s(env)
                finally:
                    if fc is not None:
                        for s in fc:
                            s(env)
            return f
        if op == "switch":
            _, disc_node, cases = st
            df = self._cexpr(disc_node)
            ccases = tuple((self._cexpr(e) if e is not None else None,
                            self._cstmts(stmts)) for e, stmts in cases)

            def f(env, df=df, ccases=ccases):
                d = df(env)
                start = None
                for i, (ef, _s) in enumerate(ccases):
                    if ef is not None and _strict_eq(d, ef(env)):
                        start = i
                        break
                if start is None:
                    for i, (ef, _s) in enumerate(ccases):
                        if ef is None:
                            start = i
                            break
                if start is not None:
                    try:
                        for _ef, stmts in ccases[start:]:  # C fallthrough
                            for sub in stmts:
                                sub(env)
                    except _Break:
                        pass
            return f
        if op == "break":
            def f(env):
                raise _Break()
            return f
        if op == "continue":
            def f(env):
                raise _Continue()
            return f
        raise JSUnsupported(f"statement {op}")  # pragma: no cover

    # ---- assignment-target compiler -----------------------------------

    def _csetter(self, target):
        kind = target[0]
        if kind == "ident":
            name = target[1]

            # JS write-where-declared: assignment binds in the innermost
            # scope that already has the name (so register() writing the
            # top-level `var audit;` reaches module globals — o365), else
            # declares locally
            def set_(env, value, n=name):
                e = env
                while isinstance(e, _Env):
                    if n in e:
                        e[n] = value
                        return
                    e = e.outer
                if e is not None and n in e:
                    e[n] = value
                    return
                env[n] = value
            return set_
        if kind in ("index", "member"):
            base = target[1]
            is_index = kind == "index"
            key_f = self._cexpr(target[2]) if is_index else None
            key_const = None if is_index else target[2]
            base_f = self._cexpr(base)
            # event.fields["k"] = v  /  event.fields.k = v
            fields_bb_f = self._cexpr_safe(base[1]) \
                if base[0] == "member" and base[2] == "fields" else None

            def set_(env, value, base_f=base_f, key_f=key_f,
                     key_const=key_const, is_index=is_index,
                     fields_bb_f=fields_bb_f):
                if fields_bb_f is not None:
                    bb = fields_bb_f(env)
                    if isinstance(bb, _EventProxy):
                        bb.Put(key_f(env) if is_index else key_const, value)
                        return
                obj = base_f(env)
                if isinstance(obj, dict):
                    obj[key_f(env) if is_index else key_const] = value
                    return
                if isinstance(obj, list) and is_index:
                    idx = int(key_f(env))
                    if idx >= len(obj):     # JS arrays grow on assignment
                        obj.extend([None] * (idx + 1 - len(obj)))
                    obj[idx] = value
                    return
                raise JSUnsupported("unsupported assignment target")
            return set_

        def bad(env, value):
            raise JSUnsupported("unsupported assignment target")
        return bad

    # ---- expression compiler ------------------------------------------

    def _cexpr_safe(self, node):
        """eval-with-fallback: unresolvable bases read as null (the old
        eval_base)."""
        vf = self._cexpr(node)

        def f(env, vf=vf):
            try:
                return vf(env)
            except JSUnsupported:
                return None
        return f

    def _cexpr(self, node):
        op = node[0]
        if op == "lit":
            v = node[1]

            def f(env, v=v):
                return v
            return f
        if op == "ident":
            name = node[1]

            def f(env, n=name):
                try:
                    return env[n]
                except KeyError:
                    raise JSUnsupported(
                        f"unknown identifier {n!r}") from None
            return f
        if op == "member":
            bf = self._cexpr(node[1])
            name = node[2]

            def f(env, bf=bf, n=name):
                return _member(bf(env), n)
            return f
        if op == "index":
            bf = self._cexpr(node[1])
            kf = self._cexpr(node[2])

            def f(env, bf=bf, kf=kf):
                return _index_get(bf(env), kf(env))
            return f
        if op == "call":
            callee = node[1]
            arg_fs = tuple(self._cexpr(a) for a in node[2])
            cr = f"{callee!r:.120}"
            if callee[0] == "ident" and callee[1] in self.funcs:
                # user function by name wins over env bindings (hoisting)
                name = callee[1]

                def f(env, n=name, afs=arg_fs, cu=self.call_user):
                    return cu(n, [a(env) for a in afs])
                return f
            if callee[0] == "member":
                obj_f = self._cexpr(callee[1])
                name = callee[2]

                def f(env, obj_f=obj_f, n=name, afs=arg_fs, cr=cr):
                    obj = obj_f(env)
                    # method call on a user object: bind `this` for JS
                    # closures
                    if isinstance(obj, dict):
                        fn = obj.get(n)
                        if getattr(fn, "_is_js_closure", False):
                            return fn(*[a(env) for a in afs], _this=obj)
                    fn = _member(obj, n)
                    args = [a(env) for a in afs]
                    if not callable(fn):
                        raise JSUnsupported(f"call of non-function: {cr}")
                    return fn(*args)
                return f
            fn_f = self._cexpr(callee)

            def f(env, fn_f=fn_f, afs=arg_fs, cr=cr):
                fn = fn_f(env)
                args = [a(env) for a in afs]
                if not callable(fn):
                    raise JSUnsupported(f"call of non-function: {cr}")
                return fn(*args)
            return f
        if op == "cmp":
            _, o, a, b = node
            lf, rf = self._cexpr(a), self._cexpr(b)
            if o == "===":
                return lambda env, lf=lf, rf=rf: _strict_eq(lf(env), rf(env))
            if o == "!==":
                return lambda env, lf=lf, rf=rf: \
                    not _strict_eq(lf(env), rf(env))
            if o == "==":
                return lambda env, lf=lf, rf=rf: \
                    _abstract_eq(lf(env), rf(env))
            if o == "!=":
                return lambda env, lf=lf, rf=rf: \
                    not _abstract_eq(lf(env), rf(env))
            opf = _REL[o]

            def f(env, lf=lf, rf=rf, opf=opf):
                l, r = lf(env), rf(env)
                if l is None or r is None:
                    return False
                if isinstance(l, str) and isinstance(r, str):
                    return opf(l, r)
                ln, rn = _tonum(l), _tonum(r)
                if math.isnan(ln) or math.isnan(rn):
                    return False        # JS: any NaN relational is false
                return opf(ln, rn)
            return f
        if op == "funclit":
            # closure: captures the defining env by reference (module JS
            # reads config constants through it; writes stay local); the
            # body compiles ONCE here, not per closure creation
            params = node[1]
            cbody = self._cstmts(node[2])

            def f(env, interp=self, params=params, cbody=cbody):
                return _Closure(interp, params, cbody, env)
            return f
        if op == "array":
            fs = tuple(self._cexpr(x) for x in node[1])

            def f(env, fs=fs):
                return [x(env) for x in fs]
            return f
        if op == "object":
            pairs = tuple((k, self._cexpr(v)) for k, v in node[1])

            def f(env, pairs=pairs):
                return {k: vf(env) for k, vf in pairs}
            return f
        if op == "in_op":
            kf = self._cexpr(node[1])
            cf = self._cexpr(node[2])

            def f(env, kf=kf, cf=cf):
                k = kf(env)
                container = cf(env)
                if isinstance(container, dict):
                    return k in container or _js_propkey(k) in container
                if isinstance(container, list):
                    return isinstance(k, (int, float)) \
                        and 0 <= int(k) < len(container)
                return False
            return f
        if op == "instanceof":
            vf = self._cexpr(node[1])
            chk = _INSTANCEOF.get(node[2])
            if chk is None:
                return lambda env: False
            return lambda env, vf=vf, chk=chk: chk(vf(env))
        if op == "new":
            callee = node[1]
            arg_fs = tuple(self._cexpr(a) for a in node[2])
            # `new processor.X({...pure literal...})` rebuilds the SAME
            # stateless stage per event (google_workspace admin constructs
            # its whole chain inside the per-event dispatch): memoize the
            # processor object in a per-node cache cell — config constant,
            # stage stateless, so one instance serves every row
            pure_proc = (callee[0] == "member"
                         and callee[1] == ("ident", "processor")
                         and all(_pure_literal(a) for a in node[2]))
            cache = [None]
            proc_base_f = self._cexpr_safe(callee[1]) if pure_proc else None
            proc_attr = callee[2] if pure_proc else None
            user_name = callee[1] if callee[0] == "ident" \
                and callee[1] in self.funcs else None
            callee_f = None if user_name is not None else self._cexpr(callee)

            def f(env, arg_fs=arg_fs, pure_proc=pure_proc, cache=cache,
                  proc_base_f=proc_base_f, proc_attr=proc_attr,
                  user_name=user_name, callee_f=callee_f, interp=self):
                if pure_proc:
                    if cache[0] is not None:
                        return cache[0]
                    base = proc_base_f(env)
                    if isinstance(base, _ProcessorModule):
                        fn = getattr(base, proc_attr)
                        obj = fn(*[a(env) for a in arg_fs])
                        cache[0] = obj
                        return obj
                args = [a(env) for a in arg_fs]
                # user-defined constructor: fresh `this`, JS semantics
                if user_name is not None:
                    thisobj = {}
                    r = interp.call_user(user_name, args, this_obj=thisobj)
                    return r if isinstance(r, dict) else thisobj
                fn = callee_f(env)
                if getattr(fn, "_is_js_closure", False):
                    thisobj = {}
                    r = fn(*args, _this=thisobj)
                    return r if isinstance(r, dict) else thisobj
                if callable(fn):   # host constructor (processor.X, Chain)
                    return fn(*args)
                raise JSUnsupported("new on non-function")
            return f
        if op == "assignexpr":
            set_ = self._csetter(node[1])
            vf = self._cexpr(node[2])

            def f(env, set_=set_, vf=vf):
                val = vf(env)
                set_(env, val)
                return val
            return f
        if op == "ternary":
            cf = self._cexpr(node[1])
            af = self._cexpr(node[2])
            bf = self._cexpr(node[3])

            def f(env, cf=cf, af=af, bf=bf):
                return af(env) if _truthy(cf(env)) else bf(env)
            return f
        if op == "or":
            lf, rf = self._cexpr(node[1]), self._cexpr(node[2])

            def f(env, lf=lf, rf=rf):
                l = lf(env)
                return l if _truthy(l) else rf(env)
            return f
        if op == "and":
            lf, rf = self._cexpr(node[1]), self._cexpr(node[2])

            def f(env, lf=lf, rf=rf):
                l = lf(env)
                return rf(env) if _truthy(l) else l
            return f
        if op == "not":
            vf = self._cexpr(node[1])
            return lambda env, vf=vf: not _truthy(vf(env))
        if op == "neg":
            vf = self._cexpr(node[1])
            return lambda env, vf=vf: -_tonum(vf(env))
        if op == "typeof":
            vf = self._cexpr(node[1])

            def f(env, vf=vf):
                try:
                    v = vf(env)
                except JSUnsupported:
                    return "undefined"  # typeof <unknown ident> in JS
                if v is None:
                    return "undefined"
                if isinstance(v, bool):
                    return "boolean"
                if isinstance(v, (int, float)):
                    return "number"
                if isinstance(v, str):
                    return "string"
                if callable(v):
                    return "function"
                return "object"
            return f
        if op == "delete":
            target = node[1]
            if target[0] in ("member", "index"):
                bf = self._cexpr_safe(target[1])
                is_idx = target[0] == "index"
                kf = self._cexpr(target[2]) if is_idx else None
                kc = None if is_idx else target[2]

                def f(env, bf=bf, kf=kf, kc=kc, is_idx=is_idx):
                    obj = bf(env)
                    key = kf(env) if is_idx else kc
                    if isinstance(obj, dict):
                        obj.pop(key, None)
                    elif isinstance(obj, _EventProxy):
                        obj.Delete(key)
                    return True
                return f
            return lambda env: True
        if op == "incdec":
            _, target, delta, post = node
            gf = self._cexpr(target)
            set_ = self._csetter(target)

            def f(env, gf=gf, set_=set_, delta=delta, post=post):
                oldn = _tonum(gf(env))
                set_(env, oldn + delta)
                return oldn if post else oldn + delta
            return f
        if op == "arith":
            _, o, a, b = node
            lf, rf = self._cexpr(a), self._cexpr(b)
            if o == "+":
                def f(env, lf=lf, rf=rf):
                    l, r = lf(env), rf(env)
                    if isinstance(l, str) or isinstance(r, str):
                        return _jstr(l) + _jstr(r)
                    return _tonum(l) + _tonum(r)
                return f
            if o == "-":
                return lambda env, lf=lf, rf=rf: \
                    _tonum(lf(env)) - _tonum(rf(env))
            if o == "*":
                return lambda env, lf=lf, rf=rf: \
                    _tonum(lf(env)) * _tonum(rf(env))
            if o == "%":
                # JS remainder keeps the DIVIDEND's sign (math.fmod), and
                # x % 0 is NaN — not Python's floored modulo
                def f(env, lf=lf, rf=rf):
                    ln, rn = _tonum(lf(env)), _tonum(rf(env))
                    if rn == 0 or math.isnan(ln) or math.isnan(rn):
                        return math.nan
                    return math.fmod(ln, rn)
                return f
            if o == "/":
                # JS: x/0 is +-Infinity, 0/0 is NaN
                def f(env, lf=lf, rf=rf):
                    ln, rn = _tonum(lf(env)), _tonum(rf(env))
                    if rn == 0:
                        if ln == 0 or math.isnan(ln):
                            return math.nan
                        return math.inf if ln > 0 else -math.inf
                    return ln / rn
                return f
        raise JSUnsupported(f"expression {op}")  # pragma: no cover


def _truthy(v) -> bool:
    if v is None or v is False or v == "" or v == 0:
        return False
    if isinstance(v, float) and math.isnan(v):
        return False
    return True


def _tonum(v) -> float | int:
    """JS ToNumber: null->0, undefined->NaN (both None here -> 0, the safer
    field-surgery default), bool->0/1, numeric strings parse, else NaN."""
    if v is None:
        return 0
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return 0
        try:
            return int(s)
        except ValueError:
            try:
                return float(s)
            except ValueError:
                return math.nan
    return math.nan


def _strict_eq(l, r) -> bool:
    """JS === : no coercion; bool is its own type (1 === true is false)."""
    if isinstance(l, bool) != isinstance(r, bool):
        return False
    if isinstance(l, (int, float)) and isinstance(r, (int, float)) \
            and not isinstance(l, bool):
        return l == r
    if type(l) is not type(r) and not (l is None and r is None):
        # int/float pairs handled above; str/str, list/list etc. need same type
        if not (isinstance(l, (list, tuple)) and isinstance(r, (list, tuple))):
            return False
    return l == r


def _abstract_eq(l, r) -> bool:
    """JS == abstract equality: null==undefined, bool->number,
    string<->number coercion (1 == "1" is true)."""
    if l is None or r is None:
        return l is None and r is None
    if isinstance(l, bool):
        l = 1 if l else 0
    if isinstance(r, bool):
        r = 1 if r else 0
    if isinstance(l, str) and isinstance(r, (int, float)):
        l = _tonum(l)
    elif isinstance(r, str) and isinstance(l, (int, float)):
        r = _tonum(r)
    if isinstance(l, float) and math.isnan(l):
        return False
    if isinstance(r, float) and math.isnan(r):
        return False
    return l == r


def _json_default(v):
    """JSON.stringify of host objects goja can serialize: Date -> ISO
    string (millis precision, JS Date.toJSON), everything else by
    ToString."""
    if isinstance(v, _dt_mod.datetime):
        d = v if v.tzinfo else v.replace(tzinfo=_dt_mod.timezone.utc)
        return d.strftime("%Y-%m-%dT%H:%M:%S.") + f"{d.microsecond // 1000:03d}Z"
    return _jstr(v)


def _js_date(ms=None):
    """new Date(millis | ISO string) -> naive-UTC datetime."""
    if isinstance(ms, str):
        s = ms.strip()
        try:
            d = _dt_mod.datetime.fromisoformat(s.replace("Z", "+00:00"))
            if d.tzinfo is not None:
                d = d.astimezone(_dt_mod.timezone.utc).replace(tzinfo=None)
            return d
        except ValueError:
            pass   # numeric string falls through to the millis path
    if ms is None:
        return _dt_mod.datetime.utcfromtimestamp(0)
    n = _tonum(ms)
    if isinstance(n, float) and (math.isnan(n) or math.isinf(n)):
        # goja: Invalid Date; the nearest analogue that keeps the row
        # alive is the epoch sentinel
        return _dt_mod.datetime.utcfromtimestamp(0)
    return _dt_mod.datetime.utcfromtimestamp(n / 1000.0)


def _js_round(v):
    """JS Math.round: floor(x + 0.5) — half-up toward +Infinity, so
    Math.round(-2.5) is -2 (the old two-branch half-away version gave -3);
    NaN/Infinity pass through instead of raising in int()."""
    n = _tonum(v)
    if isinstance(n, float) and (math.isnan(n) or math.isinf(n)):
        return n
    return math.floor(n + 0.5)


_PARSE_FLOAT_RE = re.compile(
    r"[+-]?(?:Infinity|\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)")


def _js_parse_int(v, radix=None):
    """JS parseInt: leading-whitespace skip, longest valid digit prefix in
    the radix, 0x auto/explicit-16 prefix, NaN on no digits (int(str)
    raised ValueError on '12abc', failing the whole row where goja
    returns 12)."""
    s = _jstr(v).strip()
    rn = _tonum(radix) if radix is not None else 0
    r = 0 if isinstance(rn, float) and math.isnan(rn) else int(rn)
    neg = s[:1] == "-"
    if s[:1] in "+-":
        s = s[1:]
    if r == 0:
        if s[:2] in ("0x", "0X"):
            s, r = s[2:], 16
        else:
            r = 10
    elif r == 16 and s[:2] in ("0x", "0X"):
        s = s[2:]
    if not 2 <= r <= 36:
        return math.nan
    digs = "0123456789abcdefghijklmnopqrstuvwxyz"[:r]
    i = 0
    while i < len(s) and s[i].lower() in digs:
        i += 1
    if i == 0:
        return math.nan
    val = int(s[:i], r)
    return -val if neg else val


def _js_parse_float(v):
    """JS parseFloat: longest valid numeric prefix, NaN otherwise."""
    m = _PARSE_FLOAT_RE.match(_jstr(v).strip())
    if not m:
        return math.nan
    tok = m.group(0)
    if tok.endswith("Infinity"):
        return -math.inf if tok[0] == "-" else math.inf
    return float(tok)


def _jstr(v) -> str:
    """JS ToString: integer-valued floats render without the '.0' (goja
    prints 3.0 as '3'), Infinity/NaN by their JS names, arrays as
    comma-joined elements with null/undefined as '' (Array.toString), and
    plain objects as '[object Object]'."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v.is_integer() and abs(v) < 2 ** 53:
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)):
        return ",".join("" if x is None else _jstr(x) for x in v)
    if isinstance(v, dict):
        return "[object Object]"
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

    # seed with the row's columns so for-in / length see the real keys
    # (reads and writes still route through the proxy's field mapping)
    return View(proxy.row)


_EventProxy.row_view = _row_view


def compile_js(source: str, params=None):
    """Compile a ``function process(event) {...}`` JS source into a Python
    callable ``fn(row_dict) -> dict | None`` (None = event cancelled).
    Raises JSUnsupported at compile time for anything outside the subset.
    ``params`` feed ``function register(params)`` once per worker (the
    reference's script-config params)."""
    toks = _tokenize(source)
    p = _Parser(toks)
    funcs, top = p.parse_program()
    if "process" not in funcs:
        raise JSUnsupported("no function process(event) in script")
    interp = _Interp(funcs, top, params=params)
    return interp.run
