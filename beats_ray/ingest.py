"""ES ingest pipeline (pipeline.yml) -> engine Pipeline spec compiler.

The reference ships an Elasticsearch ingest pipeline per module fileset
(x-pack/filebeat/module/<mod>/<fs>/ingest/pipeline.yml) and registers it
server-side (filebeat/fileset/pipelines.go); the Beats process itself only
runs the lighter ``config/<fs>.yml`` processor chain.  This engine executes
BOTH stages itself: ``compile_ingest`` maps each ES processor onto the
registered stage set (stages/es_compat.py for the ES-only ones), compiles
the painless ``if:`` condition subset to Arrow-mask conditions, and
translates Java time formats to the timestamp stage's strptime layouts.

Escape hatches (both consumed in declaration order):
- ``scripts``: list of replacement specs for ``script:`` (painless)
  processors — painless is not executed; each golden supplies the
  equivalent python/mini-JS stage spec (or None to skip a no-op script).
- ``overrides``: dict {processor_index: spec-list | None} replacing any
  processor the compiler can't express (foreach variants, fail, ...).

Cluster-owned processors (geoip / user_agent ECS extras the goldens skip)
and harness-owned fields (event.ingested / event.created) are dropped.
"""

from __future__ import annotations

import re

import yaml

__all__ = [
    "PainlessUnsupported", "painless_condition", "java_date_layouts",
    "compile_ingest", "load_pipeline_yml", "render_module_config",
    "config_processors", "load_fileset_config", "manifest_vars",
]


class PainlessUnsupported(ValueError):
    """An ``if:`` expression / processor outside the supported subset."""


# ---------------------------------------------------------------------------
# painless `if:` conditions -> conditions.py config dicts
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<str>'[^']*'|"[^"]*")
    | (?P<num>-?\d+(?:\.\d+)?)
    | (?P<op>==~|==|!=|<=|>=|&&|\|\||[!<>().\[\]?,])
    | (?P<rx>/(?:[^/\\]|\\.)+/)
    | (?P<word>[A-Za-z_$][A-Za-z0-9_$]*)
    )""", re.X)


def _tokenize(src: str):
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            if src[pos:].strip() == "":
                break
            raise PainlessUnsupported(f"painless token at {src[pos:]!r}")
        pos = m.end()
        if m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1]))
        elif m.group("num") is not None:
            n = m.group("num")
            out.append(("num", float(n) if "." in n else int(n)))
        elif m.group("op") is not None:
            out.append(("op", m.group("op")))
        elif m.group("rx") is not None:
            out.append(("rx", m.group("rx")[1:-1]))
        else:
            out.append(("word", m.group("word")))
    return out


class _P:
    """Recursive-descent parser over the tokenized painless condition."""

    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        t = self.take()
        if t[1] != val:
            raise PainlessUnsupported(f"expected {val!r}, got {t[1]!r}")

    # expr := and ('||' and)*
    def expr(self):
        parts = [self.and_()]
        while self.peek() == ("op", "||"):
            self.take()
            parts.append(self.and_())
        return parts[0] if len(parts) == 1 else {"or": parts}

    def and_(self):
        parts = [self.unary()]
        while self.peek() == ("op", "&&"):
            self.take()
            parts.append(self.unary())
        return parts[0] if len(parts) == 1 else {"and": parts}

    def unary(self):
        if self.peek() == ("op", "!"):
            self.take()
            return {"not": self.unary()}
        if self.peek() == ("op", "("):
            # lookahead: parenthesized boolean expr, not a method call
            self.take()
            e = self.expr()
            self.expect(")")
            return e
        return self.comparison()

    def _path(self):
        """ctx.a?.b['c'] ... -> (dotted path, trailing method or None)."""
        t = self.take()
        if t != ("word", "ctx"):
            raise PainlessUnsupported(f"path must start with ctx, got {t}")
        segs, method, arg = [], None, None
        while True:
            nxt = self.peek()
            if nxt == ("op", "?"):
                # '?.' / '?[': strip the null-safe marker, fall through
                self.take()
                nxt = self.peek()
                if nxt not in (("op", "."), ("op", "[")):
                    raise PainlessUnsupported("dangling ?")
            if nxt == ("op", "."):
                self.take()
                w = self.take()
                if w[0] != "word":
                    raise PainlessUnsupported(f"bad segment {w}")
                if self.peek() == ("op", "("):
                    self.take()
                    if self.peek()[0] in ("str", "num"):
                        arg = self.take()[1]
                    elif self.peek() == ("word", "ctx"):
                        rpath, rmethod, _ = self._path()
                        if rmethod is not None:
                            raise PainlessUnsupported("method in call arg")
                        arg = ("path", rpath)
                    self.expect(")")
                    method = w[1]
                    break
                segs.append(w[1])
                continue
            if nxt == ("op", "["):
                self.take()
                k = self.take()
                if k[0] == "str":
                    segs.append(k[1])
                elif k[0] == "num":
                    segs.append(str(k[1]))
                else:
                    raise PainlessUnsupported(f"bad subscript {k}")
                self.expect("]")
                continue
            break
        if method is None and segs and segs[-1] == "length":
            # .length property (painless arrays/strings)
            method, segs = "length", segs[:-1]
        if method == "containsKey" and isinstance(arg, str):
            # ctx[.path].containsKey('x') == existence of path.x (haproxy
            # root-level; elasticsearch.server.containsKey('type'))
            return ".".join(segs + [arg]), "__exists__", None
        if not segs:
            raise PainlessUnsupported("bare ctx")
        return ".".join(segs), method, arg

    def _bool_suffix(self, cond):
        """optional `== true` / `!= false` after a boolean method call."""
        nxt = self.peek()
        if nxt[0] == "op" and nxt[1] in ("==", "!="):
            op = self.take()[1]
            rhs = self.take()
            if rhs[0] != "word" or rhs[1] not in ("true", "false"):
                raise PainlessUnsupported(f"boolean suffix vs {rhs}")
            if ((rhs[1] == "true") == (op == "==")):
                return cond
            return {"not": cond}
        return cond

    def comparison(self):
        if self.peek() == ("op", "["):
            # list literal: ['ipv4-addr', 'ipv6-addr'].contains(ctx.x)
            self.take()
            vals = []
            while self.peek() != ("op", "]"):
                t = self.take()
                if t[0] in ("str", "num"):
                    vals.append(t[1])
                elif t != ("op", ","):
                    raise PainlessUnsupported(f"list literal element {t}")
            self.expect("]")
            self.expect(".")
            if self.take() != ("word", "contains"):
                raise PainlessUnsupported("list literal method")
            self.expect("(")
            path, method, _ = self._path()
            self.expect(")")
            if method is not None:
                raise PainlessUnsupported("method inside contains()")
            return {"or": [{"equals": {path: v}} for v in vals]}
        path, method, arg = self._path()
        # method-call predicates (optionally followed by `== true/false`)
        if method in ("isEmpty",):
            return self._bool_suffix({"length": {path: {"eq": 0}}})
        if method in ("contains",):
            if isinstance(arg, tuple) and arg[0] == "path":
                # list field contains ANOTHER FIELD's per-row value
                # (ftd zone-direction conditions)
                return self._bool_suffix({"field_contains": [path, arg[1]]})
            return self._bool_suffix({"contains": {path: arg}})
        if method == "__exists__":
            # ctx.containsKey('x') — x may be a flat leaf OR a container
            return self._bool_suffix({"has_fields": [path]})
        if method in ("startsWith", "endsWith", "equalsIgnoreCase"):
            # field-path arguments (ctx.a.startsWith(ctx.b)) have no static
            # regex form — fail at compile time, never emit a dead condition
            if not isinstance(arg, (str, int, float)):
                raise PainlessUnsupported(f".{method}({arg!r})")
        if method in ("startsWith",):
            return self._bool_suffix(
                {"regexp": {path: "^" + re.escape(str(arg))}})
        if method in ("endsWith",):
            return self._bool_suffix(
                {"regexp": {path: re.escape(str(arg)) + "$"}})
        if method in ("equalsIgnoreCase",):
            return self._bool_suffix(
                {"regexp": {path: "(?i)^" + re.escape(str(arg)) + "$"}})
        if method == "charAt":
            # ctx.message.charAt(0) ==/!= (char)("{")  (envoyproxy/coredns
            # pipeline-entry dispatch).  Painless would NPE on a null
            # receiver (processor skipped), so != requires existence.
            if not isinstance(arg, (int, float)):
                raise PainlessUnsupported(f".charAt({arg!r})")
            nxt = self.peek()
            if not (nxt[0] == "op" and nxt[1] in ("==", "!=")):
                raise PainlessUnsupported("bare .charAt()")
            op = self.take()[1]
            if self.peek() == ("op", "("):   # (char) cast prefix
                self.take()
                if self.take() != ("word", "char"):
                    raise PainlessUnsupported("charAt cast")
                self.expect(")")
            if self.peek() == ("op", "("):
                self.take()
                rhs = self.take()
                self.expect(")")
            else:
                rhs = self.take()
            if rhs[0] != "str" or len(rhs[1]) != 1:
                raise PainlessUnsupported(f"charAt vs {rhs}")
            pat = "^" + "." * int(arg) + re.escape(rhs[1])
            eq = {"regexp": {path: pat}}
            if op == "==":
                return eq
            return {"and": [{"has_fields": [path]}, {"not": eq}]}
        if method in ("toLowerCase", "toUpperCase"):
            nxt = self.peek()
            if nxt[0] == "op" and nxt[1] in ("==", "!="):
                op = self.take()[1]
                rhs = self.take()
                if rhs[0] != "str":
                    raise PainlessUnsupported(f".{method}() vs {rhs}")
                eq = {"regexp": {path: "(?i)^" + re.escape(rhs[1]) + "$"}}
                return eq if op == "==" else {"not": eq}
            raise PainlessUnsupported(f"bare .{method}()")
        nxt = self.peek()
        if method in ("length", "size"):
            if nxt[0] == "op" and nxt[1] in ("==", "!=", "<", ">", "<=", ">="):
                op = self.take()[1]
                rhs = self.take()
                if rhs[0] != "num":
                    raise PainlessUnsupported(".length vs non-number")
                key = {"==": "eq", "!=": "neq", "<": "lt", ">": "gt",
                       "<=": "lte", ">=": "gte"}[op]
                return {"length": {path: {key: rhs[1]}}}
            return {"length": {path: {"gt": 0}}}
        if method is not None:
            raise PainlessUnsupported(f"method .{method}()")
        if nxt == ("word", "instanceof"):
            self.take()
            t = self.take()
            if t[0] != "word":
                raise PainlessUnsupported("instanceof operand")
            if path.endswith(".0"):
                # `x[0] instanceof String` (cisco amp mitre lists):
                # non-empty list WITH string elements; struct lists never
                # match (ElementString condition)
                return {"element_string": path[:-2]}
            if t[1] == "String":
                # real per-value type test (crowdstrike digit-count date
                # guards NEGATE it over numeric timestamps)
                return {"instance_string": path}
            # other type guards reduce to existence — the hand-ported
            # script impl (the only consumer) re-checks the type
            return {"has_fields": [path]}
        if nxt == ("op", "==~"):
            # painless regex-match operator: x ==~ /pattern/ (postgresql
            # sql_state_code class check); anchored full-match in painless
            self.take()
            rhs = self.take()
            if rhs[0] != "rx":
                raise PainlessUnsupported("==~ needs a regex literal")
            pat = rhs[1]
            # the conditions engine matches SUBSTRINGS (RE2 search), painless
            # ==~ is a full match: anchor BOTH ends independently (a pattern
            # ending in '.*' or '$' still needs the leading '^' — review
            # finding: /4[0-9].*/ must not match 'X41')
            if not pat.startswith("^"):
                pat = "^" + pat
            if not pat.endswith("$") and not pat.endswith(".*"):
                pat = pat + "$"
            return {"regexp": {path: pat}}
        if nxt[0] == "op" and nxt[1] in ("==", "!=", "<", ">", "<=", ">="):
            op = self.take()[1]
            if self.peek() == ("word", "ctx"):
                # column-vs-column comparison (ftd NAT mapped ip/port;
                # pensando dfw source_port > destination_port)
                rpath, rmethod, _ = self._path()
                if rmethod is not None:
                    raise PainlessUnsupported("method on rhs path")
                if op in ("==", "!="):
                    eq = {"field_equals": [path, rpath]}
                    return eq if op == "==" else {"not": eq}
                key = {"<": "lt", ">": "gt", "<=": "lte", ">=": "gte"}[op]
                return {"field_compare": [path, rpath, key]}
            rhs = self.take()
            if rhs == ("word", "null"):
                has = {"has_fields": [path]}
                return {"not": has} if op == "==" else has
            if rhs[0] == "word" and rhs[1] in ("true", "false"):
                eq = {"equals": {path: rhs[1] == "true"}}
                return eq if op == "==" else {"not": eq}
            if rhs[0] in ("str", "num"):
                if op == "==":
                    return {"equals": {path: rhs[1]}}
                if op == "!=":
                    return {"not": {"equals": {path: rhs[1]}}}
                key = {"<": "lt", ">": "gt", "<=": "lte", ">=": "gte"}[op]
                return {"range": {f"{path}.{key}": rhs[1]}}
            raise PainlessUnsupported(f"rhs {rhs}")
        # bare path: painless boolean field test
        return {"equals": {path: True}}


def painless_condition(src: str) -> dict:
    """Compile a painless ``if:`` expression to a conditions.py config."""
    # digit-count dispatch (crowdstrike UNIX vs UNIX_MS):
    # (int)(Math.log10(x) + 1) >= N  ⇔  x >= 10^(N-1)  for positive x
    # (the pipelines guard x != 0 alongside)
    def _digits(m):
        path, op, n = m.group(1), m.group(2), int(m.group(3))
        bound = 10 ** (n - 1)
        return f"{path} {'>=' if op == '>=' else '<'} {bound}"
    src = re.sub(
        r"\(int\)\s*\(\s*Math\.log10\(\s*(ctx[\w.?$]*)\s*\)\s*\+\s*1\s*\)"
        r"\s*(>=|<)\s*(\d+)", _digits, src)
    # /c/.split(x).length == N  ⇔  x has exactly N-1 occurrences of c
    # (crowdstrike user.name email test)
    def _split_len(m):
        sep, path, n = m.group(1), m.group(2), int(m.group(3))
        cls = "[^" + sep + "]*"
        return f"{path} ==~ /{cls}" + (sep + cls) * (n - 1) + "/"
    src = re.sub(
        r"/(\w|@)/\.split\(\s*(ctx[\w.?$]*)\s*\)\.length\s*==\s*(\d+)",
        _split_len, src)
    # /pat/.matcher(x).matches()  ->  x ==~ /pat/  (crowdstrike all-zero
    # hash guards)
    src = re.sub(
        r"/((?:[^/\\]|\\.)+)/\.matcher\(\s*(ctx[\w.?$]*)\s*\)\.matches\(\)",
        lambda m: f"{m.group(2)} ==~ /{m.group(1)}/", src)
    # parens around a bare ctx path — `(ctx.json?.description).length()` —
    # are grouping noise for this grammar
    src = re.sub(r"(?<![\w)])\(\s*(ctx[\w.?$]*)\s*\)", r"\1", src)
    p = _P(_tokenize(src))
    cond = p.expr()
    if p.i != len(p.toks):
        raise PainlessUnsupported(f"trailing tokens {p.toks[p.i:]}")
    return cond


# ---------------------------------------------------------------------------
# Java time format -> timestamp-stage layout
# ---------------------------------------------------------------------------

_JAVA_TOKENS = [
    ("yyyy", "%Y"), ("uuuu", "%Y"), ("yy", "%y"), ("MMMM", "%B"),
    ("MMM", "%b"),
    ("MM", "%m"), ("M", "%m"), ("dd", "%d"), ("d", "%d"),
    ("EEEE", "%A"), ("EEE", "%a"), ("HH", "%H"), ("H", "%H"),
    ("hh", "%I"), ("h", "%I"), ("mm", "%M"), ("m", "%M"),
    ("ss", "%S"), ("s", "%S"), ("a", "%p"), ("XXXXX", "%z"), ("XXX", "%z"),
    ("XX", "%z"), ("X", "%z"), ("ZZZZZ", "%z"), ("ZZZZ", "%z"),
    ("ZZZ", "%z"), ("ZZ", "%z"), ("Z", "%z"), ("zzz", "%Z"),
    ("zz", "%Z"), ("z", "%Z"), ("VV", "%Z"),
]
_PASSTHROUGH = {"ISO8601", "UNIX", "UNIX_MS", "TAI64N"}
# java.time named formatters ES date accepts -> the engine's special layouts
_NAMED_LAYOUTS = {"ISO_INSTANT": "ISO8601", "ISO_OFFSET_DATE_TIME": "ISO8601",
                  "ISO_DATE_TIME": "ISO8601", "ISO_ZONED_DATE_TIME": "ISO8601",
                  "iso8601": "ISO8601", "epoch_millis": "UNIX_MS",
                  "epoch_second": "UNIX",
                  # java.time DateFormatter names (panw): optional-time ISO
                  # with up to ns fraction — the engine's ISO8601 layout
                  # already accepts date-only and fractional forms
                  "strict_date_optional_time": "ISO8601",
                  "strict_date_optional_time_nanos": "ISO8601"}


def java_date_layouts(formats) -> list[str]:
    """ES date-processor formats -> timestamp-stage layouts."""
    out = []
    expanded = []
    for f in formats:
        if "[" in str(f):
            # java.time optional sections: expand each [..] group into
            # with/without variants ('EEE MMM [ d][dd] HH:mm:ss uuuu XXX',
            # oracle) — non-sensical combinations simply never match, and
            # strptime's whitespace leniency absorbs the padding space
            variants = [""]
            for part in re.split(r"(\[[^\]]*\])", str(f)):
                if part.startswith("["):
                    variants = [v + part[1:-1] for v in variants] + variants
                else:
                    variants = [v + part for v in variants]
            seen = set()
            for v in variants:
                if v not in seen:
                    seen.add(v)
                    expanded.append(v)
        else:
            expanded.append(f)
    for f in expanded:
        if f in _PASSTHROUGH:
            out.append(f)
            continue
        if f in _NAMED_LAYOUTS:
            out.append(_NAMED_LAYOUTS[f])
            continue
        buf, i = [], 0
        while i < len(f):
            if f[i] == "'":
                j = f.find("'", i + 1)
                if j < 0:
                    raise PainlessUnsupported(f"bad quote in {f!r}")
                lit = f[i + 1:j] or "'"
                buf.append(lit.replace("%", "%%"))
                i = j + 1
                continue
            if f[i] == "S":   # any-width fraction-of-second run (S..SSSSSSSSS)
                while i < len(f) and f[i] == "S":
                    i += 1
                buf.append("%f")
                continue
            for tok, rep in _JAVA_TOKENS:
                if f.startswith(tok, i):
                    buf.append(rep)
                    i += len(tok)
                    break
            else:
                if f[i].isalpha():
                    raise PainlessUnsupported(f"java date token {f[i:]!r}")
                buf.append(f[i])
                i += 1
        out.append("".join(buf))
    # Java rejects fractional input on a fraction-less format and falls
    # through to the .S sibling; Arrow's %Z leniently swallows ".431Z", so
    # a fraction-less layout would steal those rows.  Within each group of
    # layouts identical up to the ".%f", try the %f variants first (the %f
    # path degrades gracefully on fraction-less input).
    def _skel(lay):
        return lay.replace(".%f", "").replace("%f", "")
    groups: dict[str, list[str]] = {}
    order = []
    for lay in out:
        k = _skel(lay)
        if k not in groups:
            groups[k] = []
            order.append(k)
        groups[k].append(lay)
    return [lay for k in order
            for lay in sorted(groups[k], key=lambda x: "%f" not in x)]


# ---------------------------------------------------------------------------
# ES processor -> stage-spec mapping
# ---------------------------------------------------------------------------

_PURE_TMPL = re.compile(r"^\{\{\{?\s*([^}\s]+?)\s*\}?\}\}$")

# processors the cluster (not the pipeline) owns in golden comparisons:
# geoip writes .geo/.as (skipped), event.ingested/created are harness-owned
_SKIP_SET_FIELDS = {"event.ingested", "event.created"}


def _fields_list(cfg):
    v = cfg.get("field", cfg.get("fields"))
    return v if isinstance(v, list) else [v]


def _compile_one(kind: str, cfg: dict, ctx: "_Ctx"):
    """One ES processor -> list of spec entries (without the if-wrap)."""
    if kind == "geoip":
        return []
    if kind == "set":
        if cfg["field"] in _SKIP_SET_FIELDS:
            return []
        if str(cfg.get("copy_from", "")).startswith("_ingest"):
            return []   # harness-owned metadata (event.ingested)
        if "{{" in cfg["field"]:  # templated field NAME -> per-row target
            out = {"field_template": cfg["field"]}
            v = cfg.get("value")
            if cfg.get("copy_from"):
                out["copy_from"] = cfg["copy_from"]
            elif isinstance(v, str) and "{{" in v:
                out["template"] = v
            else:
                out["value"] = v
            return [{"set_dynamic": out}]
        out = {"field": cfg["field"]}
        v = cfg.get("value")
        if cfg.get("copy_from"):
            out["copy_from"] = cfg["copy_from"]
        elif isinstance(v, str) and "{{" in v:
            m = _PURE_TMPL.match(v)
            tmpl = ("%{[" + m.group(1) + "]}") if m else re.sub(
                r"\{\{\{?\s*([^}\s]+?)\s*\}?\}\}", lambda g: "%{[" + g.group(1) + "]}", v)
            if m and m.group(1) in ("_ingest.timestamp", "_ingest.on_failure_message"):
                return []
            out["template"] = tmpl
            if "{{{" in v:
                out["template_escape"] = False
        elif isinstance(v, list) and any(
                isinstance(e, str) and "{{" in e for e in v):
            # list value of mustache templates (salesforce user.roles:
            # ["{{{json.USER_TYPE}}}"]) — each element renders per row
            out["list_templates"] = [re.sub(
                r"\{\{\{?\s*([^}\s]+?)\s*\}?\}\}",
                lambda g: "%{[" + g.group(1) + "]}", str(e)) for e in v]
            if any("{{{" in str(e) for e in v):
                out["template_escape"] = False
        else:
            out["value"] = v
        for k in ("override", "ignore_empty_value"):
            if k in cfg:
                out[k] = cfg[k]
        return [{"set": out}]
    if kind == "append":
        out = {"field": cfg["field"], "value": cfg.get("value")}
        if "allow_duplicates" in cfg:
            out["allow_duplicates"] = cfg["allow_duplicates"]
        return [{"append": out}]
    if kind == "date":
        out = {"field": cfg["field"],
               "target_field": cfg.get("target_field", "@timestamp"),
               "ignore_missing": True,
               "ignore_failure": bool(cfg.get("ignore_failure", False)),
               "layouts": java_date_layouts(cfg.get("formats", ["ISO8601"]))}
        tz = cfg.get("timezone")
        if tz:
            m = _PURE_TMPL.match(str(tz))
            if m:  # '{{ event.timezone }}' -> per-row timezone column
                out["timezone_field"] = m.group(1)
            elif "{{" in str(tz):
                raise PainlessUnsupported(f"templated timezone {tz!r}")
            else:
                out["timezone"] = tz
        if cfg.get("on_failure"):
            # ES on_failure: the doc does NOT fail; handlers run for rows
            # whose value no format parsed — gated on a per-processor flag
            # (cisco asa / checkpoint: remove the bad timezone and retry
            # the date without it).  Rows with a MISSING source keep the
            # skip semantics (divergence from ES, which errors on missing;
            # the compiled pipelines gate dates on field presence).
            flag = f"_date_fail_{ctx.index}"
            out["failure_flag"] = flag
            specs = [{"timestamp": out}]
            cond = {"contains": {"log.flags": flag}}
            # `{{ _ingest.on_failure_message }}` has no column analogue:
            # substitute the stage's own failure text at compile time
            msg = f"could not parse time field {cfg['field']}"

            def _subst(v):
                if isinstance(v, str):
                    return re.sub(
                        r"\{\{\{?\s*_ingest\.on_failure_message\s*\}?\}\}",
                        msg, v)
                if isinstance(v, dict):
                    return {k: _subst(x) for k, x in v.items()}
                if isinstance(v, list):
                    return [_subst(x) for x in v]
                return v
            for h in cfg["on_failure"]:
                for s2 in compile_ingest([_subst(h)], _ctx=ctx.handler_ctx()):
                    w = {"and": [cond, s2["when"]]} if "when" in s2 else cond
                    specs.append({**s2, "when": w})
            return specs
        return [{"timestamp": out}]
    if kind == "remove":
        # ES remove of a map field deletes the subtree (zoom `remove: zoom`
        # between the payload lift renames)
        return [{"drop_fields": {"fields": _fields_list(cfg),
                                 "ignore_missing": True,
                                 "drop_subtrees": True}}]
    if kind == "rename":
        if "{{" in cfg.get("target_field", ""):
            return [{"set_dynamic": {"field_template": cfg["target_field"],
                                     "rename_from": cfg["field"]}}]
        # ES rename moves whole objects; the flat model's prefix move is
        # the analogue (safe here: ingest docs at this point carry
        # pipeline-authored paths, not raw dotted-literal source keys)
        return [{"rename": {
            "fields": [{"from": cfg["field"], "to": cfg["target_field"]}],
            "ignore_missing": bool(cfg.get("ignore_missing", False)),
            "move_subtrees": True,
            "fail_on_error": False}}]
    if kind == "convert":
        f = {"from": cfg["field"]}
        if cfg.get("target_field") and cfg["target_field"] != cfg["field"]:
            f["to"] = cfg["target_field"]
        if cfg.get("type") and cfg["type"] != "auto":
            f["type"] = {"integer": "long"}.get(cfg["type"], cfg["type"])
        specs = [{"convert": {"fields": [f], "mode": "copy",
                              "ignore_missing": True,
                              "fail_on_error": False}}]
        # per-processor on_failure (umbrella address->ip with domain
        # fallback): run the handlers on rows where the cast will fail.
        # For in-place converts the check must see the PRE-convert string
        # (post-convert the column is numeric and a regexp never matches),
        # so those handlers run BEFORE the convert — equivalent outcome.
        pre = []
        for h in cfg.get("on_failure") or []:
            if "to" in f:
                failed = {"and": [{"has_fields": [f["from"]]},
                                  {"not": {"has_fields": [f["to"]]}}]}
                bucket = specs
            elif cfg.get("type") == "ip":
                failed = {"and": [
                    {"has_fields": [f["from"]]},
                    {"not": {"regexp": {
                        f["from"]: r"^(\d{1,3}\.){3}\d{1,3}$|:"}}}]}
                bucket = pre
            elif cfg.get("type") in ("float", "double", "long", "integer"):
                # only STRING values can fail the numeric cast: a column
                # that already arrived numeric (decode_json_fields) casts
                # trivially, and the regexp alone would return all-false on
                # it, firing the handlers on every row (review finding) —
                # instance_string scopes the gate to string-typed values
                failed = {"and": [
                    {"has_fields": [f["from"]]},
                    {"instance_string": f["from"]},
                    {"not": {"regexp": {
                        f["from"]:
                        r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"}}}]}
                bucket = pre
            else:
                raise PainlessUnsupported("convert on_failure variant")
            for s in compile_ingest([h], _ctx=ctx.handler_ctx()):
                w = {"and": [failed, s["when"]]} if "when" in s else failed
                bucket.append({**s, "when": w})
        return pre + specs
    if kind == "gsub":
        tgt = cfg.get("target_field", cfg["field"])
        specs = []
        if tgt != cfg["field"]:  # gsub writes elsewhere: copy, then edit
            specs.append({"copy_fields": {
                "fields": [{"from": cfg["field"], "to": tgt}],
                "ignore_missing": True, "fail_on_error": False}})
        # Java Matcher.replaceAll: backslash escapes the next replacement
        # char (oracle gsub replacement '\|' is a literal pipe); keep $N
        # backrefs for the replace stage's own translation
        repl = re.sub(r"\\([^\d$])", r"\1", str(cfg.get("replacement", "")))
        specs.append({"replace": {"fields": [{
            "field": tgt, "pattern": cfg["pattern"],
            "replacement": repl}],
            "ignore_missing": True, "fail_on_error": False}})
        return specs
    if kind == "kv":
        out = {k: v for k, v in cfg.items() if k not in ("if", "description",
                                                         "on_failure", "tag")}
        if cfg.get("on_failure"):
            # ES on_failure: the doc does NOT fail; handlers run for the
            # rows this kv missed — gated on a per-processor flag (okta
            # risk kv removes its partial target)
            flag = f"_kv_fail_{ctx.index}"
            out["failure_flag"] = flag
            specs = [{"kv": out}]
            cond = {"contains": {"log.flags": flag}}
            for h in cfg["on_failure"]:
                for s2 in compile_ingest([h], _ctx=ctx.handler_ctx()):
                    w = {"and": [cond, s2["when"]]} if "when" in s2 else cond
                    specs.append({**s2, "when": w})
            return specs
        return [{"kv": out}]
    if kind == "grok":
        # ES grok is an UNANCHORED substring match (kafka's first pattern
        # starts at the timestamp INSIDE "[ts] ...")
        out = {"field": cfg["field"], "patterns": cfg["patterns"],
               "ignore_missing": True, "empty_to_null": True, "anchor": False,
               "ignore_failure": bool(cfg.get("ignore_failure", False))}
        if cfg.get("pattern_definitions"):
            out["pattern_definitions"] = cfg["pattern_definitions"]
        if cfg.get("on_failure"):
            # ES on_failure: the doc does NOT fail; handlers run for the
            # rows this grok missed — gated on a per-processor flag
            flag = f"_grok_fail_{ctx.index}"
            out["ignore_failure"] = True
            out["failure_flag"] = flag
            specs = [{"grok": out}]
            cond = {"contains": {"log.flags": flag}}
            for h in cfg["on_failure"]:
                for s in compile_ingest([h], _ctx=ctx.handler_ctx()):
                    w = {"and": [cond, s["when"]]} if "when" in s else cond
                    specs.append({**s, "when": w})
            return specs
        return [{"grok": out}]
    if kind == "dissect":
        # ES DissectProcessor appends join with append_separator, DEFAULT ""
        # (Beats dissect joins with the preceding delimiter instead)
        out = {"field": cfg["field"], "tokenizer": cfg["pattern"],
               "target_prefix": "",
               # ES dissect overwrites existing fields (an in-place
               # brace-strip — okta behaviors — rewrites its own source)
               "overwrite_keys": True,
               "append_separator": cfg.get("append_separator", "")}
        if cfg.get("ignore_failure"):
            # cisco asa 713049: two variant dissects under one message-id
            # condition, each ignore_failure — a non-matching variant must
            # not poison the row
            out["ignore_failure"] = True
        return [{"dissect": out}]
    if kind == "json":
        # ES JsonProcessor expands the whole tree (no depth cap) and
        # REPLACES its target (decoding a stringly field in place — o365
        # OperationProperties — needs overwrite)
        out = {"fields": [cfg["field"]], "keep_arrays": True,
               "max_depth": 99, "overwrite_keys": True}
        if cfg.get("target_field"):
            out["target"] = cfg["target_field"]
        elif not cfg.get("add_to_root"):
            out["target"] = cfg["field"]
        else:
            out["target"] = ""
        return [{"decode_json_fields": out}]
    if kind == "csv":
        out = {k: v for k, v in cfg.items() if k in (
            "field", "target_fields", "separator", "quote", "trim",
            "empty_value")}
        return [{"es_csv": out}]
    if kind in ("lowercase", "uppercase"):
        specs = []
        src = cfg["field"]
        tgt = cfg.get("target_field")
        if tgt and tgt != src:
            specs.append({"copy_fields": {
                "fields": [{"from": src, "to": tgt}],
                "ignore_missing": True, "fail_on_error": False}})
            src = tgt
        specs.append({kind: {"values": [src], "ignore_missing": True,
                             "fail_on_error": False}})
        return specs
    if kind == "split":
        out = {k: v for k, v in cfg.items() if k in (
            "field", "separator", "target_field", "preserve_trailing")}
        return [{"es_split": out}]
    if kind == "join":
        out = {k: v for k, v in cfg.items() if k in (
            "field", "separator", "target_field")}
        return [{"es_join": out}]
    if kind == "trim":
        out = {"fields": _fields_list(cfg)}
        if cfg.get("target_field"):
            out["target_field"] = cfg["target_field"]
        return [{"es_trim": out}]
    if kind == "uri_parts":
        out = {"field": cfg["field"]}
        for k in ("target_field", "keep_original", "remove_if_successful"):
            if k in cfg:
                out[k] = cfg[k]
        return [{"uri_parts": out}]
    if kind == "urldecode":
        return [{"urldecode": {"fields": [{
            "from": cfg["field"],
            "to": cfg.get("target_field", cfg["field"])}],
            "ignore_missing": True, "fail_on_error": False}}]
    if kind == "user_agent":
        out = {"field": cfg["field"]}
        if "target_field" in cfg:
            out["target_field"] = cfg["target_field"]
        return [{"user_agent": out}]
    if kind == "community_id":
        # field overrides live under the stage's `fields` map (the NAT
        # community id in panw computes over source.nat.ip/port)
        out, fields = {}, {}
        for k in ("source_ip", "source_port", "destination_ip",
                  "destination_port", "transport", "icmp_type", "icmp_code",
                  "iana_number"):
            if k in cfg:
                fields[k] = cfg[k]
        if fields:
            out["fields"] = fields
        if "target_field" in cfg:
            out["target"] = cfg["target_field"]
        if "seed" in cfg:
            out["seed"] = cfg["seed"]
        out["strict_ports"] = True  # ES rejects ports outside 1-65535
        return [{"community_id": out}]
    if kind == "registered_domain":
        out = {"field": cfg["field"], "ignore_missing": True}
        if cfg.get("target_field"):
            out["target_field"] = cfg["target_field"]
        return [{"registered_domain": out}]
    if kind == "dot_expander":
        return []
    if kind == "fingerprint":
        if cfg.get("target_field", "") .startswith("_"):
            return []  # metadata targets (_id) are harness-owned
        out = {k: v for k, v in cfg.items() if k in (
            "fields", "target_field", "method")}
        return [{"fingerprint": out}]
    if kind == "drop":
        return [{"drop_event": {}}]
    if kind == "fail":
        # ES FailProcessor: abort the doc with a message -> error-poison the
        # row (routes to _rejects like any processor failure)
        return [{"fail": {"message": cfg.get("message",
                                             "Fail processor executed")}}]
    if kind == "network_direction":
        out = {"source": cfg.get("source_ip", "source.ip"),
               "destination": cfg.get("destination_ip", "destination.ip"),
               "target": cfg.get("target_field", "network.direction")}
        if "internal_networks" in cfg:
            out["internal_networks"] = cfg["internal_networks"]
        if "internal_networks_field" in cfg:
            out["internal_networks_field"] = cfg["internal_networks_field"]
        return [{"add_network_direction": out}]
    if kind == "script":
        if ctx.scripts is None or not ctx.scripts:
            raise PainlessUnsupported(
                f"painless script needs a hand impl (processor {ctx.index}):"
                f" {str(cfg.get('source'))[:120]!r}")
        impl = ctx.scripts.pop(0)
        if impl is None:
            return []
        return impl if isinstance(impl, list) else [impl]
    if kind == "pipeline":
        if ctx.pipeline_loader is None:
            raise PainlessUnsupported("pipeline processor needs a loader")
        specs = ctx.pipeline_loader(cfg["name"])
        if cfg.get("on_failure"):
            # ES: a failure anywhere in the sub-pipeline aborts it for that
            # doc and runs the pipeline processor's on_failure handlers
            # (system/auth: grok-auth-messages miss -> restore message).
            # Approximation: groks are the failable stages in spliced
            # subs — route their misses to a shared per-row flag and gate
            # the handlers on it.  (A multi-stage sub keeps running its
            # remaining stages for the failed row; fixtures that care pair
            # on_failure with single-grok subs.)
            flag = f"_pipe_fail_{ctx.index}"
            routed = []
            for s in specs:
                if "grok" in s and not s["grok"].get("ignore_failure") \
                        and "failure_flag" not in s["grok"]:
                    routed.append({**s, "grok": {**s["grok"],
                                                 "ignore_failure": True,
                                                 "failure_flag": flag}})
                else:
                    routed.append(s)
            cond = {"contains": {"log.flags": flag}}
            for h in cfg["on_failure"]:
                for s2 in compile_ingest([h], _ctx=ctx.handler_ctx()):
                    w = {"and": [cond, s2["when"]]} if "when" in s2 else cond
                    routed.append({**s2, "when": w})
            specs = routed
        return specs
    if kind == "foreach":
        inner = cfg.get("processor", {})
        if "rename" in inner:
            r = inner["rename"]
            f, t = str(r.get("field", "")), str(r.get("target_field", ""))
            pre = "_ingest._value."
            if f.startswith(pre) and t.startswith(pre):
                # per-element struct-member rename inside a list column
                # (okta target geographicalContext -> geographical_context)
                col = cfg["field"].replace(".", "_")
                fk = f[len(pre):].split(".")
                tk = t[len(pre):].split(".")
                src = (
                    "def process(event, params):\n"
                    f"    arr = event.get({col!r})\n"
                    "    if not isinstance(arr, list):\n"
                    "        return event\n"
                    f"    fk, tk = {fk!r}, {tk!r}\n"
                    "    for el in arr:\n"
                    "        cur = el\n"
                    "        for seg in fk[:-1]:\n"
                    "            cur = cur.get(seg) if isinstance(cur, dict)"
                    " else None\n"
                    "        if not isinstance(cur, dict) or "
                    "fk[-1] not in cur:\n"
                    "            continue\n"
                    "        v = cur.pop(fk[-1])\n"
                    "        dst = el\n"
                    "        for seg in tk[:-1]:\n"
                    "            nxt = dst.get(seg)\n"
                    "            if not isinstance(nxt, dict):\n"
                    "                nxt = dst[seg] = {}\n"
                    "            dst = nxt\n"
                    "        dst[tk[-1]] = v\n"
                    "    return event\n")
                return [{"script": {"source": src}}]
        if "append" in inner:
            a = inner["append"]
            av = a.get("value")
            if isinstance(av, list) and len(av) == 1:
                a = {**a, "value": av[0]}   # 1-elem list form (suricata)
            m = _PURE_TMPL.match(str(a.get("value")))
            if m and m.group(1).startswith("_ingest._value"):
                out = {"field": a["field"], "each_from": cfg["field"]}
                rest = m.group(1)[len("_ingest._value"):]
                if rest.startswith("."):
                    out["each_key"] = rest[1:].replace(".", "_")
                if "allow_duplicates" in a:
                    out["allow_duplicates"] = a["allow_duplicates"]
                return [{"append": out}]
        if "set" in inner:
            # per-element DYNAMIC set: each element (a {name, value}-shaped
            # struct) writes one event field whose NAME comes from a member
            # (auditd copy / cef checkpoint _tmp_copy / cyberarkpas
            # CAProperties — optionally under a static field prefix)
            s = inner["set"]
            fm = re.fullmatch(
                r"(.*?)\{\{\{?\s*_ingest\._value\.([\w.]+)\s*\}?\}\}",
                str(s.get("field", "")))
            vm = _PURE_TMPL.match(str(s.get("value")))
            if fm and vm and vm.group(1).startswith("_ingest._value."):
                prefix, name_key = fm.group(1), fm.group(2)
                val_key = vm.group(1)[len("_ingest._value."):]
                col = cfg["field"].replace(".", "_")
                src = (
                    "def process(event, params):\n"
                    f"    arr = event.get({col!r})\n"
                    "    if not isinstance(arr, list):\n"
                    "        return event\n"
                    f"    nk, vk, pre = {name_key!r}, {val_key!r}, {prefix!r}\n"
                    "    for el in arr:\n"
                    "        if not isinstance(el, dict):\n"
                    "            continue\n"
                    "        name = el.get(nk)\n"
                    "        if name in (None, ''):\n"
                    "            continue\n"
                    "        v = el.get(vk)\n"
                    "        # mustache value render: Java toString-ish\n"
                    "        if v is None:\n"
                    "            v = ''\n"
                    "        elif v is True or v is False:\n"
                    "            v = 'true' if v else 'false'\n"
                    "        elif not isinstance(v, str):\n"
                    "            v = str(v)\n"
                    "        key = (pre + str(name)).replace('.', '_')\n"
                    "        event[key] = v\n"
                    "    return event\n")
                return [{"script": {"source": src}}]
        for ik in ("lowercase", "uppercase", "gsub"):
            if ik not in inner:
                continue
            # per-element member transform (threatintel/threatq lowercases
            # and underscores each attribute name before the dynamic set)
            t = inner[ik]
            f = str(t.get("field", ""))
            if f == "_ingest._value":
                member = None
            elif f.startswith("_ingest._value."):
                member = f[len("_ingest._value."):].split(".")
            else:
                break
            col = cfg["field"].replace(".", "_")
            if ik == "gsub":
                body = (f"    rx = __import__('re').compile("
                        f"{str(t.get('pattern', ''))!r})\n"
                        f"    fn = lambda v: rx.sub("
                        f"{str(t.get('replacement', ''))!r}, v)\n")
            else:
                fn = "lower" if ik == "lowercase" else "upper"
                body = f"    fn = lambda v: v.{fn}()\n"
            src = (
                "def process(event, params):\n"
                f"    arr = event.get({col!r})\n"
                "    if not isinstance(arr, list):\n"
                "        return event\n"
                + body +
                f"    mem = {member!r}\n"
                "    for i, el in enumerate(arr):\n"
                "        if mem is None:\n"
                "            if isinstance(el, str):\n"
                "                arr[i] = fn(el)\n"
                "            continue\n"
                "        cur = el\n"
                "        for seg in mem[:-1]:\n"
                "            cur = cur.get(seg) if isinstance(cur, dict)"
                " else None\n"
                "        if isinstance(cur, dict) and "
                "isinstance(cur.get(mem[-1]), str):\n"
                "            cur[mem[-1]] = fn(cur[mem[-1]])\n"
                "    return event\n")
            return [{"script": {"source": src}}]
        raise PainlessUnsupported(f"foreach variant {inner}")
    raise PainlessUnsupported(f"ES processor {kind!r}")


class _Ctx:
    def __init__(self, scripts, overrides, pipeline_loader):
        self.scripts = list(scripts) if scripts is not None else None
        self.overrides = overrides or {}
        self.pipeline_loader = pipeline_loader
        self.index = 0

    def handler_ctx(self) -> "_Ctx":
        """Child context for compiling per-processor ``on_failure`` handlers:
        shares the positional script queue and the pipeline loader but NOT
        overrides/index — handler position 0 must not pick up a top-level
        override keyed to processor 0, and the recursion must not clobber
        the caller's index (used after return for `_pipe_` marker names)."""
        child = _Ctx(None, None, self.pipeline_loader)
        child.scripts = self.scripts   # same list object: pops stay aligned
        return child


def compile_ingest(doc, scripts=None, overrides=None, pipeline_loader=None,
                   _ctx=None) -> list:
    """ES pipeline doc (dict with 'processors', or bare list) -> spec list.

    scripts: ordered replacement specs for painless script processors.
    overrides: {index: spec | [spec,...] | None} for processors outside the
    supported subset (index = position in the ES processors list).
    pipeline_loader: name -> compiled spec list (for `pipeline:` calls).
    """
    procs = doc.get("processors", doc) if isinstance(doc, dict) else doc
    ctx = _ctx or _Ctx(scripts, overrides, pipeline_loader)
    out = []
    for i, entry in enumerate(procs):
        ctx.index = i
        (kind, cfg), = entry.items()
        cfg = cfg or {}
        if i in ctx.overrides:
            o = ctx.overrides[i]
            if kind == "script" and ctx.scripts:
                ctx.scripts.pop(0)  # keep positional script list aligned
            if o is None:
                continue
            if isinstance(o, dict) and "__unconditional__" in o:
                # replacement handles the painless `if` internally (e.g. an
                # instanceof-List guard the flat model can't evaluate)
                u = o["__unconditional__"]
                out.extend(u if isinstance(u, list) else [u])
                continue
            specs = o if isinstance(o, list) else [o]
        else:
            specs = _compile_one(kind, cfg, ctx)
        cond_src = cfg.get("if")
        if cond_src and specs:
            cond = painless_condition(cond_src)
            if kind == "pipeline":
                # ES evaluates a sub-pipeline's `if` ONCE at dispatch; the
                # sub-pipeline may then mutate the very field the condition
                # reads (elasticsearch json-7 removes .type first thing) —
                # PIN the verdict in a marker column, gate every spliced
                # spec on it, drop the marker after
                import hashlib as _hl
                mark = "_pipe_" + _hl.sha1(
                    (str(ctx.index) + str(cond)).encode()).hexdigest()[:8]
                pin = {"set": {"field": mark, "value": True}, "when": cond}
                gate = {"equals": {mark: True}}
                wrapped = [pin]
                for s in specs:
                    if "if" in s:
                        wrapped.append(s)
                    elif "when" in s:
                        wrapped.append(
                            {**s, "when": {"and": [gate, s["when"]]}})
                    else:
                        wrapped.append({**s, "when": gate})
                wrapped.append({"drop_fields": {"fields": [mark],
                                                "ignore_missing": True}})
                specs = wrapped
            else:
                wrapped = []
                for s in specs:
                    if "if" in s:
                        wrapped.append(s)
                    elif "when" in s:  # spliced sub-pipeline keeps its own
                        wrapped.append(
                            {**s, "when": {"and": [cond, s["when"]]}})
                    else:
                        wrapped.append({**s, "when": cond})
                specs = wrapped
        out.extend(specs)
    return out


# ---------------------------------------------------------------------------
# module fileset loading (config template + ingest yml)
# ---------------------------------------------------------------------------

def load_pipeline_yml(path: str, vars: dict | None = None) -> dict:
    """Parse an ingest/pipeline.yml; tolerates the `{< IngestPipeline >}`
    Go-template pipeline-name values by quoting them.

    With ``vars`` (the fileset's manifest vars), renders the full `{< >}`
    Go-template surface the reference applies at pipeline-upload time
    (fileset.go:324-340 applyTemplate with delims `{<` `>}`):
    ``{<if .var >}...{< end >}`` blocks (osquery pipeline.json) and
    ``{< .var >}`` substitution (cisco shared asa-ftd-pipeline.yml)."""
    text = open(path).read()
    if vars is not None:
        text = re.sub(r"\{<\s*if\s+\.(\w+)\s*>\}(.*?)\{<\s*end\s*>\}",
                      lambda m: m.group(2) if vars.get(m.group(1)) else "",
                      text, flags=re.S)
    text = re.sub(r"\{<\s*IngestPipeline\s+\"([^\"]+)\"\s*>\}", r"\1", text)
    if vars is not None:
        text = re.sub(r"\{<\s*\.(\w+)\s*>\}",
                      lambda m: str(vars.get(m.group(1), "")), text)
    return yaml.safe_load(text)


def render_module_config(text: str, vars: dict) -> str:
    """Tiny Go-template subset used by module config/*.yml files:
    {{ if .x }}...{{ end }}, {{ .x }}, {{ .x | tojson }}, {{ range }} drop.
    Enough to extract the processors section deterministically."""
    import json as _json

    def _val(name):
        # missing var -> None (Go template nil), NOT "" — an explicitly
        # empty-string var renders as '' while nil renders '<no value>'
        return vars.get(name.strip().lstrip("."))

    # drop range blocks (paths) entirely
    text = re.sub(r"\{\{\s*range[^}]*\}\}.*?\{\{\s*end\s*\}\}", "", text,
                  flags=re.S)

    # if/else-if/else/end blocks (non-nested); conditions: `.x`,
    # `not .x`, `eq .x "lit"` (panw input.yml dispatches on
    # `eq .input "syslog"` / `else if eq .input "file"`)
    def _truth(cond):
        cond = cond.strip()
        if cond.startswith("not "):
            return not _truth(cond[4:])
        if cond.startswith("eq "):
            def _gostr(t):
                if t.startswith('"'):
                    return t[1:-1]
                if t in ("true", "false"):   # literal bool operand
                    return t
                v = _val(t)
                if isinstance(v, bool):      # Go renders bools lowercase
                    return "true" if v else "false"
                return str(v)
            toks = re.findall(r'"[^"]*"|\S+', cond[3:])
            vals = [_gostr(t) for t in toks]
            return len(vals) >= 2 and all(v == vals[0] for v in vals[1:])
        return bool(_val(cond.split()[0]))

    def _if(m):
        cond, body = m.group(1), m.group(2)
        segs = re.split(r"\{\{\s*else(?:\s+if\s+([^}]*?))?\s*\}\}", body)
        if _truth(cond):
            return segs[0]
        for i in range(1, len(segs), 2):
            if segs[i] is None or _truth(segs[i]):
                return segs[i + 1]
        return ""

    prev = None
    while prev != text:
        prev = text
        text = re.sub(r"\{\{\s*if\s+([^}]*?)\s*\}\}((?:(?!\{\{\s*if).)*?)"
                      r"\{\{\s*end\s*\}\}", _if, text, flags=re.S)
    text = re.sub(r"\{\{\s*([.\w]+)\s*\|\s*tojson\s*\}\}",
                  lambda m: _json.dumps(_val(m.group(1))), text)
    # `| printf "%q"` Go-quotes the value (sophos/xg config.yml)
    text = re.sub(r"\{\{\s*([.\w$]+)\s*\|\s*printf\s+\"%q\"\s*\}\}",
                  lambda m: _json.dumps(str(_val(m.group(1)) or "")), text)
    text = re.sub(r"\{\{\s*inList\s[^}]*\}\}", "false", text)

    def _plain(m):
        v = _val(m.group(1))
        # Go text/template renders a NIL value literally (the salesforce
        # goldens carry instance_url "<no value>"); an explicitly
        # empty-string var renders as '' like Go, not as '<no value>'
        return "<no value>" if v is None else str(v)
    text = re.sub(r"\{\{\s*(\.[\w.]+)\s*\}\}", _plain, text)
    return text


def load_fileset_config(path: str, vars: dict | None = None) -> dict:
    """Full rendered module config/*.yml document."""
    doc = yaml.safe_load(render_module_config(open(path).read(), vars or {}))
    return doc or {}


def config_processors(path: str, vars: dict | None = None) -> list:
    """Processors list from a module config/*.yml (Go-templated); an
    input-level ``fields:`` section (added before processors run,
    beats input semantics) is folded in as a leading add_fields."""
    doc = load_fileset_config(path, vars)
    procs = list(doc.get("processors", []))
    if doc.get("fields"):
        procs.insert(0, {"add_fields": {"target": "", "fields": doc["fields"]}})
    return procs


def manifest_doc(path: str) -> dict:
    """Full parsed fileset manifest.yml — the declaration the reference's
    fileset loader consumes (fileset.go:128-136: ``var``, ``input`` config
    path, ``ingest_pipeline`` path or list, ``requires.processors``)."""
    return yaml.safe_load(open(path)) or {}


def manifest_vars(path: str) -> dict:
    """{var name: default} from a fileset manifest.yml."""
    return {v["name"]: v.get("default")
            for v in manifest_doc(path).get("var", [])}
