"""grok processor — named-pattern extraction, fully vectorized.

The reference's filebeat modules delegate parsing to Elasticsearch ingest
pipelines built on grok (e.g. filebeat/module/nginx/access/ingest/
pipeline.yml); replicating module behavior therefore needs a grok engine.
Syntax: ``%{PATTERN}`` or ``%{PATTERN:field}`` or ``%{PATTERN:field:type}``
(type int|long|float) over a library of named sub-patterns; a grok
expression compiles to ONE anchored RE2 regex evaluated with
``pyarrow.compute.extract_regex`` — the same zero-copy fast path as
dissect.  Custom patterns via ``pattern_definitions``.

The bundled library covers the classic core set (public grok-patterns
vocabulary): IP, NUMBER, INT, WORD, NOTSPACE, DATA, GREEDYDATA,
QUOTEDSTRING, HTTPDATE, TIMESTAMP_ISO8601, LOGLEVEL, USERNAME, ...
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..event import add_flag, field_to_column, set_column, set_error
from .base import Stage, register

# strict IPv6 (upstream logstash grok-patterns alternation, public)
_V4SEG = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
_V4 = rf"(?:{_V4SEG}(?:\.{_V4SEG}){{3}})"
_H16 = "[0-9A-Fa-f]{1,4}"
_IPV6 = (
    rf"(?:(?:{_H16}:){{7}}(?:{_H16}|:)"
    rf"|(?:{_H16}:){{6}}(?::{_H16}|{_V4}|:)"
    rf"|(?:{_H16}:){{5}}(?:(?::{_H16}){{1,2}}|:{_V4}|:)"
    rf"|(?:{_H16}:){{4}}(?:(?::{_H16}){{1,3}}|(?::{_H16})?:{_V4}|:)"
    rf"|(?:{_H16}:){{3}}(?:(?::{_H16}){{1,4}}|(?::{_H16}){{0,2}}:{_V4}|:)"
    rf"|(?:{_H16}:){{2}}(?:(?::{_H16}){{1,5}}|(?::{_H16}){{0,3}}:{_V4}|:)"
    rf"|(?:{_H16}:){{1}}(?:(?::{_H16}){{1,6}}|(?::{_H16}){{0,4}}:{_V4}|:)"
    rf"|:(?:(?::{_H16}){{1,7}}|(?::{_H16}){{0,5}}:{_V4}|:)"
    rf")(?:%\w+)?"
)

CORE_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "BASE16NUM": r"(?:0[xX])?[0-9A-Fa-f]+",
    "BASE16FLOAT": r"\b(?:0[xX])?(?:[0-9A-Fa-f]+(?:\.[0-9A-Fa-f]*)?|\.[0-9A-Fa-f]+)\b",
    "POSINT": r"\b[1-9]\d*\b",
    "NONNEGINT": r"\b\d+\b",
    "QUOTEDSTRING": r'"[^"]*"|\'[^\']*\'',
    "QS": r'"[^"]*"|\'[^\']*\'',
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    # Upstream grok-patterns IPV6 (strict alternation; round 5: the old
    # permissive [0-9A-Fa-f:.]{2,} matched ':2205:baff:...' so the cisco
    # asa 'gaddr fe80::x' optional-interface grok never backtracked).  The
    # trailing (?:%\w+)? admits zone ids ("::1%0", iis logs) like
    # upstream's "(%.+)?".
    "IPV6": _IPV6,
    "IP": r"(?:" + _IPV6 + r"|(?:\d{1,3}\.){3}\d{1,3})",
    "IPORHOST": r"(?:" + _IPV6
                + r"|(?:\d{1,3}\.){3}\d{1,3}|[0-9A-Za-z][0-9A-Za-z.-]*)",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b",
    "HOSTPORT": r"\S+:\d+",
    "MONTH": r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\b",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12]\d)|(?:3[01])|[1-9])",
    "DAY": r"\b(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun)[a-z]*\b",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?\d)",
    "MINUTE": r"(?:[0-5]\d)",
    "SECOND": r"(?:(?:[0-5]?\d|60)(?:[:.,]\d+)?)",
    "TIME": r"(?:2[0123]|[01]?\d):(?:[0-5]\d)(?::(?:(?:[0-5]?\d|60)(?:[:.,]\d+)?))?",
    "DATE_US": r"(?:0?[1-9]|1[0-2])[/-](?:(?:0[1-9])|(?:[12]\d)|(?:3[01])|[1-9])[/-](?:\d\d){1,2}",
    "DATE_EU": r"(?:(?:0[1-9])|(?:[12]\d)|(?:3[01])|[1-9])[./-](?:0?[1-9]|1[0-2])[./-](?:\d\d){1,2}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-](?:2[0123]|[01]?\d)(?::?(?:[0-5]\d)))",
    "TIMESTAMP_ISO8601": r"(?:\d\d){1,2}-(?:0?[1-9]|1[0-2])-(?:(?:0[1-9])|(?:[12]\d)|(?:3[01])|[1-9])[T ](?:2[0123]|[01]?\d):?(?:[0-5]\d)(?::?(?:(?:[0-5]?\d|60)(?:[:.,]\d+)?))?(?:Z|[+-](?:2[0123]|[01]?\d)(?::?(?:[0-5]\d)))?",
    "HTTPDATE": r"(?:(?:0[1-9])|(?:[12]\d)|(?:3[01])|[1-9])/\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\b/(?:\d\d){1,2}:(?:2[0123]|[01]?\d):(?:[0-5]\d)(?::(?:(?:[0-5]?\d|60)(?:[:.,]\d+)?))? [+-]\d{4}",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    # upstream grok-patterns mongodb set
    "MONGO3_SEVERITY": r"\w",
    "MONGO3_COMPONENT": r"(?:%{WORD}|-)",
    # upstream grok-patterns "java" set (kafka/elasticsearch module groks)
    "JAVACLASS": r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_][a-zA-Z$_0-9]*",
    "JAVAFILE": r"(?:[a-zA-Z$_0-9. -]+)",
    "JAVAMETHOD": r"(?:(<(?:cl)?init>)|[a-zA-Z$_][a-zA-Z$_0-9]*)",
    "JAVALOGMESSAGE": r"(?:.*)",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "PATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "URIPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"(?:/[\w_%!$@:.,+~-]*)+(?:\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*)?",
    # upstream grok-patterns URI composition (apache error referer)
    "URIPROTO": r"[A-Za-z](?:[A-Za-z0-9+.-]+)+",
    "URIHOST": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[0-9A-Za-z][0-9A-Za-z.-]*)(?::\d+)?",
    "URI": (r"[A-Za-z](?:[A-Za-z0-9+.-]+)+://"
            r"(?:[a-zA-Z0-9$.+!*'(){},~#%&/=:;_?\-\[\]<>@]*@)?"
            r"(?:(?:\d{1,3}\.){3}\d{1,3}|[0-9A-Za-z][0-9A-Za-z.-]*)(?::\d+)?"
            r"(?:(?:/[\w_%!$@:.,+~-]*)+"
            r"(?:\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*)?)?"),
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    # trailing (\.?|\b) of the ES HOSTNAME matches EMPTY, so a label may
    # end with '-' ("Route1- " in the juniper flow fixture)
    "SYSLOGHOST": r"(?:(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
                  r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
                  r"|\b[0-9A-Za-z][0-9A-Za-z-]{0,62}"
                  r"(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?)",
    "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "MAC": r"(?:(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}"
           r"|(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}"
           r"|(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2})",
    # RE2-safe BASE16NUM (the grok original guards with a lookbehind RE2
    # lacks; callers rely on surrounding context for the boundary)
    "BASE16NUM": r"(?:[+-]?(?:0[xX])?[0-9A-Fa-f]+)",
    "SYSLOGTIMESTAMP": r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\b +(?:(?:0[1-9])|(?:[12]\d)|(?:3[01])|[1-9]) (?:2[0123]|[01]?\d):(?:[0-5]\d)(?::(?:(?:[0-5]?\d|60)(?:[:.,]\d+)?))?",
    "SYSLOG5424PRI": r"<[0-9]+>",
    # RFC5424 PRINTUSASCII run (grok-patterns: %%{SYSLOG5424PRINTASCII})
    "SYSLOG5424PRINTASCII": r"[!-~]+",
}

_GROK_TOKEN = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?(?::(\w+))?\}")


def compile_grok(expression: str, pattern_definitions: dict | None = None,
                 anchor: bool = True) -> tuple[str, dict[str, str]]:
    """-> (RE2 pattern with named groups, {group_name: type}).  Field names
    with dots map to sanitized group names (RE2 groups must be word chars);
    the stage translates back to columns."""
    library = dict(CORE_PATTERNS)
    library.update(pattern_definitions or {})
    types: dict[str, str] = {}
    fields: dict[str, str] = {}   # group -> original field name
    counter = [0]

    # Oniguruma option flags: (?m) is DOT-ALL there (Ruby semantics), not
    # Python's ^$-multiline (kafka stacktrace groks).  Strip a leading flag
    # group, re-emit as python (?s) BEFORE the ^ anchor, and — since a
    # dotall pattern is meant for multiline messages — translate bare $
    # (end-of-LINE in Oniguruma) to (?=\n|$).
    oni_dotall = False
    oni_flags = ""
    mflag = re.match(r"^\(\?([a-z]+)\)", expression)
    if mflag and "m" in mflag.group(1):
        oni_dotall = True
        # keep the OTHER flags of a combined group ('(?im)' must stay
        # case-insensitive): merged into the final leading flag group,
        # since python-re rejects global flags after the ^ anchor
        oni_flags = mflag.group(1).replace("m", "")
        expression = expression[mflag.end():]

    def sub(m: re.Match) -> str:
        name, field, typ = m.group(1), m.group(2), m.group(3)
        if name not in library:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        body = _GROK_TOKEN.sub(sub, library[name])  # nested patterns
        if field is None:
            return f"(?:{body})"
        group = re.sub(r"\W", "_", field)
        if group in fields:
            counter[0] += 1
            group = f"{group}_{counter[0]}"
        fields[group] = field
        if typ:
            types[group] = typ
        return f"(?P<{group}>{body})"

    pattern = _GROK_TOKEN.sub(sub, expression)
    # Oniguruma inline named groups may carry DOTTED field names
    # ((?<destination.address>...), cisco asa-ftd) — sanitize like %{}
    # fields; don't touch lookbehinds (?<= / (?<!

    # only bare Oniguruma groups — (?P<...> groups were emitted by the
    # %{} sub above and are already registered; both <name> and 'name'
    # quoting forms (kafka uses (?'kafka.log.trace.full'...)).  Oniguruma
    # allows REUSING a group name ((?<__quote>...) twice in mysqlenterprise
    # quote matching) and \k<name> backrefs resolve against any same-named
    # group — python requires unique names, so a left-to-right walk
    # uniquifies repeats and points each \k at the nearest PRECEDING
    # occurrence.
    rx_open = re.compile(r"\(\?(?:<([A-Za-z_][\w.\[\]@]*)>"
                         r"|'([A-Za-z_][\w.\[\]@]*)')")
    rx_ref = re.compile(r"\\k<([^>]+)>")
    occ: dict[str, str] = {}
    out_parts: list[str] = []
    i = 0
    while i < len(pattern):
        if pattern[i] == "\\":
            m = rx_ref.match(pattern, i)
            if m:
                nm = m.group(1)
                out_parts.append(
                    "(?P=" + occ.get(nm, re.sub(r"\W", "_", nm)) + ")")
                i = m.end()
                continue
            out_parts.append(pattern[i:i + 2])
            i += 2
            continue
        m = rx_open.match(pattern, i)
        if m:
            field = m.group(1) or m.group(2)
            group = re.sub(r"\W", "_", field)
            if group in fields:
                counter[0] += 1
                group = f"{group}_{counter[0]}"
            fields[group] = field
            occ[field] = group
            out_parts.append(f"(?P<{group}>")
            i = m.end()
            continue
        out_parts.append(pattern[i])
        i += 1
    pattern = "".join(out_parts)
    # Oniguruma absent operator (?~X): longest run NOT containing X —
    # python equivalent (?:(?!X).)*
    while "(?~" in pattern:
        j = pattern.find("(?~")
        depth, k = 1, j + 3
        while k < len(pattern) and depth:
            if pattern[k] == "\\":
                k += 2
                continue
            if pattern[k] == "(":
                depth += 1
            elif pattern[k] == ")":
                depth -= 1
            k += 1
        inner = pattern[j + 3:k - 1]
        pattern = pattern[:j] + f"(?:(?!{inner}).)*" + pattern[k:]
    # Oniguruma (ES grok) permits bare unnamed capture groups; RE2's
    # extract_regex rejects them.  Rewrite "(" -> "(?:" unless escaped or
    # already a (?...) construct — capture-by-name is the only extraction
    # path here, so plain groups only ever mean grouping.
    pattern = re.sub(r"(?<!\\)\((?![?])", "(?:", pattern)
    if "(?m)" in pattern:
        # MID-pattern Oniguruma (?m): dotall from that point on (oracle
        # audit '...\n(?m)%{GREEDYDATA:audit}') — scope it as (?s:rest)
        head, _, tail = pattern.partition("(?m)")
        pattern = head + "(?s:" + tail + ")"
    if oni_dotall:
        pattern = re.sub(r"(?<!\\)\$", r"(?=\\n|$)", pattern)
    if anchor:
        pattern = "^" + pattern
    if oni_dotall:
        pattern = f"(?s{oni_flags})" + pattern
    return pattern, {"types": types, "fields": fields}


#: sampled alphabet for char-class set approximation: ASCII + Latin-1 +
#: a few beyond-BMP probes so \w/\S style categories aren't mistaken for
#: ASCII-only classes
_SAMPLE_CHARS = [chr(c) for c in range(0x180)] + list("α一\U0001f600")


def _charset(elem, state=None) -> frozenset | None:
    """Approximate set of sampled chars a single parsed element can consume
    as its FIRST character (None = matches nothing / zero-width).  ``state``
    is the original parse state so pattern flags ((?s)/(?i)) keep their
    meaning when the element is compiled standalone."""
    import re._compiler as _c
    import re._parser as _p
    op, av = elem
    K = re._constants
    if op in (K.LITERAL, K.NOT_LITERAL, K.IN, K.ANY, K.RANGE, K.CATEGORY):
        if state is None:
            state = _p.State()
        try:
            rx = _c.compile(_p.SubPattern(state, [elem]))
        except Exception:
            return frozenset(_SAMPLE_CHARS)   # unknown -> overlap everything
        return frozenset(ch for ch in _SAMPLE_CHARS if rx.match(ch))
    return None


def _seq_first_charset(seq, state=None) -> tuple[frozenset, bool]:
    """(union of chars the sequence can start with, can_match_empty) over
    the sampled alphabet; overapproximates."""
    K = re._constants
    first: set = set()
    for op, av in seq:
        cs = _charset((op, av), state)
        if cs is not None:
            first |= cs
            return frozenset(first), False
        if op in _REPEATS:
            lo, hi, body = av
            f, e = _seq_first_charset(body, state)
            first |= f
            if lo > 0 and not e:
                return frozenset(first), False
        elif op is K.BRANCH:
            any_empty = False
            for alt in av[1]:
                f, e = _seq_first_charset(alt, state)
                first |= f
                any_empty = any_empty or e
            if not any_empty:
                return frozenset(first), False
        elif op is K.SUBPATTERN:
            f, e = _seq_first_charset(av[3], state)
            first |= f
            if not e:
                return frozenset(first), False
        elif op in (K.ASSERT, K.ASSERT_NOT, K.AT):
            continue   # zero-width
        elif op is K.ATOMIC_GROUP:
            f, e = _seq_first_charset(av, state)
            first |= f
            if not e:
                return frozenset(first), False
        else:
            # GROUPREF and friends: unknown -> everything, non-empty
            return frozenset(_SAMPLE_CHARS), False
    return frozenset(first), True


def _seq_all_charset(seq, state=None) -> frozenset:
    """Union of ALL sampled chars any part of the sequence can consume
    (overapproximation of the language's alphabet)."""
    K = re._constants
    out: set = set()
    for op, av in seq:
        cs = _charset((op, av), state)
        if cs is not None:
            out |= cs
        elif op in _REPEATS:
            out |= _seq_all_charset(av[2], state)
        elif op is K.BRANCH:
            for alt in av[1]:
                out |= _seq_all_charset(alt, state)
        elif op is K.SUBPATTERN:
            out |= _seq_all_charset(av[3], state)
        elif op in (K.ASSERT, K.ASSERT_NOT, K.AT):
            continue
        elif op is K.ATOMIC_GROUP:
            out |= _seq_all_charset(av, state)
        else:
            out |= set(_SAMPLE_CHARS)
    return frozenset(out)


_REPEATS: tuple = ()   # filled below once re._constants is importable


def _init_repeats():
    global _REPEATS
    if _REPEATS:
        return
    K = re._constants
    reps = [K.MAX_REPEAT, K.MIN_REPEAT]
    if hasattr(K, "POSSESSIVE_REPEAT"):
        reps.append(K.POSSESSIVE_REPEAT)
    _REPEATS = tuple(reps)


def _re_linear_safe(pattern: str) -> bool:
    """True when python-re can match ``pattern`` without risking
    catastrophic backtracking.

    RE2 (the primary grok engine) is linear on every pattern; the python-re
    participation twin is a BACKTRACKING engine, and grok library patterns
    like URIPROTO's ``[A-Za-z](?:[A-Za-z0-9+.-]+)+`` are ``(X+)+`` shapes
    that go exponential on non-matching rows (a single panw threat URL row
    wedges the worker — re holds the GIL for the entire C-level match, so
    not even a watchdog thread can run).  Static screening, conservative by
    construction; a False only disables the ES empty-vs-unset refinement
    (falls back to the RE2-only participation proxy), never the match
    itself.  Rules, per repeat R(lo, hi>1, body):

    - an alternation inside R is safe only if its alternatives have
      pairwise-disjoint FIRST sets and none matches empty (``(?:.|\\n)*``
      = GREEDYDATA is safe; ``(a|a)*`` is not) — disjoint alternatives
      give the engine at most one viable branch per position;
    - a nested flexible repeat (hi>1) inside R is safe only if body also
      contains a MANDATORY single-char element (delimiter) whose char set
      is disjoint from everything the nested repeat can consume
      (``(?:[0-9A-Fa-f]{1,4}:){7}`` and JAVACLASS's
      ``(?:[a-z$_][a-z$_0-9]*\\.)*`` are safe — iteration boundaries are
      pinned by the delimiter; URIPROTO's ``(?:[A-Za-z0-9+.-]+)+`` has no
      delimiter and is rejected).

    Char classes are approximated over a sampled alphabet (ASCII+Latin-1
    plus multilingual probes), overapproximating toward "overlap", i.e.
    toward rejection."""
    _init_repeats()
    K = re._constants
    try:
        tree = re._parser.parse(pattern)
    except Exception:
        return False

    state = tree.state

    def mandatory_delims(seq):
        """Charsets of mandatory single-char elements along seq's spine
        (descending lo>=1 repeats and subpatterns).  A delimiter sourced
        from inside a flexible repeat overlaps that repeat's own charset,
        so self-delimiters never qualify downstream."""
        out = []
        for op, av in seq:
            cs = _charset((op, av), state)
            if cs is not None:
                out.append(cs)
            elif op in _REPEATS and av[0] >= 1:
                out.extend(mandatory_delims(av[2]))
            elif op is K.SUBPATTERN:
                out.extend(mandatory_delims(av[3]))
        return out

    def flexible_repeats(seq):
        """All repeats with hi>1 at any depth of seq (returned as av)."""
        found = []
        for op, av in seq:
            if op in _REPEATS:
                hi = av[1]
                if hi is K.MAXREPEAT or hi > 1:
                    found.append(av)
                found.extend(flexible_repeats(av[2]))
            elif op is K.BRANCH:
                for alt in av[1]:
                    found.extend(flexible_repeats(alt))
            elif op is K.SUBPATTERN:
                found.extend(flexible_repeats(av[3]))
            elif op is K.ATOMIC_GROUP:
                found.extend(flexible_repeats(av))
        return found

    def branch_safe(alts):
        firsts = []
        for alt in alts:
            f, can_empty = _seq_first_charset(alt, state)
            if can_empty:
                return False
            firsts.append(f)
        for i in range(len(firsts)):
            for j in range(i + 1, len(firsts)):
                if firsts[i] & firsts[j]:
                    return False
        return True

    def scan(seq, in_repeat):
        for op, av in seq:
            if op in _REPEATS:
                lo, hi, body = av
                iterating = hi is K.MAXREPEAT or hi > 1
                if iterating:
                    # every flexible repeat nested in THIS body needs a
                    # mandatory delimiter in the body disjoint from the
                    # chars it can consume — pins iteration boundaries
                    nested = flexible_repeats(body)
                    if nested:
                        delims = mandatory_delims(body)
                        for n_av in nested:
                            n_chars = _seq_all_charset(n_av[2], state)
                            if not any(not (d & n_chars) for d in delims):
                                return False
                if not scan(body, in_repeat or iterating):
                    return False
            elif op is K.BRANCH:
                if in_repeat and not branch_safe(av[1]):
                    return False
                for alt in av[1]:
                    if not scan(alt, in_repeat):
                        return False
            elif op is K.SUBPATTERN:
                if not scan(av[3], in_repeat):
                    return False
            elif op in (K.ASSERT, K.ASSERT_NOT):
                if not scan(av[1], in_repeat):
                    return False
            elif op is K.ATOMIC_GROUP:
                if not scan(av, in_repeat):
                    return False
        return True

    return scan(tree, False)


def _mandatory_groups(pattern: str) -> frozenset:
    """Named groups that participate on EVERY successful match: not nested
    under any lo==0 repeat, alternation branch, or lookaround.  For these,
    ES empty-vs-unset participation is decided by the match mask alone —
    no python-re twin needed (nginx ingress_controller's
    ``\\[%{DATA:...alternative_name}\\]`` keeps its participating "")."""
    _init_repeats()
    K = re._constants
    try:
        tree = re._parser.parse(pattern)
    except Exception:
        return frozenset()
    names = {num: name for name, num in tree.state.groupdict.items()}
    mand: set = set()

    def walk(seq, optional):
        for op, av in seq:
            if op in _REPEATS:
                lo, hi, body = av
                walk(body, optional or lo == 0)
            elif op is K.BRANCH:
                for alt in av[1]:
                    walk(alt, True)
            elif op is K.SUBPATTERN:
                g, _af, _df, body = av
                if g in names and not optional:
                    mand.add(names[g])
                walk(body, optional)
            elif op in (K.ASSERT, K.ASSERT_NOT):
                walk(av[1], True)
            elif op is K.ATOMIC_GROUP:
                walk(av, optional)

    walk(tree, False)
    return frozenset(mand)


@register("grok")
class GrokStage(Stage):
    """config: field (default "message"), patterns: [expr, ...] (first match
    wins, tried in order), pattern_definitions: {}, target_prefix (default
    "" -> bare field names), ignore_failure.  Failure appends
    ``_grok_parse_failure`` to log_flags (the ingest-pipeline convention)."""

    name = "grok"

    def __init__(self, config=None):
        super().__init__(config)
        c = self.config
        self.field = c.get("field", "message")
        exprs = c.get("patterns") or [c["pattern"]]
        defs = c.get("pattern_definitions")
        # ES grok is UNANCHORED (substring match); this engine's transcript
        # pipelines historically anchor, so the default stays True and
        # module-parity specs pass anchor: false explicitly
        anchor = bool(c.get("anchor", True))
        # ES-grok parity: non-participating optional groups leave the field
        # UNSET; RE2 extracts them as "" — the ingest compiler sets this
        self.empty_to_null = bool(c.get("empty_to_null", False))
        self.ignore_missing = bool(c.get("ignore_missing", False))
        self.compiled = []
        for e in exprs:
            pattern, meta = compile_grok(e, defs, anchor=anchor)
            # ES grok is Oniguruma; RE2 rejects lookarounds/backrefs.  Probe
            # the compiled pattern once and keep a Python-re engine for the
            # rare module pattern RE2 can't run (e.g. activemq's
            # "((?! \|).)*" negative-lookahead fields) — slower (per-row)
            # but exact, and compiled once per stage instance.
            try:
                pc.extract_regex(pa.array([], pa.large_string()), pattern)
                rx = None
            except pa.ArrowInvalid:
                rx = re.compile(pattern)
            # Under empty_to_null, an RE2 "" extraction is ambiguous between
            # participating-empty (ES sets "") and non-participating (ES
            # leaves unset).  Keep a python-re twin to re-verify ONLY the
            # rows that extracted a "" somewhere (see process()).
            # ... but ONLY for patterns python-re is provably linear-safe
            # on (see _re_linear_safe); otherwise keep the RE2-only proxy.
            mand = _mandatory_groups(pattern)
            rxv = None
            if rx is None and self.empty_to_null \
                    and (set(meta["fields"]) - mand) \
                    and _re_linear_safe(pattern):
                try:
                    rxv = re.compile(pattern)
                except re.error:
                    rxv = None
            self.compiled.append((pattern, meta, rx, rxv, mand))
        self.anchor = anchor
        prefix = c.get("target_prefix", "")
        self.prefix = prefix + "_" if prefix else ""
        self.ignore_failure = bool(c.get("ignore_failure", False))

    def input_columns(self):
        from ..event import FLAGS_COL
        # output columns are ALSO inputs: the merge keeps pre-existing
        # values on rows where a group didn't participate (ibmmq: the
        # Time() grok must see grok #1's header date to preserve it when
        # running under a mask via _apply_scatter)
        outs = {self.prefix + field_to_column(meta["fields"].get(g, g))
                for _, meta, _, _, _ in self.compiled
                for g in meta["fields"]}
        # the source field may itself be an output (grok into same field):
        # dedupe, or select() would duplicate the column in the subset
        outs -= {field_to_column(self.field), FLAGS_COL}
        return [field_to_column(self.field), FLAGS_COL, *sorted(outs)]

    @staticmethod
    def _verify_participation(structs, col, rxv, n, mand=frozenset()):
        """True per-group participation masks for an RE2 extraction.

        Only rows where the match succeeded AND some group extracted "" are
        ambiguous (participating-empty vs non-participating both extract ""
        under RE2); re-run just those rows through the python-re twin.  Rows
        with only non-empty captures participate trivially."""
        valid = pc.is_valid(structs)
        groups = [f.name for f in structs.type]
        empty_any = None
        for g in groups:
            if g in mand:   # participation decided by the match mask
                continue
            e = pc.and_(valid, pc.equal(
                pc.fill_null(pc.struct_field(structs, g), ""), ""))
            empty_any = e if empty_any is None else pc.or_(empty_any, e)
        if empty_any is None or not (pc.any(empty_any).as_py() or False):
            return None
        import numpy as np
        idx = np.nonzero(empty_any.to_numpy(zero_copy_only=False))[0]
        part = {g: np.ones(n, dtype=bool) for g in groups}
        col_py = col.to_pylist()
        for i in idx:
            m = rxv.search(col_py[i])
            for g in groups:
                part[g][i] = m is not None and m.group(g) is not None
        return {g: pa.array(part[g]) for g in groups}

    def process(self, batch):
        cname = field_to_column(self.field)
        if cname not in batch.column_names:
            # absent column == every event missing the field: no-op when
            # ignore_missing (ES grok semantics), error otherwise
            if self.ignore_missing:
                return batch
            return set_error(batch, pa.array([True] * len(batch)),
                             f"field [{self.field}] not present as part of "
                             "path [" + self.field + "]")
        col = batch.column(cname)
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            # A duplicate-capture column is uniformly list-typed in the
            # Arrow model, but ES sees a scalar on rows where only one
            # group participated and an array elsewhere.  ES grok throws on
            # an array value (document untouched under ignore_failure) and
            # parses the scalar rows normally: unwrap 1-element lists,
            # treat multi-element rows like skipped/null input.
            rows = col.to_pylist()
            multi = [isinstance(r, list) and len(r) > 1 for r in rows]
            if all(multi):
                if self.ignore_failure:
                    return batch
                return set_error(batch, pa.array([True] * len(batch)),
                                 f"field [{self.field}] is an array")
            col = pa.array(
                [r[0] if isinstance(r, list) and len(r) == 1 else None
                 for r in rows], pa.string())
        input_null = pc.is_null(col)
        col = pc.fill_null(pc.cast(col, pa.large_string()), "")
        n = len(batch)
        remaining = pa.array([True] * n, pa.bool_())
        # ES combines multiple patterns into ONE alternation regex
        # (GrokProcessor.combinePatterns), so under unanchored (substring)
        # matching the pattern whose match STARTS EARLIEST in the string
        # wins; declaration order only breaks position ties.  aws/elb: a v2
        # ALB line is "<type> " + a classic HTTP log + a tail — the classic
        # pattern matches at offset 5, the v2 pattern at offset 0 and must
        # win.  Sequential first-pattern-wins is only equivalent when
        # patterns are anchored.
        winner = None
        if not self.anchor and len(self.compiled) > 1:
            import numpy as np
            sentinel = np.iinfo(np.int64).max
            winner = np.full(n, -1, dtype=np.int64)
            best = np.full(n, sentinel, dtype=np.int64)
            # a row whose best start is 0 cannot be beaten (ties go to the
            # lowest pattern index), so later patterns only scan the
            # remainder — near-free when pattern 1 matches at offset 0.
            # Fast path: one ANCHORED match of pattern 1 settles those rows
            # without a positional find (the common log-line case).
            active = np.ones(n, dtype=bool)
            p1, _m1, rx1, _v1, _d1 = self.compiled[0]
            try:
                if rx1 is None:
                    at0 = pc.match_substring_regex(
                        col, pattern="^(?:" + p1 + ")")
                    at0 = pc.fill_null(at0, False).to_numpy(
                        zero_copy_only=False)
                else:
                    at0 = np.fromiter(
                        (rx1.match(v) is not None for v in col.to_pylist()),
                        dtype=bool, count=n)
                winner[at0] = 0
                best[at0] = 0
                active &= ~at0
            except pa.ArrowInvalid:
                pass   # pattern unsuitable for the anchored probe
            for pi, (pattern, _meta, rx, _rxv, _mand) in \
                    enumerate(self.compiled):
                idx = np.nonzero(active)[0]
                if idx.size == 0:
                    break
                sub = col if idx.size == n else col.take(pa.array(idx))
                if rx is None:
                    s = pc.find_substring_regex(sub, pattern=pattern)
                    s = pc.fill_null(s, -1).to_numpy(zero_copy_only=False)
                    s = s.astype(np.int64)
                else:
                    s = np.fromiter(
                        ((m.start() if (m := rx.search(v)) is not None
                          else -1) for v in sub.to_pylist()),
                        dtype=np.int64, count=idx.size)
                s = np.where(s < 0, sentinel, s)
                better = s < best[idx]
                upd = idx[better]
                winner[upd] = pi
                best[upd] = s[better]
                active[idx[best[idx] == 0]] = False
        out_cols: dict[str, pa.Array] = {}
        # rows actually produced per column (ok-mask union over the
        # patterns that contain the group): a row matched by a pattern
        # WITHOUT the group must keep any pre-existing column value, like
        # ES grok, instead of being overwritten with null
        col_masks: dict[str, pa.Array] = {}
        part_masks: dict[str, pa.Array] = {}
        dup_caps: dict[str, list[pa.Array]] = {}
        matched_any = pa.array([False] * n, pa.bool_())
        for pi, (pattern, meta, rx, rxv, mand) in enumerate(self.compiled):
            parts = None
            if rx is None:
                structs = pc.extract_regex(col, pattern)
                if rxv is not None:
                    parts = self._verify_participation(
                        structs, col, rxv, n, mand)
            else:
                # Python-re fallback: same struct shape as extract_regex
                # (non-participating groups as "", null = no match), plus a
                # true participation mask per group — re distinguishes a
                # participating-empty capture ('') from a non-participating
                # one (None), which RE2's extract_regex cannot.  ES grok
                # (joni) SETS "" for participating-empty groups and leaves
                # non-participating ones unset (es slowlog routing[],).
                groups = list(rx.groupindex)
                vals_by_group: dict[str, list] = {g: [] for g in groups}
                part_by_group: dict[str, list] = {g: [] for g in groups}
                valid = []
                for v in col.to_pylist():
                    m = rx.search(v) if v is not None else None
                    valid.append(m is not None)
                    for g in groups:
                        gv = m.group(g) if m is not None else None
                        vals_by_group[g].append(
                            (gv or "") if m is not None else None)
                        part_by_group[g].append(
                            m is not None and gv is not None)
                mask = pa.array([not b for b in valid], pa.bool_())
                structs = pa.StructArray.from_arrays(
                    [pa.array(vals_by_group[g], pa.string()) for g in groups],
                    names=groups, mask=mask)
                parts = {g: pa.array(part_by_group[g], pa.bool_())
                         for g in groups}
            # a null input never matches (the "" fill is storage, not data):
            # NOZONEIP-style empty-capable patterns must not fabricate
            # participating-empty captures on rows missing the field (iis)
            ok = pc.and_(pc.and_(pc.is_valid(structs), remaining),
                         pc.invert(input_null))
            if winner is not None:
                ok = pc.and_(ok, pa.array(winner == pi))
            if (pc.sum(ok).as_py() or 0) == 0:
                continue
            for f in structs.type:
                group = f.name
                field_name = meta["fields"].get(group, group)
                out_name = self.prefix + field_to_column(field_name)
                vals = pc.if_else(ok, pc.struct_field(structs, group),
                                  pa.nulls(n, pa.string()))
                # rows where the group truly participated this pattern; on
                # the RE2 path participation is unknowable, so a non-empty
                # capture is the (conservative) proxy
                if group in mand:
                    raw_part = ok   # mandatory: participates whenever matched
                elif parts is not None:
                    raw_part = pc.and_(ok, parts[group])
                else:
                    raw_part = pc.and_(ok, pc.invert(
                        pc.equal(pc.fill_null(vals, ""), "")))
                if self.empty_to_null:
                    # unset only NON-participating empties — a participating
                    # empty capture stays "" (ES grok sets it)
                    vals = pc.if_else(
                        pc.and_(pc.equal(pc.fill_null(vals, ""), ""),
                                pc.invert(raw_part)),
                        pa.nulls(n, pa.string()), vals)
                typ = meta["types"].get(group)
                if typ in ("int", "long", "float", "double"):
                    # optional non-participating groups extract as "" -> null
                    vals = pc.if_else(pc.equal(pc.fill_null(vals, ""), ""),
                                      pa.nulls(n, pa.string()), vals)
                    target = pa.int64() if typ in ("int", "long") else pa.float64()
                    try:
                        vals = pc.cast(vals, target, safe=False)
                    except pa.ArrowInvalid:
                        conv = []
                        for v in vals.to_pylist():
                            try:
                                conv.append(int(v) if typ in ("int", "long")
                                            else float(v))
                            except (TypeError, ValueError):
                                conv.append(None)
                        vals = pa.array(conv, target)
                if out_name in out_cols:
                    dup_caps.setdefault(
                        out_name,
                        [pc.cast(out_cols[out_name], pa.string())]
                    ).append(pc.cast(vals, pa.string()))
                    prev, cur = out_cols[out_name], vals
                    if prev.type != cur.type:
                        # duplicate field captured by groups with different
                        # types (mysql slowlog Thread_id long/untyped):
                        # merge in string space, first non-null wins
                        prev = pc.cast(prev, pa.string())
                        cur = pc.cast(cur, pa.string())
                    # within ONE pattern a duplicated field appears in
                    # several alternation branches (iptables event.action);
                    # RE2 extracts non-participating groups as "" while ES
                    # grok leaves the field unset — treat an empty prev as
                    # missing when a later duplicate holds a real value
                    if pa.types.is_string(prev.type) or \
                            pa.types.is_large_string(prev.type):
                        # fill_null first: pc.or_ is non-Kleene, a null prev
                        # would poison the mask
                        prev_missing = pc.equal(pc.fill_null(prev, ""), "")
                    else:
                        prev_missing = pc.is_null(prev)
                    take_cur = pc.and_(prev_missing, pc.is_valid(cur))
                    out_cols[out_name] = pc.if_else(take_cur, cur, prev)
                else:
                    out_cols[out_name] = vals
                col_masks[out_name] = ok if out_name not in col_masks \
                    else pc.or_(col_masks[out_name], ok)
                part_masks[out_name] = raw_part \
                    if out_name not in part_masks \
                    else pc.or_(part_masks[out_name], raw_part)
            matched_any = pc.or_(matched_any, ok)
            remaining = pc.and_(remaining, pc.invert(ok))
        # ES grok APPENDS when several groups for the same field all
        # participate in a row (iis pattern "[%{IPORHOST:destination.address}]
        # (http://%{IPORHOST:destination.address})" -> a 2-element array).
        # The scalar first-non-empty merge above covers the common
        # mutually-exclusive-branch case; only when some row truly captured
        # >=2 non-empty values does the column become list<string>.
        for name, caps in dup_caps.items():
            nonempty = [pc.invert(pc.equal(pc.fill_null(a, ""), ""))
                        for a in caps]
            counts = nonempty[0]
            counts = pc.cast(counts, pa.int32())
            for m in nonempty[1:]:
                counts = pc.add(counts, pc.cast(m, pa.int32()))
            if (pc.max(counts).as_py() or 0) < 2:
                continue
            rows = [a.to_pylist() for a in caps]
            lists = []
            for i in range(n):
                vals_i = [r[i] for r in rows if r[i]]
                lists.append(vals_i if vals_i else None)
            out_cols[name] = pa.array(lists, pa.list_(pa.string()))
        for name, vals in out_cols.items():
            if name in batch.column_names:
                # pre-existing values survive wherever this column did not
                # participate: null-input rows (ignore_missing no-op) AND
                # rows matched by a pattern lacking the group — ES grok
                # writes only participating captures
                old = batch.column(name)
                if old.type != vals.type:
                    # type conflict between a typed grok group and an
                    # existing column (es slowlog v8: json total_hits is the
                    # STRING "0 hits", the grok group is :int).  ES keeps
                    # per-document types; columnar unification: all-null new
                    # captures adopt the old type, otherwise try numeric and
                    # degrade to string space (goldens compare values).
                    if pa.types.is_null(old.type):
                        old = pc.cast(old, vals.type)
                    elif (pc.count(vals).as_py() or 0) == 0:
                        vals = pc.cast(vals, old.type)
                    else:
                        try:
                            old = pc.cast(old, vals.type, safe=False)
                        except (pa.ArrowInvalid,
                                pa.ArrowNotImplementedError):
                            old = pc.cast(old, pa.string())
                            if pa.types.is_list(vals.type) or \
                                    pa.types.is_large_list(vals.type):
                                # duplicate-capture list<string> vs an old
                                # string column: cast(list->string) raises
                                # in Arrow — lift the old scalars to
                                # 1-element lists instead
                                old = pa.array(
                                    [None if v is None else [v]
                                     for v in old.to_pylist()],
                                    vals.type)
                            else:
                                vals = pc.cast(vals, pa.string())
                produced = col_masks.get(name)
                keep_old = pc.or_(input_null, pc.invert(
                    pc.fill_null(produced, False))) if produced is not None \
                    else pa.array([True] * n, pa.bool_())
                # ES grok never writes null: a row matched by a pattern whose
                # instance of this group did NOT participate keeps the
                # pre-existing value (es slowlog: the message re-grok must
                # not blank took_millis-derived duration)
                keep_old = pc.or_(keep_old, pc.and_(
                    pc.is_null(vals), pc.is_valid(old)))
                if pa.types.is_string(vals.type) or \
                        pa.types.is_large_string(vals.type):
                    # a non-participating optional group extracts as "" —
                    # ES grok leaves the pre-existing value in place
                    # (ibmmq: the Time() re-grok must not blank the
                    # header date on rows without Time()); a PARTICIPATING
                    # "" capture does overwrite (re-fallback patterns track
                    # true participation)
                    empty_new = pc.equal(pc.fill_null(vals, ""), "")
                    not_part = pc.invert(pc.fill_null(
                        part_masks.get(name,
                                       pa.nulls(n, pa.bool_())), False))
                    keep_old = pc.or_(keep_old, pc.and_(
                        pc.and_(empty_new, not_part), pc.is_valid(old)))
                vals = pc.if_else(keep_old, old, vals)
            batch = set_column(batch, name, vals)
        failed = pc.and_(pc.invert(matched_any), pc.invert(input_null))
        if (pc.sum(failed).as_py() or 0) > 0:
            # failure_flag: a per-processor marker the ingest compiler uses
            # to gate compiled ES on_failure handlers onto exactly the rows
            # THIS grok missed (kafka component -> "unknown")
            batch = add_flag(batch, failed,
                             self.config.get("failure_flag",
                                             "_grok_parse_failure"))
            if not self.ignore_failure:
                batch = set_error(batch, failed,
                                  "Provided Grok expressions do not match field value")
        return batch
