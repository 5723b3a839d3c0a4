"""Condition language compiled to vectorized Arrow boolean masks.

Replicates the reference condition engine (libbeat/conditions/conditions.go:30-41,
dispatch :55-101): ``equals`` (exact scalar), ``contains`` (substring), ``regexp``,
``range`` (gt/gte/lt/lte on numbers), ``has_fields``, ``network`` (CIDR), and the
combinators ``and`` / ``or`` / ``not``.  A config dict compiles once to a
:class:`Condition`; ``mask(batch)`` evaluates it per Arrow batch with
pyarrow.compute kernels (SURVEY.md §2.3 "Ray mapping").

Missing fields: every leaf condition evaluates to False for rows where the
field is absent/null (matching extractor misses in conditions/extractors.go),
except ``has_fields`` which is the explicit presence test.
"""

from __future__ import annotations

import ipaddress
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from .event import field_to_column

__all__ = ["Condition", "compile_condition"]


def _false(n: int):
    return pa.array([False] * n, pa.bool_())


def _col(batch: pa.Table, field: str):
    name = field_to_column(field)
    if name in batch.column_names:
        return batch.column(name)
    return None


def _nn(mask):
    """null -> False (Kleene logic surfaces nulls; Beats treats miss as False)."""
    return pc.fill_null(mask, False)


class Condition:
    def mask(self, batch: pa.Table):  # -> pa.BooleanArray / ChunkedArray
        raise NotImplementedError

    def __call__(self, batch: pa.Table):
        return self.mask(batch)


@dataclass
class Equals(Condition):
    field: str
    value: object

    def mask(self, batch):
        col = _col(batch, self.field)
        if col is None:
            return _false(len(batch))
        try:
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                return _nn(pc.equal(col, str(self.value)))
            if pa.types.is_boolean(col.type):
                if isinstance(self.value, str):
                    # painless strict typing: boolean vs string literal
                    # never matches (misp Orgc.local golden)
                    return _false(len(batch))
                return _nn(pc.equal(col, bool(self.value)))
            return _nn(pc.equal(col, self.value))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            return _false(len(batch))


@dataclass
class Contains(Condition):
    field: str
    value: str

    def mask(self, batch):
        col = _col(batch, self.field)
        if col is None:
            return _false(len(batch))
        t = col.type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            # painless List.contains(x): exact element membership
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            et = t.value_type
            if not (pa.types.is_string(et) or pa.types.is_large_string(et)):
                # list<struct>/list<list> elements can never equal a string
                # (pc.equal would raise ArrowNotImplementedError)
                return _false(len(batch))
            flat_hit = pc.equal(col.values, self.value)
            offs = col.offsets.to_pylist()
            hits = pc.fill_null(flat_hit, False).to_pylist()
            valid = pc.is_valid(col).to_pylist()
            out = [bool(valid[i]) and any(hits[offs[i]:offs[i + 1]])
                   for i in range(len(col))]
            return pa.array(out, pa.bool_())
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
            return _false(len(batch))
        return _nn(pc.match_substring(col, self.value))


@dataclass
class Regexp(Condition):
    field: str
    pattern: str

    def mask(self, batch):
        col = _col(batch, self.field)
        if col is None or not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            return _false(len(batch))
        return _nn(pc.match_substring_regex(col, self.pattern))


_RANGE_OPS = {"gt": pc.greater, "gte": pc.greater_equal, "lt": pc.less, "lte": pc.less_equal}
_LEN_OPS = {"eq": pc.equal, "neq": pc.not_equal, **_RANGE_OPS}


@dataclass
class Length(Condition):
    """List/string element-count comparison — the painless ``.length``
    idiom in module ingest conditions (e.g. zeek/ssl
    ``cert_chain_fuids?.length == 0``); no Beats-native analogue.
    Missing field / null value -> no match."""

    field: str
    bounds: dict  # {"eq": 0} / {"gt": 2} ...

    def mask(self, batch):
        col = _col(batch, self.field)
        if col is None:
            return _false(len(batch))
        t = col.type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            n = pc.list_value_length(col)
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            n = pc.utf8_length(col)
        else:
            return _false(len(batch))
        acc = None
        for op, v in self.bounds.items():
            m = _LEN_OPS[op](n, v)
            acc = m if acc is None else pc.and_kleene(acc, m)
        return _nn(acc) if acc is not None else _false(len(batch))


@dataclass
class FieldEquals(Condition):
    """Column-vs-column equality (painless ``ctx.a == ctx.b``): true where
    both values are equal OR both are null/absent (painless null == null)."""

    left: str
    right: str

    def mask(self, batch):
        n = len(batch)
        a, b = _col(batch, self.left), _col(batch, self.right)
        a_null = pc.is_null(a) if a is not None else pa.array([True] * n)
        b_null = pc.is_null(b) if b is not None else pa.array([True] * n)
        both_null = pc.and_(a_null, b_null)
        if a is None or b is None:
            return _nn(both_null)
        try:
            if a.type != b.type:
                a = pc.cast(a, pa.string())
                b = pc.cast(b, pa.string())
            eq = pc.fill_null(pc.equal(a, b), False)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                pa.ArrowTypeError):
            eq = _false(n)
        return _nn(pc.or_(eq, both_null))


@dataclass
class FieldCompare(Condition):
    """Column-vs-column ordering (painless ``ctx.a > ctx.b``, pensando dfw
    port-direction heuristics).  Painless NPEs on a null operand — the
    processor is skipped — so null on either side is False."""

    left: str
    right: str
    op: str   # lt / gt / lte / gte

    def mask(self, batch):
        n = len(batch)
        a, b = _col(batch, self.left), _col(batch, self.right)
        if a is None or b is None:
            return _false(n)
        try:
            if a.type != b.type:
                a = pc.cast(a, pa.float64(), safe=False)
                b = pc.cast(b, pa.float64(), safe=False)
            fn = {"lt": pc.less, "gt": pc.greater,
                  "lte": pc.less_equal, "gte": pc.greater_equal}[self.op]
            return _nn(pc.fill_null(fn(a, b), False))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                pa.ArrowTypeError):
            return _false(n)


@dataclass
class FieldContains(Condition):
    """Per-row membership: the list/string in ``field`` contains the value
    of ``value_field`` (painless ``a.contains(ctx.b)``, ftd zones)."""

    field: str
    value_field: str

    def mask(self, batch):
        n = len(batch)
        col, vcol = _col(batch, self.field), _col(batch, self.value_field)
        if col is None or vcol is None:
            return _false(n)
        vals = vcol.to_pylist()
        rows = col.to_pylist()
        out = []
        for r, v in zip(rows, vals):
            if r is None or v is None:
                out.append(False)
            elif isinstance(r, list):
                out.append(v in r)
            elif isinstance(r, str):
                out.append(str(v) in r)
            else:
                out.append(False)
        return pa.array(out, pa.bool_())


@dataclass
class ElementString(Condition):
    """True where the field is a NON-EMPTY list **of strings** — the
    painless ``x[0] instanceof String`` idiom (cisco amp mitre lists);
    list<struct> columns never match."""

    field: str

    def mask(self, batch):
        col = _col(batch, self.field)
        if col is None:
            return _false(len(batch))
        t = col.type
        if not (pa.types.is_list(t) or pa.types.is_large_list(t)):
            return _false(len(batch))
        if not (pa.types.is_string(t.value_type)
                or pa.types.is_large_string(t.value_type)):
            return _false(len(batch))
        return _nn(pc.greater(pc.list_value_length(col), 0))


@dataclass
class InstanceString(Condition):
    """True where the field's VALUE is a string — painless
    ``x instanceof String`` (crowdstrike digit-count date guards negate it
    over numeric timestamps)."""

    field: str

    def mask(self, batch):
        col = _col(batch, self.field)
        if col is None:
            return _false(len(batch))
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return _nn(pc.is_valid(col))
        if pa.types.is_list(t) or pa.types.is_large_list(t) or \
                pa.types.is_struct(t) or pa.types.is_null(t):
            return _false(len(batch))
        if t == pa.binary() or pa.types.is_integer(t) or \
                pa.types.is_floating(t) or pa.types.is_boolean(t) or \
                pa.types.is_timestamp(t):
            return _false(len(batch))
        # object-typed column: per-row check
        return pa.array([isinstance(v, str) for v in col.to_pylist()],
                        pa.bool_())


@dataclass
class Range(Condition):
    field: str
    bounds: dict  # {"gt": x, "lte": y, ...}

    def mask(self, batch):
        col = _col(batch, self.field)
        if col is None:
            return _false(len(batch))
        acc = None
        try:
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                # inside the try: one non-numeric string raises ArrowInvalid
                # (safe=False does not suppress parse errors) and painless
                # would throw -> condition False, processor skipped
                col = pc.cast(col, pa.float64(), safe=False)
            for op, val in self.bounds.items():
                m = _RANGE_OPS[op](col, val)
                acc = m if acc is None else pc.and_kleene(acc, m)
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
            # incomparable type (timestamp column vs a numeric bound after
            # an in-place date, crowdstrike digit-count guard): painless
            # would throw and the guarded processor be skipped
            return _false(len(batch))
        return _nn(acc) if acc is not None else _false(len(batch))


@dataclass
class HasFields(Condition):
    fields: list

    def mask(self, batch):
        n = len(batch)
        acc = pa.array([True] * n, pa.bool_())
        for f in self.fields:
            col = _col(batch, f)
            # flattened-map children: a container path is present on rows
            # where any `f_*` child is non-null, even when an exact column
            # also exists for OTHER rows' list/scalar values (misp Object
            # arrives as [] on some rows and {...} on others)
            from .event import field_to_column
            pref = field_to_column(f) + "_"
            kids = [c for c in batch.column_names if c.startswith(pref)]
            if col is None and not kids:
                return _false(n)
            present = _false(n) if col is None else pc.is_valid(col)
            for c in kids:
                present = pc.or_(present, pc.is_valid(batch.column(c)))
            acc = pc.and_(acc, present)
        return acc


@dataclass
class Network(Condition):
    field: str
    networks: list  # CIDR strings or named ranges

    _NAMED = {
        "loopback": ["127.0.0.0/8", "::1/128"],
        # fd00::/8, NOT fc00::/7: parity with the reference's privateIPv6
        # (conditions/network.go:39-42 pins IP fd00::, mask ff00... — the
        # lower half of the RFC 4193 ULA block is deliberately excluded)
        "private": ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16", "fd00::/8"],
        "public": [],  # complement — handled specially
        "unspecified": ["0.0.0.0/32", "::/128"],
    }

    def __post_init__(self):
        self._nets = []
        self._public = False
        for n in self.networks:
            if n in self._NAMED:
                if n == "public":
                    self._public = True
                else:
                    self._nets += [ipaddress.ip_network(c) for c in self._NAMED[n]]
            else:
                self._nets.append(ipaddress.ip_network(n, strict=False))

    def _match_one(self, v):
        if v is None:
            return False
        try:
            ip = ipaddress.ip_address(v)
        except ValueError:
            return False
        hit = any(ip in net for net in self._nets)
        if self._public:
            hit = hit or ip.is_global
        return hit

    def mask(self, batch):
        col = _col(batch, self.field)
        if col is None:
            return _false(len(batch))
        return pa.array([self._match_one(v) for v in col.to_pylist()], pa.bool_())


@dataclass
class And(Condition):
    parts: list

    def mask(self, batch):
        acc = None
        for p in self.parts:
            m = p.mask(batch)
            acc = m if acc is None else pc.and_(acc, m)
        return acc if acc is not None else pa.array([True] * len(batch), pa.bool_())


@dataclass
class Or(Condition):
    parts: list

    def mask(self, batch):
        acc = None
        for p in self.parts:
            m = p.mask(batch)
            acc = m if acc is None else pc.or_(acc, m)
        return acc if acc is not None else _false(len(batch))


@dataclass
class Not(Condition):
    part: Condition

    def mask(self, batch):
        return pc.invert(self.part.mask(batch))


class AlwaysTrue(Condition):
    def mask(self, batch):
        return pa.array([True] * len(batch), pa.bool_())


def compile_condition(cfg) -> Condition:
    """Compile a Beats ``when:`` config dict into a Condition.

    Accepts the YAML shape used under processors' ``when:`` keys
    (libbeat/conditions/conditions.go:55-101 NewCondition dispatch).
    """
    if cfg is None:
        return AlwaysTrue()
    if isinstance(cfg, Condition):
        return cfg
    if not isinstance(cfg, dict) or len(cfg) == 0:
        return AlwaysTrue()
    parts = []
    for key, val in cfg.items():
        if "." in key and key.split(".", 1)[0] in (
                "equals", "contains", "regexp", "range", "length",
                "network", "has_fields", "not", "and", "or"):
            # Beats YAML dotted flattening: equals.network.transport: icmp
            k0, rest = key.split(".", 1)
            key, val = k0, {rest: val}
        if key == "equals":
            parts += [Equals(f, v) for f, v in val.items()]
        elif key == "contains":
            parts += [Contains(f, v) for f, v in val.items()]
        elif key == "regexp":
            parts += [Regexp(f, v) for f, v in val.items()]
        elif key == "range":
            # {"field": {"gte": 1, "lt": 5}, ...} or flattened {"field.gte": 1}
            byfield: dict[str, dict] = {}
            for f, v in val.items():
                if isinstance(v, dict):
                    byfield.setdefault(f, {}).update(v)
                else:
                    base, op = f.rsplit(".", 1)
                    byfield.setdefault(base, {})[op] = v
            parts += [Range(f, b) for f, b in byfield.items()]
        elif key == "length":
            for f, v in val.items():
                parts.append(Length(f, v if isinstance(v, dict) else {"eq": v}))
        elif key == "element_string":
            parts.append(ElementString(val))
        elif key == "instance_string":
            parts.append(InstanceString(val))
        elif key == "field_equals":
            parts.append(FieldEquals(val[0], val[1]))
        elif key == "field_compare":
            parts.append(FieldCompare(val[0], val[1], val[2]))
        elif key == "field_contains":
            parts.append(FieldContains(val[0], val[1]))
        elif key == "has_fields":
            parts.append(HasFields(list(val) if isinstance(val, (list, tuple)) else [val]))
        elif key == "network":
            for f, nets in val.items():
                parts.append(Network(f, nets if isinstance(nets, list) else [nets]))
        elif key == "and":
            parts.append(And([compile_condition(c) for c in val]))
        elif key == "or":
            parts.append(Or([compile_condition(c) for c in val]))
        elif key == "not":
            parts.append(Not(compile_condition(val)))
        else:
            raise ValueError(f"unknown condition type: {key!r}")
    if len(parts) == 1:
        return parts[0]
    return And(parts)
