"""Network-derived processors: community_id, registered_domain,
add_network_direction.

- community_id (communityid/communityid.go:38): the public Community ID
  flow-hash spec v1 — seed(BE16) + ordered endpoints (ip packed, proto,
  pad, ports BE16) -> sha1 -> "1:" + base64.  Fields read (flattened):
  source_ip, source_port, destination_ip, destination_port,
  network_transport (name) / network_iana_number.
- registered_domain (registered_domain/registered_domain.go:41): eTLD+1
  against a bundled public-suffix SUBSET (production swaps in the full
  Mozilla PSL — same lookup semantics: longest matching suffix wins,
  registered domain = suffix + one label).
- add_network_direction (actions/add_network_direction.go:34): classify
  source/destination IPs against ``internal_networks`` CIDRs ->
  inbound/outbound/internal/external.
"""

from __future__ import annotations

import base64
import hashlib
import ipaddress
import socket
import struct

import pyarrow as pa
import pyarrow.compute as pc

from ..event import field_to_column, set_column, set_error
from .base import Stage, register

_PROTO_NUM = {"icmp": 1, "igmp": 2, "tcp": 6, "udp": 17, "gre": 47,
              "icmp6": 58, "icmp-ipv6": 58, "icmpv6": 58, "ipv6-icmp": 58,
              "sctp": 132}


# ICMP type -> counter-type equivalence (Community ID spec; the reference
# substitutes icmp type/code for the port pair — communityid.go:168-176).
_ICMP4_EQUIV = {8: 0, 0: 8, 13: 14, 14: 13, 15: 16, 16: 15,
                10: 9, 9: 10, 17: 18, 18: 17}
_ICMP6_EQUIV = {128: 129, 129: 128, 130: 131, 131: 130, 133: 134, 134: 133,
                135: 136, 136: 135, 139: 140, 140: 139, 144: 145, 145: 144}


def _icmp_ports(proto: int, itype: int, icode: int):
    """Return (sport, dport, one_way) for ICMP flows per the spec: the type
    and its counter-type act as the port pair; unknown types use (type, code)
    and mark the flow one-way (endpoints never reordered)."""
    table = _ICMP4_EQUIV if proto == 1 else _ICMP6_EQUIV
    equiv = table.get(itype)
    if equiv is None:
        return itype, icode, True
    return itype, equiv, False


def _packed_addr(v) -> bytes | None:
    """ipaddress.ip_address(v).packed with a manual fast path for plain
    dotted-quad strings (the overwhelmingly common case in flow logs;
    IPv4Address construction costs ~6 µs/call).  Validation matches
    ipaddress strictness exactly: ASCII digits only, no leading zeros,
    octets <= 255 — anything else (IPv6, ints, invalid) takes the stdlib
    path or returns None where ip_address would raise."""
    if type(v) is str and ":" not in v:
        parts = v.split(".")
        if len(parts) != 4:
            return None
        out = bytearray(4)
        for i, p in enumerate(parts):
            if (not p.isdigit() or not p.isascii() or len(p) > 3
                    or (len(p) > 1 and p[0] == "0")):
                return None
            n = int(p)
            if n > 255:
                return None
            out[i] = n
        return bytes(out)
    try:
        return ipaddress.ip_address(v).packed
    except (ValueError, TypeError):
        return None


def community_id_v1(saddr: str, daddr: str, sport: int | None, dport: int | None,
                    proto: int, seed: int = 0,
                    icmp_type: int | None = None,
                    icmp_code: int | None = None) -> str | None:
    spk = _packed_addr(saddr)
    dpk = _packed_addr(daddr)
    if spk is None or dpk is None:
        return None
    one_way = False
    if proto in (1, 58):
        # beats hashes ICMP flows even without type/code, zero-valued
        # (communityid.go:167-171 "Return a flow even if the ICMP
        # type/code is unavailable" — the Flow's ICMP struct stays 0/0)
        sp, dp, one_way = _icmp_ports(proto, int(icmp_type or 0),
                                      int(icmp_code or 0))
        sp &= 0xFFFF
        dp &= 0xFFFF
    elif proto in (6, 17, 132):
        if sport is None or dport is None:
            # communityid.go:147-166: a MISSING port on a port-bearing
            # transport aborts the flow (no id) — hashing a fabricated 0
            # would mint ids no other Community-ID producer emits.  An
            # explicit 0 value still hashes (tryToUint accepts it).
            return None
        sp = int(sport) & 0xFFFF
        dp = int(dport) & 0xFFFF
    else:
        # flowhash/communityid.go:75-81: port bytes are written ONLY for
        # TCP/UDP/SCTP/ICMP — other protocols hash ips + proto + pad alone
        # (ports stay zero for the endpoint ordering)
        sp = dp = 0
    # order the endpoints: smaller (ip, port) first (skipped for one-way flows)
    if not one_way and (spk, sp) > (dpk, dp):
        spk, dpk, sp, dp = dpk, spk, dp, sp
    payload = struct.pack("!H", seed) + spk + dpk + \
        struct.pack("BB", proto & 0xFF, 0)
    if proto in (6, 17, 132, 1, 58):
        payload += struct.pack("!HH", sp, dp)
    return "1:" + base64.b64encode(hashlib.sha1(payload).digest()).decode()


@register("community_id")
class CommunityID(Stage):
    name = "community_id"

    def __init__(self, config=None):
        super().__init__(config)
        self.seed = int(self.config.get("seed", 0))
        self.target = self.config.get("target", "network_community_id")
        # ES ingest CommunityIdProcessor rejects ports outside 1-65535 for
        # port-bearing transports (panw NAT tuples with port 0 stay unset);
        # the Beats-native processor hashes whatever it is given
        self.strict_ports = bool(self.config.get("strict_ports", False))
        f = self.config.get("fields", {})
        self.f_sip = f.get("source_ip", "source.ip")
        self.f_dip = f.get("destination_ip", "destination.ip")
        self.f_sport = f.get("source_port", "source.port")
        self.f_dport = f.get("destination_port", "destination.port")
        self.f_trans = f.get("transport", "network.transport")
        self.f_iana = f.get("iana_number", "network.iana_number")
        self.f_itype = f.get("icmp_type", "icmp.type")
        self.f_icode = f.get("icmp_code", "icmp.code")

    def process(self, batch):
        def col(path):
            c = field_to_column(path)
            return batch.column(c).to_pylist() if c in batch.column_names \
                else [None] * len(batch)
        sips, dips = col(self.f_sip), col(self.f_dip)
        sps, dps = col(self.f_sport), col(self.f_dport)
        trans, iana = col(self.f_trans), col(self.f_iana)
        itypes, icodes = col(self.f_itype), col(self.f_icode)
        out = []
        for i in range(len(batch)):
            proto = None
            if trans[i]:
                proto = _PROTO_NUM.get(str(trans[i]).lower())
                if proto is None:
                    try:  # numeric transport strings (umbrella cloudfw "1")
                        proto = int(trans[i])
                    except (TypeError, ValueError):
                        proto = None
            if proto is None and iana[i] is not None:
                try:
                    proto = int(iana[i])
                except (TypeError, ValueError):
                    proto = None
            if proto is None or sips[i] is None or dips[i] is None:
                out.append(None)
                continue
            if self.strict_ports and proto in (6, 17, 132):
                try:
                    sp, dp = int(sps[i]), int(dps[i])
                except (TypeError, ValueError):
                    out.append(None)
                    continue
                if not (1 <= sp <= 65535 and 1 <= dp <= 65535):
                    out.append(None)
                    continue
            out.append(community_id_v1(sips[i], dips[i], sps[i], dps[i],
                                       proto, self.seed,
                                       icmp_type=itypes[i], icmp_code=icodes[i]))
        return set_column(batch, field_to_column(self.target),
                          pa.array(out, pa.string()))


# Bundled public-suffix subset (production: full Mozilla PSL, same semantics)
_SUFFIXES = {
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "ai", "dev", "app",
    "co", "de", "fr", "uk", "jp", "cn", "ru", "br", "in", "au", "ca", "es",
    "it", "nl", "se", "no", "ch", "at", "pl", "eu", "us", "info", "biz",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
    "github.io", "gitlab.io", "blogspot.com", "appspot.com", "herokuapp.com",
    "s3.amazonaws.com", "cloudfront.net",
}


def registered_domain(domain: str) -> str | None:
    """eTLD+1: longest matching public suffix + one label."""
    if not domain:
        return None
    labels = domain.lower().rstrip(".").split(".")
    for i in range(len(labels)):
        suffix = ".".join(labels[i:])
        if suffix in _SUFFIXES:
            if i == 0:
                return None  # the domain IS a public suffix
            return ".".join(labels[i - 1:])
    # unknown TLD: treat last label as the suffix (PSL '*' fallback rule)
    if len(labels) >= 2:
        return ".".join(labels[-2:])
    return None


@register("registered_domain")
class RegisteredDomain(Stage):
    """config: field, target_field, subdomain_field?, ignore_missing,
    ignore_failure."""

    name = "registered_domain"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config["field"]
        self.target = self.config.get("target_field", "registered_domain")
        # beats config names: target_subdomain_field / target_etld_field
        # (registered_domain/registered_domain.go config)
        self.subdomain_field = self.config.get(
            "target_subdomain_field", self.config.get("subdomain_field"))
        self.etld_field = self.config.get("target_etld_field")
        self.ignore_failure = bool(self.config.get("ignore_failure", True))

    def input_columns(self):
        return [field_to_column(self.field)]

    def process(self, batch):
        cname = field_to_column(self.field)
        if cname not in batch.column_names:
            return batch   # ignore_missing: absent source parses nothing
        col = batch.column(cname).combine_chunks()
        # every output is a pure function of the domain value, and domain
        # cardinality is tiny relative to rows at scale: compute per
        # DISTINCT value, scatter by dictionary indices (null in -> null out)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            enc = col.dictionary_encode()
            idx, rows = enc.indices, enc.dictionary.to_pylist()
        else:
            idx, rows = None, col.to_pylist()

        def scatter(data):
            arr = pa.array(data, pa.string())
            return arr.take(idx) if idx is not None else arr

        rd = [registered_domain(v) for v in rows]
        batch = set_column(batch, field_to_column(self.target), scatter(rd))
        if self.subdomain_field:
            subs = []
            for full, reg in zip(rows, rd):
                if full and reg and full.lower().rstrip(".") != reg \
                        and full.lower().rstrip(".").endswith("." + reg):
                    subs.append(full.lower().rstrip(".")[: -(len(reg) + 1)])
                else:
                    subs.append(None)
            batch = set_column(batch, field_to_column(self.subdomain_field),
                               scatter(subs))
        if self.etld_field:
            # the eTLD is the registered domain minus its first label
            etlds = [r.split(".", 1)[1] if r and "." in r else None
                     for r in rd]
            batch = set_column(batch, field_to_column(self.etld_field),
                               scatter(etlds))
        return batch


@register("add_network_direction")
class AddNetworkDirection(Stage):
    """config: source (field), destination (field), target, internal_networks
    (CIDRs / named ranges) — actions/add_network_direction.go:34."""

    name = "add_network_direction"

    def __init__(self, config=None):
        super().__init__(config)
        self.source = self.config.get("source", "source.ip")
        self.dest = self.config.get("destination", "destination.ip")
        self.target = self.config.get("target", "network_direction")
        # internal_networks_field: per-row CIDR list column (the ES ingest
        # network_direction processor shape — fortinet _temp.internal_networks)
        self.nets_field = self.config.get("internal_networks_field")
        nets = self.config.get("internal_networks", ["private", "loopback"])
        self.nets = self._parse_nets(nets)

    _NAMED = {"private": ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16",
                          "fd00::/8"],
              "loopback": ["127.0.0.0/8", "::1/128"]}

    @classmethod
    def _parse_nets(cls, nets):
        out = []
        for n in nets or []:
            for c in cls._NAMED.get(n, [n]):
                out.append(ipaddress.ip_network(c, strict=False))
        return out

    @staticmethod
    def _internal(ip, nets):
        try:
            addr = ipaddress.ip_address(ip)
        except (ValueError, TypeError):
            return None
        return any(addr in net for net in nets)

    def process(self, batch):
        s = batch.column(field_to_column(self.source)).to_pylist() \
            if field_to_column(self.source) in batch.column_names else [None] * len(batch)
        d = batch.column(field_to_column(self.dest)).to_pylist() \
            if field_to_column(self.dest) in batch.column_names else [None] * len(batch)
        rownets = None
        if self.nets_field is not None:
            col = field_to_column(self.nets_field)
            if col not in batch.column_names:
                return batch   # ignore_missing: skip when the field absent
            def _row_nets(v):
                # CIDRs here come from EVENT DATA: a malformed value fails
                # only its own row (ES fails per document), never the batch
                try:
                    return self._parse_nets(v if isinstance(v, list)
                                            else [v] if v else [])
                except ValueError:
                    return None
            rownets = [_row_nets(v) for v in batch.column(col).to_pylist()]
        out = []
        for i, (si, di) in enumerate(zip(s, d)):
            nets = rownets[i] if rownets is not None else self.nets
            if rownets is not None and not nets:
                out.append(None)
                continue
            ints, intd = self._internal(si, nets), self._internal(di, nets)
            if ints is None or intd is None:
                out.append(None)
            elif ints and intd:
                out.append("internal")
            elif ints:
                out.append("outbound")
            elif intd:
                out.append("inbound")
            else:
                out.append("external")
        merged = pa.array(out, pa.string())
        tcol = field_to_column(self.target)
        if tcol in batch.column_names:
            import pyarrow.compute as _pc
            old = batch.column(tcol)
            if not pa.types.is_null(old.type):
                # the processor writes only when a direction was determined
                # (add_network_direction.go PutValue on success)
                merged = _pc.if_else(_pc.is_valid(merged), merged,
                                     _pc.cast(old, pa.string()))
        return set_column(batch, tcol, merged)


@register("first_public_ip")
class FirstPublicIP(Stage):
    """Pick the first non-private IPv4 from a list<string> column, else the
    list's first element — the shared ``isPrivate`` painless script in
    nginx/access and nginx/ingress_controller ingest/pipeline.yml (both
    modules carry the identical script over their remote_ip_list).

    Vectorized: one ``extract_regex`` over the flattened values classifies
    private ranges (10/8, 127/8, 192.168/16, 172.16-31/16 — exactly the
    script's checks), then a per-segment ``np.minimum.reduceat`` picks the
    first public index (or the first element when all are private).  A token
    whose first two dot-separated fields aren't plain integers is public,
    matching the script's parseInt-throws -> false path on every value the
    surrounding grok (IP or WORD) can emit.

    config: field (list<string> source), target (default source.address).
    """

    name = "first_public_ip"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = field_to_column(self.config["field"])
        self.target = field_to_column(
            self.config.get("target", "source.address"))

    def process(self, batch):
        import numpy as np
        if self.field not in batch.column_names:
            return batch
        arr = batch.column(self.field).combine_chunks()
        if not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
            return batch
        n = len(batch)
        flat = pc.list_flatten(arr)
        m = len(flat)
        if m == 0:
            return batch
        parents = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
        # Integer.parseInt accepts at most 9 digits without throwing for the
        # values grok can emit; no-match => "not private" (script's catch)
        ext = pc.extract_regex(pc.cast(flat, pa.string()),
                               r"^(?P<a>\d{1,9})\.(?P<b>\d{1,9})")
        a = pc.cast(pc.struct_field(ext, "a"), pa.int64())
        b = pc.cast(pc.struct_field(ext, "b"), pa.int64())
        priv = pc.or_(
            pc.or_(pc.equal(a, 10), pc.equal(a, 127)),
            pc.or_(pc.and_(pc.equal(a, 192), pc.equal(b, 168)),
                   pc.and_(pc.equal(a, 172),
                           pc.and_(pc.greater_equal(b, 16),
                                   pc.less_equal(b, 31)))))
        priv_np = pc.fill_null(priv, False).to_numpy(zero_copy_only=False)
        idx = np.arange(m, dtype=np.int64)
        # first public index wins; +m pushes private entries behind every
        # public one within a segment, %m recovers the row-first fallback
        score = np.where(priv_np, idx + m, idx)
        starts = np.searchsorted(parents, np.arange(n + 1))
        nonempty = starts[:-1] < starts[1:]
        red = np.minimum.reduceat(score, np.minimum(starts[:-1], m - 1))
        picked = flat.take(pa.array(red % m, pa.int64()))
        sel = pa.array(nonempty)
        if self.target in batch.column_names and \
                not pa.types.is_null(batch.column(self.target).type):
            old = pc.cast(batch.column(self.target).combine_chunks(),
                          pa.string())
        else:
            old = pa.nulls(n, pa.string())
        return set_column(batch, self.target, pc.if_else(sel, picked, old))
