"""auditd log parser — Linux audit.log records -> ``auditd.log.*`` fields.

Reference: libbeat/reader/auditd/auditd.go:80-190 (node-prefix strip, inner
msg re-parse, AVC action/request, auid/ses raw preservation) delegating the
record parse to go-libaudit auparse.  This is a from-scratch Python
implementation of the same observable behavior, validated against the
reference's own golden files (tests/test_auditd.py runs
libbeat/reader/auditd/testdata/*.log against *-expected.json).

Normalizations implemented (the auparse subset exercised by the goldens):
header (record_type/sequence/timestamp), node prefix, outer + inner
``msg='...'`` key-value extraction with multi-word unquoted values,
``res``/``success`` -> ``result``, '?' placeholder drop, ``subj`` SELinux
context split, arch hex -> name, syscall number -> name (x86_64/i386
tables), negative ``exit`` -> errno name, SELinux AVC ``seresult``/
``seperms`` + ``avc.action``/``avc.request``, hex-encoded value decode
(EXECVE args, cmd, proctitle, data, path, dir), SOCKADDR ``saddr`` struct
decode (ipv4/ipv6/unix), audit rule ``key`` unwrap.

Because the key set varies per record type, the stage emits the parsed map
as ONE JSON string column (``auditd_log``) plus stable typed columns
(``auditd_record_type``, ``auditd_sequence``, ``auditd_ts``) — per-type
schemas stay stable across blocks (columnar constraint).
"""

from __future__ import annotations

import binascii
import errno as _errno
import json
import re

import pyarrow as pa

from ..event import field_to_column, set_column, set_error
from .base import Stage, register

_HEADER = re.compile(
    r"^type=(?P<type>\S+)\s+msg=audit\((?P<sec>\d+)\.(?P<ms>\d+):(?P<seq>\d+)\):\s*(?P<body>.*)$",
    re.S)
_OUTER_KV = re.compile(r"""([A-Za-z0-9_-]+)=("[^"]*"|'[^']*'|\S+)""")
_INNER_MSG = re.compile(r"\bmsg='([^']*)'")
_INNER_KV = re.compile(r"([a-z][a-z0-9_-]*)=(.*?)(?=\s+[a-z][a-z0-9_-]+=|\s*$)")
_AVC = re.compile(r"\bavc:\s+(\w+)\s+\{\s+([^}]+?)\s+\}\s+for\s+")
_HEX = re.compile(r"^[0-9A-F]+$")

_ARCH = {"c000003e": "x86_64", "40000003": "i386", "c00000b7": "aarch64",
         "40000028": "arm", "80000016": "ppc64", "c0000015": "ppc64le",
         "80000003": "s390", "80000016_": "s390x"}

# x86_64 syscall table, 0-63 + the common tail (public Linux ABI)
_SYSCALLS_X86_64 = {
    0: "read", 1: "write", 2: "open", 3: "close", 4: "stat", 5: "fstat",
    6: "lstat", 7: "poll", 8: "lseek", 9: "mmap", 10: "mprotect",
    11: "munmap", 12: "brk", 13: "rt_sigaction", 14: "rt_sigprocmask",
    15: "rt_sigreturn", 16: "ioctl", 17: "pread64", 18: "pwrite64",
    19: "readv", 20: "writev", 21: "access", 22: "pipe", 23: "select",
    24: "sched_yield", 25: "mremap", 26: "msync", 27: "mincore",
    28: "madvise", 29: "shmget", 30: "shmat", 31: "shmctl", 32: "dup",
    33: "dup2", 34: "pause", 35: "nanosleep", 36: "getitimer", 37: "alarm",
    38: "setitimer", 39: "getpid", 40: "sendfile", 41: "socket",
    42: "connect", 43: "accept", 44: "sendto", 45: "recvfrom",
    46: "sendmsg", 47: "recvmsg", 48: "shutdown", 49: "bind", 50: "listen",
    51: "getsockname", 52: "getpeername", 53: "socketpair",
    54: "setsockopt", 55: "getsockopt", 56: "clone", 57: "fork",
    58: "vfork", 59: "execve", 60: "exit", 61: "wait4", 62: "kill",
    63: "uname", 78: "getdents", 80: "chdir", 82: "rename", 83: "mkdir",
    84: "rmdir", 85: "creat", 86: "link", 87: "unlink", 88: "symlink",
    89: "readlink", 90: "chmod", 92: "chown", 93: "fchown", 94: "lchown",
    95: "umask", 101: "ptrace", 105: "setuid", 106: "setgid",
    157: "prctl", 159: "adjtimex", 231: "exit_group", 257: "openat",
    259: "mknodat", 260: "fchownat", 263: "unlinkat", 264: "renameat",
    266: "symlinkat", 268: "fchmodat", 280: "utimensat", 288: "accept4",
    316: "renameat2", 322: "execveat", 437: "openat2",
}
_SYSCALLS_I386 = {11: "execve", 102: "socketcall", 1: "exit", 2: "fork",
                  3: "read", 4: "write", 5: "open", 6: "close"}

_HEX_DECODE_KEYS = {"cmd", "proctitle", "data", "path", "dir", "vm",
                    "exe", "comm", "acct", "old-chardev", "new-chardev"}


def _maybe_hex_decode(val: str, require_printable: bool = False) -> str:
    if len(val) >= 2 and len(val) % 2 == 0 and _HEX.match(val):
        try:
            raw = binascii.unhexlify(val)
            txt = raw.decode("utf-8")
            # NUL separates argv words (proctitle)
            txt = txt.rstrip("\x00").replace("\x00", " ")
            if require_printable and not txt.isprintable():
                return val          # short numeric-looking EXECVE args
            return txt
        except (binascii.Error, UnicodeDecodeError):
            return val
    return val


def _decode_sockaddr(hexstr: str) -> dict:
    try:
        raw = binascii.unhexlify(hexstr)
    except (binascii.Error, ValueError):
        return {"saddr": hexstr}
    if len(raw) < 2:
        return {"saddr": hexstr}
    family = raw[0] | (raw[1] << 8)  # little-endian sa_family_t
    if family == 2 and len(raw) >= 8:      # AF_INET
        port = (raw[2] << 8) | raw[3]
        addr = ".".join(str(b) for b in raw[4:8])
        return {"family": "ipv4", "addr": addr, "port": str(port)}
    if family == 10 and len(raw) >= 24:    # AF_INET6
        port = (raw[2] << 8) | raw[3]
        groups = [f"{(raw[8 + i] << 8) | raw[9 + i]:x}" for i in range(0, 16, 2)]
        return {"family": "ipv6", "addr": ":".join(groups), "port": str(port)}
    if family == 1:                        # AF_UNIX
        path = raw[2:].split(b"\x00")[0].decode("utf-8", "replace")
        return {"family": "unix", "path": path}
    return {"family": str(family), "saddr": hexstr}


def _strip_quotes(v: str) -> str:
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
        return v[1:-1]
    return v


def parse_auditd_line(line: str) -> dict | None:
    """One audit.log line -> the ``auditd.log`` field map (auditd.go:80-168
    semantics).  Returns None when the line is not an audit record."""
    node = None
    if line.startswith("node="):
        sp = line.find(" ")
        if sp > 0:
            node = line[5:sp]
            line = line[sp + 1:]
    m = _HEADER.match(line.strip())
    if not m:
        return None
    record_type = m.group("type")
    out: dict = {"record_type": record_type, "sequence": m.group("seq")}
    if node:
        out["node"] = node
    ts = float(m.group("sec")) + float("0." + m.group("ms"))
    body = m.group("body")
    # LOGIN records: 'old auid=' / 'new ses=' space-separated qualifiers
    body = re.sub(r"\b(old|new) (auid|ses)=", r"\1_\2=", body)

    avc = _AVC.search(body)
    for k, v in _OUTER_KV.findall(body):
        quoted = v[:1] in "\"'"
        v = _strip_quotes(v)
        if record_type == "EXECVE" and re.fullmatch(r"a\d+", k) and not quoted:
            v = _maybe_hex_decode(v, require_printable=True)
        elif k in _HEX_DECODE_KEYS and not quoted:
            v = _maybe_hex_decode(v)
        out[k] = v

    # EXECVE: argc=N requires args a0..a(N-1); a missing arg fails the whole
    # data extraction (auparse), keeping only the header fields + error
    if record_type == "EXECVE":
        has_len_form = any(re.fullmatch(r"a\d+_len", k) for k in out) or \
            re.search(r"\ba\d+\[", body) is not None
        if has_len_form and "argc" not in out:
            return {"record_type": record_type, "sequence": out["sequence"],
                    "_ts": ts,
                    "_error": "error extracting auditd data fields: "
                              "argc key not found"}
        try:
            argc = int(out["argc"]) if "argc" in out else None
        except ValueError:
            argc = None
        if argc is not None:
            for i in range(argc):
                if f"a{i}" not in out and f"a{i}_len" not in out:
                    return {"record_type": record_type,
                            "sequence": out["sequence"], "_ts": ts,
                            "_error": "error extracting auditd data fields: "
                                      f"failed to find arg a{i}"}

    # inner msg='...' block: multi-word unquoted values, overwrites outer
    im = _INNER_MSG.search(body)
    if im:
        out.pop("msg", None)
        for k, v in _INNER_KV.findall(im.group(1)):
            v = _strip_quotes(v.strip())
            if v == "":
                continue            # empty inner values are dropped (op=)
            if k in _HEX_DECODE_KEYS:
                v = _maybe_hex_decode(v)
            out[k] = v

    # '?' and (null) placeholders are dropped (aucoalesce)
    out = {k: v for k, v in out.items() if v not in ("?", "(null)")}

    # result normalization: res=/success= -> result
    for k in ("res", "success"):
        if k in out:
            val = out.pop(k).strip("'\"").lower()
            out["result"] = "success" if val in ("success", "yes", "1") \
                else "fail"

    # SELinux subject context split (user:role:domain:level[:category])
    if "subj" in out:
        parts = out.pop("subj").split(":")
        if len(parts) >= 4:
            out["subj_user"], out["subj_role"] = parts[0], parts[1]
            out["subj_domain"], out["subj_level"] = parts[2], parts[3]
            if len(parts) >= 5:
                out["subj_category"] = ":".join(parts[4:])
        else:
            out["subj"] = ":".join(parts)

    # arch + syscall resolution; a non-hex arch (already-normalized input)
    # fails the whole data extraction, mirroring auparse's ParseInt error
    arch_raw = out.get("arch")
    if arch_raw and arch_raw in _ARCH:
        out["arch"] = _ARCH[arch_raw]
    elif arch_raw and not re.fullmatch(r"[0-9a-fA-F]+", arch_raw):
        return {"record_type": record_type, "sequence": out["sequence"],
                "_ts": ts,
                "_error": "error extracting auditd data fields: failed to "
                          'parse arch: strconv.ParseInt: parsing '
                          f'"{arch_raw}": invalid syntax'}
    if "syscall" in out:
        try:
            num = int(out["syscall"])
            table = _SYSCALLS_I386 if out.get("arch") == "i386" \
                else _SYSCALLS_X86_64
            out["syscall"] = table.get(num, str(num))
        except ValueError:
            pass

    # negative exit codes -> errno names
    if "exit" in out:
        try:
            code = int(out["exit"])
            if code < 0:
                out["exit"] = _errno.errorcode.get(-code, str(code))
        except ValueError:
            pass

    # SELinux AVC: action/request + seresult/seperms
    if avc and "apparmor" not in out:
        action, perms = avc.group(1), avc.group(2).split()
        out["avc"] = {"action": action, "request": perms[0]}
        out["seresult"] = action
        out["seperms"] = ",".join(perms)

    # audit rule key unwrap (key="key=net" / multi-key)
    if "key" in out and isinstance(out["key"], str):
        kv = out["key"]
        if kv.startswith("key="):
            kv = kv[4:]
        out["key"] = kv.split("\x1d")[0] if "\x1d" in kv else kv

    # SOCKADDR decode
    if record_type == "SOCKADDR" and "saddr" in out:
        dec = _decode_sockaddr(out.pop("saddr"))
        out.update(dec)

    out["_ts"] = ts
    return out


@register("auditd")
class AuditdStage(Stage):
    """config: field (default "message"), add_error_key (default True).
    Output columns: auditd_record_type, auditd_sequence (string),
    auditd_ts (timestamp us), auditd_log (JSON map of the remaining
    fields).  Unparseable lines pass through with an error mark when
    add_error_key (auditd.go config semantics)."""

    name = "auditd"

    def __init__(self, config=None):
        super().__init__(config)
        self.field = self.config.get("field", "message")
        self.add_error_key = bool(self.config.get("add_error_key", True))

    def input_columns(self):
        return [field_to_column(self.field)]

    def process(self, batch):
        col = batch.column(field_to_column(self.field))
        rts, seqs, tss, maps, fails = [], [], [], [], []
        for line in col.to_pylist():
            rec = parse_auditd_line(line) if line else None
            if rec is None:
                rts.append(None); seqs.append(None); tss.append(None)
                maps.append(None); fails.append(line is not None)
                continue
            fails.append(rec.pop("_error", None) is not None)
            rts.append(rec.pop("record_type"))
            seqs.append(rec.pop("sequence"))
            tss.append(int(rec.pop("_ts") * 1e6))
            maps.append(json.dumps(rec, sort_keys=True))
        batch = set_column(batch, "auditd_record_type", pa.array(rts, pa.string()))
        batch = set_column(batch, "auditd_sequence", pa.array(seqs, pa.string()))
        batch = set_column(batch, "auditd_ts",
                           pa.array(tss, pa.timestamp("us")))
        batch = set_column(batch, "auditd_log", pa.array(maps, pa.string()))
        if self.add_error_key and any(fails):
            batch = set_error(batch, pa.array(fails, pa.bool_()),
                              "error parsing auditd log line")
        return batch
