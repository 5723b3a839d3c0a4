"""Golden-via-runner tests: every fileset promoted into FILESET_HOOKS runs
its module's own fixtures end-to-end through the PRODUCTION compile path
(``compile_fileset_spec`` + ``fileset_reader_opts`` — the same path
``python -m beats_ray module`` uses), compared against the reference's
``test/*-expected.json``.

Per-module golden tests (test_*_golden.py) verify compile_ingest-level
semantics with hand-assembled specs; THIS suite proves the shipped hook +
manifest-driven config/pipeline resolution reproduce them without any
test-side assembly.
"""
import os

import pytest

from fileset_harness import FB, XP, fixtures_of, run_fileset_fixture

pytestmark = pytest.mark.skipif(not os.path.isdir(FB),
                                reason="reference not present")

UA_SKIP = ("user_agent.name", "user_agent.os", "user_agent.device",
           "user_agent.version", "user_agent.major", "user_agent.minor")

# (base, module, fileset) -> run_fileset_fixture kwargs
CASES = {
    (FB, "kafka", "log"): {},
    (FB, "redis", "log"): {},
    (FB, "haproxy", "log"): {},
    (FB, "nginx", "access"): {},
    (FB, "mysql", "slowlog"): {},
    # no hook needed (generic compile); blank lines are real multiline
    # continuations in the mysql error goldens
    (FB, "mysql", "error"): {"keep_blank": True},
    (FB, "mongodb", "log"): {},        # no hook needed: generic compile
    (FB, "postgresql", "log"): {"keep_blank": True},
    (FB, "osquery", "result"): {},
    # trailing blank line is a real multiline continuation (final event's
    # message ends "\n" in the goldens)
    (FB, "elasticsearch", "slowlog"): {"keep_blank": True},
    (FB, "elasticsearch", "audit"): {},
    (FB, "elasticsearch", "server"): {"keep_blank": True},
    (FB, "elasticsearch", "gc"): {},
    (FB, "elasticsearch", "deprecation"): {},
    (FB, "logstash", "log"): {},
    (FB, "logstash", "slowlog"): {},
    (FB, "kibana", "audit"): {},
    # log.verbose.624 predates the log.offset sort in the reference golden
    # harness: its 100 events are an arbitrary subset/order of the input
    (FB, "kibana", "log"): {"unordered": True},
    (FB, "icinga", "main"): {"keep_blank": True},
    (FB, "icinga", "debug"): {},
    (FB, "icinga", "startup"): {},
    (FB, "nats", "log"): {},
    (FB, "traefik", "access"): {"skip": UA_SKIP},
    (FB, "iis", "access"): {"skip": UA_SKIP},
    (FB, "iis", "error"): {},
    # journald fixtures (debian-12.journal) are binary systemd inputs not
    # shipped in the reference checkout — out of scope per SURVEY §2.1
    (FB, "system", "auth"): {},
    (FB, "system", "syslog"): {},
    (XP, "zookeeper", "log"): {},
    (XP, "zookeeper", "audit"): {},
    (XP, "activemq", "log"): {},
    (XP, "activemq", "audit"): {},
    (XP, "envoyproxy", "log"): {},
    (XP, "coredns", "log"): {},
    (XP, "mysqlenterprise", "audit"): {},
    (FB, "apache", "access"): {},
    (FB, "apache", "error"): {},
    (FB, "nginx", "error"): {},
    (FB, "nginx", "ingress_controller"): {},
    (FB, "pensando", "dfw"): {},
    (FB, "santa", "log"): {},
    (FB, "mongodb", "log"): {},   # no hook needed: generic compile
    # no hook needed (no painless in these pipelines): generic compile
    (XP, "rabbitmq", "log"): {},
    (XP, "aws", "cloudwatch"): {},
    (XP, "aws", "ec2"): {},
    (XP, "awsfargate", "log"): {},
    (XP, "checkpoint", "firewall"): {},
    (XP, "zoom", "webhook"): {"vars": {"input": "file"},
                              "skip": ("event.timezone",)},
    (XP, "panw", "panos"): {"vars": {"input": "file"}},
    (XP, "juniper", "srx"): {},
    # goldens exclude the ambiguous-zone (throwing `z`) docs ES rejects
    (XP, "sophos", "xg"): {"align_by": "event.original"},
    (XP, "cyberarkpas", "audit"): {"vars": {"input": "file"}},
    (XP, "aws", "cloudtrail"): {},
    (FB, "auditd", "log"): {},
    (XP, "threatintel", "abuseurl"): {"vars": {"input": "file"}},
    (XP, "threatintel", "abusemalware"): {"vars": {"input": "file"}},
    (XP, "threatintel", "otx"): {"vars": {"input": "file"}},
    (XP, "threatintel", "anomali"): {"vars": {"input": "file"}},
    (XP, "threatintel", "malwarebazaar"): {"vars": {"input": "file"}},
    (XP, "threatintel", "anomalithreatstream"): {"vars": {"input": "file"}},
    (XP, "threatintel", "threatq"): {"vars": {"input": "file"}},
    (XP, "threatintel", "misp"): {"vars": {"input": "file"}},
    # filestream ndjson parser (parsers: config) + nested-format golden
    (FB, "elasticsearch", "querylog"): {
        "skip": ("event.created", "input.type"),
        "expected_transform": "flatten", "extra_spec": "ts_fix"},
    # no hook needed: generic compile (SS fraction layouts; ibmmq exercises
    # the grok merge-under-mask path + list-template appends)
    (XP, "mssql", "log"): {},
    (XP, "ibmmq", "errorlog"): {},
    # multi-pattern unanchored grok: leftmost-position-wins (ES combined
    # alternation semantics; the ALB fixtures prove it)
    (XP, "aws", "elb"): {},
    (XP, "aws", "s3access"): {},
    (XP, "microsoft", "defender_atp"): {"vars": {"input": "file"},
                                        "unordered": True},
    # m365 splits one alert into per-entity docs sharing event.original;
    # golden arrays are re-sorted -> bipartite row matching
    (XP, "microsoft", "m365_defender"): {"vars": {"input": "file"},
                                         "unordered": True},
}

# every zeek fileset compiles generically (the scripted ones have ports in
# FILESET_HOOKS already); enumerate dynamically
if os.path.isdir(os.path.join(XP, "zeek")):
    for _fs in sorted(os.listdir(os.path.join(XP, "zeek"))):
        if os.path.isdir(os.path.join(XP, "zeek", _fs, "test")):
            CASES[(XP, "zeek", _fs)] = {}


def _params():
    out = []
    for (base, module, fileset), kw in CASES.items():
        for fx in fixtures_of(base, module, fileset):
            if fx.endswith(".journal"):
                continue   # binary journald input not shipped in the repo
            out.append(pytest.param(base, module, fileset, fx, kw,
                                    id=f"{module}/{fileset}/{fx}"))
    return out


@pytest.mark.parametrize("base,module,fileset,fx,kw", _params())
def test_fileset_via_runner(base, module, fileset, fx, kw):
    run_fileset_fixture(base, module, fileset, fx, **kw)
