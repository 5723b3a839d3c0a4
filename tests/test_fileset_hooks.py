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

_SF_PROV = {"_elf": {"event_provider": "EventLogFile"},
            "_object": {"event_provider": "Object"}}

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
    (XP, "snyk", "audit"): {"vars": {"input": "file"}},
    (XP, "snyk", "vulnerabilities"): {"vars": {"input": "file"}},
    # the SHARED asa-ftd-pipeline.yml (242 processors) rendered through the
    # manifest's ../shared path + {< .internal_prefix >} Go templating
    (XP, "cisco", "asa"): {"vars": {"input": "file"}},
    (XP, "cisco", "ftd"): {"vars": {"input": "file"}},
    # the module's REAL config/pipeline.js (processor-registry API) through
    # mini-JS — ${path.home} file resolution in compile_fileset_spec
    (XP, "gcp", "audit"): {"vars": {"input": "file"}},
    (XP, "gcp", "firewall"): {"vars": {"input": "file"}},
    (XP, "gcp", "vpcflow"): {"vars": {"input": "file"}},
    (XP, "misp", "threat"): {"vars": {"input": "file"}},
    (XP, "google_workspace", "login"): {"vars": {"input": "file"}},
    (XP, "google_workspace", "saml"): {"vars": {"input": "file"}},
    (XP, "google_workspace", "groups"): {"vars": {"input": "file"}},
    (XP, "google_workspace", "drive"): {"vars": {"input": "file"}},
    (XP, "google_workspace", "user_accounts"): {"vars": {"input": "file"}},
    # the 925-line admin pipeline.js builds ~1000 processors in its
    # top-level IIFE — run-once-per-VM module state makes all 16 fixtures
    # ~4 s each through the real JS
    (XP, "google_workspace", "admin"): {"vars": {"input": "file"}},
    (XP, "cisco", "ios"): {"vars": {"input": "file"}},
    # pipeline branches on log.file.path; golden arrays sorted -> align
    (XP, "cisco", "umbrella"): {"vars": {"input": "file"},
                                "log_path_col": True,
                                "align_by": "event.original"},
    # event id is the ES doc _id: duplicate fixture lines collapse
    (XP, "cisco", "amp"): {"vars": {"input": "file"}, "dedupe_lines": True},
    (XP, "iptables", "log"): {"vars": {"input": "file"}},
    # the REAL 1104-line pipeline.js through mini-JS + compiled ingest yml
    (XP, "o365", "audit"): {"vars": {"input": "file"}},
    # digit-count date pairs fused to one UNIX_AUTO stage; Integer-vs-Long
    # blacklist parity
    (XP, "crowdstrike", "falcon"): {"vars": {"input": "file"}},
    # compiled root + vendor-dispatched cp-/fp- sub-pipelines
    (XP, "cef", "log"): {"vars": {"input": "file"}},
    # quote-aware splitUnquoted KV + ES network_direction processor
    (XP, "fortinet", "firewall"): {"vars": {"input": "file"}},
    (XP, "aws", "vpcflow"): {"vars": {"input": "file"}},
    # event.provider is input-stamped metadata keyed by collection method
    (XP, "salesforce", "login"): {
        "vars": {"input": "file"}, "extra_cols_by_name": _SF_PROV},
    (XP, "salesforce", "logout"): {
        "vars": {"input": "file"}, "extra_cols_by_name": _SF_PROV},
    (XP, "salesforce", "apex"): {
        "vars": {"input": "file"}, "extra_cols_by_name": _SF_PROV},
    (XP, "salesforce", "setupaudittrail"): {
        "vars": {"input": "file"}, "extra_cols_by_name": _SF_PROV},
    # 32-bit painless duration overflow, keysToSnakeCase sweep, indexed
    # targetResources maps, category->event-fields params tables
    (XP, "azure", "auditlogs"): {"vars": {"input": "file"}},
    (XP, "azure", "platformlogs"): {"vars": {"input": "file"}},
    (XP, "azure", "signinlogs"): {"vars": {"input": "file"}},
    (XP, "azure", "activitylogs"): {"vars": {"input": "file"}},
    # foreach member renames, kv on_failure flag routing, container
    # copy_from, in-place ES dissect overwrite
    (XP, "okta", "system"): {"vars": {"input": "file"}},
    # per-event-type sub-pipelines, dns answer v1/v2, url merge, SNI trim
    (XP, "suricata", "eve"): {"vars": {"input": "file"}},
    # mid-pattern Oniguruma (?m) dotall, [..] optional date sections,
    # lookahead kv splits, Java replacement escapes, log.file.path grok
    (XP, "oracle", "database_audit"): {"vars": {"input": "file"},
                                       "log_path_col": True},
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
        only = kw.get("fixtures")
        kw = {k: v for k, v in kw.items() if k != "fixtures"}
        for fx in fixtures_of(base, module, fileset):
            if fx.endswith(".journal"):
                continue   # binary journald input not shipped in the repo
            if only is not None and fx not in only:
                continue
            out.append(pytest.param(base, module, fileset, fx, kw,
                                    id=f"{module}/{fileset}/{fx}"))
    return out


@pytest.mark.parametrize("base,module,fileset,fx,kw", _params())
def test_fileset_via_runner(base, module, fileset, fx, kw):
    run_fileset_fixture(base, module, fileset, fx, **kw)
