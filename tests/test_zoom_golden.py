"""zoom/webhook module goldens — ALL 9 fixtures through the module's own
ingest chain compiled by beats_ray.ingest: the root ingest/pipeline.yml
dispatches per event-type sub-pipelines (meeting/account/chat_message/
chat_channel/phone/recording/user/webinar/zoomroom ymls) via the compiler's
pipeline loader with painless startsWith conditions.  Round 5: replaces the
single hand-ported meeting fixture with the full compiled fileset
(x-pack/filebeat/module/zoom/webhook).

Only painless ``script:`` bodies are hand-ported (positional per sub-yml,
like every other compiled-module golden): the minutes->ns and
ZonedDateTime-difference duration computations.
"""
import json
import os

import pyarrow as pa
import pytest

from beats_ray.ingest import compile_ingest, load_pipeline_yml
from beats_ray.pipeline import Pipeline
from test_zeek_golden import _terminated_lines, check_golden

ZOOM = "/root/reference/x-pack/filebeat/module/zoom/webhook"

pytestmark = pytest.mark.skipif(not os.path.isdir(ZOOM),
                                reason="reference not present")

_ISO_DIFF = (
    "def process(event, params):\n"
    "    from datetime import datetime\n"
    "    def iso(v):\n"
    "        return datetime.strptime(v.replace('Z', '+0000'),\n"
    "                                 '%Y-%m-%dT%H:%M:%S%z')\n"
    "    s, e = event.get('event_start'), event.get('event_end')\n"
    "    if s and e:\n"
    "        event['event_duration'] = int(\n"
    "            (iso(str(e)) - iso(str(s))).total_seconds() * 1e9)\n"
    "    return event\n")


def _phone_span(src_field):
    # ctx.event.start = <src>; ctx.event.end = call_end_time; NANOS.between
    return {"script": {"source": (
        "def process(event, params):\n"
        "    from datetime import datetime\n"
        "    def iso(v):\n"
        "        return datetime.strptime(str(v).replace('Z', '+0000'),\n"
        "                                 '%Y-%m-%dT%H:%M:%S%z')\n"
        f"    s = event.get('zoom_phone_{src_field}')\n"
        "    e = event.get('zoom_phone_call_end_time')\n"
        "    event['event_start'] = s\n"
        "    event['event_end'] = e\n"
        "    event['event_duration'] = int(\n"
        "        (iso(e) - iso(s)).total_seconds() * 1e9)\n"
        "    return event\n")}}


SCRIPTS = {
    # minutes (int) -> ns
    "meeting": [{"script": {"source": (
        "def process(event, params):\n"
        "    d = event.get('zoom_meeting_duration')\n"
        "    event['event_duration'] = int(d) * 60 * 1000000000\n"
        "    return event\n")}}],
    "phone": [
        _phone_span("ringing_start_time"),
        _phone_span("answer_start_time"),
        # zoom.duration is a STRING of minutes (Integer.parseInt)
        {"script": {"source": (
            "def process(event, params):\n"
            "    d = event.get('zoom_duration')\n"
            "    event['event_duration'] = int(str(d)) * 60 * 1000000000\n"
            "    return event\n")}},
    ],
    "recording": [{"script": {"source": _ISO_DIFF}}],
}


def _loader(name):
    return compile_ingest(load_pipeline_yml(f"{ZOOM}/ingest/{name}.yml"),
                          scripts=list(SCRIPTS.get(name, [])),
                          pipeline_loader=_loader)


_spec_cache = {}


def build_spec():
    ingest = compile_ingest(load_pipeline_yml(f"{ZOOM}/ingest/pipeline.yml"),
                            pipeline_loader=_loader)
    # config/webhook.yml "file" variant: decode_json_fields -> zoom,
    # add_locale (timezone is harness-env-dependent: skipped in compare),
    # ecs.version + module fields + the module's default tags
    return {"processors": [
        {"decode_json_fields": {"fields": ["message"], "target": "zoom",
                                "keep_arrays": True, "max_depth": 99}},
    ] + ingest + [
        {"add_fields": {"target": "", "fields": {
            "event.module": "zoom", "event.dataset": "zoom.webhook",
            "fileset.name": "webhook", "input.type": "log",
            "service.type": "zoom",
            "tags": ["forwarded", "zoom-webhook"]}}},
    ]}


FIXTURES = sorted(f[:-len(".log-expected.json")] + ".log"
                  for f in os.listdir(f"{ZOOM}/test")
                  if f.endswith(".log-expected.json")) \
    if os.path.isdir(ZOOM) else []


@pytest.mark.parametrize("logname", FIXTURES)
def test_zoom_webhook_module_golden(logname):
    if "spec" not in _spec_cache:
        _spec_cache["spec"] = build_spec()
    path = f"{ZOOM}/test/{logname}"
    lines = [ln for ln in _terminated_lines(path) if ln.strip()]
    batch = pa.table({"message": lines,
                      "line_no": pa.array(range(len(lines)), pa.int64())})
    out = Pipeline(_spec_cache["spec"]).run_local(batch)
    rows = sorted(out.to_pylist(), key=lambda r: r["line_no"])
    expected = json.load(open(path + "-expected.json"))
    assert len(rows) == len(expected)
    check_golden(rows, expected, skip=("event.timezone",))
