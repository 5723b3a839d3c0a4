"""Regenerate beats_ray/stages/cef_keys.py from the reference's CEF key
tables (x-pack/filebeat/processors/decode_cef/cef/keys.go and
keys.ecs.go).  Those tables are themselves generated from the PUBLIC
ArcSight CEF spec documents ("Micro Focus Security ArcSight Common Event
Format Version 25", 2017; "HPE Security ArcSight CEF Version 23", 2016;
"Check Point Log Exporter CEF Field Mappings", 2018) — pure spec data,
no logic.  Run: python scripts/gen_cef_keys.py  (reference must be
mounted at /root/reference).
"""

import re

KEYS_GO = "/root/reference/x-pack/filebeat/processors/decode_cef/cef/keys.go"
ECS_GO = "/root/reference/x-pack/filebeat/processors/decode_cef/keys.ecs.go"
OUT = "beats_ray/stages/cef_keys.py"

ENTRY = re.compile(
    r'"(?P<key>[^"]+)":\s*\{\s*Target:\s*"(?P<target>[^"]+)",\s*'
    r'Type:\s*(?P<type>\w+),', re.S)

ECS_SIMPLE = re.compile(r'"(?P<key>[^"]+)":\s*\{Target:\s*"(?P<target>[^"]+)"\}')
ECS_BLOCK = re.compile(
    r'"(?P<key>[^"]+)":\s*\{\s*\n\s*Target:\s*"(?P<target>[^"]+)",\s*\n'
    r'\s*Translate:', re.S)


def main():
    src = open(KEYS_GO).read()
    ext = {m["key"]: (m["target"], m["type"].removesuffix("Type").lower())
           for m in ENTRY.finditer(src)}

    ecs_src = open(ECS_GO).read()
    ecs = {m["key"]: m["target"] for m in ECS_SIMPLE.finditer(ecs_src)}
    translated = {m["key"]: m["target"] for m in ECS_BLOCK.finditer(ecs_src)}

    with open(OUT, "w") as f:
        f.write('"""CEF extension-key tables (GENERATED — do not edit; run\n'
                'scripts/gen_cef_keys.py).  Data source: the public ArcSight\n'
                'CEF spec tables, as inventoried by the reference at\n'
                'x-pack/filebeat/processors/decode_cef/cef/keys.go and\n'
                'keys.ecs.go.\n\n'
                'CEF_EXT: abbreviated or full key -> (full name, data type).\n'
                'CEF_ECS: full name -> ECS field (simple copy).\n'
                'CEF_ECS_TRANSLATE: full name -> ECS field needing a\n'
                'translation function (implemented in stages/cef.py).\n"""\n\n')
        f.write("CEF_EXT = {\n")
        for k in sorted(ext):
            t, ty = ext[k]
            f.write(f"    {k!r}: ({t!r}, {ty!r}),\n")
        f.write("}\n\nCEF_ECS = {\n")
        for k in sorted(ecs):
            f.write(f"    {k!r}: {ecs[k]!r},\n")
        f.write("}\n\nCEF_ECS_TRANSLATE = {\n")
        for k in sorted(translated):
            f.write(f"    {k!r}: {translated[k]!r},\n")
        f.write("}\n")
    print(f"wrote {OUT}: {len(ext)} ext keys, {len(ecs)} ecs, "
          f"{len(translated)} translated")


if __name__ == "__main__":
    main()
