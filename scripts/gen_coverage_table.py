"""Regenerate the '## Query registry status' section of COVERAGE.md.

One row per registered query: id -> operator family -> oracle kind ->
latest driver-green round (from CORRECTNESS_r*.json) -> implementation
site -> test files that mention it. Scriptable, so the table never drifts
from the registry again: python scripts/gen_coverage_table.py
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN GENERATED QUERY TABLE (scripts/gen_coverage_table.py) -->"
END = "<!-- END GENERATED QUERY TABLE -->"

_FAMILIES = [
    ("q", "relational (TPC-H shape)"),
    ("sql", "SQL surface (rollup/pivot/CTE/window/lateral/unpivot)"),
    ("l", "log analytics"),
    ("sr", "logstore source relation"),
    ("e", "events / product analytics"),
    ("d", "deduplication"),
    ("s", "similarity / ANN"),
    ("t", "text analysis"),
    ("m", "multimodal"),
    ("p", "pipeline ops"),
    ("v", "vocab / tokenization"),
    ("g", "graph"),
    ("j", "joins (interval/as-of)"),
    ("c", "CDC"),
]


def family(name: str) -> str:
    m = re.match(r"([a-z]+)\d", name)
    key = m.group(1) if m else name
    for prefix, label in _FAMILIES:
        if key == prefix:
            return label
    return key


def main() -> None:
    from spark_streaming_logservice_spark import registry

    registry.load_all()

    last_green: dict[str, str] = {}
    artifacts: list[str] = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        artifacts.append(rnd)
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if isinstance(rec, dict) and rec.get("hash_match"):
                last_green[name] = rnd

    test_hits: dict[str, list[str]] = {}
    for tf in sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py"))):
        text = open(tf).read()
        base = os.path.basename(tf)
        for name in registry.QUERIES:
            if name in text:
                test_hits.setdefault(name, []).append(base)

    lines = [
        BEGIN,
        "",
        "## Query registry status (generated)",
        "",
        f"{len(registry.QUERIES)} registered queries; 'driver green' is the "
        "latest round whose CORRECTNESS_r*.json row hash-matched; every "
        "oracle-backed query is additionally replayed each run by "
        "tests/test_oracle_parity.py.",
        "",
        f"Derived from: {', '.join(sorted(artifacts)) or '(no artifacts)'}. "
        "Regenerate as the FIRST act of a round, after the prior round's "
        "driver artifacts land — queries first verified by a driver run "
        "that postdates the latest artifact here will read 'local only' "
        "or one round stale until the next regeneration (the p26/p27/"
        "d27+d28 recurrence, VERDICT r10–r12).",
        "",
        "| query | family | oracle | driver green | implementation | tests |",
        "|---|---|---|---|---|---|",
    ]
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        try:
            src = os.path.relpath(inspect.getsourcefile(fn), REPO)
            line = inspect.getsourcelines(fn)[1]
            site = f"`{src}:{line}`"
        except (TypeError, OSError):
            site = "—"
        oracle = "sql" if name in registry.ORACLES else "rows-only"
        green = last_green.get(name, "local only")
        tests = ", ".join(t for t in test_hits.get(name, [])) or "test_oracle_parity.py"
        lines.append(
            f"| {name} | {family(name)} | {oracle} | {green} | {site} | {tests} |"
        )
    lines += ["", END]
    block = "\n".join(lines)

    cov_path = os.path.join(REPO, "COVERAGE.md")
    text = open(cov_path).read()
    if BEGIN in text and END in text:
        pre = text.split(BEGIN)[0]
        post = text.split(END, 1)[1]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(cov_path, "w") as f:
        f.write(text)
    n_green = sum(1 for n in registry.QUERIES if n in last_green)
    print(
        f"wrote {len(registry.QUERIES)} rows "
        f"({n_green} driver-green, {len(registry.QUERIES) - n_green} local-only)"
    )


if __name__ == "__main__":
    main()
