"""Physical-plan inspection helpers: make performance properties assertable.

The engine's scale posture (SURVEY.md §4) lives or dies on Catalyst doing the
right thing — filters reaching the parquet scan, small dims broadcasting,
aggregates running partially before the shuffle, expressions staying inside
whole-stage codegen. These helpers turn those properties into assertions so
tests (tests/test_plans.py) pin them down instead of hoping."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True when at least one scan carries non-empty PushedFilters."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        stripped = line.strip()
        if stripped.startswith("PushedFilters:") and "[]" not in stripped:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets each parquet scan actually reads (pruning check)."""
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        stripped = line.strip()
        if stripped.startswith("ReadSchema:"):
            inner = stripped.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols = {c.split(":")[0] for c in inner.split(",") if c}
            out.append(cols)
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of user-forced broadcast hints in the analyzed logical plan
    (AQE's own runtime broadcasts don't appear here — this counts only
    ``F.broadcast(...)`` / ``/*+ BROADCAST */`` the query author wrote, the
    thing that can OOM executors when the hinted side is O(corpus))."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return analyzed.count("ResolvedHint (strategy=broadcast")


def has_partial_aggregation(df: DataFrame) -> bool:
    """HashAggregate appears in partial+final pairs when map-side combine is
    active (keys: 'partial_' functions in the partial node)."""
    return "partial_" in formatted_plan(df)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (bucketed /
    co-partitioned plans should show fewer — ideally zero for a
    bucket-aligned join)."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(") and ") Exchange" in line
    )


def hash_exchange_inputs(df: DataFrame) -> list[str]:
    """The ``Input [n]: [...]`` line of every shuffle Exchange node whose
    Arguments are hashpartitioning (broadcast exchanges excluded), in plan
    order. Lets tests assert WHAT crosses a shuffle — e.g. that a
    retrieve-then-rerank candidate stage moves codes, not float arrays."""
    lines = formatted_plan(df).splitlines()
    # formatted plans list node details as "(id) NodeName" header blocks;
    # find Exchange blocks and pull their Input line
    out: list[str] = []
    i = 0
    while i < len(lines):
        s = lines[i].strip()
        if s.startswith("(") and ") Exchange" in s:
            block: dict[str, str] = {}
            j = i + 1
            while j < len(lines):
                t = lines[j].strip()
                if t.startswith("(") and ") " in t[:8]:
                    break
                for key in ("Input", "Arguments"):
                    if t.startswith(key):
                        block[key] = t
                j += 1
            if "hashpartitioning" in block.get("Arguments", ""):
                out.append(block.get("Input", ""))
            i = j
        else:
            i += 1
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters entries on scans (non-empty → partition pruning)."""
    out = []
    for line in formatted_plan(df).splitlines():
        s = line.strip()
        if s.startswith("PartitionFilters:") and "[]" not in s:
            out.append(s)
    return out


def global_window_count(df: DataFrame) -> int:
    """Window operators with an EMPTY partition spec — the plans Spark warns
    about with "No Partition Defined ... moving all data to a single
    partition". In the formatted plan a Window node's Arguments line has
    [functions], [partitionSpec], [orderSpec], with EMPTY specs dropped, so
    bracket-group count alone is ambiguous at 2: it is either
    (functions, orderSpec) — a global ordered window — or
    (functions, partitionSpec) — a partitioned whole-frame window, which is
    fine. Disambiguate by the sort direction keywords only an orderSpec
    carries. 1 group == global unordered window (also flagged)."""
    import re

    lines = formatted_plan(df).splitlines()
    count = 0
    for i, line in enumerate(lines):
        if not re.match(r"^\(\d+\) Window$", line.strip()):
            continue
        for j in range(i + 1, min(i + 6, len(lines))):
            s = lines[j].strip()
            if not s.startswith("Arguments:"):
                continue
            depth, groups, spans = 0, 0, []
            start = 0
            for pos, ch in enumerate(s):
                if ch == "[":
                    if depth == 0:
                        groups += 1
                        start = pos
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        spans.append(s[start : pos + 1])
            if groups == 1:
                count += 1
            elif groups == 2 and re.search(r"\b(ASC|DESC)\b", spans[1]):
                count += 1
            break
    return count


def wholestage_codegen_spans(build_df, spark) -> int:
    """Count distinct whole-stage-codegen spans. AQE wraps the plan in
    AdaptiveSparkPlan and defers codegen until stage materialization, so the
    plan is built once with AQE off purely for inspection (the engine runs
    with AQE on)."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = build_df()._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    ids = set()
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ").strip()
        if s.startswith("*(") and ")" in s:
            try:
                ids.add(int(s[2 : s.index(")")]))
            except ValueError:
                pass
    return len(ids)
