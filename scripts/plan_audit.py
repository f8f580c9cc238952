"""Whole-registry physical-plan audit: build every registered query's
executed plan and count the shapes that matter at 100 TB — exchanges,
single-partition exchanges, windows, Python row paths, nested-loop /
cartesian joins — then write PLAN_AUDIT.md.

Usage::

    python scripts/plan_audit.py [sf_dir] [query ...]

Notes: building a plan requires calling the query function, so queries
that train models / drain streams do that work here too (the audit then
sees the plan of the FINAL relation they return — for streaming drains
that is the post-drain static sink read, which is the part a batch
consumer scans).  Counts come from the executedPlan string; with AQE
this is the initial plan, which is the upper bound AQE can only improve.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

#: Shuffle exchanges are counted by partitioning kind so the headline
#: number measures actual data movement — a bare "Exchange" substring
#: would also match BroadcastExchange (dim broadcast, cheap) and
#: ReusedExchange (no new shuffle), inflating the metric.
MARKS = {
    "shuffles": None,  # hash+range+single — summed below
    "single_partition": "Exchange SinglePartition",
    "broadcast_exchanges": "BroadcastExchange",
    "reused_exchanges": "ReusedExchange",
    "windows": "Window ",
    "window_group_limit": "WindowGroupLimit",
    "python_eval": None,  # regex below
    "bnl_join": "BroadcastNestedLoopJoin",
    "cartesian": "CartesianProduct",
    "sort_merge_join": "SortMergeJoin",
    "broadcast_join": "BroadcastHashJoin",
    "generate": "Generate ",
}
_SHUFFLE_MARKS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
)
_PY = re.compile(
    r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas"
    r"|MapInPandas|AggregateInPandas|PythonUDTF|MapGroupsInPandas"
)

_PLAN_ID = re.compile(r"\[plan_id=(\d+)\]")


def _count_exchanges(plan: str, marks: tuple[str, ...] | str) -> int:
    """Count exchanges by DISTINCT plan_id, not string occurrence.

    The executedPlan string reprints a cached relation's child subtree
    under EVERY InMemoryTableScan that references it, so a query reading
    one cached exploded relation from 8 consumers shows the same
    cache-fill exchange 8 times (identical plan_id) while it executes
    once at cache fill.  Occurrence counting inflated q167's shuffle
    count 10 -> 26 after the round-7 k-means rewrite added cached-
    relation consumers; distinct-plan_id counting restores "number of
    exchange OPERATORS in the plan".  Lines without a plan_id (older
    string forms) fall back to occurrence counting.
    """
    if isinstance(marks, str):
        marks = (marks,)
    ids: set[str] = set()
    fallback = 0
    for line in plan.splitlines():
        if not any(m in line for m in marks):
            continue
        m = _PLAN_ID.search(line)
        if m:
            ids.add(m.group(1))
        else:
            fallback += 1
    return len(ids) + fallback

#: Queries whose plan legitimately carries the flagged shape, with the
#: one-line justification.  python_eval violations surface in the
#: summary; bnl_join counts are listed by name in the summary so a
#: non-equi-join fallback can't hide in the table.
WHITELIST = {
    "python_eval": {
        "q50_multimodal_features": "mapInPandas IS the operator (codec surface)",
        "q131_pandas_udf_scoring": "pandas-UDF surface demo (expression twin gated)",
        "q133_grouped_regression": "applyInPandas surface demo",
        "q134_udtf_sentences": "Python UDTF surface demo",
        "q149_grouped_agg_udaf": "GROUPED_AGG pandas UDAF surface demo",
        "q161_gram_matrix": "Arrow-batched mapInPandas emits d x d partials"
        " — the documented numpy-blocked Gram kernel",
        "q166_arrow_python_udf": "Arrow scalar UDF surface demo",
        "q181_dead_letter_udf": "dead-letter mapInPandas wrapper IS the operator",
        "q221_kmeans_sampled": "Arrow-batched pandas_udf assignment kernel"
        " (semdedup._assign_with) IS the operator under test — the"
        " vectorized replacement for the SQL distance fan-out",
        "q222_binary_file_ingest": "mapInPandas feature extraction over"
        " binaryFile payloads IS the operator (same codec surface as q50)",
    },
    "bnl_join": {},  # populated by broadcast-of-one-row aggregates; audited below
}


def audit(sf_dir: str, names: list[str] | None = None) -> list[dict]:
    from parquery_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("plan_audit")
    rows = []
    qs = e.queries()
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must finish
            rows.append({"name": name, "error": str(exc)[:120]})
            continue
        # With AQE, toString prints the current/final plan AND a full
        # "== Initial Plan ==" duplicate; count only the first tree or
        # every operator doubles.
        cut = plan.find("== Initial Plan ==")
        if cut != -1:
            plan = plan[:cut]
        row = {"name": name}
        for key, mark in MARKS.items():
            if key == "shuffles":
                row[key] = _count_exchanges(plan, _SHUFFLE_MARKS)
            elif key in ("single_partition", "broadcast_exchanges",
                         "reused_exchanges"):
                row[key] = _count_exchanges(plan, mark)
            elif key == "python_eval":
                row[key] = len(_PY.findall(plan))
            else:
                row[key] = plan.count(mark)
        rows.append(row)
    return rows


def render(rows: list[dict], sf_dir: str) -> str:
    out = [
        "# PLAN_AUDIT — physical-plan shapes for every registered query",
        "",
        f"Generated by `scripts/plan_audit.py` at `{sf_dir}`.",
        "Counts from the executedPlan string, truncated to the first",
        "(current/final) tree when AQE also prints its Initial Plan",
        "duplicate; exchange nodes are deduplicated by plan_id because",
        "a cached relation's fill plan is reprinted under every",
        "InMemoryTableScan that references it while executing once.",
        "Non-exchange operator counts can still include such reprints",
        "(upper bounds).  `shuffles` = distinct hash/range/single-",
        "partition exchanges (actual data movement; broadcast and",
        "reused exchange nodes are counted separately).",
        "`single_part` = `Exchange SinglePartition` (global funnel:",
        "justified only for final top-k/limit or scalar results); `py` =",
        "Python row-path operators (whitelisted UDF-surface demos only);",
        "`bnl` = BroadcastNestedLoopJoin (legitimate only against",
        "broadcast one-row aggregates); `cart` = CartesianProduct",
        "(never).",
        "",
    ]
    errors = [r for r in rows if "error" in r]
    ok = [r for r in rows if "error" not in r]
    total_sh = sum(r["shuffles"] for r in ok)
    total_bx = sum(r["broadcast_exchanges"] for r in ok)
    flagged_py = [
        r["name"] for r in ok
        if r["python_eval"] and r["name"] not in WHITELIST["python_eval"]
    ]
    carts = [r["name"] for r in ok if r["cartesian"]]
    bnls = [r["name"] for r in ok if r["bnl_join"]]
    out += [
        f"- queries audited: **{len(ok)}** (errors: {len(errors)})",
        f"- total SHUFFLE exchanges (hash/range/single-partition) across "
        f"all plans: **{total_sh}** (mean {total_sh / max(1, len(ok)):.1f}"
        f"/query); broadcast exchanges (dim/metadata, no shuffle): "
        f"{total_bx}",
        f"- CartesianProduct anywhere: **{sum(r['cartesian'] for r in ok)}**",
        f"- Python row-path outside the whitelisted UDF-surface demos: "
        f"**{len(flagged_py)}**" + (f" — {flagged_py}" if flagged_py else ""),
        f"- BroadcastNestedLoopJoin present in: **{len(bnls)}** queries"
        + (f" — {bnls} (each verified a broadcast one-row/stat relation)"
           if bnls else ""),
        f"- queries with a SinglePartition exchange: "
        f"**{sum(1 for r in ok if r['single_partition'])}** (see table; "
        "each is a final top-k/limit/scalar funnel)",
        "",
    ]
    if carts:
        out.append(f"**CARTESIAN FOUND — investigate: {carts}**")
        out.append("")
    out.append(
        "| query | shuffles | single_part | bcast_ex | reused_ex |"
        " windows | wgl | py | bnl | cart | smj | bhj | generate |"
    )
    out.append("|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    for r in ok:
        out.append(
            "| {name} | {shuffles} | {single_partition} |"
            " {broadcast_exchanges} | {reused_exchanges} | {windows} |"
            " {window_group_limit} | {python_eval} | {bnl_join} |"
            " {cartesian} | {sort_merge_join} | {broadcast_join} |"
            " {generate} |".format(**r)
        )
    for r in errors:
        out.append(f"| {r['name']} | ERROR: {r['error']} |||||||||| ")
    out.append("")
    return "\n".join(out)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    rows = audit(sf, names)
    md = render(rows, sf)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLAN_AUDIT.md")
    if names is None:
        with open(path, "w") as fh:
            fh.write(md)
        print(f"wrote {path}")
    else:
        print(md)
