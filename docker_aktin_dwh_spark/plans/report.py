"""PLANS.md generator — physical-plan evidence for the headline set.

`python -m docker_aktin_dwh_spark.plans.report` re-renders PLANS.md:
for each bench headline query, the scale-relevant plan properties
(broadcast joins, pushed filters, read schema, codegen span count,
shuffle count) plus the full `explain("formatted")` output.  This is
the artifact form of the rule "after each operator works, explain the
plan and iterate until it's the plan you'd want" — reviewers can audit
the actual physical strategy without running anything.
"""

from __future__ import annotations

import glob
import os
import re
import sys

from .explain import formatted_plan


def _props(plan: str) -> dict[str, object]:
    pushed = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            pushed.append(m.group(1).strip())
    # formatted mode lists one `(N) Exchange` node header per exchange,
    # with the partitioning in the Arguments line that follows
    shuffles = len(re.findall(
        r"\(\d+\) Exchange\nInput .*\nArguments: (?:hash|range)partitioning",
        plan))
    return {
        "broadcast_joins": len(re.findall(
            r"\(\d+\) BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "nested_loop_joins": len(re.findall(
            r"\(\d+\) (?:BroadcastNestedLoopJoin|CartesianProduct)", plan)),
        "shuffles": shuffles,
        "pushed_filters": pushed,
    }


def _streaming_sections(spark, sf_dir: str) -> list[str]:
    """Executed micro-batch plans of the streaming-native declared keys:
    the stream builders from operators/streamnative.py are started
    through the same start_append_sink helper the declared keys use
    (shuffle-partition pinning included), and the last micro-batch's
    physical plan (state store nodes, watermark, sink) is captured from
    the query handle after availableNow termination."""
    import contextlib
    import io
    import shutil
    import tempfile

    from ..operators import streamnative

    sections = []
    def _str12(spark, sf, base):
        return streamnative.str11_stream(spark, sf, base, how="left_outer")

    for key, builder in (("str_01", streamnative.str01_stream),
                         ("str_05", streamnative.str05_stream),
                         ("str_11", streamnative.str11_stream),
                         ("str_12", _str12),
                         ("str_13", streamnative.str13_stream)):
        base = tempfile.mkdtemp(prefix=f"plans_{key}_")
        try:
            frame = builder(spark, sf_dir, base)
            q = streamnative.start_append_sink(frame, base)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                q.explain(extended=False)
            sections += [
                f"## {key} — executed streaming micro-batch plan",
                "",
                "Captured from the StreamingQuery handle after an",
                "`availableNow` replay into a checkpointed parquet sink.",
                "",
                "```", buf.getvalue().rstrip(), "```", "",
            ]
        finally:
            shutil.rmtree(base, ignore_errors=True)
    return sections


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from bench import HEADLINE

    from ..registry import build_registry
    from ..session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="plans-report")
    registry = build_registry()

    # non-headline keys whose scale story deserves plan evidence too
    extra = ("decon_01", "pack_01", "chunk_01", "mix_01", "ded_incr",
             "hh_01", "lay_01", "scd_01", "fed_hll",
             # r7: graph fixpoint, time-range frame, evolution read
             "pr_01", "win_07", "src_evo",
             # r8: stratified sample (WindowGroupLimit), DP release
             "smp_03", "priv_02")

    lines = [
        "# PLANS — physical-plan evidence (generated)",
        "",
        "Regenerate with `python -m docker_aktin_dwh_spark.plans.report`.",
        f"Scale factor dir: `{sf_dir}`.  One section per bench headline",
        "query: the scale properties the plan tests assert, then the full",
        "`explain(\"formatted\")` output.",
        "",
    ]
    for key in tuple(HEADLINE) + extra:
        spec = registry[key]
        df = spec.fn(spark, sf_dir)
        plan = formatted_plan(df)
        p = _props(plan)
        lines += [
            f"## {key} — {spec.doc}",
            "",
            f"- broadcast hash joins: {p['broadcast_joins']}"
            f"  · sort-merge joins: {p['sortmerge_joins']}"
            f"  · nested-loop joins: {p['nested_loop_joins']}",
            f"- shuffles (hash/range exchanges): {p['shuffles']}",
        ]
        if p["pushed_filters"]:
            lines.append("- pushed to scan: " +
                         "; ".join(f"`[{f}]`" for f in p["pushed_filters"]))
        lines += ["", "```", plan.rstrip(), "```", ""]
    # prefer the smallest sibling sf dir (chunk layout changes row
    # counts, not plan shape, and the spill is cheap there) but fall
    # back to the batch sections' dir so the report generator works on
    # any fixture layout (ADVICE r5); env var stays the override
    def _sf_num(d):
        try:
            return float(os.path.basename(d)[2:])
        except ValueError:
            return float("inf")

    siblings = sorted(
        (d for d in glob.glob(os.path.join(os.path.dirname(sf_dir), "sf*"))
         if os.path.isdir(d)), key=_sf_num)
    stream_sf = os.environ.get("SPARK_GRAFT_STREAM_SF_DIR",
                               siblings[0] if siblings else sf_dir)
    lines += _streaming_sections(spark, stream_sf)
    spark.stop()

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
