"""Executed-plan audit → PLANS.md.

For every registered query: materialize it at the audit scale factor and
inspect the FINAL physical plan (post-AQE) for the three scale signals the
review checks:

- cartesian / broadcast-nested-loop joins (only the intentionally-cross
  ops — brute-force ANN baselines, kNN, f5's bounded 25x5 — may have one);
- parquet pushed filters on filtering scans;
- WholeStageCodegen coverage (counted via the ``* (n)`` star markers in
  the formatted plan).

Usage: ``python tools/plan_audit.py [sf_dir] [cpus]`` from the repo root.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _intentional_cross() -> dict[str, str]:
    """Cross-join allowlist: the machine-readable baseline markers from the
    registry (queries.SCALE_BASELINE_ONLY) plus the two scale-safe plans
    whose only BNLJ is a 1-row corpus-size broadcast aggregate."""
    from bitextor_spark.queries import SCALE_BASELINE_ONLY

    out = {k: f"baseline-only: {v}" for k, v in SCALE_BASELINE_ONLY.items()}
    out["ann_ivf_topk"] = "cartesian: 1-row corpus-size broadcast aggregate"
    out["tfidf_similarity"] = "cartesian: 1-row corpus-size broadcast aggregate"
    return out

ENGINE_DRIVEN = {"crawl_wave", "crawl_wave_priority"}


def audit(sf_dir: str, cpus: int) -> list[dict]:
    import __spark_entry__ as entry
    from bitextor_spark.session import get_spark

    INTENTIONAL_CROSS = _intentional_cross()
    spark = get_spark(app_name="plan-audit", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    rows = []
    for name, fn in sorted(entry.queries().items()):
        if name in ENGINE_DRIVEN:
            rows.append({"name": name, "cross": "-", "pushed": "-",
                         "codegen": "-",
                         "note": "engine-driven (see frontier tests)"})
            continue
        try:
            df = fn(spark, sf_dir)
            df.foreach(lambda _: None)  # materialize → AQE final plan
            qe = df._jdf.queryExecution()
            # simple-mode string: `*(n)` markers carry the codegen stage id
            plan = qe.executedPlan().toString()
        except Exception as ex:  # audit must not abort on one query
            rows.append({"name": name, "cross": "?", "pushed": "?",
                         "codegen": "?", "note": f"ERROR {ex}"[:80]})
            continue
        # formatted explain is best-effort only: a query that EXECUTED fine
        # must not be marked ERROR because an explain API threw — fall back
        # to the simple plan string already captured
        try:
            formatted = df._sc._jvm.PythonSQLUtils.explainString(
                qe, "formatted"
            )
        except Exception:
            try:
                mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
                formatted = qe.explainString(mode.fromString("formatted"))
            except Exception:
                formatted = plan
        cross = bool(re.search(
            r"CartesianProduct|BroadcastNestedLoopJoin", plan))
        pushed = bool(re.search(r"PushedFilters: \[[^\]]",
                                formatted + plan))
        codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
        note = INTENTIONAL_CROSS.get(name, "") if cross else ""
        if cross and name not in INTENTIONAL_CROSS:
            note = "UNEXPECTED CROSS JOIN"
        rows.append({
            "name": name,
            "cross": "yes" if cross else "no",
            "pushed": "yes" if pushed else "-",
            "codegen": codegen,
            "note": note,
        })
    spark.stop()
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rows = audit(sf_dir, cpus)
    bad = [r for r in rows if r["note"] == "UNEXPECTED CROSS JOIN"
           or str(r["cross"]) == "?"]
    lines = [
        f"# PLANS — executed-plan audit (sf{sf_dir.rsplit('sf', 1)[-1]}, "
        f"local[{cpus}])",
        "",
        "Evidence for the scale review: which physical plans contain a",
        "cartesian/broadcast-nested-loop join (only the intentionally-cross",
        "ops should), whether parquet scans carry pushed filters, and how",
        "many WholeStageCodegen spans cover the plan. Regenerate with",
        "`python tools/plan_audit.py`.",
        "",
        "| query | cartesian/BNLJ | pushed filters | codegen spans | note |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['name']} | {r['cross']} | {r['pushed']} | "
            f"{r['codegen']} | {r['note']} |"
        )
    lines += [
        "",
        f"**{len(rows)} plans audited; "
        f"{len(bad)} unexpected cross joins / errors.**",
    ]
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"PLANS.md written: {len(rows)} plans, {len(bad)} unexpected")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
