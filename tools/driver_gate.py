"""Driver-gate rehearsal: replay the CORRECTNESS check locally.

For every registry query, run the Spark plan AND its DuckDB oracle over
the same sf parquet tables, normalize both result sets the way the driver
does (columns sorted by name, floats rounded to 6dp, rows sorted), and
compare row counts + schema + values. Usage:

    python tools/driver_gate.py [query ...]      # default: all with oracles
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/driver_gate.py
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def normalize(cols: list[str], rows: list[tuple]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(map(str, t)))


def main() -> int:
    from bitextor_spark.queries import ORACLES, QUERIES
    from bitextor_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or [n for n in QUERIES if n in ORACLES]

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
    n_fail = 0
    for name in names:
        if name not in QUERIES:
            print(f"{name}: UNKNOWN QUERY")
            n_fail += 1
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            if name not in ORACLES:
                print(f"{name}: no_oracle ({len(s_rows)} rows)")
                continue
            rel = con.sql(ORACLES[name])
            o_cols = list(rel.columns)
            o_rows = rel.fetchall()
            sc, sr = normalize(s_cols, s_rows)
            oc, orr = normalize(o_cols, o_rows)
            ok_rows = len(sr) == len(orr)
            ok_schema = sc == oc
            ok_hash = sr == orr
            status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
            print(f"{name}: {status} rows={len(sr)}/{len(orr)} "
                  f"schema={ok_schema} hash={ok_hash}")
            if status == "FAIL":
                n_fail += 1
                if not ok_schema:
                    print(f"  spark cols: {sc}\n  ddb cols:   {oc}")
                if ok_rows and not ok_hash:
                    for a, b in zip(sr, orr):
                        if a != b:
                            print(f"  spark: {a}\n  ddb:   {b}")
                            break
        except Exception as e:  # noqa: BLE001 — report, keep gating others
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            n_fail += 1
    spark.stop()
    print(f"\n{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
