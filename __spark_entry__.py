"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TF-IDF document-similarity join at
sf0.001; ``queries()`` exposes every implemented operator from SURVEY.md §2
(plus the training-data-pipeline operators); ``oracle_sql()`` gives the
DuckDB twin for each query — every registry entry has one. Engine/
iterative-output queries (crawl_wave, crawl_wave_priority, img_pipeline,
w3_greedy_match, w4_converge_match) pair with literal-VALUES oracles
generated Spark-independently (reference simulator, pure-numpy image
recompute, DuckDB-pairs + pure-Python matcher replay —
tools/build_fixtures.py, drift-guarded in tests/test_fixtures_drift.py),
so the driver hash-checks the engine's exact crawl order and the exact
matchings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bitextor_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TF-IDF similarity join (J5/A2/A3 + W1) on sf0.001."""
    return QUERIES["tfidf_similarity"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
