"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TF-IDF document-similarity join at
sf0.001; ``queries()`` exposes every implemented operator from SURVEY.md §2
(plus the training-data-pipeline operators); ``oracle_sql()`` gives the
DuckDB twin for each query. Engine-output queries (crawl_wave,
crawl_wave_priority, img_pipeline) pair with literal-VALUES oracles
generated from the reference simulator / a pure-numpy recomputation
(tools/build_fixtures.py), so the driver hash-checks the engine's exact
crawl order. Only W3/W4 (greedy/converge matching) omit the oracle →
rows-only check; their exactness oracles are the pytest suites.
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
