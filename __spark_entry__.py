"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fuzzy/phonetic name-match pipeline on
the sf0.001 corpus; ``queries()``/``oracle_sql()`` declare the SURVEY.md §2
operator inventory with DuckDB oracles (see ``name_match_ml_spark/suite.py``).
Queries without an oracle entry (fuzzy scoring, LSH dedup) get rows-only
checks by design — DuckDB has no soundex/metaphone/token-set equivalents.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from name_match_ml_spark.suite import ORACLE_SQL, SPARK_QUERIES, flagship_corpus_match


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_corpus_match(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(SPARK_QUERIES)
    out["flagship_namematch"] = flagship_corpus_match
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return dict(ORACLE_SQL)
