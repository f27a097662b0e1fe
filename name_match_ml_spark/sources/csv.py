"""Schema-flexible CSV ingestion with header-alias normalization.

Reference semantics: ``fetch_employees`` at ``main.py:93-133`` and the
username ingest at ``main.py:150-156``:

* headers lowercased (``main.py:103,152``),
* a fixed alias dictionary renames known header variants to the four
  canonical columns, first matching alias wins (``main.py:94-109``),
* missing name columns are derived — ``employee_name`` from
  ``first_name + ' ' + last_name`` (``main.py:111-114``) or first/last
  split out of ``employee_name`` on the first whitespace
  (``main.py:117-120``),
* everything cast to trimmed strings, nulls → '' (``main.py:124-127``),
* canonical projection ``[emp_id, first_name, last_name, employee_name]``
  (``main.py:129``); on failure an *empty* canonical DataFrame is returned
  (``main.py:131-133``),
* usernames CSV must contain a ``username`` column (``main.py:153-155``).

Everything here is native Catalyst expressions — no Python UDFs — so header
normalization, derivation and trimming all stay inside whole-stage codegen
and columns not in the canonical projection are pruned at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "CANONICAL_COLUMN_ALIASES",
    "EMPLOYEE_COLUMNS",
    "normalize_headers",
    "apply_column_aliases",
    "derive_name_columns",
    "load_employees",
    "load_usernames",
    "employees_from_df",
]

# Alias dictionary verbatim from ``main.py:94-99``.
CANONICAL_COLUMN_ALIASES: dict[str, list[str]] = {
    "emp_id": [
        "employee_id", "employee id", "id_employee", "staff_id", "emp id",
        "empid", "id", "employee no", "emp no",
    ],
    "first_name": [
        "first name", "fname", "given_name", "first", "f_name",
        "name (first)", "namefirst",
    ],
    "last_name": [
        "last name", "lname", "surname", "family_name", "l_name",
        "name (last)", "namelast",
    ],
    "employee_name": ["full name", "fullname", "emp_name", "name of employee", "name"],
}

EMPLOYEE_COLUMNS = ["emp_id", "first_name", "last_name", "employee_name"]


def normalize_headers(df: DataFrame) -> DataFrame:
    """Lowercase all column names (``main.py:103,152``)."""
    return df.toDF(*[c.lower() for c in df.columns])


def apply_column_aliases(df: DataFrame) -> DataFrame:
    """Rename known header variants to canonical names; first matching
    alias wins, then stop looking for that canonical name
    (``main.py:105-109``)."""
    cols = set(df.columns)
    for canonical, aliases in CANONICAL_COLUMN_ALIASES.items():
        for alias in aliases:
            if alias in cols and alias != canonical:
                if canonical not in cols:
                    df = df.withColumnRenamed(alias, canonical)
                    cols.discard(alias)
                    cols.add(canonical)
                break
    return df


def _trimmed_str(c: str) -> F.Column:
    return F.trim(F.coalesce(F.col(c).cast("string"), F.lit("")))


def derive_name_columns(df: DataFrame) -> DataFrame:
    """Derive missing name columns (``main.py:111-122``).

    * no ``employee_name`` but first/last present → concat with one space,
    * ``employee_name`` only → split on first whitespace run into
      first/last (``str.split(n=1)`` semantics; missing second part → '').
    """
    cols = set(df.columns)
    if "employee_name" not in cols and ("first_name" in cols or "last_name" in cols):
        for c in ("first_name", "last_name"):
            df = df.withColumn(c, _trimmed_str(c) if c in cols else F.lit(""))
        df = df.withColumn(
            "employee_name", F.concat_ws(" ", F.col("first_name"), F.col("last_name"))
        )
    elif "employee_name" in cols:
        df = df.withColumn("employee_name", _trimmed_str("employee_name"))
        if "first_name" not in cols and "last_name" not in cols:
            parts = F.split(F.col("employee_name"), r"\s+", 2)
            df = df.withColumn("first_name", F.coalesce(F.get(parts, 0), F.lit("")))
            df = df.withColumn(
                "last_name", F.trim(F.coalesce(F.get(parts, 1), F.lit("")))
            )
    return df


def employees_from_df(df: DataFrame, *, on_error: str = "raise") -> DataFrame:
    """Full canonicalization pipeline on an already-loaded DataFrame:
    normalize → alias → derive → cast/trim/fill → project
    (``main.py:102-129``).

    ``on_error="raise"`` (default) fails loudly on missing columns;
    ``on_error="empty"`` reproduces the reference's degrade-to-empty
    semantics (``main.py:131-133`` swallows the error and shows an empty
    table) — same canonical schema, zero rows."""
    if on_error not in ("raise", "empty"):
        raise ValueError(f"on_error must be 'raise' or 'empty', got {on_error!r}")
    df = apply_column_aliases(normalize_headers(df))
    df = derive_name_columns(df)
    if not set(EMPLOYEE_COLUMNS) <= set(df.columns):
        missing = sorted(set(EMPLOYEE_COLUMNS) - set(df.columns))
        if on_error == "empty":
            return df.sparkSession.createDataFrame(
                [], ", ".join(f"{c} string" for c in EMPLOYEE_COLUMNS)
            )
        raise ValueError(f"employee input missing columns: {missing}")
    for c in EMPLOYEE_COLUMNS:
        df = df.withColumn(c, _trimmed_str(c))
    return df.select(*EMPLOYEE_COLUMNS)


def load_employees(spark: SparkSession, path: str, *, on_error: str = "raise") -> DataFrame:
    """CSV scan + canonicalization (``main.py:93-133``).

    Engine default is fail-loud (``ValueError`` on schema failure);
    ``on_error="empty"`` opts into the reference's exact degrade-to-empty
    behavior (``main.py:131-133``).
    """
    df = spark.read.option("header", True).csv(path)
    return employees_from_df(df, on_error=on_error)


def load_usernames(spark: SparkSession, path: str) -> DataFrame:
    """Username CSV scan (``main.py:150-156``): lowercase headers, require
    a ``username`` column, cast to string.  Carries ``input_id`` (file
    order, per-partition monotonic) so output can preserve input order as
    the reference's result file does (``main.py:163``).

    Caveat: ``monotonically_increasing_id`` orders rows *within* each
    scan partition but numbers partitions by index, so with multiple
    input files (or a split file) ids follow partition order, not global
    file order.  Exact for the reference's single-file uploads; use
    ``rdd.zipWithIndex`` if strict global order over a multi-file drop
    ever matters (costs one extra pass)."""
    df = normalize_headers(spark.read.option("header", True).csv(path))
    if "username" not in df.columns:
        raise ValueError("Usernames CSV must contain 'username' column.")
    return df.select(
        F.monotonically_increasing_id().alias("input_id"),
        F.coalesce(F.col("username").cast("string"), F.lit("")).alias("username"),
    )
