"""Python UDTF surface [EXT] (SURVEY.md §2.7 U3): regex span extraction.

The one text primitive Spark's native regex family cannot express:
per-match OFFSETS.  ``regexp_extract_all`` returns match strings but
not positions, and reconstructing positions via ``instr`` breaks on
repeated matches — so span extraction (PII audit trails, annotation
alignment, highlight ranges) is a genuine table-function case, not a
convenience wrapper around something Catalyst already does.

Executed as an arrow-optimized Python UDTF
(``spark.sql.execution.pythonUDTF.arrow.enabled=true`` — Arrow batches
rather than pickled rows).  One row in → k match rows out, stateless,
so it parallelizes per partition with no shuffle; the Python cost is
paid only on rows that reach it (filter first).  Correctness is pinned
by a differential test against ``re.finditer`` on the driver
(tests/test_text.py).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

__all__ = ["RegexSpans", "register_regex_spans"]


@udtf(returnType="start: int, end: int, match: string", useArrow=True)
class RegexSpans:
    """``eval(text, pattern)`` → one row per non-overlapping match with
    [start, end) character offsets, in document order."""

    def eval(self, text: str, pattern: str):  # noqa: D102
        if not text or not pattern:
            return
        for m in re.finditer(pattern, text):
            yield m.start(), m.end(), m.group()


def register_regex_spans(spark, name: str = "regex_spans") -> None:
    """Register for SQL ``LATERAL`` use:
    ``SELECT d.doc_id, s.* FROM docs d, LATERAL regex_spans(d.text, '\\d+') s``."""
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register(name, RegexSpans)
