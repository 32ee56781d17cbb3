"""Wikipedia SQL-dump reader (SURVEY §2.1 S3).

The reference uses a Ragel-generated C state machine (airflow/sql_parser.c,
invoked create_collections.py:205-208) to pull selected columns out of
``INSERT INTO … VALUES (…),(…);`` statements. Here the dump is a distributed
text scan: each line (one INSERT statement, potentially millions of tuples)
is split into value tuples by a quote-aware scanner inside ``mapInPandas``
— single-pass C-speed-ish per line via Python's str.find loop, parallelized
by Spark over statements. Column pruning (the C parser's argv field mask,
Opt-2) happens inside the scanner so only wanted fields cross into Arrow.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


def _split_tuples(line: str) -> Iterator[list[str]]:
    """Yield raw field lists from an INSERT statement's VALUES section.

    Handles quoted strings with backslash escapes, NULLs, and numeric
    fields. Mirrors the states of the reference's Ragel DFA.
    """
    idx = line.find("VALUES")
    if idx < 0:
        return
    i = idx + len("VALUES")
    n = len(line)
    while i < n:
        while i < n and line[i] not in "(":
            if line[i] == ";":
                return
            i += 1
        if i >= n:
            return
        i += 1  # past '('
        fields: list[str] = []
        buf: list[str] = []
        in_str = False
        while i < n:
            c = line[i]
            if in_str:
                if c == "\\":
                    if i + 1 < n:
                        buf.append(line[i + 1])
                        i += 2
                        continue
                elif c == "'":
                    in_str = False
                    i += 1
                    continue
                buf.append(c)
                i += 1
            else:
                if c == "'":
                    in_str = True
                    i += 1
                elif c == ",":
                    fields.append("".join(buf))
                    buf = []
                    i += 1
                elif c == ")":
                    fields.append("".join(buf))
                    i += 1
                    yield fields
                    break
                else:
                    buf.append(c)
                    i += 1
        else:
            return


def read_sql_dump(
    lines: DataFrame,
    field_indexes: tuple[int, ...],
    field_names: tuple[str, ...],
    value_col: str = "value",
) -> DataFrame:
    """Extract ``field_indexes`` of every tuple as string columns
    ``field_names`` (the C parser's CLI field mask: `sql_parser 0 1`)."""
    assert len(field_indexes) == len(field_names)
    schema = StructType([StructField(f, StringType()) for f in field_names])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf[value_col]:
                if line is None or "INSERT" not in line:
                    continue
                for fields in _split_tuples(line):
                    try:
                        rows.append([fields[i] for i in field_indexes])
                    except IndexError:
                        continue  # malformed tuple — the C parser skips too
            yield pd.DataFrame(rows, columns=list(field_names))

    return lines.mapInPandas(run, schema)
