"""CSV / JSON-lines sources.

Parquet is the scale format (column pruning + row-group predicate pushdown
— `sources/parquet.py`); these readers exist so pipelines can ingest the
interchange formats a source system actually emits. Both are row-oriented:
``columns`` prunes AFTER parse (projection cannot push into the file the
way parquet does), so convert to parquet at the lake boundary for anything
re-read more than once. Reads parallelize per file / per block exactly like
every other Dataset source.
"""

from __future__ import annotations

import ray.data as rd


def read_csv_table(path: str, columns=None, **kwargs) -> rd.Dataset:
    """CSV source. ``path`` may be a file, directory, or list. Schema is
    inferred by Arrow's CSV reader; pass ``convert_options`` /
    ``parse_options`` (pyarrow.csv) through ``kwargs`` to pin it."""
    ds = rd.read_csv(path, **kwargs)
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds


def read_jsonl_table(path: str, columns=None, **kwargs) -> rd.Dataset:
    """JSON-lines source (one object per line, the log-shipping format)."""
    ds = rd.read_json(path, **kwargs)
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds
