"""Pruned parquet readers.

All reads go through here so every pipeline prunes at the read: pass
``columns`` (projection pushdown) and ``filter`` (pyarrow dataset expression
→ row-group pushdown). Reference analog: the incremental extract queries
that select only needed columns under a watermark predicate
(/root/reference/queries/fact_studies.py:3-35).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def read_table(sf_dir: str, name: str, columns=None, filter=None, **kwargs) -> rd.Dataset:
    path = os.path.join(sf_dir, f"{name}.parquet")
    opts = dict(kwargs)
    if columns is not None:
        opts["columns"] = list(columns)
    if filter is not None:
        opts["filter"] = filter
    if "schema" not in opts:
        # pandas-metadata dicts on the file footer schema make Ray's
        # block-schema dedup log "Failed to hash the schemas" from every
        # read task; pass a metadata-stripped (and projected) schema so the
        # read operator itself emits clean blocks — no extra strip stage.
        sch = pq.read_schema(path).remove_metadata()
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        opts["schema"] = sch
    return rd.read_parquet(path, **opts)


def read_small(sf_dir: str, name: str, columns=None, filter=None):
    """Driver-side pyarrow read for SMALL broadcast sides (dimension
    tables, query vectors): no Ray pipeline spin-up for a table that is
    about to be `ray.put` anyway. Projection + row-group predicate still
    pushed down."""
    import pyarrow.dataset as pads

    path = os.path.join(sf_dir, f"{name}.parquet")
    dset = pads.dataset(path)
    return dset.to_table(columns=list(columns) if columns else None, filter=filter)
