"""ORC source / sink.

The Hive-ecosystem interchange format: warehouses this engine ingests from
(or exports to) often speak ORC, and Ray Data 2.49 ships no built-in ORC
reader, so this one is built from the same primitives as any custom source —
a path listing fans out over tasks, each task decodes its file with
``pyarrow.orc`` into Arrow (zero-copy into the object store from there on).

Scale shape: one read task per file (ORC stripes inside a file decode
together), so parallelism = file count — the layout ORC warehouses emit
(many ~100 MB files per table). ``columns`` pushes into the ORC stripe
reader itself (ORC is columnar), unlike the CSV/JSONL sources where pruning
happens post-parse.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from .. import fsio


def _list_orc(path: str) -> list[str]:
    if not fsio.is_dir(path):
        return [path]
    return sorted(
        fsio.join(path, n) for n in fsio.list_names(path)
        if n.endswith(".orc")
    )


def read_orc_table(path: str, columns=None) -> rd.Dataset:
    """ORC source. ``path`` is a file or a directory of ``*.orc`` files.
    Column projection pushes down into the stripe reader."""
    paths = _list_orc(path)
    cols = list(columns) if columns is not None else None

    def _decode(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        out = []
        for p in batch.column("path").to_pylist():
            fs, rel = fsio.resolve(p)
            with fs.open_input_file(rel) as f:
                out.append(orc.ORCFile(f).read(columns=cols))
        return pa.concat_tables(out) if out else pa.table({})

    files = rd.from_arrow(pa.table({"path": pa.array(paths, pa.string())}))
    # one file per task: ORC decode parallelism = file count
    return files.repartition(max(len(paths), 1)).map_batches(
        _decode, batch_format="pyarrow", batch_size=None
    )


def write_orc_table(ds: rd.Dataset, out_dir: str) -> int:
    """ORC sink: one ``part-<index>.orc`` file per block, written by
    parallel Ray tasks over the block refs. Index-based names make the
    write re-run stable under the same block layout AND collision-free
    when two blocks carry identical content (a content-hash name would
    silently overwrite one with the other). Returns the number of files
    written."""
    import ray

    @ray.remote
    def _write(i: int, block: pa.Table) -> int:
        from pyarrow import orc

        fs, rel = fsio.resolve(fsio.join(out_dir, f"part-{i:05d}.orc"))
        with fs.open_output_stream(rel) as f:
            orc.write_table(block, f)
        return block.num_rows

    fsio.makedirs(out_dir)
    refs = ds.to_arrow_refs()
    ray.get([_write.remote(i, r) for i, r in enumerate(refs)])
    return len(refs)
