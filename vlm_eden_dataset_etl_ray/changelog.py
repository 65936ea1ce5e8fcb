"""Deterministic synthetic CDC changelog generator (FIXTURES.md §F2).

Models the event stream the reference extracts by polling
(``/root/reference/sync/sync_base.py:47-59`` watermark scans) as an explicit
WAL: one row per change event, totally ordered by ``lsn`` but DELIVERED in a
seeded shuffle (out-of-order), with ~``dup_frac`` verbatim re-emissions
(the reference's 5 s watermark-overlap re-read,
``sync/sync_base.py:55-56``), tombstones (the reference's ``deleted``
flag, ``queries/fact_studies.py:23,73``), Zipf-skewed hot keys, and a
mid-stream schema change (add ``quality:float64`` + widen ``n_tok``
int32→int64 — the add-column / widen migrations
``migrations/20230510_01_V14Kk.sql`` / ``20241204_01_xSnrF.sql``).

Everything is a pure function of ``(seed, params)``: payloads are computed
arithmetically from the LSN, so duplicate deliveries are verbatim and the
serial oracle (:mod:`vlm_eden_dataset_etl_ray.oracle`) can recompute any
event without storing the stream.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SOURCES = np.array(["web", "books", "code", "wiki"])
_TOK_MULT = np.int64(2654435761)
_TOK_STEP = np.int64(40503)


@dataclass(frozen=True)
class ChangelogParams:
    seed: int = 42
    n_docs: int = 1_000
    n_events: int = 10_000
    dup_frac: float = 0.01
    delete_frac: float = 0.05
    #: lsn at which schema flips v1→v2 (None = whole stream is v1)
    schema_change_at: int | None = None
    zipf_s: float = 1.1
    mean_tok: int = 64
    max_tok: int = 2048
    vocab: int = 50257
    n_shards: int = 8


# ---------------------------------------------------------------------------
# The LSN-ordered plan: cheap scalar arrays, one entry per logical event.
# ---------------------------------------------------------------------------

def plan(p: ChangelogParams) -> dict[str, np.ndarray]:
    """Scalar per-event arrays in LSN order (index == lsn)."""
    rng = np.random.default_rng(p.seed)
    doc_idx = (rng.zipf(p.zipf_s, p.n_events) - 1) % p.n_docs
    is_delete = rng.random(p.n_events) < p.delete_frac
    # first-ever event of a doc is an insert, never a delete
    first_pos = np.full(p.n_docs, -1, dtype=np.int64)
    uniq, first = np.unique(doc_idx, return_index=True)
    first_pos[uniq] = first
    is_first = np.zeros(p.n_events, dtype=bool)
    is_first[first[first >= 0]] = True
    is_delete &= ~is_first
    op = np.where(is_delete, 2, np.where(is_first, 0, 1)).astype(np.int8)  # 0=insert 1=update 2=delete
    n_tok = np.clip(
        rng.lognormal(np.log(p.mean_tok), 0.6, p.n_events), 1, p.max_tok
    ).astype(np.int32)
    n_tok[is_delete] = 0
    source_idx = rng.integers(0, len(SOURCES), p.n_events).astype(np.int8)
    if p.schema_change_at is None:
        schema_ver = np.ones(p.n_events, dtype=np.int32)
    else:
        schema_ver = np.where(
            np.arange(p.n_events) < p.schema_change_at, 1, 2
        ).astype(np.int32)
    return {
        "doc_idx": doc_idx.astype(np.int64),
        "op": op,
        "n_tok": n_tok,
        "source_idx": source_idx,
        "schema_ver": schema_ver,
    }


def delivery_order(p: ChangelogParams) -> np.ndarray:
    """Seeded shuffled LSN sequence with ~dup_frac verbatim duplicates."""
    rng = np.random.default_rng(p.seed + 1)
    order = rng.permutation(p.n_events)
    n_dup = int(p.dup_frac * p.n_events)
    if n_dup:
        dups = rng.choice(p.n_events, n_dup, replace=True)
        order = np.concatenate([order, dups])
        order = order[rng.permutation(len(order))]
    return order.astype(np.int64)


# ---------------------------------------------------------------------------
# Payload synthesis — arithmetic functions of lsn (duplicates are verbatim).
# ---------------------------------------------------------------------------

def tokens_for(lsns: np.ndarray, lengths: np.ndarray, p: ChangelogParams) -> pa.ListArray:
    """list<int32> token arrays; tokens[j] = (seed*1e6 + lsn*M + j*S) % vocab."""
    lengths = lengths.astype(np.int64)
    offsets = np.zeros(len(lsns) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    base = (np.int64(p.seed) * np.int64(1_000_003) + lsns * _TOK_MULT) % np.int64(p.vocab)
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    flat = (np.repeat(base, lengths) + j * _TOK_STEP) % np.int64(p.vocab)
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()).cast(pa.int32()),
        pa.array(flat.astype(np.int32)),
    )


def quality_for(lsns: np.ndarray) -> np.ndarray:
    """Deterministic float64 in [0,1) from the lsn (schema-v2 column)."""
    h = (lsns.astype(np.uint64) * np.uint64(11400714819323198485)) >> np.uint64(32)
    return (h % np.uint64(1 << 32)).astype(np.float64) / float(1 << 32)


def doc_ids_for(doc_idx: np.ndarray) -> pa.Array:
    return pa.array(np.char.add("doc", np.char.zfill(doc_idx.astype("U8"), 8)))


_OP_NAMES = np.array(["insert", "update", "delete"])


def events_table(pl_: dict[str, np.ndarray], lsns: np.ndarray, p: ChangelogParams, version: int) -> pa.Table:
    """Materialize the events at ``lsns`` (delivery order) as one Arrow table
    with the PHYSICAL schema of ``version`` (v1: no quality, n_tok int32;
    v2: quality column, n_tok int64)."""
    doc_idx = pl_["doc_idx"][lsns]
    op = pl_["op"][lsns]
    n_tok = pl_["n_tok"][lsns]
    is_del = op == 2
    lengths = np.where(is_del, 0, n_tok)
    tokens = tokens_for(lsns, lengths, p)
    if is_del.any():
        mask = pa.array(~is_del)
        tokens = pa.ListArray.from_arrays(
            tokens.offsets, tokens.values, mask=pa.array(is_del)
        )
    n_tok_arr = pa.array(n_tok.astype(np.int64 if version >= 2 else np.int32),
                         mask=is_del)
    cols: dict[str, pa.Array] = {
        "lsn": pa.array(lsns, type=pa.int64()),
        "op": pa.array(_OP_NAMES[op]),
        "schema_ver": pa.array(pl_["schema_ver"][lsns], type=pa.int32()),
        "doc_id": doc_ids_for(doc_idx),
        "tokens": tokens,
        "n_tok": n_tok_arr,
        "source": pa.array(SOURCES[pl_["source_idx"][lsns]]),
    }
    if version >= 2:
        cols["quality"] = pa.array(quality_for(lsns), mask=is_del)
    return pa.table(cols)


def _write_shard(out_dir: str, pl_: dict, lsns: np.ndarray, p: ChangelogParams,
                 shard_idx: int) -> list[str]:
    files: list[str] = []
    vers = pl_["schema_ver"][lsns]
    for v in sorted(np.unique(vers)):
        sub = lsns[vers == v]
        t = events_table(pl_, sub, p, int(v))
        path = os.path.join(out_dir, f"shard-{shard_idx:04d}-v{int(v)}.parquet")
        pq.write_table(t, path)
        files.append(path)
    return files


def write_changelog(out_dir: str, p: ChangelogParams, parallel: bool | None = None) -> list[str]:
    """Write the delivery stream as ``n_shards`` parquet shard groups under
    ``out_dir``. A shard containing both schema versions is split into
    physically distinct ``-v1`` / ``-v2`` files (old files genuinely carry
    the old schema, so readers must unify — the evolution path under test).

    Shard payload synthesis is embarrassingly parallel (each shard is a pure
    function of the broadcast plan arrays + its LSN slice); when a Ray
    session exists (and the stream is big enough to matter) shards are
    generated by Ray tasks against a `ray.put` copy of the plan. Output is
    bit-identical to the serial path. Returns file paths in delivery order.
    """
    os.makedirs(out_dir, exist_ok=True)
    pl_ = plan(p)
    order = delivery_order(p)
    shards = [s for s in np.array_split(order, p.n_shards) if len(s)]

    if parallel is None:
        try:
            import ray

            parallel = ray.is_initialized() and p.n_events >= 200_000
        except ImportError:  # pragma: no cover
            parallel = False

    if parallel:
        import ray

        plan_ref = ray.put(pl_)

        @ray.remote
        def _gen(i: int, lsns: np.ndarray) -> list[str]:
            return _write_shard(out_dir, ray.get(plan_ref), lsns, p, i)

        parts = ray.get([_gen.remote(i, s) for i, s in enumerate(shards)])
        return [f for fs in parts for f in fs]

    files: list[str] = []
    for i, lsns in enumerate(shards):
        files += _write_shard(out_dir, pl_, lsns, p, i)
    return files


def changelog_cache_dir(p: ChangelogParams, root: str = "/tmp/vlm_eden_changelogs") -> str:
    """Stable cache path for a parameter set (bench reuses generated data)."""
    key = (
        f"s{p.seed}_d{p.n_docs}_e{p.n_events}_dup{p.dup_frac}_del{p.delete_frac}"
        f"_sc{p.schema_change_at}_z{p.zipf_s}_mt{p.mean_tok}_sh{p.n_shards}"
    )
    return os.path.join(root, key)


def ensure_changelog(p: ChangelogParams, root: str = "/tmp/vlm_eden_changelogs") -> list[str]:
    """Generate-once cache: returns shard files, generating if absent."""
    d = changelog_cache_dir(p, root)
    marker = os.path.join(d, "_COMPLETE")
    if os.path.exists(marker):
        return sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
    files = write_changelog(d, p)
    with open(marker, "w") as fh:
        fh.write("ok")
    return sorted(files)
