"""Flagship training-corpus preparation pipeline.

Chains the LLM-data operator family end-to-end, each stage a streaming
Dataset transform (no full materialization except the two tiny broadcast
fits noted inline):

    read → token/quality stats → quality gate → language ID + filter
    → exact dedup (content hash) → MinHash near-dup clustering (keep one
    doc per cluster) → benchmark decontamination → deterministic
    train/test split → resumable partitioned write

Every stage is the library operator, not a reimplementation — this module
is composition + row accounting only. At 100 TB each arrow is a streaming
exchange or a map; the only driver-resident state is the benchmark n-gram
hash set (eval-set-sized) and the per-stage row counters.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from vlm_eden_dataset_etl_ray.metrics import RunMetrics


@dataclass
class CorpusParams:
    min_words: int = 5
    max_stopword_ratio: float = 0.9
    keep_langs: tuple[str, ...] = ("en",)
    jaccard_threshold: float = 0.97
    benchmark_ngram: int = 8
    test_frac: float = 0.1
    counts: dict = field(default_factory=dict)  # stage → rows (filled in run)
    metrics: object = None  # RunMetrics handle, set by prepare_corpus


def prepare_corpus(
    docs: rd.Dataset,
    benchmark_texts,
    params: CorpusParams | None = None,
    out_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Run the full preparation chain over ``docs`` (columns: id, text,
    lang optional). Returns the surviving documents with ``split``
    assigned; if ``out_dir`` is given, also writes the resumable
    partitioned output. ``params.counts`` records per-stage row counts via
    a :class:`~vlm_eden_dataset_etl_ray.metrics.RunMetrics` tap (one tiny
    actor call per batch — no pipeline re-execution), filled after the
    single end-to-end execution; ``params.metrics`` keeps the handle so
    callers can persist the full run report (``write_report``)."""
    from vlm_eden_dataset_etl_ray.functions.contamination import (
        benchmark_ngram_set, decontaminate)
    from vlm_eden_dataset_etl_ray.functions.dedup import exact_dedup, minhash_dedup
    from vlm_eden_dataset_etl_ray.functions.text import (
        deterministic_split, lang_id, quality_scores, token_stats)

    p = params or CorpusParams()
    m = p.metrics = RunMetrics()
    ds = m.tap(docs, "input")

    # 1. quality gate: vectorized stats, then one filter
    ds = token_stats(ds, text_col)
    ds = quality_scores(ds, text_col)

    def _quality(t: pa.Table) -> pa.Table:
        keep = pc.and_kleene(
            pc.greater_equal(t.column("n_words"), p.min_words),
            pc.less_equal(t.column("stopword_ratio"), p.max_stopword_ratio))
        return t.filter(pc.fill_null(keep, False))

    ds = ds.map_batches(_quality, batch_format="pyarrow", zero_copy_batch=True)
    ds = m.tap(ds, "quality")

    # 2. language gate
    ds = lang_id(ds)
    keep_langs = pa.array(list(p.keep_langs))

    def _lang(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("lang_pred"), value_set=keep_langs))

    ds = ds.map_batches(_lang, batch_format="pyarrow", zero_copy_batch=True)
    ds = m.tap(ds, "language")

    # 3. exact dedup on content — materialized AFTER the count tap: stage
    # 4 has TWO consumers (the corpus and its cluster labels); both read
    # the materialized frontier, so every count tap fires exactly once
    ds = exact_dedup(ds, on=[text_col], keep_by=id_col)
    ds = m.tap(ds, "exact_dedup").materialize()

    # 4. near-dup clustering: keep the representative of each cluster
    labels = minhash_dedup(ds, id_col, text_col, threshold=p.jaccard_threshold)
    kept = labels.map_batches(
        lambda t: t.filter(t.column("is_kept")).select([id_col]),
        batch_format="pyarrow", zero_copy_batch=True)
    from vlm_eden_dataset_etl_ray.functions.relational import auto_join
    # kept is id-only and strictly smaller than the corpus: the planner
    # broadcasts it (one object-store ship, no shuffle) until it outgrows
    # the broadcast budget, then falls back to the bucketed join with the
    # corpus bytes as the hint (ds is materialized → size_bytes() is free)
    ds = auto_join(ds, kept.map_batches(
        lambda t: t.rename_columns(["__keep_id"]), batch_format="pyarrow"),
        id_col, "__keep_id", how="inner", bytes_hint=ds.size_bytes() or None)
    ds = ds.map_batches(lambda t: t.drop_columns(["__keep_id"]),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = m.tap(ds, "near_dedup")

    # 5. decontamination against the benchmark
    bench = benchmark_ngram_set(benchmark_texts, n=p.benchmark_ngram)
    ds = decontaminate(ds, bench, text_col, n=p.benchmark_ngram)
    ds = m.tap(ds, "decontaminated")

    # 6. deterministic split
    ds = deterministic_split(ds, id_col, test_frac=p.test_frac)

    if out_dir is not None:
        from vlm_eden_dataset_etl_ray.sinks.partitioned import write_partitioned
        stats = write_partitioned(ds, out_dir, id_col)
        p.counts["written"] = int(
            pa.compute.sum(stats.column("rows")).as_py() or 0)
    else:
        ds = ds.materialize()  # one execution fills the counters
    p.counts.update(m.counts())
    return ds
