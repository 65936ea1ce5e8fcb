"""Flagship corpus-prep pipeline: stage accounting is monotone, output is
deduped/decontaminated/split, and the run is deterministic."""

import shutil

import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.pipelines.corpus import CorpusParams, prepare_corpus

OUT = "/tmp/test_corpus_out"


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))


def test_prepare_corpus_end_to_end():
    docs = rd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    bench = _collect(rd.read_parquet(
        "/root/testdata/sf0.01/documents.parquet",
        columns=["doc_id", "text"]).filter(lambda r: r["doc_id"] < 10)
    ).column("text")
    shutil.rmtree(OUT, ignore_errors=True)
    p = CorpusParams(keep_langs=("en", "de", "es", "fr", "zh"))
    out = prepare_corpus(docs, bench, p, out_dir=OUT)
    t = _collect(out)

    c = p.counts
    # monotone shrink through the funnel, nothing lost by the writer
    assert c["input"] >= c["quality"] >= c["language"] >= c["exact_dedup"] \
        >= c["near_dedup"] >= c["decontaminated"] > 0
    assert c["written"] == c["decontaminated"] == t.num_rows

    # benchmark docs (id < 10, >=8 words) cannot survive decontamination
    surviving = set(t.column("doc_id").to_pylist())
    texts = dict(zip(
        _collect(docs).column("doc_id").to_pylist(),
        _collect(docs).column("text").to_pylist()))
    for did in surviving:
        if did < 10:
            assert len(texts[did].split(" ")) < 8

    # split column present and two-valued
    assert set(t.column("split").to_pylist()) <= {"train", "test"}

    # deterministic: second run (fresh out dir) yields identical ids
    shutil.rmtree(OUT, ignore_errors=True)
    out2 = prepare_corpus(docs, bench, CorpusParams(
        keep_langs=("en", "de", "es", "fr", "zh")))
    assert sorted(_collect(out2).column("doc_id").to_pylist()) == sorted(surviving)
    shutil.rmtree(OUT, ignore_errors=True)
