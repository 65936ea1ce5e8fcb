"""Span-level (C4-style) sub-document dedup and time-windowed debounce."""

import datetime as dt

import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.dedup import span_dedup
from vlm_eden_dataset_etl_ray.functions.windows import debounce


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None))


def test_span_dedup_keeps_first_occurrence_and_drops_empty_docs():
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a b c d e f",          # spans: "a b c", "d e f"
            "d e f x y z",          # "d e f" already seen in doc 1
            "a b c d e f",          # every span seen -> doc vanishes
            "q r",                  # short doc: one partial span "q r"
        ],
    })
    out = _collect(span_dedup(rd.from_arrow(docs), span_words=3))
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("text").to_pylist()))
    assert got == {1: "a b c d e f", 2: "x y z", 4: "q r"}


def test_span_dedup_within_one_doc_and_positional_order():
    docs = pa.table({
        "doc_id": [7],
        "text": ["a b a b c d a b"],  # spans (2w): "a b","a b","c d","a b"
    })
    out = _collect(span_dedup(rd.from_arrow(docs), span_words=2))
    assert out.column("text").to_pylist() == ["a b c d"]


def test_debounce_lag_semantics_multi_key():
    t0 = dt.datetime(2024, 1, 1)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    events = pa.table({
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "user_id": [1, 1, 1, 1, 2, 1, 1],
        "event_type": ["a", "a", "a", "a", "a", "b", "a"],
        # user1/a at 0, 5, 9, 20; user2/a at 6; user1/b at 6; user1/a at 20
        "ts": [ts(0), ts(5), ts(9), ts(20), ts(6), ts(6), ts(20)],
    })
    out = _collect(debounce(
        rd.from_arrow(events), ["user_id", "event_type"], "ts",
        gap_seconds=600.0, order_cols=["ts", "event_id"]))
    kept = sorted(out.column("event_id").to_pylist())
    # user1/a: keep t=0; drop t=5 (5m after 0) and t=9 (4m after 5 — lag
    # compares the PREVIOUS ROW, kept or not); keep first t=20 (11m after
    # 9); drop duplicate t=20 (tie). user2/a and user1/b: first rows kept.
    assert kept == [1, 4, 5, 6]
