"""Funnel conversion and cohort retention over event streams."""

import datetime as dt

import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.behavior import (
    cohort_retention,
    funnel_conversion,
)


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None))


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_funnel_strict_order_and_partial_progress():
    events = pa.table({
        "user_id": [1, 1, 1,   2, 2,   3, 3, 3,   4],
        "event_type": ["a", "b", "c",   # user1 completes in order
                       "b", "a",        # user2: b BEFORE a -> step 1 only
                       "a", "c", "b",   # user3: c before b -> stops at a;
                                        # b after a counts -> step 2
                       "c"],            # user4 never did step a -> 0 steps
        "ts": [_ts(1), _ts(2), _ts(3),
               _ts(1), _ts(2),
               _ts(1), _ts(2), _ts(3),
               _ts(1)],
    })
    out = _collect(funnel_conversion(
        rd.from_arrow(events), "user_id", "event_type", "ts",
        ["a", "b", "c"]))
    got = dict(zip(out.column("step").to_pylist(),
                   out.column("n_users").to_pylist()))
    # step1 (a): users 1,2,3; step2 (b after a): users 1,3; step3: user 1
    assert got == {1: 3, 2: 2, 3: 1}
    assert out.column("step_name").to_pylist() == ["a", "b", "c"]


def test_funnel_same_timestamp_not_counted():
    events = pa.table({
        "user_id": [1, 1],
        "event_type": ["a", "b"],
        "ts": [_ts(1), _ts(1)],   # b at the SAME instant as a: strict >
    })
    out = _collect(funnel_conversion(
        rd.from_arrow(events), "user_id", "event_type", "ts", ["a", "b"]))
    got = dict(zip(out.column("step").to_pylist(),
                   out.column("n_users").to_pylist()))
    assert got == {1: 1, 2: 0}


def test_cohort_retention_weekly_offsets():
    events = pa.table({
        "user_id": [1, 1, 1, 1,  2, 2],
        # user1 first active Jan 1; active again Jan 2 (offset 0),
        # Jan 9 and Jan 10 (offset 1) — duplicate offsets collapse.
        # user2 first active Jan 9, again Jan 20 (offset 1).
        "ts": [_ts(1), _ts(2), _ts(9), _ts(10),
               _ts(9), _ts(20)],
    })
    out = _collect(cohort_retention(
        rd.from_arrow(events), "user_id", "ts", period_days=7))
    rows = sorted(zip(
        (d.isoformat() for d in out.column("cohort_day").to_pylist()),
        out.column("period_offset").to_pylist(),
        out.column("n_users").to_pylist()))
    assert rows == [("2024-01-01", 0, 1), ("2024-01-01", 1, 1),
                    ("2024-01-09", 0, 1), ("2024-01-09", 1, 1)]
