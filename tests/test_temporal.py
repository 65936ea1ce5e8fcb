"""Row-dependent timezone-local date bucketing (reference T7,
queries/fact_studies.py:101-106): DST boundaries, half-hour offsets,
null timezones, and date rollover across the UTC boundary."""

import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.temporal import local_date_array, with_local_date


def _ts(s):
    import datetime
    return datetime.datetime.fromisoformat(s)


def test_local_date_array_rollover_and_offsets():
    ts = pa.array([
        _ts("2024-01-01T20:00:00"),   # Tokyo: Jan 2; LA: Jan 1
        _ts("2024-01-01T05:00:00"),   # LA: Dec 31 2023
        _ts("2024-06-30T18:45:00"),   # Kolkata (+5:30): Jul 1 00:15
        _ts("2024-03-10T09:30:00"),   # LA DST spring-forward day: 01:30 PST→? still Mar 10
        _ts("2024-01-01T12:00:00"),   # null tz → null
    ], pa.timestamp("us"))
    tz = pa.array(["Asia/Tokyo", "America/Los_Angeles", "Asia/Kolkata",
                   "America/Los_Angeles", None])
    out = local_date_array(ts, tz)
    assert out.type == pa.date32()
    vals = out.to_pylist()
    assert str(vals[0]) == "2024-01-02"
    assert str(vals[1]) == "2023-12-31"
    assert str(vals[2]) == "2024-07-01"
    assert str(vals[3]) == "2024-03-10"
    assert vals[4] is None


def test_with_local_date_dataset():
    t = pa.table({
        "ts": pa.array([_ts("2024-01-01T23:30:00")] * 3, pa.timestamp("us")),
        "tz": ["UTC", "Europe/Paris", "America/New_York"],
    })
    ds = with_local_date(rd.from_arrow(t), "ts", "tz", alias="d")
    out = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    assert [str(x) for x in out.column("d").to_pylist()] == [
        "2024-01-01", "2024-01-02", "2024-01-01"]
