"""Property-based tests (hypothesis) for the engine core — no Ray needed:
the LWW reduce against a sequential dict oracle, range-lineage coalescing,
and schema unification round-trips."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from vlm_eden_dataset_etl_ray import manifest as mf
from vlm_eden_dataset_etl_ray import schema as sch
from vlm_eden_dataset_etl_ray.spec import TableSpec
from vlm_eden_dataset_etl_ray.stages import lww

SPEC = TableSpec(key="k", order="lsn")

ops = st.lists(
    st.tuples(
        st.integers(0, 9),            # key
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(0, 1000),         # value payload
    ),
    min_size=0, max_size=60,
)


@given(ops, st.randoms())
@settings(max_examples=200, deadline=None)
def test_lww_matches_sequential_oracle(seq, rnd):
    """Applying the events in ANY delivery order through the one-shot LWW
    reduce equals a sequential in-order apply: last write (max lsn) wins,
    deletes tombstone, duplicates collapse."""
    rows = [
        {"k": f"k{k}", "lsn": i, "op": op, "v": v}
        for i, (k, op, v) in enumerate(seq)
    ]
    # duplicate a few deliveries verbatim and shuffle the delivery order
    rows = rows + [dict(r) for r in rows[:: max(1, len(rows) // 7)]]
    rnd.shuffle(rows)
    if not rows:
        return
    t = pa.Table.from_pylist(rows)

    merged = lww.drop_tombstones(lww.lww_merge(t, SPEC), SPEC)

    state = {}
    for i, (k, op, v) in enumerate(seq):  # sequential oracle, lsn order
        if op == "delete":
            state.pop(f"k{k}", None)
        else:
            state[f"k{k}"] = (i, v)
    got = {r["k"]: (r["lsn"], r["v"]) for r in merged.to_pylist()}
    assert got == state


@given(ops)
@settings(max_examples=100, deadline=None)
def test_lww_is_associative(seq):
    """Reducing in two halves then reducing the concatenation equals one
    global reduce — the property that makes per-batch pre-reduce + final
    reduce (and merge-on-read over deltas) correct."""
    rows = [
        {"k": f"k{k}", "lsn": i, "op": op, "v": v}
        for i, (k, op, v) in enumerate(seq)
    ]
    if not rows:
        return
    t = pa.Table.from_pylist(rows)
    whole = lww.lww_merge(t, SPEC)
    mid = len(rows) // 2
    a = lww.lww_merge(pa.Table.from_pylist(rows[:mid]), SPEC) if mid else None
    b = lww.lww_merge(pa.Table.from_pylist(rows[mid:]), SPEC)
    parts = pa.concat_tables([x for x in (a, b) if x is not None])
    again = lww.lww_merge(parts, SPEC)
    assert again.sort_by("k").equals(whole.sort_by("k"))


@given(st.lists(st.tuples(st.integers(0, 100), st.integers(0, 30)), max_size=20))
@settings(max_examples=100, deadline=None)
def test_merge_ranges_invariants(spans):
    ranges: list[list[int]] = []
    covered = set()
    for lo, width in spans:
        ranges = mf.merge_ranges(ranges, lo, lo + width)
        covered.update(range(lo, lo + width + 1))
    flat = set()
    prev_hi = None
    for lo, hi in ranges:
        assert lo <= hi
        if prev_hi is not None:
            assert lo > prev_hi + 1  # coalesced: no adjacent/overlapping ranges
        prev_hi = hi
        flat.update(range(lo, hi + 1))
    assert flat == covered


@given(st.lists(st.integers(-2**31, 2**31 - 1), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_unify_widen_roundtrip(vals):
    t = pa.table({"x": pa.array(vals, pa.int32())})
    target = pa.schema([("x", pa.int64()), ("y", pa.float64())])
    u = sch.unify_table(t, target)
    assert u.column("x").to_pylist() == vals  # widen is lossless
    assert u.column("y").null_count == len(vals)


@given(
    st.lists(
        st.sampled_from(["add_str", "add_f64", "widen"]),
        min_size=0, max_size=6,
    )
)
@settings(max_examples=60, deadline=None)
def test_schema_evolution_chains_unify(ops):
    """Any chain of add-column / widen evolutions validates, and data written
    under ANY intermediate schema unifies losslessly to the final one."""
    from vlm_eden_dataset_etl_ray.state.registry import validate_evolution

    schema = pa.schema([("k", pa.string()), ("x", pa.int32())])
    schemas = [schema]
    widened = False
    for i, op in enumerate(ops):
        if op == "add_str":
            schema = pa.schema(list(schema) + [pa.field(f"s{i}", pa.string())])
        elif op == "add_f64":
            schema = pa.schema(list(schema) + [pa.field(f"f{i}", pa.float64())])
        elif op == "widen" and not widened:
            idx = schema.get_field_index("x")
            schema = schema.set(idx, pa.field("x", pa.int64()))
            widened = True
        validate_evolution(schemas[-1], schema)
        schemas.append(schema)

    t = pa.table({"k": ["a", "b"], "x": pa.array([1, 2], pa.int32())})
    final = schemas[-1]
    for s_mid in schemas:
        mid = sch.unify_table(t, s_mid)
        up = sch.unify_table(mid, final)
        assert up.schema.equals(final)
        assert up.column("x").to_pylist() == [1, 2]
        assert up.column("k").to_pylist() == ["a", "b"]


@given(st.lists(st.tuples(st.integers(0, (1 << 21) - 1),
                          st.integers(0, (1 << 21) - 1)),
                min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_morton_interleave_is_bijective_in_range(pairs):
    import numpy as np

    from vlm_eden_dataset_etl_ray.functions.hashing import morton_interleave

    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    z = morton_interleave([a, b], bits=21)
    # de-interleave: even bits -> a, odd bits -> b
    da = np.zeros(len(z), np.uint64)
    db = np.zeros(len(z), np.uint64)
    for j in range(21):
        da |= ((z >> np.uint64(2 * j)) & np.uint64(1)) << np.uint64(j)
        db |= ((z >> np.uint64(2 * j + 1)) & np.uint64(1)) << np.uint64(j)
    assert da.astype(np.int64).tolist() == a.tolist()
    assert db.astype(np.int64).tolist() == b.tolist()


@given(st.integers(-5, 5), st.integers((1 << 10) - 3, (1 << 10) + 5))
@settings(max_examples=50, deadline=None)
def test_morton_clamps_out_of_range(lo_val, hi_val):
    import numpy as np

    from vlm_eden_dataset_etl_ray.functions.hashing import morton_interleave

    a = np.array([lo_val, hi_val], dtype=np.int64)
    b = np.array([0, 0], dtype=np.int64)
    z = morton_interleave([a, b], bits=10)
    lim = (1 << 10) - 1
    ref = np.array([max(0, min(lo_val, lim)), max(0, min(hi_val, lim))],
                   dtype=np.int64)
    zr = morton_interleave([ref, b], bits=10)
    assert z.tolist() == zr.tolist()
