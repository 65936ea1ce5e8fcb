"""Deterministic synthetic scale-factor table generator.

The driver-provided ``/root/testdata/sf{0.001,0.01,0.1}`` dirs are
read-only and stop at sf0.1; the 10x scaling evidence (BASELINE.md
round-5) needs sf1-shaped inputs. This generator reproduces the driver
tables' schema (every output is cast to the REAL file's Arrow schema)
and marginal distributions — bootstrap resampling for numeric columns,
empirical frequencies for categoricals, vocabulary-preserving fresh
word draws for text (so duplicate-group growth with sf matches the
fixed-vocabulary source process instead of pathological exact tiling) —
at any sf, from a fixed seed. No external data: everything derives from
the reference sf dir passed in.

Validation protocol: generate at the REFERENCE's own sf into a scratch
dir and compare per-query wall times against the real dir — parity
there makes the sf1 numbers a credible 10x read (see BASELINE.md).

Usage: python tools/gen_sf.py SF OUTDIR [REF_DIR]
  e.g. python tools/gen_sf.py 1 /tmp/testdata/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF_DEFAULT = "/root/testdata/sf0.1"
REF_SF = 0.1  # scale factor of the reference dir

# rows per table at sf=1 (extrapolated from the driver's sf ladder:
# counts scale linearly in sf; region/nation are fixed)
ROWS_SF1 = {
    "events": 1_000_000,
    "documents": 50_000,
    "orders": 1_500_000,
    "customer": 150_000,
    "part": 200_000,
    "supplier": 10_000,
    "lineitem": 6_000_000,
    "embeddings": 20_000,
}
N_USERS_SF1 = 15_000  # events.user_id cardinality at sf=1


def _boot(rng: np.random.Generator, real: pa.ChunkedArray, n: int) -> np.ndarray:
    """Bootstrap-resample a column's marginal distribution."""
    v = real.to_numpy(zero_copy_only=False)
    return v[rng.integers(0, len(v), n)]


def _cat(rng: np.random.Generator, real: pa.ChunkedArray, n: int) -> pa.Array:
    """Resample a categorical column from its empirical frequencies."""
    vals, counts = np.unique(
        np.asarray(real.to_pylist(), dtype=object), return_counts=True)
    return pa.array(rng.choice(vals, n, p=counts / counts.sum()))


def gen_events(rng, ref: pa.Table, n: int, n_users: int) -> pa.Table:
    ts_us = ref.column("ts").cast(pa.int64()).to_numpy()
    lo, hi = int(ts_us.min()), int(ts_us.max())
    ts = np.sort(rng.integers(lo, hi + 1, n))
    return pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": rng.integers(0, n_users, n),
        "event_type": _cat(rng, ref.column("event_type"), n),
        "value": _boot(rng, ref.column("value"), n),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]),
    })


def gen_documents(rng, ref: pa.Table, n: int) -> pa.Table:
    texts = ref.column("text").to_pylist()
    words = [t.split() for t in texts]
    vocab, counts = np.unique(
        np.concatenate([np.asarray(w, dtype=object) for w in words]),
        return_counts=True)
    lens = np.asarray([len(w) for w in words])
    doc_lens = lens[rng.integers(0, len(lens), n)]
    flat = rng.choice(vocab, int(doc_lens.sum()), p=counts / counts.sum())
    offs = np.concatenate([[0], np.cumsum(doc_lens)])
    text = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(n)]
    return pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": pa.array(text),
        "lang": _cat(rng, ref.column("lang"), n),
        "source": _cat(rng, ref.column("source"), n),
        "n_chars": np.asarray([len(t) for t in text], np.int64),
    })


def gen_part(rng, ref: pa.Table, n: int) -> pa.Table:
    return pa.table({
        "p_partkey": np.arange(n, dtype=np.int64),
        "p_name": _cat(rng, ref.column("p_name"), n),
        "p_brand": _cat(rng, ref.column("p_brand"), n),
        "p_type": _cat(rng, ref.column("p_type"), n),
        "p_size": _boot(rng, ref.column("p_size"), n),
        "p_retailprice": _boot(rng, ref.column("p_retailprice"), n),
    })


def gen_customer(rng, ref: pa.Table, n: int) -> pa.Table:
    return pa.table({
        "c_custkey": np.arange(n, dtype=np.int64),
        "c_name": pa.array([f"Customer#{k:09d}" for k in range(n)]),
        "c_nationkey": _boot(rng, ref.column("c_nationkey"), n),
        "c_acctbal": _boot(rng, ref.column("c_acctbal"), n),
        "c_mktsegment": _cat(rng, ref.column("c_mktsegment"), n),
    })


def gen_supplier(rng, ref: pa.Table, n: int) -> pa.Table:
    return pa.table({
        "s_suppkey": np.arange(n, dtype=np.int64),
        "s_name": pa.array([f"Supplier#{k:09d}" for k in range(n)]),
        "s_nationkey": _boot(rng, ref.column("s_nationkey"), n),
        "s_acctbal": _boot(rng, ref.column("s_acctbal"), n),
    })


def gen_orders(rng, ref: pa.Table, n: int, n_cust: int) -> pa.Table:
    return pa.table({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n),
        "o_orderstatus": _cat(rng, ref.column("o_orderstatus"), n),
        "o_totalprice": _boot(rng, ref.column("o_totalprice"), n),
        "o_orderdate": pa.array(
            _boot(rng, ref.column("o_orderdate").cast(pa.int64()), n),
            pa.timestamp("us")),
        "o_orderpriority": _cat(rng, ref.column("o_orderpriority"), n),
    })


def gen_lineitem(rng, ref: pa.Table, n: int, n_orders: int, n_parts: int,
                 n_supp: int) -> pa.Table:
    return pa.table({
        "l_orderkey": rng.integers(0, n_orders, n),
        "l_partkey": rng.integers(0, n_parts, n),
        "l_suppkey": rng.integers(0, n_supp, n),
        "l_linenumber": _boot(rng, ref.column("l_linenumber"), n),
        "l_quantity": _boot(rng, ref.column("l_quantity"), n),
        "l_extendedprice": _boot(rng, ref.column("l_extendedprice"), n),
        "l_discount": _boot(rng, ref.column("l_discount"), n),
        "l_tax": _boot(rng, ref.column("l_tax"), n),
        "l_returnflag": _cat(rng, ref.column("l_returnflag"), n),
        "l_linestatus": _cat(rng, ref.column("l_linestatus"), n),
        "l_shipdate": pa.array(
            _boot(rng, ref.column("l_shipdate").cast(pa.int64()), n),
            pa.timestamp("us")),
    })


def gen_embeddings(rng, ref: pa.Table, n: int) -> pa.Table:
    """Preserve the reference's cluster structure: per-label mean + noise
    scaled to the per-label residual std, so kmeans/semdedup workloads see
    the same geometry at 10x the points."""
    labels = ref.column("label").to_numpy()
    mat = np.vstack(ref.column("embedding").to_pylist()).astype(np.float32)
    uniq = np.unique(labels)
    centers = {l: mat[labels == l].mean(axis=0) for l in uniq}
    stds = {l: mat[labels == l].std(axis=0) for l in uniq}
    new_labels = labels[rng.integers(0, len(labels), n)]
    out = np.empty((n, mat.shape[1]), np.float32)
    for l in uniq:
        m = new_labels == l
        out[m] = centers[l] + rng.standard_normal(
            (int(m.sum()), mat.shape[1])).astype(np.float32) * stds[l]
    return pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array(list(out), pa.list_(pa.float32())),
        "label": new_labels,
    })


def main():
    sf = float(sys.argv[1])
    out_dir = sys.argv[2]
    ref_dir = sys.argv[3] if len(sys.argv) > 3 else REF_DEFAULT
    os.makedirs(out_dir, exist_ok=True)

    def rows(t: str) -> int:
        return max(1, int(ROWS_SF1[t] * sf))

    n_users = max(1, int(N_USERS_SF1 * sf))
    ref = {t: pq.read_table(f"{ref_dir}/{t}.parquet")
           for t in list(ROWS_SF1) + ["region", "nation"]}

    built = {
        "events": lambda r: gen_events(r, ref["events"], rows("events"),
                                       n_users),
        "documents": lambda r: gen_documents(r, ref["documents"],
                                             rows("documents")),
        "part": lambda r: gen_part(r, ref["part"], rows("part")),
        "customer": lambda r: gen_customer(r, ref["customer"],
                                           rows("customer")),
        "supplier": lambda r: gen_supplier(r, ref["supplier"],
                                           rows("supplier")),
        "orders": lambda r: gen_orders(r, ref["orders"], rows("orders"),
                                       rows("customer")),
        "lineitem": lambda r: gen_lineitem(
            r, ref["lineitem"], rows("lineitem"), rows("orders"),
            rows("part"), rows("supplier")),
        "embeddings": lambda r: gen_embeddings(r, ref["embeddings"],
                                               rows("embeddings")),
    }
    for i, (t, fn) in enumerate(built.items()):
        rng = np.random.default_rng(42_000 + i)
        tbl = fn(rng).cast(pa.schema(
            [ref[t].schema.field(nm) for nm in ref[t].column_names]))
        pq.write_table(tbl, f"{out_dir}/{t}.parquet")
        print(f"wrote {t}: {tbl.num_rows} rows")
    for t in ("region", "nation"):  # fixed-size dims: copy verbatim
        pq.write_table(ref[t], f"{out_dir}/{t}.parquet")
        print(f"wrote {t}: {ref[t].num_rows} rows (copied)")


if __name__ == "__main__":
    main()
