"""Local emulation of the driver's correctness gate: run every
``__ray_entry__.queries()`` entry and its DuckDB oracle side-by-side and
compare row count, column names/types, and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query ...] [--json PATH]

``--json PATH`` additionally writes a per-query artifact in the driver's
CORRECTNESS format (rows/schema/hash match booleans + row counts + err),
so a full sweep can be committed per round and audited.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_table(res) -> pa.Table:
    import ray.data as rd

    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    if isinstance(res, rd.Dataset):
        batches = list(res.iter_batches(batch_format="pyarrow", batch_size=None))
        if not batches:
            return pa.table({})
        from vlm_eden_dataset_etl_ray.apply import union_schemas
        from vlm_eden_dataset_etl_ray.schema import unify_table

        target = union_schemas([b.schema for b in batches])
        return pa.concat_tables(unify_table(b, target) for b in batches)
    raise TypeError(type(res))


def canon(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda x: tuple(x) if x is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_t: pa.Table, ora_t: pa.Table) -> list[str]:
    problems = []
    if ray_t.num_rows != ora_t.num_rows:
        problems.append(f"rowcount ray={ray_t.num_rows} oracle={ora_t.num_rows}")
    rcols, ocols = sorted(ray_t.column_names), sorted(ora_t.column_names)
    if rcols != ocols:
        problems.append(f"columns ray={rcols} oracle={ocols}")
        return problems
    for c in rcols:
        rt, ot = ray_t.schema.field(c).type, ora_t.schema.field(c).type
        if not rt.equals(ot):
            problems.append(f"dtype[{c}] ray={rt} oracle={ot}")
    if problems:
        return problems
    a, b = canon(ray_t), canon(ora_t)
    if not a.equals(b):
        neq = [c for c in a.columns if not a[c].equals(b[c])]
        for c in neq[:3]:
            mism = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
            idx = mism[mism].index[:3].tolist()
            problems.append(
                f"values[{c}] first diffs at {idx}: ray={a[c].iloc[idx].tolist() if idx else []} "
                f"oracle={b[c].iloc[idx].tolist() if idx else []}"
            )
        if not neq:
            problems.append("frames differ (row alignment)")
    return problems


def main():
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    # accept space- and/or comma-separated names; tolerate an "--only" flag
    only = {n for a in argv[1:] for n in a.split(",") if n and n != "--only"}

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:  # a filter that matches nothing must not pass vacuously
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_t = to_table(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "ray_rows": None,
                             "oracle_rows": None, "sec": None,
                             "err": f"query raised {type(e).__name__}: {e}"}
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={ray_t.num_rows} ({dt:.1f}s) [rows-only, no oracle]")
            results[name] = {"rows_match": True, "schema_match": None,
                             "hash_match": None, "ray_rows": ray_t.num_rows,
                             "oracle_rows": None, "sec": round(dt, 2),
                             "err": None, "no_oracle": True}
            continue
        try:
            ora_t = con.sql(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "ray_rows": ray_t.num_rows,
                             "oracle_rows": None, "sec": round(dt, 2),
                             "err": f"oracle raised {type(e).__name__}: {e}"}
            continue
        problems = compare(name, ray_t, ora_t)
        results[name] = {
            "rows_match": ray_t.num_rows == ora_t.num_rows,
            "schema_match": not any(p.startswith(("columns", "dtype"))
                                    for p in problems),
            "hash_match": not problems,
            "ray_rows": ray_t.num_rows, "oracle_rows": ora_t.num_rows,
            "sec": round(dt, 2),
            "err": "; ".join(problems) if problems else None,
        }
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s):")
            for p in problems:
                print(f"     - {p}")
        else:
            print(f"PASS {name}: rows={ray_t.num_rows} ({dt:.1f}s)")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(results),
                       "n_fail": n_fail, "queries": results}, f, indent=1)
        print(f"wrote {json_path}")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
