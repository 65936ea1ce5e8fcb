"""Tests for combined-row synthesis (reference T2/T4/T5) and the
multi-table star-schema ETL pipeline (run_etl analog)."""

import pyarrow as pa

from vlm_eden_dataset_etl_ray.functions.synthesis import (
    combine_and_sort_values, propagate_renames, synthesize_combined)


CATALOG = pa.table(
    {
        "identifier": ["CT", "MR", "US"],
        "name": ["CompTomo", "MagRes", "Ultra"],
        "name_es": ["TomoComp", "ResMag", "Ultras"],
        "description": ["ct scan", "mr scan", "us scan"],
    }
)


def test_combine_and_sort_values():
    assert combine_and_sort_values("b", "a") == "a,b"
    assert combine_and_sort_values(None, "x") == "x"
    assert combine_and_sort_values("x", None) == "x"


def test_synthesize_combined_folds_and_dedups():
    out = synthesize_combined(
        CATALOG, ["MR,CT", "CT,MR", "CT,MR,US", "CT", "CT,XX"],
        name_fields=("name", "name_es"),
    )
    # "MR,CT" and "CT,MR" canonicalize to one row; single/unknown skipped
    assert out.column("identifier").to_pylist() == ["CT,MR", "CT,MR,US"]
    row = out.to_pylist()[0]
    assert row["name"] == "CompTomo,MagRes"  # commutative sorted merge
    assert row["name_es"] == "ResMag,TomoComp"
    assert row["description"] == "ct scan,mr scan"


def test_propagate_renames_rebuilds_from_current_catalog():
    combined = synthesize_combined(CATALOG, ["CT,MR"], name_fields=("name",))
    renamed = CATALOG.set_column(
        1, "name", pa.array(["NewCT", "MagRes", "Ultra"])
    )
    out = propagate_renames(combined, renamed, name_fields=("name",))
    assert out.to_pylist()[0]["name"] == "MagRes,NewCT"


def test_run_etl_star(tmp_path):
    import duckdb

    from vlm_eden_dataset_etl_ray.pipelines.etl import fact_snapshot, run_etl

    sf_dir = "/root/testdata/sf0.001"
    lakes = run_etl(sf_dir, str(tmp_path))
    ds = fact_snapshot(lakes)
    got = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))

    con = duckdb.connect()
    con.sql(f"create view events as select * from '{sf_dir}/events.parquet'")
    con.sql(f"create view customer as select * from '{sf_dir}/customer.parquet'")
    exp = con.sql(
        """
        with chg as (select event_id lsn,
               case when event_type='error' then 'delete' else 'upsert' end op,
               'doc'||cast(user_id as varchar) doc_id, user_id,
               cast(floor(value*100) as bigint) n_tok, event_type source from events),
        latest as (select * from chg
                   qualify row_number() over (partition by doc_id order by lsn desc)=1)
        select l.doc_id, l.lsn, l.user_id, l.n_tok, l.source, c.c_name
        from latest l left join customer c on l.user_id = c.c_custkey
        where l.op <> 'delete'
        """
    ).arrow()
    assert got.num_rows == exp.num_rows
    g = got.sort_by("doc_id").select(sorted(got.column_names))
    e = exp.sort_by("doc_id").select(sorted(exp.column_names))
    e = e.cast(g.schema)
    assert g.equals(e)

    # idempotence: re-running the whole ETL against the same snapshot is a no-op
    lakes2 = run_etl(sf_dir, str(tmp_path))
    ds2 = fact_snapshot(lakes2)
    got2 = pa.concat_tables(ds2.iter_batches(batch_format="pyarrow", batch_size=None))
    assert got2.sort_by("doc_id").equals(got.sort_by("doc_id"))
