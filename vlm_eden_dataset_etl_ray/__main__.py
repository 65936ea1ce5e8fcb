"""Operational CLI — the engine's analog of the reference's entry points
(``run_worker.py`` / Celery beat schedules, /root/reference/celery_config.py):

    python -m vlm_eden_dataset_etl_ray apply   --lake L --changelog DIR_OR_FILES...
    python -m vlm_eden_dataset_etl_ray tail    --lake L --changelog DIR   # one tick
    python -m vlm_eden_dataset_etl_ray compact --lake L [--cluster-by a,b]
    python -m vlm_eden_dataset_etl_ray status  --lake L
    python -m vlm_eden_dataset_etl_ray metrics --lake L [--last N]
    python -m vlm_eden_dataset_etl_ray scan    --lake L --out DIR [--columns a,b]
    python -m vlm_eden_dataset_etl_ray feed    --lake L --out DIR --from N [--to M]
    python -m vlm_eden_dataset_etl_ray lookup  --lake L --keys k1,k2
    python -m vlm_eden_dataset_etl_ray clone   --lake L --dst L2      # zero-copy branch
    python -m vlm_eden_dataset_etl_ray restore --lake L --epoch N     # rollback
    python -m vlm_eden_dataset_etl_ray gen     --out DIR --events N [--docs N] ...

Cron scheduling stays external (systemd timer / cron / `ray job submit`
per epoch): an epoch == one ``apply``/``tail`` invocation, and exactly-once
manifests make overlapping or repeated invocations safe.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _changelog_files(args) -> list[str]:
    files: list[str] = []
    for c in args.changelog:
        if os.path.isdir(c):
            files += sorted(
                os.path.join(c, f) for f in os.listdir(c) if f.endswith(".parquet")
            )
        else:
            files.append(c)
    return files


def cmd_apply(args) -> dict:
    from vlm_eden_dataset_etl_ray import apply

    _ray_session()
    m = apply.apply_epoch(args.lake, _changelog_files(args))
    return {"epoch": m.epoch, "rows": m.total_rows(), "schema_version": m.schema_version}


def _parse_audit(flags: list[str] | None) -> list[tuple] | None:
    """CLI rule grammar (one rule per --audit flag):
    not_null:col | unique:col[,col2] | in_range:col:lo:hi |
    accepted_values:col:v1|v2|... | matches_regex:col:pattern"""
    if not flags:
        return None
    rules: list[tuple] = []
    for f in flags:
        kind, _, rest = f.partition(":")
        if kind == "not_null":
            rules.append(("not_null", rest))
        elif kind == "unique":
            cols = rest.split(",")
            rules.append(("unique", cols[0] if len(cols) == 1
                          else tuple(cols)))
        elif kind == "in_range":
            col, lo, hi = rest.split(":")
            rules.append(("in_range", col, float(lo) if "." in lo
                          else int(lo), float(hi) if "." in hi else int(hi)))
        elif kind == "accepted_values":
            col, _, vals = rest.partition(":")
            rules.append(("accepted_values", col, tuple(vals.split("|"))))
        elif kind == "matches_regex":
            col, _, pat = rest.partition(":")
            rules.append(("matches_regex", col, pat))
        else:
            raise SystemExit(f"unknown audit rule kind {kind!r}")
    return rules


def cmd_tail(args) -> dict:
    from vlm_eden_dataset_etl_ray.pipelines.cdc import run_incremental

    _ray_session()
    m = run_incremental(args.lake, args.changelog[0],
                        max_epoch_bytes=args.max_epoch_bytes or None,
                        audit=_parse_audit(args.audit))
    return {"epoch": m.epoch, "rows": m.total_rows(),
            "applied_inputs": len(m.applied_inputs)}


def cmd_tail_debezium(args) -> dict:
    """Tail a directory of Debezium-envelope JSONL shards (push-based CDC
    wire format) into the lake — exactly-once file-set lineage, backlog
    byte cap; the WAL-tail twin of the parquet `tail`."""
    from vlm_eden_dataset_etl_ray.pipelines.cdc import run_incremental_debezium

    _ray_session()
    m = run_incremental_debezium(args.lake, args.envelopes,
                                 max_epoch_bytes=args.max_epoch_bytes or None,
                                 audit=_parse_audit(args.audit))
    if m is None:
        return {"epoch": 0, "rows": 0, "applied_inputs": 0}
    return {"epoch": m.epoch, "rows": m.total_rows(),
            "applied_inputs": len(m.applied_inputs)}


def cmd_compact(args) -> dict:
    from vlm_eden_dataset_etl_ray import lake

    _ray_session()
    cluster = args.cluster_by.split(",") if args.cluster_by else None
    m = lake.compact(args.lake, cluster_by=cluster,
                     cluster_file_bytes=args.cluster_file_bytes)
    return {"epoch": m.epoch, "kind": m.kind, "rows": m.total_rows()}


def cmd_vacuum(args) -> dict:
    from vlm_eden_dataset_etl_ray import lake

    return lake.vacuum(args.lake, keep_epochs=args.keep_epochs)


def cmd_clone(args) -> dict:
    """Zero-copy shallow branch of a lake (one metadata commit)."""
    from vlm_eden_dataset_etl_ray import lake

    m = lake.clone(args.lake, args.dst)
    return {"src": args.lake, "dst": args.dst, "epoch": m.epoch,
            "rows": m.total_rows()}


def cmd_restore(args) -> dict:
    """Metadata-only rollback to a retained epoch (rewinds the ledger)."""
    from vlm_eden_dataset_etl_ray import lake

    m = lake.restore(args.lake, args.epoch)
    return {"lake": args.lake, "restored_to": args.epoch,
            "new_epoch": m.epoch, "rows": m.total_rows()}


def cmd_status(args) -> dict:
    from vlm_eden_dataset_etl_ray import manifest as mf

    m = mf.latest(args.lake)
    if m is None:
        return {"epochs": 0}
    return {
        "epochs": len(mf.list_epochs(args.lake)),
        "latest_epoch": m.epoch,
        "kind": m.kind,
        "schema_version": m.schema_version,
        "num_partitions": m.num_partitions,
        "rows": m.total_rows(),
        "watermark_lsn": max(
            (s.watermark_lsn for s in m.partitions.values()), default=-1
        ),
    }


def cmd_metrics(args) -> dict:
    from vlm_eden_dataset_etl_ray import metrics

    reps = metrics.list_reports(args.lake)
    if args.last:
        reps = reps[-args.last:]
    return {"runs": [
        {"run_id": r["run_id"], "wall_seconds": r["wall_seconds"],
         "stages": {k: v["rows"] for k, v in r["stages"].items()},
         "errors": len(r["errors"])}
        for r in reps
    ]}


def cmd_scan(args) -> dict:
    from vlm_eden_dataset_etl_ray import lake

    _ray_session()
    cols = args.columns.split(",") if args.columns else None
    ds = lake.scan(args.lake, columns=cols)
    ds.write_parquet(args.out)
    n = sum(1 for _ in os.listdir(args.out))
    return {"out": args.out, "files": n}


def cmd_feed(args) -> dict:
    """Change-data-feed export: the net per-key changes in epochs
    (from, to] written as parquet for a downstream consumer."""
    from vlm_eden_dataset_etl_ray import lake

    _ray_session()
    cols = args.columns.split(",") if args.columns else None
    ds = lake.change_feed(args.lake, from_epoch=args.from_epoch,
                          to_epoch=args.to_epoch, columns=cols)
    os.makedirs(args.out, exist_ok=True)
    ds.write_parquet(args.out)
    return {"out": args.out,
            "files": sum(1 for f in os.listdir(args.out) if f.endswith(".parquet"))}


def cmd_lookup(args) -> dict:
    """Point read: current row(s) for the given keys, printed as JSON."""
    from vlm_eden_dataset_etl_ray import lake

    _ray_session()
    cols = args.columns.split(",") if args.columns else None
    t = lake.lookup(args.lake, args.keys.split(","), columns=cols)
    return {"rows": t.to_pylist()}


def cmd_fsck(args) -> dict:
    """Lake consistency check: metadata invariants (missing/empty files,
    lineage monotonicity, parseability) by default; --deep adds the
    duplicate-live-key and bloom self-consistency scans (pass --key/--order
    when the lake's spec differs from the default)."""
    from vlm_eden_dataset_etl_ray import lake
    from vlm_eden_dataset_etl_ray.spec import TOKENS_SPEC, TableSpec

    spec = TOKENS_SPEC
    if args.key or args.order:
        spec = TableSpec(name="fsck", key=args.key or TOKENS_SPEC.key,
                         order=args.order or TOKENS_SPEC.order, envelope=())
    if args.deep:
        _ray_session()
    return lake.fsck(args.lake, spec=spec, deep=args.deep)


def cmd_constraints(args) -> dict:
    """Show (default), set (--set, repeated, replaces all) or clear
    (--clear) the lake's persistent table constraints. Rules use the
    --audit grammar; every subsequent registry-backed apply audits them."""
    from vlm_eden_dataset_etl_ray.functions.quality import rule_name
    from vlm_eden_dataset_etl_ray.state.registry import SchemaRegistryState

    st = SchemaRegistryState(args.lake)
    if args.clear:
        st.set_constraints([])
    elif args.set:
        st.set_constraints(_parse_audit(args.set))
    return {"constraints": [rule_name(r) for r in st.constraints()]}


def cmd_dlq(args) -> dict:
    """Inspect (default) or purge the dead-letter queue. Inspection
    reports per-epoch-id row counts and reason histogram; ``--purge``
    deletes the listed files AFTER printing the report (rows handled out
    of band — programmatic repair goes through
    ``lake.replay_dead_letters``)."""
    from collections import Counter

    from vlm_eden_dataset_etl_ray import fsio, lake

    _ray_session()
    dl = lake.read_dead_letters(args.lake, epoch_id=args.epoch_id)
    rows = dl.take_all()
    by_epoch: Counter = Counter()
    by_reason: Counter = Counter()
    for r in rows:
        by_epoch[r.get("__dlq_epoch_id", "?")] += 1
        by_reason[r.get("__dlq_reason", "?")] += 1
    out = {"rows": len(rows), "by_epoch_id": dict(by_epoch),
           "by_reason": dict(by_reason)}
    if args.purge:
        root = fsio.join(args.lake, "_dead_letter")
        if args.epoch_id:
            root = fsio.join(root, args.epoch_id)
        purged = 0
        for p, _, _ in list(fsio.walk_files(root)):
            if p.endswith(".parquet"):
                fsio.delete_file(p)
                purged += 1
        out["purged_files"] = purged
    return out


def cmd_gen(args) -> dict:
    from vlm_eden_dataset_etl_ray import changelog as cl

    p = cl.ChangelogParams(
        seed=args.seed, n_docs=args.docs or max(100, args.events // 10),
        n_events=args.events, n_shards=args.shards,
        schema_change_at=args.schema_change_at,
    )
    files = cl.write_changelog(args.out, p)
    return {"out": args.out, "files": len(files), "events": p.n_events}


def _parse_where(parts: list[str]) -> list[tuple]:
    """``col<=value`` strings → (col, op, value) conjuncts; values parse as
    int, then float, then string."""
    out = []
    for p in parts:
        for op in ("<=", ">=", "==", "!=", "<", ">"):
            if op in p:
                col, raw = p.split(op, 1)
                for cast in (int, float, str):
                    try:
                        v = cast(raw)
                        break
                    except ValueError:
                        continue
                out.append((col.strip(), op, v))
                break
        else:
            raise SystemExit(f"bad --where clause {p!r} (need col<op>value)")
    return out


def _parse_set(parts: list[str]) -> dict:
    """``col+=n`` / ``col*=n`` / ``col=v`` strings → update_where SET."""
    out = {}
    for p in parts:
        if "+=" in p:
            col, raw = p.split("+=", 1)
            out[col.strip()] = ("add", float(raw) if "." in raw else int(raw))
        elif "*=" in p:
            col, raw = p.split("*=", 1)
            out[col.strip()] = ("mul", float(raw) if "." in raw else int(raw))
        elif "=" in p:
            col, raw = p.split("=", 1)
            for cast in (int, float, str):
                try:
                    v = cast(raw)
                    break
                except ValueError:
                    continue
            out[col.strip()] = v
        else:
            raise SystemExit(f"bad --set clause {p!r}")
    return out


def cmd_delete(args) -> dict:
    """DELETE FROM <lake> WHERE … — one tombstone epoch through the CDC
    apply (see dml.delete_where)."""
    from vlm_eden_dataset_etl_ray import dml, manifest as mf

    _ray_session()
    prev = mf.latest(args.lake)
    m = dml.delete_where(args.lake, _parse_where(args.where),
                         op_id=args.op_id)
    return {"lake": args.lake, "epoch": m.epoch,
            "applied": m.epoch != (prev.epoch if prev else -1)}


def cmd_update(args) -> dict:
    """UPDATE <lake> SET … WHERE … — matched rows re-emitted at
    watermark+1 (see dml.update_where)."""
    from vlm_eden_dataset_etl_ray import dml

    _ray_session()
    m = dml.update_where(args.lake, _parse_where(args.where),
                         _parse_set(args.set), op_id=args.op_id)
    return {"lake": args.lake, "epoch": m.epoch}


def cmd_rehash(args) -> dict:
    """Re-bucket the lake into a new hash-partition count (see
    lake.rehash) — the scale-out/scale-in lever for a lake whose fixed
    layout no longer matches its size."""
    from vlm_eden_dataset_etl_ray import lake

    _ray_session()
    m = lake.rehash(args.lake, args.partitions)
    return {"lake": args.lake, "epoch": m.epoch, "kind": m.kind,
            "num_partitions": m.num_partitions,
            "rows": m.total_rows()}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="vlm_eden_dataset_etl_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add(name, fn, **flags):
        p = sub.add_parser(name)
        for f, kw in flags.items():
            p.add_argument(f, **kw)
        p.set_defaults(fn=fn)
        return p

    add("apply", cmd_apply, **{"--lake": {"required": True},
                               "--changelog": {"required": True, "nargs": "+"}})
    add("tail", cmd_tail, **{"--lake": {"required": True},
                             "--changelog": {"required": True, "nargs": 1},
                             "--max-epoch-bytes": {"type": int, "default": 0,
                                                   "dest": "max_epoch_bytes"},
                             "--audit": {"action": "append", "default": None}})
    add("tail-debezium", cmd_tail_debezium, **{
        "--lake": {"required": True},
        "--envelopes": {"required": True},
        "--max-epoch-bytes": {"type": int, "default": 0,
                              "dest": "max_epoch_bytes"},
        "--audit": {"action": "append", "default": None}})
    add("rehash", cmd_rehash, **{
        "--lake": {"required": True},
        "--partitions": {"type": int, "required": True}})
    add("compact", cmd_compact, **{
        "--lake": {"required": True},
        "--cluster-by": {"default": None, "dest": "cluster_by"},
        "--cluster-file-bytes": {"type": int, "default": 128 << 20,
                                 "dest": "cluster_file_bytes"}})
    add("vacuum", cmd_vacuum, **{"--lake": {"required": True},
                                 "--keep-epochs": {"type": int, "default": 2,
                                                   "dest": "keep_epochs"}})
    add("status", cmd_status, **{"--lake": {"required": True}})
    add("clone", cmd_clone, **{"--lake": {"required": True},
                               "--dst": {"required": True}})
    add("restore", cmd_restore, **{"--lake": {"required": True},
                                   "--epoch": {"type": int, "required": True}})
    add("metrics", cmd_metrics, **{"--lake": {"required": True},
                                   "--last": {"type": int, "default": 0}})
    add("scan", cmd_scan, **{"--lake": {"required": True}, "--out": {"required": True},
                             "--columns": {"default": None}})
    add("feed", cmd_feed, **{"--lake": {"required": True}, "--out": {"required": True},
                             "--from": {"type": int, "default": 0, "dest": "from_epoch"},
                             "--to": {"type": int, "default": None, "dest": "to_epoch"},
                             "--columns": {"default": None}})
    add("lookup", cmd_lookup, **{"--lake": {"required": True},
                                 "--keys": {"required": True},
                                 "--columns": {"default": None}})
    add("fsck", cmd_fsck, **{"--lake": {"required": True},
                             "--deep": {"action": "store_true"},
                             "--key": {"default": None},
                             "--order": {"default": None}})
    add("constraints", cmd_constraints, **{
        "--lake": {"required": True},
        "--set": {"action": "append", "default": None},
        "--clear": {"action": "store_true"}})
    add("dlq", cmd_dlq, **{"--lake": {"required": True},
                           "--epoch-id": {"default": None, "dest": "epoch_id"},
                           "--purge": {"action": "store_true"}})
    add("delete", cmd_delete, **{"--lake": {"required": True},
                                 "--where": {"required": True, "action": "append"},
                                 "--op-id": {"default": None, "dest": "op_id"}})
    add("update", cmd_update, **{"--lake": {"required": True},
                                 "--where": {"required": True, "action": "append"},
                                 "--set": {"required": True, "action": "append"},
                                 "--op-id": {"default": None, "dest": "op_id"}})
    add("gen", cmd_gen, **{"--out": {"required": True},
                           "--events": {"type": int, "default": 10000},
                           "--docs": {"type": int, "default": None},
                           "--shards": {"type": int, "default": 8},
                           "--seed": {"type": int, "default": 42},
                           "--schema-change-at": {"type": int, "default": None,
                                                  "dest": "schema_change_at"}})

    args = ap.parse_args(argv)
    try:
        out = args.fn(args)
    except FileNotFoundError as e:
        print(json.dumps({"error": "not_found", "detail": str(e)}), file=sys.stderr)
        return 1
    print(json.dumps(out))
    try:
        import ray

        if ray.is_initialized():
            ray.shutdown()
    except ImportError:  # pragma: no cover
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
