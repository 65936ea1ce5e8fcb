"""Partial-update merge engine × schema evolution COMPOSITION fuzz:
partial column writes, delete-resets and out-of-order LSNs interleaved
with drop/re-add, rename, widen, rehash and compaction in seeded-random
order, each sequence checked against a serial per-column oracle.

The oracle models the engine's documented contract exactly:

- per column, the last NON-NULL writer by LSN wins (null = untouched);
- a delete stamps every column that EXISTS at its application time with a
  half-LSN delete tick (2L+1 > any upsert at the same LSN) — columns
  added later (fresh generations) are not stamped, so an out-of-order
  older write to a post-delete generation survives;
- a row is visible iff some upsert's tick exceeds the max delete tick;
- re-adding a dropped column starts a fresh generation (pre-drop values
  and their seqs are masked); a RENAME preserves the generation, values
  AND per-column seq priority;
- rehash / compact never change visible state.

Seeds 1000-1239 ran green during round 4 (seed 1111 exposed the
re-add-then-rename activation-mask bug, fixed in the registry).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray.spec import TableSpec
from vlm_eden_dataset_etl_ray.state.registry import make_registry_actor

N_CASES = int(os.environ.get("PFUZZ_CASES", "40"))
SEED_START = int(os.environ.get("PFUZZ_SEED_START", "1000"))
DOC_IDS = [f"d{i}" for i in range(10)]


class PartialOracle:
    """Serial per-column-LWW model with generations and delete ticks."""

    def __init__(self, payload_cols):
        self._next_gen = 0
        self.live = {}
        for c in payload_cols:
            self.live[c] = self._gen()
        #: doc -> {"del": tick, "live": tick, "vals": {gen: (tick, value)}}
        self.rows: dict = {}

    def _gen(self):
        self._next_gen += 1
        return self._next_gen

    def _doc(self, doc):
        return self.rows.setdefault(
            doc, {"del": -1, "live": -1, "vals": {}})

    def apply_rows(self, rows):
        """rows: (doc_id, lsn, op, {current_name: value})."""
        for doc, lsn, op, vals in rows:
            d = self._doc(doc)
            if op == "delete":
                dt = 2 * lsn + 1
                d["del"] = max(d["del"], dt)
                for g in self.live.values():
                    cur = d["vals"].get(g)
                    if cur is None or dt > cur[0]:
                        d["vals"][g] = (dt, None)
                continue
            t = 2 * lsn
            d["live"] = max(d["live"], t)
            for c, v in vals.items():
                if v is None:
                    continue  # untouched
                g = self.live[c]
                cur = d["vals"].get(g)
                if cur is None or t > cur[0]:
                    d["vals"][g] = (t, v)

    def drop(self, col):
        del self.live[col]

    def add(self, col):
        self.live[col] = self._gen()

    def rename(self, old, new):
        self.live[new] = self.live.pop(old)

    def final(self):
        out = {}
        for doc, d in self.rows.items():
            if d["live"] <= d["del"]:
                continue
            out[doc] = tuple(
                (d["vals"].get(g) or (0, None))[1]
                for g in self.live.values())
        return out


def _schema(payload_cols):
    return pa.schema([("doc_id", pa.string())]
                     + [(c, pa.string()) for c in payload_cols])


def _write_shard(path, rows, payload_cols):
    cols = {
        "lsn": pa.array([r[1] for r in rows], pa.int64()),
        "op": pa.array([r[2] for r in rows]),
        "doc_id": pa.array([r[0] for r in rows]),
    }
    for c in payload_cols:
        cols[c] = pa.array([r[3].get(c) for r in rows], pa.string())
    pq.write_table(pa.table(cols), path)
    return str(path)


def _run_case(tmp_path, seed):
    rng = np.random.default_rng(seed)
    spec = TableSpec(name="pfz", key="doc_id", order="lsn",
                     num_partitions=2, merge_engine="partial_update")
    lake_dir = str(tmp_path / f"lake{seed}")
    payload = ["src", "alt"]
    reg = make_registry_actor(lake_dir, seed_versions={1: _schema(payload)})
    ora = PartialOracle(payload)
    shard_i = 0
    next_col = 0
    dropped_pool = []
    used_lsns: set[int] = set()

    def do_apply():
        nonlocal shard_i
        n = int(rng.integers(2, 6))
        rows = []
        for _ in range(n):
            # OUT-OF-ORDER lsns: random draw without replacement
            while True:
                lsn = int(rng.integers(1, 500))
                if lsn not in used_lsns:
                    used_lsns.add(lsn)
                    break
            doc = DOC_IDS[int(rng.integers(0, len(DOC_IDS)))]
            op = "delete" if rng.random() < 0.15 else "upsert"
            vals = {c: (f"{c}={doc}@{lsn}" if rng.random() < 0.6 else None)
                    for c in payload}
            rows.append((doc, lsn, op, vals))
        f = _write_shard(tmp_path / f"s{seed}_{shard_i}.parquet",
                         rows, payload)
        shard_i += 1
        apply.apply_epoch(lake_dir, [f], spec=spec, registry=reg)
        ora.apply_rows([(d, L, o, vals if o == "upsert" else {})
                        for d, L, o, vals in rows])

    do_apply()
    for _ in range(int(rng.integers(4, 8))):
        op = rng.choice(["apply", "drop", "add", "rename", "widen",
                         "rehash", "compact"],
                        p=[.34, .12, .12, .12, .12, .09, .09])
        if op == "apply":
            do_apply()
        elif op == "drop" and payload:
            c = payload.pop(int(rng.integers(0, len(payload))))
            dropped_pool.append(c)
            ray.get(reg.migrate.remote(_schema(payload)))
            ora.drop(c)
        elif op == "add" and dropped_pool:
            c = dropped_pool.pop(0)
            payload.append(c)
            ray.get(reg.migrate.remote(_schema(payload)))
            ora.add(c)
        elif op == "rename" and payload:
            i = int(rng.integers(0, len(payload)))
            old = payload[i]
            new = f"rn{next_col}"
            next_col += 1
            payload[i] = new
            ray.get(reg.migrate.remote(_schema(payload),
                                       renames={old: new}))
            ora.rename(old, new)
        elif op == "widen":
            c = f"w{next_col}"
            next_col += 1
            payload.append(c)
            ray.get(reg.migrate.remote(_schema(payload)))
            ora.add(c)
        elif op == "rehash":
            # the fuzz delivers arbitrarily-late old LSNs, so tombstones
            # must be RETAINED (watermark 0): the default drop assumes no
            # event older than the compaction can still arrive — the
            # engine's documented retention contract, not an engine bug
            lake.rehash(lake_dir, int(rng.choice([2, 4, 8])), spec=spec,
                        tombstone_watermark=0)
        elif op == "compact":
            lake.compact(lake_dir, spec=spec, tombstone_watermark=0)
    if rng.random() < 0.5:
        do_apply()

    got_rows = lake.scan(lake_dir, spec=spec,
                         columns=["doc_id"] + payload).take_all()
    got = {r["doc_id"]: tuple(r[c] for c in ora.live) for r in got_rows}
    exp = ora.final()
    assert got == exp, (
        f"seed {seed}: lake != oracle\nlake:   {sorted(got.items())}\n"
        f"oracle: {sorted(exp.items())}")


def test_partial_evolution_fuzz(ray_session, tmp_path):
    for seed in range(SEED_START, SEED_START + N_CASES):
        _run_case(tmp_path, seed)
