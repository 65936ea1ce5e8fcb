"""Schema-evolution COMPOSITION fuzz: drop/re-add, rename, widen, rehash
and compaction interleaved in seeded-random order, each sequence checked
against a serial pure-Python oracle of the lake's semantics.

The individual evolution behaviors have dedicated tests
(test_drop_readd_evolution, test_rename_evolution, lake rehash/compaction
suites); evolution engines break in the COMPOSITIONS — a rename after a
sparse add, a compaction between a drop and its re-add, a rehash in the
middle of a generation change. The oracle models exactly the engine's
contract:

- LWW by the order column per key; deletes tombstone.
- Every column carries a GENERATION: re-adding a dropped name starts a
  fresh generation, so winners written before the re-add read NULL.
- A RENAME preserves the generation — pre-rename values survive under
  the new name.
- rehash / compact never change visible state.

Reference parity: the reference's migration history composes the same
ways (drop+re-add migrations/20241029_01_JnkId.sql:4-16 on top of
locked serial migrations cron_tasks.py:54-56); its Postgres answers
these questions with the catalog — the lake must answer them itself.

Case count: FUZZ_CASES env var (default 100, ≈8 min at 4 CPUs — each
case is a multi-epoch lake, so the cost is Ray round-trips, not data;
FUZZ_SEED_START offsets the seed window for split runs). The fuzz paid
for itself on day one: seeds 0/1/5 exposed a missing null-fill for
columns added after a partition's last file, seeds 22/27/46/52/97 a
compaction/rehash version-stamping bug (files rewritten with CURRENT
names but stamped with the last epoch's version) and the
scan-a-column-no-file-carries case — all fixed in the same commit."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from vlm_eden_dataset_etl_ray import apply, lake
from vlm_eden_dataset_etl_ray.spec import TableSpec
from vlm_eden_dataset_etl_ray.state.registry import make_registry_actor

N_CASES = int(os.environ.get("FUZZ_CASES", "100"))
SEED_START = int(os.environ.get("FUZZ_SEED_START", "0"))
DOC_IDS = [f"d{i}" for i in range(12)]


class Oracle:
    """Serial model: per-key LWW winners storing values by column
    GENERATION key, plus the live name→generation map."""

    def __init__(self, payload_cols):
        self._next_gen = 0
        self.live = {}  # col name -> generation key
        for c in payload_cols:
            self.live[c] = self._gen()
        self.rows = {}  # doc_id -> (lsn, {genkey: value})

    def _gen(self):
        self._next_gen += 1
        return self._next_gen

    def apply_rows(self, rows):
        """rows: (doc_id, lsn, op, {col_name: value}) under CURRENT names."""
        for doc, lsn, op, vals in rows:
            cur = self.rows.get(doc)
            if cur is not None and cur[0] >= lsn:
                continue
            if op == "delete":
                self.rows[doc] = (lsn, None)
            else:
                self.rows[doc] = (
                    lsn, {self.live[c]: v for c, v in vals.items()})

    def drop(self, col):
        del self.live[col]

    def add(self, col):
        self.live[col] = self._gen()  # fresh generation

    def rename(self, old, new):
        self.live[new] = self.live.pop(old)  # generation preserved

    def final(self):
        out = {}
        for doc, (lsn, vals) in self.rows.items():
            if vals is None:
                continue
            out[doc] = (lsn,) + tuple(
                vals.get(g) for g in self.live.values())
        return out


def _schema(payload_cols):
    return pa.schema([("doc_id", pa.string()), ("n_tok", pa.int64())]
                     + [(c, pa.string()) for c in payload_cols])


def _write_shard(path, rows, payload_cols):
    cols = {
        "lsn": pa.array([r[1] for r in rows], pa.int64()),
        "op": pa.array([r[2] for r in rows]),
        "doc_id": pa.array([r[0] for r in rows]),
        "n_tok": pa.array([r[3].get("n_tok") for r in rows], pa.int64()),
    }
    for c in payload_cols:
        cols[c] = pa.array([r[3].get(c) for r in rows], pa.string())
    pq.write_table(pa.table(cols), path)
    return str(path)


def _run_case(tmp_path, seed, bad_frac: float = 0.0):
    rng = np.random.default_rng(seed)
    spec = TableSpec(name="fz", key="doc_id", order="lsn", num_partitions=2,
                     on_bad_rows="dead_letter" if bad_frac else None)
    lake_dir = str(tmp_path / f"lake{seed}")
    n_bad = 0
    payload = ["src"]
    reg = make_registry_actor(lake_dir, seed_versions={1: _schema(payload)})
    ora = Oracle(["n_tok"] + payload)
    lsn = 0
    next_col = 0
    shard_i = 0
    dropped_pool = []  # names available for re-add

    def do_apply():
        nonlocal lsn, shard_i, n_bad
        n = int(rng.integers(2, 6))
        rows = []
        for _ in range(n):
            lsn += 1
            doc = DOC_IDS[int(rng.integers(0, len(DOC_IDS)))]
            op = "delete" if rng.random() < 0.15 else "upsert"
            vals = {"n_tok": lsn * 7,
                    **{c: (f"{c}={doc}@{lsn}" if rng.random() < 0.8
                           else None) for c in payload}}
            rows.append((doc, lsn, op, vals))
        oracle_rows = list(rows)
        if bad_frac:
            # malformed extras the screen must divert: null key, null lsn,
            # or both — the oracle never sees them
            for _ in range(int(rng.integers(0, 3))):
                if rng.random() >= bad_frac:
                    continue
                shape = rng.integers(0, 3)
                lsn_ = None if shape != 0 else (lsn + 1000)
                doc_ = None if shape != 1 else "dX"
                rows.append((doc_, lsn_, "upsert", {"n_tok": 1}))
                n_bad += 1
        f = _write_shard(tmp_path / f"s{seed}_{shard_i}.parquet",
                         rows, payload)
        shard_i += 1
        apply.apply_epoch(lake_dir, [f], spec=spec, registry=reg)
        ora.apply_rows([(d, L, o,
                         {k: v for k, v in vals.items() if o == "upsert"})
                        for d, L, o, vals in oracle_rows])

    # ops are only meaningful against a non-empty lake: always start with
    # an apply, and re-apply between migrations with 70% probability
    do_apply()
    n_ops = int(rng.integers(4, 8))
    for _ in range(n_ops):
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
            new_p = int(rng.choice([2, 4, 8]))
            m = lake.rehash(lake_dir, new_p, spec=spec)
            assert m.num_partitions == new_p
        elif op == "compact":
            lake.compact(lake_dir, spec=spec)
    # final apply so post-migration generations carry data sometimes
    if rng.random() < 0.5:
        do_apply()

    got_rows = lake.scan(lake_dir, spec=spec,
                         columns=["doc_id", "lsn", "n_tok"] + payload
                         ).take_all()
    # n_tok shares the oracle's generation machinery (never dropped)
    assert set(ora.live) == set(["n_tok"] + payload)
    got = {r["doc_id"]: (r["lsn"],) + tuple(r[c] for c in ora.live)
           for r in got_rows}
    exp = ora.final()
    assert got == exp, (
        f"seed {seed}: lake != oracle\nlake:   {sorted(got.items())}\n"
        f"oracle: {sorted(exp.items())}")
    if bad_frac:
        assert lake.read_dead_letters(lake_dir).count() == n_bad, seed


@pytest.mark.parametrize("seed", range(SEED_START, SEED_START + N_CASES))
def test_evolution_composition_matches_serial_oracle(tmp_path, seed):
    _run_case(tmp_path, seed)


# dead-letter screening composed with the full evolution matrix: malformed
# extras (null key / null lsn / both) are injected into random epochs; the
# oracle never sees them, the DLQ must hold exactly them, and the visible
# state must still equal the serial oracle through drops/renames/rehash/
# compaction. Smaller default count — each case already runs the full op
# sequence (FUZZ_DLQ_CASES to widen).
N_DLQ_CASES = int(os.environ.get("FUZZ_DLQ_CASES", "15"))


@pytest.mark.parametrize("seed",
                         range(SEED_START + 500, SEED_START + 500 + N_DLQ_CASES))
def test_evolution_composition_with_dead_letter_screen(tmp_path, seed):
    _run_case(tmp_path, seed, bad_frac=0.6)
