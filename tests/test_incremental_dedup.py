"""Cross-epoch incremental exact dedup with lake-backed seen-hash state."""

import os

import pyarrow as pa
import pytest

import ray.data as rd

from vlm_eden_dataset_etl_ray.pipelines.incremental_dedup import (
    incremental_exact_dedup,
)


def _collect(ds):
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    return pa.concat_tables(tables)


def _docs(ids, texts):
    return rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))


def _run(state, ds, eid):
    out = _collect(incremental_exact_dedup(
        state, ds, on=["text"], keep_by="doc_id", epoch_id=eid))
    return sorted(out.column("doc_id").to_pylist())


def test_sequential_epochs_match_batch_dedup(tmp_path):
    state = str(tmp_path / "state")
    # epoch 1: "a" duplicated in-epoch -> keep min doc_id
    assert _run(state, _docs([1, 2, 3], ["a", "b", "a"]), "e1") == [1, 2]
    # epoch 2: "a", "b" seen in epoch 1 -> dropped; "c" new (dup in-epoch)
    assert _run(state, _docs([4, 5, 6, 7], ["a", "c", "b", "c"]), "e2") == [5]
    # epoch 3: everything seen -> empty epoch still commits its id
    assert _run(state, _docs([8, 9], ["a", "c"]), "e3") == []
    # epoch 4 after an empty epoch: new content still accepted
    assert _run(state, _docs([10], ["d"]), "e4") == [10]


def test_replay_same_epoch_id_reproduces_survivors(tmp_path):
    state = str(tmp_path / "state")
    e1 = _docs([1, 2], ["a", "b"])
    e2 = _docs([3, 4], ["a", "c"])
    assert _run(state, e1, "e1") == [1, 2]
    assert _run(state, e2, "e2") == [4]
    # replaying e2 must NOT anti-join against e2's own committed hashes
    assert _run(state, e2, "e2") == [4]
    # replaying e1 time-travels to the empty pre-e1 state
    assert _run(state, e1, "e1") == [1, 2]
    # state is unchanged by replays: a true new epoch still dedups
    assert _run(state, _docs([5, 6], ["c", "e"]), "e3") == [6]


def test_crash_resume_converges(tmp_path):
    state = str(tmp_path / "state")
    assert _run(state, _docs([1], ["a"]), "e1") == [1]
    e2 = _docs([2, 3], ["a", "b"])
    assert _run(state, e2, "e2") == [3]
    # simulate a crash that lost e2's manifest commit, then re-run
    mdir = os.path.join(state, "_manifests")
    [os.remove(os.path.join(mdir, f)) for f in os.listdir(mdir)
     if "2" in f and f.endswith(".json")]
    assert _run(state, e2, "e2") == [3]
    assert _run(state, _docs([4], ["b"]), "e3") == []


def test_unknown_epoch_id_raises_on_vacuumed_history(tmp_path):
    state = str(tmp_path / "state")
    _run(state, _docs([1], ["a"]), "e1")
    from vlm_eden_dataset_etl_ray.pipelines.incremental_dedup import (
        _epoch_first_applied,
    )
    with pytest.raises(ValueError):
        _epoch_first_applied(state, "nope")


def _mh_docs(ids, texts):
    return rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))


def _mh_run(state, ds, eid, **kw):
    from vlm_eden_dataset_etl_ray.pipelines.incremental_dedup import (
        incremental_minhash_dedup,
    )

    out = incremental_minhash_dedup(
        state, ds, epoch_id=eid, threshold=0.7, num_perm=64, bands=16,
        join_buckets=2, **kw)
    tables = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return []
    return sorted(pa.concat_tables(tables).column("doc_id").to_pylist())


_BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon")
_NEAR = _BASE.replace("kappa", "kappa2")      # one-term edit: near-dup
_FAR = ("one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen")


def test_minhash_incremental_drops_cross_epoch_near_dups(tmp_path):
    state = str(tmp_path / "mh")
    # epoch 1: base + in-epoch near-dup pair -> one representative kept
    assert _mh_run(state, _mh_docs([1, 2, 3], [_BASE, _NEAR, _FAR]),
                   "e1") == [1, 3]
    # epoch 2: near-dup of epoch-1 doc dropped; genuinely new doc kept
    new_text = "totally different words about completely other things " \
               "with no overlap whatsoever in any shingle of this text"
    assert _mh_run(state, _mh_docs([4, 5], [_NEAR, new_text]),
                   "e2") == [5]
    # epoch 3: near-dup of the EPOCH-2 keeper also dropped
    assert _mh_run(state, _mh_docs(
        [6], [new_text.replace("shingle", "ngram")]), "e3") == []


def test_minhash_incremental_replay_reproduces(tmp_path):
    state = str(tmp_path / "mhr")
    e1 = _mh_docs([1, 2], [_BASE, _FAR])
    e2 = _mh_docs([3, 4], [_NEAR, _FAR + " extra tail words here"])
    assert _mh_run(state, e1, "e1") == [1, 2]
    got = _mh_run(state, e2, "e2")
    assert got == _mh_run(state, e2, "e2")  # replay identical
    assert 3 not in got  # near-dup of epoch-1 doc 1


# ---- verify_cross_epoch: signature-verified cross-epoch collisions ----

# 20-word base; FALSE_FRIEND shares 6/20 words (true Jaccard ≈ 0.18) but
# with rows_per_band=1 (bands == num_perm) a single-component collision is
# near-certain, so the UNverified path drops it.
_VBASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lam mu nu xi omicron pi rho sigma tau upsilon")
_FALSE_FRIEND = ("alpha beta gamma delta epsilon zeta cliff dune ember "
                 "frost grove haze isle juniper knoll ledge mesa nook "
                 "oasis prairie")
_TRUE_NEAR = _VBASE.replace("kappa", "kappa2")  # Jaccard ≈ 0.90


def _vrun(state, ds, eid, **kw):
    from vlm_eden_dataset_etl_ray.pipelines.incremental_dedup import (
        incremental_minhash_dedup,
    )

    out = incremental_minhash_dedup(
        state, ds, epoch_id=eid, threshold=0.8, num_perm=64, bands=64,
        join_buckets=2, **kw)
    tables = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return []
    return sorted(pa.concat_tables(tables).column("doc_id").to_pylist())


def test_verify_cross_epoch_saves_false_collision(tmp_path):
    # precondition: WITHOUT the flag the false friend is dropped (the
    # band collision exists)
    s0 = str(tmp_path / "plain")
    assert _vrun(s0, _mh_docs([1], [_VBASE]), "e1") == [1]
    assert _vrun(s0, _mh_docs([2], [_FALSE_FRIEND]), "e2") == []

    # with verify_cross_epoch=True the pair's signature estimate (~0.18)
    # is far below threshold 0.8 → the false collision SURVIVES
    s1 = str(tmp_path / "verified")
    assert _vrun(s1, _mh_docs([1], [_VBASE]), "e1",
                 verify_cross_epoch=True) == [1]
    assert _vrun(s1, _mh_docs([2], [_FALSE_FRIEND]), "e2",
                 verify_cross_epoch=True) == [2]
    # ... while a TRUE near-dup of the epoch-1 keeper is still dropped
    assert _vrun(s1, _mh_docs([3, 4], [_TRUE_NEAR, "zzz " * 12]), "e3",
                 verify_cross_epoch=True) == [4]


def test_verify_cross_epoch_replay_reproduces(tmp_path):
    state = str(tmp_path / "vr")
    e1 = _mh_docs([1, 2], [_VBASE, _FAR])
    e2 = _mh_docs([3, 4], [_FALSE_FRIEND, _TRUE_NEAR])
    assert _vrun(state, e1, "e1", verify_cross_epoch=True) == [1, 2]
    got = _vrun(state, e2, "e2", verify_cross_epoch=True)
    assert got == [3]  # false friend kept, true near-dup dropped
    # replay: identical survivors, state untouched
    assert _vrun(state, e2, "e2", verify_cross_epoch=True) == [3]
    assert _vrun(state, e1, "e1", verify_cross_epoch=True) == [1, 2]
    # the kept false friend became a keeper: ITS near-dup now drops
    assert _vrun(state, _mh_docs(
        [5], [_FALSE_FRIEND.replace("mesa", "mesa2")]), "e3",
        verify_cross_epoch=True) == []


def test_verify_cross_epoch_without_sig_lake_falls_back(tmp_path):
    # state built WITHOUT the flag: keepers have no stored signatures, so
    # turning the flag on later keeps the unverified (conservative) drop
    state = str(tmp_path / "legacy")
    assert _vrun(state, _mh_docs([1], [_VBASE]), "e1") == [1]
    assert _vrun(state, _mh_docs([2], [_FALSE_FRIEND]), "e2",
                 verify_cross_epoch=True) == []
