"""Sequence packing invariants: conservation, fixed widths, boundaries."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.packing import pack_sequences


def _docs(n=300, seed=3, max_len=40):
    rng = np.random.default_rng(seed)
    lens = rng.integers(1, max_len, n)
    toks = [rng.integers(1, 50000, ln).astype(np.int32).tolist() for ln in lens]
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "tokens": pa.array(toks, pa.list_(pa.int32()))}), toks


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None))


def test_concat_mode_chops_exact_blocks_and_preserves_order():
    t, toks = _docs()
    # single block (batch_size=None) → one batch → exact numpy twin
    out = _collect(pack_sequences(rd.from_arrow(t), block_size=128))
    flat = np.concatenate([np.asarray(x) for x in toks])
    nb = flat.size // 128
    assert out.num_rows == nb
    got = np.asarray(out.column("block").to_pylist())
    assert np.array_equal(got.reshape(-1), flat[: nb * 128])
    assert set(out.column("n_real").to_pylist()) == {128}
    # doc_starts point at true document beginnings
    starts = np.concatenate([[0], np.cumsum([len(x) for x in toks])[:-1]])
    for bi, ds_ in enumerate(out.column("doc_starts").to_pylist()):
        for off in ds_:
            assert (bi * 128 + off) in set(starts.tolist())


def test_concat_with_separator():
    t = pa.table({"tokens": pa.array([[1, 2], [3], [4, 5, 6]],
                                     pa.list_(pa.int32()))})
    out = _collect(pack_sequences(rd.from_arrow(t), block_size=9, sep_id=0))
    assert out.num_rows == 1
    assert out.column("block").to_pylist()[0] == [1, 2, 0, 3, 0, 4, 5, 6, 0]
    assert out.column("doc_starts").to_pylist()[0] == [0, 3, 5]


def test_greedy_mode_never_splits_and_pads():
    t, toks = _docs(n=100, max_len=30)
    out = _collect(pack_sequences(rd.from_arrow(t), block_size=64,
                                  mode="greedy", pad_id=-1))
    blocks = out.column("block").to_pylist()
    nreal = out.column("n_real").to_pylist()
    dstarts = out.column("doc_starts").to_pylist()
    assert all(len(b) == 64 for b in blocks)
    # total real tokens conserved
    assert sum(nreal) == sum(len(x) for x in toks)
    # reconstruct documents in order from (block, starts, next start/n_real)
    rebuilt = []
    for b, n, ss in zip(blocks, nreal, dstarts):
        ends = ss[1:] + [n]
        for s, e in zip(ss, ends):
            rebuilt.append(b[s:e])
        assert all(x == -1 for x in b[n:])  # padding only after real tokens
    assert rebuilt == [list(map(int, x)) for x in toks]


def test_greedy_rejects_oversized_doc():
    t = pa.table({"tokens": pa.array([list(range(100))], pa.list_(pa.int32()))})
    ds = pack_sequences(rd.from_arrow(t), block_size=64, mode="greedy")
    try:
        _collect(ds)
    except Exception as e:
        assert "exceeds block_size" in str(e)
    else:
        raise AssertionError("expected oversized-doc error")


def test_training_stream_emits_packed_blocks(tmp_path):
    """lake → loader path: training_stream(pack_block_size=…) yields
    fixed-width blocks whose real-token total equals the live corpus."""
    from vlm_eden_dataset_etl_ray import apply, changelog as cl, lake

    p = cl.ChangelogParams(n_docs=60, n_events=400, schema_change_at=10**9,
                           n_shards=2)
    files = cl.write_changelog(str(tmp_path / "chg"), p)
    lake_dir = str(tmp_path / "lake")
    apply.apply_epoch(lake_dir, files)
    live = lake.snapshot(lake_dir)
    total = int(np.sum([len(x) for x in live.column("tokens").to_pylist()]))

    seen = 0
    for b in lake.training_stream(lake_dir, pack_block_size=64,
                                  batch_size=8, local_shuffle_buffer=32):
        blocks = b.column("block").to_pylist()
        assert all(len(x) == 64 for x in blocks)
        seen += int(np.sum(b.column("n_real").to_numpy(zero_copy_only=False)))
    # concat mode drops only the final partial chunk per scan block
    assert 0 <= total - seen < 64 * live.num_rows
    assert seen > 0
