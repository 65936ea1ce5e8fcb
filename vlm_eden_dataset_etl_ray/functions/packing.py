"""Sequence packing: variable-length token sequences → fixed-length
training blocks (the last mile between a tokenized corpus and a training
loader; the reference stops at per-document rows).

Two standard modes, both pure per-batch transforms (no shuffle, no
driver state — packing is local by construction when waste per batch
boundary is amortized over thousands of documents per batch):

- ``concat``: GPT-style — documents concatenate (optionally with a
  separator id) and chop into exact ``block_size`` chunks; sequences may
  cross block boundaries; per-block document-start offsets are emitted so
  the loader can reset attention. The only waste is the final partial
  chunk per batch.
- ``greedy``: first-fit without splitting — a document never crosses a
  block boundary; blocks pad to ``block_size`` with ``pad_id``.
  Documents longer than ``block_size`` raise (truncate upstream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def _flat_tokens(col) -> tuple[np.ndarray, np.ndarray]:
    """list<int> column → (flat values, lengths)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        n = len(col)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat, np.full(n, col.type.list_size, dtype=np.int64)
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat, np.diff(offsets)


def pack_sequences(
    ds: rd.Dataset,
    tokens_col: str = "tokens",
    block_size: int = 2048,
    mode: str = "concat",
    pad_id: int = 0,
    sep_id: int | None = None,
    out_col: str = "block",
) -> rd.Dataset:
    """Pack ``tokens_col`` into fixed-size blocks. Output columns:
    ``out_col`` (fixed-size list<int32> of ``block_size``), ``n_real``
    (non-pad tokens) and ``doc_starts`` (list<int32> offsets where a
    document begins inside the block — attention-reset points)."""
    if mode not in ("concat", "greedy"):
        raise ValueError(f"unknown packing mode {mode!r}")

    def _pack(t: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(t.column(tokens_col))
        flat = flat.astype(np.int32, copy=False)
        if mode == "concat":
            if sep_id is not None and len(lens):
                # interleave a separator after each document, vectorized
                out = np.empty(flat.size + len(lens), dtype=np.int32)
                ends = np.cumsum(lens + 1)
                sep_pos = ends - 1
                mask = np.ones(out.size, dtype=bool)
                mask[sep_pos] = False
                out[mask] = flat
                out[sep_pos] = sep_id
                flat = out
                starts = np.concatenate([[0], ends[:-1]])
            else:
                starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            n_blocks = flat.size // block_size
            if n_blocks == 0:
                return pa.table({
                    out_col: pa.array([], pa.list_(pa.int32(), block_size)),
                    "n_real": pa.array([], pa.int32()),
                    "doc_starts": pa.array([], pa.list_(pa.int32()))})
            used = flat[: n_blocks * block_size]
            blocks = pa.FixedSizeListArray.from_arrays(
                pa.array(used, pa.int32()), block_size)
            n_real = np.full(n_blocks, block_size, dtype=np.int32)
            bidx = (starts // block_size).astype(np.int64)
            local = (starts % block_size).astype(np.int32)
            keep = bidx < n_blocks
            bidx, local = bidx[keep], local[keep]
            offs = np.zeros(n_blocks + 1, dtype=np.int32)
            np.add.at(offs, bidx + 1, 1)
            np.cumsum(offs, out=offs)
            order = np.argsort(bidx, kind="stable")
            doc_starts = pa.ListArray.from_arrays(
                pa.array(offs), pa.array(local[order], pa.int32()))
            return pa.table({out_col: blocks,
                             "n_real": pa.array(n_real),
                             "doc_starts": doc_starts})
        # greedy first-fit, no splits
        if np.any(lens > block_size):
            raise ValueError(
                f"document of {int(lens.max())} tokens exceeds block_size "
                f"{block_size}; truncate upstream or use mode='concat'")
        blocks_out: list[np.ndarray] = []
        nreal_out: list[int] = []
        starts_out: list[list[int]] = []
        cur = np.full(block_size, pad_id, dtype=np.int32)
        fill = 0
        cur_starts: list[int] = []
        pos = 0
        for ln in lens:
            ln = int(ln)
            if fill + ln > block_size:
                blocks_out.append(cur)
                nreal_out.append(fill)
                starts_out.append(cur_starts)
                cur = np.full(block_size, pad_id, dtype=np.int32)
                fill, cur_starts = 0, []
            cur[fill:fill + ln] = flat[pos:pos + ln]
            cur_starts.append(fill)
            fill += ln
            pos += ln
        if fill:
            blocks_out.append(cur)
            nreal_out.append(fill)
            starts_out.append(cur_starts)
        if not blocks_out:
            return pa.table({
                out_col: pa.array([], pa.list_(pa.int32(), block_size)),
                "n_real": pa.array([], pa.int32()),
                "doc_starts": pa.array([], pa.list_(pa.int32()))})
        allb = np.concatenate(blocks_out)
        return pa.table({
            out_col: pa.FixedSizeListArray.from_arrays(
                pa.array(allb, pa.int32()), block_size),
            "n_real": pa.array(np.array(nreal_out, dtype=np.int32)),
            "doc_starts": pa.array(starts_out, pa.list_(pa.int32()))})

    return ds.map_batches(_pack, batch_format="pyarrow", zero_copy_batch=True)


def length_bucketed_pad(
    ds: rd.Dataset,
    tokens_col: str = "tokens",
    edges: tuple[int, ...] = (64, 128, 256, 512),
    pad_id: int = 0,
    out_col: str = "input_ids",
) -> rd.Dataset:
    """Length-bucketed padding — the batching shape that minimizes pad
    waste when documents must NOT be split or concatenated (SFT /
    evaluation, where :func:`pack_sequences` is wrong): each sequence pads
    only to its BUCKET's width (smallest edge ≥ its length; sequences
    longer than the last edge truncate to it), and rows come out grouped
    by bucket so a loader slicing a batch sees contiguous same-width
    runs. Compare padding everything to the global max — on a natural
    length distribution bucketing cuts pad tokens several-fold.

    Pure per-batch transform (sort-within-batch by bucket; no shuffle):
    local bucketing is the standard loader-side pattern (a pooled bucket
    iterator); a global sort by length would order the epoch and cost an
    all-to-all. Output: ``bucket`` (int), ``width`` (int), ``out_col``
    (list<int32>, padded/truncated to width), ``n_real``.
    """
    edges_arr = np.asarray(sorted(edges), dtype=np.int64)

    def _bucketize(t: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(t.column(tokens_col))
        flat = flat.astype(np.int32, copy=False)
        bucket = np.searchsorted(edges_arr, np.minimum(lens, edges_arr[-1]))
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        out_b, out_w, out_nr, mats = [], [], [], []
        # one dense scatter per PRESENT bucket (≤ len(edges) iterations);
        # rows inside a bucket fill a (n × width) matrix vectorized
        for b in np.unique(bucket):
            idx = np.where(bucket == b)[0]
            w = int(edges_arr[b])
            ln = np.minimum(lens[idx], w).astype(np.int64)
            mat = np.full((len(idx), w), pad_id, dtype=np.int32)
            row_ids = np.repeat(np.arange(len(idx)), ln)
            col_ids = np.arange(ln.sum()) - np.repeat(np.cumsum(ln) - ln, ln)
            src = np.repeat(starts[idx], ln) + col_ids
            mat[row_ids, col_ids] = flat[src]
            mats.append(mat.ravel())
            out_b.append(np.full(len(idx), b, np.int64))
            out_w.append(np.full(len(idx), w, np.int64))
            out_nr.append(ln.astype(np.int32))
        if not mats:
            return pa.table({
                "bucket": pa.array([], pa.int64()),
                "width": pa.array([], pa.int64()),
                out_col: pa.array([], pa.list_(pa.int32())),
                "n_real": pa.array([], pa.int32())})
        widths = np.concatenate(out_w)
        offs = np.concatenate([[0], np.cumsum(widths)]).astype(np.int64)
        padded = pa.ListArray.from_arrays(
            pa.array(offs, pa.int64()),
            pa.array(np.concatenate(mats), pa.int32()))
        return pa.table({
            "bucket": pa.array(np.concatenate(out_b)),
            "width": pa.array(widths),
            out_col: padded,
            "n_real": pa.array(np.concatenate(out_nr)),
        })

    return ds.map_batches(_bucketize, batch_format="pyarrow",
                          zero_copy_batch=True)
