"""Serial replay oracle — the ground truth for every convergence test.

Plays the role of the reference's ``SyncValidator`` daily anti-join
diff-and-repair (``/root/reference/sync/sync_validator.py:24-62``): an
independent, trivially-correct computation of what the destination state
MUST be after replaying the full changelog. Here it is a sequential,
in-memory, LSN-ordered apply with no Ray — final state per key is the
payload of its max-LSN event, dropped if that event is a tombstone
(last-writer-wins; duplicates collapse because they are verbatim).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vlm_eden_dataset_etl_ray import changelog as cl


def final_state(p: cl.ChangelogParams) -> pa.Table:
    """Expected lake state after a full replay of ``p``'s stream, in the
    LATEST schema version present, sorted by doc_id.

    Sequentially derived: for each doc, its max-LSN event wins; deletes
    remove the doc (a later insert resurrects it).
    """
    pl_ = cl.plan(p)
    n = p.n_events
    # last (max-lsn) event per doc: stable argmax via forward scan
    last_lsn = np.full(p.n_docs, -1, dtype=np.int64)
    last_lsn[pl_["doc_idx"]] = np.arange(n)  # assignment in lsn order → max wins
    present = last_lsn >= 0
    lsns = last_lsn[present]
    alive = pl_["op"][lsns] != 2  # drop docs whose final event is a tombstone
    lsns = lsns[alive]
    order = np.argsort(lsns, kind="stable")
    lsns = lsns[order]

    version = 2 if (p.schema_change_at is not None and p.schema_change_at < n) else 1
    t = cl.events_table(pl_, lsns, p, version)
    t = t.drop_columns(["schema_ver"])
    # rows whose winning event was written under schema v1 have null quality
    if version == 2:
        ver = pl_["schema_ver"][lsns]
        q = t.column("quality").to_numpy(zero_copy_only=False)
        mask = ver == 1
        qual = pa.array(np.where(mask, np.nan, q), mask=mask)
        t = t.set_column(t.column_names.index("quality"), "quality", qual)
    return t.sort_by("doc_id")


def replay_dict(p: cl.ChangelogParams) -> dict[str, dict]:
    """Tiny fully-sequential reference implementation (used to sanity-check
    :func:`final_state` itself in tests): python dict keyed by doc_id."""
    pl_ = cl.plan(p)
    state: dict[int, int] = {}
    for lsn in range(p.n_events):
        d = int(pl_["doc_idx"][lsn])
        if pl_["op"][lsn] == 2:
            state.pop(d, None)
        else:
            state[d] = lsn
    out: dict[str, dict] = {}
    for d, lsn in state.items():
        doc_id = f"doc{d:08d}"
        length = int(pl_["n_tok"][lsn])
        toks = cl.tokens_for(
            np.array([lsn], dtype=np.int64), np.array([length]), p
        ).flatten().to_numpy(zero_copy_only=False)
        out[doc_id] = {
            "lsn": lsn,
            "tokens": toks,
            "n_tok": length,
            "source": str(cl.SOURCES[pl_["source_idx"][lsn]]),
        }
    return out
