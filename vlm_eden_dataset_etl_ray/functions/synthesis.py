"""Combined-row synthesis + rename propagation (reference T2/T4/T5).

The reference maintains synthetic "combined modality" dimension rows: for
every multi-valued CSV combo observed in the fact stream it folds the
matching base-catalog rows into one synthetic row — sorted-joined
identifier/description, commutatively-merged name fields, in-batch dedup by
natural key (/root/reference/sync/modalities.py:37-118) — and, on later
catalog renames, recomputes every combined row's names from the current
base rows (:138-191, "rename propagation"). Re-expressed here as pure
vectorizable functions over Arrow tables + a broadcast catalog.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc



def first_true(*vals):
    """First truthy value (reference utils.py:15-17)."""
    for v in vals:
        if v:
            return v
    return None


def combine_and_sort_values(a: str | None, b: str | None, sep: str = ",") -> str:
    """Deterministic commutative merge of two name strings: sort the two
    survivors and comma-join (reference utils.py:20-31)."""
    vals = sorted(v for v in (a, b) if v)
    return sep.join(vals)


def synthesize_combined(
    catalog: pa.Table,
    combos: list[str],
    *,
    id_field: str = "identifier",
    name_fields: tuple[str, ...] = ("name",),
    desc_field: str | None = "description",
    sep: str = ",",
) -> pa.Table:
    """Fold base-catalog rows into one synthetic row per multi-valued combo.

    ``combos`` are CSV strings of base identifiers (e.g. ``"CT,MR"``). For
    each: identifier = sorted-joined member identifiers, each name field =
    the commutative fold of member names (T4), description = sorted-joined
    member descriptions. Combos are deduped by their canonical identifier
    (the reference's in-batch natural-key dedup, sync/modalities.py:94-97);
    combos with unknown members or fewer than 2 members are skipped.
    """
    base = {
        row[id_field]: row for row in catalog.to_pylist()
    }
    seen: set[str] = set()
    out: list[dict] = []
    for combo in combos:
        members = [m for m in combo.split(sep) if m]
        if len(members) < 2 or any(m not in base for m in members):
            continue
        canon = sep.join(sorted(set(members)))
        if canon in seen:
            continue
        seen.add(canon)
        row: dict = {id_field: canon}
        for nf in name_fields:
            acc: str | None = None
            for m in sorted(set(members)):
                acc = combine_and_sort_values(acc, base[m].get(nf), sep)
            row[nf] = acc
        if desc_field:
            row[desc_field] = sep.join(
                sorted(str(base[m].get(desc_field) or "") for m in set(members))
            )
        out.append(row)
    if not out:
        fields = [(id_field, pa.string())] + [(n, pa.string()) for n in name_fields]
        if desc_field:
            fields.append((desc_field, pa.string()))
        return pa.table({n: pa.array([], t) for n, t in fields})
    return pa.Table.from_pylist(out).sort_by(id_field)


def propagate_renames(
    combined: pa.Table,
    catalog: pa.Table,
    *,
    id_field: str = "identifier",
    name_fields: tuple[str, ...] = ("name",),
    desc_field: str | None = "description",
    sep: str = ",",
) -> pa.Table:
    """Recompute every combined row's name fields from the CURRENT base
    catalog (the reference's change propagation from dim to derived rows,
    sync/modalities.py:138-191). Rows whose identifier contains no ``sep``
    are passed through untouched."""
    combined_ids = [
        i for i in combined.column(id_field).to_pylist() if sep in i
    ]
    rebuilt = synthesize_combined(
        catalog, combined_ids, id_field=id_field,
        name_fields=name_fields, desc_field=desc_field, sep=sep,
    )
    passthrough = combined.filter(
        pc.invert(pc.match_substring(combined.column(id_field), sep))
    )
    cols = rebuilt.column_names
    if passthrough.num_rows:
        passthrough = passthrough.select([c for c in cols if c in passthrough.column_names])
        rebuilt = pa.concat_tables([rebuilt.select(passthrough.column_names), passthrough])
    return rebuilt.sort_by(id_field)
