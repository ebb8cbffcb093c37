"""RDF-star annotation join: attach annotation metadata to asserted triples.

The reference's only real join (SURVEY.md §2.5): annotation rows (e.g.
``lineage.csv``) × cached asserted triples on an equality key parsed from
``join(quoted=TM, equal(str1=$(a), str2=$(b)))``. The reference builds an
in-process ``{key: [triples]}`` index over an unbounded triples cache
(``rdf_star_etl_yarrrml.py:451-530``, ``:477-485``); here the join state is
explicit and bounded:

- **broadcast path** (default): the annotation side is typically a small
  dimension-like table → aggregate it driver-side to ``{key: [annotation
  structs]}``, ``ray.put`` ONCE, and attach inside ``map_batches`` via
  dictionary-encoded key lookup — no shuffle, annotations shipped once per
  task, not per batch.
- **shuffle path**: both sides large → hash-partition both on the key
  (``Dataset.join``) — see :func:`annotate_shuffle`.

The reifier blank node + ``rdf:reifies`` + per-annotation quads of the
reference (``rdf_star_etl_yarrrml.py:490-524``) collapse into one nested
``annotations: list<struct<predicate,value,datatype>>`` column on the
asserted triple (SURVEY.md §1.4) — equivalent information, no blank-node
bookkeeping, zero extra rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..mapping import CompiledPO, MappingSpec, TriplesMapSpec
from ..schema import ANNOTATION_STRUCT, ANNOTATIONS_TYPE


class AnnotationKernel:
    """Compiled quoted-triples map: turns annotation-side rows into
    ``(key, predicate, value, datatype)`` records (flattened quads)."""

    def __init__(self, tm: TriplesMapSpec, prefixes: dict[str, str]):
        if not tm.subject.is_quoted:
            raise ValueError(f"{tm.name}: not a quoted map")
        self.name = tm.name
        self.quoted_ref = tm.subject.quoted_ref
        self.join_left = tm.subject.join_left  # column on the annotation side
        self.join_right = tm.subject.join_right  # carried column on triples side
        self.pos = [CompiledPO(po, prefixes) for po in tm.predicate_objects]

    def flatten(self, table: pa.Table) -> pa.Table:
        """Annotation rows → flat (key, predicate, value, datatype) table."""
        parts = []
        n = table.num_rows
        key = table.column(self.join_left) if self.join_left else pa.nulls(n, pa.string())
        for po in self.pos:
            vals, keep = po.values(table)
            sub = pa.table(
                {
                    "key": key,
                    "predicate": pa.nulls(n, pa.string()).fill_null(po.predicate),
                    "value": vals,
                    "datatype": pa.nulls(n, pa.string())
                    if po.datatype is None
                    else pa.nulls(n, pa.string()).fill_null(po.datatype),
                }
            )
            if not keep.all():
                sub = sub.filter(pa.array(keep))
            parts.append(sub)
        return pa.concat_tables(parts)


def build_annotation_index(
    ann_table: pa.Table, kernel: AnnotationKernel
) -> dict[str, list[dict]]:
    """Driver-side aggregation of the (small) annotation side into
    ``{join_key: [annotation structs]}`` for broadcast."""
    flat = kernel.flatten(ann_table)
    index: dict[str, list[dict]] = {}
    for row in flat.to_pylist():
        index.setdefault(str(row["key"]), []).append(
            {
                "predicate": row["predicate"],
                "value": row["value"],
                "datatype": row["datatype"],
            }
        )
    return index


def annotate_broadcast(
    triples: "rd.Dataset",
    index: dict[str, list[dict]],
    *,
    key_column: str,
    only_map: str | None = None,
) -> "rd.Dataset":
    """Attach the broadcast annotation index as an ``annotations`` list
    column. ``ray.put`` ships the index to the object store ONCE; every task
    reads the same copy (SURVEY.md §4.2 broadcast-join rule).

    ``only_map`` restricts annotation eligibility to triples produced by one
    triples map — the analog of the reference's subject-URI filter
    (``rdf_star_etl_yarrrml.py:482-484``).
    """
    index_ref = ray.put(index)

    def attach(batch: pa.Table) -> pa.Table:
        idx = ray.get(index_ref)
        n = batch.num_rows
        keys = batch.column(key_column) if key_column in batch.column_names else None
        offsets = np.zeros(n + 1, dtype=np.int64)
        values = pa.array([], type=ANNOTATION_STRUCT)
        if keys is not None and idx and n:
            eligible = np.ones(n, dtype=bool)
            if only_map is not None and "map_name" in batch.column_names:
                eligible = (
                    batch.column("map_name")
                    .combine_chunks()
                    .to_numpy(zero_copy_only=False)
                    == only_map
                )
            # Python work is O(unique keys): look up each unique once, build
            # one flat unique-items array, then scatter per row with numpy
            d = keys.combine_chunks().dictionary_encode()
            uniq = d.dictionary.to_pylist()
            per_uniq = [idx.get(str(u), []) if u is not None else [] for u in uniq]
            uniq_len = np.array([len(x) for x in per_uniq], dtype=np.int64)
            uniq_off = np.concatenate([[0], np.cumsum(uniq_len)])[:-1]
            uniq_flat: list[dict] = [item for items in per_uniq for item in items]
            codes = d.indices.to_numpy(zero_copy_only=False)
            valid = codes is not None and not np.issubdtype(codes.dtype, np.floating)
            if not valid:  # nulls → float codes with NaN
                mask = np.isnan(codes)
                codes = np.where(mask, 0, codes).astype(np.int64)
                eligible = eligible & ~mask
            codes = codes.astype(np.int64)
            lens_row = np.where(eligible, uniq_len[codes], 0)
            starts_row = uniq_off[codes]
            total = int(lens_row.sum())
            if total:
                grp_start = np.repeat(np.cumsum(lens_row) - lens_row, lens_row)
                take = np.repeat(starts_row, lens_row) + (
                    np.arange(total) - grp_start
                )
                uniq_values = pa.array(uniq_flat, type=ANNOTATION_STRUCT)
                values = uniq_values.take(pa.array(take))
            offsets[1:] = np.cumsum(lens_row)
        ann = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
        return batch.append_column(
            "annotations", ann.cast(pa.list_(ANNOTATION_STRUCT))
        )

    return triples.map_batches(attach, batch_format="pyarrow")


def annotation_quads(annotated: "rd.Dataset") -> "rd.Dataset":
    """Flatten the nested ``annotations`` column into standalone annotation
    quad rows ``(subject, predicate, object_value, ...)`` where the subject
    is the quoted-triple token ``<< s p o >>`` — the textual RDF-star form
    the reference asserts via reifier + ``rdf:reifies``
    (``rdf_star_etl_yarrrml.py:495-524``)."""
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        ann = batch.column("annotations").combine_chunks()
        lens = pc.list_value_length(ann).to_numpy(zero_copy_only=False)
        lens = np.where(np.isnan(lens.astype(float)), 0, lens).astype(np.int64)
        take_idx = np.repeat(np.arange(batch.num_rows), lens)
        quoted = pc.binary_join_element_wise(
            "<< ",
            batch.column("subject"),
            " ",
            batch.column("predicate"),
            " ",
            batch.column("object_value"),
            " >>",
            "",
        )
        base = pa.table({"subject": quoted}).take(pa.array(take_idx))
        flat = ann.flatten()
        return pa.table(
            {
                "subject": base.column("subject"),
                "predicate": flat.field("predicate"),
                "object_value": flat.field("value"),
                "object_datatype": flat.field("datatype"),
            }
        )

    return annotated.map_batches(explode, batch_format="pyarrow")


def compile_annotation(spec: MappingSpec, tm_name: str) -> AnnotationKernel:
    return AnnotationKernel(spec.maps[tm_name], spec.prefixes)
