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
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..mapping import CompiledPO, MappingSpec, TriplesMapSpec
from ..schema import ANNOTATION_STRUCT


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
        """Annotation rows → flat (key, predicate, value, datatype) table.

        A quoted map with NO join condition matches every eligible triple —
        the reference's cross-product fallback
        (``rdf_star_etl_engine_dynamic.py:377-379``): modeled by the
        constant key ``__all__`` + ``key_column=None`` on the probe side."""
        parts = []
        n = table.num_rows
        key = (
            table.column(self.join_left)
            if self.join_left
            else pa.nulls(n, pa.string()).fill_null("__all__")
        )
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


class AnnotationIndex:
    """Broadcast-ready annotation index: one SORTED uint64 key-hash array
    with group offsets over one flat Arrow struct array — built once on the
    driver (all vectorized), shipped once via ``ray.put``, probed per batch
    with ``np.searchsorted`` (pure C). This replaces the reference's
    in-process ``{key: [triples]}`` Python index
    (``rdf_star_etl_yarrrml.py:477-485``) with a structure whose lookup does
    no per-row Python. 64-bit key hashing: a collision would merge two keys'
    annotation lists — probability ~n²/2⁶⁴, negligible for any broadcastable
    side."""

    def __init__(self, key_hashes: np.ndarray, offsets: np.ndarray,
                 values: pa.Array, n_keys: int):
        self.key_hashes = key_hashes  # sorted uint64
        self.offsets = offsets  # int64, len = n_keys + 1
        self.values = values  # ANNOTATION_STRUCT array, grouped by key
        self.n_keys = n_keys

    def __len__(self) -> int:
        return self.n_keys


def _hash_keys(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    from ..functions.hashing import xxh64_column

    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        arr = pc.cast(arr, pa.string())
    return xxh64_column(arr)


def build_annotation_index(
    ann_table: pa.Table, kernel: AnnotationKernel
) -> AnnotationIndex:
    """Driver-side vectorized aggregation of the (small) annotation side:
    flatten → hash keys → sort → group boundaries. O(n log n), no Python
    rows."""
    flat = kernel.flatten(ann_table)
    if flat.num_rows and flat.column("key").null_count:
        flat = flat.filter(pc.is_valid(flat.column("key")))
    n = flat.num_rows
    if n == 0:
        return AnnotationIndex(
            np.empty(0, np.uint64), np.zeros(1, np.int64),
            pa.array([], ANNOTATION_STRUCT), 0,
        )
    kh = _hash_keys(flat.column("key").combine_chunks())
    order = np.argsort(kh, kind="stable")
    kh = kh[order]
    sorted_flat = flat.take(pa.array(order))
    values = pa.StructArray.from_arrays(
        [
            sorted_flat.column("predicate").combine_chunks(),
            sorted_flat.column("value").combine_chunks(),
            sorted_flat.column("datatype").combine_chunks(),
        ],
        fields=list(ANNOTATION_STRUCT),
    )
    starts = np.concatenate([[0], np.flatnonzero(kh[1:] != kh[:-1]) + 1])
    offsets = np.concatenate([starts, [n]]).astype(np.int64)
    return AnnotationIndex(kh[starts], offsets, values, len(starts))


def annotate_broadcast(
    triples: "rd.Dataset",
    index: AnnotationIndex,
    *,
    key_column: str,
    only_map: str | None = None,
    subject_contains: str | None = None,
) -> "rd.Dataset":
    """Attach the broadcast annotation index as an ``annotations`` list
    column. ``ray.put`` ships the index to the object store ONCE; every task
    reads the same copy (SURVEY.md §4.2 broadcast-join rule).

    Eligibility filters: ``only_map`` restricts to triples produced by one
    triples map; ``subject_contains`` is the reference's exact subject-URI
    substring filter (``'/dataset/'``, ``rdf_star_etl_yarrrml.py:482-484``).
    """
    index_ref = ray.put(index)

    def attach(batch: pa.Table) -> pa.Table:
        idx: AnnotationIndex = ray.get(index_ref)
        n = batch.num_rows
        if key_column is None:
            # cross-product fallback: every eligible row probes '__all__'
            keys = pa.nulls(n, pa.string()).fill_null("__all__")
        else:
            keys = (
                batch.column(key_column)
                if key_column in batch.column_names
                else None
            )
        offsets = np.zeros(n + 1, dtype=np.int64)
        values = pa.array([], type=ANNOTATION_STRUCT)
        if keys is not None and len(idx) and n:
            eligible = np.ones(n, dtype=bool)
            if only_map is not None and "map_name" in batch.column_names:
                eligible = (
                    batch.column("map_name")
                    .combine_chunks()
                    .to_numpy(zero_copy_only=False)
                    == only_map
                )
            if subject_contains is not None:
                eligible &= (
                    pc.match_substring(batch.column("subject"), subject_contains)
                    .combine_chunks()
                    .to_numpy(zero_copy_only=False)
                    .astype(bool)
                )
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            if keys.null_count:
                eligible &= ~np.asarray(keys.is_null())
            kh = _hash_keys(keys)
            # binary search the sorted broadcast index — pure C per batch
            pos = np.searchsorted(idx.key_hashes, kh)
            pos_c = np.minimum(pos, len(idx) - 1)
            found = eligible & (idx.key_hashes[pos_c] == kh)
            lens_row = np.where(found, idx.offsets[pos_c + 1] - idx.offsets[pos_c], 0)
            starts_row = idx.offsets[pos_c]
            total = int(lens_row.sum())
            if total:
                grp_start = np.repeat(np.cumsum(lens_row) - lens_row, lens_row)
                take = np.repeat(starts_row, lens_row) + (np.arange(total) - grp_start)
                values = idx.values.take(pa.array(take))
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


def annotate_shuffle(
    triples: "rd.Dataset",
    annotations: "rd.Dataset",
    kernel: AnnotationKernel,
    *,
    key_column: str,
    num_partitions: int = 8,
    only_map: str | None = None,
) -> "rd.Dataset":
    """Large-annotation-side path: hash-partitioned ``Dataset.join`` on the
    key (both sides shuffled once), emitting FLAT annotation quad rows — the
    complement of :func:`annotate_broadcast` when the annotation side no
    longer fits a broadcast (Ray guide: "both sides large" rule).

    Output matches :func:`annotation_quads`: one row per (matched triple,
    annotation PO) with the quoted-triple token as subject.

    ``num_partitions`` must not exceed available CPUs by much: Ray's join
    spawns one hash-aggregator actor per partition, and a pool larger than
    the node stalls waiting for resources (measured: 32 partitions on a
    4-cpu session hangs)."""

    flat = annotations.map_batches(
        lambda b: kernel.flatten(b), batch_format="pyarrow"
    ).rename_columns(
        {"predicate": "ann_predicate", "value": "ann_value", "datatype": "ann_datatype"}
    )
    left = triples
    if only_map is not None:
        left = left.map_batches(
            lambda b: b.filter(pc.equal(b.column("map_name"), only_map))
            if "map_name" in b.column_names
            else b,
            batch_format="pyarrow",
        )

    def keyify(batch: pa.Table) -> pa.Table:
        col = batch.column(key_column)
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            batch = batch.set_column(
                batch.column_names.index(key_column), key_column,
                pc.cast(col, pa.string()),
            )
        return batch

    def keyify_ann(batch: pa.Table) -> pa.Table:
        col = batch.column("key")
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            batch = batch.set_column(
                batch.column_names.index("key"), "key", pc.cast(col, pa.string())
            )
        return batch

    joined = left.map_batches(keyify, batch_format="pyarrow").join(
        flat.map_batches(keyify_ann, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=(key_column,),
        right_on=("key",),
    )

    def to_quads(batch: pa.Table) -> pa.Table:
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
        return pa.table(
            {
                "subject": quoted,
                "predicate": batch.column("ann_predicate"),
                "object_value": batch.column("ann_value"),
                "object_datatype": batch.column("ann_datatype"),
            }
        )

    return joined.map_batches(to_quads, batch_format="pyarrow")


def attach_static_annotations(
    triples: "rd.Dataset", annotations: list[dict]
) -> "rd.Dataset":
    """Constant per-triple provenance annotations from a static source
    config — the legacy engine's fixed 7-quad provenance block
    (``add_provenance_annotations`` ``rdf_star_etl_engine.py:55-128``:
    wasDerivedFrom/generatedAtTime/wasAttributedTo/source/confidence/
    trustLevel/verificationStatus), as one constant-valued nested column
    appended per batch (SURVEY.md §2.3)."""
    items = [
        {
            "predicate": a["predicate"],
            "value": str(a["value"]),
            "datatype": a.get("datatype"),
        }
        for a in annotations
    ]

    def attach(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        values = pa.array(items * n, type=ANNOTATION_STRUCT)
        offsets = pa.array(
            np.arange(0, (n + 1) * len(items), len(items), dtype=np.int32)
        )
        ann = pa.ListArray.from_arrays(offsets, values)
        return batch.append_column("annotations", ann)

    return triples.map_batches(attach, batch_format="pyarrow")
