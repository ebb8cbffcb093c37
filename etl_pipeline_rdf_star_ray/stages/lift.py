"""Mapping-lift stage: transcripts (or any table) → RDF-star-like triple
records, as streaming ``map_batches`` over zero-copy Arrow.

Ray re-expression of the reference's Pass-1 asserted-triples loop
(``rdf_star_etl_yarrrml.py:302-449``): the mapping compiles once on the
driver (``mapping.compile_lift``), each batch fans out column-wise, and
multiple triples maps become one ``Dataset.union``. The ×k row→triple
amplification (reference measures ×33, ``csv_generator/BENCHMARK_DELIVERY.md:
119-126``) stays inside tasks — nothing widens before the object store.
"""

from __future__ import annotations

import ray.data as rd

from ..mapping import MappingSpec, compile_lift, parse_yarrrml

#: Default declarative mapping for the transcripts lake table — the flagship
#: lift (subject per turn, typed literals, conversation link). Expressed in
#: the same YARRRML-lite grammar as the reference's
#: ``mappings/data_products_rml.yaml``.
TRANSCRIPTS_MAPPING_YAML = """
prefixes:
  ex:   "http://example.org/"
  rdf:  "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  xsd:  "http://www.w3.org/2001/XMLSchema#"

mappings:
  turnTM:
    sources:
      - ['transcripts~parquet']
    subject: ex:turn/$(conv_id)_$(turn_idx)
    predicateobjects:
      - [a, ex:Turn]
      - [ex:role, $(role)]
      - [ex:text, $(text), xsd:string]
      - [ex:tool, $(tool)]
      - [ex:ts, $(ts), xsd:dateTime]
      - predicates: ex:conversation
        objects:
          value: ex:conv/$(conv_id)
          type: iri

  convTM:
    sources:
      - ['transcripts~parquet']
    subject: ex:conv/$(conv_id)
    predicateobjects:
      - [a, ex:Conversation]
"""


def transcripts_spec() -> MappingSpec:
    return parse_yarrrml(TRANSCRIPTS_MAPPING_YAML)


def lift_dataset(
    ds: "rd.Dataset",
    spec: MappingSpec,
    map_names: list[str] | None = None,
    *,
    carry_columns: tuple[str, ...] = (),
    include_map_name: bool = True,
) -> "rd.Dataset":
    """Apply every (non-quoted) triples map of ``spec`` to ``ds`` and union
    the results into one triple-record Dataset."""
    names = map_names or [
        n for n, tm in spec.maps.items() if not tm.subject.is_quoted
    ]
    outs = []
    for name in names:
        kernel = compile_lift(
            spec,
            name,
            carry_columns=carry_columns,
            include_map_name=include_map_name,
        )
        outs.append(ds.map_batches(kernel, batch_format="pyarrow"))
    out = outs[0]
    if len(outs) > 1:
        out = out.union(*outs[1:])
    return out
