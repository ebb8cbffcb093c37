"""Property-based tests (hypothesis) — beyond the reference's test strategy
(it has none, SURVEY.md §5): the LWW merge kernel against a DuckDB oracle on
arbitrary change logs, and the template compiler against a direct Python
model of the reference's row-at-a-time semantics."""

import duckdb
import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from etl_pipeline_rdf_star_ray.mapping import (
    CompiledTemplate,
    expand_prefixed,
)
from etl_pipeline_rdf_star_ray.stages.merge import lww_merge

# --- LWW merge --------------------------------------------------------------

event = st.fixed_dictionaries(
    {
        "op": st.sampled_from(["insert", "update", "delete"]),
        "conv_id": st.sampled_from(["a", "b", "c"]),
        "turn_idx": st.integers(0, 3),
        "text": st.text(alphabet="xyz", min_size=0, max_size=3),
    }
)


@given(st.lists(event, min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_lww_merge_matches_duckdb(events):
    rows = [
        {**e, "lsn": i, "text": None if e["op"] == "delete" else e["text"]}
        for i, e in enumerate(events)
    ]
    t = pa.Table.from_pylist(rows).cast(
        pa.schema(
            [
                ("op", pa.string()),
                ("conv_id", pa.string()),
                ("turn_idx", pa.int64()),
                ("text", pa.string()),
                ("lsn", pa.int64()),
            ]
        )
    )
    got = (
        lww_merge(t)
        .select(["conv_id", "turn_idx", "text", "lsn"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("log", t)
    want = con.sql(
        """
        SELECT conv_id, turn_idx, text, lsn FROM (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                       ORDER BY lsn DESC) rn FROM log)
        WHERE rn = 1 AND op <> 'delete' ORDER BY conv_id, turn_idx
        """
    ).df()
    assert len(got) == len(want)
    for col in ("conv_id", "turn_idx", "lsn"):
        assert (got[col].values == want[col].values).all()
    eq = (got["text"] == want["text"]) | (got["text"].isna() & want["text"].isna())
    assert eq.all()


# --- merge idempotence / commutativity with pre-merge -----------------------


@given(st.lists(event, min_size=2, max_size=30), st.integers(1, 29))
@settings(max_examples=40, deadline=None)
def test_lww_pre_merge_associative(events, split):
    """merge(all) == merge(merge(first_part) ∪ second_part) — the property
    the exchange actors' incremental compaction relies on."""
    rows = [{**e, "lsn": i} for i, e in enumerate(events)]
    t = pa.Table.from_pylist(rows)
    split = min(split, len(rows) - 1)
    a, b = t.slice(0, split), t.slice(split)
    direct = lww_merge(t).to_pylist()
    pre = lww_merge(a, drop_deletes=False)
    staged = lww_merge(pa.concat_tables([pre, b])).to_pylist()
    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    assert sorted(direct, key=key) == sorted(staged, key=key)


# --- template compiler ------------------------------------------------------


def _reference_instantiate(template, row, prefixes):
    """Direct Python model of the reference's row-at-a-time instantiation
    (``instantiate_template_vectorized`` ``rdf_star_etl_yarrrml.py:86-103``)."""
    import re

    out = template
    for var in re.findall(r"\$\(([^)]+)\)", template):
        value = row.get(var)
        if value is None or value == "":
            s = "unknown"
        else:
            s = re.sub(r"[^\w\-.]", "_", str(value), flags=re.ASCII)
            s = s or "unknown"
        out = out.replace(f"$({var})", s)
    return expand_prefixed(out, prefixes)


safe_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=8
)


@given(
    st.lists(st.one_of(safe_text, st.none()), min_size=1, max_size=5),
    st.sampled_from(["ex:d/$(c0)", "$(c0)", "ex:$(c0)_x$(c0)", "lit-$(c0)-end"]),
)
@settings(max_examples=80, deadline=None)
def test_compiled_template_matches_reference_model(values, template):
    prefixes = {"ex": "http://example.org/"}
    t = pa.table({"c0": pa.array(values, pa.string())})
    got = CompiledTemplate(template, prefixes, sanitize=True)(t).to_pylist()
    want = [_reference_instantiate(template, {"c0": v}, prefixes) for v in values]
    assert got == want
