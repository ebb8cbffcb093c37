"""Driver-contract checks: entry() smoke + a fast subset of the
queries-vs-oracle comparison (the full sweep is ``python
tests/oracle_harness.py``, run standalone; the driver runs the real gate at
sf0.01)."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as e  # noqa: E402
from tests.oracle_harness import compare, connect, to_pandas  # noqa: E402

SF = "/root/testdata/sf0.001"

FAST_SUBSET = [
    "cdc_upsert_full",
    "cdc_value_history",
    "lift_triples",
    "annotation_join",
    "agg_pricing_summary",
    "dedup_exact",
    "text_quality",
    "text_langid",
    "similarity_topk",
    "multimodal_meta",
]


def test_entry_returns_rows():
    ds = e.entry()
    df = to_pandas(ds)
    assert len(df) > 0
    assert {"conv_id", "turn_idx", "text", "lsn"} <= set(df.columns)


def test_queries_and_oracles_aligned():
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is callable; oracles are non-empty SQL strings
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
    # ≥25 operators surfaced, ≥20 oracle-checked
    assert len(qs) >= 25 and len(oracles) >= 20


def test_fast_subset_matches_oracles():
    qs, oracles = e.queries(), e.oracle_sql()
    con = connect(SF)
    for name in FAST_SUBSET:
        got = to_pandas(qs[name](SF))
        want = con.sql(oracles[name]).df()
        problems = compare(name, got, want)
        assert not problems, f"{name}: {problems}"
