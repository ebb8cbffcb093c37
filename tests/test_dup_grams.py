"""Corpus-internal duplicated-k-gram fraction (dedup.dup_gram_fraction):
DuckDB parity on planted shared spans, per-doc distinctness (a doc
repeating its own gram is NOT duplication unless another doc has it),
block-count invariance, empty/null/short docs, and the driver query at
sf0.001."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

sys.path.insert(0, "/root/repo/tests")
from oracle_harness import run as oracle_run

from etl_pipeline_rdf_star_ray.pipelines.dedup import dup_gram_fraction

SF = "/root/testdata/sf0.001"


def test_driver_query_matches_oracle():
    assert oracle_run(SF, ["text_dup_grams"]) == 0


def _oracle(tbl: pa.Table, k: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.sql(
        rf"""
WITH tok AS (
  SELECT doc_id,
         array_filter(string_split_regex(coalesce(text, ''), '\s+'),
                      x -> x <> '') AS ts
  FROM documents),
pairs AS (
  SELECT DISTINCT doc_id, array_to_string(ts[t.i : t.i + {k - 1}], ' ') AS g
  FROM tok, UNNEST(generate_series(1, len(ts) - {k - 1})) AS t(i)
  WHERE len(ts) >= {k}),
gc AS (SELECT g, count(DISTINCT doc_id) AS nd FROM pairs GROUP BY g),
per AS (
  SELECT p.doc_id, count(*)::BIGINT AS n_grams,
         sum(CASE WHEN gc.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
  FROM pairs p JOIN gc USING (g) GROUP BY p.doc_id)
SELECT d.doc_id, coalesce(n_grams, 0)::BIGINT AS n_grams,
       coalesce(n_dup, 0)::BIGINT AS n_dup,
       CASE WHEN coalesce(n_grams, 0) = 0 THEN 0
            ELSE floor(n_dup::DOUBLE / n_grams * 10000) / 10000
       END AS dup_frac
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY doc_id
"""
    ).df()


def _got(tbl: pa.Table, k: int, blocks: int, shards: int = 8) -> pd.DataFrame:
    return (
        dup_gram_fraction(
            rd.from_arrow(tbl).repartition(blocks), k=k, num_shards=shards
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_planted_spans_and_edge_docs(ray_session):
    """Doc 1 and 2 share a verbatim span; doc 3 repeats ITS OWN phrase
    (no other doc has it → not duplicated); docs 4/5/6 are empty, null
    and shorter than k."""
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": [
                "alpha beta gamma delta unique one",
                "zzz alpha beta gamma delta other",
                "echo foxtrot golf echo foxtrot golf",
                "",
                None,
                "too short",
            ],
        }
    )
    got = _got(tbl, 3, 3)
    want = _oracle(tbl, 3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    by = got.set_index("doc_id")
    assert by.loc[1, "n_dup"] == 2  # 'alpha beta gamma', 'beta gamma delta'
    assert by.loc[3, "n_dup"] == 0  # self-repeats are not duplication
    assert (by.loc[[4, 5, 6], "n_grams"] == 0).all()
    assert (by.loc[[4, 5, 6], "dup_frac"] == 0).all()


def test_random_corpus_matches_and_block_invariant(ray_session):
    """Random docs from a tiny vocab (heavy sharing), identical across
    block counts and equal to the SQL."""
    rng = np.random.default_rng(31)
    vocab = np.array(["a", "b", "c", "d", "e"])
    docs = [
        " ".join(rng.choice(vocab, int(rng.integers(0, 15))))
        for _ in range(80)
    ]
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(80), pa.int64()), "text": docs}
    )
    want = _oracle(tbl, 2)
    for blocks in (1, 4, 9):
        got = _got(tbl, 2, blocks)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_k_larger_than_any_doc(ray_session):
    tbl = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": ["a b", "a b"]}
    )
    got = _got(tbl, 5, 2)
    assert (got["n_grams"] == 0).all()
    assert (got["dup_frac"] == 0).all()


def test_repeated_doc_id_rows_count_once(ray_session):
    """A doc_id appearing in MULTIPLE rows (even across blocks) is one
    document: its grams dedupe globally and self-copies are NOT
    cross-document duplication (review r4)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 1, 2], pa.int64()),
            "text": ["a b c", "a b c", "x y z"],
        }
    )
    got = _got(tbl, 3, 3)  # each row its own block
    by = got.set_index("doc_id")
    assert by.loc[1, "n_grams"] == 1 and by.loc[1, "n_dup"] == 0
    assert by.loc[1, "dup_frac"] == 0.0
    # a REAL cross-doc duplicate still counts
    tbl2 = pa.table(
        {
            "doc_id": pa.array([1, 1, 2], pa.int64()),
            "text": ["a b c", "a b c", "a b c"],
        }
    )
    by2 = _got(tbl2, 3, 3).set_index("doc_id")
    assert by2.loc[1, "n_dup"] == 1 and by2.loc[2, "n_dup"] == 1
