"""Corpus-level operators: fuzzy-dedup clustering (union-find + distributed
label propagation), vocabulary heavy hitters, deterministic hash sampling,
and the conversation analytics — each checked against its DuckDB oracle
(the exact SQL the driver runs) at sf0.001."""

import sys

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

sys.path.insert(0, "/root/repo/tests")
from oracle_harness import run as oracle_run

from etl_pipeline_rdf_star_ray.pipelines import corpus

SF = "/root/testdata/sf0.001"


def test_new_queries_match_oracles():
    assert (
        oracle_run(
            SF,
            [
                "dedup_clusters",
                "dedup_fuzzy_keep",
                "top_terms",
                "sample_hash",
                "conv_stats",
                "turn_gaps",
            ],
        )
        == 0
    )


def test_connected_components_basic():
    pairs = pa.table({"id_a": [1, 2, 10, 20], "id_b": [2, 3, 11, 10]})
    labels = corpus.connected_components(pairs)
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == labels[20] == 10


def test_label_propagation_matches_union_find():
    # chain + triangle + isolated pair: nontrivial diameters
    pairs = pa.table(
        {
            "id_a": [5, 6, 7, 8, 100, 101, 100, 200],
            "id_b": [6, 7, 8, 9, 101, 102, 102, 201],
        }
    )
    uf = corpus.connected_components(pairs)
    lp = (
        corpus.cc_label_propagation(rd.from_arrow(pairs))
        .to_pandas()
        .set_index("node")["label"]
        .to_dict()
    )
    assert lp == uf


def test_fuzzy_dedup_keeps_representatives():
    docs = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3, 10], "text": ["a", "a2", "b", "c"]})
    )
    pairs = pa.table({"id_a": [1], "id_b": [2]})
    kept = corpus.fuzzy_dedup(docs, pairs).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 3, 10]


def test_sample_hash_is_deterministic_subset():
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    a = corpus.sample_hash(ds).to_pandas()
    b = corpus.sample_hash(ds).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    n_total = ds.count()
    assert 0 < len(a) < n_total  # a real, strict subset at the ~1/8 rate


def test_quantiles_pivot_json_match_oracles():
    assert (
        oracle_run(SF, ["grouped_quantiles", "user_event_matrix", "json_props"])
        == 0
    )


def test_flatten_normalize_match_oracles():
    assert oracle_run(SF, ["conv_flatten", "text_normalize"]) == 0


def test_conv_stats_counts_null_role_turns():
    """A NULL role must still contribute its turn/chars to the rollup but
    NOT to n_roles (SQL count(DISTINCT role) semantics) — ADVICE r2: pandas
    groupby silently drops NaN keys by default."""
    from etl_pipeline_rdf_star_ray.pipelines.analytics import conv_stats

    state = rd.from_arrow(
        pa.table(
            {
                "conv_id": ["c1", "c1", "c1", "c2"],
                "turn_idx": pa.array([0, 1, 2, 0], pa.int32()),
                "role": ["user", None, "assistant", None],
                "text": ["hello", "mystery", "world", "solo"],
                "ts": pa.array([1000, 2000, 3000, 500], pa.timestamp("us")),
            }
        )
    )
    out = conv_stats(state).to_pandas().set_index("conv_id").sort_index()
    assert out.loc["c1", "n_turns"] == 3  # null-role turn counted
    assert out.loc["c1", "n_roles"] == 2  # but not as a role
    assert out.loc["c1", "n_chars"] == len("hello") + len("mystery") + len("world")
    assert out.loc["c2", "n_turns"] == 1
    assert out.loc["c2", "n_roles"] == 0


def test_turn_gaps_null_ts_yields_null_gap():
    """NaT must propagate to a NULL gap, not alias the -2^63 int sentinel
    (ADVICE r2)."""
    from etl_pipeline_rdf_star_ray.pipelines.analytics import turn_gaps

    state = rd.from_arrow(
        pa.table(
            {
                "conv_id": ["c1", "c1", "c1"],
                "turn_idx": pa.array([0, 1, 2], pa.int32()),
                "ts": pa.array([1_000_000, None, 5_000_000], pa.timestamp("us")),
            }
        )
    )
    out = (
        turn_gaps(state, num_shards=2)
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert pd.isna(out.loc[0, "gap_us"])  # first turn: no predecessor
    assert pd.isna(out.loc[1, "gap_us"])  # null ts → null gap
    assert pd.isna(out.loc[2, "gap_us"])  # predecessor ts null → null gap


def test_cluster_assign_distributed_fallback_parity(ray_session):
    """Dataset edge input above the budget routes through distributed label
    propagation + sharded left join — identical (doc, cluster) output as the
    driver union-find path, singletons included."""
    pairs = pa.table(
        {
            "id_a": [5, 6, 7, 8, 100, 101, 100, 200],
            "id_b": [6, 7, 8, 9, 101, 102, 102, 201],
        }
    )
    docs = rd.from_arrow(
        pa.table({"doc_id": list(range(5, 10)) + [100, 101, 102, 200, 201, 999]})
    )
    driver = (
        corpus.cluster_assign(docs, pairs)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    dist = (
        corpus.cluster_assign(
            docs, rd.from_arrow(pairs), edge_budget_rows=0
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(driver, dist, check_dtype=False)
    # singleton keeps its own id as cluster in both
    assert driver.set_index("doc_id")["cluster"][999] == 999


def test_fuzzy_dedup_distributed_fallback_parity(ray_session):
    pairs = pa.table({"id_a": [1, 2], "id_b": [2, 3]})
    docs = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3, 10], "text": ["a", "a2", "a3", "c"]})
    )
    driver = corpus.fuzzy_dedup(docs, pairs).to_pandas()
    dist = corpus.fuzzy_dedup(
        docs, rd.from_arrow(pairs), edge_budget_rows=0
    ).to_pandas()
    assert sorted(driver["doc_id"]) == sorted(dist["doc_id"]) == [1, 10]
    assert sorted(dist.columns) == sorted(docs.schema().names)


def test_cluster_assign_dataset_under_budget_collects(ray_session):
    """A Dataset edge input UNDER the budget is collected and takes the
    broadcast path — same result, no label-propagation rounds."""
    pairs = pa.table({"id_a": [1], "id_b": [2]})
    docs = rd.from_arrow(pa.table({"doc_id": [1, 2, 3]}))
    got = (
        corpus.cluster_assign(docs, rd.from_arrow(pairs))
        .to_pandas().sort_values("doc_id")
    )
    assert got["cluster"].tolist() == [1, 1, 3]


_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(array_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY 1,2),
df AS (SELECT term, COUNT(DISTINCT doc_id)::DOUBLE AS df FROM toks GROUP BY 1)
SELECT tf.doc_id, tf.term,
       floor((tf.tf * ln((SELECT COUNT(*)::DOUBLE FROM documents)/df.df)
              + 1e-9) * 1000000)/1000000 AS tfidf
FROM tf JOIN df USING (term)
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) <= 2
ORDER BY doc_id, tfidf DESC, term
"""


def _tfidf_rows(tbl: pa.Table) -> list[tuple]:
    return sorted(
        zip(*(tbl.column(c).to_pylist() for c in ("doc_id", "term", "tfidf"))),
        key=lambda r: (
            r[0] is None,
            r[0] if r[0] is not None else 0,
            r[2] is None,  # NULL score sorts last (SQL NULLS LAST)
            -(r[2] if r[2] is not None else 0.0),
            r[1],
        ),
    )


def test_tfidf_topk_matches_oracle(ray_session):
    """tfidf_topk_terms vs DuckDB on a table where the same doc id appears
    in MULTIPLE input blocks (tf must merge on the doc exchange), plus ties,
    a null-text doc, a null doc_id (its rows survive as the SQL NULL
    partition but do NOT count toward df), and a doc_id >= 2^53 (must not
    float anywhere). Arrow-native oracle compare so the test itself cannot
    re-float what it verifies."""
    b1 = pa.table(
        {
            "doc_id": pa.array([1, 2, 4], pa.int64()),
            "text": ["apple banana apple cherry", "banana banana date", None],
        }
    )
    b2 = pa.table(
        {
            "doc_id": pa.array([1, 3, None, 2**53 + 1], pa.int64()),
            "text": [
                "apple date",  # doc 1 straddles blocks: tf(apple)=3 total
                "apple apple apple",
                "cherry date nullonly",
                "banana",
            ],
        }
    )
    ds = rd.from_arrow([b1, b2])
    assert ds.num_blocks() == 2
    got = corpus.tfidf_topk_terms(ds, k=2)
    # collect as Arrow: Dataset.to_pandas() would float the null-bearing
    # int64 doc_id and mask exactly the regression this test pins
    import ray as _ray

    got_tbl = pa.concat_tables(
        t for t in _ray.get(got.to_arrow_refs()) if t.num_rows
    )
    assert got_tbl.schema.field("doc_id").type == pa.int64()
    import duckdb

    con = duckdb.connect()
    con.register("documents", pa.concat_tables([b1, b2]))
    want_tbl = con.execute(_TFIDF_ORACLE).arrow()
    assert _tfidf_rows(got_tbl) == _tfidf_rows(want_tbl)
    ids = set(got_tbl.column("doc_id").to_pylist())
    assert 4 not in ids  # null text → no rows
    assert None in ids and 2**53 + 1 in ids
    # doc 1's merged tf(apple)=3 must rank apple in its top-2
    assert ("apple" in {r[1] for r in _tfidf_rows(got_tbl) if r[0] == 1})


def test_dataset_split_deterministic_and_matches_case_oracle(ray_session):
    """Split assignment matches the generated SQL CASE chain (same bounds),
    keeps null ids NULL, never floats 2^53 ids, and is idempotent."""
    import duckdb
    import ray as _ray

    docs = pa.table(
        {"doc_id": pa.array([*range(200), None, 2**53 + 1], pa.int64())}
    )
    ds = rd.from_arrow([docs.slice(0, 100), docs.slice(100)])
    got = pa.concat_tables(
        t for t in _ray.get(
            corpus.dataset_split(ds).to_arrow_refs()
        ) if t.num_rows
    )
    assert got.schema.field("doc_id").type == pa.int64()
    con = duckdb.connect()
    con.register("documents", docs)
    case = corpus.split_sql_case(id_expr="doc_id")
    want = con.execute(
        f"SELECT doc_id, {case} AS split FROM documents"
    ).arrow()
    key = lambda r: (r[0] is None, r[0] if r[0] is not None else 0)
    gr = sorted(zip(got.column("doc_id").to_pylist(),
                    got.column("split").to_pylist()), key=key)
    wr = sorted(zip(want.column("doc_id").to_pylist(),
                    want.column("split").to_pylist()), key=key)
    assert gr == wr
    # null id -> NULL split; big id intact; all three labels appear
    assert dict(gr)[None] is None
    assert 2**53 + 1 in dict(gr)
    assert {"train", "val", "test"} <= {s for _, s in gr if s}
    # rerun is byte-identical (no RNG anywhere)
    again = pa.concat_tables(
        t for t in _ray.get(
            corpus.dataset_split(ds).to_arrow_refs()
        ) if t.num_rows
    )
    assert sorted(zip(again.column("doc_id").to_pylist(),
                      again.column("split").to_pylist()), key=key) == gr


def test_dataset_split_validates_args():
    with pytest.raises(ValueError):
        corpus.split_bounds_hex([("only", 1.0)])
    with pytest.raises(ValueError):
        corpus.split_bounds_hex([("a", 0.5), ("b", -0.1)])
    with pytest.raises(ValueError):
        corpus.split_bounds_hex([("a", 0.5), ("a", 0.5)])


def test_chunk_tokens_matches_sql_oracle(ray_session):
    """Sliding windows vs the DuckDB range/list_slice oracle: overlap,
    short final chunks, whitespace runs, empty/whitespace-only/null text,
    multi-block input."""
    import duckdb

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": [
                "a b  c d e f g",  # 7 tokens, double space
                " lead trail ",    # leading/trailing whitespace
                "",                # empty -> no chunks
                None,              # null -> no chunks
                "one",             # single token
            ],
        }
    )
    ds = rd.from_arrow([docs.slice(0, 2), docs.slice(2)])
    got = corpus.chunk_tokens(ds, size=3, stride=2).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(r"""
        WITH t AS (
          SELECT doc_id, array_filter(
            string_split_regex(text, '\s+'), x -> x <> '') AS toks
          FROM documents WHERE text IS NOT NULL),
        n AS (SELECT doc_id, toks, len(toks)::BIGINT AS n
              FROM t WHERE len(toks) > 0),
        s AS (SELECT doc_id, toks, n, unnest(range(0, n, 2)) AS start FROM n)
        SELECT doc_id, (start // 2)::BIGINT AS chunk_id,
               array_to_string(
                 list_slice(toks, start + 1, least(start + 3, n)), ' ') AS text,
               least(3, n - start)::BIGINT AS n_tokens
        FROM s ORDER BY doc_id, chunk_id
    """).fetchdf()
    got = got.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # no chunk exceeds size; every doc's chunk_ids are 0..nc-1
    assert (got["n_tokens"] <= 3).all()
    assert set(got["doc_id"]) == {1, 2, 5}


def test_chunk_tokens_validates_args(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        corpus.chunk_tokens(ds, size=0)
    with pytest.raises(ValueError):
        corpus.chunk_tokens(ds, stride=0)


def test_token_frequency_stats_matches_duckdb(ray_session):
    """Integer-exact unigram-frequency stats: mean global token count and
    rare-token fraction equal the DuckDB explode-join-aggregate oracle on
    a shuffled multi-block corpus with null/empty/punct-only docs."""
    import duckdb

    import numpy as np

    from etl_pipeline_rdf_star_ray.pipelines.corpus import (
        token_frequency_stats,
    )

    rng = np.random.default_rng(29)
    base = ["the", "of", "rareword%d", "x9", "DATA", "Mix3d"]
    texts = []
    for i in range(400):
        parts = []
        for _ in range(int(rng.integers(0, 25))):
            w = base[int(rng.integers(0, len(base)))]
            parts.append(w % i if "%d" in w else w)
        texts.append(
            " ".join(parts) if i % 9 else (None if i % 2 else "!!! ...")
        )
    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64), "text": texts})
    df = df.sample(frac=1.0, random_state=4).reset_index(drop=True)

    got = (
        token_frequency_stats(
            rd.from_pandas(df).repartition(6), rare_max=2, num_shards=7
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        r"""
WITH w AS (
  SELECT doc_id,
         unnest(array_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '')) AS tok
  FROM documents),
cnt AS (SELECT tok, count(*)::BIGINT AS c FROM w GROUP BY tok),
per AS (
  SELECT w.doc_id, count(*)::BIGINT AS n_tokens, sum(c)::BIGINT AS sum_c,
         sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END)::BIGINT AS n_rare
  FROM w JOIN cnt USING (tok) GROUP BY w.doc_id)
SELECT d.doc_id,
  coalesce(n_tokens, 0) AS n_tokens,
  CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0
       ELSE floor(sum_c::DOUBLE / n_tokens * 10000) / 10000 END
    AS mean_tok_count,
  CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0
       ELSE floor(n_rare::DOUBLE / n_tokens * 10000) / 10000 END AS rare_frac
FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id
"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the signals are live: some docs have rare tokens, some are all-common
    assert (want.rare_frac > 0).any() and (want.rare_frac == 0).any()
    assert (want.n_tokens == 0).any()  # null/punct-only docs score zero


def test_conv_dedup_query_matches_oracle():
    assert oracle_run(SF, ["conv_dedup"]) == 0


def test_dedup_conversations_removes_exact_transcript_dups():
    """Two conversations with identical turn sequences collapse to the
    lexicographically-lowest conv_id; a conversation differing only in turn
    ORDER is a different transcript and survives (flatten is ORDER BY
    turn_idx, so the canonical form is order-sensitive)."""
    import duckdb

    state_tbl = pa.table(
        {
            "conv_id": ["c2", "c2", "c1", "c1", "c3", "c3", "c4"],
            "turn_idx": pa.array([0, 1, 0, 1, 1, 0, 0], pa.int32()),
            "role": ["user", "assistant"] * 2 + ["user", "assistant", "user"],
            "text": ["hi", "yo", "hi", "yo", "hi", "yo", "solo"],
        }
    )
    out = (
        corpus.dedup_conversations(rd.from_arrow(state_tbl), num_shards=4)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.execute(
            """
            WITH flat AS (
              SELECT conv_id, count(*)::BIGINT AS n_turns,
                     string_agg(role || ': ' || text, chr(10)
                                ORDER BY turn_idx) AS doc
              FROM state_tbl GROUP BY conv_id)
            SELECT conv_id, n_turns, doc FROM flat
            QUALIFY row_number() OVER (PARTITION BY doc ORDER BY conv_id) = 1
            ORDER BY conv_id
            """
        )
        .arrow()
        .to_pandas()
    )
    pd.testing.assert_frame_equal(
        out[["conv_id", "n_turns", "doc"]], want, check_dtype=False
    )
    # c1/c2 share a transcript -> c1 survives; c3 (reversed order) and the
    # singleton c4 survive: the dedup really removed a row
    assert sorted(out["conv_id"]) == ["c1", "c3", "c4"]


def test_bm25_oracle_and_semantics(ray_session):
    """BM25 (round 5): driver-identical oracle comparison, plus the two
    ranking properties that define the scorer — term-frequency saturation
    and document-length normalization — on a hand corpus."""
    import numpy as np

    assert oracle_run(SF, ["bm25_search"]) == 0

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "cat " * 10 + "filler " * 10,   # tf=10, dl=20
                        "cat " + "filler " * 19,         # tf=1,  dl=20
                        "cat " + "filler " * 3,          # tf=1,  dl=4 (short)
                        "filler only here",              # no hit
                    ]
                ),
            }
        )
    )
    got = (
        corpus.bm25_topk(docs, ["cat"], k=10)
        .to_pandas()
        .set_index("doc_id")["bm25"]
    )
    assert 3 not in got.index  # docs without the term never score
    # saturation: 10x the tf gives a higher but FAR less than 10x score
    assert got[0] > got[1]
    assert got[0] < 5 * got[1]
    # length normalization: same tf, shorter doc ranks higher
    assert got[2] > got[1]
    # exact hand value for doc 1: idf = ln((4-3+0.5)/(3+0.5)+1), dl=20,
    # avgdl = (20+20+4+3)/4
    avgdl = 47 / 4
    idf = np.log((4 - 3 + 0.5) / (3 + 0.5) + 1)
    exp = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 20 / avgdl))
    assert got[1] == np.floor((exp + 1e-9) * 1e4) / 1e4


def test_sft_messages_oracle_and_edges(ray_session, tmp_path):
    """SFT messages export shape: driver-identical oracle comparison, JSON
    byte-compat edges (null role/text, quotes/newlines/unicode, turn
    ordering), and the composition into the JSONL sink."""
    import json

    import duckdb

    from etl_pipeline_rdf_star_ray.pipelines.corpus import sft_messages
    from etl_pipeline_rdf_star_ray.pipelines.export import export_jsonl

    assert oracle_run(SF, ["sft_messages"]) == 0

    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c1", "c2"], pa.string()),
            "turn_idx": pa.array([2, 0, 1, 0], pa.int32()),
            "role": pa.array(["assistant", "user", None, "user"], pa.string()),
            "text": pa.array(['say "hi"\nok', "start ünï", None, "solo"]),
        }
    )
    got = (
        sft_messages(rd.from_arrow(t), num_shards=4)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(
        """
        SELECT conv_id,
               to_json(list(struct_pack(role := role, content := text)
                            ORDER BY turn_idx)) AS messages
        FROM t GROUP BY conv_id ORDER BY conv_id
        """
    ).df()
    assert got["messages"].tolist() == want["messages"].tolist()
    msgs = json.loads(got["messages"][0])
    assert [m["role"] for m in msgs] == ["user", None, "assistant"]  # turn order
    assert msgs[2]["content"] == 'say "hi"\nok'

    # ready-to-train JSONL shards
    root = tmp_path / "sft"
    m = export_jsonl(
        sft_messages(rd.from_arrow(t), num_shards=4),
        str(root),
        shard_key_col="conv_id",
        num_shards=4,
    ).to_pandas()
    assert m["rows"].sum() == 2
    rows = [
        json.loads(line)
        for p in sorted(root.glob("shard-*.jsonl"))
        for line in p.read_text().splitlines()
    ]
    assert {r["conv_id"] for r in rows} == {"c1", "c2"}
    # the nested messages payload survives the sink verbatim
    inner = json.loads(next(r for r in rows if r["conv_id"] == "c1")["messages"])
    assert inner[0]["content"] == "start ünï"


def test_split_family_matches_oracles():
    """Round-5 split pair: leakage-safe per-turn split (hash on conv_id,
    keep_cols carries turn_idx) and the exact-quota stratified split —
    the same query+SQL the driver would run."""
    assert oracle_run(SF, ["conv_split", "doc_stratified_split"]) == 0


def test_conv_split_is_leakage_safe(ray_session):
    """Every turn of a conversation lands in the SAME split — the property
    a per-row hash split violates (train/test contamination through shared
    conversations)."""
    from etl_pipeline_rdf_star_ray.queries import q_conv_split

    got = q_conv_split(SF).to_pandas()
    per_conv = got.groupby("conv_id")["split"].nunique()
    assert (per_conv == 1).all()
    assert set(got["split"].unique()) <= {"train", "val", "test"}
    # synthetic corpus wide enough that all three labels materialize,
    # multi-turn convs still atomic
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(300) for _ in (0, 1)]),
            "turn_idx": pa.array([j for _ in range(300) for j in (0, 1)]),
        }
    )
    out = corpus.dataset_split(
        rd.from_arrow(t), id_col="conv_id", keep_cols=["turn_idx"]
    ).to_pandas()
    assert {"train", "val", "test"} <= set(out["split"].unique())
    assert (out.groupby("conv_id")["split"].nunique() == 1).all()
    assert len(out) == 600  # turn_idx carried through, no row loss


def test_stratified_split_exact_quotas(ray_session):
    """Within every stratum the split sizes hit floor(n*cum + 0.5) quotas
    EXACTLY — including a stratum too small for every label, a null group,
    and ids colliding across groups. Rerun is byte-identical."""
    t = pa.table(
        {
            "doc_id": pa.array(list(range(37)) + [900, 901], pa.int64()),
            "lang": pa.array(
                ["en"] * 20 + ["de"] * 10 + ["fr"] * 4 + ["xx"] * 2
                + [None] * 3
            ),
        }
    )
    ds = rd.from_arrow([t.slice(0, 13), t.slice(13, 11), t.slice(24)])
    out = corpus.stratified_split(
        ds, group_col="lang", splits=[("train", 0.8), ("val", 0.1), ("test", 0.1)]
    ).to_pandas()
    assert len(out) == len(t)
    import numpy as np

    for lang, grp in out.groupby("lang", dropna=False):
        n = len(grp)
        q_train = int(np.floor(n * 0.8 + 0.5))
        q_val = int(np.floor(n * 0.9 + 0.5)) - q_train
        counts = grp["split"].value_counts()
        assert counts.get("train", 0) == q_train, lang
        assert counts.get("val", 0) == q_val, lang
    again = corpus.stratified_split(
        ds, group_col="lang", splits=[("train", 0.8), ("val", 0.1), ("test", 0.1)]
    ).to_pandas()
    key = ["doc_id", "lang"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        again.sort_values(key).reset_index(drop=True),
    )
