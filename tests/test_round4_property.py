"""Property-based correctness for the round-4 training-pipeline operators
(hypothesis): sliding-window chunking vs the DuckDB range/list_slice oracle,
deterministic split assignment vs its generated CASE chain, mixture quotas
vs QUALIFY row_number, and the range-partitioned global sort vs Python's
sorted() — arbitrary frames with nulls, >2^53 magnitudes, random
whitespace, random window/stride/shard parameters."""

import duckdb
import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from hypothesis import assume, given, settings

from etl_pipeline_rdf_star_ray.pipelines import corpus
from etl_pipeline_rdf_star_ray.pipelines.windows import mixture_sample
from etl_pipeline_rdf_star_ray.stages.sortrange import sort_global


def _collect(ds) -> pa.Table:
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs)


# --- chunk_tokens ----------------------------------------------------------

word = st.text(alphabet="abcxyz09", min_size=1, max_size=5)
ws = st.sampled_from([" ", "  ", "\t", "\n", " \t "])
text = st.one_of(
    st.none(),
    st.builds(
        lambda pre, words, seps, post: pre
        + "".join(w + s for w, s in zip(words, seps + [""] * len(words)))
        + post,
        st.sampled_from(["", " ", "\t"]),
        st.lists(word, max_size=8),
        st.lists(ws, max_size=7),
        st.sampled_from(["", " ", "\n"]),
    ),
)


@given(
    st.lists(text, min_size=1, max_size=8),
    st.integers(1, 5),
    st.integers(1, 5),
)
@settings(max_examples=20, deadline=None)
def test_chunk_tokens_matches_duckdb(texts, size, stride):
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = _collect(corpus.chunk_tokens(rd.from_arrow(docs), size=size, stride=stride))
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(rf"""
        WITH t AS (
          SELECT doc_id, array_filter(
            string_split_regex(text, '\s+'), x -> x <> '') AS toks
          FROM documents WHERE text IS NOT NULL),
        n AS (SELECT doc_id, toks, len(toks)::BIGINT AS n
              FROM t WHERE len(toks) > 0),
        s AS (SELECT doc_id, toks, n,
                     unnest(range(0, n, {stride})) AS start FROM n)
        SELECT doc_id, (start // {stride})::BIGINT AS chunk_id,
               array_to_string(
                 list_slice(toks, start + 1, least(start + {size}, n)),
                 ' ') AS text,
               least({size}, n - start)::BIGINT AS n_tokens
        FROM s
    """).arrow()
    cols = ["doc_id", "chunk_id", "text", "n_tokens"]
    gl = sorted(zip(*(got.column(c).to_pylist() for c in cols))) if got.num_rows else []
    wl = sorted(zip(*(want.column(c).to_pylist() for c in cols))) if want.num_rows else []
    assert gl == wl, (texts, size, stride)


# --- dataset_split ---------------------------------------------------------

split_id = st.one_of(
    st.none(),
    st.integers(-(2**60), 2**60),
)


@given(
    st.lists(split_id, min_size=1, max_size=12),
    st.lists(st.floats(0.05, 1.0), min_size=2, max_size=4),
)
@settings(max_examples=20, deadline=None)
def test_dataset_split_matches_generated_case(ids, weights):
    splits = [(f"s{i}", w) for i, w in enumerate(weights)]
    try:
        case = corpus.split_sql_case(splits, id_expr="doc_id")
    except ValueError:
        assume(False)  # degenerate weights that collapse in the keyspace
    docs = pa.table({"doc_id": pa.array(ids, pa.int64())})
    got = _collect(
        corpus.dataset_split(rd.from_arrow(docs), splits=splits)
    )
    assert got.schema.field("doc_id").type == pa.int64()
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(
        f"SELECT doc_id, {case} AS split FROM documents"
    ).arrow()
    key = lambda r: (r[0] is None, r[0] if r[0] is not None else 0, str(r[1]))
    gl = sorted(zip(got.column("doc_id").to_pylist(),
                    got.column("split").to_pylist()), key=key)
    wl = sorted(zip(want.column("doc_id").to_pylist(),
                    want.column("split").to_pylist()), key=key)
    assert gl == wl, (ids, splits)


# --- mixture_sample --------------------------------------------------------

src = st.sampled_from(["a", "b", "c", None])


@given(
    st.lists(src, min_size=1, max_size=16),
    st.dictionaries(st.sampled_from(["a", "b"]), st.integers(0, 6),
                    min_size=1, max_size=2),
)
@settings(max_examples=20, deadline=None)
def test_mixture_sample_matches_duckdb(sources, quotas):
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(sources)), pa.int64()),
            "lang": pa.array(sources, pa.string()),
        }
    )
    got = _collect(
        mixture_sample(
            rd.from_arrow(docs), source_col="lang", id_col="doc_id",
            quotas=quotas,
        )
    )
    arms = "".join(
        f"WHEN '{k}' THEN {v} " for k, v in quotas.items()
    )
    con = duckdb.connect()
    con.register("docs", docs)
    want = con.execute(
        f"""SELECT * FROM docs QUALIFY row_number() OVER (
              PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
            <= CASE lang {arms} ELSE 0 END"""
    ).arrow()
    gl = sorted(got.column("doc_id").to_pylist()) if got.num_rows else []
    wl = sorted(want.column("doc_id").to_pylist()) if want.num_rows else []
    assert gl == wl, (sources, quotas)


# --- sort_global -----------------------------------------------------------

sort_key = st.one_of(
    st.none(),
    st.integers(-50, 50),
    st.integers(2**53, 2**53 + 4),
)


@given(st.lists(sort_key, min_size=1, max_size=24), st.integers(1, 6))
@settings(max_examples=20, deadline=None)
def test_sort_global_matches_sorted(ks, num_shards):
    t = pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "v": pa.array(range(len(ks)), pa.int64()),
        }
    )
    mid = max(1, len(ks) // 2)
    ds = rd.from_arrow([t.slice(0, mid), t.slice(mid)])
    out = _collect(sort_global(ds, keys=["k", "v"], num_shards=num_shards))
    got = list(zip(out.column("k").to_pylist(), out.column("v").to_pylist()))
    want = sorted(
        zip(ks, range(len(ks))),
        key=lambda r: (r[0] is None, r[0] if r[0] is not None else 0, r[1]),
    )
    assert got == want, (ks, num_shards)
