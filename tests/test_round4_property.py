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


# --- pack_items (distributed ordered prefix-sum packing) -------------------


@given(
    weights=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=40),
            st.none(),
        ),
        min_size=0,
        max_size=40,
    ),
    capacity=st.integers(min_value=1, max_value=30),
    mode=st.sampled_from(["split", "whole"]),
    shards=st.integers(min_value=1, max_value=9),
)
@settings(max_examples=20, deadline=None)
def test_pack_items_matches_duckdb(ray_session, weights, capacity, mode, shards):
    """Random weights (nulls, zeros, giants vs capacity), random capacity,
    random shard count: the packing layout equals the window-cumsum SQL on
    the surviving positive-weight items."""
    from etl_pipeline_rdf_star_ray.pipelines.training import pack_items

    import pandas as pd

    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(weights), dtype=np.int64),
            "w": pd.array(weights, dtype="Int64"),
        }
    )
    got = pack_items(
        rd.from_pandas(df).repartition(3) if len(df) else rd.from_pandas(df),
        weight_col="w",
        capacity=capacity,
        mode=mode,
        num_shards=shards,
    ).to_pandas()
    if len(got):
        got = got.sort_values(
            ["doc_id", "pack_id"] if mode == "split" else ["doc_id"]
        ).reset_index(drop=True)
    con = duckdb.connect()
    con.register("items", df)
    span = """
    WITH tok AS (SELECT doc_id, w::BIGINT AS n FROM items
                 WHERE coalesce(w, 0) > 0),
    span AS (
      SELECT doc_id, n,
        coalesce(sum(n) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS s
      FROM tok)
    """
    if mode == "whole":
        want = con.execute(
            span
            + f"SELECT doc_id, (s // {capacity})::BIGINT AS pack_id,"
            f" n AS w FROM span ORDER BY doc_id"
        ).df()
    else:
        want = con.execute(
            span
            + f"""
            , ex AS (SELECT doc_id, n, s,
                     unnest(range(s // {capacity},
                                  (s + n - 1) // {capacity} + 1)) AS pack_id
                     FROM span)
            SELECT doc_id, pack_id::BIGINT AS pack_id,
                   greatest(0, pack_id*{capacity} - s)::BIGINT AS tok_lo,
                   least(n, (pack_id+1)*{capacity} - s)::BIGINT AS tok_hi
            FROM ex ORDER BY doc_id, pack_id
            """
        ).df()
    import pandas.testing as pdt

    if len(got) == 0 and len(want) == 0:
        return
    pdt.assert_frame_equal(got, want, check_dtype=False)


# --- training_pairs (windowed context assembly) ----------------------------


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # conv
            st.sampled_from(["user", "assistant", "system", None]),
            st.one_of(st.none(), st.text(alphabet="ab c", max_size=6)),
        ),
        min_size=0,
        max_size=40,
    ),
    k=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=20, deadline=None)
def test_training_pairs_matches_duckdb_fuzz(ray_session, rows, k):
    """Arbitrary conversations (null roles/texts, random k) against the
    windowed string_agg oracle."""
    import pandas as pd
    import pandas.testing as pdt

    from etl_pipeline_rdf_star_ray.pipelines.training import training_pairs

    df = pd.DataFrame(
        {
            "conv_id": [f"c{c}" for c, _, _ in rows],
            "role": [r for _, r, _ in rows],
            "text": [t for _, _, t in rows],
        }
    )
    df["turn_idx"] = df.groupby("conv_id").cumcount().astype("int32")
    ds = rd.from_pandas(df).repartition(3) if len(df) else rd.from_pandas(df)
    got = training_pairs(ds, k=k, num_shards=4).to_pandas()
    if len(got):
        got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("state", df)
    want = con.execute(
        f"""
        WITH lines AS (
          SELECT conv_id, turn_idx, role, text,
                 coalesce(role,'') || ': ' || coalesce(text,'') AS line
          FROM state
        ), ctx AS (
          SELECT conv_id, turn_idx, role, text,
                 string_agg(line, chr(10)) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN {k} PRECEDING AND 1 PRECEDING) AS context
          FROM lines
        )
        SELECT conv_id, turn_idx, context, text AS response
        FROM ctx WHERE role = 'assistant' ORDER BY conv_id, turn_idx
        """
    ).df()
    if len(got) == 0 and len(want) == 0:
        return
    pdt.assert_frame_equal(got, want, check_dtype=False)


# --- pii_scrub (RE2 parity) ------------------------------------------------


@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet="ab5. @+-()x\n",
                max_size=40,
            ),
        ),
        min_size=0,
        max_size=30,
    )
)
@settings(max_examples=25, deadline=None)
def test_pii_scrub_re2_parity_fuzz(texts):
    """Random strings over a PII-adjacent alphabet (@, digits, dots,
    parens, +, -): the chained pyarrow RE2 replace/count equals DuckDB's —
    both engines are RE2, this pins the chaining order too."""
    import pandas as pd
    import pandas.testing as pdt

    from etl_pipeline_rdf_star_ray.functions.text import PII_RULES, pii_scrub

    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            # explicit string dtype: an empty object column would infer
            # float64 on BOTH sides (Arrow kernel and DuckDB binder reject)
            "text": pd.array(texts, dtype="string"),
        }
    )
    got = (
        pii_scrub(pa.Table.from_pandas(df, preserve_index=False))
        .to_pandas()[["doc_id", "text", "n_email", "n_ip", "n_phone"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    p = {n: pat for n, pat, _ in PII_RULES}
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        f"""
WITH s1 AS (SELECT doc_id,
        len(regexp_extract_all(text, '{p["email"]}'))::BIGINT n_email,
        regexp_replace(text, '{p["email"]}', '<EMAIL>', 'g') t1 FROM t),
s2 AS (SELECT *, len(regexp_extract_all(t1, '{p["ip"]}'))::BIGINT n_ip,
       regexp_replace(t1, '{p["ip"]}', '<IP>', 'g') t2 FROM s1),
s3 AS (SELECT *, len(regexp_extract_all(t2, '{p["phone"]}'))::BIGINT n_phone,
       regexp_replace(t2, '{p["phone"]}', '<PHONE>', 'g') t3 FROM s2)
SELECT doc_id, t3 AS text, n_email, n_ip, n_phone FROM s3 ORDER BY doc_id
"""
    ).df()
    if len(got) == 0 and len(want) == 0:
        return
    pdt.assert_frame_equal(got, want, check_dtype=False)
