"""training_pairs + pack_sequences: DuckDB window-oracle parity, capacity
invariants, shard-count invariance, and schema stability on degenerate
inputs."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from etl_pipeline_rdf_star_ray.pipelines.training import (
    pack_sequences,
    training_pairs,
)

NT = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)


def _transcripts(seed: int, n: int = 4000, n_convs: int = 250) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    conv = [f"c{int(x)}" for x in rng.integers(0, n_convs, n)]
    df = pd.DataFrame({"conv_id": conv})
    df["turn_idx"] = df.groupby("conv_id").cumcount().astype("int32")
    df["role"] = rng.choice(["user", "assistant", "system", "tool", None], n)
    df["text"] = [
        f"m{i} x{int(v)}" if v > 3 else None
        for i, v in enumerate(rng.integers(0, 40, n))
    ]
    # shuffle so conversations straddle blocks
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def _pairs_oracle(df: pd.DataFrame, k: int, role: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("state", df)
    return con.execute(
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
        FROM ctx WHERE role = '{role}'
        ORDER BY conv_id, turn_idx
        """
    ).df()


@pytest.mark.parametrize("k", [1, 3, 7])
def test_training_pairs_matches_window_oracle(ray_session, k):
    df = _transcripts(seed=10 + k)
    got = (
        training_pairs(rd.from_pandas(df).repartition(7), k=k, num_shards=11)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = _pairs_oracle(df, k, "assistant")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # conversation-opening assistant turns carry a NULL context (empty frame)
    opening = want[want.turn_idx == 0]
    assert len(opening) > 0 and opening.context.isna().all()


def test_training_pairs_target_role_and_validation(ray_session):
    df = _transcripts(seed=3)
    got = (
        training_pairs(rd.from_pandas(df), k=2, target_role="tool")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = _pairs_oracle(df, 2, "tool")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(ValueError, match="k must be positive"):
        training_pairs(rd.from_pandas(df), k=0)


def test_training_pairs_all_null_shard_schema(ray_session):
    """A shard whose every response/context is NULL must still emit string
    columns, not Arrow `null` (block-schema drift)."""
    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": np.array([0, 1, 0], dtype="int32"),
            "role": ["assistant", "user", "assistant"],
            "text": [None, None, None],
        }
    )
    out = training_pairs(rd.from_pandas(df), k=2)
    sch = out.schema()
    types = dict(zip(sch.names, sch.types))
    assert types["context"] in (pa.string(), pa.large_string())
    assert types["response"] in (pa.string(), pa.large_string())
    got = out.to_pandas().sort_values(["conv_id", "turn_idx"])
    assert got.response.isna().all()


def _docs(seed: int, m: int = 700, max_tok: int = 50) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(f"w{j}" for j in range(int(x)))
        if x
        else ("" if i % 7 else None)
        for i, x in enumerate(rng.integers(0, max_tok, m))
    ]
    df = pd.DataFrame({"doc_id": np.arange(m, dtype=np.int64), "text": texts})
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def _pack_oracle(df: pd.DataFrame, cap: int, mode: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", df)
    span = f"""
    WITH tok AS (SELECT doc_id, {NT}::BIGINT AS n FROM documents
                 WHERE coalesce({NT}, 0) > 0),
    span AS (
      SELECT doc_id, n,
        coalesce(sum(n) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS s
      FROM tok)
    """
    if mode == "whole":
        q = span + f"SELECT doc_id, (s // {cap})::BIGINT AS pack_id, n AS n_tokens FROM span ORDER BY doc_id"
    else:
        q = span + f"""
        , ex AS (SELECT doc_id, n, s,
                 unnest(range(s // {cap}, (s + n - 1) // {cap} + 1)) AS pack_id
                 FROM span)
        SELECT doc_id, pack_id::BIGINT AS pack_id,
               greatest(0, pack_id*{cap} - s)::BIGINT AS tok_lo,
               least(n, (pack_id+1)*{cap} - s)::BIGINT AS tok_hi
        FROM ex ORDER BY doc_id, pack_id
        """
    return con.execute(q).df()


@pytest.mark.parametrize("cap", [1, 17, 128])
def test_pack_split_matches_oracle_and_fills_bins(ray_session, cap):
    df = _docs(seed=cap)
    ds = rd.from_pandas(df).repartition(5)
    got = (
        pack_sequences(ds, capacity=cap, mode="split", num_shards=9)
        .to_pandas()
        .sort_values(["doc_id", "pack_id"])
        .reset_index(drop=True)
    )
    want = _pack_oracle(df, cap, "split")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every bin except the last holds exactly `cap` tokens
    per = (
        got.assign(n=got.tok_hi - got.tok_lo)
        .groupby("pack_id")["n"]
        .sum()
        .sort_index()
    )
    assert per.iloc[:-1].eq(cap).all() and per.iloc[-1] <= cap
    # token multiset conservation: slices per doc tile [0, n_tokens)
    by_doc = got.groupby("doc_id").agg(
        lo=("tok_lo", "min"), hi=("tok_hi", "max"),
        n=("tok_hi", lambda s: int(s.max())),
        span=("tok_lo", "size"),
    )
    assert (by_doc.lo == 0).all()


def test_pack_whole_matches_oracle_and_never_splits(ray_session):
    df = _docs(seed=99)
    ds = rd.from_pandas(df).repartition(5)
    got = (
        pack_sequences(ds, capacity=64, mode="whole", num_shards=9)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _pack_oracle(df, 64, "whole")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.doc_id.is_unique
    # pack ids are monotone in doc order (cumulative binning)
    assert got.pack_id.is_monotonic_increasing


def test_pack_shard_count_invariance(ray_session):
    """The packing layout is a pure function of the data — identical at any
    num_shards / block count (the 100-TB contract: adding nodes must not
    change which bin a token lands in)."""
    df = _docs(seed=5, m=300)
    ref = None
    for shards, blocks in [(1, 1), (4, 3), (23, 8)]:
        got = (
            pack_sequences(
                rd.from_pandas(df).repartition(blocks),
                capacity=37,
                mode="split",
                num_shards=shards,
            )
            .to_pandas()
            .sort_values(["doc_id", "pack_id"])
            .reset_index(drop=True)
        )
        if ref is None:
            ref = got
        else:
            pd.testing.assert_frame_equal(got, ref)


def test_pack_giant_doc_and_degenerate_inputs(ray_session):
    # one doc larger than capacity straddles many bins (split) / lands
    # whole in its offset bin (whole)
    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": ["a b c", " ".join(f"t{i}" for i in range(25)), "z"],
        }
    )
    got = (
        pack_sequences(rd.from_pandas(df), capacity=4, mode="split")
        .to_pandas()
        .sort_values(["doc_id", "pack_id"])
    )
    want = _pack_oracle(df, 4, "split")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
    doc2 = got[got.doc_id == 2]
    assert len(doc2) == 7  # 25 tokens over 4-token bins, offset 3
    # empty / all-null input keeps the declared schema
    empty = pd.DataFrame({"doc_id": pa.array([], pa.int64()).to_pandas(),
                          "text": pa.array([], pa.string()).to_pandas()})
    out = pack_sequences(rd.from_pandas(empty), capacity=8, mode="split")
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "pack_id", "tok_lo", "tok_hi"}
    nulls = pd.DataFrame({"doc_id": np.array([7], dtype=np.int64),
                          "text": [None]})
    out = pack_sequences(rd.from_pandas(nulls), capacity=8, mode="whole")
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "pack_id", "n_tokens"}
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(rd.from_pandas(df), capacity=0)
    with pytest.raises(ValueError, match="pack mode"):
        pack_sequences(rd.from_pandas(df), capacity=4, mode="firstfit")


def test_pack_items_generic_weights(ray_session):
    """pack_items accepts any positive integer weight column (bytes here),
    drops zero/null/negative weights, and keeps the weight column's name
    in whole-mode output."""
    df = pd.DataFrame(
        {
            "item": np.array([1, 2, 3, 4, 5], dtype=np.int64),
            "nbytes": [100, 0, 250, None, -7],
        }
    )
    from etl_pipeline_rdf_star_ray.pipelines.training import pack_items

    got = (
        pack_items(
            rd.from_pandas(df),
            weight_col="nbytes",
            capacity=200,
            mode="whole",
            id_col="item",
        )
        .to_pandas()
        .sort_values("item")
        .reset_index(drop=True)
    )
    assert got.item.tolist() == [1, 3]
    assert got.nbytes.tolist() == [100, 250]
    assert got.pack_id.tolist() == [0, 0]  # prefixes 0 and 100


def test_conversation_weights_and_packing_match_sql(ray_session):
    import duckdb

    from etl_pipeline_rdf_star_ray.pipelines.training import (
        conversation_weights,
        pack_items,
    )

    rng = np.random.default_rng(17)
    n = 3000
    conv = [f"c{int(x):03d}" for x in rng.integers(0, 120, n)]
    texts = [
        " ".join(f"w{j}" for j in range(int(x))) if x else None
        for x in rng.integers(0, 12, n)
    ]
    df = pd.DataFrame({"conv_id": conv, "text": texts})
    df = df.sample(frac=1.0, random_state=2).reset_index(drop=True)
    ds = rd.from_pandas(df).repartition(6)

    w = conversation_weights(ds, num_shards=7)
    got_w = w.to_pandas().sort_values("conv_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("state", df)
    want_w = con.execute(
        r"""
        SELECT conv_id,
               coalesce(sum(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\s+')) END), 0)::BIGINT
                 AS n_tokens
        FROM state GROUP BY conv_id ORDER BY conv_id
        """
    ).df()
    pd.testing.assert_frame_equal(got_w, want_w, check_dtype=False)

    got = (
        pack_items(w, weight_col="n_tokens", capacity=64, mode="whole",
                   id_col="conv_id", num_shards=5)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want = con.execute(
        r"""
        WITH tok AS (
          SELECT conv_id,
                 sum(CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+')) END)::BIGINT AS n
          FROM state GROUP BY conv_id),
        span AS (
          SELECT conv_id, n,
                 coalesce(sum(n) OVER (ORDER BY conv_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS s
          FROM tok WHERE n > 0)
        SELECT conv_id, (s // 64)::BIGINT AS pack_id, n AS n_tokens
        FROM span ORDER BY conv_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_training_pairs_delta_refreshes_only_touched_convs(ray_session):
    """Narrow delta: only the touched conversations' pairs are re-emitted,
    each with its FULL turn history for context; null delta keys mark
    nothing changed (SQL join semantics); an empty delta yields zero
    pairs."""
    import duckdb

    from etl_pipeline_rdf_star_ray.pipelines.training import (
        changed_keys,
        training_pairs_delta,
    )

    df = _transcripts(seed=44, n=2000, n_convs=80)
    state = rd.from_pandas(df).repartition(5)
    delta = pd.DataFrame({"conv_id": ["c3", "c3", "c17", None]})
    got = (
        training_pairs_delta(
            state, rd.from_pandas(delta), k=3, num_shards=9
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert set(got.conv_id.unique()) <= {"c3", "c17"}
    # equals the full assembly restricted to the touched conversations —
    # i.e. the context windows saw the conversations' complete history
    full = _pairs_oracle(df, 3, "assistant")
    want = (
        full[full.conv_id.isin(["c3", "c17"])]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(want) > 0  # the touched convs really have assistant turns

    keys = changed_keys(rd.from_pandas(delta))
    assert sorted(keys.to_pylist()) == ["c17", "c3"]  # null dropped

    empty_delta = pd.DataFrame({"conv_id": pd.array([], dtype="string")})
    out = training_pairs_delta(state, rd.from_pandas(empty_delta), k=2)
    assert out.count() == 0
