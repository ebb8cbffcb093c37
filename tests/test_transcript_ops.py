"""Agent-transcript mining + hierarchical rollup operators (round 4):
tool-call transition matrix, consecutive-duplicate-turn scrub, and GROUP BY
ROLLUP — each checked against its DuckDB oracle (the exact SQL the driver
runs) at sf0.001 plus hand-built multi-block cases the driver data can't
express (single-tool conversations, NULL-safe stutter runs, rollup level
identities)."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

sys.path.insert(0, "/root/repo/tests")
from oracle_harness import run as oracle_run

from etl_pipeline_rdf_star_ray.pipelines import analytics

SF = "/root/testdata/sf0.001"


def test_new_queries_match_oracles():
    assert (
        oracle_run(SF, ["tool_transitions", "scrub_turns", "rollup_pricing"])
        == 0
    )


def _state(tbl: pa.Table, blocks: int) -> "rd.Dataset":
    """Shuffle rows deterministically and split across blocks so every
    conversation straddles block boundaries before the exchange."""
    rng = np.random.default_rng(7)
    perm = rng.permutation(tbl.num_rows)
    return rd.from_arrow(tbl.take(perm)).repartition(blocks)


def test_tool_transitions_matches_window_oracle():
    """Transitions skip non-tool turns, order by turn_idx (not input order),
    never cross conversations, and n_convs counts DISTINCT conversations —
    all verified against the lag-window SQL on a block-straddling corpus."""
    rng = np.random.default_rng(11)
    rows = []
    for c in range(40):
        n = int(rng.integers(1, 12))
        idxs = sorted(rng.choice(500, size=n, replace=False).tolist())
        for i in idxs:
            is_tool = rng.random() < 0.6
            rows.append(
                {
                    "conv_id": f"c{c}",
                    "turn_idx": i,
                    "role": "tool" if is_tool else "user",
                    "text": f"t{i}",
                    "tool": f"tool_{int(rng.integers(3))}" if is_tool else None,
                }
            )
    tbl = pa.Table.from_pylist(rows)
    out = (
        analytics.tool_transitions(_state(tbl, 5), num_shards=8)
        .to_pandas()
        .sort_values(["prev_tool", "tool"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.execute(
            """
            WITH seq AS (
              SELECT conv_id, tool,
                     lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                       AS prev_tool
              FROM tbl WHERE tool IS NOT NULL)
            SELECT prev_tool, tool, count(*)::BIGINT AS n_calls,
                   count(DISTINCT conv_id)::BIGINT AS n_convs
            FROM seq WHERE prev_tool IS NOT NULL
            GROUP BY prev_tool, tool ORDER BY prev_tool, tool
            """
        )
        .arrow()
        .to_pandas()
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    # the distinct-conv count is live (strictly below the call count
    # somewhere) — otherwise the test wouldn't notice a size-for-nunique bug
    assert (out["n_convs"] < out["n_calls"]).any()


def test_tool_transitions_single_call_convs_emit_nothing():
    tbl = pa.table(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "role": ["tool", "user", "tool"],
            "text": ["x", "y", "z"],
            "tool": ["tool_1", None, "tool_2"],
        }
    )
    assert analytics.tool_transitions(rd.from_arrow(tbl), num_shards=4).count() == 0


def test_scrub_repeated_turns_matches_window_oracle():
    """Stutter runs collapse to their first turn under NULL-safe (role,
    text) equality, ordered by turn_idx; a change in EITHER role or text
    breaks the run; every conversation keeps its first turn."""
    tbl = pa.table(
        {
            "conv_id": ["a"] * 6 + ["b"] * 4 + ["c"],
            "turn_idx": pa.array([0, 1, 2, 3, 4, 5, 0, 1, 2, 3, 0], pa.int32()),
            "role": [
                "user", "assistant", "assistant", "assistant", "user", "user",
                "user", "user", None, None,
                "assistant",
            ],
            "text": [
                "hi", "ok", "ok", "ok", "ok", "ok",
                None, None, None, "x",
                "solo",
            ],
        }
    )
    out = (
        analytics.scrub_repeated_turns(_state(tbl, 3), num_shards=4)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.execute(
            """
            WITH lagged AS (
              SELECT conv_id, turn_idx, role, text,
                     lag(role) OVER w AS prev_role,
                     lag(text) OVER w AS prev_text,
                     row_number() OVER w AS rn
              FROM tbl WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
            SELECT conv_id, turn_idx, role, text FROM lagged
            WHERE rn = 1 OR NOT (role IS NOT DISTINCT FROM prev_role
                                 AND text IS NOT DISTINCT FROM prev_text)
            ORDER BY conv_id, turn_idx
            """
        )
        .arrow()
        .to_pandas()
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    # pin the semantics the SQL encodes: the assistant 'ok' run (1,2,3)
    # collapses to turn 1, role-change at 4 survives, (user, NULL) stutter
    # at b:1 drops (NULL-safe equality), NULL->'x' at b:3 survives
    assert list(out["turn_idx"]) == [0, 1, 4, 0, 2, 3, 0]


def test_pricing_rollup_level_identities():
    """Each rollup level must be the exact aggregate of the level below —
    the invariant the hierarchical re-aggregation relies on."""
    t = analytics.pricing_rollup(SF).to_pandas()
    finest = t[t["l_linestatus"].notna()]
    per_flag = t[t["l_linestatus"].isna() & t["l_returnflag"].notna()]
    total = t[t["l_returnflag"].isna()]
    assert len(total) == 1
    for col in ("sum_qty", "count_order"):
        assert finest[col].sum() == total[col].iloc[0]
        got = per_flag.set_index("l_returnflag")[col].sort_index()
        want = finest.groupby("l_returnflag")[col].sum().sort_index()
        assert (got == want).all()
    # cents-exact: the double sum_base recombines exactly at every level
    assert np.isclose(finest["sum_base"].sum(), total["sum_base"].iloc[0])


def test_conv_role_patterns_queries_match_oracles():
    assert (
        oracle_run(SF, ["conv_role_patterns", "conv_stats_refresh"]) == 0
    )


def test_conv_role_patterns_matches_oracle():
    """Signatures follow turn_idx order (not input order), NULL role
    renders '', single-turn conversations get bare-role patterns, and
    counts aggregate across block-straddling conversations."""
    rng = np.random.default_rng(23)
    rows = []
    roles = ["user", "assistant", "tool", None]
    for c in range(60):
        n = int(rng.integers(1, 6))
        idxs = sorted(rng.choice(100, size=n, replace=False).tolist())
        for i in idxs:
            rows.append(
                {
                    "conv_id": f"c{c}",
                    "turn_idx": i,
                    "role": roles[int(rng.integers(0, 4))],
                    "text": "x",
                }
            )
    tbl = pa.Table.from_pylist(rows)
    out = (
        analytics.conv_role_patterns(_state(tbl, 5), num_shards=8)
        .to_pandas()
        .sort_values("pattern")
        .reset_index(drop=True)
    )
    want = (
        duckdb.execute(
            """
            WITH sigs AS (
              SELECT conv_id,
                     string_agg(coalesce(role, ''), '>' ORDER BY turn_idx)
                       AS pattern
              FROM tbl GROUP BY conv_id)
            SELECT pattern, count(*)::BIGINT AS n_convs
            FROM sigs GROUP BY pattern ORDER BY pattern
            """
        )
        .arrow()
        .to_pandas()
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    # live aggregation: at least one pattern shared by >1 conversation
    assert (out["n_convs"] > 1).any()


def test_cube_levels_are_consistent():
    """CUBE level identities: per-status rows sum to the grand total, and
    the per-status level equals re-aggregating the finest level."""
    from etl_pipeline_rdf_star_ray.pipelines.analytics import pricing_cube

    tbl = pricing_cube(SF).to_pandas()
    fin = tbl.dropna(subset=["l_returnflag", "l_linestatus"])
    per_status = tbl[
        tbl["l_returnflag"].isna() & tbl["l_linestatus"].notna()
    ]
    per_flag = tbl[
        tbl["l_returnflag"].notna() & tbl["l_linestatus"].isna()
    ]
    total = tbl[tbl["l_returnflag"].isna() & tbl["l_linestatus"].isna()]
    assert len(total) == 1
    for col in ("sum_qty", "count_order"):
        assert per_status[col].sum() == total[col].iloc[0]
        assert per_flag[col].sum() == total[col].iloc[0]
        assert fin[col].sum() == total[col].iloc[0]
    want_status = (
        fin.groupby("l_linestatus")["sum_qty"].sum().sort_index().to_numpy()
    )
    got_status = (
        per_status.set_index("l_linestatus")["sum_qty"].sort_index().to_numpy()
    )
    assert (want_status == got_status).all()


def test_quantiles_cont_matches_numpy_and_validates():
    """Continuous quantiles: driver query green at sf0.001 (oracle run),
    exact interpolation equals numpy's 'linear' method in millicents, and
    non-1000-denominator quantiles are rejected."""
    import pytest

    from etl_pipeline_rdf_star_ray.pipelines.analytics import (
        grouped_quantiles_cont,
    )

    assert oracle_run(SF, ["quantiles_cont"]) == 0
    got = grouped_quantiles_cont(SF).to_pandas().set_index("event_type")
    import duckdb

    vals = duckdb.execute(
        f"""SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
            FROM '{SF}/events.parquet'"""
    ).df()
    for et, g in vals.groupby("event_type"):
        for q, col in ((0.25, "p25_cont_mc"), (0.95, "p95_cont_mc")):
            want = int(round(np.quantile(g["c"], q, method="linear") * 1000))
            assert got.loc[et, col] == want, (et, q)
    with pytest.raises(ValueError, match="denominator dividing 1000"):
        grouped_quantiles_cont(SF, quantiles=(1 / 3,))


def test_events_sliding_window_identities():
    """Sliding-window structure: width==hop degenerates to the tumbling
    hourly aggregate; with width=3·hop every event appears in exactly 3
    windows (sum of n across windows == 3 × event count); invalid
    width/hop rejected."""
    import pytest

    from etl_pipeline_rdf_star_ray.pipelines.analytics import (
        events_hourly,
        events_sliding,
    )

    tumb = (
        events_sliding(SF, width_hours=1, hop_hours=1)
        .to_pandas()
        .rename(columns={"wstart": "hour"})
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )
    hourly = (
        events_hourly(SF)
        .to_pandas()
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        tumb[["event_type", "hour", "n", "n_users", "sum_value_c"]],
        hourly[["event_type", "hour", "n", "n_users", "sum_value_c"]],
        check_dtype=False,
    )
    slid = events_sliding(SF, width_hours=3, hop_hours=1).to_pandas()
    assert slid["n"].sum() == 3 * hourly["n"].sum()
    with pytest.raises(ValueError, match="positive multiple"):
        events_sliding(SF, width_hours=3, hop_hours=2)


def test_mad_and_tail_turns_match_oracles():
    assert oracle_run(SF, ["value_mad", "tail_turns"]) == 0


def test_grouped_mad_matches_numpy():
    """Median and MAD per group equal the direct multiset statistics
    (quantile_disc rank convention: element at rank ceil(n/2))."""
    import duckdb

    from etl_pipeline_rdf_star_ray.pipelines.analytics import grouped_mad

    got = grouped_mad(SF).to_pandas().set_index("event_type")
    vals = duckdb.execute(
        f"""SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
            FROM '{SF}/events.parquet'"""
    ).df()
    for et, g in vals.groupby("event_type"):
        c = np.sort(g["c"].to_numpy())
        rank = max(1, int(np.ceil(0.5 * len(c))))
        med = int(c[rank - 1])
        dev = np.sort(np.abs(c - med))
        assert got.loc[et, "median_c"] == med
        assert got.loc[et, "mad_c"] == int(dev[rank - 1])


def test_tail_turns_keeps_latest_k():
    """Every surviving turn is among its conversation's k latest; recency
    1 is the max turn_idx; conversations shorter than k keep all turns."""
    from etl_pipeline_rdf_star_ray.pipelines import corpus
    from etl_pipeline_rdf_star_ray.queries import _upserted_state

    k = 3
    out = corpus.tail_turns(_upserted_state(SF), k=k).to_pandas()
    state = _upserted_state(SF).to_pandas()
    per_conv = state.groupby("conv_id")["turn_idx"]
    for conv, g in out.groupby("conv_id"):
        all_idx = sorted(per_conv.get_group(conv).tolist())
        assert sorted(g["turn_idx"]) == all_idx[-k:]
        assert g.loc[g["recency"] == 1, "turn_idx"].iloc[0] == all_idx[-1]


def test_quantile_labels_are_exact():
    """Column labels come from the decimal fraction, not the binary double:
    int(0.29*100) == 28 would mislabel, and 0.56/0.57 would collide
    (review r4)."""
    from etl_pipeline_rdf_star_ray.pipelines.analytics import _q_name

    assert _q_name(0.29, "_c") == "p29_c"
    assert _q_name(0.56, "_c") == "p56_c"
    assert _q_name(0.57, "_c") == "p57_c"
    assert _q_name(0.125, "_mc") == "p12_5_mc"
    assert _q_name(0.95, "_c") == "p95_c"


def test_funnel_depth_oracle_and_strictness():
    """Funnel: driver-identical oracle comparison (beyond-window entry),
    plus the strict-order edge the driver data can't isolate — a step at
    the SAME timestamp as the previous step's completion does not count,
    and a later re-occurrence does."""
    import duckdb
    import ray.data as rd

    from etl_pipeline_rdf_star_ray.pipelines.analytics import funnel_depth

    assert oracle_run(SF, ["funnel_depth"]) == 0

    # hand case through the same per-shard kernel via a fake sf_dir is not
    # possible (funnel_depth reads parquet), so drive the kernel with a
    # temp parquet table
    import tempfile, os
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
            "event_type": [
                "view", "click", "purchase",      # u1: full funnel
                "view", "click", "purchase",      # u2: click AT view's ts
                "click",                          # u3: never viewed
            ],
            "ts": pa.array([10, 20, 30, 10, 10, 30, 5], pa.timestamp("us")),
            "value": [0.0] * 7,
            "event_id": pa.array(range(7), pa.int64()),
            "props": ["{}"] * 7,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = (
            funnel_depth(d, num_shards=4)
            .to_pandas()
            .set_index("user_id")["depth"]
        )
    assert got[1] == 3
    assert got[2] == 1  # click at ts==view's ts is NOT strictly after
    assert got[3] == 0  # entered mid-funnel: never completed step 1


def test_cohort_retention_oracle_and_edges():
    """Cohort retention: driver-identical oracle comparison plus the edges
    the driver data can't isolate — events BEFORE the signup week are
    excluded, re-signups keep the FIRST cohort, users without signup never
    appear, and per-cell counts are distinct users (not events)."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from etl_pipeline_rdf_star_ray.pipelines.analytics import cohort_retention

    assert oracle_run(SF, ["cohort_retention"]) == 0

    WEEK = 604_800_000_000
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
            "event_type": [
                "view",                    # u1: BEFORE signup week
                "signup", "view", "view",  # u1: cohort w1, week-1 events
                "signup", "signup",        # u2: re-signup later keeps w1
                "click",                   # u3: never signed up
            ],
            "ts": pa.array(
                [0, WEEK, WEEK + 1000, WEEK + 2000, WEEK, 3 * WEEK, WEEK],
                pa.timestamp("us"),
            ),
            "value": [0.0] * 7,
            "event_id": pa.array(range(7), pa.int64()),
            "props": ["{}"] * 7,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = cohort_retention(d, num_shards=4).to_pandas()
    cells = got.set_index(["cohort_w", "week_offset"])["n_users"].to_dict()
    # cohort week 1: u1 (week-1 events dedup to one user) + u2 at offset 0
    assert cells[(1, 0)] == 2
    # u2's re-signup at week 3 is offset 2 of the SAME cohort
    assert cells[(1, 2)] == 1
    # u1's pre-signup view (week 0) never appears; u3 has no cohort
    assert all(off >= 0 for (_, off) in cells)
    assert all(c == 1 for (c, _) in cells)


def test_funnel_and_cohort_randomized_parity():
    """Randomized multi-seed parity vs DuckDB for the two beyond-window
    operators: arbitrary event streams with timestamp ties, users missing
    arbitrary steps, and multi-signup users."""
    import os
    import tempfile

    import duckdb
    import pyarrow.parquet as pq

    from etl_pipeline_rdf_star_ray.pipelines.analytics import (
        cohort_retention,
        funnel_depth,
    )

    WEEK = 604_800_000_000
    for seed in (3, 17, 51):
        rng = np.random.default_rng(seed)
        n = 300
        t = pa.table(
            {
                "user_id": pa.array(
                    rng.integers(0, 25, n).astype(np.int64), pa.int64()
                ),
                "event_type": pa.array(
                    rng.choice(
                        ["view", "click", "purchase", "signup", "error"], n
                    )
                ),
                # coarse grid → heavy timestamp ties incl. across types
                "ts": pa.array(
                    (rng.integers(0, 40, n) * (WEEK // 10)).astype(np.int64),
                    pa.timestamp("us"),
                ),
                "value": pa.array(np.zeros(n)),
                "event_id": pa.array(np.arange(n), pa.int64()),
                "props": pa.array(["{}"] * n),
            }
        )
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "events.parquet"))
            fun = (
                funnel_depth(d, num_shards=4)
                .to_pandas()
                .sort_values("user_id")
                .reset_index(drop=True)
            )
            coh = (
                cohort_retention(d, num_shards=4)
                .to_pandas()
                .sort_values(["cohort_w", "week_offset"])
                .reset_index(drop=True)
            )
        con = duckdb.connect()
        con.register("events", t)
        want_fun = con.sql(
            """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                   WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                   JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > t1 GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                   JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > t2 GROUP BY 1)
            SELECT u.user_id,
                   (CASE WHEN t1 IS NULL THEN 0 WHEN t2 IS NULL THEN 1
                         WHEN t3 IS NULL THEN 2 ELSE 3 END)::BIGINT AS depth
            FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
                   LEFT JOIN s3 USING (user_id)
            ORDER BY user_id
            """
        ).df()
        pd.testing.assert_frame_equal(fun, want_fun, check_dtype=False)
        want_coh = con.sql(
            """
            WITH s AS (
              SELECT user_id,
                     CAST(floor(epoch(min(ts)) / 604800) AS BIGINT)
                       AS cohort_w
              FROM events WHERE event_type = 'signup' GROUP BY 1),
            a AS (
              SELECT DISTINCT e.user_id, s.cohort_w,
                     CAST(floor(epoch(e.ts) / 604800) AS BIGINT) - s.cohort_w
                       AS week_offset
              FROM events e JOIN s USING (user_id))
            SELECT cohort_w, week_offset, count(*)::BIGINT AS n_users
            FROM a WHERE week_offset >= 0 GROUP BY 1, 2
            ORDER BY cohort_w, week_offset
            """
        ).df()
        pd.testing.assert_frame_equal(coh, want_coh, check_dtype=False)


def test_cohort_retention_null_ts_rows_excluded():
    """Regression (r4 advice): NULL-ts events used to crash the epoch-week
    cast (or, via na_value=0, fabricate epoch-week-0 activity). They must
    simply be excluded — the SQL oracle drops them by NULL propagation —
    matching events_sliding's tolerance."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from etl_pipeline_rdf_star_ray.pipelines.analytics import cohort_retention

    WEEK = 604_800_000_000
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "event_type": ["signup", "view", "view", "signup", "view"],
            # u1: null-ts view must not count as activity anywhere;
            # u2: null-ts SIGNUP row → u2 still cohorts from its valid signup
            "ts": pa.array(
                [WEEK, WEEK + 5, None, 2 * WEEK, 2 * WEEK + 5],
                pa.timestamp("us"),
            ),
            "value": [0.0] * 5,
            "event_id": pa.array(range(5), pa.int64()),
            "props": ["{}"] * 5,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = cohort_retention(d, num_shards=4).to_pandas()
    cells = got.set_index(["cohort_w", "week_offset"])["n_users"].to_dict()
    # only the two valid-ts offset-0 cells exist; nothing at epoch week 0
    assert cells == {(1, 0): 1, (2, 0): 1}


def test_mad_outliers_oracle_and_edges(ray_session, tmp_path):
    """Round-5 row-level robust outlier filter: driver-identical oracle
    comparison, plus the strict-inequality and NULL-propagation edges on a
    hand table."""
    import pyarrow.parquet as _pq

    from etl_pipeline_rdf_star_ray.pipelines.analytics import mad_outlier_rows

    assert oracle_run(SF, ["mad_outliers"]) == 0

    # values 1..7 (median 4, MAD 2) plus a planted outlier, a boundary
    # value exactly AT 3*MAD (must NOT flag: strict >), and NULLs
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 99.0, 10.0, None]
    t = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            "event_type": pa.array(["a"] * 9 + [None], pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    _pq.write_table(t, str(tmp_path / "events.parquet"))
    # median of 9 values (1..7,99,10) = 5 (quantile_disc rank ceil(9/2)=5),
    # deviations |v-5| = 4,3,2,1,0,1,2,94,5 → sorted 0,1,1,2,2,3,4,5,94 →
    # MAD = rank-5 element = 2; threshold 3*2=6: only 99 (dev 94) flags —
    # dev 5 and the boundary are below/at nothing; verify exact rows
    got = mad_outlier_rows(str(tmp_path), k=3).to_pandas()
    assert got["event_id"].tolist() == [7]
    assert got["dev_c"].tolist() == [9400]


def test_sketch_band_collapse_driver_rows(ray_session):
    """Round-5 band-collapse driver queries for the MG and CMS sketch
    families: the Ray side computes estimate AND exact and emits the
    guarantee booleans; hash-equality with the exact+TRUE SQL mirror IS
    the bound proof. (Adversarial zipf pressure on the sketches themselves
    lives in test_heavy_hitters.py / test_cms.py.)"""
    assert oracle_run(SF, ["heavy_users", "cms_event_counts"]) == 0


def test_wau_diversity_skew_driver_rows(ray_session):
    """Driver-identical comparison for the three round-5 beyond-window
    additions: sliding distinct actives, Gini–Simpson user diversity and
    the key-skew audit."""
    assert (
        oracle_run(SF, ["wau_sliding", "user_diversity", "key_skew_orders"])
        == 0
    )


def test_wau_sliding_randomized_parity(ray_session):
    """Randomized multi-seed parity vs DuckDB for the sliding-DISTINCT
    window: users active on many days (dedup inside the window), sparse
    day gaps wider than the window, null user/ts rows, and a non-default
    window width."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from etl_pipeline_rdf_star_ray.pipelines.analytics import (
        active_users_sliding,
    )

    DAY = 86_400_000_000
    for seed in (5, 23, 77):
        rng = np.random.default_rng(seed)
        n = 400
        days = rng.choice(
            np.concatenate([np.arange(10), np.arange(40, 50), [200]]), n
        ).astype(np.int64)
        ts = days * DAY + rng.integers(0, DAY, n)
        user = rng.integers(0, 30, n).astype(np.int64)
        ts_mask = rng.random(n) < 0.05
        user_mask = rng.random(n) < 0.05
        t = pa.table(
            {
                "user_id": pa.array(user, pa.int64(), mask=user_mask),
                "ts": pa.array(ts, pa.timestamp("us"), mask=ts_mask),
            }
        )
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(
                pa.table(
                    {
                        "event_id": pa.array(np.arange(n), pa.int64()),
                        "ts": t.column("ts"),
                        "user_id": t.column("user_id"),
                        "event_type": pa.array(["view"] * n),
                        "value": pa.array(np.zeros(n)),
                        "props": pa.array(["{}"] * n),
                    }
                ),
                os.path.join(d, "events.parquet"),
            )
            got = (
                active_users_sliding(d, window_days=3, num_shards=4)
                .to_pandas()
                .sort_values("day")
                .reset_index(drop=True)
            )
            con = duckdb.connect()
            want = con.sql(
                f"""
                WITH ud AS (
                  SELECT DISTINCT user_id,
                         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
                  FROM '{d}/events.parquet'
                  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
                days AS (SELECT DISTINCT day FROM ud)
                SELECT d.day AS day,
                       count(DISTINCT u.user_id)::BIGINT AS n_users
                FROM days d JOIN ud u ON u.day BETWEEN d.day - 2 AND d.day
                GROUP BY d.day ORDER BY d.day
                """
            ).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_key_skew_profile_tie_break_and_total(ray_session):
    """The top-k boundary under heavy count ties must select by
    (count desc, key asc) on both sides, and the share denominator must be
    the WHOLE table (incl. keys outside the top-k and shards whose totals
    collide)."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from etl_pipeline_rdf_star_ray.pipelines.analytics import (
        key_skew_profile,
    )

    # 40 keys each appearing twice (tie wall), one hot key appearing 20×
    keys = np.concatenate(
        [np.repeat(np.arange(100, 140, dtype=np.int64), 2),
         np.full(20, 7, dtype=np.int64)]
    )
    t = pa.table({"o_custkey": pa.array(keys, pa.int64())})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "orders.parquet"))
        got = key_skew_profile(
            d, table="orders", col="o_custkey", k=5, num_shards=4
        ).to_pandas()
    # hot key first; then the 4 smallest keys of the tie wall
    assert got["o_custkey"].tolist() == [7, 100, 101, 102, 103]
    assert got["n"].tolist() == [20, 2, 2, 2, 2]
    # total = 100 rows → shares 2000bp and 200bp exactly
    assert got["share_bp"].tolist() == [2000, 200, 200, 200, 200]


def test_ohlc_bars_driver_row(ray_session):
    """Driver-identical comparison for the OHLC downsampling bars."""
    assert oracle_run(SF, ["ohlc_bars"]) == 0


def test_ohlc_bars_randomized_cross_block_parity(ray_session):
    """The order-sensitive open/close merge must survive blocks split mid-
    hour: tiny row groups force multiple Ray blocks, so per-(type, hour)
    partials from different blocks genuinely merge; heavy ts ties resolve
    by event_id on both sides; null ts/value rows drop."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from etl_pipeline_rdf_star_ray.pipelines.analytics import ohlc_bars

    HOUR = 3_600_000_000
    for seed in (11, 42):
        rng = np.random.default_rng(seed)
        n = 500
        # few hours + coarse ts grid → many exact ts ties within an hour
        ts = (
            rng.integers(0, 5, n) * HOUR
            + rng.integers(0, 4, n) * (HOUR // 4)
        ).astype(np.int64)
        ts_mask = rng.random(n) < 0.04
        val_mask = rng.random(n) < 0.04
        vals = np.round(rng.uniform(-50, 50, n), 2)
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us"), mask=ts_mask),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "event_type": pa.array(
                    rng.choice(["view", "click"], n)
                ),
                "value": pa.array(vals, pa.float64(), mask=val_mask),
                "props": pa.array(["{}"] * n),
            }
        )
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(
                t, os.path.join(d, "events.parquet"), row_group_size=40
            )
            got = (
                ohlc_bars(d, num_shards=4)
                .to_pandas()
                .sort_values(["event_type", "hour"])
                .reset_index(drop=True)
            )
            con = duckdb.connect()
            want = con.sql(
                f"""
                WITH b AS (
                  SELECT event_type, date_trunc('hour', ts) AS hour,
                         CAST(round(value * 100) AS BIGINT) AS c,
                         ts, event_id
                  FROM '{d}/events.parquet'
                  WHERE ts IS NOT NULL AND value IS NOT NULL),
                w AS (
                  SELECT *,
                         row_number() OVER (PARTITION BY event_type, hour
                                            ORDER BY ts, event_id) AS ra,
                         row_number() OVER (PARTITION BY event_type, hour
                                            ORDER BY ts DESC,
                                                     event_id DESC) AS rd
                  FROM b)
                SELECT event_type, hour,
                       max(CASE WHEN ra = 1 THEN c END) AS open_c,
                       max(c) AS high_c, min(c) AS low_c,
                       max(CASE WHEN rd = 1 THEN c END) AS close_c,
                       count(*)::BIGINT AS n
                FROM w GROUP BY 1, 2 ORDER BY 1, 2
                """
            ).df()
        got["hour"] = pd.to_datetime(got["hour"])
        want["hour"] = pd.to_datetime(want["hour"])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_winsorize_driver_row(ray_session):
    """Driver-identical comparison for the percentile-clamp transform."""
    assert oracle_run(SF, ["winsorize_values"]) == 0


def test_winsorize_hand_band(ray_session, tmp_path):
    """Clamp edges follow the quantile_disc convention (rank ceil(q·n)):
    10 values 1..10 → p10 = rank 1 = value 1? No — ceil(0.1·10)=1 → 1st
    element; p90 = ceil(0.9·10)=9 → 9th element. Values below/above clamp
    to the band, null value/type rows drop."""
    import pyarrow.parquet as pq_

    from etl_pipeline_rdf_star_ray.pipelines.analytics import winsorize

    vals = [float(v) for v in range(1, 11)]
    t = pa.table(
        {
            "event_id": pa.array(range(12), pa.int64()),
            "event_type": pa.array(["a"] * 10 + [None, "a"]),
            "value": pa.array(vals + [5.0, None]),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    got = (
        winsorize(str(tmp_path), q_lo=0.2, q_hi=0.8)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # null-type row 10 and null-value row 11 dropped
    assert got["event_id"].tolist() == list(range(10))
    # p20 = rank ceil(0.2*10)=2 → 200c; p80 = rank 8 → 800c
    assert got["wins_c"].tolist() == [
        200, 200, 300, 400, 500, 600, 700, 800, 800, 800
    ]


def test_zscore_driver_row(ray_session):
    """Driver-identical comparison for the z-score scaler."""
    assert oracle_run(SF, ["zscore_values"]) == 0


def test_zscore_hand_values(ray_session, tmp_path):
    """Centering, the floored-4-decimal convention, and the zero-variance
    NULL on a hand table; null value/type rows drop."""
    import pyarrow.parquet as pq_

    from etl_pipeline_rdf_star_ray.pipelines.analytics import (
        zscore_normalize,
    )

    t = pa.table(
        {
            "event_id": pa.array(range(7), pa.int64()),
            "event_type": pa.array(["a", "a", "a", "k", "k", None, "a"]),
            "value": pa.array([1.0, 2.0, 3.0, 5.0, 5.0, 1.0, None]),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    got = (
        zscore_normalize(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == [0, 1, 2, 3, 4]
    # group a: c = 100,200,300 → mean 200, var = 20000/3; expected via the
    # exact same float op sequence the operator (and the oracle) uses
    mean = np.float64(600) / np.float64(3)
    var = np.float64(140000) / np.float64(3) - mean * mean
    sd = np.sqrt(var)
    want = [int(np.floor((c - mean) / sd * 10000.0)) for c in (100.0, 200.0, 300.0)]
    assert got["z4"].tolist()[:3] == want
    assert want[1] == 0  # the mean itself standardizes to exactly 0
    # constant group k: zero variance → NULL like SQL
    assert got["z4"].isna().tolist()[3:] == [True, True]


def test_zscore_null_values_excluded_from_stats(ray_session, tmp_path):
    """Regression (self-review): a block mixing null and non-null values
    of one type must NOT count the null row in n — the oracle's
    join+WHERE domain excludes it, so mean/var (and every z) would
    otherwise diverge. Forced into ONE block so the partial genuinely
    sees the mix."""
    import duckdb as _duck
    import pyarrow.parquet as pq_

    from etl_pipeline_rdf_star_ray.pipelines.analytics import (
        zscore_normalize,
    )

    t = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "event_type": pa.array(["a"] * 6),
            "value": pa.array([1.0, 3.0, None, 2.0, None, 6.0]),
        }
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    got = (
        zscore_normalize(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = _duck.connect()
    want = con.sql(
        f"""
        WITH c AS (
          SELECT event_id, event_type,
                 CAST(round(value * 100) AS BIGINT) AS c
          FROM '{tmp_path}/events.parquet' WHERE value IS NOT NULL),
        g AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(c) AS BIGINT) AS s,
                 CAST(sum(c * c) AS BIGINT) AS ssq
          FROM c GROUP BY 1)
        SELECT c.event_id,
               CAST(floor((CAST(c.c AS DOUBLE)
                    - CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
                 / sqrt(CAST(g.ssq AS DOUBLE) / CAST(g.n AS DOUBLE)
                   - (CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
                     * (CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE)))
                 * 10000) AS BIGINT) AS z4
        FROM c JOIN g USING (event_type) ORDER BY c.event_id
        """
    ).df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["z4"].tolist() == want["z4"].tolist()


def test_key_skew_profile_string_key(ray_session, tmp_path):
    """Regression (self-review): the audit is generic over the key dtype —
    a string key column must profile, not crash on an int64 cast."""
    import pyarrow.parquet as pq_

    from etl_pipeline_rdf_star_ray.pipelines.analytics import (
        key_skew_profile,
    )

    t = pa.table(
        {"event_type": pa.array(["x"] * 6 + ["y"] * 3 + ["z"])}
    )
    pq_.write_table(t, str(tmp_path / "events.parquet"))
    got = key_skew_profile(
        str(tmp_path), table="events", col="event_type", k=2, num_shards=4
    ).to_pandas()
    assert got["event_type"].tolist() == ["x", "y"]
    assert got["n"].tolist() == [6, 3]
    assert got["share_bp"].tolist() == [6000, 3000]


def test_q14_excludes_null_and_dangling_partkeys(ray_session, tmp_path):
    """Regression (self-review, two passes): the oracle's INNER JOIN part
    drops lineitems with NULL or dangling l_partkey from BOTH sums, a
    NULL p_partkey dimension row never matches, a DUPLICATED part key
    fans a lineitem out once per matching part row (into total always,
    into promo per promo-typed match), and a NULL price contributes
    exactly 0 like SQL's null-skipping sum."""
    import numpy as np
    import pyarrow.parquet as pq_

    from etl_pipeline_rdf_star_ray.pipelines.tpch import q14_promo_revenue

    part = pa.table(
        {
            # key 3 duplicated (PROMO + STANDARD); one NULL dimension row
            "p_partkey": pa.array([1, 2, 3, 3, None], pa.int64()),
            "p_type": pa.array(
                ["PROMO", "STANDARD", "PROMO", "STANDARD", "PROMO"]
            ),
        }
    )
    D = np.datetime64("1996-02-01", "us")
    li = pa.table(
        {
            # key 99 dangles; one NULL key; one NULL price on key 1
            "l_partkey": pa.array([1, 2, 99, None, 3, 1], pa.int64()),
            "l_extendedprice": pa.array(
                [10.0, 20.0, 70.0, 80.0, 5.0, None]
            ),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
            "l_shipdate": pa.array([D] * 6, pa.timestamp("us")),
        }
    )
    pq_.write_table(part, str(tmp_path / "part.parquet"))
    pq_.write_table(li, str(tmp_path / "lineitem.parquet"))
    got = q14_promo_revenue(str(tmp_path)).to_pandas()
    # total: 100000 (k1) + 200000 (k2) + 50000*2 (k3 fans out twice);
    # the dangling/NULL-key/NULL-price rows contribute nothing
    assert got["total_rev_c4"].tolist() == [400000]
    # promo: k1 (PROMO) + k3 once (one of its two part rows is PROMO)
    assert got["promo_rev_c4"].tolist() == [150000]
    assert got["promo_bp"].tolist() == [3750]
    # cross-check the exact same files against the committed oracle SQL
    import duckdb as _duck
    import __ray_entry__ as _e

    con = _duck.connect()
    for tname in ("part", "lineitem"):
        con.sql(
            f"CREATE VIEW {tname} AS "
            f"SELECT * FROM '{tmp_path}/{tname}.parquet'"
        )
    want = con.sql(_e.oracle_sql()["q14_promo_share"]).df()
    assert got["total_rev_c4"].tolist() == want["total_rev_c4"].tolist()
    assert got["promo_rev_c4"].tolist() == want["promo_rev_c4"].tolist()
    assert got["promo_bp"].tolist() == want["promo_bp"].tolist()
