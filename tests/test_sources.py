import os

import duckdb
import pyarrow as pa
import pytest

from etl_pipeline_rdf_star_ray.sources import (
    changelog as cl,
)
from etl_pipeline_rdf_star_ray.sources import (
    create_source,
    interpolate_dict_env_vars,
    source_kinds,
)
from etl_pipeline_rdf_star_ray.sources.synthetic import (
    changelog_dataset,
    changelog_table,
)

SF = "/root/testdata/sf0.001"


def test_env_interpolation(monkeypatch):
    monkeypatch.setenv("TOKEN", "s3cr3t")
    out = interpolate_dict_env_vars(
        {"auth": "Bearer ${TOKEN}", "nested": ["${TOKEN}", 1]}
    )
    assert out["auth"] == "Bearer s3cr3t"
    assert out["nested"] == ["s3cr3t", 1]


def test_registry_surface_complete():
    kinds = source_kinds()
    for k in ["csv", "tsv", "json", "parquet", "sqlite", "postgresql", "mysql", "http", "sparql"]:
        assert k in kinds


def test_parquet_source():
    ds = create_source({"type": "parquet", "path": f"{SF}/region.parquet"})
    assert ds.count() == 5


def test_db_source_without_driver_raises_on_connect():
    """No psycopg2 in this sandbox: the connection factory raises the
    reference's ImportError contract when the read first connects (Ray's
    read_sql connects during dataset construction to size the read)."""
    with pytest.raises(Exception) as e:
        create_source(
            {"type": "postgresql", "access": "localhost:5432/db",
             "credentials": {"username": "u", "password": "p"},
             "query": "SELECT 1"}
        ).materialize()
    assert "psycopg2" in str(e.value)


def test_synthetic_deterministic_across_block_splits():
    t1 = (
        changelog_dataset(2000, override_num_blocks=2)
        .to_pandas()
        .sort_values("lsn")
        .reset_index(drop=True)
    )
    t2 = (
        changelog_dataset(2000, override_num_blocks=7)
        .to_pandas()
        .sort_values("lsn")
        .reset_index(drop=True)
    )
    assert t1.equals(t2)


def test_synthetic_scenarios_present():
    t = changelog_table(5000)
    ops = set(t.column("op").to_pylist())
    assert ops == {"insert", "update", "delete"}
    # hot conversation holds roughly hot_frac of events
    convs = t.column("conv_id").to_pylist()
    hot_n = sum(c == "conv_hot" for c in convs)
    assert 0.05 < hot_n / len(convs) < 0.2
    # deletes carry only the key
    import pyarrow.compute as pc

    dels = t.filter(pc.equal(t["op"], "delete"))
    assert dels.column("text").null_count == dels.num_rows
    assert dels.column("ts").null_count == dels.num_rows


def test_synthetic_schema_evolution_column():
    t = changelog_table(100, with_tool_args=True)
    assert "tool_args" in t.column_names
    t0 = changelog_table(100)
    assert "tool_args" not in t0.column_names


def test_events_changelog_matches_duckdb_cte():
    """The Arrow derivation and the SQL CTE must be byte-equivalent — every
    CDC oracle in __ray_entry__ depends on this."""
    ray_t = (
        cl.changelog_from_events(SF)
        .to_pandas()
        .sort_values("lsn")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{os.path.join(SF, 'events.parquet')}'"
    )
    sql_t = con.sql(
        f"WITH {cl.CHANGELOG_CTE.strip()} SELECT * FROM changelog ORDER BY lsn"
    ).df()
    assert list(ray_t.columns) == list(sql_t.columns)
    for col in ray_t.columns:
        a, b = ray_t[col], sql_t[col]
        assert a.isna().equals(b.isna()), col
        mask = ~a.isna()
        assert (a[mask] == b[mask]).all(), col


def test_events_changelog_lsn_range_pushdown():
    ds = cl.changelog_from_events(SF, lsn_lo=100, lsn_hi=200)
    t = ds.to_pandas()
    assert t["lsn"].min() >= 100 and t["lsn"].max() < 200
    assert len(t) == 100


def test_events_changelog_tool_args_mirror():
    ray_t = (
        cl.changelog_from_events(SF, tool_args_after=500)
        .to_pandas()
        .sort_values("lsn")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{os.path.join(SF, 'events.parquet')}'"
    )
    expr = cl.TOOL_ARGS_SQL.format(after=500)
    sql_t = con.sql(
        f"WITH {cl.CHANGELOG_CTE.strip()} "
        f"SELECT *, {expr} AS tool_args FROM changelog ORDER BY lsn"
    ).df()
    a, b = ray_t["tool_args"], sql_t["tool_args"]
    assert a.isna().equals(b.isna())
    mask = ~a.isna()
    assert (a[mask] == b[mask]).all()


def test_sqlite_source(tmp_path):
    import sqlite3

    db = tmp_path / "t.db"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER, name TEXT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(1, "a"), (2, "b")])
    con.commit()
    con.close()
    ds = create_source(
        {"type": "sqlite", "path": str(db), "query": "SELECT * FROM t ORDER BY id"}
    )
    assert [r["name"] for r in ds.take_all()] == ["a", "b"]


def test_output_path_from_spec():
    from etl_pipeline_rdf_star_ray.mapping import output_path_from_spec, parse_yarrrml

    spec = parse_yarrrml("targets: {out1: {access: out.trig}}\nmappings: {}")
    assert output_path_from_spec(spec) == "out.trig"
    spec2 = parse_yarrrml("mappings: {}")
    assert output_path_from_spec(spec2) == "output.trig"


def test_jsonl_source_roundtrip(ray_session, tmp_path):
    """Round-5 JSONL reader: the counterpart of export.export_jsonl —
    export a dataset to shards, read it back through the source registry,
    and get the same rows (training-corpus roundtrip). Blank lines skip,
    nested objects flatten with the reference semantics, flatten=False
    keeps raw records."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from etl_pipeline_rdf_star_ray.pipelines.export import export_jsonl
    from etl_pipeline_rdf_star_ray.sources import create_source, source_kinds

    assert "jsonl" in source_kinds()

    t = pa.table(
        {
            "doc_id": pa.array(range(50), pa.int64()),
            "text": pa.array([f"d{i}" for i in range(50)]),
        }
    )
    root = tmp_path / "out"
    export_jsonl(rd.from_arrow(t), str(root), shard_key_col="doc_id", num_shards=4)
    back = (
        create_source({"type": "jsonl", "path": str(root)})
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert back["doc_id"].tolist() == list(range(50))
    assert back["text"].tolist() == [f"d{i}" for i in range(50)]

    # nested flatten + blank lines
    p = tmp_path / "nested.jsonl"
    p.write_text(
        json.dumps({"user": {"name": "ada"}, "tags": [1, 2]})
        + "\n\n"
        + json.dumps({"user": {"name": "bo"}, "tags": []})
        + "\n"
    )
    flat = create_source({"type": "jsonl", "path": str(p)}).to_pandas()
    assert sorted(flat["user_name"]) == ["ada", "bo"]
    raw = create_source(
        {"type": "jsonl", "path": str(p), "flatten": False}
    ).to_pandas()
    assert {"name": "ada"} in list(raw["user"])
