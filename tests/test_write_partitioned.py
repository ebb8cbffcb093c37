"""Resumable partitioned writer: atomic per-partition commit, re-run skips
finished partitions, a lost marker re-writes exactly that partition."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from etl_pipeline_rdf_star_ray.pipelines.export import write_partitioned


def _docs():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(40)), pa.int64()),
                "lang": pa.array(["en", "de", "fr", "es"] * 10, pa.string()),
                "text": pa.array([f"doc {i}" for i in range(40)]),
            }
        )
    )


def test_write_skip_and_recover(ray_session, tmp_path):
    root = str(tmp_path / "out")
    m1 = write_partitioned(_docs(), root, partition_col="lang").to_pandas()
    assert sorted(m1["partition"]) == ["de", "en", "es", "fr"]
    assert (~m1["skipped"]).all() and m1["rows"].sum() == 40
    # every partition directory has data + marker, readable back
    total = 0
    for p in m1["path"]:
        assert os.path.exists(p)
        assert os.path.exists(os.path.join(os.path.dirname(p), "_SUCCESS"))
        total += pq.read_table(p).num_rows
    assert total == 40

    # full re-run: everything skipped, files untouched
    mtimes = {p: os.path.getmtime(p) for p in m1["path"]}
    m2 = write_partitioned(_docs(), root, partition_col="lang").to_pandas()
    assert m2["skipped"].all() and m2["rows"].sum() == 0
    assert {p: os.path.getmtime(p) for p in m2["path"]} == mtimes

    # simulate a crash that lost one partition's marker: only it rewrites
    victim = sorted(m1["path"])[0]
    shutil.rmtree(os.path.dirname(victim))
    m3 = write_partitioned(_docs(), root, partition_col="lang").to_pandas()
    done = m3.set_index("partition")["skipped"]
    assert (~done).sum() == 1 and not done["de"]
    assert pq.read_table(victim).num_rows == 10


def test_hostile_partition_values_cannot_escape_root(tmp_path, ray_session):
    """Partition values are percent-encoded (Spark/Hive convention): a value
    containing '/', '..', '=', '%' or the null sentinel string stays one
    inert directory under root — no path escape, no layout break, no
    sentinel collision — and the layout is resumable."""
    root = str(tmp_path / "safe" / "out")
    values = ["a/../../x", "k=v", "100%", "__NULL__", None, "plain"]
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(values, pa.string()),
                "v": pa.array(range(len(values)), pa.int64()),
            }
        )
    )
    m1 = write_partitioned(ds, root, partition_col="k").to_pandas()
    assert len(m1) == 6 and m1["rows"].sum() == 6

    # every written file lives strictly under root; nothing escaped
    for p in m1["path"]:
        assert os.path.abspath(p).startswith(os.path.abspath(root) + os.sep)
    outside = tmp_path / "safe" / "x"
    assert not outside.exists()

    # hive layout intact: each dir splits as k=<encoded> with no extra
    # '/' or '=' inside the value part, and decoding round-trips
    from urllib.parse import unquote

    seen = set()
    for p in m1["path"]:
        dirname = os.path.basename(os.path.dirname(p))
        col, _, enc = dirname.partition("=")
        assert col == "k" and "/" not in enc and "=" not in enc
        seen.add(unquote(enc) if enc != "__NULL__" else None)
    assert seen == {"a/../../x", "k=v", "100%", "__NULL__", None, "plain"}

    # the real string "__NULL__" and actual null land in DIFFERENT dirs
    dirs = {os.path.basename(os.path.dirname(p)) for p in m1["path"]}
    assert "k=__NULL__" in dirs  # actual null
    assert "k=%5F%5FNULL%5F%5F" in dirs  # the literal string

    # resumability survives the encoding: full re-run skips everything
    m2 = write_partitioned(ds, root, partition_col="k").to_pandas()
    assert m2["skipped"].all()
