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
