"""Bloom filter + sketch-broadcast decontamination: zero false negatives
(superset of the exact path's flags), bounded false-positive rate, OR-merge
equivalence."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from etl_pipeline_rdf_star_ray.functions.bloom import (
    bloom_build,
    bloom_contains,
    bloom_merge,
    bloom_params,
)
from etl_pipeline_rdf_star_ray.pipelines.dedup import (
    decontaminate,
    decontaminate_bloom,
)


def test_no_false_negatives_and_fp_bound():
    members = pa.array([f"member-{i}" for i in range(10_000)], pa.string())
    others = pa.array([f"other-{i}" for i in range(50_000)], pa.string())
    m, k = bloom_params(len(members), 1e-3)
    bits = bloom_build(members, m, k)
    # every member found
    assert bloom_contains(bits, members, m, k).all()
    # false positives within ~5x the configured rate (slack for variance)
    fp = bloom_contains(bits, others, m, k).mean()
    assert fp <= 5e-3, fp


def test_merge_is_or():
    a = pa.array([f"a{i}" for i in range(500)], pa.string())
    b = pa.array([f"b{i}" for i in range(500)], pa.string())
    both = pa.array([f"a{i}" for i in range(500)] + [f"b{i}" for i in range(500)])
    m, k = bloom_params(1000, 1e-4)
    merged = bloom_merge(bloom_build(a, m, k), bloom_build(b, m, k))
    assert np.array_equal(merged, bloom_build(both, m, k))
    assert bloom_contains(merged, both, m, k).all()


def test_decontaminate_bloom_superset_of_exact(ray_session):
    bench = ["the quick brown fox jumps over the lazy dog"] * 3
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(
                [
                    "the quick brown fox jumps high",  # shares grams
                    "quick brown fox detected here",  # shares grams
                    "completely unrelated text about parquet files",
                    "another clean document with no overlap at all",
                    "",  # empty: zero grams, never flagged
                    "the quick brown fox jumps over the lazy dog",  # full dup
                ]
            ),
        }
    )
    exact = (
        decontaminate(rd.from_arrow(docs), bench)
        .to_pandas()
        .set_index("doc_id")["contaminated"]
    )
    sketch = (
        decontaminate_bloom(rd.from_arrow(docs), bench, fp_rate=1e-6)
        .to_pandas()
        .set_index("doc_id")["contaminated"]
    )
    # zero false negatives: everything exact flags, bloom flags
    assert (sketch[exact] == True).all()  # noqa: E712
    # at fp=1e-6 on this tiny corpus, no false positives either
    assert sketch.equals(exact)
