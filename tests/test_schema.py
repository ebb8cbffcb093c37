import pyarrow as pa
import pytest

from etl_pipeline_rdf_star_ray import schema as sch


def test_conform_adds_missing_columns_as_nulls():
    t = pa.table({"conv_id": ["a"], "turn_idx": pa.array([1], pa.int32())})
    target = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("tool_args", pa.string()),
        ]
    )
    out = sch.conform(t, target)
    assert out.schema == target
    assert out.column("tool_args").null_count == 1


def test_conform_casts_and_orders():
    t = pa.table({"b": [1], "a": ["x"]})
    target = pa.schema([("a", pa.string()), ("b", pa.int32())])
    out = sch.conform(t, target)
    assert out.column_names == ["a", "b"]
    assert out.schema.field("b").type == pa.int32()


def test_unify_widens():
    s1 = pa.schema([("a", pa.string())])
    s2 = pa.schema([("a", pa.string()), ("late", pa.int64())])
    u = sch.unify(s1, s2)
    assert set(u.names) == {"a", "late"}


def test_concat_evolving():
    t1 = pa.table({"a": ["x"]})
    t2 = pa.table({"a": ["y"], "late": [1]})
    out = sch.concat_evolving([t1, t2])
    assert out.num_rows == 2
    assert out.column("late").null_count == 1


def test_concat_evolving_empty_raises():
    with pytest.raises(ValueError):
        sch.concat_evolving([])
