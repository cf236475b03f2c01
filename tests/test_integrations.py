"""§2.G integration surfaces: working_directory, register_accessors,
compare_datasets."""

import os

import pyarrow as pa
import pytest


def test_working_directory(tmp_path):
    from datatest_ray import working_directory

    before = os.getcwd()
    with working_directory(str(tmp_path)):
        assert os.getcwd() == str(tmp_path)
    assert os.getcwd() == before

    # file path -> its parent; decorator form
    f = tmp_path / "fixture.csv"
    f.write_text("x\n1\n")

    @working_directory(str(f))
    def inside():
        return os.getcwd()

    assert inside() == str(tmp_path)
    assert os.getcwd() == before

    # directory with a dot in its name is used as-is, not its parent
    dotted = tmp_path / "v1.2"
    dotted.mkdir()
    with working_directory(str(dotted)):
        assert os.getcwd() == str(dotted)
    assert os.getcwd() == before


def test_register_accessors(ray_session):
    import ray.data as rd

    from datatest_ray import ValidationError, register_accessors

    register_accessors()
    ds = rd.from_arrow(pa.table({"a": [1, 2, 3]}))
    assert ds.valid({"a": int})
    with pytest.raises(ValidationError):
        ds.validate({"a": {1, 2}})  # 3 is Extra


def test_compare_datasets(ray_session):
    import ray.data as rd

    from datatest_ray import IntervalCheck, compare_datasets

    a = rd.from_arrow(pa.table({"v": [1.0, 2.0, 3.0]}))
    b = rd.from_arrow(pa.table({"v": [1.0, 2.0, 99.0]}))
    out = compare_datasets([IntervalCheck("v", min=0, max=10)], a, b)
    (info,) = out.values()
    assert info == {"a": 0, "b": 1, "equal": False}
