"""columns= accepts a bare string everywhere (round-4 verdict item #2).

Previously ``columns="qty"`` raised ``TypeError: this check needs
exactly one column`` (len("qty") != 1) while a ONE-character column
name accidentally worked.  Both the implicit-dispatch and every
explicit-method path must accept str and [str] identically.
"""
import pyarrow as pa
import pytest

from datatest_ray import ValidationError, valid, validate


def _ds():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "qty": [5.0, 7.0, 9.0],
        "who": ["a", "b", "a"],
        "oid": [1, 2, 3],
    }))


def test_bare_string_equals_list(ray_session):
    ds = _ds()
    for cols in ("qty", ["qty"]):
        validate.interval(ds, min=0, max=10, columns=cols)
        assert valid(ds, {5.0, 7.0, 9.0}, columns=cols)
    for cols in ("who", ["who"]):
        validate.set(ds, {"a", "b"}, columns=cols)
        validate.regex(ds, r"^[ab]$", columns=cols)
        with pytest.raises(ValidationError):
            validate.subset(ds, {"a"}, columns=cols)
    validate.unique(ds, columns="oid")
    validate(ds, {"a", "b"}, columns="who")  # implicit dispatch


def test_missing_column_clean_error(ray_session):
    ds = _ds()
    with pytest.raises(ValueError, match="nope"):
        validate.interval(ds, min=0, max=1, columns="nope")
    with pytest.raises((TypeError, ValueError)):
        validate.interval(ds, min=0, max=1, columns=["a", "b"])
