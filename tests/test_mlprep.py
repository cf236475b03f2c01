"""Unit tests for stages/mlprep.py: FD validation, target encoding,
deterministic split balance."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_fd_violations_flags_only_broken_determinants(ray_session):
    from datatest_ray.stages.mlprep import fd_violations

    ds = _ds([
        {"k": "a", "v": 1}, {"k": "a", "v": 1},          # intact
        {"k": "b", "v": 1}, {"k": "b", "v": 2},          # broken (2)
        {"k": "c", "v": 3}, {"k": "c", "v": 4}, {"k": "c", "v": 5},
    ])
    out = fd_violations(ds, det_col="k", dep_col="v").to_pandas()
    got = dict(zip(out["k"], out["n_vals"]))
    assert got == {"b": 2, "c": 3}


def test_fd_violations_empty_when_fd_holds(ray_session):
    from datatest_ray.stages.mlprep import fd_violations

    ds = _ds([{"k": "a", "v": 1}, {"k": "b", "v": 2}, {"k": "a", "v": 1}])
    assert fd_violations(ds, det_col="k", dep_col="v").count() == 0


def test_target_encode_attaches_category_mean(ray_session):
    from datatest_ray.stages.mlprep import target_encode

    ds = _ds([
        {"id": 1, "cat": "x", "t": 10.0},
        {"id": 2, "cat": "x", "t": 20.0},
        {"id": 3, "cat": "y", "t": 5.0},
    ])
    out = target_encode(ds, cat_col="cat", target_col="t",
                        id_col="id").to_pandas().set_index("id")
    assert out.loc[1, "te"] == pytest.approx(15.0)
    assert out.loc[2, "te"] == pytest.approx(15.0)
    assert out.loc[3, "te"] == pytest.approx(5.0)
    assert len(out) == 3


def test_split_balance_counts_every_row_once(ray_session):
    from datatest_ray.stages.mlprep import split_balance

    n = 500
    ds = _ds([{"id": i, "cls": "even" if i % 2 == 0 else "odd"}
              for i in range(n)])
    out = split_balance(ds, id_col="id", class_col="cls",
                        train=0.8, val=0.1).to_pandas()
    assert out["n"].sum() == n
    assert set(out["split"]) <= {"train", "val", "test"}
    # md5-keyed: a rerun gives the identical matrix
    out2 = split_balance(ds, id_col="id", class_col="cls",
                         train=0.8, val=0.1).to_pandas()
    a = out.sort_values(["split", "cls"]).reset_index(drop=True)
    b = out2.sort_values(["split", "cls"]).reset_index(drop=True)
    assert a.equals(b)
    # roughly stratified: train holds the bulk
    tr = out[out["split"] == "train"]["n"].sum()
    assert tr > 0.7 * n


def test_quantize_report_error_bound_and_constant_dim(ray_session):
    """Round-trip MSE is bounded by scale^2/4 per dim; a constant
    dimension reports scale 0 and mse 0."""
    import ray.data as rd

    from datatest_ray.stages.mlprep import quantize_report

    rng = np.random.RandomState(9)
    m = rng.standard_normal((500, 8)).astype(np.float32)
    m[:, 3] = 1.5  # constant dim
    ds = rd.from_arrow(pa.table({
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
    }))
    out = quantize_report(ds, vec_col="embedding",
                          levels=255).to_pandas().set_index("dim")
    assert len(out) == 8
    assert out.loc[3, "scale"] == 0.0 and out.loc[3, "mse"] == 0.0
    active = out.drop(index=3)
    assert (active["mse"] <= (active["scale"] ** 2) / 4 + 1e-12).all()
    assert (active["mse"] > 0).all()


class TestImputeGroupMedian:
    def test_mask_and_median(self, ray_session):
        import hashlib

        import pyarrow as pa
        import ray.data as rd
        from datatest_ray.stages.mlprep import impute_group_median

        ids = list(range(1, 41))
        vals = [float(i % 7) for i in ids]
        ds = rd.from_arrow(pa.table({
            "id": ids, "g": ["x"] * 40, "v": vals,
        }))
        out = impute_group_median(
            ds, id_cols="id", by="g", col="v", miss_rate=0.25
        ).to_pandas().set_index("id")

        def unit(k):
            return int(hashlib.md5(str(k).encode()).hexdigest()[:8],
                       16) / 2 ** 32

        import numpy as np
        miss = {i for i in ids if unit(i) < 0.25}
        assert miss, "test needs at least one masked row"
        clean = [v for i, v in zip(ids, vals) if i not in miss]
        med = round(float(np.quantile(clean, 0.5)), 6)
        for i in ids:
            expect = med if i in miss else vals[i - 1]
            assert out.loc[i, "imputed"] == expect


class TestQuantileNormalize:
    def test_groups_converge_to_global_marginal(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from datatest_ray.stages.mlprep import quantile_normalize

        # group 'hot' runs 10x hotter than 'cold'; after normalization
        # both must land on the same (global) value grid
        rng = np.random.RandomState(5)
        cold = rng.uniform(0, 1, 200)
        hot = rng.uniform(0, 10, 200)
        ds = rd.from_arrow(pa.table({
            "id": list(range(400)),
            "g": ["cold"] * 200 + ["hot"] * 200,
            "v": np.concatenate([cold, hot]),
        }))
        out = quantile_normalize(ds, by="g", col="v", id_col="id",
                                 grid_k=101).to_pandas()
        qc = np.sort(out[out.g == "cold"].qn.to_numpy())
        qh = np.sort(out[out.g == "hot"].qn.to_numpy())
        # same size groups + same grid -> identical normalized samples
        assert np.allclose(qc, qh, atol=1e-12)
        # percent_rank 0 and 1 map to global min / max
        allv = np.concatenate([cold, hot])
        assert abs(qc[0] - allv.min()) < 1e-12
        assert abs(qc[-1] - allv.max()) < 1e-12

    def test_single_row_group_maps_to_global_min(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from datatest_ray.stages.mlprep import quantile_normalize

        ds = rd.from_arrow(pa.table({
            "id": [1, 2, 3], "g": ["a", "a", "solo"],
            "v": [5.0, 7.0, 100.0],
        }))
        out = quantile_normalize(ds, by="g", col="v",
                                 id_col="id").to_pandas()
        # solo group's only row has percent_rank 0 -> global minimum
        assert float(out[out.id == 3].qn.iloc[0]) == 5.0


class TestImputeFullyMaskedGroup:
    def test_rows_of_medianless_group_are_dropped(self, ray_session):
        import hashlib

        import pyarrow as pa
        import ray.data as rd
        from datatest_ray.stages.mlprep import impute_group_median

        def unit(k):
            return int(hashlib.md5(str(k).encode()).hexdigest()[:8],
                       16) / 2 ** 32

        # pick ids whose md5 unit < 0.5 for the doomed group
        masked_ids = [i for i in range(1, 200) if unit(i) < 0.5][:3]
        alive_ids = [i for i in range(200, 400) if unit(i) >= 0.5][:3]
        ids = masked_ids + alive_ids
        ds = rd.from_arrow(pa.table({
            "id": ids,
            "g": ["dead"] * 3 + ["alive"] * 3,
            "v": [1.0, 2.0, 3.0, 10.0, 20.0, 30.0],
        }))
        out = impute_group_median(
            ds, id_cols="id", by="g", col="v", miss_rate=0.5
        ).to_pandas()
        # every 'dead' row was masked -> group has no median -> rows
        # dropped (mirrors the oracle's inner join); 'alive' rows keep
        # their values
        assert set(out.id) == set(alive_ids)
        assert sorted(out.imputed) == [10.0, 20.0, 30.0]
