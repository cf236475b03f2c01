"""Batch 12: Q5-style star join, order reconciliation top-k, exact AUC
via Mann-Whitney one-vs-rest."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestMannWhitneyOneVsRest:
    def test_auc_equals_sklearn_style_exact(self, ray_session):
        """U/(n_a*n_b) with b=None must equal the exact tie-aware ROC
        AUC (pairwise wins + half-ties), brute-forced here."""
        from datatest_ray.stages.robust import mann_whitney

        rng = np.random.default_rng(7)
        score = np.round(rng.normal(size=200), 1)  # force ties
        label = rng.integers(0, 2, size=200)
        t = pa.table({"v": score, "g": label.astype("int64")})
        out = mann_whitney(_ds(t), value_col="v", group_col="g",
                           a=1).take_all()[0]
        pos, neg = score[label == 1], score[label == 0]
        wins = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
        assert out["n_a"] == len(pos) and out["n_b"] == len(neg)
        assert abs(out["u"] / (out["n_a"] * out["n_b"]) - auc) < 1e-12

    def test_rest_class_excludes_null_groups(self, ray_session):
        from datatest_ray.stages.robust import mann_whitney

        t = pa.table({"v": [1.0, 2.0, 3.0, 4.0],
                      "g": ["a", "x", None, "y"]})
        out = mann_whitney(_ds(t), value_col="v", group_col="g",
                           a="a").take_all()[0]
        assert out["n_a"] == 1 and out["n_b"] == 2  # null row dropped

    def test_explicit_b_unchanged(self, ray_session):
        from datatest_ray.stages.robust import mann_whitney

        t = pa.table({"v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
                      "g": ["a", "b", "a", "b", "c", "c"]})
        ab = mann_whitney(_ds(t), value_col="v", group_col="g",
                          a="a", b="b").take_all()[0]
        assert ab["n_a"] == 2 and ab["n_b"] == 2
        # a={1,3} vs b={2,4}: a beats b in 1 of 4 pairs -> U=1
        assert ab["u"] == 1.0


class TestStarJoinRevenue:
    def test_matches_duckdb(self, ray_session):
        import duckdb

        from datatest_ray.pipelines.oracle12 import (
            SQL_Q5_STAR_REVENUE, q_q5_star_revenue)

        sf = "/root/testdata/sf0.001"
        got = q_q5_star_revenue(sf).to_pandas().sort_values(
            "n_name").reset_index(drop=True)
        con = duckdb.connect()
        for t in ("lineitem", "supplier", "nation", "region"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
        want = con.sql(SQL_Q5_STAR_REVENUE).df().sort_values(
            "n_name").reset_index(drop=True)
        assert list(got["n_name"]) == list(want["n_name"])
        assert np.allclose(got["revenue"], want["revenue"])
        assert (got["n_items"].to_numpy()
                == want["n_items"].to_numpy()).all()


class TestOrderReconTopk:
    def test_full_outer_semantics(self, ray_session):
        """An order with no lineitems and a lineitem with no order must
        both surface with the missing side at 0."""
        import ray.data as rd

        from datatest_ray.pipelines import oracle12

        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            import pyarrow.parquet as pq

            pq.write_table(pa.table({
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_totalprice": [100.0, 50.0],
            }), os.path.join(d, "orders.parquet"))
            pq.write_table(pa.table({
                "l_orderkey": pa.array([1, 1, 3], pa.int64()),
                "l_extendedprice": [40.0, 59.0, 7.0],
            }), os.path.join(d, "lineitem.parquet"))
            out = oracle12.q_order_recon_topk(d).to_pandas()
        by_key = out.set_index("o_orderkey")
        assert by_key.loc[2, "li_total"] == 0.0
        assert by_key.loc[2, "diff"] == 50.0
        assert by_key.loc[3, "o_total"] == 0.0
        assert by_key.loc[3, "diff"] == -7.0
        assert by_key.loc[1, "diff"] == 1.0
        # sorted by |diff| desc
        assert list(out["o_orderkey"]) == [2, 3, 1]
