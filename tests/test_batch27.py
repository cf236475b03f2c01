"""Batch 27: SPRT decision boundaries, Chapman capture-recapture
(oracle parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class TestSprt:
    def test_clear_h1(self, ray_session, tmp_path):
        """k/n = 0.5 >> p1=0.15 -> LLR blows past +ln(19)."""
        from datatest_ray.pipelines.oracle27 import q_sprt_events

        et = ["view"] * 100 + ["purchase"] * 100 + ["click"] * 7
        pq.write_table(pa.table({"event_type": pa.array(et)}),
                       str(tmp_path / "events.parquet"))
        out = q_sprt_events(str(tmp_path))
        assert out.column("n")[0].as_py() == 200
        assert out.column("k")[0].as_py() == 100
        assert out.column("decision")[0].as_py() == "accept_h1"
        expect = 100 * np.log(1.5) + 100 * np.log(0.85 / 0.90)
        assert abs(out.column("llr")[0].as_py() - expect) < 1e-5

    def test_clear_h0(self, ray_session, tmp_path):
        from datatest_ray.pipelines.oracle27 import q_sprt_events

        et = ["view"] * 500 + ["purchase"] * 10
        pq.write_table(pa.table({"event_type": pa.array(et)}),
                       str(tmp_path / "events.parquet"))
        out = q_sprt_events(str(tmp_path))
        assert out.column("decision")[0].as_py() == "accept_h0"


class TestCaptureRecapture:
    def test_known_overlap(self, ray_session, tmp_path):
        """Constructed samples: A = keys from even orders, B = from
        mod-3 orders; Chapman formula checked against hand counts."""
        from datatest_ray.pipelines.oracle27 import q_capture_recapture_ps

        # order 6 -> in both; order 2,4 -> A only; order 3,9 -> B only
        ok = pa.array([6, 2, 4, 3, 9, 5], pa.int64())
        pk = pa.array([1, 2, 3, 4, 5, 6], pa.int64())
        sk = pa.array([1, 1, 1, 1, 1, 1], pa.int64())
        pq.write_table(pa.table({
            "l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk,
        }), str(tmp_path / "lineitem.parquet"))
        out = q_capture_recapture_ps(str(tmp_path))
        na = out.column("na")[0].as_py()
        nb = out.column("nb")[0].as_py()
        nab = out.column("nab")[0].as_py()
        # A: orders 6,2,4 -> parts 1,2,3; B: orders 6,3,9 -> parts 1,4,5
        assert (na, nb, nab) == (3, 3, 1)
        chapman = (na + 1) * (nb + 1) / (nab + 1) - 1
        assert abs(out.column("chapman")[0].as_py() - chapman) < 1e-9

    def test_estimates_population(self, ray_session):
        """On the real table the estimate lands near the true distinct
        pair count (random interleave of orders over pairs)."""
        import duckdb

        from datatest_ray.pipelines.oracle27 import q_capture_recapture_ps

        sf = "/root/testdata/sf0.001"
        out = q_capture_recapture_ps(sf)
        truth = duckdb.sql(
            f"SELECT count(DISTINCT l_partkey * 1000000 + l_suppkey) "
            f"FROM read_parquet('{sf}/lineitem.parquet') "
            f"WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL"
        ).fetchone()[0]
        est = out.column("chapman")[0].as_py()
        assert 0.5 * truth < est < 1.5 * truth
