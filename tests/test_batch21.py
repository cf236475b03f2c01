"""Batch 21: Hill tail index, daily mix chi-square (oracle parity
covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


class TestHillTail:
    def test_exact_pareto_recovers_alpha(self, ray_session, tmp_path):
        """On an exact Pareto(alpha) sample the Hill estimator is close
        to alpha (inverse-CDF construction, seeded)."""
        import pyarrow.parquet as pq

        from datatest_ray.pipelines.oracle21 import q_hill_tail_value

        rng = np.random.default_rng(11)
        alpha = 2.5
        u = rng.uniform(0.0001, 0.9999, 5000)
        values = (1.0 - u) ** (-1.0 / alpha)
        pq.write_table(pa.table({
            "event_id": pa.array(np.arange(5000), pa.int64()),
            "value": pa.array(values),
        }), str(tmp_path / "events.parquet"))
        out = q_hill_tail_value(str(tmp_path))
        assert out.column("k")[0].as_py() == 100
        hill = out.column("hill")[0].as_py()
        assert abs(hill - alpha) < 0.8  # k=100 estimator noise band

    def test_short_input(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from datatest_ray.pipelines.oracle21 import q_hill_tail_value

        pq.write_table(pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "value": pa.array([1.0, 2.0, 4.0]),
        }), str(tmp_path / "events.parquet"))
        out = q_hill_tail_value(str(tmp_path))
        # k = n-1 = 2; hill = 1/mean(ln(4/1), ln(2/1))
        assert out.column("k")[0].as_py() == 2
        expect = 1.0 / np.mean([np.log(4.0), np.log(2.0)])
        assert abs(out.column("hill")[0].as_py() - expect) < 1e-6


class TestMixChisq:
    def test_identical_mix_is_zero(self, ray_session, tmp_path):
        """Two days with the SAME type composition -> chi2 == 0."""
        import datetime as dt

        import pyarrow.parquet as pq

        from datatest_ray.pipelines.oracle21 import q_mix_chisq_daily

        base = dt.datetime(2024, 3, 1)
        rows_ts, rows_et = [], []
        for day in range(2):
            for et, n in [("a", 10), ("b", 30)]:
                for i in range(n):
                    rows_ts.append(base + dt.timedelta(days=day, minutes=i))
                    rows_et.append(et)
        pq.write_table(pa.table({
            "ts": pa.array(rows_ts, pa.timestamp("us")),
            "event_type": pa.array(rows_et),
        }), str(tmp_path / "events.parquet"))
        out = q_mix_chisq_daily(str(tmp_path))
        assert out.num_rows == 2
        assert all(c == 0.0 for c in out.column("chi2").to_pylist())
        assert all(n == 40 for n in out.column("nd").to_pylist())

    def test_shifted_day_flags(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow.parquet as pq

        from datatest_ray.pipelines.oracle21 import q_mix_chisq_daily

        base = dt.datetime(2024, 3, 1)
        rows_ts, rows_et = [], []
        for day, mix in [(0, [("a", 20), ("b", 20)]),
                         (1, [("a", 39), ("b", 1)])]:
            for et, n in mix:
                for i in range(n):
                    rows_ts.append(base + dt.timedelta(days=day, minutes=i))
                    rows_et.append(et)
        pq.write_table(pa.table({
            "ts": pa.array(rows_ts, pa.timestamp("us")),
            "event_type": pa.array(rows_et),
        }), str(tmp_path / "events.parquet"))
        out = q_mix_chisq_daily(str(tmp_path))
        chi = {d: c for d, c in zip(out.column("day").to_pylist(),
                                    out.column("chi2").to_pylist())}
        assert len(chi) == 2
        vals = sorted(chi.values())
        assert vals[0] == vals[1] > 0  # 2x2 table: both days same chi2
