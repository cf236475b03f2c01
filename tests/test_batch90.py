"""Batch 90: Syntetos-Boylan intermittency classes (oracle parity
covered by test_oracle.py)."""

import datetime

import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestIntermittencyClasses:
    def _events(self, sku_weeks):
        """sku_weeks: {key: [(week_index, qty), ...]}."""
        day0 = datetime.datetime(2024, 1, 4)  # epoch-week aligned
        k, ts, q = [], [], []
        for key, weeks in sku_weeks.items():
            for w, qty in weeks:
                k.append(key)
                ts.append(day0 + datetime.timedelta(days=7 * w))
                q.append(float(qty))
        return pa.table({
            "l_partkey": pa.array(k, pa.int64()),
            "l_shipdate": pa.array(ts, pa.timestamp("us")),
            "l_quantity": pa.array(q, pa.float64()),
        })

    def test_four_quadrants(self, ray_session):
        from datatest_ray.stages.temporal import intermittency_classes

        sku = {
            # smooth: demand every week, constant size
            1: [(w, 10) for w in range(10)],
            # intermittent: sparse but constant size (ADI 5, CV2 0)
            2: [(0, 10), (5, 10), (10, 10)],
            # erratic: every week, wildly varying size
            3: [(w, 1 if w % 2 else 400) for w in range(10)],
            # lumpy: sparse AND wildly varying
            4: [(0, 1), (5, 400), (10, 2)],
        }
        t = self._events(sku)
        out = {r["class"]: r["n_keys"]
               for r in intermittency_classes(
                   _ds(t), "l_shipdate", key_col="l_partkey",
                   qty_col="l_quantity").take_all()}
        assert out["smooth"] == 1
        assert out["intermittent"] == 1
        assert out["erratic"] == 1
        assert out["lumpy"] == 1

    def test_single_demand_is_smooth(self, ray_session):
        from datatest_ray.stages.temporal import intermittency_classes

        t = self._events({7: [(3, 5)]})
        out = {r["class"]: r["n_keys"]
               for r in intermittency_classes(
                   _ds(t, 1), "l_shipdate", key_col="l_partkey",
                   qty_col="l_quantity").take_all()}
        # span 1 / nd 1 -> ADI 1; single size -> CV2 0
        assert out["smooth"] == 1
        assert sum(out.values()) == 1
