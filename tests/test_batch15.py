"""Batch 15: TPC-H-shaped Q4/Q6/Q7/Q9/Q10/Q13/Q15/Q17/Q19/Q22 edge
semantics (full sf0.001 oracle parity is covered by test_oracle.py)."""

import pyarrow as pa

SF = "/root/testdata/sf0.001"


class TestQ13ZeroOrders:
    def test_zero_count_customers_included(self, ray_session):
        from datatest_ray.pipelines.oracle15 import q_q13_order_count_dist

        t = q_q13_order_count_dist(SF)
        dist = dict(zip(t.column("c_count").to_pylist(),
                        t.column("custdist").to_pylist()))
        # customers without any order must appear as the k=0 bucket
        import duckdb

        con = duckdb.connect()
        n0 = con.sql(
            f"SELECT count(*) FROM read_parquet('{SF}/customer.parquet') c "
            f"WHERE NOT EXISTS (SELECT 1 FROM "
            f"read_parquet('{SF}/orders.parquet') o "
            f"WHERE o.o_custkey = c.c_custkey)").fetchone()[0]
        assert dist.get(0, 0) == n0
        # total mass = number of customers
        ncust = con.sql(
            f"SELECT count(*) FROM read_parquet('{SF}/customer.parquet')"
        ).fetchone()[0]
        assert sum(dist.values()) == ncust


class TestQ15Ties:
    def test_all_max_suppliers_survive(self, ray_session):
        """If several suppliers tie on max revenue, every one must be
        emitted (the SQL `= (SELECT max(...))` contract) — verified by
        construction on a tiny synthetic lineitem."""
        import ray.data as rd

        from datatest_ray.pipelines.oracle15 import _Q15_LO

        # two suppliers with identical revenue, one below
        t = pa.table({
            "l_suppkey": [1, 2, 3],
            "l_extendedprice": [100.0, 100.0, 50.0],
            "l_discount": [0.0, 0.0, 0.0],
            "l_shipdate": pa.array([_Q15_LO] * 3,
                                   pa.timestamp("us")),
        })
        sup = pa.table({"s_suppkey": [1, 2, 3],
                        "s_name": ["a", "b", "c"]})
        import os
        import tempfile

        import pyarrow.parquet as pq

        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "lineitem.parquet"))
            pq.write_table(sup, os.path.join(d, "supplier.parquet"))
            from datatest_ray.pipelines.oracle15 import q_q15_top_supplier

            out = q_q15_top_supplier(d)
        assert sorted(out.column("s_suppkey").to_pylist()) == [1, 2]
        assert out.column("total_revenue").to_pylist() == [100.0, 100.0]


class TestQ22Recency:
    def test_schema_survives_empty_result(self, ray_session):
        """A cutoff in the far past makes every customer 'recent', so
        the anti join drains to zero rows — the empty result must keep
        its 3-column schema (the driver compare needs columns)."""
        import os
        import tempfile

        import pyarrow.parquet as pq

        from datatest_ray.pipelines import oracle15

        cust = pa.table({
            "c_custkey": [1, 2],
            "c_nationkey": pa.array([0, 1], pa.int32()),
            "c_acctbal": [10.0, 20.0],
        })
        orders = pa.table({
            "o_custkey": [1, 2],
            "o_orderdate": pa.array(
                [oracle15._Q22_CUT, oracle15._Q22_CUT],
                pa.timestamp("us")),
        })
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(cust, os.path.join(d, "customer.parquet"))
            pq.write_table(orders, os.path.join(d, "orders.parquet"))
            out = oracle15.q_q22_idle_customers(d)
        assert out.num_rows == 0
        assert out.column_names == ["c_nationkey", "numcust", "totacctbal"]

    def test_nonvacuous_on_testdata(self, ray_session):
        from datatest_ray.pipelines.oracle15 import q_q22_idle_customers

        assert q_q22_idle_customers(SF).num_rows > 0


class TestExactMoneyMath:
    def test_rev_numer_is_exact_int(self):
        from datatest_ray.pipelines.oracle15 import _rev_numer

        # a case whose float cents product lands exactly on .5 —
        # the int scheme can't be bitten by rounding mode
        t = pa.table({"l_extendedprice": [100.25], "l_discount": [0.02]})
        assert _rev_numer(t).to_pylist() == [10025 * 98]

    def test_q6_numerator_matches_decimal(self):
        from decimal import Decimal

        import pyarrow.compute as pc

        from datatest_ray.pipelines.oracle15 import _bp, _cents

        t = pa.table({"l_extendedprice": [101.15, 0.01, 99999.99],
                      "l_discount": [0.03, 0.1, 0.07]})
        numer = pc.multiply(_cents(t.column("l_extendedprice")),
                            _bp(t.column("l_discount"))).to_pylist()
        want = [int(Decimal("101.15") * 100) * 3,
                int(Decimal("0.01") * 100) * 10,
                int(Decimal("99999.99") * 100) * 7]
        assert numer == want
