"""Batch 46: Z-order locality histogram and greedy coverage selection
(zorder oracle parity covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


class TestMorton:
    def test_interleave_known_values(self):
        from datatest_ray.stages.salting import _morton_interleave

        qx = np.array([0b11, 0, 1, 0b10], np.int64)
        qy = np.array([0b01, 0, 0, 0b11], np.int64)
        # x occupies odd bits, y even bits
        got = _morton_interleave(qx, qy, 2)
        assert got.tolist() == [0b1011, 0, 0b10, 0b1101]

    def test_sql_expr_matches_numpy(self):
        import duckdb

        from datatest_ray.stages.salting import (_morton_interleave,
                                                 morton_sql_expr)

        rng = np.random.default_rng(2)
        qx = rng.integers(0, 256, 200).astype(np.int64)
        qy = rng.integers(0, 256, 200).astype(np.int64)
        con = duckdb.connect()
        con.register("t", pa.table({"qx": pa.array(qx),
                                    "qy": pa.array(qy)}))
        sql = con.sql(
            f"SELECT {morton_sql_expr('qx', 'qy', 8)} AS c FROM t"
        ).fetchnumpy()["c"]
        assert (sql == _morton_interleave(qx, qy, 8)).all()

    def test_histogram_locality(self, ray_session):
        from datatest_ray.stages.salting import zorder_histogram

        # two tight clusters far apart in both dims must land in
        # disjoint buckets
        rng = np.random.default_rng(4)
        a = rng.uniform(0.0, 4.0, size=(300, 2))
        b = rng.uniform(200.0, 204.0, size=(300, 2))
        xy = np.vstack([a, b])
        t = pa.table({"x": pa.array(xy[:, 0]), "y": pa.array(xy[:, 1])})
        out = pa.concat_tables(list(zorder_histogram(
            _ds(t), x_col="x", y_col="y", x_min=0.0, x_max=256.0,
            y_min=0.0, y_max=256.0).iter_batches(
            batch_format="pyarrow"))).to_pandas()
        assert out["n"].sum() == 600
        # few buckets total (locality), and the two clusters' buckets
        # don't interleave: cluster a codes < cluster b codes
        assert len(out) <= 6
        assert (out["code_hi"].min() < out["code_lo"].max())


def _brute_greedy(docs: dict, k: int):
    """Reference greedy over {doc_id: set-of-terms}."""
    covered, picks = set(), []
    for _ in range(k):
        best, best_gain = None, 0
        for d in sorted(docs):
            g = len(docs[d] - covered)
            if g > best_gain:
                best, best_gain = d, g
        if best is None:
            break
        covered |= docs[best]
        picks.append((best, best_gain, len(covered)))
    return picks


class TestGreedyCoverage:
    def test_matches_bruteforce(self, ray_session):
        from datatest_ray.stages.sampling import greedy_coverage

        rng = np.random.default_rng(9)
        vocab = [f"w{i}" for i in range(60)]
        texts, ref = [], {}
        for d in range(25):
            words = list(rng.choice(vocab, size=rng.integers(3, 15),
                                    replace=True))
            texts.append(" ".join(words))
            ref[d] = set(words)
        t = pa.table({"doc_id": pa.array(list(range(25)), pa.int64()),
                      "text": pa.array(texts)})
        out = greedy_coverage(_ds(t), id_col="doc_id",
                              text_col="text", k=6).to_pandas()
        picks = _brute_greedy(ref, 6)
        assert list(out["doc_id"]) == [p[0] for p in picks]
        assert list(out["gain"]) == [p[1] for p in picks]
        assert list(out["covered_total"]) == [p[2] for p in picks]

    def test_stops_when_covered(self, ray_session):
        from datatest_ray.stages.sampling import greedy_coverage

        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["a b", "a b", "b a"])})
        out = greedy_coverage(_ds(t), id_col="doc_id",
                              text_col="text", k=3).to_pandas()
        # doc 1 covers everything; rounds 2-3 gain 0 and stop
        assert list(out["doc_id"]) == [1]
