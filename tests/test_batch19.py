"""Batch 19: split leakage, threshold sweep, dup share, compressibility
(oracle parity covered by test_oracle.py for the SQL-paired entries)."""

import zlib

import pyarrow as pa


def _ds(t: pa.Table, blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


class TestDupShare:
    def test_cross_group_duplicates_counted_per_group(self, ray_session):
        """The same text in two langs: BOTH rows count as duped in
        their own group (corpus-wide fingerprint total = 2)."""
        from datatest_ray.stages.dedup import dup_share

        t = pa.table({
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "lang": ["en", "de", "en", "en"],
            "text": ["same", "same", "only-en", "unique"],
        })
        out = dup_share(_ds(t, blocks=2), "text", "id",
                        group_col="lang").take_all()
        got = {r["lang"]: (r["n_docs"], r["n_duped"]) for r in out}
        assert got == {"en": (3, 1), "de": (1, 1)}

    def test_no_duplicates(self, ray_session):
        from datatest_ray.stages.dedup import dup_share

        t = pa.table({
            "id": pa.array([1, 2], pa.int64()),
            "lang": ["en", "en"],
            "text": ["a", "b"],
        })
        out = dup_share(_ds(t), "text", "id", group_col="lang").take_all()
        assert [(r["n_docs"], r["n_duped"]) for r in out] == [(2, 0)]


class TestCompressRatio:
    def test_invariants(self, ray_session):
        from datatest_ray.pipelines.oracle19 import q_compress_ratio_docs

        out = q_compress_ratio_docs("/root/testdata/sf0.001")
        raw = out.column("raw_bytes").to_pylist()
        comp = out.column("comp_bytes").to_pylist()
        assert len(raw) == 500
        assert all(c > 0 for c in comp)
        # repetitive word-list text compresses well below raw size
        assert sum(comp) < sum(raw)

    def test_matches_local_zlib(self, ray_session):
        """Engine output equals a driver-side zlib recompute row-for-row
        (determinism across workers)."""
        import duckdb

        from datatest_ray.pipelines.oracle19 import q_compress_ratio_docs

        out = q_compress_ratio_docs("/root/testdata/sf0.001")
        got = {
            out.column("doc_id")[i].as_py(): (
                out.column("raw_bytes")[i].as_py(),
                out.column("comp_bytes")[i].as_py())
            for i in range(out.num_rows)}
        rows = duckdb.sql(
            "SELECT doc_id, text FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
        for doc_id, text in rows[:50]:
            e = text.encode("utf-8")
            assert got[doc_id] == (len(e), len(zlib.compress(e, 6)))
