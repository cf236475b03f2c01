"""Batch 22: BPE-ish regex token counting (oracle parity covered by
test_oracle.py)."""

import pyarrow as pa
import pyarrow.parquet as pq


class TestBpeTokens:
    def test_known_strings(self, ray_session, tmp_path):
        from datatest_ray.pipelines.oracle22 import q_bpe_token_counts

        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["it's 42 degrees!", "hello world", "a,b,c"],
        }), str(tmp_path / "documents.parquet"))
        out = q_bpe_token_counts(str(tmp_path))
        got = {out.column("doc_id")[i].as_py():
               (out.column("n_ws")[i].as_py(),
                out.column("n_bpe")[i].as_py())
               for i in range(out.num_rows)}
        # "it's 42 degrees!" -> it | 's | ' 42' | ' degrees' | '!'
        assert got[1] == (3, 5)
        # "hello world" -> hello | ' world'
        assert got[2] == (2, 2)
        # "a,b,c" -> a | , | b | , | c
        assert got[3] == (1, 5)

    def test_fertility_sums(self, ray_session, tmp_path):
        from datatest_ray.pipelines.oracle22 import q_bpe_fertility_lang

        pq.write_table(pa.table({
            "lang": ["en", "en", "de"],
            "text": ["it's fine", "ok", "gut so"],
        }), str(tmp_path / "documents.parquet"))
        out = q_bpe_fertility_lang(str(tmp_path))
        got = {out.column("lang")[i].as_py():
               (out.column("n_ws")[i].as_py(),
                out.column("n_bpe")[i].as_py())
               for i in range(out.num_rows)}
        # en: "it's fine" (2 ws, it/'s/' fine' = 3 bpe) + "ok" (1, 1)
        assert got["en"] == (3, 4)
        assert got["de"] == (2, 2)
