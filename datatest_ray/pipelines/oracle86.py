"""Driver-contract queries, batch 86 (see oracle.py for the contract):
script-mixing / invisible-character audit over documents.  Merged
into ``oracle.queries()`` / ``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _materialize(result, empty_schema=None):
    from .oracle import _materialize as mat

    return mat(result, empty_schema)


def q_script_mix_docs(sf_dir: str):
    """Han/Latin mixing, zero-width and bidi control characters per
    language (stages/text.py :: script_mix_audit)."""
    from ..stages.text import script_mix_audit

    return _materialize(script_mix_audit(
        _read(sf_dir, "documents", ["text", "lang"]),
        "text", lang_col="lang"))


SQL_SCRIPT_MIX_DOCS = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN regexp_matches(text,
              '\\p{Han}[^\\s]*[A-Za-z]|[A-Za-z][^\\s]*\\p{Han}')
            THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed_script,
       CAST(sum(CASE WHEN regexp_matches(text, '[​‌‍﻿]')
            THEN 1 ELSE 0 END) AS BIGINT) AS n_invisible,
       CAST(sum(CASE WHEN regexp_matches(text,
              '[‪-‮⁦-⁩]')
            THEN 1 ELSE 0 END) AS BIGINT) AS n_bidi
FROM documents
WHERE lang IS NOT NULL AND text IS NOT NULL
GROUP BY lang
"""


QUERIES86: Dict[str, Callable] = {
    "script_mix_docs": q_script_mix_docs,
}

SQL86: Dict[str, str] = {
    "script_mix_docs": SQL_SCRIPT_MIX_DOCS,
}
