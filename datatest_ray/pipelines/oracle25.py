"""Driver-contract queries, batch 25 (see oracle.py for the contract):
the last two acceptance-algebra forms under the DuckDB oracle —
``accepted(Missing)`` (E2, accept a whole difference CLASS) and
``accepted.args`` (E6, predicate over the difference's args).  With
these, every SQL-expressible E-table row (E2, E5, E6, E7, E8, E10,
E11, E12) is oracle-paired; E1/E3 literal-collection quotas and E9
fuzzy stay unit-test-pinned (difflib / instance identity are not
SQL-expressible).  Merged into ``oracle.queries()`` /
``oracle.oracle_sql()``."""

from __future__ import annotations

from typing import Callable, Dict


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def q_accepted_class_missing(sf_dir: str):
    """``accepted(Missing)`` over a two-sided set check on region names
    (E2): the required set plants one never-observed member, the class
    acceptance waives ALL Missing differences — leftover is the Extra
    side only."""
    from ..differences import Missing
    from ..pipelines.acceptance import accepted
    from ..stages.base import RunContext
    from ..stages.global_checks import SetCheck
    from .suite import CheckSuite

    ds = _read(sf_dir, "region", ["r_name"])
    required = {"AFRICA", "AMERICA", "ASIA", "ATLANTIS"}  # no EU/ME
    t = CheckSuite([SetCheck("r_name", required)],
                   RunContext()).run(ds).to_table()
    remaining = accepted(Missing).filter_violations(t)
    return remaining.select(["value", "kind"])


SQL_ACCEPTED_CLASS_MISSING = """
WITH req(v) AS (VALUES ('AFRICA'),('AMERICA'),('ASIA'),('ATLANTIS'))
SELECT DISTINCT r_name AS value, 'extra' AS kind FROM region
WHERE r_name NOT IN (SELECT v FROM req)
"""


def q_accepted_args_regex(sf_dir: str):
    """``accepted.args(<set>)`` over regex violations on the documents
    lang column (E6): lang values that fail ``^(en|de|fr)$`` are
    Invalid diffs whose args carry the value; the args acceptance
    waives one known legacy code — leftover is every other
    violating value (zh rows; nonzero by construction)."""
    from ..pipelines.acceptance import accepted
    from ..stages.base import RunContext
    from ..stages.row_checks import RegexCheck
    from .suite import CheckSuite

    ds = _read(sf_dir, "documents", ["lang"])
    t = CheckSuite([RegexCheck("lang", r"^(en|de|fr)$")],
                   RunContext()).run(ds).to_table()
    remaining = accepted.args({"es"}).filter_violations(t)
    return remaining.select(["value", "kind"])


SQL_ACCEPTED_ARGS_REGEX = """
SELECT lang AS value, 'invalid' AS kind FROM documents
WHERE NOT regexp_matches(lang, '^(en|de|fr)$')
  AND lang NOT IN ('es')
"""


QUERIES25: Dict[str, Callable] = {
    "accepted_class_missing": q_accepted_class_missing,
    "accepted_args_regex": q_accepted_args_regex,
}

SQL25: Dict[str, str] = {
    "accepted_class_missing": SQL_ACCEPTED_CLASS_MISSING,
    "accepted_args_regex": SQL_ACCEPTED_ARGS_REGEX,
}
