"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship validation suite at sf0.001;
``queries()``/``oracle_sql()`` expose each implemented operator with a
DuckDB-checkable ANSI-SQL oracle (see datatest_ray/pipelines/oracle.py).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _ship_library_by_value() -> None:
    """Ray workers may not have this repo on their import path (the
    driver can import this module from anywhere).  Registering the
    package for by-value pickling makes every check class / closure
    self-contained in the task payload."""
    try:
        import datatest_ray  # noqa: F401
        from ray import cloudpickle

        for name, mod in list(sys.modules.items()):
            if name == "datatest_ray" or name.startswith("datatest_ray."):
                if mod is not None:
                    cloudpickle.register_pickle_by_value(mod)
    except Exception:
        pass


_ship_library_by_value()

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship smoke at sf0.001 scale: (a) the full image+caption
    validation suite (schema, intervals, fmt domain, caption regex,
    uniqueness, decode+PSNR+caption parity, drift, phash near-dup) over
    a 1k-row deterministic synthetic fixture, and (b) a validation
    suite over ``/root/testdata/sf0.001`` tables with a referential
    check.  Returns the combined violations Dataset (stable schema:
    VIOLATION_SCHEMA)."""
    import ray.data as rd

    from datatest_ray import (
        CheckSuite,
        DomainCheck,
        IntervalCheck,
        RegexCheck,
        RunContext,
        SchemaCheck,
        SequenceContiguityCheck,
        SubsetCheck,
        UniqueCheck,
    )
    from datatest_ray.pipelines.flagship import run_flagship
    from datatest_ray.sources.images import ImageFixtureSpec, generate_dataset

    # (a) flagship image suite on a seeded synthetic fixture — with the
    # integrity check ON (the fixture plants corrupt payloads) and the
    # sampled-LSH near-dup mode the 100 TB path uses (seeded bit
    # projections -> deterministic), so the smoke exercises the same
    # code the full-scale bench runs, not just the small-data defaults
    spec = ImageFixtureSpec(n_rows=1000, seed=42, rows_per_part=250)
    images = generate_dataset(spec)
    image_violations = run_flagship(
        images, reference_seed=spec.seed, parity_concurrency=2,
        with_integrity=True, near_dup_mode="sampled",
    ).violations

    # (b) TPC-H-ish validation suite over the driver's smoke tables
    lineitem = rd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    nation = rd.read_parquet(f"{SF_SMOKE}/nation.parquet", columns=["n_nationkey"])
    customer = rd.read_parquet(
        f"{SF_SMOKE}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    suite = CheckSuite(
        [
            SchemaCheck({"l_orderkey": int, "l_quantity": float, "l_returnflag": str}),
            IntervalCheck("l_quantity", min=1, max=30),
            IntervalCheck("l_discount", min=0.0, max=0.05),
            DomainCheck("l_returnflag", {"A", "N", "R"}),
            RegexCheck("l_linestatus", r"^[OF]$"),
            UniqueCheck("l_orderkey"),
            SequenceContiguityCheck("l_orderkey", "l_linenumber"),
        ],
        RunContext(),
    )
    violations = suite.run(
        lineitem,
        reader=lambda cols: rd.read_parquet(
            f"{SF_SMOKE}/lineitem.parquet", columns=cols
        ),
    ).violations
    fk = SubsetCheck("c_nationkey", (nation, "n_nationkey")).violations(
        customer, RunContext()
    )
    return image_violations.union(violations).union(fk)


def queries() -> dict[str, Callable[[str], Any]]:
    from datatest_ray.pipelines import oracle

    return oracle.queries()


def oracle_sql() -> dict[str, str]:
    from datatest_ray.pipelines import oracle

    return oracle.oracle_sql()
