"""datatest_ray — a Ray-Data-native schema + constraint validation engine.

Brand-new engine with the query/validation capabilities of the reference
``Dev4Data/datatest`` (a fork of public shawnbrown/datatest 0.11.1; the
mounted reference tree was empty at survey time — SURVEY.md §0), re-built
from scratch on ``ray.data.Dataset`` streaming pipelines:

* every element-wise requirement is a vectorized Arrow kernel fused into
  ONE ``map_batches`` pass (stages/row_checks.py);
* uniqueness / set / referential checks pre-aggregate per batch, then do
  ONE hash shuffle over distinct values (stages/global_checks.py);
* distribution drift, sketches (HLL / CMS / MinHash / t-digest) and the
  image stages live in stages/ + functions/;
* verdicts + violations checkpoint per partition for resume (state/).

Public surface::

    from datatest_ray import (
        validate, valid, accepted, ValidationError,
        Missing, Extra, Invalid, Deviation, Predicate,
        CheckSuite, RunContext,
    )
"""

from .differences import (  # noqa: F401
    BaseDifference,
    Deviation,
    Extra,
    Invalid,
    Missing,
    NOVALUE,
    ValidationError,
    VIOLATION_SCHEMA,
    differences_from_table,
    empty_violations,
    violations_table,
)
from .predicate import Predicate, TuplePredicate, get_predicate  # noqa: F401
from .stages.base import Check, RunContext, StatelessCheck  # noqa: F401
from .stages.row_checks import (  # noqa: F401
    ApproxCheck,
    DomainCheck,
    FuzzyCheck,
    IntervalCheck,
    PredicateCheck,
    RegexCheck,
    SchemaCheck,
    TupleCheck,
)
from .stages.global_checks import (  # noqa: F401
    CompletenessCheck,
    GroupSizeCheck,
    RareCategoryCheck,
    SetCheck,
    SubsetCheck,
    SupersetCheck,
    UniqueCheck,
)
from .stages.temporal import (  # noqa: F401
    FreshnessCheck,
    MonotonicCheck,
    SequenceContiguityCheck,
)
from .pipelines.spec import (  # noqa: F401
    dump_suite,
    load_suite,
    suite_from_spec,
    suite_to_spec,
)
from .stages.compare import (  # noqa: F401
    JoinConsistencyCheck,
    TableCompareCheck,
    checksum_reconcile,
    compare_tables,
)
from .stages.mapping import GroupAggCheck  # noqa: F401
from .stages.order import OrderCheck  # noqa: F401
from .stages.window import (  # noqa: F401
    grouped_concat,
    grouped_corr,
    grouped_topk,
    tumbling_window,
)
from .stages.joins import asof_join_latest  # noqa: F401
from .stages.sessions import sessionize  # noqa: F401
from .stages.profile import profile_columns  # noqa: F401
from .stages.sampling import (  # noqa: F401
    hash_sample,
    stratified_hash_sample,
)
from .stages.winfunc import cume_dist, lag_diff, rolling_agg  # noqa: F401
from .stages.relational import (  # noqa: F401
    anti_join,
    bloom_anti_join,
    bloom_semi_join,
    broadcast_join,
    except_distinct,
    intersect_distinct,
    melt,
    pivot_counts,
    rollup_counts,
    semi_join,
)
from .stages.profile import fd_profile, kmv_overlap  # noqa: F401
from .stages.temporal import acf_daily  # noqa: F401
from .stages.salting import (  # noqa: F401
    add_salt_column,
    salted_distinct_count,
    salted_group_map,
)
from .stages.transforms import (  # noqa: F401
    CodecSupportCheck,
    extract_audio_features,
    extract_image_features,
    resize_images,
    sample_frames,
)
from .functions.png import UnsupportedCodecError  # noqa: F401
from .stages import basket, dedup, robust, seq, similarity, text  # noqa: F401
from .stages.imaging import (  # noqa: F401
    ImageIntegrityCheck,
    ImageParityCheck,
    PhashNearDupCheck,
)
from .pipelines.corpus import corpus_prep  # noqa: F401
from .pipelines.suite import CheckSuite, ValidationResult  # noqa: F401
from .pipelines.validate import valid, validate  # noqa: F401
from .pipelines.acceptance import accepted  # noqa: F401
from .integrations import (  # noqa: F401
    compare_datasets,
    register_accessors,
    working_directory,
)
from .case import DataTestCase  # noqa: F401


def _ensure_worker_shipping() -> None:
    """Register this package for cloudpickle by-value pickling so Ray
    workers that do NOT have the repo on their import path (any driver
    script run from a foreign cwd) can still deserialize our check
    classes / closures — the task payload carries the code itself.

    Ray's bundled cloudpickle resolves by-value registration through
    parent packages (``_is_registered_pickle_by_value`` walks name
    prefixes), so registering the top-level package here covers every
    submodule, including ones imported after this call.  Idempotent
    (module-name set membership); failure degrades to the normal
    by-reference path, which still works whenever workers share the
    driver's sys.path — but it WARNS instead of degrading silently.

    Opt out with ``DATATEST_RAY_SHIP_BY_VALUE=0`` (restores plain
    by-reference shipping: smaller task payloads and stable class
    identity when every worker already has the repo on sys.path, e.g.
    an installed wheel on a real cluster)."""
    import os as _os

    if _os.environ.get("DATATEST_RAY_SHIP_BY_VALUE", "1") in (
            "0", "false", "no"):
        return
    try:
        import sys as _sys

        from ray import cloudpickle as _cloudpickle

        _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
    except Exception as exc:
        import warnings as _warnings

        _warnings.warn(
            f"datatest_ray: cloudpickle by-value registration failed "
            f"({type(exc).__name__}: {exc}); falling back to by-reference "
            f"shipping — workers must have the package on sys.path",
            RuntimeWarning,
            stacklevel=2,
        )


_ensure_worker_shipping()

__version__ = "0.1.0"
