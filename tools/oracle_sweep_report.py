"""Full oracle sweep report (round-2 verdict item 8): run EVERY
``queries()`` entry at sf0.001 (or ``--sf-dir``) against its
``oracle_sql()`` DuckDB mirror with the driver-style canonicalization,
and write a committed JSON report (default ``FULLSWEEP_r3.json``).

With ~460 paired queries, the driver's 50-query sample can hide a 1%
defect rate; this is the once-per-round full-population check.

Usage:  python tools/oracle_sweep_report.py [--sf-dir D] [--out F]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    sf_dir = "/root/testdata/sf0.001"
    out = os.path.join(REPO, "FULLSWEEP_r3.json")
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pandas as pd

    from test_oracle import _canon, _duck, _to_pandas

    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = _duck(sf_dir)
    t_start = time.time()
    report = {}
    n_pass = n_fail = n_rows_only = 0
    for name, fn in q.items():
        t0 = time.time()
        try:
            got = _canon(_to_pandas(fn(sf_dir)))
            if name not in o:
                report[name] = {"status": "rows_only", "rows": len(got)}
                n_rows_only += 1
                continue
            want = _canon(con.sql(o[name]).df())
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False, rtol=1e-6
            )
            report[name] = {"status": "pass", "rows": len(got),
                            "sec": round(time.time() - t0, 2)}
            n_pass += 1
        except Exception as err:  # mismatch or crash — record, keep going
            report[name] = {"status": "FAIL",
                            "err": str(err)[:500]}
            n_fail += 1
            print(f"FAIL {name}: {str(err)[:200]}")
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(q),
        "n_paired": len([n for n in q if n in o]),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "n_rows_only": n_rows_only,
        "wall_sec": round(time.time() - t_start, 1),
    }
    with open(out, "w") as f:
        json.dump({"summary": summary, "queries": report}, f, indent=1)
    print(json.dumps(summary))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
