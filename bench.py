"""Benchmark entry (driver contract; see BASELINE.md).

Prints ONE JSON line:
    {"metric": "flagship validation suite wall time", "value": <sec>,
     "unit": "sec", "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "images_per_sec": ..., "n_images": ...}

``--scaling``: runs the flagship pipeline in two fresh processes at
num_cpus=8 and num_cpus=32 on the SAME input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the
north_rule's N vs 4N cluster criterion — BASELINE.md protocol).

Round-3 reliability redesign: ``python bench.py`` is now a pure
ORCHESTRATOR with no Ray session of its own.  The flagship trials and
the 490-query sweep each run in FRESH SUBPROCESSES — the sweep in
chunks of ~32 queries, each chunk owning its own ``ray.init`` /
``ray.shutdown`` — because round 2's single-session 491-query sweep
crashed inside Ray core (raylet TaskManager, BENCH_r02.json) after
hours of accumulated plan/object-store state.  Chunk results land in
``/tmp/graft_bench/<digest>/chunk_*.json`` and are RESUMABLE: a rerun
within the freshness window skips completed chunks, so a mid-sweep
kill costs only the chunk in flight.  A chunk that fails twice is
retried query-by-query in single-query subprocesses; a query that
still fails is recorded as -1.0 rather than sinking the whole bench.

The flagship input is the deterministic synthetic image+caption fixture
(FIXTURES.md §F1) materialized once under /tmp and reused; TPC-H-ish
oracle queries run over $GRAFT_SF_DIR.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# per-chunk thread concurrency: round 2 ran 4-way inside one session and
# heavy/iterative queries serialized badly against peers (q21 106.9 s vs
# 13.3 s isolated); 2-way in a fresh session is the measured sweet spot
QUERY_CONCURRENCY = int(os.environ.get("GRAFT_QUERY_CONCURRENCY", "2"))
CHUNK_SIZE = int(os.environ.get("GRAFT_CHUNK_SIZE", "32"))
CHUNK_TIMEOUT = int(os.environ.get("GRAFT_CHUNK_TIMEOUT", "1800"))
SINGLE_TIMEOUT = int(os.environ.get("GRAFT_SINGLE_TIMEOUT", "600"))
# resumed chunk results older than this are stale (a new driver round
# must re-measure, but a kill+rerun within a session resumes)
RESUME_MAX_AGE_SEC = int(os.environ.get("GRAFT_RESUME_MAX_AGE", str(12 * 3600)))
FIXTURE_ROOT = os.environ.get("GRAFT_FIXTURE_DIR", "/tmp/graft_fixture")
BENCH_TMP = os.environ.get("GRAFT_BENCH_TMP", "/tmp/graft_bench")

# queries >=25 s under round-2's concurrent sweep (bench_r2_full_session8):
# iterative (per-round materialize) or large-shuffle plans that contend
# badly with peers.  They run in dedicated chunks at concurrency 1.
HEAVY_QUERIES = {
    "q21_late_supplier", "er_part_clusters", "q3_top_unshipped",
    "pagerank_custsupp", "q18_big_orders", "q10_returned_revenue",
    "levene_value_types", "q15_top_supplier", "ann_recall_report",
    "q13_order_count_dist", "assortativity_supp_part", "bpe_train_docs",
    "knn_purity_embeddings", "cc_clusters_minhash", "kmeans_embeddings",
    "q20_part_promo", "q2_min_cost_supp", "q9_product_profit",
    "q7_nation_volume", "q5_local_supplier", "q8_market_share",
    "dedup_minhash_join", "sim_neardup_cosine", "q17_small_qty_revenue",
}
HEAVY_CONCURRENCY = 1
HEAVY_CHUNK_SIZE = 8


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _fixture_path(sf: float) -> str:
    return os.path.join(FIXTURE_ROOT, f"sf{sf}")


FIXTURE_DIMS = dict(dim_mu=4.0, dim_sigma=0.35, dim_lo=16, dim_hi=160)
DRIFT_BINS = dict(dim_hi=160, bytes_hi=32768)


def _pin_fsspec_stub() -> None:
    """Ray's read-path probe retries `from fsspec.implementations.http
    import HTTPFileSystem` on EVERY read_parquet and only catches
    ModuleNotFoundError (aiohttp absent here).  Concurrent pool threads
    race that always-failing import: one thread sees the
    half-initialized module and gets a plain ImportError that Ray does
    NOT catch.  Pin a stub module once so the probe resolves
    deterministically to the same False answer."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        import types

        _stub = types.ModuleType("fsspec.implementations.http")

        class _NeverHTTPFileSystem:  # isinstance target only
            pass

        _stub.HTTPFileSystem = _NeverHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = _stub


def ensure_fixture(sf: float) -> tuple[str, int]:
    """Bench fixture: realistic image sizes (16..160 px, median ~55) so
    decode work dominates as in the north-star workload; 10M x sf rows
    (1M images at the default sf0.1) so the run is compute-bound and the
    N-vs-4N scaling criterion measures the engine, not fixed setup."""
    from datatest_ray.sources.images import ImageFixtureSpec, materialize_fixture

    n_rows = max(1000, int(10_000_000 * sf))
    spec = ImageFixtureSpec(n_rows=n_rows, seed=42,
                            rows_per_part=max(1000, n_rows // 128),
                            **FIXTURE_DIMS)
    path = materialize_fixture(_fixture_path(sf) + "_d160", spec)
    return path, n_rows


def run_flagship_bench(sf: float) -> dict:
    import ray.data as rd

    from datatest_ray.pipelines.flagship import run_flagship

    path, n_rows = ensure_fixture(sf)
    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    # warm the page cache (measure compute+shuffle, not first disk read)
    rd.read_parquet(files).count()
    t0 = time.time()
    ds = rd.read_parquet(files)
    # fixed-size actor pool: autoscaling (lo, hi) pools waste the warmup
    # ramp on a finite run; decode is the critical path so it gets
    # NCPU/2 actors and the light fused/shuffle stages share the rest.
    # shuffle_partitions=NCPU keeps every all-to-all at a P x P task
    # matrix proportional to the cluster.  reader= gives every branch a
    # READ-LEVEL column-pruned scan (select_columns does not push into
    # the parquet read), so only the parity/drift branches pay for the
    # wide bytes column.
    result = run_flagship(ds, reference_seed=42,
                          parity_concurrency=max(2, NCPU - max(2, NCPU // 8)),
                          parity_batch_size=512,
                          shuffle_partitions=NCPU,
                          near_dup_mode="sampled",
                          reader=lambda cols: rd.read_parquet(files, columns=cols),
                          **DRIFT_BINS)
    n_violations = result.to_table().num_rows
    wall = time.time() - t0
    return {
        "flagship_sec": wall,
        "images_per_sec": n_rows / wall,
        "n_images": n_rows,
        "n_violations": n_violations,
    }


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {}
        # memory-boundedness evidence knob: cap the plasma store (e.g.
        # GRAFT_OBJECT_STORE_GB=4 for the 10x-scale run) to prove the
        # streaming executor's backpressure — peak usage is then
        # budget-bounded, not data-bounded, and the run must still
        # complete (spilling is fine; dying is not)
        cap_gb = os.environ.get("GRAFT_OBJECT_STORE_GB")
        if cap_gb:
            kwargs["object_store_memory"] = int(float(cap_gb) * (1 << 30))
        ray.init(
            address="local",
            num_cpus=NCPU,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            # keep raylet/worker chatter out of stdout: the driver
            # parses this process's output for the ONE json line
            log_to_driver=False,
            **kwargs,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def flagship_once() -> None:
    """Single flagship trial in THIS process (fresh Ray session);
    prints one JSON line.  Invoked as a subprocess by the orchestrator
    and by ``--scaling``."""
    import threading

    import ray

    _pin_fsspec_stub()
    _init_ray()
    sf = _sf_of(SF_DIR)
    # sample driver RSS + object-store usage while the suite streams:
    # the memory-boundedness evidence for the 10x-scale run (the peaks
    # must stay ~flat vs the 1x run if nothing materializes the payload)
    peak = {"rss": 0.0, "store": 0.0}
    stop = threading.Event()

    def sample() -> None:
        while not stop.is_set():
            rss, store = _mem_probe()
            peak["rss"] = max(peak["rss"], rss)
            peak["store"] = max(peak["store"], store)
            stop.wait(0.5)

    t = threading.Thread(target=sample, daemon=True)
    t.start()
    r = run_flagship_bench(sf)
    stop.set()
    t.join(timeout=5)
    print(json.dumps({
        "metric": "flagship image validation suite wall time",
        "value": round(r["flagship_sec"], 3),
        "unit": "sec",
        "sf": sf,
        "num_cpus": NCPU,
        "images_per_sec": round(r["images_per_sec"], 1),
        "n_images": r["n_images"],
        "n_violations": r["n_violations"],
        "peak_rss_mb": round(peak["rss"], 1),
        "peak_object_store_mb": round(peak["store"], 1),
    }))
    ray.shutdown()


def _mem_probe() -> tuple[float, float]:
    """(driver peak RSS MB, object-store bytes currently used MB).
    Cheap enough to sample per query; maxima go into the bench JSON so
    a memory regression is visible before it becomes a raylet crash."""
    import resource

    import ray

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    try:
        total = ray.cluster_resources().get("object_store_memory", 0.0)
        avail = ray.available_resources().get("object_store_memory", 0.0)
        store_mb = (total - avail) / (1024 * 1024)
    except Exception:
        store_mb = 0.0
    return rss_mb, store_mb


def run_chunk(names_file: str, out_file: str, concurrency: int) -> None:
    """Subprocess worker: run the named queries in a fresh Ray session,
    write {name: sec, ... "_mem": {...}} JSON atomically to
    ``out_file``."""
    import gc
    from concurrent.futures import ThreadPoolExecutor

    import ray

    _pin_fsspec_stub()
    _init_ray()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    with open(names_file) as f:
        names = json.load(f)
    qmap = entrymod.queries()

    def one(name):
        fn = qmap[name]
        t0 = time.time()
        res = fn(SF_DIR)
        if isinstance(res, ray.data.Dataset):
            res.count()
        sec = round(time.time() - t0, 3)
        # release object-store refs before the next query's plan runs
        del res
        gc.collect()
        rss, store = _mem_probe()
        return name, sec, rss, store

    # collect (rss, store) per query and reduce AFTER the pool drains —
    # a shared read-modify-write max from multiple pool threads can
    # lose samples and understate the reported peaks
    results = {}
    samples = []
    with ThreadPoolExecutor(max_workers=max(1, concurrency)) as ex:
        for name, sec, rss, store in ex.map(one, names):
            results[name] = sec
            samples.append((rss, store))
    results["_mem"] = {
        "peak_rss_mb": round(max(s[0] for s in samples), 1) if samples else 0.0,
        "peak_object_store_mb":
            round(max(s[1] for s in samples), 1) if samples else 0.0,
    }
    tmp = out_file + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f)
    os.replace(tmp, out_file)
    ray.shutdown()


def _chunk_worker(names: list[str], out_file: str, concurrency: int,
                  timeout: int) -> dict | None:
    """Run one chunk subprocess; return parsed results or None."""
    names_file = out_file + ".names"
    with open(names_file, "w") as f:
        json.dump(names, f)
    cmd = [sys.executable, os.path.abspath(__file__), "--chunk",
           names_file, out_file, str(concurrency)]
    try:
        subprocess.run(cmd, timeout=timeout, capture_output=True,
                       cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return None
    try:
        with open(out_file) as f:
            got = json.load(f)
        if {k for k in got if not k.startswith("_")} == set(names):
            return got
    except (OSError, ValueError):
        pass
    return None


def run_query_bench() -> dict:
    """Time every queries() entry at $GRAFT_SF_DIR in chunked fresh
    subprocesses (see module docstring).  Per-query seconds measure
    latency under ``query_concurrency`` threads within a fresh
    session — an operator smoke-latency sweep, not the headline metric
    (that is the flagship wall / images_per_sec)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    all_names = sorted(entrymod.queries().keys())
    light = [n for n in all_names if n not in HEAVY_QUERIES]
    heavy = [n for n in all_names if n in HEAVY_QUERIES]

    chunks: list[tuple[list[str], int]] = []
    for i in range(0, len(light), CHUNK_SIZE):
        chunks.append((light[i:i + CHUNK_SIZE], QUERY_CONCURRENCY))
    for i in range(0, len(heavy), HEAVY_CHUNK_SIZE):
        chunks.append((heavy[i:i + HEAVY_CHUNK_SIZE], HEAVY_CONCURRENCY))

    # resume dir keyed by (query set, sf, ncpu): a changed query list or
    # config invalidates; a kill+rerun within the freshness window skips
    # completed chunks
    digest = hashlib.sha1(json.dumps(
        [all_names, SF_DIR, NCPU, QUERY_CONCURRENCY, CHUNK_SIZE]
    ).encode()).hexdigest()[:12]
    run_dir = os.path.join(BENCH_TMP, f"sweep_{digest}")
    os.makedirs(run_dir, exist_ok=True)

    merged: dict[str, float] = {}
    mem = {"peak_rss_mb": 0.0, "peak_object_store_mb": 0.0}

    def fold(got: dict) -> None:
        m = got.pop("_mem", None) if isinstance(got, dict) else None
        if m:
            for k in mem:
                mem[k] = max(mem[k], m.get(k, 0.0))
        merged.update(got)

    now = time.time()
    for idx, (names, conc) in enumerate(chunks):
        out_file = os.path.join(run_dir, f"chunk_{idx:03d}.json")
        if os.path.exists(out_file) and now - os.path.getmtime(out_file) < RESUME_MAX_AGE_SEC:
            try:
                with open(out_file) as f:
                    got = json.load(f)
                if {k for k in got if not k.startswith("_")} == set(names):
                    fold(got)
                    continue
            except (OSError, ValueError):
                pass
        got = None
        for _attempt in range(2):
            got = _chunk_worker(names, out_file, conc, CHUNK_TIMEOUT)
            if got is not None:
                break
        if got is None:
            # chunk failed twice: isolate per query so one bad query
            # cannot sink the sweep
            got = {}
            for name in names:
                single_out = os.path.join(run_dir, f"single_{name}.json")
                res = _chunk_worker([name], single_out, 1, SINGLE_TIMEOUT)
                got[name] = res[name] if res else -1.0
            with open(out_file + ".tmp", "w") as f:
                json.dump(got, f)
            os.replace(out_file + ".tmp", out_file)
        fold(dict(got))
    merged["_mem"] = mem
    return merged


def _subprocess_json(env_extra: dict, timeout: int = 3600,
                     args: list[str] | None = None) -> dict | None:
    env = dict(os.environ, **env_extra)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + (args or []),
            env=env, capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        return None


def main() -> None:
    """Orchestrator: no Ray session here.  Flagship trials and the
    query sweep each run in fresh subprocesses."""
    sf = _sf_of(SF_DIR)
    # best-of-2 flagship trials: identical runs on this shared-host VM
    # span 36-85 s purely from host noise (BASELINE.md), so a single
    # trial measures the neighbor; both trials are reported
    trials = []
    want = 1 if os.environ.get("GRAFT_FLAGSHIP_ONLY") else 2
    attempts = 0
    while len(trials) < want and attempts < want + 2:
        attempts += 1
        r = _subprocess_json({"GRAFT_FLAGSHIP_ONLY": "1"},
                             args=["--flagship-once"])
        if r is not None:
            trials.append(r)
    if not trials:
        raise RuntimeError("flagship bench failed in all subprocess trials")
    flagship = max(trials, key=lambda r: r["images_per_sec"])
    # scaling trials skip the per-query sweep (it times operators, not
    # the flagship throughput the efficiency criterion measures)
    queries = {} if os.environ.get("GRAFT_FLAGSHIP_ONLY") else run_query_bench()
    mem = queries.pop("_mem", {}) if isinstance(queries, dict) else {}
    payload = {
        "metric": "flagship image validation suite wall time",
        "value": flagship["value"],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NCPU,
        "images_per_sec": flagship["images_per_sec"],
        "n_images": flagship["n_images"],
        "n_violations": flagship["n_violations"],
        "flagship_trials_sec": [t["value"] for t in trials],
        "query_concurrency": QUERY_CONCURRENCY,
        "peak_rss_mb": mem.get("peak_rss_mb"),
        "peak_object_store_mb": mem.get("peak_object_store_mb"),
        "sweep_protocol": (
            f"chunked fresh subprocesses: {CHUNK_SIZE}/chunk at "
            f"concurrency {QUERY_CONCURRENCY}, heavy queries "
            f"{HEAVY_CHUNK_SIZE}/chunk serial, resumable"
        ),
    }
    print(json.dumps(payload))


def scaling() -> None:
    """North-rule scaling evidence: same input, fresh processes at 8 and
    32 CPUs; efficiency = throughput_32 / (4 * throughput_8).

    Best-of-N trials per CPU count (default 3, ``--trials N``): this
    sandbox is a shared-host VM whose run-to-run wall time for the
    IDENTICAL 32-CPU job spans 36-85 s (measured; host-level noise
    invisible to the guest), so a single trial measures the neighbor,
    not the engine.  All trials are reported alongside the best."""
    # make sure the fixture exists before timing anything
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    ensure_fixture(_sf_of(SF_DIR))
    ray.shutdown()

    trials = 3
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    # N and 4N are configurable (north_rule says "N and 4N nodes", e.g.
    # 4->16): at 16 procs this box's memory-bandwidth ceiling bites far
    # less than at 32, so a low-N run isolates ENGINE scaling from the
    # shared-host hardware ceiling documented in BASELINE.md
    lo_n = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi_n = 4 * lo_n

    def run(ncpu: int) -> dict:
        r = _subprocess_json(
            {"RAY_GRAFT_CPUS": str(ncpu), "GRAFT_FLAGSHIP_ONLY": "1"},
            args=["--flagship-once"])
        if r is None:
            raise RuntimeError(f"scaling trial at {ncpu} cpus failed")
        return r

    # interleave 8/32 trials so both CPU counts sample the SAME noise
    # windows (host noise is time-correlated; all-8-then-all-32 can hand
    # one side a calm window and the other a storm)
    lo_runs, hi_runs = [], []
    for _ in range(trials):
        lo_runs.append(run(lo_n))
        hi_runs.append(run(hi_n))
    lo = max(lo_runs, key=lambda r: r["images_per_sec"])
    hi = max(hi_runs, key=lambda r: r["images_per_sec"])
    tp_lo = lo["images_per_sec"]
    tp_hi = hi["images_per_sec"]
    eff = tp_hi / (4.0 * tp_lo)
    print(json.dumps({
        "n_cpus_lo": lo_n,
        "n_cpus_hi": hi_n,
        f"sec_{lo_n}": lo["value"],
        f"sec_{hi_n}": hi["value"],
        f"images_per_sec_{lo_n}": tp_lo,
        f"images_per_sec_{hi_n}": tp_hi,
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
        "n_images": lo["n_images"],
        "protocol": f"best of {trials} fresh-process trials per CPU count",
        f"trials_{lo_n}": [r["images_per_sec"] for r in lo_runs],
        f"trials_{hi_n}": [r["images_per_sec"] for r in hi_runs],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--chunk" in sys.argv:
        i = sys.argv.index("--chunk")
        run_chunk(sys.argv[i + 1], sys.argv[i + 2], int(sys.argv[i + 3]))
    elif "--flagship-once" in sys.argv:
        flagship_once()
    else:
        main()
