"""No-Ray hardware-ceiling control for the scaling criterion.

The north rule's >=0.8 efficiency criterion assumes N -> 4N NODES (each
node brings its own memory bandwidth).  The sandbox scales 8 -> 32
worker processes on ONE box, so the per-core rate degrades under full
load (shared memory bandwidth / frequency scaling) no matter what
framework runs on top.  This control measures that ceiling with ZERO
engine code in the loop: independent multiprocessing workers doing the
same zlib+numpy decode/PSNR/phash arithmetic the flagship's parity
stage does, no Ray, no object store, no shuffles.

    python BENCH/control_ceiling.py          # writes BENCH/control_r2.json

Efficiency here = img/s(32 procs) / (4 x img/s(8 procs)) is the number
the ENGINE's measured efficiency should be compared against on this
machine (BASELINE.md "hardware ceiling note").
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES_PER_TASK = 400
TASKS_PER_PROC = 24


def _one_task(seed: int) -> int:
    """Decode + reference-compare a deterministic image batch — the same
    pure zlib+numpy work ImageParityChecker does, sans any Ray."""
    import numpy as np

    from datatest_ray.functions.png import png_decode, psnr
    from datatest_ray.sources.images import ImageFixtureSpec, generate_batch

    spec = ImageFixtureSpec(n_rows=N_IMAGES_PER_TASK,
                            rows_per_part=N_IMAGES_PER_TASK, seed=42,
                            dim_mu=4.0, dim_sigma=0.35, dim_lo=16, dim_hi=160)
    batch = generate_batch(
        np.arange(seed * N_IMAGES_PER_TASK, (seed + 1) * N_IMAGES_PER_TASK),
        spec,
    )
    n_bad = 0
    ref = None
    for payload in batch.column("bytes").to_pylist():
        if payload is None:
            n_bad += 1
            continue
        try:
            img = png_decode(payload)
        except Exception:
            n_bad += 1
            continue
        if ref is None or ref.shape != img.shape:
            ref = img.astype(np.float64)
        if psnr(img.astype(np.float64), ref) < 40.0:
            n_bad += 1
    return n_bad


def measure(n_procs: int) -> dict:
    n_tasks = n_procs * TASKS_PER_PROC
    with mp.Pool(n_procs) as pool:
        pool.map(_one_task, range(2))  # warm imports in the pool
        t0 = time.time()
        pool.map(_one_task, range(100, 100 + n_tasks))
        wall = time.time() - t0
    n_images = n_tasks * N_IMAGES_PER_TASK
    return {
        "n_procs": n_procs,
        "wall_s": round(wall, 3),
        "images": n_images,
        "images_per_sec": round(n_images / wall, 1),
    }


def main() -> None:
    # probe the same N/4N pair bench.py --scaling uses
    lo_n = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    lo = measure(lo_n)
    hi = measure(4 * lo_n)
    eff = hi["images_per_sec"] / (4.0 * lo["images_per_sec"])
    out = {
        "control": "no-Ray mp.Pool zlib+numpy decode/PSNR loop",
        f"run_{lo_n}": lo,
        f"run_{4 * lo_n}": hi,
        "hardware_ceiling_efficiency": round(eff, 3),
        "note": (
            "upper bound for ANY 8->32-proc scaling on this one box; "
            "compare the engine's bench.py --scaling efficiency to this, "
            "not to the multi-node 0.8 criterion directly"
        ),
    }
    suffix = "" if lo_n == 8 else f"_{lo_n}x4"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"control_r2{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
