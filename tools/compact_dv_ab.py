"""A/B: full-bucket fold vs live-fraction-aware fold (VERDICT r4 #6).

The r4 flat-append layout's 28.7 shuffle B/event is dominated by the
periodic compaction fold, which moves every base byte of every selected
bucket through one Exchange.  ``compact(min_dead_fraction=t)`` is the
deletion-vector/anti-join alternative: base files whose estimated dead
fraction stays below ``t`` are kept verbatim — their bytes never enter
the fold — at the price of (a) one column-pruned key join per fold (the
estimate) and (b) multi-version buckets whose reads keep the LWW fold
active.  Whether that trades PROFITABLY is workload-dependent (update
ratio, keyspace size vs event count), so: measure, don't guess.

Protocol: same 8-core pinned window, flat layout, zstd shuffle, the
bench's own replay (merges + periodic folds inside the timed window),
interleaved trials, median-of-N.  Emits BENCH/compact_dv_ab.json;
BENCH/BASELINE.md is hand-merged.

Run with nothing else on the box:  python tools/compact_dv_ab.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVENTS = int(os.environ.get("FETCHEZ_DV_EVENTS", 16_000_000))
TRIALS = int(os.environ.get("FETCHEZ_DV_TRIALS", 3))
CORES = int(os.environ.get("FETCHEZ_DV_CORES", 8))

CONFIGS = {
    "full_fold": {},
    "dv_0.5": {"FETCHEZ_DV_FRACTION": "0.5"},
    "dv_0.9": {"FETCHEZ_DV_FRACTION": "0.9"},
}


def main() -> None:
    shared = tempfile.mkdtemp(prefix="fz-dvab-", dir="/dev/shm")
    results: dict[str, list[float]] = {}
    shuffles: dict[str, dict] = {}
    rows: dict[str, int] = {}
    try:
        from bench import _write_log

        _write_log(EVENTS, os.path.join(shared, "log"), chunks=128)
        for trial in range(TRIALS):
            order = list(CONFIGS) if trial % 2 == 0 else list(reversed(CONFIGS))
            for cfg in order:
                out = f"/dev/shm/dvab-{cfg}-{trial}.json"
                env = dict(
                    os.environ,
                    FETCHEZ_BENCH_EVENTS=str(EVENTS),
                    FETCHEZ_BENCH_BATCHES="8",  # more folds in-window:
                    # the fold policy is exactly what differs
                    FETCHEZ_SKIP_QUERIES="1",
                    FETCHEZ_IO_CODEC="zstd",
                    **CONFIGS[cfg],
                )
                cmd = [
                    "taskset", "-c", f"0-{CORES - 1}",
                    sys.executable, os.path.join(REPO, "bench.py"),
                    "--single", str(CORES), os.path.join(shared, "log"), out,
                ]
                subprocess.run(cmd, check=True, env=env,
                               stdout=subprocess.DEVNULL,
                               stderr=subprocess.DEVNULL)
                with open(out) as f:
                    blob = json.load(f)
                results.setdefault(cfg, []).append(blob["value"])
                shuffles[cfg] = blob.get("shuffle", {})
                rows[cfg] = blob.get("final_rows", -1)
                print(
                    f"  {cfg} trial {trial}: {blob['value']:,.0f} ev/s, "
                    f"{blob.get('shuffle', {}).get('shuffle_write_bytes_per_event')} B/event",
                    flush=True,
                )
                time.sleep(20)
    finally:
        shutil.rmtree(shared, ignore_errors=True)
    assert len(set(rows.values())) <= 1, f"final state diverged: {rows}"
    blob = {
        "events": EVENTS,
        "trials": TRIALS,
        "cores": CORES,
        "batches": 8,
        "io_codec": "zstd",
        "final_rows": rows,
        "configs": {
            cfg: {
                "rate_median": statistics.median(v),
                "trials": v,
                "shuffle": shuffles[cfg],
            }
            for cfg, v in results.items()
        },
    }
    with open(os.path.join(REPO, "BENCH", "compact_dv_ab.json"), "w") as f:
        json.dump(blob, f, indent=2)
    print(json.dumps(blob, indent=2))


if __name__ == "__main__":
    main()
