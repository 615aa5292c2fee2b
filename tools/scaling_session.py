"""Round-4 SAME-SESSION scaling calibration set.

The round-3 lesson (BENCH/BASELINE.md): the calibration ladder moves
with VM state, so an engine ratio is only honest next to ceilings
measured in the SAME window.  This script measures, back to back:

1. busy-loop processes 2 -> 8 (hardware ceiling, no JVM);
2. a compute-bound Spark job (sha2 chain, no data movement) pinned
   2 -> 8 (the ceiling ANY Spark job can reach on this box);
3. the engine replay pinned 2 -> 8, N interleaved trials each, for BOTH
   shuffle codecs (lz4 = shipped local default, zstd = recommended
   cluster codec with ~half the shuffle bytes/event -- if moving fewer
   bytes helps more at 8 cores than its CPU tax costs at 2, the ratio
   itself improves).

Emits ONE JSON blob to stdout (and out.json); BENCH/BASELINE.md is
hand-merged from it -- this script never overwrites the curated file.

Run with nothing else on the box:  python tools/scaling_session.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVENTS = int(os.environ.get("FETCHEZ_SCALING_EVENTS", 32_000_000))
TRIALS = int(os.environ.get("FETCHEZ_SCALING_TRIALS", 3))
PAIR = tuple(
    int(x) for x in os.environ.get("FETCHEZ_SCALING_PAIR", "2,8").split(",")
)
assert len(PAIR) == 2 and PAIR[1] > PAIR[0]
_SCALE = PAIR[1] / PAIR[0]


def _busy(n_iters: int) -> int:
    x = 0
    for i in range(n_iters):
        x = (x * 1103515245 + 12345 + i) % (2**31)
    return x


def busy_loop_ceiling() -> dict:
    """Pure-python process scaling 2 -> 8: the hardware ceiling."""
    iters = 30_000_000
    out = {}
    for n in PAIR:
        t0 = time.monotonic()
        with mp.Pool(n) as p:
            p.map(_busy, [iters] * n)
        sec = time.monotonic() - t0
        out[n] = (n * iters) / sec
    lo, hi = PAIR
    return {"rate2": out[lo], "rate8": out[hi],
            "pair": list(PAIR), "eff": out[hi] / (_SCALE * out[lo])}


def sha2_ceiling() -> dict:
    """Compute-bound Spark job (no data movement), pinned, 2 -> 8."""
    script = r"""
import sys, time
sys.path.insert(0, %r)
from fetchez_spark.session import get_spark
cores = int(sys.argv[1])
spark = get_spark(app_name=f"sha2-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=2*cores)
spark.range(10_000).selectExpr("sum(id)").collect()  # warm
# 30M rows: the 8-core run must stay >=10s or the measurement is
# overhead-dominated and reads BELOW the engine (the discarded 6M-row
# first attempt measured 0.549 vs 0.850 at 30M -- BENCH/scaling_r4.json)
n = 30_000_000
t0 = time.monotonic()
spark.range(n).selectExpr(
    "sha2(concat(sha2(cast(id as string),256),sha2(cast(id+1 as string),256)),256) h"
).selectExpr("count(distinct substr(h,1,4))").collect()
sec = time.monotonic() - t0
print("RATE", n / sec)
spark.stop()
""" % REPO
    rates = {}
    for n in PAIR:
        r = subprocess.run(
            ["taskset", "-c", f"0-{n - 1}", sys.executable, "-c", script, str(n)],
            capture_output=True, text=True, check=True,
        )
        rates[n] = float([l for l in r.stdout.splitlines() if l.startswith("RATE")][0].split()[1])
        time.sleep(10)
    lo, hi = PAIR
    return {"rate2": rates[lo], "rate8": rates[hi],
            "pair": list(PAIR), "eff": rates[hi] / (_SCALE * rates[lo])}


def engine_runs(log_dir: str) -> dict:
    from bench import run_bench  # noqa: F401 (env-driven subprocess instead)

    results: dict[str, dict[int, list[float]]] = {}
    for trial in range(TRIALS):
        for codec in ("lz4", "zstd"):
            ordered = PAIR if trial % 2 == 0 else tuple(reversed(PAIR))
            for cores in ordered:
                out = f"/dev/shm/scaling-{codec}-{cores}-{trial}.json"
                env = dict(
                    os.environ,
                    FETCHEZ_BENCH_EVENTS=str(EVENTS),
                    FETCHEZ_BENCH_BATCHES="4",
                    FETCHEZ_SKIP_QUERIES="1",
                    FETCHEZ_IO_CODEC=codec,
                )
                cmd = [
                    "taskset", "-c", f"0-{cores - 1}",
                    sys.executable, os.path.join(REPO, "bench.py"),
                    "--single", str(cores), log_dir, out,
                ]
                subprocess.run(cmd, check=True, env=env,
                               stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
                with open(out) as f:
                    rate = json.load(f)["value"]
                results.setdefault(codec, {}).setdefault(cores, []).append(rate)
                print(f"  engine {codec} local[{cores}] trial {trial}: {rate:,.0f} ev/s",
                      flush=True)
                time.sleep(30)
    summary = {}
    for codec, by_cores in results.items():
        m2 = statistics.median(by_cores[2])
        m8 = statistics.median(by_cores[8])
        summary[codec] = {
            "rate2": m2, "rate8": m8, "eff": m8 / (4 * m2),
            "trials2": by_cores[2], "trials8": by_cores[8],
        }
    return summary


def main() -> None:
    import shutil
    import tempfile

    print("1/3 busy-loop ceiling...", flush=True)
    busy = busy_loop_ceiling()
    print(f"  busy-loop eff {busy['eff']:.3f}", flush=True)
    print("2/3 compute-bound Spark ceiling...", flush=True)
    sha2 = sha2_ceiling()
    print(f"  any-Spark eff {sha2['eff']:.3f}", flush=True)
    print("3/3 engine trials...", flush=True)
    shared = tempfile.mkdtemp(prefix="fz-scaling-", dir="/dev/shm")
    try:
        from bench import _write_log

        _write_log(EVENTS, os.path.join(shared, "log"), chunks=128)
        engine = engine_runs(os.path.join(shared, "log"))
    finally:
        shutil.rmtree(shared, ignore_errors=True)
    blob = {
        "events": EVENTS,
        "trials": TRIALS,
        "busy_loop": busy,
        "spark_ceiling": sha2,
        "engine": engine,
        "normalized": {
            c: engine[c]["eff"] / sha2["eff"] for c in engine
        },
    }
    with open(os.path.join(REPO, "BENCH", "scaling_r4.json"), "w") as f:
        json.dump(blob, f, indent=2)
    print(json.dumps(blob, indent=2))


if __name__ == "__main__":
    main()
