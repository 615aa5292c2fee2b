"""Deterministic synthetic change-log generator (no wall-clock, seeded).

Produces a binlog/WAL-style stream of insert/update/delete events over
multi-turn conversation transcripts, per FIXTURES.md section 2:

* configurable event count; op mix ~ 60% I / 30% U / 10% D
* ~5% exact-duplicate replays (same event, same seq -> dedup no-op)
* ~5% late (out-of-order) events carrying an older ts
* ``conv_id`` drawn Zipf(s=1.2) so a few conversations are hot (skew tests)
* after ``evolve_at`` fraction of the log, events carry an additive
  ``model`` column (schema-evolution feed)

The generator is pure numpy/pyarrow -- no SparkSession required -- and writes
one parquet file per chunk so the file-stream source can replay it in
micro-batches (``maxFilesPerTrigger``).  Chunk files sort lexicographically
in event order (``chunk-00000.parquet`` ...).

This replaces fetchez's eager driver-side discovery (run() populating
``self.results``, /root/reference/src/fetchez/core.py:1094-1097) with a
deterministic, offset-partitioned change source.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")
ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array([None, "search", "bash", "python", "browser"], dtype=object)
MODELS = np.array(["m-small", "m-large", "m-turbo"])


@dataclass
class ChangeLogSpec:
    """Parameters of a deterministic change log."""

    num_events: int = 100_000
    num_convs: int = 2_000
    max_turns: int = 20
    seed: int = 42
    zipf_s: float = 1.2
    p_update: float = 0.30
    p_delete: float = 0.10
    p_duplicate: float = 0.05
    p_late: float = 0.05
    late_max_seconds: int = 3600
    # fraction of the log after which the additive `model` column appears;
    # 1.0 disables schema evolution.
    evolve_at: float = 1.0
    src_partitions: int = 8
    extra: dict = field(default_factory=dict)


def generate_change_log(spec: ChangeLogSpec) -> pd.DataFrame:
    """Vectorized generation of the full change log as one pandas frame."""
    rng = np.random.default_rng(spec.seed)
    n = spec.num_events

    # Zipf-hot conversation ids (bounded to num_convs).
    ranks = rng.zipf(spec.zipf_s, size=n)
    conv_idx = (ranks - 1) % spec.num_convs
    conv_id = np.char.add("conv_", np.char.zfill(conv_idx.astype(str), 8))
    turn_idx = rng.integers(0, spec.max_turns, size=n).astype(np.int32)

    u = rng.random(n)
    op = np.where(u < spec.p_delete, "D", np.where(u < spec.p_delete + spec.p_update, "U", "I"))

    seq = np.arange(n, dtype=np.int64)
    # Timestamps: monotone-ish (1ms + jitter per event), with ~p_late events
    # pulled back so they arrive out of order (older ts, later seq).
    base_us = np.cumsum(rng.integers(500, 1500, size=n)).astype("int64")
    late_mask = rng.random(n) < spec.p_late
    lateness = rng.integers(1, spec.late_max_seconds * 1_000_000, size=n)
    base_us = base_us - np.where(late_mask, lateness, 0)
    ts = _EPOCH + base_us.astype("timedelta64[us]")

    role = ROLES[rng.integers(0, len(ROLES), size=n)]
    tool = TOOLS[rng.integers(0, len(TOOLS), size=n)]
    # Deterministic per-event text: byte-equality oracle target.
    text = np.char.add(
        np.char.add(np.char.add("turn text ", conv_id), "#"),
        np.char.add(np.char.add(turn_idx.astype(str), " rev "), seq.astype(str)),
    )

    cols: dict[str, np.ndarray] = {
        "op": op.astype(object),
        "conv_id": conv_id.astype(object),
        "turn_idx": turn_idx,
        "role": role.astype(object),
        "text": text.astype(object),
        "tool": tool,
        "ts": ts,
        "seq": seq,
        "src_partition": (seq % spec.src_partitions).astype(np.int32),
    }
    # Deletes carry no payload.
    d = op == "D"
    for c in ("role", "text", "tool"):
        cols[c] = np.where(d, None, cols[c])

    # Additive column appearing after evolve_at fraction of the log.
    if spec.evolve_at < 1.0:
        cut = int(n * spec.evolve_at)
        cols["model"] = np.where(
            (seq >= cut) & ~d, MODELS[rng.integers(0, len(MODELS), size=n)], None
        )

    # Exact-duplicate replays: a later slot re-emits an earlier event
    # verbatim (same seq/ts/payload) -- replay must be a no-op.  Applied on
    # the raw arrays so per-column dtypes survive.
    n_dup = int(n * spec.p_duplicate)
    if n_dup:
        dup_pos = rng.choice(np.arange(n // 10, n), size=n_dup, replace=False)
        src_pos = rng.integers(0, np.maximum(dup_pos - 1, 1))
        for c, arr in cols.items():
            arr[dup_pos] = arr[src_pos]

    df = pd.DataFrame(cols)
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["src_partition"] = df["src_partition"].astype(np.int32)
    # tz-aware UTC so parquet carries isAdjustedToUTC=true and Spark reads
    # TimestampType (not NTZ); engine session timezone is pinned to UTC.
    df["ts"] = df["ts"].dt.tz_localize("UTC")
    return df


def write_change_log(spec: ChangeLogSpec, out_dir: str, num_chunks: int = 16) -> list[str]:
    """Write the log as ``num_chunks`` parquet files in replay order.

    If the spec evolves schema mid-log, chunks before the evolution point
    are physically written WITHOUT the ``model`` column (true additive
    evolution: old files simply lack the column).
    """
    os.makedirs(out_dir, exist_ok=True)
    df = generate_change_log(spec)
    n = len(df)
    paths = []
    bounds = np.linspace(0, n, num_chunks + 1).astype(int)
    cut = int(n * spec.evolve_at) if spec.evolve_at < 1.0 else n + 1
    for i in range(num_chunks):
        chunk = df.iloc[bounds[i] : bounds[i + 1]]
        if "model" in chunk.columns and int(chunk["seq"].max() if len(chunk) else -1) < cut:
            chunk = chunk.drop(columns=["model"])
        table = pa.Table.from_pandas(chunk, preserve_index=False)
        path = os.path.join(out_dir, f"chunk-{i:05d}.parquet")
        pq.write_table(table, path)
        paths.append(path)
    return paths


def _gen_chunk(args: tuple) -> str:
    spec_fields, out_dir, i, n, per = args
    sub = ChangeLogSpec(**{**spec_fields, "num_events": n, "seed": spec_fields["seed"] + i, "evolve_at": 1.0})
    df = generate_change_log(sub)
    df["seq"] = df["seq"] + i * per
    # keep microsecond precision: ns timestamps are illegal for Spark's
    # parquet reader (TIMESTAMP(NANOS))
    df["ts"] = (df["ts"] + pd.Timedelta(seconds=i * 2)).astype("datetime64[us, UTC]")
    path = os.path.join(out_dir, f"chunk-{i:05d}.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    return path


def write_change_log_chunked(
    spec: ChangeLogSpec, out_dir: str, num_chunks: int = 64, workers: int = 8
) -> list[str]:
    """Large-log variant: generate chunk-by-chunk (bounded memory),
    parallel across processes.

    Each chunk is an independent deterministic sub-log (seed = spec.seed +
    chunk index) with globally unique, monotone seq ranges.  Duplicates and
    late events occur within a chunk only -- adequate for throughput
    benchmarking (correctness tests use the single-frame generator whose
    oracle covers cross-chunk effects)."""
    from concurrent.futures import ProcessPoolExecutor
    from dataclasses import asdict

    os.makedirs(out_dir, exist_ok=True)
    per = spec.num_events // num_chunks
    fields = asdict(spec)
    fields.pop("extra", None)
    jobs = []
    for i in range(num_chunks):
        n = per if i < num_chunks - 1 else spec.num_events - per * (num_chunks - 1)
        jobs.append((fields, out_dir, i, n, per))
    if workers <= 1:
        return [_gen_chunk(j) for j in jobs]
    with ProcessPoolExecutor(workers) as ex:
        return list(ex.map(_gen_chunk, jobs))


def oracle_final_state(log: pd.DataFrame) -> pd.DataFrame:
    """Reference reduction (pandas): expected final target table.

    Group by key, winner = max (ts, seq); drop keys whose winner is a
    delete.  Mirrors fetchez's prefer-latest-version grouping
    (/root/reference/src/fetchez/modules/multibeam.py:217-253) and the
    FIXTURES.md section 2 oracle definition.
    """
    ordered = log.sort_values(["ts", "seq"], kind="mergesort")
    # drop_duplicates(keep="last"), NOT groupby().last(): the latter skips
    # nulls per-column and would resurrect payload from a losing row.
    winners = ordered.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    final = winners[winners["op"] != "D"].copy()
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    extra = [c for c in final.columns if c not in cols + ["op", "seq", "src_partition"]]
    out = final[cols + extra].sort_values(["conv_id", "turn_idx"], kind="mergesort")
    return out.reset_index(drop=True)
