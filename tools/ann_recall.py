"""ANN recall/cost sweep: measure, don't guess.

For M query vectors drawn from the embeddings table itself, compute
brute-force cosine top-k ground truth, then recall@k and the candidate
fraction (cost proxy: share of the table scored) for:

* random-hyperplane LSH, single- and multi-probe (probes = 1, 2, 4);
* IVF, nprobe = 1, 2, 4.

Emits one JSON blob (stdout + BENCH/ann_recall.json).  Driver-side loop
over M queries is deliberate: each probe is the partition-pruned scan a
real serving path would run; the sweep exists to pick DEFAULTS from
measured recall, not to benchmark throughput.

Usage:  python tools/ann_recall.py [sf_dir] [M]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(sf_dir: str, m_queries: int = 40, k: int = 10) -> dict:
    from fetchez_spark.functions.similarity import (
        IVFIndex,
        _random_hyperplanes,
        cosine_topk,
        lsh_bucket,
    )
    from fetchez_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="ann-recall", master="local[8]", shuffle_partitions=16)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    rows = emb.orderBy("vec_id").limit(m_queries).collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in rows]
    dim = len(queries[0][1])

    # query-INDEPENDENT work once: ground truth comes from collected
    # vectors (driver-side numpy, exact), the LSH bucket column and IVF
    # assignment are computed a single time -- per-query plan churn (~500
    # literal nodes per lsh_bucket call) OOMs the driver over hundreds of
    # sweep probes otherwise
    import numpy as np

    all_rows = emb.collect()
    ids = np.array([r["vec_id"] for r in all_rows])
    mat = np.array([r["embedding"] for r in all_rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)

    def truth(qv):
        q = np.array(qv) / np.linalg.norm(qv)
        sims = np.round(mat_n @ q, 6)
        order = sorted(zip(-sims, ids))[:k]
        return {int(i) for _, i in order}

    gts = {qid: truth(qv) for qid, qv in queries}

    ivf = IVFIndex(k=16).fit(emb)
    assigned = ivf.assign(emb).cache()
    assigned.count()

    out: dict[str, dict] = {}
    for n_planes in (4, 6, 8):
        planes = _random_hyperplanes(dim, n_planes)
        bucketed = emb.withColumn(
            "_bucket", lsh_bucket(F.col("embedding"), dim, n_planes)
        ).select("vec_id", "_bucket")
        bucket_of = {r["vec_id"]: r["_bucket"] for r in bucketed.collect()}
        for probes in (1, 2, 4):
            hits = 0
            for qid, qv in queries:
                dots = [sum(a * b for a, b in zip(qv, p)) for p in planes]
                qbits = sum(1 << i for i, d in enumerate(dots) if d > 0)
                by_margin = sorted(range(n_planes), key=lambda i: abs(dots[i]))
                buckets = {qbits} | {qbits ^ (1 << i) for i in by_margin[: probes - 1]}
                # score candidates driver-side on the SAME bucket
                # assignment the engine computes (via lsh_bucket)
                cand_mask = np.array([bucket_of[int(i)] in buckets for i in ids])
                q = np.array(qv) / np.linalg.norm(qv)
                sims = np.round(mat_n @ q, 6)
                order = sorted(zip(-sims[cand_mask], ids[cand_mask]))[:k]
                got = {int(i) for _, i in order}
                hits += len(got & gts[qid])
            out[f"lsh_planes{n_planes}_probes{probes}"] = {
                "recall_at_k": round(hits / (k * len(queries)), 4),
                "expected_candidate_fraction": round(probes / 2**n_planes, 4),
            }
    for nprobe in (1, 2, 4):
        hits = 0
        for qid, qv in queries:
            got = {r["vec_id"] for r in ivf.topk(assigned, qv, k=k, nprobe=nprobe).collect()}
            hits += len(got & gts[qid])
        out[f"ivf_nprobe{nprobe}"] = {
            "recall_at_k": round(hits / (k * len(queries)), 4),
            "expected_candidate_fraction": round(nprobe / 16, 4),
        }
    blob = {"sf_dir": sf_dir, "n_vectors": n, "m_queries": len(queries), "k": k, "sweep": out}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ann_recall.json"), "w") as f:
        json.dump(blob, f, indent=2)
    print(json.dumps(blob, indent=2))
    spark.stop()
    return blob


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    main(sf, m)
