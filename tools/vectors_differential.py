#!/usr/bin/env python3
"""Hostile-vector differential for the embedding-family oracle twins —
the vector counterpart of tools/unicode_differential.py.

Generates an embeddings table of adversarial vectors in the driver's
exact parquet shape — the all-zero vector (0/0 cosine), float32
denormal-edge components, float32-max one-hots (1e38), one-hot basis
vectors, exact negation pairs (cosine −1), plus normal randoms — then
the caller runs the REAL gate over it:

    python3 tools/vectors_differential.py /tmp/graft_vec
    sbt -batch "runMain graft.Verify /tmp/graft_vec /tmp/verify_vec \
        ann_topk dedup_embedding embed_quantize embed_pq ann_pq ann_lsh \
        ann_ivf ann_ivf_index ann_ivfpq ann_ivfpq_index dedup_semantic"
    GRAFT_HOSTILE_DATA=1 python3 tools/selfcheck.py /tmp/graft_vec /tmp/verify_vec

First run's findings (all fixed):
  - Spark double division 0/0 is NaN where DuckDB's is NULL, and Spark
    ORDERS NaN above every double — so a zero-vector pair's cosine
    passed `>= tau` on the Spark side while the twin dropped it, and
    ranked FIRST in top-k with value NaN vs the twin's NULL. Cosine is
    undefined for zero vectors: the ann/dedup/semantic-search operators
    now exclude NaN cosines explicitly (`!isnan`), and the ann_topk twin
    excludes the NULLs.
  - NumFns.roundHalfUp's Spark floor() returned LongType, silently
    CLAMPING beyond ±2^63: embed_quantize's q_scale for a 1e38 one-hot
    came back as Long.MaxValue/10^6 ≈ 9.2e12 while DuckDB's
    double-typed floor round-tripped the value. The floor is now
    computed in double via x − pmod(x, 1).
After the fixes every run must pass. ann_lsh graduated from a
rows-only check in round 17: TwinHashSql.annLsh bakes the seeded
hyperplanes into the twin and hash-adjudicates the full bucketed
result here too (its bucket RECALL on adversarial geometry is still
spec territory — recall is a quality metric, not a correctness one).

Round 17 added the IVF tier (ann_ivf, dedup_semantic) to the sweep:
the Lloyd quantizer trains deterministically (ordered-fold update
means), so both twins re-run the full training in DuckDB. The sweep
pinned the two seams that surfaced: 1e38 one-hots overflow any
fixed-point integer mean (hence the ordered double fold), and the two
engines order IEEE −0.0 on OPPOSITE sides of +0.0 (Java Double.compare
puts −0.0 below, DuckDB's total order above) — every float sort key in
the family now collapses −0.0 via `+ 0.0` on both sides.
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main():
    out_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    random.seed(20260819)
    rows = []
    for i in range(n):
        cls = i % 8
        if cls == 0:
            v = [0.0] * 64                                   # zero vector
        elif cls == 1:
            v = [1e-38] * 64                                 # denormal edge
        elif cls == 2:
            v = [1e38 if k == 0 else 0.0 for k in range(64)]  # float32-max
        elif cls == 3:
            v = [1.0 if k == i % 64 else 0.0 for k in range(64)]
        elif cls == 4:
            v = [-(k + 1.0) for k in range(64)]
        elif cls == 5:
            v = [k + 1.0 for k in range(64)]                 # negation of 4
        elif cls == 6:
            # IEEE negative zero — dots against it come out ±0.0, the class
            # where Java (−0.0 < +0.0) and DuckDB (−0.0 ABOVE +0.0) sort
            # OPPOSITE ways; pins the `+ 0.0` normalization on every float
            # sort key in the ANN/IVF family
            v = [-0.0] * 64
        else:
            v = [random.uniform(-1, 1) for _ in range(64)]
        rows.append((i, v, i % 5))
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table({"vec_id": [r[0] for r in rows],
                  "embedding": [r[1] for r in rows],
                  "label": [r[2] for r in rows]}, schema=schema),
        f"{out_dir}/embeddings.parquet")
    print(f"wrote {n} hostile vectors to {out_dir}/embeddings.parquet")


if __name__ == "__main__":
    main()
