"""Build the sf1.0-equivalent scale dataset for SCALE.md's scaling-ratio
evidence: documents and embeddings at 10× sf0.1, everything else
symlinked from sf0.1 (the non-corpus families are not under test).

Replicas are SHINGLE-DISJOINT by construction — every word is prefixed
with a replica tag, and replica embeddings are re-randomized — so the
dedup/similarity workloads scale their INPUT 10× without manufacturing
cross-replica near-duplicate pairs (which would grow output
quadratically and measure the dataset, not the engine).

Usage: python tools/make_scale_dataset.py [out_dir]   (default /tmp/scale_sf1)
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
ID_STRIDE = 100_000_000


def main(out_dir: str = "/tmp/scale_sf1") -> None:
    import pyspark.sql.functions as F

    from connect_server_spark.session import get_spark

    spark = get_spark(app_name="make_scale_dataset")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for k in range(REPLICAS):
        tag = F.lit(f"r{k}")
        parts.append(
            docs.select(
                (F.col("doc_id") + k * ID_STRIDE).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(tag, w),
                    ),
                    " ",
                ).alias("text"),
                "lang",
                "source",
                F.col("n_chars"),
            )
        )
    big_docs = parts[0]
    for p in parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.coalesce(8).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb.select("embedding").first().embedding)
    eparts = [emb]
    for k in range(1, REPLICAS):
        # replica vectors are fresh deterministic pseudo-randoms (seeded
        # per (replica, id, component)) — no planted cross-replica twins
        noise = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(
                    F.xxhash64(F.col("vec_id"), i, F.lit(k)), F.lit(2000)
                ).cast("float")
                / 1000.0
                - 1.0
            ),
        )
        eparts.append(
            emb.select(
                (F.col("vec_id") + k * ID_STRIDE).alias("vec_id"),
                noise.cast("array<float>").alias("embedding"),
                "label",
            )
        )
    big_emb = eparts[0]
    for p in eparts[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.coalesce(8).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )

    # events replicate with SHIFTED user ids (and strided event ids): the
    # per-user event density — what the as-of window, interval join, and
    # sessionization actually scale in — stays identical while users and
    # rows grow 10×, so temporal-query ratios measure the engine, not a
    # densified dataset artifact.
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    vparts = [
        ev.select(
            (F.col("event_id") + k * ID_STRIDE).alias("event_id"),
            "ts",
            (F.col("user_id") + k * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(REPLICAS)
    ]
    big_ev = vparts[0]
    for p in vparts[1:]:
        big_ev = big_ev.unionByName(p)
    big_ev.coalesce(8).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )

    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ):
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    print(out_dir)


if __name__ == "__main__":
    main(*sys.argv[1:2])
