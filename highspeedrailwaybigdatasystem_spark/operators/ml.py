"""Iterative ML operators on DataFrames (SURVEY.md §2.14).

Determinism design (what makes an ITERATIVE float algorithm exactly
oracle-checkable): embeddings are quantized once to 1e-6 fixed-point
integers, distances are pure int64 arithmetic (order-independent sums),
centroid updates use floor(sum/count) back to integers, and the
assignment argmin is a single integer key ``dist*10 + cid`` minimized
with plain ``min()`` — every step is exact in both engines, so 5 Lloyd
iterations stay bit-identical end to end. The float world is re-entered
only in the final reporting division.

Scale notes (100 TB): each iteration is one broadcast of k·d centroid
integers + one map-side distance/argmin pass + one (k·d)-group sum — the
canonical Spark k-means shape (MLlib's KMeans does the same with
mapPartitions accumulators). The driver holds only k×d integers per
iteration, never data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import t

_K = 4
_ITERS = 5
_D = 64
_Q = 1_000_000  # fixed-point scale: 1e-6 grid


def _kmeans_oracle() -> str:
    """Unrolled 5-iteration Lloyd's in DuckDB CTEs (the pagerank-oracle
    pattern): c0 = first k vectors (by vec_id), then per iteration an
    integer-distance assignment and a floor-mean centroid update."""
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(
            f"""p{i} AS (
      SELECT v.vec_id, v.ei, c.cid,
             list_sum(list_transform(list_zip(v.ei, c.c),
                      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
      FROM v CROSS JOIN c{i - 1} c),
    a{i} AS (
      SELECT vec_id, ei, min(dist * 10 + cid) AS k
      FROM p{i} GROUP BY vec_id, ei),
    c{i} AS (
      SELECT cid, list(cint ORDER BY pos) AS c
      FROM (
        SELECT CAST(a.k % 10 AS INT) AS cid, t.j AS pos,
               CAST(floor(CAST(sum(a.ei[t.j]) AS DOUBLE) / count(*))
                    AS BIGINT) AS cint
        FROM a{i} a CROSS JOIN range(1, {_D + 1}) t(j)
        GROUP BY a.k % 10, t.j)
      GROUP BY cid)"""
        )
    return f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {_Q}, 0) AS BIGINT)) AS ei
      FROM embeddings),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             ei AS c
      FROM v ORDER BY vec_id LIMIT {_K}),
    {",".join(steps)},
    final_assign AS (
      SELECT CAST(k % 10 AS INT) AS cid, CAST(k // 10 AS BIGINT) AS dist
      FROM a{_ITERS})
    SELECT f.cid,
           CAST(count(*) AS BIGINT) AS n_members,
           round(CAST(sum(f.dist) AS DOUBLE) / 1e12, 6) AS inertia,
           CAST(max(cs.checksum) AS BIGINT) AS centroid_checksum
    FROM final_assign f
    JOIN (SELECT cid, list_sum(c) AS checksum FROM c{_ITERS}) cs
      ON cs.cid = f.cid
    GROUP BY f.cid
    """


@register("ml_kmeans_lloyd", oracle=_kmeans_oracle())
def ml_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=4, 5 synchronous iterations) over the embedding
    corpus, EXACTLY oracle-checkable (see module docstring: fixed-point
    integer distances, floor-mean updates, integer argmin key). Init =
    first k vectors by vec_id. Per iteration Spark runs: broadcast k×d
    centroid literals → map-side int64 distance fold + ``least`` argmin →
    one (k·d)-group integer sum; the driver collects only the k×d
    centroid integers (cluster-count-sized, never data-sized). Clusters
    that empty out drop from the candidate set in BOTH engines. Output:
    cluster sizes, inertia (scaled back to float once), and an integer
    centroid checksum proving the centroids themselves match."""
    emb = t(spark, sf_dir, "embeddings")
    vq = emb.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> cast(round(cast(x as double) * {_Q}, 0)"
            " as bigint))"
        ).alias("ei"),
    ).cache()

    init = vq.orderBy("vec_id").limit(_K).collect()
    cents: dict[int, list[int]] = {i: list(r["ei"]) for i, r in enumerate(init)}

    def key_cols(cdict: dict[int, list[int]]):
        cols = []
        for cid, arr in sorted(cdict.items()):
            lit = ", ".join(f"{x}L" for x in arr)
            cols.append(
                F.expr(
                    f"aggregate(zip_with(ei, array({lit}),"
                    " (v, c) -> (v - c) * (v - c)), 0L, (a, x) -> a + x)"
                    f" * 10 + {cid}"
                )
            )
        return cols

    assigned = None
    for _ in range(_ITERS):
        ks = key_cols(cents)
        assigned = vq.select(
            "vec_id", "ei", F.least(*ks).alias("k") if len(ks) > 1 else ks[0].alias("k")
        )
        sums = (
            assigned.select(
                (F.col("k") % 10).cast("int").alias("cid"),
                F.posexplode("ei").alias("pos", "v"),
            )
            .groupBy("cid", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_cents: dict[int, list[int]] = {}
        for r in sums:
            new_cents.setdefault(r["cid"], [0] * _D)[r["pos"]] = math.floor(
                r["s"] / r["n"]
            )
        cents = new_cents

    checksums = {cid: sum(arr) for cid, arr in cents.items()}
    ck = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in sorted(checksums)]),
            F.array(*[F.lit(checksums[c]) for c in sorted(checksums)]),
        ),
        F.col("cid"),
    )
    return (
        assigned.select(
            (F.col("k") % 10).cast("int").alias("cid"),
            F.expr("k div 10").alias("dist"),
        )
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(
                F.sum(F.col("dist").cast("decimal(38,0)")).cast("double")
                / F.lit(1e12),
                6,
            ).alias("inertia"),
            F.max(ck).cast("bigint").alias("centroid_checksum"),
        )
    )
