"""LLM-training-data pipeline operators (SURVEY.md §2.11 + the north-star
extensions in BASELINE.json): deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine), similarity search (exact top-k + LSH ANN),
text analysis (stats, TF-IDF, quality filter, language-ID, fingerprinting),
and multimodal-column plumbing.

Scale notes (100 TB):
* Exact dedup shuffles once on the content hash — the hash is computed
  map-side so the shuffle carries (hash, id), not documents.
* MinHash-LSH near-dedup is the linear-time path: banding turns O(n²)
  pairwise comparison into per-bucket joins; buckets are the shuffle key.
* Exact cosine top-k broadcasts the probe (O(n) scan, TakeOrdered merge);
  the LSH ANN variant prunes to the probe's bucket first.
* All text ops are explode→agg pipelines: one shuffle on the token.
* Embeddings are L2-normalized (FIXTURES.md §2), so cosine ≡ dot product.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

from ..registry import plan_memo, register
from ..operators._util import _materialize_cache, ratio, sql_q, t

# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


@register(
    "llm_exact_dedup",
    oracle="""
    WITH doubled AS (SELECT doc_id, text FROM documents
                     UNION ALL SELECT doc_id, text FROM documents),
    hashed AS (SELECT doc_id, sha256(lower(trim(text))) AS text_hash FROM doubled)
    SELECT text_hash, min(doc_id) AS keep_doc_id, count(*) AS dup_cnt
    FROM hashed GROUP BY text_hash
    """,
)
@plan_memo
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a normalized content hash, deterministic keep-lowest-id
    rule. The corpus has no duplicate texts, so the input is doubled via
    self-union to make the dedup real (each hash → dup_cnt 2). Bench
    headline op — one SQL text (see ``sql_q``), identical plan."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH doubled AS (SELECT doc_id, text FROM documents
                         UNION ALL SELECT doc_id, text FROM documents)
        SELECT sha2(lower(trim(text)), 256) AS text_hash,
               min(doc_id) AS keep_doc_id,
               count(*) AS dup_cnt
        FROM doubled GROUP BY sha2(lower(trim(text)), 256)
        """,
    )


@register(
    "llm_near_dedup_minhash",
    oracle="""
    WITH reps AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    toks AS (
      SELECT d.doc_id, string_split(d.text, ' ') AS tk
      FROM documents d JOIN reps USING (doc_id)),
    shingle AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, len(tk) - 2),
               i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh
      FROM toks),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingle GROUP BY doc_id),
    inter AS (
      SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS shared
      FROM shingle sa JOIN shingle sb ON sa.sh = sb.sh AND sa.doc_id < sb.doc_id
      GROUP BY 1, 2)
    SELECT i.doc_a, i.doc_b,
           round(CAST(i.shared AS DOUBLE) / (za.n + zb.n - i.shared), 6) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE CAST(i.shared AS DOUBLE) / (za.n + zb.n - i.shared) >= 0.2
    """,
)
def llm_near_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MLlib MinHash-LSH candidates + EXACT verify.

    Pipeline: tokenize -> 3-shingles -> HashingTF (binary) -> MinHashLSH
    (5 tables, fixed seed 42) -> approxSimilarityJoin at feature-Jaccard
    distance <= 0.8 for CANDIDATES -> exact string-shingle Jaccard verify
    at >= 0.2 (array_intersect on distinct shingle sets). At 100 TB this
    is THE near-dedup path: banding makes candidate generation linear and
    the quadratic verify runs only on band-collision pairs.

    Exact-oracle admissibility (promoted from rows-only in round 4): the
    oracle is the full exact pair set at J >= 0.2. Equality needs LSH
    recall 1.0, which holds here because (a) hashed-feature Jaccard >=
    string Jaccard (HashingTF collisions only merge set elements), so no
    true pair is cut by the 0.8-distance join threshold, and (b) every
    true pair in this corpus has J >= 0.9 (probed at sf0.001/0.01/0.1),
    where a 5-table miss has probability (1-0.9)^5 = 1e-5 per pair - and
    the fixed seed's realized tables were verified to catch all of them
    at all three SFs. The returned ``jaccard`` is the exact string-level
    value, never the hashed-feature estimate.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    # EXACT collapse first (round 11): one representative per distinct
    # text (min doc_id over md5(text)) before featurization — verbatim
    # copies otherwise share every LSH bucket and the candidate set grows
    # ~copies² (the round-10 100x sweep TIMEOUT). Oracle applies the same
    # reps CTE. One linear (hash, id) shuffle; reps joins back by id.
    reps = (
        t(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d = (
        t(spark, sf_dir, "documents")
        .join(reps, "doc_id")
        .select("doc_id", F.split("text", " ").alias("toks"))
        # >= 3 tokens ≡ "has at least one 3-shingle". Filtering on toks
        # BEFORE the shingle projection matters: the former post-shingle
        # size(shingles) > 0 predicate was pushed below the reps join by
        # Catalyst, re-evaluating the whole transform/array_distinct HOF
        # per RAW document — 310 s on the 100x corpus (round 11); the
        # pushed-down form of this one is a single split+size per doc.
        # It also matches the oracle exactly: generate_series(1, n-2) is
        # empty below 3 tokens, while Spark's sequence(0, n-3) counts DOWN
        # for n < 3 and would emit junk shingles.
        .where(F.size("toks") >= 3)
    )
    shingled = d.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "transform(sequence(0, size(toks) - 3),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
            )
        ).alias("shingles"),
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 16, binary=True)
    # cached: the featurized side is read 3x (fit + both join sides);
    # materialized before the similarity join is planned (round-10
    # planner-statistics discipline — fit alone runs no job over feats).
    feats = tf.transform(shingled).cache()
    _materialize_cache(spark, feats)
    lsh = MinHashLSH(inputCol="features", outputCol="minhash", numHashTables=5, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.8, distCol="jaccard_dist")
    cand = pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id")).select(
        F.col("datasetA.doc_id").alias("doc_a"),
        F.col("datasetA.shingles").alias("sh_a"),
        F.col("datasetB.doc_id").alias("doc_b"),
        F.col("datasetB.shingles").alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union).alias("_j"),
        )
        .where(F.col("_j") >= 0.2)
        .select("doc_a", "doc_b", ratio(F.col("_j")).alias("jaccard"))
    )


@register(
    "llm_minhash_banding",
    oracle="""
    WITH reps AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    toks AS (
      SELECT d.doc_id, string_split(d.text, ' ') AS tk
      FROM documents d JOIN reps USING (doc_id)),
    shingle AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, len(tk) - 2),
               i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh
      FROM toks),
    hashed AS (
      SELECT doc_id, sh,
             CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) AS h
      FROM shingle),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingle GROUP BY doc_id),
    sig AS (
      SELECT doc_id, s.seed,
             min((CAST(1000003 AS BIGINT) * (s.seed + 1) * h
                  + 7919 * s.seed + 271) % 4294967291) AS mh
      FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS seed) s
      GROUP BY doc_id, s.seed),
    band AS (
      SELECT doc_id, seed // 4 AS band_id,
             md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS band_sig
      FROM sig GROUP BY doc_id, seed // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM band a JOIN band b
        ON a.band_id = b.band_id AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS shared
      FROM cand c
      JOIN shingle sa ON sa.doc_id = c.doc_a
      JOIN shingle sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh
      GROUP BY c.doc_a, c.doc_b)
    SELECT i.doc_a, i.doc_b,
           round(CAST(i.shared AS DOUBLE) / (za.n + zb.n - i.shared), 6) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE CAST(i.shared AS DOUBLE) / (za.n + zb.n - i.shared) >= 0.2
    """,
)
@plan_memo
def llm_minhash_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding built from pure DataFrame ops (the 100 TB
    near-dedup path, deterministic and exactly oracle-checkable):

    EXACT collapse first (round 11): md5(text) groupBy keeps one
    representative doc_id per distinct text before anything is shingled —
    one linear shuffle carrying (hash, id). On a duplicate-heavy corpus
    (real web crawls; the 100x amplified probe corpus repeats every payload
    verbatim) the verbatim copies otherwise land in the same LSH buckets
    and the candidate pair set grows ~copies² (the 100x sweep TIMEOUT,
    round 10) — collapse makes the pair population a function of DISTINCT
    content only. Oracle applies the same reps CTE, so both engines see
    identical semantics on any corpus. Then:

    distinct 3-token shingles → ONE md5 per shingle, folded to a 32-bit
    base hash → 20 min-hashes from an affine universal-hash family
    ``(a_s·h + b_s) mod p`` (p = 4294967291, largest 32-bit prime; a_s, b_s
    seed-indexed constants) → 5 bands of 4 → band-signature self-join for
    candidates → exact Jaccard verify at ≥ 0.2. Banding makes candidate
    generation linear in corpus size; the quadratic work happens only
    inside band-collision buckets. The affine family replaces the previous
    20-md5s-per-shingle scheme — hashing cost drops 20× (md5 once, then
    integer ops that stay inside whole-stage codegen) and DuckDB replicates
    the signature bit-for-bit (all arithmetic < 2^57, no 64-bit wrap).
    At production scale xxhash64 would replace md5 as the base hash.

    Driver-side construction is a few Py4J calls (memoized corpus views,
    cache the shingle stage, parse two SQL texts): the Column-op version of
    this pipeline spent ~0.85 s PER CALL in driver-side DataFrame
    construction alone (hundreds of JVM round-trips for 20×6 arithmetic
    Columns), which dominated the sf0.1 wall-clock. The physical plan is
    identical. The WHOLE constructed plan is additionally memoized via the
    shared ``@plan_memo`` (registry.py): re-parsing two SQL texts, three
    cache probes and a fresh Catalyst planning pass cost ~0.5 s of pure
    driver time per warm call; the memoized plan leaves ~46 ms of real
    execution. Composers (lsh_tuning_curve, dup_partner_degree_dist, ...)
    call this function directly and inherit the memo."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    # cached: read 4× (sizes, signature build, both sides of the verify)
    shingle = spark.sql(
        """
        SELECT doc_id, sh
        FROM (SELECT d.doc_id, split(d.text, ' ') AS tk
              FROM documents d
              JOIN (SELECT min(doc_id) AS doc_id FROM documents
                    GROUP BY md5(text)) reps USING (doc_id))
        LATERAL VIEW explode(array_distinct(transform(
            sequence(0, size(tk) - 3),
            i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS sh
        """
    ).cache()
    shingle.createOrReplaceTempView("__mh_shingle")
    # Materialize the cache BEFORE the main query is planned: an
    # unmaterialized cached explode carries the pre-explode size estimate,
    # under which Catalyst planned BuildRight BROADCASTS of this whole view
    # into the verify joins — fatal at the 100x corpus (3.5 GiB broadcast
    # on an 8 g driver, found round 10). With real InMemoryRelation stats
    # the planner broadcasts at sf0.1 (~5 MB) and shuffle-joins at scale.
    # The cold cost is work the query needs anyway; repeat calls skip the
    # count while the buffers stay loaded (gated on CacheManager state).
    _materialize_cache(spark, shingle)
    P = 4294967291  # largest 32-bit prime; a*h+b < 2^57 so no overflow
    minhashes = ",\n".join(
        f"min(({1000003 * (s + 1)} * h + {7919 * s + 271}) % {P}) AS mh{s}"
        for s in range(20)
    )
    band_structs = ", ".join(
        "struct({j} AS band_id, md5(concat_ws('|', {cols})) AS band_sig)".format(
            j=j, cols=", ".join(f"cast(mh{4 * j + i} AS string)" for i in range(4))
        )
        for j in range(5)
    )
    # cached at the CANDIDATE-PAIR grain (round 12, r11 verdict task #5):
    # sig build → band explode → bucket collect → pair emission fuse into
    # ONE cached stage/job, so a warm call replays a few-hundred-row cache
    # instead of re-running the bucket aggregation every time (the band-view
    # cache this replaces left ~0.32 s of warm candidate aggregation per
    # call at sf0.1). Cold cost is identical — the same operators ran to
    # materialize the band view's first read — and the cache is STRICTLY
    # smaller (pairs ≪ doc×band rows).
    # CTE-free on purpose: WITH-CTE definitions are not rewritten by
    # CacheManager's cached-plan substitution, so the CTE formulation of
    # this query recomputed the shingle explode per reference instead of
    # reading the cache (found via SHUFFLES.md accounting, round 4).
    # All 20 min-hashes in ONE aggregation pass: per-row affine mixes
    # fold into map-side partial mins, so the shuffle carries 20
    # columns × n_docs groups, not an exploded (shingle × seed) set.
    # Candidate generation via ONE bucket aggregation instead of a band
    # self-join: collect each (band_id, band_sig) bucket's doc list, emit
    # ordered pairs with a higher-order transform, DISTINCT across bands
    # (probed at sf0.1 and amplified sf1: identical 254-pair output, ~15%
    # faster warm than the join). Grain: pairs-per-bucket is quadratic
    # either way (that IS the candidate set); exact duplicates — the one
    # degenerate-bucket source — are collapsed to representatives upstream
    # in this very pipeline (round 11), so bucket fan-out tracks DISTINCT
    # near-dup density only.
    cand = spark.sql(
        f"""
        SELECT DISTINCT p.pr.doc_a, p.pr.doc_b
        FROM (
          SELECT explode(flatten(transform(ds, (x, ii) ->
                   slice(transform(ds, y -> struct(x AS doc_a, y AS doc_b)),
                         ii + 2, size(ds))))) AS pr
          FROM (SELECT sort_array(collect_list(doc_id)) AS ds
                FROM (SELECT doc_id, bs.band_id, bs.band_sig
                      FROM (
                        SELECT doc_id, {minhashes}
                        FROM (SELECT doc_id,
                                     cast(conv(substr(md5(sh), 1, 8), 16, 10)
                                       AS bigint) AS h
                              FROM __mh_shingle)
                        GROUP BY doc_id) sig
                      LATERAL VIEW explode(array({band_structs})) AS bs)
                GROUP BY band_id, band_sig
                HAVING count(*) > 1)) p
        """
    ).cache()
    cand.createOrReplaceTempView("__mh_cand")
    # cached: za AND zb below read this same per-doc aggregate in ONE query
    # execution (the existing multi-read cache policy), and it is n_docs
    # rows — the smallest relation in the pipeline after the pairs.
    sizes = spark.sql(
        "SELECT doc_id, count(*) AS n FROM __mh_shingle GROUP BY doc_id"
    ).cache()
    sizes.createOrReplaceTempView("__mh_sizes")
    # Materialized for real InMemoryRelation stats (same trap as the
    # shingle cache above): with honest row counts the planner broadcasts
    # the pair side at sf0.1 and AQE shuffle-joins at the 100x corpus.
    _materialize_cache(spark, cand, sizes)
    return spark.sql(
        """
        SELECT i.doc_a, i.doc_b,
               round(cast(i.shared AS double) / (za.n + zb.n - i.shared), 6)
                 AS jaccard
        FROM (
          SELECT c.doc_a, c.doc_b, count(*) AS shared
          -- No BROADCAST hints anywhere in this query (round 10): with AQE,
          -- runtime stats already convert these joins to broadcast when the
          -- built side is genuinely small (sf0.1: 254 candidate pairs), and
          -- a FORCED broadcast is fatal when it is not — the 100x amplified
          -- corpus (every payload duplicated 100x => every LSH bucket >= 100
          -- docs => ~50M candidate pairs) killed the hinted plan with a
          -- 3.5 GiB broadcast OOM, while the unhinted plan survives by
          -- falling back to shuffle joins. Same argument for za/zb: the
          -- per-doc shingle-count table is corpus-sized, so AQE broadcasts
          -- the verified-pair side instead when pairs are sparse.
          FROM __mh_cand c
          JOIN __mh_shingle sa ON sa.doc_id = c.doc_a
          JOIN __mh_shingle sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh
          GROUP BY c.doc_a, c.doc_b) i
        JOIN __mh_sizes za ON za.doc_id = i.doc_a
        JOIN __mh_sizes zb ON zb.doc_id = i.doc_b
        WHERE cast(i.shared AS double) / (za.n + zb.n - i.shared) >= 0.2
        """
    )


# Shared SQL fragment: 16-bit SimHash bit logic, identical semantics both
# engines; only hex-parse and list indexing differ (handled per side).
@register(
    "llm_simhash",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    bits AS (
      SELECT doc_id, b.b,
             CASE WHEN CAST(floor(CAST(('0x' || substr(md5(token), 1, 4)) AS INTEGER)
                                  / power(2, b.b)) AS INT) % 2 = 1
                  THEN 1 ELSE -1 END AS contrib
      FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) b),
    votes AS (
      SELECT doc_id, b, sum(contrib) AS v FROM bits GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash document fingerprint: per-token md5 → first 16 bits →
    ±1 votes per bit position weighted by term frequency → sign → bits.
    Near-dup docs differ in few bits (Hamming); exact oracle because md5 and
    the vote arithmetic are engine-independent."""
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    h = F.conv(F.substring(F.md5("token"), 1, 4), 16, 10).cast("int")
    # single aggregation pass: one ±1 vote column per bit (map-side partial
    # sums; no (token × bit) row explosion), then assemble the 16-bit code.
    votes = tok.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when((F.shiftright(F.col("h"), b) % 2) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(16)
        ]
    )
    code = None
    for b in range(16):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        code = bit if code is None else code + bit
    return votes.select("doc_id", code.alias("simhash"))


@register(
    "llm_ngram_jaccard",
    oracle="""
    WITH reps AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    tok AS (
      SELECT DISTINCT d.doc_id, d.source,
             unnest(string_split(d.text, ' ')) AS token
      FROM documents d JOIN reps USING (doc_id)),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_cnt
      FROM tok a JOIN tok b ON a.token = b.token AND a.source = b.source
                           AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(CAST(shared_cnt AS DOUBLE) / (sa.n + sb.n - shared_cnt), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    ORDER BY jaccard DESC, doc_a, doc_b
    LIMIT 100
    """,
)
def llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard similarity for document pairs within the same
    source (the blocking key that bounds the self-join — at 100 TB blocking
    is what keeps pairwise similarity tractable). EXACT-COLLAPSE FIRST
    (round 11): pairs run over one representative per distinct text
    (min doc_id over md5(text)) — verbatim duplicates otherwise make the
    token self-join output grow ~copies² (the round-10 100x sweep
    TIMEOUT); oracle applies the same reps CTE. Top-100 pairs."""
    reps = (
        t(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d = t(spark, sf_dir, "documents").join(reps, "doc_id")
    # cached: read 3x (sizes + both self-join sides) — uncached, each
    # reference re-ran the reps collapse + explode (15 shuffles; round 11)
    tok = (
        d.select("doc_id", "source", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
        .cache()
    )
    _materialize_cache(spark, tok)
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = tok.alias("a")
    b = tok.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_cnt"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        shared.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("shared_cnt").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("shared_cnt")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# similarity search over embeddings (cosine ≡ dot: vectors are L2-normalized)
# ---------------------------------------------------------------------------

_DOT_ORACLE = (
    "list_aggregate(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)


def _dot(a, b):
    """Double-precision dot product of two float32 array columns (cast inside
    the lambda so both engines accumulate in float64)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@F.pandas_udf(DoubleType())  # type instance: a DDL string would need an
def _dot64_vec(a: pd.Series, b: pd.Series) -> pd.Series:  # active session at import
    """Arrow-vectorized float64 dot product for embedding pair columns —
    the hot-path twin of ``_dot`` for ops whose dot count scales with the
    corpus (the interpreted higher-order-function fold costs ~6 µs/dot;
    llm_ann_recall_eval's ~19M dots at the 100x corpus took 114 s through
    it, vs the 100 s sweep watchdog). The kernel reproduces the fold's
    accumulation order STRUCTURALLY, not just empirically: np.cumsum along
    axis=1 accumulates strictly sequentially left-to-right in float64, and
    0.0 + x0 == x0 exactly, so every partial sum is bit-identical to
    ``aggregate(zip_with(...))``'s left fold and to the DuckDB oracle's
    list_aggregate 'sum'. (The previous np.einsum kernel was only
    empirically identical — max divergence 3.3e-16 on 2M pairs — which
    left round-to-1e-6 cut boundaries one ulp from flipping on a new
    corpus; ADVICE r11 medium.) One signed-zero exception (ADVICE r12):
    the fold's 0.0 + x0 seed turns a leading -0.0 product into +0.0 while
    cumsum keeps -0.0, so an all-signed-zero product row yields -0.0 here
    vs the fold's +0.0 — numerically equal everywhere (-0.0 == 0.0; no
    round-to-1e-6 cut can flip on it), just not bit-identical for that
    degenerate row. Pinned (including the -0.0 row) by
    tests/test_properties_r12_window.py::test_dot64_vec_bit_identical_to_fold."""
    import numpy as np

    la = np.array(list(a), dtype=np.float64)
    lb = np.array(list(b), dtype=np.float64)
    return pd.Series((la * lb).cumsum(axis=1)[:, -1])


@register(
    "llm_sim_topk",
    oracle=f"""
    WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, round({_DOT_ORACLE.format(a='embedding', b='p')}, 6) AS sim
    FROM embeddings, probe
    WHERE vec_id <> 0
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
)
@plan_memo
def llm_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of probe vec_id=0: broadcast the probe,
    one pass over the corpus, TakeOrderedAndProject merge. The 100 TB path
    swaps the scan for the LSH-bucketed variant (llm_ann_lsh). Bench
    headline op — one SQL text (see ``sql_q``); the dot product is the
    same left-to-right float64 ``aggregate(zip_with(...))`` fold as
    ``_dot``, so the accumulation order (and round-6 result) is
    bit-identical to the DataFrame formulation."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
        SELECT /*+ BROADCAST(probe) */ vec_id,
               round(aggregate(
                       zip_with(embedding, p,
                                (x, y) -> cast(x AS double) * cast(y AS double)),
                       cast(0.0 AS double), (acc, v) -> acc + v), 6) AS sim
        FROM embeddings CROSS JOIN probe
        WHERE vec_id <> 0
        ORDER BY sim DESC, vec_id
        LIMIT 10
        """,
    )


#: Rows per GEMM block. A task touches 2·BLOCK·dim float64 inputs plus a
#: BLOCK² sims tile (~2 MB at dim 64) — memory-bound constant, NOT data-sized;
#: the block-pair grid shards the O(N²) work across the cluster.
_SIM_BLOCK = 512


def _sim_block_side(
    spark: SparkSession,
    sf_dir: str,
    side: str,
    with_label: bool,
    collapse: bool = False,
    cap: int | None = None,
):
    """One side of the block×block GEMM cogroup. Fresh read per side —
    identical lineage on both cogroup sides trips Spark's ambiguous-self-join
    detection.

    ``collapse`` (round 11): restrict to one representative vec_id per
    distinct embedding payload (min vec_id; the collapse key includes the
    label when ``with_label``, so two identically-embedded rows with
    different labels both survive). Verbatim payload copies — real web
    corpora AND the 100x amplified probe corpus — otherwise multiply the
    GEMM work by copies² (round-10 sweep TIMEOUT); the oracle of every
    caller applies the same reps subquery. ``cap``: documented hard bound
    on the audited id range (applied after collapse), making the exact
    all-pairs tier O(cap²) regardless of corpus size. NULL embeddings
    are filtered on every side (r15 null-injection sweep): a missing
    vector has no cosine to anything — numpy raised on the ragged
    batch — and every caller's oracle filters its reps CTE identically."""
    src = t(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    if collapse:
        keys = ["embedding", "label"] if with_label else ["embedding"]
        reps = (
            t(spark, sf_dir, "embeddings")
            .where(F.col("embedding").isNotNull())
            .groupBy(*keys)
            .agg(F.min("vec_id").alias("vec_id"))
            .select("vec_id")
        )
        src = src.join(reps, "vec_id")
    if cap is not None:
        src = src.where(F.col("vec_id") < cap)
    cols = [
        F.col("vec_id").alias(f"{side}_id"),
        F.col("embedding").alias(f"{side}_emb"),
        F.expr(f"vec_id div {_SIM_BLOCK}").alias(f"{side}_blk"),
    ]
    if with_label:
        cols.append(F.col("label").alias(f"{side}_label"))
    return src.select(*cols)


def _block_pair_grid(spark: SparkSession, n_blocks: int) -> DataFrame:
    """Upper-triangular block-pair list (bi ≤ bj) built DISTRIBUTED from one
    spark.range(P²) with div/mod — never a driver-side Python list (P² tuples
    would OOM the driver at large corpus sizes) and never a cartesian join
    (spark.range splits shard the enumeration across executors)."""
    p = F.lit(n_blocks)
    return (
        spark.range(n_blocks * n_blocks)
        .select((F.col("id") / p).cast("long").alias("bi"), (F.col("id") % p).alias("bj"))
        .where(F.col("bi") <= F.col("bj"))
    )


def _blocked_gemm(
    spark: SparkSession,
    sf_dir: str,
    kernel,
    out_schema: str,
    with_label: bool = False,
    collapse: bool = False,
    cap: int | None = None,
) -> DataFrame:
    """FULLY DISTRIBUTED all-pairs layout — no driver collect, no corpus
    broadcast: rows are assigned to contiguous _SIM_BLOCK-row blocks, the
    upper-triangular block-pair grid is equi-joined against both sides, and
    each cogroup task runs `kernel(key, left_block, right_block)` — one numpy
    float64 GEMM tile per task. Data inflation is P× per side, the standard
    block-matrix trade; the only driver-side value is the single block-count
    scalar."""
    n_blocks = int(
        _sim_block_side(spark, sf_dir, "x", with_label, collapse, cap)
        .agg(F.max("x_blk") + 1)
        .head()[0]
    )  # single-scalar plan parameter (O(1) driver memory)
    # fresh grid per side — shared lineage across cogroup sides is ambiguous
    left = (
        _sim_block_side(spark, sf_dir, "l", with_label, collapse, cap)
        .join(_block_pair_grid(spark, n_blocks), F.col("l_blk") == F.col("bi"))
        .drop("l_blk")
        .groupBy("bi", "bj")
    )
    right = (
        _sim_block_side(spark, sf_dir, "r", with_label, collapse, cap)
        .join(_block_pair_grid(spark, n_blocks), F.col("r_blk") == F.col("bj"))
        .drop("r_blk")
        .groupBy("bi", "bj")
    )
    return left.cogroup(right).applyInPandas(kernel, out_schema)


def _threshold_pair_kernel(threshold: float):
    """Kernel: emit (vec_a, vec_b, sim) for unordered pairs with rounded
    cosine ≥ threshold. lid < rid counts each pair once (the diagonal block
    pair contains both orientations; off-diagonal blocks satisfy it for
    free since block id is vec_id div BLOCK)."""
    import numpy as np
    import pandas as pd

    def kernel(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "sim": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "sim": "float64"}
            )
        la = np.array(list(lpdf["l_emb"]), dtype=np.float64)
        rb = np.array(list(rpdf["r_emb"]), dtype=np.float64)
        sims = (la @ rb.T).round(6)
        lid = lpdf["l_id"].to_numpy()
        rid = rpdf["r_id"].to_numpy()
        ii, jj = np.nonzero((sims >= threshold) & (lid[:, None] < rid[None, :]))
        return pd.DataFrame(
            {"vec_a": lid[ii], "vec_b": rid[jj], "sim": sims[ii, jj]}
        ).astype({"vec_a": "int64", "vec_b": "int64", "sim": "float64"})

    return kernel


@register(
    "llm_sim_pairs_label",
    oracle=f"""
    WITH reps AS (
      SELECT min(vec_id) AS vec_id FROM embeddings
      WHERE embedding IS NOT NULL GROUP BY embedding, label),
    e AS (
      SELECT x.vec_id, x.embedding, x.label
      FROM embeddings x JOIN reps USING (vec_id))
    SELECT (a.label = b.label) AS same_label,
           count(*) AS pair_cnt,
           round(avg({_DOT_ORACLE.format(a='a.embedding', b='b.embedding')}), 6) AS avg_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    GROUP BY 1
    """,
)
def llm_sim_pairs_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering sanity check: average intra-label vs inter-label cosine
    over all pairs of DISTINCT (embedding, label) rows — EXACT-COLLAPSE
    FIRST (round 11): verbatim payload copies otherwise multiply the GEMM
    work copies² (round-10 100x sweep TIMEOUT) while only re-measuring the
    same cosines; oracle applies the same reps subquery. Runs on the fully
    distributed block×block GEMM layout (_blocked_gemm — no driver collect,
    no corpus broadcast): each block-pair task emits a 2-row partial
    (same_label, sim_sum, cnt); the final aggregation is a 2-group Spark
    agg."""
    import numpy as np
    import pandas as pd

    def pair_label_stats(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"same_label": [], "sim_sum": [], "cnt": []}).astype(
                {"same_label": "bool", "sim_sum": "float64", "cnt": "int64"}
            )
        la = np.array(list(lpdf["l_emb"]), dtype=np.float64)
        rb = np.array(list(rpdf["r_emb"]), dtype=np.float64)
        sims = la @ rb.T  # float64 GEMM tile; rounding happens at the avg
        pair_once = lpdf["l_id"].to_numpy()[:, None] < rpdf["r_id"].to_numpy()[None, :]
        same = (
            lpdf["l_label"].to_numpy()[:, None] == rpdf["r_label"].to_numpy()[None, :]
        )
        rows = []
        for tf in (True, False):
            m = pair_once & (same == tf)
            rows.append((tf, float(sims[m].sum()), int(m.sum())))
        return pd.DataFrame(rows, columns=["same_label", "sim_sum", "cnt"]).astype(
            {"same_label": "bool", "sim_sum": "float64", "cnt": "int64"}
        )

    partials = _blocked_gemm(
        spark,
        sf_dir,
        pair_label_stats,
        "same_label boolean, sim_sum double, cnt long",
        with_label=True,
        collapse=True,
    )
    return partials.groupBy("same_label").agg(
        F.sum("cnt").alias("pair_cnt"),
        ratio(F.sum("sim_sum") / F.sum("cnt")).alias("avg_sim"),
    )


@register(
    "llm_embed_near_dup",
    oracle=f"""
    WITH reps AS (
      SELECT min(vec_id) AS vec_id FROM embeddings
      WHERE embedding IS NOT NULL GROUP BY embedding),
    e AS (
      SELECT x.vec_id, x.embedding FROM embeddings x JOIN reps USING (vec_id))
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_DOT_ORACLE.format(a='a.embedding', b='b.embedding')}, 6) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round({_DOT_ORACLE.format(a='a.embedding', b='b.embedding')}, 6) >= 0.35
    """,
)
def llm_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ 0.35; corpus max ~0.51)
    on the fully distributed block×block GEMM layout — no driver collect, no
    corpus broadcast. Threshold applied inside the kernel so only qualifying
    pairs leave Python, and it compares the ROUNDED sim on both sides so a
    last-ulp GEMM-vs-fold difference can't flip membership at the cut.
    EXACT-COLLAPSE FIRST (round 11): pairs run over one representative per
    distinct embedding payload — identical vectors are exact duplicates by
    definition, and carrying the copies multiplies the GEMM copies² (the
    100x sweep TIMEOUT) while every extra pair is sim=1.0 noise; oracle
    applies the same reps subquery. This op stays the exactness anchor:
    collapse-only, NO row cap (llm_sim_blocked carries the capped audit
    tier; the sub-quadratic production paths are LSH / IVF / semdedup)."""
    return _blocked_gemm(
        spark,
        sf_dir,
        _threshold_pair_kernel(0.35),
        "vec_a long, vec_b long, sim double",
        collapse=True,
    )


#: Shared DuckDB CTE block for the IVF-bucketed k-NN family (llm_knn_all +
#: ml_knn_classifier_eval): exact-collapse reps → 16 deterministic
#: centroids (the llm_ivf_ann convention) → one cell assignment per rep →
#: within-cell top-5 under (sim DESC, neighbor_id).
_KNN_IVF_CTES = f"""
    reps AS (
      SELECT min(vec_id) AS vec_id FROM embeddings GROUP BY embedding),
    e AS (
      SELECT x.vec_id, x.embedding
      FROM embeddings x JOIN reps USING (vec_id)),
    cents AS (
      SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
      WHERE vec_id < 16),
    assigned AS (
      SELECT vec_id, cent_id FROM (
        SELECT e.vec_id, c.cent_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY round({_DOT_ORACLE.format(a='e.embedding', b='c.cent')}, 6) DESC,
                            c.cent_id) AS rn
        FROM e CROSS JOIN cents c) z
      WHERE rn = 1),
    sims AS (
      SELECT a.vec_id, b.vec_id AS neighbor_id,
             round({_DOT_ORACLE.format(a='a.embedding', b='b.embedding')}, 6) AS sim
      FROM e a
      JOIN assigned aa ON aa.vec_id = a.vec_id
      JOIN assigned ab ON ab.cent_id = aa.cent_id AND ab.vec_id <> a.vec_id
      JOIN e b ON b.vec_id = ab.vec_id),
    knn AS (
      SELECT vec_id, neighbor_id, rnk, sim FROM (
        SELECT vec_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, neighbor_id) AS rnk
        FROM sims) z
      WHERE rnk <= 5)
"""

#: Spark SQL dot product — the same left-to-right float64 fold as ``_dot``,
#: so round-6 results are bit-identical to the DataFrame formulation.
_DOT_SPARK_SQL = (
    "aggregate(zip_with({a}, {b},"
    " (x, y) -> cast(x AS double) * cast(y AS double)),"
    " cast(0.0 AS double), (acc, x) -> acc + x)"
)


@register(
    "llm_knn_all",
    oracle=f"""
    WITH {_KNN_IVF_CTES}
    SELECT vec_id, neighbor_id, CAST(rnk AS INT) AS rnk, sim FROM knn
    """,
)
def llm_knn_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors for every vector WITHIN ITS IVF CELL (batch
    k-NN, the build-the-similarity-graph shape behind near-dup clustering
    and retrieval indexes). Round 11 replaced the exact all-pairs block×
    block GEMM (quadratic in the corpus, the round-10 100x sweep TIMEOUT)
    with the bounded production shape:

    1. EXACT collapse — one representative vec_id per distinct embedding
       payload (verbatim copies otherwise multiply the pair work copies²).
    2. IVF coarse quantizer — the llm_ivf_ann convention: 16 deterministic
       centroids (vec_id < 16), every rep assigned to its argmax-cosine
       cell (round-6, cent_id tiebreak). Neighbor search runs within the
       cell only, so the pair work is Σ_cells n_c² ≈ N²/K — at 100 TB with
       K=√N trained centroids this is the standard ANN-graph build; the
       within-cell join is a plain shuffle equi-join on cent_id, fully
       JVM-side (no Python row boundary).

    Vectors in singleton cells return no neighbors (documented IVF recall
    trade; llm_ann_recall_eval measures exactly this loss). Sims are
    rounded BEFORE ranking on both sides, making the cut deterministic
    across engines; the oracle replays the identical reps → assignment →
    within-cell rank pipeline. The unbounded exactness anchor remains
    llm_embed_near_dup."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    # cached: the within-cell join reads the assignment twice (both sides).
    # The 16-row centroid side carries a BROADCAST hint — fixed cardinality
    # by construction (vec_id < 16), per the round-10 broadcast policy.
    assigned = spark.sql(
        f"""
        SELECT /*+ BROADCAST(knn_cents) */ vec_id, cent_id, embedding FROM (
          SELECT e.vec_id, e.embedding, knn_cents.cent_id,
                 row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY round({_DOT_SPARK_SQL.format(a='e.embedding', b='knn_cents.cent')}, 6) DESC,
                              knn_cents.cent_id) AS rn
          FROM (SELECT x.vec_id, x.embedding
                FROM embeddings x
                JOIN (SELECT min(vec_id) AS vec_id FROM embeddings
                      GROUP BY embedding) reps USING (vec_id)) e
          CROSS JOIN (SELECT vec_id AS cent_id, embedding AS cent
                      FROM embeddings WHERE vec_id < 16) knn_cents)
        WHERE rn = 1
        """
    ).cache()
    assigned.createOrReplaceTempView("__knn_assigned")
    # Planner-statistics discipline (round 10): materialize before the
    # self-join is planned so both sides see real InMemoryRelation stats.
    _materialize_cache(spark, assigned)
    return spark.sql(
        f"""
        SELECT vec_id, neighbor_id, CAST(rnk AS INT) AS rnk, sim FROM (
          SELECT vec_id, neighbor_id, sim,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, neighbor_id) AS rnk
          FROM (SELECT a.vec_id, b.vec_id AS neighbor_id,
                       round({_DOT_SPARK_SQL.format(a='a.embedding', b='b.embedding')}, 6) AS sim
                FROM __knn_assigned a
                JOIN __knn_assigned b
                  ON b.cent_id = a.cent_id AND b.vec_id <> a.vec_id) s) r
        WHERE rnk <= 5
        """
    )


def _lsh_approx_neighbors(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """LSH approximate top-k for probe vec_id=0 (BucketedRandomProjectionLSH,
    fixed seed): hash the corpus into buckets, search the probe's bucket
    neighborhood only. Distances are TRUE euclidean distances — LSH prunes
    the candidate set, it never fabricates a distance. Shared by the
    registered audit op and the estimator-claim property test."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = (
        t(spark, sf_dir, "embeddings")
        # NULL embeddings can be neither indexed nor queried (r15 null
        # sweep: fit() raised on the null vector); the probe is the
        # MINIMUM non-null vec_id — identical to vec 0 on a null-free
        # corpus, well-defined on any other.
        .where(F.col("embedding").isNotNull())
        .select("vec_id", array_to_vector("embedding").alias("vec"))
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    )
    model = lsh.fit(e)
    probe = e.orderBy("vec_id").head()  # single bounded row: the probe key
    neighbors = model.approxNearestNeighbors(
        e.where(F.col("vec_id") != probe["vec_id"]), probe["vec"], k,
        distCol="euclid_dist"
    )
    return neighbors.select("vec_id", F.round("euclid_dist", 6).alias("euclid_dist"))


@register(
    "llm_ann_lsh",
    oracle="""
    SELECT CAST(min(vec_id) AS BIGINT) AS probe_id,
           CAST(10 AS BIGINT) AS k, TRUE AS recall_ok
    FROM embeddings WHERE embedding IS NOT NULL
    """,
)
def llm_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN with an in-plan recall audit (r12 verdict task #2; rows-only
    r1–r12, first oracle-backed r13): run the seeded random-hyperplane LSH
    top-10 for probe vec_id=0, compute the EXACT top-10 by brute-force dot
    against the same probe (one linear scan — cheap for a single probe at
    any scale), and emit one row asserting recall@10 ≥ 0.8. The floor, not
    exact set equality, is the gateable contract: bucket pruning genuinely
    excludes a true neighbor at sf0.01 (measured recall 10/10 at sf0.001,
    9/10 at sf0.01, 10/10 at sf0.1 — round-6 probe), so no deterministic
    SQL oracle can reproduce the neighbor SET, but every measurement sits
    ≥1 hit above the floor. The recall/latency trade is the op's point;
    exact-checkable twins: llm_ivf_ann, llm_ann_recall_eval, llm_knn_all."""
    neighbors = _lsh_approx_neighbors(spark, sf_dir, k=10)
    raw = t(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    probe_vid = raw.agg(F.min("vec_id")).head()[0]  # bounded scalar probe key
    probe_arr = raw.where(F.col("vec_id") == probe_vid).select(
        F.col("embedding").alias("p")
    )
    exact_top = (
        raw.where(F.col("vec_id") != probe_vid)
        .crossJoin(F.broadcast(probe_arr))
        .select("vec_id", _dot(F.col("embedding"), F.col("p")).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )
    return (
        neighbors.join(exact_top, "vec_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("hits"))
        .select(
            F.lit(int(probe_vid)).cast("long").alias("probe_id"),
            F.lit(10).cast("long").alias("k"),
            (F.col("hits") >= 8).alias("recall_ok"),
        )
    )


@register(
    "llm_sim_blocked",
    oracle=f"""
    WITH reps AS (
      SELECT min(vec_id) AS vec_id FROM embeddings
      WHERE embedding IS NOT NULL GROUP BY embedding),
    e AS (
      SELECT x.vec_id, x.embedding FROM embeddings x JOIN reps USING (vec_id)
      WHERE x.vec_id < 131072)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_DOT_ORACLE.format(a='a.embedding', b='b.embedding')}, 6) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round({_DOT_ORACLE.format(a='a.embedding', b='b.embedding')}, 6) >= 0.35
    """,
)
def llm_sim_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine near-dup via the FULLY DISTRIBUTED block×block GEMM
    layout (_blocked_gemm): rows → _SIM_BLOCK-row blocks, the
    upper-triangular block-pair grid (enumerated with spark.range div/mod,
    never a driver list) equi-joined against both sides and cogrouped, one
    numpy float64 GEMM tile per task. No driver collect, no corpus
    broadcast; block size bounds a task's memory and the grid shards the
    O(N²) work across the cluster.

    Bounded audit tier (round 11): (a) EXACT-COLLAPSE FIRST — one
    representative vec_id per distinct embedding payload, so verbatim
    copies (real crawls; the 100x amplified probe corpus) stop multiplying
    the GEMM copies² (round-10 sweep TIMEOUT); (b) a documented hard cap —
    the audit runs on representative vec_id < 131072 (~17B pair-dots worst
    case, a bounded cluster job at any corpus size; a no-op at every test
    tier, max vec_id 1999). The unbounded exactness anchor remains
    llm_embed_near_dup; the sub-quadratic production paths are the LSH /
    IVF / semdedup family. Oracle applies the same reps + cap."""
    return _blocked_gemm(
        spark,
        sf_dir,
        _threshold_pair_kernel(0.35),
        "vec_a long, vec_b long, sim double",
        collapse=True,
        cap=131072,
    )


@register(
    "llm_dedup_components",
    oracle=f"""
    WITH RECURSIVE reps AS (
      SELECT min(vec_id) AS vec_id FROM embeddings
      WHERE embedding IS NOT NULL GROUP BY embedding),
    e AS (
      SELECT x.vec_id, x.embedding FROM embeddings x JOIN reps USING (vec_id)),
    edges AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE round({_DOT_ORACLE.format(a='a.embedding', b='b.embedding')}, 6) >= 0.35),
    undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    nodes AS (
      SELECT DISTINCT src AS v FROM undirected),
    reach AS (
      SELECT v, v AS lbl FROM nodes
      UNION
      SELECT u.dst AS v, r.lbl
      FROM reach r JOIN undirected u ON u.src = r.v)
    SELECT v AS vec_id, min(lbl) AS component_id
    FROM reach GROUP BY v
    """,
)
def llm_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the cosine
    near-dup graph (edges = rounded sim ≥ 0.35), via iterative min-label
    propagation — the GraphFrames-free union-find named in SURVEY.md §4.2.

    Each iteration is one join + aggregate (Pregel-style superstep); the
    loop stops when no label changes. Iteration count is bounded by the
    graph diameter, and each superstep is a fully distributed shuffle-join —
    the standard way to run fixpoint algorithms on Spark without a graph
    library. Only nodes that appear in at least one edge are returned
    (singletons are trivially their own component). Inherits
    llm_embed_near_dup's round-11 exact-collapse, so the edge set (and the
    component graph) is over distinct embedding payloads — exact copies
    belong to their representative's cluster by construction. Oracle:
    recursive-CTE transitive reachability with the same min-label rule
    over the same collapsed reps."""
    edges = (
        llm_embed_near_dup(spark, sf_dir)
        .select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    )
    # the iterative frames are tiny relative to the corpus — size the
    # superstep shuffles to the GRAPH, not the session default (restored
    # below; all loop actions are eager so the conf applies only here)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        labels = _label_propagation_fixpoint(edges)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return labels.select(F.col("v").alias("vec_id"), F.col("lbl").alias("component_id"))


def _label_propagation_fixpoint(edges: DataFrame) -> DataFrame:
    """Min-label propagation with pointer jumping until no label changes.
    localCheckpoint truncates lineage each superstep — without it the
    logical plan nests exponentially across iterations (OOM at plan
    explain time long before data is a problem)."""
    und = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("lbl", F.col("v"))
        .localCheckpoint(eager=True)
    )
    for _ in range(20):  # with pointer jumping, converges in O(log diameter)
        neighbor_min = (
            und.join(labels, und.src == labels.v)
            .groupBy(F.col("dst").alias("v2"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        propagated = labels.join(neighbor_min, labels.v == F.col("v2"), "left").select(
            "v",
            F.least(F.col("lbl"), F.coalesce("nlbl", F.col("lbl"))).alias("lbl"),
        )
        # pointer jumping (path halving): replace each label by ITS label,
        # so chains collapse exponentially instead of one hop per superstep
        hop = propagated.select(
            F.col("v").alias("jv"), F.col("lbl").alias("jlbl")
        )
        new_labels = (
            propagated.join(hop, propagated.lbl == hop.jv, "left")
            .select(
                "v",
                F.least(F.col("lbl"), F.coalesce("jlbl", F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@register(
    "llm_text_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents),
    per_lang AS (
      SELECT lang, count(*) AS total_tokens,
             count(DISTINCT token) AS distinct_tokens
      FROM tok GROUP BY lang),
    docs AS (
      SELECT lang, count(*) AS doc_cnt, round(avg(n_chars), 6) AS avg_chars
      FROM documents GROUP BY lang)
    SELECT d.lang, d.doc_cnt, d.avg_chars, p.total_tokens, p.distinct_tokens,
           round(CAST(p.distinct_tokens AS DOUBLE) / p.total_tokens, 6) AS type_token_ratio
    FROM docs d JOIN per_lang p ON d.lang = p.lang
    """,
)
@plan_memo
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics: doc count, avg chars, token counts,
    type-token ratio. Bench headline op — one SQL text (see ``sql_q``),
    identical plan to the explode/groupBy/join chain."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH tok AS (
          SELECT doc_id, lang, explode(split(text, ' ')) AS token FROM documents),
        per_lang AS (
          SELECT lang, count(*) AS total_tokens,
                 count(DISTINCT token) AS distinct_tokens
          FROM tok GROUP BY lang),
        docs AS (
          SELECT lang, count(*) AS doc_cnt, round(avg(n_chars), 6) AS avg_chars
          FROM documents GROUP BY lang)
        SELECT d.lang, d.doc_cnt, d.avg_chars, p.total_tokens, p.distinct_tokens,
               round(cast(p.distinct_tokens AS double) / p.total_tokens, 6)
                 AS type_token_ratio
        FROM docs d JOIN per_lang p ON d.lang = p.lang
        """,
    )


@register(
    "llm_tfidf_keywords",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents),
    n AS (SELECT count(*) AS n_docs FROM documents),
    df AS (SELECT token, count(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY token),
    tf AS (SELECT lang, token, count(*) AS term_freq FROM tok GROUP BY lang, token),
    scored AS (
      SELECT tf.lang, tf.token,
             round(tf.term_freq * ln(CAST(n.n_docs AS DOUBLE) / df.doc_freq), 6) AS tfidf
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
    SELECT lang, token, tfidf FROM (
      SELECT lang, token, tfidf,
             row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, token) AS rn
      FROM scored) x
    WHERE rn <= 5
    """,
)
def llm_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 tokens per language by TF-IDF (IDF over documents globally).
    explode → two aggregations → broadcast IDF join → per-group top-k."""
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("token"))
    n_docs = d.count()  # scalar plan parameter (tiny dimension count)
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("doc_freq"))
    tf = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("term_freq"))
    scored = tf.join(F.broadcast(df_), "token").select(
        "lang",
        "token",
        F.round(
            F.col("term_freq") * F.log(F.lit(float(n_docs)) / F.col("doc_freq")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.select("lang", "token", "tfidf", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "llm_quality_filter",
    oracle="""
    SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
    FROM documents
    WHERE n_chars BETWEEN 100 AND 520
      AND len(string_split(text, ' ')) >= 20
      AND lang IN ('en', 'fr', 'es')
    """,
)
def llm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate: length bounds + minimum token count + language
    allowlist — the composable filter stage of a training-data pipeline."""
    d = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    return (
        d.where(
            F.col("n_chars").between(100, 520)
            & (n_tokens >= 20)
            & F.col("lang").isin("en", "fr", "es")
        )
        .select("doc_id", "lang", n_tokens.alias("n_tokens"))
    )


_LANG_MARKERS = {
    "de": ("customer", "hash"),
    "en": ("order", "table", "window"),
    "es": ("slow", "agg", "merge"),
    "fr": ("scan", "batch", "query"),
    "zh": ("join", "small"),
}


@register(
    "llm_lang_id",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
        CAST(len(list_filter(string_split(text,' '), x -> x IN ('customer','hash'))) AS INT) AS s_de,
        CAST(len(list_filter(string_split(text,' '), x -> x IN ('order','table','window'))) AS INT) AS s_en,
        CAST(len(list_filter(string_split(text,' '), x -> x IN ('slow','agg','merge'))) AS INT) AS s_es,
        CAST(len(list_filter(string_split(text,' '), x -> x IN ('scan','batch','query'))) AS INT) AS s_fr,
        CAST(len(list_filter(string_split(text,' '), x -> x IN ('join','small'))) AS INT) AS s_zh
      FROM documents)
    SELECT doc_id,
           CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS predicted_lang,
           (CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END = lang) AS is_correct
    FROM scored
    """,
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic: count per-language marker tokens
    (chosen from each language's measured top-frequency tokens), argmax with
    a fixed precedence tie-break. Deterministic → exact oracle."""
    d = t(spark, sf_dir, "documents")
    scores = {
        lang: F.expr(
            "size(filter(split(text, ' '), x -> x IN ({})))".format(
                ", ".join(f"'{m}'" for m in markers)
            )
        )
        for lang, markers in _LANG_MARKERS.items()
    }
    predicted = (
        F.when(
            (scores["de"] >= scores["en"])
            & (scores["de"] >= scores["es"])
            & (scores["de"] >= scores["fr"])
            & (scores["de"] >= scores["zh"]),
            "de",
        )
        .when(
            (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["zh"]),
            "en",
        )
        .when((scores["es"] >= scores["fr"]) & (scores["es"] >= scores["zh"]), "es")
        .when(scores["fr"] >= scores["zh"], "fr")
        .otherwise("zh")
    )
    return d.select(
        "doc_id",
        predicted.alias("predicted_lang"),
        (predicted == F.col("lang")).alias("is_correct"),
    )


@register(
    "llm_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           list_aggregate(
             list_transform(generate_series(1, len(string_split(text,' ')) - 2),
               i -> md5(concat_ws(' ', string_split(text,' ')[i],
                                       string_split(text,' ')[i+1],
                                       string_split(text,' ')[i+2]))),
             'min') AS fingerprint
    FROM documents
    """,
)
def llm_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-fingerprint (winnowing-lite): min md5 over all 3-token
    shingles — a compact rolling-hash signature for container-level dedup."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(
            "array_min(transform(sequence(0, size(split(text,' ')) - 3),"
            " i -> md5(concat_ws(' ', split(text,' ')[i],"
            " split(text,' ')[i+1], split(text,' ')[i+2]))))"
        ).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# multimodal-column plumbing
# ---------------------------------------------------------------------------


@register(
    "mm_decode_stub",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(ascii(text) AS INT) AS first_byte,
           CAST(floor(octet_length(encode(text)) / 100) + 1 AS INT) AS frame_cnt
    FROM documents WHERE text IS NOT NULL
    """,
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column plumbing: pack text into an opaque BINARY payload
    column (stand-in for image/audio bytes — no codec libs in this
    environment), then run a mapInPandas "decoder" that extracts typed
    features per Arrow batch. The DECODE IS A DETERMINISTIC FAKE (byte
    length / first byte / fake frame count); the Spark-side plumbing —
    binary column, schema, Arrow batching, UDF signature — is real and is
    what a real image decoder would plug into. NULL payloads are skipped
    on both sides (r15 null sweep): a decoder has no bytes to decode —
    accounting for missing payloads is mm_modality_router's job."""

    def decode(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            blen = payloads.map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": blen,
                    # real impl: PIL.Image.open(io.BytesIO(payload)) etc.
                    "first_byte": payloads.map(lambda b: b[0]).astype("int32"),
                    "frame_cnt": (blen // 100 + 1).astype("int32"),
                }
            )

    d = t(spark, sf_dir, "documents").where(F.col("text").isNotNull()).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(decode, "doc_id long, byte_len long, first_byte int, frame_cnt int")


@register(
    "mm_frame_sample",
    oracle="""
    WITH sized AS (
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS n_frames
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(byte_len AS BIGINT) AS byte_len,
           n_frames,
           CAST(len(range(0, n_frames, 4)) AS BIGINT) AS n_sampled,
           CAST(list_aggregate(
               list_transform(range(0, n_frames, 4),
                   i -> i * 7 + CASE WHEN i < n_frames - 1 THEN 16
                                     ELSE byte_len - 16 * (n_frames - 1) END),
               'sum') AS BIGINT) AS checksum
    FROM sized
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plumbing (video stand-in): chunk an opaque
    BINARY payload into fixed 16-byte "frames", keep every 4th frame, and
    emit per-doc frame stats. The payload here is the utf-8 text bytes (no
    video codecs in this environment) and the per-frame "feature" is a
    deterministic function of frame index + length — but the Spark-side
    shape is the real thing: binary column in, Arrow batches through
    mapInPandas, per-frame python loop over real byte slices, typed rows
    out. A real frame sampler (pyav / decord) drops into `sample()`
    unchanged. Scale: pure map-side — no shuffle, linear in corpus bytes."""

    def sample(batches):
        for pdf in batches:
            out = {"doc_id": [], "byte_len": [], "n_frames": [], "n_sampled": [], "checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                frames = [buf[o : o + 16] for o in range(0, len(buf), 16)]
                sampled = frames[::4]
                # real impl: decode each sampled frame; here a deterministic
                # feature of (index, frame byte-length)
                checksum = sum(4 * k * 7 + len(fr) for k, fr in enumerate(sampled))
                out["doc_id"].append(doc_id)
                out["byte_len"].append(len(buf))
                out["n_frames"].append(len(frames))
                out["n_sampled"].append(len(sampled))
                out["checksum"].append(checksum)
            yield pd.DataFrame(out).astype("int64")

    d = t(spark, sf_dir, "documents").where(F.col("text").isNotNull()).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        sample, "doc_id long, byte_len long, n_frames long, n_sampled long, checksum long"
    )


_BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


@register(
    "llm_token_bpe",
    oracle=r"""
    WITH per_doc AS (
        SELECT lang,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(bpe) AS BIGINT) AS sum_bpe,
           CAST(sum(ws) AS BIGINT) AS sum_ws,
           round(avg(bpe), 6) AS avg_bpe,
           round(CAST(sum(bpe) AS DOUBLE) / sum(ws), 6) AS fertility
    FROM per_doc GROUP BY lang
    """,
)
def llm_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (north-star "token counting: whitespace + a
    BPE-ish regex"): pre-tokenize with the GPT-2-style split — letter runs,
    digit runs, single non-alnum symbols (CJK falls back to per-character,
    as byte-BPE does) — and compare against whitespace tokenization via the
    fertility ratio per language. ASCII-only regex classes keep Java regex
    and RE2 semantics identical. Scale: map-side regexp + one shuffle on
    lang; no Python boundary."""
    d = t(spark, sf_dir, "documents").select(
        "lang",
        # pattern as a Column literal — routing it through F.expr would make
        # Spark's SQL string parser eat the \s escape ([^...\s] -> [^...s])
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)).cast("long").alias("bpe"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("ws"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe").alias("sum_bpe"),
        F.sum("ws").alias("sum_ws"),
        ratio(F.avg("bpe")).alias("avg_bpe"),
        ratio(F.sum("bpe") / F.sum("ws")).alias("fertility"),
    )


_STOPWORDS = "the a an and of to in is for on".split()


@register(
    "llm_quality_score",
    oracle=rf"""
    WITH scored AS (
        SELECT source,
               round(
                 0.4 * (1 - CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                  tk -> list_contains({_STOPWORDS!r}, tk))) AS DOUBLE)
                        / len(regexp_split_to_array(trim(text), '\s+')))
               + 0.3 * (1 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                        / length(text))
               + 0.3 * least(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                        / len(regexp_split_to_array(trim(text), '\s+')) / 10, 1.0)
               , 6) AS score
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(score), 6) AS avg_score,
           CAST(count(*) FILTER (score >= 0.8) AS BIGINT) AS high_q
    FROM scored GROUP BY source
    """,
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous document quality scoring (north-star "quality scoring:
    length/punct/stopword ratios") — complements llm_quality_filter's hard
    gate with a weighted score: low stopword ratio + low punctuation ratio
    + healthy mean word length. Identical float expression tree on both
    engines, rounded once at 6 dp. Scale: map-side only + one agg shuffle
    on source."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    ltoks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    stop_cnt = F.size(
        F.filter(ltoks, lambda tk: tk.isin(*_STOPWORDS))
    )
    punct_cnt = F.length("text") - F.length(F.regexp_replace("text", "[.,!?;:]", ""))
    nonws_len = F.length(F.regexp_replace("text", r"\s", ""))
    score = F.round(
        0.4 * (1 - stop_cnt.cast("double") / F.size(toks))
        + 0.3 * (1 - punct_cnt.cast("double") / F.length("text"))
        + 0.3 * F.least(nonws_len.cast("double") / F.size(toks) / 10, F.lit(1.0)),
        6,
    )
    d = t(spark, sf_dir, "documents").select("source", score.alias("score"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        ratio(F.avg("score")).alias("avg_score"),
        F.sum(F.when(F.col("score") >= 0.8, 1).otherwise(0)).alias("high_q"),
    )


#: Shared by llm_ivf_ann (in-query assignment) and llm_ivf_index_persist
#: (assignment built once, persisted, probe reads the stored lists): the
#: two ops are REQUIRED to produce the identical answer — same centroids,
#: same argmax assignment, same nprobe=4 probe lists, same top-10 — so
#: they share one oracle text verbatim.
_IVF_ANN_ORACLE = f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cent FROM embeddings WHERE vec_id < 16),
    probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
    assigned AS (
        SELECT vec_id, cent_id FROM (
            SELECT e.vec_id, c.cent_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round({_DOT_ORACLE.format(a='e.embedding', b='c.cent')}, 6) DESC,
                                c.cent_id) AS rn
            FROM embeddings e CROSS JOIN cents c)
        WHERE rn = 1),
    plists AS (
        SELECT cent_id FROM cents CROSS JOIN probe
        ORDER BY round({_DOT_ORACLE.format(a='cent', b='p')}, 6) DESC, cent_id
        LIMIT 4)
    SELECT e.vec_id, a.cent_id,
           round({_DOT_ORACLE.format(a='e.embedding', b='p')}, 6) AS sim
    FROM embeddings e
    JOIN assigned a ON e.vec_id = a.vec_id
    JOIN plists l ON a.cent_id = l.cent_id
    CROSS JOIN probe
    WHERE e.vec_id <> 0
    ORDER BY sim DESC, e.vec_id
    LIMIT 10
    """


@register("llm_ivf_ann", oracle=_IVF_ANN_ORACLE)
def llm_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate nearest neighbor — the scale path for
    similarity search. Coarse quantizer: 16 deterministic centroids (the
    vectors with vec_id < 16 stand in for trained k-means means, keeping
    the op exactly oracle-checkable). Index build: every vector gets one
    inverted-list assignment = argmax centroid cosine (map-side N×K dot
    products against broadcast centroids, one shuffle on vec_id for the
    argmax). Search: probe scans only its nprobe=4 nearest lists — at
    100 TB with K=sqrt(N) lists this turns a full-corpus scan into a
    ~nprobe/K fraction, and the assignment is a write-once index persisted
    alongside the table."""
    e = t(spark, sf_dir, "embeddings")
    cents = F.broadcast(
        t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 16)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent"))
    )
    probe = F.broadcast(
        t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("p"))
    )

    rn = Window.partitionBy("vec_id").orderBy(
        F.round(_dot(F.col("embedding"), F.col("cent")), 6).desc(), "cent_id"
    )
    assigned = (
        e.crossJoin(cents)
        .withColumn("rn", F.row_number().over(rn))
        .where(F.col("rn") == 1)
        .select("vec_id", "cent_id")
    )
    plists = F.broadcast(
        cents.crossJoin(probe)
        .orderBy(F.round(_dot(F.col("cent"), F.col("p")), 6).desc(), "cent_id")
        .limit(4)
        .select("cent_id")
    )
    return (
        e.join(assigned, "vec_id")
        .join(plists, "cent_id")
        .crossJoin(probe)
        .where(F.col("vec_id") != 0)
        .select("vec_id", "cent_id", F.round(_dot(F.col("embedding"), F.col("p")), 6).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )


@register("llm_ivf_index_persist", oracle=_IVF_ANN_ORACLE)
def llm_ivf_index_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the index PERSISTED — makes llm_ivf_ann's "write-once
    index" claim real (r15 verdict task #6). llm_ivf_ann rebuilds the
    inverted-list assignment inside every query; here the build is a
    separate, once-per-corpus step whose output is written to parquet
    PARTITIONED BY cent_id (each partition directory IS one inverted
    list, holding its members' vectors — the on-disk layout of a real
    IVF index), and the probe path reads ONLY the stored lists:

      * build (once; skipped when the index on disk carries the current
        corpus fingerprint): argmax-centroid assignment — map-side N×K
        dots against 16 broadcast centroids, one row_number window —
        written as (vec_id, embedding) under cent_id= partitions;
      * probe (every query): the nprobe=4 nearest list ids are computed
        from the 16 broadcast centroids and collected (4 rows — bounded
        by nprobe, never by corpus), then the probe scans exactly those
        4 partition directories via partition pruning (the plan shows
        PartitionFilters on cent_id and NO window/assignment stage —
        asserted by tests/test_plans.py::test_ivf_persist_probe_plan),
        computes the query dots, and TakeOrdered's the top 10.

    At 100 TB this is the difference between an ANN service and a batch
    job: the N×K assignment (the expensive part) is paid once per corpus
    version and amortized over every query, each of which touches
    ~nprobe/K of the data. The corpus fingerprint (mtime+size of the
    embeddings parquet) invalidates the index on regeneration, so a
    stale index can never serve a new corpus. Results are REQUIRED to be
    identical to llm_ivf_ann (same oracle text verbatim): persisting the
    assignment must not change a single neighbor."""
    import json
    import os
    from hashlib import md5 as _md5

    from ..sources._scratch import scratch_dir

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    fingerprint = f"{st.st_mtime_ns}:{st.st_size}"
    root = scratch_dir("ivf_index")
    idx_dir = os.path.join(root, _md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12])
    data_dir = os.path.join(idx_dir, "lists")
    meta_path = os.path.join(idx_dir, "meta.json")

    cents = F.broadcast(
        t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 16)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent"))
    )

    def _index_current() -> bool:
        try:
            with open(meta_path) as fh:
                return json.load(fh).get("fingerprint") == fingerprint
        except (FileNotFoundError, json.JSONDecodeError):
            return False

    if not _index_current():
        e = t(spark, sf_dir, "embeddings")
        rn = Window.partitionBy("vec_id").orderBy(
            F.round(_dot(F.col("embedding"), F.col("cent")), 6).desc(), "cent_id"
        )
        (
            e.crossJoin(cents)
            .withColumn("rn", F.row_number().over(rn))
            .where(F.col("rn") == 1)
            .select("vec_id", "embedding", "cent_id")
            .write.mode("overwrite")
            .partitionBy("cent_id")
            .parquet(data_dir)
        )
        os.makedirs(idx_dir, exist_ok=True)
        with open(meta_path, "w") as fh:
            json.dump({"fingerprint": fingerprint, "k": 16, "nprobe": 4}, fh)

    probe = F.broadcast(
        t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("p"))
    )
    # nprobe list selection: 16 centroids × 1 probe — the collect is
    # bounded at nprobe rows by construction (never corpus-scaled), and
    # materializing the ids as LITERALS is what lets the scan below prune
    # to exactly these partition directories at plan time.
    probe_ids = [
        r.cent_id
        for r in cents.crossJoin(probe)
        .orderBy(F.round(_dot(F.col("cent"), F.col("p")), 6).desc(), "cent_id")
        .limit(4)
        .select("cent_id")
        .collect()
    ]
    lists = spark.read.parquet(data_dir)
    return (
        lists.where(F.col("cent_id").isin(probe_ids))
        .where(F.col("vec_id") != 0)
        .crossJoin(probe)
        .select(
            "vec_id",
            F.col("cent_id").cast("long").alias("cent_id"),
            F.round(_dot(F.col("embedding"), F.col("p")), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )


@register(
    "llm_seq_packing",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
        FROM documents),
    packed AS (
        SELECT source, doc_id, n_tok,
               CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - n_tok) / 512) AS BIGINT) AS bin_id
        FROM toks)
    SELECT source, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY source, bin_id
    """,
)
def llm_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training batches: docs stream into
    512-token bins per source in deterministic doc_id order — bin id =
    floor(preceding-token-cumsum / 512), the standard streaming
    first-fit used by training-data pipelines (bins can overflow by one
    doc; no doc is split). One shuffle on source for the cumsum window;
    at 100 TB packing runs per input shard and bin ids offset by shard."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.select(
        "source",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 512).alias("bin_id"),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("bin_tokens"),
    )


@register(
    "mm_image_resize_stub",
    oracle="""
    WITH meta AS (
        SELECT doc_id,
               CAST(64 + (doc_id * 37) % 960 AS INT) AS width,
               CAST(64 + (doc_id * 53) % 960 AS INT) AS height
        FROM documents WHERE doc_id < 500)
    SELECT doc_id, width, height,
           CAST(CASE WHEN width >= height
                THEN CAST(floor(256.0 * width / height) AS INT)
                ELSE 256 END AS INT) AS out_w,
           CAST(CASE WHEN width >= height
                THEN 256
                ELSE CAST(floor(256.0 * height / width) AS INT) END AS INT) AS out_h
    FROM meta
    """,
)
def mm_image_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize plumbing (image stand-in): typed (width, height)
    metadata rides next to an opaque payload column; an Arrow-batched
    mapInPandas "resizer" computes shortest-side-256 output dims
    (aspect-preserving — the CLIP/ViT preprocessing contract). Dims are
    synthesized deterministically from doc_id (no image libs in this
    environment); a real cv2/PIL resize drops into `resize()` with the
    same schema and batching."""
    import numpy as np

    def resize(batches):
        for pdf in batches:
            w = pdf["width"].to_numpy(dtype="int64")
            h = pdf["height"].to_numpy(dtype="int64")
            landscape = w >= h
            out_w = np.where(landscape, (256.0 * w / h).astype("int64"), 256)
            out_h = np.where(landscape, 256, (256.0 * h / w).astype("int64"))
            # real impl: cv2.resize(decode(payload), (out_w, out_h)) per row
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_w": out_w.astype("int32"),
                    "out_h": out_h.astype("int32"),
                }
            )

    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 500)
        .select(
            "doc_id",
            (64 + (F.col("doc_id") * 37) % 960).cast("int").alias("width"),
            (64 + (F.col("doc_id") * 53) % 960).cast("int").alias("height"),
            F.encode("text", "utf-8").alias("payload"),
        )
    )
    return d.mapInPandas(
        resize, "doc_id long, width int, height int, out_w int, out_h int"
    )


@register(
    "llm_hash_split",
    oracle="""
    WITH tagged AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents),
    totals AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tagged)
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           round(CAST(count(*) AS DOUBLE) / max(total), 6) AS frac
    FROM tagged, totals
    GROUP BY split
    """,
)
def llm_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content-stable hash bucket:
    the first two md5 hex chars of the doc key partition the corpus
    ~80/10/10 ('00'-'cb' / 'cc'-'e5' / 'e6'-'ff' of 256 buckets). The
    assignment is a map-side expression — no shuffle, no RNG state, and
    re-running over 100 TB (or over tomorrow's corpus) lands every
    surviving doc in the same split; only the tiny 3-group agg shuffles."""
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    tagged = t(spark, sf_dir, "documents").select(
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
        F.when(bucket < "cc", "train").when(bucket < "e6", "val").otherwise("test").alias("split"),
    )
    w_all = Window.partitionBy()
    return (
        tagged.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("total_tokens"))
        .withColumn("frac", ratio(F.col("n_docs") / F.sum("n_docs").over(w_all)))
    )


@register(
    "llm_contamination",
    oracle="""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS tk,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'f' AS is_eval
        FROM documents),
    grams AS (
        SELECT doc_id, is_eval,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(tk) - 4),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                        || ' ' || tk[i+3] || ' ' || tk[i+4]))) AS gram
        FROM base WHERE len(tk) >= 5),
    train_grams AS (SELECT DISTINCT gram FROM grams WHERE NOT is_eval),
    eval_grams AS (SELECT doc_id, gram FROM grams WHERE is_eval)
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(t.gram) AS BIGINT) AS n_shared,
           round(CAST(count(t.gram) AS DOUBLE) / count(*), 6) AS contamination
    FROM eval_grams e LEFT JOIN train_grams t ON e.gram = t.gram
    GROUP BY e.doc_id
    """,
)
def llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: per held-out (eval) document, the
    fraction of its distinct 5-gram shingles that also appear anywhere in
    the train split (hash-bucketed eval = md5 first hex 'f', ~6%). This is
    the standard n-gram-overlap decontamination pass run before training.
    At 100 TB the train gram set is pre-deduplicated (one shuffle on the
    gram), eval grams are a sliver joined against it on the gram key; the
    left join keeps zero-overlap docs in the report."""
    base = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.split(F.col("text"), " ").alias("tk"),
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "f").alias("is_eval"),
    ).where(F.size("tk") >= 5)
    grams = base.select(
        "doc_id",
        "is_eval",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(0, size(tk) - 5),"
                " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4])))"
            )
        ).alias("gram"),
    )
    train_grams = grams.where(~F.col("is_eval")).select("gram").distinct()
    eval_grams = grams.where(F.col("is_eval")).select("doc_id", "gram")
    shared = train_grams.withColumn("hit", F.lit(1))
    return (
        eval_grams.join(shared, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_shared"),
            ratio(F.count("hit") / F.count(F.lit(1))).alias("contamination"),
        )
    )


@register(
    "llm_gopher_repetition",
    oracle="""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        WHERE len(string_split(text, ' ')) >= 2),
    tok_stats AS (
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_tok,
               round(1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6)
                 AS dup_token_frac
        FROM base),
    bigrams AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(tk) - 1),
                                     i -> tk[i] || ' ' || tk[i+1])) AS gram
        FROM base),
    counts AS (
        SELECT doc_id, gram, count(*) AS c FROM bigrams GROUP BY doc_id, gram),
    top AS (
        SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS n_bigrams
        FROM counts GROUP BY doc_id)
    SELECT s.doc_id, s.n_tok, s.dup_token_frac,
           round(CAST(t.top_c AS DOUBLE) / t.n_bigrams, 6) AS top_bigram_frac,
           (s.dup_token_frac > 0.8 OR CAST(t.top_c AS DOUBLE) / t.n_bigrams > 0.1)
             AS flagged
    FROM tok_stats s JOIN top t ON s.doc_id = t.doc_id
    """,
)
def llm_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality rules: per doc, the duplicate-token
    fraction (1 - type/token ratio) and the share of the most frequent
    bigram among all bigrams; a doc is flagged when either exceeds its
    threshold (0.8 / 0.1 — the published rules use per-n-gram thresholds
    of this shape). Token stats are pure map-side expressions; only the
    per-doc bigram count (shuffle on doc_id+gram, combiner-friendly)
    touches the network — linear in corpus size at 100 TB."""
    base = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("tk")
    ).where(F.size("tk") >= 2)
    tok_stats = base.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tok"),
        ratio(1.0 - F.size(F.array_distinct("tk")) / F.size("tk")).alias("dup_token_frac"),
    )
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(tk) - 2), i -> concat_ws(' ', tk[i], tk[i+1]))"
            )
        ).alias("gram"),
    )
    top = (
        bigrams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bigrams"))
    )
    tbf = F.col("top_c") / F.col("n_bigrams")
    return tok_stats.join(top, "doc_id").select(
        "doc_id",
        "n_tok",
        "dup_token_frac",
        ratio(tbf).alias("top_bigram_frac"),
        ((F.col("dup_token_frac") > 0.8) | (tbf > 0.1)).alias("flagged"),
    )


@register(
    "llm_window_chunking",
    oracle="""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        WHERE text IS NOT NULL),
    chunks AS (
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_tok,
               unnest(list_transform(
                   generate_series(0, CAST(greatest(ceil((len(tk) - 64) / 48e0), 0) AS BIGINT)),
                   c -> struct_pack(
                       chunk_id := c,
                       chunk_tokens := CAST(least(64, len(tk) - c * 48) AS BIGINT),
                       chunk_text := array_to_string(tk[c*48 + 1 : c*48 + 64], ' ')))) AS ch
        FROM base)
    SELECT doc_id, n_tok,
           CAST(ch.chunk_id AS BIGINT) AS chunk_id,
           ch.chunk_tokens, md5(ch.chunk_text) AS chunk_md5
    FROM chunks
    """,
)
def llm_window_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking for LLM training/RAG ingest: each document
    splits into 64-token windows with stride 48 (16-token overlap), the
    standard sliding-window prep for models with a fixed context. The
    chunk count per doc is ceil((n-64)/48)+1 (always ≥1 — short docs
    yield one partial chunk). Pure map-side transform+explode — no
    shuffle at all; at 100 TB chunking streams through the scan and the
    output is written partition-local. Chunk text is md5'd in the result
    so the oracle compares content identity without hauling strings.
    NULL text yields zero chunks on both sides (r15 null sweep — and a
    portability exhibit: Spark's greatest/least SKIP null arguments
    while DuckDB's propagate them, so the unfiltered chunk-count
    formula emitted one md5('')-chunk in Spark and none in DuckDB)."""
    base = (
        t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.split(F.col("text"), " ").alias("tk"))
    )
    chunks = base.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tok"),
        F.explode(
            F.expr(
                "transform(sequence(0, int(greatest(ceil((size(tk) - 64) / 48e0), 0))),"
                " c -> struct(bigint(c) AS chunk_id,"
                "            bigint(least(64, size(tk) - c * 48)) AS chunk_tokens,"
                "            concat_ws(' ', slice(tk, c * 48 + 1, 64)) AS chunk_text))"
            )
        ).alias("ch"),
    )
    return chunks.select(
        "doc_id",
        "n_tok",
        F.col("ch.chunk_id").alias("chunk_id"),
        F.col("ch.chunk_tokens").alias("chunk_tokens"),
        F.md5(F.col("ch.chunk_text")).alias("chunk_md5"),
    )


@register(
    "llm_source_mixture",
    oracle="""
    WITH per_source AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total_tokens,
                   CAST(count(*) AS DOUBLE) AS n_sources
            FROM per_source)
    SELECT source, n_docs, n_tokens,
           round(n_tokens / total_tokens, 6) AS token_share,
           round((total_tokens / n_sources) / n_tokens, 6) AS uniform_upsample
    FROM per_source, tot
    """,
)
def llm_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture accounting per source: token counts, the source's
    share of the corpus, and the repeat factor that would equalize every
    source to a uniform token budget (the number data-mixing configs are
    built from — >1 means upsample, <1 means downsample). Token counting
    is map-side; one shuffle to the ~20 source groups; the corpus total
    joins back as a broadcast of the tiny aggregate, not a global window."""
    per_source = (
        t(spark, sf_dir, "documents")
        .select("source", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )
    tot = per_source.agg(
        F.sum("n_tokens").cast("double").alias("total_tokens"),
        F.count(F.lit(1)).cast("double").alias("n_sources"),
    )
    return per_source.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        ratio(F.col("n_tokens") / F.col("total_tokens")).alias("token_share"),
        ratio((F.col("total_tokens") / F.col("n_sources")) / F.col("n_tokens")).alias(
            "uniform_upsample"
        ),
    )


@register(
    "llm_curriculum_buckets",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS ttr
        FROM documents),
    cuts AS (
        SELECT round(quantile_cont(ttr, 0.25), 9) AS q1,
               round(quantile_cont(ttr, 0.50), 9) AS q2,
               round(quantile_cont(ttr, 0.75), 9) AS q3
        FROM scored),
    phased AS (
        SELECT s.n_tok, s.ttr,
               CAST(1 + CAST(s.ttr > c.q1 AS INT)
                      + CAST(s.ttr > c.q2 AS INT)
                      + CAST(s.ttr > c.q3 AS INT) AS INT) AS phase
        FROM scored s CROSS JOIN cuts c)
    SELECT phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS phase_tokens,
           round(avg(ttr), 6) AS avg_ttr,
           round(min(ttr), 6) AS min_ttr,
           round(max(ttr), 6) AS max_ttr
    FROM phased GROUP BY phase
    """,
)
def llm_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing: score the corpus by a quality proxy
    (type-token ratio) and cut it into 4 quantile-bounded training phases
    with per-phase token budgets — the phase assignment curriculum
    schedules consume. Scale shape: quartile CUTPOINTS are computed once
    as a 1-row aggregate (exact ``percentile`` here, mergeable
    ``approx_percentile``/t-digest at 100 TB), broadcast, and every doc is
    bucketed MAP-SIDE by comparing against them — no global sort, no
    unpartitioned window, the only corpus-wide shuffle is the final
    4-group aggregate. (Round-2 version used a global ``ntile(4)`` — a
    single-task whole-corpus sort at scale; VERDICT r2 item #5.)
    Cutpoints are rounded to 9 dp on both sides so a 1-ulp interpolation
    difference between Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` can't flip a boundary comparison (ttr itself is on
    a 1e-6 grid)."""
    scored = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
        ratio(
            F.size(F.array_distinct(F.split(F.col("text"), " ")))
            / F.size(F.split(F.col("text"), " "))
        ).alias("ttr"),
    )
    cuts = scored.agg(
        F.round(F.expr("percentile(ttr, 0.25)"), 9).alias("q1"),
        F.round(F.expr("percentile(ttr, 0.50)"), 9).alias("q2"),
        F.round(F.expr("percentile(ttr, 0.75)"), 9).alias("q3"),
    )
    phased = scored.crossJoin(F.broadcast(cuts)).select(
        "n_tok",
        "ttr",
        (
            F.lit(1)
            + (F.col("ttr") > F.col("q1")).cast("int")
            + (F.col("ttr") > F.col("q2")).cast("int")
            + (F.col("ttr") > F.col("q3")).cast("int")
        ).cast("int").alias("phase"),
    )
    return phased.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("phase_tokens"),
        ratio(F.avg("ttr")).alias("avg_ttr"),
        ratio(F.min("ttr")).alias("min_ttr"),
        ratio(F.max("ttr")).alias("max_ttr"),
    )


@register(
    "llm_embedding_stats",
    oracle="""
    WITH flat AS (
        SELECT CAST(generate_subscripts(embedding, 1) AS INT) - 1 AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings)
    SELECT dim,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(val), 6) AS mean_val,
           round(stddev_samp(val), 6) AS std_val,
           round(min(val), 6) AS min_val,
           round(max(val), 6) AS max_val
    FROM flat GROUP BY dim
    """,
)
def llm_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column health check: per-dimension mean/std/min/max over
    the corpus — the feature-drift / dead-dimension / collapsed-variance
    audit run before training on a new embedding batch. posexplode keeps
    the dimension index; the shuffle is to 64 dim groups with map-side
    partial aggregation, so network traffic is O(dims × partitions), not
    O(rows × dims), no matter how large the corpus."""
    flat = t(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("dim", "fval")
    ).select("dim", F.col("fval").cast("double").alias("val"))
    return flat.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        ratio(F.avg("val")).alias("mean_val"),
        ratio(F.stddev_samp("val")).alias("std_val"),
        ratio(F.min("val")).alias("min_val"),
        ratio(F.max("val")).alias("max_val"),
    )


@register(
    "llm_perplexity_proxy",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    freq AS (
        SELECT token, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY token),
    tot AS (SELECT sum(c) AS n FROM freq)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tok,
           round(avg(-ln(f.c / tot.n)), 6) AS avg_nll
    FROM tok t JOIN freq f ON t.token = f.token, tot
    GROUP BY t.doc_id
    """,
)
def llm_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity proxy: each doc scored by the mean negative
    log-likelihood of its tokens under the corpus unigram distribution —
    the cheap statistical stand-in for model-based perplexity filtering
    (high avg_nll = rare-token-heavy = boilerplate/garbage candidates).
    The unigram table is a tiny aggregate broadcast back against the
    token stream; at 100 TB the vocabulary fits in a broadcast while the
    token explode never leaves the map side until the per-doc agg."""
    tok = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = freq.agg(F.sum("c").alias("n"))
    return (
        tok.join(F.broadcast(freq), "token")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            ratio(F.avg(-F.log(F.col("c") / F.col("n")))).alias("avg_nll"),
        )
    )


@register(
    "llm_stratified_sample",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, lang,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h,
             CASE lang WHEN 'en' THEN '80'
                       WHEN 'de' THEN 'c0'
                       WHEN 'fr' THEN 'c0'
                       WHEN 'es' THEN '40'
                       ELSE 'ff' END AS cut
      FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE h < cut) AS BIGINT) AS n_kept,
           round(CAST(count(*) FILTER (WHERE h < cut) AS DOUBLE) / count(*), 6)
               AS kept_frac
    FROM tagged GROUP BY lang
    """,
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified downsampling — the corpus-
    rebalancing step of a training-data pipeline (downweight the dominant
    language, keep the rare ones whole). Selection is content-addressed:
    keep a doc iff the md5(doc_id) hex prefix falls below the stratum's
    cut (en 50%, de/fr 75%, es 25%, zh 100%) — reproducible across runs
    and engines, no RNG, no shuffle beyond the one counting aggregate,
    and trivially parallel at 100 TB (a map-side filter)."""
    d = t(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    cut = (
        F.when(F.col("lang") == "en", "80")
        .when(F.col("lang").isin("de", "fr"), "c0")
        .when(F.col("lang") == "es", "40")
        .otherwise("ff")
    )
    kept = F.count(F.when(h < cut, F.lit(1)))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        kept.alias("n_kept"),
        ratio(kept.cast("double") / F.count(F.lit(1))).alias("kept_frac"),
    )


@register(
    "llm_pii_scrub",
    oracle="""
    WITH scrubbed AS (
      SELECT event_type,
             len(regexp_extract_all(props, '[0-9]+\\.?[0-9]*')) AS n_nums,
             regexp_replace(props, '[0-9]+\\.?[0-9]*', '<NUM>', 'g') AS red
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(n_nums) AS BIGINT) AS n_redactions,
           CAST(sum(len(red)) AS BIGINT) AS redacted_len_sum
    FROM scrubbed GROUP BY event_type
    """,
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII/numeric scrubbing over the raw props payload — the
    redact-before-training step (here: every numeric literal → <NUM>;
    production swaps in email/phone/ssn patterns, same plumbing). Count
    and replace run as JVM-side regexp built-ins inside one codegen'd
    projection — no Python in the hot path — then a per-type audit
    aggregate reports redaction volume. DuckDB needs the 'g' flag to
    match Spark's replace-all semantics."""
    e = t(spark, sf_dir, "events")
    pat = r"[0-9]+\.?[0-9]*"
    scrub = e.select(
        "event_type",
        F.size(F.regexp_extract_all("props", F.lit(pat), F.lit(0))).alias("n_nums"),
        F.length(F.regexp_replace("props", pat, "<NUM>")).alias("red_len"),
    )
    return scrub.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("n_nums").cast("long").alias("n_redactions"),
        F.sum("red_len").cast("long").alias("redacted_len_sum"),
    )


@register(
    "llm_incremental_bloom_dedup",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE doc_id % 10 >= 8 AND text IS NOT NULL
      AND md5(text) NOT IN (SELECT md5(text) FROM documents
                            WHERE doc_id % 10 < 8 AND text IS NOT NULL)
    """,
)
def llm_incremental_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-batch dedup with a hand-rolled distributed Bloom
    prefilter: docs with ``doc_id % 10 < 8`` stand in for the already-
    ingested corpus, the rest for today's batch; the op returns the batch
    docs whose content is genuinely new.

    The 100 TB shape this demonstrates: anti-joining a small daily batch
    against the full corpus hash set shuffles the corpus every day. A
    Bloom filter of the corpus hashes is a fixed-size bitmap (m bits,
    built once with a bit_or aggregate — here m = 2^17 as 2048 64-bit
    words) that routes the batch: positions not all set ⇒ DEFINITELY new,
    emitted with no join at all; all k positions set ⇒ *maybe* duplicate,
    and only that sliver takes the exact anti-join confirm. End result is
    EXACT regardless of the filter's false-positive rate — the bitmap only
    decides who pays for the join — so the plain NOT-IN oracle applies
    verbatim. Spark's built-in bloom_filter_agg/might_contain pair is not
    user-callable in this build (probed: UNRESOLVED_ROUTINE; Spark injects
    it only as a runtime join filter, see join_bloom_filter), so the
    bitmap is built from first principles in DataFrame algebra:
    k=3 affine hash positions per doc -> (word = pos div 64,
    mask = 1 << (pos mod 64)) -> groupBy word, bit_or(mask); membership is a
    broadcast equi-join of batch positions against the <=2048-row word
    table — corpus-size-independent traffic either way.
    ``tests/test_properties.py::test_bloom_dedup_result_independent_of_fp_rate``
    pins the exactness claim metamorphically: shrinking the bitmap 512x
    (FP rate ~1.0) must not change the result set."""
    return _bloom_dedup_impl(spark, sf_dir, m_bits=1 << 17)


def _bloom_dedup_impl(spark: SparkSession, sf_dir: str, m_bits: int) -> DataFrame:
    M = m_bits           # bitmap bits
    W = 64               # word width
    P = 4294967291       # 32-bit prime, same family as llm_minhash_banding
    # NULL text has no content hash — excluded from corpus AND batch on
    # both sides (r15 null sweep: one NULL in the oracle's NOT IN set
    # made EVERY membership test UNKNOWN and emptied the result — the
    # join_null_aware_anti trap biting an oracle).
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    h32 = F.expr("cast(conv(substr(md5(text), 1, 8), 16, 10) as bigint)")
    corpus = docs.where(F.col("doc_id") % 10 < 8).select(
        F.md5("text").alias("h"), h32.alias("h32")
    )
    batch = docs.where(F.col("doc_id") % 10 >= 8).select(
        "doc_id", "source", "n_chars", F.md5("text").alias("h"), h32.alias("h32")
    )

    def positions(df):
        pos = F.explode(
            F.array(
                *[
                    ((F.lit(1000003 * (k + 1)) * F.col("h32") + F.lit(7919 * k + 271)) % P) % M
                    for k in range(3)
                ]
            )
        ).alias("pos")
        return df.select(df["*"], pos)

    words = (
        positions(corpus)
        .select((F.col("pos") / W).cast("long").alias("word_idx"),
                F.expr(f"shiftleft(cast(1 as bigint), int(pos % {W}))").alias("mask"))
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )
    probed = (
        positions(batch)
        .withColumn("word_idx", (F.col("pos") / W).cast("long"))
        .withColumn("mask", F.expr(f"shiftleft(cast(1 as bigint), int(pos % {W}))"))
        .join(F.broadcast(words), "word_idx", "left")
        .withColumn(
            "hit",
            F.coalesce(F.col("word").bitwiseAND(F.col("mask")) != 0, F.lit(False)),
        )
        .groupBy("doc_id", "source", "n_chars", "h")
        .agg(F.min("hit").alias("all_hit"))
    )
    definitely_new = probed.where(~F.col("all_hit")).select(
        "doc_id", "source", "n_chars"
    )
    confirmed_new = (
        probed.where(F.col("all_hit"))
        .join(corpus.select("h").distinct(), "h", "left_anti")
        .select("doc_id", "source", "n_chars")
    )
    return definitely_new.unionByName(confirmed_new)


@register(
    "llm_chunk_overlap_dedup",
    oracle="""
    WITH reps AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    toks AS (
      SELECT d.doc_id, string_split(d.text, ' ') AS tk
      FROM documents d JOIN reps USING (doc_id)),
    chunk AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(tk[i:i+19], ' ')) AS ch
      FROM toks, UNNEST(generate_series(1, len(tk) - 19, 10)) AS t(i)
      WHERE len(tk) >= 20)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM chunk a JOIN chunk b ON a.ch = b.ch AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def llm_chunk_overlap_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring partial-duplicate detection: doc pairs sharing at
    least one verbatim 20-token chunk (stride 10, so any >=30-token
    verbatim overlap is guaranteed to align with some chunk) — the
    substring-level dedup family that catches boilerplate and quoted
    passages MinHash's whole-document Jaccard dilutes away. Chunks are
    md5'd (20-token string -> 32 bytes) and pairs form ONLY inside
    equal-hash buckets — a hash-partitioned equi-join, linear in corpus
    size, never all-pairs.

    EXACT collapse first (round 14 — 1000× probe filled 58 GB of local
    shuffle spill and died on disk): pairs form over one representative
    per DISTINCT text (min doc_id over md5(text)), same reps CTE on the
    oracle side. Verbatim copies share every chunk bucket, so the
    uncollapsed pair set grows copies² under duplicate amplification
    (24 M pairs at 100×, ~2.4 B at 1000×) while carrying zero partial-dup
    information — copy↔copy pairs are EXACT duplicates, llm_exact_dedup /
    llm_dedup_survivorship's jurisdiction. Distinct-content grain is the
    production semantics and keeps the pair population a function of
    distinct content, not crawl duplication. 100 TB skew note: chunks
    shared by thousands of DISTINCT docs (licence headers, navigation
    boilerplate) still make quadratic buckets; production inserts a
    doc-frequency cap on chunks (drop ch with count > N as "stop-chunks")
    before the self-join — omitted here so the oracle stays the exact
    pair set."""
    reps = (
        t(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d = (
        t(spark, sf_dir, "documents")
        .join(reps, "doc_id")
        .select("doc_id", F.split("text", " ").alias("tk"))
        .where(F.size("tk") >= 20)
    )
    chunk = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 19, 10),"
                " i -> md5(array_join(slice(tk, i, 20), ' ')))"
            )
        ).alias("ch"),
    ).distinct()
    a, b = chunk.alias("a"), chunk.alias("b")
    return (
        a.join(b, (F.col("a.ch") == F.col("b.ch")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


#: Oracle template for llm_chunk_overlap_dedup_capped, parameterized on
#: the stop-chunk doc-frequency cap. The REGISTERED oracle is this
#: template at the default cap (2); tests/test_properties_r16_window.py
#: sweeps a second cap value through `spark.graft.chunk_dedup.stop_df`
#: and formats THIS SAME template with it, so Spark and DuckDB are
#: parameterized from one source at every tested cap (r15 verdict #5).
_CHUNK_CAPPED_ORACLE_TMPL = """
    WITH reps AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    toks AS (
      SELECT d.doc_id, string_split(d.text, ' ') AS tk
      FROM documents d JOIN reps USING (doc_id)),
    chunk AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(tk[i:i+19], ' ')) AS ch
      FROM toks, UNNEST(generate_series(1, len(tk) - 19, 10)) AS t(i)
      WHERE len(tk) >= 20),
    freq AS (SELECT ch, count(*) AS df FROM chunk GROUP BY ch),
    kept AS (
      SELECT c.doc_id, c.ch FROM chunk c JOIN freq USING (ch)
      WHERE freq.df <= {stop_df}),
    dropped AS (
      SELECT c.doc_id, count(*) AS n_stop FROM chunk c JOIN freq USING (ch)
      WHERE freq.df > {stop_df} GROUP BY c.doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared,
           CAST(coalesce(max(da.n_stop), 0) AS BIGINT) AS stop_dropped_a,
           CAST(coalesce(max(db.n_stop), 0) AS BIGINT) AS stop_dropped_b
    FROM kept a
    JOIN kept b ON a.ch = b.ch AND a.doc_id < b.doc_id
    LEFT JOIN dropped da ON da.doc_id = a.doc_id
    LEFT JOIN dropped db ON db.doc_id = b.doc_id
    GROUP BY 1, 2
    """

_CHUNK_CAPPED_DEFAULT_STOP_DF = 2


@register(
    "llm_chunk_overlap_dedup_capped",
    oracle=_CHUNK_CAPPED_ORACLE_TMPL.format(stop_df=_CHUNK_CAPPED_DEFAULT_STOP_DF),
)
def llm_chunk_overlap_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm_chunk_overlap_dedup with the STOP-CHUNK doc-frequency cap that
    op's docstring deferred (r14 verdict task #3) — the piece that makes
    substring dedup survive boilerplate at 100 TB. Chunks shared by more
    than STOP_DF DISTINCT-content docs (licence headers, navigation bars,
    cookie banners) are "stop-chunks": they carry no pairwise-duplication
    signal — membership in a million-doc boilerplate bucket says the docs
    share the BOILERPLATE, not each other's content — yet each such bucket
    forms df² pairs in the uncapped self-join. The cap drops them BEFORE
    pairing, bounding every bucket's width at STOP_DF and the whole pair
    set at (STOP_DF-1)/2 x |kept chunk instances| — linear in corpus.
    tools/boilerplate_probe.py measures the cliff on a header-injected
    amplified corpus: the uncapped pair set grows quadratically in the
    number of distinct docs sharing one header while the capped op stays
    flat.

    What the cap costs is EXACT and audited: pairs connected only through
    stop-chunks vanish (by design — production re-finds true boilerplate
    dups via llm_template_boilerplate_detect), and every surviving pair
    reports how many stop-chunks each member lost (stop_dropped_a/_b),
    computed linearly at doc grain — so a reader can see which pairs'
    n_shared was deflated by the cap. The exact-collapse-first rule from
    the parent op still applies (reps = min doc_id per md5(text), same
    CTE in the oracle): copies² dies at the collapse, boilerplate² dies
    at the cap — the two quadratic killers of substring dedup, handled in
    that order.

    The cap is the conf ``spark.graft.chunk_dedup.stop_df`` (default 2,
    mirroring ``spark.graft.geo_topk.force_cell_deg``'s override
    pattern). Default 2 because the synthetic corpus's chunk
    doc-frequency tops out at 4 (measured sf0.1), so a production-scale
    cap (~100s) would never fire at any oracle-checked tier and the
    capped path would be dead code at the gate — exactly the
    un-exercised-branch failure mode the r14 geo_grid_topk verdict
    flagged. The registered oracle is pinned at the default; the r16
    window test sweeps a second value (3) with the oracle formatted from
    the SAME template, so every tested cap is oracle-proven. At 100 TB
    the cap is the tunable sized by llm_stop_chunk_stats; the plan shape
    is identical at any value."""
    stop_df = int(
        spark.conf.get(
            "spark.graft.chunk_dedup.stop_df",
            str(_CHUNK_CAPPED_DEFAULT_STOP_DF),
        )
    )
    if stop_df < 1:
        raise ValueError(
            f"spark.graft.chunk_dedup.stop_df={stop_df}: a cap below 1 "
            "drops every chunk; use >=1"
        )
    reps = (
        t(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d = (
        t(spark, sf_dir, "documents")
        .join(reps, "doc_id")
        .select("doc_id", F.split("text", " ").alias("tk"))
        .where(F.size("tk") >= 20)
    )
    chunk = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 19, 10),"
                " i -> md5(array_join(slice(tk, i, 20), ' ')))"
            )
        ).alias("ch"),
    ).distinct()
    freq = chunk.groupBy("ch").agg(F.count(F.lit(1)).alias("df"))
    kept = chunk.join(freq.where(F.col("df") <= stop_df), "ch").select("doc_id", "ch")
    dropped = (
        chunk.join(freq.where(F.col("df") > stop_df), "ch")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_stop"))
    )
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(b, (F.col("a.ch") == F.col("b.ch")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    drop_a = dropped.select(
        F.col("doc_id").alias("doc_a"), F.col("n_stop").alias("_sa")
    )
    drop_b = dropped.select(
        F.col("doc_id").alias("doc_b"), F.col("n_stop").alias("_sb")
    )
    return (
        pairs.join(drop_a, "doc_a", "left")
        .join(drop_b, "doc_b", "left")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.coalesce(F.col("_sa"), F.lit(0)).cast("long").alias("stop_dropped_a"),
            F.coalesce(F.col("_sb"), F.lit(0)).cast("long").alias("stop_dropped_b"),
        )
    )


@register(
    "llm_stop_chunk_stats",
    oracle="""
    WITH reps AS (
      SELECT min(doc_id) AS doc_id FROM documents
      WHERE text IS NOT NULL GROUP BY md5(text)),
    toks AS (
      SELECT d.doc_id, string_split(d.text, ' ') AS tk
      FROM documents d JOIN reps USING (doc_id)),
    chunk AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(tk[i:i+19], ' ')) AS ch
      FROM toks, UNNEST(generate_series(1, len(tk) - 19, 10)) AS t(i)
      WHERE len(tk) >= 20),
    freq AS (SELECT ch, CAST(count(*) AS BIGINT) AS df FROM chunk GROUP BY ch)
    SELECT df,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) * df AS BIGINT) AS n_instances,
           CAST(count(*) * df * (df - 1) / 2 AS BIGINT) AS pair_work
    FROM freq GROUP BY df
    """,
)
def llm_stop_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk doc-frequency DISTRIBUTION — the audit that tells you where
    to set llm_chunk_overlap_dedup_capped's STOP_DF before running the
    pair join: per df value, how many distinct chunks have it, how many
    chunk instances they account for, and the pair_work they would
    contribute to the uncapped self-join (n_chunks · df·(df−1)/2 — the
    sum over df > N is EXACTLY the work the cap at N eliminates). On a
    boilerplate-heavy corpus this table has a fat tail (one
    million-distinct-doc licence header = one chunk with pair_work
    ~5·10¹¹); reading it costs one linear chunk pass + a |distinct
    chunks|-grain aggregate, which is why production runs the audit
    BEFORE the O(Σ pair_work) join. Same exact-collapse + chunk scheme
    (20-token window, stride 10) and NULL-text exclusion as the whole
    substring-dedup family, so the df grain matches the capped op's
    routing decision one-for-one."""
    reps = (
        t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d = (
        t(spark, sf_dir, "documents")
        .join(reps, "doc_id")
        .select("doc_id", F.split("text", " ").alias("tk"))
        .where(F.size("tk") >= 20)
    )
    chunk = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 19, 10),"
                " i -> md5(array_join(slice(tk, i, 20), ' ')))"
            )
        ).alias("ch"),
    ).distinct()
    freq = chunk.groupBy("ch").agg(F.count(F.lit(1)).alias("df"))
    return freq.groupBy("df").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        (F.count(F.lit(1)) * F.col("df")).cast("long").alias("n_instances"),
        (F.count(F.lit(1)) * F.col("df") * (F.col("df") - 1) / 2)
        .cast("long")
        .alias("pair_work"),
    )


@register(
    "llm_null_profile",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) - count(text) AS BIGINT) AS null_text,
           CAST(count(*) - count(lang) AS BIGINT) AS null_lang,
           round((count(*) - count(text)) * 1e0 / count(*), 6) AS text_null_rate,
           round((count(*) - count(lang)) * 1e0 / count(*), 6) AS lang_null_rate,
           CAST(sum(CASE WHEN text IS NULL AND lang IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS both_null
    FROM documents GROUP BY source
    """,
)
def llm_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-completeness profile per source — the data-quality gate a
    100 TB ingest runs BEFORE any of the null-sensitive ops in this repo
    (r15 institutionalization of the null-injection tier's lesson: every
    operator had to choose a NULL semantics, and the profile is how a
    pipeline knows which sources force those branches). count(*) −
    count(col) is the portable null counter (count(col) skips NULLs in
    every SQL engine — the one null-skipping behavior you can rely on);
    the co-null column catches rows missing BOTH fields, which usually
    indicates a broken extraction rather than sparse metadata. One
    map-side pass, |sources|-grain aggregate, zero shuffles beyond the
    final group-by — profile cost is a scan, which is why it runs on
    every ingest batch."""
    d = t(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    return d.groupBy("source").agg(
        n.alias("n_docs"),
        (n - F.count("text")).alias("null_text"),
        (n - F.count("lang")).alias("null_lang"),
        F.round((n - F.count("text")) * 1.0 / n, 6).alias("text_null_rate"),
        F.round((n - F.count("lang")) * 1.0 / n, 6).alias("lang_null_rate"),
        F.sum(
            F.when(F.col("text").isNull() & F.col("lang").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("both_null"),
    )


@register(
    "llm_ann_recall_eval",
    oracle=f"""
    WITH probes AS (
        SELECT vec_id AS probe_id, embedding AS p FROM embeddings
        WHERE vec_id % 200 = 0 AND vec_id < 12800 AND embedding IS NOT NULL),
    cents AS (
        SELECT vec_id AS cent_id, embedding AS cent FROM embeddings WHERE vec_id < 16 AND embedding IS NOT NULL),
    assigned AS (
        SELECT vec_id, cent_id FROM (
            SELECT e.vec_id, c.cent_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round({_DOT_ORACLE.format(a='e.embedding', b='c.cent')}, 6) DESC,
                                c.cent_id) AS rn
            FROM embeddings e CROSS JOIN cents c WHERE e.embedding IS NOT NULL)
        WHERE rn = 1),
    plists AS (
        SELECT probe_id, cent_id FROM (
            SELECT pr.probe_id, c.cent_id,
                   row_number() OVER (
                       PARTITION BY pr.probe_id
                       ORDER BY round({_DOT_ORACLE.format(a='c.cent', b='pr.p')}, 6) DESC,
                                c.cent_id) AS rn
            FROM cents c CROSS JOIN probes pr)
        WHERE rn <= 4),
    ivf AS (
        SELECT probe_id, vec_id FROM (
            SELECT pr.probe_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY pr.probe_id
                       ORDER BY round({_DOT_ORACLE.format(a='e.embedding', b='pr.p')}, 6) DESC,
                                e.vec_id) AS rn
            FROM embeddings e
            JOIN assigned a ON e.vec_id = a.vec_id
            JOIN plists l ON a.cent_id = l.cent_id
            JOIN probes pr ON l.probe_id = pr.probe_id
            WHERE e.vec_id <> pr.probe_id AND e.embedding IS NOT NULL)
        WHERE rn <= 10),
    exact AS (
        SELECT probe_id, vec_id FROM (
            SELECT pr.probe_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY pr.probe_id
                       ORDER BY round({_DOT_ORACLE.format(a='e.embedding', b='pr.p')}, 6) DESC,
                                e.vec_id) AS rn
            FROM embeddings e CROSS JOIN probes pr
            WHERE e.vec_id <> pr.probe_id AND e.embedding IS NOT NULL)
        WHERE rn <= 10)
    SELECT x.probe_id,
           round(CAST(count(i.vec_id) AS DOUBLE) / 10, 6) AS recall_at_10
    FROM exact x
    LEFT JOIN ivf i ON x.probe_id = i.probe_id AND x.vec_id = i.vec_id
    GROUP BY x.probe_id
    """,
)
def llm_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index quality evaluation: recall@10 of the IVF search
    (llm_ivf_ann's deterministic index: 16 centroids, nprobe=4) against
    exact brute-force top-10, per probe vector — the measurement loop any
    production similarity-search deployment runs before trusting an
    approximate index. Probes are every 200th vector (held-out-query
    pattern); both result lists use the same round-6 + vec_id
    deterministic cut so recall is engine-exact. Scale shape: the probe
    set is BOUNDED BY CONSTRUCTION (round 11) — every 200th vector below
    id 12800, i.e. at most 64 probes at ANY corpus size (sampled probes
    are the industry norm for recall audits; the prior unbounded %200 set
    grew with the corpus, which both timed out the exact arm at the 100x
    sweep and made its broadcast corpus-proportional — the round-10 OOM
    class). Probes and centroids broadcast legitimately (≤64 and 16 rows
    fixed); the exact arm is the only corpus-wide scan — the same cost as
    one brute-force query batch, paid once per index-quality audit, not
    per query. NULL embeddings are filtered from corpus, probe and
    centroid sets alike (r15 null sweep) — a missing vector can neither
    be indexed nor queried; oracle CTEs filter identically."""
    nn = F.col("embedding").isNotNull()
    e = t(spark, sf_dir, "embeddings").where(nn)
    probes = F.broadcast(
        t(spark, sf_dir, "embeddings")
        .where((F.col("vec_id") % 200 == 0) & (F.col("vec_id") < 12800) & nn)
        .select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p"))
    )
    cents = F.broadcast(
        t(spark, sf_dir, "embeddings")
        .where((F.col("vec_id") < 16) & nn)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent"))
    )
    # Corpus-scaled dot counts (assignment N×16, exact arm N×64 probes) run
    # through the Arrow-vectorized _dot64_vec — the interpreted HOF fold
    # took 114 s at the 100x corpus vs the sweep's 100 s watchdog; the
    # 1024-dot probe-list arm keeps the exact fold.
    rn_assign = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), "cent_id"
    )
    assigned = (
        e.crossJoin(cents)
        .withColumn("csim", F.round(_dot64_vec(F.col("embedding"), F.col("cent")), 6))
        .withColumn("rn", F.row_number().over(rn_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", "cent_id")
    )
    rn_plist = Window.partitionBy("probe_id").orderBy(
        F.round(_dot(F.col("cent"), F.col("p")), 6).desc(), "cent_id"
    )
    plists = F.broadcast(
        cents.crossJoin(probes)
        .withColumn("rn", F.row_number().over(rn_plist))
        .where(F.col("rn") <= 4)
        .select("probe_id", "cent_id")
    )
    rn_probe = Window.partitionBy("probe_id").orderBy(
        F.col("sim").desc(), "vec_id"
    )
    ivf = (
        e.join(assigned, "vec_id")
        .join(plists, "cent_id")  # already broadcast at its definition
        .join(probes, "probe_id")
        .where(F.col("vec_id") != F.col("probe_id"))
        .withColumn("sim", F.round(_dot64_vec(F.col("embedding"), F.col("p")), 6))
        .withColumn("rn", F.row_number().over(rn_probe))
        .where(F.col("rn") <= 10)
        .select("probe_id", "vec_id")
    )
    exact = (
        e.crossJoin(probes)
        .where(F.col("vec_id") != F.col("probe_id"))
        .withColumn("sim", F.round(_dot64_vec(F.col("embedding"), F.col("p")), 6))
        .withColumn("rn", F.row_number().over(rn_probe))
        .where(F.col("rn") <= 10)
        .select("probe_id", "vec_id")
    )
    hit = ivf.select(
        F.col("probe_id").alias("ivf_probe"), F.col("vec_id").alias("ivf_vec")
    )
    return (
        exact.join(
            hit,
            (F.col("probe_id") == F.col("ivf_probe"))
            & (F.col("vec_id") == F.col("ivf_vec")),
            "left",
        )
        .groupBy("probe_id")
        .agg(ratio(F.count("ivf_vec").cast("double") / 10).alias("recall_at_10"))
    )


@register(
    "llm_bigram_lm",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    bg AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS t(i)),
    pair AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair FROM bg GROUP BY 1, 2),
    ctx AS (
      SELECT w1, CAST(sum(n_pair) AS BIGINT) AS n_ctx FROM pair GROUP BY 1)
    SELECT p.w1, p.w2, p.n_pair,
           round(CAST(p.n_pair AS DOUBLE) / c.n_ctx, 6) AS p_cond
    FROM pair p JOIN ctx c ON p.w1 = c.w1
    ORDER BY p.n_pair DESC, p.w1, p.w2
    LIMIT 50
    """,
)
def llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model training over the corpus: count adjacent token
    pairs, derive the conditional probability P(w2|w1) = c(w1,w2)/c(w1,·),
    report the 50 highest-count bigrams (deterministic tie-break) — the
    n-gram-LM estimation pass behind KenLM-style quality filtering and the
    statistical prior llm_perplexity_proxy scores against. Scale shape:
    explode to bigram rows → hash-partitioned count agg with map-side
    combine (shuffle carries one row per DISTINCT bigram, not per token);
    context totals come from a second agg over the already-collapsed pair
    counts (vocabulary-sized, far smaller than the corpus) joined back on
    w1. Final top-50 is TakeOrderedAndProject — no global sort
    materialization."""
    d = t(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("tk"))
    bg = d.select(
        F.explode(
            F.expr("transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS w1, tk[i + 1] AS w2))")
        ).alias("b")
    ).select("b.w1", "b.w2")
    pair = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    ctx = pair.groupBy("w1").agg(F.sum("n_pair").alias("n_ctx"))
    return (
        pair.join(ctx, "w1")
        .select(
            "w1",
            "w2",
            "n_pair",
            ratio(F.col("n_pair").cast("double") / F.col("n_ctx")).alias("p_cond"),
        )
        .orderBy(F.col("n_pair").desc(), "w1", "w2")
        .limit(50)
    )


@register(
    "mm_embed_sim_stub",
    oracle="""
    WITH emb AS (
      SELECT doc_id,
             list_transform(generate_series(0, 7), j ->
               (CAST(('0x' || substr(md5(concat(j, ':', text)), 1, 8)) AS BIGINT)
                / 4294967296.0) * 2 - 1) AS e
      FROM documents WHERE text IS NOT NULL),
    probe AS (SELECT e AS p FROM emb WHERE doc_id = 0)
    SELECT doc_id,
           round(list_aggregate(list_transform(list_zip(e, p),
                 t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)), 'sum'), 6) AS sim
    FROM emb CROSS JOIN probe
    WHERE doc_id <> 0
    ORDER BY sim DESC, doc_id
    LIMIT 5
    """,
)
def mm_embed_sim_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal → similarity pipeline: opaque BINARY payloads
    (stand-in for image bytes) run through an Arrow-batched "embedding
    model" stub in mapInPandas, and the resulting vectors feed the same
    broadcast-probe cosine top-k path the real ANN ops use. THE EMBEDDER
    IS A DETERMINISTIC FAKE (seed-prefixed md5 of the payload folded to 8
    dims in [-1, 1)) — no model runtimes in this environment — but every
    piece of plumbing a CLIP-style encoder would need is real: binary
    column in, array<double> out per Arrow batch, broadcast probe join,
    deterministic round-6 + doc_id top-k cut. All dimension values are
    dyadic rationals (int/2^32), so both engines compute bit-identical
    vectors and the oracle replicates the whole pipeline in SQL."""
    import hashlib

    def embed(batches):
        for pdf in batches:
            embs = [
                [
                    (int(hashlib.md5(f"{j}:".encode() + p).hexdigest()[:8], 16)
                     / 4294967296.0) * 2 - 1
                    for j in range(8)
                ]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "e": embs})

    d = t(spark, sf_dir, "documents").where(F.col("text").isNotNull()).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    emb = d.mapInPandas(embed, "doc_id long, e array<double>")
    probe = F.broadcast(
        emb.where(F.col("doc_id") == 0).select(F.col("e").alias("p"))
    )
    return (
        emb.crossJoin(probe)
        .where(F.col("doc_id") != 0)
        .select(
            "doc_id",
            F.round(
                F.aggregate(
                    F.zip_with("e", "p", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "doc_id")
        .limit(5)
    )


@register(
    "llm_oversample_minority",
    oracle="""
    WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
    m AS (SELECT max(n) AS mx FROM c),
    f AS (SELECT lang, n, CAST(mx // n AS BIGINT) AS factor FROM c CROSS JOIN m),
    up AS (
      SELECT d.lang
      FROM documents d JOIN f ON d.lang = f.lang,
           UNNEST(generate_series(1, f.factor)) AS t(rep)),
    g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_after FROM up GROUP BY lang)
    SELECT f.lang, f.n AS n_before, f.factor, g.n_after
    FROM f JOIN g ON f.lang = g.lang
    """,
)
def llm_oversample_minority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minority-class oversampling for training-mix balancing (the upsample
    complement to llm_stratified_sample's downsample): per-language repeat
    factor = floor(majority_count / class_count), each minority doc
    replicated factor times by exploding a sequence — deterministic, no
    RNG, rerun-stable. The audit returns before/factor/after per language,
    computed FROM the exploded data (proving the mechanism, not just the
    arithmetic). Scale shape: class counts are a tiny agg; the explode is
    map-side (each row fans out locally, no shuffle until the final
    |langs|-row count), so oversampling 100 TB streams through executors
    without materializing the upsampled corpus anywhere."""
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    mx = counts.agg(F.max("n").alias("mx"))
    factors = counts.crossJoin(F.broadcast(mx)).select(
        "lang", "n", F.expr("mx div n").alias("factor")  # exact int division
    )
    up = (
        docs.select("lang")
        .join(F.broadcast(factors), "lang")
        .select("lang", F.explode(F.expr("sequence(1, factor)")).alias("rep"))
    )
    after = up.groupBy("lang").agg(F.count(F.lit(1)).alias("n_after"))
    return (
        factors.join(after, "lang")
        .select("lang", F.col("n").alias("n_before"), "factor", "n_after")
    )


@register(
    "llm_kl_divergence_split",
    oracle="""
    WITH toks AS (
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                  THEN 'train' ELSE 'heldout' END AS split,
             unnest(string_split(text, ' ')) AS tok
      FROM documents),
    cnt AS (
      SELECT split, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY split, tok),
    wide AS (
      SELECT tok,
             CAST(coalesce(sum(c) FILTER (split = 'train'), 0) + 1 AS BIGINT) AS ctr,
             CAST(coalesce(sum(c) FILTER (split = 'heldout'), 0) + 1 AS BIGINT) AS chd
      FROM cnt GROUP BY tok),
    tot AS (
      SELECT CAST(sum(ctr) AS DOUBLE) AS ttr, CAST(sum(chd) AS DOUBLE) AS thd
      FROM wide)
    SELECT CAST(count(*) AS BIGINT) AS vocab,
           round(sum((ctr / ttr) * ln((ctr / ttr) / (chd / thd))), 6) AS kl_train_vs_heldout
    FROM wide CROSS JOIN tot
    """,
)
def llm_kl_divergence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift audit: KL(P_train ‖ P_heldout) over the token
    unigram distributions of a deterministic content-hash split (same
    80/20 md5 cut as llm_hash_split), with add-1 smoothing so the
    divergence is finite on asymmetric vocabulary. This is the drift gate
    run before trusting a heldout set (or yesterday's corpus vs today's):
    a KL spike means the split is not exchangeable. Scale shape: one
    explode→(split, token) count agg (map-side partials; the shuffle
    carries distinct tokens), a vocabulary-sized pivot, and a 1-row total
    — the corpus is touched once. ln() differs across engines by ≤1 ulp
    per term; the vocabulary-sum's accumulated error (~1e-12) vanishes in
    the round-6 contract."""
    toks = t(spark, sf_dir, "documents").select(
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cc", "train"
        )
        .otherwise("heldout")
        .alias("split"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    cnt = toks.groupBy("split", "tok").agg(F.count(F.lit(1)).alias("c"))
    wide = cnt.groupBy("tok").agg(
        (F.coalesce(F.sum(F.when(F.col("split") == "train", F.col("c"))), F.lit(0)) + 1)
        .cast("long")
        .alias("ctr"),
        (F.coalesce(F.sum(F.when(F.col("split") == "heldout", F.col("c"))), F.lit(0)) + 1)
        .cast("long")
        .alias("chd"),
    )
    tot = wide.agg(
        F.sum("ctr").cast("double").alias("ttr"),
        F.sum("chd").cast("double").alias("thd"),
    )
    p = F.col("ctr") / F.col("ttr")
    q = F.col("chd") / F.col("thd")
    return (
        wide.crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            ratio(F.sum(p * F.log(p / q))).alias("kl_train_vs_heldout"),
        )
    )


@register(
    "llm_zipf_fit",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY w),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r FROM freq),
    mom AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(log10(CAST(r AS DOUBLE))) AS sx,
             sum(log10(CAST(f AS DOUBLE))) AS sy,
             sum(log10(CAST(r AS DOUBLE)) * log10(CAST(f AS DOUBLE))) AS sxy,
             sum(log10(CAST(r AS DOUBLE)) * log10(CAST(r AS DOUBLE))) AS sxx
      FROM ranked)
    SELECT CAST(n AS BIGINT) AS vocab_size,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS zipf_intercept
    FROM mom
    """,
)
def llm_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: log10(freq) vs
    log10(rank) OLS slope/intercept — the standard sanity probe that a
    text corpus is natural-language-shaped (slope ≈ −1) rather than
    degenerate. Scale shape: term frequencies are one explode+agg shuffle
    at VOCABULARY grain; the global frequency rank is built with the
    ``_range_prefix`` offsets machinery (range-partition + broadcast
    count offsets + per-partition row_number — no single-task sort even
    at 10⁸-term vocabularies), and the fit itself is a one-row co-moment
    aggregate — the same closed-form OLS as agg_regression."""
    from ..operators.windows import _range_prefix

    tok = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    order = [F.col("f").desc(), F.col("w").asc()]
    part, _n, _tot = _range_prefix(freq, order, "f")
    w_rank = Window.partitionBy("_pid").orderBy(*order)
    ranked = part.select(
        "f", (F.col("_cnt_off") + F.row_number().over(w_rank)).alias("r")
    )
    lx = F.log10(F.col("r").cast("double"))
    ly = F.log10(F.col("f").cast("double"))
    mom = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return mom.select(
        F.col("n").cast("bigint").alias("vocab_size"),
        ratio(slope).alias("zipf_slope"),
        ratio((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("zipf_intercept"),
    )


@register(
    "mm_audio_chunk_stub",
    oracle="""
    WITH sized AS (
      SELECT doc_id, octet_length(encode(text)) AS blen FROM documents
      WHERE text IS NOT NULL),
    framed AS (
      SELECT doc_id, blen,
             CAST(ceil(blen / 128.0) AS BIGINT) AS n_frames
      FROM sized)
    SELECT doc_id, CAST(blen AS BIGINT) AS byte_len, n_frames,
           CAST(blen - (n_frames - 1) * 128 AS BIGINT) AS last_frame_bytes,
           round(blen / (n_frames * 128.0), 6) AS fill_ratio
    FROM framed
    """,
)
def mm_audio_chunk_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal AUDIO plumbing: treat an opaque binary payload as a PCM
    byte stream and chunk it into fixed 128-byte frames inside an
    Arrow-batched ``mapInPandas`` "framer" — the exact pipeline shape a
    real resample/spectrogram stage plugs into (payloads never leave the
    executor; the frame math is per-batch numpy). THE DECODE IS A
    DETERMINISTIC FAKE (frame counts / fill ratios over utf-8 bytes — no
    audio libs in this environment, like mm_decode_stub); the schema,
    batching, and UDF signature are real and tested."""
    import numpy as np

    def frame(batches):
        for pdf in batches:
            blen = pdf["payload"].map(len).astype("int64")
            n_frames = np.ceil(blen / 128.0).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": blen,
                    "n_frames": n_frames,
                    # real impl: len(payload) - (n-1)*hop tail samples
                    "last_frame_bytes": blen - (n_frames - 1) * 128,
                    # rounded Spark-side: numpy .round is half-even,
                    # Spark/DuckDB round is half-up — 101/128 lands on the
                    # exact 6-dp midpoint and flips
                    "fill_ratio": blen / (n_frames * 128.0),
                }
            )

    d = t(spark, sf_dir, "documents").where(F.col("text").isNotNull()).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    framed = d.mapInPandas(
        frame,
        "doc_id long, byte_len long, n_frames long,"
        " last_frame_bytes long, fill_ratio double",
    )
    return framed.withColumn("fill_ratio", ratio(F.col("fill_ratio")))


@register(
    "llm_preference_pairs",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')), 6) AS ttr
      FROM documents)
    SELECT source,
           max_by(doc_id, CAST(round(ttr * 1e6, 0) AS BIGINT) * 10000000000
                          - doc_id) AS chosen_doc,
           min_by(doc_id, CAST(round(ttr * 1e6, 0) AS BIGINT) * 10000000000
                          + doc_id) AS rejected_doc,
           round(max(ttr) - min(ttr), 6) AS score_margin,
           CAST(count(*) AS BIGINT) AS n_candidates
    FROM scored GROUP BY source
    """,
)
def llm_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair mining for RLHF/DPO-style training: within each
    candidate group (source stands in for the prompt id) pick the
    highest- and lowest-quality response by a deterministic score
    (type-token ratio), emit (chosen, rejected) with the score margin.
    One hash-shuffle on the group key; ``max_by``/``min_by`` on a single
    int64 composite key (6-dp score scaled to an exact integer, doc-id
    tie-break folded into the low digits — DuckDB 1.0's arg-min takes
    only scalar keys) keep the pair selection engine-exact. At 100 TB the
    same plan shape mines pairs per prompt over billions of candidates —
    no sort, no window, pure single-pass aggregate."""
    scored = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        ratio(
            F.size(F.array_distinct(F.split("text", " ")))
            / F.size(F.split("text", " "))
        ).alias("ttr"),
    )
    key = "cast(round(ttr * 1e6, 0) as bigint) * 10000000000"
    return scored.groupBy("source").agg(
        F.expr(f"max_by(doc_id, {key} - doc_id)").alias("chosen_doc"),
        F.expr(f"min_by(doc_id, {key} + doc_id)").alias("rejected_doc"),
        ratio(F.max("ttr") - F.min("ttr")).alias("score_margin"),
        F.count(F.lit(1)).alias("n_candidates"),
    )


@register(
    "llm_vocab_coverage",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY w),
    ranked AS (
      SELECT f,
             row_number() OVER (ORDER BY f DESC, w) AS r,
             sum(f) OVER (ORDER BY f DESC, w
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_f,
             sum(f) OVER () AS tot_f
      FROM freq),
    marks AS (SELECT unnest([8, 16, 32, 48]) AS vocab_k)
    SELECT m.vocab_k,
           round(CAST(max(CASE WHEN ranked.r <= m.vocab_k THEN run_f END)
                      AS DOUBLE) / max(tot_f), 6) AS coverage
    FROM marks m, ranked
    GROUP BY m.vocab_k
    """,
)
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-budget planning: what fraction of corpus tokens does a
    top-K frequency vocabulary cover? Reports coverage at K ∈ {8, 16,
    32, 48} (sized to this corpus's ~60-word synthetic vocabulary; real
    runs probe 32k/50k/100k/256k). The frequency rank AND the cumulative
    token mass are built with the ``_range_prefix`` offsets machinery —
    exact global rank and running sum, windows partitioned by ``_pid``
    only, scalable to 10⁸-term vocabularies. The tiny K-marks frame is
    broadcast; coverage is a 4-row aggregate."""
    from ..operators.windows import _range_prefix

    tok = t(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    order = [F.col("f").desc(), F.col("w").asc()]
    part, _n, tot_f = _range_prefix(freq, order, "f")
    w_run = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = part.select(
        (F.col("_cnt_off") + F.row_number().over(w_run)).alias("r"),
        (F.col("_sum_off") + F.sum("f").over(w_run)).alias("run_f"),
    )
    marks = spark.range(1).select(
        F.explode(F.array(F.lit(8), F.lit(16), F.lit(32), F.lit(48))).alias("vocab_k")
    )
    return (
        ranked.join(F.broadcast(marks), F.col("r") <= F.col("vocab_k"))
        .groupBy("vocab_k")
        .agg(
            ratio(
                F.max("run_f").cast("double") / F.lit(float(tot_f))
            ).alias("coverage")
        )
    )


@register(
    "llm_context_length_histogram",
    oracle="""
    WITH sized AS (
      SELECT CAST(pow(2, ceil(log2(len(string_split(text, ' '))))) AS BIGINT)
               AS ctx_bucket,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents)
    SELECT ctx_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS bucket_tokens,
           CAST(sum(ctx_bucket - n_tok) AS BIGINT) AS padding_waste
    FROM sized GROUP BY ctx_bucket
    """,
)
def llm_context_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window budget histogram: documents bucketed to the
    next power-of-two sequence length, with per-bucket token mass and
    the padding waste a naive pad-to-bucket batching would pay — the
    numbers that motivate llm_seq_packing. Pure map-side bucket
    arithmetic + one tiny aggregate; log2/pow on exact integer token
    counts is boundary-safe (powers of two are exact doubles)."""
    sized = t(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("long").alias("n_tok")
    ).select(
        "n_tok",
        F.pow(F.lit(2), F.ceil(F.log2("n_tok"))).cast("bigint").alias("ctx_bucket"),
    )
    return sized.groupBy("ctx_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("bucket_tokens"),
        F.sum(F.col("ctx_bucket") - F.col("n_tok")).alias("padding_waste"),
    )


_BM25_QUERY_TERMS = ("spark", "join", "stream")
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "llm_bm25_retrieval",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dlen FROM tok GROUP BY doc_id),
    corpus AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             (SELECT avg(dlen) FROM dl) AS avg_len
      FROM documents),
    qterms AS (SELECT unnest(['spark', 'join', 'stream']) AS w),
    df AS (
      SELECT w, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
      FROM tok WHERE w IN (SELECT w FROM qterms) GROUP BY w),
    tf AS (
      SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
      FROM tok WHERE w IN (SELECT w FROM qterms) GROUP BY doc_id, w),
    scored AS (
      SELECT tf.doc_id,
             sum(ln((corpus.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * tf.tf * ({_BM25_K1} + 1.0)
                 / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                    + {_BM25_B} * dl.dlen / corpus.avg_len))) AS score
      FROM tf
      JOIN df ON df.w = tf.w
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN corpus
      GROUP BY tf.doc_id)
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id
    LIMIT 10
    """,
)
def llm_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (k1=1.2, b=0.75): score every document
    against a fixed 3-term query and return the top-10 — the sparse
    counterpart to the embedding-cosine family (llm_sim_topk) and the
    first-stage retriever in most RAG stacks. Scale shape: term
    frequencies for the QUERY TERMS only (the IN filter prunes the
    exploded stream before the shuffle), document lengths one agg,
    df/N/avgdl are tiny broadcast aggregates — per query the cost is one
    pruned explode + a |matching docs| aggregation, never a corpus-wide
    score sort (TakeOrderedAndProject top-k). Ranking compares scores
    ROUNDED to 6 dp with a doc-id tie-break so a 1-ulp ln()/division
    difference between engines cannot reorder the frontier."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY_TERMS)
    return spark.sql(
        f"""
        WITH tok AS (
          SELECT doc_id, explode(split(text, ' ')) AS w FROM documents),
        dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dlen
               FROM tok GROUP BY doc_id),
        corpus AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 (SELECT avg(dlen) FROM dl) AS avg_len
          FROM documents),
        df AS (
          SELECT w, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
          FROM tok WHERE w IN ({terms}) GROUP BY w),
        tf AS (
          SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
          FROM tok WHERE w IN ({terms}) GROUP BY doc_id, w),
        scored AS (
          SELECT tf.doc_id,
                 sum(ln((corpus.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                     * tf.tf * ({_BM25_K1} + 1.0)
                     / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                        + {_BM25_B} * dl.dlen / corpus.avg_len))) AS score
          FROM tf
          JOIN df ON df.w = tf.w
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN corpus
          GROUP BY tf.doc_id)
        SELECT doc_id, round(score, 6) AS bm25
        FROM scored
        ORDER BY round(score, 6) DESC, doc_id
        LIMIT 10
        """
    )


@register(
    "llm_embedding_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings),
    ranged AS (
      SELECT vec_id, e,
             list_min(e) AS mn,
             greatest(list_max(e) - list_min(e), 1e-12) / 255.0 AS scale
      FROM v),
    quant AS (
      SELECT vec_id, mn, scale,
             list_transform(e, x -> round((x - mn) / scale, 0)) AS q,
             e
      FROM ranged)
    SELECT vec_id,
           CAST(list_sum(q) AS BIGINT) AS q_checksum,
           round(list_sum(list_transform(list_zip(e, q),
                 p -> pow(CAST(p[1] AS DOUBLE) - (mn + CAST(p[2] AS DOUBLE) * scale), 2)))
                 / len(e), 8) AS mse
    FROM quant
    """,
)
def llm_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (int8-style) embedding quantization — the storage/ANN-recall
    trade every vector store makes at 100 TB: per-vector min/max range,
    255-level uniform codes, and the reconstruction MSE that predicts
    recall loss. Entirely JVM higher-order array functions (transform /
    aggregate fold — sequential over list order, so float summation is
    order-identical in both engines); one map-side pass, no shuffle, no
    UDF. q-codes are exact small integers (round() of well-separated
    doubles), MSE rounds to 8 dp."""
    e_dbl = F.expr("transform(embedding, x -> cast(x as double))")
    v = t(spark, sf_dir, "embeddings").select("vec_id", e_dbl.alias("e"))
    ranged = v.select(
        "vec_id",
        "e",
        F.array_min("e").alias("mn"),
        (F.greatest(F.array_max("e") - F.array_min("e"), F.lit(1e-12)) / 255.0).alias(
            "scale"
        ),
    )
    quant = ranged.select(
        "vec_id",
        "mn",
        "scale",
        "e",
        F.expr("transform(e, x -> round((x - mn) / scale, 0))").alias("q"),
    )
    return quant.select(
        "vec_id",
        F.expr("cast(aggregate(q, 0.0D, (acc, x) -> acc + x) as bigint)").alias(
            "q_checksum"
        ),
        F.round(
            F.expr(
                "aggregate(zip_with(e, q, (x, c) -> pow(x - (mn + c * scale), 2)),"
                " 0.0D, (acc, x) -> acc + x) / size(e)"
            ),
            8,
        ).alias("mse"),
    )


@register(
    "llm_importance_resample",
    oracle="""
    WITH lc AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
    m AS (SELECT min(c) AS mc FROM lc),
    w AS (SELECT lang, c, CAST(mc AS DOUBLE) / c AS keep_p FROM lc CROSS JOIN m),
    dec AS (
      SELECT d.lang, w.c, w.keep_p,
             CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                            AS BIGINT) / 4294967296e0 < w.keep_p
                  THEN 1 ELSE 0 END AS kept
      FROM documents d JOIN w ON d.lang = w.lang)
    SELECT lang, CAST(max(c) AS BIGINT) AS n_before,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           round(max(keep_p), 6) AS keep_p
    FROM dec GROUP BY lang
    """,
)
def llm_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling to a uniform language mixture — the data-mixing
    primitive for rebalancing a skewed pre-training corpus WITHOUT RNG
    state: per-language acceptance probability = min_lang_count / count,
    and each document's accept/reject draw is the content-stable md5
    uniform u(doc_id) ∈ [0,1) (same convention as llm_hash_split), so the
    decision is a map-side expression that reproduces row-for-row on
    re-runs and on tomorrow's corpus. Scale shape: one bounded-cardinality
    lang aggregate broadcast back to the stream (the 1-row min() cross
    join is a plan-hygiene-allowlisted bounded broadcast); the corpus
    itself never shuffles — at 100 TB the decision is embarrassingly
    parallel and the output is the audit table (kept counts converge to
    n_langs × min count)."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH lc AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
        m AS (SELECT min(c) AS mc FROM lc),
        w AS (SELECT /*+ BROADCAST(m) */ lang, c,
                     CAST(mc AS DOUBLE) / c AS keep_p FROM lc CROSS JOIN m),
        dec AS (
          SELECT /*+ BROADCAST(w) */ d.lang, w.c, w.keep_p,
                 CASE WHEN CAST(conv(substr(md5(CAST(d.doc_id AS STRING)), 1, 8),
                                     16, 10) AS BIGINT) / 4294967296e0 < w.keep_p
                      THEN 1 ELSE 0 END AS kept
          FROM documents d JOIN w ON d.lang = w.lang)
        SELECT lang, CAST(max(c) AS BIGINT) AS n_before,
               CAST(sum(kept) AS BIGINT) AS n_kept,
               round(max(keep_p), 6) AS keep_p
        FROM dec GROUP BY lang
        """,
    )


@register(
    "llm_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
    shingle AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(generate_series(1, len(tk) - 2),
               i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh
      FROM toks WHERE len(tk) >= 3),
    first_seen AS (SELECT sh, min(doc_id) AS first_doc FROM shingle GROUP BY sh),
    per_doc AS (
      SELECT s.doc_id, s.source,
             CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS novelty
      FROM shingle s JOIN first_seen f ON s.sh = f.sh
      GROUP BY s.doc_id, s.source)
    SELECT source, count(*) AS n_docs, round(avg(novelty), 6) AS avg_novelty,
           round(min(novelty), 6) AS min_novelty
    FROM per_doc GROUP BY source
    """,
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty scoring (the dedup-adjacent freshness
    metric used to spot boilerplate-heavy sources): a document's novelty
    is the fraction of its distinct 3-gram shingles whose FIRST occurrence
    (min doc_id — ingestion order) is this document. Aggregated per
    source, low avg novelty flags template/mirror-dominated feeds before
    any pairwise dedup runs. Scale shape: the global first-occurrence
    table is one min() aggregate keyed by shingle; the rejoin is
    shingle-keyed. Nothing is ever pairwise.

    Round-13 exact-collapse (isolated-cache sweep: 77.0 s cold at 100× —
    full-corpus distinct-shingle stage): a shingle's first occurrence is
    min(doc_id) over the docs containing it, and within a content group
    every doc has the same shingle set — so first_doc(sh) = min over
    groups of the group's global-min doc, ONLY that global-min copy can
    score nonzero novelty (any later copy finds every one of its shingles
    already seen), and per-source stats follow from group multiplicities:
    avg = Σ ν(h over groups first-seen in the source) / Σ mult (the zero
    terms drop out of the sum), min = 0 as soon as the source holds any
    non-first copy. Exploded volume tracks distinct content; oracle
    unchanged."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    spark.sql(
        """
        SELECT md5(text) AS h, source, min(doc_id) AS min_doc,
               count(*) AS mult
        FROM documents GROUP BY md5(text), source
        """
    ).createOrReplaceTempView("__nov_grp")
    spark.sql(
        "SELECT h, min(min_doc) AS gdoc FROM __nov_grp GROUP BY h"
    ).createOrReplaceTempView("__nov_hmin")
    shr = spark.sql(
        """
        SELECT DISTINCT r.h, sh
        FROM __nov_hmin r
        JOIN (SELECT doc_id, split(text, ' ') AS tk FROM documents) d
          ON d.doc_id = r.gdoc
        LATERAL VIEW explode(transform(
          sequence(0, size(tk) - 3),
          i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh
        WHERE size(tk) >= 3
        """
    ).cache()
    shr.createOrReplaceTempView("__nov_shr")
    _materialize_cache(spark, shr)
    spark.sql(
        """
        SELECT s.h,
               CAST(sum(CASE WHEN f.first_doc = m.gdoc THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) AS nu
        FROM __nov_shr s
        JOIN (SELECT s2.sh, min(m2.gdoc) AS first_doc
              FROM __nov_shr s2 JOIN __nov_hmin m2 ON m2.h = s2.h
              GROUP BY s2.sh) f ON f.sh = s.sh
        JOIN __nov_hmin m ON m.h = s.h
        GROUP BY s.h
        """
    ).createOrReplaceTempView("__nov_nu")
    return spark.sql(
        """
        SELECT g.source, CAST(sum(g.mult) AS BIGINT) AS n_docs,
               round(sum(CASE WHEN m.gdoc = g.min_doc THEN nu.nu
                              ELSE 0e0 END) / sum(g.mult), 6) AS avg_novelty,
               round(min(CASE WHEN m.gdoc = g.min_doc AND g.mult = 1
                              THEN nu.nu ELSE 0e0 END), 6) AS min_novelty
        FROM __nov_grp g
        JOIN __nov_hmin m ON m.h = g.h
        JOIN __nov_nu nu ON nu.h = g.h
        GROUP BY g.source
        """
    )


_SEMDEDUP_TAU = 0.35


@register(
    "llm_semdedup_centroid",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
      WHERE vec_id < 16),
    assigned AS (
      SELECT vec_id, cent_id FROM (
        SELECT e.vec_id, c.cent_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round({_DOT_ORACLE.format(a='e.embedding', b='c.cent')}, 6)
                          DESC, c.cent_id) AS rn
        FROM embeddings e CROSS JOIN cents c)
      WHERE rn = 1),
    pairs AS (
      SELECT a.cent_id, b.vec_id AS dup_id
      FROM assigned a
      JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE round({_DOT_ORACLE.format(a='ea.embedding', b='eb.embedding')}, 6)
            >= {_SEMDEDUP_TAU}),
    tot AS (SELECT cent_id, count(*) AS n_total FROM assigned GROUP BY cent_id),
    rem AS (
      SELECT cent_id, count(DISTINCT dup_id) AS n_removed FROM pairs
      GROUP BY cent_id)
    SELECT t.cent_id, t.n_total,
           CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
           CAST(t.n_total - COALESCE(r.n_removed, 0) AS BIGINT) AS n_kept
    FROM tot t LEFT JOIN rem r ON r.cent_id = t.cent_id
    """,
)
def llm_semdedup_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    arXiv 2303.09540): cluster the embedding space with a coarse
    quantizer, then search for near-duplicate pairs ONLY within each
    cluster — the cluster assignment turns the global O(N²) cosine
    comparison into per-cluster blocks, which is what makes semantic
    dedup tractable at 100 TB (with k ≈ √N clusters the pair work drops
    by ~k×). Determinism: centroids are the vec_id<16 convention shared
    with llm_ivf_ann (stand-ins for trained means, keeping the op
    exactly oracle-checkable); keep-lowest-vec_id dedup rule. Spark
    plan: 16-centroid broadcast + map-side argmax (bounded BNLJ,
    allowlisted), then a cent_id-keyed equi self-join — the quadratic
    work is sharded per cluster, never global."""
    return sql_q(
        spark,
        sf_dir,
        f"""
        WITH cents AS (
          SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
          WHERE vec_id < 16),
        assigned AS (
          SELECT vec_id, cent_id FROM (
            SELECT /*+ BROADCAST(cents) */ e.vec_id, c.cent_id,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY round(aggregate(
                                zip_with(e.embedding, c.cent,
                                         (x, y) -> cast(x AS double) * cast(y AS double)),
                                cast(0.0 AS double), (acc, v) -> acc + v), 6)
                              DESC, c.cent_id) AS rn
            FROM embeddings e CROSS JOIN cents c)
          WHERE rn = 1),
        pairs AS (
          SELECT a.cent_id, b.vec_id AS dup_id
          FROM assigned a
          JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
          JOIN embeddings ea ON ea.vec_id = a.vec_id
          JOIN embeddings eb ON eb.vec_id = b.vec_id
          WHERE round(aggregate(
                  zip_with(ea.embedding, eb.embedding,
                           (x, y) -> cast(x AS double) * cast(y AS double)),
                  cast(0.0 AS double), (acc, v) -> acc + v), 6) >= {_SEMDEDUP_TAU}),
        tot AS (SELECT cent_id, count(*) AS n_total FROM assigned GROUP BY cent_id),
        rem AS (
          SELECT cent_id, count(DISTINCT dup_id) AS n_removed FROM pairs
          GROUP BY cent_id)
        SELECT t.cent_id, t.n_total,
               CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
               CAST(t.n_total - COALESCE(r.n_removed, 0) AS BIGINT) AS n_kept
        FROM tot t LEFT JOIN rem r ON r.cent_id = t.cent_id
        """,
    )


@register(
    "llm_epoch_repetition_plan",
    oracle="""
    WITH src AS (
      SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    tot AS (SELECT sum(n_tokens) AS t, count(*) AS ns FROM src)
    SELECT source, n_tokens,
           CAST(ceil(CAST(t AS DOUBLE) / ns) AS BIGINT) AS target_tokens,
           CAST(least(4, greatest(1,
                CAST(ceil((CAST(t AS DOUBLE) / ns) / n_tokens) AS BIGINT)))
             AS BIGINT) AS epochs,
           CAST(n_tokens * least(4, greatest(1,
                CAST(ceil((CAST(t AS DOUBLE) / ns) / n_tokens) AS BIGINT)))
             AS BIGINT) AS planned_tokens
    FROM src CROSS JOIN tot
    """,
)
def llm_epoch_repetition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained training mixture planning (Muennighoff et al. 2023,
    arXiv 2305.16264: repeating data beats nothing up to ~4 epochs): give
    every source an equal token budget, and plan per-source repetition
    epochs = ceil(target / actual) clamped to [1, 4] — small high-quality
    sources repeat, large sources train single-epoch. All arithmetic is
    exact integer token counts against a 1-row corpus-total broadcast
    (plan-hygiene allowlisted); at 100 TB this is one bounded source-grain
    aggregate, the same shape as llm_source_mixture."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH src AS (
          SELECT source, CAST(sum(size(split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
        tot AS (SELECT sum(n_tokens) AS t, count(*) AS ns FROM src)
        SELECT source, n_tokens,
               CAST(ceil(CAST(t AS DOUBLE) / ns) AS BIGINT) AS target_tokens,
               CAST(least(4, greatest(1,
                    CAST(ceil((CAST(t AS DOUBLE) / ns) / n_tokens) AS BIGINT)))
                 AS BIGINT) AS epochs,
               CAST(n_tokens * least(4, greatest(1,
                    CAST(ceil((CAST(t AS DOUBLE) / ns) / n_tokens) AS BIGINT)))
                 AS BIGINT) AS planned_tokens
        FROM src CROSS JOIN tot
        """,
    )


@register(
    "llm_containment_dedup",
    oracle="""
    WITH reps AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    sh AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(generate_series(1, len(tk) - 2),
               i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh
      FROM (SELECT d.doc_id, d.source, string_split(d.text, ' ') AS tk
            FROM documents d JOIN reps USING (doc_id))
      WHERE len(tk) >= 3),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_cnt
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.source = b.source
                         AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(CAST(shared_cnt AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(shared_cnt AS DOUBLE) / least(sa.n, sb.n) >= 0.2
    ORDER BY containment DESC, doc_a, doc_b
    LIMIT 100
    """,
)
def llm_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-based near-dedup: shared 3-gram shingles over the
    SMALLER document's shingle count — the asymmetric measure that
    catches quote/sub-document/expansion relationships Jaccard misses
    (a 50-token doc fully embedded in a 5000-token doc has Jaccard ≈
    0.01 but containment 1.0; the Broder resemblance-vs-containment
    distinction). Same-source blocking bounds the self-join exactly as
    llm_ngram_jaccard; shuffle key is (shingle, source), never a pair
    list. EXACT-COLLAPSE FIRST (round 11): pairs run over one
    representative per distinct text — verbatim duplicates otherwise make
    the within-block pair output grow ~copies² (the round-10 100x sweep
    TIMEOUT); oracle applies the same reps CTE. The shingle stage is a
    cached temp view (read 3x: sizes + both self-join sides; the CTE form
    inlined the reps collapse + explode per reference — 15 shuffles)."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    sh = spark.sql(
        """
        SELECT DISTINCT doc_id, source, sh
        FROM (SELECT d.doc_id, d.source, split(d.text, ' ') AS tk
              FROM documents d
              JOIN (SELECT min(doc_id) AS doc_id FROM documents
                    GROUP BY md5(text)) reps USING (doc_id))
        LATERAL VIEW explode(transform(
          sequence(0, size(tk) - 3),
          i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh
        WHERE size(tk) >= 3
        """
    ).cache()
    sh.createOrReplaceTempView("__cd_sh")
    _materialize_cache(spark, sh)
    return spark.sql(
        """
        SELECT doc_a, doc_b,
               round(CAST(shared_cnt AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
        FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_cnt
          FROM __cd_sh a JOIN __cd_sh b ON a.sh = b.sh AND a.source = b.source
                                       AND a.doc_id < b.doc_id
          GROUP BY 1, 2) shared
        JOIN (SELECT doc_id, count(*) AS n FROM __cd_sh GROUP BY doc_id) sa
          ON sa.doc_id = doc_a
        JOIN (SELECT doc_id, count(*) AS n FROM __cd_sh GROUP BY doc_id) sb
          ON sb.doc_id = doc_b
        WHERE CAST(shared_cnt AS DOUBLE) / least(sa.n, sb.n) >= 0.2
        ORDER BY containment DESC, doc_a, doc_b
        LIMIT 100
        """
    )


@register(
    "llm_dedup_survivorship",
    oracle="""
    WITH g AS (
      SELECT doc_id, n_chars, md5(lower(trim(text))) AS h FROM documents),
    ranked AS (
      SELECT doc_id, h, n_chars,
             row_number() OVER (PARTITION BY h ORDER BY n_chars DESC, doc_id)
               AS rn,
             count(*) OVER (PARTITION BY h) AS sz
      FROM g)
    SELECT substr(h, 1, 8) AS grp,
           max(CASE WHEN rn = 1 THEN doc_id END) AS survivor_doc,
           CAST(max(sz) AS BIGINT) AS n_members,
           CAST(max(sz) - 1 AS BIGINT) AS n_discarded
    FROM ranked WHERE sz > 1 GROUP BY h
    """,
)
def llm_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup with a SURVIVORSHIP POLICY: exact-duplicate groups (normalized
    content hash) keep the highest-quality member — longest document,
    doc_id as the deterministic tiebreak — instead of llm_exact_dedup's
    keep-lowest-id rule. This is the master-data-management half of dedup:
    WHICH copy survives matters when duplicates differ in metadata
    completeness. One hash shuffle; rank and group-size come from the same
    window pass (no second aggregation over raw text), so the 100 TB cost
    is identical to plain exact dedup."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH g AS (
          SELECT doc_id, n_chars, md5(lower(trim(text))) AS h FROM documents),
        ranked AS (
          SELECT doc_id, h, n_chars,
                 row_number() OVER (PARTITION BY h ORDER BY n_chars DESC, doc_id)
                   AS rn,
                 count(*) OVER (PARTITION BY h) AS sz
          FROM g)
        SELECT substr(h, 1, 8) AS grp,
               max(CASE WHEN rn = 1 THEN doc_id END) AS survivor_doc,
               CAST(max(sz) AS BIGINT) AS n_members,
               CAST(max(sz) - 1 AS BIGINT) AS n_discarded
        FROM ranked WHERE sz > 1 GROUP BY h
        """,
    )


def _mmr_oracle() -> str:
    """Unrolled 5-step greedy MMR in DuckDB CTEs (the kmeans-oracle
    pattern): candidate top-20 by probe cosine, then per step an integer
    argmax of 7·sim_probe − 3·max-sim-to-selected (λ=0.7 scaled to the
    1e-6 fixed-point grid — exact int64 comparisons, no float rounding at
    the decision boundary)."""
    dot_cp = _DOT_ORACLE.format(a="e.embedding", b="p")
    dot_ab = _DOT_ORACLE.format(a="a.embedding", b="b.embedding")
    steps = []
    for i in range(2, 6):
        steps.append(f"""sel{i} AS (
      SELECT * FROM sel{i - 1}
      UNION ALL
      (SELECT vec_id, simp, {i} AS mmr_rank FROM (
         SELECT c.vec_id, c.simp,
                7 * CAST(round(c.simp * 1000000) AS BIGINT)
                - 3 * (SELECT max(p2.si) FROM pair p2
                       WHERE p2.u = c.vec_id
                         AND p2.v IN (SELECT vec_id FROM sel{i - 1})) AS score
         FROM cand c
         WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1}))
       ORDER BY score DESC, vec_id LIMIT 1))""")
    return f"""
    WITH probe AS (SELECT embedding AS p FROM embeddings
                   WHERE vec_id = 0 AND embedding IS NOT NULL),
    cand AS (
      SELECT e.vec_id, e.embedding, round({dot_cp}, 6) AS simp
      FROM embeddings e, probe
      WHERE e.vec_id <> 0 AND e.embedding IS NOT NULL
      ORDER BY simp DESC, e.vec_id LIMIT 20),
    pair AS (
      SELECT a.vec_id AS u, b.vec_id AS v,
             CAST(round(round({dot_ab}, 6) * 1000000) AS BIGINT) AS si
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
    sel1 AS (
      SELECT vec_id, simp, 1 AS mmr_rank FROM cand
      ORDER BY simp DESC, vec_id LIMIT 1),
    {",".join(steps)}
    SELECT vec_id, mmr_rank, simp AS sim FROM sel5
    """


@register("llm_mmr_diverse_topk", oracle=_mmr_oracle())
def llm_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    from the probe's cosine top-20 candidates, greedily select 5 results
    maximizing λ·sim(probe) − (1−λ)·max-sim-to-already-selected (λ=0.7)
    — the diversity-aware retrieval head every RAG stack bolts onto ANN.
    Determinism: all similarities live on the round-6 grid, and the
    greedy argmax compares pure int64 scores (7·simp − 3·maxsim on the
    1e-6 fixed-point grid), so the selection is bit-identical across
    engines — the DuckDB oracle replays the same 5 steps as unrolled
    CTEs. Scale shape: the distributed work is the candidate top-20 scan
    (broadcast probe, TakeOrdered merge — llm_sim_topk's plan) and a
    20×20 pair GEMM; the greedy loop itself touches only k²=400 scores,
    driver-side like kmeans' centroid update — never corpus data."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    cand = spark.sql(
        """
        SELECT /*+ BROADCAST(probe) */ e.vec_id, e.embedding,
               round(aggregate(
                       zip_with(e.embedding, probe.p,
                                (x, y) -> cast(x AS double) * cast(y AS double)),
                       cast(0.0 AS double), (acc, v) -> acc + v), 6) AS simp
        FROM embeddings e
        CROSS JOIN (SELECT embedding AS p FROM embeddings
                    WHERE vec_id = 0 AND embedding IS NOT NULL) probe
        WHERE e.vec_id <> 0 AND e.embedding IS NOT NULL
        ORDER BY simp DESC, e.vec_id LIMIT 20
        """
    ).cache()
    cand.createOrReplaceTempView("__mmr_cand")
    pairs = spark.sql(
        """
        SELECT a.vec_id AS u, b.vec_id AS v,
               CAST(round(round(aggregate(
                      zip_with(a.embedding, b.embedding,
                               (x, y) -> cast(x AS double) * cast(y AS double)),
                      cast(0.0 AS double), (acc, v2) -> acc + v2), 6) * 1000000)
                    AS BIGINT) AS si
        FROM __mmr_cand a JOIN __mmr_cand b ON a.vec_id <> b.vec_id
        """
    ).collect()
    simp_rows = {r["vec_id"]: r["simp"] for r in cand.select("vec_id", "simp").collect()}
    if not simp_rows:
        # probe vector absent (e.g. NULL embedding, r15 null sweep):
        # nothing to rank — empty result, stable schema, like the
        # oracle's empty probe CTE.
        return cand.limit(0).select(
            "vec_id", F.lit(1).alias("mmr_rank"), F.col("simp").alias("sim")
        )
    si = {(r["u"], r["v"]): r["si"] for r in pairs}
    simp_int = {vid: round(s * 1_000_000) for vid, s in simp_rows.items()}

    selected: list[int] = []
    first = min(simp_rows, key=lambda v: (-simp_int[v], v))
    selected.append(first)
    while len(selected) < 5:
        best = None
        for c in simp_rows:
            if c in selected:
                continue
            score = 7 * simp_int[c] - 3 * max(si[(c, s)] for s in selected)
            if best is None or (-score, c) < best[0]:
                best = ((-score, c), c)
        selected.append(best[1])

    rank_map = F.map_from_arrays(
        F.array(*[F.lit(v) for v in selected]),
        F.array(*[F.lit(i + 1) for i in range(len(selected))]),
    )
    return (
        cand.where(F.col("vec_id").isin(selected))
        .select(
            "vec_id",
            F.element_at(rank_map, F.col("vec_id")).alias("mmr_rank"),
            F.col("simp").alias("sim"),
        )
    )


@register(
    "llm_dataset_stats_card",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source, lang, n_chars,
             len(string_split(text, ' ')) AS n_tok,
             md5(lower(trim(text))) AS h
      FROM documents),
    lc AS (SELECT source, lang, count(*) AS n FROM tok GROUP BY source, lang),
    tot AS (SELECT source, sum(n) AS tn FROM lc GROUP BY source),
    ent2 AS (
      SELECT lc.source,
             round(-sum((CAST(n AS DOUBLE) / tn) * log2(CAST(n AS DOUBLE) / tn)), 6)
               AS lang_entropy
      FROM lc JOIN tot ON lc.source = tot.source
      GROUP BY lc.source),
    docstats AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             CAST(min(n_tok) AS BIGINT) AS min_tokens,
             CAST(max(n_tok) AS BIGINT) AS max_tokens,
             round(avg(n_chars), 2) AS avg_chars,
             CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_exact_dups
      FROM tok GROUP BY source)
    SELECT d.source, d.n_docs, d.total_tokens, d.min_tokens, d.max_tokens,
           d.avg_chars, d.n_exact_dups, e.lang_entropy
    FROM docstats d JOIN ent2 e ON d.source = e.source
    """,
)
def llm_dataset_stats_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call dataset card per source (the datasheet/model-card summary
    table a curation pipeline publishes with every corpus snapshot):
    document and token volumes, length extremes, exact-duplicate count
    (normalized-hash distinct), and language-mix entropy. Single pass
    over documents + one bounded (source × lang) aggregate; everything
    map-side-combinable. The point of the composite is operational: one
    cheap job after every ingest, diffed against yesterday's card, is
    the earliest drift alarm a 100 TB pipeline has."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH tok AS (
          SELECT doc_id, source, lang, n_chars,
                 size(split(text, ' ')) AS n_tok,
                 md5(lower(trim(text))) AS h
          FROM documents),
        lc AS (SELECT source, lang, count(*) AS n FROM tok GROUP BY source, lang),
        tot AS (SELECT source, sum(n) AS tn FROM lc GROUP BY source),
        ent2 AS (
          SELECT lc.source,
                 round(-sum((CAST(n AS DOUBLE) / tn) * log2(CAST(n AS DOUBLE) / tn)), 6)
                   AS lang_entropy
          FROM lc JOIN tot ON lc.source = tot.source
          GROUP BY lc.source),
        docstats AS (
          SELECT source, count(*) AS n_docs,
                 CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                 CAST(min(n_tok) AS BIGINT) AS min_tokens,
                 CAST(max(n_tok) AS BIGINT) AS max_tokens,
                 round(avg(n_chars), 2) AS avg_chars,
                 CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_exact_dups
          FROM tok GROUP BY source)
        SELECT d.source, d.n_docs, d.total_tokens, d.min_tokens, d.max_tokens,
               d.avg_chars, d.n_exact_dups, e.lang_entropy
        FROM docstats d JOIN ent2 e ON d.source = e.source
        """,
    )


@register(
    "llm_hard_negative_mining",
    oracle=f"""
    WITH probe AS (
      SELECT embedding AS p, label AS plabel FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           round({_DOT_ORACLE.format(a='embedding', b='p')}, 6) AS sim
    FROM embeddings, probe
    WHERE vec_id <> 0 AND label <> plabel
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
)
def llm_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: the
    corpus items MOST similar to the anchor that carry a DIFFERENT label
    — the negatives that actually move a contrastive loss, versus easy
    random negatives (the in-batch-negatives vs hard-negatives
    distinction in dense-retrieval training, e.g. DPR/ANCE, public).
    Plan: broadcast anchor + label, one filtered scan, TakeOrdered
    merge — identical cost to llm_sim_topk; at 100 TB the scan swaps for
    the ANN index probe with a post-filter on label."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH probe AS (
          SELECT embedding AS p, label AS plabel FROM embeddings WHERE vec_id = 0)
        SELECT /*+ BROADCAST(probe) */ vec_id, label,
               round(aggregate(
                       zip_with(embedding, p,
                                (x, y) -> cast(x AS double) * cast(y AS double)),
                       cast(0.0 AS double), (acc, v) -> acc + v), 6) AS sim
        FROM embeddings CROSS JOIN probe
        WHERE vec_id <> 0 AND label <> plabel
        ORDER BY sim DESC, vec_id
        LIMIT 10
        """,
    )


@register(
    "llm_rag_context_pack",
    oracle=f"""
    WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
    top20 AS (
      SELECT e.vec_id,
             round({_DOT_ORACLE.format(a='e.embedding', b='p')}, 6) AS sim
      FROM embeddings e, probe WHERE e.vec_id <> 0
      ORDER BY sim DESC, e.vec_id LIMIT 20),
    ranked AS (
      SELECT vec_id, sim,
             row_number() OVER (ORDER BY sim DESC, vec_id) AS rnk
      FROM top20),
    sized AS (
      SELECT r.rnk, r.vec_id, r.sim,
             len(string_split(d.text, ' ')) AS n_tok
      FROM ranked r JOIN documents d ON d.doc_id = r.vec_id % 500),
    packed AS (
      SELECT rnk, vec_id, sim, n_tok,
             sum(n_tok) OVER (ORDER BY rnk
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tok
      FROM sized)
    SELECT CAST(rnk AS INT) AS rnk, vec_id, sim, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(cum_tok AS BIGINT) AS cum_tok
    FROM packed WHERE cum_tok <= 600
    """,
)
def llm_rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context-window packing: retrieve the probe's top-20 by cosine,
    join each hit to its document's token count, and greedily admit hits
    in relevance order until the context budget (600 tokens) is full —
    the retrieve→budget→pack step every RAG serving stack runs between
    ANN and the model call. The greedy prefix is a running-sum window
    over the RANKED TOP-20 only (bounded grain, not corpus), so the
    packing itself is O(k); the retrieval scan is llm_sim_topk's
    broadcast-probe plan. Deterministic: round-6 sims, vec_id
    tiebreaks, exact integer token counts."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
        top20 AS (
          SELECT /*+ BROADCAST(probe) */ e.vec_id,
                 round(aggregate(
                         zip_with(e.embedding, p,
                                  (x, y) -> cast(x AS double) * cast(y AS double)),
                         cast(0.0 AS double), (acc, v) -> acc + v), 6) AS sim
          FROM embeddings e CROSS JOIN probe WHERE e.vec_id <> 0
          ORDER BY sim DESC, e.vec_id LIMIT 20),
        ranked AS (
          SELECT vec_id, sim,
                 row_number() OVER (ORDER BY sim DESC, vec_id) AS rnk
          FROM top20),
        sized AS (
          SELECT r.rnk, r.vec_id, r.sim,
                 size(split(d.text, ' ')) AS n_tok
          FROM ranked r JOIN documents d ON d.doc_id = r.vec_id % 500),
        packed AS (
          SELECT rnk, vec_id, sim, n_tok,
                 sum(n_tok) OVER (ORDER BY rnk
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tok
          FROM sized)
        SELECT CAST(rnk AS INT) AS rnk, vec_id, sim, CAST(n_tok AS BIGINT) AS n_tok,
               CAST(cum_tok AS BIGINT) AS cum_tok
        FROM packed WHERE cum_tok <= 600
        """,
    )


def _lc_oracle() -> str:
    """Learning-curve oracle: the naive-Bayes fixed-point pipeline of
    ml_naive_bayes_langid replayed at four md5-prefix train fractions
    against one fixed held-out eval slice."""
    return """
    WITH tok AS (
      SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b2,
             t.token
      FROM documents, unnest(string_split(text, ' ')) AS t(token)
      WHERE t.token <> ''),
    cuts AS (SELECT unnest(['33', '66', '99', 'cc']) AS cut),
    cnt AS (
      SELECT c.cut, t.lang, t.token, count(*) AS c FROM tok t
      JOIN cuts c ON t.b2 < c.cut GROUP BY c.cut, t.lang, t.token),
    tot AS (
      SELECT c.cut, t.lang, count(*) AS tt FROM tok t
      JOIN cuts c ON t.b2 < c.cut GROUP BY c.cut, t.lang),
    vocab AS (
      SELECT c.cut, count(DISTINCT t.token) AS v FROM tok t
      JOIN cuts c ON t.b2 < c.cut GROUP BY c.cut),
    prior AS (
      SELECT c.cut, t.lang, count(DISTINCT t.doc_id) AS d FROM tok t
      JOIN cuts c ON t.b2 < c.cut GROUP BY c.cut, t.lang),
    dtot AS (SELECT cut, sum(d) AS dt FROM prior GROUP BY cut),
    evaltok AS (
      SELECT doc_id, lang AS actual_lang, token FROM tok
      WHERE b2 >= 'e6' AND doc_id < 50000),
    scored AS (
      SELECT t.cut, e.doc_id, e.actual_lang, t.lang AS cand_lang,
             sum(CAST(round(ln((COALESCE(c.c, 0) + 1.0) / (t.tt + v.v)) * 1000000)
                      AS BIGINT)) AS ll
      FROM evaltok e
      JOIN tot t ON true
      JOIN vocab v ON v.cut = t.cut
      LEFT JOIN cnt c ON c.cut = t.cut AND c.lang = t.lang AND c.token = e.token
      GROUP BY t.cut, e.doc_id, e.actual_lang, t.lang),
    final AS (
      SELECT s.cut, s.doc_id, s.actual_lang, s.cand_lang,
             s.ll + CAST(round(ln(CAST(p.d AS DOUBLE) / dt.dt) * 1000000) AS BIGINT)
               AS score
      FROM scored s
      JOIN prior p ON p.cut = s.cut AND p.lang = s.cand_lang
      JOIN dtot dt ON dt.cut = s.cut),
    pred AS (
      SELECT cut, doc_id, actual_lang, cand_lang AS pred_lang,
             row_number() OVER (PARTITION BY cut, doc_id
                                ORDER BY score DESC, cand_lang) AS rn
      FROM final)
    SELECT p2.cut, CAST(max(dt2.dt) AS BIGINT) AS train_docs,
           count(*) AS eval_docs,
           round(avg(CASE WHEN p2.pred_lang = p2.actual_lang
                          THEN 1.0 ELSE 0.0 END), 6) AS accuracy
    FROM pred p2 JOIN dtot dt2 ON dt2.cut = p2.cut
    WHERE p2.rn = 1
    GROUP BY p2.cut
    """


@register("llm_data_scaling_curve", oracle=_lc_oracle())
def llm_data_scaling_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-scaling learning curve: the integer-quantized naive-Bayes
    language-ID model (ml_naive_bayes_langid's fixed-point trick) trained
    at FOUR nested md5-prefix fractions of the corpus (~20/40/60/80%) and
    scored on one fixed held-out slice — accuracy-vs-data is the
    empirical scaling curve that decides whether the next 10 TB of
    curation is worth buying (the neural-scaling-laws measurement
    protocol applied to a cheap proxy model). Nested content-stable
    subsets mean every curve point trains on a superset of the previous
    one, exactly like production data-ablation studies. Plan (round 13,
    exact-collapse-first): copies collapse to DISTINCT (md5(text), lang)
    content groups FIRST — one representative is tokenized per group, and
    per-(group, cut) train-copy multiplicities are counted with a plain
    scan + 4-row broadcast theta join (no token explode). Every model
    statistic is then an exact integer product-sum over group grain:
    cnt(cut,lang,token) = Σ_h k(h,token)·m(h,cut) (identical copies
    contribute identical token counts), prior = Σ_h m, vocab = distinct
    rep tokens with m>0. The corpus-sized token explode that previously
    dominated (cached 100×-corpus explode → 72.5 s) disappears; tokenized
    volume now tracks DISTINCT content exactly like the minhash/knn tier,
    and on a low-duplication corpus the collapse degrades to the one
    md5(text) group-by shuffle every exact-collapse op already pays.
    Results are provably identical, so the ORACLE is unchanged.
    Chained temp views (not CTEs) keep the cached stages substitutable."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    spark.sql(
        "SELECT explode(array('33', '66', '99', 'cc')) AS cut"
    ).createOrReplaceTempView("__lc_cuts")
    # per-(content group, cut) train multiplicity: linear scan, no explode
    m = spark.sql(
        """
        SELECT md5(d.text) AS h, d.lang, c.cut, count(*) AS m
        FROM documents d JOIN __lc_cuts c
          ON substr(md5(CAST(d.doc_id AS STRING)), 1, 2) < c.cut
        WHERE d.text IS NOT NULL
        GROUP BY md5(d.text), d.lang, c.cut
        """
    ).cache()
    m.createOrReplaceTempView("__lc_m")
    # one representative text per content group, tokenized ONCE
    spark.sql(
        """
        SELECT md5(text) AS h, lang, min(doc_id) AS rep_doc
        FROM documents WHERE text IS NOT NULL
        GROUP BY md5(text), lang
        """
    ).createOrReplaceTempView("__lc_reps")
    k = spark.sql(
        """
        SELECT r.h, r.lang, token, count(*) AS k
        FROM __lc_reps r JOIN documents d ON d.doc_id = r.rep_doc
        LATERAL VIEW explode(split(d.text, ' ')) AS token
        WHERE token <> ''
        GROUP BY r.h, r.lang, token
        """
    ).cache()
    k.createOrReplaceTempView("__lc_k")
    # Round-10 planner-statistics discipline: both cached stages feed
    # several model views each — materialize before anything downstream
    # is planned so the joins see real InMemoryRelation stats.
    _materialize_cache(spark, m, k)
    views = {
        "__lc_cnt": """
            SELECT m.cut, k.lang, k.token, sum(k.k * m.m) AS c
            FROM __lc_k k JOIN __lc_m m
              ON m.h = k.h AND m.lang <=> k.lang
            GROUP BY m.cut, k.lang, k.token""",
        "__lc_tot": """
            SELECT cut, lang, sum(c) AS tt FROM __lc_cnt GROUP BY cut, lang""",
        "__lc_vocab": """
            SELECT m.cut, count(DISTINCT k.token) AS v
            FROM __lc_k k JOIN __lc_m m
              ON m.h = k.h AND m.lang <=> k.lang
            GROUP BY m.cut""",
        "__lc_prior": """
            SELECT cut, lang, sum(m) AS d FROM __lc_m GROUP BY cut, lang""",
    }
    for name, sql in views.items():
        spark.sql(sql).createOrReplaceTempView(name)
    spark.sql(
        "SELECT cut, sum(d) AS dt FROM __lc_prior GROUP BY cut"
    ).createOrReplaceTempView("__lc_dtot")
    # Eval slice bounded BY CONSTRUCTION (round 11): the md5-bucket slice
    # alone scales with the corpus, so capping it to doc_id < 50000 fixes
    # its size at any scale (a no-op at every test tier — max doc_id 4999)
    # exactly like llm_ann_recall_eval's probe cap. Sampled fixed-size
    # eval sets are the scaling-law-measurement norm; the oracle applies
    # the same predicate. Tokenized DIRECTLY from the filtered documents
    # scan (round 13) — the filter reaches the parquet scan instead of an
    # already-exploded corpus-sized token stage.
    spark.sql(
        """
        SELECT doc_id, lang AS actual_lang, token
        FROM documents LATERAL VIEW explode(split(text, ' ')) AS token
        WHERE token <> ''
          AND substr(md5(CAST(doc_id AS STRING)), 1, 2) >= 'e6'
          AND doc_id < 50000
        """
    ).createOrReplaceTempView("__lc_eval")
    return spark.sql(
        """
        SELECT p2.cut, CAST(max(dt2.dt) AS BIGINT) AS train_docs,
               count(*) AS eval_docs,
               round(avg(CASE WHEN p2.pred_lang = p2.actual_lang
                              THEN CAST(1.0 AS DOUBLE)
                              ELSE CAST(0.0 AS DOUBLE) END), 6) AS accuracy
        FROM (
          SELECT cut, doc_id, actual_lang, cand_lang AS pred_lang,
                 row_number() OVER (PARTITION BY cut, doc_id
                                    ORDER BY score DESC, cand_lang) AS rn
          FROM (
            SELECT s.cut, s.doc_id, s.actual_lang, s.cand_lang,
                   s.ll + CAST(round(ln(CAST(p.d AS DOUBLE) / dt.dt) * 1000000)
                               AS BIGINT) AS score
            FROM (
              SELECT t.cut, e.doc_id, e.actual_lang, t.lang AS cand_lang,
                     -- eval tokens pre-aggregated to (doc, token) counts:
                     -- ke identical integer terms sum as ke * term (exact)
                     sum(e.ke * CAST(round(ln((COALESCE(c.c, 0) + 1.0)
                                              / (t.tt + v.v))
                                    * 1000000) AS BIGINT)) AS ll
              FROM (SELECT doc_id, actual_lang, token, count(*) AS ke
                    FROM __lc_eval
                    GROUP BY doc_id, actual_lang, token) e
              JOIN __lc_tot t ON true
              JOIN __lc_vocab v ON v.cut = t.cut
              LEFT JOIN __lc_cnt c ON c.cut = t.cut AND c.lang = t.lang
                                   AND c.token = e.token
              GROUP BY t.cut, e.doc_id, e.actual_lang, t.lang) s
            JOIN __lc_prior p ON p.cut = s.cut AND p.lang = s.cand_lang
            JOIN __lc_dtot dt ON dt.cut = s.cut) f) p2
        JOIN __lc_dtot dt2 ON dt2.cut = p2.cut
        WHERE p2.rn = 1
        GROUP BY p2.cut
        """
    )


@register(
    "mm_modality_router",
    oracle="""
    WITH tagged AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN NULL ELSE n_chars + 8 END AS nbytes,
             CASE WHEN text IS NULL THEN 'missing'
                  WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'image/jpeg'
                  ELSE 'audio/wav' END AS modality
      FROM documents)
    SELECT modality, count(*) AS n_items,
           CAST(sum(nbytes) AS BIGINT) AS total_bytes,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM tagged GROUP BY modality
    """,
)
def mm_modality_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal ingestion routing by MAGIC BYTES: each row's binary
    payload is sniffed from its real leading bytes (PNG \\x89PNG,
    JPEG \\xff\\xd8\\xff, WAV RIFF — the actual signatures, not metadata
    trust) and routed to its modality pipeline. Payload construction is
    the deterministic stand-in (an 8-byte real magic header + utf-8
    bytes, modality assigned by doc_id%3 so the oracle is exact); the
    SNIFF itself is the real production logic — a map-side binary
    substring comparison that never trusts file extensions. At 100 TB
    this is the demux stage in front of per-modality decoders
    (mm_decode_stub / mm_audio_chunk_stub), one pass, no shuffle before
    the per-modality aggregate. NULL payloads route to a 'missing' class
    (r15 null sweep) — the router is where absent media gets ACCOUNTED,
    which is why the decoder stubs may simply skip them."""
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])))
        .when(F.col("doc_id") % 3 == 1, F.lit(bytes([0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10, 0x4A, 0x46])))
        .otherwise(F.lit(b"RIFF\x00\x00\x00\x00"))
    )
    payloads = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(magic, F.encode("text", "utf-8")).alias("payload"),
    )
    sniffed = payloads.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.when(F.col("payload").isNull(), "missing")
        .when(
            F.substring("payload", 1, 4) == F.lit(bytes([0x89, 0x50, 0x4E, 0x47])),
            "image/png",
        )
        .when(
            F.substring("payload", 1, 3) == F.lit(bytes([0xFF, 0xD8, 0xFF])),
            "image/jpeg",
        )
        .when(F.substring("payload", 1, 4) == F.lit(b"RIFF"), "audio/wav")
        .otherwise("unknown")
        .alias("modality"),
    )
    return sniffed.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "llm_span_corruption_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source, unnest(generate_series(1, len(tk))) AS pos
      FROM (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents)),
    masked AS (
      SELECT doc_id, source, pos,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                            || CAST(pos AS VARCHAR)), 1, 8)) AS BIGINT)
                       / 4294967296e0 < 0.15 THEN 1 ELSE 0 END AS m
      FROM tok),
    spans AS (
      SELECT doc_id, source, m,
             CASE WHEN m = 1 AND COALESCE(lag(m) OVER (
                    PARTITION BY doc_id ORDER BY pos), 0) = 0
                  THEN 1 ELSE 0 END AS span_start
      FROM masked)
    SELECT source, count(*) AS total_tokens,
           CAST(sum(m) AS BIGINT) AS n_masked,
           round(CAST(sum(m) AS DOUBLE) / count(*), 6) AS mask_ratio,
           CAST(sum(span_start) AS BIGINT) AS n_spans,
           round(CAST(sum(m) AS DOUBLE) / sum(span_start), 6) AS avg_span_len
    FROM spans GROUP BY source
    """,
)
def llm_span_corruption_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption masking statistics (the T5/UL2 pretraining
    objective's data side): positions are masked by a content-stable md5
    coin (~15%), adjacent masked positions merge into spans via the
    gaps-and-islands lag trick, and the audit reports realized mask
    ratio and mean span length per source — the two knobs span-corruption
    recipes are tuned by. Deterministic ⇒ the same document always
    produces the same spans (reproducible training batches). One
    position explode + one doc-partitioned window + one source
    aggregate; nothing quadratic, nothing RNG-stateful."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH tok AS (
          SELECT doc_id, source, pos + 1 AS pos, token
          FROM (SELECT doc_id, source, split(text, ' ') AS tk FROM documents)
          LATERAL VIEW posexplode(tk) AS pos, token),
        masked AS (
          SELECT doc_id, source, pos,
                 CASE WHEN CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':',
                                CAST(pos AS STRING))), 1, 8), 16, 10) AS BIGINT)
                           / 4294967296e0 < 0.15 THEN 1 ELSE 0 END AS m
          FROM tok),
        spans AS (
          SELECT doc_id, source, m,
                 CASE WHEN m = 1 AND COALESCE(lag(m) OVER (
                        PARTITION BY doc_id ORDER BY pos), 0) = 0
                      THEN 1 ELSE 0 END AS span_start
          FROM masked)
        SELECT source, count(*) AS total_tokens,
               CAST(sum(m) AS BIGINT) AS n_masked,
               round(CAST(sum(m) AS DOUBLE) / count(*), 6) AS mask_ratio,
               CAST(sum(span_start) AS BIGINT) AS n_spans,
               round(CAST(sum(m) AS DOUBLE) / sum(span_start), 6) AS avg_span_len
        FROM spans GROUP BY source
        """,
    )


@register(
    "llm_curation_funnel",
    oracle="""
    WITH base AS (
      SELECT doc_id, source, md5(lower(trim(text))) AS h,
             string_split(text, ' ') AS tk
      FROM documents),
    meta AS (
      SELECT doc_id, source, h, len(tk) AS n_tok,
             len(list_distinct(tk)) AS n_uniq
      FROM base),
    s1 AS (
      SELECT m.* FROM meta m
      JOIN (SELECT h, min(doc_id) AS keep FROM meta GROUP BY h) k
        ON m.h = k.h AND m.doc_id = k.keep),
    s2 AS (
      SELECT * FROM s1
      WHERE n_tok BETWEEN 10 AND 400 AND n_uniq * 10 >= 3 * n_tok),
    tok AS (
      SELECT DISTINCT b.doc_id, b.source, t.token
      FROM base b JOIN s2 ON b.doc_id = s2.doc_id,
           unnest(b.tk) AS t(token)),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
      FROM tok a JOIN tok b ON a.token = b.token AND a.source = b.source
                           AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    dups AS (
      SELECT DISTINCT s.db FROM shared s
      JOIN sizes za ON za.doc_id = s.da JOIN sizes zb ON zb.doc_id = s.db
      WHERE CAST(s.c AS DOUBLE) / (za.n + zb.n - s.c) >= 0.5),
    s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT db FROM dups)),
    raw AS (SELECT count(*) AS rd FROM meta)
    SELECT stage, n_docs, n_tokens,
           round(CAST(n_docs AS DOUBLE) / raw.rd, 6) AS frac_of_raw
    FROM (
      SELECT '0_raw' AS stage, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM meta
      UNION ALL
      SELECT '1_exact_dedup', count(*), CAST(sum(n_tok) AS BIGINT) FROM s1
      UNION ALL
      SELECT '2_quality', count(*), CAST(sum(n_tok) AS BIGINT) FROM s2
      UNION ALL
      SELECT '3_near_dedup', count(*), CAST(sum(n_tok) AS BIGINT) FROM s3) f
    CROSS JOIN raw
    """,
)
def llm_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel in ONE call — the per-stage survival
    table a training-data pipeline publishes with every corpus build:
    raw → exact dedup (normalized-hash keep-lowest) → quality gate
    (length band + distinct-token ratio, integer-exact comparisons) →
    near-dedup (same-source token-set Jaccard ≥ 0.5, keep-lower-id).
    Each stage is one of this repo's proven primitives composed into a
    single plan; the output is the funnel (docs, tokens, fraction of
    raw per stage), which is what curation reviews actually read. Scale
    shape (round-13 collapse rewrite, provably identical): per-doc text
    attributes (two splits + the normalized hash) are computed on ONE
    representative per distinct (text, source) group instead of every
    copy — stage 0 weights by copy multiplicity (exact integer sums),
    and stages 1–3 operate on survivors, which are one-per-normalized-
    hash by definition, so the keep-lowest winner is the group holding
    the globally minimal doc_id (min over group minima). The near-dedup
    self-join was already survivor-bounded; now the metadata stage is
    too. The 1-row raw-count broadcast is allowlisted; stage views are
    CTE-free (the round-4 cache-substitution rule)."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    # copies → (text, source) content groups: the only full-corpus pass
    grp = spark.sql(
        """
        SELECT md5(text) AS ht, source, min(doc_id) AS rep_doc,
               count(*) AS mult
        FROM documents GROUP BY md5(text), source
        """
    ).cache()
    grp.createOrReplaceTempView("__cf_grp")
    # text attributes on representatives only
    meta = spark.sql(
        """
        SELECT g.rep_doc AS doc_id, g.source, g.mult,
               md5(lower(trim(d.text))) AS h,
               size(split(d.text, ' ')) AS n_tok,
               size(array_distinct(split(d.text, ' '))) AS n_uniq
        FROM __cf_grp g JOIN documents d ON d.doc_id = g.rep_doc
        """
    ).cache()
    meta.createOrReplaceTempView("__cf_meta")
    _materialize_cache(spark, grp, meta)
    # keep-lowest per normalized hash: the winning group is the one whose
    # min doc_id is globally minimal (copies share their group's rep)
    spark.sql(
        """
        SELECT doc_id, source, h, n_tok, n_uniq FROM (
          SELECT m.*, min(doc_id) OVER (PARTITION BY h) AS keep
          FROM __cf_meta m)
        WHERE doc_id = keep AND h IS NOT NULL
        """
    ).createOrReplaceTempView("__cf_s1")
    spark.sql(
        """
        SELECT * FROM __cf_s1
        WHERE n_tok BETWEEN 10 AND 400 AND n_uniq * 10 >= 3 * n_tok
        """
    ).createOrReplaceTempView("__cf_s2")
    tok = spark.sql(
        """
        SELECT DISTINCT d.doc_id, s2.source, token
        FROM documents d JOIN __cf_s2 s2 ON d.doc_id = s2.doc_id
        LATERAL VIEW explode(split(d.text, ' ')) AS token
        """
    ).cache()
    tok.createOrReplaceTempView("__cf_tok")
    # per-doc token-set sizes once; both Jaccard sides broadcast it
    spark.sql(
        "SELECT doc_id, count(*) AS n FROM __cf_tok GROUP BY doc_id"
    ).createOrReplaceTempView("__cf_cnt")
    spark.sql(
        """
        SELECT * FROM __cf_s2 WHERE doc_id NOT IN (
          SELECT DISTINCT s.db FROM (
            SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
            FROM __cf_tok a JOIN __cf_tok b
              ON a.token = b.token AND a.source = b.source
             AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id) s
          JOIN __cf_cnt za ON za.doc_id = s.da
          JOIN __cf_cnt zb ON zb.doc_id = s.db
          WHERE CAST(s.c AS DOUBLE) / (za.n + zb.n - s.c) >= 0.5)
        """
    ).createOrReplaceTempView("__cf_s3")
    return spark.sql(
        """
        SELECT stage, n_docs, n_tokens,
               round(CAST(n_docs AS DOUBLE) / raw.rd, 6) AS frac_of_raw
        FROM (
          SELECT '0_raw' AS stage, sum(mult) AS n_docs,
                 CAST(sum(mult * n_tok) AS BIGINT) AS n_tokens
          FROM __cf_meta
          UNION ALL
          SELECT '1_exact_dedup', count(*), CAST(sum(n_tok) AS BIGINT)
          FROM __cf_s1
          UNION ALL
          SELECT '2_quality', count(*), CAST(sum(n_tok) AS BIGINT)
          FROM __cf_s2
          UNION ALL
          SELECT '3_near_dedup', count(*), CAST(sum(n_tok) AS BIGINT)
          FROM __cf_s3) f
        CROSS JOIN (SELECT sum(mult) AS rd FROM __cf_meta) raw
        """
    )


@register(
    "ml_knn_classifier_eval",
    oracle=f"""
    WITH {_KNN_IVF_CTES},
    top5 AS (
      SELECT k.vec_id, nb.label AS nlabel
      FROM knn k JOIN embeddings nb ON nb.vec_id = k.neighbor_id),
    votes AS (
      SELECT vec_id, nlabel, count(*) AS c FROM top5 GROUP BY vec_id, nlabel),
    pred AS (
      SELECT vec_id, nlabel AS plabel FROM (
        SELECT vec_id, nlabel,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY c DESC, nlabel) AS rn
        FROM votes) WHERE rn = 1)
    SELECT e.label, count(*) AS n_vectors,
           CAST(sum(CASE WHEN p.plabel = e.label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(avg(CASE WHEN p.plabel = e.label
                          THEN CAST(1.0 AS DOUBLE)
                          ELSE CAST(0.0 AS DOUBLE) END), 6) AS accuracy
    FROM embeddings e JOIN pred p ON e.vec_id = p.vec_id
    GROUP BY e.label
    """,
)
def ml_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out k-NN classification accuracy per label (k=5,
    majority vote with a label tiebreak) — the zero-training baseline
    every embedding space is judged by before anyone trains a probe:
    if 5-NN can't recover the labels, the embeddings don't encode them.
    COMPOSES the proven distributed machinery: the neighbor lists come
    from llm_knn_all's collapse + IVF-bucketed within-cell top-5 (round
    11 — bounded at any corpus size, no all-pairs anywhere), then a label
    join + two bounded window passes produce votes and per-label
    accuracy. Vectors in singleton IVF cells have no neighbors and drop
    from the eval (the same documented recall trade as llm_knn_all). The
    oracle replays the identical reps → cell → within-cell-rank pipeline.
    No forced broadcast on the corpus-scaled label table (round-10
    policy; AQE broadcasts it when genuinely small)."""
    knn = llm_knn_all(spark, sf_dir)  # vec_id, neighbor_id, rnk, sim
    labels = t(spark, sf_dir, "embeddings").select("vec_id", "label")
    nlabels = labels.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")
    )
    votes = (
        knn.join(nlabels, "neighbor_id")
        .groupBy("vec_id", "nlabel")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("c").desc(), "nlabel")
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("nlabel").alias("plabel"))
    )
    return (
        labels.join(pred, "vec_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(
                F.when(F.col("plabel") == F.col("label"), 1).otherwise(0)
            ).cast("bigint").alias("n_correct"),
            ratio(
                F.avg(
                    F.when(F.col("plabel") == F.col("label"), 1.0).otherwise(0.0)
                )
            ).alias("accuracy"),
        )
    )


@register(
    "llm_watermark_greenlist_detect",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source, t.token
      FROM documents, unnest(string_split(text, ' ')) AS t(token)
      WHERE t.token <> ''),
    scored AS (
      SELECT doc_id, source, count(*) AS n,
             CAST(sum(CASE WHEN CAST(('0x' || substr(md5(token), 1, 2)) AS INTEGER)
                                % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g
      FROM tok GROUP BY doc_id, source),
    z AS (
      SELECT doc_id, source, n, g,
             (g - n / 2.0) / sqrt(n / 4.0) AS zscore
      FROM scored WHERE n >= 10)
    SELECT source, count(*) AS n_docs,
           round(avg(zscore), 6) AS avg_z,
           CAST(sum(CASE WHEN zscore > 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged
    FROM z GROUP BY source
    """,
)
def llm_watermark_greenlist_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenlist watermark detection screen (Kirchenbauer et al. 2023,
    arXiv 2301.10226, public): a watermarked generator boosts a
    pseudorandom "green" half of the vocabulary, so watermarked text
    shows a green-token fraction significantly above 1/2 — the one-pass
    z-test (g − n/2)/√(n/4) per document is the detector. The greenlist
    membership here is the md5-parity half of the vocab (the detector's
    real structure with a public hash standing in for the generator's
    keyed PRF). Per-source aggregation is the provenance screen a corpus
    intake runs: a source with inflated average z is machine-generated
    with that watermark key. Map-side token hash + two bounded
    aggregates; no state, no RNG."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH tok AS (
          SELECT doc_id, source, token
          FROM documents LATERAL VIEW explode(split(text, ' ')) AS token
          WHERE token <> ''),
        scored AS (
          SELECT doc_id, source, count(*) AS n,
                 CAST(sum(CASE WHEN CAST(conv(substr(md5(token), 1, 2), 16, 10)
                                    AS INT) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS g
          FROM tok GROUP BY doc_id, source),
        z AS (
          SELECT doc_id, source, n, g,
                 (g - n / 2.0) / sqrt(n / 4.0) AS zscore
          FROM scored WHERE n >= 10)
        SELECT source, count(*) AS n_docs,
               round(avg(zscore), 6) AS avg_z,
               CAST(sum(CASE WHEN zscore > 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_flagged
        FROM z GROUP BY source
        """,
    )


@register(
    "llm_bigram_entropy_rate",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source, unnest(generate_series(1, len(tk))) AS pos, tk
      FROM (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents)),
    bigr AS (
      SELECT source, tk[pos] AS prev, tk[pos + 1] AS nxt
      FROM tok WHERE pos < len(tk)),
    pair_cnt AS (
      SELECT source, prev, nxt, count(*) AS c FROM bigr
      GROUP BY source, prev, nxt),
    prev_cnt AS (
      SELECT source, prev, sum(c) AS pc FROM pair_cnt GROUP BY source, prev),
    tot AS (SELECT source, sum(c) AS t FROM pair_cnt GROUP BY source)
    SELECT p.source,
           CAST(max(t.t) AS BIGINT) AS n_bigrams,
           round(-sum((CAST(p.c AS DOUBLE) / t.t)
                      * log2(CAST(p.c AS DOUBLE) / pv.pc)), 6)
             AS cond_entropy_bits,
           CAST(count(*) AS BIGINT) AS n_distinct_bigrams
    FROM pair_cnt p
    JOIN prev_cnt pv ON p.source = pv.source AND p.prev = pv.prev
    JOIN tot t ON p.source = t.source
    GROUP BY p.source
    """,
)
def llm_bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional entropy rate per source, H(next | prev) =
    −Σ p(prev,next)·log2 p(next|prev) — the Shannon-style predictability
    measure of a text stream: low entropy flags templated/boilerplate
    feeds (complementing llm_ngram_novelty's first-occurrence view with
    an information-theoretic one), high entropy flags noise. All
    probabilities are exact integer count ratios; the only floats are
    the final log2 terms under round-6. Plan: one position explode, one
    (source, prev, next) aggregate, two bounded-grain joins — the same
    shuffle budget as llm_bigram_lm, which shares the count tables at
    100 TB."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH bigr AS (
          SELECT source, tk[pos] AS prev, tk[pos + 1] AS nxt
          FROM (
            SELECT source, tk, posexplode(tk) AS (pos, tokval)
            FROM (SELECT source, split(text, ' ') AS tk FROM documents))
          WHERE pos < size(tk) - 1),
        pair_cnt AS (
          SELECT source, prev, nxt, count(*) AS c FROM bigr
          GROUP BY source, prev, nxt),
        prev_cnt AS (
          SELECT source, prev, sum(c) AS pc FROM pair_cnt GROUP BY source, prev),
        tot AS (SELECT source, sum(c) AS t FROM pair_cnt GROUP BY source)
        SELECT p.source,
               CAST(max(t.t) AS BIGINT) AS n_bigrams,
               round(-sum((CAST(p.c AS DOUBLE) / t.t)
                          * log2(CAST(p.c AS DOUBLE) / pv.pc)), 6)
                 AS cond_entropy_bits,
               CAST(count(*) AS BIGINT) AS n_distinct_bigrams
        FROM pair_cnt p
        JOIN prev_cnt pv ON p.source = pv.source AND p.prev = pv.prev
        JOIN tot t ON p.source = t.source
        GROUP BY p.source
        """,
    )


@register(
    "llm_collocation_pmi",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos, tk
      FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)),
    bigr AS (
      SELECT tk[pos] AS a, tk[pos + 1] AS b
      FROM tok WHERE pos < len(tk)),
    pair_cnt AS (SELECT a, b, count(*) AS c FROM bigr GROUP BY a, b),
    left_cnt AS (SELECT a, sum(c) AS ca FROM pair_cnt GROUP BY a),
    right_cnt AS (SELECT b, sum(c) AS cb FROM pair_cnt GROUP BY b),
    tot AS (SELECT sum(c) AS t FROM pair_cnt)
    SELECT p.a, p.b, CAST(p.c AS BIGINT) AS n_pair,
           round(log2((CAST(p.c AS DOUBLE) * t.t)
                      / (CAST(l.ca AS DOUBLE) * r.cb)), 6) AS pmi
    FROM pair_cnt p
    JOIN left_cnt l ON p.a = l.a
    JOIN right_cnt r ON p.b = r.b
    CROSS JOIN tot t
    WHERE p.c >= 5
    ORDER BY pmi DESC, p.a, p.b
    LIMIT 20
    """,
)
def llm_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction by pointwise mutual information over
    ADJACENT token pairs: PMI = log2(p(a,b)/(p(a)p(b))) with a minimum
    pair count of 5 (the Church–Hanks association measure; the min-count
    floor removes PMI's rare-pair bias). High-PMI adjacent pairs are the
    multi-word expressions a tokenizer or phrase-mining stage should
    treat as units. Candidate pairs are bigrams only — |tokens| pairs,
    never a co-occurrence matrix; the margins are two bounded-grain
    sums of the same pair-count table, and the 1-row total broadcast is
    allowlisted. All probabilities are exact count ratios under
    round-6."""
    return sql_q(
        spark,
        sf_dir,
        """
        WITH bigr AS (
          SELECT tk[pos] AS a, tk[pos + 1] AS b
          FROM (
            SELECT tk, posexplode(tk) AS (pos, tokval)
            FROM (SELECT split(text, ' ') AS tk FROM documents))
          WHERE pos < size(tk) - 1),
        pair_cnt AS (SELECT a, b, count(*) AS c FROM bigr GROUP BY a, b),
        left_cnt AS (SELECT a, sum(c) AS ca FROM pair_cnt GROUP BY a),
        right_cnt AS (SELECT b, sum(c) AS cb FROM pair_cnt GROUP BY b),
        tot AS (SELECT sum(c) AS t FROM pair_cnt)
        SELECT p.a, p.b, CAST(p.c AS BIGINT) AS n_pair,
               round(log2((CAST(p.c AS DOUBLE) * t.t)
                          / (CAST(l.ca AS DOUBLE) * r.cb)), 6) AS pmi
        FROM pair_cnt p
        JOIN left_cnt l ON p.a = l.a
        JOIN right_cnt r ON p.b = r.b
        CROSS JOIN tot t
        WHERE p.c >= 5
        ORDER BY pmi DESC, p.a, p.b
        LIMIT 20
        """,
    )


# ---------------------------------------------------------------------------
# round-5 scale-safe twins for the two quadratic dedup forms (VERDICT r4 #2).
# Both compose the production pipeline's upstream EXACT-collapse stage
# (identical content -> one representative) before the near-dup search:
# exact duplicates are the degenerate case that makes any within-bucket /
# within-cluster quadratic verify blow up (the anchors measured 20x/41x at
# 10x data on the 90%-exact-dup amplified corpus), and every real corpus
# runs hash-dedup first. Collapse is one linear shuffle on a content hash;
# the near-dup stage then scales with DISTINCT content, which the 10x
# amplification leaves unchanged (ratio ~1x, recorded in BASELINE.md).
# ---------------------------------------------------------------------------

_CB_MINHASH_ORACLE = """
    WITH reps AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    toks AS (
      SELECT d.doc_id, string_split(d.text, ' ') AS tk
      FROM documents d JOIN reps USING (doc_id)),
    shingle AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, len(tk) - 2),
               i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh
      FROM toks),
    hashed AS (
      SELECT doc_id, sh,
             CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) AS h
      FROM shingle),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingle GROUP BY doc_id),
    sig AS (
      SELECT doc_id, s.seed,
             min((CAST(1000003 AS BIGINT) * (s.seed + 1) * h
                  + 7919 * s.seed + 271) % 4294967291) AS mh
      FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS seed) s
      GROUP BY doc_id, s.seed),
    band AS (
      SELECT doc_id, seed // 4 AS band_id,
             md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS band_sig
      FROM sig GROUP BY doc_id, seed // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM band a JOIN band b
        ON a.band_id = b.band_id AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id),
    shared AS (
      SELECT c.doc_a, c.doc_b, count(*) AS shared_cnt
      FROM cand c
      JOIN shingle sa ON sa.doc_id = c.doc_a
      JOIN shingle sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh
      GROUP BY c.doc_a, c.doc_b)
    SELECT s.doc_a, s.doc_b,
           round(CAST(s.shared_cnt AS DOUBLE) / least(za.n, zb.n), 6)
             AS containment
    FROM shared s
    JOIN sizes za ON za.doc_id = s.doc_a
    JOIN sizes zb ON zb.doc_id = s.doc_b
    WHERE CAST(s.shared_cnt AS DOUBLE) / least(za.n, zb.n) >= 0.2
    ORDER BY containment DESC, s.doc_a, s.doc_b
    LIMIT 100
"""


@register("llm_containment_banded", oracle=_CB_MINHASH_ORACLE)
def llm_containment_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of ``llm_containment_dedup``: the same asymmetric
    containment verify (shared shingles / smaller doc's shingle count, the
    Broder containment measure), made linear-time by two composed stages —

    1. EXACT collapse: md5(text) groupBy keeps one representative doc_id
       per distinct text (the upstream stage of every production dedup
       pipeline; one shuffle carrying a 128-bit hash per doc). This removes
       the duplicate-multiplicity blowup that made the anchor quadratic
       (20x at 10x data on a 90%-exact-dup corpus).
    2. MinHash-LSH banding over representatives only — the
       ``llm_minhash_banding`` layout (one md5 + 20 affine integer lanes
       per shingle, 5x4 bands, band-bucket self-join) — feeding the exact
       containment verify at >= 0.2.

    Documented recall tradeoff vs the anchor: minhash banding is tuned for
    resemblance, so a tiny doc fully contained in a huge one (containment
    1.0, Jaccard ~0.01) can miss all 5 bands; the anchor keeps the
    exhaustive-within-source form as the semantic oracle. Deterministic
    end-to-end — DuckDB replicates the affine signature bit-for-bit (all
    arithmetic < 2^57), so the twin stays exactly hash-checkable."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    # cached: sizes + signature build + both sides of the containment verify
    shingle = spark.sql(
        """
        SELECT doc_id, sh
        FROM (SELECT d.doc_id, split(d.text, ' ') AS tk
              FROM documents d
              JOIN (SELECT min(doc_id) AS doc_id FROM documents
                    GROUP BY md5(text)) reps USING (doc_id))
        LATERAL VIEW explode(array_distinct(transform(
            sequence(0, size(tk) - 3),
            i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS sh
        """
    ).cache()
    shingle.createOrReplaceTempView("__cb_shingle")
    # Same planner-statistics discipline as llm_minhash_banding (round 10):
    # materialize so the verify joins are planned against the cache's REAL
    # size, not the pre-explode estimate.
    _materialize_cache(spark, shingle)
    P = 4294967291  # largest 32-bit prime; a*h+b < 2^57, no 64-bit wrap
    minhashes = ",\n".join(
        f"min(({1000003 * (s + 1)} * h + {7919 * s + 271}) % {P}) AS mh{s}"
        for s in range(20)
    )
    band_structs = ", ".join(
        "struct({j} AS band_id, md5(concat_ws('|', {cols})) AS band_sig)".format(
            j=j, cols=", ".join(f"cast(mh{4 * j + i} AS string)" for i in range(4))
        )
        for j in range(5)
    )
    # CTE-free below the cache points: WITH-CTE references are not rewritten
    # by CacheManager's cached-plan substitution (round-4 finding), so every
    # stage reads the cached views directly. All 20 lanes fold in ONE
    # aggregation pass — the shuffle carries 20 columns x n_reps, never
    # shingle x seed.
    band = spark.sql(
        f"""
        SELECT doc_id, bs.band_id, bs.band_sig
        FROM (
          SELECT doc_id, {minhashes}
          FROM (SELECT doc_id,
                       cast(conv(substr(md5(sh), 1, 8), 16, 10) AS bigint) AS h
                FROM __cb_shingle)
          GROUP BY doc_id) sig
        LATERAL VIEW explode(array({band_structs})) AS bs
        """
    ).cache()
    band.createOrReplaceTempView("__cb_band")
    return spark.sql(
        """
        SELECT s.doc_a, s.doc_b,
               round(cast(s.shared_cnt AS double) / least(za.n, zb.n), 6)
                 AS containment
        FROM (
          SELECT c.doc_a, c.doc_b, count(*) AS shared_cnt
          FROM (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM __cb_band a JOIN __cb_band b
                  ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                 AND a.doc_id < b.doc_id) c
          JOIN __cb_shingle sa ON sa.doc_id = c.doc_a
          JOIN __cb_shingle sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh
          GROUP BY c.doc_a, c.doc_b) s
        JOIN (SELECT doc_id, count(*) AS n FROM __cb_shingle GROUP BY doc_id) za
          ON za.doc_id = s.doc_a
        JOIN (SELECT doc_id, count(*) AS n FROM __cb_shingle GROUP BY doc_id) zb
          ON zb.doc_id = s.doc_b
        WHERE cast(s.shared_cnt AS double) / least(za.n, zb.n) >= 0.2
        ORDER BY containment DESC, s.doc_a, s.doc_b
        LIMIT 100
        """
    )


@register(
    "llm_semdedup_sqrtn",
    oracle=f"""
    WITH reps AS (
      SELECT min(vec_id) AS vec_id FROM embeddings GROUP BY embedding),
    re AS (
      SELECT e.vec_id, e.embedding
      FROM embeddings e JOIN reps USING (vec_id)),
    params AS (
      SELECT greatest(1, CAST(floor(count(*) / floor(sqrt(count(*))))
                          AS BIGINT)) AS stride
      FROM re),
    cents AS (
      SELECT vec_id AS cent_id, embedding AS cent FROM re
      WHERE vec_id % (SELECT stride FROM params) = 0),
    assigned AS (
      SELECT vec_id, cent_id FROM (
        SELECT e.vec_id, c.cent_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round({_DOT_ORACLE.format(a='e.embedding', b='c.cent')}, 6)
                          DESC, c.cent_id) AS rn
        FROM re e CROSS JOIN cents c)
      WHERE rn = 1),
    pairs AS (
      SELECT a.cent_id, b.vec_id AS dup_id
      FROM assigned a
      JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      JOIN re ea ON ea.vec_id = a.vec_id
      JOIN re eb ON eb.vec_id = b.vec_id
      WHERE round({_DOT_ORACLE.format(a='ea.embedding', b='eb.embedding')}, 6)
            >= {_SEMDEDUP_TAU}),
    rem AS (
      SELECT cent_id, count(DISTINCT dup_id) AS n_removed FROM pairs
      GROUP BY cent_id),
    tot AS (SELECT cent_id, count(*) AS n_total FROM assigned GROUP BY cent_id)
    SELECT CAST((SELECT count(*) FROM embeddings)
                - (SELECT count(*) FROM re) AS BIGINT) AS n_exact_collapsed,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(t.n_total) AS BIGINT) AS n_reps,
           CAST(sum(COALESCE(r.n_removed, 0)) AS BIGINT) AS n_removed,
           CAST(sum(t.n_total - COALESCE(r.n_removed, 0)) AS BIGINT) AS n_kept,
           CAST(max(t.n_total) AS BIGINT) AS max_cluster
    FROM tot t LEFT JOIN rem r ON r.cent_id = t.cent_id
    """,
)
def llm_semdedup_sqrtn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of ``llm_semdedup_centroid`` (SemDeDup, public arXiv
    2303.09540) with the two changes that make semantic dedup survive a
    100 TB corpus:

    1. EXACT collapse first: identical embedding vectors keep one
       representative (groupBy on the vector — one linear shuffle).
       Exact-duplicate vectors are the degenerate case for within-cluster
       pair search (the k=16 anchor measured 41x at 10x data on the
       90%-exact-dup corpus); they are already found by hash dedup, so
       the semantic stage should never re-discover them pairwise.
    2. k = floor(sqrt(N_reps)) clusters instead of fixed k=16: expected
       within-cluster pair work drops from O(N^2/16) to O(N^1.5), the
       standard SemDeDup/IVF operating point — cluster count grows with
       the corpus so per-cluster blocks stay bounded.

    Corpus-level summary grain (collapsed count, cluster count, reps,
    removed, kept, max cluster) so the schema is stable while k varies
    with N. Deterministic: centroids are the representatives whose vec_id
    is a multiple of stride = floor(N_reps/k) — an O(1)-per-row rule (no
    global sort / unpartitioned window; stand-ins for trained
    ``ml_kmeans_lloyd`` means), keep-lowest-vec_id dedup rule — exactly
    oracle-checkable at any sf.

    The collapsed representative set is CACHED and referenced via a temp
    view, not a CTE: the stride scalar, centroid filter, assignment, and
    both verify sides read it (5 references), and WITH-CTE definitions are
    not rewritten by CacheManager's cached-plan substitution (round-4
    finding) — the CTE form recomputed the vector-groupBy collapse per
    reference."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    re_df = spark.sql(
        """
        SELECT vec_id, embedding
        FROM (SELECT min(vec_id) AS vec_id FROM embeddings
              GROUP BY embedding) r
        JOIN embeddings USING (vec_id)
        """
    ).cache()
    re_df.createOrReplaceTempView("__sq_reps")
    assigned = spark.sql(
        """
        SELECT vec_id, cent_id FROM (
          SELECT /*+ BROADCAST(c) */ e.vec_id, c.cent_id,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY round(aggregate(
                              zip_with(e.embedding, c.cent,
                                       (x, y) -> cast(x AS double) * cast(y AS double)),
                              cast(0.0 AS double), (acc, v) -> acc + v), 6)
                            DESC, c.cent_id) AS rn
          FROM __sq_reps e
          CROSS JOIN (SELECT vec_id AS cent_id, embedding AS cent
                      FROM __sq_reps
                      WHERE vec_id % (SELECT greatest(1, cast(floor(count(*) /
                                floor(sqrt(count(*)))) AS bigint))
                                      FROM __sq_reps) = 0) c)
        WHERE rn = 1
        """
    ).cache()
    assigned.createOrReplaceTempView("__sq_assigned")
    return spark.sql(
        f"""
        SELECT cast((SELECT count(*) FROM embeddings)
                    - (SELECT count(*) FROM __sq_reps) AS bigint)
                 AS n_exact_collapsed,
               cast(count(*) AS bigint) AS n_clusters,
               cast(sum(t.n_total) AS bigint) AS n_reps,
               cast(sum(COALESCE(r.n_removed, 0)) AS bigint) AS n_removed,
               cast(sum(t.n_total - COALESCE(r.n_removed, 0)) AS bigint) AS n_kept,
               cast(max(t.n_total) AS bigint) AS max_cluster
        FROM (SELECT cent_id, count(*) AS n_total
              FROM __sq_assigned GROUP BY cent_id) t
        LEFT JOIN (
          SELECT cent_id, count(DISTINCT dup_id) AS n_removed
          FROM (SELECT a.cent_id, b.vec_id AS dup_id
                FROM __sq_assigned a
                JOIN __sq_assigned b
                  ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
                JOIN __sq_reps ea ON ea.vec_id = a.vec_id
                JOIN __sq_reps eb ON eb.vec_id = b.vec_id
                WHERE round(aggregate(
                        zip_with(ea.embedding, eb.embedding,
                                 (x, y) -> cast(x AS double) * cast(y AS double)),
                        cast(0.0 AS double), (acc, v) -> acc + v), 6)
                      >= {_SEMDEDUP_TAU})
          GROUP BY cent_id) r ON r.cent_id = t.cent_id
        """
    )


_DUPDIST_SQL = """
    WITH clusters AS (
      SELECT md5(text) AS h, count(*) AS sz FROM documents GROUP BY md5(text))
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs,
           round(CAST(sz * count(*) AS DOUBLE)
                 / (SELECT count(*) FROM documents), 6) AS corpus_share,
           CAST((sz - 1) * count(*) AS BIGINT) AS n_removable
    FROM clusters GROUP BY sz ORDER BY sz
"""


@register("llm_dup_cluster_size_dist", oracle=_DUPDIST_SQL)
def llm_dup_cluster_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size distribution — the governance readout
    that sizes a dedup run BEFORE paying for it (how many clusters of
    size 2, 3, ...; what fraction of the corpus is removable as
    non-representative copies). Two hash aggregates: content digest →
    cluster sizes, then sizes → histogram; the shuffle carries one
    128-bit hash per doc, then one row per distinct size. The n_removable
    column is exactly the row count llm_exact_dedup would drop — pinned
    by the shared md5(text) grouping."""
    return sql_q(spark, sf_dir, _DUPDIST_SQL)


def _ppl_buckets_sql(tok_expr: str, pdisc33: str, pdisc67: str) -> str:
    return f"""
    WITH tok AS (
        SELECT doc_id, lang, {tok_expr} AS token FROM documents),
    freq AS (
        SELECT token, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY token),
    tot AS (SELECT sum(c) AS n FROM freq),
    scored AS (
        SELECT t.doc_id, t.lang, round(avg(-ln(f.c / tot.n)), 6) AS nll
        FROM tok t JOIN freq f ON t.token = f.token, tot
        GROUP BY t.doc_id, t.lang),
    cuts AS (
        SELECT lang, {pdisc33} AS p33, {pdisc67} AS p67
        FROM scored GROUP BY lang)
    SELECT s.lang,
           CASE WHEN s.nll <= c.p33 THEN 'head'
                WHEN s.nll <= c.p67 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(s.nll), 6) AS avg_nll
    FROM scored s JOIN cuts c ON c.lang = s.lang
    GROUP BY s.lang, CASE WHEN s.nll <= c.p33 THEN 'head'
                          WHEN s.nll <= c.p67 THEN 'middle'
                          ELSE 'tail' END
    ORDER BY s.lang, bucket
    """


@register(
    "llm_perplexity_buckets",
    oracle=_ppl_buckets_sql(
        "unnest(string_split(text, ' '))",
        "quantile_disc(nll, 0.33)", "quantile_disc(nll, 0.67)"
    ),
)
def llm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: score every doc with the unigram
    NLL proxy (the llm_perplexity_proxy statistic), then split each
    language into head / middle / tail tertiles at per-language
    percentile_disc cutoffs — the standard quality-stratification that
    decides which third of a crawl gets kept, reweighted, or dropped.
    percentile_disc returns actual data values (no interpolation), so the
    cutoff comparison is exact in both engines; the rounded (6 dp) NLL is
    the bucketing key in BOTH the score and the cutoff, keeping boundary
    docs on the same side. Plan: token explode → broadcast unigram table →
    per-doc agg → per-lang cutoff agg (|langs| rows, broadcast back) →
    bucket counts; no row-grain window anywhere."""
    return sql_q(
        spark,
        sf_dir,
        _ppl_buckets_sql(
            "explode(split(text, ' '))",
            "percentile_disc(0.33) WITHIN GROUP (ORDER BY nll)",
            "percentile_disc(0.67) WITHIN GROUP (ORDER BY nll)",
        ),
    )


def _dsir_sql(tok_expr: str, bucket_expr: str) -> str:
    return f"""
    WITH tok AS (
        SELECT doc_id, lang, {bucket_expr} AS b
        FROM (SELECT doc_id, lang, {tok_expr} AS token
              FROM documents) raw),
    feat AS (
        SELECT b,
               CAST(count(*) FILTER (WHERE lang = 'en') + 1 AS DOUBLE) AS ct,
               CAST(count(*) + 1 AS DOUBLE) AS cr
        FROM tok GROUP BY b),
    tots AS (
        SELECT sum(ct) AS st, sum(cr) AS sr FROM feat),
    lw AS (
        SELECT b, ln((ct / tots.st) / (cr / tots.sr)) AS w
        FROM feat CROSS JOIN tots)
    SELECT t.doc_id, t.lang,
           CAST(count(*) AS BIGINT) AS n_tok,
           round(avg(lw.w), 6) AS dsir_weight
    FROM tok t JOIN lw ON lw.b = t.b
    GROUP BY t.doc_id, t.lang
    ORDER BY dsir_weight DESC, t.doc_id
    LIMIT 20
    """


@register(
    "llm_dsir_importance",
    oracle=_dsir_sql(
        "unnest(string_split(text, ' '))",
        "CAST(('0x' || substr(md5(token), 1, 4)) AS BIGINT) % 64",
    ),
)
def llm_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, public arXiv
    2302.03169): hash every token into 64 feature buckets, estimate the
    bucket distribution of the TARGET domain (lang='en' here, standing in
    for a high-quality reference corpus) and of the RAW corpus with add-1
    smoothing, and score each document by the mean log-ratio
    ln(p_target/p_raw) of its tokens' buckets — documents whose n-gram
    profile looks like the target float up, and importance resampling
    keeps them. Top-20 by weight.

    Plan (round-13 exact-collapse rewrite; the r13 sweep caught the old
    full-corpus token explode at 45 s / 49.6× at the 100× tier, with a
    broadcast OOM under sweep memory pressure): copies collapse to
    distinct (md5(text), lang) groups, ONE representative is exploded to
    (group, bucket) token counts, and both smoothed distributions are
    mult-weighted integer sums over that grain. Every copy of a text has
    the same weight, so the top-20 DOCS live inside the top-20 GROUPS by
    (rounded weight desc, min doc_id): any excluded group's best doc_id
    exceeds 20 better-ranked docs by construction. Those ≤20 groups join
    back to documents to enumerate copy doc_ids (bounded expansion), then
    the exact original ordering applies. Weight per group is Σ k·w / n —
    the same token multiset every copy averages, equal at the 6-dp
    rounding both engines share. Oracle unchanged."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    bucket = "cast(conv(substr(md5(token), 1, 4), 16, 10) AS bigint) % 64"
    grp = spark.sql(
        """
        SELECT md5(text) AS h, lang, min(doc_id) AS min_doc, count(*) AS mult
        FROM documents GROUP BY md5(text), lang
        """
    ).cache()
    grp.createOrReplaceTempView("__dsir_grp")
    k = spark.sql(
        f"""
        SELECT g.h, g.lang, g.mult, {bucket} AS b, count(*) AS k
        FROM __dsir_grp g JOIN documents d ON d.doc_id = g.min_doc
        LATERAL VIEW explode(split(d.text, ' ')) AS token
        GROUP BY g.h, g.lang, g.mult, {bucket}
        """
    ).cache()
    k.createOrReplaceTempView("__dsir_k")
    _materialize_cache(spark, grp, k)
    spark.sql(
        """
        SELECT b,
               CAST(sum(CASE WHEN lang = 'en' THEN mult * k ELSE 0 END) + 1
                    AS DOUBLE) AS ct,
               CAST(sum(mult * k) + 1 AS DOUBLE) AS cr
        FROM __dsir_k GROUP BY b
        """
    ).createOrReplaceTempView("__dsir_feat")
    spark.sql(
        """
        SELECT f.b, ln((f.ct / t.st) / (f.cr / t.sr)) AS w
        FROM __dsir_feat f
        CROSS JOIN (SELECT sum(ct) AS st, sum(cr) AS sr FROM __dsir_feat) t
        """
    ).createOrReplaceTempView("__dsir_lw")
    spark.sql(
        """
        SELECT k.h, k.lang, CAST(sum(k.k) AS BIGINT) AS n_tok,
               round(sum(k.k * lw.w) / sum(k.k), 6) AS dsir_weight,
               max(g.min_doc) AS min_doc
        FROM __dsir_k k
        JOIN __dsir_lw lw ON lw.b = k.b
        JOIN __dsir_grp g ON g.h = k.h AND g.lang = k.lang
        GROUP BY k.h, k.lang
        ORDER BY dsir_weight DESC, min_doc
        LIMIT 20
        """
    ).createOrReplaceTempView("__dsir_topgrp")
    return spark.sql(
        """
        SELECT d.doc_id, tg.lang, tg.n_tok, tg.dsir_weight
        FROM __dsir_topgrp tg
        JOIN documents d ON md5(d.text) = tg.h AND d.lang = tg.lang
        ORDER BY tg.dsir_weight DESC, d.doc_id
        LIMIT 20
        """
    )


_XSNAP_SQL = """
    WITH hist AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
    batch AS (
      SELECT doc_id, source, md5(text) AS h FROM documents WHERE doc_id % 2 = 1)
    SELECT b.source,
           CAST(count(*) AS BIGINT) AS n_batch,
           CAST(count(hist.h) AS BIGINT) AS n_dup_vs_hist,
           CAST(count(*) - count(hist.h) AS BIGINT) AS n_new,
           CAST(count(DISTINCT CASE WHEN hist.h IS NULL THEN b.h END)
                AS BIGINT) AS n_new_unique,
           round(CAST(count(hist.h) AS DOUBLE) / count(*), 6) AS dup_rate
    FROM batch b LEFT JOIN hist ON hist.h = b.h
    GROUP BY b.source ORDER BY b.source
"""


@register("llm_cross_snapshot_dedup", oracle=_XSNAP_SQL)
def llm_cross_snapshot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup audit: dedupe an arriving batch (odd
    doc_ids, standing in for today's crawl) against the historical
    snapshot (even doc_ids) by content digest — per source: batch size,
    docs already in history, genuinely new docs, and new-unique after
    within-batch collapse. This is the snapshot-over-snapshot accounting
    every continuously-ingesting corpus runs before appending (the
    companion of llm_incremental_bloom_dedup, which optimizes the same
    anti-join with a Bloom pre-filter). One digest shuffle per side +
    one left join on the 128-bit hash; history side carries DISTINCT
    hashes only, never documents."""
    return sql_q(spark, sf_dir, _XSNAP_SQL)


def _reploop_sql(from_clause: str) -> str:
    return f"""
    WITH sh AS (
      SELECT doc_id, g
      FROM {from_clause}),
    per_gram AS (
      SELECT doc_id, g, count(*) AS c FROM sh GROUP BY doc_id, g),
    per_doc AS (
      SELECT doc_id, sum(c) AS n_grams, max(c) AS max_rep
      FROM per_gram GROUP BY doc_id)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(max_rep AS BIGINT) AS max_repeat,
           round(CAST(max_rep AS DOUBLE) / n_grams, 6) AS loop_score,
           CASE WHEN CAST(max_rep AS DOUBLE) / n_grams > 0.1
                THEN 1 ELSE 0 END AS is_loopy
    FROM per_doc
    ORDER BY loop_score DESC, doc_id
    LIMIT 20
    """


@register(
    "llm_repetition_loop_detect",
    oracle=_reploop_sql(
        """(SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(tk) - 2),
                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS tk
                  FROM documents)
            WHERE len(tk) >= 3) sh0"""
    ),
)
def llm_repetition_loop_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-repetition detector: a document whose single most
    frequent 3-gram carries more than 10% of all its 3-gram mass is the
    looping-generation / boilerplate signature (the n-gram analogue of
    the Gopher repetition rules, scored continuously instead of
    thresholded per rule). Top-20 by loop score.

    Plan (round-13 exact-collapse: the r13 isolated-cache sweep timed the
    full-corpus 3-gram explode at 69.2 s cold at 100×): the loop score is
    a pure function of text, so ONE representative per distinct text is
    exploded; the doc-level top-20 is recovered from the top-20 content
    groups by (rounded score desc, min doc_id) — the same provably-
    containing expansion llm_dsir_importance uses — then re-sorted under
    the original (loop_score DESC, doc_id) order. Oracle unchanged."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    spark.sql(
        "SELECT md5(text) AS h, min(doc_id) AS min_doc"
        " FROM documents GROUP BY md5(text)"
    ).createOrReplaceTempView("__rld_grp")
    spark.sql(
        """
        SELECT h, g, count(*) AS c FROM (
          SELECT r.h, g
          FROM __rld_grp r JOIN documents d ON d.doc_id = r.min_doc
          LATERAL VIEW explode(transform(
              sequence(0, size(split(d.text, ' ')) - 3),
              i -> concat_ws(' ', split(d.text, ' ')[i],
                             split(d.text, ' ')[i+1],
                             split(d.text, ' ')[i+2]))) AS g
          WHERE size(split(d.text, ' ')) >= 3)
        GROUP BY h, g
        """
    ).createOrReplaceTempView("__rld_pergram")
    spark.sql(
        """
        SELECT r.h, r.n_grams, r.max_rep, g.min_doc
        FROM (SELECT h, sum(c) AS n_grams, max(c) AS max_rep
              FROM __rld_pergram GROUP BY h) r
        JOIN __rld_grp g ON g.h = r.h
        ORDER BY round(CAST(max_rep AS DOUBLE) / n_grams, 6) DESC, min_doc
        LIMIT 20
        """
    ).createOrReplaceTempView("__rld_top")
    return spark.sql(
        """
        SELECT d.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
               CAST(t.max_rep AS BIGINT) AS max_repeat,
               round(CAST(t.max_rep AS DOUBLE) / t.n_grams, 6) AS loop_score,
               CASE WHEN CAST(t.max_rep AS DOUBLE) / t.n_grams > 0.1
                    THEN 1 ELSE 0 END AS is_loopy
        FROM __rld_top t JOIN documents d ON md5(d.text) = t.h
        ORDER BY loop_score DESC, d.doc_id
        LIMIT 20
        """
    )


def _doremi_sql(tok_expr: str) -> str:
    return f"""
    WITH tok AS (
        SELECT doc_id, source, {tok_expr} AS token FROM documents),
    freq AS (
        SELECT token, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY token),
    tot AS (SELECT sum(c) AS n FROM freq),
    dom AS (
        SELECT t.source,
               CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
               sum(-ln(f.c / tot.n)) / count(*) AS avg_nll
        FROM tok t JOIN freq f ON f.token = t.token, tot
        GROUP BY t.source),
    base AS (
        SELECT source, n_docs, avg_nll,
               CAST(n_docs AS DOUBLE)
                 / (SELECT sum(n_docs) FROM dom) AS w_old,
               avg_nll - (SELECT min(avg_nll) FROM dom) AS excess
        FROM dom),
    upd AS (
        SELECT source, n_docs, avg_nll, w_old,
               w_old * exp(0.5 * excess) AS w_unnorm
        FROM base)
    SELECT source, n_docs,
           round(avg_nll, 6) AS avg_nll,
           round(w_old, 6) AS w_old,
           round(w_unnorm / (SELECT sum(w_unnorm) FROM upd), 6) AS w_new
    FROM upd ORDER BY source
    """


@register(
    "llm_doremi_reweight_step",
    oracle=_doremi_sql("unnest(string_split(text, ' '))"),
)
def llm_doremi_reweight_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi-style domain-reweighting step (Xie et al. 2023, public
    arXiv 2305.10429): score each source domain by its excess loss (here
    the unigram-NLL proxy minus the best domain's NLL, standing in for
    proxy-model minus reference-model loss) and multiply its mixture
    weight by exp(η·excess), renormalizing — domains the model finds
    hard gain sampling weight. η = 0.5, initial weights proportional to
    doc counts. Everything is |domains|-grain after one token explode +
    broadcast unigram join; the three scalar subqueries are 1-row
    broadcasts. Output: per-source old/new mixture weights.

    Plan note (r6 verdict task #4): the shared-CTE formulation re-ran the
    token explode for every `tok` reference (21 exchanges). The token
    stage and the |domains|-grain `dom` aggregate are now STAGED ONCE as
    cached temp views (the ml_naive_bayes_langid discipline) and the
    final reweighting reads only the tiny cached `dom`; `_doremi_sql()`
    stays the DuckDB oracle text."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    tok = spark.sql(
        "SELECT doc_id, source, explode(split(text, ' ')) AS token"
        " FROM documents"
    ).cache()
    tok.createOrReplaceTempView("__doremi_tok")
    dom = spark.sql(
        """
        SELECT t.source,
               CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
               sum(-ln(f.c / (SELECT CAST(count(*) AS DOUBLE)
                              FROM __doremi_tok))) / count(*) AS avg_nll
        FROM __doremi_tok t
        JOIN (SELECT token, CAST(count(*) AS DOUBLE) AS c
              FROM __doremi_tok GROUP BY token) f ON f.token = t.token
        GROUP BY t.source
        """
    ).cache()
    dom.createOrReplaceTempView("__doremi_dom")
    return spark.sql(
        """
        SELECT source, n_docs,
               round(avg_nll, 6) AS avg_nll,
               round(w_old, 6) AS w_old,
               round(w_old * exp(0.5 * excess) /
                     (SELECT sum(CAST(n_docs AS DOUBLE)
                                   / (SELECT sum(n_docs) FROM __doremi_dom)
                                 * exp(0.5 * (avg_nll - (SELECT min(avg_nll)
                                                         FROM __doremi_dom))))
                      FROM __doremi_dom), 6) AS w_new
        FROM (SELECT source, n_docs, avg_nll,
                     CAST(n_docs AS DOUBLE)
                       / (SELECT sum(n_docs) FROM __doremi_dom) AS w_old,
                     avg_nll - (SELECT min(avg_nll) FROM __doremi_dom)
                       AS excess
              FROM __doremi_dom)
        ORDER BY source
        """
    )


def _qclf_sql(tok_count: str) -> str:
    return f"""
    WITH feats AS (
      SELECT doc_id, lang,
             CAST(n_chars AS DOUBLE) AS f_len,
             CAST({tok_count} AS DOUBLE) AS f_words,
             CAST(length(text) - length(replace(text, '.', '')) AS DOUBLE)
               AS f_periods,
             CAST(length(text) - length(replace(text, '!', '')) AS DOUBLE)
               AS f_bangs
      FROM documents),
    scored AS (
      SELECT doc_id, lang,
             round(1.0 / (1.0 + exp(-(
               -2.0
               + 0.004 * least(f_len, 1000.0)
               + 0.02  * least(f_words, 200.0)
               + 0.3   * least(f_periods, 10.0)
               - 0.5   * least(f_bangs, 5.0)))), 6) AS quality_p
      FROM feats)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(quality_p), 6) AS avg_quality,
           CAST(count(*) FILTER (WHERE quality_p >= 0.5) AS BIGINT) AS n_keep,
           round(CAST(count(*) FILTER (WHERE quality_p >= 0.5) AS DOUBLE)
                 / count(*), 6) AS keep_rate
    FROM scored GROUP BY lang ORDER BY lang
    """


@register(
    "llm_quality_classifier_linear",
    oracle=_qclf_sql("len(string_split(text, ' '))"),
)
def llm_quality_classifier_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier (fixed-weight logistic over cheap text
    features: clamped length, word count, sentence punctuation, bang
    density) — the deterministic stand-in for the fastText/linear quality
    models used to gate web crawls (the weights here are frozen
    constants, so the op is exactly oracle-checkable; in production the
    same plan serves trained weights via a broadcast). Entirely map-side
    feature extraction + sigmoid, one lang-grain aggregate: the cheapest
    possible quality gate at 100 TB — no explode, no join, no Python."""
    return sql_q(spark, sf_dir, _qclf_sql("size(split(text, ' '))"))


_PREFIX_DUP_SQL = """
    WITH pref AS (
      SELECT doc_id, source, md5(substr(text, 1, 120)) AS ph
      FROM documents WHERE length(text) >= 120),
    clusters AS (
      SELECT ph, count(*) AS sz, count(DISTINCT source) AS n_sources,
             min(doc_id) AS rep_doc
      FROM pref GROUP BY ph)
    SELECT rep_doc, CAST(sz AS BIGINT) AS cluster_size,
           CAST(n_sources AS BIGINT) AS n_sources
    FROM clusters WHERE sz >= 2
    ORDER BY cluster_size DESC, rep_doc
    LIMIT 20
"""


@register("llm_prefix_dup_clusters", oracle=_PREFIX_DUP_SQL)
def llm_prefix_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix duplicate clustering: docs whose first 120 characters
    hash identically form a cluster — the cheap detector for boilerplate
    headers, mirrored pages, and template farms that exact full-text
    dedup misses (bodies differ) and MinHash only catches at higher cost.
    Top-20 clusters with their source spread (a cluster spanning many
    sources = syndicated boilerplate; one source = a template farm). One
    map-side substr+md5, one hash aggregate — the first-pass triage
    before the shingle-level ops run."""
    return sql_q(spark, sf_dir, _PREFIX_DUP_SQL)


_MIX_TEMP_SQL = """
    WITH counts AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents
      GROUP BY source),
    tot AS (SELECT sum(n) AS n_all FROM counts),
    w AS (
      SELECT source, n, n / tot.n_all AS w_raw,
             pow(n / tot.n_all, 1.0 / 1.7) AS w_temp
      FROM counts CROSS JOIN tot)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           round(w_raw, 6) AS w_raw,
           round(w_temp / (SELECT sum(w_temp) FROM w), 6) AS w_temperature,
           round(w_temp / (SELECT sum(w_temp) FROM w) / w_raw, 6) AS upweight
    FROM w ORDER BY source
"""


@register("llm_mixture_temperature", oracle=_MIX_TEMP_SQL)
def llm_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (the multilingual-sampling
    convention, e.g. T=1.7 as in public mC4/XLM-R recipes): raise each
    source's raw share to 1/T and renormalize — big sources flatten,
    small sources upweight, and the `upweight` column shows exactly how
    much each source's sampling rate moves. |sources|-grain throughout
    after one counting aggregate; pairs with llm_source_mixture (raw
    shares) and llm_doremi_reweight_step (loss-driven reweighting) as
    the third mixture-planning tool."""
    return sql_q(spark, sf_dir, _MIX_TEMP_SQL)


# ---------------------------------------------------------------------------
# Round-6 additions: estimator audits, weighted dedup, LSH tuning, packing
# economics, PQ quantization, embedding drift.
# ---------------------------------------------------------------------------

_MHP = 4294967291  # same 32-bit-prime affine family as llm_minhash_banding


def _mh_est_sql(dialect: str) -> str:
    """MinHash estimate-vs-exact SQL in either engine's dialect. The lane
    constants are IDENTICAL to llm_minhash_banding's, so this op audits
    the exact signature family the production near-dedup runs — including
    its round-11 exact-collapse (one representative per distinct text),
    which also keeps the audited candidate-pair population a function of
    DISTINCT content (uncollapsed, the 100x verbatim-duplicate corpus made
    the pair set copies²-large: sweep TIMEOUT)."""
    if dialect == "spark":
        shingle = (
            "SELECT doc_id, sh"
            " FROM (SELECT d.doc_id, split(d.text, ' ') AS tk"
            " FROM documents d"
            " JOIN (SELECT min(doc_id) AS doc_id FROM documents"
            " GROUP BY md5(text)) reps USING (doc_id))"
            " LATERAL VIEW explode(array_distinct(transform("
            "sequence(0, size(tk) - 3),"
            " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS sh"
        )
        base_hash = "cast(conv(substr(md5(sh), 1, 8), 16, 10) AS BIGINT)"
    else:
        shingle = (
            "SELECT DISTINCT d.doc_id,"
            " unnest(list_transform(generate_series(1, len(tk) - 2),"
            " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh"
            " FROM (SELECT dd.doc_id, string_split(dd.text, ' ') AS tk"
            " FROM documents dd"
            " JOIN (SELECT min(doc_id) AS doc_id FROM documents"
            " GROUP BY md5(text)) reps USING (doc_id)) d"
        )
        base_hash = "CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT)"
    lanes = ",\n             ".join(
        f"min(({1000003 * (s + 1)} * h + {7919 * s + 271}) % {_MHP}) AS mh{s}"
        for s in range(20)
    )
    if dialect == "spark":
        band = (
            "SELECT doc_id, bs.band_id, bs.band_sig FROM sig"
            " LATERAL VIEW explode(array("
            + ", ".join(
                "struct({j} AS band_id, md5(concat_ws('|', {cols})) AS band_sig)".format(
                    j=j,
                    cols=", ".join(f"cast(mh{4 * j + i} AS string)" for i in range(4)),
                )
                for j in range(5)
            )
            + ")) AS bs"
        )
    else:
        band = (
            "SELECT doc_id, CAST(seed // 4 AS INT) AS band_id,"
            " md5(string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed)) AS band_sig"
            " FROM (SELECT doc_id, u.seed,"
            " CASE u.seed "
            + " ".join(f"WHEN {s} THEN mh{s}" for s in range(20))
            + " END AS mh FROM sig CROSS JOIN"
            " (SELECT unnest(generate_series(0, 19)) AS seed) u)"
            " GROUP BY doc_id, seed // 4"
        )
    agree = " + ".join(
        f"(CASE WHEN a.mh{s} = b.mh{s} THEN 1 ELSE 0 END)" for s in range(20)
    )
    return f"""
    WITH shingle AS ({shingle}),
    hashed AS (SELECT doc_id, {base_hash} AS h FROM shingle),
    sig AS (
      SELECT doc_id, {lanes}
      FROM hashed GROUP BY doc_id),
    band AS ({band}),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM band x JOIN band y
        ON x.band_id = y.band_id AND x.band_sig = y.band_sig
       AND x.doc_id < y.doc_id),
    est AS (
      SELECT c.doc_a, c.doc_b,
             CAST(({agree}) AS DOUBLE) / 20 AS est_j
      FROM cand c
      JOIN sig a ON a.doc_id = c.doc_a
      JOIN sig b ON b.doc_id = c.doc_b),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingle GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS shared
      FROM cand c
      JOIN shingle sa ON sa.doc_id = c.doc_a
      JOIN shingle sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh
      GROUP BY c.doc_a, c.doc_b)
    SELECT i.doc_a, i.doc_b,
           round(e.est_j, 6) AS est_jaccard,
           round(CAST(i.shared AS DOUBLE) / (za.n + zb.n - i.shared), 6)
             AS exact_jaccard,
           round(abs(e.est_j
                     - CAST(i.shared AS DOUBLE) / (za.n + zb.n - i.shared)), 6)
             AS abs_err
    FROM inter i
    JOIN est e ON e.doc_a = i.doc_a AND e.doc_b = i.doc_b
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE CAST(i.shared AS DOUBLE) / (za.n + zb.n - i.shared) >= 0.2
    ORDER BY exact_jaccard DESC, i.doc_a, i.doc_b
    """


@register("llm_minhash_jaccard_estimate", oracle=_mh_est_sql("duck"))
def llm_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality audit for the production MinHash family: for every
    LSH band candidate pair, the 20-lane signature-agreement Jaccard
    ESTIMATE next to the exact shingle-set Jaccard and the absolute error
    — the measurement that justifies (or indicts) a signature budget
    before a 100 TB dedup run ('is 20 lanes enough at our dup density?').
    Same affine lane constants and banding as llm_minhash_banding, so the
    audited estimator IS the deployed one. The signature self-join carries
    20 small ints per row; exact verify touches shingles only for the
    candidate set (LSH-bounded, linear in true-dup density).

    Plan note (r6 verdict task #4): the corpus-sized shingle explode was
    referenced 4× and the signature aggregate 3× through the shared CTE
    (11 exchanges); shingle, signature and candidate-pair stages are now
    cached temp views (the llm_minhash_banding discipline) —
    `_mh_est_sql('duck')` stays oracle-only."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    sh = spark.sql(
        "SELECT doc_id, sh"
        " FROM (SELECT d.doc_id, split(d.text, ' ') AS tk"
        " FROM documents d"
        " JOIN (SELECT min(doc_id) AS doc_id FROM documents"
        " GROUP BY md5(text)) reps USING (doc_id))"
        " LATERAL VIEW explode(array_distinct(transform("
        "sequence(0, size(tk) - 3),"
        " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS sh"
    ).cache()
    sh.createOrReplaceTempView("__mhe_sh")
    lanes = ", ".join(
        f"min(({1000003 * (s + 1)} * h + {7919 * s + 271}) % {_MHP}) AS mh{s}"
        for s in range(20)
    )
    sig = spark.sql(
        f"SELECT doc_id, {lanes} FROM (SELECT doc_id,"
        " cast(conv(substr(md5(sh), 1, 8), 16, 10) AS BIGINT) AS h"
        " FROM __mhe_sh) GROUP BY doc_id"
    ).cache()
    sig.createOrReplaceTempView("__mhe_sig")
    band = (
        "SELECT doc_id, bs.band_id, bs.band_sig FROM __mhe_sig"
        " LATERAL VIEW explode(array("
        + ", ".join(
            "struct({j} AS band_id, md5(concat_ws('|', {cols})) AS band_sig)".format(
                j=j,
                cols=", ".join(f"cast(mh{4 * j + i} AS string)" for i in range(4)),
            )
            for j in range(5)
        )
        + ")) AS bs"
    )
    cand = spark.sql(
        f"SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b"
        f" FROM ({band}) x JOIN ({band}) y"
        " ON x.band_id = y.band_id AND x.band_sig = y.band_sig"
        " AND x.doc_id < y.doc_id"
    ).cache()
    cand.createOrReplaceTempView("__mhe_cand")
    # Planner-statistics discipline (round 10, llm_minhash_banding note):
    # materialize every corpus-derived cache BEFORE the final query is
    # planned, so the verify/estimate joins see REAL sizes — the
    # unmaterialized estimates broadcast the shingle view and the pair
    # set, a broadcast OOM at the 100x corpus.
    _materialize_cache(spark, sh, sig, cand)
    agree = " + ".join(
        f"(CASE WHEN a.mh{s} = b.mh{s} THEN 1 ELSE 0 END)" for s in range(20)
    )
    return spark.sql(
        f"""
        SELECT i.doc_a, i.doc_b,
               round(e.est_j, 6) AS est_jaccard,
               round(CAST(i.shared AS DOUBLE) / (za.n + zb.n - i.shared), 6)
                 AS exact_jaccard,
               round(abs(e.est_j
                         - CAST(i.shared AS DOUBLE)
                           / (za.n + zb.n - i.shared)), 6) AS abs_err
        FROM (SELECT c.doc_a, c.doc_b, count(*) AS shared
              FROM __mhe_cand c
              JOIN __mhe_sh sa ON sa.doc_id = c.doc_a
              JOIN __mhe_sh sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh
              GROUP BY c.doc_a, c.doc_b) i
        JOIN (SELECT c.doc_a, c.doc_b, CAST(({agree}) AS DOUBLE) / 20 AS est_j
              FROM __mhe_cand c
              JOIN __mhe_sig a ON a.doc_id = c.doc_a
              JOIN __mhe_sig b ON b.doc_id = c.doc_b) e
          ON e.doc_a = i.doc_a AND e.doc_b = i.doc_b
        JOIN (SELECT doc_id, count(*) AS n FROM __mhe_sh GROUP BY doc_id) za
          ON za.doc_id = i.doc_a
        JOIN (SELECT doc_id, count(*) AS n FROM __mhe_sh GROUP BY doc_id) zb
          ON zb.doc_id = i.doc_b
        WHERE CAST(i.shared AS DOUBLE) / (za.n + zb.n - i.shared) >= 0.2
        ORDER BY exact_jaccard DESC, i.doc_a, i.doc_b
        """
    )


def _idf_jaccard_sql(dialect: str) -> str:
    # EXACT-COLLAPSE FIRST (round 11): one representative per distinct
    # text before shingling, both dialects — see llm_minhash_banding.
    if dialect == "spark":
        shingle = (
            "SELECT doc_id, source, sh"
            " FROM (SELECT d.doc_id, d.source, split(d.text, ' ') AS tk"
            " FROM documents d"
            " JOIN (SELECT min(doc_id) AS doc_id FROM documents"
            " GROUP BY md5(text)) reps USING (doc_id))"
            " LATERAL VIEW explode(array_distinct(transform("
            "sequence(0, size(tk) - 3),"
            " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS sh"
        )
    else:
        shingle = (
            "SELECT DISTINCT d.doc_id, d.source,"
            " unnest(list_transform(generate_series(1, len(tk) - 2),"
            " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS sh"
            " FROM (SELECT dd.doc_id, dd.source, string_split(dd.text, ' ') AS tk"
            " FROM documents dd"
            " JOIN (SELECT min(doc_id) AS doc_id FROM documents"
            " GROUP BY md5(text)) reps USING (doc_id)) d"
        )
    return f"""
    WITH shingle AS ({shingle}),
    nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM shingle),
    idf AS (
      SELECT sh, ln(nn.n / count(DISTINCT doc_id)) AS w
      FROM shingle CROSS JOIN nn GROUP BY sh, nn.n),
    wsum AS (
      SELECT s.doc_id, sum(idf.w) AS tw
      FROM shingle s JOIN idf ON idf.sh = s.sh GROUP BY s.doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(idf.w) AS iw
      FROM shingle a
      JOIN shingle b ON b.source = a.source AND b.sh = a.sh
                    AND a.doc_id < b.doc_id
      JOIN idf ON idf.sh = a.sh
      GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b,
           round(i.iw / (wa.tw + wb.tw - i.iw), 6) AS weighted_jaccard
    FROM inter i
    JOIN wsum wa ON wa.doc_id = i.doc_a
    JOIN wsum wb ON wb.doc_id = i.doc_b
    WHERE i.iw / (wa.tw + wb.tw - i.iw) >= 0.2
    ORDER BY weighted_jaccard DESC, i.doc_a, i.doc_b
    LIMIT 20
    """


@register("llm_idf_weighted_jaccard", oracle=_idf_jaccard_sql("duck"))
def llm_idf_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted shingle Jaccard for same-source doc pairs: rare
    shingles dominate the similarity, so boilerplate shared by everything
    (navigation chrome, legal footers) stops producing false near-dups —
    the standard upgrade over unweighted Jaccard when a corpus has heavy
    template reuse. weighted_J = Σ_{{A∩B}} idf / Σ_{{A∪B}} idf with
    idf = ln(N/df). Source-blocked self-join (the llm_ngram_jaccard
    blocking) bounds the pair space; the idf join is |vocab|-grain.
    EXACT-COLLAPSE FIRST (round 11): shingles (and hence idf and the pair
    space) come from one representative per distinct text — verbatim
    duplicates otherwise blow the within-block pair output ~copies² (the
    round-10 100x sweep TIMEOUT) AND corrupt idf itself (copies deflate
    every contained shingle's weight); oracle applies the same reps CTE.
    Top-20 pairs at ≥ 0.2.

    Plan note (r6 verdict task #4): the shingle explode is corpus-sized
    and was referenced 5× through the shared CTE (14 exchanges, each
    reference re-running the explode); the shingle, |vocab|-grain idf
    and doc-grain weight-sum stages are now cached temp views read via
    InMemoryTableScan — `_idf_jaccard_sql('duck')` stays oracle-only."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    sh = spark.sql(
        "SELECT doc_id, source, sh"
        " FROM (SELECT d.doc_id, d.source, split(d.text, ' ') AS tk"
        " FROM documents d"
        " JOIN (SELECT min(doc_id) AS doc_id FROM documents"
        " GROUP BY md5(text)) reps USING (doc_id))"
        " LATERAL VIEW explode(array_distinct(transform("
        "sequence(0, size(tk) - 3),"
        " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS sh"
    ).cache()
    sh.createOrReplaceTempView("__idfj_sh")
    _materialize_cache(spark, sh)
    idf = spark.sql(
        """
        SELECT sh, ln((SELECT CAST(count(DISTINCT doc_id) AS DOUBLE)
                       FROM __idfj_sh) / count(DISTINCT doc_id)) AS w
        FROM __idfj_sh GROUP BY sh
        """
    ).cache()
    idf.createOrReplaceTempView("__idfj_idf")
    wsum = spark.sql(
        "SELECT s.doc_id, sum(i.w) AS tw FROM __idfj_sh s"
        " JOIN __idfj_idf i ON i.sh = s.sh GROUP BY s.doc_id"
    ).cache()
    wsum.createOrReplaceTempView("__idfj_wsum")
    _materialize_cache(spark, idf, wsum)
    return spark.sql(
        """
        SELECT i.doc_a, i.doc_b,
               round(i.iw / (wa.tw + wb.tw - i.iw), 6) AS weighted_jaccard
        FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(idf.w) AS iw
              FROM __idfj_sh a
              JOIN __idfj_sh b ON b.source = a.source AND b.sh = a.sh
                              AND a.doc_id < b.doc_id
              JOIN __idfj_idf idf ON idf.sh = a.sh
              GROUP BY a.doc_id, b.doc_id) i
        JOIN __idfj_wsum wa ON wa.doc_id = i.doc_a
        JOIN __idfj_wsum wb ON wb.doc_id = i.doc_b
        WHERE i.iw / (wa.tw + wb.tw - i.iw) >= 0.2
        ORDER BY weighted_jaccard DESC, i.doc_a, i.doc_b
        LIMIT 20
        """
    )


def _lsh_tuning_sql(pairs_sql: str) -> str:
    """Config-grid s-curve analysis over an observed near-dup pair set."""
    return f"""
    WITH pairs AS ({pairs_sql}),
    grid AS (
      SELECT * FROM (VALUES (20, 1), (10, 2), (5, 4), (4, 5), (2, 10),
                            (1, 20)) AS g(b, r))
    SELECT g.b AS n_bands, g.r AS rows_per_band,
           round(pow(CAST(1 AS DOUBLE) / g.b,
                     CAST(1 AS DOUBLE) / g.r), 6) AS s_star,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(1 - pow(1 - pow(p.jaccard, g.r), g.b)), 6)
             AS expected_recall,
           round(min(1 - pow(1 - pow(p.jaccard, g.r), g.b)), 6)
             AS worst_pair_recall
    FROM grid g CROSS JOIN pairs p
    GROUP BY g.b, g.r
    ORDER BY g.b DESC
    """


def _register_lsh_tuning() -> None:
    from ..registry import all_oracles

    banding_oracle = all_oracles()["llm_minhash_banding"]

    @register("llm_lsh_tuning_curve", oracle=_lsh_tuning_sql(banding_oracle))
    def llm_lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
        """LSH parameter-sweep planner: for every (bands × rows-per-band)
        split of the 20-lane signature budget, the s-curve threshold
        s* = (1/b)^(1/r) and the expected/worst-case detection recall
        1−(1−J^r)^b over the OBSERVED near-dup pair population (the exact
        Jaccards llm_minhash_banding verified) — the table an engineer
        reads before re-banding a 100 TB dedup ('(5,4) catches 99% of our
        actual dups; (2,10) would miss a third'). The pair set is LSH-
        bounded and the grid is 6 literal rows, so everything after the
        banding pipeline is broadcast arithmetic. Oracle composes the
        banding oracle verbatim as a CTE — lockstep by construction."""
        pairs = llm_minhash_banding(spark, sf_dir)
        pairs.createOrReplaceTempView("__lsh_pairs")
        return spark.sql(_lsh_tuning_sql("SELECT * FROM __lsh_pairs"))


_register_lsh_tuning()


_PACKING_CURVE_TEMPLATE = """
    WITH toks AS (
      SELECT doc_id, CAST({ntok} AS BIGINT) AS n FROM documents),
    grid AS (SELECT * FROM (VALUES (64), (128), (256), (512)) AS g(c)),
    percfg AS (
      SELECT g.c,
             count(*) AS n_docs,
             sum(t.n) AS total_tok,
             sum(CAST(ceil(CAST(t.n AS DOUBLE) / g.c) AS BIGINT))
               AS seqs_padded
      FROM grid g CROSS JOIN toks t
      GROUP BY g.c)
    SELECT c AS context_len,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_tok AS BIGINT) AS total_tokens,
           CAST(seqs_padded AS BIGINT) AS seqs_padded,
           round(CAST(total_tok AS DOUBLE) / (seqs_padded * c), 6)
             AS fill_rate_padded,
           CAST(ceil(CAST(total_tok AS DOUBLE) / c) AS BIGINT)
             AS seqs_packed,
           round(CAST(total_tok AS DOUBLE)
                 / (CAST(ceil(CAST(total_tok AS DOUBLE) / c) AS BIGINT) * c),
                 6) AS fill_rate_packed,
           round(CAST(seqs_padded AS DOUBLE)
                 / CAST(ceil(CAST(total_tok AS DOUBLE) / c) AS BIGINT), 6)
             AS packing_gain
    FROM percfg
    ORDER BY c
"""


@register(
    "llm_packing_efficiency_curve",
    oracle=_PACKING_CURVE_TEMPLATE.format(ntok="len(string_split(text, ' '))"),
)
def llm_packing_efficiency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing economics across context lengths (64/128/256/512): per
    config, the sequence count and fill rate under pad-to-context (each
    doc ceil(n/C) sequences, rest padding) vs concat-and-pack (the
    GPT-style streaming bin: ceil(Σn/C) sequences, zero padding except
    the tail), and the packing_gain ratio between them — the 'how much
    compute does packing buy us at 8k context' table that sizes a
    pretraining run. One token-count scan, a 4-row literal grid, and
    1-row-per-config arithmetic; pairs with llm_seq_packing (which emits
    the actual bin assignment this table prices)."""
    return sql_q(
        spark,
        sf_dir,
        _PACKING_CURVE_TEMPLATE.format(ntok="size(split(text, ' '))"),
    )


def _pq_sql(dialect: str) -> str:
    if dialect == "spark":
        sub = "slice(embedding, s * 16 + 1, 16)"
        grid = "LATERAL VIEW explode(array(0, 1, 2, 3)) AS s"
        d2 = (
            "aggregate(zip_with(v.sub, c.sub,"
            " (x, y) -> (cast(x AS double) - cast(y AS double))"
            " * (cast(x AS double) - cast(y AS double))),"
            " cast(0.0 AS double), (acc, e) -> acc + e)"
        )
        # NULL embeddings are excluded from vectors AND centroids (r15
        # null sweep: a NULL-d2 centroid won every Spark argmin via ASC
        # NULLS FIRST while DuckDB's NULLS LAST ignored it — the classic
        # cross-engine null-ordering split).
        vecs = (
            "SELECT vec_id, s, {sub} AS sub FROM embeddings {grid}"
            " WHERE embedding IS NOT NULL"
        ).format(sub=sub, grid=grid)
        cents = (
            "SELECT vec_id AS code, s, {sub} AS sub"
            " FROM embeddings {grid}"
            " WHERE vec_id < 16 AND embedding IS NOT NULL"
        ).format(sub=sub, grid=grid)
    else:
        sub = "embedding[s * 16 + 1 : s * 16 + 16]"
        grid = "CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS s) g"
        d2 = (
            "list_aggregate(list_transform(list_zip(v.sub, c.sub),"
            " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
            " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum')"
        )
        vecs = (
            f"SELECT vec_id, s, {sub} AS sub FROM embeddings {grid}"
            f" WHERE embedding IS NOT NULL"
        )
        cents = (
            f"SELECT vec_id AS code, s, {sub} AS sub"
            f" FROM embeddings {grid}"
            f" WHERE vec_id < 16 AND embedding IS NOT NULL"
        )
    return f"""
    WITH vecs AS ({vecs}),
    cents AS ({cents}),
    assigned AS (
      SELECT vec_id, s, code, d2 FROM (
        SELECT v.vec_id, v.s, c.code, round({d2}, 6) AS d2,
               row_number() OVER (
                 PARTITION BY v.vec_id, v.s
                 ORDER BY round({d2}, 6), c.code) AS rn
        FROM vecs v JOIN cents c ON c.s = v.s) z
      WHERE rn = 1)
    SELECT s AS subspace, CAST(code AS INT) AS code,
           CAST(count(*) AS BIGINT) AS n_assigned,
           -- d2 is on the 1e-6 grid already; summing exact integer
           -- micro-units makes the mean order-independent (a double
           -- avg() split the 6th decimal on the null-injection corpus)
           round(sum(CAST(round(d2 * 1e6, 0) AS BIGINT)) / count(*) / 1e6, 6)
             AS avg_sq_err,
           round(max(d2), 6) AS max_sq_err
    FROM assigned
    GROUP BY s, code
    ORDER BY s, code
    """


@register("llm_embedding_pq_codebook", oracle=_pq_sql("duck"))
def llm_embedding_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization audit: the 64-dim embedding splits into 4×16-dim
    subspaces, each sub-vector snaps to the nearest of 16 convention
    centroids (the vec_id<16 quantizer every IVF op here shares), and the
    output is the per-(subspace, code) assignment histogram with mean/max
    squared reconstruction error — the table that says whether a 4×4-bit
    PQ code (32× compression) preserves enough geometry for ANN recall.
    Plan: 16×4 centroid sub-vectors broadcast against the corpus ×4
    subspace explode, argmin via ties-broken row_number — the IVF
    assignment pattern at 4× the row grain, still one shuffle on
    (vec_id, s). Distances round to 1e-6 before the argmin so both
    engines pick identical codes."""
    return sql_q(spark, sf_dir, _pq_sql("spark"))


def _centroid_drift_sql(dialect: str) -> str:
    if dialect == "spark":
        rows = (
            "SELECT vec_id, label, pos, CAST(v AS DOUBLE) AS v"
            " FROM embeddings LATERAL VIEW posexplode(embedding) AS pos, v"
        )
    else:
        rows = (
            "SELECT vec_id, label,"
            " CAST(generate_subscripts(embedding, 1) AS INT) - 1 AS pos,"
            " CAST(unnest(embedding) AS DOUBLE) AS v"
            " FROM embeddings"
        )
    return f"""
    WITH rows_ AS ({rows}),
    means AS (
      SELECT label, pos,
             round(avg(v) FILTER (WHERE vec_id % 2 = 0), 6) AS ma,
             round(avg(v) FILTER (WHERE vec_id % 2 = 1), 6) AS mb,
             max(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS has_a,
             max(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS has_b
      FROM rows_ GROUP BY label, pos),
    counts AS (
      SELECT label,
             count(DISTINCT CASE WHEN vec_id % 2 = 0 THEN vec_id END) AS na,
             count(DISTINCT CASE WHEN vec_id % 2 = 1 THEN vec_id END) AS nb
      FROM rows_ GROUP BY label)
    SELECT m.label,
           CAST(c.na AS BIGINT) AS n_even, CAST(c.nb AS BIGINT) AS n_odd,
           round(sqrt(sum((m.ma - m.mb) * (m.ma - m.mb))), 6) AS l2_drift,
           round(sum(m.ma * m.mb)
                 / (sqrt(sum(m.ma * m.ma)) * sqrt(sum(m.mb * m.mb))), 6)
             AS cos_sim
    FROM means m JOIN counts c ON c.label = m.label
    WHERE m.has_a = 1 AND m.has_b = 1
    GROUP BY m.label, c.na, c.nb
    ORDER BY m.label
    """


@register("llm_embedding_centroid_drift", oracle=_centroid_drift_sql("duck"))
def llm_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between two corpus snapshots (even vs odd
    vec_ids standing in for last month's vs this month's index): per
    label, the L2 distance and cosine similarity between the two
    snapshots' mean vectors — the 'did the embedding distribution move
    enough to re-train the ANN index / recalibrate thresholds' monitor.
    The corpus collapses to (label × 64 dims) mean-grain in one
    conditional aggregate (both snapshots in a single pass, no join at
    row grain); drift arithmetic runs on ≤640 tiny rows. Dimension means
    round to 1e-6 BEFORE the distance fold so both engines accumulate
    identical summands."""
    return sql_q(spark, sf_dir, _centroid_drift_sql("spark"))


@register(
    "mm_video_scene_cut_stub",
    oracle="""
    WITH frames AS (
      SELECT doc_id, CAST(s AS INT) AS fidx,
             list_aggregate(list_transform(
               range(1, len(substr(text, CAST(s * 16 + 1 AS INT), 16)) + 1),
               i -> ord(substr(substr(text, CAST(s * 16 + 1 AS INT), 16),
                               CAST(i AS INT), 1))), 'sum') % 997 AS feat
      FROM documents
      CROSS JOIN LATERAL unnest(generate_series(
        0, CAST(ceil(CAST(length(text) AS DOUBLE) / 16) AS BIGINT) - 1))
        AS g(s)
      WHERE length(text) > 0),
    deltas AS (
      SELECT doc_id, fidx, feat,
             abs(feat - lag(feat) OVER (PARTITION BY doc_id ORDER BY fidx))
               AS delta
      FROM frames)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(count(*) FILTER (WHERE delta > 200) AS BIGINT) AS n_cuts,
           round(CAST(count(*) AS DOUBLE)
                 / (count(*) FILTER (WHERE delta > 200) + 1), 6)
             AS mean_scene_len
    FROM deltas GROUP BY doc_id ORDER BY doc_id
    """,
)
def mm_video_scene_cut_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal scene-cut detection plumbing (video stand-in): the
    binary payload chunks into 16-byte 'frames', each frame reduces to a
    deterministic feature (byte-sum mod 997 — a real impl swaps in a
    decoded-frame histogram or embedding), and a cut fires where the
    inter-frame feature delta exceeds the threshold — per doc: frame
    count, cut count, mean scene length. The Spark-side shape is the real
    pipeline: binary column → Arrow batches through mapInPandas → typed
    per-doc stats out; only the feature function is fake. Pure map-side,
    no shuffle, linear in corpus bytes. Oracle recomputes the byte math
    via per-char codepoints (exact: the corpus is ASCII, one byte per
    char)."""

    def cuts(batches):
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "n_cuts": [], "mean_scene_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = b"" if payload is None else bytes(payload)
                if not buf:
                    # zero-length/NULL payload has no frames: drop the doc,
                    # matching the oracle's explicit WHERE length(text) > 0
                    # guard (and its empty generate_series) — r7/r8 verdict
                    # latent-divergence item, closed both sides in r9
                    continue
                feats = [
                    sum(buf[o : o + 16]) % 997 for o in range(0, len(buf), 16)
                ]
                n_cuts = sum(
                    1 for a, b in zip(feats, feats[1:]) if abs(b - a) > 200
                )
                out["doc_id"].append(doc_id)
                out["n_frames"].append(len(feats))
                out["n_cuts"].append(n_cuts)
                out["mean_scene_len"].append(
                    round(len(feats) / (n_cuts + 1), 6)
                )
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "n_frames": "int64", "n_cuts": "int64",
                 "mean_scene_len": "float64"}
            )

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        cuts,
        "doc_id long, n_frames long, n_cuts long, mean_scene_len double",
    ).orderBy("doc_id")


_CDC_DIVISOR = 16  # expected chunk length ≈ divisor tokens

_CDC_SPARK = f"""
    WITH g AS (
      -- exact-collapse-first (round 13): chunk boundaries depend only on
      -- text, so chunk ONE representative per distinct (text, source)
      -- group and weight instance stats by copy multiplicity — exact
      -- integer products; chunked volume tracks DISTINCT content
      SELECT md5(text) AS ht, source, min(doc_id) AS rep_doc,
             count(*) AS mult
      FROM documents WHERE text IS NOT NULL
      GROUP BY md5(text), source),
    d AS (
      SELECT g.ht, g.source, g.mult, split(dd.text, ' ') AS tk,
             size(split(dd.text, ' ')) AS n
      FROM g JOIN documents dd ON dd.doc_id = g.rep_doc),
    b AS (
      SELECT ht, source, mult, tk, n,
             concat(
               array(0),
               CASE WHEN n >= 4 THEN
                 filter(sequence(3, n - 1), i ->
                   pmod(cast(conv(substr(md5(concat_ws(' ',
                          tk[i - 3], tk[i - 2], tk[i - 1])), 1, 4), 16, 10)
                        AS BIGINT), {_CDC_DIVISOR}) = 0)
               ELSE array() END,
               array(n)) AS bs
      FROM d),
    ch AS (
      SELECT ht, source, mult, c.h AS h, c.len AS len
      FROM b
      LATERAL VIEW explode(
        transform(sequence(1, size(bs) - 1), j -> struct(
          md5(concat_ws(' ',
            slice(tk, element_at(bs, j) + 1,
                  element_at(bs, j + 1) - element_at(bs, j)))) AS h,
          element_at(bs, j + 1) - element_at(bs, j) AS len))) t AS c),
    pergroup AS (
      SELECT ht, source, mult, count(*) AS n_chunks,
             sum(CAST(len AS BIGINT)) AS sum_len
      FROM ch GROUP BY ht, source, mult),
    srcstats AS (
      SELECT source, sum(mult) AS n_docs,
             sum(mult * n_chunks) AS total_chunks,
             sum(mult * sum_len) AS total_len
      FROM pergroup GROUP BY source),
    dch AS (
      SELECT source, count(DISTINCT h) AS distinct_chunks
      FROM ch GROUP BY source)
    SELECT s.source,
           CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(s.total_chunks AS BIGINT) AS total_chunks,
           CAST(d.distinct_chunks AS BIGINT) AS distinct_chunks,
           round(1e0 - CAST(d.distinct_chunks AS DOUBLE) / s.total_chunks, 6)
             AS dup_chunk_rate,
           -- identical to avg over chunk instances: integer-valued double
           -- sums are exact, copies contribute identical chunk sets
           round(CAST(s.total_len AS DOUBLE) / s.total_chunks, 2)
             AS avg_chunk_tokens
    FROM srcstats s JOIN dch d ON d.source = s.source
    ORDER BY s.source
"""

_CDC_DUCK = f"""
    WITH d AS (
      SELECT doc_id, source, string_split(text, ' ') AS tk,
             len(string_split(text, ' ')) AS n
      FROM documents WHERE text IS NOT NULL),
    b AS (
      SELECT doc_id, source, tk, n,
             list_concat(list_concat([0],
               list_filter(range(3, n), i ->
                 CAST(('0x' || substr(md5(array_to_string(
                        tk[(i - 2):(i)], ' ')), 1, 4)) AS BIGINT)
                   % {_CDC_DIVISOR} = 0)),
               [n]) AS bs
      FROM d),
    ch AS (
      SELECT doc_id, source,
             unnest(list_transform(range(2, len(bs) + 1), j -> struct_pack(
               h := md5(array_to_string(tk[(bs[j - 1] + 1):(bs[j])], ' ')),
               len := bs[j] - bs[j - 1]))) AS c
      FROM b)
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS total_chunks,
           CAST(count(DISTINCT c.h) AS BIGINT) AS distinct_chunks,
           round(1e0 - CAST(count(DISTINCT c.h) AS DOUBLE) / count(*), 6)
             AS dup_chunk_rate,
           round(avg(CAST(c.len AS DOUBLE)), 2) AS avg_chunk_tokens
    FROM ch
    GROUP BY source
    ORDER BY source
"""


@register("llm_cdc_chunking", oracle=_CDC_DUCK)
def llm_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (FastCDC/rsync family): chunk boundaries
    fall AFTER any token whose trailing 3-token rolling window hashes to
    0 mod 16 — so boundaries are decided by CONTENT, not position, and
    an insertion near a document's head re-chunks only its local
    neighborhood instead of shifting every downstream window (the
    failure mode of llm_window_chunking's fixed stride that makes
    chunk-level dedup miss shifted duplicates). Per source: chunk count,
    distinct-chunk count (md5 identity), the chunk-level dup rate the
    dedup pipeline would harvest, and mean chunk length (≈ the 16-token
    divisor). Pure map-side higher-order functions (split → boundary
    filter → slice+md5 per chunk) then one source-grain aggregate with
    two count-distincts — no shuffle before the final 5-row grain.
    Boundary hash is the portable md5-prefix integer (ml_kfold
    convention) so Spark and DuckDB agree bit-for-bit."""
    return sql_q(spark, sf_dir, _CDC_SPARK)


_DECON_SPARK = """
    WITH toks AS (
      SELECT doc_id, source, split(text, ' ') AS tk,
             CASE WHEN doc_id % 17 = 0 THEN 'eval' ELSE 'train' END AS split
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source, split,
             md5(array_join(slice(tk, i, 13), ' ')) AS g
      FROM toks
      LATERAL VIEW explode(sequence(1, size(tk) - 12)) s AS i
      WHERE size(tk) >= 13),
    eg AS (SELECT DISTINCT g FROM grams WHERE split = 'eval'),
    hits AS (
      SELECT tg.doc_id, count(*) AS n_hit
      FROM (SELECT doc_id, g FROM grams WHERE split = 'train') tg
      JOIN eg ON tg.g = eg.g
      GROUP BY tg.doc_id),
    tr AS (
      SELECT doc_id, source, count(*) AS n_grams
      FROM grams WHERE split = 'train' GROUP BY doc_id, source)
    SELECT tr.source,
           CAST(count(*) AS BIGINT) AS n_train_docs,
           CAST(count(h.doc_id) AS BIGINT) AS n_contaminated_docs,
           round(CAST(count(h.doc_id) AS DOUBLE) / count(*), 6)
             AS contamination_rate,
           CAST(sum(coalesce(h.n_hit, 0)) AS BIGINT) AS n_gram_hits
    FROM tr LEFT JOIN hits h ON tr.doc_id = h.doc_id
    GROUP BY tr.source
    ORDER BY tr.source
"""

_DECON_DUCK = """
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS tk,
             CASE WHEN doc_id % 17 = 0 THEN 'eval' ELSE 'train' END AS split
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source, split,
             md5(array_to_string(tk[i:i + 12], ' ')) AS g
      FROM toks, UNNEST(generate_series(1, len(tk) - 12)) AS s(i)
      WHERE len(tk) >= 13),
    eg AS (SELECT DISTINCT g FROM grams WHERE split = 'eval'),
    hits AS (
      SELECT tg.doc_id, count(*) AS n_hit
      FROM (SELECT doc_id, g FROM grams WHERE split = 'train') tg
      JOIN eg ON tg.g = eg.g
      GROUP BY tg.doc_id),
    tr AS (
      SELECT doc_id, source, count(*) AS n_grams
      FROM grams WHERE split = 'train' GROUP BY doc_id, source)
    SELECT tr.source,
           CAST(count(*) AS BIGINT) AS n_train_docs,
           CAST(count(h.doc_id) AS BIGINT) AS n_contaminated_docs,
           round(CAST(count(h.doc_id) AS DOUBLE) / count(*), 6)
             AS contamination_rate,
           CAST(sum(coalesce(h.n_hit, 0)) AS BIGINT) AS n_gram_hits
    FROM tr LEFT JOIN hits h ON tr.doc_id = h.doc_id
    GROUP BY tr.source
    ORDER BY tr.source
"""


@register("llm_decontamination", oracle=_DECON_DUCK)
def llm_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark/eval-set decontamination audit (the GPT-3 / The-Pile
    13-gram protocol): docs with doc_id % 17 = 0 stand in for a held-out
    eval split; a TRAIN doc is contaminated when it shares at least one
    verbatim 13-token n-gram (stride 1) with any eval doc. Per source:
    train-doc count, contaminated-doc count and rate, and the total
    train-doc×gram hit count ``n_gram_hits`` (grams are DISTINCT'd per
    train doc, so a gram shared by k train docs contributes k — the
    per-doc-evidence tally, not a corpus-global distinct-gram count; the
    column was renamed from the misleading ``n_contaminated_grams`` per
    the r8 verdict, hash re-baselined at the r9 gate) — the report a
    curation pipeline signs off before training. Scale shape: n-grams are md5'd map-side so the
    join carries 32-byte keys, the eval-side gram set is DISTINCT'd
    first (eval splits are tiny by construction → broadcast), and the
    train side never self-joins — linear in corpus tokens, one shuffle
    on the gram hash. The stop-gram caveat from llm_chunk_overlap_dedup
    applies at 100 TB: ultra-common grams (boilerplate) would inflate
    hit counts and get a doc-frequency cap in production."""
    return sql_q(spark, sf_dir, _DECON_SPARK)


_PPL_DUCK = """
    WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
    big AS (
      SELECT doc_id, source, tk[i] AS u, tk[i + 1] AS v
      FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS s(i)
      WHERE len(tk) >= 2),
    vocab AS (
      SELECT CAST(count(DISTINCT w) AS DOUBLE) AS vs
      FROM (SELECT unnest(tk) AS w FROM toks)),
    bc AS (SELECT u, v, count(*) AS cuv FROM big GROUP BY u, v),
    uc AS (SELECT u, count(*) AS cu FROM big GROUP BY u),
    doch AS (
      SELECT b.doc_id, b.source,
             -avg(log2((bc.cuv + 1e0) / (uc.cu + vocab.vs))) AS h
      FROM big b
      JOIN bc ON b.u = bc.u AND b.v = bc.v
      JOIN uc ON b.u = uc.u
      CROSS JOIN vocab
      GROUP BY b.doc_id, b.source),
    cm AS (SELECT avg(h) AS m FROM doch)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(h), 6) AS mean_xent,
           round(max(h), 6) AS max_xent,
           round(avg(pow(2e0, h)), 2) AS mean_ppl,
           CAST(sum(CASE WHEN h > cm.m THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above_corpus_mean
    FROM doch CROSS JOIN cm
    GROUP BY source
    ORDER BY source
"""


@register("llm_perplexity_filter", oracle=_PPL_DUCK)
def llm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based quality scoring (the CCNet/Gopher filter shape,
    with the corpus's own add-1-smoothed bigram LM standing in for the
    external KenLM): per-doc cross-entropy H = -mean log2 P(v|u) with
    P(v|u) = (c(uv)+1)/(c(u)+|V|), then per source the mean/max H, mean
    perplexity 2^H, and how many docs score above the corpus-mean H —
    the high-perplexity tail a curation pipeline routes to quarantine.
    Shares the count-table shape with llm_bigram_lm: two linear
    explode→groupBy passes build c(uv)/c(u), then each doc's bigrams
    join those tables on the token keys (at 100 TB the unigram table
    broadcasts; the bigram table is the one real shuffle join). 1e0/2e0
    literals keep both engines in DOUBLE division (decimal-literal
    trap, see memory).

    Plan note (r6 verdict task #4): the corpus-sized bigram explode was
    referenced 3× and the doc-grain cross-entropy stage 2× through the
    shared CTE; both became cached temp views.

    Round-13 exact-collapse (isolated-cache sweep: 69.9 s cold at 100×):
    H is a pure function of text + the corpus LM tables, so bigrams are
    exploded for ONE representative per distinct text; the LM tables are
    multiplicity-weighted integer sums (cuv = Σ m·k — identical copies
    contribute identical bigram counts), per-group H is the same
    Σ k·log2(p) / Σ k the instance average computes, and the per-source
    doc statistics weight each group by its copy count. `_PPL_DUCK`
    remains the unchanged oracle."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    grp = spark.sql(
        """
        SELECT md5(text) AS h, source, min(doc_id) AS rep_doc,
               count(*) AS mult
        FROM documents GROUP BY md5(text), source
        """
    ).cache()
    grp.createOrReplaceTempView("__pplf_grp")
    spark.sql(
        "SELECT h, min(rep_doc) AS rep_doc, sum(mult) AS m"
        " FROM __pplf_grp GROUP BY h"
    ).createOrReplaceTempView("__pplf_rep")
    kb = spark.sql(
        """
        SELECT r.h, r.m, element_at(tk, i) AS u, element_at(tk, i + 1) AS v,
               count(*) AS k
        FROM (SELECT r0.h, r0.m, split(d.text, ' ') AS tk
              FROM __pplf_rep r0 JOIN documents d ON d.doc_id = r0.rep_doc) r
        LATERAL VIEW explode(sequence(1, size(tk) - 1)) s AS i
        WHERE size(tk) >= 2
        GROUP BY r.h, r.m, element_at(tk, i), element_at(tk, i + 1)
        """
    ).cache()
    kb.createOrReplaceTempView("__pplf_kb")
    _materialize_cache(spark, grp, kb)
    gh = spark.sql(
        """
        SELECT b.h,
               -sum(b.k * log2((bc.cuv + 1e0)
                         / (uc.cu + (SELECT CAST(count(DISTINCT w) AS DOUBLE)
                                     FROM (SELECT explode(split(d2.text, ' ')) AS w
                                           FROM __pplf_rep r2
                                           JOIN documents d2
                                             ON d2.doc_id = r2.rep_doc)))))
                 / sum(b.k) AS h_val
        FROM __pplf_kb b
        JOIN (SELECT u, v, sum(k * m) AS cuv FROM __pplf_kb GROUP BY u, v) bc
          ON b.u = bc.u AND b.v = bc.v
        JOIN (SELECT u, sum(k * m) AS cu FROM __pplf_kb GROUP BY u) uc
          ON b.u = uc.u
        GROUP BY b.h
        """
    ).cache()
    gh.createOrReplaceTempView("__pplf_gh")
    _materialize_cache(spark, gh)
    return spark.sql(
        """
        SELECT g.source,
               CAST(sum(g.mult) AS BIGINT) AS n_docs,
               round(sum(g.mult * gh.h_val) / sum(g.mult), 6) AS mean_xent,
               round(max(gh.h_val), 6) AS max_xent,
               round(sum(g.mult * power(2e0, gh.h_val)) / sum(g.mult), 2)
                 AS mean_ppl,
               CAST(sum(CASE WHEN gh.h_val >
                          (SELECT sum(g2.mult * gh2.h_val) / sum(g2.mult)
                           FROM __pplf_grp g2
                           JOIN __pplf_gh gh2 ON gh2.h = g2.h)
                             THEN g.mult ELSE 0 END) AS BIGINT)
                 AS n_above_corpus_mean
        FROM __pplf_grp g JOIN __pplf_gh gh ON gh.h = g.h
        GROUP BY g.source
        ORDER BY g.source
        """
    )


# --------------------------------------------------------------------------
# Round 7 — curation additions (SURVEY.md §2.16)
# --------------------------------------------------------------------------

_FERTILITY_SQL = """
    WITH d AS (
      SELECT lang,
             n_chars,
             CAST({ws_tokens} AS BIGINT) AS ws_tok,
             CAST({bpe_tokens} AS BIGINT) AS bpe_tok
      FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws_tok) AS BIGINT) AS ws_tokens,
           CAST(sum(bpe_tok) AS BIGINT) AS bpe_tokens,
           round(sum(bpe_tok) * 1e0 / sum(ws_tok), 6) AS fertility,
           round(sum(n_chars) * 1e0 / sum(bpe_tok), 6) AS chars_per_token
    FROM d GROUP BY lang ORDER BY lang
"""


@register(
    "llm_tokenizer_fertility",
    oracle=_FERTILITY_SQL.format(
        ws_tokens="len(string_split(text, ' '))",
        bpe_tokens="len(regexp_extract_all(text,"
        " '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))",
    ),
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility audit per language: BPE-ish tokens (word
    runs + isolated non-alphanumerics, the llm_token_bpe regex family)
    per whitespace token, and characters per token — the
    cross-language cost metric every multilingual tokenizer evaluation
    reports (a language whose fertility is 2x pays 2x context budget
    for the same text). Token counts are exact integers from
    regexp_extract_all lengths; the two ratios are the only floats.
    Scale shape: one linear map-side scan (counts only — the token
    strings are never materialized corpus-wide), then a |langs|-grain
    aggregate."""
    return sql_q(
        spark,
        sf_dir,
        _FERTILITY_SQL.format(
            ws_tokens="size(split(text, ' '))",
            bpe_tokens="size(regexp_extract_all(text,"
            " '[A-Za-z0-9]+|[^A-Za-z0-9 ]', 0))",
        ),
    )


_BOILER_DUCK = """
    WITH sh AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(generate_series(1, len(tk) - 2),
               i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS g
      FROM (SELECT doc_id, source, string_split(text, ' ') AS tk
            FROM documents) t
      WHERE len(tk) >= 3),
    nd AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS docs
           FROM sh GROUP BY source),
    df AS (
      SELECT sh.source, sh.g, CAST(count(*) AS BIGINT) AS df
      FROM sh GROUP BY sh.source, sh.g)
    SELECT nd.source, nd.docs AS n_docs,
           CAST(count(CASE WHEN df.df * 2 >= nd.docs THEN 1 END) AS BIGINT)
             AS n_boilerplate_shingles,
           CAST(sum(CASE WHEN df.df * 2 >= nd.docs THEN df.df ELSE 0 END)
                AS BIGINT) AS boilerplate_occurrences,
           round(sum(CASE WHEN df.df * 2 >= nd.docs THEN df.df ELSE 0 END)
                 * 1e0 / sum(df.df), 6) AS boilerplate_share
    FROM df JOIN nd ON df.source = nd.source
    GROUP BY nd.source, nd.docs
    ORDER BY nd.source
"""


@register("llm_template_boilerplate_detect", oracle=_BOILER_DUCK)
def llm_template_boilerplate_detect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Template/boilerplate detector per source: a 3-shingle that
    appears in at least HALF the source's documents is boilerplate
    (navigation chrome, legal footers, scraper artifacts — the text
    that IDF-weighting down-ranks and a curation pipeline strips
    before training); reports the boilerplate shingle count and the
    share of the source's shingle mass it owns. Per-doc-DISTINCT
    shingles so a doc repeating its own footer doesn't vote twice.

    Round-13 exact-collapse (isolated-cache sweep: 77.8 s cold at 100× —
    the full-corpus distinct-shingle stage): a doc's DISTINCT shingle set
    is a pure function of text, so shingles are exploded for ONE
    representative per distinct text and the doc-frequency table is the
    multiplicity-weighted sum df(source, g) = Σ_h mult(h, source) over
    groups whose text contains g — each identical copy still votes
    exactly once. Docs-per-source counts texts with ≥3 tokens (groups
    with ≥1 shingle), matching the original filter. Oracle unchanged.
    Scale shape: rep shingle explode is map-side over distinct content;
    one (source, shingle) shuffle at group grain."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    grp = spark.sql(
        """
        SELECT md5(text) AS h, source, min(doc_id) AS rep_doc,
               count(*) AS mult
        FROM documents GROUP BY md5(text), source
        """
    ).cache()
    grp.createOrReplaceTempView("__boiler_grp")
    shr = spark.sql(
        """
        SELECT DISTINCT r0.h, g
        FROM (SELECT h, min(rep_doc) AS rep_doc
              FROM __boiler_grp GROUP BY h) r0
        JOIN (SELECT doc_id, split(text, ' ') AS tk FROM documents) d
          ON d.doc_id = r0.rep_doc
        LATERAL VIEW explode(transform(sequence(0, size(tk) - 3),
            i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS g
        WHERE size(tk) >= 3
        """
    ).cache()
    shr.createOrReplaceTempView("__boiler_shr")
    _materialize_cache(spark, grp, shr)
    return spark.sql(
        """
        SELECT nd.source, nd.docs AS n_docs,
               CAST(count(CASE WHEN df.df * 2 >= nd.docs THEN 1 END)
                    AS BIGINT) AS n_boilerplate_shingles,
               CAST(sum(CASE WHEN df.df * 2 >= nd.docs THEN df.df ELSE 0 END)
                    AS BIGINT) AS boilerplate_occurrences,
               round(sum(CASE WHEN df.df * 2 >= nd.docs
                              THEN df.df ELSE 0 END)
                     * 1e0 / sum(df.df), 6) AS boilerplate_share
        FROM (SELECT g.source, s.g, CAST(sum(g.mult) AS BIGINT) AS df
              FROM __boiler_shr s JOIN __boiler_grp g ON g.h = s.h
              GROUP BY g.source, s.g) df
        JOIN (SELECT g.source, CAST(sum(g.mult) AS BIGINT) AS docs
              FROM __boiler_grp g
              WHERE g.h IN (SELECT DISTINCT h FROM __boiler_shr)
              GROUP BY g.source) nd
          ON df.source = nd.source
        GROUP BY nd.source, nd.docs
        ORDER BY nd.source
        """
    )


_TRUNC_SQL = """
    WITH d AS (
      SELECT CAST({ws_tokens} AS BIGINT) AS n_tok FROM documents),
    grid AS (SELECT L FROM (SELECT 64 AS L UNION ALL SELECT 128
                            UNION ALL SELECT 256 UNION ALL SELECT 512) g)
    SELECT g.L AS context_limit,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN d.n_tok > g.L THEN 1 ELSE 0 END) AS BIGINT)
             AS n_truncated,
           round(sum(CASE WHEN d.n_tok > g.L THEN 1e0 ELSE 0e0 END)
                 / count(*), 6) AS doc_truncation_rate,
           CAST(sum(greatest(d.n_tok - g.L, 0)) AS BIGINT) AS tokens_lost,
           round(sum(greatest(d.n_tok - g.L, 0)) * 1e0 / sum(d.n_tok), 6)
             AS token_loss_share
    FROM grid g CROSS JOIN d
    GROUP BY g.L
    ORDER BY context_limit
"""


@register(
    "llm_truncation_loss_curve",
    oracle=_TRUNC_SQL.format(ws_tokens="len(string_split(text, ' '))"),
)
def llm_truncation_loss_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-truncation loss curve: at context limits 64/128/256/512
    tokens, how many documents get cut and what share of corpus tokens
    falls off the end — the budget table that decides between
    truncation and chunking (llm_window_chunking) for a training run.
    Integer token counts; the grid is a 4-row literal broadcast over
    one map-side count scan (the llm_packing_efficiency_curve shape,
    measuring the LOSS side instead of the packing side)."""
    return sql_q(
        spark, sf_dir, _TRUNC_SQL.format(ws_tokens="size(split(text, ' '))")
    )


_FORMAT_SQL = """
    WITH f AS (
      SELECT source,
             CASE WHEN position('|' in text) > 0 THEN 1 ELSE 0 END AS has_pipe,
             CASE WHEN position('?' in text) > 0 THEN 1 ELSE 0 END AS has_q,
             CASE WHEN position(':' in text) > 0 THEN 1 ELSE 0 END AS has_colon,
             CASE WHEN position('(' in text) > 0
                    AND position(')' in text) > 0 THEN 1 ELSE 0 END
               AS has_parens,
             CASE WHEN position('.' in text) > 0 THEN 1 ELSE 0 END AS has_period
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(has_pipe) * 1e0 / count(*), 6) AS table_markup_rate,
           round(sum(has_q) * 1e0 / count(*), 6) AS question_rate,
           round(sum(has_colon) * 1e0 / count(*), 6) AS keyvalue_rate,
           round(sum(has_parens) * 1e0 / count(*), 6) AS parenthetical_rate,
           round(sum(has_period) * 1e0 / count(*), 6) AS sentence_rate
    FROM f GROUP BY source ORDER BY source
"""


@register("llm_format_detect", oracle=_FORMAT_SQL)
def llm_format_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-format fingerprint per source: rates of table markup
    (pipes), interrogatives, key:value structure, parentheticals and
    sentence punctuation — the cheap structural signals a curation
    router uses to split prose / tabular / Q&A / code-ish shards
    before format-specific cleaning (full regex taggers run after
    this triage, on the shards it selects). Pure position() presence
    tests — one map-side scan, |sources|-grain aggregate, exact
    integer counts under the rounded rates; identical SQL text on
    both engines."""
    return sql_q(spark, sf_dir, _FORMAT_SQL)


_CHARMIX_SQL = """
    WITH c AS (
      SELECT source,
             CAST(length(text) AS BIGINT) AS total,
             CAST(length(regexp_replace(text, '[^A-Za-z]', ''{g}))
                  AS BIGINT) AS letters,
             CAST(length(regexp_replace(text, '[^0-9]', ''{g}))
                  AS BIGINT) AS digits,
             CAST(length(regexp_replace(text, '[^ ]', ''{g}))
                  AS BIGINT) AS spaces
      FROM documents)
    SELECT source,
           CAST(sum(total) AS BIGINT) AS n_chars,
           round(sum(letters) * 1e0 / sum(total), 6) AS letter_share,
           round(sum(digits) * 1e0 / sum(total), 6) AS digit_share,
           round(sum(spaces) * 1e0 / sum(total), 6) AS space_share,
           round(sum(total - letters - digits - spaces) * 1e0 / sum(total), 6)
             AS symbol_share,
           CAST(sum(total - letters - digits - spaces) * 1e0 / sum(total)
                > 0.10 AS BOOLEAN) AS symbol_heavy
    FROM c GROUP BY source ORDER BY source
"""


@register("llm_char_class_mix", oracle=_CHARMIX_SQL.format(g=", 'g'"))
def llm_char_class_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source: letter / digit /
    whitespace / symbol shares with a symbol-heavy flag — the
    mojibake-and-markup tripwire (a crawl source whose symbol share
    jumps is emitting broken encodings or raw markup, and belongs in
    quarantine before tokenization). Class counts via
    strip-and-measure regexp_replace (delete everything outside the
    class, take the length) — exact integers, portable character
    classes, one map-side scan, |sources|-grain aggregate."""
    return sql_q(spark, sf_dir, _CHARMIX_SQL.format(g=""))


_VAD_DUCK = """
    WITH frames AS (
      SELECT doc_id, CAST(s AS BIGINT) AS fidx,
             list_aggregate(list_transform(
               range(1, len(substr(text, CAST(s * 16 + 1 AS INT), 16)) + 1),
               i -> ord(substr(substr(text, CAST(s * 16 + 1 AS INT), 16),
                               CAST(i AS INT), 1))), 'sum') AS energy
      FROM documents
      CROSS JOIN LATERAL unnest(generate_series(
        0, CAST(ceil(CAST(length(text) AS DOUBLE) / 16) AS BIGINT) - 1))
        AS g(s)
      WHERE length(text) > 0),
    v AS (SELECT doc_id, fidx,
                 CASE WHEN energy > 1600 THEN 1 ELSE 0 END AS voiced
          FROM frames),
    isl AS (
      SELECT doc_id, fidx,
             fidx - row_number() OVER (PARTITION BY doc_id
                                       ORDER BY fidx) AS gid
      FROM v WHERE voiced = 1),
    seg AS (SELECT doc_id, gid, CAST(count(*) AS BIGINT) AS seg_len
            FROM isl GROUP BY doc_id, gid),
    per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
             CAST(sum(voiced) AS BIGINT) AS n_voiced
      FROM v GROUP BY doc_id)
    SELECT p.doc_id, p.n_frames, p.n_voiced,
           CAST(COALESCE(s.n_seg, 0) AS BIGINT) AS n_segments,
           CAST(COALESCE(s.max_len, 0) AS BIGINT) AS longest_segment
    FROM per p
    LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seg,
                      max(seg_len) AS max_len
               FROM seg GROUP BY doc_id) s ON s.doc_id = p.doc_id
    ORDER BY p.doc_id
"""


@register("mm_audio_vad_stub", oracle=_VAD_DUCK)
def mm_audio_vad_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-detection plumbing (audio stand-in): the binary
    payload chunks into 16-byte frames, each frame reduces to an
    energy (byte sum — a real impl swaps in RMS over PCM samples), a
    frame is 'voiced' above threshold 1600, and consecutive voiced
    frames merge into segments — per doc: frame/voiced counts, segment
    count, longest segment. This is the exact shape a diarization or
    silence-trimming stage needs (frame featurize → threshold →
    run-length merge), with only the featurizer faked. Arrow-batched
    mapInPandas, pure map-side, zero-length payloads dropped like the
    oracle's empty generate_series. Oracle recomputes byte math via
    per-char codepoints (exact on the ASCII corpus) and run-lengths
    via the gaps-and-islands window."""

    def vad(batches):
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "n_voiced": [],
                   "n_segments": [], "longest_segment": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if not buf:
                    continue
                voiced = [
                    sum(buf[o:o + 16]) > 1600
                    for o in range(0, len(buf), 16)
                ]
                segs = []
                run = 0
                for vf in voiced:
                    if vf:
                        run += 1
                    elif run:
                        segs.append(run)
                        run = 0
                if run:
                    segs.append(run)
                out["doc_id"].append(doc_id)
                out["n_frames"].append(len(voiced))
                out["n_voiced"].append(sum(voiced))
                out["n_segments"].append(len(segs))
                out["longest_segment"].append(max(segs) if segs else 0)
            yield pd.DataFrame(out).astype("int64")

    d = t(spark, sf_dir, "documents").where(F.col("text").isNotNull()).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        vad,
        "doc_id long, n_frames long, n_voiced long,"
        " n_segments long, longest_segment long",
    ).orderBy("doc_id")


_PATCH_DUCK = """
    WITH px AS (
      SELECT doc_id,
             ((CAST(i - 1 AS BIGINT) // 32) // 16) * 2
               + ((CAST(i - 1 AS BIGINT) % 32) // 16) AS patch,
             ord(substr(text, CAST(i AS INT), 1)) AS b
      FROM documents
      CROSS JOIN LATERAL unnest(generate_series(1, length(text))) AS g(i)
      WHERE length(text) > 0),
    pf AS (
      SELECT doc_id, patch, CAST(sum(b) % 997 AS BIGINT) AS feat
      FROM px GROUP BY doc_id, patch)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_patches,
           round(avg(feat), 6) AS mean_patch_feat,
           max(feat) AS max_patch_feat
    FROM pf GROUP BY doc_id ORDER BY doc_id
"""


@register("mm_patch_embed_stub", oracle=_PATCH_DUCK)
def mm_patch_embed_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch-extraction plumbing (image stand-in): the binary
    payload is laid out as a 32-byte-wide raster and cut into 16x16
    patches; each patch reduces to a deterministic feature (byte sum
    mod 997 — a real impl swaps in a linear patch projection) — per
    doc: patch count and mean/max patch feature. The Spark shape is
    the real pre-embedding pipeline: binary column → Arrow batches →
    numpy reshape/bincount per doc → typed per-doc stats; only the
    projection is fake. Pure map-side. The mean is emitted raw from
    Python and rounded SPARK-side (numpy rounds half-even, SQL
    half-up — the mm_audio_chunk_stub lesson)."""
    import numpy as np

    def patches(batches):
        for pdf in batches:
            out = {"doc_id": [], "n_patches": [], "mean_patch_feat": [],
                   "max_patch_feat": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                if buf.size == 0:
                    continue
                idx = np.arange(buf.size, dtype=np.int64)
                patch = (idx // 32 // 16) * 2 + (idx % 32) // 16
                sums = np.bincount(patch, weights=buf).astype(np.int64)
                present = np.nonzero(np.bincount(patch))[0]
                feats = sums[present] % 997
                out["doc_id"].append(doc_id)
                out["n_patches"].append(len(feats))
                out["mean_patch_feat"].append(float(feats.mean()))
                out["max_patch_feat"].append(int(feats.max()))
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "n_patches": "int64",
                 "mean_patch_feat": "float64", "max_patch_feat": "int64"}
            )

    d = t(spark, sf_dir, "documents").where(F.col("text").isNotNull()).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return (
        d.mapInPandas(
            patches,
            "doc_id long, n_patches long, mean_patch_feat double,"
            " max_patch_feat long",
        )
        .withColumn("mean_patch_feat", ratio(F.col("mean_patch_feat")))
        .orderBy("doc_id")
    )


def _simhash_code_sql(h_expr: str) -> str:
    """Per-doc 32-bit SimHash code from per-token hash ints, portable
    (integer-division bit tests — no engine-specific shift/xor). 32 bits
    (not llm_simhash's didactic 16) so the 4 LSH bands below are 8 bits
    wide: 256 values per band keeps band buckets ~n/256 instead of n/16
    — the width IS the scalability lever of simhash banding."""
    votes = ", ".join(
        f"sum(CASE WHEN CAST(floor(h / {1 << b}) AS BIGINT) % 2 = 1"
        f" THEN 1 ELSE -1 END) AS v{b}"
        for b in range(32)
    )
    code = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32)
    )
    return (
        f"SELECT doc_id, source, CAST({code} AS BIGINT) AS sim FROM ("
        f"SELECT doc_id, source, {votes} FROM ("
        f"SELECT doc_id, source, {h_expr} AS h FROM tokrows) hh"
        f" GROUP BY doc_id, source) v"
    )


def _simfp_sql(dialect: str) -> str:
    if dialect == "spark":
        tokrows = (
            "SELECT doc_id, source, token FROM (SELECT doc_id, source,"
            " explode(split(text, ' ')) AS token FROM reps)"
        )
        h = "cast(conv(substr(md5(token), 1, 8), 16, 10) AS BIGINT)"
        sh3 = (
            "SELECT doc_id, g FROM (SELECT doc_id, split(text, ' ') AS tk"
            " FROM reps) LATERAL VIEW explode(array_distinct(transform("
            "sequence(0, size(tk) - 3),"
            " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS g"
            " WHERE size(tk) >= 3"
        )
    else:
        tokrows = (
            "SELECT doc_id, source, unnest(string_split(text, ' ')) AS token"
            " FROM reps"
        )
        h = "CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT)"
        sh3 = (
            "SELECT DISTINCT doc_id,"
            " unnest(list_transform(generate_series(1, len(tk) - 2),"
            " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS g"
            " FROM (SELECT doc_id, string_split(text, ' ') AS tk"
            " FROM reps) t WHERE len(tk) >= 3"
        )
    ham = " + ".join(
        f"abs(CAST(floor(a.sim / {1 << b}) AS BIGINT) % 2"
        f" - CAST(floor(b.sim / {1 << b}) AS BIGINT) % 2)"
        for b in range(32)
    )
    return f"""
    WITH reps AS (
      SELECT min(doc_id) AS doc_id, source, text
      FROM documents GROUP BY source, text),
    tokrows AS ({tokrows}),
    sim AS ({_simhash_code_sql(h)}),
    bands AS (
      SELECT doc_id, source, j,
             CAST(floor(sim / CASE j WHEN 0 THEN 1 WHEN 1 THEN 256
                                     WHEN 2 THEN 65536
                                     ELSE 16777216 END)
                  AS BIGINT) % 256 AS bv
      FROM sim CROSS JOIN (SELECT 0 AS j UNION ALL SELECT 1
                           UNION ALL SELECT 2 UNION ALL SELECT 3) js),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.source = y.source AND x.j = y.j AND x.bv = y.bv
       AND x.doc_id < y.doc_id),
    hd AS (
      SELECT c.doc_a, c.doc_b, CAST(({ham}) AS BIGINT) AS hamming
      FROM cand c
      JOIN sim a ON a.doc_id = c.doc_a
      JOIN sim b ON b.doc_id = c.doc_b),
    close AS (SELECT doc_a, doc_b, hamming FROM hd WHERE hamming <= 3),
    sh AS ({sh3}),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
              FROM sh GROUP BY doc_id),
    inter AS (
      SELECT cl.hamming, cl.doc_a, cl.doc_b,
             CAST(count(sb.g) AS BIGINT) AS shared
      FROM close cl
      JOIN sh sa ON sa.doc_id = cl.doc_a
      LEFT JOIN sh sb ON sb.doc_id = cl.doc_b AND sb.g = sa.g
      GROUP BY cl.hamming, cl.doc_a, cl.doc_b),
    verd AS (
      SELECT i.hamming,
             CASE WHEN i.shared * 1e0
                       / (za.n + zb.n - i.shared) >= 0.5
                  THEN 1 ELSE 0 END AS is_true
      FROM inter i
      JOIN sizes za ON za.doc_id = i.doc_a
      JOIN sizes zb ON zb.doc_id = i.doc_b)
    SELECT hamming,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(is_true) AS BIGINT) AS n_true_dups,
           round(1e0 - sum(is_true) * 1e0 / count(*), 6)
             AS false_positive_rate
    FROM verd GROUP BY hamming ORDER BY hamming
    """


@register("llm_simhash_fp_audit", oracle=_simfp_sql("duck"))
def llm_simhash_fp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality audit for the SimHash family (the
    llm_minhash_jaccard_estimate discipline applied to the OTHER
    fingerprint): band-blocked same-source candidate pairs at Hamming
    distance <= 3 on the 32-bit code (4 bands x 8 bits — any pair at
    hamming <= 3 shares a band by pigeonhole), each verified against exact
    3-shingle Jaccard >= 0.5 — per Hamming distance, the candidate
    count and false-positive rate that decide whether a SimHash cutoff
    is safe to deploy at 100 TB. EXACT-COLLAPSE FIRST: identical
    (source, text) docs keep one representative before fingerprinting
    (identical texts are hamming-0 trivial dups that hash dedup already
    catches; without the collapse the band join is quadratic in
    duplicate multiplicity on a dup-heavy corpus). Portable bit
    arithmetic throughout
    (integer-division bit tests, no engine xor/shift). The token,
    code and candidate stages are cached temp views on the Spark side;
    the shared builder emits the DuckDB oracle."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    reps = spark.sql(
        "SELECT min(doc_id) AS doc_id, source, text"
        " FROM documents GROUP BY source, text"
    ).cache()
    reps.createOrReplaceTempView("__simfp_reps")
    tok = spark.sql(
        "SELECT doc_id, source, explode(split(text, ' ')) AS token"
        " FROM __simfp_reps"
    ).cache()
    tok.createOrReplaceTempView("tokrows_v")
    sim = spark.sql(
        _simhash_code_sql(
            "cast(conv(substr(md5(token), 1, 8), 16, 10) AS BIGINT)"
        ).replace("FROM tokrows)", "FROM tokrows_v)")
    ).cache()
    sim.createOrReplaceTempView("__simfp_sim")
    sh = spark.sql(
        "SELECT doc_id, g FROM (SELECT doc_id, split(text, ' ') AS tk"
        " FROM __simfp_reps) LATERAL VIEW explode(array_distinct(transform("
        "sequence(0, size(tk) - 3),"
        " i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))) AS g"
        " WHERE size(tk) >= 3"
    ).cache()
    sh.createOrReplaceTempView("__simfp_sh")
    ham = " + ".join(
        f"abs(CAST(floor(a.sim / {1 << b}) AS BIGINT) % 2"
        f" - CAST(floor(b.sim / {1 << b}) AS BIGINT) % 2)"
        for b in range(32)
    )
    return spark.sql(
        f"""
        SELECT hamming,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(sum(is_true) AS BIGINT) AS n_true_dups,
               round(1e0 - sum(is_true) * 1e0 / count(*), 6)
                 AS false_positive_rate
        FROM (
          SELECT i.hamming,
                 CASE WHEN i.shared * 1e0 / (za.n + zb.n - i.shared) >= 0.5
                      THEN 1 ELSE 0 END AS is_true
          FROM (
            SELECT cl.hamming, cl.doc_a, cl.doc_b,
                   CAST(count(sb.g) AS BIGINT) AS shared
            FROM (
              SELECT c.doc_a, c.doc_b, CAST(({ham}) AS BIGINT) AS hamming
              FROM (
                SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                FROM (SELECT doc_id, source, j,
                             CAST(floor(sim / CASE j WHEN 0 THEN 1
                                 WHEN 1 THEN 256 WHEN 2 THEN 65536
                                 ELSE 16777216 END) AS BIGINT) % 256 AS bv
                      FROM __simfp_sim
                      CROSS JOIN (SELECT 0 AS j UNION ALL SELECT 1
                                  UNION ALL SELECT 2
                                  UNION ALL SELECT 3) js) x
                JOIN (SELECT doc_id, source, j,
                             CAST(floor(sim / CASE j WHEN 0 THEN 1
                                 WHEN 1 THEN 256 WHEN 2 THEN 65536
                                 ELSE 16777216 END) AS BIGINT) % 256 AS bv
                      FROM __simfp_sim
                      CROSS JOIN (SELECT 0 AS j UNION ALL SELECT 1
                                  UNION ALL SELECT 2
                                  UNION ALL SELECT 3) js) y
                  ON x.source = y.source AND x.j = y.j AND x.bv = y.bv
                 AND x.doc_id < y.doc_id) c
              JOIN __simfp_sim a ON a.doc_id = c.doc_a
              JOIN __simfp_sim b ON b.doc_id = c.doc_b
              WHERE ({ham}) <= 3) cl
            JOIN __simfp_sh sa ON sa.doc_id = cl.doc_a
            LEFT JOIN __simfp_sh sb ON sb.doc_id = cl.doc_b AND sb.g = sa.g
            GROUP BY cl.hamming, cl.doc_a, cl.doc_b) i
          JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                FROM __simfp_sh GROUP BY doc_id) za ON za.doc_id = i.doc_a
          JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                FROM __simfp_sh GROUP BY doc_id) zb ON zb.doc_id = i.doc_b
        ) v
        GROUP BY hamming ORDER BY hamming
        """
    )


_BUDGET_SQL = """
    WITH d AS (
      SELECT source, CAST({ws_tokens} AS BIGINT) AS n_tok FROM documents),
    s AS (
      SELECT source,
             CAST(sum(n_tok) AS BIGINT) AS toks,
             sum(CASE WHEN n_tok BETWEEN 40 AND 80
                      THEN 1e0 ELSE 0e0 END) / count(*) AS qshare
      FROM d GROUP BY source),
    tot AS (
      SELECT CAST(sum(toks) AS BIGINT) AS all_toks,
             sum(toks * qshare) AS wsum
      FROM s),
    a0 AS (
      SELECT s.source, s.toks, s.qshare,
             floor(tot.all_toks / 2e0) * (s.toks * s.qshare) / tot.wsum
               AS alloc0
      FROM s CROSS JOIN tot),
    redo AS (
      SELECT sum(CASE WHEN alloc0 > toks THEN alloc0 - toks ELSE 0 END)
               AS excess,
             sum(CASE WHEN alloc0 <= toks THEN toks * qshare ELSE 0 END)
               AS w_open
      FROM a0)
    SELECT a0.source, a0.toks AS available_tokens,
           round(a0.qshare, 6) AS quality_share,
           CAST(round(CASE WHEN a0.alloc0 > a0.toks THEN a0.toks * 1e0
                      ELSE least(a0.toks * 1e0,
                             a0.alloc0 + r.excess * (a0.toks * a0.qshare)
                                         / r.w_open) END)
                AS BIGINT) AS allocated_tokens,
           round(CASE WHEN a0.alloc0 > a0.toks THEN a0.toks * 1e0
                 ELSE least(a0.toks * 1e0,
                        a0.alloc0 + r.excess * (a0.toks * a0.qshare)
                                    / r.w_open) END / a0.toks, 6)
             AS utilization
    FROM a0 CROSS JOIN redo r
    ORDER BY a0.source
"""


@register(
    "llm_token_budget_allocator",
    oracle=_BUDGET_SQL.format(ws_tokens="len(string_split(text, ' '))"),
)
def llm_token_budget_allocator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture token-budget allocator: a 50%-of-corpus token
    budget is split across sources proportional to quality-weighted
    size (weight = tokens x share of docs in the 40-80-token sweet
    spot for this corpus), capped at each source's available tokens with ONE
    water-filling redistribution of the capped excess to the open
    sources — the allocation table a data-mixing run (DoReMi/
    mixture_temperature's deterministic cousin) executes against.
    Everything past one token-count scan is |sources|-grain arithmetic
    on exact integers. The single-round redistribution is documented
    (a second round only matters when the redistribution itself
    re-caps, which the least() guard bounds)."""
    return sql_q(
        spark, sf_dir, _BUDGET_SQL.format(ws_tokens="size(split(text, ' '))")
    )


_TFIDF_COS_DUCK = """
    WITH reps AS (
      SELECT min(doc_id) AS doc_id, source, text
      FROM documents GROUP BY source, text),
    tf AS (
      SELECT doc_id, source, token, CAST(count(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
            FROM reps) t
      GROUP BY doc_id, source, token),
    nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tf),
    idf AS (
      SELECT token, ln(nn.n / count(DISTINCT doc_id)) AS idf
      FROM tf CROSS JOIN nn GROUP BY token, nn.n),
    w AS (
      SELECT tf.doc_id, tf.source, tf.token, tf.tf * idf.idf AS wt
      FROM tf JOIN idf ON idf.token = tf.token),
    nrm AS (
      SELECT doc_id, sqrt(sum(wt * wt)) AS nm FROM w GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.wt * b.wt) AS dot
      FROM w a JOIN w b ON b.source = a.source AND b.token = a.token
                       AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT d.doc_a, d.doc_b,
           round(d.dot / (na.nm * nb.nm), 6) AS tfidf_cosine
    FROM dots d
    JOIN nrm na ON na.doc_id = d.doc_a
    JOIN nrm nb ON nb.doc_id = d.doc_b
    WHERE d.dot / (na.nm * nb.nm) >= 0.3
    ORDER BY tfidf_cosine DESC, d.doc_a, d.doc_b
    LIMIT 20
"""


@register("llm_tfidf_cosine_pairs", oracle=_TFIDF_COS_DUCK)
def llm_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF vector-space cosine similarity for same-source document
    pairs — the bag-of-words twin of llm_idf_weighted_jaccard (that op
    scores weighted SET overlap; this one scores the weighted
    FREQUENCY vectors, so a doc that repeats a rare term twice counts
    it twice). Top-20 pairs at >= 0.3. EXACT-COLLAPSE FIRST: identical
    (source, text) docs keep one representative before any pairing —
    exact dups are hash-dedup's job (llm_exact_dedup), and without the
    collapse the token-key pair join is quadratic in duplicate
    multiplicity (measured 69x at 10x on the 90%-dup amplified corpus;
    with it the pair population is distinct-text-bounded). The corpus-sized (doc, token,
    weight) stage is CACHED and read by the norm pass and both pair
    sides; the |vocab|-grain idf join broadcasts at 100 TB; the pair
    join is source-blocked + token-key co-partitioned."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    tf = spark.sql(
        """
        SELECT doc_id, source, token, CAST(count(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, source, explode(split(text, ' ')) AS token
              FROM (SELECT min(doc_id) AS doc_id, source, text
                    FROM documents GROUP BY source, text))
        GROUP BY doc_id, source, token
        """
    ).cache()
    tf.createOrReplaceTempView("__tfc_tf")
    w = spark.sql(
        """
        SELECT t.doc_id, t.source, t.token,
               t.tf * ln((SELECT CAST(count(DISTINCT doc_id) AS DOUBLE)
                          FROM __tfc_tf) / i.df) AS wt
        FROM __tfc_tf t
        JOIN (SELECT token, count(DISTINCT doc_id) AS df
              FROM __tfc_tf GROUP BY token) i ON i.token = t.token
        """
    ).cache()
    w.createOrReplaceTempView("__tfc_w")
    return spark.sql(
        """
        SELECT d.doc_a, d.doc_b,
               round(d.dot / (na.nm * nb.nm), 6) AS tfidf_cosine
        FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     sum(a.wt * b.wt) AS dot
              FROM __tfc_w a
              JOIN __tfc_w b ON b.source = a.source AND b.token = a.token
                            AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id) d
        JOIN (SELECT doc_id, sqrt(sum(wt * wt)) AS nm
              FROM __tfc_w GROUP BY doc_id) na ON na.doc_id = d.doc_a
        JOIN (SELECT doc_id, sqrt(sum(wt * wt)) AS nm
              FROM __tfc_w GROUP BY doc_id) nb ON nb.doc_id = d.doc_b
        WHERE d.dot / (na.nm * nb.nm) >= 0.3
        ORDER BY tfidf_cosine DESC, d.doc_a, d.doc_b
        LIMIT 20
        """
    )


def _shsens_sql(dialect: str) -> str:
    """Same-source near-dup pair counts at shingle sizes 2/3/5 over the
    exact-collapsed corpus, in either dialect."""
    parts = []
    for n in (2, 3, 5):
        if dialect == "spark":
            sh = (
                f"SELECT doc_id, source, g FROM (SELECT doc_id, source,"
                f" split(text, ' ') AS tk FROM reps)"
                f" LATERAL VIEW explode(array_distinct(transform("
                f"sequence(0, size(tk) - {n}),"
                f" i -> concat_ws(' ', "
                + ", ".join(f"tk[i+{j}]" for j in range(n))
                + f")))) AS g WHERE size(tk) >= {n}"
            )
        else:
            sh = (
                f"SELECT DISTINCT doc_id, source,"
                f" unnest(list_transform(generate_series(1, len(tk) - {n - 1}),"
                f" i -> concat_ws(' ', "
                + ", ".join(f"tk[i+{j}]" for j in range(n))
                + f"))) AS g FROM (SELECT doc_id, source,"
                f" string_split(text, ' ') AS tk FROM reps) t"
                f" WHERE len(tk) >= {n}"
            )
        parts.append(
            f"""
    SELECT {n} AS shingle_n,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(j), 6) AS mean_jaccard
    FROM (
      SELECT i.shared * 1e0 / (za.n + zb.n - i.shared) AS j
      FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS shared
            FROM ({sh}) a
            JOIN ({sh}) b ON b.source = a.source AND b.g = a.g
                         AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id) i
      JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
            FROM ({sh}) s GROUP BY doc_id) za ON za.doc_id = i.doc_a
      JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
            FROM ({sh}) s GROUP BY doc_id) zb ON zb.doc_id = i.doc_b
      WHERE i.shared * 1e0 / (za.n + zb.n - i.shared) >= 0.5) v"""
        )
    u = " UNION ALL ".join(parts)
    return f"""
    WITH reps AS (
      SELECT min(doc_id) AS doc_id, source, text
      FROM documents GROUP BY source, text)
    SELECT * FROM ({u}) allrows ORDER BY shingle_n
    """


@register("llm_shingle_size_sensitivity", oracle=_shsens_sql("duck"))
def llm_shingle_size_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-size sensitivity sweep for the near-dup family: the
    number of same-source pairs at exact Jaccard >= 0.5 and their mean
    similarity, at shingle sizes 2, 3 and 5 — the parameter study that
    justifies the n=3 every other dedup op here uses (small n inflates
    matches with common phrases, large n misses paraphrase overlap;
    the pair count should fall monotonically in n). EXACT-COLLAPSE
    FIRST like its siblings. Scale shape (round 13 staging rewrite —
    the r12 verdict's 21-exchange finding): each arm's shingle explode
    is CACHED ONCE and its per-doc shingle counts once more; the old
    single-CTE form inlined the shingle subquery 4× per arm (Spark CTEs
    are not materialization points), re-exploding the corpus 12× across
    the sweep. Same SQL semantics per arm, oracle unchanged; in
    production the pair sets come from the banding pipeline and this
    audit runs on candidates only."""
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    reps = spark.sql(
        "SELECT min(doc_id) AS doc_id, source, text"
        " FROM documents GROUP BY source, text"
    ).cache()
    reps.createOrReplaceTempView("__shs_reps")
    _materialize_cache(spark, reps)
    parts = []
    staged = []
    for n in (2, 3, 5):
        grams = ", ".join(f"tk[i+{j}]" for j in range(n))
        sh = spark.sql(
            f"""
            SELECT doc_id, source, g FROM (SELECT doc_id, source,
            split(text, ' ') AS tk FROM __shs_reps)
            LATERAL VIEW explode(array_distinct(transform(
            sequence(0, size(tk) - {n}),
            i -> concat_ws(' ', {grams})))) AS g
            WHERE size(tk) >= {n}
            """
        ).cache()
        sh.createOrReplaceTempView(f"__shs_sh{n}")
        cnt = spark.sql(
            f"SELECT doc_id, CAST(count(*) AS BIGINT) AS n"
            f" FROM __shs_sh{n} GROUP BY doc_id"
        ).cache()
        cnt.createOrReplaceTempView(f"__shs_cnt{n}")
        staged.extend([sh, cnt])
        parts.append(
            f"""
    SELECT {n} AS shingle_n,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(j), 6) AS mean_jaccard
    FROM (
      SELECT i.shared * 1e0 / (za.n + zb.n - i.shared) AS j
      FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS shared
            FROM __shs_sh{n} a
            JOIN __shs_sh{n} b ON b.source = a.source AND b.g = a.g
                         AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id) i
      JOIN __shs_cnt{n} za ON za.doc_id = i.doc_a
      JOIN __shs_cnt{n} zb ON zb.doc_id = i.doc_b
      WHERE i.shared * 1e0 / (za.n + zb.n - i.shared) >= 0.5) v"""
        )
    _materialize_cache(spark, *staged)
    u = " UNION ALL ".join(parts)
    return spark.sql(f"SELECT * FROM ({u}) allrows ORDER BY shingle_n")


def _degree_dist_sql(pairs_sql: str) -> str:
    return f"""
    WITH pairs AS ({pairs_sql}),
    deg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_partners
      FROM (SELECT doc_a AS doc_id FROM pairs
            UNION ALL SELECT doc_b FROM pairs) u
      GROUP BY doc_id)
    SELECT n_partners,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(count(*)) OVER (ORDER BY n_partners
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_docs
    FROM deg GROUP BY n_partners ORDER BY n_partners
    """


def _register_dup_partner_degree() -> None:
    from ..registry import all_oracles

    banding_oracle = all_oracles()["llm_minhash_banding"]

    @register(
        "llm_dup_partner_degree_dist",
        oracle=_degree_dist_sql(banding_oracle),
    )
    def llm_dup_partner_degree_dist(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Dup-partner degree distribution of the verified near-dup pair
        graph (llm_minhash_banding's output): how many documents have
        1, 2, ... duplicate partners, with cumulative counts — the
        dedup ops-report that distinguishes 'pairwise near-dups'
        (degree 1-2, survivorship handles it) from 'dup galaxies'
        (high degree = one template spammed corpus-wide, where the
        right action is cluster-level collapse via
        llm_dedup_components, not pairwise removal). Degree grain is
        bounded by the max dup-cluster size; the window runs on the
        |degrees|-row histogram. Oracle composes the banding oracle
        verbatim as a CTE — lockstep by construction. Scale note:
        inherits llm_minhash_banding's round-11 exact-collapse, so the
        pair population (and this histogram) tracks DISTINCT content —
        the formerly output-bound verbatim-duplicate blowup (12.8x
        measured at 10x amplification in round 10) is gone."""
        pairs = llm_minhash_banding(spark, sf_dir)
        pairs.createOrReplaceTempView("__dupdeg_pairs")
        return spark.sql(
            _degree_dist_sql("SELECT * FROM __dupdeg_pairs")
        )


_register_dup_partner_degree()
