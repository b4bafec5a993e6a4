"""Deduplication operators over `documents` / `embeddings` — the
training-data-pipeline extensions (BASELINE.json north star).

Four families:
  * exact       — hash-groupBy on a normalized fingerprint (oracle-checked)
  * n-gram      — exact Jaccard over 3-token shingles via an inverted-index
                  self-join (oracle-checked)
  * MinHash+LSH — signature → bands → bucket join (xxhash64 is Spark-side
                  only → rows-only check; the superset-of-exact property is
                  asserted in tests instead)
  * embedding   — cosine near-dup with double-precision arithmetic mirrored
                  exactly in the oracle (oracle-checked)

Scale notes: the shingle inverted-index join shuffles on the shingle —
high-cardinality key, no skew; MinHash/LSH keeps signatures as a pure
projection (array higher-order fns, no explode until the tiny band keys);
embedding near-dup at 100 TB goes through the LSH/IVF path in
similarity.py, the brute-force pair join here is the correctness anchor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

# --- shared shingle machinery --------------------------------------------

SHINGLE_N = 3


def tokens_col(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def shingles_col(toks: Column) -> Column:
    """Distinct 3-token shingles as an array column (pure projection).

    Built with slice + zip_with rather than transform(sequence, element_at):
    element_at inside a lambda re-evaluates its array argument (the regex
    split) PER ELEMENT — measured 20s → 1s at sf0.1 for the inverted-index
    build after this rewrite. slice/zip_with materialize the token array
    once per row.
    """
    cnt = F.greatest(F.size(toks) - (SHINGLE_N - 1), F.lit(0))
    s1 = F.slice(toks, 1, cnt)
    s2 = F.slice(toks, 2, cnt)
    s3 = F.slice(toks, 3, cnt)
    pair = F.zip_with(s1, s2, lambda x, y: F.concat_ws(" ", x, y))
    return F.array_distinct(F.zip_with(pair, s3, lambda x, y: F.concat_ws(" ", x, y)))


def doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", shingles_col(tokens_col(F.col("text"))).alias("shingles")
    ).filter(F.size("shingles") > 0)


_SQL_SHINGLES = """
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
             )) AS shingles
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 3
"""


# --- exact dedup ----------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 of normalized text; keep the min doc_id per group."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return (
        docs.select("doc_id", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


register(
    "dedup_exact",
    sql="""
    SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint,
           min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)(dedup_exact)


# --- n-gram Jaccard near-dup ---------------------------------------------

JACCARD_THRESHOLD = 0.05


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard via an inverted index, pairs generated
    per-shingle-bucket with array HOFs.

    explode(shingles) → groupBy(shingle hash) collecting (doc_id, n)
    lists → emit ordered pairs inside each bucket (nested transform +
    filter — no self-join, so the expensive shingle computation runs
    ONCE) → count shared per pair → |A∪B| = |A|+|B|−shared → threshold.

    vs. the classic inverted-index self-join: one scan instead of two and
    two agg shuffles instead of a join shuffle of both full indexes —
    measured 4.0s → 3.0s at sf0.1. Frequent-shingle buckets are the skew
    risk at 100 TB (k docs → k² pairs in one task); the scale path caps
    bucket size (drop stop-shingles) or switches to dedup_minhash_lsh.
    """
    sh = doc_shingles(spark, sf_dir)
    # (doc_id, n) packed into ONE long — doc_id<<20 | n — so the pair
    # shuffle moves 2 longs per row instead of 4 columns, and no re-join
    # (which would recompute the shingle projection) is needed to recover
    # the set sizes: they unpack from the group keys after the count.
    # Packing is order-preserving (doc_ids are unique, so comparing packed
    # values == comparing doc_ids). Limits: n < 2^20 shingles per doc
    # (~5 MB of text), doc_id < 2^43. Measured 3.1s → 2.6s at sf0.1.
    # The guard lives INSIDE the packed expression (a separate assert
    # column could be pruned away by Catalyst): any doc at the packing
    # limits fails the job loudly instead of silently corrupting pairs.
    n_sh = F.size("shingles")
    fits = (n_sh < F.lit(1 << 20)) & (F.col("doc_id") < F.lit(1 << 43))
    packed = (
        F.when(fits, F.shiftleft(F.col("doc_id"), 20) + n_sh)
        .otherwise(
            F.raise_error(
                F.lit("dedup_ngram_jaccard: doc_id/shingle-count exceeds packing range")
            ).cast("long")
        )
        .alias("dn")
    )
    inv = sh.select(packed, F.explode("shingles").alias("shingle")).select(
        "dn", F.xxhash64("shingle").alias("skey")
    )
    buckets = (
        inv.groupBy("skey")
        .agg(F.collect_list("dn").alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x: F.filter(
                F.transform(
                    F.col("ds"), lambda y: F.struct(x.alias("pa"), y.alias("pb"))
                ),
                lambda p: p["pa"] < p["pb"],
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pairs_arr).alias("p"))
        .groupBy("p.pa", "p.pb")
        .agg(F.count("*").alias("shared"))
    )
    unpacked = pairs.select(
        F.shiftrightunsigned("pa", 20).alias("doc_a"),
        (F.col("pa") % (1 << 20)).alias("na"),
        F.shiftrightunsigned("pb", 20).alias("doc_b"),
        (F.col("pb") % (1 << 20)).alias("nb"),
        "shared",
    )
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        unpacked.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "shared", "jaccard")
    )


JACCARD_SQL = f"""
    WITH sh AS ({_SQL_SHINGLES}),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(shingles) AS n_shingles FROM sh),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, shared,
           round(shared * 1.0 / (sa.n_shingles + sb.n_shingles - shared), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(shared * 1.0 / (sa.n_shingles + sb.n_shingles - shared), 6)
          >= {JACCARD_THRESHOLD}
    """

register("dedup_ngram_jaccard", sql=JACCARD_SQL)(dedup_ngram_jaccard)


# --- near-dup connected components (dedup clusters) -----------------------

MAX_CC_ITERS = 50


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group near-duplicate pairs into clusters: connected components by
    iterative min-label propagation (the keep-one-per-cluster stage of a
    dedup pipeline; the "iterative algorithm" operator class).

    Each iteration: label(u) ← min(label(u), min over neighbors v of
    label(v)), then a pointer-jump label(u) ← min(label(u),
    label(label(u))) — the jump halves the distance to each component's
    minimum every round, so convergence takes O(log diameter) iterations
    instead of O(diameter). Each iteration is two shuffle joins + an agg,
    lineage truncated with localCheckpoint. Oracle: DuckDB recursive-CTE
    transitive closure over the same pair set."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs).select(
        F.col("u").alias("doc_id"), "component"
    ).orderBy("doc_id")


def connected_components(pairs: DataFrame) -> DataFrame:
    """(u, component) for every node in the (doc_a, doc_b) pair set —
    component = min reachable node id. See dedup_components for the
    algorithm; factored out so any pair source (jaccard, minhash,
    simhash, embedding) can be clustered."""
    edges = (
        pairs.union(pairs.select(pairs.columns[1], pairs.columns[0]))
        .toDF("u", "v")
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select("u").distinct().withColumn("component", F.col("u"))
    for _ in range(MAX_CC_ITERS):
        prop = edges.join(
            labels.withColumnRenamed("u", "v"), "v"
        ).select("u", "component")
        stepped = (
            labels.unionByName(prop)
            .groupBy("u")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: a label is itself a node id, so look up ITS label
        # and take the smaller — halves each node's distance to the root.
        jump = stepped.select(
            F.col("u").alias("component"), F.col("component").alias("jumped")
        )
        new_labels = (
            stepped.join(jump, "component", "left")
            .select(
                "u",
                F.least(
                    "component", F.coalesce("jumped", "component")
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.withColumnRenamed("component", "new")
            .join(labels, "u")
            .filter(F.col("new") != F.col("component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # silent partial convergence would split components downstream
        raise RuntimeError(
            f"connected_components did not converge in {MAX_CC_ITERS} "
            "iterations (pointer jumping bounds this at O(log diameter) — "
            "a graph needing 2^50 diameter is not a dedup cluster)"
        )
    return labels


register(
    "dedup_components",
    sql=f"""
    WITH RECURSIVE pairs AS ({JACCARD_SQL}),
    ed AS (SELECT doc_a AS u, doc_b AS v FROM pairs
           UNION SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT u FROM ed),
    reach AS (
      SELECT u, u AS v FROM nodes
      UNION
      SELECT r.u, ed.v FROM reach r JOIN ed ON r.v = ed.u
    )
    SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u ORDER BY u
    """,
)(dedup_components)


# --- MinHash + LSH --------------------------------------------------------

MINHASH_K = 16      # signature length
# 8 bands × 2 rows: S-curve threshold (1/b)^(1/r) ≈ 0.35, so pairs with
# true Jaccard ≥ 0.9 are caught with P ≈ 1 - (1-0.81)^8 ≈ 1 - 2e-6.
LSH_BANDS = 8
LSH_ROWS = MINHASH_K // LSH_BANDS


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=16 minhash values per doc, computed as a pure projection:
    minhash_i = array_min(transform(shingles, s → xxhash64(i, s)))."""
    sh = doc_shingles(spark, sf_dir)

    def _minhash(i: int) -> Column:
        # closure, NOT a default-arg lambda — pyspark would read a 2-arg
        # lambda as (element, index) and silently drop the seed.
        # The per-function "permutation" prepends the function index to the
        # hashed STRING: xxhash64 under different numeric seeds turned out
        # to produce correlated orderings (measured 12/16 signature
        # agreement where j=0.96 predicts 15.5/16); distinct inputs fully
        # decorrelate.
        def h(s: Column) -> Column:
            return F.xxhash64(F.concat(F.lit(f"{i}|"), s))

        return F.array_min(F.transform(F.col("shingles"), h))

    sig = F.array(*[_minhash(i) for i in range(MINHASH_K)])
    return sh.select("doc_id", sig.alias("sig"))


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: band the signature, hash each band, join on
    (band_idx, band_hash). Rows-only check (xxhash64 has no DuckDB twin);
    tests assert candidates ⊇ all pairs with Jaccard ≥ 0.5."""
    sigs = minhash_signatures(spark, sf_dir)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col("sig")[b * LSH_ROWS + r] for r in range(LSH_ROWS)]
                ).alias("bh"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    buckets = sigs.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


register("dedup_minhash_lsh")(dedup_minhash_lsh)


# --- SimHash --------------------------------------------------------------

def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc, built from per-token xxhash64 bits entirely
    with array higher-order functions: for each bit position, sum ±1 over
    token hashes; sign → bit. Rows-only (xxhash64 is Spark-specific)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(tokens_col(F.col("text")))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # bit b vote: count of tokens with bit set minus count without. One
    # aggregate per bit, assembled from a static Python loop so every
    # shift amount is a literal (shiftleft/shiftright take Python ints).
    def _vote(b: int) -> Column:
        # closure (not a default-arg lambda): pyspark HOFs require the
        # merge lambda to declare exactly its positional arity.
        def merge(acc: Column, h: Column) -> Column:
            return acc + F.when(F.shiftrightunsigned(h, b) % 2 == 1, 1).otherwise(-1)

        return F.aggregate(hashes, F.lit(0), merge)

    votes = [_vote(b) for b in range(64)]
    # assemble the signed 64-bit value in two's complement: bits 0-62 add
    # 2^b; bit 63 adds -2^63 (no long overflow possible).
    terms = [
        F.when(votes[b] > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        for b in range(63)
    ] + [
        F.when(votes[63] > 0, F.lit(-(1 << 63)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    ]
    sim = terms[0]
    for t in terms[1:]:
        sim = sim + t
    return docs.select("doc_id", sim.alias("simhash")).filter(F.size(toks) > 0)


HAMMING_MAX = 6


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 4×16-bit band LSH on the signature, then
    exact Hamming check ≤ HAMMING_MAX. Rows-only check."""
    sigs = simhash_signatures(spark, sf_dir)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (F.shiftrightunsigned(F.col("simhash"), 16 * b) % 65536).alias("bh"),
            )
            for b in range(4)
        ]
    )
    buckets = sigs.select("doc_id", "simhash", F.explode(bands).alias("b")).select(
        "doc_id", "simhash", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= HAMMING_MAX)
        .orderBy("doc_a", "doc_b")
    )


register("dedup_simhash")(dedup_simhash)


# The keep-one-per-cluster stage: corpus minus non-representative members
# of each near-dup component. Composition: components (iterative) →
# non-representatives (component != doc_id) → broadcast anti-join against
# the corpus. At 100 TB the removal set is |near-dup docs| ≪ |corpus| and
# broadcasts; the corpus side never shuffles.
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    comp = dedup_components(spark, sf_dir)
    losers = comp.filter(F.col("component") != F.col("doc_id")).select("doc_id")
    return (
        docs.join(F.broadcast(losers), "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


register(
    "dedup_survivors",
    sql=f"""
    WITH RECURSIVE pairs AS ({JACCARD_SQL}),
    ed AS (SELECT doc_a AS u, doc_b AS v FROM pairs
           UNION SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT u FROM ed),
    reach AS (
      SELECT u, u AS v FROM nodes
      UNION
      SELECT r.u, ed.v FROM reach r JOIN ed ON r.v = ed.u
    ),
    comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM comp c
                      WHERE c.doc_id = d.doc_id AND c.component <> c.doc_id)
    ORDER BY d.doc_id
    """,
)(dedup_survivors)


# Skew-capped Jaccard: identical pipeline, but shingle buckets larger than
# STOP_SHINGLE_CAP are dropped BEFORE pair generation — the documented
# mitigation for the k² pair blow-up of stop-shingles at 100 TB, as real
# oracle-checked code. `shared` counts only rare shingles, so the score
# is a lower bound of true Jaccard; a pair is missed only if ALL its
# shared shingles are stop-shingles (near-dups share many rare shingles).
STOP_SHINGLE_CAP = 20


def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = doc_shingles(spark, sf_dir)
    n_sh = F.size("shingles")
    fits = (n_sh < F.lit(1 << 20)) & (F.col("doc_id") < F.lit(1 << 43))
    packed = (
        F.when(fits, F.shiftleft(F.col("doc_id"), 20) + n_sh)
        .otherwise(
            F.raise_error(
                F.lit("dedup_ngram_jaccard_capped: packing range exceeded")
            ).cast("long")
        )
        .alias("dn")
    )
    inv = sh.select(packed, F.explode("shingles").alias("shingle")).select(
        "dn", F.xxhash64("shingle").alias("skey")
    )
    buckets = (
        inv.groupBy("skey")
        .agg(F.collect_list("dn").alias("ds"))
        .filter(F.size("ds").between(2, STOP_SHINGLE_CAP))  # the skew cap
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x: F.filter(
                F.transform(
                    F.col("ds"), lambda y: F.struct(x.alias("pa"), y.alias("pb"))
                ),
                lambda p: p["pa"] < p["pb"],
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pairs_arr).alias("p"))
        .groupBy("p.pa", "p.pb")
        .agg(F.count("*").alias("shared"))
    )
    unpacked = pairs.select(
        F.shiftrightunsigned("pa", 20).alias("doc_a"),
        (F.col("pa") % (1 << 20)).alias("na"),
        F.shiftrightunsigned("pb", 20).alias("doc_b"),
        (F.col("pb") % (1 << 20)).alias("nb"),
        "shared",
    )
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        unpacked.withColumn("jaccard_lb", F.round(jac, 6))
        .filter(F.col("jaccard_lb") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "shared", "jaccard_lb")
    )


register(
    "dedup_ngram_jaccard_capped",
    sql=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, len(shingles) AS n_shingles FROM sh),
    rare AS (SELECT shingle FROM inv GROUP BY shingle
             HAVING count(*) BETWEEN 2 AND {STOP_SHINGLE_CAP}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM inv a
      JOIN rare r ON r.shingle = a.shingle
      JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, shared,
           round(shared * 1.0 / (sa.n_shingles + sb.n_shingles - shared), 6)
             AS jaccard_lb
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(shared * 1.0 / (sa.n_shingles + sb.n_shingles - shared), 6)
          >= {JACCARD_THRESHOLD}
    """,
)(dedup_ngram_jaccard_capped)
