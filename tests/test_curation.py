"""Property tests for the corpus-curation planners (curation.py) —
cross-engine value parity is covered by test_oracle_parity; these pin
the semantic invariants the oracle can't express."""

import math

from pyspark.sql import functions as F


def test_train_eval_split_stable_and_near_target(spark, sf_dir):
    """The split is deterministic (same bucket on re-run) and lands
    within a loose tolerance of the 90/10 target."""
    from app_fastdata_spark.operators.curation import (
        SPLIT_TRAIN_PCT,
        doc_train_eval_split,
    )

    a = {r.doc_id: (r.bucket, r.split) for r in doc_train_eval_split(spark, sf_dir).collect()}
    b = {r.doc_id: (r.bucket, r.split) for r in doc_train_eval_split(spark, sf_dir).collect()}
    assert a == b
    n = len(a)
    train = sum(1 for _, s in a.values() if s == "train")
    assert abs(train / n - SPLIT_TRAIN_PCT / 100) < 0.1
    assert all(
        (b < SPLIT_TRAIN_PCT) == (s == "train") for b, s in a.values()
    )


def test_char_entropy_bounds(spark, sf_dir):
    """0 <= H <= log2(alphabet size); uniform-ish text lands high,
    single-char spam lands at 0."""
    from app_fastdata_spark.operators.curation import doc_char_entropy

    rows = doc_char_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.char_entropy <= math.log2(max(r.n_chars, 2)) + 1e-9
    spam = spark.createDataFrame(
        [(1, "aaaaaaaa", "en", "s", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spam.write.parquet(f"{d}/documents.parquet")
        got = doc_char_entropy(spark, d).collect()
        assert got[0].char_entropy == 0.0


def test_seq_packing_monotone_and_bounded(spark, sf_dir):
    """Within each (lang, source) shard: seq_id is non-decreasing in
    doc_id, starts at 0, and each doc's start offset is inside its
    sequence's window."""
    from app_fastdata_spark.operators.curation import SEQ_LEN, doc_seq_packing

    rows = doc_seq_packing(spark, sf_dir).collect()
    shards = {}
    for r in rows:
        shards.setdefault((r.lang, r.source), []).append(r)
    assert shards
    for docs in shards.values():
        docs.sort(key=lambda r: r.doc_id)
        start = 0
        prev_seq = 0
        for r in docs:
            assert r.seq_id == start // SEQ_LEN
            assert r.seq_id >= prev_seq
            prev_seq = r.seq_id
            start += r.n_tokens


def test_mixture_weights_rebalance_to_target(spark, sf_dir):
    """Applying the weights makes every language's weighted token share
    equal the uniform target."""
    from app_fastdata_spark.operators.curation import (
        LANG_TARGET_FRAC,
        doc_mixture_weights,
    )

    df = doc_mixture_weights(spark, sf_dir)
    total = df.agg(F.sum("n_tokens")).first()[0]
    weighted = (
        df.groupBy("lang")
        .agg(F.sum(F.col("n_tokens") * F.col("resample_weight")).alias("wt"))
        .collect()
    )
    for r in weighted:
        assert abs(r.wt / total - LANG_TARGET_FRAC) < 1e-3, r
    fracs = df.agg(F.round(F.sum("token_frac"), 3)).first()[0]
    assert abs(fracs - 1.0) < 5e-3


def test_lm_score_flags_repeated_text_as_predictable(spark, sf_dir, tmp_path):
    """A doc that is one phrase repeated scores near 0 bits (every
    bigram deterministic given the corpus LM built from it); the normal
    corpus averages well above 0."""
    from app_fastdata_spark.operators.curation import doc_lm_score

    rows = doc_lm_score(spark, sf_dir).collect()
    assert rows and all(r.lm_bits >= 0 for r in rows)
    corpus_avg = sum(r.lm_bits for r in rows) / len(rows)
    assert corpus_avg > 0.5
    spam = spark.createDataFrame(
        [(1, "ab cd " * 50, "en", "s", 300), (2, "ab cd ef gh", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    spam.write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: r.lm_bits for r in doc_lm_score(spark, str(tmp_path)).collect()}
    # doc 1's bigrams are almost all ('ab','cd')/('cd','ab') — highly
    # predictable under the joint LM; doc 2 shares only 'ab cd'
    assert got[1] < got[2]


def test_global_shuffle_is_a_permutation(spark, sf_dir):
    """(shard, pos) is a true reproducible shuffle: every doc appears
    exactly once, each shard's positions are dense 1..len(shard),
    identical on re-run, and the shard→doc assignment is not corpus-order
    (adjacent doc_ids land in different shards)."""
    from app_fastdata_spark.operators.curation import (
        N_SHUFFLE_SHARDS,
        doc_global_shuffle,
    )
    from app_fastdata_spark.tables import load_table

    rows = doc_global_shuffle(spark, sf_dir).collect()
    again = doc_global_shuffle(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_shard: dict = {}
    for r in rows:
        assert 0 <= r.shard < N_SHUFFLE_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # decorrelated from corpus order: consecutive doc_ids mostly change shard
    shard_of = {r.doc_id: r.shard for r in rows}
    ids = sorted(shard_of)
    same = sum(shard_of[a] == shard_of[b] for a, b in zip(ids, ids[1:]))
    assert same / (len(ids) - 1) < 0.5


def test_cluster_balanced_sample_caps_every_cluster(spark, sf_dir):
    """Per-cluster contribution is capped; undersubscribed clusters keep
    every member; the sample is a subset of the full assignment."""
    from app_fastdata_spark.ml.kmeans import assign_to_seed_centroids
    from app_fastdata_spark.operators.curation import (
        CLUSTER_SAMPLE_CAP,
        doc_cluster_balanced_sample,
    )
    from app_fastdata_spark.tables import load_table

    full = {
        (r.vec_id, r.cluster_id)
        for r in assign_to_seed_centroids(
            load_table(spark, sf_dir, "embeddings")
        ).select("vec_id", "cluster_id").collect()
    }
    sizes: dict[int, int] = {}
    for _, c in full:
        sizes[c] = sizes.get(c, 0) + 1
    sampled = doc_cluster_balanced_sample(spark, sf_dir).collect()
    assert {(r.vec_id, r.cluster_id) for r in sampled} <= full
    per = {}
    for r in sampled:
        per[r.cluster_id] = per.get(r.cluster_id, 0) + 1
    for c, n in per.items():
        assert n == min(CLUSTER_SAMPLE_CAP, sizes[c]), (c, n, sizes[c])
    assert set(per) == set(sizes)


def test_dsir_weights_tilt_toward_target(spark, sf_dir):
    """The importance weight must separate the slices it was fit on:
    mean log-likelihood ratio of target (quality-passing) docs exceeds
    the mean over non-target docs, and every weight is finite."""
    import math

    from app_fastdata_spark.operators.curation import doc_dsir_weights
    from app_fastdata_spark.operators.textops import doc_quality

    w = {r.doc_id: r.log_importance for r in doc_dsir_weights(spark, sf_dir).collect()}
    assert all(math.isfinite(v) for v in w.values())
    passes = {r.doc_id: r.passes_quality for r in doc_quality(spark, sf_dir).collect()}
    tgt = [w[d] for d in w if passes[d]]
    raw = [w[d] for d in w if not passes[d]]
    assert tgt and raw
    assert sum(tgt) / len(tgt) > sum(raw) / len(raw)
