"""Unit tests for corpus-curation operators: known-value repetition
metrics, contamination flags, and packing boundary arithmetic (the
oracle tests cover scale data; these pin the semantics on tiny
hand-checked inputs)."""

from __future__ import annotations

from takuan_spark.operators.curation import (
    contamination_flags,
    pack_sequences,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_repetition_stats_known_values(spark):
    docs = _docs(
        spark,
        [
            (1, "en", "a a a a"),            # dup 0.75, top bigram 'a a' 3/3
            (2, "en", "w x y z q r"),        # all distinct, 5 distinct bigrams
        ],
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["dup_word_frac"] == 0.75
    assert got[1]["top_bigram_frac"] == 1.0
    assert not got[1]["keep"]
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 0.2
    assert not got[2]["keep"]  # 0.2 > 0.1 top-bigram cap on a 6-word doc
    assert repetition_stats(docs, max_top_bigram_frac=0.5).where(
        "doc_id = 2"
    ).head()["keep"]


def test_contamination_flags_counts_shared_shingles(spark):
    train = _docs(spark, [(1, "en", "the quick brown fox jumps over the lazy dog")])
    bench = _docs(
        spark,
        [
            (2, "en", "quick brown fox jumps over everything"),  # 3 shared 3-grams
            (4, "en", "completely different words here now"),
        ],
    )
    got = contamination_flags(train, bench, n=3, min_shared=3).collect()
    assert len(got) == 1
    assert got[0]["doc_id"] == 1
    assert got[0]["n_bench_hits"] == 1
    assert got[0]["max_shared"] == 3
    # below the threshold: nothing flagged
    assert contamination_flags(train, bench, n=3, min_shared=4).count() == 0


def test_pack_sequences_boundaries(spark):
    docs = _docs(
        spark,
        [
            (1, "en", "a b c"),        # 3 tokens, cum_before 0 -> seq 0 off 0
            (2, "en", "d e f"),        # cum_before 3 -> seq 0 off 3
            (3, "en", "g h i"),        # cum_before 6 -> seq 1 off 1
            (10, "fr", "x y z w"),     # separate stratum: restarts at 0
        ],
    )
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(docs, budget=5).collect()
    }
    assert got[1] == (0, 0)
    assert got[2] == (0, 3)
    assert got[3] == (1, 1)
    assert got[10] == (0, 0)
