"""Behavior of the incremental MinHash-LSH near-dup store
(operators/dedup.incremental_minhash_dedup): within-batch survivor
selection, cross-batch signature-agreement drops, and epoch-retry
idempotence (the exactly-once layout shared with the exact store)."""


def test_incremental_minhash_two_batches(spark, tmp_path):
    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    b1 = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (
                50,
                "completely different words about astronomy telescopes "
                "galaxies and nebulae for everyone",
            ),
        ],
        "doc_id long, text string",
    )
    store = str(tmp_path / "mh_store")
    s1, _ = incremental_minhash_dedup(b1, store, batch_id="e1")
    # 1 and 2 are near-dups -> min id 1 survives; 50 distinct
    assert sorted(r.doc_id for r in s1.collect()) == [1, 50]

    b2 = spark.createDataFrame(
        [
            (101, base),
            (
                102,
                "fresh unseen content regarding oceanic currents tides "
                "marine biology and coral reef ecosystems",
            ),
        ],
        "doc_id long, text string",
    )
    s2, store_df = incremental_minhash_dedup(b2, store, batch_id="e2")
    # 101 matches stored doc 1's signatures -> dropped; 102 novel
    assert sorted(r.doc_id for r in s2.collect()) == [102]
    assert sorted(r.doc_id for r in store_df.collect()) == [1, 50, 102]


def test_incremental_minhash_retry_idempotent(spark, tmp_path):
    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    docs = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "mh_store2")
    incremental_minhash_dedup(docs, store, batch_id="e9")
    # retried epoch overwrites itself: doc still a survivor (a crashed
    # prior attempt must not mark the batch's own docs already-seen),
    # and the store holds one copy
    s_b, store_df = incremental_minhash_dedup(docs, store, batch_id="e9")
    assert [r.doc_id for r in s_b.collect()] == [7]
    assert [r.doc_id for r in store_df.collect()] == [7]


def test_incremental_minhash_rejects_layout_mix(spark, tmp_path):
    import pytest

    from mapreducemovieanalysis_cloud_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "mh_store3")
    incremental_minhash_dedup(docs, store, batch_id="e1")
    with pytest.raises(ValueError, match="epoch"):
        incremental_minhash_dedup(docs, store, batch_id=None)
