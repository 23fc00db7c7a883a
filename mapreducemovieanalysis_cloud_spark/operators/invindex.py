"""Persistent inverted index over a document corpus: build once, probe
per query without rescanning the corpus.

The reference has no retrieval surface at all (its only text handling is
the CSV split in ``MovieRank.java:58``); this is part of the engine's
north-star text-analysis family. The scan-time scorer (``bm25_rank``,
operators/ranking.py) recomputes tokenization per query — the right
shape for one-off scoring, the wrong one for a query workload. This
module materializes the classic search-engine layout once:

- ``<path>/postings``  — (term, doc_id, tf, positions), hash-bucketed by
  term into ``N_BUCKETS`` partition DIRECTORIES and term-sorted within
  each file.  A probe for |Q| terms statically prunes to ≤ |Q| bucket
  directories (directory-level partition pruning), and the pushed
  ``term IN (...)`` filter row-group-prunes within them via the sorted
  footer min/max — the same two-level skipping story as the stored IVF
  index (operators/similarity.py) and the z-order layout
  (sources/writers.py).  ``positions`` (1-based token indexes) makes
  the index POSITIONAL: phrase queries intersect adjacent-position
  posting lists without touching the corpus; non-positional probes
  (BM25) never read the column — parquet column pruning skips it.
- ``<path>/doclen``    — (doc_id, dl): the per-doc length normalizer.
- ``<path>/stats``     — one row (n_docs_total, sum_dl).

Probe cost at 100 TB: the corpus is never touched — the scan reads
~|Q| / N_BUCKETS of the postings table, df for the query terms is a
grouped count over those pruned postings, corpus stats are a one-row
broadcast, and the score tree is shared verbatim with the scan-time
path (``ranking.bm25_from_tables``), so index and direct scoring are
bit-identical against the same oracle SQL.

Write-once / probe-many lifecycle shared with: stored IVF cells
(pq.py), the linkage blocking index (linkage.py), the incremental-dedup
fingerprint store (dedup.py), and the incremental-MV base (mv).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.text import tokens
from mapreducemovieanalysis_cloud_spark.operators.ranking import (
    bm25_from_tables,
)

N_BUCKETS = 64  # default for new builds; the layout's actual count is
# stored in <path>/meta and probes always read it from there, so an
# index built with any bucket count (scaled to corpus vocabulary:
# ~vocab_rows / target_bucket_rows) probes correctly — the bucket
# count is a property of the LAYOUT, not a constant the reader must
# guess (the round-1 fixed-bucket lesson, applied to storage).


def _bucket(col: str, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets))


def _postings(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclen) for a batch of docs — one tokenize pass
    (localCheckpoint so the explode runs once)."""
    toked = docs.select(
        F.col(id_col), tokens(text_col).alias("__t")
    ).localCheckpoint(eager=False)
    dl = toked.select(F.col(id_col), F.size("__t").alias("dl"))
    tf = (
        toked.select(
            F.col(id_col), F.posexplode("__t").alias("__p0", "term")
        )
        .groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            # 1-based, sorted: posexplode is 0-based
            F.sort_array(F.collect_list(F.col("__p0") + 1)).alias(
                "positions"
            ),
        )
    )
    return tf, dl


def _write_postings(
    tf: DataFrame, path: str, mode: str, n_buckets: int
) -> None:
    """Postings repartition to one file per term-hash bucket and sort by
    term within the file, so every parquet row group carries a tight
    term min/max for skipping."""
    (
        tf.withColumn("bucket", _bucket("term", n_buckets))
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )


def build_inverted_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> None:
    """Materialize the three-part index layout at ``path``.

    ``n_buckets`` is recorded in ``<path>/meta``; every probe and
    maintenance op reads it from there, so build-time and probe-time can
    never disagree on the partitioning function."""
    tf, dl = _postings(docs, id_col, text_col)
    spark = docs.sparkSession
    spark.createDataFrame(
        [(int(n_buckets), 2)], "n_buckets int, format_version int"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    dl.write.mode("overwrite").parquet(f"{path}/doclen")
    dl.agg(
        F.count(F.lit(1)).alias("n_docs_total"),
        F.sum("dl").alias("sum_dl"),
    ).write.mode("overwrite").parquet(f"{path}/stats")
    _write_postings(tf, path, "overwrite", n_buckets)


def append_to_inverted_index(
    docs: DataFrame,
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental maintenance: index a NEW batch of docs into the
    existing layout without touching the already-indexed corpus — the
    postings and doclen batches APPEND as new files inside the same
    bucket directories (probes see the union automatically; df/tf are
    per-(doc, term) rows, so counts simply accumulate), and the one-row
    stats table is the only rewrite, updated from its previous value
    plus the batch delta (never recomputed from the corpus).

    Contract: batch doc ids must be new (route re-ingests through the
    incremental exact-dedup store first, operators/dedup.py) — the same
    append-only discipline as the persistent fingerprint store and the
    linkage blocking index.
    """
    tf, dl = _postings(docs, id_col, text_col)
    nb = layout_buckets(spark, path)
    old = spark.read.parquet(f"{path}/stats").collect()[0]
    dl.write.mode("append").parquet(f"{path}/doclen")
    delta = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    _write_postings(tf, path, "append", nb)
    spark.createDataFrame(
        [
            (
                old.n_docs_total + delta.n,
                old.sum_dl + (delta.s or 0),
            )
        ],
        "n_docs_total bigint, sum_dl bigint",
    ).write.mode("overwrite").parquet(f"{path}/stats")


def compact_inverted_index(spark: SparkSession, path: str) -> None:
    """Offline compaction after a run of appends: rewrite the postings
    back to one term-sorted file per bucket (appends accumulate one file
    per batch per bucket, which erodes the row-group min/max skipping
    the probe relies on).  Same offline-compaction lifecycle as the
    incremental-MV delta directories (streaming/mv.py).  Read-modify-
    write through a temp subtree then swap, so a concurrent probe never
    sees a half-written layout; doclen/stats are untouched.
    """
    import shutil
    import tempfile as _tf

    cur = spark.read.parquet(f"{path}/postings")
    nb = layout_buckets(spark, path)
    tmp = _tf.mkdtemp(dir=path, prefix="__compact_")
    (
        cur.repartition(nb, "bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{tmp}/postings")
    )
    shutil.rmtree(f"{path}/postings")
    shutil.move(f"{tmp}/postings", f"{path}/postings")
    shutil.rmtree(tmp, ignore_errors=True)


def layout_buckets(spark: SparkSession, path: str) -> int:
    """The layout's bucket count, from ``<path>/meta`` (one row)."""
    return spark.read.parquet(f"{path}/meta").collect()[0].n_buckets


def query_term_buckets(
    spark: SparkSession, terms: list[str], n_buckets: int = N_BUCKETS
) -> list[int]:
    """Bucket ids for the query terms — a |Q|-row jobs whose collect is
    bounded by the query size (the same defensible driver-side set as
    the IVF probe-cell collect, similarity.py), buying STATIC partition
    pruning on the postings read."""
    tdf = spark.createDataFrame([(t,) for t in terms], ["term"])
    return sorted(
        r.b
        for r in tdf.select(
            _bucket("term", n_buckets).alias("b")
        ).distinct().collect()
    )


def read_postings(
    spark: SparkSession,
    path: str,
    terms: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """The pruned postings scan: bucket partition-pruning + pushed term
    filter (bucket count read from the layout's meta)."""
    buckets = query_term_buckets(spark, terms, layout_buckets(spark, path))
    return (
        spark.read.parquet(f"{path}/postings")
        .where(F.col("bucket").isin(buckets))
        .where(F.col("term").isin(terms))
        .select(F.col(id_col), "term", "tf")
    )


def phrase_query_index(
    spark: SparkSession,
    path: str,
    phrase: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase retrieval from the POSITIONAL index: docs where the
    tokens of ``phrase`` occur consecutively, with the exact occurrence
    count — computed entirely from posting lists (the corpus is never
    read).

    The RAREST phrase term (min document frequency over the pruned
    postings — a |phrase|-row bounded collect, like the bucket lookup)
    anchors: its positions explode to anchor candidates, and every other
    term i keeps anchors whose relative offset it contains
    (``array_contains(pos_i, q + (i - k))``).  Anchor fan-out is the
    MINIMUM tf across the phrase's terms, not the first term's — the
    classic rarest-first posting-intersection order, chosen from the
    index's own statistics rather than by the caller.

    Scale: |phrase| pruned posting scans + |phrase| - 1 doc-keyed joins
    whose left side shrinks monotonically; no corpus scan, no window.
    """
    if len(phrase) < 2:
        raise ValueError("a phrase needs at least two terms")
    terms = sorted(set(phrase))
    post = (
        spark.read.parquet(f"{path}/postings")
        .where(
            F.col("bucket").isin(
                query_term_buckets(spark, terms, layout_buckets(spark, path))
            )
        )
        .where(F.col("term").isin(terms))
        .select(F.col(id_col), "term", "positions")
        .localCheckpoint(eager=False)
    )
    df_by_term = {
        r.term: r.df
        for r in post.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    if len(df_by_term) < len(terms):
        # a phrase term absent from the corpus: no doc can match
        return post.select(F.col(id_col)).limit(0).select(
            F.col(id_col), F.lit(0).cast("long").alias("n_occurrences")
        )
    k = min(range(len(phrase)), key=lambda i: df_by_term[phrase[i]])
    # anchor position q = absolute position of phrase[k]; term i must
    # appear at q + (i - k)
    cur = post.where(F.col("term") == phrase[k]).select(
        F.col(id_col), F.explode("positions").alias("q")
    )
    for i, t in enumerate(phrase):
        if i == k:
            continue
        nxt = post.where(F.col("term") == t).select(
            F.col(id_col), F.col("positions").alias(f"__pos{i}")
        )
        cur = (
            cur.join(nxt, id_col)
            .where(
                F.array_contains(F.col(f"__pos{i}"), F.col("q") + (i - k))
            )
            .select(id_col, "q")
        )
    return cur.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def bm25_query_index(
    spark: SparkSession,
    path: str,
    terms: list[str],
    topk: int = 50,
    require_all: bool = False,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k from the stored index — same output contract as
    ``ranking.bm25_scores`` on the raw corpus, same score tree, without
    touching the corpus. ``require_all=True`` is the conjunctive-AND
    retrieval mode (docs must contain every query term)."""
    tf = read_postings(spark, path, terms, id_col)
    dl = spark.read.parquet(f"{path}/doclen")
    stats = spark.read.parquet(f"{path}/stats")
    return bm25_from_tables(
        tf,
        dl,
        stats,
        topk=topk,
        id_col=id_col,
        n_terms_required=len(terms) if require_all else None,
    )
