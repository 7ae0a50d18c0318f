"""Deduplication operator family for large-scale training-data pipelines:
exact (content-hash), MinHash+LSH banding, SimHash, and n-gram Jaccard.

All hashing is built from one cross-engine-deterministic primitive —
``H31(s) = int(md5(s)[:15 hex], 16) % (2^31-1)`` — computable identically
in Spark (conv/substring/md5), DuckDB (hex-literal cast), and Python
(hashlib), so every dedup query has an exact SQL oracle.

Everything runs JVM-side through built-in higher-order functions
(transform/aggregate/slice) — no Python UDFs, no driver materialization.

Scale design (100 TB):
- Shingling + signatures are narrow per-row map work (no shuffle).
- LSH banding turns the quadratic all-pairs problem into an equi-join on
  (band_idx, band_key): one shuffle, AQE-skew-splittable. Candidate
  verification touches only same-bucket pairs.
- Exact dedup is a keyed window (single shuffle on the content hash),
  never a full-row ``distinct()`` (reference anti-pattern SURVEY §4.4).
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from mle_proj_datapipeline_spark.session import ensure_parallelism

P31 = (1 << 31) - 1  # Mersenne prime 2^31-1: modmul products stay < 2^62

# MinHash family h_i(x) = (A[i]*x + B[i]) mod P31 — fixed odd multipliers /
# offsets, embedded verbatim in the SQL oracles. 16 hashes = 4 bands × 4 rows
# → LSH S-curve threshold (1/4)^(1/4) ≈ 0.71.
NUM_HASHES = 16
LSH_BANDS = 4
LSH_ROWS = NUM_HASHES // LSH_BANDS
MINHASH_A = [2 * i + 3 for i in range(1, NUM_HASHES + 1)]
MINHASH_B = [7919 * i + 104729 for i in range(NUM_HASHES)]


def lsh_geometry_for(
    threshold: float, max_hashes: int = 256
) -> tuple[int, int, int]:
    """(bands, rows, n_hashes) whose S-curve midpoint (1/b)^(1/r) sits
    closest to the target Jaccard ``threshold`` — the production sizing
    rule the fixed 4x4 test geometry stands in for (its midpoint ~0.71
    was hand-picked for oracle-verifiable fixtures; at 100 TB you derive
    the geometry from the dedup threshold, not the other way around).

    Search is over b*r <= max_hashes with b, r >= 2: more hashes sharpen
    the S-curve (fewer false positives into the verify stage AND fewer
    false negatives) at linearly more signature compute; callers cap
    max_hashes by their compute budget. Deterministic tie-break: closer
    midpoint, then fewer hashes, then more bands (recall over
    precision)."""
    if not 0.05 <= threshold <= 0.95:
        raise ValueError(f"threshold {threshold} outside sane dedup range")
    best_key: tuple[float, int, int] | None = None
    best_geom = (0, 0, 0)
    for b in range(2, max_hashes // 2 + 1):
        for r in range(2, max_hashes // b + 1):
            mid = (1.0 / b) ** (1.0 / r)
            key = (abs(mid - threshold), b * r, -b)
            if best_key is None or key < best_key:
                best_key, best_geom = key, (b, r, b * r)
    assert best_key is not None
    return best_geom

# SimHash geometry: the md5-derived token hash carries 60 usable bits
# (15 hex digits), split into 4 blocks of 15 bits for pigeonhole candidate
# generation (guarantees recall for hamming ≤ 3).
SIMHASH_BITS = 60
SIMHASH_BLOCKS = 4
SIMHASH_BLOCK_BITS = 15


def h31_py(s: str) -> int:
    """Python twin of the Spark/DuckDB H31 hash (for plane generation)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P31


def h31(c: Column | str) -> Column:
    """31-bit md5-derived hash, identical across Spark/DuckDB/Python."""
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % F.lit(P31)


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams. 1-based slice matches DuckDB list_slice."""
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(col, " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
    )


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


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over distinct-element arrays, double division parity."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


def exact_dedup(df: DataFrame, content_col: str, order_cols: list[str]) -> DataFrame:
    """Keep-first exact dedup: one shuffle keyed on md5(content), window
    rank by ``order_cols`` — deterministic, unlike dropDuplicates."""
    w = Window.partitionBy(F.md5(F.col(content_col))).orderBy(*[F.asc(c) for c in order_cols])
    return df.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") == 1).drop("__rk")


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


LEN_BAND_WIDTH = 16  # tokens per length band in the composite block key


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
    full-corpus pairs == old-corpus pairs ∪ delta pairs."""
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
    new_base = materialize_frame(
        minhash_signature_table(new_docs, id_col, text_col, shingle_k).join(
            old_base.select("doc"), "doc", "left_anti"
        )
    )
    all_base = old_base.unionByName(new_base)

    def banded(base: DataFrame, side: str) -> DataFrame:
        return base.select("doc", F.explode("bands").alias("b")).select(
            F.col("doc").alias(side), F.col("b.band_idx").alias("band_idx"),
            F.col("b.band_key").alias("band_key"),
        )

    cand = (
        banded(new_base, "id_n").join(banded(all_base, "id_o"), ["band_idx", "band_key"])
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
    write_snapshot(new_base, signature_root, mode="append")
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
    block_expr: Column | None = None,
    len_band_width: int | None = LEN_BAND_WIDTH,
    max_block: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs within blocks.

    Default block key is COMPOSITE: (first-k-token prefix, token-count
    band of ``len_band_width``). The prefix alone has unbounded skew — a
    boilerplate prefix ("the quick …" across a scraped corpus) collects
    a hot block whose within-block join is quadratic. The length band
    splits such a block by size, and near-dups can't straddle many
    bands: Jaccard ≥ 0.5 forces |A|/|B| ∈ [0.5, 2], so same-length-ish
    docs land together (boundary-adjacent pairs are the documented
    recall cost of any blocking key).

    ``max_block`` is the hard skew guard: blocks still exceeding the cap
    are DROPPED (not exploded) — at corpus scale an over-cap block is
    template/boilerplate text whose pairs belong to exact dedup, and a
    single hot block must never hold the job hostage. The cap is part of
    the operator's declared semantics (the SQL oracle applies the same
    HAVING), not a silent truncation.

    The block key is computed from the raw token sequence, not the
    distinct shingle array — distinct-array order is engine-specific."""
    toks = F.split(F.col(text_col), " ")
    if block_expr is not None:
        block = block_expr
    else:
        prefix = F.array_join(F.slice(toks, 1, shingle_k), " ")
        if len_band_width:
            block = F.concat_ws(
                "|",
                prefix,
                F.floor(F.size(toks) / F.lit(float(len_band_width))).cast("long").cast("string"),
            )
        else:
            block = prefix
    blocked = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col).alias("doc"),
        word_shingles(F.col(text_col), shingle_k).alias("sh"),
        block.alias("blk"),
    ).localCheckpoint()  # shingle once, not once per self-join side
    if max_block:
        wb = Window.partitionBy("blk")
        blocked = (
            blocked.withColumn("__bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bn") <= max_block)
            .drop("__bn")
        )
    a = blocked.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"), "blk")
    b = blocked.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(text_col: str, bits: int = SIMHASH_BITS) -> Column:
    """SimHash fingerprint over word-token hashes (with multiplicity):
    bit j = 1 iff Σ_tokens (±1 by bit j of H60(token)) > 0.

    One md5 per token: a single fold accumulates the per-bit vote array
    (vs. one fold per bit, which would re-hash every token ``bits``
    times). Expressed as SQL because shiftright needs a lambda-variable
    shift amount. Takes a column NAME."""
    votes = (
        "aggregate("
        f"transform(split({text_col}, ' '), t -> cast(conv(substring(md5(t),1,15),16,10) as bigint)), "
        f"array_repeat(0L, {bits}), "
        f"(acc, x) -> transform(sequence(0, {bits - 1}), "
        "j -> element_at(acc, j+1) + IF((shiftright(x, j) & 1) = 1, 1L, -1L)))"
    )
    # Bind the votes array ONCE via a 1-element-array fold — inlining it
    # into the per-bit lambda would re-run the whole token fold per bit.
    return F.expr(
        f"aggregate(array({votes}), 0L, (acc, v) -> acc + "
        f"aggregate(transform(sequence(0, {bits - 1}), "
        "j -> IF(element_at(v, j+1) > 0, shiftleft(1L, j), 0L)), "
        "0L, (a, b) -> a + b))"
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    broadcast_nodes_max: int = 1_000_000,
    driver_max_edges: int = 100_000,
) -> DataFrame:
    """Connected components over an undirected pair list by min-label
    propagation: every node repeatedly takes the smallest component id
    among itself and its neighbors until a fixpoint. Returns
    ``(node, comp)`` with ``comp`` = smallest node id in the component.

    This turns near-dup PAIRS (MinHash/SimHash output) into near-dup
    CLUSTERS — the form a training-data pipeline actually consumes
    (keep one canonical doc per cluster).

    Scale design (100 TB):
    - Each round is one equi-join shuffle + one partial-aggregated
      groupBy on node id — no driver materialization; the per-round
      convergence probe is ``limit(1).count()`` (stops at first diff).
    - ``localCheckpoint`` truncates lineage so the physical plan stays
      constant-size across rounds instead of doubling.
    - Rounds are bounded by component diameter. LSH near-dup graphs are
      unions of near-cliques (bucket co-membership), so 2-3 rounds in
      practice; for adversarial chain graphs swap in alternating
      large-star/small-star (same join primitive, O(log^2 n) rounds).
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    # Small-graph arm: below the gate, per-round shuffle/checkpoint
    # overhead dwarfs the work — one driver union-find replaces the
    # whole iteration (operators/cc_local.py; same canonical labels).
    if driver_max_edges and edges.count() <= driver_max_edges:
        from mle_proj_datapipeline_spark.operators.cc_local import union_find_labels

        return union_find_labels(edges, "a", "b")
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    # Label/min frames are node-sized; checkpointed frames carry no
    # size stats, so without a hint Catalyst reshuffles the EDGE list
    # against them every round. One |V| count decides: small graphs
    # broadcast the node-keyed side of every per-round join (edges are
    # materialized once, never reshuffled), big graphs keep plain
    # shuffle joins — identical results either way.
    small_graph = labels.count() <= broadcast_nodes_max

    def hint(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small_graph else df

    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                hint(labels.select(F.col("node").alias("b"), F.col("comp").alias("bc"))),
                "b",
            )
            .groupBy("a")
            .agg(F.min("bc").alias("nbr_comp"))
            .select(F.col("a").alias("node"), "nbr_comp")
        )
        updated = (
            labels.join(hint(nbr_min), "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.join(hint(labels.select("node", F.col("comp").alias("old"))), "node")
            .filter(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    stats: dict | None = None,
    snapshot_root: str | None = None,
    broadcast_nodes_max: int = 1_000_000,
    driver_max_edges: int = 100_000,
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond" — public algorithm): converges in O(log² n) rounds on ANY
    graph shape, including the long chains where plain min-label
    propagation needs O(diameter) rounds.

    large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u}).
    small-star(u): connect every neighbor v < u, and u itself, to m.
    At the fixpoint the edge set is a union of stars centered on each
    component's minimum node; labels read off as min(neighbor ∪ self).

    Per round: one groupBy-min on node (map-side combinable) + one
    equi-join + distinct — same primitives as the label-prop kernel, so
    the 100 TB shuffle story is unchanged; only the ROUND COUNT bound
    improves. ``stats['rounds']`` reports rounds used (tested ≤ ~log² n
    on an adversarial path graph). Returns (node, comp).

    ``snapshot_root``: per-round edge sets commit to the snapshot layer
    instead of executor-local ``localCheckpoint`` — the durable path
    for long cluster runs (a lost executor costs one round, not the
    whole iteration history); result-identical (tested)."""

    def cut(df: DataFrame, tag: str, rnd: int) -> DataFrame:
        from mle_proj_datapipeline_spark.sources.snapshots import materialize_frame

        root = f"{snapshot_root}/{tag}_r{rnd}" if snapshot_root else None
        return materialize_frame(df, root)

    def sym(e: DataFrame) -> DataFrame:
        return (
            e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .dropDuplicates(["u", "v"])
        )

    def mins_of(e: DataFrame) -> DataFrame:
        return e.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))

    raw = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = cut(
        raw.select("u").union(raw.select(F.col("v").alias("u"))).distinct(), "nodes", 0
    )
    edges = cut(sym(raw), "edges", 0)
    edge_count = edges.count()
    # Small-graph arm: the edge count is already in hand for the
    # convergence probe; below the gate, one driver union-find replaces
    # the whole round loop (operators/cc_local.py — same canonical
    # labels, microseconds at this size). Self-loop-only nodes still
    # come back as singletons through the final nodes join.
    if driver_max_edges and edge_count <= driver_max_edges:
        from mle_proj_datapipeline_spark.operators.cc_local import union_find_labels

        if stats is not None:
            stats["rounds"] = 0
            stats["mode"] = "driver-union-find"
        lbl = union_find_labels(edges, "u", "v").withColumnRenamed("node", "u")
        return nodes.join(lbl, "u", "left").select(
            F.col("u").alias("node"), F.coalesce("comp", F.col("u")).alias("comp")
        )
    if stats is not None:
        stats["mode"] = "star"
    # Per-round min frames are node-sized; materialized frames carry no
    # size stats, so hint them (same gate as connected_components) to
    # keep the edge set from reshuffling every round on small graphs.
    small_graph = nodes.count() <= broadcast_nodes_max

    def hint(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small_graph else df

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star
        m = mins_of(edges)
        j = edges.join(hint(m), "u")
        large = cut(
            sym(
                j.filter(F.col("v") > F.col("u")).select(
                    F.col("v").alias("u"), F.col("m").alias("v")
                )
            ),
            "large",
            rounds,
        )
        # small-star
        m2 = mins_of(large)
        j2 = large.join(hint(m2), "u")
        small = cut(
            sym(
                j2.filter(F.col("v") < F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .unionByName(m2.select("u", F.col("m").alias("v")))
            ),
            "small",
            rounds,
        )
        # One count per round (the previous round's count is carried);
        # the exact exceptAll probe runs only when counts already agree.
        small_count = small.count()
        unchanged = (
            small_count == edge_count
            and small.exceptAll(edges).limit(1).count() == 0
        )
        edges, edge_count = small, small_count
        if unchanged:
            break
    if stats is not None:
        stats["rounds"] = rounds
    labels = edges.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("comp"))
    # Nodes seen only in self-loops never enter the (self-loop-free)
    # edge set — they are their own singleton component.
    return nodes.join(labels, "u", "left").select(
        F.col("u").alias("node"), F.coalesce("comp", F.col("u")).alias("comp")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via block LSH:
    fingerprints within hamming d ≤ SIMHASH_BLOCKS-1 share at least one
    of the 15-bit blocks (pigeonhole), so candidates = equi-join per
    block. 15-bit keys (32k values) keep buckets sparse.

    ``materialize``: compute the 60-bit fingerprint fold once instead of
    once per self-join side (see minhash_lsh_pairs)."""
    base = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col).alias("doc"), simhash(text_col).alias("fp")
    )
    if materialize:
        base = base.localCheckpoint()
    blocks = base.select(
        "doc",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("blk_idx"),
                        F.shiftright(F.col("fp"), SIMHASH_BLOCK_BITS * k)
                        .bitwiseAND(F.lit((1 << SIMHASH_BLOCK_BITS) - 1))
                        .alias("blk_key"),
                    )
                    for k in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("blk"),
    ).select("doc", "fp", "blk.blk_idx", "blk.blk_key")
    a = blocks.select(F.col("doc").alias("id_a"), F.col("fp").alias("fp_a"), "blk_idx", "blk_key")
    b = blocks.select(F.col("doc").alias("id_b"), F.col("fp").alias("fp_b"), "blk_idx", "blk_key")
    return (
        a.join(b, ["blk_idx", "blk_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
