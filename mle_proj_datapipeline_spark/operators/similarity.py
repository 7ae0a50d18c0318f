"""Similarity search over embedding columns (array<float>).

Two strategies:
- Brute-force cosine top-k: exact, O(|Q|·|C|·dim) — the baseline, and
  correct at any scale when |Q| is small (broadcast the queries).
- LSH (random-hyperplane) bucketed top-k: sign-bit bucket per vector,
  exact rerank within bucket — the 100 TB path (one shuffle on bucket id,
  no cross join).

All arithmetic is double-precision ordered folds over the array
(zip_with + aggregate) so results are bit-identical to the DuckDB oracle
(list_reduce with the same order). Hyperplanes are derived from the
cross-engine H31 hash (operators/dedup.py), so both engines construct
the same planes.

No MLlib (per engine policy — MLlib LSH .fit() is batch-dependent, like
the reference's per-batch StringIndexer anti-pattern SURVEY §4.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from mle_proj_datapipeline_spark.operators.dedup import h31_py
from mle_proj_datapipeline_spark.session import ensure_parallelism

EMB_DIM = 64
NUM_PLANES = 8  # 2^8 = 256 buckets (single-band legacy geometry)
BANDS = 2  # multi-band LSH: union of per-band bucket candidates
PLANES_PER_BAND = 8  # 2^b buckets per band; scale with corpus (planes_per_band_for)


def hyperplanes(num_planes: int = NUM_PLANES, dim: int = EMB_DIM) -> list[list[float]]:
    """Deterministic pseudo-random planes in [-1, 1], identical in any
    engine that can compute H31 (md5-derived)."""
    return [
        [(h31_py(f"p{j}_{d}") % 2001 - 1000) / 1000.0 for d in range(dim)]
        for j in range(num_planes)
    ]


def dot_double(a: Column, b: Column) -> Column:
    """Ordered double-precision fold — deterministic across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_double(a: Column) -> Column:
    return F.sqrt(dot_double(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot_double(a, b) / (norm_double(a) * norm_double(b))


def plane_bucket(vec: Column | str, planes: list[list[float]] | None = None) -> Column:
    """Sign-bit bucket id: bit j = 1 iff dot(vec, plane_j) >= 0.

    Generated as ONE parsed SQL expression instead of ~8×64 Column
    objects — expression-tree construction over Py4J dominated wall
    clock for wide literal trees (1.3 s → ~10 ms at dim 64 × 8 planes)."""
    planes = planes or hyperplanes()
    v = vec if isinstance(vec, str) else vec._jc.toString()
    terms = []
    for j, p in enumerate(planes):
        lits = ", ".join(f"{x!r}D" for x in p)
        dot = (
            f"aggregate(zip_with({v}, array({lits}), "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)"
        )
        terms.append(f"IF({dot} >= 0, {1 << j}, 0)")
    return F.expr("(" + " + ".join(terms) + ")")


NUM_CELLS = 8
NUM_PROBES = 2


def ivf_centroids(num_cells: int = NUM_CELLS, dim: int = EMB_DIM) -> list[list[float]]:
    """Deterministic coarse-quantizer centroids (same H31 recipe as the
    hyperplanes). A production IVF would k-means these; a fixed pseudo-
    random codebook exercises the identical plan shape and keeps the SQL
    oracle exact."""
    return [
        [(h31_py(f"c{k}_{d}") % 2001 - 1000) / 1000.0 for d in range(dim)]
        for k in range(num_cells)
    ]


def _dist_sq_sql(vec: str, centroid: list[float], round_to: int | None = None) -> str:
    lits = ", ".join(f"{x!r}D" for x in centroid)
    expr = (
        f"aggregate(zip_with({vec}, array({lits}), "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "0.0D, (acc, x) -> acc + x)"
    )
    if round_to is not None:
        expr = f"round({expr}, {round_to})"
    return expr


def ivf_cell(
    vec: str,
    centroids: list[list[float]] | None = None,
    round_to: int | None = None,
) -> Column:
    """1-based id of the nearest centroid (L2; ties → lowest id).
    ``round_to`` rounds each distance first — pass the trainer's grid so
    assignment matches an oracle that argmins over rounded distances."""
    cs = centroids or ivf_centroids()
    d_arr = "array(" + ", ".join(_dist_sq_sql(vec, c, round_to) for c in cs) + ")"
    return F.expr(f"array_position({d_arr}, array_min({d_arr}))").cast("int")


def ivf_min_dist(
    vec: str,
    centroids: list[list[float]] | None = None,
    round_to: int | None = None,
) -> Column:
    """Squared L2 distance to the nearest centroid (the inertia term)."""
    cs = centroids or ivf_centroids()
    d_arr = "array(" + ", ".join(_dist_sq_sql(vec, c, round_to) for c in cs) + ")"
    return F.expr(f"array_min({d_arr})")


def ivf_probes(
    vec: str,
    centroids: list[list[float]] | None = None,
    n_probes: int = NUM_PROBES,
    round_to: int | None = None,
) -> Column:
    """Ids of the ``n_probes`` nearest cells (dist asc, id asc) — the
    query-side probe list. Struct array_sort is lexicographic in both
    Spark and DuckDB, so tie order is cross-engine identical."""
    cs = centroids or ivf_centroids()
    d_arr = "array(" + ", ".join(_dist_sq_sql(vec, c, round_to) for c in cs) + ")"
    return F.expr(
        f"transform(slice(array_sort(transform(sequence(1, {len(cs)}), "
        f"k -> struct(element_at({d_arr}, k) AS dist, k AS idx))), 1, {n_probes}), "
        "s -> CAST(s.idx AS INT))"
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """IVF approximate top-k: candidates are indexed once by nearest-
    centroid cell; each query probes its NUM_PROBES nearest cells and
    reranks exactly within them.

    Scale shape: the cell index is a narrow per-row map over the corpus
    (build once, partition by cell); the probe join is an equi-join on
    cell id — per-query work is |probed cells| not |corpus|, and the
    shuffle key is the (small-cardinality, controllably-balanced) cell
    id rather than an all-pairs cross."""
    c = ensure_parallelism(candidates.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        ivf_cell(vec_col).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(ivf_probes(vec_col)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def kmeans_fit(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_centroids: list[list[float]] | None = None,
    iterations: int = 2,
    round_to: int = 6,
    broadcast_codebook: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Distributed Lloyd's k-means over an embedding column — the real
    coarse-quantizer trainer the IVF family defers to (closes the
    "fixed pseudo-random codebook" gap flagged in round 1).

    Default path is the one Spark's own MLlib KMeans uses: the codebook
    (k·dim doubles — a bounded driver-side dictionary, NOT data) lives
    on the driver and is compiled into a closed-form nearest-cell
    expression each iteration, so
      assign:  pure map work over the vectors — no join, no shuffle,
               whole-stage codegen,
      update:  one posexplode + per-(cell, dim) mean — the only shuffle
               per iteration, partial-aggregated map-side,
    and each iteration ends with one bounded collect of the new k·dim
    means. Set ``broadcast_codebook=False`` past the literal-expression
    ceiling (k·dim in the hundreds of thousands): centroids then stay as
    (cell, i, m) ROWS, assignment is a broadcast row-join on dim index +
    window argmin — correct at any k, just slower.

    Determinism/oracle parity: H31-derived init, fixed iteration count,
    centroid means and distances rounded to ``round_to`` decimals each
    step (both engines round identically, so ulp noise can't flip an
    argmin; exact ties break by cell ASC). A cell that loses all its
    vectors drops out of the codebook, exactly as a GROUP BY update
    loses it. Returns ``(assignment, centroids)``: the final (vec_id,
    cell, dist_sq) assignment and the (cell, i, m) codebook rows it was
    computed against."""
    init = init_centroids or ivf_centroids()
    spark = vecs.sparkSession

    if broadcast_codebook:
        base = ensure_parallelism(vecs.select(id_col, vec_col))
        cells = list(range(1, len(init) + 1))
        book = [list(map(float, c)) for c in init]

        def cell_col() -> Column:
            arr = F.array(*[F.lit(c) for c in cells])
            return F.element_at(arr, ivf_cell(vec_col, book, round_to=round_to))

        for _ in range(iterations - 1):
            upd = (
                base.select(
                    cell_col().alias("cell"), F.posexplode(vec_col).alias("i0", "v0")
                )
                .select("cell", (F.col("i0") + 1).alias("i"), F.col("v0").cast("double").alias("v"))
                .groupBy("cell", "i")
                .agg(F.round(F.avg("v"), round_to).alias("m"))
                .collect()
            )
            cells = sorted({r["cell"] for r in upd})
            pos = {c: p for p, c in enumerate(cells)}
            dim = max(r["i"] for r in upd)
            book = [[0.0] * dim for _ in cells]
            for r in upd:
                book[pos[r["cell"]]][r["i"] - 1] = float(r["m"])
        assigned = base.select(
            F.col(id_col).alias("vid"),
            cell_col().alias("cell"),
            ivf_min_dist(vec_col, book, round_to=round_to).alias("dist_sq"),
        )
        cent = spark.createDataFrame(
            [
                (cell, i + 1, m)
                for ci, cell in enumerate(cells)
                for i, m in enumerate(book[ci])
            ],
            "cell int, i int, m double",
        )
        return assigned, cent

    # Row-join fallback: codebook too large to compile into an expression.
    crows = spark.createDataFrame(
        [
            (cell + 1, i + 1, float(v))
            for cell, c in enumerate(init)
            for i, v in enumerate(c)
        ],
        "cell int, i int, m double",
    )
    vrows = (
        ensure_parallelism(vecs.select(id_col, vec_col))
        .select(
            F.col(id_col).alias("vid"),
            F.posexplode(vec_col).alias("i0", "v0"),
        )
        .select(
            "vid",
            (F.col("i0") + 1).alias("i"),
            F.col("v0").cast("double").alias("v"),
        )
        .localCheckpoint()
    )

    def assign(cent: DataFrame) -> DataFrame:
        d = (
            vrows.join(F.broadcast(cent), "i")
            .groupBy("vid", "cell")
            .agg(
                F.round(F.sum((F.col("v") - F.col("m")) * (F.col("v") - F.col("m"))), round_to).alias(
                    "dist_sq"
                )
            )
        )
        w = Window.partitionBy("vid").orderBy(F.asc("dist_sq"), F.asc("cell"))
        return (
            d.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("vid", "cell", "dist_sq")
        )

    cent = crows
    assigned = assign(cent)
    for _ in range(iterations - 1):
        cent = (
            assigned.join(vrows, "vid")
            .groupBy("cell", "i")
            .agg(F.round(F.avg("v"), round_to).alias("m"))
        )
        assigned = assign(cent)
    return assigned, cent


def kmeans_iterate(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_centroids: list[list[float]] | None = None,
    iterations: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Assignment-only view of ``kmeans_fit`` (kept as the stable
    operator surface; see kmeans_fit for the full contract)."""
    assigned, _ = kmeans_fit(
        vecs, id_col, vec_col, init_centroids, iterations, round_to
    )
    return assigned


def ivf_trained_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    iterations: int = 2,
    n_probes: int = NUM_PROBES,
    round_to: int = 6,
) -> DataFrame:
    """IVF ANN over a TRAINED codebook: the coarse quantizer comes from
    ``kmeans_fit`` (distributed Lloyd's from the deterministic H31
    init), not the fixed pseudo-random centroids — candidate cells ARE
    the final k-means assignment, and query probe lists are computed
    against the same trained centroid rows.

    Scale shape: training is the distributed kmeans_fit passes; the
    trained codebook (k·dim doubles — bounded, the dictionary-collect
    class) is then pulled to the driver and compiled into the same
    closed-form nearest-cell expression ivf_topk uses, so assigning the
    FULL corpus is pure map work: no join, no shuffle, whole-stage
    codegen. That is the 100 TB shape — only training touches shuffles,
    and at that scale codebook + assignment would persist as snapshot
    tables and be reused across query batches rather than retrained.
    Distances round to the trainer's grid pre-argmin so the assignment
    is exactly the oracle's (rounded-dist, lowest-cell-tie) one."""
    _, cent = kmeans_fit(
        candidates, id_col, vec_col, iterations=iterations, round_to=round_to
    )
    # kmeans_fit's final row-join assignment is lazy and never consumed —
    # only the (cell, i, m) codebook rows are evaluated here.
    book_rows = cent.collect()
    # A cell that lost every vector drops out of the trained codebook, so
    # expression indices are positions in the SURVIVING-cell list — map
    # them back to real cell ids explicitly.
    cells = sorted({r["cell"] for r in book_rows})
    dim = max(r["i"] for r in book_rows)
    pos = {c: p for p, c in enumerate(cells)}
    book: list[list[float]] = [[0.0] * dim for _ in cells]
    for r in book_rows:
        book[pos[r["cell"]]][r["i"] - 1] = float(r["m"])
    cell_ids = F.array(*[F.lit(c) for c in cells])

    c = ensure_parallelism(candidates.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.element_at(cell_ids, ivf_cell(vec_col, book, round_to=round_to)).alias("cell"),
    )
    qp = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            F.transform(
                ivf_probes(vec_col, book, n_probes=n_probes, round_to=round_to),
                lambda p: F.element_at(cell_ids, p),
            )
        ).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(qp), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k neighbors per query (cosine DESC, neighbor id ASC).

    The query side is broadcast — at scale this is |C| passes of narrow
    map work + a per-query top-k (TakeOrdered per group), no shuffle of
    the candidate set."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = ensure_parallelism(candidates.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def planes_per_band_for(n_rows: int, target_bucket: int = 64) -> int:
    """Plane count per band sized to the corpus: 2^b buckets per band so
    the EXPECTED bucket holds ~``target_bucket`` vectors. The within-
    bucket rerank is then O(n · target_bucket) total instead of
    O((n/2^b)²) per bucket with a fixed b — the knob that keeps
    bucketed ANN linear as the corpus grows 100×."""
    import math

    return max(4, math.ceil(math.log2(max(2, n_rows / max(1, target_bucket)))))


def materialize(df: DataFrame, snapshot_root: str | None = None) -> DataFrame:
    """Cut lineage on a computed base table (signatures, buckets) —
    see sources/snapshots.materialize_frame for the durable contract."""
    from mle_proj_datapipeline_spark.sources.snapshots import materialize_frame

    return materialize_frame(df, snapshot_root)


def lsh_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = BANDS,
    planes_per_band: int | None = PLANES_PER_BAND,
    k: int = 1,
    snapshot_root: str | None = None,
) -> DataFrame:
    """Multi-band hyperplane LSH top-k: each vector gets ``bands``
    independent sign-bit bucket keys (``planes_per_band`` planes each);
    candidate pairs are the union over bands of same-bucket pairs, then
    an exact cosine rerank picks top-k per query.

    Scale shape (the fix for the fixed-256-bucket geometry):
    - bucket count per band is 2^planes_per_band; pass
      ``planes_per_band=None`` to size it from the corpus
      (planes_per_band_for) so expected bucket size stays constant as
      the corpus grows — within-bucket work stays linear overall.
    - candidate generation shuffles (band, key, id) only — ids, not
      vectors; the distinct-pair dedup collapses multi-band hits before
      any vector is fetched.
    - rerank fetches vectors by two hash joins on id (broadcast when the
      pair set is small), so vector payloads cross the wire once per
      surviving pair side, not once per band.
    - multi-band recall: a true neighbor is missed only if it disagrees
      with the query in EVERY band (P_miss = Π_b (1 - p^planes); more
      bands → higher recall at constant per-band cost).
    """
    one = df.select(id_col, vec_col)
    if planes_per_band is None:
        planes_per_band = planes_per_band_for(one.count())
    all_planes = hyperplanes(bands * planes_per_band)
    band_cols = [
        plane_bucket(
            F.col(vec_col), all_planes[b * planes_per_band : (b + 1) * planes_per_band]
        ).alias(f"bk{b}")
        for b in range(bands)
    ]
    base = materialize(
        ensure_parallelism(one).select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), *band_cols
        ),
        snapshot_root,
    )

    return _lsh_rerank(base, bands, k)


def _lsh_rerank(base: DataFrame, bands: int, k: int) -> DataFrame:
    """Candidate generation + exact rerank over a banded signature table
    (vid, v, bk0..bk{bands-1}) — shared by the in-query path (lsh_topk)
    and the persisted-index serve path (lsh_index_topk)."""
    sig = base.select(
        "vid",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"bk{b}").alias("key"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("vid", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a = sig.select(F.col("vid").alias("query_id"), "band", "key")
    b_ = sig.select(F.col("vid").alias("neighbor_id"), "band", "key")
    pairs = (
        a.join(b_, ["band", "key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    if k == 1:
        # Multi-band duplicate pairs score identically, and the rank-1
        # window keeps exactly one row per query regardless — the
        # distinct's whole shuffle is redundant for top-1. (For k>1 a
        # duplicate could occupy two of the k slots, so dedup stays.)
        pass
    else:
        pairs = pairs.distinct()

    qv = base.select(F.col("vid").alias("query_id"), F.col("v").alias("qv"))
    cv = base.select(F.col("vid").alias("neighbor_id"), F.col("v").alias("cv"))
    scored = (
        pairs.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    if k == 1:
        return out.select("query_id", "neighbor_id", "cosine")
    return out.select("query_id", "neighbor_id", "cosine", "rk")


def lsh_index_build(
    df: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = BANDS,
    planes_per_band: int | None = PLANES_PER_BAND,
    meta_extra: dict | None = None,
) -> int:
    """Build and PERSIST the multi-band LSH index: the banded signature
    table (vid, v, per-band bucket keys) committed as a snapshot, with
    the geometry recorded in manifest meta so a reader (or a rebuild
    check) can detect a stale index after a geometry change. The
    signature computation — the map-side cost lsh_topk pays on every
    call — is paid once here; serving only runs candidate join +
    rerank. Returns the committed version."""
    from mle_proj_datapipeline_spark.sources.snapshots import write_snapshot

    one = df.select(id_col, vec_col)
    if planes_per_band is None:
        planes_per_band = planes_per_band_for(one.count())
    all_planes = hyperplanes(bands * planes_per_band)
    band_cols = [
        plane_bucket(
            F.col(vec_col), all_planes[b * planes_per_band : (b + 1) * planes_per_band]
        ).alias(f"bk{b}")
        for b in range(bands)
    ]
    base = ensure_parallelism(one).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), *band_cols
    )
    return write_snapshot(
        base,
        f"{root}/signatures",
        meta={"bands": bands, "planes_per_band": planes_per_band, **(meta_extra or {})},
    )


def lsh_index_geometry(spark, root: str) -> dict | None:
    """Geometry meta of the committed LSH index, or None if absent."""
    from mle_proj_datapipeline_spark.sources.snapshots import history

    snaps = history(spark, f"{root}/signatures")
    return snaps[-1].get("meta") if snaps else None


def lsh_index_topk(spark, root: str, k: int = 1) -> DataFrame:
    """Serve LSH ANN top-k from the PERSISTED signature index
    (lsh_index_build): zero signature work — candidates and rerank run
    straight off the committed banded table, identical results to
    lsh_topk over the same corpus/geometry (same oracle)."""
    from mle_proj_datapipeline_spark.sources.snapshots import read_snapshot

    meta = lsh_index_geometry(spark, root)
    if meta is None:
        raise FileNotFoundError(f"no LSH index committed under {root}")
    # Materialize the committed signature table once per serve call: the
    # rerank consumes it three times (band explode, query vectors,
    # candidate vectors) and re-scanning even a small parquet snapshot
    # 3× costs more than one localCheckpoint of it — and gives AQE
    # exact sizes for the rerank's broadcast decisions.
    base = materialize(read_snapshot(spark, f"{root}/signatures"))
    return _lsh_rerank(base, int(meta["bands"]), k)


def lsh_top1(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    snapshot_root: str | None = None,
) -> DataFrame:
    """Approximate nearest neighbor per vector — multi-band hyperplane
    LSH (lsh_topk, k=1). Kept as the named top-1 entry point."""
    return lsh_topk(df, id_col, vec_col, k=1, snapshot_root=snapshot_root)


def ivf_index_build(
    vecs: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 2,
    round_to: int = 6,
) -> int:
    """Build and PERSIST an IVF index: train the coarse quantizer
    (kmeans_fit) and commit two snapshot tables under ``root`` —
    ``codebook`` (cell, i, m) and ``assignment`` (vid, cell, v: the
    vector itself, so the query path is self-contained, no join back to
    the corpus). This is the 100 TB usage pattern the in-query trainer
    only simulates: pay training once, serve every subsequent query
    batch from the committed index. Returns the codebook version.

    Commit pairing: the codebook commits FIRST and the assignment
    records its version in meta — readers pin that pair, so a crash
    between the two commits (or a reader racing a rebuild) can never
    score probe lists against centroids from a different training run
    than the assignment was built with."""
    from mle_proj_datapipeline_spark.sources.snapshots import write_snapshot

    assigned, cent = kmeans_fit(
        vecs, id_col, vec_col, iterations=iterations, round_to=round_to
    )
    one = vecs.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    vcb = write_snapshot(cent, f"{root}/codebook")
    write_snapshot(
        assigned.select("vid", "cell").join(one, "vid"),
        f"{root}/assignment",
        meta={"codebook_version": vcb},
    )
    return vcb


def _pinned_codebook(
    spark, root: str
) -> tuple[list[list[float]], list[int], int | None]:
    """Load the codebook version the LATEST assignment commit was built
    with (``codebook_version`` in the assignment manifest's meta) —
    never the bare latest codebook, which may belong to an in-flight
    rebuild that has committed its codebook but not yet its assignment.
    Returns (book, cells, pinned_version) with book rows ordered like
    ``cells`` — one history read serves both the book and the pin."""
    from mle_proj_datapipeline_spark.sources.snapshots import history, read_snapshot

    snaps = history(spark, f"{root}/assignment")
    pinned = snaps[-1].get("meta", {}).get("codebook_version") if snaps else None
    book_rows = read_snapshot(spark, f"{root}/codebook", version=pinned).collect()
    cells = sorted({r["cell"] for r in book_rows})
    dim = max(r["i"] for r in book_rows)
    pos = {c: p for p, c in enumerate(cells)}
    book: list[list[float]] = [[0.0] * dim for _ in cells]
    for r in book_rows:
        book[pos[r["cell"]]][r["i"] - 1] = float(r["m"])
    return book, cells, pinned


def ivf_index_topk(
    spark,
    queries: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probes: int = NUM_PROBES,
    round_to: int = 6,
) -> DataFrame:
    """Serve ANN top-k from a PERSISTED IVF index (ivf_index_build):
    zero training work — the codebook snapshot (k·dim rows, bounded)
    collects to the driver and compiles into the closed-form probe
    expression; candidates come straight off the committed assignment
    table, pre-partitioned by cell. Identical results to
    ivf_trained_topk for the same corpus/params (tested + same oracle).
    The codebook is the one PINNED by the assignment commit
    (_pinned_codebook), so a racing rebuild can't mismatch the pair."""
    from mle_proj_datapipeline_spark.sources.snapshots import read_snapshot

    book, cells, _ = _pinned_codebook(spark, root)
    cell_ids = F.array(*[F.lit(c) for c in cells])

    c = read_snapshot(spark, f"{root}/assignment").select(
        F.col("vid").alias("neighbor_id"), F.col("v").alias("cv"), "cell"
    )
    qp = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            F.transform(
                ivf_probes(vec_col, book, n_probes=n_probes, round_to=round_to),
                lambda p: F.element_at(cell_ids, p),
            )
        ).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(qp), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def ivf_index_append(
    spark,
    new_vecs: DataFrame,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> int:
    """Incremental index maintenance: assign a NEW batch of vectors
    against the index's FROZEN codebook (closed-form expression — map
    work only, no training, history never re-assigned) and append it to
    the committed assignment table. The standard production ANN-ingest
    pattern: the codebook retrains on a cadence (ivf_index_build), while
    arriving batches append cheaply between rebuilds; wiring this into
    foreachBatch gives streaming index ingestion as-is. Returns the new
    assignment version.

    The frozen codebook is the one PINNED by the current assignment
    commit (not the bare latest — a rebuild's freshly committed codebook
    must not leak into an append against the old assignment), and the
    append re-records the same pin so the pair stays consistent."""
    from mle_proj_datapipeline_spark.sources.snapshots import write_snapshot

    book, cells, pinned = _pinned_codebook(spark, root)
    cell_ids = F.array(*[F.lit(c) for c in cells])

    batch = new_vecs.select(
        F.col(id_col).alias("vid"),
        F.element_at(cell_ids, ivf_cell(vec_col, book, round_to=round_to)).alias("cell"),
        F.col(vec_col).alias("v"),
    )
    return write_snapshot(
        batch,
        f"{root}/assignment",
        mode="append",
        meta={"codebook_version": pinned},
    )
