"""Vector primitives for similarity search over embedding columns
(array<float>): deterministic hyperplane/centroid seeds, double-
precision ordered folds (dot/norm/cosine — bit-identical to the DuckDB
oracle's list_reduce), sign-bit plane buckets, IVF cell assignment /
multi-probe selection, the exact brute-force top-k baseline, and the
corpus-sized LSH geometry rule. Stable leaf of the ANN family (split
out of operators/similarity.py per VERDICT r6 item 6).

No MLlib (per engine policy — MLlib LSH .fit() is batch-dependent, like
the reference's per-batch StringIndexer anti-pattern SURVEY §4.2).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from mle_proj_datapipeline_spark.operators.hashing import h31_py

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


def _col_sql(c: Column | str) -> str:
    return c if isinstance(c, str) else c._jc.toString()


def _dot_chain_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    """Left-associated dot-product chain over fixed ``dim`` positions.

    Identical fold to ``aggregate(zip_with(a, b, x*y), 0.0, acc+x)`` —
    same start value, same order, same casts — but expressed as plain
    arithmetic so it WHOLE-STAGE CODEGENS. Higher-order functions are
    CodegenFallback in Spark: every row paid interpreted per-element
    lambda dispatch (the r12 profile put the 2k-row kmeans update pass
    at seconds — pure lambda overhead, not data). ``try_element_at``
    yields NULL (→ NULL fold) for short vectors, matching zip_with's
    NULL padding; vectors LONGER than ``dim`` would differ (prefix vs
    NULL) but every consumer sits behind valid_embeddings' exact-length
    filter."""
    terms = [
        f"(CAST(try_element_at({a}, {i}) AS DOUBLE)"
        f" * CAST(try_element_at({b}, {i}) AS DOUBLE))"
        for i in range(1, dim + 1)
    ]
    acc = "0.0D"
    for t in terms:
        acc = f"({acc} + {t})"
    return acc


def dot_double(a: Column | str, b: Column | str, dim: int = EMB_DIM) -> Column:
    """Ordered double-precision fold — deterministic across engines.
    Codegen chain over ``dim`` fixed positions (see _dot_chain_sql)."""
    return F.expr(_dot_chain_sql(_col_sql(a), _col_sql(b), dim))


def norm_double(a: Column | str, dim: int = EMB_DIM) -> Column:
    return F.sqrt(dot_double(a, a, dim))


# --------------------------------------------------------------------------
# r12: Arrow/NumPy kernels for the per-row vector folds (guide §4.2).
#
# The old aggregate(zip_with(...)) HOF expressions are CodegenFallback:
# every row paid interpreted per-element lambda dispatch (~70 ns/step ×
# 1024 steps for an 8-centroid distance array). An unrolled arithmetic
# chain codegens but the generated method exceeds HotSpot's
# huge-method JIT limit, so it runs as interpreted bytecode — measured
# 2× better at 100k rows, 4× WORSE at 2k. A vectorized NumPy kernel
# behind a pandas_udf wins at every size: flat Arrow-boundary cost plus
# ~µs per thousand rows.
#
# Exactness contract (the DuckDB oracles hash-compare these values):
# every fold replicates the JVM expression BIT-FOR-BIT — float32→
# float64 widening is exact, the accumulation loops run in the same
# dim order with one IEEE-correctly-rounded add/mul per element (NumPy
# elementwise == JVM double ops), and HALF_UP rounding goes through
# _round_half_up (floor-shift fast path + exact-decimal suspect path
# replicating java BigDecimal.valueOf(d).setScale(n, HALF_UP)).
# NULL semantics match the HOF forms: invalid rows (null / wrong
# length) yield NULL (bucket: 0 — the old IF(NULL >= 0, ..., 0) arm).
# --------------------------------------------------------------------------


def _np_mat(values, dim: int):
    """(X float64 (n, dim), valid bool (n,)) from an Arrow/pandas batch
    of float sequences. Fast path: uniform batches stack directly
    (valid_embeddings guarantees this in query paths); ragged/null
    batches fall back to a per-row copy."""
    import numpy as np

    n = len(values)
    try:
        X = np.stack([np.asarray(v) for v in values]).astype(np.float64)
        if X.ndim == 2 and X.shape[1] == dim:
            return X, np.ones(n, dtype=bool)
    except (ValueError, TypeError):
        pass
    X = np.zeros((n, dim), dtype=np.float64)
    valid = np.zeros(n, dtype=bool)
    for i, v in enumerate(values):
        if v is None:
            continue
        a = np.asarray(v, dtype=np.float64)
        if a.shape == (dim,):
            X[i] = a
            valid[i] = True
    return X, valid


def _round_half_up(a, scale: int):
    """Vectorized replica of Spark's round() on DOUBLE: HALF_UP on the
    value's shortest decimal representation (BigDecimal.valueOf path).
    Fast path floor-shifts in binary; values within 1e-6 (scaled) of a
    .5 boundary — where binary and decimal rounding can disagree — take
    the exact per-element decimal path (repr(float) is the same
    shortest-roundtrip decimal java's Double.toString produces)."""
    import decimal
    import numpy as np

    q = decimal.Decimal(1).scaleb(-scale)
    s = 10.0**scale
    scaled = a * s
    fl = np.floor(scaled)
    frac = scaled - fl
    out = np.where(frac >= 0.5, fl + 1.0, fl) / s
    suspect = np.abs(frac - 0.5) < 1e-6
    if suspect.any():
        idx = np.nonzero(suspect)
        vals = [
            float(
                decimal.Decimal(repr(x)).quantize(q, rounding=decimal.ROUND_HALF_UP)
            )
            for x in a[idx]
        ]
        out[idx] = vals
    return out


def cosine(a: Column | str, b: Column | str, dim: int = EMB_DIM) -> Column:
    """Exact-fold cosine (dot/(|a||b|)) — NumPy kernel, bit-identical
    to the ordered double fold (same dim-order accumulation)."""
    import pandas as pd

    @F.pandas_udf("double")
    def _cos(sa: pd.Series, sb: pd.Series) -> pd.Series:
        import numpy as np

        A, va = _np_mat(sa.values, dim)
        B, vb = _np_mat(sb.values, dim)
        n = len(sa)
        ab = np.zeros(n)
        aa = np.zeros(n)
        bb = np.zeros(n)
        for d in range(dim):
            x, y = A[:, d], B[:, d]
            ab = ab + x * y
            aa = aa + x * x
            bb = bb + y * y
        out = pd.Series(ab / (np.sqrt(aa) * np.sqrt(bb)), dtype="Float64")
        out[~(va & vb)] = pd.NA
        return out

    return _cos(F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b)


def plane_bucket(vec: Column | str, planes: list[list[float]] | None = None) -> Column:
    """Sign-bit bucket id: bit j = 1 iff dot(vec, plane_j) >= 0.
    NumPy kernel; the per-plane dot accumulates in dim order (exact
    fold), invalid vectors bucket to 0 (the old IF-NULL arm)."""
    import pandas as pd

    planes = planes or hyperplanes()
    p_dim = len(planes[0])

    @F.pandas_udf("int")
    def _bucket(sv: pd.Series) -> pd.Series:
        import numpy as np

        P = np.asarray(planes, dtype=np.float64)  # (k, dim)
        X, valid = _np_mat(sv.values, p_dim)
        acc = np.zeros((len(sv), P.shape[0]))
        for d in range(p_dim):
            acc = acc + X[:, d, None] * P[None, :, d]
        weights = (1 << np.arange(P.shape[0])).astype(np.int64)
        bits = ((acc >= 0) * weights).sum(axis=1)
        bits[~valid] = 0
        return pd.Series(bits.astype(np.int32))

    return _bucket(F.col(vec) if isinstance(vec, str) else vec)


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
    # r12: squared-L2 as a left-assoc arithmetic chain — identical fold
    # (start 0.0, same order, same casts) to the old
    # aggregate(zip_with(...)) HOF form, but codegen-able: HOFs are
    # CodegenFallback, so the 8-centroid distance array paid 8×64
    # interpreted lambda dispatches per row (and ivf_cell evaluates the
    # array twice — whole-stage codegen CSE now dedups that for free).
    acc = "0.0D"
    for i, y in enumerate(centroid, start=1):
        d = f"(CAST(try_element_at({vec}, {i}) AS DOUBLE) - {y!r}D)"
        acc = f"({acc} + ({d} * {d}))"
    expr = acc
    if round_to is not None:
        expr = f"round({expr}, {round_to})"
    return expr


def _np_dists(values, centroids, round_to, dim):
    """(D (n, k) rounded squared-L2 distances, valid mask) — exact
    replica of the _dist_sq_sql fold: per-element accumulation in dim
    order, HALF_UP rounding on the decimal grid."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    X, valid = _np_mat(values, dim)
    acc = np.zeros((len(values), C.shape[0]))
    for d in range(dim):
        diff = X[:, d, None] - C[None, :, d]
        acc = acc + diff * diff
    if round_to is not None:
        acc = _round_half_up(acc, round_to)
    return acc, valid


def ivf_cell(
    vec: Column | str,
    centroids: list[list[float]] | None = None,
    round_to: int | None = None,
) -> Column:
    """1-based id of the nearest centroid (L2; ties → lowest id).
    ``round_to`` rounds each distance first — pass the trainer's grid so
    assignment matches an oracle that argmins over rounded distances.
    NumPy kernel (argmin picks the first/lowest index on ties, exactly
    array_position(d, array_min(d)))."""
    import pandas as pd

    cs = centroids or ivf_centroids()
    dim = len(cs[0])

    @F.pandas_udf("int")
    def _cell(sv: pd.Series) -> pd.Series:
        import numpy as np

        D, valid = _np_dists(sv.values, cs, round_to, dim)
        out = pd.Series((np.argmin(D, axis=1) + 1).astype(np.int32), dtype="Int32")
        out[~valid] = pd.NA
        return out

    return _cell(F.col(vec) if isinstance(vec, str) else vec)


def ivf_min_dist(
    vec: Column | str,
    centroids: list[list[float]] | None = None,
    round_to: int | None = None,
) -> Column:
    """Squared L2 distance to the nearest centroid (the inertia term)."""
    import pandas as pd

    cs = centroids or ivf_centroids()
    dim = len(cs[0])

    @F.pandas_udf("double")
    def _mind(sv: pd.Series) -> pd.Series:
        import numpy as np

        D, valid = _np_dists(sv.values, cs, round_to, dim)
        out = pd.Series(np.min(D, axis=1), dtype="Float64")
        out[~valid] = pd.NA
        return out

    return _mind(F.col(vec) if isinstance(vec, str) else vec)


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
    # r12: no repartition — cosine is Arrow-vectorized (see kernels above).
    c = candidates.select(id_col, vec_col).select(
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


def valid_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = EMB_DIM,
    require_nonzero: bool = True,
) -> DataFrame:
    """Declared dirty-input contract for embedding consumers (found by
    the mutated-table fuzz harness, round 7): a 100 TB corpus WILL
    carry NULL vectors (failed encoder calls), wrong-length vectors
    (mixed model versions), and all-zero vectors (padding / dead docs).

    - NULL / wrong-length rows are dropped for every consumer — they
      have no coordinates in the declared space (under ANSI mode they
      crash NumPy folds and silently skew JVM aggregates otherwise).
    - ``require_nonzero=True`` (similarity/clustering family) also
      drops all-zero vectors: a zero vector has no direction, so
      cosine against it is a 0/0 — ANSI division error on the Spark
      side, engine-dependent garbage elsewhere. Moment queries
      (covariance, drift) keep zeros: they carry real mass.

    Every SQL oracle mirrors this WHERE clause verbatim
    (plans/llm_common.py: emb_valid_sql), so the contract is parity-
    tested, not an implementation accident. Narrow map-side filter —
    pushes to the scan, no shuffle."""
    cond = F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim)
    if require_nonzero:
        cond = cond & F.exists(F.col(vec_col), lambda x: x != F.lit(0.0))
    return df.filter(cond)
