"""Property-based tests (hypothesis) — the invariants SURVEY.md §5
commits to: imputation leaves no nulls in declared columns; dedup is
idempotent; the week partitioner maps every date to exactly one
Sunday-anchored week; PSI(x, x) = 0; fingerprints are permutation-
sensitive but duplication-stable."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from mle_proj_datapipeline_spark.operators.dedup import exact_dedup
from mle_proj_datapipeline_spark.operators.impute import ImputeSpec, impute
from mle_proj_datapipeline_spark.operators.psi import psi
from mle_proj_datapipeline_spark.plans.medallion import week_of

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100, allow_nan=False)),
    ),
    min_size=1,
    max_size=25,
)

SCHEMA = StructType(
    [StructField("cat", StringType(), True), StructField("num", DoubleType(), True)]
)


@SLOW
@given(rows=ROWS)
def test_impute_leaves_no_nulls(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    spec = ImputeSpec(
        constants={"cat": "MISSING"}, mean_cols=["num"], flag_cols=["cat", "num"]
    )
    out = impute(df, spec).cache()
    assert out.filter(F.col("cat").isNull()).count() == 0
    # all-null num columns have no mean — only then may nulls remain
    if any(r[1] is not None for r in rows):
        assert out.filter(F.col("num").isNull()).count() == 0
    # flags reflect ORIGINAL nulls
    assert out.filter(F.col("cat_missing") == 1).count() == sum(
        1 for r in rows if r[0] is None
    )


@SLOW
@given(rows=st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=30))
def test_exact_dedup_idempotent(spark, rows):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rows)], ["id", "content"])
    once = exact_dedup(df, "content", ["id"])
    twice = exact_dedup(once, "content", ["id"])
    got_once = sorted(map(tuple, once.collect()))
    assert got_once == sorted(map(tuple, twice.collect()))
    # keeps exactly one row per distinct content, the min id
    assert len(got_once) == len(set(rows))
    for i, v in enumerate(rows):
        if i == min(j for j, w in enumerate(rows) if w == v):
            assert (i, v) in got_once


@SLOW
@given(
    d=st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2030, 12, 31)),
)
def test_week_partitioner_total_and_sunday_anchored(spark, d):
    row = spark.createDataFrame([(d,)], ["d"]).select(week_of(F.col("d")).alias("wk")).first()
    wk = dt.date.fromisoformat(row["wk"])
    assert wk.weekday() == 6  # Sunday
    assert wk <= d <= wk + dt.timedelta(days=6)


@SLOW
@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=20,
        max_size=60,
    )
)
def test_psi_self_is_zero(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    assert psi(df, df, "x").first()["psi"] == 0.0


EDGES = st.lists(
    st.tuples(st.integers(min_value=0, max_value=20), st.integers(min_value=0, max_value=20)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=EDGES)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation must agree with a reference union-find on
    arbitrary graphs (self-loops, duplicates, chains, cycles)."""
    from mle_proj_datapipeline_spark.operators.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    # canonical root = min node of the component
    roots: dict[int, int] = {}
    for n, r in expected.items():
        roots[r] = min(roots.get(r, n), n)
    expected = {n: roots[r] for n, r in expected.items()}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    # driver_max_edges=0 pins the DISTRIBUTED kernel (the driver arm
    # IS this union-find — testing it against itself proves nothing)
    got = {
        r["node"]: r["comp"]
        for r in connected_components(pairs, driver_max_edges=0).collect()
    }
    assert got == expected

    from mle_proj_datapipeline_spark.operators.dedup import connected_components_star

    got_star = {
        r["node"]: r["comp"]
        for r in connected_components_star(pairs, driver_max_edges=0).collect()
    }
    assert got_star == expected

    # the gated driver arm must agree with the distributed kernels
    got_local = {
        r["node"]: r["comp"] for r in connected_components_star(pairs).collect()
    }
    assert got_local == expected


def test_driver_gate_counts_pairs_not_directed_rows(spark):
    """ADVICE r7 regression: ``driver_max_edges`` gates on unique input
    PAIRS, not on the symmetrized frame's directed rows (which is 2x
    pairs and silently halved the effective cap). A graph of exactly N
    unique pairs with driver_max_edges=N must take the driver
    union-find arm."""
    from mle_proj_datapipeline_spark.operators.dedup import connected_components_star

    n_pairs = 10
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(n_pairs)], "id_a long, id_b long"
    )
    stats: dict = {}
    labels = connected_components_star(
        pairs, stats=stats, driver_max_edges=n_pairs
    ).collect()
    assert stats["mode"] == "driver-union-find"
    assert len(labels) == 2 * n_pairs  # every node labeled
    # and strictly above the cap the distributed kernel runs
    stats2: dict = {}
    connected_components_star(pairs, stats=stats2, driver_max_edges=n_pairs - 1).collect()
    assert stats2["mode"] == "star"


def test_star_cc_chain_converges_logarithmically(spark):
    """The adversarial case for min-label propagation: a 1000-node path
    graph (diameter 999). Large-star/small-star must label it correctly
    in O(log² n) rounds — far under the diameter bound."""
    import math

    from mle_proj_datapipeline_spark.operators.dedup import connected_components_star

    n = 1000
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    stats: dict = {}
    labels = connected_components_star(chain, stats=stats, driver_max_edges=0).collect()
    assert len(labels) == n
    assert all(r["comp"] == 0 for r in labels)
    assert stats["rounds"] <= math.ceil(math.log2(n)) + 3  # ≈ log² head-room


def test_ngram_blocking_bounded_under_hot_prefix(spark):
    """Skew guard (VERDICT r1 defect 2): a corpus where EVERY doc shares
    the blocking prefix must not form one quadratic block. The composite
    (prefix, length-band) key splits the hot prefix by size, and the
    max_block cap hard-drops anything still over budget."""
    import math

    import pyspark.sql.functions as F

    from mle_proj_datapipeline_spark.operators.dedup import (
        LEN_BAND_WIDTH,
        ngram_jaccard_pairs,
    )

    n = 300
    docs = [
        (i, "the quick brown " + " ".join(f"w{i}_{j}" for j in range(i % 160 + 1)))
        for i in range(n)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")

    # Composite key: max block is ~n / n_bands, never the whole corpus.
    toks = F.split(F.col("text"), " ")
    composite = F.concat_ws(
        "|",
        F.array_join(F.slice(toks, 1, 3), " "),
        F.floor(F.size(toks) / F.lit(float(LEN_BAND_WIDTH))).cast("long").cast("string"),
    )
    sizes = [r["count"] for r in df.select(composite.alias("b")).groupBy("b").count().collect()]
    n_bands = len(sizes)
    assert n_bands >= 8  # the hot prefix actually split
    assert max(sizes) <= math.ceil(n / n_bands) + LEN_BAND_WIDTH

    # Cap semantics: capped output is a subset of the uncapped output …
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.1).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.1, max_block=10).collect()
    }
    assert capped <= uncapped

    # … and a corpus that is one giant over-cap block yields nothing
    # instead of a quadratic join (the hard guard).
    clones = spark.createDataFrame(
        [(i, "same exact text here") for i in range(50)], "doc_id int, text string"
    )
    assert (
        ngram_jaccard_pairs(clones, "doc_id", "text", max_block=10).count() == 0
    )


def test_star_cc_snapshot_path_identical(spark, tmp_path):
    """Durable per-round checkpointing must not change the labeling."""
    from mle_proj_datapipeline_spark.operators.dedup import connected_components_star

    edges = [(1, 2), (2, 3), (4, 5), (6, 6), (7, 8), (8, 9), (9, 10)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    local = {
        tuple(r)
        for r in connected_components_star(pairs, driver_max_edges=0).collect()
    }
    durable = {
        tuple(r)
        for r in connected_components_star(
            pairs, snapshot_root=str(tmp_path / "cc"), driver_max_edges=0
        ).collect()
    }
    assert local == durable and local


@SLOW
@given(
    toks=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=30),
)
def test_packing_matches_python_reference(spark, toks):
    """Window cum-sum packing must agree with the obvious sequential
    Python fold for any token-length sequence (single source)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    budget = 50
    rows = [(i, n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id int, toks int")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    got = {
        r["doc_id"]: r["pack_id"]
        for r in df.withColumn(
            "pack_id",
            F.floor(
                F.coalesce(F.sum("toks").over(w), F.lit(0)) / F.lit(float(budget))
            ).cast("long"),
        ).collect()
    }
    cum = 0
    want = {}
    for i, n in rows:
        want[i] = cum // budget
        cum += n
    assert got == want


def test_lsh_geometry_for_targets_threshold():
    """The derived (bands, rows) S-curve midpoint must land near the
    requested Jaccard threshold across the practical range, midpoints
    must track the target monotonically, and the fixed test geometry
    must be recoverable as a special case."""
    import math

    from mle_proj_datapipeline_spark.operators.dedup import lsh_geometry_for

    mids = []
    for t in [0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]:
        b, r, n = lsh_geometry_for(t)
        assert b >= 2 and r >= 2 and n == b * r <= 256
        mid = (1.0 / b) ** (1.0 / r)
        assert abs(mid - t) < 0.05, (t, b, r, mid)
        mids.append(mid)
    assert mids == sorted(mids)
    # budget cap respected
    b, r, n = lsh_geometry_for(0.71, max_hashes=16)
    assert n <= 16 and abs((1.0 / b) ** (1.0 / r) - 0.71) < 0.06
    import pytest

    with pytest.raises(ValueError):
        lsh_geometry_for(0.99)


def test_chunk_geometry_invariants():
    """Sliding-window chunk math (plans/llm_corpus_queries.doc_sliding_chunks):
    for any token count n >= 1, the windows (a) start at multiples of
    the stride, (b) cover every token, (c) all but the last have full
    width, and (d) the chunk count matches the closed form."""
    from hypothesis import given, strategies as st

    from mle_proj_datapipeline_spark.plans.llm_corpus_queries import CHUNK_S, CHUNK_W

    @given(st.integers(min_value=1, max_value=5000))
    def check(n):
        n_chunks = 1 + max(0, -(-(n - CHUNK_W) // CHUNK_S)) if n > CHUNK_W else 1
        # the engine's formula: 1 + floor((max(n-W,0) + S-1) / S)
        formula = 1 + (max(n - CHUNK_W, 0) + CHUNK_S - 1) // CHUNK_S
        assert formula == n_chunks
        covered = set()
        for c in range(n_chunks):
            start = c * CHUNK_S
            end = min(start + CHUNK_W, n)
            assert start < n, (n, c)
            if c < n_chunks - 1:
                assert end - start == CHUNK_W
            covered.update(range(start, end))
        assert covered == set(range(n))

    check()


KEYS = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40
)


@SLOW
@given(KEYS)
def test_cm_sketch_overestimates_and_conserves_mass(spark, keys):
    """CM sketch invariants on arbitrary key multisets: (1) the point
    estimate of EVERY key is ≥ its true count (the one-sided error
    guarantee); (2) each of the d sketch rows conserves total mass —
    sum(cell_n) per j equals the number of input rows (hashing moves
    counts between buckets, never creates or loses them)."""
    from collections import Counter

    from mle_proj_datapipeline_spark.operators import sketch as SK

    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    cells = SK.cm_cells(df, "k")

    per_row = {r["j"]: r["s"] for r in cells.groupBy("j").agg(F.sum("cell_n").alias("s")).collect()}
    assert per_row == {j: len(keys) for j in range(SK.CM_DEPTH)}

    uniq = spark.createDataFrame([(k,) for k in set(keys)], "key bigint")
    est = {r["key"]: r["cm_est"] for r in SK.cm_estimate(cells, uniq).collect()}
    true = Counter(keys)
    assert set(est) == set(true)
    assert all(est[k] >= n for k, n in true.items())


def test_bpe_learn_hand_corpus_and_monotone_counts(spark):
    """BPE merge table on a hand-checkable corpus: argmax order
    (count DESC, left, right), greedy non-overlapping merge ("aaa"
    yields ONE aa merge), and the pair_count sequence is non-increasing
    (merging the max pair can only shrink or equal future maxima)."""
    from mle_proj_datapipeline_spark.operators.bpe import bpe_learn

    docs = spark.createDataFrame([("aaab",), ("aab",)], "text STRING")
    got = [tuple(r) for r in bpe_learn(docs, "text", n_merges=2).collect()]
    # step 1: (a,a) appears 3x ("aaab": aa,aa -> greedy counts pairs
    # per adjacency = 2; "aab": 1) and beats (a,b)=2.
    assert got[0] == (1, "a", "a", 3)
    # step 2 state: [aa,a,b] + [aa,b] (greedy: "aaa" merged ONCE).
    # all pairs tie at 1 -> lexicographic argmax picks (a, b).
    assert got[1] == (2, "a", "b", 1)

    # monotone: on a larger corpus the chosen counts never increase.
    docs2 = spark.createDataFrame(
        [("the cat sat on the mat",), ("the bat and the rat",), ("that hat",)],
        "text STRING",
    )
    table = bpe_learn(docs2, "text", n_merges=5).collect()
    counts = [r["pair_count"] for r in table]
    assert counts == sorted(counts, reverse=True)
    assert [r["step"] for r in table] == list(range(1, len(table) + 1))


def test_bpe_stream_invariant_roundtrip(spark):
    """The double-delimiter encoding keeps its invariant through
    merges: decoding the rewritten stream yields tokens whose
    concatenation (with '_' space marker) reproduces the cleaned
    input text."""
    import pyspark.sql.functions as F

    from mle_proj_datapipeline_spark.operators import bpe

    docs = spark.createDataFrame(
        [("banana band",), ("banana",)], "text STRING"
    )
    corpus = docs.select(bpe.encode_tokens("text").alias("s"))
    # apply two merges by hand through the operator's rewrite form
    for left, right in [("a", "n"), ("an", "a")]:
        corpus = corpus.select(
            F.replace(
                F.col("s"),
                F.lit(f"|{left}{bpe.DELIM}{right}|"),
                F.lit(f"|{left}{right}|"),
            ).alias("s")
        )
    rows = corpus.select(
        F.array_join(
            F.filter(F.split("s", r"\|\|"), lambda t: t != F.lit("")), ""
        ).alias("flat")
    ).collect()
    assert sorted(r["flat"] for r in rows) == ["banana", "banana_band"]


def _bpe_sequential_reference(texts: list[str], n_merges: int, max_chars: int = 64):
    """Pure-Python sequential BPE over token lists: recount adjacent
    pairs after EVERY merge, deterministic argmax (count DESC, left,
    right), greedy left-to-right non-overlapping rewrite. The ground
    truth select_merge_batch must reproduce."""
    from collections import Counter

    streams = [
        list(t[:max_chars].lower().replace("|", "").replace(" ", "_"))
        for t in texts
    ]
    merges = []
    for step in range(1, n_merges + 1):
        counts = Counter()
        for s in streams:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += 1
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, c))
        nxt = []
        for s in streams:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt.append(out)
        streams = nxt
    return merges


@given(
    st.lists(
        st.text(alphabet="abcdef |", min_size=0, max_size=24),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_batched_matches_sequential_reference(spark, texts, n_merges):
    """Merge-table parity for the batched learner (VERDICT r5 item 5):
    bpe_learn(batch=8) must be BIT-IDENTICAL to the recount-per-step
    sequential reference — the batch selection rule only groups merges
    it can prove sequential would pick in the same order. Adversarial
    alphabet: tiny, repetitive, tie-heavy corpora where dirty-pair and
    self-pair (l==r) hazards actually fire."""
    from mle_proj_datapipeline_spark.operators.bpe import bpe_learn

    want = _bpe_sequential_reference(texts, n_merges)
    docs = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [
        tuple(r)
        for r in bpe_learn(docs, "text", n_merges=n_merges, batch=8)
        .orderBy("step")
        .collect()
    ]
    assert got == want


def test_bpe_batch_selection_hazards():
    """select_merge_batch unit semantics on hand-built tables: ties at
    the stop count are trimmed, self-pairs close the batch behind
    themselves, prior-compound collisions close the batch, and the
    top-1 selection always survives."""
    from mle_proj_datapipeline_spark.operators.bpe import select_merge_batch

    # disjoint + strictly above the dirty stop row -> batched together
    ranked = [("a", "b", 9), ("c", "d", 7), ("a", "x", 6), ("e", "f", 5)]
    assert select_merge_batch(ranked, 8, set(), False) == [
        ("a", "b", 9),
        ("c", "d", 7),
    ]
    # tie at c_stop: (c,d) ties the dirty (a,x) row -> trimmed
    ranked = [("a", "b", 9), ("c", "d", 6), ("a", "x", 6)]
    assert select_merge_batch(ranked, 8, set(), False) == [("a", "b", 9)]
    # self-pair closes the batch behind itself
    ranked = [("e", "e", 9), ("c", "d", 7)]
    assert select_merge_batch(ranked, 8, set(), False) == [("e", "e", 9)]
    # compound colliding with an existing token closes the batch
    ranked = [("a", "b", 9), ("c", "d", 7)]
    assert select_merge_batch(ranked, 8, {"ab"}, False) == [("a", "b", 9)]
    # truncated table: last row's count is the floor for hidden pairs
    ranked = [("a", "b", 9), ("c", "d", 7), ("e", "f", 7)]
    assert select_merge_batch(ranked, 8, set(), True) == [
        ("a", "b", 9)
    ]  # 7 <= c_stop(=7, truncation floor) trims both


def test_pagerank_uniform_on_cycle_and_mass_conserved(spark):
    """On a directed cycle every node has in/out degree 1, so PageRank's
    stationary distribution is exactly uniform at every iteration; total
    rank mass stays 1 (no dangling nodes by construction)."""
    from mle_proj_datapipeline_spark.operators.graph import pagerank

    n = 7
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src INT, dst INT"
    )
    rows = pagerank(edges, iterations=4).collect()
    ranks = [r["r"] for r in rows]
    assert len(ranks) == n
    assert abs(sum(ranks) - 1.0) < 1e-12
    for r in ranks:
        assert abs(r - 1.0 / n) < 1e-12


def test_pagerank_matches_numpy_power_iteration(spark):
    """The operator runs the exact synchronous recurrence — verify
    against a dense numpy implementation of the same formula on an
    asymmetric deterministic graph."""
    import numpy as np

    from mle_proj_datapipeline_spark.operators.graph import pagerank

    edges = [(a, b) for a in range(6) for b in range(6) if a != b and (a * 7 + b) % 3 == 0]
    df = spark.createDataFrame(edges, "src INT, dst INT")
    got = {r["node"]: r["r"] for r in pagerank(df, iterations=5).collect()}

    nodes = sorted({a for a, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = {v: sum(1 for a, _ in edges if a == v) for v in nodes}
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        nxt = np.full(n, 0.15 / n)
        for a, b in edges:
            if b in idx:
                nxt[idx[b]] += 0.85 * r[idx[a]] / deg[a]
        r = nxt
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-12, v


def test_pca_power_converges_on_gapped_spectrum(spark):
    """On data with a dominant direction (large spectral gap), 8 power
    iterations from the uniform start must align with numpy's exact top
    eigenvector (|cos| -> 1) and eigenvalue. Synthetic 6-dim vectors:
    coordinate 0 carries ~100x the variance of the rest."""
    import numpy as np

    from mle_proj_datapipeline_spark.operators.linalg import covariance, top_eigvec

    d = 6
    vecs = [
        [float((k % 7) - 3) * 10.0]
        + [float(((k * (j + 2)) % 5) - 2) * 0.3 for j in range(d - 1)]
        for k in range(40)
    ]
    df = spark.createDataFrame([(v,) for v in vecs], f"embedding array<double>")
    # driver_max_dim=0 pins the DISTRIBUTED matvec rounds (the gated
    # driver arm is itself numpy — test it against the kernel instead)
    got = top_eigvec(
        covariance(df, "embedding"), d, iterations=8, driver_max_dim=0
    ).collect()
    v = np.array([r["v"] for r in sorted(got, key=lambda r: r["j"])])
    eig_got = got[0]["eigval"]

    # gated driver arm must agree with the distributed rounds to fp noise
    drv = top_eigvec(covariance(df, "embedding"), d, iterations=8).collect()
    dv = {r["j"]: r["v"] for r in drv}
    assert all(abs(dv[r["j"]] - r["v"]) < 1e-9 for r in got)
    assert abs(drv[0]["eigval"] - eig_got) < 1e-9 * max(1.0, abs(eig_got))

    X = np.array(vecs)
    C = np.cov(X, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    cos = abs(float(v @ V[:, -1]))  # both unit vectors
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12
    assert cos > 0.9999, cos
    assert abs(eig_got - w[-1]) / w[-1] < 1e-6


def test_pca_power_consistent_on_real_embeddings(spark):
    """On the (near-isotropic) real embeddings convergence is not
    guaranteed in 8 rounds — but the result must still be internally
    consistent: unit loading vector, Rayleigh quotient vᵀCv matching
    the reported eigenvalue, and bounded above by numpy's true top
    eigenvalue (Rayleigh bound)."""
    import numpy as np

    import __spark_entry__ as entrymod

    rows = entrymod.queries()["embedding_pca_power"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    eig_got = rows[0]["eigval"]

    import pyarrow.parquet as pq

    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    X = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    w, _ = np.linalg.eigh(C)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4  # loadings rounded to 5dp
    # reported eigval is the final-round norm ||C v_prev|| = v_finᵀC v_prev;
    # pre-convergence it differs from v_finᵀ C v_fin by O(angle²) — allow 2%
    rayleigh = float(v @ C @ v)
    assert abs(rayleigh - eig_got) < 0.02 * abs(eig_got)
    # both quotients obey the Rayleigh bound λ ≤ λ_max
    assert eig_got <= w[-1] * (1 + 1e-9)
    assert rayleigh <= w[-1] * (1 + 1e-9)


def test_pagerank_rejects_dangling_nodes(spark):
    """A plain directed edge list with a destination-only node must
    fail LOUDLY (ValueError) instead of quietly leaking rank mass and
    omitting the node (ADVICE r5); validate=False keeps the documented
    caller-guaranteed escape hatch."""
    import pytest

    from mle_proj_datapipeline_spark.operators.graph import pagerank

    dangling = spark.createDataFrame([(0, 1), (1, 2)], "src INT, dst INT")
    with pytest.raises(ValueError, match="dangling"):
        pagerank(dangling, iterations=2)
    # escape hatch still runs (documented contract: caller owns the risk)
    assert pagerank(dangling, iterations=1, validate=False).count() == 2


def test_bpe_apply_arrow_path_matches_expression_chain(spark):
    """bpe_apply's two physical strategies (nested JVM replace chain vs
    Arrow mapInPandas loop above MAX_EXPR_CHAIN rules) must produce the
    same stream bit-for-bit: pandas str.replace(regex=False) and
    F.replace are both left-to-right non-overlapping literal scans."""
    from mle_proj_datapipeline_spark.operators import bpe

    docs = spark.createDataFrame(
        [("banana band bandana",), ("a man a plan a canal",), ("",)],
        "text STRING",
    )
    rules = [("a", "n"), ("an", "a"), ("b", "an"), ("_", "a")]
    jvm = {
        r["text"]: r["bpe_stream"]
        for r in bpe.bpe_apply(docs, rules, "text").collect()
    }
    old = bpe.MAX_EXPR_CHAIN
    try:
        bpe.MAX_EXPR_CHAIN = 2  # force the Arrow path for the same rules
        arrow = {
            r["text"]: r["bpe_stream"]
            for r in bpe.bpe_apply(docs, rules, "text").collect()
        }
    finally:
        bpe.MAX_EXPR_CHAIN = old
    assert arrow == jvm and len(jvm) == 3


def test_covariance_arms_agree_on_dirty_vectors(spark):
    """ADVICE r6: NULL and wrong-length vectors follow ONE contract in
    both physical arms — dropped before the moment pass — instead of
    posexplode silently skipping them in the explode arm while
    np.asarray(None) crashed the Gramian fold."""
    from mle_proj_datapipeline_spark.operators.linalg import covariance

    rows = [
        ([1.0, 2.0, 3.0],),
        ([4.0, 0.0, -1.0],),
        (None,),
        ([9.0, 9.0],),  # wrong length — dropped when dim declared
        ([2.0, 2.0, 2.0],),
    ]
    df = spark.createDataFrame(rows, "embedding ARRAY<DOUBLE>")
    exp = {
        (r["i"], r["j"]): r["c"]
        for r in covariance(df, "embedding", dim=3, method="explode").collect()
    }
    grm = {
        (r["i"], r["j"]): r["c"]
        for r in covariance(df, "embedding", dim=3, method="gramian").collect()
    }
    assert set(exp) == set(grm) and len(exp) == 9
    for k in exp:
        assert abs(exp[k] - grm[k]) < 1e-9, (k, exp[k], grm[k])


def test_cc_fast_gate_selfloops_dups_and_rescue_arm(spark):
    """r12: both CC kernels gate first on the RAW pair count (an upper
    bound on unique pairs) so small graphs skip the node/symmetrized-
    edge builds entirely — the union-find consumes the raw list, where
    self-loops keep singleton nodes in the universe and duplicates are
    immaterial. A duplicate-heavy list that fails the fast gate must
    still reach the driver arm through the exact unique-pair gate
    (ADVICE r7 semantics preserved)."""
    from mle_proj_datapipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rows = [(1, 2), (2, 1), (1, 2), (3, 3), (4, 5)]  # dups + self-loop
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    want = {(1, 1), (2, 1), (3, 3), (4, 4), (5, 4)}
    stats: dict = {}
    got = {
        (r["node"], r["comp"])
        for r in connected_components_star(pairs, stats=stats).collect()
    }
    assert got == want and stats["mode"] == "driver-union-find"
    got_ml = {
        (r["node"], r["comp"]) for r in connected_components(pairs).collect()
    }
    assert got_ml == want

    # 10 unique pairs duplicated 3x: raw=30 fails a cap of 10, but the
    # exact gate (unique pairs = 10 <= 10) must rescue the driver arm.
    dup = spark.createDataFrame(
        [(i, i + 100) for i in range(10)] * 3, "id_a long, id_b long"
    )
    stats2: dict = {}
    lbl = connected_components_star(dup, stats=stats2, driver_max_edges=10).collect()
    assert stats2["mode"] == "driver-union-find" and len(lbl) == 20


def test_simhash_numpy_kernel_bit_identical_to_hof_fold(spark):
    """r13 (re-adjudication of the r12 kernel): production ``simhash``
    is the JVM HOF fold again — the NumPy kernel lost the driver's
    full-bench methodology (1.2 → 2.1 s driver; r13 alternated 3-pair
    A/B, environment-normalized, HOF ≈6% faster). The kernel stays
    in-tree as the measured-and-rejected reference and must remain
    BIT-identical to the production fold over the real sf0.01 corpus
    plus dirty rows (null / empty / single-word text) — md5 hashing
    stays in the JVM in both forms.

    (The analogous minhash-signature kernel was prototyped and MEASURED
    SLOWER in r12 — the 16-wide fold is too small to beat the Arrow
    boundary — so minhash keeps the JVM fold; see OPTIMIZATION_r12.md.)"""
    import pyspark.sql.functions as F

    from mle_proj_datapipeline_spark.operators.simhash_ngram import (
        _simhash_numpy,
        simhash,
    )
    from mle_proj_datapipeline_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    dirty = spark.createDataFrame(
        [(900001, None), (900002, ""), (900003, "one"), (900004, "a b a b a")],
        "doc_id long, text string",
    )
    df = docs.unionByName(dirty)

    got = {r["doc_id"]: r["fp"] for r in df.select("doc_id", simhash("text").alias("fp")).collect()}
    want = {r["doc_id"]: r["fp"] for r in df.select("doc_id", _simhash_numpy("text").alias("fp")).collect()}
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want.get(k)}

    # Plan shape: the production fingerprint path is JVM-only — no
    # Python evaluation node of any kind.
    fp = docs.select("doc_id", simhash("text").alias("fp"))
    plan = fp._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
