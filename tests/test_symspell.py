"""SymSpell deletion-neighborhood blocking (operators/symspell.py).

The operator's contract is EXACTNESS, not approximation: deletion
buckets are a candidate generator whose output must be a superset of
every levenshtein<=2 pair, and the downstream verify filter restores
the precise pair set the legacy (nation, name-length) blocker produced.
These tests pin (1) the variant generator on enumerable inputs and its
degenerate edges, (2) the SymSpell superset theorem itself
property-style, and (3) pair-set equality against the legacy blocked
join on real sf0.01 customer names — the r10→r11 rewrite must not move
a single pair.
"""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from mle_proj_datapipeline_spark.operators.symspell import (
    deletion_variants,
    symspell_pairs,
)
from tests.conftest import SF_ORACLE


def _py_deletions(s: str, max_del: int = 2) -> set[str]:
    out = {s}
    n = len(s)
    for i in range(n):
        out.add(s[:i] + s[i + 1 :])
    for i, j in itertools.combinations(range(n), 2):
        out.add(s[:i] + s[i + 1 : j] + s[j + 1 :])
    return out


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_deletion_variants_enumerates_exactly(spark):
    rows = (
        spark.createDataFrame([("abc",)], "name string")
        .select(deletion_variants(F.col("name")).alias("v"))
        .collect()
    )
    assert set(rows[0].v) == _py_deletions("abc") == {
        "abc", "ab", "ac", "bc", "a", "b", "c",
    }


def test_deletion_variants_degenerate_inputs(spark):
    """Empty / single-char / NULL names must not trip Spark's
    DESCENDING sequence(1, L<1) semantics; repeated chars dedupe."""
    rows = (
        spark.createDataFrame(
            [("",), ("a",), (None,), ("aaa",)], "name string"
        )
        .select("name", deletion_variants(F.col("name")).alias("v"))
        .collect()
    )
    got = {r.name: r.v for r in rows}
    assert set(got[""]) == {""}
    assert set(got["a"]) == {"a", ""}
    assert got[None] is None or got[None] == [None]
    assert set(got["aaa"]) == {"aaa", "aa", "a"}


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="ab#0", max_size=8),
    st.text(alphabet="ab#0", max_size=8),
)
def test_symspell_superset_theorem(a: str, b: str):
    """lev(a,b) <= 2 ⟹ a and b share a <=2-deletion variant — the
    theorem that makes the blocker exact. (Pure-Python mirror of the
    JVM generator; test_deletion_variants_enumerates_exactly pins the
    two implementations together.)"""
    if _py_lev(a, b) <= 2:
        assert _py_deletions(a) & _py_deletions(b)


def test_pair_set_identical_to_legacy_blocker(spark):
    """The r11 rewrite contract: SymSpell candidates + levenshtein
    verify produce EXACTLY the pair set of the legacy
    (nation, name-length) blocked join on sf0.01 customer."""
    c = (
        spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
        .select(
            "c_custkey", "c_name", "c_nationkey",
            F.length("c_name").alias("ln"),
        )
    )
    new = symspell_pairs(
        c, "c_custkey", "c_name", block_cols=("c_nationkey", "ln")
    ).select("id_a", "id_b")
    x = c.select(
        F.col("c_custkey").alias("ka"), F.col("c_name").alias("na"),
        "c_nationkey", "ln",
    )
    y = c.select(
        F.col("c_custkey").alias("kb"), F.col("c_name").alias("nb"),
        "c_nationkey", "ln",
    )
    old = (
        x.join(y, ["c_nationkey", "ln"])
        .filter(F.col("ka") < F.col("kb"))
        .filter(F.levenshtein("na", "nb") <= 2)
        .select(F.col("ka").alias("id_a"), F.col("kb").alias("id_b"))
    )
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    assert new.count() == old.count() > 0


def test_symspell_pairs_unique_and_verified(spark):
    """One row per unordered pair (multi-bucket dups dropped), every
    emitted dist actually <= max_edit, ids strictly ordered."""
    c = spark.read.parquet(f"{SF_ORACLE}/customer.parquet").limit(500).select(
        "c_custkey", "c_name"
    )
    p = symspell_pairs(c, "c_custkey", "c_name").cache()
    try:
        n = p.count()
        assert p.select("id_a", "id_b").distinct().count() == n
        assert p.filter(F.col("dist") > 2).count() == 0
        assert p.filter(F.col("id_a") >= F.col("id_b")).count() == 0
    finally:
        p.unpersist()


def test_oversize_bucket_fallback_arm_is_exact(spark):
    """The r12 bucket plan routes buckets larger than
    ``max_bucket_expand`` through a per-bucket equi-join instead of the
    C(k,2) array expansion. At the default cap (1024) no test dataset
    ever exceeds it, so this test FORCES the arm with a tiny cap on a
    name multiset with deliberately large shared-variant buckets
    (exact duplicates + a dense 1-edit cluster) and pins pair-set
    equality against brute force — covering the small-arm, big-arm,
    and straddling case (one pair sharing variants in buckets on BOTH
    sides of the cap), where dropDuplicates must collapse the two
    paths' copies of the same pair."""
    import pyspark.sql.functions as F

    names = (
        ["duptown"] * 9                       # exact-dup bucket, k=9 > cap
        + [f"clu{c}ter" for c in "abcdefgh"]  # dense 1-edit cluster
        + ["solo", "solox", "faraway"]        # small buckets
    )
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, name string"
    )
    got = {
        (r.id_a, r.id_b)
        for r in symspell_pairs(df, "id", "name", max_bucket_expand=4).collect()
    }
    a = df.select(F.col("id").alias("ka"), F.col("name").alias("na"))
    b = df.select(F.col("id").alias("kb"), F.col("name").alias("nb"))
    want = {
        (r.ka, r.kb)
        for r in a.crossJoin(b)
        .filter(F.col("ka") < F.col("kb"))
        .filter(F.levenshtein("na", "nb") <= 2)
        .collect()
    }
    assert got == want
    # sanity on the fixture: the dup bucket alone implies C(9,2) pairs
    assert len(want) >= 36


_ADVERSARIAL_NAMES = [
    # dense same-length cluster (every pair within lev 2)
    "Customer#000000001", "Customer#000000002", "Customer#000000011",
    "Customer#000000021", "Customer#000000012",
    # rotation shifts: equal length, lev 2 via insert+delete, differing
    # at EVERY position — the case a substitution-only blocker misses
    "abcdefgh", "bcdefgha", "habcdefg",
    # repeated-char runs (deletion variants collapse heavily)
    "aaaaaaaa", "aaaabaaa", "aabaaaba", "aaaaaaab",
    # near-identical long names differing at the ends
    "Xupplier#000000500", "Supplier#000000500", "Supplier#000000505",
    # unicode: combining marks, precomposed, astral plane, fullwidth —
    # exactness must hold in Spark's CODE-POINT metric (DuckDB's
    # levenshtein is BYTE-based, so these stay out of DuckDB oracles;
    # see test docstrings below)
    "naïve", "naïve", "naive", "naivx",
    "a\U0001F600b", "a\U0001F600c", "\U0001F600\U0001F600b",
    "ａｂｃ", "ａｂｄ",
    "İstanbul", "istanbul", "Istanbul",
]


def test_symspell_exact_under_spark_metric_on_adversarial_names(spark):
    """ENGINE-internal exactness on adversarial name structures —
    rotation shifts, char runs, dense clusters, combining marks,
    astral-plane and fullwidth code points: the SymSpell candidate set
    must reproduce EXACTLY the brute-force all-pairs levenshtein<=2
    pair set computed by Spark itself (one metric used consistently,
    so this gates the blocker + the deletion generator's substring/
    length semantics, independent of any oracle engine)."""
    rows = [(i, n) for i, n in enumerate(_ADVERSARIAL_NAMES)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b)
        for r in symspell_pairs(df, "id", "name").collect()
    }
    a = df.select(F.col("id").alias("ka"), F.col("name").alias("na"))
    b = df.select(F.col("id").alias("kb"), F.col("name").alias("nb"))
    want = {
        (r.ka, r.kb)
        for r in a.crossJoin(b)
        .filter(F.col("ka") < F.col("kb"))
        .filter(F.levenshtein("na", "nb") <= 2)
        .collect()
    }
    assert got == want
    assert want, "adversarial fixture must produce true pairs"
    # the rotation shift must be present (insert+delete, not 2 subs)
    ia = _ADVERSARIAL_NAMES.index("abcdefgh")
    ib = _ADVERSARIAL_NAMES.index("bcdefgha")
    assert (min(ia, ib), max(ia, ib)) in got


def test_levenshtein_cross_engine_contract_is_ascii():
    """Documented oracle-encoding limit (round 11): Spark's levenshtein
    counts CODE POINTS; DuckDB's counts BYTES (fullwidth 'a'->'a' costs
    3 there, an astral-plane deletion costs 4). The two agree exactly
    on ASCII — the domain of every registered fuzzy-match oracle
    (TPC-H names) — so oracle parity is certified on ASCII name
    domains and the engine's code-point semantics is the declared
    contract for non-ASCII. This test pins the DuckDB byte behavior
    so an engine upgrade that silently changes it re-opens the
    adjudication."""
    import duckdb

    con = duckdb.connect()
    assert con.execute(
        "SELECT levenshtein('ａｂｃ', 'abc')"
    ).fetchone()[0] == 9  # byte metric
    assert con.execute(
        "SELECT levenshtein('Customer#000000001', 'Customer#000000011')"
    ).fetchone()[0] == 1  # ASCII agrees with Spark
