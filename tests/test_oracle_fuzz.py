"""Differential fuzzing of the oracle gate on PERTURBED data.

The driver's correctness harness compares Spark vs DuckDB on the fixed
testdata; a query can pass there while mishandling shapes the fixed
tables never produce (empty texts, single-token docs, heavy duplicate
runs, sampled-away groups). This harness re-runs a battery of
registered queries against their OWN oracle SQL on seeded mutations of
the sf0.001 tables: a deterministic row sample plus injected edge-case
documents. Both engines read the same parquet, so any mutation is a
fair comparison — if results diverge, the ENGINE disagrees with its
declared semantics, not the fixture.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Deterministic queries over the mutated tables; chosen to cover the
# text/feature/agg/join families while staying cheap at this size.
FUZZ_QUERIES = [
    "doc_token_stats",
    "doc_lang_id",
    "doc_repetition_quality",
    "feature_hashing_doc_vectors",
    "bigram_lm_doc_scores",
    "zipf_slope_terms",
    "chunk_exact_dedup",
    "benchmark_decontamination",
    "segment_order_stats",
    "nation_revenue",
    "top_doc_sources",
    "cm_sketch_heavy_hitters",
    # families beyond text: dedup pair generation, sampling, drift,
    # robust stats, encodings, windows, TPC-H shapes, linalg
    "minhash_lsh_neardups",
    "simhash_neardups",
    "ngram_jaccard_neardups",
    "dict_encode_priority",
    "order_flag_recodes",
    "impute_mean_acctbal",
    "pps_orders_sample",
    "uniform_k_sample",
    "ks_drift_totalprice",
    "mad_outlier_stats",
    "target_encode_priority",
    "scd2_priority_history",
    "session_window_stats",
    "pricing_summary",
    "top_revenue_orders",
    "best_model_per_week",
    "embedding_covariance",
    "embedding_int8_quantize",
    "km_reorder_survival",
    "event_transition_matrix",
    # regressions this harness originally caught (round 6): ANSI
    # divide-by-zero on an empty doc; empty-blob first_byte semantics
    "doc_quality_by_lang",
    "multimodal_byte_stats",
    # round-7 widening: the medallion composite and the re-thresholded
    # TPC-H fixtures (both newly non-empty at small SF)
    "feature_store_build",
    "part_value_concentration",
    "idle_customer_balance",
    # NULL-semantics contract class (round 7 NULL-fuzz finds)
    "acctbal_decile_stats",
    "retraining_trigger",
    # empty-input contract class (round 7 empty-fact-table fuzz finds:
    # n=0 teleport, 0/0 ratios, zero-vector codebooks, no-footer-stats
    # files, sub-minimum series, NaN eigvectors, NULL-vs-0 empty SUM,
    # observed-rows grouping sets)
    "supplier_pagerank",
    "table_quality_report",
    "approx_order_cardinalities",
    "orders_footer_stats",
    "holt_weekly_forecast",
    "embedding_pca_power",
    "ann_recall_eval",
    "order_priority_cube",
    "kmeans_embedding_cells",
]

EDGE_DOCS = [
    # (doc_id, text, lang, source, n_chars) — shapes the generator never
    # emits: empty text, single char, one token, all-same-token runs,
    # exact duplicates of each other, pipe chars (BPE delimiter).
    (9_000_001, "", "en", "fuzz", 0),
    (9_000_002, "x", "en", "fuzz", 1),
    (9_000_003, "word", "de", "fuzz", 4),
    (9_000_004, "spam spam spam spam spam spam spam spam", "en", "fuzz", 39),
    (9_000_005, "the exact duplicate body of text", "en", "fuzz", 32),
    (9_000_006, "the exact duplicate body of text", "en", "fuzz", 32),
    (9_000_007, "pipe | and || double pipes", "en", "fuzz", 26),
    # round-7 additions: multi-byte UTF-8 (caught the ASCII-assuming
    # multimodal_byte_stats oracle), a long doc, and whitespace shapes
    (9_000_008, "héllo wörld naïve café 中文 текст emoji 🚀 done", "fr", "fuzz", 46),
    (9_000_009, " ".join(f"tok{i % 7}" for i in range(2000)), "en", "fuzz", 13999),
    (9_000_010, "tab\tseparated and  double  spaces trailing ", "en", "fuzz", 43),
]

# Degenerate embedding rows (round 7): NULL vector, wrong-length vector,
# all-zero vector — the declared dirty-input contract of
# operators/veclib.valid_embeddings (these crashed every cosine query
# under ANSI mode and skewed the moment queries before the contract).
def _edge_embeddings(dim: int):
    return [
        (9_200_001, [0.0] * dim, 1),
        (9_200_002, None, 2),
        (9_200_003, [1.0, 2.0], 3),
    ]


FACT_TABLES = ("documents", "orders", "lineitem", "events", "embeddings")


# Hot-key skew contract class (round 7): key-unique-preserving
# injections that concentrate mass on single keys — the shapes that
# break silently-truncating or uniqueness-assuming plans while staying
# a FAIR differential comparison (both engines read the same parquet).
#   - one order with 120 distinct suppliers/parts (crosses the declared
#     MAX_COOCCUR_SET=64 cap) plus orders with exactly 64 and 65
#     members (the cap boundary), overlapping so pair supports reach
#     the min-support threshold of the association-rule family;
#   - one customer holding 240 orders across ~5 years (hot groupBy /
#     window / survival / retention key);
#   - one user with a 600-event stream plus a 20-event same-microsecond
#     burst (monster session, tie-break stress);
#   - 15 documents sharing one hot 11-token shingle run with unique
#     tails (hot LSH band bucket / decontamination posting list).
_HOT_SENT = "the quick brown fox jumps over the lazy dog again and again"


def _inject_skew(name: str, t: pa.Table) -> pa.Table:
    import datetime as dt

    if name == "orders":
        okeys, ckeys, stats, prices, dates, prios = [], [], [], [], [], []
        for i in range(240):
            okeys.append(9_601_001 + i)
            ckeys.append(2)
            stats.append(["O", "F", "P"][i % 3])
            prices.append(500.5 + i)
            dates.append(dt.datetime(1995, 1, 6) + dt.timedelta(days=7 * i))
            prios.append(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"][i % 5]
            )
        for j, okey in enumerate((9_600_001, 9_600_002, 9_600_003)):
            okeys.append(okey)
            ckeys.append(2)
            stats.append("F")
            prices.append(9000.25 + j)
            dates.append(dt.datetime(1996, 6, 1 + j))
            prios.append("2-HIGH")
        extra = pa.table(
            {
                "o_orderkey": pa.array(okeys, pa.int64()),
                "o_custkey": pa.array(ckeys, pa.int64()),
                "o_orderstatus": pa.array(stats, pa.string()),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array(dates, t.schema.field("o_orderdate").type),
                "o_orderpriority": pa.array(prios, pa.string()),
            }
        )
        return pa.concat_tables([t.select(extra.column_names), extra])
    if name == "lineitem":
        rows = []
        hot = [
            (9_600_001, list(range(1, 121))),  # 120 members: over the cap
            (9_600_002, list(range(33, 97))),  # exactly 64: at the cap
            (9_600_003, list(range(61, 126))),  # 65: one over the boundary
        ]
        for okey, keys in hot:
            for ln, k in enumerate(keys, start=1):
                rows.append(
                    (
                        okey, k, k, ln,
                        float(k % 50 + 1),
                        1000.25 + k,
                        (k % 11) / 100.0,
                        (k % 9) / 100.0,
                        ["A", "N", "R"][k % 3],
                        ["O", "F"][k % 2],
                        dt.datetime(1996, 1, 1) + dt.timedelta(days=k),
                    )
                )
        extra = pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
                "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
                "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
                "l_discount": pa.array([r[6] for r in rows], pa.float64()),
                "l_tax": pa.array([r[7] for r in rows], pa.float64()),
                "l_returnflag": pa.array([r[8] for r in rows], pa.string()),
                "l_linestatus": pa.array([r[9] for r in rows], pa.string()),
                "l_shipdate": pa.array(
                    [r[10] for r in rows], t.schema.field("l_shipdate").type
                ),
            }
        )
        return pa.concat_tables([t.select(extra.column_names), extra])
    if name == "events":
        ids, tss, users, types, vals, props = [], [], [], [], [], []
        base = dt.datetime(2024, 3, 1)
        for i in range(600):
            ids.append(8_100_001 + i)
            tss.append(base + dt.timedelta(seconds=30 * i))
            users.append(5)
            types.append(["view", "view", "click", "purchase"][i % 4])
            vals.append((i % 10) + 0.25)
            props.append('{"k": %d}' % (i % 5))
        burst = dt.datetime(2024, 3, 2, 12, 0, 0, 250000)
        for i in range(20):
            ids.append(8_200_001 + i)
            tss.append(burst)
            users.append(5)
            types.append(["view", "click"][i % 2])
            vals.append(7.5)
            props.append('{"k": 9}')
        extra = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(tss, t.schema.field("ts").type),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(props, pa.string()),
            }
        )
        return pa.concat_tables([t.select(extra.column_names), extra])
    if name == "documents":
        rows = []
        for i in range(15):
            text = f"{_HOT_SENT} unique tail number {i} marker{i}"
            rows.append((9_100_001 + i, text, "en", "fuzz-hot", len(text)))
        extra = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        )
        return pa.concat_tables([t.select(extra.column_names), extra])
    return t


# Duplicate-row inflation contract class (round 8): exact full-row copies
# of fact rows — every ~10th row x3 plus one row x50 (a heavy clone) —
# stress join multiplicity, distinct-vs-count assumptions, percentile /
# rank tie handling, dedup semantics, and frequency-weighted codebooks.
# Both engines read the same parquet, so any divergence is the engine
# disagreeing with its declared row-multiset semantics. Explored
# exhaustively on the full 165-query registry in round 8 (162 green,
# 3 adjudicated exclusions); round 9 retired the PSI exclusion via the
# 6-decimal breakpoint convention and made the vid-keyed-oracle
# exclusion structural (_dup_excluded below).
DUP_EXCLUDE: dict[str, str] = {
    # (round 9) psi_totalprice_drift was excluded here over a 7.3e-12
    # cross-engine quantile-interpolation boundary under the x50
    # point-mass; both engines now round breakpoints to 6 decimals
    # (operators/psi.py convention), so the query is back in the class.
}

# The unrolled-Lloyd CTE oracle (_kmeans_cte_prefix) keys on vid
# (GROUP BY vid in d1/d2, re-join v USING (vid)), assuming vec_id is
# the table's unique id — the declared schema contract. Under duplicate
# ids the oracle sums k copies of every dim into one k-times dist_sq
# yet counts one row per vid, while the engine consistently weights
# each row as one observation. Engine semantics are coherent under
# duplicates; the oracle ENCODING is not. Detected STRUCTURALLY by the
# CTE's VALUES-table signature so every present and future query built
# on the prefix is excluded together (ADVICE r8: ann_ivf_trained_topk /
# ann_ivf_indexed_topk share the prefix and passed only by seed luck).
_VID_KEYED_ORACLE_MARKER = "c0(cell, i, m) AS (VALUES"


def _dup_excluded(name: str, osql: dict[str, str]) -> str | None:
    """Reason this query sits outside the dup-rows class, else None."""
    if name in DUP_EXCLUDE:
        return DUP_EXCLUDE[name]
    if _VID_KEYED_ORACLE_MARKER in osql.get(name, ""):
        return "oracle keys on vid (unique-id schema contract)"
    return None


# Measure columns per table for the all-NULL-measure class
# (keys/dates/categoricals untouched so joins and spines survive).
_ALL_NULL_MEASURES = {
    "orders": ["o_totalprice"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "events": ["value"],
    "customer": ["c_acctbal"],
}

# Constant values per measure column for the zero-variance class: every
# row of every measure column carries the same value, so n stays large
# while sample variance / IQR / MAD / histogram width / score spread all
# collapse to exactly zero — the degenerate-denominator boundary the
# singleton class (n=1) misses: stddev=0 z-scores, corr 0/0 over many
# rows, all-equal quantile breakpoints (every decile boundary the same
# value), KS over two identical distributions, single-score AUC/Gini
# grids, winsorization bounds that coincide.
_CONST_MEASURES = {
    "orders": {"o_totalprice": 1000.0},
    "lineitem": {
        "l_quantity": 10.0,
        "l_extendedprice": 1000.0,
        "l_discount": 0.05,
        "l_tax": 0.04,
    },
    "events": {"value": 5.0},
    "customer": {"c_acctbal": 500.0},
}

# Unicode/multilingual stress corpus (round 9): the shapes a 100 TB
# multilingual crawl actually contains and the ASCII-looking synthetic
# generator never emits — CJK/Thai text with no spaces (whole line = one
# whitespace token), RTL scripts, combining marks vs precomposed forms,
# ZWJ emoji sequences and astral-plane code points (UTF-8 4-byte,
# UTF-16 surrogate pairs), Unicode whitespace variants, fullwidth forms,
# case-fold traps (Turkish dotted İ, German ß), ligatures, control
# chars, and the engine's BPE/fingerprint delimiter in fullwidth form.
# Both engines read the same parquet, so every divergence is a
# cross-engine expression-semantics hole (Java regex vs RE2, byte- vs
# codepoint-length, md5-of-UTF-8-bytes, locale-sensitive casing) — the
# exact class of bug that corrupts dedup/tokenize/fingerprint results
# silently on non-English shards. n_chars follows the table contract
# (Python len == code points; consistent with Spark length() and DuckDB
# length()). Includes exact-duplicate and shared-prefix CJK pairs so
# the minhash/simhash/ngram dedup family sees non-ASCII collisions, and
# unicode source keys so group-by/codebook keys leave ASCII.
_UNICODE_DOCS_RAW = [
    (9_500_001, "中文文本没有空格标记所以整行是一个词元连续不断", "zh", "fuzz-uni"),
    (9_500_002, "中文文本没有空格标记所以整行是一个词元连续不断", "zh", "fuzz-uni"),
    (9_500_003, "日本語のテキストと漢字かな混じり文のサンプルです", "ja", "fuzz-uni"),
    (9_500_004, "النص العربي يُكتب من اليمين إلى اليسار مع تشكيل", "ar", "fuzz-uni"),
    (9_500_005, "עברית נכתבת מימין לשמאל עם ניקוד ותווים", "he", "fuzz-uni"),
    (9_500_006, "combining é acute differs from precomposed é acute", "fr", "fuzz-uni"),
    (9_500_007, "emoji soup \U0001f680\U0001f525\U0001f389 family \U0001f468‍\U0001f469‍\U0001f467‍\U0001f466 flag \U0001f1fa\U0001f1f3 done", "en", "fuzz-uni"),
    (9_500_008, "nbsp thin space ideographic　space vtend", "en", "fuzz-uni"),
    (9_500_009, "turkish İstanbul and dotless ı casefold trap", "tr", "fuzz-uni"),
    (9_500_010, "zero​width​space plus zwj a‍b joined pair", "en", "fuzz-uni"),
    (9_500_011, "astral plane \U0001d56c\U0001d593\U0001d586\U0001d591\U0001d59e\U0001d599\U0001d58e\U0001d588\U0001d598 math bold text", "en", "fuzz-uni"),
    (9_500_012, "mixed 中文 english العربية русский ελληνικά हिन्दी বাংলা", "mul", "fuzz-源"),
    (9_500_013, "ß sharp s vs SS casefold and ﬁ ligature ﬂ forms", "de", "fuzz-uni"),
    (9_500_014, "ｆｕｌｌｗｉｄｔｈ　ｌａｔｉｎ　ｔｅｘｔ", "ja", "fuzz-源"),
    (9_500_015, "controlchar bell and del inside text", "en", "fuzz-uni"),
    (9_500_016, "ＡＢＣ vs ABC ① ② ③ Ⅳ Ⅸ numerals ½ ¾ ⅚", "en", "fuzz-uni"),
    (9_500_017, "हिन्दी देवनागरी मात्राएँ और संयुक्ताक्षर क्ष त्र ज्ञ यहाँ", "hi", "fuzz-uni"),
    (9_500_018, "한국어 텍스트 조합형 한글 음절 블록 샘플", "ko", "fuzz-uni"),
    (9_500_019, "ไทยไม่มีช่องว่างระหว่างคำเช่นกันทั้งบรรทัด", "th", "fuzz-uni"),
    (9_500_020, "pipe｜fullwidth and ‖ double vertical delimiter", "en", "fuzz-uni"),
    # shared long CJK prefix, distinct tails: near-dup candidates whose
    # shingles are non-ASCII multi-byte tokens
    (9_500_021, "数据管道去重相似度检测分布式执行引擎 test tail one alpha", "zh", "fuzz-uni"),
    (9_500_022, "数据管道去重相似度检测分布式执行引擎 test tail two beta", "zh", "fuzz-uni"),
    # word-final uppercase sigma: Java lower() applies the contextual
    # Final_Sigma rule (Σ → ς at word end) that per-codepoint engines
    # don't — exercises the Σ→σ leg of the case-fold pin
    (9_500_023, "ΒΙΟΣ ΚΑΙ ΛΟΓΟΣ greek sigma ΤΕΛΟΣ ends", "el", "fuzz-uni"),
]
_UNICODE_DOCS = [
    (i, text, lang, src, len(text)) for (i, text, lang, src) in _UNICODE_DOCS_RAW
]

# Control/delimiter-characters corpus (round 10): the ASCII-adversarial
# shapes the unicode class doesn't cover — raw scraped text carrying the
# engine's own BPE delimiter (`|`, `||`, `|||` runs, exercising the
# strip-'|' convention in operators/bpe.clean_text cross-engine),
# newline/CRLF/tab/multi-space whitespace (tokenizer split semantics),
# regex metacharacters flowing through the PII-scrub and fingerprint
# regexp paths (Java regex vs DuckDB RE2), a 500-char single token (one
# giant whitespace token), the EMPTY string and a whitespace-only doc
# (distinct from NULL — zero-token boundary), an embedded NUL byte
# (legal in parquet UTF-8; C-string truncation anywhere in either
# engine's path would diverge lengths/hashes silently), zero-width
# space + combining-vs-precomposed pairs, and ZWJ emoji. Certified
# 165/165 green on first sweep (round 10, frozen tree) — landed as the
# fourteenth rotating class purely as regression insurance.
_CTRL_DOCS_RAW = [
    (9_800_001, "pipe|delim||double|||triple|end", "en", "fuzz-ctrl"),
    (9_800_002, "line1\nline2\r\nline3\ttabbed  twospace end", "en", "fuzz-ctrl"),
    (9_800_003, "contact test@example.com or 555-123-4567 now\n", "en", "fuzz-ctrl"),
    (9_800_004, "a" * 500, "en", "fuzz-ctrl"),
    (9_800_005, "", "en", "fuzz-ctrl"),
    (9_800_006, " \t\n ", "en", "fuzz-ctrl"),
    (9_800_007, "specials a.b a*b a+b (p) [b] {c} \\back $d ^c ?q", "en", "fuzz-ctrl"),
    (9_800_008, "zero\u200bwidth combine e\u0301 precomposed \u00e9 end", "en", "fuzz-ctrl"),
    (9_800_009, "emoji \U0001F44D family \U0001F468‍\U0001F469‍\U0001F467 flag \U0001F1FA\U0001F1F8 end", "en", "fuzz-ctrl"),
    (9_800_010, "nul\x00inside after", "en", "fuzz-ctrl"),
]
_CTRL_DOCS = [
    (i, text, lang, src, len(text)) for (i, text, lang, src) in _CTRL_DOCS_RAW
]


def _long_docs() -> list[tuple[int, str, str, str, int]]:
    """Long-document stress corpus (round 9): 4k-6.4k-token documents
    (~30-45 KB) from a 16-word vocabulary, one exact duplicate of the
    first (a long-body dedup pair — exact Jaccard on k-token shingle
    sets is O(k²)-ish in both engines, which is why the pair is the
    SMALLEST doc), and one crafted 40,000-token doc whose top token
    count is exactly 2598 — the ratio 2598/40000 = 0.06495 sits on the
    printed half-grid where Spark's round() (BigDecimal HALF_UP on the
    shortest decimal string) and DuckDB's (binary value) disagreed;
    this row is the deterministic regression witness for the
    floor-shift convention in doc_repetition_quality. The crafted doc
    is a repeating pattern, so its distinct-shingle set stays tiny and
    the dedup family stays cheap. This class also exposed (and now
    regresses) three ORACLE-side superlinear encodings: the shingle
    lambda re-splitting the whole text per index (_SH let-binding), the
    re-inlined minhash h/sig CTEs (now MATERIALIZED), and the
    byte-indexed substr checksum walk (regexp_extract_all chunks).
    Deterministic seed."""
    import random

    rng = random.Random(17)
    words = [
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
        "spark", "scan", "join", "merge", "window", "batch", "stream", "dup",
    ]
    rows = []
    for k in range(4):
        n = 4000 + k * 800
        txt = " ".join(rng.choice(words) for _ in range(n))
        rows.append((9_700_001 + k, txt, "en", "fuzz-long", len(txt)))
    # half-grid witness: top token 'dup' appears exactly 2598 times out
    # of 40000; every other word ~2493 < 2598 so 'dup' is the argmax
    toks = ["dup"] * 2598 + [words[i % 15] for i in range(37402)]
    txt = " ".join(toks)
    rows.append((9_700_005, txt, "en", "fuzz-long", len(txt)))
    rows.append((9_700_010, rows[0][1], "en", "fuzz-long", rows[0][4]))
    return rows


def _dup_rows(t: pa.Table, seed: int) -> pa.Table:
    n = t.num_rows
    if n == 0:
        return t
    hot = (seed * 40503) % n
    idx = []
    for i in range(n):
        # the hot row is cloned below; keep it out of the x3 arm so its
        # multiplicity is exactly 50, not a seed-dependent 52
        k = 3 if i != hot and (i * 2654435761 + seed) % 10 == 0 else 1
        idx.extend([i] * k)
    idx.extend([hot] * 49)  # one heavy clone: exactly 50 identical copies
    return t.take(pa.array(idx, pa.int64()))


def _mutate(
    seed: int,
    out_dir: str,
    rate: int = 60,
    inject: bool = True,
    skew: bool = False,
    dup: bool = False,
    single: bool = False,
    measures_null: bool = False,
    reorder: bool = False,
    dims_orphan: bool = False,
    measures_negate: bool = False,
    measures_const: bool = False,
    unicode_docs: bool = False,
    dates_invert: bool = False,
    long_docs: bool = False,
    ctrl_docs: bool = False,
) -> None:
    import datetime as dt

    for name in TABLES:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        if measures_const:
            # zero-variance contract class: every measure column becomes
            # one constant value in all rows — n stays large while every
            # spread statistic (variance, stddev, IQR, MAD, histogram
            # width, score grid) collapses to exactly zero. The
            # degenerate-denominator boundary the singleton class (n=1)
            # misses: z-scores x/0 with n in the thousands, corr 0/0,
            # ALL-EQUAL quantile breakpoints (ten identical decile
            # boundaries), KS on two identical samples, one-score
            # AUC/Gini, coinciding winsorization bounds.
            for col, val in _CONST_MEASURES.get(name, {}).items():
                fi = t.schema.get_field_index(col)
                t = t.set_column(
                    fi,
                    t.schema.field(fi),
                    pa.array([val] * t.num_rows, t.schema.field(fi).type),
                )
        if dates_invert:
            # temporal-inversion contract class: ~25% of fact event
            # times shifted far out of causal order (shipments dated
            # long before their orders, events years before the user's
            # first order, orders dated after their own lineitems) —
            # real warehouses carry backdated corrections and clock
            # skew. Stresses signed date arithmetic (negative
            # durations/datediffs), as-of joins where the "previous"
            # row is in the future, survival/retention spines with
            # negative offsets, and window frames over inverted time.
            import pyarrow.compute as pc

            _shift_cols = {
                "lineitem": ("l_shipdate", -400),
                "events": ("ts", -730),
                "orders": ("o_orderdate", 365),
            }
            if name in _shift_cols:
                col, days = _shift_cols[name]
                fi = t.schema.get_field_index(col)
                c = t.column(col).combine_chunks()
                mask = pa.array(
                    [(i * 2654435761 + seed) % 4 == 0 for i in range(t.num_rows)]
                )
                shifted = pc.add(
                    c, pa.scalar(days * 86_400_000_000, pa.duration("us"))
                )
                t = t.set_column(
                    fi, t.schema.field(fi), pc.if_else(mask, shifted, c)
                )
        if measures_negate:
            # negative-measures contract class: ~25% of each measure
            # column's values sign-flipped (keys/dates/categoricals
            # intact) — refunds/chargebacks/corrections are normal fact
            # data, and they stress log/sqrt domains (NaN vs NULL),
            # signed sums crossing zero, magnitude-assuming buckets and
            # ratios, and winsorization bounds. Same parquet both
            # engines, so divergence = engine vs its own oracle.
            import pyarrow.compute as pc

            for col in _ALL_NULL_MEASURES.get(name, []):
                fi = t.schema.get_field_index(col)
                c = t.column(col)
                mask = pa.array(
                    [(i * 2654435761 + seed) % 4 == 0 for i in range(t.num_rows)]
                )
                flipped = pc.if_else(mask, pc.negate(c.combine_chunks()), c)
                t = t.set_column(fi, t.schema.field(fi), flipped)
        if dims_orphan:
            # orphan-FK contract class: sample the PARENT/dim tables
            # (facts stay intact) so fact foreign keys dangle — the
            # inverse of the row-sample class, which orphans
            # lineitem→orders but never orders→customer or
            # lineitem→part/supplier. Stresses inner-vs-left join
            # choices, broadcast dim joins, dim-keyed codebooks and
            # target encodings, spine builds, and ref-integrity
            # reports. Also drops one whole nation, dangling the
            # customer/supplier→nation→region chain.
            if name in ("customer", "supplier", "part"):
                keep = [
                    (i * 2654435761 + seed) % 100 < 55 for i in range(t.num_rows)
                ]
                t = t.filter(pa.array(keep))
            elif name == "nation":
                import pyarrow.compute as pc

                t = t.filter(pc.not_equal(t.column("n_nationkey"), 3))
        if reorder and name in FACT_TABLES and t.num_rows:
            # row-order-invariance contract class: the same multiset of
            # rows in REVERSED order — a deterministic query must not
            # notice (unsorted collect_list folds, first() without
            # ordering, and underspecified tie-breaks all would); at
            # cluster scale partition order is arbitrary, so scan-order
            # dependence is a latent wrong-answer bug.
            t = t.take(list(range(t.num_rows - 1, -1, -1)))
        if measures_null:
            # all-NULL-measure contract class: every nullable MEASURE
            # column NULLed in all rows (keys/dates/categoricals keep
            # their values) — aggregates see only NULLs, breakpoint
            # grids go NULL, recursions poison, while group spines
            # remain. Found the KeyError on an undefined imputation
            # mean and Holt emitting NULL-fitted rows (round 8).
            for col in _ALL_NULL_MEASURES.get(name, []):
                fi = t.schema.get_field_index(col)
                t = t.set_column(
                    fi, t.schema.field(fi), pa.nulls(t.num_rows, t.schema.field(fi).type)
                )
        if name in FACT_TABLES:
            if single:
                # singleton contract class: exactly ONE fact row — the
                # boundary between the empty-input class and normal
                # data (n=1 variances, one-point fits, one-doc corpora)
                t = t.slice(0, 1)
            else:
                # deterministic sample keyed on a hash of the row index
                keep = [
                    (i * 2654435761 + seed) % 100 < rate for i in range(t.num_rows)
                ]
                t = t.filter(pa.array(keep))
            if dup:
                t = _dup_rows(t, seed)
        if skew:
            t = _inject_skew(name, t)
        if unicode_docs and name == "documents":
            extra = pa.table(
                {
                    "doc_id": pa.array([r[0] for r in _UNICODE_DOCS], pa.int64()),
                    "text": pa.array([r[1] for r in _UNICODE_DOCS], pa.string()),
                    "lang": pa.array([r[2] for r in _UNICODE_DOCS], pa.string()),
                    "source": pa.array([r[3] for r in _UNICODE_DOCS], pa.string()),
                    "n_chars": pa.array([r[4] for r in _UNICODE_DOCS], pa.int64()),
                }
            )
            t = pa.concat_tables([t.select(extra.column_names), extra])
        if ctrl_docs and name == "documents":
            extra = pa.table(
                {
                    "doc_id": pa.array([r[0] for r in _CTRL_DOCS], pa.int64()),
                    "text": pa.array([r[1] for r in _CTRL_DOCS], pa.string()),
                    "lang": pa.array([r[2] for r in _CTRL_DOCS], pa.string()),
                    "source": pa.array([r[3] for r in _CTRL_DOCS], pa.string()),
                    "n_chars": pa.array([r[4] for r in _CTRL_DOCS], pa.int64()),
                }
            )
            t = pa.concat_tables([t.select(extra.column_names), extra])
        if long_docs and name == "documents":
            rows = _long_docs()
            extra = pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "lang": pa.array([r[2] for r in rows], pa.string()),
                    "source": pa.array([r[3] for r in rows], pa.string()),
                    "n_chars": pa.array([r[4] for r in rows], pa.int64()),
                }
            )
            t = pa.concat_tables([t.select(extra.column_names), extra])
        if not inject:
            pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
            continue
        if name == "orders":
            # NULL join key, NULL measure, NULL category (round 7):
            # orphan order, priceless order, unprioritized order — the
            # NULL-semantics contract class (anti-join vs NOT EXISTS,
            # NULL ordering in windows, null-distinct change detection,
            # dictionary/-1 encoding, NULL-model panels)
            import datetime as _dt

            extra = pa.table(
                {
                    "o_orderkey": pa.array([9_300_001, 9_300_002], pa.int64()),
                    "o_custkey": pa.array([None, 1], pa.int64()),
                    "o_orderstatus": pa.array(["O", "F"], pa.string()),
                    "o_totalprice": pa.array([100.5, None], pa.float64()),
                    "o_orderdate": pa.array(
                        [_dt.datetime(1997, 1, 1), _dt.datetime(1997, 1, 2)],
                        t.schema.field("o_orderdate").type,
                    ),
                    "o_orderpriority": pa.array(["1-URGENT", None], pa.string()),
                }
            )
            t = pa.concat_tables([t.select(extra.column_names), extra])
        if name == "customer":
            extra = pa.table(
                {
                    "c_custkey": pa.array([9_400_001], pa.int64()),
                    "c_name": pa.array([None], pa.string()),
                    "c_nationkey": pa.array([0], pa.int32()),
                    "c_acctbal": pa.array([None], pa.float64()),
                    "c_mktsegment": pa.array([None], pa.string()),
                }
            )
            t = pa.concat_tables([t.select(extra.column_names), extra])
        if name == "events":
            # tied timestamps: same user, same microsecond, different
            # events — stresses the total-order tie-break convention in
            # the window / session / as-of family
            tie = dt.datetime(2024, 1, 2, 12, 0, 0, 500000)
            extra = pa.table(
                {
                    "event_id": pa.array([8_000_001, 8_000_002, 8_000_003], pa.int64()),
                    "ts": pa.array([tie, tie, tie], pa.timestamp("us")),
                    "user_id": pa.array([7, 7, 7], pa.int64()),
                    "event_type": pa.array(["view", "click", "purchase"], pa.string()),
                    "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
                    "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}'], pa.string()),
                }
            )
            t = pa.concat_tables([t.select(extra.column_names), extra])
        if name == "embeddings":
            dim = len(t.column("embedding")[0].as_py())
            rows = _edge_embeddings(dim)
            extra = pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
                    "label": pa.array([r[2] for r in rows], pa.int32()),
                }
            )
            t = pa.concat_tables([t.select(extra.column_names), extra])
        if name == "documents":
            extra = pa.table(
                {
                    "doc_id": pa.array([r[0] for r in EDGE_DOCS], pa.int64()),
                    "text": pa.array([r[1] for r in EDGE_DOCS], pa.string()),
                    "lang": pa.array([r[2] for r in EDGE_DOCS], pa.string()),
                    "source": pa.array([r[3] for r in EDGE_DOCS], pa.string()),
                    "n_chars": pa.array([r[4] for r in EDGE_DOCS], pa.int64()),
                }
            )
            t = pa.concat_tables([t.select(extra.column_names), extra])
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))


@pytest.mark.parametrize(
    "seed,rate",
    [(11, 60), (47, 60), (3, 8)],  # rate 8: near-empty groups everywhere
)
def test_queries_match_oracles_on_mutated_tables(spark, tmp_path_factory, seed, rate):
    import __spark_entry__ as entrymod

    out_dir = str(tmp_path_factory.mktemp(f"fuzz_sf_{seed}"))
    _mutate(seed, out_dir, rate)

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in FUZZ_QUERIES:
        got = qs[name](spark, out_dir).toPandas()
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"spark/oracle divergence on mutated data: {bad}"


def test_queries_match_oracles_on_empty_fact_tables(spark, tmp_path_factory):
    """Zero-row fact tables (dimensions keep their rows): every fact scan
    returns an empty relation WITH schema, so this stresses the empty
    end of every family at once — global aggregates over no rows
    (count()=0 vs sum()=NULL), empty window spines, empty driver-held
    codebook/dictionary/merge-rule collects (dict encode, k-means, BPE,
    pagerank), and ANSI division with zero denominators. The engine's
    contract is the oracle's answer on the same empty parquet — often 0
    rows, sometimes one all-NULL aggregate row — never a crash."""
    import __spark_entry__ as entrymod

    out_dir = str(tmp_path_factory.mktemp("fuzz_empty_sf"))
    _mutate(0, out_dir, rate=0, inject=False)

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in FUZZ_QUERIES:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:  # crash-on-empty IS the divergence
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"spark/oracle divergence on empty fact tables: {bad}"


# Queries whose plans carry per-key state that a hot key concentrates:
# the capped graph fan-out (cap boundary 64/65/120), per-key collected
# sets and windows, sessionization, survival/retention spines, sampling
# weights, and the hot-shingle posting lists of the dedup family.
SKEW_QUERIES = [
    "supplier_pagerank",
    "supplier_triangles",
    "part_association_rules",
    "session_window_stats",
    "user_sessions",
    "top_revenue_orders",
    "top_supplier_per_nation_week",
    "pps_orders_sample",
    "uniform_k_sample",
    "event_transition_matrix",
    "customer_value_ewma",
    "km_reorder_survival",
    "cohort_retention",
    "segment_order_stats",
    "pricing_summary",
    "nation_revenue",
    "asof_purchase_click",
    "asof_nearest_click",
    "minhash_lsh_neardups",
    "benchmark_decontamination",
    "tfidf_top_terms",
    "holt_weekly_forecast",
    "key_skew_profile",
    "stratified_group_sample",
    "scd2_priority_history",
    "cuped_adjusted_metrics",
]


def test_queries_match_oracles_on_hot_keys(spark, tmp_path_factory, monkeypatch):
    """Hot-key skew contract: inject key-unique-preserving mass
    concentrations (one order with 120 suppliers — past the declared
    MAX_COOCCUR_SET=64 cap, plus orders at exactly 64 and 65; one
    customer with 240 orders; one user with a 600-event stream and a
    same-microsecond burst; 15 docs sharing a hot shingle) and require
    every skew-sensitive query to still match its own oracle. This is
    what makes the cap a DECLARED semantic rather than a silent
    truncation: the fixed tables never reach the cap (≤7 suppliers per
    order at every SF), so without this class the capped branch of the
    fan-out had no differential evidence."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_skew_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_skew_sf"))
    _mutate(5, out_dir, rate=60, skew=True)

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in SKEW_QUERIES:
        got = qs[name](spark, out_dir).toPandas()
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"spark/oracle divergence on hot-key data: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry sweep (~3 min): set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_mutated_tables(
    spark, tmp_path_factory, monkeypatch
):
    """The opt-in exhaustive form of the battery above: EVERY registered
    query against its own oracle on the mutated seed. This sweep is what
    caught the round-6 empty-input bugs (doc_quality_by_lang ANSI
    divide-by-zero, multimodal_byte_stats empty-blob semantics)."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_all_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_all_sf"))
    _mutate(11, out_dir, 60)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        got = qs[name](spark, out_dir).toPandas()
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append(name)
    assert not bad, f"divergence on mutated data: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry hot-key sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_hot_keys(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the hot-key battery: EVERY registered query
    on the skew-injected tables must match its oracle (no-oracle rows
    must at least execute) — the tail is where per-key collected state
    (collect_list buffers, band buckets, per-group pandas folds) meets
    a hot key without differential evidence otherwise."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_skew_all_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_skew_all_sf"))
    _mutate(5, out_dir, rate=60, skew=True)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"divergence on hot-key data: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry empty sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_survives_empty_fact_tables(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the empty-fact-tables battery: EVERY registered
    query on zero-row fact tables must match its oracle (or, for the
    no-oracle streaming/serve rows, at least execute to a DataFrame) —
    the tail of the registry is where empty-input crashes hide: empty
    k-means cells, empty pagerank edge lists, empty persisted-index
    builds, empty BPE corpora."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_empty_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_empty_all_sf"))
    _mutate(0, out_dir, rate=0, inject=False)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"divergence on empty fact tables: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry duplicate-rows sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_duplicate_rows(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the duplicate-row inflation battery: EVERY
    registered query (minus the structurally-excluded vid-keyed-oracle
    rows, see _dup_excluded) on
    fact tables with exact-copy duplicate rows must match its oracle —
    join multiplicity, count-vs-distinct, rank/percentile ties, dedup
    pair emission, and frequency-weighted driver-held codebooks all
    change under duplication, and the engine must change WITH its
    declared semantics."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_dup_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_dup_all_sf"))
    _mutate(13, out_dir, rate=100, inject=False, dup=True)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        if _dup_excluded(name, osql):
            continue
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"divergence on duplicate-inflated data: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry negative-measures sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_negated_measures(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the negative-measures battery: EVERY
    registered query on fact tables where ~25% of each measure
    column's values are sign-flipped (refunds/chargebacks/corrections)
    must match its oracle — log/sqrt domain edges (NaN vs NULL), sums
    crossing zero, magnitude-assuming buckets/ratios, winsorization
    bounds, and drift metrics over signed distributions."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_neg_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_neg_all_sf"))
    _mutate(7, out_dir, rate=100, inject=False, measures_negate=True)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"divergence on sign-flipped measures: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry orphan-dims sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_orphan_dims(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the orphan-FK battery: EVERY registered query
    on DIM/parent tables sampled to ~55% (one nation dropped outright)
    while fact tables stay intact must match its oracle — dangling
    o_custkey / l_partkey / l_suppkey / nationkey chains flip the
    result of any plan that assumed referential integrity (an inner
    join where the declared semantics are left, a dim-keyed codebook
    that silently drops unknown keys, a spine built from the dim side).
    Both engines read the same parquet, so a divergence is the engine
    disagreeing with its own oracle, not dirty data."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_orph_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_orph_all_sf"))
    _mutate(3, out_dir, rate=100, inject=False, dims_orphan=True)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"divergence on orphan-FK dims: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry singleton-facts sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_singleton_facts(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the singleton-fact-tables battery: EVERY
    registered query on exactly-one-row fact tables must match its
    oracle — the boundary the empty-input class misses: n=1 sample
    variances and correlations, one-point regression/Zipf/Heaps fits,
    single-doc corpora through BPE/LM/minhash, 0/0 ratios whose
    denominators are counts-minus-one rather than counts. This class
    found the six ANSI DIVIDE_BY_ZERO crashes fixed in round 9
    (kappa/mcc, CUPED θ, SMD, KS with one empty sample, undefined AUC,
    degenerate histogram width — all now try_divide, mirroring the
    oracle's x/0 → NULL)."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_single_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_single_all_sf"))
    _mutate(0, out_dir, inject=False, single=True)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"divergence on singleton fact tables: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry all-NULL-measure sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_all_null_measures(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the all-NULL-measure battery: EVERY registered
    query on fact tables whose measure columns are entirely NULL must
    match its oracle — the aggregate-degradation boundary the row-level
    NULL class misses: undefined global means/breakpoints, recursions
    fed only NULLs, scores that vanish while the group spine remains.
    Found the impute_mean_acctbal KeyError (undefined mean) and
    holt_weekly_forecast emitting NULL-fitted rows the oracle drops
    (round 8; both fixed in round 9)."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_allnull_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_allnull_all_sf"))
    _mutate(0, out_dir, rate=100, inject=False, measures_null=True)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"divergence on all-NULL measures: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry row-order sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_reversed_rows(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the row-order-invariance battery: EVERY
    registered query on fact tables written in reversed row order must
    match its oracle — the same multiset, so any divergence is an
    implicit scan-order dependence (unsorted collect_list folds,
    first() without ordering, underspecified tie-breaks) that becomes a
    wrong answer at cluster scale where partition order is arbitrary.
    Round-8 certification: 165/165 green, zero order-dependent plans."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_reorder_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_reorder_all_sf"))
    _mutate(0, out_dir, rate=100, inject=False, reorder=True)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"scan-order dependence on reversed rows: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry unicode-docs sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_unicode_docs(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the unicode-corpus battery: EVERY registered
    query with the multilingual stress corpus appended to documents
    (facts otherwise intact) must match its oracle — CJK/Thai no-space
    lines, RTL scripts, combining marks, ZWJ emoji and astral-plane
    code points, Unicode whitespace, fullwidth forms (including the
    BPE delimiter in fullwidth), case-fold traps, control chars, and
    non-ASCII group keys. Divergences here are cross-engine
    expression-semantics holes (Java regex vs RE2 character classes,
    byte- vs codepoint-length, locale-sensitive casing) — the bug
    class that silently corrupts dedup/tokenize/fingerprint output on
    the non-English shards of a real multilingual corpus."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_uni_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_uni_all_sf"))
    _mutate(0, out_dir, rate=100, inject=False, unicode_docs=True)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"divergence on unicode corpus: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry control-chars sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_ctrl_docs(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the control/delimiter-characters battery:
    EVERY registered query with the ASCII-adversarial corpus appended
    to documents (facts otherwise intact) must match its oracle — the
    engine's own BPE delimiter embedded in raw text, CRLF/tab/multi-
    space whitespace, regex metacharacters through the PII-scrub and
    fingerprint regexp paths, a 500-char single token, empty and
    whitespace-only docs, an embedded NUL byte, zero-width space and
    combining-vs-precomposed pairs, ZWJ emoji. First sweep (round 10,
    frozen tree): 165/165 green, zero exclusions."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_ctrl_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_ctrl_all_sf"))
    _mutate(0, out_dir, rate=100, inject=False, ctrl_docs=True)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"divergence on control-chars corpus: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry constant-measures sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_constant_measures(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the zero-variance battery: EVERY registered
    query on fact tables whose measure columns are one constant value
    in all rows must match its oracle — the degenerate-denominator
    boundary the singleton class (n=1) misses: stddev=0 z-scores with
    n in the thousands, corr 0/0, ten identical decile breakpoints,
    KS over two identical samples, a one-value AUC/Gini score grid,
    winsorization bounds that coincide, zero-width histograms."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_const_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_const_all_sf"))
    _mutate(0, out_dir, rate=100, inject=False, measures_const=True)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"divergence on constant measures: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry long-docs sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_long_docs(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the long-documents battery: EVERY registered
    query with 30k-45k-token (~200-300 KB) documents appended must
    match its oracle — shingle explosion, chunk fan-out, per-doc token
    aggregation at volume, exact dedup of big bodies, and integer-ratio
    rounding grids (found the 2598/40000 printed-half-grid ratio where
    Spark's BigDecimal-HALF_UP round() and DuckDB's binary round()
    disagree; doc_repetition_quality now uses the cross-engine-exact
    floor-shift)."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_long_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_long_all_sf"))
    _mutate(0, out_dir, rate=100, inject=False, long_docs=True)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"divergence on long documents: {bad}"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FUZZ_ALL"),
    reason="full-registry temporal-inversion sweep: set SPARK_GRAFT_FUZZ_ALL=1",
)
def test_every_registered_query_matches_oracle_on_inverted_dates(
    spark, tmp_path_factory, monkeypatch
):
    """Exhaustive form of the temporal-inversion battery: EVERY
    registered query on fact tables where ~25% of event times are
    shifted far out of causal order (shipments dated 400 days before
    their orders, events 2 years before the user's first order,
    orders dated a year after their own lineitems) must match its
    oracle — backdated corrections and clock skew are normal warehouse
    data, and they stress signed date arithmetic, as-of joins whose
    "previous" row is in the future, survival/retention spines with
    negative offsets, and window frames over inverted time."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("fuzz_tinv_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp("fuzz_tinv_all_sf"))
    _mutate(9, out_dir, rate=100, inject=False, dates_invert=True)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in qs:
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"divergence on inverted dates: {bad}"


# ---------------------------------------------------------------------------
# Rotating default-on cross-section of the three exhaustive sweeps
# (VERDICT r7 item 6): the SPARK_GRAFT_FUZZ_ALL sweeps above cover the
# whole registry but only run when the env var is set. This battery
# runs WITHOUT env vars on every `pytest tests/` invocation: a
# deterministic 15-query slice per contract class, keyed by the round
# number (count of driver CORRECTNESS files), with per-class offsets so
# the three classes cover different registry slices each round. Over
# ceil(165/15) = 11 rounds each class sweeps the full registry.
# ---------------------------------------------------------------------------
def _round_number() -> int:
    """Round counter for slice rotation, keyed on COMMITTED state
    (`git ls-files`) so the slice a CI run exercises is a function of
    the checkout's commit, not of untracked local artifacts (ADVICE r8:
    a freshly-dropped, not-yet-committed CORRECTNESS file made the
    slice differ between this tree and a fresh clone). Falls back to a
    working-tree glob when git is unavailable."""
    import glob
    import subprocess

    import __spark_entry__ as entrymod

    repo = os.path.dirname(os.path.abspath(entrymod.__file__))
    try:
        out = subprocess.run(
            ["git", "-C", repo, "ls-files", "CORRECTNESS_r*.json"],
            capture_output=True,
            text=True,
            timeout=30,
        )
        if out.returncode == 0 and out.stdout.strip():
            return len(out.stdout.split()) + 1
    except (OSError, subprocess.SubprocessError):
        pass
    return len(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))) + 1


def _rotating_slice(names: list[str], offset: int, k: int = 15) -> list[str]:
    names = sorted(names)
    start = (_round_number() * k + offset) % len(names)
    return [names[(start + i) % len(names)] for i in range(k)]


@pytest.mark.parametrize(
    "klass,offset",
    [
        ("mutated", 0),
        ("hot-keys", 55),
        ("empty-facts", 110),
        ("dup-rows", 82),
        ("single-facts", 137),
        ("all-null-measures", 29),
        ("reversed-rows", 101),
        ("orphan-dims", 17),
        ("negated-measures", 123),
        ("unicode-docs", 44),
        ("constant-measures", 66),
        ("inverted-dates", 148),
        ("long-docs", 91),
        ("ctrl-docs", 73),
    ],
)
def test_rotating_registry_slice_matches_oracle(
    spark, tmp_path_factory, monkeypatch, klass, offset
):
    """Default-on rotating cross-section: 15 registered queries per
    contract class (NULL-heavy mutation / hot-key skew / empty fact
    tables / duplicate-row inflation / singleton fact tables / all-NULL
    measures / reversed row order / orphan-FK dims / sign-flipped
    measures / unicode corpus / zero-variance constant measures /
    temporal inversion / long documents / control-delimiter chars)
    against their own oracles, slice advancing with the round number —
    every CI run exercises all
    fourteen classes against fresh registry slices with zero env vars. The
    exhaustive twin sweeps remain available via SPARK_GRAFT_FUZZ_ALL=1.
    The dup-rows class skips the structurally-detected vid-keyed-oracle
    rows (see _dup_excluded above)."""
    import __spark_entry__ as entrymod

    monkeypatch.setenv(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp(f"rot_{offset}_wh"))
    )
    out_dir = str(tmp_path_factory.mktemp(f"rot_{offset}_sf"))
    if klass == "mutated":
        _mutate(11, out_dir, 60)
    elif klass == "hot-keys":
        _mutate(5, out_dir, rate=60, skew=True)
    elif klass == "dup-rows":
        _mutate(13, out_dir, rate=100, inject=False, dup=True)
    elif klass == "single-facts":
        _mutate(0, out_dir, inject=False, single=True)
    elif klass == "all-null-measures":
        _mutate(0, out_dir, rate=100, inject=False, measures_null=True)
    elif klass == "reversed-rows":
        _mutate(0, out_dir, rate=100, inject=False, reorder=True)
    elif klass == "orphan-dims":
        _mutate(3, out_dir, rate=100, inject=False, dims_orphan=True)
    elif klass == "negated-measures":
        _mutate(7, out_dir, rate=100, inject=False, measures_negate=True)
    elif klass == "unicode-docs":
        _mutate(0, out_dir, rate=100, inject=False, unicode_docs=True)
    elif klass == "constant-measures":
        _mutate(0, out_dir, rate=100, inject=False, measures_const=True)
    elif klass == "inverted-dates":
        _mutate(9, out_dir, rate=100, inject=False, dates_invert=True)
    elif klass == "long-docs":
        _mutate(0, out_dir, rate=100, inject=False, long_docs=True)
    elif klass == "ctrl-docs":
        _mutate(0, out_dir, rate=100, inject=False, ctrl_docs=True)
    else:
        _mutate(0, out_dir, rate=0, inject=False)

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{out_dir}/{name}.parquet')"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    picked = _rotating_slice(list(qs), offset)
    bad = []
    for name in picked:
        if klass == "dup-rows" and _dup_excluded(name, osql):
            continue
        try:
            got = qs[name](spark, out_dir).toPandas()
        except Exception as exc:  # crash IS the divergence
            bad.append((name, f"spark raised: {type(exc).__name__}"))
            continue
        if name not in osql:
            continue
        want = con.execute(osql[name]).fetchdf()
        g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
        w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
        if g != w:
            bad.append((name, len(g), len(w)))
    assert not bad, f"[{klass}] rotating-slice divergence (round {_round_number()}): {bad}"
