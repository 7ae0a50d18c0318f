"""Staged DuckDB re-encodings of the four sf1-resource-bound oracles
(VERDICT r10 item 4) — harness-side only; the REGISTERED oracles (the
driver's sf0.01 gate) are untouched.

Why: the registered encodings are inline-iteration / recursive-closure
CTEs. DuckDB re-inlines multiply-referenced CTEs, so at 6M rows the
pagerank oracle recomputes its DISTINCT self-join edge build once per
consumer (measured 59 GB of temp spill, round 10), the triangles oracle
evaluates the wedge join three times (one per UNION ALL corner), and
the golden-records recursive closure materializes Σ|component|²
reachability rows on near-complete components. Each override stages
the shared relations as per-cursor TEMP TABLES and replaces recursion
with bounded iteration — the SAME arithmetic, join conditions, caps,
and rounding as the registered SQL, line for line where possible.

Every override runs on a fresh cursor (temp tables are session-scoped;
a poisoned interrupt dies with the cursor) with a per-statement
watchdog; heavy declared steps get an explicit larger budget.
"""

from __future__ import annotations

import threading

from mle_proj_datapipeline_spark.operators.graph import MAX_COOCCUR_SET

_PR_ITERS = 5  # mirrors plans/graph_queries._PR_ITERS


def _run(cur, sql: str, timeout_s: int = 240):
    """Execute one statement with an interrupt watchdog (lock-guarded
    so a timer firing after completion cannot poison the next step)."""
    state = {"done": False}
    lock = threading.Lock()

    def _interrupt():
        with lock:
            if not state["done"]:
                cur.interrupt()

    timer = threading.Timer(timeout_s, _interrupt)
    timer.start()
    try:
        return cur.execute(sql)
    finally:
        with lock:
            state["done"] = True
        timer.cancel()


def _kept_sql(val: str, out: str) -> str:
    """Temp-table twin of graph_queries._kept_cte: per order, only the
    MAX_COOCCUR_SET smallest members participate in pair fan-out."""
    return f"""
    CREATE TEMP TABLE {out} AS
    SELECT l_orderkey, {val} FROM (
        SELECT l_orderkey, {val},
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY {val}) AS rn
        FROM (SELECT DISTINCT l_orderkey, {val} FROM lineitem))
    WHERE rn <= {MAX_COOCCUR_SET}"""


def pagerank_oracle(con):
    """Staged twin of graph_queries._pagerank_oracle(): identical
    recurrence (teleport 0.15/n, damping 0.85, symmetric capped
    co-occurrence edges, |V| = non-isolated nodes, round(r, 6)) with
    the edge build and each power-iteration frame as temp tables."""
    cur = con.cursor()
    try:
        _run(cur, _kept_sql("l_suppkey", "pr_kept"), 600)
        _run(cur, """
            CREATE TEMP TABLE pr_e AS
            SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
            FROM pr_kept a JOIN pr_kept b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey <> b.l_suppkey""", 600)
        _run(cur, "CREATE TEMP TABLE pr_deg AS SELECT src, count(*) AS deg FROM pr_e GROUP BY 1")
        _run(cur, "CREATE TEMP TABLE pr_v AS SELECT DISTINCT src AS node FROM pr_e")
        _run(cur, "CREATE TEMP TABLE pr_nn AS SELECT count(*) AS n FROM pr_v")
        _run(cur, """
            CREATE TEMP TABLE pr_r0 AS
            SELECT node, 1.0 / nn.n AS r FROM pr_v CROSS JOIN pr_nn nn""")
        for k in range(1, _PR_ITERS + 1):
            _run(cur, f"""
                CREATE TEMP TABLE pr_c{k} AS
                SELECT e.dst AS node, sum(p.r / deg.deg) AS m
                FROM pr_e e JOIN pr_r{k - 1} p ON e.src = p.node
                            JOIN pr_deg deg ON deg.src = e.src
                GROUP BY e.dst""", 600)
            _run(cur, f"""
                CREATE TEMP TABLE pr_r{k} AS
                SELECT v.node, 0.15 / nn.n + 0.85 * coalesce(c.m, 0) AS r
                FROM pr_v v CROSS JOIN pr_nn nn
                LEFT JOIN pr_c{k} c ON c.node = v.node""")
        return _run(
            cur,
            f"SELECT node AS s_suppkey, round(r, 6) AS pr FROM pr_r{_PR_ITERS}",
        ).fetchdf()
    finally:
        cur.close()


def triangles_oracle(con):
    """Staged twin of the supplier_triangles oracle: same capped edge
    set (u < v), same exact triangle enumeration — but the edge build
    is a temp table and the three per-corner projections ride ONE
    pipelined pass (unnest of the corner list) instead of re-evaluating
    the wedge join per UNION ALL branch."""
    cur = con.cursor()
    try:
        _run(cur, _kept_sql("l_suppkey", "tr_kept"), 600)
        _run(cur, """
            CREATE TEMP TABLE tr_e AS
            SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
            FROM tr_kept a JOIN tr_kept b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_suppkey < b.l_suppkey""", 600)
        return _run(cur, """
            SELECT node AS s_suppkey, CAST(count(*) AS BIGINT) AS n_triangles
            FROM (
                SELECT unnest([e1.u, e1.v, e2.v]) AS node
                FROM tr_e e1 JOIN tr_e e2 ON e2.u = e1.v
                             JOIN tr_e e3 ON e3.u = e1.u AND e3.v = e2.v)
            GROUP BY node
            ORDER BY n_triangles DESC, node LIMIT 25""", 1200).fetchdf()
    finally:
        cur.close()


def golden_records_oracle(con):
    """Staged twin of the customer_golden_records oracle: IDENTICAL
    pair definition (same nation, same name length, levenshtein <= 2 —
    the registered oracle's block join, kept for independence from the
    engine's SymSpell blocker), with the recursive reachability closure
    (Σ|component|² rows on near-complete components) replaced by
    iterative min-label propagation to a fixpoint — the same MIN(node)
    per component, in O(rounds × |E|) instead of O(Σ|comp|²)."""
    cur = con.cursor()
    try:
        _run(cur, """
            CREATE TEMP TABLE gr_b AS
            SELECT c_custkey, c_name, c_acctbal, c_nationkey,
                   length(c_name) AS ln
            FROM customer""")
        # the census's declared heavy step: Θ(Σ block²) levenshtein
        # verifies, ~420 s at synth sf1 — budgeted, not unbounded
        _run(cur, """
            CREATE TEMP TABLE gr_pairs AS
            SELECT x.c_custkey AS pa, y.c_custkey AS pb
            FROM gr_b x JOIN gr_b y
              ON x.c_nationkey = y.c_nationkey AND x.ln = y.ln
             AND x.c_custkey < y.c_custkey
            WHERE levenshtein(x.c_name, y.c_name) <= 2""", 1200)
        _run(cur, """
            CREATE TEMP TABLE gr_edges AS
            SELECT pa AS a, pb AS e FROM gr_pairs
            UNION ALL SELECT pb, pa FROM gr_pairs""")
        _run(cur, """
            CREATE TEMP TABLE gr_lbl AS
            SELECT DISTINCT a AS node, a AS lbl FROM gr_edges""")
        for _ in range(64):  # >= graph diameter; fixpoint-checked
            _run(cur, """
                CREATE TEMP TABLE gr_next AS
                SELECT l.node, least(l.lbl, coalesce(m.mn, l.lbl)) AS lbl
                FROM gr_lbl l LEFT JOIN (
                    SELECT e.e AS node, min(l2.lbl) AS mn
                    FROM gr_edges e JOIN gr_lbl l2 ON l2.node = e.a
                    GROUP BY e.e) m ON m.node = l.node""", 600)
            changed = _run(cur, """
                SELECT count(*) FROM gr_lbl l JOIN gr_next n USING (node)
                WHERE l.lbl <> n.lbl""").fetchone()[0]
            _run(cur, "DROP TABLE gr_lbl")
            _run(cur, "ALTER TABLE gr_next RENAME TO gr_lbl")
            if changed == 0:
                break
        else:
            raise RuntimeError("min-label propagation did not converge in 64 rounds")
        return _run(cur, """
            WITH enr AS (
                SELECT l.lbl AS cluster_id, c.c_custkey, c.c_name, c.c_acctbal
                FROM gr_lbl l JOIN customer c ON c.c_custkey = l.node),
            agg AS (
                SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
                       round(sum(c_acctbal), 2) AS total_acctbal
                FROM enr GROUP BY cluster_id),
            surv AS (
                SELECT cluster_id, c_custkey AS survivor_key,
                       c_name AS survivor_name
                FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                          ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
                      FROM enr) t
                WHERE rn = 1)
            SELECT agg.cluster_id, n_members, total_acctbal,
                   survivor_key, survivor_name
            FROM agg JOIN surv ON agg.cluster_id = surv.cluster_id""", 600).fetchdf()
    finally:
        cur.close()


OVERRIDES = {
    "supplier_pagerank": pagerank_oracle,
    "supplier_pagerank_served": pagerank_oracle,
    "supplier_triangles": triangles_oracle,
    "customer_golden_records": golden_records_oracle,
}
