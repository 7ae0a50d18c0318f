"""In-flight pipeline observability via ``Dataset.observe``.

A 100 TB pipeline cannot afford a second scan just to know what it
wrote (the reference logs counts by re-counting: a full extra pass per
metric). ``observe`` attaches named aggregate metrics to the plan
itself — they are computed ON THE SAME PASS as the action, as
accumulator-style partial aggregates riding the action's own tasks
(no second scan, no extra shuffle, no driver collect of data), and
surfaced through PySpark's ``Observation`` handle (batch) or progress
events (streaming).

``observed_write`` wraps the common case: run a write with declared
metrics (row counts, null counts, sums — any observe-compatible
aggregate) and return them, so quality gates (e.g. "null rate jumped")
run against numbers the write itself produced rather than a re-read
that might see different data. Policy (what to do when a metric trips)
stays with the caller; this is the mechanism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed_write(
    df: DataFrame,
    metrics: dict[str, Column],
    path: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    timeout_s: float = 60.0,
) -> dict:
    """Write ``df`` (or just execute it with the noop sink when ``path``
    is None) with observed metrics attached; returns {name: value}.

    ``metrics``: name -> aggregate Column (e.g. ``F.count(F.lit(1))``,
    ``F.count_if(c.isNull())``). Aggregates must be observe-compatible
    (deterministic, no distinct)."""
    obs = Observation()
    names = list(metrics)
    observed = df.observe(obs, *[metrics[n].alias(n) for n in names])
    writer = observed.write.format("noop" if path is None else fmt).mode(mode)
    if path is None:
        writer.save()
    else:
        writer.save(path)
    # Observation.get blocks until the action's metrics arrive.
    return dict(obs.get)


class ExpectationError(ValueError):
    """Raised when a write's observed metrics violate declared
    expectations. Carries the full metric report for logging/alerting."""

    def __init__(self, failures: list[str], report: dict):
        super().__init__(
            "expectations failed: " + "; ".join(failures)
        )
        self.failures = failures
        self.report = report


def enforce_expectations(
    df: DataFrame,
    rules: list[tuple[str, Column, "callable"]],
    path: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> dict:
    """Quality-gated write: run the write with each rule's metric
    observed on the write's own pass, then apply the predicates to the
    returned values. All rules are evaluated (one job, one scan, full
    report) before anything raises — so the alert shows EVERY violated
    expectation, not just the first.

    ``rules``: (name, aggregate Column, predicate(value) -> bool).
    Returns the {name: value} report on success; raises
    ExpectationError (report attached) listing every failed rule
    otherwise. Note the gate is post-hoc: the data is already written
    when it fires — pair with a versioned sink (sources/snapshots) so a
    failed commit can be rolled back / never promoted."""
    report = observed_write(
        df, {name: col for name, col, _ in rules}, path=path, fmt=fmt, mode=mode
    )
    failures = []
    for name, _, pred in rules:
        value = report.get(name)
        try:
            ok = bool(pred(value))
        except Exception as ex:  # predicate itself blew up — that's a failure
            ok = False
            failures.append(f"{name}: predicate error {ex!r} on value={value!r}")
            continue
        if not ok:
            failures.append(f"{name}: value={value!r} violates expectation")
    if failures:
        raise ExpectationError(failures, report)
    return report
