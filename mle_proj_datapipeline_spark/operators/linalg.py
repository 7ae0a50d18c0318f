"""Distributed dense linear algebra over array columns: covariance and
power iteration. No MLlib, no driver-side matrices — the covariance is
a d²-row DataFrame, the eigenvector a d-row DataFrame.

Scale design: the only data-sized pass is the covariance moment
aggregation — each row fans out to d² (i,j) cells via nested
posexplode and partial aggregation collapses them to d² running
moments per partition BEFORE the shuffle, so shuffle volume is
#partitions · d², independent of row count. For d in the thousands
swap the explode for a per-partition NumPy Gram accumulation over
mapInPandas (Arrow path); at d ≤ a few hundred the JVM explode wins.
The subsequent matvec rounds run on d²/d-row frames (one equi-join +
partial-agg groupBy each, lineage truncated per round).

Convergence note: power iteration converges at rate λ₂/λ₁ — fast when
the top eigenvalue is separated, slow on near-isotropic clouds. The
iteration is deterministic either way (fixed uniform start 1/√d, exact
in binary; fixed round count), so cross-engine parity holds even before
convergence; callers choose ``iterations`` for their spectrum.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def covariance(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Full covariance matrix of an array column as (i, j, c) rows,
    c = E[x_i x_j] − E[x_i]E[x_j]."""
    x = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "xi"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    return (
        x.select("i", "xi", F.posexplode("e").alias("j", "xj"))
        .groupBy("i", "j")
        .agg(
            F.avg(F.col("xi") * F.col("xj")).alias("exy"),
            F.avg("xi").alias("ex"),
            F.avg("xj").alias("ey"),
        )
        .select("i", "j", (F.col("exy") - F.col("ex") * F.col("ey")).alias("c"))
    )


def top_eigvec(cov: DataFrame, dim: int, iterations: int = 8) -> DataFrame:
    """Top eigenvector of a (i, j, c) covariance DataFrame by power
    iteration v ← C·v/‖C·v‖ from the exact uniform start 1/√dim.
    Returns (j, v, eigval) with the Rayleigh-quotient eigenvalue
    λ = vᵀCv (‖C·v‖ of the final round, since v is unit)."""
    cov = cov.localCheckpoint()
    v = cov.select(F.col("j")).distinct().withColumn(
        "v", F.lit(1.0 / dim ** 0.5)
    )
    w = Window.partitionBy()
    u = None
    for _ in range(iterations):
        u = (
            cov.join(v, "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("v")).alias("u"))
            .select(F.col("i").alias("j"), "u")
        )
        v = (
            u.withColumn("nrm", F.sqrt(F.sum(F.col("u") * F.col("u")).over(w)))
            .select("j", (F.col("u") / F.col("nrm")).alias("v"))
            .localCheckpoint()
        )
    eig = u.join(v, "j").select(F.sum(F.col("v") * F.col("u")).alias("eigval"))
    return v.join(F.broadcast(eig))
