from mle_proj_datapipeline_spark.operators.impute import (
    ImputeSpec,
    add_missing_flags,
    compute_means,
    compute_modes,
    impute,
)

__all__ = [
    "ImputeSpec",
    "add_missing_flags",
    "compute_means",
    "compute_modes",
    "impute",
]
