from mle_proj_datapipeline_spark.plans.registry import ORACLES, QUERIES, register

__all__ = ["ORACLES", "QUERIES", "register"]
