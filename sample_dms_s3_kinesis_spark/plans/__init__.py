from sample_dms_s3_kinesis_spark.plans.registry import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
