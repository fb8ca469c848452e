from sample_dms_s3_kinesis_spark.streaming.cdc_task import CdcTask

__all__ = ["CdcTask"]
