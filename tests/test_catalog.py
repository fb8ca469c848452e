"""Catalog + selection rules (SURVEY §1.1, §1.4, O10)."""

import json

import pytest
from pyspark.sql import types as T

from sample_dms_s3_kinesis_spark.catalog import (
    ALL_TABLES_MAPPING,
    Catalog,
    REFERENCE_TABLE_DEFINITION,
    SelectionRule,
    TableDef,
)


def test_parse_reference_definition(catalog):
    assert len(catalog) == 3
    names = [t.qualified_name for t in catalog]
    assert names == ["hr.employee", "hr.department", "hr.project"]


def test_employee_schema(catalog):
    emp = catalog.get("hr", "employee")
    assert emp.schema == T.StructType(
        [
            T.StructField("Id", T.LongType(), False),
            T.StructField("LastName", T.StringType(), True),
            T.StructField("FirstName", T.StringType(), True),
            T.StructField("HireDate", T.TimestampType(), True),
            T.StructField("OfficeLocation", T.StringType(), True),
        ]
    )
    assert emp.pk_columns == ["Id"]
    assert emp.data_path("s3://bkt/sourceData") == "s3://bkt/sourceData/hr/employee"


def test_parse_from_json_string(catalog):
    again = Catalog.from_external_table_definition(
        json.dumps(REFERENCE_TABLE_DEFINITION)
    )
    assert [t.qualified_name for t in again] == [t.qualified_name for t in catalog]


def test_table_count_mismatch_raises():
    bad = dict(REFERENCE_TABLE_DEFINITION, TableCount="7")
    with pytest.raises(ValueError, match="TableCount"):
        Catalog.from_external_table_definition(bad)


def test_wildcard_include_all(catalog):
    assert len(catalog.select(ALL_TABLES_MAPPING)) == 3


def test_selection_like_patterns(catalog):
    only_emp = catalog.select([SelectionRule(table_pattern="emp%")])
    assert [t.name for t in only_emp] == ["employee"]

    underscore = catalog.select([SelectionRule(table_pattern="pro_ect")])
    assert [t.name for t in underscore] == ["project"]

    nothing = catalog.select([SelectionRule(schema_pattern="finance")])
    assert len(nothing) == 0


def test_exclude_rule(catalog):
    rules = [
        SelectionRule(),  # include all
        SelectionRule(table_pattern="department", action="exclude"),
    ]
    kept = catalog.select(rules)
    assert [t.name for t in kept] == ["employee", "project"]


def test_selection_rules_from_table_mappings_json(catalog):
    mappings = {
        "rules": [
            {
                "rule-type": "selection",
                "rule-id": "1",
                "rule-name": "emps",
                "object-locator": {"schema-name": "hr", "table-name": "e%"},
                "rule-action": "include",
            }
        ]
    }
    assert [t.name for t in catalog.select(mappings)] == ["employee"]


def test_source_config_reference_keys():
    """O6: exact S3Credentials key names (run.py:64-67) resolve to the
    task scan roots (run.py:74-76, 193-195)."""
    from sample_dms_s3_kinesis_spark.catalog import SourceConfig

    cfg = SourceConfig.from_secret_payload(
        '{"bucket_name": "my-bucket", "bucket_folder": "sourceData",'
        ' "change_data": "changedata"}'
    )
    assert cfg.source_root == "s3a://my-bucket/sourceData"
    assert cfg.cdc_dir == "s3a://my-bucket/changedata"

    local = SourceConfig.from_secret_payload(
        {"bucket_name": "/tmp/x", "bucket_folder": "sourceData",
         "change_data": "changedata"}
    )
    assert local.source_root == "/tmp/x/sourceData"
    assert local.cdc_dir == "/tmp/x/changedata"
