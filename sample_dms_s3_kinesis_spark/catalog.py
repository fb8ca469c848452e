"""Catalog: external table definitions → Spark schemas + selection rules.

Reference parity:
- external table definition JSON shape: /root/reference/dms_sample/stack.py:131-169
  (``TableCount``, ``Tables[].TableName/TablePath/TableOwner/TableColumns/
  TableColumnsTotal``; column specs ``ColumnName/ColumnType/ColumnLength/
  ColumnNullable/ColumnIsPk``).
- selection rules (wildcard include/exclude over schema/table names):
  /root/reference/dms_sample/stack.py:65-78 and :239-250.

The catalog is pure metadata (no I/O, no SparkSession needed) so it is
cheap to broadcast implicitly: plan-time table selection prunes entire
S3 prefixes before any scan is planned — the moral equivalent of
partition pruning at the table level.  At 100 TB / thousands of tables
this stays O(#tables) driver-side work.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Iterable, Mapping, Sequence

from pyspark.sql import types as T

# DMS external-table-definition column types (public AWS DMS docs:
# "Using Amazon S3 as a source" → external table definition).  The
# reference itself only uses INT8 / STRING / DATETIME
# (stack.py:139-143); the rest are included for engine completeness.
_TYPE_MAP: dict[str, T.DataType] = {
    "BYTE": T.ByteType(),
    "INT1": T.ByteType(),
    "INT2": T.ShortType(),
    "INT4": T.IntegerType(),
    "INT8": T.LongType(),
    "UINT1": T.ShortType(),
    "UINT2": T.IntegerType(),
    "UINT4": T.LongType(),
    "UINT8": T.LongType(),
    "REAL4": T.FloatType(),
    "REAL8": T.DoubleType(),
    "NUMERIC": T.DecimalType(38, 10),
    "STRING": T.StringType(),
    "DATE": T.DateType(),
    "TIME": T.StringType(),
    "DATETIME": T.TimestampType(),
    "TIMESTAMP": T.TimestampType(),
    "BOOLEAN": T.BooleanType(),
    "BLOB": T.BinaryType(),
    "CLOB": T.StringType(),
    "NCLOB": T.StringType(),
}


@dataclass(frozen=True)
class ColumnSpec:
    """One ``TableColumns`` entry (stack.py:139-143)."""

    name: str
    type_name: str
    length: int | None = None
    nullable: bool = True
    is_pk: bool = False

    @classmethod
    def from_json(cls, spec: Mapping[str, str]) -> "ColumnSpec":
        return cls(
            name=spec["ColumnName"],
            type_name=spec["ColumnType"].upper(),
            length=int(spec["ColumnLength"]) if "ColumnLength" in spec else None,
            nullable=spec.get("ColumnNullable", "true").lower() != "false",
            is_pk=spec.get("ColumnIsPk", "false").lower() == "true",
        )

    @property
    def spark_type(self) -> T.DataType:
        try:
            return _TYPE_MAP[self.type_name]
        except KeyError:
            raise ValueError(f"unsupported column type {self.type_name!r}") from None

    def to_struct_field(self) -> T.StructField:
        return T.StructField(self.name, self.spark_type, nullable=self.nullable)


@dataclass(frozen=True)
class TableDef:
    """A declared table: fixed schema, S3 prefix storage, PK annotation.

    ``path`` is the table's storage prefix relative to the bucket folder
    (``TablePath``, e.g. ``hr/employee/`` — stack.py:136): the table's
    data is *all* CSV objects under ``{root}/{path}`` (run.py:162-164).
    """

    name: str
    owner: str
    path: str
    columns: tuple[ColumnSpec, ...]

    @classmethod
    def from_json(cls, tbl: Mapping) -> "TableDef":
        cols = tuple(ColumnSpec.from_json(c) for c in tbl["TableColumns"])
        declared = tbl.get("TableColumnsTotal")
        if declared is not None and int(declared) != len(cols):
            raise ValueError(
                f"table {tbl['TableName']}: TableColumnsTotal={declared} "
                f"but {len(cols)} columns declared"
            )
        return cls(
            name=tbl["TableName"],
            owner=tbl["TableOwner"],
            path=tbl["TablePath"],
            columns=cols,
        )

    @property
    def qualified_name(self) -> str:
        # partition key convention "{schema}.{table}" (stack.py:126, run.py:135)
        return f"{self.owner}.{self.name}"

    @property
    def schema(self) -> T.StructType:
        return T.StructType([c.to_struct_field() for c in self.columns])

    @property
    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    @property
    def pk_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.is_pk]

    def data_path(self, root: str) -> str:
        return f"{root.rstrip('/')}/{self.path.strip('/')}"


def _like_to_regex(pattern: str) -> re.Pattern:
    """DMS selection-rule wildcard: ``%`` matches any run of characters
    (stack.py:72-73 uses ``%`` for match-all); ``_`` matches one char,
    per SQL LIKE semantics which DMS follows."""
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out) + "$", re.IGNORECASE)


@dataclass(frozen=True)
class SelectionRule:
    """One table-mapping selection rule (stack.py:66-78)."""

    schema_pattern: str = "%"
    table_pattern: str = "%"
    action: str = "include"  # "include" | "exclude"
    rule_id: str = "1"
    rule_name: str = "rule"

    @classmethod
    def from_json(cls, rule: Mapping) -> "SelectionRule":
        if rule.get("rule-type") != "selection":
            raise ValueError(f"not a selection rule: {rule!r}")
        loc = rule.get("object-locator", {})
        return cls(
            schema_pattern=loc.get("schema-name", "%"),
            table_pattern=loc.get("table-name", "%"),
            action=rule.get("rule-action", "include"),
            rule_id=str(rule.get("rule-id", "1")),
            rule_name=rule.get("rule-name", "rule"),
        )

    def matches(self, table: TableDef) -> bool:
        return bool(
            _like_to_regex(self.schema_pattern).match(table.owner)
            and _like_to_regex(self.table_pattern).match(table.name)
        )


class Catalog:
    """Ordered collection of TableDefs keyed by (owner, name).

    Declaration order is preserved — full-load emits tables in this
    order, which makes event sequences deterministic.
    """

    def __init__(self, tables: Iterable[TableDef]):
        self._tables: dict[tuple[str, str], TableDef] = {}
        for t in tables:
            key = (t.owner, t.name)
            if key in self._tables:
                raise ValueError(f"duplicate table {t.qualified_name}")
            self._tables[key] = t

    @classmethod
    def from_external_table_definition(cls, definition: str | Mapping) -> "Catalog":
        """Parse the exact JSON shape from stack.py:131-169."""
        if isinstance(definition, str):
            definition = json.loads(definition)
        tables = [TableDef.from_json(t) for t in definition["Tables"]]
        declared = definition.get("TableCount")
        if declared is not None and int(declared) != len(tables):
            raise ValueError(
                f"TableCount={declared} but {len(tables)} tables declared"
            )
        return cls(tables)

    def __iter__(self):
        return iter(self._tables.values())

    def __len__(self) -> int:
        return len(self._tables)

    def get(self, owner: str, name: str) -> TableDef | None:
        return self._tables.get((owner, name))

    @property
    def tables(self) -> list[TableDef]:
        return list(self._tables.values())

    def select(self, rules: Sequence[SelectionRule] | Mapping) -> "Catalog":
        """Apply selection rules (O10): a table is included iff at least
        one include-rule matches it and no exclude-rule matches it.
        Table mappings JSON (``{"rules": [...]}``, stack.py:65-78) is
        accepted directly."""
        if isinstance(rules, Mapping):
            rules = [
                SelectionRule.from_json(r)
                for r in rules.get("rules", [])
                if r.get("rule-type") == "selection"
            ]
        includes = [r for r in rules if r.action == "include"]
        excludes = [r for r in rules if r.action == "exclude"]
        kept = [
            t
            for t in self._tables.values()
            if any(r.matches(t) for r in includes)
            and not any(r.matches(t) for r in excludes)
        ]
        return Catalog(kept)


# The reference's own table structure (stack.py:131-169), kept as a module
# fixture so tests and the demo pipeline share one source of truth.
REFERENCE_TABLE_DEFINITION: dict = {
    "TableCount": "3",
    "Tables": [
        {
            "TableName": "employee",
            "TablePath": "hr/employee/",
            "TableOwner": "hr",
            "TableColumns": [
                {"ColumnName": "Id", "ColumnType": "INT8", "ColumnNullable": "false", "ColumnIsPk": "true"},
                {"ColumnName": "LastName", "ColumnType": "STRING", "ColumnLength": "20"},
                {"ColumnName": "FirstName", "ColumnType": "STRING", "ColumnLength": "30"},
                {"ColumnName": "HireDate", "ColumnType": "DATETIME"},
                {"ColumnName": "OfficeLocation", "ColumnType": "STRING", "ColumnLength": "20"},
            ],
            "TableColumnsTotal": "5",
        },
        {
            "TableName": "department",
            "TablePath": "hr/department/",
            "TableOwner": "hr",
            "TableColumns": [
                {"ColumnName": "Id", "ColumnType": "INT8", "ColumnNullable": "false", "ColumnIsPk": "true"},
                {"ColumnName": "DepartmentName", "ColumnType": "STRING", "ColumnLength": "50"},
            ],
            "TableColumnsTotal": "2",
        },
        {
            "TableName": "project",
            "TablePath": "hr/project/",
            "TableOwner": "hr",
            "TableColumns": [
                {"ColumnName": "Id", "ColumnType": "INT8", "ColumnNullable": "false", "ColumnIsPk": "true"},
                {"ColumnName": "ProjectName", "ColumnType": "STRING", "ColumnLength": "50"},
                {"ColumnName": "ProjectDescription", "ColumnType": "STRING", "ColumnLength": "100"},
            ],
            "TableColumnsTotal": "3",
        },
    ],
}

ALL_TABLES_MAPPING: dict = {
    "rules": [
        {
            "rule-type": "selection",
            "rule-id": "1",
            "rule-name": "all-tables",
            "object-locator": {"schema-name": "%", "table-name": "%"},
            "rule-action": "include",
        }
    ]
}


@dataclass(frozen=True)
class SourceConfig:
    """O6: engine config resolved from the source secret payload —
    exact key names from the reference's S3Credentials TypedDict
    (run.py:64-67: bucket_name, bucket_folder, change_data).

    ``source_root``/``cdc_dir`` compose the URIs the tasks scan:
    full-load table data under ``{bucket}/{bucket_folder}/{TablePath}``
    (run.py:74-76), change files under ``{bucket}/{change_data}/``
    (run.py:193-195)."""

    bucket_name: str
    bucket_folder: str
    change_data: str
    scheme: str = "s3a"

    @classmethod
    def from_secret_payload(cls, payload: str | Mapping) -> "SourceConfig":
        data = json.loads(payload) if isinstance(payload, str) else dict(payload)
        return cls(
            bucket_name=data["bucket_name"],
            bucket_folder=data["bucket_folder"],
            change_data=data["change_data"],
            scheme=data.get("scheme", "s3a"),
        )

    @classmethod
    def from_secrets_manager(cls, client, secret_id: str) -> "SourceConfig":
        """Resolve the config from a live Secrets Manager secret — the
        reference's own wiring (run.py:69-72 reads the secret the CDK
        stack wrote at stack.py:286-295).  ``client`` is a boto3
        secretsmanager client (caller owns endpoint/credentials, so
        LocalStack/moto endpoints inject cleanly)."""
        resp = client.get_secret_value(SecretId=secret_id)
        if "SecretString" not in resp:
            raise ValueError(
                f"secret {secret_id!r} has no string payload "
                "(SecretBinary secrets are not supported — the source "
                "config is a JSON string, run.py:69-72)"
            )
        return cls.from_secret_payload(resp["SecretString"])

    def _base(self) -> str:
        # Local paths (tests) need no scheme; buckets get s3a://.
        if self.bucket_name.startswith("/"):
            return self.bucket_name.rstrip("/")
        return f"{self.scheme}://{self.bucket_name}"

    @property
    def source_root(self) -> str:
        return f"{self._base()}/{self.bucket_folder}"

    @property
    def cdc_dir(self) -> str:
        return f"{self._base()}/{self.change_data}"
