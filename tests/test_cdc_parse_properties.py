"""Property test: CDC line parsing + routing conserves rows — every
input line (including garbage) lands in exactly one channel: a routed
table, the alter stream, or the unknown/exceptions remainder.  A lost
or double-counted line would mean silent data loss or duplicate apply
in the replication path."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.sources.cdc_source import (
    parse_cdc_lines,
    route_changes,
)

# line fragments: valid ops, junk ops, valid/unknown tables, stray
# commas, empty fields — the space of things a malformed CDC drop
# can contain
_ops = st.sampled_from(
    ["INSERT", "UPDATE", "DELETE", "ALTER", "insert", "FROB", "", "  "]
)
_tables = st.sampled_from(
    ["employee", "department", "project", "nosuch", "", "x,y"]
)
_schemas = st.sampled_from(["hr", "finance", ""])
_payload = st.lists(
    st.text(
        alphabet="abc123 ",
        max_size=8,
    ).map(lambda s: s.replace(",", " ")),
    max_size=4,
)


@st.composite
def _line(draw):
    parts = [draw(_ops), draw(_tables), draw(_schemas)] + draw(_payload)
    return ",".join(parts)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=st.lists(_line(), min_size=1, max_size=30))
def test_every_line_lands_in_exactly_one_channel(spark, catalog, lines):
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    parsed = parse_cdc_lines(df)
    total = parsed.count()
    assert total == len(lines)  # parsing never drops or splits lines

    is_alter = F.col("op") == F.lit("ALTER")
    alters = parsed.filter(is_alter).count()
    routed, unknown = route_changes(parsed.filter(~is_alter), catalog)
    routed_n = sum(df.count() for df in routed.values())
    unknown_n = unknown.count()
    assert routed_n + unknown_n + alters == total
