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


# ALTER-specific fragments: known/unknown tables, supported/unsupported/
# missing alter-op tokens, truncated lines — the space of things an
# ALTER drop can contain (including the payload-less
# 'ALTER,department,hr' whose NULL operation once vanished from both
# channels).
_alter_ops = st.sampled_from(
    ["rename-table", "add-column", "drop-column", "truncate-table",
     "RENAME-TABLE", " add-column ", "frob", "", "  "]
)
_alter_detail = st.lists(
    st.text(alphabet="xyz9 ", max_size=6).map(lambda s: s.replace(",", " ")),
    max_size=2,
)


@st.composite
def _alter_line(draw):
    parts = ["ALTER", draw(_tables), draw(_schemas)]
    # sometimes truncate before the alter-op token entirely
    if draw(st.booleans()):
        parts.append(draw(_alter_ops))
        parts.extend(draw(_alter_detail))
    return ",".join(parts)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=st.lists(_alter_line(), min_size=1, max_size=30))
def test_every_alter_row_lands_in_exactly_one_channel(spark, catalog, lines):
    """split_alter_rows conserves rows: every parsed ALTER line becomes
    exactly one supported control row or one exception row — garbage
    and truncated lines (NULL table/schema/operation) must flow to the
    exceptions channel, never vanish."""
    from sample_dms_s3_kinesis_spark.streaming.cdc_task import split_alter_rows

    df = spark.createDataFrame([(l,) for l in lines], "value string")
    parsed = parse_cdc_lines(df)
    alters = parsed.filter(F.col("op") == F.lit("ALTER"))
    n_alters = alters.count()
    assert n_alters == len(lines)  # every generated line parses as ALTER

    supported, exceptions = split_alter_rows(alters, catalog, "prop-task")
    n_supported = supported.count()
    n_exceptions = exceptions.count()
    assert n_supported + n_exceptions == n_alters

    # channel correctness, checked against a Python model of the split
    known = {("hr", "employee"), ("hr", "department"), ("hr", "project")}
    ok_ops = {"rename-table", "add-column", "drop-column"}
    exp_supported = 0
    for line in lines:
        parts = line.split(",")
        table = parts[1].strip() if len(parts) > 1 else None
        schema = parts[2].strip() if len(parts) > 2 else None
        op = parts[3].strip().lower() if len(parts) > 3 else None
        if (schema, table) in known and op in ok_ops:
            exp_supported += 1
    assert n_supported == exp_supported
