"""Storage-layout operators: range clustering gives non-overlapping
per-file key ranges (the pruning precondition); compaction bin-packs
to the target size and preserves data."""

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sample_dms_s3_kinesis_spark.operators import layout
from tdata import sf_dir


def _part_files(path):
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )


def _file_range(path, col):
    """(min, max) of ``col`` across a parquet file's row groups."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.names.index(col)
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        mins.append(st.min)
        maxs.append(st.max)
    return min(mins), max(maxs)


def test_range_clustered_files_have_disjoint_sorted_ranges(spark, tmp_path):
    df = (
        spark.range(0, 50_000)
        .withColumnRenamed("id", "k")
        .withColumn("k", F.xxhash64("k") % 1_000_000)  # unsorted input
        .withColumn("payload", F.concat(F.lit("v"), F.col("k")))
    )
    out = str(tmp_path / "clustered")
    layout.write_range_clustered(df, out, cluster_cols=["k"], num_files=8)

    files = _part_files(out)
    assert len(files) == 8
    ranges = sorted(_file_range(f, "k") for f in files)
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert lo_a <= hi_a < lo_b  # non-overlapping, ordered

    # data preserved
    assert spark.read.parquet(out).count() == 50_000


def test_compaction_binpacks_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    # 64 tiny files
    spark.range(0, 20_000).withColumnRenamed("id", "k").repartition(64).write.parquet(src)
    assert len(_part_files(src)) == 64

    dst = str(tmp_path / "compacted")
    n = layout.compact_small_files(spark, src, dst, target_file_mb=1)
    files = _part_files(dst)
    assert len(files) == n < 64
    got = {r["k"] for r in spark.read.parquet(dst).collect()}
    assert got == set(range(20_000))

    # convergence: compacting the compacted dir plans the same count
    dst2 = str(tmp_path / "compacted2")
    n2 = layout.compact_small_files(spark, dst, dst2, target_file_mb=1)
    assert abs(n2 - n) <= 1


def test_compaction_with_clustering_restores_sort(spark, tmp_path):
    src = str(tmp_path / "messy")
    df = (
        spark.range(0, 30_000)
        .withColumnRenamed("id", "k")
        .withColumn("k", F.xxhash64("k") % 100_000)
    )
    df.repartition(32).write.parquet(src)

    dst = str(tmp_path / "tidy")
    layout.compact_small_files(
        spark, src, dst, target_file_mb=1, cluster_cols=["k"]
    )
    files = _part_files(dst)
    if len(files) > 1:
        ranges = sorted(_file_range(f, "k") for f in files)
        for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
            assert hi_a < lo_b


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    # Two independent uniform dims: x-only range clustering prunes x
    # but leaves every file covering the full y range; z-order bounds
    # BOTH dims per file.
    df = (
        spark.range(0, 40_000)
        .withColumn("x", F.pmod(F.xxhash64("id"), F.lit(1024)).cast("long"))
        .withColumn("y", F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1024)).cast("long"))
        .drop("id")
    )
    zdir = str(tmp_path / "zorder")
    layout.write_zorder_clustered(df, zdir, cluster_cols=["x", "y"], num_files=16)
    rdir = str(tmp_path / "xrange")
    layout.write_range_clustered(df, rdir, cluster_cols=["x"], num_files=16)

    def hit_count(files, col, lo, hi):
        n = 0
        for f in files:
            flo, fhi = _file_range(f, col)
            if not (fhi < lo or flo > hi):
                n += 1
        return n

    zfiles, rfiles = _part_files(zdir), _part_files(rdir)
    assert len(zfiles) == 16 and len(rfiles) == 16
    # Narrow slice in each dimension (1/8 of the domain).
    z_x, z_y = hit_count(zfiles, "x", 0, 127), hit_count(zfiles, "y", 0, 127)
    r_x, r_y = hit_count(rfiles, "x", 0, 127), hit_count(rfiles, "y", 0, 127)
    assert r_x <= 4            # range clustering prunes its own key well
    assert r_y == 16           # ...and the second dim not at all
    assert z_x < 16 and z_y < 16  # z-order bounds both dims
    assert z_x <= 8 and z_y <= 8  # meaningfully, not marginally

    # Data round-trips exactly.
    got = {(r["x"], r["y"]) for r in spark.read.parquet(zdir).collect()}
    want = {(r["x"], r["y"]) for r in df.collect()}
    assert got == want


def test_zorder_requires_two_columns(spark, tmp_path):
    import pytest as _pytest

    df = spark.range(0, 10).withColumn("x", F.col("id")).withColumn("y", F.col("id"))
    with _pytest.raises(ValueError):
        layout.write_zorder_clustered(
            df, str(tmp_path / "z"), cluster_cols=["x"], num_files=2
        )


def test_skipping_report_clustered_vs_unclustered(spark, tmp_path):
    from sample_dms_s3_kinesis_spark.operators.layout import (
        skipping_report,
        write_range_clustered,
    )

    docs = spark.read.parquet(f"{sf_dir('0.001')}/documents.parquet")
    flat = str(tmp_path / "flat")
    clustered = str(tmp_path / "clustered")
    # unclustered: shuffle rows so every small row group straddles the
    # predicate; force many row groups via tiny groups
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    (
        docs.orderBy(F.md5(F.col("doc_id").cast("string")))
        .repartition(8)
        .write.option("parquet.block.size", 4096)
        .parquet(flat)
    )
    write_range_clustered(
        docs, clustered, cluster_cols=["n_chars"], num_files=8
    )
    lo, hi = 0, 120  # a selective range on n_chars
    r_flat = skipping_report(flat, "n_chars", lo=lo, hi=hi)
    r_clu = skipping_report(clustered, "n_chars", lo=lo, hi=hi)
    assert r_flat["row_groups"] > 0 and r_clu["row_groups"] > 0
    # clustering must strictly improve skipping for the range predicate
    assert r_clu["skip_fraction"] > (r_flat["skip_fraction"] or 0.0)
    # sanity: skipped rows can never exceed total
    for r in (r_flat, r_clu):
        assert 0 <= r["rows_skippable"] <= r["rows_total"]
    # an unbounded predicate skips nothing
    assert skipping_report(flat, "n_chars")["skippable"] == 0


def test_skipping_report_unknown_column(spark, tmp_path):
    import pytest as _pytest

    from sample_dms_s3_kinesis_spark.operators.layout import skipping_report

    docs = spark.read.parquet(f"{sf_dir('0.001')}/documents.parquet")
    p = str(tmp_path / "d")
    docs.write.parquet(p)
    with _pytest.raises(ValueError):
        skipping_report(p, "nope")
