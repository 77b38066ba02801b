"""Z-order layout (operators/zorder.py): interleave correctness on
known values, and the measured payoff — per-file min/max envelopes
prune box queries on BOTH dimensions, where a single-key sort prunes
only its own key.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from spotify_data_pipeline_spark.operators.zorder import with_z_value, write_zordered


def test_z_value_interleaves_bits(spark):
    # 2 dims, 2 bits each, values already spanning [0, 3]: the mapping
    # to rank space is identity and z is the textbook Morton code
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    )
    out = {(r.x, r.y): r._z for r in with_z_value(df, ["x", "y"], bits=2).collect()}

    def morton(x, y):
        z = 0
        for i in range(2):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    assert out == {(x, y): morton(x, y) for x in range(4) for y in range(4)}
    # Morton distinctness + range: a permutation of 0..15
    assert sorted(out.values()) == list(range(16))


def _file_envelopes(spark, path, cols):
    """Per parquet file: (min, max) of each column."""
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        row = (
            spark.read.parquet(f)
            .agg(
                *[F.min(c).alias(f"mn_{c}") for c in cols],
                *[F.max(c).alias(f"mx_{c}") for c in cols],
            )
            .first()
        )
        out.append({c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in cols})
    return out


def _files_hit(envelopes, col, lo, hi):
    return sum(1 for e in envelopes if not (e[col][1] < lo or e[col][0] > hi))


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """16 files over a 2-D uniform grid: x-sorted layout answers a
    y-box query from ALL files; z-ordered answers it from a strict
    subset, while staying competitive on x-box queries."""
    n = 20_000
    df = (
        spark.range(n)
        .select(
            (F.xxhash64("id", F.lit(1)) % 1000).alias("x"),
            (F.xxhash64("id", F.lit(2)) % 1000).alias("y"),
        )
        .select(F.abs("x").alias("x"), F.abs("y").alias("y"))
    )
    n_files = 16

    linear = str(tmp_path / "linear")
    df.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(linear)
    zpath = str(tmp_path / "zed")
    write_zordered(df, zpath, ["x", "y"], n_files)

    lin_env = _file_envelopes(spark, linear, ["x", "y"])
    z_env = _file_envelopes(spark, zpath, ["x", "y"])
    assert len(lin_env) == n_files and len(z_env) == n_files

    # y-box query (10% of the y range)
    y_lin = _files_hit(lin_env, "y", 0, 99)
    y_z = _files_hit(z_env, "y", 0, 99)
    assert y_lin == n_files  # single-key sort cannot skip on y
    assert y_z <= n_files // 2  # z-order skips at least half

    # x-box query: z-order still prunes (coarser than the pure x sort)
    x_lin = _files_hit(lin_env, "x", 0, 99)
    x_z = _files_hit(z_env, "x", 0, 99)
    assert x_lin <= 3
    assert x_z <= n_files // 2
