"""Per-entry bloom filters for point-lookup skipping (r12, VERDICT r11
task 4).

min/max stats prune NOTHING for an equality lookup on an unclustered
high-cardinality key — every entry's [min, max] spans the key space
(the uuid-ish ``_dlt_id`` before ``cluster()`` runs).  ``bloom_cols``
records an m-bit filter per entry at write time; ``read_where``'s
IN/equality specs consult it under the same prune-only-when-provable
rule as every other tier.  Pinned here:

- WRITE/READ HASH AGREEMENT — the JVM expression that sets bits and
  the pure-Python test that reads them must compute identical
  positions, or pruning silently drops rows (the one soundness-
  critical invariant);
- pruned-entry count for a key lookup where min/max keeps everything;
- keep-by-default on saturation, missing filters, and out-of-domain
  values (bool/float/None/datetime);
- composition with the other tiers (range + bloom, segmented logs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from iot_elt_airflow_mongo_timescaledb_spark.plans.table_format import (
    CatalogManifestFormat,
    ManifestFormat,
    _bloom_positions,
    _bloom_value_ok,
)


def _mk(spark, root, **kw):
    kw.setdefault("auto_compact_dirs", None)
    kw.setdefault("bloom_cols", ("uid",))
    return ManifestFormat(spark, str(root), **kw)


def _keyed(spark, lo, hi, tag):
    # md5-scrambled keys: every chunk's [min, max] spans the hex space
    return (
        spark.range(lo, hi)
        .select(
            F.md5(F.col("id").cast("string")).alias("uid"),
            F.col("id").alias("k"),
            F.lit(tag).alias("tag"),
        )
    )


def test_write_read_hash_agreement(spark):
    """THE soundness invariant: Spark's bit-setting expression and the
    Python probe compute identical positions for ints and strings."""
    m, k = ManifestFormat.BLOOM_BITS, ManifestFormat.BLOOM_K
    samples = [0, 1, -7, 123456789012345, "x", "hello world",
               "md5-like-0123456789abcdef", "ü-unicode", ""]
    df = spark.createDataFrame([Row(v=str(s)) for s in samples])
    exprs = [
        F.collect_list(
            F.crc32(
                F.concat(F.lit(f"{i}:"), F.col("v")).cast("binary")
            ) % m
        ).alias(f"p{i}")
        for i in range(k)
    ]
    row = df.orderBy("v").groupBy().agg(
        F.collect_list("v").alias("vs"), *exprs
    ).first()
    by_val = {
        v: [row[f"p{i}"][j] for i in range(k)]
        for j, v in enumerate(row["vs"])
    }
    for s in samples:
        assert by_val[str(s)] == _bloom_positions(s, m, k), s


def test_point_lookup_prunes_unclustered_entries(spark, tmp_path):
    fmt = _mk(spark, tmp_path)
    for i in range(5):
        fmt.write(
            "b.t", _keyed(spark, i * 200, (i + 1) * 200, i),
            "append" if i else "overwrite",
        )
    m = fmt._manifest("b.t")
    assert all("bloom" in e and "uid" in e["bloom"] for e in m["entries"])
    # the target's uid, from chunk 3
    tuid = (
        _keyed(spark, 0, 1000, 0)
        .filter(F.col("k") == 3 * 200 + 7)
        .first()["uid"]
    )
    kept, _ = fmt.prune_entries("b.t", {"uid": (tuid, tuid)})
    # min/max keeps all 5 (scrambled keys); bloom prunes to the one
    # containing entry (a ~2% FPR can keep a second — never fewer)
    assert 1 <= len(kept) <= 2
    got = fmt.read_where("b.t", "uid", tuid, tuid).collect()
    assert len(got) == 1 and got[0]["tag"] == 3
    # absent key: provably nothing (empty frame, right schema)
    ghost = "0" * 32
    kept_g, _ = fmt.prune_entries("b.t", {"uid": (ghost, ghost)})
    assert len(kept_g) == 0
    empty = fmt.read_where("b.t", "uid", ghost, ghost)
    assert empty.count() == 0 and "tag" in empty.columns


def test_in_spec_consults_bloom(spark, tmp_path):
    fmt = _mk(spark, tmp_path)
    for i in range(5):
        fmt.write(
            "b.t", _keyed(spark, i * 200, (i + 1) * 200, i),
            "append" if i else "overwrite",
        )
    all_rows = _keyed(spark, 0, 1000, 0).collect()
    uids = {r["k"]: r["uid"] for r in all_rows}
    targets = [uids[50], uids[850]]  # chunks 0 and 4
    kept, _ = fmt.prune_entries("b.t", {"uid": targets})
    assert 2 <= len(kept) <= 3
    got = sorted(r["tag"] for r in fmt.read_where("b.t", {"uid": targets}).collect())
    assert got == [0, 4]


def test_int_column_bloom_and_domain_guards(spark, tmp_path):
    fmt = _mk(spark, tmp_path, bloom_cols=("k",))
    fmt.write("b.i", spark.createDataFrame(
        [Row(k=j, g=0) for j in range(0, 500, 7)]), "overwrite")
    fmt.write("b.i", spark.createDataFrame(
        [Row(k=j, g=1) for j in range(1, 500, 7)]), "append")
    m = fmt._manifest("b.i")
    assert all("bloom" in e for e in m["entries"])
    # 7 is only in chunk 0
    kept, _ = fmt.prune_entries("b.i", {"k": (7, 7)})
    assert len(kept) == 1
    assert fmt.read_where("b.i", "k", 7, 7).first()["g"] == 0
    # a value in NO chunk: excluded outright
    kept2, _ = fmt.prune_entries("b.i", {"k": (3, 3)})
    assert len(kept2) == 0
    # out-of-domain values keep-by-default (bool/float/None)
    for v in (True, 7.0, None):
        kept3, _ = fmt.prune_entries("b.i", {"k": [v]})
        assert len(kept3) == 2, v
    # a RANGE (lo != hi) never consults the filter
    kept4, _ = fmt.prune_entries("b.i", "k", 3, 4)
    assert len(kept4) == 2


def test_saturated_filter_dropped_not_stored(spark, tmp_path):
    """Past m/2 set bits the FPR stops pruning: the write drops the
    filter (no manifest bloat) and reads keep-by-default."""
    fmt = _mk(spark, tmp_path)
    n = ManifestFormat.BLOOM_BITS  # ndv >> m/(2k): saturates
    fmt.write("b.s", _keyed(spark, 0, n, 0), "overwrite")
    e = fmt._manifest("b.s")["entries"][0]
    assert "bloom" not in e or "uid" not in (e.get("bloom") or {})
    some = _keyed(spark, 0, n, 0).filter(F.col("k") == 5).first()["uid"]
    assert fmt.read_where("b.s", "uid", some, some).count() == 1


def test_non_bloomable_types_skipped(spark, tmp_path):
    """double/date columns never get a filter (str() disagreement
    risk) — listed or not, reads stay correct."""
    fmt = _mk(spark, tmp_path, bloom_cols=("w",))
    fmt.write(
        "b.d",
        spark.createDataFrame([Row(w=float(i), k=i) for i in range(10)]),
        "overwrite",
    )
    e = fmt._manifest("b.d")["entries"][0]
    assert "bloom" not in e
    assert fmt.read_where("b.d", "w", 3.0, 3.0).count() == 1


def test_bloom_composes_with_minmax_and_segments(spark, tmp_path):
    """All tiers together: a segmented log whose entries carry both
    stats and blooms — range prunes by min/max, equality by bloom,
    results byte-identical to a flat filter."""
    fmt = ManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None,
        segment_entries=2, stats_cols=("k",), bloom_cols=("uid",),
    )
    for i in range(6):
        fmt.write(
            "b.g", _keyed(spark, i * 100, (i + 1) * 100, i),
            "append" if i else "overwrite",
        )
    assert fmt._manifest("b.g", resolve=False)["segments"]
    tuid = (
        _keyed(spark, 0, 600, 0).filter(F.col("k") == 321).first()["uid"]
    )
    got = fmt.read_where(
        "b.g", {"uid": (tuid, tuid), "k": (300, 399)}
    ).collect()
    assert len(got) == 1 and got[0]["k"] == 321
    # bloom + min/max conjunction: k-range excludes chunks 0-2/4-5 by
    # stats even if the uid FP-keeps one of them
    kept, _ = fmt.prune_entries("b.g", {"uid": (tuid, tuid), "k": (300, 399)})
    assert len(kept) == 1


def test_catalog_format_and_value_ok(spark, tmp_path):
    fmt = CatalogManifestFormat(
        spark, str(tmp_path), auto_compact_dirs=None, bloom_cols=("uid",)
    )
    fmt.write("b.c", _keyed(spark, 0, 100, 0), "overwrite")
    assert "bloom" in fmt._manifest("b.c")["entries"][0]
    assert _bloom_value_ok(5) and _bloom_value_ok("x")
    assert not _bloom_value_ok(True)
    assert not _bloom_value_ok(5.0)
    assert not _bloom_value_ok(None)
