"""Driver-session compatibility tests.

Round 1's entire correctness gate (0/46) died because the engine only worked
on a SparkSession built by its own ``get_spark()`` — the driver harness hands
the engine a *vanilla* session, which could not read the TIMESTAMP(NANOS)
testdata parquet. These tests pin the fix: ``register_testdata`` must work on
ANY session, with no reliance on builder-time confs.
"""

import subprocess
import sys

import pytest

from approximate_query_engine_spark.session import (
    _RUNTIME_CONFS,
    register_testdata,
)

SF_SMOKE = "/root/testdata/sf0.001"

# Confs that have builder-time defaults in get_spark but MUST also be applied
# at runtime by register_testdata for externally-built sessions.
_CONF_KEYS = list(_RUNTIME_CONFS)


def test_register_testdata_recovers_unset_confs(spark):
    """Strip the engine confs from a live session (simulating a host-owned
    session) and verify register_testdata re-applies them and still reads
    every table, including the nanos-timestamp events table."""
    saved = {}
    for key in _CONF_KEYS:
        saved[key] = spark.conf.get(key, None)
        try:
            spark.conf.unset(key)
        except Exception:
            pass
    try:
        dfs = register_testdata(spark, SF_SMOKE)
        assert "events" in dfs, "events (TIMESTAMP NANOS parquet) must register"
        ts_type = dict(dfs["events"].dtypes)["ts"]
        assert ts_type == "timestamp", ts_type
        # A real read, not just schema resolution.
        n = spark.sql("SELECT COUNT(*) AS n FROM events").collect()[0]["n"]
        assert n > 0
        # The confs are back for the rest of the session.
        for key, want in _RUNTIME_CONFS.items():
            assert spark.conf.get(key) == want
    finally:
        for key, value in saved.items():
            if value is not None:
                spark.conf.set(key, value)


def test_nanos_detection_is_footer_based(tmp_path, spark):
    """A ns-timestamp column with a name other than 'ts' must still convert
    (round 1 hardcoded the name)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ns = np.array([1_700_000_000_000_000_001, 1_700_000_001_500_000_000], dtype="int64")
    table = pa.table({"weird_name": ns.view("datetime64[ns]"), "v": [1, 2]})
    path = str(tmp_path / "oddts.parquet")
    pq.write_table(table, path)

    dfs = register_testdata(spark, str(tmp_path), tables=("oddts",))
    assert dict(dfs["oddts"].dtypes)["weird_name"] == "timestamp"
    rows = dfs["oddts"].orderBy("v").collect()
    # ns -> µs truncation, exact integer div.
    assert rows[0]["weird_name"].microsecond == 0


def test_register_testdata_skips_bad_table(tmp_path, spark):
    """One unreadable table must not zero the others (round 1 failure mode:
    events killed all 46 queries including 38 that never touch events)."""
    import shutil

    shutil.copyfile(f"{SF_SMOKE}/region.parquet", tmp_path / "region.parquet")
    (tmp_path / "corrupt.parquet").write_bytes(b"not a parquet file")
    with pytest.warns(UserWarning, match="skipping testdata table"):
        dfs = register_testdata(spark, str(tmp_path), tables=("corrupt", "region"))
    assert "region" in dfs and "corrupt" not in dfs


@pytest.mark.slow
def test_vanilla_subprocess_driver_protocol():
    """Faithful driver reproduction: a fresh python process builds a vanilla
    SparkSession (zero engine confs) and runs __spark_entry__ queries over
    the parquet testdata. This is exactly what the round-1 gate does."""
    code = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .appName("vanilla-driver-sim")
    .getOrCreate()
)
import __spark_entry__ as mod

df = mod.entry(spark)
rows = df.collect()
assert len(rows) >= 0 and len(df.columns) > 0

qs = mod.queries()
for name in ("q01_count", "q11_tpch_q1", "q17_events_hour", "q20_sessionize"):
    if name in qs:
        out = qs[name](spark, "/root/testdata/sf0.001")
        out.collect()
print("VANILLA_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root", "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
    )
    assert "VANILLA_OK" in proc.stdout, proc.stderr[-4000:]


def test_nanos_detection_on_directory_dataset(spark, tmp_path):
    """ns-timestamp detection must work for DIRECTORY parquet datasets
    (the normal Spark-written shape), not just single files (regression:
    pq.read_schema fails on directories and the fallback returned empty,
    silently leaving ns columns as bigint)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from approximate_query_engine_spark.session import (
        _nanos_timestamp_cols,
        register_testdata,
    )

    ns = np.array(
        [1_700_000_000_000_000_001, 1_700_000_001_500_000_000], dtype="int64"
    )
    table = pa.table({"ts": ns.view("datetime64[ns]"), "v": [1, 2]})
    d = tmp_path / "events_dir"
    d.mkdir()
    pq.write_table(table, str(d / "part-0.parquet"))
    cols = _nanos_timestamp_cols(str(d))
    assert "ts" in cols
    # end-to-end: a directory-shaped table registers with a real timestamp
    dfs = register_testdata(spark, str(tmp_path), tables=("events_dir",))
    assert dict(dfs["events_dir"].dtypes)["ts"] == "timestamp"


def test_ntz_micros_normalized_to_timestamp(spark, tmp_path):
    """TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet — what the testdata
    ships as of round 2 — reads as TIMESTAMP_NTZ in Spark; register_testdata
    must cast it to plain TIMESTAMP so event-time operators (withWatermark,
    unix_micros sessionization) work. Session tz is UTC, so values are
    preserved exactly."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [
        datetime.datetime(2024, 1, 1, 12, 0, 0, 123456),
        datetime.datetime(2024, 1, 2, 0, 30, 0, 1),
    ]
    table = pa.table(
        {"ts": pa.array(vals, type=pa.timestamp("us")), "v": [1, 2]}
    )
    pq.write_table(table, str(tmp_path / "ntz_events.parquet"))

    dfs = register_testdata(spark, str(tmp_path), tables=("ntz_events",))
    assert dict(dfs["ntz_events"].dtypes)["ts"] == "timestamp"
    rows = dfs["ntz_events"].orderBy("v").collect()
    assert rows[0]["ts"] == vals[0] and rows[1]["ts"] == vals[1]


def test_real_testdata_events_ts_is_timestamp(spark):
    """Whatever physical layout the shipped testdata uses (ns, µs-NTZ, or
    tz-adjusted), the registered events.ts must come out as plain TIMESTAMP —
    every event-time operator depends on it."""
    dfs = register_testdata(spark, SF_SMOKE, tables=("events",))
    assert dict(dfs["events"].dtypes)["ts"] == "timestamp"
