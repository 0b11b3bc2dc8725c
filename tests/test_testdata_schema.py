"""Schema-drift smoke tests against the REAL driver testdata.

Round 2 post-mortem: the driver's events.parquet changed physical
timestamp encoding between rounds (TIMESTAMP(NANOS) -> timestamp[us])
and the loader's single-dtype assumption red-flagged 5 correctness rows
and crashed the whole bench. These tests fail in seconds on the next
drift instead of at round end.
"""

import glob
import os

import duckdb
import pytest

from amazon_personalize_connectors_spark.sources import synthetic

TESTDATA_ROOT = "/root/testdata"
SF_DIRS = sorted(glob.glob(f"{TESTDATA_ROOT}/sf*"))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.mark.parametrize("sf_dir", SF_DIRS or ["<missing>"])
def test_all_tables_present(sf_dir):
    if not SF_DIRS:
        pytest.skip("no testdata dirs on this machine")
    for t in TABLES:
        assert os.path.exists(f"{sf_dir}/{t}.parquet"), f"{sf_dir}/{t}"


@pytest.mark.parametrize("sf_dir", SF_DIRS or ["<missing>"])
def test_load_events_schema_contract(spark, sf_dir):
    """load_events must yield ts_us:bigint + ts:timestamp regardless of
    the parquet file's physical timestamp encoding."""
    if not SF_DIRS:
        pytest.skip("no testdata dirs on this machine")
    ev = synthetic.load_events(spark, sf_dir)
    dtypes = dict(ev.dtypes)
    assert dtypes["ts_us"] == "bigint"
    assert dtypes["ts"] in ("timestamp", "timestamp_ntz")
    # analysis must succeed eagerly (the round-2 bug threw here)
    ev.select("ts", "ts_us", "event_id", "user_id").schema


def test_load_events_matches_duckdb_epoch(spark):
    """ts_us must equal DuckDB's naive epoch_us(ts) on the same file —
    the exact contract the driver's oracle compare relies on."""
    if not SF_DIRS:
        pytest.skip("no testdata dirs on this machine")
    sf_dir = SF_DIRS[0]  # smallest
    ev = synthetic.load_events(spark, sf_dir)
    got = {
        r["event_id"]: r["ts_us"]
        for r in ev.select("event_id", "ts_us").orderBy("event_id").limit(100).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT event_id, epoch_us(ts) FROM '{sf_dir}/events.parquet' "
            "ORDER BY event_id LIMIT 100"
        ).fetchall()
    )
    assert got == want


EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_type", "p_brand", "p_retailprice", "p_size"},
    "orders": {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"},
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS or ["<missing>"])
def test_expected_columns_present(sf_dir):
    """Queries reference these columns by name; fail fast (with the
    exact diff) if driver-generated testdata drops or renames any."""
    if not SF_DIRS:
        pytest.skip("no testdata dirs on this machine")
    import pyarrow.parquet as pq

    for table, want in EXPECTED_COLUMNS.items():
        got = {f.name for f in pq.ParquetFile(f"{sf_dir}/{table}.parquet").schema_arrow}
        missing = want - got
        assert not missing, f"{sf_dir}/{table}: missing columns {missing}"
