"""Seeded randomized differential test over an adversarial lineitem
table: heavy value ties (prices drawn from 20 distinct values, so
percentile boundaries and bucket edges land ON ties), NULL prices,
NULL ship dates (Spark sorts NULLS FIRST ascending, DuckDB defaults
NULLS LAST — q114's oracle pins NULLS FIRST explicitly), duplicate
(orderkey, linenumber) pairs with the 4-column key kept unique (the
q104-proven contract q114's total order relies on), and negative
discounts/taxes. Every lineitem-only operator must hash-match its
DuckDB oracle on this table exactly like the driver gate.
"""

from __future__ import annotations

import datetime
import os
import random

import duckdb
import pytest

from conftest import normalize_rows as _normalize, write_single_parquet

from etl_pipeline_stock_market_data_postgresql_spark.workload import all_queries

SEED = 0xC0FFEE
N_ROWS = 500
PRICES = [100.0 + 50.0 * k for k in range(20)]  # exactly-representable ties
FLAGS = ["A", "N", "R"]
STATUS = ["O", "F"]


def _gen_lineitem():
    rng = random.Random(SEED)
    rows = []
    used = set()
    for i in range(N_ROWS):
        # duplicate (orderkey, linenumber) on purpose; 4-col key unique
        okey = rng.randrange(40)
        lnum = rng.randrange(4)
        while True:
            pkey, skey = rng.randrange(60), rng.randrange(15)
            if (okey, lnum, pkey, skey) not in used:
                used.add((okey, lnum, pkey, skey))
                break
        price = None if rng.random() < 0.06 else rng.choice(PRICES)
        ship = (None if rng.random() < 0.05 else
                datetime.datetime(1995, 1, 1)
                + datetime.timedelta(days=rng.randrange(0, 1400),
                                     hours=rng.randrange(24)))
        rows.append((okey, pkey, skey, lnum,
                     float(rng.randrange(1, 50)),
                     price,
                     rng.choice([-0.05, 0.0, 0.05, 0.10]),
                     rng.choice([-0.02, 0.0, 0.08]),
                     rng.choice(FLAGS), rng.choice(STATUS), ship))
    return rows


FUZZ_LI_QUERIES = [
    "q11_pricing_summary", "q100_table_profile",
    "q102_equidepth_histogram", "q104_key_uniqueness",
    "q112_equidepth_sketch", "q114_global_sort",
]

_SCHEMA = ("l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
           "l_linenumber int, l_quantity double, l_extendedprice double, "
           "l_discount double, l_tax double, l_returnflag string, "
           "l_linestatus string, l_shipdate timestamp")


@pytest.fixture(scope="module")
def fuzz_li_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_li")
    df = spark.createDataFrame(_gen_lineitem(), _SCHEMA)
    write_single_parquet(df, os.path.join(str(d), "lineitem.parquet"))
    return str(d)


@pytest.mark.parametrize("name", FUZZ_LI_QUERIES)
def test_fuzz_lineitem_match_oracle(spark, fuzz_li_dir, name):
    q = all_queries()[name]
    sdf = q.spark_fn(spark, fuzz_li_dir)
    try:
        spark_rows = [tuple(r) for r in sdf.collect()]
        spark_cols = list(sdf.columns)

        conn = duckdb.connect()
        try:
            conn.execute("CREATE VIEW lineitem AS SELECT * FROM "
                         f"'{fuzz_li_dir}/lineitem.parquet'")
            res = conn.execute(q.oracle)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        finally:
            conn.close()

        assert sorted(spark_cols) == sorted(duck_cols)
        assert len(spark_rows) == len(duck_rows), (
            f"{name}: {len(spark_rows)} vs {len(duck_rows)}")
        assert _normalize(spark_cols, spark_rows) == \
            _normalize(duck_cols, duck_rows)
    finally:
        spark.catalog.clearCache()


def test_fuzz_lineitem_has_the_edge_shapes():
    rows = _gen_lineitem()
    assert any(r[5] is None for r in rows)          # NULL price
    assert any(r[10] is None for r in rows)         # NULL shipdate
    # (orderkey, linenumber) collides; 4-col key unique
    two = {(r[0], r[3]) for r in rows}
    four = {(r[0], r[3], r[1], r[2]) for r in rows}
    assert len(two) < len(rows) and len(four) == len(rows)
