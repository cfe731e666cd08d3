from __future__ import annotations

from etl_pipeline_stock_market_data_postgresql_spark import schemas


def test_create_table_if_not_exists(spark, tmp_path):
    loc = str(tmp_path / "companies_tbl")
    schemas.create_table_if_not_exists(spark, "companies", loc)
    # re-issue is a no-op (IF NOT EXISTS semantics, reference K5)
    schemas.create_table_if_not_exists(spark, "companies", loc)
    assert spark.catalog.tableExists("companies")
    cols = {f.name for f in spark.table("companies").schema.fields}
    assert cols == {"company_symbol"}
    spark.sql("DROP TABLE companies")


def test_partitioned_fact_ddl(spark, tmp_path):
    loc = str(tmp_path / "daily_tbl")
    schemas.create_table_if_not_exists(spark, "daily_stock_prices", loc)
    try:
        cols = {f.name for f in spark.table("daily_stock_prices").schema.fields}
        assert cols == {f.name for f in schemas.DAILY_STOCK_PRICES.fields}
    finally:
        spark.sql("DROP TABLE daily_stock_prices")


def test_metadata_consistency():
    for table, pk in schemas.PRIMARY_KEYS.items():
        cols = {f.name for f in schemas.TABLES[table].fields}
        assert set(pk) <= cols
    for table, (fk_cols, parent) in schemas.FOREIGN_KEYS.items():
        assert parent in schemas.TABLES
        assert set(fk_cols) <= {f.name for f in schemas.TABLES[table].fields}
    for table, tc in schemas.TIME_COLUMNS.items():
        assert tc in {f.name for f in schemas.TABLES[table].fields}
