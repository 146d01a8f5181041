import duckdb
import pytest

from demeter_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="demeter_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    """DuckDB connection with the testdata views pre-registered, mirroring the
    driver's oracle harness (sf0.001 for speed; parity retested at sf0.01 by
    the driver)."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()
