"""Shared fixtures: one SparkSession per test session, DuckDB oracle."""

from __future__ import annotations

import math

import duckdb
import pytest

from sparkstreamingtohdfsofsensorsdata_spark import registry
from sparkstreamingtohdfsofsensorsdata_spark.session import build_session
from sparkstreamingtohdfsofsensorsdata_spark.tables import TABLES, table_path

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="tests", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with fixture tables registered as views,
    mirroring the driver's oracle setup."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()


def _normalize(value):
    """Make a cell comparable across Spark/DuckDB result representations."""
    import datetime
    import decimal

    if isinstance(value, decimal.Decimal):
        return float(value)
    if isinstance(value, float):
        return round(value, 9)
    if isinstance(value, datetime.datetime):
        if value.tzinfo is not None:
            # canonicalize aware instants to UTC wall time — stripping a
            # non-UTC offset would compare host-local wall times instead
            value = value.astimezone(datetime.timezone.utc)
        return value.replace(tzinfo=None).isoformat()
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return tuple(_normalize(v) for v in value)
    return value


def rows_key(columns, rows):
    """Order-insensitive, column-name-sorted canonical form of a result."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(_normalize(row[i]) for i in order))
    out.sort(key=repr)
    return sorted(columns), out


def assert_cells_close(left, right, rel=1e-6):
    assert len(left) == len(right)
    for lrow, rrow in zip(left, right):
        assert len(lrow) == len(rrow)
        for lval, rval in zip(lrow, rrow):
            if isinstance(lval, float) and isinstance(rval, float):
                if math.isnan(lval) and math.isnan(rval):
                    continue
                assert lval == pytest.approx(rval, rel=rel, abs=1e-9), (lrow, rrow)
            else:
                assert lval == rval, (lrow, rrow)


def run_parity(spark, duck, name: str, sf_dir: str = SF_DIR):
    """Mirror the driver's t2 check: Spark result vs DuckDB oracle —
    row count, sorted column names, and (tolerant) value comparison."""
    spec = registry.load_all()[name]
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    assert spec.oracle is not None, f"{name} has no oracle (rows-only op)"
    res = duck.execute(spec.oracle)
    drows = [tuple(r) for r in res.fetchall()]
    dcols = [d[0] for d in res.description]

    s_cols, s_canon = rows_key(scols, srows)
    d_cols, d_canon = rows_key(dcols, drows)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_canon) == len(d_canon), (
        f"{name}: row count {len(s_canon)} vs oracle {len(d_canon)}"
    )
    assert_cells_close(s_canon, d_canon)
    return len(s_canon)
