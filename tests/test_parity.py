"""Oracle parity for every registered query — mirrors the driver's t2.

Parametrized over the registry so adding an operator automatically adds
its test. Rows-only ops are checked for executability + row count > 0.
"""

from __future__ import annotations

import pytest

from sparkstreamingtohdfsofsensorsdata_spark import registry

from conftest import run_parity

SPECS = registry.load_all()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    run_parity(spark, duck, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    df = SPECS[name].fn(spark, "/root/testdata/sf0.001")
    assert len(df.collect()) > 0


def test_no_empty_oracle_results(duck):
    """A 0-row result passes a hash compare trivially — make sure the
    fixture scale actually exercises every oracle query."""
    empty = []
    for name in ORACLE_NAMES:
        if duck.execute(f"SELECT count(*) FROM ({SPECS[name].oracle})").fetchone()[0] == 0:
            empty.append(name)
    assert not empty, f"queries with empty results at sf0.001: {empty}"
