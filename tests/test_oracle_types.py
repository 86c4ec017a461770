"""Oracle↔engine type-parity gate.

The driver hashes STRINGIFIED pandas cells, so a DuckDB column whose
pandas rendering differs from the Spark column's — even when every value
is numerically identical — fails the correctness hash. Round 3 lost two
queries exactly this way: ``sum(CASE ...)`` returns DuckDB HUGEINT, which
pandas renders as float64 ``1.0`` against Spark BIGINT ``1``.

This test walks every ``oracle_sql()`` entry, binds it on DuckDB (no
execution — types come from the binder), takes the lazy Spark schema from
the matching ``queries()`` entry, and asserts each shared column lands in
an explicitly allowed (duckdb_type, spark_type) pair. Types that pandas
renders differently from their Spark twin (HUGEINT, DECIMAL, FLOAT,
unsigned ints) are never allowed — CAST them in the oracle SQL.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# (duckdb_type, spark_simple_type) pairs whose pandas stringifications are
# identical for all values.  Int-width mixes (INTEGER vs bigint) are safe:
# NULL-free columns stringify as plain ints on both sides, and nullable int
# columns coerce to float64 on BOTH sides (Spark toPandas and duckdb .df()),
# so the renderings still agree.  TIMESTAMP pairs with both Spark timestamp
# flavors because pandas drops the tz distinction for naive micros.
ALLOWED = {
    ("BIGINT", "bigint"),
    ("BIGINT", "int"),
    ("INTEGER", "int"),
    ("INTEGER", "bigint"),
    ("DOUBLE", "double"),
    ("TIMESTAMP", "timestamp"),
    ("TIMESTAMP", "timestamp_ntz"),
    ("VARCHAR", "string"),
    ("BOOLEAN", "boolean"),
    ("DATE", "date"),
}

# Types that MUST never appear in an oracle projection: pandas renders them
# differently from any Spark type the engine emits.
FORBIDDEN_DUCKDB = {"HUGEINT", "UHUGEINT", "FLOAT", "UBIGINT", "UINTEGER",
                    "USMALLINT", "UTINYINT"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _oracle_types(con, sql):
    rel = con.sql(sql)
    return dict(zip(rel.columns, (str(t) for t in rel.types)))


def test_every_oracle_column_type_maps_onto_spark(spark, duck):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    bad = []
    for name, sql in oracles.items():
        if name not in qs:
            bad.append(f"{name}: oracle_sql entry with no queries() twin")
            continue
        try:
            otypes = _oracle_types(duck, sql)
        except Exception as e:  # binder error = broken oracle
            bad.append(f"{name}: duckdb bind error {e}")
            continue
        stypes = {f.name: f.dataType.simpleString()
                  for f in qs[name](spark, SF_DIR).schema.fields}
        for col, dt in otypes.items():
            dt_base = dt.split("(")[0]  # DECIMAL(38,0) -> DECIMAL
            if col not in stypes:
                bad.append(f"{name}.{col}: oracle column missing from Spark schema")
                continue
            st = stypes[col]
            if dt_base in FORBIDDEN_DUCKDB or dt_base == "DECIMAL":
                bad.append(
                    f"{name}.{col}: oracle type {dt} is pandas-hostile "
                    f"(CAST it; Spark side is {st})")
            elif (dt_base, st) not in ALLOWED:
                bad.append(f"{name}.{col}: unvetted pair duckdb {dt} vs spark {st}")
    assert not bad, "\n".join(bad)
