"""Oracle output-type lint: no DuckDB oracle may emit a HUGEINT column.

DuckDB widens sum(BIGINT) (and window cumsums) to HUGEINT (int128);
Spark emits BIGINT for the same expression. The driver's typed-value
hash then mismatches even though the Python-level values are equal —
this bit json_extract/simhash in round 1 (fixed by commit 88a4799) and
regressed in round 3 for mix_weights_temperature / corpus_shard_pack.
tools/check_oracle.py cannot catch it (int == int after fetch), so this
test checks the *types*: DESCRIBE each oracle_sql() entry against the
sf0.001 views (binder-only, no execution) and assert no output column
is HUGEINT/UHUGEINT/INT128.

Rule of thumb enforced here: wrap every integer sum() in
cast(... AS bigint) — including window cumsums that reach the output.
"""

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

BANNED = ("HUGEINT", "UHUGEINT", "INT128")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


def test_no_hugeint_oracle_columns(con):
    bad = []
    for name, sql in entry.oracle_sql().items():
        rows = con.execute(f"DESCRIBE ({sql})").fetchall()
        for col, typ, *_ in rows:
            if any(b in typ.upper() for b in BANNED):
                bad.append((name, col, typ))
    assert not bad, (
        "oracles with HUGEINT output columns (wrap the sum in "
        f"cast(... AS bigint)): {bad}"
    )
