"""Static discipline lint over the oracle corpus: the failure classes
that cost rounds (HUGEINT dtype leaks, non-correctly-rounded
transcendentals, nondeterminism) must be impossible to reintroduce."""

from __future__ import annotations



from hadron_spark.queries import ORACLES, QUERIES


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_no_transcendentals_or_nondeterminism_in_oracles():
    """ln/exp/log are not correctly rounded per IEEE-754 (sqrt is),
    so their results are not bit-portable between DuckDB and the JVM
    — any oracle needing them must be registered rows-only instead.
    random()/now() would make the oracle nondeterministic outright."""
    forbidden = ("exp(", " ln(", "\nln(", "(ln(", "log(", "log2(",
                 "log10(", "random(", "now()", "current_timestamp")
    for name, sql in ORACLES.items():
        low = sql.lower()
        for pat in forbidden:
            assert pat not in low, (name, pat)


def test_no_hugeint_output_columns():
    """The q50 failure class, checked PRECISELY: DuckDB binds every
    oracle (DESCRIBE — no execution) and no OUTPUT column may be
    HUGEINT/UHUGEINT.  A HUGEINT output converts to pandas float64
    and hash-diverges from Spark's bigint even when values match;
    intermediate CTE sums that later CAST are fine and bind as
    whatever their consumer makes of them."""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = []
    for name, sql in ORACLES.items():
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in cols:
            if "HUGEINT" in typ.upper():
                bad.append((name, col, typ))
    assert not bad, bad
