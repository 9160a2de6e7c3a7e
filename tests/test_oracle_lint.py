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


def test_verify_oracle_rejects_unknown_names():
    """A typo'd query name must fail loudly (exit 2), never produce a
    vacuous 'all queries match' by silently skipping every name."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "tools/verify_oracle.py",
         "/root/testdata/sf0.001", "q01_pricing_summary", "q_no_such_query"],
        capture_output=True, text=True, cwd=".",
    )
    assert proc.returncode == 2, proc.stdout + proc.stderr
    assert "UNKNOWN" in proc.stdout
    assert "q_no_such_query" in proc.stdout
    assert "all queries match" not in proc.stdout


def test_driver_window_rotates_by_round():
    """__spark_entry__.queries() must order the oracle-backed block by
    md5(name+round) so the driver's 50-slot hash window samples a fresh
    subset each round (rounds 3-5 all hashed the same 50)."""
    import hashlib

    import __spark_entry__ as entry

    q = entry.queries()
    names = list(q)
    backed = [n for n in names if n in ORACLES]
    # oracle-backed block still leads
    assert names[: len(backed)] == backed
    rnd = str(entry._current_round())
    expect = sorted(backed, key=lambda n: hashlib.md5((n + rnd).encode()).hexdigest())
    assert backed == expect
    # rotation actually changes the window between rounds
    other = sorted(
        backed, key=lambda n: hashlib.md5((n + str(int(rnd) + 1)).encode()).hexdigest()
    )
    assert other[:50] != backed[:50]


def test_current_round_advances_on_new_correctness_file(monkeypatch):
    """VERDICT r6 #7: _current_round() must equal 1 + the highest
    CORRECTNESS_r*.json on disk, and ADVANCE as soon as a new file
    lands — the rotation's freshness depends on it."""
    import glob as glob_mod
    import os
    import re

    import __spark_entry__ as entry

    on_disk = [
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in glob_mod.glob(
            os.path.join(os.path.dirname(entry.__file__),
                         "CORRECTNESS_r*.json")
        )
    ]
    base = entry._current_round()
    assert base == (max(on_disk) if on_disk else 0) + 1

    real_glob = glob_mod.glob
    fake = os.path.join(
        os.path.dirname(entry.__file__), f"CORRECTNESS_r{base}.json"
    )

    def with_new(pattern, *a, **kw):
        return real_glob(pattern, *a, **kw) + (
            [fake] if "CORRECTNESS_r" in pattern else []
        )

    monkeypatch.setattr(glob_mod, "glob", with_new)
    assert entry._current_round() == base + 1


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
