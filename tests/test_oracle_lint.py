"""Static discipline lint over the oracle corpus: the failure classes
that cost rounds (HUGEINT dtype leaks, non-correctly-rounded
transcendentals, nondeterminism) must be impossible to reintroduce."""

from __future__ import annotations

import re

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


def test_no_uncast_integer_sum_output_columns():
    """DuckDB SUM over integers returns HUGEINT, which pandas converts
    to float64 and hash-diverges from Spark's bigint (the q50 class).
    Heuristic lint: any `SUM(...)` that is aliased as an output column
    must sit inside a CAST unless it sums an expression that is
    already DOUBLE/DECIMAL. The runtime dtype-strict verifier is the
    authoritative gate; this catches the obvious regressions at
    import cost."""
    # find `sum(` occurrences not preceded by `cast(` on the same
    # parenthesized chain and not summing an explicit cast-to-double/
    # decimal expression
    offenders = []
    for name, sql in ORACLES.items():
        low = re.sub(r"\s+", " ", sql.lower())
        for m in re.finditer(r"sum\(", low):
            start = m.start()
            prefix = low[max(0, start - 60):start]
            inner = low[m.end():m.end() + 80]
            if "cast(" in prefix[-6:] or prefix.rstrip().endswith("cast ("):
                continue  # CAST(SUM(...) AS ...)
            if inner.lstrip().startswith(("cast(", "(cast(")):
                # SUM(CAST(... AS DOUBLE/DECIMAL/BIGINT)) is typed
                continue
            # sums over double columns / double arithmetic are fine;
            # whitelist by the known double-ish tokens
            if any(t in inner[:60] for t in (
                "as double", "::double", "l_extendedprice", "value",
                "o_totalprice", "* 1.0", ".0 ", "gx", '"g"', " g)", "(g)",
            )):
                continue
            # integer-looking sum: require a cast wrapper upstream
            window = low[max(0, start - 30):start]
            if "cast(sum" in low[max(0, start - 5):m.end()]:
                continue
            offenders.append((name, low[start:start + 60]))
    # every offender must be consumed by later arithmetic that casts
    # (ratio columns) — accept those whose surrounding SELECT item
    # casts; remaining list should be empty or consciously waived here
    WAIVED = {
        # intermediate CTE/window sums consumed only through
        # CAST/integer-div later — never surfaced as output columns;
        # dtype-green in the runtime sweep at every SF
        "q81_sequence_packing",   # window sum -> integer div banding
        "q92_max_concurrency",    # delta sweep sum -> CAST(MAX AS BIGINT)
        "q114_price_trend_slope", # moment sums -> double slope formula
    }
    real = [o for o in offenders if o[0] not in WAIVED]
    assert not real, real
