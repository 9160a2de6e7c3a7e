"""Corpus data-card report: the one-call statistical summary a
training-data release ships with (dataset cards per Gebru et al.
2021, "Datasheets for Datasets", arXiv:1803.09010) — size, length
distribution, emptiness, and composition shares, as ONE long-format
(metric, value) frame.

Everything is exact integers, discrete percentiles (actual data
elements — no interpolation), and single IEEE divisions, so the
whole report hash-matches a DuckDB replay (q215).  Plan shape: one
narrow token-count projection, one global aggregate (partial-agg'd,
8 cells), one |langs|-bounded groupBy, union'd — two exchanges
total, both onto tiny frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadron_spark.functions.text import token_count


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    group_col: str | None = "lang",
) -> DataFrame:
    """(metric string, value double) — corpus statistics:

    - n_docs, total_tokens, total_chars
    - mean_doc_tokens (exact-int ratio), p50/p90/max doc tokens
      (percentile_disc — actual elements)
    - pct_docs_short (< 50 chars)
    - share:<group> — composition share per `group_col` value
      (None skips the breakdown)."""
    base = df.select(
        token_count(F.col(text_col)).alias("_nt"),
        F.length(text_col).alias("_nc"),
        *([F.col(group_col).alias("_g")] if group_col else []),
    )
    from hadron_spark.operators.ops import pin

    base = pin(base)  # feeds the global agg AND the group breakdown
    g = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.sum("_nc").alias("total_chars"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY _nt)").alias(
            "p50"
        ),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY _nt)").alias(
            "p90"
        ),
        F.max("_nt").alias("max_nt"),
        F.sum(F.when(F.col("_nc") < 50, 1).otherwise(0)).alias("n_short"),
    )
    scalars = g.select(
        F.explode(
            F.map_from_arrays(
                F.array(
                    F.lit("n_docs"),
                    F.lit("total_tokens"),
                    F.lit("total_chars"),
                    F.lit("mean_doc_tokens"),
                    F.lit("p50_doc_tokens"),
                    F.lit("p90_doc_tokens"),
                    F.lit("max_doc_tokens"),
                    F.lit("pct_docs_short"),
                ),
                F.array(
                    F.col("n_docs").cast("double"),
                    F.col("total_tokens").cast("double"),
                    F.col("total_chars").cast("double"),
                    F.col("total_tokens").cast("double")
                    / F.greatest(F.col("n_docs"), F.lit(1)),
                    F.col("p50").cast("double"),
                    F.col("p90").cast("double"),
                    F.col("max_nt").cast("double"),
                    F.col("n_short").cast("double")
                    / F.greatest(F.col("n_docs"), F.lit(1)),
                ),
            )
        ).alias("metric", "value")
    )
    if not group_col:
        return scalars
    total = g.select("n_docs")
    shares = (
        base.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(total))
        .select(
            # NULL groups get a sentinel bucket — a NULL metric name
            # would silently vanish from joins/filters downstream and
            # diverge from the q215 oracle's same-row handling
            F.concat(
                F.lit("share:"), F.coalesce(F.col("_g"), F.lit("<null>"))
            ).alias("metric"),
            (
                F.col("n").cast("double")
                / F.greatest(F.col("n_docs"), F.lit(1))
            ).alias("value"),
        )
    )
    return scalars.unionByName(shares)


def corpus_novelty(
    new: DataFrame,
    old: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    n: int = 8,
) -> DataFrame:
    """Snapshot-over-snapshot novelty report — the data-refresh
    decision table: for each group of the NEW corpus snapshot, how
    many documents are byte-new vs the old snapshot, and what
    fraction of its distinct word n-grams was never seen anywhere
    in the old one.  Crawl teams read exactly this pair to decide
    whether a refresh is worth a training run (near-zero novel-gram
    rate = the new crawl is re-downloads), and it complements the
    incremental fingerprint store (`llm.dedup` q210) which answers
    the same question destructively, per document.

    Exact integers throughout; the rate is one IEEE division of two
    exact counts.  Both sides key on md5 fingerprints (doc level:
    whole text; gram level: the space-joined n-gram) so the
    comparison shuffles 16-byte keys, never full text — and the
    oracle uses the same md5 keys, making collision behavior (2^-64
    — birthday-safe) identical rather than assumed away.

    Plan: gram sides partial-agg to distinct before the LEFT ANTI
    join (the only big shuffle, keyed on the fingerprint); per-group
    rollups are |groups|-row frames joined at the end.  Nothing
    funnels through one task."""
    from hadron_spark.functions.text import ngrams, tokenize

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    gram = lambda df: df.select(  # noqa: E731
        F.col(group_col).alias("_g"),
        F.explode(ngrams(tokenize(F.lower(F.col(text_col))), n)).alias("_gram"),
    ).select("_g", F.md5("_gram").alias("_fp"))
    newg = gram(new).distinct()
    oldg = gram(old).select("_fp").distinct()
    novel = newg.join(oldg, "_fp", "left_anti")
    g_tot = newg.groupBy("_g").agg(F.count(F.lit(1)).alias("n_distinct_ngrams"))
    g_new = novel.groupBy("_g").agg(F.count(F.lit(1)).alias("n_novel_ngrams"))
    docs = new.select(
        F.col(group_col).alias("_g"), F.md5(F.col(text_col)).alias("_fp")
    )
    old_fps = old.select(F.md5(F.col(text_col)).alias("_fp")).distinct()
    d_tot = docs.groupBy("_g").agg(F.count(F.lit(1)).alias("n_docs"))
    d_new = docs.join(old_fps, "_fp", "left_anti").groupBy("_g").agg(
        F.count(F.lit(1)).alias("n_new_docs")
    )
    out = (
        d_tot.join(d_new, "_g", "left")
        .join(g_tot, "_g", "left")
        .join(g_new, "_g", "left")
        .select(
            F.col("_g").alias(group_col),
            "n_docs",
            F.coalesce("n_new_docs", F.lit(0)).alias("n_new_docs"),
            F.coalesce("n_distinct_ngrams", F.lit(0)).alias("n_distinct_ngrams"),
            F.coalesce("n_novel_ngrams", F.lit(0)).alias("n_novel_ngrams"),
        )
        .withColumn(
            "novelty_rate",
            F.when(
                F.col("n_distinct_ngrams") > 0,
                F.col("n_novel_ngrams").cast("double")
                / F.col("n_distinct_ngrams").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )
    return out


def category_drift(
    new: DataFrame,
    old: DataFrame,
    col: str,
) -> DataFrame:
    """Distribution drift between two corpus snapshots over one
    categorical column (source, lang, length bucket): per-category
    counts, shares, and the two-sample chi-square CONTRIBUTION —
    emitted PER CELL rather than summed, the stats tier's discipline
    (a float sum over categories would be order-sensitive; the
    reader or a follow-up exact aggregation ranks cells instead).
    The complement of `corpus_novelty`: that answers "is the new
    crawl new BYTES", this answers "did the MIX shift".

    Exact ints to fixed-order IEEE chains: expected counts are
    ratios of exact longs (e = rowtotal·side_total/N), each cell is
    (o−e)²/e computed identically in any engine.  NULL categories
    count as their own bucket (coalesced to '<null>', the
    corpus_report convention).  One partial-agg'd shuffle per side
    onto |categories| rows; totals broadcast.

    Returns (category, n_new, n_old, share_new, share_old,
    chi2_cell)."""
    cat = lambda df: df.select(  # noqa: E731
        F.coalesce(F.col(col).cast("string"), F.lit("<null>")).alias("_c")
    ).groupBy("_c").agg(F.count(F.lit(1)).alias("_n"))
    a, b = cat(new), cat(old)
    j = (
        a.withColumnRenamed("_n", "n_new")
        .join(b.withColumnRenamed("_n", "n_old"), "_c", "full_outer")
        .select(
            "_c",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
        )
    )
    tot = j.agg(
        F.sum("n_new").alias("_tn"), F.sum("n_old").alias("_to")
    )
    s = j.crossJoin(F.broadcast(tot))
    rowt = (F.col("n_new") + F.col("n_old")).cast("double")
    nn = F.col("_tn").cast("double")
    no = F.col("_to").cast("double")
    grand = (F.col("_tn") + F.col("_to")).cast("double")
    e_new = rowt * nn / grand
    e_old = rowt * no / grand
    on = F.col("n_new").cast("double")
    oo = F.col("n_old").cast("double")
    cell = (on - e_new) * (on - e_new) / e_new + (oo - e_old) * (
        oo - e_old
    ) / e_old
    return s.select(
        F.col("_c").alias("category"),
        "n_new",
        "n_old",
        (on / nn).alias("share_new"),
        (oo / no).alias("share_old"),
        cell.alias("chi2_cell"),
    )


def psi_drift(
    new: DataFrame,
    old: DataFrame,
    col: str,
) -> DataFrame:
    """Population Stability Index between two snapshots over one
    categorical column (or a pre-binned score — feed quantized bins)
    — the model-monitoring standard for "has the scored population
    shifted enough to retrain": per-category
    psi_cell = (p_new − p_old)·ln(p_new/p_old), emitted PER CELL
    (the stats tier's discipline — a float sum over categories is
    order-sensitive; rank or sum the cells downstream).  The usual
    reading: Σ < 0.1 stable, 0.1–0.25 moderate, > 0.25 major shift.

    Shares are Laplace-smoothed — p = (n + 1)/(N + C) with C the
    category count of the union — so a category present on one side
    only cannot produce ±inf; smoothed shares remain ratios of exact
    longs, but ln() is transcendental, so the operator is rows-only
    in the registry (python parity in test_llm_ops); `category_drift`
    carries the hash-exact chi-square statement of the same shift.

    One partial-agg'd shuffle per side onto |categories| rows;
    totals broadcast.  Returns (category, n_new, n_old, p_new,
    p_old, psi_cell)."""
    cat = lambda df: df.select(  # noqa: E731
        F.coalesce(F.col(col).cast("string"), F.lit("<null>")).alias("_c")
    ).groupBy("_c").agg(F.count(F.lit(1)).alias("_n"))
    a, b = cat(new), cat(old)
    j = (
        a.withColumnRenamed("_n", "n_new")
        .join(b.withColumnRenamed("_n", "n_old"), "_c", "full_outer")
        .select(
            "_c",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
        )
    )
    tot = j.agg(
        F.sum("n_new").alias("_tn"),
        F.sum("n_old").alias("_to"),
        F.count(F.lit(1)).alias("_nc"),
    )
    s = j.crossJoin(F.broadcast(tot))
    p_new = (F.col("n_new") + 1).cast("double") / (
        F.col("_tn") + F.col("_nc")
    ).cast("double")
    p_old = (F.col("n_old") + 1).cast("double") / (
        F.col("_to") + F.col("_nc")
    ).cast("double")
    return s.select(
        F.col("_c").alias("category"),
        "n_new",
        "n_old",
        p_new.alias("p_new"),
        p_old.alias("p_old"),
        ((p_new - p_old) * F.log(p_new / p_old)).alias("psi_cell"),
    )


def simpson_diversity(
    df: DataFrame,
    cat_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Corpus-mix concentration per group — the unbiased
    Gini-Simpson diversity 1 − Σ n_i(n_i−1)/(N(N−1)) (the
    probability two documents drawn without replacement differ in
    category) plus the Berger-Parker dominance max n_i/N: the two
    standard "is one source/language swamping the mix" numbers a
    pretraining data card reports next to `corpus_report`'s shares.

    Fully exact: pair counts are int64 sums, both indices are ONE
    IEEE division each (simpson's numerator N(N−1) − Σn_i(n_i−1)
    stays integer), so the frame hashes cross-engine — unlike
    Shannon entropy, whose ln() makes it a rows-only statistic
    (state it separately if needed; Simpson is the exact twin).
    NULL categories count as the '<null>' category (a real slice of
    the mix, q215's convention).  int64 bound: N(N−1) < 2^63 →
    N < 3·10⁹ rows per group.

    Plan: one partial-agg'd shuffle to (group, category) counts,
    one to the group frame.  Returns (group_cols..., n,
    n_categories, pair_same, top_count, simpson, top_share);
    single-row groups (N < 2) yield simpson NULL."""
    gc = list(group_cols or [])
    cnt = (
        df.select(
            *gc,
            F.coalesce(F.col(cat_col).cast("string"), F.lit("<null>")).alias(
                "_c"
            ),
        )
        .groupBy(*gc, "_c")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    agg = cnt.groupBy(*gc).agg(
        F.sum("_n").alias("n"),
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(F.col("_n") * (F.col("_n") - 1)).alias("pair_same"),
        F.max("_n").alias("top_count"),
    )
    pairs_all = F.col("n") * (F.col("n") - 1)
    return agg.select(
        *gc,
        "n",
        "n_categories",
        "pair_same",
        "top_count",
        F.when(
            pairs_all > 0,
            (pairs_all - F.col("pair_same")).cast("double")
            / pairs_all.cast("double"),
        ).alias("simpson"),
        (F.col("top_count").cast("double") / F.col("n").cast("double")).alias(
            "top_share"
        ),
    )


def crosstab_chi2_cells(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """General r×c independence chi-square, emitted PER CELL (the
    stats tier's order-safety discipline — a float sum over cells is
    order-sensitive; rank or sum downstream): cell contribution
    (o·N − r·c)²/(r·c·N) in the cross-multiplied form, a fixed IEEE
    chain over exact int64 images — hash-exact.  `category_drift`
    is the 2×k special case of this against a snapshot pair; this
    one states any two categorical columns' association (source ×
    lang, filter-verdict × model, ...).  NULLs are the '<null>'
    category.

    Plan: one partial-agg'd shuffle to the r×c contingency counts;
    marginals as two aggs of that tiny frame, broadcast back.
    Returns (row_cat, col_cat, o, r_tot, c_tot, n, chi2_cell) —
    ZERO cells are emitted too (via the marginal cross join), since
    an empty observed cell still contributes r·c/N to the
    statistic."""
    cat = lambda c, a: F.coalesce(  # noqa: E731
        F.col(c).cast("string"), F.lit("<null>")
    ).alias(a)
    obs = (
        df.select(cat(row_col, "row_cat"), cat(col_col, "col_cat"))
        .groupBy("row_cat", "col_cat")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    from hadron_spark.operators.ops import pin

    obs = pin(obs)
    rt = obs.groupBy("row_cat").agg(F.sum("o").alias("r_tot"))
    ct = obs.groupBy("col_cat").agg(F.sum("o").alias("c_tot"))
    tot = obs.agg(F.sum("o").alias("n"))
    full = (
        rt.crossJoin(ct)
        .join(obs, ["row_cat", "col_cat"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "row_cat",
            "col_cat",
            F.coalesce("o", F.lit(0)).alias("o"),
            "r_tot",
            "c_tot",
            "n",
        )
    )
    od = F.col("o").cast("double")
    rd = F.col("r_tot").cast("double")
    cd = F.col("c_tot").cast("double")
    nd = F.col("n").cast("double")
    dev = od * nd - rd * cd
    return full.select(
        "row_cat",
        "col_cat",
        "o",
        "r_tot",
        "c_tot",
        "n",
        (dev * dev / (rd * cd * nd)).alias("chi2_cell"),
    )
