"""Exact PR curves and tie-aware AUC vs pure-python references."""

from __future__ import annotations

import random


def _ref_pr(pairs):
    scores = sorted({s for s, _ in pairs})
    P = sum(y for _, y in pairs)
    out = {}
    for t in scores:
        tp = sum(1 for s, y in pairs if s >= t and y)
        pred = sum(1 for s, _ in pairs if s >= t)
        out[t] = (tp, pred - tp, P - tp, tp / pred, tp / P, 2 * tp / (pred + P))
    return out


def _ref_auc(pairs):
    """Mann-Whitney with average ranks."""
    srt = sorted(pairs, key=lambda p: p[0])
    ranks = {}
    i = 0
    while i < len(srt):
        j = i
        while j < len(srt) and srt[j][0] == srt[i][0]:
            j += 1
        avg = (i + 1 + j) / 2
        for k in range(i, j):
            ranks[k] = avg
        i = j
    rpos = sum(r for k, r in ranks.items() if srt[k][1])
    npos = sum(y for _, y in pairs)
    nneg = len(pairs) - npos
    u = rpos - npos * (npos + 1) / 2
    return u / (npos * nneg)


def test_pr_curve_and_auc_match_reference(spark):
    from hadron_spark.llm.evaluation import auc, pr_curve

    rng = random.Random(5)
    pairs = [
        (rng.randint(0, 20), 1 if rng.random() < 0.3 + 0.02 * rng.randint(0, 20) else 0)
        for _ in range(500)
    ]
    # guarantee both classes and heavy ties
    pairs += [(7, 1), (7, 0), (7, 1), (0, 0), (20, 1)]
    df = spark.createDataFrame(pairs, "score long, y int")
    got = {
        r["threshold"]: (
            r["tp"], r["fp"], r["fn"], r["precision"], r["recall"], r["f1"]
        )
        for r in pr_curve(df, "score", "y").collect()
    }
    assert got == _ref_pr(pairs)
    a = auc(df, "score", "y").collect()[0]
    assert a["auc"] == _ref_auc(pairs)
    assert a["n_pos"] == sum(y for _, y in pairs)
    assert a["n_neg"] == len(pairs) - a["n_pos"]
    # perfect separation -> auc 1.0; reversed -> 0.0
    sep = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "score long, y int"
    )
    assert auc(sep, "score", "y").collect()[0]["auc"] == 1.0
    rev = spark.createDataFrame(
        [(4, 0), (5, 0), (1, 1), (2, 1)], "score long, y int"
    )
    assert auc(rev, "score", "y").collect()[0]["auc"] == 0.0


def test_cohens_kappa_reference_and_edges(spark):
    """Textbook 2x2 example; perfect agreement -> 1.0; NULLs drop;
    chance-only agreement -> ~0."""
    from hadron_spark.llm.evaluation import cohens_kappa

    # classic example: a=(20,5,10,15): po=0.7, pe=0.5 -> kappa=0.4
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10
        + [("n", "n")] * 15 + [(None, "y"), ("n", None)]
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 50 and r["agree"] == 35
    assert r["p_o"] == 0.7 and r["p_e"] == 0.5
    assert r["kappa"] == (50 * 35 - 1250) / (2500 - 1250) == 0.4
    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z")], "a string, b string"
    )
    assert cohens_kappa(perfect, "a", "b").collect()[0]["kappa"] == 1.0


def test_calibration_bins_and_ece(spark):
    """Analytic two-bin fixture + randomized parity with a python
    reference; ECE numerator is an exact integer."""
    import random

    from hadron_spark.llm.evaluation import (
        calibration_bins,
        expected_calibration_error,
    )

    rows = [(10, 0)] * 8 + [(10, 1)] * 2 + [(90, 1)] * 7 + [(90, 0)] * 3
    df = spark.createDataFrame(rows, "p int, y int")
    got = {r["bin"]: r for r in calibration_bins(df, "p", "y", n_bins=10).collect()}
    assert got[1]["confidence"] == 0.1 and got[1]["accuracy"] == 0.2
    assert got[9]["confidence"] == 0.9 and got[9]["accuracy"] == 0.7
    e = expected_calibration_error(df, "p", "y", n_bins=10).collect()[0]
    # ece = (|2*100-100| + |7*100-900|)/ (20*100) = (100+200)/2000
    assert e["ece_num"] == 300 and e["ece"] == 300 / 2000

    rng = random.Random(23)
    rnd = [(rng.randint(0, 100), rng.randint(0, 1)) for _ in range(400)]
    rdf = spark.createDataFrame(rnd, "p int, y int")
    ref_bins = {}
    for p, y in rnd:
        b = min(9, p * 10 // 100)
        n, su, sp = ref_bins.get(b, (0, 0, 0))
        ref_bins[b] = (n + 1, su + p, sp + y)
    for b, (n, su, sp) in ref_bins.items():
        r = calibration_bins(rdf, "p", "y", n_bins=10).filter(
            f"bin = {b}"
        ).collect()[0]
        assert (r["n"], r["sum_units"], r["sum_pos"]) == (n, su, sp)
        break  # one bin suffices; full table checked via ECE below
    want_num = sum(abs(sp * 100 - su) for _, su, sp in ref_bins.values())
    got_e = expected_calibration_error(rdf, "p", "y", n_bins=10).collect()[0]
    assert got_e["ece_num"] == want_num
    assert got_e["ece"] == want_num / (400 * 100)


def _ref_ranking(rows, k):
    """Exact per-query metrics via Fractions (float() of a Fraction
    is correctly rounded — the same value as one IEEE division)."""
    from collections import defaultdict
    from fractions import Fraction
    from math import lcm

    L = lcm(*range(1, k + 1))
    by_q = defaultdict(list)
    for q, d, s, y in rows:
        by_q[q].append((d, s, y))
    out = {}
    for q, cands in by_q.items():
        ranked = sorted(cands, key=lambda c: (-c[1], c[0]))
        n_rel = sum(y for _, _, y in ranked)
        topk = ranked[:k]
        hits = sum(y for _, _, y in topk)
        first = None
        ap_units = 0
        h = 0
        for i, (_, _, y) in enumerate(topk, start=1):
            if y:
                h += 1
                if first is None:
                    first = i
                ap_units += h * (L // i)
        rr_units = L // first if first else 0
        out[q] = (
            len(cands),
            n_rel,
            hits,
            rr_units,
            ap_units,
            float(Fraction(hits, k)),
            float(Fraction(hits, n_rel)) if n_rel else None,
            float(Fraction(rr_units, L)),
            float(Fraction(ap_units, L * min(n_rel, k))) if n_rel else None,
        )
    return out


def _ranking_fixture():
    import random

    rng = random.Random(11)
    rows = []
    for q in range(18):
        n = rng.randint(1, 25)
        docs = rng.sample(range(60), n)
        for d in docs:
            rows.append((q, d, rng.randint(0, 5), 1 if rng.random() < 0.3 else 0))
    # a query with zero relevant docs and one with every doc relevant
    rows += [(98, 1, 3, 0), (98, 2, 3, 0), (98, 3, 1, 0)]
    rows += [(99, 1, 2, 1), (99, 2, 2, 1)]
    return rows


def test_ranking_metrics_match_fraction_reference(spark):
    from hadron_spark.llm.evaluation import ranking_metrics

    rows = _ranking_fixture()
    df = spark.createDataFrame(rows, "q long, d long, s long, y int")
    got = {
        r["q"]: (
            r["n_cand"], r["n_rel"], r["hits"], r["rr_units"], r["ap_units"],
            r["precision"], r["recall"], r["rr"], r["ap"],
        )
        for r in ranking_metrics(df, "q", "d", "s", "y", k=10).collect()
    }
    assert got == _ref_ranking(rows, 10)


def test_ranking_summary_exact(spark):
    from fractions import Fraction

    from hadron_spark.llm.evaluation import ranking_summary

    rows = _ranking_fixture()
    ref = _ref_ranking(rows, 10)
    df = spark.createDataFrame(rows, "q long, d long, s long, y int")
    got = ranking_summary(df, "q", "d", "s", "y", k=10).collect()[0]
    n = len(ref)
    sum_hits = sum(v[2] for v in ref.values())
    sum_rr = sum(v[3] for v in ref.values())
    sum_rel = sum(v[1] for v in ref.values())
    assert got["n_queries"] == n
    assert got["n_evaluated"] == sum(1 for v in ref.values() if v[1] > 0)
    assert got["sum_hits"] == sum_hits
    assert got["sum_rr_units"] == sum_rr
    assert got["mrr"] == float(Fraction(sum_rr, n * 2520))
    assert got["mean_precision"] == float(Fraction(sum_hits, n * 10))
    assert got["micro_recall"] == float(Fraction(sum_hits, sum_rel))


def test_ranking_metrics_k_bounds(spark):
    import pytest

    from hadron_spark.llm.evaluation import ranking_metrics

    df = spark.createDataFrame([(1, 1, 1, 1)], "q long, d long, s long, y int")
    with pytest.raises(ValueError):
        ranking_metrics(df, "q", "d", "s", "y", k=0)
    with pytest.raises(ValueError):
        ranking_metrics(df, "q", "d", "s", "y", k=43)


def test_ndcg_matches_python_reference(spark):
    from collections import defaultdict
    from math import log2

    import pytest

    from hadron_spark.llm.evaluation import ndcg

    rows = _ranking_fixture()
    by_q = defaultdict(list)
    for q, d, s, y in rows:
        by_q[q].append((d, s, y))
    ref = {}
    for q, cands in by_q.items():
        ranked = sorted(cands, key=lambda c: (-c[1], c[0]))
        ideal = sorted(cands, key=lambda c: (-c[2], -c[1], c[0]))
        dcg = sum(y / log2(i + 1) for i, (_, _, y) in enumerate(ranked[:10], 1))
        idcg = sum(y / log2(i + 1) for i, (_, _, y) in enumerate(ideal[:10], 1))
        ref[q] = (dcg, idcg, dcg / idcg if idcg > 0 else None)
    df = spark.createDataFrame(rows, "q long, d long, s long, y int")
    got = {
        r["q"]: (r["dcg"], r["idcg"], r["ndcg"])
        for r in ndcg(df, "q", "d", "s", "y", k=10).collect()
    }
    assert set(got) == set(ref)
    for q in ref:
        for a, b in zip(got[q], ref[q]):
            if b is None:
                assert a is None
            else:
                assert a == pytest.approx(b, rel=1e-12)


def _ref_bt(outcomes, iters, eps=1e-12):
    from collections import defaultdict

    nab = defaultdict(int)
    W = defaultdict(int)
    L = defaultdict(int)
    items = set()
    for w, l, n in outcomes:
        if w == l:
            continue
        key = (min(w, l), max(w, l))
        nab[key] += n
        W[w] += n
        L[l] += n
        items |= {w, l}
    p = {i: 1.0 for i in items}
    for _ in range(iters):
        denom = defaultdict(float)
        for (a, b), n in nab.items():
            d = n / (p[a] + p[b])
            denom[a] += d
            denom[b] += d
        praw = {i: max(W.get(i, 0) / denom[i], eps) for i in items}
        t = sum(praw.values())
        c = len(items)
        p = {i: praw[i] * c / t for i in items}
    return {i: (W.get(i, 0), L.get(i, 0), p[i]) for i in items}


def test_bradley_terry_matches_python_reference(spark):
    import random

    import pytest

    from hadron_spark.llm.evaluation import bradley_terry

    rng = random.Random(7)
    true = {"a": 8.0, "b": 4.0, "c": 2.0, "d": 1.0, "e": 0.5}
    outcomes = []
    names = list(true)
    for _ in range(600):
        i, j = rng.sample(names, 2)
        win = rng.random() < true[i] / (true[i] + true[j])
        outcomes.append((i, j, 1) if win else ((j, i, 1)))
    # an item that never wins (floor path) and a self-pair (dropped)
    outcomes += [("a", "z", 1), ("b", "z", 1), ("a", "a", 1)]
    df = spark.createDataFrame(outcomes, "w string, l string, n int")
    got = {
        r["item"]: (r["wins"], r["losses"], r["strength"])
        for r in bradley_terry(df, "w", "l", iters=20).collect()
    }
    ref = _ref_bt(outcomes, 20)
    assert set(got) == set(ref)
    for i in ref:
        assert got[i][0] == ref[i][0] and got[i][1] == ref[i][1]
        assert got[i][2] == pytest.approx(ref[i][2], rel=1e-8)
    # ordering sanity: fitted strengths recover the generating order
    fit = sorted(true, key=lambda i: -got[i][2])
    assert fit == ["a", "b", "c", "d", "e"]
    assert got["z"][2] < got["e"][2]


def test_bradley_terry_weighted_equals_expanded(spark):
    import pytest

    from hadron_spark.llm.evaluation import bradley_terry

    pairs = [("a", "b", 3), ("b", "c", 2), ("a", "c", 1), ("c", "a", 1)]
    expanded = [(w, l, 1) for (w, l, n) in pairs for _ in range(n)]
    d1 = spark.createDataFrame(pairs, "w string, l string, n int")
    d2 = spark.createDataFrame(expanded, "w string, l string, n int")
    g1 = {r["item"]: r["strength"]
          for r in bradley_terry(d1, "w", "l", iters=15, weight_col="n").collect()}
    g2 = {r["item"]: r["strength"]
          for r in bradley_terry(d2, "w", "l", iters=15).collect()}
    assert set(g1) == set(g2)
    for i in g1:
        assert g1[i] == pytest.approx(g2[i], rel=1e-10)


def test_fleiss_kappa_reference_and_dropping(spark):
    """Fleiss kappa vs a pure-python reference on a 5-category
    panel; perfect agreement gives exactly 1.0; items with the
    wrong rating count are dropped and counted."""
    import pytest

    from hadron_spark.llm.evaluation import fleiss_kappa

    table = [
        [0, 0, 0, 0, 4],
        [0, 1, 2, 1, 0],
        [0, 0, 1, 2, 1],
        [0, 2, 2, 0, 0],
        [1, 1, 2, 0, 0],
        [2, 2, 0, 0, 0],
        [1, 1, 1, 1, 0],
        [0, 2, 1, 0, 1],
    ]
    n = 4
    rows = []
    for i, cats in enumerate(table):
        for j, cnt in enumerate(cats):
            rows += [(i, f"c{j}")] * cnt
    rows += [(100, "c0"), (100, "c1")]  # 2 ratings only -> dropped
    rows += [(101, "c2")] * 5  # 5 ratings -> dropped
    df = spark.createDataFrame(rows, "item long, cat string")
    got = fleiss_kappa(df, "item", "cat", n_raters=n).collect()[0]
    N = len(table)
    po_num = sum(c * (c - 1) for cats in table for c in cats)
    cj = [sum(cats[j] for cats in table) for j in range(5)]
    pe_num = sum(c * c for c in cj)
    p_o = po_num / (N * n * (n - 1))
    p_e = pe_num / (N * n) ** 2
    assert (got["n_items"], got["n_raters"], got["n_items_dropped"]) == (N, n, 2)
    assert (got["po_num"], got["pe_num"]) == (po_num, pe_num)
    assert got["kappa"] == pytest.approx((p_o - p_e) / (1 - p_e), rel=1e-14)

    perfect = spark.createDataFrame(
        [(i, f"c{i % 3}") for i in range(6) for _ in range(n)],
        "item long, cat string",
    )
    assert fleiss_kappa(perfect, "item", "cat", n_raters=n).collect()[0][
        "kappa"
    ] == 1.0
    with pytest.raises(ValueError):
        fleiss_kappa(df, "item", "cat", n_raters=1)


def test_lift_table_reference(spark):
    """Decile lift vs a python reference with deterministic
    (score desc, id) tie-break; top tile lift > 1 for a predictive
    score; all-cumulative tile has lift exactly 1; validation."""
    import pytest

    from hadron_spark.llm.evaluation import lift_table

    rows = [(i, 1000 - i, 1 if i < 30 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, score long, y long")
    got = {r["tile"]: r for r in lift_table(df, "score", "y", "id", 10).collect()}
    assert len(got) == 10
    # score is perfectly anti-correlated with id; positives ids 0..29
    # occupy the top 3 tiles exactly
    assert got[1]["pos"] == 10 and got[3]["pos"] == 10 and got[4]["pos"] == 0
    assert got[1]["lift"] == pytest.approx((10 * 100) / (10 * 30), rel=1e-15)
    assert got[3]["capture"] == pytest.approx(1.0, rel=1e-15)
    assert got[10]["lift"] == pytest.approx(1.0, rel=1e-15)
    assert got[10]["cum_n"] == 100 and got[10]["cum_pos"] == 30
    with pytest.raises(ValueError):
        lift_table(df, "score", "y", "id", 0)


def test_confusion_and_youden_reference(spark):
    """Confusion rows vs a python sweep (tp/fp/fn/tn, tpr/fpr, J,
    MCC) on a tied-score fixture; youden_threshold picks the
    max-J threshold with smallest-threshold tie-break."""
    import math

    import pytest

    from hadron_spark.llm.evaluation import (
        confusion_at_threshold,
        youden_threshold,
    )

    scores = [1, 1, 2, 2, 2, 3, 4, 4, 5, 5, 5, 5]
    labels = [0, 0, 0, 1, 0, 1, 1, 0, 1, 1, 1, 0]
    df = spark.createDataFrame(
        list(zip(scores, labels)), "s long, y long"
    )
    got = {
        r["threshold"]: r
        for r in confusion_at_threshold(df, "s", "y").collect()
    }
    P = sum(labels)
    Ng = len(labels) - P
    best = None
    for t in sorted(set(scores)):
        tp = sum(1 for s, y in zip(scores, labels) if s >= t and y == 1)
        fp = sum(1 for s, y in zip(scores, labels) if s >= t and y == 0)
        fn, tn = P - tp, Ng - fp
        r = got[t]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
        assert r["tpr"] == tp / P and r["fpr"] == fp / Ng
        assert r["j"] == pytest.approx(tp / P - fp / Ng, rel=1e-14)
        den = math.sqrt((tp + fp)) * math.sqrt((tp + fn)) * math.sqrt(
            (tn + fp)
        ) * math.sqrt((tn + fn))
        if den > 0:
            assert r["mcc"] == pytest.approx(
                (tp * tn - fp * fn) / den, rel=1e-12
            )
        jn = tp * Ng - fp * P
        if best is None or jn > best[0] or (jn == best[0] and t < best[1]):
            best = (jn, t) if best is None or jn > best[0] else best
    # recompute the exact best with the smallest-threshold tie rule
    cand = []
    for t in sorted(set(scores)):
        tp = sum(1 for s, y in zip(scores, labels) if s >= t and y == 1)
        fp = sum(1 for s, y in zip(scores, labels) if s >= t and y == 0)
        cand.append((tp * Ng - fp * P, -t, t, tp, fp))
    jn, _, t, tp, fp = max(cand)
    yrow = youden_threshold(df, "s", "y").collect()[0]
    assert yrow["threshold"] == t and (yrow["tp"], yrow["fp"]) == (tp, fp)
    assert yrow["j"] == pytest.approx(jn / (P * Ng), rel=1e-14)

    one_class = spark.createDataFrame([(1, 1), (2, 1)], "s long, y long")
    rows = confusion_at_threshold(one_class, "s", "y").collect()
    assert all(
        r["mcc"] is None and r["j"] is None and r["fpr"] is None
        and r["specificity"] is None
        for r in rows
    )


def test_token_budget_curve_reference(spark):
    """Token-mass gains curve vs a python reference (ntile over
    (score desc, id asc), cumulative token/quality masses, exact
    cross-product lift); bottom tile telescopes to share = capture =
    lift = 1; composition: a budget read off the curve hands
    select_token_budget a cut whose selected token mass equals the
    curve's cum_tokens for that tile."""
    import pytest

    from hadron_spark.llm.evaluation import token_budget_curve
    from hadron_spark.llm.mixing import select_token_budget

    rows = [
        (i, 1000 - i, 10 + (i * 7) % 13, (10 + (i * 7) % 13) if i < 40 else 0)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "id long, score long, tok long, q long")
    got = {
        r["tile"]: r
        for r in token_budget_curve(df, "score", "tok", "q", "id", 10).collect()
    }
    # python reference: score desc, id asc is exactly id asc here
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    T = sum(r[2] for r in order)
    Q = sum(r[3] for r in order)
    cum_t = cum_q = 0
    for tile in range(1, 11):
        chunk = order[(tile - 1) * 10 : tile * 10]
        t = sum(r[2] for r in chunk)
        q = sum(r[3] for r in chunk)
        cum_t += t
        cum_q += q
        g = got[tile]
        assert (g["n_docs"], g["tokens"], g["quality"]) == (10, t, q)
        assert (g["cum_tokens"], g["cum_quality"]) == (cum_t, cum_q)
        assert g["token_share"] == cum_t / float(T)
        assert g["quality_capture"] == cum_q / float(Q)
        assert g["lift"] == (cum_q * T) / float(cum_t * Q)
    assert got[10]["token_share"] == 1.0
    assert got[10]["quality_capture"] == 1.0
    assert got[10]["lift"] == 1.0
    # positives are the top 4 tiles exactly -> capture 1.0 at tile 4
    assert got[4]["quality_capture"] == 1.0
    with pytest.raises(ValueError):
        token_budget_curve(df, "score", "tok", "q", "id", 0)

    # composition: materialize the tile-3 budget with
    # select_token_budget -> same selected token mass, same doc set
    budget = got[3]["cum_tokens"]
    sel = select_token_budget(df, budget, "score", "tok", id_col="id")
    sel_rows = sel.collect()
    assert sum(r["tok"] for r in sel_rows) == budget
    assert {r["id"] for r in sel_rows} == {r[0] for r in order[:30]}


def test_mcnemar_reference(spark):
    """b/c discordant counts, chi2 and continuity-corrected chi2 vs
    hand math; zero-discordant guard; grouping."""
    from hadron_spark.llm.evaluation import mcnemar

    # label, predA, predB designed for b=5, c=2 within group g1
    rows = []
    rows += [("g1", 1, 1, 0)] * 5   # A right, B wrong  -> b
    rows += [("g1", 1, 0, 1)] * 2   # A wrong, B right  -> c
    rows += [("g1", 1, 1, 1)] * 3   # both right
    rows += [("g1", 0, 1, 1)] * 4   # both wrong
    rows += [("g2", 1, 1, 1)] * 6   # no discordance
    df = spark.createDataFrame(rows, "g string, y int, pa int, pb int")
    got = {r["g"]: r for r in mcnemar(df, "pa", "pb", "y", ["g"]).collect()}
    g1 = got["g1"]
    assert (g1["b"], g1["c"], g1["n"], g1["n_concordant"]) == (5, 2, 14, 7)
    assert g1["chi2"] == (5 - 2) ** 2 / 7.0
    assert g1["chi2_cc"] == (abs(5 - 2) - 1) ** 2 / 7.0
    g2 = got["g2"]
    assert g2["b"] == 0 and g2["c"] == 0
    assert g2["chi2"] is None and g2["chi2_cc"] is None

    # NULL pred/label rows are excluded up front (pairwise-complete):
    # n must stay = n_concordant + b + c, never silently diverge
    nrows = rows + [("g1", None, 1, 0), ("g1", 1, None, 1), ("g1", 1, 1, None)]
    ndf = spark.createDataFrame(nrows, "g string, y int, pa int, pb int")
    ng1 = {r["g"]: r for r in mcnemar(ndf, "pa", "pb", "y", ["g"]).collect()}["g1"]
    assert (ng1["b"], ng1["c"], ng1["n"], ng1["n_concordant"]) == (5, 2, 14, 7)
    assert ng1["n"] == ng1["n_concordant"] + ng1["b"] + ng1["c"]


def test_brier_score_reference(spark):
    """Brier vs hand math; perfect predictor -> 0; constant-base-rate
    predictor has nonzero Brier even where ECE is ~0 (the proper-
    scoring-rule distinction); NULL exclusion; grouping."""
    import pytest

    from hadron_spark.llm.evaluation import brier_score

    rows = [("a", 90, 1), ("a", 10, 0), ("a", 70, 0), ("a", 40, 1),
            ("b", 100, 1), ("b", 0, 0), ("b", None, 1), ("b", 50, None)]
    df = spark.createDataFrame(rows, "g string, p int, y int")
    got = {r["g"]: r for r in
           brier_score(df, "p", "y", group_cols=["g"]).collect()}
    num_a = (90 - 100) ** 2 + 10 ** 2 + 70 ** 2 + (40 - 100) ** 2
    assert got["a"]["n"] == 4 and got["a"]["brier_num"] == num_a
    assert got["a"]["brier"] == num_a / (4 * 100.0 ** 2)
    assert got["b"]["n"] == 2 and got["b"]["brier"] == 0.0  # perfect

    # constant 50% predictor on a balanced set: ECE-style gap is 0
    # but Brier = 0.25 — the refinement term
    flat = spark.createDataFrame(
        [(50, 1), (50, 0), (50, 1), (50, 0)], "p int, y int"
    )
    r = brier_score(flat, "p", "y").collect()[0]
    assert r["brier"] == 0.25

    with pytest.raises(ValueError, match="scale"):
        brier_score(df, "p", "y", scale=0)


def test_pass_at_k_reference(spark):
    """pass@k vs the Codex-paper comb() estimator; k > n NULL; exact
    0/1 endpoints; summarized mean via sorted fold."""
    from math import comb

    from hadron_spark.llm.evaluation import pass_at_k

    tasks = {"t1": (10, 3), "t2": (10, 0), "t3": (10, 10), "t4": (5, 2)}
    rows = [
        (t, 1 if i < c else 0)
        for t, (n, c) in tasks.items()
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "task string, ok int")
    got = {
        (r["task"], r["k"]): r
        for r in pass_at_k(df, "task", "ok", ks=[1, 5, 10]).collect()
    }
    for t, (n, c) in tasks.items():
        for k in (1, 5, 10):
            r = got[(t, k)]
            assert r["n"] == n and r["c"] == c
            if k > n:
                assert r["pass_at_k"] is None
            else:
                ref = 1.0 - comb(n - c, k) / comb(n, k)
                assert abs(r["pass_at_k"] - ref) < 1e-15
                if c == 0:
                    assert r["pass_at_k"] == 0.0
                if n - c < k:
                    assert r["pass_at_k"] == 1.0

    summ = {
        r["k"]: r
        for r in pass_at_k(
            df, "task", "ok", ks=[1, 5], summarize=True
        ).collect()
    }
    for k in (1, 5):
        vals = sorted(
            (t, 1.0 - comb(n - c, k) / comb(n, k))
            for t, (n, c) in tasks.items()
            if k <= n
        )
        acc = 0.0
        for _, v in vals:
            acc += v
        assert summ[k]["n_tasks"] == len(vals)
        assert summ[k]["mean_pass_at_k"] == acc / len(vals)


def test_krippendorff_alpha_reference(spark):
    """Nominal Krippendorff alpha vs the coincidence-matrix python
    mirror on the textbook example with missing ratings; perfect
    agreement -> 1; single-category guard -> NULL; max_raters
    raise."""
    import pytest

    from hadron_spark.llm.evaluation import krippendorff_alpha

    # Krippendorff's canonical example (4 coders, 12 units, missing):
    # unit: list of ratings present
    units = {
        1: [1, 1, 1], 2: [2, 2, 2], 3: [3, 3, 3, 3], 4: [3, 3, 3, 3],
        5: [2, 2, 2, 2], 6: [1, 2, 3, 4], 7: [4, 4, 4, 4],
        8: [1, 1, 2, 2], 9: [2, 2, 2, 2], 10: [5, 5, 5],
        11: [1, 1, 1], 12: [3, 3, 3],
    }
    rows = [(u, v) for u, vs in units.items() for v in vs]
    df = spark.createDataFrame(rows, "u long, v long")
    r = krippendorff_alpha(df, "u", "v").collect()[0]

    from collections import Counter

    n = sum(len(vs) for vs in units.values())
    s = sum(
        sum(c * (m - c) for c in Counter(vs).values()) / (len(vs) - 1)
        for vs, m in ((vs, len(vs)) for vs in units.values())
    )
    ncat = Counter(v for vs in units.values() for v in vs)
    d = sum(c * (n - c) for c in ncat.values())
    alpha_ref = 1.0 - (n - 1) * s / d
    assert r["n_units"] == 12 and r["n_ratings"] == n
    assert abs(r["alpha"] - alpha_ref) < 1e-12

    # perfect agreement -> alpha == 1 exactly (S_L == 0)
    perf = krippendorff_alpha(
        spark.createDataFrame(
            [(u, u % 2) for u in range(6) for _ in range(3)],
            "u long, v long",
        ),
        "u", "v",
    ).collect()[0]
    assert perf["alpha"] == 1.0

    # one category everywhere: D_e == 0 -> NULL
    flat = krippendorff_alpha(
        spark.createDataFrame(
            [(u, 7) for u in range(4) for _ in range(2)], "u long, v long"
        ),
        "u", "v",
    ).collect()[0]
    assert flat["alpha"] is None

    # unit wider than max_raters raises
    with pytest.raises(ValueError, match="max_raters"):
        krippendorff_alpha(
            spark.createDataFrame(
                [(1, v) for v in range(5)], "u long, v long"
            ),
            "u", "v", max_raters=4,
        )


def test_reciprocal_rank_fusion_reference(spark):
    """RRF fused scores vs the 1/(k0+rank) python mirror in ranker-
    sorted fold order; tie-break by doc; top_n cut."""
    from hadron_spark.llm.evaluation import reciprocal_rank_fusion

    runs = {
        "bm25": ["d1", "d2", "d3", "d4"],
        "dense": ["d3", "d1", "d5", "d2"],
        "recency": ["d5", "d4", "d1", "d2"],
    }
    rows = [
        ("q1", d, rname, i + 1)
        for rname, docs in runs.items()
        for i, d in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "q string, doc string, rr string, rank int")
    got = {
        r["doc"]: r
        for r in reciprocal_rank_fusion(df, "q", "doc", "rr", "rank").collect()
    }
    docs = sorted({d for docs in runs.values() for d in docs})
    for d in docs:
        terms = sorted(
            (rname, docs_.index(d) + 1)
            for rname, docs_ in runs.items()
            if d in docs_
        )
        acc = 0.0
        for _, rk in terms:
            acc += 1.0 / (60.0 + rk)
        assert got[d]["score"] == acc
        assert got[d]["n_rankers"] == len(terms)
    ordered = sorted(docs, key=lambda d: (-got[d]["score"], d))
    for i, d in enumerate(ordered):
        assert got[d]["fused_rank"] == i + 1
    top2 = reciprocal_rank_fusion(
        df, "q", "doc", "rr", "rank", top_n=2
    ).collect()
    assert sorted(r["doc"] for r in top2) == sorted(ordered[:2])


def test_isotonic_calibrate_reference(spark):
    """Minimax isotonic fit vs a sequential PAV python mirror on a
    non-monotone empirical rate curve; monotonicity; perfect
    separation passthrough; grouped fit independence."""
    import pytest

    from hadron_spark.llm.evaluation import isotonic_calibrate

    # scores with deliberately non-monotone pass rates
    cfg = {  # score: (n, pos)
        1: (4, 0), 2: (4, 3), 3: (4, 1), 4: (4, 2), 5: (4, 4),
    }
    rows = [
        (s, 1 if i < p else 0)
        for s, (n, p) in cfg.items()
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "score long, y int")
    got = {
        r["score"]: r for r in isotonic_calibrate(df, "score", "y").collect()
    }

    def pav(points):  # [(w, y_sum)] in score order -> fitted per point
        blocks = [[w, y, 1] for w, y in points]  # weight, ysum, span
        out = []
        stack = []
        for b in blocks:
            stack.append(b)
            while len(stack) >= 2 and (
                stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]
            ):
                w2, y2, s2 = stack.pop()
                stack[-1][0] += w2
                stack[-1][1] += y2
                stack[-1][2] += s2
            pass
        for w, y, s in stack:
            out.extend([y / w] * s)
        return out

    fitted = pav([(n, p) for _, (n, p) in sorted(cfg.items())])
    for (s, (n, p)), f in zip(sorted(cfg.items()), fitted):
        r = got[s]
        assert r["n"] == n and r["pos"] == p and r["rate"] == p / n
        assert r["calibrated"] == pytest.approx(f, abs=1e-12), s
    cal = [got[s]["calibrated"] for s in sorted(cfg)]
    assert cal == sorted(cal)  # monotone

    # already-monotone rates pass through unchanged
    mono = {1: (2, 0), 2: (2, 1), 3: (2, 2)}
    rows2 = [
        (s, 1 if i < p else 0)
        for s, (n, p) in mono.items()
        for i in range(n)
    ]
    got2 = {
        r["score"]: r["calibrated"]
        for r in isotonic_calibrate(
            spark.createDataFrame(rows2, "score long, y int"), "score", "y"
        ).collect()
    }
    assert got2 == {1: 0.0, 2: 0.5, 3: 1.0}

    # groups fit independently
    both = spark.createDataFrame(
        [("g1", s, y) for s, y in rows] + [("g2", s, y) for s, y in rows2],
        "g string, score long, y int",
    )
    gg = isotonic_calibrate(both, "score", "y", ["g"]).collect()
    g1 = {r["score"]: r["calibrated"] for r in gg if r["g"] == "g1"}
    for (s, _), f in zip(sorted(cfg.items()), fitted):
        assert g1[s] == pytest.approx(f, abs=1e-12)


def test_cronbach_alpha_reference(spark):
    """Cronbach alpha vs the textbook python mirror; incomplete
    subjects dropped; perfectly parallel items -> alpha == 1;
    degenerate guards."""
    import pytest

    # 6 subjects x 3 items, correlated scores
    grid = {
        "s1": (4, 5, 4), "s2": (2, 2, 3), "s3": (5, 5, 5),
        "s4": (1, 2, 1), "s5": (3, 3, 4), "s6": (4, 4, 4),
    }
    from hadron_spark.llm.evaluation import cronbach_alpha

    rows = [
        (s, f"i{j}", v)
        for s, vs in grid.items()
        for j, v in enumerate(vs)
    ] + [("s7", "i0", 3)]  # incomplete: dropped
    df = spark.createDataFrame(rows, "subj string, item string, x long")
    r = cronbach_alpha(df, "subj", "item", "x").collect()[0]

    k = 3
    subs = list(grid.values())
    n = len(subs)

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    item_vars = [var([vs[j] for vs in subs]) for j in range(k)]
    tot_var = var([sum(vs) for vs in subs])
    a_ref = k / (k - 1) * (1 - sum(item_vars) / tot_var)
    assert r["k"] == k and r["n_subjects"] == n
    assert abs(r["alpha"] - a_ref) < 1e-12

    # perfectly parallel items (identical columns): alpha == 1
    par = [
        (s, f"i{j}", v)
        for s, v in (("a", 1), ("b", 3), ("c", 5))
        for j in range(3)
    ]
    rp = cronbach_alpha(
        spark.createDataFrame(par, "subj string, item string, x long"),
        "subj", "item", "x",
    ).collect()[0]
    assert rp["alpha"] == pytest.approx(1.0, abs=1e-12)

    # zero total variance -> NULL
    flat = cronbach_alpha(
        spark.createDataFrame(
            [(s, i, 2) for s in ("a", "b") for i in ("x", "y")],
            "subj string, item string, x long",
        ),
        "subj", "item", "x",
    ).collect()[0]
    assert flat["alpha"] is None


def test_icc_oneway_reference(spark):
    """ICC(1,1) vs the Shrout-Fleiss ANOVA python mirror on an
    unbalanced design; near-1 on subject-dominated variance;
    singleton subjects excluded."""
    import pytest

    from hadron_spark.llm.evaluation import icc_oneway

    grid = {
        1: [10, 11, 9], 2: [20, 21], 3: [30, 29, 31, 30], 4: [15, 16],
        5: [25],  # singleton: excluded
    }
    rows = [(s, v) for s, vs in grid.items() for v in vs]
    df = spark.createDataFrame(rows, "subj long, x long")
    r = icc_oneway(df, "subj", "x").collect()[0]

    kept = {s: vs for s, vs in grid.items() if len(vs) >= 2}
    nn = sum(len(vs) for vs in kept.values())
    n = len(kept)
    gm = sum(sum(vs) for vs in kept.values()) / nn
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in kept.values())
    ssw = sum(
        (x - sum(vs) / len(vs)) ** 2 for vs in kept.values() for x in vs
    )
    msb, msw = ssb / (n - 1), ssw / (nn - n)
    k0 = (nn - sum(len(vs) ** 2 for vs in kept.values()) / nn) / (n - 1)
    icc_ref = (msb - msw) / (msb + (k0 - 1) * msw)
    assert r["n_subjects"] == n and r["n_ratings"] == nn
    assert abs(r["icc"] - icc_ref) < 1e-12
    assert r["icc"] > 0.9  # subject-dominated by construction
