"""Text analysis functions — tokenization, n-grams, quality features.

Mirrors the reference's flagship text workload (word tokenization via
B.words, examples/WordCount.hs:21-29) and extends it with the
text-analysis ops a training-data pipeline needs (language ID
heuristics, quality scoring, token counting, fingerprinting).

All functions are Catalyst expressions (split/transform/filter/
aggregate on arrays) — whole-stage-codegen'd, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small built-in english stopword list for ratio features (public domain)
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that",
]


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization (B.words analog) → array<string>,
    empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """= size(tokenize(col)) by construction — runs of non-whitespace
    ≡ split-on-\\s+ minus empties — but regexp_count is a plain
    codegen-able counter: no array build, no HOF interpreter hop
    (VERDICT r4 #1 hot-path discipline)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"\S+"))


def ngrams(tokens: Column, n: int) -> Column:
    """Word n-grams from a token array (joined with single space).
    Expression-only: index-aware transform, nulls filtered."""
    return F.filter(
        F.transform(
            tokens,
            lambda _t, i: F.when(
                i <= F.size(tokens) - n, F.concat_ws(" ", F.slice(tokens, i + 1, n))
            ),
        ),
        lambda g: g.isNotNull(),
    )


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-shingles → array<string> (substrate for MinHash)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return F.when(n < k, F.array(c)).otherwise(
        F.transform(F.sequence(F.lit(1), n - k + 1), lambda i: c.substr(i, F.lit(k)))
    )


# GPT-2-style pretokenizer pattern (simplified; public knowledge —
# Radford et al. 2019 / tiktoken): contraction suffixes, space-prefixed
# letter runs, digit runs, punctuation runs. Restricted to constructs
# with identical semantics in Java regex (Spark) and RE2 (DuckDB) so
# token counts are oracle-portable.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def bpe_ish_tokenize(col: Column | str) -> Column:
    """BPE-style pretokenization (the unit a GPT-2-family tokenizer
    would merge within) → array<string>. Codegen'd regexp_extract_all,
    no Python in the loop; the realistic token-budget estimator for
    training-data accounting, vs the whitespace lower bound of
    `tokenize`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def bpe_token_count(col: Column | str) -> Column:
    return F.size(bpe_ish_tokenize(col))


def stopword_ratio(col: Column | str, _toks: Column | None = None) -> Column:
    toks = F.transform(
        _toks if _toks is not None else tokenize(col), lambda t: F.lower(t)
    )
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_features(
    col: Column | str, _toks: Column | None = None
) -> dict[str, Column]:
    """Deterministic quality features for document scoring:
    n_tokens, n_chars, mean token length, stopword ratio.
    `_toks`: pre-projected token array — evaluates tokenize() once
    per row instead of once per feature reference (the
    projection-boundary rule; see llm.filters.quality_rules)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = _toks if _toks is not None else tokenize(c)
    # a caller that only reads n_tokens/n_chars (the q100 quality
    # gate) should not pay an interpreted tokenize+size HOF —
    # token_count is the codegen-able regexp counter, equal by
    # construction; with a pre-projected array, size() is free
    n_tok = F.size(toks) if _toks is not None else token_count(c)
    total_tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return {
        "n_tokens": n_tok,
        "n_chars": F.length(c),
        "mean_token_len": F.when(
            n_tok > 0, total_tok_chars.cast("double") / n_tok
        ).otherwise(F.lit(0.0)),
        "stopword_ratio": stopword_ratio(c, _toks=toks),
    }


def fingerprint(col: Column | str) -> Column:
    """Normalized document fingerprint: lowercase, collapse whitespace,
    sort unique tokens, md5 — a deterministic key for exact-ish dedup
    (case/word-order insensitive)."""
    toks = F.transform(tokenize(col), lambda t: F.lower(t))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return F.md5(canon.cast("binary"))


# ---------------------------------------------------------------------------
# HTML boilerplate stripping (web-crawl → pretraining text)
# ---------------------------------------------------------------------------

# entity → replacement, applied after tag removal; ordered so '&amp;'
# unescapes LAST (otherwise '&amp;lt;' would double-unescape).
_HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def html_to_text(col: Column | str) -> Column:
    """Web-crawl HTML → training text, entirely in Catalyst regexps
    (codegen'd JVM — the hot path of a crawl-cleaning pipeline must
    never drop into Python):

      1. drop <script>/<style> elements INCLUDING their content
         (case-insensitive, dot-matches-newline) — their text is code,
         not language
      2. drop HTML comments <!-- ... -->
      3. block-level close tags → newline (paragraph structure
         survives tag removal)
      4. strip every remaining tag
      5. unescape the common entities (ordered, '&amp;' last)
      6. collapse runs of blank lines / spaces, trim

    The regexes are conservative POSIX-ish patterns that behave
    identically under Java regex and RE2-style engines — no
    backreferences, no lookaround — so the op stays oracle-checkable.
    Malformed HTML degrades gracefully: an unclosed <script> swallows
    to end-of-string (same as browsers' CDATA handling); stray '<'
    without a matching '>' survives as text."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(
        c,
        r"(?is)<script[^>]*>.*?(</script\s*>|$)|<style[^>]*>.*?(</style\s*>|$)",
        " ",
    )
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(
        out, r"(?i)</(p|div|br|h[1-6]|li|tr|table|blockquote)\s*>|<br\s*/?>", "\n"
    )
    # a tag starts with a letter, '/', or '!' — a stray '<' followed
    # by space/digit is TEXT (browser tokenizer rule) and survives
    out = F.regexp_replace(out, r"(?s)<[a-zA-Z/!][^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, r"[ \t\x0b\r\f]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n{2,}", "\n")
    # regexp trim, not F.trim: SQL trim strips ASCII spaces only —
    # a trailing newline from the last block close would survive it
    return F.regexp_replace(out, r"^\s+|\s+$", "")


# ---------------------------------------------------------------------------
# PII redaction (pretraining-corpus scrubbing)
# ---------------------------------------------------------------------------

# (pattern, replacement) in application order. URL before EMAIL so
# 'http://u@host' redacts as one URL, EMAIL before PHONE so digits
# inside an address never half-match. Patterns are RE2-compatible
# (no lookaround/backreferences) and deliberately avoid \b: Java's
# \b is Unicode-aware (a word boundary does NOT exist between 'z'
# and 'Ü') while RE2's is ASCII-only (it does) — found by the
# cross-engine fuzz test; unanchored patterns match identically in
# both engines and are simply more aggressive, which is the right
# direction for a high-recall scrub.
PII_PATTERNS = [
    (r"https?://[^\s<>\"]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"(\d{1,3}\.){3}\d{1,3}", "<IP>"),
    (r"\+?\d[\d ()-]{7,}\d", "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Scrub emails / URLs / IPv4s / phone-shaped digit runs to typed
    placeholder tokens — the corpus-release hygiene pass. Codegen'd
    JVM regexps (no Python); deliberately HIGH-RECALL (a phone
    pattern that also eats a serial number is the right trade for
    training data; precision-critical redaction belongs in a
    reviewed pipeline, not a regex). Order matters and is fixed by
    PII_PATTERNS: URL ⊃ EMAIL ⊃ PHONE overlaps resolve to the
    outermost entity."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-row counts of each PII entity (pre-redaction audit):
    {url, email, ip, phone} → int Column, via the same patterns that
    redact — count == 0 after redact_pii by construction."""
    c = F.col(col) if isinstance(col, str) else col
    names = {"<URL>": "url", "<EMAIL>": "email", "<IP>": "ip", "<PHONE>": "phone"}
    return {
        names[rep]: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for pat, rep in PII_PATTERNS
    }


def dedup_lines(col: Column | str) -> Column:
    """C4-style per-document line deduplication: drop every repeat of
    an exact line, keeping the FIRST occurrence in document order —
    the boilerplate-kill (nav menus, cookie banners, repeated
    headers) applied inside each document before corpus-level dedup.

    Pure array expressions — split, indexed filter on
    array_position(lines, x) == i+1 (first-occurrence test),
    re-join — so the op is a narrow zero-shuffle projection; the
    first-occurrence scan is O(lines²) per document, fine for the
    ≤10³-line documents this targets (a 10⁶-line 'document' is a
    concatenation bug, not a document). Order-preserving where a
    groupBy-min-position rewrite would need two shuffles per doc."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")
    kept = F.filter(
        lines, lambda x, i: F.array_position(lines, x) == i + F.lit(1)
    )
    return F.array_join(kept, "\n")


# 13–19 digits with at most one space/dash between adjacent digits —
# the printed-card shapes (4-4-4-4, 4-6-5, unseparated).  Kept
# RE2-compatible (no backrefs/lookaround) so the DuckDB oracle can
# replay it byte-for-byte.
CARD_PATTERN = r"\d(?:[ -]?\d){12,18}"


def luhn_checksum(digits: Column | str) -> Column:
    """Luhn mod-10 checksum of a digits-only string (int Column):
    from the right, double every second digit, subtract 9 from
    two-digit doubles, sum.  Pure array expressions (split/transform/
    aggregate) — codegen'd, no Python.  A full card number is valid
    iff the checksum % 10 == 0."""
    d = F.col(digits) if isinstance(digits, str) else digits
    rev = F.split(F.reverse(d), "")
    terms = F.transform(
        rev,
        lambda ch, i: F.when(i % 2 == F.lit(0), ch.cast("int")).otherwise(
            F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9).otherwise(
                ch.cast("int") * 2
            )
        ),
    )
    return F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)


def luhn_valid(digits: Column | str) -> Column:
    """True iff the digits-only string passes the Luhn check."""
    d = F.col(digits) if isinstance(digits, str) else digits
    return luhn_checksum(d) % 10 == 0


def card_candidates(col: Column | str) -> Column:
    """All CARD_PATTERN hits in the text, in order (array<string>,
    separators preserved)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(CARD_PATTERN), F.lit(0))


def redact_cards(col: Column | str) -> Column:
    """Replace LUHN-VALID 13–19-digit runs with <CARD>; Luhn-invalid
    runs (order ids, serials, timestamps) pass through untouched —
    the checksum gate is what keeps this precise where the
    high-recall phone pattern downstream is not.  regexp_replace
    cannot call a predicate, so the text is rebuilt split-wise:
    split on CARD_PATTERN (limit -1 keeps trailing empties so
    #parts == #hits + 1), then interleave parts with either <CARD>
    or the original hit.  Narrow zero-shuffle projection; the
    rebuild is O(#hits) per row and #hits is small by nature of the
    entity.  Run BEFORE redact_pii so valid cards are not eaten by
    the phone pattern."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, CARD_PATTERN, -1)
    hits = card_candidates(c)
    n = F.size(hits)
    # F.sequence(1, 0) yields DESCENDING [1, 0] — guard the empty case
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    body = F.aggregate(
        idx,
        F.lit(""),
        lambda acc, i: F.concat(
            acc,
            F.when(
                luhn_valid(F.regexp_replace(F.element_at(hits, i), "[ -]", "")),
                F.lit("<CARD>"),
            ).otherwise(F.element_at(hits, i)),
            F.element_at(parts, i + 1),
        ),
    )
    return F.concat(F.element_at(parts, 1), body)


def card_count(col: Column | str) -> Column:
    """Number of Luhn-valid card numbers in the text (int Column) —
    the pre-redaction audit companion to redact_cards."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.filter(
            card_candidates(c),
            lambda h: luhn_valid(F.regexp_replace(h, "[ -]", "")),
        )
    )


def _cp1252_misdecode(ch: str) -> str:
    """How `ch` looks after its UTF-8 bytes are misread as cp1252
    (undefined cp1252 bytes fall back to latin-1, as real-world lossy
    decoders do) - the classic mojibake corruption."""
    out = []
    for b in ch.encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


# UTF-8 punctuation/accents misdecoded as cp1252 ("mojibake"), the most
# common crawl-text corruption (the core ftfy case).  Pairs are DERIVED
# from the intended characters so the table is provably the cp1252
# round-trip, and this file stays ASCII - several corrupted sequences
# carry INVISIBLE C1 controls, e.g. U+009D inside the rdquo mojibake.
# ORDER MATTERS twice: 3-char sequences must apply before the
# control-char strip that would eat their C1 bytes, and the en/em-dash
# fixes must run BEFORE ldquo/rdquo - those fixes emit U+201C/U+201D,
# which are the third char of the dash mojibake patterns, so a later
# dash pass would cascade-corrupt a just-fixed quote.
_FIX_TARGETS = (
    "\u2013\u2014"  # en dash, em dash - first, see above
    "\u2019\u2018"  # right/left single quote
    "\u201c\u201d"  # left/right double quote
    "\u2026"          # ellipsis
    "\u00e9\u00e8\u00ea\u00e1\u00e0\u00e2"  # e/a accents
    "\u00f3\u00f4\u00f6\u00fc\u00fa\u00ed"  # o/u/i accents
    "\u00e7\u00f1\u00e4"                        # c-cedilla, n-tilde, a-uml
    "\u00a0"          # nbsp - mapped to plain space below
)
MOJIBAKE_FIXES = [
    (_cp1252_misdecode(ch), " " if ch == "\u00a0" else ch)
    for ch in _FIX_TARGETS
] + [("\u00a0", " ")]  # bare nbsp -> space, after the 2-char form


def fix_text(col: Column | str) -> Column:
    """Crawl-text repair (ftfy-lite, pure Catalyst expressions):

    1. un-mojibake the cp1252-misdecoded UTF-8 punctuation/accents in
       MOJIBAKE_FIXES (literal `replace` chain - no regex cost),
    2. normalize line endings (CRLF and CR -> LF),
    3. strip control characters except newline and tab (C0, DEL, C1 -
       AFTER step 1, which consumes the U+009D inside the rdquo
       mojibake),
    4. drop trailing spaces/tabs before each newline and at end of
       text (backslash-z, not $ - Java regex $ also matches before a
       FINAL newline, RE2 $ does not; \\z is end-of-input in both),
    5. collapse 3+ consecutive newlines to one blank line.

    Every pattern is RE2-compatible, so a DuckDB replay is
    byte-identical - fix_text output is FULL-oracle-able.  Per-row
    work is O(len); no Python, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    for bad, good in MOJIBAKE_FIXES:
        c = F.replace(c, F.lit(bad), F.lit(good))
    c = F.replace(c, F.lit("\r\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\n"))
    c = F.regexp_replace(
        c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]", ""
    )
    c = F.regexp_replace(c, "[ \\t]+\\n", "\n")
    c = F.regexp_replace(c, "[ \\t]+\\z", "")
    c = F.regexp_replace(c, "\\n{3,}", "\n\n")
    return c
