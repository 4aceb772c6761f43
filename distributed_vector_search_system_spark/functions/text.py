"""Text-analysis primitives for LLM-data-pipeline operators.

All expression-tier (JVM codegen, no Python in the loop) and designed to
be reproducible term-for-term in the DuckDB oracle:

- tokenization / word shingles
- language-ID (stopword-profile heuristic)
- quality scoring (length / stopword / digit ratios, linear — no
  transcendental functions so both engines produce identical doubles)
- token counting (whitespace + regex word splitting)
- document fingerprinting (polynomial rolling hash mod 2^31-1)

At 100 TB these are pure map-side projections: no shuffle, fully
pipelined with the parquet scan, pushed-down column pruning applies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[^a-z0-9]+"

#: stopword profiles for the language-ID heuristic (tie-break = list order)
LANG_PROFILES: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "a", "of", "and", "to", "in", "is", "for")),
    ("de", ("der", "die", "das", "und", "ist", "mit", "von", "zu")),
    ("es", ("el", "los", "las", "y", "es", "para", "por", "una")),
    ("fr", ("le", "les", "et", "est", "pour", "dans", "une", "du")),
    ("zh", ("的", "是", "了", "在", "和", "有", "我", "不")),
]

FINGERPRINT_MOD = 2147483647  # 2^31 - 1

#: Whitespace class for ws_tokens, written out EXPLICITLY because the
#: shorthand ``\s`` is not engine-portable: Java's ``\s`` (Spark side)
#: includes vertical tab \x0B while RE2's (DuckDB oracle side) does not,
#: so a document containing \v would tokenize differently across the
#: two engines (ADVICE r04).  Both Java regex and RE2 parse this exact
#: class identically; the oracle SQL interpolates the same constant.
WS_SPLIT_RE = r"[ \t\n\x0B\f\r]+"


def tokens(text) -> Column:
    """Lower-cased word tokens (duplicates kept)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(t), TOKEN_RE), lambda x: x != "")


def ws_tokens(text, *, lowercase: bool = False) -> Column:
    """Case-preserving whitespace tokens (empties dropped) — the
    segmentation used where the ORIGINAL text must be reconstructable
    (chunking) or where case/punctuation carry signal (repetition
    bigrams, with ``lowercase=True``).  Distinct from :func:`tokens`,
    which lowercases and strips punctuation for the analysis ops; the
    DuckDB oracles mirror whichever segmentation each op declares
    (``str_split_regex(text, WS_SPLIT_RE)`` for this one)."""
    t = F.col(text) if isinstance(text, str) else text
    if lowercase:
        t = F.lower(t)
    return F.filter(F.split(t, WS_SPLIT_RE), lambda x: x != "")


def distinct_tokens(text) -> Column:
    return F.array_distinct(tokens(text))


def word_shingles(tokens_col, n: int) -> Column:
    """Distinct word n-grams joined by single spaces.  Documents shorter
    than ``n`` tokens yield an empty array.

    Built by zipping the token array with its own shifted tails (n-1 zip
    passes) instead of a per-position ``slice`` inside ``transform`` —
    higher-order functions evaluate interpreted (outside codegen), so a
    per-element O(n) slice is the difference between one array pass and
    quadratic-ish work on every document.  Values are identical: shingle
    i = tokens[i..i+n-1] joined by spaces, first-occurrence order, then
    array_distinct."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    size = F.size(t)
    acc = t
    for j in range(1, n):
        # tail shifted by j; zip_with pads the short side with null and
        # concat propagates it, marking positions past the last shingle
        shifted = F.slice(t, j + 1, F.greatest(size - j, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(
        size - (n - 1) >= 1,
        F.array_distinct(F.filter(acc, lambda x: x.isNotNull())),
    ).otherwise(F.array().cast("array<string>"))


def token_count(text) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text, stopwords: tuple[str, ...]) -> Column:
    """Fraction of distinct tokens that are in ``stopwords``."""
    d = distinct_tokens(text)
    hits = F.size(F.array_intersect(d, F.array(*[F.lit(s) for s in stopwords])))
    return F.when(F.size(d) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(d).cast("double")
    )


def digit_ratio(text) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(t, "[0-9]", "")
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        (F.length(t) - F.length(stripped)).cast("double") / F.length(t).cast("double")
    )


def detect_language(text) -> Column:
    """Stopword-profile language ID: the profile with the most distinct-token
    hits wins; ties resolve in LANG_PROFILES order; zero hits → 'und'."""
    d = distinct_tokens(text)
    scores = [
        F.size(F.array_intersect(d, F.array(*[F.lit(s) for s in words])))
        for _, words in LANG_PROFILES
    ]
    best = F.greatest(*scores)
    expr = F.lit("und")
    # build the WHEN chain in reverse so earlier profiles win ties
    for (lang, _), score in reversed(list(zip(LANG_PROFILES, scores))):
        expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text) -> Column:
    """Linear quality heuristic in [0, 1]: enough tokens, high stopword
    coverage, low digit noise.  Deliberately transcendental-free so Spark
    and the oracle produce bit-identical doubles."""
    n = token_count(text).cast("double")
    en_stop = LANG_PROFILES[0][1]
    return F.round(
        F.least(n, F.lit(300.0)) / F.lit(300.0) * F.lit(0.2)
        + stopword_ratio(text, en_stop) * F.lit(0.5)
        + (F.lit(1.0) - digit_ratio(text)) * F.lit(0.3),
        6,
    )


#: PII / noise patterns for training-data scrubbing.  Kept to character
#: classes + bounded quantifiers + non-capturing groups that mean the
#: same thing in Java regex (Spark) and RE2 (DuckDB) so an oracle can
#: reproduce the scrub — no lookaround (RE2 has none).
URL_PATTERN = r"https?://[^\s]+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: NANP-ish phone shapes: optional +1 / parenthesized area code,
#: -, ., or space separators (round 11)
PHONE_PATTERN = (
    r"(?:\+1[-. ]?)?(?:\(\d{3}\)[-. ]?|\d{3}[-. ])\d{3}[-. ]\d{4}\b"
)
#: dotted-quad IPv4 (octet range unchecked — scrubbing favors recall)
IPV4_PATTERN = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

#: scrub order matters (URLs may embed the other shapes): url first,
#: then email, then the numeric classes
PII_PATTERNS = (
    ("url", URL_PATTERN),
    ("email", EMAIL_PATTERN),
    ("phone", PHONE_PATTERN),
    ("ipv4", IPV4_PATTERN),
)


def scrub_pii(
    text,
    replacement: str = "[REDACTED]",
    *,
    classes: tuple[str, ...] = ("url", "email", "phone", "ipv4"),
) -> Column:
    """Remove URL / email / phone / IPv4 shapes — the minimum scrub
    every LLM training-data pipeline applies before tokenization
    (``classes`` narrows the chain; round 11 extended the original
    url+email pair with the numeric classes).  Pure regexp_replace
    chain in :data:`PII_PATTERNS` order: map-side, codegen, no
    Python."""
    known = {name for name, _ in PII_PATTERNS}
    unknown = set(classes) - known
    if unknown:
        raise ValueError(f"unknown PII classes: {sorted(unknown)}")
    out = F.col(text) if isinstance(text, str) else text
    for name, pat in PII_PATTERNS:
        if name in classes:
            out = F.regexp_replace(out, pat, replacement)
    return out


def pii_counts(text) -> Column:
    """Struct(n_urls, n_emails) found in the text — the audit metric
    logged alongside the scrub (the original two classes; the round-11
    four-class audit is :func:`pii_class_counts`)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.struct(
        F.regexp_count(t, F.lit(URL_PATTERN)).alias("n_urls"),
        F.regexp_count(F.regexp_replace(t, URL_PATTERN, ""), F.lit(EMAIL_PATTERN)).alias(
            "n_emails"
        ),
    )


def pii_class_counts(text) -> Column:
    """Struct(n_urls, n_emails, n_phones, n_ipv4s) — the four-class
    audit (round 11).  Each class counts on the text with the EARLIER
    classes already removed (the scrub-order convention: an email
    inside a URL is the URL's finding, digits inside a phone are not
    also an IPv4)."""
    t = F.col(text) if isinstance(text, str) else text
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(F.regexp_count(t, F.lit(pat)).alias(f"n_{name}s"))
        t = F.regexp_replace(t, pat, "")
    return F.struct(*counts)


def fingerprint(text) -> Column:
    """Polynomial rolling hash over the character codes, mod 2^31-1 —
    an order-sensitive document fingerprint (same idea as Rabin-Karp)."""
    t = F.col(text) if isinstance(text, str) else text
    codes = F.transform(
        F.sequence(F.lit(1), F.length(t)), lambda i: F.ascii(F.substring(t, i, 1))
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * 31 + x.cast("long"), F.lit(FINGERPRINT_MOD)),
    )
