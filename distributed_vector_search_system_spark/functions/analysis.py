"""Index-time text analysis chain, round 11: stopword removal, length
gating, and S-stemming composed over the repo tokenizer — the
Lucene/ES "analyzer" concept (char filter → tokenizer → token
filters) in its deterministic, SQL-replayable core.

Retrieval here matches exact analysis tokens (``functions.text.tokens``
— lowercase ``[a-z0-9]+`` runs); an analyzer rewrites WHAT the tokens
are, so "tables" can match "table" and stopwords stop costing
postings.  The design is the one real engines use: analysis happens at
INDEX time (and symmetric at query time), so every downstream operator
— BM25, phrase, dedup, facets, the posting stores — is UNCHANGED;
here that composition is ``docs.withColumn(text_col,
analyze_text(...))`` feeding any existing verb (see the
``bm25_stemmed_topk`` registry row).

The stemmer is Harman's S-stemmer (Harman 1991, "How effective is
suffixing?") — three ordered rules covering English plurals:

1. ``…ies → …y``   unless the word ends ``eies``/``aies``;
2. ``…es  → …e``   (drop the final ``s``) unless it ends
   ``aes``/``ees``/``oes``;
3. ``…s   → …``    unless it ends ``us``/``ss``.

Words shorter than 3 characters are left alone.  The S-stemmer is the
standard light-stemming baseline: rule-exact (no dictionary), far
safer than Porter on proper nouns, and — the property this repo
optimizes for — expressible identically in Spark Column algebra and
ANSI-ish SQL, so analyzed retrieval keeps an exact DuckDB oracle.

Everything is map-side expression work (whole-stage codegen, no UDF,
no shuffle): the analyzer adds zero exchanges to any plan it feeds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import tokens

#: a deliberately small English stopword list (the classic Lucene
#: seven plus common fillers) — callers pass their own for real use
STOPWORDS_EN = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
)


def s_stem(term) -> Column:
    """Harman S-stemmer over one term column (module docstring rules).
    Deterministic suffix rewrites — no dictionary, no UDF."""
    t = F.col(term) if isinstance(term, str) else term
    n = F.length(t)
    # suffix-DISPATCH form: the longest matching suffix decides the
    # rule, and an exception means "leave the word alone" — a word
    # ending "eies" must not fall through to the "es" rule (the
    # literal else-if cascade would stem it to "eie", making rule 1's
    # exceptions pointless)
    return (
        F.when(n < 3, t)
        .when(t.endswith("eies") | t.endswith("aies"), t)
        .when(
            t.endswith("ies"),
            F.concat(t.substr(F.lit(1), n - 3), F.lit("y")),
        )
        .when(
            t.endswith("aes") | t.endswith("ees") | t.endswith("oes"), t
        )
        .when(t.endswith("es"), t.substr(F.lit(1), n - 1))
        .when(t.endswith("us") | t.endswith("ss"), t)
        .when(t.endswith("s"), t.substr(F.lit(1), n - 1))
        .otherwise(t)
    )


def analyze_tokens(
    text,
    *,
    stopwords: tuple[str, ...] = (),
    stem: bool = False,
    min_len: int = 1,
) -> Column:
    """The analysis chain as a token-array column: tokenize →
    stopword-filter → length-gate → stem.  Stopwords are matched
    BEFORE stemming (the Lucene convention: stop lists are written in
    surface forms), the length gate drops sub-``min_len`` tokens the
    way ES's ``length`` token filter does."""
    toks = tokens(text)
    if stopwords:
        sw = F.array(*[F.lit(s) for s in stopwords])
        toks = F.filter(toks, lambda t: ~F.array_contains(sw, t))
    if min_len > 1:
        toks = F.filter(toks, lambda t: F.length(t) >= min_len)
    if stem:
        toks = F.transform(toks, s_stem)
    return toks


def analyze_text(
    text,
    *,
    stopwords: tuple[str, ...] = (),
    stem: bool = False,
    min_len: int = 1,
) -> Column:
    """The analyzed text as a plain string column (tokens re-joined on
    single spaces).  Analysis tokens are ``[a-z0-9]+`` runs, so
    re-tokenizing the joined string reproduces the token array exactly
    — which is what lets EVERY existing text operator consume analyzed
    text unchanged: ``docs.withColumn(text_col, analyze_text(...))``
    is the whole index-time integration."""
    return F.array_join(
        analyze_tokens(
            text, stopwords=stopwords, stem=stem, min_len=min_len
        ),
        " ",
    )
