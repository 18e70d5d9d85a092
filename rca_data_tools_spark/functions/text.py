"""Text-analysis column functions for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd): tokenization, n-gram
shingling, quality scoring, a stopword-based language-ID heuristic, and
document fingerprinting. Python never touches the hot path, so these run at
full scan speed on 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE_RE = r"\s+"
# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
# (same shape as the GPT-2 pre-tokenizer classes, public knowledge).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "fr": ("le", "la", "et", "les", "des", "un", "une"),
    "es": ("el", "de", "que", "y", "los", "una", "por"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht"),
}


def normalize(text: Column | str) -> Column:
    """Canonical text form used for exact dedup / fingerprinting."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), WHITESPACE_RE, " ")


def tokens(text: Column | str) -> Column:
    """Whitespace tokens as array<string> (empty string -> empty array)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), WHITESPACE_RE), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (regexp_count is a single codegen'd pass)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))


def let_(col: Column, fn) -> Column:
    """Expression-level let binding: evaluate ``col`` ONCE and pass it to
    ``fn`` as a lambda variable. An outer-scope expression captured inside
    a ``transform``/``filter`` lambda re-evaluates PER ELEMENT (no CSE
    across the lambda boundary — measured 147s vs 17.6s for char 5-grams
    over the sf1 corpus, 8.4x); a lambda VARIABLE is a cheap reference.
    The binding is a transform over a single-element array."""
    return F.get(F.transform(F.array(col), fn), 0)


def char_ngrams(text: Column | str, n: int = 5) -> Column:
    """Distinct character n-grams (shingles) of the normalized text.

    Built with sequence+transform so the whole thing stays in the JVM;
    used as the shingle stage of MinHash / Jaccard dedup. The normalized
    string is let-bound (see let_) so the regex normalization runs once
    per row, not once per character position."""
    return let_(
        normalize(text),
        lambda norm: F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(norm) - F.lit(n - 1))),
                lambda i: norm.substr(i, F.lit(n)),
            )
        ),
    )


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text (token array let-bound:
    tokenization runs once per row, not once per n-gram position)."""
    return let_(
        tokens(normalize(text)),
        lambda toks: F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.lit(1), F.size(toks) - F.lit(n - 1)) - F.lit(1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i + F.lit(1), n)),
            )
        ),
    )


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    toks = tokens(normalize(text))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(list(stopwords))))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def mean_token_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length, punctuation, stopword signal.

    The weights are arbitrary but fixed; the point is a deterministic,
    fully-vectorized scoring pass suitable for filtering at scale.
    """
    c = F.col(text) if isinstance(text, str) else text
    len_score = F.least(F.lit(1.0), F.length(c) / F.lit(500.0))
    punct_penalty = F.least(F.lit(1.0), punct_ratio(c) * F.lit(4.0))
    stop_score = F.least(F.lit(1.0), stopword_ratio(c) * F.lit(4.0))
    return F.round(len_score * F.lit(0.4) + (F.lit(1.0) - punct_penalty) * F.lit(0.3) + stop_score * F.lit(0.3), 6)


def _isin_markers(markers: tuple[str, ...]):
    # NB: F.filter inspects the lambda arity — a default arg would be taken
    # as the index parameter — so build the single-arg lambda via closure.
    marker_list = list(markers)
    return lambda t: t.isin(marker_list)


def lang_scores(text: Column | str) -> list[tuple[str, Column]]:
    """Per-language stopword hit counts (the language-ID signal)."""
    toks = tokens(normalize(text))
    return [
        (lang, F.size(F.filter(toks, _isin_markers(markers))))
        for lang, markers in LANG_MARKERS.items()
    ]


def lang_id(text: Column | str, default: str = "und") -> Column:
    """Pick the language with the highest marker count; ties resolve to the
    first language in LANG_MARKERS declaration order, zero hits -> ``default``.
    A simple when-chain, so the rule is trivially mirrored in ANSI SQL."""
    scores = lang_scores(text)
    best = F.greatest(*[s for _, s in scores]) if len(scores) > 1 else scores[0][1]
    expr = F.when(best == 0, F.lit(default))
    for lang, s in scores:
        expr = expr.when(s == best, F.lit(lang))
    return expr.otherwise(F.lit(default))


def md5_fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 hex of the normalized text (portable)."""
    return F.md5(normalize(text))


def rolling_hash(text: Column | str, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over the characters of the normalized text.

    h = Σ h·base + code(c) (mod p) — a classic Rabin-Karp style document
    fingerprint, computed with F.aggregate so it stays JVM-side.
    """
    chars = F.split(normalize(text), "")
    return F.aggregate(
        F.filter(chars, lambda ch: ch != ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )
