"""Text-analysis operators for training-data pipelines — language-ID,
quality scoring, token counting, fingerprinting (SURVEY.md §2.C).

Everything is a pure Catalyst column expression (regexp/array/hash
built-ins) — zero Python UDFs, so a 100 TB document scan stays inside
whole-stage codegen and the filters still push down around these
projections.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram-free heuristic
# language ID. Deliberately small + deterministic; real pipelines swap
# in fastText et al. via mapInPandas (see operators/multimodal.py).
# EXACT token membership, not \b-regex: word-boundary semantics differ
# across regex engines on combining marks — Java's \b treats U+0300-
# class marks as word chars so "que" + COMBINING ACUTE never matches,
# while RE2/Python put a boundary there and match (round-8 unicode
# sweep, 12 docs flipped 'es'/'en' → 'und'). Whole-token equality has
# ONE semantics everywhere — and is the linguistically right one: the
# word "qué" is not the stopword "que".
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "das", "nicht"),
    "en": ("the", "and", "is", "of", "to", "for"),
    "es": ("el", "los", "las", "es", "que", "y"),
    "fr": ("le", "la", "les", "et", "est", "des"),
}
CJK_PATTERN_SPARK = r"[一-鿿]"
PUNCT_PATTERN = r"[.,;:!?'\"()\-]"
STOPWORDS = ("the", "and", "is", "of", "to", "a", "in", "for")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the BPE-ish variant is token_pieces)."""
    return F.split(F.trim(text), r"\s+")


def lower_tokens(text: Column) -> Column:
    """Case-folded whitespace tokenization — THE tokenizer the semantic
    family (winnowing, BPE, diversity, simhash companion) shares; the
    DuckDB mirror is ``regexp_split_to_array(trim(lower(text)), '\\s+')``.
    One definition so a normalization tweak can't silently misalign
    grams between operators (or between an operator and its oracle)."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def token_pieces(text: Column) -> Column:
    """BPE-ish sub-word segmentation: letter-runs, digit-runs, and
    single punctuation marks each become a piece (regex tokenizer)."""
    return F.expr(
        r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"
    )


def normalized(text: Column) -> Column:
    """Canonical form for near-dup detection: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text."""
    return F.md5(normalized(text))


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-scoring feature columns (length / punctuation / digit /
    stopword ratios). All ratios are double divisions of exact counts —
    bit-identical on any engine."""
    n_chars = F.length(text).cast("double")
    toks = tokens(text)
    n_tokens = F.size(toks).cast("double")
    n_punct = F.regexp_count(text, F.lit(PUNCT_PATTERN)).cast("double")
    n_digits = F.regexp_count(text, F.lit("[0-9]")).cast("double")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split(trim(text), '\\\\s+'), t -> lower(t) IN ({stop_list})))"
    ).cast("double")
    # try_divide: under Spark 4's default ANSI mode a plain ratio ABORTS
    # the whole query on the first empty-text row (DIVIDE_BY_ZERO);
    # empty docs get NULL ratios instead and filter out naturally.
    return {
        "n_chars_d": n_chars,
        "n_tokens": n_tokens.cast("long"),
        "punct_ratio": F.try_divide(n_punct, n_chars),
        "digit_ratio": F.try_divide(n_digits, n_chars),
        "stopword_ratio": F.try_divide(n_stop, n_tokens),
        "avg_token_len": F.try_divide(n_chars - (n_tokens - 1), n_tokens),
    }


def quality_score(text: Column) -> Column:
    """Composite quality score in [0, ~1]: rewards stopword presence
    (fluent prose) and sane token lengths, penalizes digit/punct soup."""
    q = quality_columns(text)
    return (
        F.lit(0.4) * F.least(q["stopword_ratio"] * 4.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(q["digit_ratio"] * 5.0, F.lit(1.0)))
        + F.lit(0.3) * (F.lit(1.0) - F.least(q["punct_ratio"] * 5.0, F.lit(1.0)))
    )


def _member_of(words: tuple[str, ...]):
    """Closure factory for the F.filter lambda. MUST be one-arg: PySpark
    inspects the lambda's arity and binds a lambda-variable Column to
    EVERY parameter, so a `w=words` default would be shadowed by an
    array-index Column and `t.isin(*w)` would raise NOT_ITERABLE."""
    return lambda t: t.isin(*words)


def lang_scores(text: Column) -> dict[str, Column]:
    toks = lower_tokens(text)
    scores: dict[str, Column] = {
        lang: F.size(F.filter(toks, _member_of(words))).cast("long")
        for lang, words in LANG_PROFILES.items()
    }
    scores["zh"] = F.regexp_count(text, F.lit(CJK_PATTERN_SPARK)).cast("long")
    return scores


def lang_id(text: Column) -> Column:
    """Argmax over language profiles; ties resolve alphabetically
    (deterministic). Returns 'und' when nothing matches."""
    s = lang_scores(text)
    best = F.greatest(*s.values())
    expr = F.lit("und")
    # reversed alphabetical so the earliest language wins ties.
    for lang in sorted(s, reverse=True):
        expr = F.when((s[lang] > 0) & (s[lang] == best), lang).otherwise(expr)
    return expr
