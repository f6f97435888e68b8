"""Text-analysis functions for LLM-training-data pipelines:
normalization, token counting, quality scoring, language-ID heuristic,
document fingerprinting.

Everything is built from ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen) — no Python UDFs, so these run at full scan speed
over 100 TB of documents.  Each builder has a DuckDB-SQL twin (suffix
``_sql``) generated from the same constants so the oracle states the
identical computation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish word tokenizer: letter runs, digit runs, single punctuation
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
# kept deliberately tiny and explicit so the SQL twin matches exactly
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
PUNCT_CLASS = "[^.!?,;:]"

LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "zh": ("de", "le", "shi"),
}
# deterministic precedence for arg-max ties
LANG_ORDER = ("de", "en", "es", "fr", "zh")


def ws_tokens(col: Column) -> Column:
    """Whitespace tokens; empty/blank text -> empty array (split('')
    would yield [''])."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, "\\s+")
    )


def token_count_ws(col: Column) -> Column:
    return F.size(ws_tokens(col))


def token_count_ws_sql(expr: str) -> str:
    return (
        f"CASE WHEN length(trim({expr})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({expr}), '\\s+')) END"
    )


def token_count_bpe(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), F.lit(0)))


def token_count_bpe_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{TOKEN_REGEX}'))"


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are sentence punctuation."""
    punct = F.length(F.regexp_replace(col, PUNCT_CLASS, ""))
    return F.round(punct / F.greatest(F.length(col), F.lit(1)), 6)


def punct_ratio_sql(expr: str) -> str:
    return (
        f"round(length(regexp_replace({expr}, '{PUNCT_CLASS}', '', 'g'))"
        f" / greatest(length({expr}), 1), 6)"
    )


def stopword_ratio(col: Column) -> Column:
    toks = ws_tokens(col)
    sw = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.round(F.size(sw) / F.greatest(F.size(toks), F.lit(1)), 6)


def stopword_ratio_sql(expr: str) -> str:
    toks = f"CASE WHEN length(trim({expr})) = 0 THEN [] ELSE regexp_split_to_array(trim({expr}), '\\s+') END"
    sw_list = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    return (
        f"round(len(list_filter({toks}, t -> list_contains({sw_list}, t)))"
        f" / greatest(len({toks}), 1), 6)"
    )


def quality_score(col: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: enough tokens, not
    punctuation-heavy, natural stopword density.  The exact formula is
    mirrored in :func:`quality_score_sql` term-for-term (same operation
    order, so identical IEEE doubles)."""
    n_tok = token_count_ws(col).cast("double")
    length_term = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_term = F.lit(1.0) - punct_ratio(col)
    stop_term = F.least(stopword_ratio(col) * F.lit(4.0), F.lit(1.0))
    return F.round(
        length_term * F.lit(0.4) + punct_term * F.lit(0.3) + stop_term * F.lit(0.3), 6
    )


def quality_score_sql(expr: str) -> str:
    n_tok = f"CAST({token_count_ws_sql(expr)} AS DOUBLE)"
    return (
        f"round(least({n_tok} / 50.0, 1.0) * 0.4"
        f" + (1.0 - {punct_ratio_sql(expr)}) * 0.3"
        f" + least({stopword_ratio_sql(expr)} * 4.0, 1.0) * 0.3, 6)"
    )


def _lang_score(col: Column, lang: str) -> Column:
    toks = ws_tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))


def lang_id(col: Column) -> Column:
    """N-gram/stopword-marker language guess: the language whose marker
    words appear most often, ties broken by ``LANG_ORDER``."""
    scores = {lang: _lang_score(col, lang) for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # build CASE ... from last precedence to first so earlier wins
    for lang in reversed(LANG_ORDER):
        out = F.when((scores[lang] == best) & (best > 0), lang).otherwise(out)
    return out


def lang_id_sql(expr: str) -> str:
    toks = f"CASE WHEN length(trim({expr})) = 0 THEN [] ELSE regexp_split_to_array(trim({expr}), '\\s+') END"

    def score(lang: str) -> str:
        lst = "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"
        return f"len(list_filter({toks}, t -> list_contains({lst}, t)))"

    best = "greatest(" + ", ".join(score(lang) for lang in LANG_ORDER) + ")"
    out = "'und'"
    for lang in reversed(LANG_ORDER):
        out = (
            f"CASE WHEN {score(lang)} = {best} AND {best} > 0 "
            f"THEN '{lang}' ELSE {out} END"
        )
    return out


# --------------------------- shared-token-array variants (r15, §4.1)
#
# The enrich battery (lang_id + quality_score + token_count_ws over the
# same column) builds an expression tree with ~40 copies of the
# ``split(trim(text), '\s+')`` subtree (each lang score references the
# token array, and the CASE ladder references every score multiple
# times).  Whole-stage codegen's subexpression elimination recovers
# some of it, but the robust fix is structural: project the token
# array ONCE (Catalyst's CollapseProject keeps a multiply-referenced
# non-cheap alias in its own projection, so the split really runs once
# per row), then compute every signal from the attribute.  These
# variants state the SAME formulas in the SAME operation order as
# their column-input twins above — identical IEEE doubles, verified
# against the DuckDB oracle twins.


def token_count_from(toks: Column) -> Column:
    return F.size(toks)


def stopword_ratio_from(toks: Column) -> Column:
    sw = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.round(F.size(sw) / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score_from(col: Column, toks: Column) -> Column:
    """quality_score computed from a precomputed token array (term-for-
    term the same formula/order as :func:`quality_score`)."""
    n_tok = token_count_from(toks).cast("double")
    length_term = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_term = F.lit(1.0) - punct_ratio(col)
    stop_term = F.least(stopword_ratio_from(toks) * F.lit(4.0), F.lit(1.0))
    return F.round(
        length_term * F.lit(0.4) + punct_term * F.lit(0.3) + stop_term * F.lit(0.3), 6
    )


def lang_scores_from(toks: Column) -> dict:
    """Per-language marker counts from a precomputed token array; feed
    the aliased results to :func:`lang_id_from_scores` so each score
    computes once."""
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))
        for lang in LANG_ORDER
    }


def lang_id_from_scores(scores: dict) -> Column:
    """The lang_id arg-max CASE ladder over ALREADY-PROJECTED score
    columns (same precedence/tie-break as :func:`lang_id`)."""
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    out = F.lit("und")
    for lang in reversed(LANG_ORDER):
        out = F.when((scores[lang] == best) & (best > 0), lang).otherwise(out)
    return out


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace."""
    lowered = F.lower(col)
    stripped = F.regexp_replace(lowered, "[^a-z0-9\\s]", "")
    return F.trim(F.regexp_replace(stripped, "\\s+", " "))


def normalize_text_sql(expr: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({expr}), '[^a-z0-9\\s]', '', 'g'),"
        f" '\\s+', ' ', 'g'))"
    )


def fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of the normalized text.  Used for exact
    dedup; see functions.minhash for near-dup."""
    return F.md5(normalize_text(col))


def fingerprint_sql(expr: str) -> str:
    return f"md5({normalize_text_sql(expr)})"


# ------------------------------------------------- repetition signals
# Gopher/C4-style repetition quality filters: heavily repetitive text
# (boilerplate, keyword stuffing, generation loops) is down-weighted or
# dropped before training.  All row-local array math — no shuffle.


def repeated_token_frac(col: Column) -> Column:
    """Fraction of tokens that repeat an earlier token:
    ``1 - distinct/total`` (0.0 for empty text)."""
    toks = ws_tokens(col)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(1 - F.size(F.array_distinct(toks)) / n.cast("double"), 6)
    )


def repeated_token_frac_sql(expr: str) -> str:
    toks = (
        f"CASE WHEN length(trim({expr})) = 0 THEN [] "
        f"ELSE regexp_split_to_array(trim({expr}), '\\s+') END"
    )
    return (
        f"CASE WHEN len({toks}) = 0 THEN 0.0 ELSE "
        f"round(1 - len(list_distinct({toks})) / CAST(len({toks}) AS DOUBLE), 6) END"
    )


def top_token_frac(col: Column) -> Column:
    """Coverage of the single most frequent token: mode count / total
    (0.0 for empty text).  Computed as the longest equal-run over the
    SORTED token array with one ``aggregate`` pass — O(n log n) per row,
    no per-distinct-token rescans."""
    st = F.array_sort(ws_tokens(col))
    n = F.size(st)
    best = F.aggregate(
        st,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).cast("int").alias("run"),
            F.lit(0).cast("int").alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(best / n.cast("double"), 6)
    )


def top_token_frac_sql(expr: str) -> str:
    # O(n * distinct) rescan is fine for the oracle (correctness only);
    # values match the Spark run-length computation exactly
    toks = (
        f"CASE WHEN length(trim({expr})) = 0 THEN [] "
        f"ELSE regexp_split_to_array(trim({expr}), '\\s+') END"
    )
    mode_count = (
        f"list_max(list_transform(list_distinct({toks}), "
        f"d -> len(list_filter({toks}, t -> t = d))))"
    )
    return (
        f"CASE WHEN len({toks}) = 0 THEN 0.0 ELSE "
        f"round({mode_count} / CAST(len({toks}) AS DOUBLE), 6) END"
    )


def repeated_bigram_frac(col: Column) -> Column:
    """Fraction of adjacent-token bigrams that repeat an earlier bigram
    (0.0 when fewer than 2 tokens).  Bigrams are built from two shifted
    row-level slices (see functions.minhash.hashed_shingles for why not
    ``get`` inside a lambda)."""
    toks = ws_tokens(col)
    n = F.size(toks)
    z = F.arrays_zip(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("t0"),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("t1"),
    )
    bigrams = F.transform(z, lambda s: F.concat(s["t0"], F.lit(" "), s["t1"]))
    nb = F.size(bigrams)
    return F.when(nb <= 0, F.lit(0.0)).otherwise(
        F.round(1 - F.size(F.array_distinct(bigrams)) / nb.cast("double"), 6)
    )


def repeated_bigram_frac_sql(expr: str) -> str:
    toks = (
        f"CASE WHEN length(trim({expr})) = 0 THEN [] "
        f"ELSE regexp_split_to_array(trim({expr}), '\\s+') END"
    )
    bigrams = (
        f"list_transform(range(0, greatest(len({toks}) - 1, 0)), "
        f"i -> ({toks})[i+1] || ' ' || ({toks})[i+2])"
    )
    return (
        f"CASE WHEN len({bigrams}) = 0 THEN 0.0 ELSE "
        f"round(1 - len(list_distinct({bigrams})) / CAST(len({bigrams}) AS DOUBLE), 6) END"
    )
