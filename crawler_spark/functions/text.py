"""Text-analysis functions for training-data pipelines: language-ID,
quality scoring, token counting, fingerprinting — all pure
`pyspark.sql.functions` column algebra (codegen, no UDFs), each with an
ANSI-SQL oracle twin in crawler_spark/queries.py."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tiny per-language marker lists (n-gram heuristic; deterministic)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "los", "y", "las"),
}


def n_words_col(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def marker_hits_col(text: Column, markers: tuple[str, ...]) -> Column:
    """Occurrences of whole-word markers: size(split(x, '\\bword\\b')) - 1,
    summed — pure string algebra, identical semantics in DuckDB."""
    padded = F.concat(F.lit(" "), F.trim(text), F.lit(" "))
    out = F.lit(0)
    for m in markers:
        out = out + F.size(F.split(padded, rf"\s{m}\s")) - 1
    return out


def lang_id_col(text: Column, threshold: float = 0.02) -> Column:
    """Heuristic language-ID: the language whose marker density is highest,
    'und' (undetermined) when the best density is below threshold.

    The per-language densities are packed into ONE array and let-bound via a
    single-element transform() lambda before the argmax when-chain: inlining
    them repeats each density expression ~20x in the nested CASE (Catalyst
    does no CSE inside it) — the bound form evaluates each density once."""
    n = n_words_col(text)
    dens = F.array(*[marker_hits_col(text, m).cast("double") / n
                     for m in LANG_MARKERS.values()])

    def pick(a: Column) -> Column:
        best_lang = F.lit("und")
        best_score = F.lit(float(threshold))
        for i, lang in enumerate(LANG_MARKERS.keys()):
            score = F.element_at(a, i + 1)
            better = score > best_score
            best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(better, score).otherwise(best_score)
        return best_lang

    return F.element_at(F.transform(F.array(dens), pick), 1)


def token_count_col(text: Column) -> Column:
    """BPE-ish token estimate: sum over words of ceil(len(word)/4)."""
    w = F.split(F.trim(text), r"\s+")
    return F.aggregate(
        w, F.lit(0).cast("long"),
        lambda acc, x: acc + F.ceil(F.length(x) / 4.0).cast("long"))


def quality_score_col(text: Column) -> Column:
    """Document quality in [0,1]: length band + mean word length band +
    stopword-presence signal (the crawl-corpus quality gate). Inputs
    (n_chars, n_words, stopword hits) are let-bound once — see lang_id_col
    for why inlining them would re-split the text per comparison."""
    packed = F.array(
        F.length(text).cast("double"),
        n_words_col(text).cast("double"),
        marker_hits_col(text, LANG_MARKERS["en"]).cast("double"))

    def score(a: Column) -> Column:
        n_chars = F.element_at(a, 1)
        n = F.element_at(a, 2)
        hits = F.element_at(a, 3)
        mean_wl = (n_chars - (n - 1)) / n                # chars sans separators
        len_ok = F.when((n >= 20) & (n <= 10000), 1.0).otherwise(0.3)
        wl_ok = F.when((mean_wl >= 2.5) & (mean_wl <= 12.0), 1.0).otherwise(0.4)
        stop_ok = F.when(hits / n > 0.01, 1.0).otherwise(0.5)
        return F.round(0.4 * len_ok + 0.3 * wl_ok + 0.3 * stop_ok, 4)

    return F.element_at(F.transform(F.array(packed), score), 1)


# --- PII scrubbing (tx6) -------------------------------------------------
# Patterns restricted to syntax with identical semantics in Java regex
# (Spark codegen) and RE2 (DuckDB oracle): character classes, bounded +
# unbounded greedy quantifiers — no backrefs, no lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def pii_scrub_col(text: Column) -> Column:
    """Redact emails then phones with typed placeholders — map-side
    regexp_replace chain, pure codegen (the standard pre-training scrub)."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def pii_count_col(text: Column, pattern: str) -> Column:
    """Non-overlapping match count (audit metric for the scrub)."""
    return F.regexp_count(text, F.lit(pattern)).cast("long")


# --- Repetition signals (tx7, Gopher-style) ------------------------------
def repetition_signals_col(text: Column) -> Column:
    """struct(n_words, dup_tok_frac, dup_2gram_frac): per-row array algebra
    (no shuffle). dup fraction = 1 - distinct/total over tokens and over
    non-distinct word bigrams — the Gopher repetition filters. The word
    array and the bigram array are each let-bound once (see lang_id_col)."""
    def over_words(w: Column) -> Column:
        n = F.size(w)
        grams = F.when(
            n >= 2,
            F.transform(F.sequence(F.lit(0), n - 2),
                        lambda j: F.array_join(F.slice(w, j + 1, 2), " "))
        ).otherwise(F.array().cast("array<string>"))

        def over_bi(bi: Column) -> Column:
            return F.struct(
                n.alias("n_words"),
                F.round(F.lit(1.0) - F.size(F.array_distinct(w)) / n, 4)
                 .alias("dup_tok_frac"),
                F.when(F.size(bi) > 0,
                       F.round(F.lit(1.0)
                               - F.size(F.array_distinct(bi)) / F.size(bi), 4))
                 .otherwise(F.lit(0.0)).alias("dup_2gram_frac"))

        return F.element_at(F.transform(F.array(grams), over_bi), 1)

    words = F.split(F.trim(text), r"\s+")
    return F.element_at(F.transform(F.array(words), over_words), 1)
