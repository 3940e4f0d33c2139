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
