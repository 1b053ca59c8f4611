"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting. All native Catalyst expressions
(JVM, whole-stage codegen) — no Python in any of these paths.

Crawl-side analogue: the language-identifier / quality plugins
(plugin/language-identifier/, index filters) and TextProfileSignature
(crawl/TextProfileSignature.java); rebuilt here as columnar ops.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

# Java String.split(",| |;|\\.|\\(|\\)|=", -1) — HTMLLanguageParser.java:291
_LANG_SPLIT_RE = re.compile(r"[, ;.()=]")

# tiny stopword profiles for the n-gram/stopword language heuristic
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    # ASCII-only: tokens_col's \w is ASCII (Java/RE2 parity), so a word
    # like 'für' can never appear as a token ('ü' splits it) — a non-ASCII
    # stopword is a silent no-op in BOTH engines and the gate can't see it
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "mit", "den", "auf"],
    "fr": ["le", "la", "les", "et", "des", "est", "pour", "dans", "que", "une"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "por", "con"],
}


def parse_language(lang: str | None) -> str | None:
    """Exact port of HTMLLanguageParser.LanguageParser.parseLanguage
    (plugin/language-identifier HTMLLanguageParser.java:283-305): split the
    declared value on `,| |;|\\.|\\(|\\)|=`, take each token's primary
    subtag (before `-`/`_`), return the first ISO-639-1 code found in the
    public alias table (langmap.py), else None. Used by the parse kernel
    (html `lang` attribute) and the parity tests; the columnar twin is
    parse_declared_language."""
    if lang is None:
        return None
    from nutch_spark.functions.langmap import LANGUAGES_MAP

    for token in _LANG_SPLIT_RE.split(lang):
        code = token.split("-")[0].split("_")[0]
        language = LANGUAGES_MAP.get(code.lower())
        if language is not None:
            return language
    return None


def parse_declared_language(lang: Column) -> Column:
    """Columnar parse_language (HTMLLanguageParser.java:283-305): same
    tokenization and first-alias-hit semantics as the Python port, as a
    whole-stage-codegen expression over a literal map."""
    from nutch_spark.functions.langmap import LANGUAGES_MAP
    from nutch_spark.functions.litfast import lit_str_map

    # one gateway call for the 533-entry literal (litfast.py; was ~2.5 s of
    # py4j round-trips per cold plan build)
    m = lit_str_map(dict(sorted(LANGUAGES_MAP.items())))
    toks = F.split(lang, r"[, ;.()=]", -1)
    hits = F.filter(
        F.transform(
            toks,
            lambda t: F.element_at(
                m, F.lower(F.split(F.split(t, "-", 2)[0], "_", 2)[0])
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return F.when(F.size(hits) > 0, hits[0])


def tokens_col(text: Column) -> Column:
    """Whitespace+punct tokenization, lowercased, empty-free (JVM-side)."""
    toks = F.split(F.lower(F.regexp_replace(text, r"[^\w\s]+", " ")), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: count word pieces + digits + punctuation runs via one
    regexp pass (a deterministic stand-in for a real tokenizer)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]"), F.lit(0))
    )


def detect_language(text: Column, only_certain: bool = False,
                    max_length: int = -1) -> Column:
    """Stopword-vote language heuristic — returns the language whose
    stopwords appear most among tokens ('und' for unknown).

    only_certain mirrors lang.identification.only.certain
    (HTMLLanguageParser.java:314 + LanguageIdentifier.isReasonablyCertain):
    NULL unless the top language strictly beats the runner-up. max_length
    mirrors lang.analyze.max.length (:313): only the first N chars are
    analyzed (-1 = all)."""
    if max_length >= 0:
        text = F.substring(text, 1, max_length)
    from nutch_spark.functions.litfast import lit_str_array

    toks = tokens_col(text)
    scores = []
    for lang, words in _LANG_STOPWORDS.items():
        arr = lit_str_array(words)
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    ranked = F.reverse(F.array_sort(F.array(*scores)))
    best = ranked[0]
    out = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    if only_certain:
        return F.when(best["score"] > ranked[1]["score"], out)
    return out


def quality_score(text: Column) -> Column:
    """[0,1] quality heuristic from length, punctuation ratio, stopword
    presence, mean word length — the usual pretraining-filter features."""
    n_chars = F.length(text)
    toks = tokens_col(text)
    n_toks = F.size(toks)
    n_punct = F.length(F.regexp_replace(text, r"[^!?.,;:]", ""))
    mean_word = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    from nutch_spark.functions.litfast import lit_str_array

    en = lit_str_array(_LANG_STOPWORDS["en"])
    stop_ratio = F.when(
        n_toks > 0, F.size(F.filter(toks, lambda t: F.array_contains(en, t))) / n_toks
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(1.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 12), F.lit(1.0)).otherwise(F.lit(0.3))
    punct_score = F.when(punct_ratio <= 0.2, F.lit(1.0)).otherwise(F.lit(1.0) - punct_ratio)
    stop_score = F.least(stop_ratio * 5.0, F.lit(1.0))
    return F.round(
        0.3 * len_score + 0.2 * word_score + 0.2 * punct_score + 0.3 * stop_score, 4
    )


def _lines_expr(text: Column) -> Column:
    """Non-empty trimmed lines; null text yields an EMPTY array, so every
    downstream signal reads 0 rather than NULL (under Spark 4's ANSI
    defaults a NULL n_lines would make a numeric gate like
    `rep.n_lines == 0` silently evaluate to NULL instead of catching the
    doc the way it catches empty text)."""
    return F.filter(
        F.transform(F.split(F.coalesce(text, F.lit("")), "\n"),
                    lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )


def _rep_lens_expr(ls: Column, n_lines: Column) -> Column:
    """Repeat-length vector over SORTED lines ls: element i (1-based,
    i >= 2) carries len(ls[i]) iff ls[i] == ls[i-1] (a repeat occurrence),
    else 0; fewer than two lines -> empty."""
    return F.when(
        n_lines >= 2,
        F.zip_with(
            F.slice(ls, 1, n_lines - 1),
            F.slice(ls, 2, n_lines - 1),
            lambda a, b: F.when(a == b, F.length(b)).otherwise(F.lit(0)),
        ),
    ).otherwise(F.array().cast("array<int>"))


def _rep_fold_expr(rep_lens: Column) -> Column:
    """ONE aggregate pass over the repeat-length vector ->
    struct(dup_chars, n_dup). The single reference to rep_lens matters:
    these are interpreted (CodegenFallback) HOFs with no CSE, so folding
    both statistics in one pass halves the slice/zip_with work vs one
    aggregate per statistic."""
    zero = F.lit(0).cast("long")
    return F.aggregate(
        rep_lens,
        F.struct(zero.alias("dup_chars"), F.lit(0).alias("n_dup")),
        lambda acc, x: F.struct(
            (acc["dup_chars"] + x).alias("dup_chars"),
            (acc["n_dup"] + F.when(x > 0, 1).otherwise(0)).alias("n_dup"),
        ),
    )


def _bigrams_expr(toks: Column, n_toks: Column) -> Column:
    """Adjacent word 2-grams joined by one space; < 2 tokens -> empty."""
    return F.when(
        n_toks >= 2,
        F.transform(
            F.sequence(F.lit(1), n_toks - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _best_bigram_expr(grams: Column) -> Column:
    """One-pass run-length max over the sorted grams -> struct(c, gram):
    each step extends or restarts the current run and folds (run, gram)
    into the best struct; equal counts resolve to the lexicographically
    larger gram because sorted order reaches it later and struct
    comparison breaks the tie on the second field — deterministic in both
    engines."""
    empty_best = F.struct(F.lit(0).alias("c"), F.lit("").alias("gram"))
    return F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"),
            empty_best.alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.struct(
                    F.when(x == acc["prev"], acc["run"] + 1)
                    .otherwise(F.lit(1)).alias("c"),
                    x.alias("gram"),
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def repetition_signals(text: Column) -> Column:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    appendix A1.1 "repetition" filters — the standard pretraining-quality
    gate a crawl corpus feeds). Returns a struct:

      n_lines             non-empty trimmed lines
      dup_line_frac       fraction of line occurrences repeating an earlier
                          line: (n_lines - n_distinct) / n_lines
      dup_line_char_frac  fraction of line characters on repeat occurrences:
                          sum((c_i - 1) * len_i) / sum(c_i * len_i)
      top_bigram_frac     character fraction covered by the most frequent
                          word 2-gram: c_top * chars(top) / sum(token chars)

    All-array Catalyst expressions — per-row work only, NO shuffle, so at
    100 TB the filter composes with the scan (predicate on the struct
    fields prunes before any exchange). Per-row cost is O(n log n): counts
    come from SORTED arrays (adjacent-equality for dup lines, a one-pass
    run-length aggregate for the top bigram), never from a
    distinct × occurrences rescan — the naive filter-per-distinct form
    measured ~1 ms/row on 3-line docs and would go quadratic on line-heavy
    ones. Ties for the top bigram break to the lexicographically larger
    gram (max over (count, gram) structs), deterministic in both engines;
    numerators/denominators stay integral until one final division so the
    DuckDB oracle's doubles match bit-for-bit."""
    lines = _lines_expr(text)
    n_lines = F.size(lines)
    zero = F.lit(0).cast("long")
    rf = _rep_fold_expr(_rep_lens_expr(F.array_sort(lines), n_lines))
    total_line_chars = F.aggregate(lines, zero, lambda acc, x: acc + F.length(x))
    dup_line_frac = F.when(
        n_lines > 0, F.round(rf["n_dup"] / n_lines, 6)
    ).otherwise(F.lit(0.0))
    dup_line_char_frac = F.when(
        total_line_chars > 0, F.round(rf["dup_chars"] / total_line_chars, 6)
    ).otherwise(F.lit(0.0))

    toks = tokens_col(text)
    best = _best_bigram_expr(_bigrams_expr(toks, F.size(toks)))
    token_chars = F.aggregate(toks, zero, lambda acc, t: acc + F.length(t))
    top_bigram_frac = F.when(
        (best["c"] > 0) & (token_chars > 0),
        # the gram string carries one joining space: chars(top) = len - 1
        F.round(best["c"] * (F.length(best["gram"]) - 1) / token_chars, 6),
    ).otherwise(F.lit(0.0))
    return F.struct(
        n_lines.alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        dup_line_char_frac.alias("dup_line_char_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
    )


def with_repetition_signals(df, text_col: str = "text",
                            out_col: str = "rep"):
    """DataFrame-level repetition_signals — USE THIS ON HOT PATHS. Same
    semantics and output struct as repetition_signals(Column), but the
    intermediate arrays (lines, sorted lines, tokens, sorted bigrams,
    repeat-length vector) and scalar folds are pinned behind Generate
    barriers (normalizers.with_column_once) so each is computed ONCE per
    row. Higher-order functions are CodegenFallback in Spark and the
    interpreted projection does no common-subexpression elimination, so
    the pure-Column form re-evaluates the split/sort/aggregate chains per
    reference — measured 45.7 s vs 5.1 s over the 150k-row bench fixture
    (PLANS §6.25)."""
    from nutch_spark.functions.normalizers import with_column_once

    text = F.col(text_col)
    df = with_column_once(df, "_lines", _lines_expr(text))
    zero = F.lit(0).cast("long")
    n_lines = F.size("_lines")
    df = with_column_once(
        df, "_arrs",
        F.struct(
            F.array_sort("_lines").alias("ls"), tokens_col(text).alias("toks")
        ),
    )
    ls = F.col("_arrs.ls")
    tk = F.col("_arrs.toks")
    # _folds references rep_lens exactly once (the combined dup_chars +
    # n_dup fold) — one aggregate per statistic would re-evaluate the
    # slice/zip_with chain per reference in the interpreted projection
    df = with_column_once(
        df, "_folds",
        F.struct(
            _rep_fold_expr(_rep_lens_expr(ls, n_lines)).alias("rep"),
            F.aggregate(
                F.col("_lines"), zero, lambda acc, x: acc + F.length(x)
            ).alias("total_chars"),
            F.aggregate(tk, zero, lambda acc, t: acc + F.length(t)).alias("tok_chars"),
            _best_bigram_expr(_bigrams_expr(tk, F.size(tk))).alias("best"),
        ),
    )
    f = F.col("_folds")
    out = F.struct(
        n_lines.alias("n_lines"),
        F.when(n_lines > 0, F.round(f["rep"]["n_dup"] / n_lines, 6))
        .otherwise(F.lit(0.0)).alias("dup_line_frac"),
        F.when(f["total_chars"] > 0,
               F.round(f["rep"]["dup_chars"] / f["total_chars"], 6))
        .otherwise(F.lit(0.0)).alias("dup_line_char_frac"),
        F.when(
            (f["best"]["c"] > 0) & (f["tok_chars"] > 0),
            F.round(f["best"]["c"] * (F.length(f["best"]["gram"]) - 1) / f["tok_chars"], 6),
        ).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
    )
    return df.withColumn(out_col, out).drop("_lines", "_arrs", "_folds")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: xxhash64 over whitespace-normalized tokens —
    cheap exact-dup key (the TextProfileSignature role for pipelines).
    (A former `window` parameter promised rolling-hash granularity it
    never implemented; near-dup granularity lives in minhash/simhash.)"""
    norm = F.array_join(tokens_col(text), " ")
    return F.xxhash64(norm)
