"""Text-analysis column functions for training-data pipelines: token
counting, quality scoring, language-ID heuristic, document fingerprinting.

All per-doc metrics are pure JVM expressions (whole-stage codegen, oracle
-expressible in ANSI SQL); only the winnowing fingerprint — which needs
rolling-window minima over gram hashes — drops to a vectorized Arrow UDF.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import normalize_series

from ..operators.dedup import norm_col, tokens_col

# small built-in stopword marker sets (deterministic, versioned with the
# tokenizer) — used by both quality scoring and the language-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "para"],
}


def token_count_col(c: str):
    return F.when(F.length(norm_col(c)) == 0, F.lit(0)).otherwise(
        F.size(tokens_col(c))
    )


def char_count_col(c: str):
    return F.length(norm_col(c))


# GPT-2-style pretokenizer (simplified to the Java-regex/RE2-common
# subset: no lookahead, no \p classes): contraction suffixes, space-
# prefixed letter/digit runs, punctuation runs. Applied to the
# normalized (lowercased, single-spaced) text, so [a-z] covers letters.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ']+|'"


def bpe_token_count_col(c: str):
    """Pretokenizer token count — the LLM-pipeline 'how many tokens is
    this document' estimate (BPE merges only split within pretokens, so
    this lower-bounds and tracks real BPE counts). Pure JVM regexp_count."""
    return F.regexp_count(norm_col(c), F.lit(BPE_PRETOKEN_RE))


def stopword_ratio_col(c: str, lang: str = "en"):
    toks = tokens_col(c)
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / F.size(toks)
    )


def quality_score_col(c: str):
    """Composite [0,1] quality heuristic: length band + stopword presence
    + alpha ratio. Deterministic arithmetic only (SQL-oracle-able)."""
    ntok = token_count_col(c).cast("double")
    len_score = F.least(ntok / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio_col(c) * F.lit(5.0), F.lit(1.0))
    norm = norm_col(c)
    n_alpha = F.length(F.regexp_replace(norm, "[^a-z ]", ""))
    alpha_ratio = F.when(F.length(norm) == 0, F.lit(0.0)).otherwise(
        n_alpha.cast("double") / F.length(norm)
    )
    return F.round(
        len_score * F.lit(0.4) + stop_score * F.lit(0.3) + alpha_ratio * F.lit(0.3), 6
    )


def langid_col(c: str):
    """n-gram/stopword-heuristic language ID over {en,de,fr,es}: the
    language whose marker-stopword hit count is highest (ties broken by
    language code order; 'und' = undetermined when nothing hits)."""
    toks = tokens_col(c)
    counts = {}
    for lang, words in sorted(STOPWORDS.items()):
        stops = F.array(*[F.lit(w) for w in words])
        counts[lang] = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        expr = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc analysis frame: (id, n_tokens, n_chars, stopword_ratio,
    quality, lang_pred)."""
    return df.select(
        F.col(id_col),
        token_count_col(text_col).alias("n_tokens"),
        char_count_col(text_col).alias("n_chars"),
        F.round(stopword_ratio_col(text_col), 6).alias("stopword_ratio"),
        quality_score_col(text_col).alias("quality"),
        langid_col(text_col).alias("lang_pred"),
    )


# -- repetition / quality-filter stats (Gopher-style, Rae et al. 2021) -------
#
# Classic web-text pipeline gates: repetition ratios (duplicate lines,
# dominant word-bigram), symbol-to-word ratio, bullet/ellipsis line
# fractions, word-count and mean-word-length bands. Every column is a
# pure JVM expression (whole-stage codegen, zero shuffle, zero Python),
# so the filter runs at scan speed and pushes the `keep` predicate into
# any downstream plan. All thresholds follow the published Gopher rules.


def _lines_col(c: str):
    """Non-empty trimmed lines of the RAW text (repetition rules operate
    on the original line structure, not the whitespace-collapsed norm)."""
    return F.filter(
        F.transform(F.split(F.col(c), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def _max_run_col(sorted_arr):
    """Length of the longest run of equal adjacent elements in a sorted
    array — i.e. the count of the most frequent element — via a single
    O(n) fold (F.aggregate), no explode/shuffle."""
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition & quality gate frame: (id, n_words,
    mean_word_len, dup_line_frac, top_bigram_frac, symbol_word_ratio,
    frac_bullet_lines, frac_ellipsis_lines, keep).

    `keep` (0/1) applies Gopher-style bands over the ROUNDED stats (both
    engines round to 6 dp first, so the boolean is bit-deterministic):
    50 <= n_words <= 100_000, 3 <= mean_word_len <= 10,
    dup_line_frac <= 0.30, top_bigram_frac <= 0.18,
    symbol_word_ratio <= 0.10, frac_bullet_lines <= 0.90,
    frac_ellipsis_lines <= 0.30."""
    # Base projection: normalize/tokenize/split ONCE per row. These
    # columns are non-cheap and referenced more than once below, so
    # Catalyst's CollapseProject keeps the boundary instead of
    # re-inlining the tokenizer ~20x into every stat expression.
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_text"),
        norm_col(text_col).alias("_norm"),
        _lines_col(text_col).alias("_lines"),
    ).select(
        "id", "_text", "_norm", "_lines",
        F.split(F.col("_norm"), " ").alias("_toks"),
        F.when(F.length("_norm") == 0, F.lit(0))
        .otherwise(F.size(F.split(F.col("_norm"), " ")))
        .alias("_n_words"),
    )
    text, norm, toks = F.col("_text"), F.col("_norm"), F.col("_toks")
    lines, n_words = F.col("_lines"), F.col("_n_words")
    n_lines = F.size(lines)
    n_bigrams = F.greatest(n_words - 1, F.lit(0))
    bigrams = F.when(n_words >= 2, F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )).otherwise(F.array().cast("array<string>"))
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    stats = base.select(
        F.col("id"),
        n_words.alias("n_words"),
        F.when(n_words == 0, F.lit(0.0)).otherwise(F.round(
            (F.length(norm) - (n_words - 1)).cast("double") / n_words, 6
        )).alias("mean_word_len"),
        F.when(n_lines == 0, F.lit(0.0)).otherwise(F.round(
            F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n_lines, 6
        )).alias("dup_line_frac"),
        F.when(n_bigrams == 0, F.lit(0.0)).otherwise(F.round(
            _max_run_col(F.sort_array(bigrams)).cast("double") / n_bigrams, 6
        )).alias("top_bigram_frac"),
        F.when(n_words == 0, F.lit(0.0)).otherwise(F.round(
            (n_hash + n_ellipsis).cast("double") / n_words, 6
        )).alias("symbol_word_ratio"),
        F.when(n_lines == 0, F.lit(0.0)).otherwise(F.round(
            F.size(F.filter(
                lines, lambda l: l.startswith("- ") | l.startswith("* ")
            )).cast("double") / n_lines, 6
        )).alias("frac_bullet_lines"),
        F.when(n_lines == 0, F.lit(0.0)).otherwise(F.round(
            F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("double")
            / n_lines, 6
        )).alias("frac_ellipsis_lines"),
    )
    keep = (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("dup_line_frac") <= 0.30)
        & (F.col("top_bigram_frac") <= 0.18)
        & (F.col("symbol_word_ratio") <= 0.10)
        & (F.col("frac_bullet_lines") <= 0.90)
        & (F.col("frac_ellipsis_lines") <= 0.30)
    )
    return stats.withColumn("keep", keep.cast("int"))


# -- PII scrubbing (training-data redaction gate) ----------------------------
#
# Conservative patterns chosen to behave identically under Java regex
# (Spark) and RE2 (DuckDB oracle): character classes + bounded repeats
# only, no lookaround. Counts are taken BEFORE redaction; replacements
# are applied in list order (replacement tokens contain no digits or
# '@', so later patterns cannot match earlier redactions).
PII_PATTERNS = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d -]{7,}\d", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, clean_text, n_email, n_ipv4, n_phone): redact emails, IPv4
    addresses and phone-like digit runs; pure JVM expressions (one
    regexp_count + regexp_replace per pattern), zero shuffle."""
    clean = F.col(text_col)
    counts = []
    for name, pat, rep in PII_PATTERNS:
        counts.append(F.regexp_count(text_col, F.lit(pat)).alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, rep)
    return df.select(
        F.col(id_col).alias("id"), clean.alias("clean_text"), *counts
    )


# -- URL canonicalization + host-level aggregates ----------------------------


def url_normalize_col(c: str):
    """Canonical URL for URL-level exact dedup: lowercase scheme://host
    (www. stripped, default :80/:443 ports dropped), fragment removed,
    trailing '?' / '/' trimmed. Pure JVM regexp chain; regex-mirrorable
    in the DuckDB oracle (no parse_url there)."""
    scheme_host = F.lower(
        F.regexp_extract(F.col(c), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    )
    scheme_host = F.regexp_replace(scheme_host, r"^([a-z0-9+.-]+://)www\.", r"$1")
    scheme_host = F.regexp_replace(scheme_host, r":(80|443)$", "")
    rest = F.regexp_replace(
        F.regexp_extract(F.col(c), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1),
        r"#.*$", "",
    )
    rest = F.regexp_replace(rest, r"[/?]+$", "")
    return F.concat(scheme_host, rest)


def host_stats(
    df: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-host curation aggregates: (host, n_docs, mean_quality,
    mean_tokens) — the table a pipeline thresholds to drop low-quality
    domains wholesale. One partial-aggregated shuffle on host; all
    per-doc metrics are JVM expressions."""
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/:?#]+)", 1))
    return (
        df.select(
            host.alias("host"),
            quality_score_col(text_col).alias("q"),
            token_count_col(text_col).alias("t"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("q"), 6).alias("mean_quality"),
            F.round(F.avg("t"), 6).alias("mean_tokens"),
        )
    )


# -- winnowing fingerprint (rolling-hash document signature) -----------------

_FP_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("fingerprint", T.ArrayType(T.LongType()), False),
    ]
)


def gram_decode_table(
    df: DataFrame, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """(gram, gram_hash): the char-k-gram -> splitmix64-hash mapping
    actually present in the corpus — the analog of the reference's
    k-mer -> string debug decode (tetrex's hashes2dna; ours are
    non-invertible by design, so we materialize the observed mapping
    instead). Distinct per batch and again globally.

    Vectorized hashing (one hash_char_kgrams_series pass per batch);
    gram STRINGS are sliced only for each batch-unique hash — a loop
    bounded by the gram vocabulary, not the corpus."""
    from ..kernel.hashing import hash_char_kgrams_series

    schema = T.StructType(
        [
            T.StructField("gram", T.StringType(), False),
            T.StructField("gram_hash", T.LongType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            text = normalize_series(pdf[text_col])
            grams, counts = hash_char_kgrams_series(text, k)
            if grams.size == 0:
                continue
            uniq, first = np.unique(grams, return_index=True)
            # map each representative gram position back to (doc, offset)
            ends = np.cumsum(counts)
            doc_of = np.searchsorted(ends, first, side="right")
            starts = ends - counts
            offs = first - starts[doc_of]
            texts = text.to_numpy()
            strs = [texts[d][o : o + k] for d, o in zip(doc_of, offs)]
            yield pd.DataFrame(
                {"gram": strs, "gram_hash": uniq.view(np.int64)}
            )

    return (
        df.select(text_col).mapInPandas(fn, schema).distinct()
    )


def winnow_fingerprints(
    df: DataFrame, k: int = 5, window: int = 4,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken 2003): per doc, the set of
    per-window minima over char k-gram rolling hashes — a compact,
    position-robust signature for plagiarism-style overlap detection.

    Fully vectorized over the Arrow batch: ONE hash_char_kgrams_series
    pass for the whole batch (not one hash call per doc), sliding-window
    minima over the concatenated gram array restricted to in-document
    windows, then a batch-wide lexsort dedupe — no per-document Python."""
    from ..kernel.hashing import concat_ranges, hash_char_kgrams_series

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            text = normalize_series(pdf[text_col])
            grams, counts = hash_char_kgrams_series(text, k)
            n_docs = len(counts)
            ids = pdf[id_col].to_numpy()
            if grams.size == 0:
                yield pd.DataFrame(
                    {"id": ids, "fingerprint": [[] for _ in range(n_docs)]}
                )
                continue
            starts = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            doc_idx = np.arange(n_docs, dtype=np.int64)
            # long docs (> window grams): all in-document sliding minima
            long = counts > window
            parts_doc, parts_val = [], []
            if long.any() and grams.size >= window:
                wins = np.lib.stride_tricks.sliding_window_view(grams, window)
                mins_all = wins.min(axis=1)
                n_wins = counts[long] - window + 1
                parts_val.append(mins_all[concat_ranges(starts[long], n_wins)])
                parts_doc.append(np.repeat(doc_idx[long], n_wins))
            # short docs (1..window grams): single whole-doc minimum; the
            # reduceat boundary list is every nonzero doc's start so each
            # segment is exactly one document
            nz = counts > 0
            if nz.any():
                doc_min = np.minimum.reduceat(grams, starts[nz])
                short_of_nz = counts[nz] <= window
                parts_val.append(doc_min[short_of_nz])
                parts_doc.append(doc_idx[nz][short_of_nz])
            vals = np.concatenate(parts_val).view(np.int64)
            docs_of = np.concatenate(parts_doc)
            # per-doc sorted distinct via one batch-wide lexsort
            order = np.lexsort((vals, docs_of))
            d_s, v_s = docs_of[order], vals[order]
            keep = np.ones(d_s.size, dtype=bool)
            keep[1:] = (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])
            d_u, v_u = d_s[keep], v_s[keep]
            fps = np.split(v_u, np.cumsum(np.bincount(d_u, minlength=n_docs))[:-1])
            yield pd.DataFrame({"id": ids, "fingerprint": fps})

    return df.select(id_col, text_col).mapInPandas(fn, _FP_SCHEMA)
