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


# -- winnowing fingerprint (rolling-hash document signature) -----------------

_FP_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("fingerprint", T.ArrayType(T.LongType()), False),
    ]
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
