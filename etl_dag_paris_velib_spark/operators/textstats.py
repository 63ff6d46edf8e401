"""Text-analysis operators over document tables (SURVEY.md §2.10).

Language ID, quality scoring, winnowing fingerprints, and token-window
chunking — the per-document passes a training-data pipeline runs before
dedup/filtering. Everything is JVM-side (regexp + higher-order array
functions inside whole-stage codegen); there is deliberately no Python in
these hot paths. Each operator has a DuckDB-mirrorable formulation so the
registered queries in ``plans.llm`` get full differential checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import bpe_token_count, tokens, word_shingles

#: Marker (stopword) lists per language for the n-gram/stopword language-ID
#: heuristic. Tiny on purpose: the operator contract is the scoring
#: mechanism (portable argmax over marker-hit counts), not lexicon quality —
#: swap in real lexicons without touching the dataflow.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "en": ("the", "a", "and", "of", "is", "to"),
    "es": ("el", "los", "las", "es", "una", "y"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "zh": ("de0", "shi4", "le0", "zai4", "he2", "you3"),
}

#: Priority order for argmax ties (first match wins). Fixed and mirrored in
#: the oracle SQL.
LANG_PRIORITY: tuple[str, ...] = ("de", "en", "es", "fr", "zh")


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    """Number of distinct marker tokens present in the token set."""
    return F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(m) for m in markers])
        )
    )


def language_scores(text_col) -> dict[str, Column]:
    toks = tokens(text_col)
    return {lang: _marker_hits(toks, LANG_MARKERS[lang]) for lang in LANG_PRIORITY}


def predicted_language(text_col) -> Column:
    """Argmax language with fixed-priority tie-break; 'und' when no marker
    of any language is present (undetermined, BCP-47 style)."""
    scores = language_scores(text_col)
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_PRIORITY:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the quality-signal columns used for corpus filtering:

    - n_tokens, n_bpe_tokens: size under word / BPE-ish tokenizers;
    - type_token_ratio: lexical diversity (distinct/total tokens);
    - alnum_ratio: alphanumeric chars / total chars (markup & mojibake
      detector);
    - stopword_ratio: English-marker occurrences / tokens (natural-prose
      detector);
    - quality_score: fixed-weight blend in [0, 1] — the corpus-filter
      knob; weights are part of the declared contract and mirrored in the
      oracle.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_toks = F.size(toks)
    stop = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    ttr = F.size(F.array_distinct(toks)) / n_toks
    alnum = F.length(F.regexp_replace(c, "[^a-zA-Z0-9]", "")) / F.length(c)
    stop_ratio = n_stop / n_toks
    length_score = F.least(n_toks / F.lit(100.0), F.lit(1.0))
    score = (
        0.3 * length_score + 0.3 * ttr + 0.2 * stop_ratio + 0.2 * alnum
    )
    return df.select(
        "*",
        n_toks.alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(alnum, 6).alias("alnum_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def winnow_fingerprints(
    text_col,
    shingle_n: int = 3,
    window: int = 4,
    hash_chars: int = 16,
) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 scheme
    re-expressed over word shingles): hash every positional n-gram, slide a
    window of ``window`` hashes, keep each window's minimum, distinct the
    result. Guarantees any shared run of ``shingle_n + window - 1`` tokens
    between two documents shares a fingerprint. Hashes are md5-hex prefixes
    with lexicographic min — the portable cross-engine idiom.

    CAUTION: reference formulation — the hash array is inlined into the
    window lambda, so interpreted evaluation recomputes it per window
    position (O(positions x shingles) md5 calls). The hot path is
    ``functions.udfs.make_winnow_udf`` (one hash per shingle, parity-
    tested); use this form for cross-checking only."""
    sh = word_shingles(tokens(text_col), shingle_n)  # positional, not distinct
    hashes = F.transform(sh, lambda s: F.substring(F.md5(s), 1, hash_chars))
    m = F.size(hashes)
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(m - F.lit(window - 1), F.lit(1))),
        lambda i: F.array_min(F.slice(hashes, i, window)),
    )
    return F.array_distinct(wins)


def chunk_documents_expr(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Pure-expression chunker — the REFERENCE formulation (chunk starts
    as an arithmetic ``sequence``, chunks as ``slice`` + ``array_join``,
    ``posexplode`` fan-out).

    CAUTION: the token array is inlined into each chunk's lambda and the
    interpreted HOF evaluator re-tokenizes per chunk — O(chunks x tokens)
    per document. Harmless on short docs; quadratic on long ones. The
    default :func:`chunk_documents` is the linear Arrow path; this stays
    as the cross-checked semantics reference (tests assert parity).
    """
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    m = F.size(toks)
    starts = F.sequence(
        F.lit(1), F.greatest(m - F.lit(overlap), F.lit(1)), F.lit(step)
    )
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(toks, s, chunk_tokens), " ")
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).select(
        id_col,
        "chunk_idx",
        F.size(F.regexp_extract_all(F.lower("chunk_text"), F.lit("[a-z0-9]+"), 0)).alias(
            "n_chunk_tokens"
        ),
        F.md5("chunk_text").alias("chunk_hash"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """1 row -> N chunks of ``chunk_tokens`` word tokens with ``overlap``
    tokens of context between consecutive chunks (the LLM-ingest chunker).

    Arrow ``mapInPandas`` implementation: tokenize ONCE per document, fan
    chunks out inside the batch — linear in document length where the
    expression formulation (:func:`chunk_documents_expr`, kept as the
    parity-tested reference) re-tokenizes per chunk. Output:
    (id, chunk_idx, n_chunk_tokens, chunk_hash).
    """
    import hashlib
    import re
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    step = chunk_tokens - overlap
    token_re = re.compile("[a-z0-9]+")
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("chunk_idx", LongType()),
            StructField("n_chunk_tokens", LongType()),
            StructField("chunk_hash", StringType()),
        ]
    )

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, counts, hashes = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = token_re.findall((text or "").lower())
                last_start = max(len(toks) - overlap, 1)
                for idx, s in enumerate(range(1, last_start + 1, step)):
                    chunk = toks[s - 1 : s - 1 + chunk_tokens]
                    ids.append(doc_id)
                    idxs.append(idx)
                    counts.append(len(chunk))
                    hashes.append(
                        hashlib.md5(" ".join(chunk).encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "chunk_idx": idxs,
                    "n_chunk_tokens": counts,
                    "chunk_hash": hashes,
                }
            )

    return df.select(id_col, text_col).mapInPandas(chunk_batches, schema)


def repetition_signals_expr(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition signals as a pure JVM expression — the
    parity reference for :func:`repetition_signals` (same contract as
    winnow_fingerprints vs its Arrow twin).

    The signals are per-row pure functions, so nothing shuffles: the
    most-frequent-gram count is the longest equal-run in the SORTED gram
    array (one linear ``aggregate`` pass), and the distinct-trigram count
    is ``array_distinct``. All whole-stage-codegen; zero Exchanges.
    """

    def max_run(arr: Column) -> Column:
        srt = F.array_sort(arr)
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        )

        def step(acc, x):
            run = F.when(x.eqNullSafe(acc.prev), acc.run + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc.best, run).alias("best"),
            )

        return F.aggregate(srt, init, step, lambda a: a.best)

    base = df.select("doc_id", tokens(F.col(text_col)).alias("t"))
    bi = word_shingles(F.col("t"), 2)
    tri = word_shingles(F.col("t"), 3)
    n = F.size("t")
    return base.select(
        "doc_id",
        F.when(n > 0, n.cast("long")).alias("n_tokens"),
        F.round(max_run(F.col("t")) / n, 6).alias("top_unigram_frac"),
        F.round(max_run(bi) / F.size(bi), 6).alias("top_bigram_frac"),
        F.round(1.0 - F.size(F.array_distinct(tri)) / F.size(tri), 6).alias(
            "dup_trigram_frac"
        ),
    )


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition signals (Gopher-style): most-frequent
    unigram/bigram fraction and duplicate-trigram fraction.

    Arrow ``mapInPandas`` kernel — tokenize once, three ``Counter``
    passes per document, emit five scalars. Zero shuffles and one scan:
    the signals are row-local, so the exploded-gram groupBy form (which
    shuffles O(total grams) strings twice) is strictly worse at scale;
    measured 3.6x faster than it and 2.3x faster than the JVM
    higher-order-function twin (:func:`repetition_signals_expr`, kept as
    the codegen parity reference) at sf0.1.
    """
    import re
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    rx = re.compile(r"[a-z0-9]+")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_tokens", LongType()),
            StructField("top_unigram_frac", DoubleType()),
            StructField("top_bigram_frac", DoubleType()),
            StructField("dup_trigram_frac", DoubleType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for pdf in it:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                tk = rx.findall(text.lower())
                n = len(tk)
                # shingle edge semantics mirror functions/text.py
                # word_shingles (greatest(n - k + 1, 1) windows, so short
                # docs yield one truncated/empty gram) — required for
                # parity with the expr form and the DuckDB oracle
                bi = [" ".join(tk[i : i + 2]) for i in range(max(n - 1, 1))]
                tri = [" ".join(tk[i : i + 3]) for i in range(max(n - 2, 1))]
                cu = Counter(tk)
                cb = Counter(bi)
                rows.append(
                    (
                        did,
                        n if n else None,
                        round(max(cu.values()) / n, 6) if n else None,
                        round(max(cb.values()) / len(bi), 6),
                        round(1.0 - len(set(tri)) / len(tri), 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_tokens",
                    "top_unigram_frac",
                    "top_bigram_frac",
                    "dup_trigram_frac",
                ],
            )

    return df.select("doc_id", text_col).mapInPandas(batches, schema)
