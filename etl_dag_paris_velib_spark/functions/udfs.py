"""Arrow-vectorized (pandas) UDFs for the hashing hot paths.

Spark's higher-order array functions (``transform``/``aggregate``) are
evaluated by the *interpreted* expression evaluator — they sit outside
whole-stage codegen. For MinHash (k lanes x |shingles| lambda evals per
row) and SimHash (60 bits x |tokens|) that interpretation dominates the
runtime, so these two operators are the legitimate exception to the
"built-ins first" rule: one Arrow batch transfer, one Python md5 per
shingle, and numpy does the lane mixing / bit counting vectorized.

The JVM formulations in ``functions.text`` remain the portable reference
semantics — ``tests/test_llm_operators.py`` asserts bit-identical output
between the two paths, and the DuckDB oracles mirror the same md5-based
formulas, so swapping the implementation never changes a query result.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

from .text import MINHASH_P


#: per-worker md5 memo. The hash UDFs' cost is md5 over shingle/token
#: OCCURRENCES, but corpora draw from a bounded vocabulary, so the same
#: string is hashed over and over — across rows, batches, and queries
#: (Python workers are reused). Bounded: vocabularies that somehow exceed
#: the cap degrade to plain hashing, never OOM.
_MD5_HEX_MEMO: dict[str, str] = {}
_MD5_MEMO_CAP = 1_000_000


def _md5_hex(s: str) -> str:
    v = _MD5_HEX_MEMO.get(s)
    if v is None:
        if len(_MD5_HEX_MEMO) >= _MD5_MEMO_CAP:
            _MD5_HEX_MEMO.clear()
        v = hashlib.md5(s.encode("utf-8")).hexdigest()
        _MD5_HEX_MEMO[s] = v
    return v


def _md5_60bit(s: str) -> int:
    """First 15 hex chars of md5 as an int — mirrors the Spark
    ``conv(substring(md5(x), 1, 15), 16, 10)`` / DuckDB
    ``('0x' || substr(md5(x), 1, 15))::UBIGINT`` idiom."""
    return int(_md5_hex(s)[:15], 16)


def make_minhash_sig_udf(k: int = 16):
    """pandas_udf: array<string> shingles -> array<bigint> signature.

    Bit-identical to :func:`functions.text.minhash_signature_int`:
    m = md5_60bit(shingle) mod P, lane j = min((2j+1) m + 40503 j + 11 mod P).
    """
    a = 2 * np.arange(k, dtype=np.int64) + 1          # (k,)
    b = 40503 * np.arange(k, dtype=np.int64) + 11     # (k,)

    # DataType instance, not a DDL string: string return types are parsed
    # through the active SparkContext, which may not exist at import time
    @pandas_udf(ArrayType(LongType()))
    def minhash_sig(shingles: pd.Series) -> pd.Series:
        # batch-level unique-then-gather: hash and permute each DISTINCT
        # shingle once per Arrow batch (plus the cross-batch _md5_hex
        # memo), then each row's signature is a gather + min over the
        # unique-lane matrix. Identical output to the per-row form —
        # min over a multiset ignores duplication.
        out = [None] * len(shingles)
        spans = []
        flat: list = []
        for i, arr in enumerate(shingles):
            if arr is None:
                continue
            if len(arr) == 0:
                out[i] = []
                continue
            spans.append((i, len(flat), len(flat) + len(arr)))
            flat.extend(arr)
        if flat:
            uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
            mu = np.fromiter(
                (_md5_60bit(s) % MINHASH_P for s in uniq), np.int64, len(uniq)
            )
            lanes_u = (a[:, None] * mu[None, :] + b[:, None]) % MINHASH_P  # (k, u)
            for i, s0, s1 in spans:
                out[i] = lanes_u[:, inv[s0:s1]].min(axis=1).tolist()
        return pd.Series(out)

    return minhash_sig


def make_winnow_udf(window: int = 4, hash_chars: int = 16):
    """pandas_udf: positional shingle array -> sorted distinct winnowing
    fingerprints. Bit-identical to
    :func:`functions.text.winnow_fingerprints` up to element order (which
    consumers must not rely on — use size/min/set semantics).

    Why a UDF: the JVM formulation nests ``transform(sequence, i ->
    array_min(slice(hashes, i, w)))`` where ``hashes`` is itself a
    transform — interpreted evaluation re-computes the whole md5 array per
    window position, an O(positions x shingles) md5 blow-up (measured
    ~40x slower at sf0.1). Here each shingle hashes once and the sliding
    window is a plain Python min over a deque-sized slice.
    """
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def winnow(shingles: pd.Series) -> pd.Series:
        # batch-level unique hashing (see minhash_sig) + vectorized
        # sliding-window min: fixed-width lowercase hex compares
        # lexicographically exactly as its uint64 value compares
        # numerically, so the min runs on integers and only the final
        # distinct survivors are formatted back to hex.
        out = [None] * len(shingles)
        spans = []
        flat: list = []
        for i, arr in enumerate(shingles):
            if arr is None:
                continue
            if len(arr) == 0:
                out[i] = []
                continue
            spans.append((i, len(flat), len(flat) + len(arr)))
            flat.extend(arr)
        if flat:
            uniq, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
            hv = np.array(
                [int(_md5_hex(s)[:hash_chars], 16) for s in uniq], dtype=np.uint64
            )
            vals = hv[inv]
            win = np.lib.stride_tricks.sliding_window_view
            for i, s0, s1 in spans:
                v = vals[s0:s1]
                mins = win(v, window).min(axis=1) if len(v) >= window else v.min(
                    keepdims=True
                )
                out[i] = [format(int(x), f"0{hash_chars}x") for x in np.unique(mins)]
        return pd.Series(out)

    return winnow


def make_chunk_udtf(chunk_tokens: int = 50, overlap: int = 10):
    """Python UDTF chunker: (doc_id, text) -> N (doc_id, chunk_idx,
    chunk_text) rows — the table-function formulation of
    ``operators.textstats.chunk_documents`` (which stays JVM-side for the
    arithmetic token-window case; the UDTF is the escape hatch for
    chunkers built-ins can't express: sentence boundaries, semantic
    splits, tokenizer-aware packing). Same contract: chunks of
    ``chunk_tokens`` word tokens, ``overlap`` tokens of context, tail
    always covered."""
    import re

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructField, StructType, StringType

    step = chunk_tokens - overlap

    class ChunkText:
        def eval(self, doc_id, text):
            toks = re.findall(r"[a-z0-9]+", (text or "").lower())
            last_start = max(len(toks) - overlap, 1)
            for idx, s in enumerate(range(1, last_start + 1, step)):
                yield doc_id, idx, " ".join(toks[s - 1 : s - 1 + chunk_tokens])

    return udtf(
        ChunkText,
        returnType=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("chunk_idx", LongType()),
                StructField("chunk_text", StringType()),
            ]
        ),
    )


@pandas_udf(LongType())
def simhash64_udf(tokens: pd.Series) -> pd.Series:
    """pandas_udf: array<string> distinct tokens -> 60-bit SimHash bigint.

    Bit-identical to :func:`functions.text.simhash64` (which see for the
    bit-vote construction and the DuckDB mirror).
    """
    # batch-level unique-then-gather (see minhash_sig): bit-vote matrix is
    # built once per distinct token in the batch; each row sums its slice.
    shifts = np.arange(60, dtype=np.int64)
    out = [None] * len(tokens)
    spans = []
    flat: list = []
    for i, arr in enumerate(tokens):
        if arr is None:
            continue
        uniq = list(dict.fromkeys(arr))  # per-row distinct, order-free sum
        if not uniq:
            out[i] = 0
            continue
        spans.append((i, len(flat), len(flat) + len(uniq)))
        flat.extend(uniq)
    if flat:
        u, inv = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
        hu = np.fromiter((_md5_60bit(t) for t in u), np.int64, len(u))
        bits_u = ((hu[:, None] >> shifts[None, :]) & 1) * 2 - 1  # (u, 60)
        for i, s0, s1 in spans:
            votes = bits_u[inv[s0:s1]].sum(axis=0)  # (60,)
            out[i] = int(((votes > 0).astype(np.int64) << shifts).sum())
    return pd.Series(out)


def make_weighted_mean_udaf():
    """GROUPED_AGG pandas_udf (the UDAF form): length-weighted mean of a
    value column — ``sum(v * w) / sum(w)`` over each group's Arrow
    batches. Completes the Python-surface taxonomy (scalar pandas_udf,
    UDTF, applyInPandas, mapInPandas, applyInPandasWithState, and this
    grouped-agg reduction). Spark feeds whole-group series; the rounding
    to 6 decimals happens OUTSIDE (plans side) so the kernel stays a pure
    reduction."""

    @pandas_udf(DoubleType())
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        tw = float(w.sum())
        return float((v * w).sum() / tw) if tw else float("nan")

    return weighted_mean


def make_group_count_udaf():
    """GROUPED_AGG pandas_udf counting group members. Spark forbids mixing
    grouped-agg pandas UDFs with JVM aggregates in one agg() — a query
    that wants count + a pandas UDAF uses this alongside it."""

    @pandas_udf(LongType())
    def group_count(v: pd.Series) -> int:
        return int(len(v))

    return group_count
