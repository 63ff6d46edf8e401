"""Text column functions — tokenization, shingling, fingerprinting.

Everything here is a composition of built-in higher-order / regexp functions
(JVM-side, codegen'd); no Python UDFs. The exact regexes are part of the
contract: the DuckDB oracle SQL in ``plans.relational``/``plans.llm`` replicates them
verbatim, so any change here must change there too.

Cross-engine hash: ``md5`` produces the same hex string in Spark and DuckDB,
and lexicographic min over hex strings is collation-stable in both — that is
the portable MinHash primitive used by the dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Token = maximal run of ascii alnum over lowercased text. Mirrors DuckDB
#: ``regexp_extract_all(lower(text), '[a-z0-9]+')``.
TOKEN_RE = "[a-z0-9]+"

#: A BPE-ish subword splitter: runs of letters, runs of digits, or a single
#: non-space symbol — approximates byte-pair tokenizer pre-splitting.
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def normalized_text(col) -> Column:
    """Lowercase + collapse whitespace; canonical form for exact dedup."""
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


def tokens(col) -> Column:
    """Array of word tokens."""
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0)


def token_count(col, pattern: str = TOKEN_RE) -> Column:
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), 0))


def bpe_token_count(col) -> Column:
    """Token count under the BPE-ish splitter (case-sensitive runs)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), 0))


def word_shingles(tokens_col, n: int = 3) -> Column:
    """Array of n-word shingles (space-joined), the MinHash input unit.

    DuckDB mirror:
    ``list_transform(generate_series(1, greatest(len(t)-n+1, 1)),
    i -> array_to_string(list_slice(t, i, i+n-1), ' '))``.

    The input expression is LET-BOUND via a single-element ``transform``
    before the per-position lambda references it. HOF lambdas evaluate
    interpreted, re-running any expression tree embedded in the body once
    PER ELEMENT — an inline ``tokens(text)`` argument (a regexp over the
    whole document) costs O(positions) regexp evaluations, measured 6x on
    the shingle queries at sf0.1. Binding it as the outer lambda's
    variable evaluates it exactly once per row regardless of what the
    caller passes.
    """
    t = tokens_col if isinstance(tokens_col, Column) else F.col(tokens_col)

    def body(tt):
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tt) - F.lit(n - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(tt, i, n), " "),
        )

    return F.element_at(F.transform(F.array(t), body), 1)


def shingles(col, n: int = 3) -> Column:
    """Text → n-word shingle array in one step."""
    return word_shingles(tokens(col), n)


def minhash_signature(shingles_col, k: int = 16) -> Column:
    """k-wide MinHash signature as an array of hex strings.

    sig[j] = min over shingles of md5(j || ':' || shingle). Uses md5-hex +
    lexicographic min so the DuckDB oracle computes bit-identical values
    (see module docstring). At scale this is one pass over the shingle array
    per row — no shuffle, no UDF.
    """
    s = shingles_col if isinstance(shingles_col, Column) else F.col(shingles_col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.array_min(
            F.transform(s, lambda sh: F.md5(F.concat_ws(":", j.cast("string"), sh)))
        ),
    )


#: Mersenne prime 2^31 - 1: the modulus of the integer MinHash family.
#: Small enough that (2k+1) * m never overflows int64 in either engine.
MINHASH_P = 2_147_483_647


def shingle_hashes60(shingles_col) -> Column:
    """Distinct 60-bit md5 hashes of a shingle array (JVM-side, one md5
    per element — O(m), unlike the O(m·k)/O(m²) lane math that justifies
    the Arrow UDFs). DuckDB mirror:
    ``list_distinct(list_transform(s, x ->
    (('0x' || substr(md5(x), 1, 15))::UBIGINT)::BIGINT))``.

    This is the inverted-index / Jaccard-verify representation: 8-byte
    longs through the shuffles instead of ~20-byte shingle strings, and —
    being a pure JVM expression — it is safe inside a persisted plan,
    where a pandas-UDF column is not (Spark 4.1.2 intermittently fails
    the SECOND in-memory cache build whose plan carries a Python UDF:
    [INTERNAL_ERROR] Cannot evaluate expression inside the cache
    serializer; reproduced in this sandbox on vanilla and tuned sessions
    alike)."""
    col = shingles_col if isinstance(shingles_col, Column) else F.col(shingles_col)
    return F.array_distinct(
        F.transform(
            col,
            lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long"),
        )
    )


def hash60(col) -> Column:
    """60-bit md5-prefix hash of a string column as a non-negative long —
    the scalar form of :func:`shingle_hashes60`'s per-element hash, used
    wherever a spec needs a deterministic cross-engine pseudo-random
    stream (negative sampling, mask selection). DuckDB mirror:
    ``(('0x' || substr(md5(x), 1, 15))::UBIGINT)::BIGINT``. 15 hex
    digits = 60 bits < 2^63, so the long cast never wraps and ``%`` has
    identical semantics in both engines."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_signature_int(shingles_col, k: int = 16) -> Column:
    """k-wide integer MinHash signature — the fast variant.

    One md5 per shingle (vs one per shingle PER LANE in
    :func:`minhash_signature`): the 60-bit md5 prefix is reduced mod
    2^31-1 once, then the k lanes are affine mixes
    ``((2j+1) * m + 40503 j + 11) mod (2^31-1)`` — cheap 64-bit integer
    arithmetic with no overflow in Spark (wrapping) or DuckDB (checked),
    since (2k+1) * (2^31-1) << 2^63. DuckDB mirror:
    ``('0x' || substr(md5(x), 1, 15))::UBIGINT % 2147483647`` then the same
    affine mix. ~16x fewer md5 evaluations than the hex variant.
    """
    s = shingles_col if isinstance(shingles_col, Column) else F.col(shingles_col)
    ms = F.transform(
        s,
        lambda sh: F.conv(F.substring(F.md5(sh), 1, 15), 16, 10).cast("long")
        % F.lit(MINHASH_P),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.array_min(
            F.transform(
                ms,
                lambda m: ((2 * j + 1) * m + j * 40503 + 11) % F.lit(MINHASH_P),
            )
        ),
    )


def simhash64(tokens_col) -> Column:
    """64-bit SimHash over word tokens, as a BIGINT.

    For each bit b: sum over distinct tokens of (+1 if bit b of
    md5-derived 64-bit token hash set else -1); simhash bit b = sign.
    Token hash = first 15 hex chars of md5 (60 bits) — portable to DuckDB
    via ``('0x' || substr(md5(tok),1,15))::UBIGINT``.
    """
    t = tokens_col if isinstance(tokens_col, Column) else F.col(tokens_col)
    distinct = F.array_distinct(t)
    hashes = F.transform(
        distinct, lambda tok: F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
    )
    # F.shiftleft requires a literal int numBits; inside the transform lambda
    # the bit index is a Column, so call the SQL function form instead.
    one = F.lit(1).cast("long")
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda b: F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda acc, h: acc
                + F.when(
                    h.bitwiseAND(F.call_function("shiftleft", one, b)) != 0, 1
                ).otherwise(-1),
            )
            > 0,
            F.call_function("shiftleft", one, b),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x))


def doc_fingerprint(col) -> Column:
    """Deterministic document fingerprint: md5 of normalized text. The
    cheap exact-dup key (winnowing/rolling-hash fingerprints are in
    operators.textstats for the locality-sensitive variant)."""
    return F.md5(normalized_text(col))


#: PII patterns, deliberately lookahead-free so the same regex runs under
#: Java regex (Spark) and RE2 (DuckDB/others). Ordered most- to
#: least-specific — the generic phone pattern (a long digits-and-
#: separators run) would otherwise swallow IPs and SSN-shaped ids, so
#: masking and counting both apply the patterns in declaration order over
#: the progressively-masked text.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("ssn_like", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
)


def pii_counts(col) -> Column:
    """Struct of per-category PII match counts (email, ipv4, ssn_like,
    phone) — the audit signal a redaction pass reports per document. Each
    category counts over the text with earlier (more specific) categories
    already masked, so the counts sum to the number of replacements
    :func:`mask_pii` makes. Pure JVM regexp, zero shuffles."""
    c = col if isinstance(col, Column) else F.col(col)
    fields = []
    for name, pat, repl in PII_PATTERNS:
        fields.append(F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(name))
        c = F.regexp_replace(c, pat, repl)
    return F.struct(*fields)


def mask_pii(col) -> Column:
    """Replace every PII match with its category placeholder, applying the
    :data:`PII_PATTERNS` in declaration order (email before phone before
    ip) so more-specific patterns win. Composition of built-in
    ``regexp_replace`` — JVM-side, codegen'd, linear in text length."""
    c = col if isinstance(col, Column) else F.col(col)
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c
