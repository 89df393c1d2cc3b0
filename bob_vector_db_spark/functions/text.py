"""Text analysis for training-data pipelines (SURVEY.md §2.8 F6, north star).

Everything here is pure ``pyspark.sql.functions`` — tokenization, n-gram
shingling, language-ID, quality scoring, token counting, fingerprinting — so
it runs JVM-side at 100 TB with zero Python in the loop.  Each helper has a
line-for-line DuckDB-SQL twin in ``queries.py`` for the driver's oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import POLY_MOD, poly_hash

# A BPE-ish word/number/punct splitter: runs of letters, runs of digits, or a
# single non-space symbol each count as one token.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic.  Public common stopwords; deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "y", "es", "de"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings filtered (ARRAY<STRING>)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: F.length(t) > 0)


# The WORD tokenizer's delimiter set: ASCII punctuation — the documented
# divergence from Qdrant's full Unicode non-alphanumeric class.  The
# scan-side filter twins must compile to the SHARED SQL dialect, where
# the only global, escape-free character mapping both engines run
# identically is ``translate``; a Unicode class is regexp territory and
# the engines disagree on backslash escapes and global replacement.
# Build (Spark), probe (Python) and the compiled MatchText/MatchPhrase
# scan forms all tokenize with this exact set, so index answers == scan
# answers.
WORD_DELIMS = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
# the same set as a shared-dialect SQL expression: single-quote and
# backslash ride in via chr() (Spark parses backslash escapes inside
# string literals, DuckDB does not — chr() sidesteps the divergence)
_DELIMS_LITERAL = WORD_DELIMS.replace("'", "").replace("\\", "")
WORD_DELIMS_SQL = f"('{_DELIMS_LITERAL}' || chr(39) || chr(92))"


def word_translate_sql(inner: str) -> str:
    """``inner`` with every :data:`WORD_DELIMS` char become a space —
    the word tokenizer's delimiter pass in the shared SQL dialect."""
    return (f"translate({inner}, {WORD_DELIMS_SQL}, "
            f"repeat(' ', {len(WORD_DELIMS)}))")


def tokenize_text_py(text: str, tokenizer: str = "whitespace",
                     lowercase: bool = True) -> list[str]:
    """Driver-side twin of the index build's tokenization, used to
    prepare PROBE tokens exactly the way the build tokenized values
    (``tokenizer`` 'whitespace' | 'word'; 'prefix' tokenizes like
    'whitespace' — the prefixes live on the posting side)."""
    import re  # noqa: PLC0415

    s = str(text)
    if lowercase:
        s = s.lower()
    if tokenizer == "word":
        s = s.translate({ord(c): " " for c in WORD_DELIMS})
    # the exact Java \s class ws_tokens splits on (Python str.split()
    # would also split on Unicode spaces the build does not), plus
    # chr(1) — the phrase collapse marker is a delimiter on every path
    return [t for t in re.split("[ \t\n\x0b\x0c\r\x01]+", s) if t]


def bpe_tokens(text: Column) -> Column:
    """BPE-ish tokenization via regexp_extract_all (ARRAY<STRING>)."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)


def token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def shingles(tokens: Column, n: int = 3) -> Column:
    """Token n-grams as space-joined strings (ARRAY<STRING>).

    transform over sequence(0, size-n) keeps this a single codegen'd
    projection — no explode until the caller needs rows.  Documents shorter
    than ``n`` tokens yield an empty array (guard required: sequence(0, neg)
    would count DOWNWARD and corrupt the slice).
    """
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def stopword_ratio(tokens: Column) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_sw = F.size(F.filter(tokens, lambda t: F.array_contains(sw, F.lower(t))))
    return F.when(F.size(tokens) > 0, n_sw.cast("double") / F.size(tokens)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\w\s]", "")
    return F.when(
        F.length(text) > 0,
        (F.length(text) - F.length(stripped)).cast("double") / F.length(text),
    ).otherwise(F.lit(0.0))


def avg_token_len(tokens: Column) -> Column:
    total = F.aggregate(tokens, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(tokens) > 0, total.cast("double") / F.size(tokens)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: length band + stopword presence
    + not-too-much-punctuation.  Mirrors common LLM-corpus filters (C4-style
    rules); each component is oracle-expressible.
    """
    toks = ws_tokens(text)
    len_ok = F.when((F.size(toks) >= 10) & (F.size(toks) <= 1000), 0.4).otherwise(0.0)
    sw_ok = F.when(stopword_ratio(toks) >= 0.05, 0.3).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 0.3).otherwise(0.0)
    return len_ok + sw_ok + punct_ok


def lang_scores(tokens: Column) -> dict[str, Column]:
    """Marker-token hit count per language (the n-gram heuristic)."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marks = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(tokens, lambda t: F.array_contains(marks, F.lower(t))))
    return out


def fingerprint(text: Column) -> Column:
    """Rolling-hash document fingerprint: poly-hash of the normalized text
    (lowercased, whitespace collapsed) — BIGINT in [0, POLY_MOD).
    """
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return poly_hash(norm, POLY_MOD)


def chunk_tokens(tokens: Column, chunk_size: int = 64,
                 overlap: int = 16) -> Column:
    """ARRAY<STRUCT<chunk_idx INT, chunk STRING>>: overlapping token windows
    — the RAG-ingest chunking step that precedes embedding (each chunk is
    what a vector collection stores as one point).

    Window i covers tokens [i·stride, i·stride + chunk_size); the last
    window starts before ``size(tokens)`` so a short tail still emits.
    Pure sequence/transform/slice expressions — explode the result for one
    row per chunk, JVM-side end to end.
    """
    if overlap >= chunk_size:
        raise ValueError(f"overlap {overlap} must be < chunk_size {chunk_size}")
    stride = chunk_size - overlap
    n = F.size(tokens)
    # number of windows: 1 + ceil(max(0, n - chunk_size) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - chunk_size, F.lit(0)) / F.lit(stride)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(tokens, i * stride + 1, chunk_size)
            ).alias("chunk"),
        ),
    )


def normalize_text(text: Column) -> Column:
    """Training-corpus text normalization, all JVM regex/string expressions:
    control chars stripped, e-mail addresses and absolute URLs masked to
    stable placeholders (the PII-scrub step of a pretraining pipeline),
    whitespace runs collapsed, edges trimmed, lowercased.
    """
    t = F.regexp_replace(text, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", " ")
    t = F.regexp_replace(
        t, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>")
    t = F.regexp_replace(t, r"https?://[^\s]+", "<URL>")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.lower(F.trim(t))
