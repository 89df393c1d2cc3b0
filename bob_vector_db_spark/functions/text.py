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


# --- TextIndexParams stopwords + stemmer (round 10, VERDICT r9 #2) -------

# The classic Lucene/Snowball English stopword list (public domain) — the
# resolved form of ``stopwords='english'`` on a text index or leaf.
ENGLISH_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

# chr(2) is the STEM marker: each stem rule's replacement ends with it so
# later rules can't re-fire on an already-stemmed token end (the chr(1)
# phrase-collapse lesson applied to stemming).  Like chr(1), it is a
# token DELIMITER on every text path — scan forms, index build, probe —
# so a pre-existing chr(2) in a document can never collide with the
# marker (text indexes carry ``text_format: 2`` to gate this).
S_STEM_MARKER = "\x02"

# Harman's S-stemmer ("How Effective Is Suffixing?", JASIS 1991) as an
# ordered (suffix, replacement) table — FIRST match wins per token; a
# rule whose replacement equals its suffix is one of Harman's protected
# exception classes.  The same table drives all three forms: the
# compiled scan SQL and the index-build expression apply it as a
# ``replace(suffix || ' ', repl || chr(2) || ' ')`` chain over the
# space-delimited text (one token end each — first-match-wins holds
# because every replacement's marker blocks later patterns), and
# :func:`stem_token_py` applies it per probe token.
S_STEM_RULES = (
    ("eies", "eies"), ("aies", "aies"), ("ies", "y"),
    ("aes", "aes"), ("ees", "ees"), ("oes", "oes"), ("es", "e"),
    ("us", "us"), ("ss", "ss"), ("s", ""),
)

STEMMERS = ("english",)


def stem_token_py(tok: str) -> str:
    """Python twin of the S-stemmer replace chain (probe side)."""
    for suf, rep in S_STEM_RULES:
        if tok.endswith(suf):
            return tok[: len(tok) - len(suf)] + rep
    return tok


def resolve_stopwords(stopwords) -> tuple[str, ...]:
    """Canonical sorted de-duplicated tuple; the string ``'english'``
    resolves to :data:`ENGLISH_STOPWORDS`.  Canonical form makes leaf
    params structurally comparable to the persisted index params."""
    if stopwords is None:
        return ()
    if isinstance(stopwords, str):
        if stopwords != "english":
            raise ValueError(
                f"unknown stopword set {stopwords!r}; pass 'english' or "
                f"an explicit word list")
        stopwords = ENGLISH_STOPWORDS
    return tuple(sorted(set(str(w) for w in stopwords)))


def check_stopwords(words: tuple, tokenizer: str, lowercase: bool) -> None:
    """A stopword that is not a single token of ITSELF under the
    tokenizer params can never match any token — silently dead config,
    so refuse it loudly (e.g. an uppercase word on a lowercasing index,
    or a word containing a delimiter)."""
    for w in words:
        if tokenize_text_py(w, tokenizer, lowercase) != [w]:
            raise ValueError(
                f"stopword {w!r} is not a single token of itself under "
                f"tokenizer={tokenizer!r}/lowercase={lowercase} — it "
                f"could never match; lowercase it / remove delimiters")


def token_pipeline(wrapped, stopwords, stemmer, *, lit, replace, concat):
    """Stopword removal + stemming over a SPACE-WRAPPED delimiter-
    normalized text value, expressed through dialect primitives so the
    ONE chain drives both the compiled scan SQL (``lit``/``replace``/
    ``concat`` build strings) and the Spark index-build expression
    (``F.lit``/``F.replace``/``F.concat``):

    - stopwords: double every space first (global replace is
      non-overlapping, so adjacent stopwords must not share a boundary
      space), then drop each ``' word '`` whole-token occurrence;
    - stemmer: the :data:`S_STEM_RULES` chain at token ends
      (``suffix + ' '``), each replacement tagged with the chr(2)
      marker so later rules can't re-fire, marker dropped at the end.

    Space RUNS are left as-is — whole-token ``instr`` probes tolerate
    them and the phrase form collapses runs anyway."""
    out = wrapped
    if stopwords:
        out = replace(out, lit(" "), lit("  "))
        for w in sorted(stopwords):
            out = replace(out, lit(f" {w} "), lit(" "))
    if stemmer:
        for suf, rep in S_STEM_RULES:
            out = replace(out, lit(suf + " "),
                          concat(lit(rep), S_STEM_MARKER, lit(" ")))
        out = replace(out, S_STEM_MARKER, lit(""))
    return out


def tokenize_text_py(text: str, tokenizer: str = "whitespace",
                     lowercase: bool = True,
                     stopwords: tuple = (),
                     stemmer: str | None = None) -> list[str]:
    """Driver-side twin of the index build's tokenization, used to
    prepare PROBE tokens exactly the way the build tokenized values
    (``tokenizer`` 'whitespace' | 'word'; 'prefix' tokenizes like
    'whitespace' — the prefixes live on the posting side).
    ``stopwords`` drops whole tokens (checked BEFORE stemming, like the
    build's pipeline order); ``stemmer`` maps each surviving token
    through :func:`stem_token_py`, dropping tokens that stem empty."""
    import re  # noqa: PLC0415

    s = str(text)
    if lowercase:
        s = s.lower()
    if tokenizer == "word":
        s = s.translate({ord(c): " " for c in WORD_DELIMS})
    # the exact Java \s class ws_tokens splits on (Python str.split()
    # would also split on Unicode spaces the build does not), plus
    # chr(1) (the phrase collapse marker) and chr(2) (the stem marker)
    # — both are delimiters on every path
    toks = [t for t in re.split("[ \t\n\x0b\x0c\r\x01\x02]+", s) if t]
    if stopwords:
        drop = set(stopwords)
        toks = [t for t in toks if t not in drop]
    if stemmer:
        toks = [s2 for s2 in (stem_token_py(t) for t in toks) if s2]
    return toks


def bpe_tokens(text: Column) -> Column:
    """BPE-ish tokenization via regexp_extract_all (ARRAY<STRING>)."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)


def token_count(text: Column) -> Column:
    """Whitespace token count — codegen ``regexp_count`` (a token is a
    maximal ``\\S`` run; NULL text counts NULL), no token array."""
    return F.regexp_count(text, F.lit(r"\S+"))


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


def stopword_ratio_text(text: Column) -> Column:
    """:func:`stopword_ratio` straight off the text column — codegen
    ``regexp_count`` boundary-lookaround counts (see :func:`token_hits`),
    no token array; identical double arithmetic to the HOF form."""
    n = F.regexp_count(text, F.lit(r"\S+"))
    return F.when(n > 0,
                  token_hits(text, STOPWORDS).cast("double") / n) \
        .otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: length band + stopword presence
    + not-too-much-punctuation.  Mirrors common LLM-corpus filters (C4-style
    rules); each component is oracle-expressible.

    Round 15: pure codegen string primitives (regexp token counts, the
    gopher-rewrite idiom) — no token array, no interpreted HOF; the
    arithmetic is count-for-count identical to the old ws_tokens form.
    """
    n = F.regexp_count(text, F.lit(r"\S+"))
    len_ok = F.when((n >= 10) & (n <= 1000), 0.4).otherwise(0.0)
    sw_ok = F.when(stopword_ratio_text(text) >= 0.05, 0.3).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 0.3).otherwise(0.0)
    return len_ok + sw_ok + punct_ok


# The Gopher repetition/quality rule set's required English function
# words (Rae et al. 2021, "Scaling Language Models: Methods, Analysis &
# Insights from Training Gopher", appendix A — public paper): a document
# must contain at least 2 of these to count as running English text.
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have",
                         "with")


def gopher_rules(text: Column, min_words: int = 50,
                 max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_word_ratio: float = 0.1,
                 max_bullet_line_frac: float = 0.9,
                 max_ellipsis_line_frac: float = 0.3,
                 min_alpha_word_frac: float = 0.8,
                 min_required_words: int = 2) -> dict[str, Column]:
    """The Gopher quality-rule battery (Rae et al. 2021) as pure
    whole-stage-codegen column expressions — the standard pretraining
    corpus gate between language-ID and dedup.  Returns one boolean
    Column per rule plus ``passes`` (their conjunction); every rule is
    integer-count arithmetic over identical string primitives on both
    engines, so the DuckDB oracle reproduces the flags bit-for-bit.

    Physical shape (round 15, VERDICT r14 task 5): every count is a
    ``regexp_count``/``rlike``/``length`` string primitive — no
    higher-order functions, no token array, so the whole battery stays
    inside whole-stage codegen (HOFs are interpreted; the repo's own
    ``doc_shingles`` measured the difference at 8×).  The regexes are
    crafted to reproduce the token/line semantics of the HOF form
    EXACTLY (``_gopher_rules_hof`` below is the retained twin, and
    tests/test_embed_text.py pins flag-for-flag equality on crafted
    edge cases — tab-only lines, \\r line ends, spliced bullets):
    a token is a maximal ``\\S`` run; a non-blank line has a non-space
    char after column-0 spaces (Spark's trim/ltrim/rtrim strip ONLY
    0x20, hence ``[^ \\n]`` rather than ``\\S``); the ``(?d)`` flag pins
    Java's ^/$ to \\n so multiline anchors agree with a split("\\n").

    Rules: word-count band; mean word length band; symbol-to-word ratio
    ('#' and '...' symbols) cap; bullet-started line fraction cap;
    ellipsis-ended line fraction cap; alphabetic-word fraction floor;
    ≥``min_required_words`` distinct Gopher function words present.
    Bounds default to the paper's; callers tune per corpus (the
    fixture query lowers min_words — sf documents are short)."""
    n = F.regexp_count(text, F.lit(r"\S+"))
    # Σ token lengths ≡ count of non-whitespace chars (tokens are the
    # maximal \S runs), so the mean needs no token array
    tok_chars = F.length(F.regexp_replace(text, r"\s+", ""))
    mean_len = F.when(n > 0, tok_chars.cast("double") / n) \
        .otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ell = (F.length(text)
             - F.length(F.regexp_replace(text, r"\.\.\.", ""))) / 3
    n_lines = F.regexp_count(text, F.lit(r"(?dm)^ *[^ \n]"))
    n_bullet = F.regexp_count(text, F.lit(r"(?dm)^ *(?:- |\* |•)"))
    n_ell_end = F.regexp_count(text, F.lit(r"(?dm)\.\.\. *$"))
    n_alpha = F.regexp_count(text, F.lit(r"\S*[A-Za-z]\S*"))
    lowered = F.lower(text)
    n_req = None
    for w in GOPHER_REQUIRED_WORDS:
        hit = F.when(lowered.rlike(rf"(^|\s){w}(\s|$)"), 1).otherwise(0)
        n_req = hit if n_req is None else (n_req + hit)
    # try_divide, not `/`: ANSI mode (the Spark 4 default) raises on a
    # zero denominator and boolean AND does NOT short-circuit the
    # division away — an empty document must FAIL the gate, not crash it
    # (NULL ratios conjoin to false through coalesce below)
    flags = {
        "n_words_ok": (n >= min_words) & (n <= max_words),
        "mean_len_ok": (n > 0) & (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "symbol_ok": (n > 0)
        & (F.try_divide(n_hash + n_ell, n) <= max_symbol_word_ratio),
        "bullet_ok": (n_lines == 0)
        | (F.try_divide(n_bullet, n_lines) <= max_bullet_line_frac),
        "ellipsis_ok": (n_lines == 0)
        | (F.try_divide(n_ell_end, n_lines) <= max_ellipsis_line_frac),
        "alpha_ok": (n > 0)
        & (F.try_divide(n_alpha, n) >= min_alpha_word_frac),
        "required_ok": n_req >= min_required_words,
    }
    flags = {k: F.coalesce(c, F.lit(False)) for k, c in flags.items()}
    passes = None
    for c in flags.values():
        passes = c if passes is None else (passes & c)
    flags["passes"] = passes
    return flags


def _gopher_rules_hof(text: Column, min_words: int = 50,
                      max_words: int = 100_000,
                      min_mean_word_len: float = 3.0,
                      max_mean_word_len: float = 10.0,
                      max_symbol_word_ratio: float = 0.1,
                      max_bullet_line_frac: float = 0.9,
                      max_ellipsis_line_frac: float = 0.3,
                      min_alpha_word_frac: float = 0.8,
                      min_required_words: int = 2) -> dict[str, Column]:
    """The retained higher-order-function twin of :func:`gopher_rules`
    (the pre-round-15 body) — kept ONLY as the equivalence oracle for
    the codegen rewrite's regex semantics (tests pin flag-for-flag
    equality on crafted edge cases); not exported, not on any query
    path."""
    toks = ws_tokens(text)
    n = F.size(toks)
    mean_len = avg_token_len(toks)
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ell = (F.length(text)
             - F.length(F.regexp_replace(text, r"\.\.\.", ""))) / 3
    lines = F.filter(F.split(text, "\n"),
                     lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(
        lines, lambda x: F.substring(F.ltrim(x), 1, 2).isin("- ", "* ")
        | (F.substring(F.ltrim(x), 1, 1) == "•")))
    n_ell_end = F.size(F.filter(
        lines, lambda x: F.substring(F.rtrim(x), -3, 3) == "..."))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    low = F.transform(toks, F.lower)
    n_req = F.size(F.filter(
        F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS]),
        lambda s: F.array_contains(low, s)))
    flags = {
        "n_words_ok": (n >= min_words) & (n <= max_words),
        "mean_len_ok": (n > 0) & (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "symbol_ok": (n > 0)
        & (F.try_divide(n_hash + n_ell, n) <= max_symbol_word_ratio),
        "bullet_ok": (n_lines == 0)
        | (F.try_divide(n_bullet, n_lines) <= max_bullet_line_frac),
        "ellipsis_ok": (n_lines == 0)
        | (F.try_divide(n_ell_end, n_lines) <= max_ellipsis_line_frac),
        "alpha_ok": (n > 0)
        & (F.try_divide(n_alpha, n) >= min_alpha_word_frac),
        "required_ok": n_req >= min_required_words,
    }
    flags = {k: F.coalesce(c, F.lit(False)) for k, c in flags.items()}
    passes = None
    for c in flags.values():
        passes = c if passes is None else (passes & c)
    flags["passes"] = passes
    return flags


def lang_scores(tokens: Column) -> dict[str, Column]:
    """Marker-token hit count per language (the n-gram heuristic).

    Higher-order-function form over a token array; prefer
    :func:`lang_scores_text` on a raw text column — same counts as pure
    codegen regexp primitives (the round-15 gopher-rewrite idiom)."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marks = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(tokens, lambda t: F.array_contains(marks, F.lower(t))))
    return out


def token_hits(text: Column, words) -> Column:
    """Count of whitespace tokens whose lowercase form equals any of
    ``words`` — the codegen `regexp_count` twin of
    ``size(filter(tokens, array_contains(...)))`` (no token array, no
    interpreted HOF).  Token boundaries are zero-width lookarounds
    ``(?<![\\S]) … (?![\\S])`` (not preceded/followed by a
    non-whitespace char — string edges count as boundaries and adjacent
    matches don't consume each other's separator), so a marker matching
    as a SUBSTRING of a longer token never counts — exactly the
    token-equality semantics of the HOF form (equivalence pinned in
    tests/test_text_search.py)."""
    import re as _re  # noqa: PLC0415

    alts = "|".join(_re.escape(w.lower()) for w in words)
    return F.regexp_count(F.lower(text),
                          F.lit(rf"(?<![\S])(?:{alts})(?![\S])"))


def lang_scores_text(text: Column) -> dict[str, Column]:
    """:func:`lang_scores` straight off the text column — one
    ``regexp_count`` per language, whole battery codegen'd."""
    return {lang: token_hits(text, markers)
            for lang, markers in LANG_MARKERS.items()}


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


# PII scrub patterns — one definition for the Spark expressions AND the
# DuckDB oracles (both regex engines accept this conservative subset:
# no lookarounds, no backrefs).  Replacement order matters and is fixed:
# URLs first (an e-mail inside a URL is part of the URL), then e-mail,
# IPv4, phone.
PII_PATTERNS = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- .]\d{3,4}[- .]\d{4}\b", "<PHONE>"),
)


def scrub_pii(text: Column) -> Column:
    """The PII-redaction pass of a pretraining pipeline (the C4/Dolma
    tagger family): URLs, e-mail addresses, IPv4 addresses, and
    phone-shaped numbers each collapse to a stable placeholder — all
    JVM ``regexp_replace`` chains (whole-stage codegen, no Python), in
    the fixed :data:`PII_PATTERNS` order so engines agree bit-for-bit.
    Unlike :func:`normalize_text` this does NOT touch case/whitespace —
    compose them in either order."""
    t = text
    for _, pat, repl in PII_PATTERNS:
        t = F.regexp_replace(t, pat, repl)
    return t


def pii_counts(text: Column) -> list[tuple[str, Column]]:
    """Per-kind PII hit counts over the RAW text — the audit columns a
    scrub job writes next to the cleaned corpus.  Counted in the same
    fixed order the scrub replaces, but each count runs on the input
    (a URL-embedded e-mail counts as URL only after scrubbing, yet
    both patterns match the raw text — callers wanting post-scrub
    residuals count on :func:`scrub_pii`'s output instead)."""
    return [(name, F.size(F.regexp_extract_all(text, F.lit(pat), 0)))
            for name, pat, _ in PII_PATTERNS]
