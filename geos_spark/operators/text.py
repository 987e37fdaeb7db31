"""Text-analysis operators for the training-data pipeline tier.

All native ``pyspark.sql.functions`` expressions (JVM-side, codegen):
token counting, quality scoring, n-gram language ID heuristic, and
document fingerprinting. The ``text`` column is only ever *read* —
never re-encoded — preserving the byte-identical passthrough
invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (heuristic language ID)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "una", "por"],
    "pt": ["não", "uma", "para", "com", "mais"],
    "it": ["il", "che", "per", "con", "della"],
}

EN_STOPWORDS = ["the", "and", "of", "to", "in", "is", "was", "for"]


def token_count(text: Column) -> Column:
    """Whitespace token count (split on runs of whitespace)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def extract_text(html: Column) -> Column:
    """html binary -> extracted text, as a pure native expression chain
    (decode -> drop script/style subtrees -> strip tags -> decode the
    basic entities -> normalize whitespace). Zero python, whole-stage
    codegen at any scale.

    Contract: on whitespace-normalized body text (the corpus shape —
    ``sources/pages.py::synth_pages`` embeds ``text`` verbatim), the
    extraction is BYTE-IDENTICAL to the original text column; this is
    the per-row invariant the pipeline preserves end-to-end (scored by
    the ``pages_extract`` catalog query against an independent DuckDB
    reconstruction). General html additionally gets the script/style
    drop and entity decode, with whitespace normalized.
    """
    # cast, not decode(utf-8): decode is strict in Spark 4 and a single
    # invalid byte sequence would abort the whole job — real web crawls
    # always contain some. The cast is byte-preserving and tolerant
    # (exactly utf8-lossy), the per-row contract a 100 TB crawl needs.
    s = F.col(html).cast("string") if isinstance(html, str) else html.cast("string")
    s = F.regexp_replace(s, r"(?is)<(script|style)[^>]*>.*?</\1\s*>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
    ):
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


# GPT-2-style pretokenizer, lookahead-free so Java regex (Spark,
# whole-stage codegen) and RE2 (DuckDB oracle) tokenize identically:
# contractions | space?+letters | space?+digits | space?+other | ws-run
BPE_PRETOKEN_RE = (
    r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: non-overlapping matches of the GPT-2
    pretokenizer pattern — the standard proxy for LLM token budgets
    when the merge table isn't in play. Pure JVM regexp_count, no
    python."""
    return F.regexp_count(text, F.lit(BPE_PRETOKEN_RE))


def substr_count(text: Column, sub: str) -> Column:
    """Occurrences of a literal substring (length-difference trick —
    identical semantics in any SQL engine, used by the oracle)."""
    n = len(sub)
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(sub)))) / F.lit(n)
    ).cast("long")


def word_count(text: Column, word: str) -> Column:
    """Occurrences of a word with space delimiters (pad ends)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return substr_count(padded, f" {word} ")


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int | None = None,
    min_frac: float = 0.005,
    line_sep: str = "\n",
) -> DataFrame:
    """CCNet-style boilerplate removal: drop every line that occurs in
    at least ``min_docs`` distinct documents (default: ``min_frac`` of
    the corpus) — nav bars, cookie banners, copyright footers.

    Scale shape (the 100 TB plan):
    - line doc-frequency counts on ``xxhash64(line)`` — the wide line
      strings never enter the counting shuffle;
    - the boilerplate set is tiny by construction (lines above a
      corpus-fraction threshold), so the filter is a BROADCAST anti
      join — the corpus-side scan never shuffles;
    - reassembly groups by document (one shuffle keyed by the id),
      ordering lines with array_sort over (pos, line) structs.

    Returns the input frame plus ``clean_text``, ``n_lines`` and
    ``n_lines_kept`` (documents that were pure boilerplate keep an
    empty clean_text).
    """
    n_docs = df.count()
    thresh = (
        int(min_docs)
        if min_docs is not None
        else max(2, int(n_docs * min_frac + 0.999999))
    )
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias(
            "pos", "line"
        ),
    )
    # distinct docs per line, hash-keyed (two-phase: dedupe (doc, hash)
    # partials map-side, then count per hash)
    boiler = (
        lines.select(id_col, F.xxhash64("line").alias("lh"))
        .distinct()
        .groupBy("lh")
        .agg(F.count("*").alias("docs"))
        .where(F.col("docs") >= thresh)
        .select("lh")
    )
    kept = lines.join(
        F.broadcast(boiler),
        F.xxhash64(lines["line"]) == boiler["lh"],
        "left_anti",
    )
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            line_sep,
        ).alias("clean_text"),
        F.count("*").alias("n_lines_kept"),
    )
    return (
        df.withColumn(
            "n_lines", F.size(F.split(F.col(text_col), line_sep))
        )
        .join(clean, id_col, "left")
        .withColumn("clean_text", F.coalesce("clean_text", F.lit("")))
        .withColumn(
            "n_lines_kept", F.coalesce("n_lines_kept", F.lit(0))
        )
    )


# multi-label public suffixes that need one extra label for the
# registered domain (tiny deterministic stand-in for the PSL — the
# real list is a data file a deployment can swap in)
_TWO_LABEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tr", "com.ar",
)


def url_host(url: Column) -> Column:
    """Lowercased host of a URL (scheme/userinfo/port/path stripped),
    as one native regexp_extract."""
    return F.lower(
        F.regexp_extract(
            url, r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//(?:[^/@]*@)?([^/:?#]+)", 1
        )
    )


def url_domain(url: Column) -> Column:
    """Registered domain of a URL: the last two host labels, or the
    last three when the two-label tail is a known multi-label public
    suffix (co.uk etc). Pure native expressions."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    tail2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    is_two_label = tail2.isin(*_TWO_LABEL_SUFFIXES)
    take3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    return (
        F.when(host.isNull() | (host == ""), host)
        .when(n <= 2, host)
        .when(is_two_label & (n >= 3), take3)
        .otherwise(tail2)
    )


def url_canonicalize(url: Column) -> Column:
    """Canonical URL form for exact-URL dedup, all native expressions:
    lowercase scheme+host, drop the fragment, drop utm_*/fbclid/gclid
    tracking params, strip a trailing '?' and any trailing slash,
    drop default ports (:80 http, :443 https)."""
    u = F.regexp_replace(url, r"#.*$", "")
    # lowercase scheme and authority only (path stays case-sensitive)
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([^/]*//[^/]*)", 1)),
        F.regexp_replace(u, r"^[^/]*//[^/]*", ""),
    )
    u = F.regexp_replace(u, r"(?<=[?&])(?:utm_[a-z]+|fbclid|gclid)=[^&#]*&?", "")
    u = F.regexp_replace(u, r"[?&]$", "")
    u = F.regexp_replace(u, r"^(http://[^/]*):80(/|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/]*):443(/|$)", r"$1$2")
    return F.regexp_replace(u, r"(.)/$", r"$1")


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add quality-signal columns: n_chars, n_tokens, stopword_hits,
    punct_hits, upper_ratio-free (all integer/exact except ratios)."""
    t = F.col(text_col)
    stop_hits = None
    for w in EN_STOPWORDS:
        c = word_count(t, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    return (
        df.withColumn("n_chars", F.length(t))
        .withColumn("n_tokens", token_count(t))
        .withColumn("stopword_hits", stop_hits)
        .withColumn("punct_hits", substr_count(t, "."))
        .withColumn(
            "stopword_ratio",
            F.col("stopword_hits").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
        )
    )


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-word hits
    (ties broken by language code order). Native expressions only."""
    t = F.col(text_col)
    # greatest() over (score, lang) structs: struct comparison is
    # lexicographic, so the max picks the highest score; ties resolve
    # to the greatest lang code — mirror in oracle with max(row(...)).
    structs = [
        F.struct(
            sum(
                (word_count(t, w) for w in words[1:]),
                word_count(t, words[0]),
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*structs)
    return df.withColumn("lang_guess", best["lang"]).withColumn(
        "lang_score", best["score"]
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """128-bit-ish document fingerprint: md5 of the raw text (exact
    content identity; collision-safe at corpus scale)."""
    return df.withColumn("fingerprint", F.md5(F.col(text_col)))


def with_repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText
    quality-filter family), all native expressions:

    - ``dup_line_frac``: fraction of the doc's lines that are repeats
      of an earlier identical line;
    - ``dup_line_char_frac``: fraction of characters inside those
      repeated lines;
    - ``top_bigram_char_frac``: characters covered by the most frequent
      word 2-gram over total characters in tokens.

    Everything is per-row array algebra (split / transform /
    aggregate) — no explode, no shuffle: a pure map over the corpus.
    Token-less or single-line docs yield 0.0 fractions.
    """
    lines = F.split(F.col(text_col), "\n")
    # count of line occurrences beyond the first, via distinct
    n_lines = F.size(lines)
    n_uniq = F.size(F.array_distinct(lines))
    dup_line_frac = F.when(
        n_lines > 0, (n_lines - n_uniq) / n_lines
    ).otherwise(F.lit(0.0))
    # chars inside repeated lines: total chars of lines minus chars of
    # one copy of each distinct line, over total line chars
    chars_all = F.aggregate(
        lines, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    chars_uniq = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda acc, x: acc + F.length(x)
    )
    dup_line_char_frac = F.when(
        chars_all > 0, (chars_all - chars_uniq) / chars_all
    ).otherwise(F.lit(0.0))
    # top word-bigram coverage
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    nt = F.size(toks)
    bigrams = F.when(nt >= 2, F.transform(
        F.sequence(F.lit(1), nt - 1),
        lambda i: F.concat_ws(
            " ", F.try_element_at(toks, i), F.try_element_at(toks, i + 1)
        ),
    )).otherwise(F.array().cast("array<string>"))
    # modal bigram via sort + linear run scan (O(n log n) per row; the
    # naive distinct x filter form is O(n^2) and melts on long docs).
    # Accumulator: (prev value, current run, best count, best token
    # chars among modal bigrams — the longest-of-ties rule).
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("bestc"),
        F.lit(0).alias("bestl"),
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        xlen = F.length(x) - 1  # chars of the two tokens, no separator
        bestc = F.greatest(acc["bestc"], run)
        bestl = (
            F.when(run > acc["bestc"], xlen)
            .when(run == acc["bestc"], F.greatest(acc["bestl"], xlen))
            .otherwise(acc["bestl"])
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            bestc.alias("bestc"),
            bestl.alias("bestl"),
        )

    scan = F.aggregate(F.array_sort(bigrams), zero, _step)
    top_count = scan["bestc"]
    top_len = scan["bestl"]
    tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    top_bigram_char_frac = F.when(
        (tok_chars > 0) & (top_count > 0),
        (top_count * top_len).cast("double") / tok_chars,
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("dup_line_frac", dup_line_frac)
        .withColumn("dup_line_char_frac", dup_line_char_frac)
        .withColumn("top_bigram_char_frac", top_bigram_char_frac)
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_hits: int = 2,
    min_alpha_ratio: float = 0.6,
) -> DataFrame:
    """Gopher/C4-style composite quality filter (Rae et al. 2021 §A1;
    Raffel et al. 2020 C4): per-document boolean rule columns plus the
    conjunctive ``keep`` flag.

    Rules (all native expressions, zero python, zero shuffle):
      - ``r_words``: whitespace word count in [min_words, max_words]
      - ``r_mean_len``: mean word length in [min_mean_word_len,
        max_mean_word_len]
      - ``r_symbols``: '#'+ellipsis occurrences per word <=
        max_symbol_ratio
      - ``r_stopwords``: at least min_stopword_hits stopword
        occurrences (Gopher's "stop word" rule, occurrence-counted)
      - ``r_alpha``: fraction of non-space chars that are ASCII
        letters >= min_alpha_ratio
      - ``r_blocklist``: no C4 blocklist marker ('javascript',
        'lorem ipsum', '{')

    Scale shape: stateless projection inside whole-stage codegen — at
    100 TB this is a map-only pass bounded by the scan, and Catalyst
    pushes the ``keep`` predicate into the parquet reader when the
    caller filters on it.
    """
    t = F.col(text_col)
    wc = token_count(t)
    nonspace = F.length(F.regexp_replace(t, r"\s+", ""))
    mean_len = nonspace.cast("double") / F.greatest(wc, F.lit(1)).cast(
        "double"
    )
    symbols = substr_count(t, "#") + substr_count(t, "...")
    sym_ratio = symbols.cast("double") / F.greatest(wc, F.lit(1)).cast(
        "double"
    )
    stop_hits = None
    for w in EN_STOPWORDS:
        c = word_count(t, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    alpha = F.length(t) - F.length(F.regexp_replace(t, r"[A-Za-z]", ""))
    alpha_ratio = alpha.cast("double") / F.greatest(
        nonspace, F.lit(1)
    ).cast("double")
    lowered = F.lower(t)
    blocked = (
        F.contains(lowered, F.lit("javascript"))
        | F.contains(lowered, F.lit("lorem ipsum"))
        | F.contains(lowered, F.lit("{"))
    )
    rules = {
        "r_words": (wc >= min_words) & (wc <= max_words),
        "r_mean_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "r_symbols": sym_ratio <= max_symbol_ratio,
        "r_stopwords": stop_hits >= min_stopword_hits,
        "r_alpha": alpha_ratio >= min_alpha_ratio,
        "r_blocklist": ~blocked,
    }
    out = df
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


def char_entropy(text: Column) -> Column:
    """Character-level Shannon entropy in nats — the classic cheap
    perplexity proxy (low entropy = repetitive/degenerate text, high
    = encrypted/binary junk; C4/CCNet-era pipelines threshold both
    tails).

    Zero shuffle, zero explode: the distinct-char array stays inside
    one codegen projection, per-char counts via the length-difference
    trick, summed with an ``aggregate`` HOF. Cost is
    O(distinct_chars * len) per row with no data movement — at 100 TB
    this is a map-only pass.
    """
    n = F.length(text).cast("double")
    uniq = F.array_distinct(F.split(text, ""))

    def _term(acc, c):
        cnt = (F.length(text) - F.length(F.replace(text, c))).cast(
            "double"
        )
        return acc - (cnt / n) * F.log(cnt / n)

    return F.when(F.length(text) <= 0, F.lit(0.0)).otherwise(
        F.aggregate(uniq, F.lit(0.0), _term)
    )
