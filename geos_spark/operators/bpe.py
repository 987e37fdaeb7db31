"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

The engine already *counts* tokens under a fixed pretokenizer
(``operators/text.py::bpe_token_count``); this module *learns* the merge
table itself from the corpus — the tokenizer-induction step of a
training-data pipeline (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"; the same algorithm
behind the GPT-2/tiktoken vocabularies).

Scale design (the part that matters at 100 TB):

- Training never iterates over documents. One corpus scan builds the
  **word-count domain table** (pretoken -> count); every merge
  iteration afterwards runs on that domain, whose size is the corpus
  *vocabulary* (tens of millions of rows at web scale), not the corpus
  (trillions of tokens). This is exactly how single-node trainers
  (HuggingFace tokenizers) stay tractable, re-expressed as DataFrames.
- Each iteration is: one narrow projection (apply the previous merge),
  one explode+agg shuffle (pair counts), and a LIMIT-1 argmax that
  Spark executes as TakeOrdered (no global sort). The domain table is
  persisted per round and the previous round unpersisted, so lineage
  and storage stay O(1) across iterations.
- Everything is JVM-native Catalyst expressions — no Python UDFs.

Symbol-sequence representation — the trick that makes one literal
``replace()`` apply a merge with exact left-to-right non-overlapping
(Sennrich) semantics in BOTH Spark and the DuckDB oracle:

    each symbol is wrapped in U+001F separators and concatenated:
        [ab, c]  ->  "\\x1f" "ab" "\\x1f" "\\x1f" "c" "\\x1f"
    merging (l, r) is then
        replace(seq, "\\x1f l \\x1f\\x1f r \\x1f", "\\x1f lr \\x1f")

Because every symbol carries its own wrapper, a match can neither
cross a symbol boundary nor steal the delimiter of the next adjacent
pair — ``replace``'s standard leftmost non-overlapping scan *is* the
BPE merge pass ("aaaa" with merge (a,a) -> [aa, aa], not [aa, a, a]).

Determinism: the argmax tie-break is (pair_count DESC, left ASC,
right ASC) under binary UTF-8 collation — identical in Spark and
DuckDB — so the learned merge table is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from geos_spark.operators.text import BPE_PRETOKEN_RE

SEP = "\x1f"


def _wrap_chars(word: Column) -> Column:
    """word -> initial symbol sequence: every character wrapped in SEP."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.concat(F.lit(SEP), F.substring(word, i, F.lit(1)), F.lit(SEP)),
        ),
        "",
    )


def _symbols(seq: Column) -> Column:
    """seq string -> array of symbols (strip outer SEPs, split on SEP SEP).

    U+001F is not a regex metacharacter, so both patterns are literal."""
    return F.split(F.regexp_replace(seq, f"^{SEP}|{SEP}$", ""), SEP + SEP)


def word_domain(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One corpus scan -> the (word, cnt) domain table BPE trains on.

    Pretokens come from the shared lookahead-free GPT-2 pattern
    (``BPE_PRETOKEN_RE``); whitespace-run tokens are excluded (they
    would otherwise dominate the merge table with space-space merges),
    as are the (never-in-practice) tokens containing the U+001F
    separator the symbol encoding reserves. The exclusion is the regex
    ``^\\s*$`` rather than ``trim(word) <> ''`` because Spark's trim
    strips only U+0020 — a tab-run token would survive it (and diverge
    from any whitespace-aware reference).
    """
    w = df.select(
        F.explode(
            # idx=0: the whole match (the pattern has no capture groups
            # — Spark's default idx of 1 would throw)
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
        ).alias("word")
    )
    return (
        w.where((~F.col("word").rlike(r"^\s*$")) & (~F.col("word").contains(SEP)))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 8,
) -> DataFrame:
    """Learn ``merges`` BPE merges from the corpus; returns a DataFrame
    (rank int, lhs string, rhs string, merged string, pair_count
    long), rank 1 = first merge learned.

    The returned frame is driver-materialized (the merge table is the
    *output model* — ``merges`` rows, never data-sized), built from a
    loop of domain-table jobs as described in the module docstring.
    """
    spark = df.sparkSession
    dom = word_domain(df, text_col).select(
        _wrap_chars(F.col("word")).alias("seq"), F.col("cnt")
    )
    dom = dom.persist()

    learned: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, merges + 1):
        syms = _symbols(F.col("seq"))
        pairs = (
            dom.select(
                F.explode(
                    # guard: sequence(1, 0) in Spark yields [1, 0]
                    # (descending), not empty — single-symbol words
                    # must contribute no pairs
                    F.when(
                        F.size(syms) >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size(syms) - 1),
                            lambda i: F.struct(
                                F.element_at(syms, i).alias("l"),
                                F.element_at(syms, i + F.lit(1)).alias("r"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
                ).alias("pr"),
                "cnt",
            )
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("cnt").alias("pc"))
        )
        best = pairs.orderBy(F.desc("pc"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not best:
            break
        l, r, pc = best[0].l, best[0].r, int(best[0].pc)
        learned.append((rank, l, r, l + r, pc))
        nxt = dom.select(
            F.replace(
                F.col("seq"),
                F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}"),
                F.lit(f"{SEP}{l}{r}{SEP}"),
            ).alias("seq"),
            "cnt",
        ).persist()
        nxt.count()  # materialize before dropping the parent
        dom.unpersist()
        dom = nxt
    dom.unpersist()

    return spark.createDataFrame(
        learned, "rank int, lhs string, rhs string, merged string, pair_count long"
    )


def bpe_train_sql(merges: int = 8, table: str = "documents", text_col: str = "text") -> str:
    """The DuckDB oracle for :func:`bpe_train`: the same algorithm with
    the merge loop unrolled into ``merges`` CTE stages (SQL has no
    loops; each stage is pair-count -> argmax -> replace on the same
    wrapped-symbol encoding, so the two engines agree bit-for-bit)."""
    pat = BPE_PRETOKEN_RE.replace("'", "''")
    parts = [
        f"""WITH w0 AS (
  SELECT word, COUNT(*)::BIGINT AS cnt FROM (
    SELECT unnest(regexp_extract_all({text_col}, '{pat}')) AS word FROM {table}
  ) WHERE NOT regexp_matches(word, '^\s*$') AND position(chr(31) IN word) = 0
  GROUP BY word
),
s0 AS (
  SELECT array_to_string(list_transform(range(1, length(word)+1),
           i -> chr(31)||substr(word, i, 1)||chr(31)), '') AS seq, cnt
  FROM w0
)"""
    ]
    for k in range(1, merges + 1):
        prev = f"s{k - 1}"
        parts.append(
            f"""p{k} AS (
  SELECT pr.l AS l, pr.r AS r, SUM(cnt)::BIGINT AS pc FROM (
    SELECT unnest(list_transform(range(1, len(s)),
             i -> struct_pack(l := s[i], r := s[i+1]))) AS pr, cnt
    FROM (SELECT string_split(trim(seq, chr(31)), chr(31)||chr(31)) AS s, cnt
          FROM {prev})
  ) GROUP BY 1, 2
),
b{k} AS (SELECT l, r, pc FROM p{k} ORDER BY pc DESC, l ASC, r ASC LIMIT 1),
s{k} AS (
  SELECT replace(seq, chr(31)||b.l||chr(31)||chr(31)||b.r||chr(31),
                 chr(31)||b.l||b.r||chr(31)) AS seq, cnt
  FROM {prev}, b{k} b
)"""
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS rank, l AS lhs, r AS rhs, l||r AS merged, pc AS pair_count FROM b{k}"
        for k in range(1, merges + 1)
    )
    return ",\n".join(parts) + f"\nSELECT * FROM (\n{sel}\n) ORDER BY rank"
