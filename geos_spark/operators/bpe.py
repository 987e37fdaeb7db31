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


def _apply_merge(syms: list, l: str, r: str) -> list:
    """Leftmost non-overlapping merge pass over one symbol list —
    exactly what replace() does on the SEP-wrapped encoding."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_local(
    domain: list, merges: int
) -> tuple[list, list]:
    """Exact in-memory BPE over a collected (word, cnt) domain: lazy
    max-heap over pair counts + re-scan of only the words containing
    the merged pair.  Same greedy sequence and (count DESC, l ASC,
    r ASC) tie-break as the per-merge Spark loop (Python str compares
    by code point == UTF-8 binary collation), so the learned table is
    bit-identical — pinned by the prefix-stability test.

    Returns (learned merges, final per-word symbol lists parallel to
    ``domain``).  Cost is O(total symbols + merges * affected-word
    rescans): a 32k-vocab tokenizer is one heap loop, not 32k Spark
    jobs.
    """
    import heapq
    from collections import defaultdict

    words = [list(w) for w, _ in domain]
    cnts = [int(c) for _, c in domain]

    pair_counts: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)

    def add_word(wi: int, sign: int) -> set:
        touched = set()
        syms = words[wi]
        c = cnts[wi] * sign
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += c
            touched.add(p)
            if sign > 0:
                pair_words[p].add(wi)
        return touched

    for wi in range(len(words)):
        add_word(wi, +1)

    heap = [(-c, l, r) for (l, r), c in pair_counts.items() if c > 0]
    heapq.heapify(heap)
    learned = []
    for rank in range(1, merges + 1):
        best = None
        while heap:
            negc, l, r = heapq.heappop(heap)
            cur = pair_counts.get((l, r), 0)
            if cur <= 0:
                continue
            if -negc != cur:
                # stale entry: re-push with the live count
                heapq.heappush(heap, (-cur, l, r))
                continue
            best = (l, r, cur)
            break
        if best is None:
            break
        l, r, pc = best
        learned.append((rank, l, r, l + r, pc))
        affected = list(pair_words.pop((l, r), ()))
        dirty = set()
        for wi in affected:
            dirty |= add_word(wi, -1)
            words[wi] = _apply_merge(words[wi], l, r)
            dirty |= add_word(wi, +1)
        pair_counts.pop((l, r), None)
        for p in dirty:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return learned, words


# Domain-row cap for driver-side training.  The word-count domain is
# vocabulary-sized (the module docstring's scale argument: tens of
# millions of rows at web scale — the same "model-sized" tier as the
# collected pair table), so the default keeps even a 50M-pretoken web
# vocabulary on one machine; above it the per-merge distributed loop
# is the (slow but unbounded) fallback.
DRIVER_DOMAIN_CAP = 50_000_000


def _train_loop(
    df: DataFrame,
    text_col: str,
    merges: int,
    keep_word: bool = False,
    driver_domain_cap: int = DRIVER_DOMAIN_CAP,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Training entry: one corpus scan builds the domain; if the
    domain fits ``driver_domain_cap`` rows it is collected and trained
    in-memory (O(1) Spark jobs for any merge count), else the
    per-merge distributed loop below takes over.  Both paths learn the
    identical merge table."""
    spark = df.sparkSession
    dom0 = word_domain(df, text_col).persist()
    n = dom0.count()
    if n > driver_domain_cap:
        learned, dom = _train_loop_distributed(
            df, text_col, merges, keep_word
        )
        dom0.unpersist()
        return learned, dom
    rows = [(r[0], int(r[1])) for r in dom0.select("word", "cnt").collect()]
    dom0.unpersist()
    learned, final_syms = _train_local(rows, merges)
    out_rows = [
        (
            *( (w,) if keep_word else () ),
            "".join(SEP + s + SEP for s in syms),
            c,
        )
        for (w, c), syms in zip(rows, final_syms)
    ]
    schema = (
        "word string, seq string, cnt long"
        if keep_word
        else "seq string, cnt long"
    )
    dom = spark.createDataFrame(out_rows, schema).persist()
    return learned, dom


def _train_loop_distributed(
    df: DataFrame,
    text_col: str,
    merges: int,
    keep_word: bool = False,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Shared training loop: returns (learned merges, final domain table).

    The final domain table is (seq, cnt) — or (word, seq, cnt) with
    ``keep_word`` — persisted; callers that consume it must unpersist.
    Its ``seq`` column holds each distinct word's final segmentation
    under the learned merges, so encoding/vocab statistics are lookups
    against it, never a re-tokenization of the corpus.
    """
    carry = ["word"] if keep_word else []
    dom = word_domain(df, text_col).select(
        *carry, _wrap_chars(F.col("word")).alias("seq"), F.col("cnt")
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
            *carry,
            F.replace(
                F.col("seq"),
                F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}"),
                F.lit(f"{SEP}{l}{r}{SEP}"),
            ).alias("seq"),
            F.col("cnt"),
        ).persist()
        nxt.count()  # materialize before dropping the parent
        dom.unpersist()
        dom = nxt
    return learned, dom


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
    learned, dom = _train_loop(df, text_col, merges)
    dom.unpersist()
    return spark.createDataFrame(
        learned, "rank int, lhs string, rhs string, merged string, pair_count long"
    )


def bpe_vocab(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 8,
    top: int = 32,
) -> DataFrame:
    """Corpus token histogram under the learned merges: train, then
    explode the final domain table's segmentations weighted by word
    count — the ``top`` most frequent subword tokens as
    (token string, total_count long), ordered (count DESC, token ASC).

    No second corpus scan: the histogram is a vocabulary-sized
    explode+agg over the final domain table, so at 100 TB this costs
    one extra shuffle over tens of millions of rows, not the corpus.
    """
    _, dom = _train_loop(df, text_col, merges)
    out = (
        dom.select(
            F.explode(_symbols(F.col("seq"))).alias("token"), F.col("cnt")
        )
        .groupBy("token")
        .agg(F.sum("cnt").alias("total_count"))
        .orderBy(F.desc("total_count"), F.asc("token"))
        .limit(top)
    )
    rows = out.collect()
    dom.unpersist()
    return df.sparkSession.createDataFrame(
        [(r.token, int(r.total_count)) for r in rows],
        "token string, total_count long",
    )


def bpe_encode(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    merges: int = 8,
) -> DataFrame:
    """Per-document BPE token counts under the learned merges:
    (id_col, n_bpe_tokens long).

    Encoding is a join, not a re-tokenization: the final domain table
    already holds every distinct word's segmentation, so each document
    row becomes (doc, word) pairs that look up ``size(symbols(seq))``.
    Whitespace-run pretokens (excluded from training) count 0; a
    document with NULL text or no trainable words keeps its row with
    n_bpe_tokens = 0 (left join + coalesce), matching the per-row
    null-tolerant contract of the other text operators.

    The result is a lazy, fully distributed plan (the output is
    data-sized — never driver-materialized). The learned merges are
    baked into the plan as replace() literals during training, so the
    domain cache can be dropped here; consuming the plan recomputes
    the vocabulary-sized narrow chain once, which at 100 TB is one
    corpus scan + a per-word projection — far cheaper than holding
    the cache or collecting.
    """
    _, dom = _train_loop(df, text_col, merges, keep_word=True)
    tok_len = dom.select(
        F.col("word"), F.size(_symbols(F.col("seq"))).alias("n_sym")
    )
    doc_words = df.select(
        F.col(id_col),
        F.explode_outer(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
        ).alias("word"),
    )
    out = (
        doc_words.join(tok_len, "word", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("n_sym"), F.lit(0)).cast("long").alias("n_bpe_tokens")
        )
    )
    dom.unpersist()
    return out


def _stages_sql(
    merges: int, table: str, text_col: str, keep_word: bool = False
) -> list[str]:
    """The shared unrolled-training WITH-clause: w0/s0 then, per merge
    k, p{k} (pair counts), b{k} (argmax), s{k} (post-merge domain)."""
    pat = BPE_PRETOKEN_RE.replace("'", "''")
    carry = "word, " if keep_word else ""
    parts = [
        f"""WITH w0 AS (
  SELECT word, COUNT(*)::BIGINT AS cnt FROM (
    SELECT unnest(regexp_extract_all({text_col}, '{pat}')) AS word FROM {table}
  ) WHERE NOT regexp_matches(word, '^\\s*$') AND position(chr(31) IN word) = 0
  GROUP BY word
),
s0 AS MATERIALIZED (
  SELECT {carry}array_to_string(list_transform(range(1, length(word)+1),
           i -> chr(31)||substr(word, i, 1)||chr(31)), '') AS seq, cnt
  FROM w0
)"""
    ]
    for k in range(1, merges + 1):
        prev = f"s{k - 1}"
        parts.append(
            f"""p{k} AS MATERIALIZED (
  SELECT pr.l AS l, pr.r AS r, SUM(cnt)::BIGINT AS pc FROM (
    SELECT unnest(list_transform(range(1, len(s)),
             i -> struct_pack(l := s[i], r := s[i+1]))) AS pr, cnt
    FROM (SELECT string_split(trim(seq, chr(31)), chr(31)||chr(31)) AS s, cnt
          FROM {prev})
  ) GROUP BY 1, 2
),
b{k} AS MATERIALIZED (SELECT l, r, pc FROM p{k} ORDER BY pc DESC, l ASC, r ASC LIMIT 1),
s{k} AS MATERIALIZED (
  SELECT {carry}replace(seq, chr(31)||b.l||chr(31)||chr(31)||b.r||chr(31),
                 chr(31)||b.l||b.r||chr(31)) AS seq, cnt
  FROM {prev}, b{k} b
)"""
        )
    return parts


def bpe_train_sql(merges: int = 8, table: str = "documents", text_col: str = "text") -> str:
    """The DuckDB oracle for :func:`bpe_train`: the same algorithm with
    the merge loop unrolled into ``merges`` CTE stages (SQL has no
    loops; each stage is pair-count -> argmax -> replace on the same
    wrapped-symbol encoding, so the two engines agree bit-for-bit).
    Stages are AS MATERIALIZED: s{{k}} is referenced by both p{{k+1}}
    and s{{k+1}}, so plain CTE inlining would expand 2^merges-fold."""
    parts = _stages_sql(merges, table, text_col)
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS rank, l AS lhs, r AS rhs, l||r AS merged, pc AS pair_count FROM b{k}"
        for k in range(1, merges + 1)
    )
    return ",\n".join(parts) + f"\nSELECT * FROM (\n{sel}\n) ORDER BY rank"


def bpe_vocab_sql(
    merges: int = 8,
    top: int = 32,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """The DuckDB oracle for :func:`bpe_vocab`: the unrolled training
    stages, then the token histogram off the final domain stage."""
    parts = _stages_sql(merges, table, text_col)
    return (
        ",\n".join(parts)
        + f"""
SELECT token, SUM(cnt)::BIGINT AS total_count FROM (
  SELECT unnest(string_split(trim(seq, chr(31)), chr(31)||chr(31))) AS token, cnt
  FROM s{merges}
) GROUP BY token ORDER BY total_count DESC, token ASC LIMIT {top}"""
    )


def bpe_encode_sql(
    merges: int = 8,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The DuckDB oracle for :func:`bpe_encode`: unrolled training with
    ``word`` carried through the stages, then per-document word lookup.

    A NULL-text document produces no rows from unnest, so the final
    left join from the base table restores it with n_bpe_tokens = 0 —
    same contract as the Spark side's explode_outer + coalesce."""
    pat = BPE_PRETOKEN_RE.replace("'", "''")
    parts = _stages_sql(merges, table, text_col, keep_word=True)
    parts.append(
        f"""tok AS (
  SELECT word,
         len(string_split(trim(seq, chr(31)), chr(31)||chr(31)))::BIGINT AS n_sym
  FROM s{merges}
),
dw AS (
  SELECT {id_col}, unnest(regexp_extract_all({text_col}, '{pat}')) AS word
  FROM {table}
),
per_doc AS (
  SELECT dw.{id_col}, SUM(tok.n_sym)::BIGINT AS n
  FROM dw LEFT JOIN tok USING (word) GROUP BY dw.{id_col}
)"""
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT d.{id_col}, COALESCE(per_doc.n, 0)::BIGINT AS n_bpe_tokens
FROM {table} d LEFT JOIN per_doc USING ({id_col})"""
    )
