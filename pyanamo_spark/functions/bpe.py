"""Byte-pair-encoding trainer: the full iterative merge loop at
corpus scale (Sennrich et al., "Neural Machine Translation of Rare
Words with Subword Units", ACL 2016).

``q_bpe_pairs`` (functions/text.py) is ONE round of the inner
aggregation; this module iterates it to an actual merge table — the
artifact a tokenizer ships. The scale discipline:

  - the corpus collapses ONCE to a (word, freq) vocabulary table —
    every later pass runs over the vocabulary (zipf-bounded), never
    the corpus; word frequency carries the corpus weight
  - each round: one map-side-combinable weighted pair count over the
    symbol arrays, a driver-side top-1 pick (count desc, pair asc —
    the deterministic tie-break), and a merge rewrite
  - the merge rewrite is a JVM-side higher-order ``aggregate`` fold
    over each word's symbol array (greedy left-to-right,
    non-overlapping — fold state is the rewritten prefix; a pair
    merges when the incoming symbol extends the prefix's tail), so
    no Python touches the vocabulary in the loop
  - ``localCheckpoint`` per round keeps the iterated plan flat
    (the q_dedup_clusters lesson: analyzer-breaking plan growth is
    the real limit on DataFrame iteration, not data volume)

Rows-only: an N-round greedy loop with argmax tie-breaks is not
practically SQL-expressible; tests pin the merge sequence against an
independent pure-Python BPE reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanamo_spark.registry import register

#: merge rounds for the registered query
N_MERGES = 8


def word_vocab(corpus: DataFrame) -> DataFrame:
    """(symbols, freq): whitespace words split to character arrays,
    weighted by corpus frequency. The one corpus-sized pass."""
    return (
        corpus.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            # split("") leaves a trailing "" element — drop it
            F.filter(
                F.split("w", ""), lambda s: s != F.lit("")
            ).alias("symbols"),
            "freq",
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol-pair counts over the vocabulary."""
    # the size >= 2 filter also guards sequence()'s step-down trap:
    # sequence(1, 0) yields [1, 0], not [] (see dedup/spans.gram_array)
    pairs = vocab.filter(F.size("symbols") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(symbols) - 1),"
                " i -> struct(symbols[i-1] AS a, symbols[i] AS b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(
        F.sum("freq").alias("n_pairs")
    )


def _merge_pair(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every symbol array with (a, b) -> a+b merged, greedy
    left-to-right — one codegen'd fold per word, no shuffle."""
    la, lb = F.lit(a), F.lit(b)
    merged = F.aggregate(
        "symbols",
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (s == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return vocab.select(merged.alias("symbols"), "freq")


#: vocabularies at or below this row count train driver-side after the
#: distributed corpus->vocab collapse (what real tokenizer pipelines
#: do: the corpus pass is the scale problem, the vocab loop is not);
#: larger vocabularies (web-crawl tails: URLs, typos, code tokens)
#: take the fully distributed loop
DRIVER_VOCAB_MAX = 200_000


def _train_driver(
    vocab_rows: list[tuple[tuple[str, ...], int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """In-memory merge loop over a collected (symbols, freq) vocab —
    identical semantics and tie-breaks to the distributed loop."""
    vocab: dict[tuple[str, ...], int] = {}
    for sym, freq in vocab_rows:
        vocab[sym] = vocab.get(sym, 0) + freq
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for sym, freq in vocab.items():
            for x, y in zip(sym, sym[1:]):
                pairs[(x, y)] = pairs.get((x, y), 0) + freq
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, n))
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, freq in vocab.items():
            out: list[str] = []
            for s in sym:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def train_bpe(
    corpus: DataFrame,
    n_merges: int = N_MERGES,
    driver_vocab_max: int = DRIVER_VOCAB_MAX,
) -> list[tuple[int, str, str, int]]:
    """The learned merge table: [(rank, left, right, weighted pair
    count at merge time)], rank 1-based in merge order. Stops early
    when no adjacent pair remains.

    The corpus-sized work (tokenize + frequency collapse) is always
    distributed; when the resulting vocabulary fits the driver bound
    the merge loop runs in memory (one collect of (symbols, freq) —
    a bounded model, the same contract as centroid/stat collects
    elsewhere), otherwise each round runs as one distributed
    pair-count + HOF merge rewrite with a lazy localCheckpoint so a
    round costs a single job. Both paths share tie-break semantics;
    ``tests/test_bpe.py`` pins them equal.
    """
    vocab = word_vocab(corpus)
    # regime probe fused with the driver pull (r13, the simhash
    # pattern): limit(max+1).collect() returns the COMPLETE vocabulary
    # whenever it fits the driver bound (limit(N) yields all rows when
    # fewer than N exist) and stops at max+1 rows above it — one job
    # where the old eager-checkpoint + count + collect chain ran three.
    # The merge arithmetic is row-order-independent (pair counts fold
    # through a dict; ties break on the pair itself), so the probe's
    # row order is immaterial. The checkpoint moves to the distributed
    # path, the only one that iterates a plan.
    probe = vocab.limit(driver_vocab_max + 1).collect()
    if len(probe) <= driver_vocab_max:
        rows = [
            (tuple(r["symbols"]), int(r["freq"])) for r in probe
        ]
        return _train_driver(rows, n_merges)
    vocab = vocab.localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("n_pairs"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n_pairs"])
        merges.append((rank, a, b, n))
        vocab = _merge_pair(vocab, a, b).localCheckpoint(eager=False)
    return merges


def encode_bpe(
    corpus: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Apply a trained merge table to the corpus: per doc, the token
    count, word count, and mean token length after all merges — the
    tokenizer-apply pass a training pipeline runs over every shard.

    Scale shape (the apply pass is corpus-sized, so it must stay
    JVM-side and touch each DISTINCT word once):

    - tokenize once per distinct (doc-independent) word: the corpus
      collapses to a (word, n_occurrences-per-doc) table, the merge
      folds run over the DISTINCT word spelling only, and the per-doc
      stats re-aggregate the joined counts — a web corpus has orders
      of magnitude fewer distinct words than word occurrences
    - the merge application is the SAME codegen'd higher-order fold as
      training's ``_merge_pair``, chained once per merge in rank order
      (greedy left-to-right per pass, matching the trainer exactly) —
      no Python in the scan
    - the (word ↔ doc) join shuffles only (doc_id, word-hash, counts);
      distinct-word token arrays never leave their aggregation
    """
    words = (
        corpus.select(
            "doc_id", F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("n_occ"))
    )
    distinct_words = words.select("w").distinct().select(
        "w",
        F.filter(F.split("w", ""), lambda s: s != F.lit("")).alias(
            "symbols"
        ),
    )
    encoded = distinct_words
    for _rank, a, b, _n in merges:
        la, lb = F.lit(a), F.lit(b)
        fold = F.aggregate(
            "symbols",
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == la)
                & (s == lb),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(la, lb)),
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        encoded = encoded.select("w", fold.alias("symbols"))
    per_word = encoded.select(
        "w",
        F.size("symbols").alias("n_word_tokens"),
        F.aggregate(
            "symbols", F.lit(0), lambda acc, s: acc + F.length(s)
        ).alias("n_word_chars"),
    )
    return (
        words.join(per_word, "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n_occ") * F.col("n_word_tokens")).alias(
                "n_tokens"
            ),
            F.sum("n_occ").alias("n_words"),
            F.round(
                F.sum(F.col("n_occ") * F.col("n_word_chars"))
                / F.sum(F.col("n_occ") * F.col("n_word_tokens")),
                4,
            ).alias("mean_token_len"),
            # exact emitted character mass — the conservation side of
            # q_bpe_encode's audit (merges never create/destroy chars)
            F.sum(F.col("n_occ") * F.col("n_word_chars")).alias(
                "n_chars_emitted"
            ),
        )
    )


@register(
    "q_bpe_encode",
    oracle="""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '),
                            w -> len(w) > 0)) AS BIGINT) AS n_words,
       CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars,
       CAST(1 AS INTEGER) AS tokens_bounds_ok,
       CAST(1 AS INTEGER) AS chars_conserved_ok
FROM documents
WHERE text IS NOT NULL
  AND len(list_filter(string_split(text, ' '), w -> len(w) > 0)) > 0
""",
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply BPE, audited per document: learn {N_MERGES}
    merges on the documents table, encode the same corpus through the
    JVM higher-order fold (encode_bpe), and certify the tokenization
    contract in-engine —

    - ``n_words`` / ``n_chars``: exact word and non-space character
      counts the oracle re-derives independently;
    - ``tokens_bounds_ok``: n_words ≤ n_tokens ≤ n_chars (every word
      is ≥ 1 token, every token ≥ 1 char — a dropped word, a phantom
      merge across word boundaries, or token duplication flips it);
    - ``chars_conserved_ok``: the encoded symbols' total character
      mass equals the document's non-space characters exactly — BPE
      merges may never create or destroy characters.

    Per-doc token counts themselves are greedy-iteration-specific
    (why this seat was rows-only before the audit); token-by-token
    parity with a pure-Python reference encoder, including tie-breaks,
    stays pinned in tests/test_bpe.py."""
    docs = spark.table("documents").filter(F.col("text").isNotNull())
    merges = train_bpe(docs)
    enc = encode_bpe(docs, merges)
    exact = docs.select(
        "doc_id",
        F.length(F.translate(F.col("text"), " ", "")).cast("long").alias(
            "n_chars"
        ),
    )
    return (
        enc.join(exact, "doc_id")
        .select(
            "doc_id",
            "n_words",
            "n_chars",
            (
                (F.col("n_words") <= F.col("n_tokens"))
                & (F.col("n_tokens") <= F.col("n_chars"))
            )
            .cast("int")
            .alias("tokens_bounds_ok"),
            (F.col("n_chars_emitted") == F.col("n_chars"))
            .cast("int")
            .alias("chars_conserved_ok"),
        )
    )


@register(
    "q_bpe_train",
    oracle=f"""
WITH words AS (
  SELECT w, COUNT(*) AS freq
  FROM (
    SELECT unnest(string_split(text, ' ')) AS w
    FROM documents WHERE text IS NOT NULL
  )
  WHERE len(w) > 0
  GROUP BY w
),
pairs AS (
  SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b,
         SUM(freq) AS n
  FROM words, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
  GROUP BY 1, 2
),
best AS (SELECT a, b, n FROM pairs ORDER BY n DESC, a, b LIMIT 1)
SELECT CAST(1 AS INTEGER) AS rank, a AS "left", b AS "right",
       CAST(n AS BIGINT) AS n_pairs, CAST(1 AS INTEGER) AS ok
FROM best
UNION ALL
SELECT CAST(r AS INTEGER), NULL, NULL, CAST(NULL AS BIGINT),
       CAST(1 AS INTEGER)
FROM generate_series(2, {N_MERGES}) t(r)
WHERE (SELECT COUNT(*) FROM best) > 0
""",
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE merge table after {N_MERGES} rounds over the documents
    corpus, audited — the final rows-only seat converted (r09):

    - **rank 1 is checked EXACTLY**: the first merge is a pure
      aggregation (most frequent weighted adjacent character pair,
      ties broken lexicographically on (left, right)), which DuckDB
      re-derives value-for-value — left, right, AND the weighted pair
      count. A tokenization, weighting, counting, or tie-break
      regression fails the hash compare outright.
    - **ranks 2..{N_MERGES} carry a buildability certification**: each
      later merge's left/right must be a single character or the
      concatenation of an EARLIER merge (the defining closure
      invariant of a valid BPE merge table), with a positive count;
      their concrete symbols are iteration-state-specific (rank k
      counts pairs over the rank-k−1 vocabulary — not
      SQL-expressible), so the oracle asserts the flags and NULLs.

    Token-by-token parity of the full sequence against a pure-Python
    trainer, including tie-breaks, stays pinned in tests/test_bpe.py."""
    merges = train_bpe(spark.table("documents"))
    # the oracle emits ranks 2..N_MERGES unconditionally whenever a
    # rank-1 merge exists, but train_bpe stops early when no adjacent
    # pair remains — on a degenerate corpus (too few distinct pairs)
    # the row counts would diverge and the driver compare would fail
    # SPURIOUSLY. Surface that precondition as a clear error instead
    # (ADVICE r09): the fixture corpora all satisfy it.
    if merges and len(merges) != N_MERGES:
        # ValueError, not assert: stripped under python -O, which would
        # silently restore the spurious-failure path (ADVICE r10)
        raise ValueError(
            f"train_bpe stopped early ({len(merges)} of {N_MERGES} "
            f"merges) — the q_bpe_train oracle emits a fixed "
            f"{N_MERGES}-row table, so this corpus cannot be "
            f"oracle-compared; a row-count mismatch here is the "
            f"degenerate-corpus precondition, not a trainer bug"
        )
    # the merge table is an N_MERGES-row driver model (the same bounded
    # contract as the fit collects elsewhere); the audit flags are
    # metadata post-processing over it
    rows = []
    earlier: set[str] = set()
    for rank, a, b, n in merges:
        buildable = (len(a) == 1 or a in earlier) and (
            len(b) == 1 or b in earlier
        )
        ok = int(buildable and n >= 1)
        if rank == 1:
            rows.append((1, a, b, n, ok))
        else:
            rows.append((rank, None, None, None, ok))
        earlier.add(a + b)
    return spark.createDataFrame(
        rows, "rank int, left string, right string, n_pairs long, ok int"
    )
