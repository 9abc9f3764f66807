"""BPE trainer vs an independent pure-Python reference: identical
merge sequences (including tie-breaks) on planted and fixture text."""

from __future__ import annotations

from collections import Counter

from pyanamo_spark.functions.bpe import train_bpe, word_vocab


def _py_bpe(texts: list[str], n_merges: int):
    """Reference implementation: dict-of-tuples vocabulary, greedy
    left-to-right merges, (count desc, pair asc) tie-break."""
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[tuple(w)] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for sym, freq in vocab.items():
            for x, y in zip(sym, sym[1:]):
                pairs[(x, y)] += freq
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, n))
        new_vocab: Counter = Counter()
        for sym, freq in vocab.items():
            out = []
            for s in sym:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_on_planted_corpus(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wider wide wide widest",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    expected = _py_bpe(texts, 10)
    # distributed loop (forced) and driver fast path must agree with
    # the reference AND each other
    assert train_bpe(df, n_merges=10, driver_vocab_max=0) == expected
    assert train_bpe(df, n_merges=10) == expected


def test_bpe_matches_reference_on_fixture(spark, sf_dir):
    from pyanamo_spark import semantics

    semantics.ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    texts = [
        r["text"] for r in docs.select("text").limit(40).collect()
    ]
    sub = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    assert train_bpe(sub, n_merges=5) == _py_bpe(texts, 5)


def test_bpe_greedy_overlap_and_exhaustion(spark):
    """'aaaa' x1: round 1 merges (a,a) with weighted count 3 (three
    adjacent slots), leaving [aa, aa]; and training stops when words
    are single symbols."""
    df = spark.createDataFrame([(0, "aaaa")], ["doc_id", "text"])
    merges = train_bpe(df, n_merges=10)
    assert merges == _py_bpe(["aaaa"], 10)
    assert merges[0] == (1, "a", "a", 3)
    # exhaustion: a 4-char word is fully merged in <= 3 rounds
    assert len(merges) <= 3


def test_word_vocab_weights(spark):
    df = spark.createDataFrame(
        [(0, "ab ab cd"), (1, "ab")], ["doc_id", "text"]
    )
    rows = {
        tuple(r["symbols"]): r["freq"]
        for r in word_vocab(df).collect()
    }
    assert rows == {("a", "b"): 3, ("c", "d"): 1}


def _py_encode(word: str, merges) -> list[str]:
    """Independent greedy encoder: apply each merge rank in order,
    one left-to-right pass per rank (the trainer's semantics)."""
    out = list(word)
    for _rank, a, b, _n in merges:
        new: list[str] = []
        for s in out:
            if new and new[-1] == a and s == b:
                new[-1] = a + b
            else:
                new.append(s)
        out = new
    return out


def test_encode_matches_pure_python(spark):
    from pyanamo_spark.functions.bpe import encode_bpe, train_bpe

    rows = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new"),
        (3, "wide wider widest lowest"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=6)
    assert merges, "fixture corpus must produce merges"
    got = {
        r.doc_id: (r.n_tokens, r.n_words, r.mean_token_len)
        for r in encode_bpe(docs, merges).collect()
    }
    want = {}
    for doc_id, text in rows:
        words = [w for w in text.split(" ") if w]
        toks = [t for w in words for t in _py_encode(w, merges)]
        want[doc_id] = (
            len(toks),
            len(words),
            round(sum(len(t) for t in toks) / len(toks), 4),
        )
    assert got == want


def test_encode_no_merges_is_char_count(spark):
    from pyanamo_spark.functions.bpe import encode_bpe

    docs = spark.createDataFrame(
        [(1, "ab cde")], "doc_id long, text string"
    )
    r = encode_bpe(docs, []).collect()[0]
    assert (r.n_tokens, r.n_words, r.mean_token_len) == (5, 2, 1.0)


def test_bpe_train_audit_rank1_exact_and_flags_green(spark, sf_dir):
    """The declared q_bpe_train audit: rank 1 carries the exact first
    merge (left, right, weighted count — what the oracle re-derives
    from raw adjacent-char counts), later ranks NULL their symbols but
    certify buildability; all flags green on the fixture."""
    from pyanamo_spark import semantics
    from pyanamo_spark.functions.bpe import N_MERGES, train_bpe
    from pyanamo_spark.registry import QUERIES

    semantics.ensure_views(spark, sf_dir)
    rows = {r.rank: r for r in QUERIES["q_bpe_train"](spark, sf_dir).collect()}
    merges = train_bpe(spark.table("documents"))
    assert len(rows) == len(merges) == N_MERGES
    assert all(r.ok == 1 for r in rows.values())
    r1, (rank1, a, b, n) = rows[1], merges[0]
    assert (r1.left, r1.right, r1.n_pairs) == (a, b, n)
    for rank in range(2, N_MERGES + 1):
        assert rows[rank].left is None and rows[rank].n_pairs is None
