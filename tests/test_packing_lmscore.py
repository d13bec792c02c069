import pytest

from pyspark.sql import functions as F

from racket_linkeddata_spark.operators.packing import (
    shuffle_shards, pack_offsets, packing_stats, pack_greedy)
from racket_linkeddata_spark.operators.lmscore import (
    token_counts, word_surprisal)


def _docs(spark, n=50):
    rows = [(i, (i * 7) % 23 + (i % 3 == 0)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_shuffle_shards_is_deterministic_permutation(spark):
    d = _docs(spark)
    a = sorted(shuffle_shards(d, 4).collect())
    b = sorted(shuffle_shards(d, 4).collect())
    assert a == b
    assert sorted(r["doc_id"] for r in a) == list(range(50))
    assert all(0 <= r["shard"] < 4 for r in a)
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shuffle_shards_validates():
    with pytest.raises(ValueError):
        shuffle_shards(None, 0)


def test_pack_offsets_contiguous_stream(spark):
    budget = 16
    rows = pack_offsets(_docs(spark), budget, 3).collect()
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["pos"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for seq in by_shard.values():
        off = 0
        for r in seq:
            assert r["start_off"] == off
            assert r["end_off"] == off + r["n_tokens"]
            assert r["first_seq"] == r["start_off"] // budget
            assert r["last_seq"] == max(r["end_off"] - 1,
                                        r["start_off"]) // budget
            off = r["end_off"]


def test_pack_offsets_zero_token_doc_single_seq(spark):
    d = spark.createDataFrame([(1, 0), (2, 5)], "doc_id long, n_tokens long")
    for r in pack_offsets(d, 4, 1).collect():
        if r["n_tokens"] == 0:
            assert r["first_seq"] == r["last_seq"]


def test_packing_stats_consistent_with_offsets(spark):
    budget, shards = 16, 3
    d = _docs(spark)
    packed = {r["shard"]: r for r in
              packing_stats(d, budget, shards).collect()}
    rows = pack_offsets(d, budget, shards).collect()
    for sh, st in packed.items():
        mine = [r for r in rows if r["shard"] == sh]
        tot = sum(r["n_tokens"] for r in mine)
        assert st["n_docs"] == len(mine)
        assert st["total_tokens"] == tot
        assert st["n_seqs"] == -(-tot // budget)
        assert st["tail_padding"] == st["n_seqs"] * budget - tot
        assert st["n_straddlers"] == sum(
            1 for r in mine if r["first_seq"] != r["last_seq"])


def _replay_greedy(rows, budget):
    """Independent python replay of the next-fit fold, per shard."""
    out = {}
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["pos"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for sh, seq_rows in by_shard.items():
        seq, fill = 0, 0
        for i, r in enumerate(seq_rows):
            if i > 0 and fill + r["n_tokens"] > budget:
                seq, fill = seq + 1, 0
            out[r["doc_id"]] = seq
            fill += r["n_tokens"]
    return out


def test_pack_greedy_matches_replay_and_respects_budget(spark):
    budget = 16
    rows = pack_greedy(_docs(spark), budget, 3).collect()
    expect = _replay_greedy(rows, budget)
    for r in rows:
        assert r["seq_id"] == expect[r["doc_id"]]
    fills = {}
    singleton = {}
    for r in rows:
        k = (r["shard"], r["seq_id"])
        fills[k] = fills.get(k, 0) + r["n_tokens"]
        singleton[k] = singleton.get(k, 0) + 1
    assert any(v > 1 for v in singleton.values())  # non-trivial packing
    for k, tot in fills.items():
        assert tot <= budget or singleton[k] == 1


def test_pack_greedy_zero_token_doc_never_shields_oversize(spark):
    """review r06c: a fill-based new-sequence guard let an over-budget
    doc share the sequence a zero-token doc opened. The position-based
    guard must keep the budget invariant for EVERY adjacent ordering,
    so plant zero-token docs between over-budget docs and check all
    (shard, seq) groups."""
    rows = [(i, 0 if i % 2 else 100) for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_greedy(d, 8, 2).collect()
    groups = {}
    for r in out:
        groups.setdefault((r["shard"], r["seq_id"]), []).append(
            r["n_tokens"])
    for toks in groups.values():
        assert sum(toks) <= 8 or len(toks) == 1
    expect = _replay_greedy(out, 8)
    for r in out:
        assert r["seq_id"] == expect[r["doc_id"]]


def test_packing_stats_zero_token_shard_one_sequence(spark):
    """review r06c: an all-zero-token shard occupies sequence 0 in
    pack_offsets, so stats must report n_seqs=1 (not 0), padding =
    budget."""
    d = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, n_tokens long")
    st = packing_stats(d, 10, 1).collect()[0]
    assert (st["n_seqs"], st["tail_padding"]) == (1, 10)
    offs = pack_offsets(d, 10, 1).collect()
    assert all(r["first_seq"] == r["last_seq"] == 0 for r in offs)


def test_pack_greedy_oversize_doc_own_sequence(spark):
    d = spark.createDataFrame(
        [(1, 3), (2, 100), (3, 3)], "doc_id long, n_tokens long")
    rows = {r["doc_id"]: r for r in pack_greedy(d, 8, 1).collect()}
    big = rows[2]
    assert sum(1 for r in rows.values()
               if r["seq_id"] == big["seq_id"]) == 1


def test_word_surprisal_hand_computed(spark):
    d = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, ""), (4, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in word_surprisal(d).collect()}
    # counts: a=3 b=1 c=1, total=5, intlog2(5)=2
    # bits: a -> 2-1=1, b -> 2-0=2, c -> 2
    assert (got[1]["n_tokens"], got[1]["sum_surprisal"],
            got[1]["avg_surprisal_x1000"]) == (3, 4, 1333)
    assert (got[2]["n_tokens"], got[2]["sum_surprisal"],
            got[2]["avg_surprisal_x1000"]) == (2, 3, 1500)
    for empty in (3, 4):
        assert (got[empty]["n_tokens"], got[empty]["sum_surprisal"],
                got[empty]["avg_surprisal_x1000"]) == (0, 0, 0)


def test_word_surprisal_ref_counts_oov_max_bits(spark):
    train = spark.createDataFrame(
        [(1, "the the the the cat")], "doc_id long, text string")
    counts = token_counts(train)  # the=4 cat=1 total=5
    d = spark.createDataFrame(
        [(9, "the zebra")], "doc_id long, text string")
    r = word_surprisal(d, ref_counts=counts).collect()[0]
    # intlog2(5)=2; the -> 2-2=0, zebra OOV -> count 1 -> 2 bits
    assert (r["n_tokens"], r["sum_surprisal"],
            r["avg_surprisal_x1000"]) == (2, 2, 1000)


def test_word_surprisal_empty_ref_counts_all_zero(spark):
    """review r06c: an empty ref_counts table must yield integer zeros
    (grand total pinned to 1 -> 0 bits), never NULL score columns."""
    empty = spark.createDataFrame([], "token string, n long")
    d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    r = word_surprisal(d, ref_counts=empty).collect()[0]
    assert (r["n_tokens"], r["sum_surprisal"],
            r["avg_surprisal_x1000"]) == (2, 0, 0)


def test_word_surprisal_case_and_whitespace_normalized(spark):
    d = spark.createDataFrame(
        [(1, "The  THE\tthe\n"), (2, "the")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in word_surprisal(d).collect()}
    assert got[1]["n_tokens"] == 3
    # all tokens are 'the': count 4, total 4, bits = 2-2 = 0
    assert got[1]["sum_surprisal"] == 0 and got[2]["sum_surprisal"] == 0


def _bigram_replica(texts):
    """Independent conditional-bits replica: bits = floor(log2 n_head)
    - floor(log2 n12), doc score = mean x1000 (integer div)."""
    from collections import Counter
    pairs_by_doc = {}
    all_pairs = Counter()
    for i, t in texts:
        toks = (t or "").lower().split()
        ps = list(zip(toks, toks[1:]))
        pairs_by_doc[i] = ps
        all_pairs.update(ps)
    heads = Counter()
    for (w1, _), n in all_pairs.items():
        heads[w1] += n
    out = {}
    for i, ps in pairs_by_doc.items():
        bits = [heads[w1].bit_length() - 1
                - (all_pairs[(w1, w2)].bit_length() - 1)
                for w1, w2 in ps]
        s = sum(bits)
        out[i] = (len(ps), s,
                  (1000 * s) // len(ps) if ps else 0)
    return out


def test_bigram_surprisal_matches_replica(spark):
    from racket_linkeddata_spark.operators.lmscore import (
        bigram_surprisal)

    texts = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),      # duplicate: common bigrams
        (3, "mat the on sat cat the"),      # same words, scrambled
        (4, "completely different words entirely"),
        (5, None),
        (6, "solo"),
    ]
    d = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.sum_surprisal,
                      r.avg_surprisal_x1000)
           for r in bigram_surprisal(d).collect()}
    assert got == _bigram_replica(texts)
    # the fluency property: scrambled doc 3 scores HIGHER than the
    # fluent duplicates 1/2 (same unigram bag, rare transitions)
    assert got[3][2] > got[1][2]
    # token-less docs keep a zero row
    assert got[5] == (0, 0, 0) and got[6] == (0, 0, 0)


def test_bigram_external_ref_counts(spark):
    """External model (the CCNet shape): score a corpus against
    counts trained elsewhere; OOV conventions — unseen continuation
    scores log2(n_head), unseen head scores 0."""
    from racket_linkeddata_spark.operators.lmscore import (
        bigram_counts, bigram_surprisal)

    train = spark.createDataFrame(
        [(1, "a b a b a b a b")], "doc_id long, text string")
    # model: (a,b) x4, (b,a) x3 -> heads: a=4, b=3
    ref = bigram_counts(train)
    score = spark.createDataFrame(
        [(1, "a b"),     # seen: log2(4) - log2(4) = 0
         (2, "a zzz"),   # seen head, unseen cont: log2(4) - 0 = 2
         (3, "zzz a")],  # unseen head: 0
        "doc_id long, text string")
    got = {r.doc_id: r.sum_surprisal
           for r in bigram_surprisal(score, ref_counts=ref).collect()}
    assert got == {1: 0, 2: 2, 3: 0}
