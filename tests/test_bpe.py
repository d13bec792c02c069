"""Real BPE (operators/bpe.py): encoder vs an INDEPENDENT naive
reference, trainer determinism/correctness, and the distributed count
op vs local encoding."""

from pyspark.sql import functions as F

from racket_linkeddata_spark.operators.bpe import (
    PRETOKEN_RE,
    bpe_encode,
    bpe_encode_word,
    bpe_token_count,
    train_bpe,
)


# --- independent reference: apply merges ONE RANK AT A TIME ------------
# (different algorithm from the op's lowest-ranked-pair loop: walking
# the merge list in order and rewriting the symbol list per merge is
# equivalent for valid BPE merge lists, where every later merge's
# symbols exist only via earlier merges)

def ref_encode_word(word, merges):
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def ref_count(text, merges):
    return sum(len(ref_encode_word(w, merges))
               for w in PRETOKEN_RE.findall(text))


FIXTURES = [
    "the theme of the thesis is the breath of the earth",
    "ththe tthe tth th t h e the",
    "hello world 12345, this is a test-case!",
    "He gathered the feathers; then the weather thawed.",
    "",
    "    ",
    "?!?!",
    "aaaa bbbb abab",
]

MINI = [("t", "h"), ("th", "e")]


def test_encoder_matches_independent_reference_mini():
    for text in FIXTURES:
        got = [t for w in PRETOKEN_RE.findall(text)
               for t in bpe_encode_word(w, {("t", "h"): 0, ("th", "e"): 1})]
        want = [t for w in PRETOKEN_RE.findall(text)
                for t in ref_encode_word(w, MINI)]
        assert got == want, text


def test_encoder_matches_reference_on_trained_vocab():
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "she sells sea shells by the sea shore",
        "peter piper picked a peck of pickled peppers",
        "how much wood would a woodchuck chuck",
    ] * 3
    merges = train_bpe(corpus, n_merges=40)
    assert len(merges) == 40
    for text in corpus + FIXTURES:
        assert bpe_encode(text, merges) == [
            t for w in PRETOKEN_RE.findall(text)
            for t in ref_encode_word(w, merges)], text


def test_encode_roundtrip_concatenation():
    merges = train_bpe(["banana bandana ananas"], 10)
    for text in ("banana", "bandanas", "nab an ana"):
        toks = bpe_encode(text, merges)
        assert "".join(toks) == text.replace(" ", "")


def test_trainer_deterministic_and_greedy():
    corpus = ["aaab aaab aab", "abab baba"]
    m1, m2 = train_bpe(corpus, 5), train_bpe(corpus, 5)
    assert m1 == m2
    # most frequent first pair: ab = 2x1(aaab) + 1(aab) + 2(abab)
    # + 1(baba) = 6 beats aa = 2x2 + 1 = 5
    assert m1[0] == ("a", "b")
    # trainer exhausts: asking for more merges than pairs exist stops
    assert len(train_bpe(["ab"], 100)) < 100


def test_mini_vocab_count_equals_replace_arithmetic():
    """The driver oracle's closed form: with merges [(t,h),(th,e)],
    n_tokens = nonspace_chars - count('th') - count('the')."""
    for text in FIXTURES + ["the theatre that thou threw"]:
        nonspace = len(text) - text.count(" ")
        want = nonspace - text.count("th") - text.count("the")
        assert ref_count(text, MINI) == want, text
        got = sum(len(bpe_encode_word(w, {MINI[0]: 0, MINI[1]: 1}))
                  for w in PRETOKEN_RE.findall(text))
        assert got == want, text


def test_distributed_count_matches_local(spark):
    corpus = ["the weather was thick with feathers " * 3,
              "numbers 123 and punctuation!!! they help",
              None, ""]
    merges = train_bpe([t for t in corpus if t], 20)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    got = {r.doc_id: r.n_tokens
           for r in bpe_token_count(df, merges).collect()}
    for i, t in enumerate(corpus):
        want = 0 if t is None else len(bpe_encode(t, merges))
        assert got[i] == want, (i, t)


def test_count_over_documents_table(spark):
    """Real table: BPE count <= pretoken count (merges only shrink),
    and equals it when the merge list is empty."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(50)
    merges = [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d")]
    bpe = {r.doc_id: r.n_tokens
           for r in bpe_token_count(docs, merges).collect()}
    pre = {r.doc_id: r.n_tokens
           for r in bpe_token_count(docs, []).collect()}
    naive = {r.doc_id: len(PRETOKEN_RE.findall(r.text)) and sum(
        len(w) for w in PRETOKEN_RE.findall(r.text))
        for r in docs.select("doc_id", "text").collect()}
    for k in pre:
        assert pre[k] == naive[k]
        assert bpe[k] <= pre[k]
