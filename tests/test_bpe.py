"""BPE tokenizer tests: the distributed trainer must learn EXACTLY the
merges of its pure-Python driver twin (same argmax tie-break), encoding
follows the standard lowest-rank-first rule, and the corpus encoder
conserves tokens. Algorithm is public knowledge (Sennrich et al. 2016 /
GPT-2 trainer)."""

import pytest

from memvid_spark.functions.bpe import (
    bpe_encode,
    bpe_train_local,
    encode_word,
    train_bpe,
    word_frequencies,
)
from tests.conftest import SF_DIR


def test_local_trainer_known_corpus():
    # classic textbook example: 'low'-family corpus
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_local(wf, k=4)
    # 'es' (9) wins round 0; then 'est' (9); then 'lo' (7); then 'low' (7)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_local_trainer_tie_break_deterministic():
    wf = {"ab": 3, "cd": 3}
    # both pairs count 3 → lexicographic smallest ('a','b') first
    assert bpe_train_local(wf, k=2) == [("a", "b"), ("c", "d")]


def test_local_trainer_min_freq_stops():
    assert bpe_train_local({"xy": 1}, k=5, min_pair_freq=2) == []


def test_encode_word_rank_order():
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("l", "o"): 2, ("lo", "w"): 3}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert encode_word("lowest", ranks) == ["low", "est"]
    assert encode_word("zzz", ranks) == ["z", "z", "z"]
    assert encode_word("a", ranks) == ["a"]


def test_distributed_equals_local_twin(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    wf = {
        r["word"]: r["freq"] for r in word_frequencies(docs).collect()
    }
    expect = bpe_train_local(wf, k=8)
    got = train_bpe(docs, k=8)
    assert got == expect
    assert len(got) == 8


def test_one_job_trainer_equals_per_round_trainer(spark):
    """The single-job trainer (collected word table + local merge loop)
    must produce the IDENTICAL merge sequence as the per-round
    distributed loop when the word cap doesn't bind."""
    from memvid_spark.functions.bpe import train_bpe_rounds

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    assert train_bpe(docs, k=6) == train_bpe_rounds(docs, k=6)


def test_bpe_encode_df_conserves_tokens(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    merges = train_bpe(docs, k=5)
    enc = bpe_encode(docs, merges)
    rows = enc.collect()
    assert len(rows) == 40
    for r in rows:
        # merging only ever reduces the symbol count, never below n_words
        assert r["n_words"] <= r["n_tokens"]
        assert len(r["tokens"]) == r["n_tokens"]
        # re-joining the subwords reconstructs the original words
        joined = "".join(r["tokens"])
        assert len(joined) >= r["n_words"]  # no characters lost


def test_bpe_encode_reconstructs_exact_words(spark):
    docs = spark.createDataFrame(
        [(1, "the thesis they then"), (2, "other leather")],
        "doc_id long, text string",
    )
    merges = [("t", "h"), ("th", "e")]
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    assert out[1]["tokens"][:2] == ["the", "the"]  # 'the', 'the(sis)'
    # every word reassembles exactly
    assert "".join(out[2]["tokens"]) == "otherleather"
