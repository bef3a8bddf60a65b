"""Property test for the BPE learner: on ANY random word-frequency
dictionary, operators/bpe.py learn_merges must equal a brute-force
reference that re-derives each round from first principles (count all
adjacent pairs with multiplicity × freq, argmax with count-desc /
pair-asc tie-break, left-to-right non-overlapping replacement). Tiny
alphabets force same-symbol runs (the aa|aa parity case) and heavy
tie-breaking."""

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_manager_spark.operators.bpe import learn_merges


def _reference(vocab, num_merges):
    words = {w: list(w) for w, _ in vocab}
    freqs = dict(vocab)
    merges = []
    for rank in range(1, num_merges + 1):
        counts = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + freqs[w]
        if not counts:
            break
        # total order: count desc, then pair asc (bytewise on ASCII)
        (lft, rgt), cnt = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        merges.append((rank, lft, rgt, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
                    out.append(lft + rgt)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


words_strategy = st.lists(
    st.tuples(
        st.text(alphabet="ab", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(max_examples=200, deadline=None)
@given(vocab=words_strategy, k=st.integers(min_value=1, max_value=6))
def test_learn_merges_matches_bruteforce(vocab, k):
    got_merges, got_words = learn_merges(vocab, num_merges=k)
    exp_merges, exp_words = _reference(vocab, k)
    assert got_merges == exp_merges
    assert got_words == exp_words


def test_ascii_tiebreak_is_bytewise():
    # two pairs with equal counts: ('a','b') must beat ('b','a') and
    # ('a','c') — count desc, then left asc, then right asc
    merges, _ = learn_merges([("ba", 1), ("ab", 1), ("ac", 1)], num_merges=1)
    assert merges[0][1:3] == ("a", "b")
