import numpy as np
import pandas as pd
import pytest

from tetrex_spark.kernel.hashing import (
    bloom_positions,
    hash_char_kgrams,
    hash_char_kgrams_series,
    hash_str,
    hash_str_series,
    splitmix64,
)


def test_splitmix_deterministic_and_spread():
    x = np.arange(10_000, dtype=np.uint64)
    h = splitmix64(x)
    assert h.dtype == np.uint64
    assert len(np.unique(h)) == 10_000
    assert np.array_equal(h, splitmix64(x))


def test_hash_str_series_matches_single():
    words = ["spark", "join", "", "a", "filter window", "zyzzyva", "spark"]
    hs = hash_str_series(words)
    assert hs[0] == hs[6]
    for i, w in enumerate(words):
        assert int(hs[i]) == hash_str(w)
    # distinct strings hash differently
    assert len(set(int(h) for h in hs)) == 6


def test_hash_str_series_handles_nulls_and_slices():
    s = pd.Series(["abc", None, "def", "abc"])
    hs = hash_str_series(s)
    assert hs[1] == hash_str("")
    assert hs[0] == hs[3]
    # a sliced/offset series hashes identically (arrow offset handling)
    hs2 = hash_str_series(s.iloc[2:])
    assert hs2[0] == hs[2]


def test_seed_changes_hash():
    assert hash_str("spark", seed=1) != hash_str("spark", seed=2)


def test_char_kgrams_match_standalone_hash():
    text = "the quick brown fox"
    k = 3
    grams = [text[i : i + k] for i in range(len(text) - k + 1)]
    hs = hash_char_kgrams(text, k)
    assert len(hs) == len(grams)
    for h, g in zip(hs, grams):
        assert int(h) == hash_str(g)


def test_char_kgrams_short_text():
    assert hash_char_kgrams("ab", 3).size == 0


def test_char_kgrams_series_matches_per_doc():
    docs = pd.Series(["abcdef", "xy", "", "hello world"])
    k = 3
    hs, counts = hash_char_kgrams_series(docs, k)
    expected_counts = [4, 0, 0, 9]
    assert list(counts) == expected_counts
    off = 0
    for d, c in zip(docs, expected_counts):
        single = hash_char_kgrams(d, k)
        assert np.array_equal(hs[off : off + c], single)
        off += c


def test_bloom_positions_shape_and_range():
    pos = bloom_positions(np.arange(100, dtype=np.uint64), 1024, 3)
    assert pos.shape == (100, 3)
    assert pos.min() >= 0 and pos.max() < 1024


@pytest.mark.parametrize("k", [2, 3, 5])
def test_kgram_hash_equals_series_hash_of_grams(k):
    text = "spark filter join window merge"
    grams = [text[i : i + k] for i in range(len(text) - k + 1)]
    assert np.array_equal(hash_char_kgrams(text, k), hash_str_series(grams))
