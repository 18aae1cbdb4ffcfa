"""Unit tests for the leftmost-longest lexicon matcher (kgforge.matcher)."""

from __future__ import annotations

from kgforge.matcher import LexiconMatcher


def test_single_word():
    m = LexiconMatcher(["aspirin"])
    assert m.find("take aspirin daily") == [("aspirin", 5, 12)]


def test_leftmost_longest_prefers_longer():
    m = LexiconMatcher(["alpha", "alpha beta", "alpha beta gamma"])
    out = m.find("alpha beta gamma delta")
    assert out == [("alpha beta gamma", 0, 16)]


def test_non_overlapping_jump():
    m = LexiconMatcher(["a b", "b c"])
    # after matching "a b", scanning resumes at "c" — "b c" must NOT match
    assert m.find("a b c") == [("a b", 0, 3)]


def test_case_insensitive_and_punctuation():
    m = LexiconMatcher(["Aspirin"])
    out = m.find("ASPIRIN, then more aspirin.")
    assert [(s, b) for s, b, _ in out] == [("aspirin", 0), ("aspirin", 19)]


def test_longer_candidate_falls_back_to_shorter():
    m = LexiconMatcher(["x y z", "x"])
    assert [s for s, *_ in m.find("x y q")] == ["x"]


def test_empty_and_no_match():
    m = LexiconMatcher(["foo"])
    assert m.find("") == []
    assert m.find("bar baz") == []


def test_offsets_are_char_offsets():
    m = LexiconMatcher(["beta"])
    text = "  beta  "
    [(s, b, e)] = m.find(text)
    assert text[b:e] == "beta"


# --- two-tier layout equivalence vs the naive oracle (tests/oracle_ref.py) ---
# The matcher splits single-word surfaces into a set and probes the
# multi-word index only on first-token hits; these properties pin that
# refactor to the flat longest-first scan the oracle keeps.

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.oracle_ref import find_mentions, index_surfaces

_word = st.text(alphabet="abcde", min_size=1, max_size=3)
_surface = st.lists(_word, min_size=1, max_size=3).map(" ".join)


@settings(max_examples=300, deadline=None)
@given(
    surfaces=st.lists(_surface, min_size=0, max_size=12),
    text_words=st.lists(_word, min_size=0, max_size=20),
)
def test_matcher_matches_naive_oracle(surfaces, text_words):
    text = " ".join(text_words)
    got = LexiconMatcher(surfaces).find(text)
    want = find_mentions(text, index_surfaces(surfaces))
    assert got == want


def test_pure_single_token_fast_path_equivalence():
    surfaces = ["aspirin", "ibuprofen", "statin"]
    m = LexiconMatcher(surfaces)
    assert not m.multi_first  # exercises the finditer fast path
    text = "Aspirin then ibuprofen; no statin today, aspirin again."
    assert m.find(text) == find_mentions(text, index_surfaces(surfaces))


def test_lexicon_cache_is_size_one_lru(spark):
    """A second distinct dictionary must evict (and unpersist) the first —
    the round-2 id()-keyed cache grew without bound and pinned every
    dictionary DataFrame + broadcast for the life of the process."""
    from kgforge import extract

    schema = "surface string, entity_id string, curie string, prior double"
    d1 = spark.createDataFrame([("alpha", "e1", "c:1", 0.5)], schema)
    d2 = spark.createDataFrame([("beta", "e2", "c:2", 0.5)], schema)
    b1 = extract._lexicon_broadcast(d1)
    assert extract._lexicon_broadcast(d1) is b1  # consecutive hit, no rebuild
    b2 = extract._lexicon_broadcast(d2)
    assert b2 is not b1
    assert len(extract._LEXICON_CACHE) == 1
    assert extract._LEXICON_CACHE[0][0] is d2
