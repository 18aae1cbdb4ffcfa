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
