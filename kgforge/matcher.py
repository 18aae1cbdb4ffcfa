"""Leftmost-longest dictionary matcher used inside Arrow-batched UDFs.

Semantics (shared contract with tests/oracle_ref.py, which reimplements them
independently): tokenize text on ``\\w+`` (word boundaries are therefore
inherent), lowercase, then scan left→right; at each token position match the
longest dictionary surface (in tokens) starting there; on a match, emit and
jump past it (non-overlapping). This mirrors the reference bot's dictionary
field-matching (SURVEY.md §2.A A2/A5) re-expressed for free text.

The matcher is built ONCE per executor task (from a Spark broadcast of the
surface list) and reused across Arrow batches — the per-batch cost is pure
matching, no automaton rebuild.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

_TOKEN_RE = re.compile(r"\w+")


class LexiconMatcher:
    """Word-level leftmost-longest matcher over a closed surface lexicon."""

    __slots__ = ("by_first",)

    def __init__(self, surfaces: Iterable[str]):
        by_first: dict[str, list[tuple[str, ...]]] = {}
        for s in surfaces:
            words = tuple(w.lower() for w in _TOKEN_RE.findall(s))
            if not words:
                continue
            by_first.setdefault(words[0], []).append(words)
        # longest candidate first => leftmost-LONGEST on first-match-wins scan
        for cands in by_first.values():
            cands.sort(key=lambda w: (-len(w), w))
        self.by_first = by_first

    def find(self, text: str) -> list[tuple[str, int, int]]:
        """Return [(surface, begin_char, end_char)] non-overlapping matches."""
        if not text:
            return []
        tokens = [
            (m.group(0).lower(), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)
        ]
        out: list[tuple[str, int, int]] = []
        i, n = 0, len(tokens)
        by_first = self.by_first
        while i < n:
            cands = by_first.get(tokens[i][0])
            if cands:
                matched = False
                for cand in cands:
                    k = len(cand)
                    if i + k <= n and all(
                        tokens[i + j][0] == cand[j] for j in range(k)
                    ):
                        out.append((" ".join(cand), tokens[i][1], tokens[i + k - 1][2]))
                        i += k
                        matched = True
                        break
                if matched:
                    continue
            i += 1
        return out
