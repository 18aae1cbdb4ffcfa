"""Pure-Python, single-threaded reference semantics for the KG pipeline
(SURVEY.md §5.2-2) — the stand-in for the reference bot's emitted triples.

Implements the shared semantic contract INDEPENDENTLY of kgforge (no imports
from the package): iterate conversations in (conv_id, turn_idx) order →
leftmost-longest dictionary matching → highest-prior-then-lexicographic
entity resolution → union-find canonicalization → first-emission dedup.
Its output on the deterministic synthetic corpus is the golden triple set;
pytest computes P/R of the Spark pipeline against it (gate ≥ 0.95,
engineered for 1.0 — both sides are deterministic).
"""

from __future__ import annotations

import re
from collections import defaultdict

_TOKEN_RE = re.compile(r"\w+")


# ---------------------------------------------------------------- mentions
def find_mentions(text: str, surface_words: dict[str, list[tuple[str, ...]]]):
    """Leftmost-longest non-overlapping scan; returns [(surface, begin, end)].

    surface_words: first-token → list of word-tuples sorted longest-first.
    """
    toks = [(m.group(0).lower(), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]
    out = []
    i = 0
    while i < len(toks):
        cands = surface_words.get(toks[i][0], ())
        advanced = False
        for cand in cands:
            k = len(cand)
            if i + k <= len(toks) and all(toks[i + j][0] == cand[j] for j in range(k)):
                out.append((" ".join(cand), toks[i][1], toks[i + k - 1][2]))
                i += k
                advanced = True
                break
        if not advanced:
            i += 1
    return out


def index_surfaces(surfaces) -> dict[str, list[tuple[str, ...]]]:
    by_first: dict[str, list[tuple[str, ...]]] = defaultdict(list)
    for s in surfaces:
        words = tuple(w.lower() for w in _TOKEN_RE.findall(s))
        if words:
            by_first[words[0]].append(words)
    for v in by_first.values():
        v.sort(key=lambda w: (-len(w), w))
    return dict(by_first)


# ---------------------------------------------------------------- union-find
class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        # Iterative (recursion-limit-safe on long parent chains).
        root = self.parent.setdefault(x, x)
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def canonical_map(entity_ids, edges) -> dict[str, str]:
    """entity → min entity id of its same-as component (isolated → self)."""
    uf = UnionFind()
    for src, dst, *_ in edges:
        uf.union(src, dst)
    comp_min: dict[str, str] = {}
    members = set(entity_ids) | set(uf.parent)
    for e in members:
        r = uf.find(e)
        if r not in comp_min or e < comp_min[r]:
            comp_min[r] = e
    return {e: comp_min[uf.find(e)] for e in members}


# ---------------------------------------------------------------- pipeline
def run_reference(transcripts, dictionary, xref_edges):
    """Full reference pipeline.

    transcripts: rows (conv_id, turn_idx, role, text, tool, ts)
    dictionary:  rows (surface, entity_id, curie, prior)
    xref_edges:  rows (src, dst, source)

    Returns dict with 'mentions', 'linked', 'canon', 'triples' — triples are
    deduped rows (subj, pred, obj, conv_id, turn_idx, confidence).
    """
    by_surface: dict[str, list[tuple]] = defaultdict(list)
    for surface, eid, curie, prior in dictionary:
        by_surface[surface].append((eid, curie, prior))
    sw = index_surfaces(by_surface.keys())

    # stable (conv_id, turn_idx) order — the contract invariant
    turns = sorted(transcripts, key=lambda r: (r[0], r[1]))

    mentions = []  # (conv_id, turn_idx, m_idx, surface, begin, end)
    linked = []  # (conv_id, turn_idx, m_idx, surface, entity_id, curie, prior)
    for conv_id, turn_idx, _role, text, _tool, _ts in turns:
        for m_idx, (surface, begin, end) in enumerate(find_mentions(text or "", sw)):
            mentions.append((conv_id, turn_idx, m_idx, surface, begin, end))
            cands = by_surface.get(surface)
            if not cands:
                continue
            # highest prior, then lexicographic entity id — first-win
            eid, curie, prior = min(cands, key=lambda c: (-c[2], c[0]))
            linked.append((conv_id, turn_idx, m_idx, surface, eid, curie, prior))

    canon = canonical_map([r[1] for r in dictionary], xref_edges)

    raw = []  # (subj, pred, obj, conv_id, turn_idx, m_idx, confidence)
    by_turn: dict[tuple, list[tuple]] = defaultdict(list)
    for conv_id, turn_idx, m_idx, _s, eid, curie, prior in linked:
        raw.append((eid, "resolved_as", curie, conv_id, turn_idx, m_idx, prior))
        by_turn[(conv_id, turn_idx)].append((m_idx, eid, prior))

    for (conv_id, turn_idx), ms in by_turn.items():
        ms.sort()
        for (m_idx, eid, prior), (_m2, eid2, _p2) in zip(ms, ms[1:]):
            raw.append((eid, "co_occurs", eid2, conv_id, turn_idx, m_idx, prior))

    firsts_by_conv: dict[str, list[tuple]] = defaultdict(list)
    for (conv_id, turn_idx), ms in by_turn.items():
        m_idx, eid, prior = min(ms)
        firsts_by_conv[conv_id].append((turn_idx, m_idx, eid, prior))
    for conv_id, fs in firsts_by_conv.items():
        fs.sort()
        for (turn_idx, m_idx, eid, prior), (_t2, _i2, eid2, _p2) in zip(fs, fs[1:]):
            raw.append((eid, "mentions_with", eid2, conv_id, turn_idx, m_idx, prior))

    # canonical remap (curie objs pass through — not in the canonical map)
    remapped = [
        (
            canon.get(s, s),
            p,
            canon.get(o, o),
            conv_id,
            turn_idx,
            m_idx,
            conf,
        )
        for s, p, o, conv_id, turn_idx, m_idx, conf in raw
    ]

    # first-emission dedup per (subj, pred, obj) in (conv, turn, m_idx) order
    best: dict[tuple, tuple] = {}
    for s, p, o, conv_id, turn_idx, m_idx, conf in remapped:
        key = (s, p, o)
        prov = (conv_id, turn_idx, m_idx, conf)
        if key not in best or prov[:3] < best[key][:3]:
            best[key] = prov
    triples = [
        (s, p, o, conv_id, turn_idx, conf)
        for (s, p, o), (conv_id, turn_idx, _m, conf) in best.items()
    ]
    return {
        "mentions": mentions,
        "linked": linked,
        "canon": canon,
        "triples": triples,
    }
