"""From-scratch Aho-Corasick multi-pattern string matching.

Classic goto/fail/output automaton (Aho & Corasick, CACM 1975 — public
algorithm). Built once per actor (the stateful actor-pool pattern:
construction is O(total pattern length), matching is O(text length +
matches)), then ``count_matches`` streams a text through the automaton
and returns per-pattern occurrence counts, counting EVERY occurrence —
overlapping and nested patterns included (each node's output set is the
union of its own pattern and its fail-chain's outputs, collapsed at
build time so matching never walks fail chains for output)."""

from __future__ import annotations

from collections import deque

import numpy as np


class AhoCorasick:
    def __init__(self, patterns: list[str]):
        self.patterns = list(patterns)
        # node 0 is the root; goto maps (node, char) -> node
        self._goto: list[dict[str, int]] = [{}]
        self._out: list[list[int]] = [[]]
        self._fail: list[int] = [0]
        for idx, p in enumerate(self.patterns):
            node = 0
            for ch in p:
                nxt = self._goto[node].get(ch)
                if nxt is None:
                    self._goto.append({})
                    self._out.append([])
                    self._fail.append(0)
                    nxt = len(self._goto) - 1
                    self._goto[node][ch] = nxt
                node = nxt
            self._out[node].append(idx)
        # BFS fail links; collapse output sets along fail chains
        q = deque()
        for child in self._goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self._goto[node].items():
                f = self._fail[node]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                self._fail[child] = self._goto[f].get(ch, 0)
                self._out[child] = self._out[child] + self._out[self._fail[child]]
                q.append(child)

    def count_matches(self, text: str) -> np.ndarray:
        """Occurrences of each pattern in ``text`` (overlaps counted)."""
        counts = np.zeros(len(self.patterns), dtype=np.int64)
        node = 0
        goto, fail, out = self._goto, self._fail, self._out
        for ch in text:
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            for idx in out[node]:
                counts[idx] += 1
        return counts
