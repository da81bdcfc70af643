"""Synonym expansion from a local word2vec-format vector file (O20).

The reference loads a 750 MB gensim GloVe model over the network at import
time (ws_pagerank.py:15-17) and calls ``vector.most_similar(term, topn=5)``
for query expansion (ws_pagerank.py:216-225, :255-263). This module closes
that gap WITHOUT network or gensim: it reads BOTH standard word2vec
formats — text (first line ``<count> <dim>``, then ``word v1 .. vdim`` per
line; what ``gensim.models.KeyedVectors.save_word2vec_format(binary=False)``
writes) and the original C binary format (``binary=True`` / what
``gensim.downloader`` ships), auto-detected by ``WordVectors.load`` — and
reproduces gensim's ``most_similar`` semantics:

  * vectors are L2-normalized once at load
  * similarity = cosine
  * the query term itself is excluded from its own neighbor list
  * top-n by similarity, ties broken by vocabulary order (numpy argsort
    stability on the negated similarity)

Deviation from the reference, by design: an out-of-vocabulary query term
yields NO expansion (empty list) instead of gensim's KeyError crash.

The model is a driver-side object (exactly like the reference's); only the
resulting ``{term: [(word, sim), ...]}`` table — a handful of rows — enters
the Spark plan (plans/pipeline.py feeds it to the JVM-side re-scoring
expression), so executors never see the vector file.
"""

from __future__ import annotations

import gzip

import numpy as np


class WordVectors:
    """Minimal KeyedVectors stand-in over word2vec text format."""

    def __init__(self, words: list[str], matrix: np.ndarray):
        norms = np.linalg.norm(matrix, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        self._unit = matrix / norms
        self._words = words
        self._index = {w: i for i, w in enumerate(words)}

    @classmethod
    def load_word2vec_text(cls, path: str) -> "WordVectors":
        """Read word2vec text format (optionally gzipped). The header line
        is validated but the declared count is not trusted (files are often
        hand-truncated fixtures)."""
        opener = gzip.open if path.endswith(".gz") else open
        words: list[str] = []
        rows: list[np.ndarray] = []
        with opener(path, "rt", encoding="utf-8", errors="replace") as f:
            header = f.readline().split()
            if len(header) != 2:
                raise ValueError(
                    f"{path}: expected word2vec text header '<count> <dim>', "
                    f"got {header!r}"
                )
            dim = int(header[1])
            for line in f:
                parts = line.rstrip("\n").split(" ")
                if len(parts) != dim + 1:
                    raise ValueError(
                        f"{path}: bad row for {parts[0]!r}: "
                        f"{len(parts) - 1} dims, expected {dim}"
                    )
                words.append(parts[0])
                rows.append(np.asarray(parts[1:], dtype=np.float64))
        if not rows:
            raise ValueError(f"{path}: no vectors")
        return cls(words, np.vstack(rows))

    @classmethod
    def load_word2vec_binary(cls, path: str) -> "WordVectors":
        """Read the original word2vec C binary format (what
        ``gensim.models.KeyedVectors.save_word2vec_format(binary=True)``
        writes and ``gensim.downloader`` ships): an ASCII header line
        ``<count> <dim>\\n``, then per entry the word's bytes terminated by
        a single space followed by ``dim`` little-endian float32 values;
        entries may be separated by ``\\n`` (the C tool writes one, gensim
        does not) — leading newlines before a word are skipped, matching
        gensim's reader. Optionally gzipped."""
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as f:
            header = f.readline().split()
            if len(header) != 2:
                raise ValueError(
                    f"{path}: expected word2vec binary header "
                    f"'<count> <dim>', got {header!r}"
                )
            count, dim = int(header[0]), int(header[1])
            row_bytes = 4 * dim
            words: list[str] = []
            rows: list[np.ndarray] = []
            for _ in range(count):
                wchars = bytearray()
                while True:
                    ch = f.read(1)
                    if ch == b"":
                        if wchars:
                            raise ValueError(
                                f"{path}: truncated word at entry {len(words)}"
                            )
                        break
                    if ch == b" ":
                        break
                    if ch == b"\n" and not wchars:
                        continue  # inter-entry newline
                    wchars.extend(ch)
                if not wchars:
                    break
                buf = f.read(row_bytes)
                if len(buf) != row_bytes:
                    raise ValueError(
                        f"{path}: truncated vector for "
                        f"{wchars.decode('utf-8', 'replace')!r}"
                    )
                words.append(wchars.decode("utf-8", "replace"))
                rows.append(
                    np.frombuffer(buf, dtype="<f4").astype(np.float64)
                )
        if not rows:
            raise ValueError(f"{path}: no vectors")
        return cls(words, np.vstack(rows))

    @classmethod
    def load(cls, path: str) -> "WordVectors":
        """Auto-detect text vs binary word2vec format: both start with the
        same ASCII ``<count> <dim>`` header, so try the (strictly
        validated) text reader first and fall back to binary — a binary
        body read as text cannot produce ``dim + 1`` space-separated
        fields per line, so misdetection fails loudly, never silently."""
        try:
            return cls.load_word2vec_text(path)
        except (ValueError, UnicodeDecodeError):
            return cls.load_word2vec_binary(path)

    def __contains__(self, word: str) -> bool:
        return word in self._index

    def most_similar(self, term: str, topn: int = 5) -> list[tuple[str, float]]:
        """gensim-shaped [(word, cosine_sim)] excluding the term itself;
        [] for out-of-vocabulary terms."""
        i = self._index.get(term)
        if i is None:
            return []
        sims = self._unit @ self._unit[i]
        order = np.argsort(-sims, kind="stable")
        # exclude self, like gensim (and never let it pad a short vocab)
        return [
            (self._words[j], float(sims[j])) for j in order if j != i
        ][:topn]


def synonyms_for_query(
    vectors: WordVectors, positive_terms: list[str], topn: int = 5
) -> dict[str, list[tuple[str, float]]]:
    """term -> most_similar(term, topn) for each positive query term — the
    exact table shape plans/pipeline.search consumes (ws_pagerank.py:216-225)."""
    return {t: vectors.most_similar(t, topn) for t in positive_terms}
