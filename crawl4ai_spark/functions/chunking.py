"""Chunking strategies — the reference's text-chunking family as pure
JVM Column expressions (reference: chunking_strategy.py).

The reference defines ``ChunkingStrategy.chunk(text) -> list[str]``
(chunking_strategy.py:8-25) with five deterministic implementations
(the NLTK-backed sentence/topic chunkers need models this container
doesn't ship and are out of scope):

- IdentityChunking        (chunking_strategy.py:28-34)
- RegexChunking           (chunking_strategy.py:38-63)
- FixedLengthWordChunking (chunking_strategy.py:146-171)
- SlidingWindowChunking   (chunking_strategy.py:174-211)
- OverlappingWindowChunking (chunking_strategy.py:214-255)

Every strategy here is a single ``array<string>`` Column built from
``split`` / ``filter`` / ``sequence`` / ``transform`` / ``slice`` /
``array_join`` — higher-order functions that run inside codegen with no
Python boundary, so chunking a 100 TB documents table costs one
narrow JVM projection (contrast the reference: per-row Python loops).

Word splitting follows Python ``str.split()`` semantics (split on any
whitespace run, drop empties — chunking_strategy.py:165,196,237):
``F.split(text, r"(?U)\\s+")`` then filtering ``""`` reproduces it,
including leading-whitespace rows and Unicode whitespace (see
``words_of``).

Reference edge semantics replicated bit-for-bit (pinned by
tests/test_chunking.py against independent Python mirrors):

- ``FixedLengthWordChunking.chunk("")`` returns ``[]`` (empty word
  list ⇒ empty range), while the window chunkers return ``[text]``
  unchanged whenever ``len(words) <= window`` — the ORIGINAL string,
  not a re-join (chunking_strategy.py:186-187,240-241).
- ``SlidingWindowChunking`` appends a tail chunk of the LAST
  ``window`` words only when ``i + window < len(words)`` where ``i``
  is the final main-loop index — the loop variable leaks out of the
  ``for`` (chunking_strategy.py:199-207): ``i_last = (n-w) - (n-w) % step``.
- ``OverlappingWindowChunking`` advances by ``window - overlap`` and
  emits the final short chunk before breaking
  (chunking_strategy.py:243-253); ``overlap >= window`` would loop
  forever in the reference and is rejected here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def words_of(text: Column) -> Column:
    """Python ``str.split()`` as a Column: whitespace runs, no empties.

    ``(?U)`` switches Java's ``\\s`` from ASCII-only to the Unicode
    White_Space property, matching ``str.split()`` on real web text
    (NBSP, line/paragraph separators, NEL).  White_Space excludes the
    four C0 separators U+001C–U+001F (FS/GS/RS/US) that Python's
    ``str.isspace()`` DOES treat as whitespace, so they are added
    explicitly — without them such text would chunk differently than
    the reference.  The DuckDB oracle's RE2 ``\\s`` stays ASCII — fine
    for the pure-ASCII test corpus, noted here because a Unicode
    corpus would need the oracle widened too."""
    return F.filter(
        F.split(text, "(?U)[\\s\\x1c-\\x1f]+"), lambda w: w != F.lit("")
    )


class ChunkingStrategy:
    """Base contract (chunking_strategy.py:8-25): ``column(text)``
    returns the chunks as an ``array<string>`` Column."""

    def column(self, text: Column | str) -> Column:  # pragma: no cover
        raise NotImplementedError


@dataclass
class IdentityChunking(ChunkingStrategy):
    """The whole text as one chunk (chunking_strategy.py:28-34)."""

    def column(self, text: Column | str) -> Column:
        c = text if isinstance(text, Column) else F.col(text)
        return F.array(c)


@dataclass
class RegexChunking(ChunkingStrategy):
    """Split by each pattern in turn, flattening between passes
    (chunking_strategy.py:38-63).  Empty fragments are kept, as
    ``re.split`` keeps them.

    Patterns with CAPTURING groups are rejected: ``re.split`` emits
    captured separators into the result list, Java's split drops them
    — silent divergence.  Use non-capturing ``(?:...)`` groups."""

    patterns: list[str] = field(default_factory=lambda: [r"\n\n"])

    def __post_init__(self):
        import re as _re

        for p in self.patterns:
            if _re.compile(p).groups > 0:
                raise ValueError(
                    f"pattern {p!r} has capturing groups: re.split would "
                    "emit the separators, Spark split drops them — use "
                    "(?:...) instead"
                )

    def column(self, text: Column | str) -> Column:
        # one-arg lambda per pattern via a factory: a default-arg
        # binding (lambda s, p=p) would make the lambda two-parameter,
        # which F.transform calls as (element, index) — the pattern
        # would silently become the element index
        def splitter(pat: str):
            return lambda s: F.split(s, pat)

        arr = IdentityChunking().column(text)
        for p in self.patterns:
            arr = F.flatten(F.transform(arr, splitter(p)))
        return arr


@dataclass
class FixedLengthWordChunking(ChunkingStrategy):
    """Non-overlapping ``chunk_size``-word chunks
    (chunking_strategy.py:146-171); empty text ⇒ no chunks."""

    chunk_size: int = 100

    def column(self, text: Column | str) -> Column:
        c = text if isinstance(text, Column) else F.col(text)
        w = words_of(c)
        n = F.size(w)
        size = F.lit(self.chunk_size)
        starts = F.sequence(F.lit(0), n - 1, size)
        chunks = F.transform(
            starts, lambda i: F.array_join(F.slice(w, i + 1, size), " ")
        )
        return F.when(n > 0, chunks).otherwise(
            F.array().cast("array<string>")
        )


@dataclass
class SlidingWindowChunking(ChunkingStrategy):
    """``window_size``-word windows every ``step`` words
    (chunking_strategy.py:174-211), plus the reference's leaked-index
    tail rule: one extra chunk of the last ``window_size`` words iff
    ``i_last + window_size < n``."""

    window_size: int = 100
    step: int = 50

    def column(self, text: Column | str) -> Column:
        c = text if isinstance(text, Column) else F.col(text)
        w = words_of(c)
        n = F.size(w)
        win, step = F.lit(self.window_size), F.lit(self.step)
        main_starts = F.sequence(F.lit(0), n - win, step)
        main = F.transform(
            main_starts, lambda i: F.array_join(F.slice(w, i + 1, win), " ")
        )
        i_last = (n - win) - F.pmod(n - win, step)
        tail = F.array(F.array_join(F.slice(w, n - win + 1, win), " "))
        return F.when(n <= win, F.array(c)).otherwise(
            F.when(i_last + win < n, F.concat(main, tail)).otherwise(main)
        )


@dataclass
class OverlappingWindowChunking(ChunkingStrategy):
    """``window_size``-word chunks sliding by ``window_size - overlap``
    (chunking_strategy.py:214-255); the final chunk may be short."""

    window_size: int = 1000
    overlap: int = 100

    def __post_init__(self):
        if self.overlap >= self.window_size:
            raise ValueError(
                "overlap must be < window_size (the reference loops "
                "forever on this configuration)"
            )

    def column(self, text: Column | str) -> Column:
        c = text if isinstance(text, Column) else F.col(text)
        w = words_of(c)
        n = F.size(w)
        win = F.lit(self.window_size)
        stride = F.lit(self.window_size - self.overlap)
        kmax = F.ceil((n - win).cast("double") / stride).cast("int")
        chunks = F.transform(
            F.sequence(F.lit(0), kmax),
            lambda k: F.array_join(F.slice(w, k * stride + 1, win), " "),
        )
        return F.when(n <= win, F.array(c)).otherwise(chunks)


def chunk_table(
    docs: DataFrame,
    strategy: ChunkingStrategy,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents → one row per chunk: ``(id, chunk_id, chunk)``.

    The explode happens AFTER the narrow chunk projection, so at scale
    the only cost beyond the scan is the row fan-out — no shuffle, no
    Python.  Chunk ids are 0-based positions (deterministic)."""
    return docs.select(
        F.col(id_col),
        F.posexplode(strategy.column(text_col)).alias("chunk_id", "chunk"),
    )
