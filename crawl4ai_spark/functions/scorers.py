"""URL scorers as Catalyst Column expressions.

Each scorer replicates one class from
/root/reference/crawl4ai/deep_crawling/scorers.py (golden values:
/root/reference/tests/general/test_deep_crawl_scorers.py) but is
expressed as a JVM-side Column so scoring 10^10 frontier rows stays
inside whole-stage codegen — no Python in the hot path at all.

Weights are rounded through float32 exactly like the reference
(``URLScorer.__init__`` stores ``ctypes.c_float(weight).value``,
scorers.py:67-68), so weighted scores match bit-for-bit.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# Distance → score lookup (scorers.py:14) and freshness table (scorers.py:17-24).
PATH_DEPTH_LOOKUP = [1.0, 0.5, 0.3333333333333333, 0.25]
FRESHNESS_SCORES = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]

# Year-in-URL pattern (scorers.py:343-355). Java and Python regex agree on
# this pattern's greedy, non-overlapping scan semantics.
FRESHNESS_PATTERN = (
    r"(?:/|[-_])((?:19|20)\d{2})(?:(?:/|[-_])(?:\d{2})(?:(?:/|[-_])(?:\d{2}))?)?"
)


def f32(x: float) -> float:
    """Round a python float through float32, as the reference does."""
    return float(np.float32(x))


class Scorer:
    """Base: ``column(url)`` returns the weighted score as a Column."""

    weight: float = 1.0

    def raw(self, url: Column) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def column(self, url: Column | str) -> Column:
        c = url if isinstance(url, Column) else F.col(url)
        return self.raw(c) * F.lit(f32(self.weight))


@dataclass
class KeywordRelevanceScorer(Scorer):
    """Fraction of keywords substring-present in the URL
    (scorers.py:160-188)."""

    keywords: list[str]
    weight: float = 1.0
    case_sensitive: bool = False

    def raw(self, url: Column) -> Column:
        u = url if self.case_sensitive else F.lower(url)
        kws = [k if self.case_sensitive else k.lower() for k in self.keywords]
        hits = sum(
            (F.when(u.contains(F.lit(k)), 1).otherwise(0) for k in kws),
            F.lit(0),
        )
        return hits.cast("double") / F.lit(float(len(kws)))


def _path_depth(url: Column) -> Column:
    """Number of non-empty path segments after the authority
    (PathDepthScorer._quick_depth, scorers.py:196-246): '/a/b' → 2,
    no path or '/' → 0."""
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)?$", 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    return F.size(segs)


@dataclass
class PathDepthScorer(Scorer):
    """score = lookup[|depth-optimal|] for distance<4 else 1/(1+distance)
    (scorers.py:226-245)."""

    optimal_depth: int = 3
    weight: float = 1.0

    def raw(self, url: Column) -> Column:
        dist = F.abs(_path_depth(url) - F.lit(self.optimal_depth))
        lookup = F.array(*[F.lit(v) for v in PATH_DEPTH_LOOKUP])
        return F.when(dist < 4, F.element_at(lookup, dist + 1)).otherwise(
            F.lit(1.0) / (F.lit(1.0) + dist.cast("double"))
        )


def quick_extension(url: Column) -> Column:
    """ContentTypeScorer._quick_extension (scorers.py:268-296): substring
    after the LAST '.' up to the first non-alphanumeric char, lowercased;
    '' when no dot."""
    ext = F.regexp_extract(url, r"^.*\.([A-Za-z0-9]*)", 1)
    return F.when(url.contains("."), F.lower(ext)).otherwise(F.lit(""))


@dataclass
class ContentTypeScorer(Scorer):
    """Extension → weight map with regex fallback (scorers.py:247-330).

    ``type_weights`` uses the reference's '.ext$' convention for exact
    extensions; other keys are treated as regex fallbacks evaluated in
    score-descending order.
    """

    type_weights: dict[str, float]
    weight: float = 1.0

    def raw(self, url: Column) -> Column:
        exact: dict[str, float] = {}
        regexes: list[tuple[str, float]] = []
        for pattern, score in self.type_weights.items():
            if pattern.startswith(".") and pattern.endswith("$"):
                exact[pattern[1:-1]] = score
            else:
                regexes.append((pattern, score))
        regexes.sort(key=lambda x: -x[1])

        ext = quick_extension(url)
        result = F.lit(None).cast("double")
        if exact:
            mapping = F.create_map(
                *[F.lit(x) for kv in exact.items() for x in kv]
            )
            result = F.when(ext != "", mapping[ext]).otherwise(F.lit(None))
        for pattern, score in regexes:
            result = F.coalesce(
                result, F.when(url.rlike(pattern), F.lit(score))
            )
        return F.coalesce(result, F.lit(0.0))


@dataclass
class FreshnessScorer(Scorer):
    """Latest year ≤ current_year found in the URL → freshness table,
    default 0.5, fallback max(0.1, 1 - diff*0.1) (scorers.py:332-412)."""

    weight: float = 1.0
    current_year: int = 2024

    def raw(self, url: Column) -> Column:
        years = F.transform(
            F.regexp_extract_all(url, F.lit(FRESHNESS_PATTERN), F.lit(1)),
            lambda y: y.cast("int"),
        )
        year = F.array_max(F.filter(years, lambda y: y <= F.lit(self.current_year)))
        diff = F.lit(self.current_year) - year
        lookup = F.array(*[F.lit(v) for v in FRESHNESS_SCORES])
        return F.when(year.isNull(), F.lit(0.5)).otherwise(
            F.when(diff < len(FRESHNESS_SCORES), F.element_at(lookup, diff + 1))
            .otherwise(F.greatest(F.lit(0.1), F.lit(1.0) - diff.cast("double") * 0.1))
        )


def extract_domain(url: Column) -> Column:
    """DomainAuthorityScorer._extract_domain (scorers.py:448-487):
    text between '://' (or start) and the first of '/?#', minus the port,
    lowercased."""
    host = F.regexp_extract(url, r"^(?:[^:/?#]*://)?([^/?#]*)", 1)
    host = F.regexp_replace(host, r":[^:]*$", "")
    return F.lower(host)


@dataclass
class DomainAuthorityScorer(Scorer):
    """Domain → authority map with default (scorers.py:414-519)."""

    domain_weights: dict[str, float]
    default_weight: float = 0.5
    weight: float = 1.0

    def raw(self, url: Column) -> Column:
        dom = extract_domain(url)
        mapping = F.create_map(
            *[F.lit(x) for d, s in self.domain_weights.items()
              for x in (d.lower(), float(s))]
        )
        return F.coalesce(mapping[dom], F.lit(float(self.default_weight)))


@dataclass
class CompositeScorer(Scorer):
    """Sum of child weighted scores, ÷ count when normalize
    (scorers.py:91-158)."""

    scorers: list[Scorer] = field(default_factory=list)
    normalize: bool = True
    weight: float = 1.0

    def column(self, url: Column | str) -> Column:
        c = url if isinstance(url, Column) else F.col(url)
        total = sum((s.column(c) for s in self.scorers), F.lit(0.0))
        if self.normalize and self.scorers:
            return total / F.lit(float(len(self.scorers)))
        return total

    def raw(self, url: Column) -> Column:
        return self.column(url)


# --------------------------------------------------------------------------
# Pure-Python mirrors (used by the parity oracle; same semantics, same
# float32 weight rounding).
# --------------------------------------------------------------------------

def py_score(scorer: Scorer, url: str) -> float:
    """Evaluate a scorer spec on one URL in pure Python (oracle path)."""
    if isinstance(scorer, CompositeScorer):
        total = sum(py_score(s, url) for s in scorer.scorers)
        return total / len(scorer.scorers) if scorer.normalize and scorer.scorers else total
    return _py_raw(scorer, url) * f32(scorer.weight)


def _py_raw(scorer: Scorer, url: str) -> float:
    if isinstance(scorer, KeywordRelevanceScorer):
        u = url if scorer.case_sensitive else url.lower()
        kws = [k if scorer.case_sensitive else k.lower() for k in scorer.keywords]
        matches = sum(1 for k in kws if k in u)
        return matches / len(kws) if kws else 0.0
    if isinstance(scorer, PathDepthScorer):
        pos = url.find("/", url.find("://") + 3)
        if pos == -1:
            depth = 0
        else:
            depth = len([s for s in url[pos:].split("/") if s])
        dist = abs(depth - scorer.optimal_depth)
        return PATH_DEPTH_LOOKUP[dist] if dist < 4 else 1.0 / (1.0 + dist)
    if isinstance(scorer, ContentTypeScorer):
        pos = url.rfind(".")
        ext = ""
        if pos != -1:
            end = len(url)
            for i in range(pos + 1, len(url)):
                if not url[i].isalnum():
                    end = i
                    break
            ext = url[pos + 1 : end].lower()
        exact = {
            p[1:-1]: s
            for p, s in scorer.type_weights.items()
            if p.startswith(".") and p.endswith("$")
        }
        if ext and ext in exact:
            return exact[ext]
        fallbacks = sorted(
            ((p, s) for p, s in scorer.type_weights.items() if p not in
             {f".{e}$" for e in exact}),
            key=lambda x: -x[1],
        )
        for pattern, score in fallbacks:
            if re.search(pattern, url):
                return score
        return 0.0
    if isinstance(scorer, FreshnessScorer):
        years = [
            int(m.group(1))
            for m in re.finditer(FRESHNESS_PATTERN, url)
            if int(m.group(1)) <= scorer.current_year
        ]
        if not years:
            return 0.5
        diff = scorer.current_year - max(years)
        if diff < len(FRESHNESS_SCORES):
            return FRESHNESS_SCORES[diff]
        return max(0.1, 1.0 - diff * 0.1)
    if isinstance(scorer, DomainAuthorityScorer):
        start = url.find("://")
        start = 0 if start == -1 else start + 3
        end = len(url)
        for ch in "/?#":
            idx = url.find(ch, start)
            if idx != -1:
                end = min(end, idx)
        dom = url[start:end]
        port = dom.rfind(":")
        if port != -1:
            dom = dom[:port]
        dom = dom.lower()
        weights = {d.lower(): s for d, s in scorer.domain_weights.items()}
        return weights.get(dom, scorer.default_weight)
    raise TypeError(f"unknown scorer {scorer!r}")
