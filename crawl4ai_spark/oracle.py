"""Pure-Python crawl-order oracle.

Executes the reference's traversal algorithms exactly —
BFS  /root/reference/crawl4ai/deep_crawling/bfs_strategy.py:207-301
DFS  /root/reference/crawl4ai/deep_crawling/dfs_strategy.py:28-139
BFF  /root/reference/crawl4ai/deep_crawling/bff_strategy.py:193-361
— over an in-memory page graph, with ONE deliberate determinization:
``arun_many`` returns results in request order (the reference's network
arrival order is nondeterministic; its own tests only assert level
monotonicity / queue order).  The Spark engine defines the same
canonical order, so oracle and engine outputs are comparable
byte-for-byte: emission order, depths, parents, scores, and the final
URL-seen set.

Quirks of the reference that ARE replicated here (and in the engine):
- ``visited`` is updated at discovery time in BFS (bfs_strategy.py:186),
  so a URL trimmed off by the max_pages capacity cut is still never
  crawled later.
- The start URL is never added to BFS ``visited`` (batch mode), so a
  link back to the seed re-crawls it at depth 1.
- max_pages counts successful fetches only; a BFS level in flight is
  never truncated (the level loop has no mid-level break), while
  best-first breaks immediately after the boundary page is emitted.
- Best-first pops ``BATCH_SIZE`` items per round regardless of how many
  of them turn out to be already-visited duplicates (bff_strategy.py:
  254-270), and duplicates may coexist in the queue (pop-time dedupe).
- DFS keeps a separate ``_dfs_seen`` discovery-dedupe set seeded with
  the start URL, distinct from ``visited`` (dfs_strategy.py:22-26).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from heapq import heappop, heappush

from crawl4ai_spark.functions.filters import FilterChain, py_valid_crawl_url
from crawl4ai_spark.functions.normalize import normalize_url_for_deep_crawl
from crawl4ai_spark.functions.scorers import Scorer, py_score

BATCH_SIZE = 10  # bff_strategy.py:19


@dataclass
class Page:
    url: str
    status_code: int = 200
    success: bool = True
    links: list = field(default_factory=list)  # [(href, is_external)]


@dataclass
class CrawlSpec:
    max_depth: int
    strategy: str = "bfs"  # bfs | dfs | best_first
    filter_chain: FilterChain = field(default_factory=FilterChain)
    scorer: Scorer | None = None
    include_external: bool = False
    score_threshold: float = -math.inf
    max_pages: float = math.inf
    batch_size: int = BATCH_SIZE
    # per-successful-URL state callback (bfs_strategy.py:266-284);
    # BFS only, mirrors the reference signature/cadence exactly
    on_state_change: object = None
    # reference-shape resume dict (visited/pending/depths/pages_crawled,
    # bfs_strategy.py:211-228); BFS only
    resume_state: dict | None = None


@dataclass
class Emission:
    seq: int
    url: str
    depth: int
    parent_url: str | None
    score: float
    success: bool
    status_code: int


def _can_process(spec: CrawlSpec, url: str | None, depth: int) -> bool:
    if not py_valid_crawl_url(url):
        return False
    if depth != 0 and not spec.filter_chain.apply(url):
        return False
    return True


def _page_links(pages: dict, url: str, include_external: bool) -> list[str]:
    page = pages.get(url)
    if page is None:
        return []
    return [
        href
        for href, is_ext in page.links
        if include_external or not is_ext
    ]


def _fetch(pages: dict, url: str) -> tuple[bool, int]:
    page = pages.get(url)
    if page is None:
        return False, 0
    return page.success, page.status_code


def crawl_oracle(pages: dict, start_url, spec: CrawlSpec) -> tuple[list[Emission], set]:
    seeds = [start_url] if isinstance(start_url, str) else list(start_url)
    if spec.strategy == "bfs":
        return _bfs(pages, seeds, spec)
    if spec.strategy == "dfs":
        return _dfs(pages, seeds, spec)
    if spec.strategy == "best_first":
        return _bff(pages, seeds, spec)
    raise ValueError(spec.strategy)


def _score(spec: CrawlSpec, url: str) -> float:
    return py_score(spec.scorer, url) if spec.scorer else 0.0


def _bfs_discovery(
    pages, spec, url, depth, visited, next_level, depths, pages_crawled, seen_override=None
):
    """link_discovery (bfs_strategy.py:133-205); ``seen_override`` is the
    DFS variant's separate ``_dfs_seen`` set (dfs_strategy.py:291-315)."""
    next_depth = depth + 1
    if next_depth > spec.max_depth:
        return
    remaining = spec.max_pages - pages_crawled
    if remaining <= 0:
        return
    seen = visited if seen_override is None else seen_override
    valid = []
    for href in _page_links(pages, url, spec.include_external):
        norm = normalize_url_for_deep_crawl(href, url)
        if seen_override is not None and not norm:
            continue  # DFS checks falsiness before membership
        if norm in seen:
            continue
        if not _can_process(spec, norm, next_depth):
            continue
        score = _score(spec, norm)
        if score < spec.score_threshold:
            continue
        seen.add(norm)
        valid.append((norm, score))
    if len(valid) > remaining:
        if spec.scorer:
            valid.sort(key=lambda x: x[1], reverse=True)  # stable
        valid = valid[: int(remaining)]
    for norm, score in valid:
        next_level.append((norm, url, score))
        depths[norm] = next_depth


def _bfs(pages, seeds, spec):
    if spec.resume_state:
        # bfs_strategy.py:221-228: resume drops nothing it knew —
        # visited/depths/pages_crawled restored, current_level = pending
        visited = set(spec.resume_state.get("visited", []))
        current_level = [
            (it["url"], it.get("parent_url"), 0.0)
            for it in spec.resume_state.get("pending", [])
        ]
        depths = dict(spec.resume_state.get("depths", {}))
        pages_crawled = int(spec.resume_state.get("pages_crawled", 0))
    else:
        visited = set()
        current_level = [(s, None, 0.0) for s in seeds]
        depths = {s: 0 for s in seeds}
        pages_crawled = 0
    emissions: list[Emission] = []
    seq = 0
    while current_level:
        if pages_crawled >= spec.max_pages:
            break
        next_level: list = []
        for url, parent, score in current_level:
            success, status = _fetch(pages, url)
            depth = depths.get(url, 0)
            emissions.append(
                Emission(seq, url, depth, parent, score, success, status)
            )
            seq += 1
            if success:
                pages_crawled += 1
                _bfs_discovery(
                    pages, spec, url, depth, visited, next_level, depths, pages_crawled
                )
                if spec.on_state_change is not None:
                    # bfs_strategy.py:273-284, verbatim cadence
                    spec.on_state_change(
                        {
                            "strategy_type": "bfs",
                            "visited": list(visited),
                            "pending": [
                                {"url": u, "parent_url": p}
                                for u, p, _ in next_level
                            ],
                            "depths": dict(depths),
                            "pages_crawled": pages_crawled,
                            "cancelled": False,
                        }
                    )
        current_level = next_level
    return emissions, visited


def _dfs(pages, seeds, spec):
    visited: set = set()
    dfs_seen = set(seeds)
    stack = [(s, None, 0, 0.0) for s in reversed(seeds)]
    depths = {s: 0 for s in seeds}
    emissions: list[Emission] = []
    pages_crawled = 0
    seq = 0
    while stack:
        url, parent, depth, disc_score = stack.pop()
        if url in visited or depth > spec.max_depth:
            continue
        visited.add(url)
        success, status = _fetch(pages, url)
        # dfs_strategy.py:88-90 re-scores the popped URL when a scorer
        # is configured (metadata["score"] = scorer.score(url)).
        score = _score(spec, url) if spec.scorer else disc_score
        emissions.append(Emission(seq, url, depth, parent, score, success, status))
        seq += 1
        if success:
            pages_crawled += 1
            if pages_crawled >= spec.max_pages:
                break
            new_links: list = []
            _bfs_discovery(
                pages, spec, url, depth, visited, new_links, depths,
                pages_crawled, seen_override=dfs_seen,
            )
            for new_url, new_parent, s in reversed(new_links):
                stack.append((new_url, new_parent, depths.get(new_url, depth + 1), s))
    return emissions, visited


def _bff(pages, seeds, spec):
    visited: set = set()
    depths = {s: 0 for s in seeds}
    queue: list = []  # "" parent sorts like ref's None-safe tie
    for s in seeds:
        heappush(queue, (-_score(spec, s), 0, s, ""))
    emissions: list[Emission] = []
    pages_crawled = 0
    seq = 0
    stop = False
    while queue and not stop:
        if pages_crawled >= spec.max_pages:
            break
        remaining = spec.max_pages - pages_crawled
        if min(spec.batch_size, remaining) <= 0:
            break
        batch = []
        for _ in range(spec.batch_size):  # note: full size, not min(...) — ref quirk
            if not queue:
                break
            item = heappop(queue)
            if item[2] in visited:
                continue
            visited.add(item[2])
            batch.append(item)
        if not batch:
            continue
        for neg_score, depth, url, parent in batch:
            success, status = _fetch(pages, url)
            if success:
                pages_crawled += 1
            emissions.append(
                Emission(seq, url, depth, parent or None, -neg_score, success, status)
            )
            seq += 1
            if success and pages_crawled >= spec.max_pages:
                stop = True
                break
            if success:
                new_links: list = []
                new_depth = depth + 1
                if new_depth <= spec.max_depth and spec.max_pages - pages_crawled > 0:
                    for href in _page_links(pages, url, spec.include_external):
                        norm = normalize_url_for_deep_crawl(href, url)
                        if norm in visited:
                            continue
                        if not _can_process(spec, norm, new_depth):
                            continue
                        new_links.append(norm)
                        depths[norm] = new_depth
                for new_url in new_links:
                    nd = depths.get(new_url, depth + 1)
                    new_score = _score(spec, new_url)
                    if new_score < spec.score_threshold:
                        continue
                    heappush(queue, (-new_score, nd, new_url, url))
    return emissions, visited
