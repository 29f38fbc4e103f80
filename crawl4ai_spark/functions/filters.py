"""URL filters as Catalyst boolean Column expressions.

Each filter replicates one class from
/root/reference/crawl4ai/deep_crawling/filters.py; a FilterChain is the
conjunction of the member Columns (filters.py:69-116 — Catalyst performs
the same short-circuit predicate evaluation natively inside one Filter
node).  Patterns are compiled driver-side once; executors evaluate only
JVM string/regex expressions.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass, field
from typing import Pattern, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawl4ai_spark.functions.scorers import extract_domain

# Extension → MIME map, reproduced from filters.py:265-361 (data table,
# kept verbatim so ContentTypeFilter accepts exactly the same URLs).
MIME_MAP = {
    "txt": "text/plain", "html": "text/html", "htm": "text/html",
    "xhtml": "application/xhtml+xml", "css": "text/css", "csv": "text/csv",
    "ics": "text/calendar", "js": "application/javascript",
    "bmp": "image/bmp", "gif": "image/gif", "jpeg": "image/jpeg",
    "jpg": "image/jpeg", "png": "image/png", "svg": "image/svg+xml",
    "tiff": "image/tiff", "ico": "image/x-icon", "webp": "image/webp",
    "mp3": "audio/mpeg", "wav": "audio/wav", "ogg": "audio/ogg",
    "m4a": "audio/mp4", "aac": "audio/aac",
    "mp4": "video/mp4", "mpeg": "video/mpeg", "webm": "video/webm",
    "avi": "video/x-msvideo", "mov": "video/quicktime",
    "flv": "video/x-flv", "wmv": "video/x-ms-wmv", "mkv": "video/x-matroska",
    "json": "application/json", "xml": "application/xml",
    "pdf": "application/pdf", "zip": "application/zip",
    "gz": "application/gzip", "tar": "application/x-tar",
    "rar": "application/vnd.rar", "7z": "application/x-7z-compressed",
    "exe": "application/vnd.microsoft.portable-executable",
    "msi": "application/x-msdownload",
    "woff": "font/woff", "woff2": "font/woff2", "ttf": "font/ttf",
    "otf": "font/otf",
    "doc": "application/msword", "dot": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "xls": "application/vnd.ms-excel",
    "ppt": "application/vnd.ms-powerpoint",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
    "tar.gz": "application/gzip", "tgz": "application/gzip",
    "bz2": "application/x-bzip2",
    "rtf": "application/rtf",
    "apk": "application/vnd.android.package-archive",
    "epub": "application/epub+zip", "jar": "application/java-archive",
    "swf": "application/x-shockwave-flash",
    "midi": "audio/midi", "mid": "audio/midi",
    "ps": "application/postscript", "ai": "application/postscript",
    "eps": "application/postscript",
    "bin": "application/octet-stream", "dmg": "application/x-apple-diskimage",
    "iso": "application/x-iso9660-image", "deb": "application/x-debian-package",
    "rpm": "application/x-rpm", "sqlite": "application/vnd.sqlite3",
    "unknown": "application/octet-stream",
    "php": "application/x-httpd-php", "php3": "application/x-httpd-php",
    "php4": "application/x-httpd-php", "php5": "application/x-httpd-php",
    "php7": "application/x-httpd-php", "phtml": "application/x-httpd-php",
    "phps": "application/x-httpd-php-source",
}


def url_path(url: Column) -> Column:
    """``urlparse(url).path`` for absolute URLs: text between authority
    and the first of '?#'. Relative URLs fall back to the full string up
    to '?#' (matches urlparse for scheme-less paths)."""
    no_frag = F.substring_index(F.substring_index(url, "#", 1), "?", 1)
    return F.when(
        url.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"),
        F.regexp_extract(no_frag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1),
    ).otherwise(no_frag)


class Filter:
    """Base: ``column(url)`` returns a BooleanType Column (True = pass)."""

    def column(self, url: Column | str) -> Column:  # pragma: no cover
        raise NotImplementedError

    def apply(self, url: str) -> bool:  # pure-Python oracle path
        raise NotImplementedError


@dataclass
class FilterChain:
    """Conjunctive AND over member filters (filters.py:69-116)."""

    filters: list[Filter] = field(default_factory=list)

    def column(self, url: Column | str) -> Column:
        c = url if isinstance(url, Column) else F.col(url)
        out = F.lit(True)
        for f in self.filters:
            out = out & f.column(c)
        return out

    def apply(self, url: str) -> bool:
        return all(f.apply(url) for f in self.filters)


@dataclass
class URLPatternFilter(Filter):
    """Glob/regex URL pattern filter (filters.py:119-256).

    Pattern categories (filters.py:165-183):
      SUFFIX  '*.html'          — extension of last path segment
      PREFIX  '/foo/*'          — path (or URL when pattern has '://')
                                  startswith + boundary char [/?#]
                                  (filters.py:236-245)
      DOMAIN  '*.example.com' with '://'  — regex match from start
      REGEX   '^...' / '...$' / contains '\\d' — used verbatim (search)
      PATH    everything else  — glob translated (** → .*, {a,b} → (a|b))
    ``reverse=True`` negates the verdict.
    """

    patterns: Union[str, Pattern, list]
    use_glob: bool = True
    reverse: bool = False

    def __post_init__(self):
        pats = self.patterns
        if isinstance(pats, (str, Pattern)):
            pats = [pats]
        self._suffixes: set[str] = set()
        self._prefixes: list[str] = []
        self._domain_regexes: list[str] = []
        self._path_regexes: list[str] = []
        for p in pats:
            if not isinstance(p, str):
                self._path_regexes.append(p.pattern)
                continue
            is_regex = p.startswith("^") or p.endswith("$") or "\\d" in p
            if is_regex:
                self._path_regexes.append(p)
            elif p.count("*") == 1 and p.startswith("*."):
                self._suffixes.add(p[2:])
            elif p.count("*") == 1 and p.endswith("/*"):
                self._prefixes.append(p[:-2])
            elif "://" in p and p.startswith("*."):
                self._domain_regexes.append(p.replace("*.", r"[^/]+\."))
            else:
                glob = p
                if "**" in glob:
                    glob = glob.replace("**", ".*")
                if "{" in glob:
                    glob = re.sub(
                        r"\{([^}]+)\}",
                        lambda m: f"({'|'.join(m.group(1).split(','))})",
                        glob,
                    )
                self._path_regexes.append(fnmatch.translate(glob))

    def _match_column(self, url: Column) -> Column:
        path = url_path(url)
        verdict = F.lit(False)
        if self._suffixes:
            last_seg = F.element_at(F.split(path, "/"), -1)
            ext = F.element_at(F.split(last_seg, r"\."), -1)
            verdict = verdict | ext.isin(*self._suffixes)
        for dp in self._domain_regexes:
            verdict = verdict | url.rlike("^" + dp)
        for prefix in self._prefixes:
            target = url if "://" in prefix else path
            verdict = verdict | target.rlike(
                "^" + re.escape(prefix) + r"($|[/?#])"
            )
        for rp in self._path_regexes:
            verdict = verdict | url.rlike(rp)
        return verdict

    def column(self, url: Column | str) -> Column:
        c = url if isinstance(url, Column) else F.col(url)
        v = self._match_column(c)
        return ~v if self.reverse else v

    def apply(self, url: str) -> bool:
        from urllib.parse import urlparse

        path = urlparse(url).path
        result = False
        if self._suffixes and path.split("/")[-1].split(".")[-1] in self._suffixes:
            result = True
        if not result:
            for dp in self._domain_regexes:
                if re.match(dp, url):
                    result = True
                    break
        if not result:
            for prefix in self._prefixes:
                target = url if "://" in prefix else path
                if target.startswith(prefix) and (
                    len(target) == len(prefix) or target[len(prefix)] in "/?#"
                ):
                    result = True
                    break
        if not result:
            result = any(re.search(rp, url) for rp in self._path_regexes)
        return (not result) if self.reverse else result


@dataclass
class ContentTypeFilter(Filter):
    """Allow by MIME inferred from URL extension (filters.py:259-422).

    Extension extraction mirrors filters.py:366-382: strip scheme, take
    everything after the first '/', last '/'-segment is the filename,
    extension = text after its last '.'; **no extension ⇒ pass**
    (filters.py:411-414).
    """

    allowed_types: Union[str, list]
    check_extension: bool = True

    def __post_init__(self):
        allowed = (
            self.allowed_types
            if isinstance(self.allowed_types, list)
            else [self.allowed_types]
        )
        allowed = frozenset(t.lower() for t in allowed)
        self._ext_set = frozenset(
            ext for ext, mime in MIME_MAP.items() if any(a in mime for a in allowed)
        )

    @staticmethod
    def extract_extension(url: str) -> str:
        if "://" in url:
            url = url.split("://", 1)[-1]
        path_start = url.find("/")
        path = url[path_start:] if path_start != -1 else ""
        filename = path.rsplit("/", 1)[-1] if "/" in path else ""
        if "." not in filename:
            return ""
        return filename.rpartition(".")[-1].lower()

    def extension_column(self, url: Column) -> Column:
        after_scheme = F.when(
            url.contains("://"), F.substring_index(url, "://", -1)
        ).otherwise(url)
        path = F.when(
            after_scheme.contains("/"),
            F.concat(F.lit("/"), F.substring_index(after_scheme, "/", -1)),
        ).otherwise(F.lit(""))
        # path here is already just '/<filename>' (last segment)
        filename = F.substring_index(path, "/", -1)
        return F.when(
            filename.contains("."), F.lower(F.substring_index(filename, ".", -1))
        ).otherwise(F.lit(""))

    def column(self, url: Column | str) -> Column:
        c = url if isinstance(url, Column) else F.col(url)
        if not self.check_extension:
            return F.lit(True)
        ext = self.extension_column(c)
        return (ext == "") | ext.isin(*self._ext_set)

    def apply(self, url: str) -> bool:
        if not self.check_extension:
            return True
        ext = self.extract_extension(url)
        return not ext or ext in self._ext_set


@dataclass
class DomainFilter(Filter):
    """Allow/block domain lists with subdomain semantics
    (filters.py:425-499): blocked wins; no allowlist ⇒ pass; subdomain =
    exact match or endswith('.'+parent)."""

    allowed_domains: Union[str, list, None] = None
    blocked_domains: Union[str, list, None] = None

    def __post_init__(self):
        def norm(d):
            if d is None:
                return None
            items = [d] if isinstance(d, str) else d
            return frozenset(x.lower() for x in items)

        self._allowed = norm(self.allowed_domains)
        self._blocked = norm(self.blocked_domains) or frozenset()

    @staticmethod
    def _subdomain_col(dom: Column, parent: str) -> Column:
        return (dom == parent) | dom.endswith("." + parent)

    def column(self, url: Column | str) -> Column:
        c = url if isinstance(url, Column) else F.col(url)
        if not self._blocked and self._allowed is None:
            return F.lit(True)
        # filters.py:478 extracts via regex '://([^/]+)' — '' when absent
        dom = F.lower(F.regexp_extract(c, r"://([^/]+)", 1))
        verdict = F.lit(True)
        for b in self._blocked:
            verdict = verdict & ~self._subdomain_col(dom, b)
        if self._allowed is not None:
            allowed_any = F.lit(False)
            for a in self._allowed:
                allowed_any = allowed_any | self._subdomain_col(dom, a)
            verdict = verdict & allowed_any
        return verdict

    def apply(self, url: str) -> bool:
        if not self._blocked and self._allowed is None:
            return True
        m = re.search(r"://([^/]+)", url)
        dom = m.group(1).lower() if m else ""
        for b in self._blocked:
            if dom == b or dom.endswith("." + b):
                return False
        if self._allowed is None:
            return True
        return any(dom == a or dom.endswith("." + a) for a in self._allowed)


def valid_crawl_url(url: Column | str) -> Column:
    """The per-strategy URL validity predicate (bfs_strategy.py:62-82):
    scheme ∈ {http, https} (urlparse lowercases the scheme), non-empty
    netloc containing '.'."""
    c = url if isinstance(url, Column) else F.col(url)
    return c.rlike(r"(?i)^https?://[^/?#]*\.[^/?#]*")


def py_valid_crawl_url(url: str | None) -> bool:
    """Pure-Python mirror of ``valid_crawl_url`` (oracle path)."""
    from urllib.parse import urlparse

    if not url:
        return False
    try:
        parsed = urlparse(url)
        return (
            parsed.scheme in ("http", "https")
            and bool(parsed.netloc)
            and "." in parsed.netloc
        )
    except (ValueError, AttributeError):
        return False
