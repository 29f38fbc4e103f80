"""Proxy rotation as Column expressions (reference parity: P7).

The reference rotates proxies with driver-side shared iterators —
``RoundRobinProxyStrategy`` wraps ``itertools.cycle``
(proxy_strategy.py:190-223) and the session-sticky variant maps a
session id to a held proxy (proxy_strategy.py:137-155).  Shared
mutable iterators don't distribute, so the Spark form makes the
assignment a pure function of data the rows already carry:

* round-robin: request k (any dense order column — ``emit_seq``,
  ``seq``) gets proxy ``k mod n`` — exactly what ``cycle`` hands a
  single consumer, and deterministic under any executor placement.
* sticky sessions: session s gets proxy ``xxhash64(s) mod n`` — stable
  for the session's lifetime with no shared registry to consult (the
  reference's TTL bookkeeping is wall-clock state; at-scale expiry is
  a re-hash with a rotated salt, exposed as ``epoch``).

Assignments are data, not connections: the fetch layer reads the
``proxy`` struct column when issuing the request (in this sandbox the
fetch is a corpus join, so the column is carried through untouched).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ProxyConfig:
    """Value parity with reference ``ProxyConfig``
    (proxy_strategy.py:12-67): server URL, optional auth, ip derived
    from the server when not given."""

    server: str
    username: str | None = None
    password: str | None = None
    ip: str | None = None

    def __post_init__(self):
        if self.ip is None:
            object.__setattr__(self, "ip", self._extract_ip())

    def _extract_ip(self) -> str | None:
        try:
            host = (
                self.server.split("://", 1)[1]
                if "://" in self.server
                else self.server
            )
            return host.split(":")[0]
        except Exception:
            return None

    @staticmethod
    def from_string(proxy_str: str) -> "ProxyConfig":
        """'ip:port:username:password' or 'ip:port'
        (proxy_strategy.py:48-67)."""
        parts = proxy_str.split(":")
        if len(parts) == 4:
            ip, port, username, password = parts
            return ProxyConfig(
                server=f"http://{ip}:{port}",
                username=username,
                password=password,
                ip=ip,
            )
        if len(parts) == 2:
            ip, port = parts
            return ProxyConfig(server=f"http://{ip}:{port}", ip=ip)
        raise ValueError(f"Invalid proxy string format: {proxy_str}")


def _proxy_array(proxies: list[ProxyConfig]) -> Column:
    # full credential set: a fetch layer consuming the struct must be
    # able to authenticate (server alone is not a usable proxy when
    # username/password are set)
    return F.array(
        *[
            F.struct(
                F.lit(p.server).alias("server"),
                F.lit(p.username).cast("string").alias("username"),
                F.lit(p.password).cast("string").alias("password"),
                F.lit(p.ip).cast("string").alias("ip"),
            )
            for p in proxies
        ]
    )


def round_robin_proxy(
    order_col: Column | str, proxies: list[ProxyConfig]
) -> Column:
    """Proxy struct for the request at dense rank ``order_col`` —
    ``cycle(proxies)`` handed out in request order
    (proxy_strategy.py:217-223).  element_at is 1-based."""
    if not proxies:
        return F.lit(None)
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    idx = F.pmod(c.cast("long"), F.lit(len(proxies))) + F.lit(1)
    return F.element_at(_proxy_array(proxies), idx.cast("int"))


def session_proxy(
    session_col: Column | str, proxies: list[ProxyConfig], epoch: int = 0
) -> Column:
    """Sticky per-session proxy (proxy_strategy.py:137-155): stable
    hash of the session id, salted by ``epoch`` so rotating the epoch
    re-deals every session — the stateless analog of TTL expiry."""
    if not proxies:
        return F.lit(None)
    c = F.col(session_col) if isinstance(session_col, str) else session_col
    idx = F.pmod(F.xxhash64(c, F.lit(epoch)), F.lit(len(proxies))) + F.lit(1)
    return F.element_at(_proxy_array(proxies), idx.cast("int"))
