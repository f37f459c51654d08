"""robots.txt parsing and URL gating (SURVEY #6).

The reference hand-parses ``User-agent:`` / ``Disallow:`` lines with
path-prefix matching, a 24-hour per-domain cache, and fail-open on any
error (``ethical_crawler.py:196-266``). Parsing stays a driver-side helper
(robots files are per-domain, tiny, and fetched once); *applying* the rules
to URL columns is the distributed part: broadcast the parsed disallow map
and filter with a JVM-side prefix test.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from urllib.parse import urlparse

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_robots(text: str, user_agent: str = "*") -> list[str]:
    """Extract Disallow path-prefixes applying to ``user_agent`` (or ``*``),
    with the reference's line-by-line semantics
    (``ethical_crawler.py:236-254``): a UA section applies until the next
    ``User-agent:`` line; empty Disallow means allow-all."""
    disallows: list[str] = []
    applies = False
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        lower = line.lower()
        if lower.startswith("user-agent:"):
            agent = line.split(":", 1)[1].strip()
            # exact case-insensitive match, mirroring the reference
            # (ethical_crawler.py: ua.lower() == user_agent.lower())
            applies = agent == "*" or agent.lower() == user_agent.lower()
        elif lower.startswith("disallow:") and applies:
            path = line.split(":", 1)[1].strip()
            if path:
                disallows.append(path)
    return disallows


@dataclass
class RobotsCache:
    """24-h TTL per-domain cache of parsed disallow lists
    (``ethical_crawler.py:210-213``). Fail-open (``:257-266``): a fetch
    error yields an empty disallow list — this is *semantic* in the
    reference (unreachable robots.txt ⇒ assume allowed), so it's kept."""

    ttl_seconds: float = 24 * 3600
    fetcher: object = None  # callable url -> text; injected (no network in tests)
    user_agent: str = "*"
    _cache: dict[str, tuple[float, list[str]]] = field(default_factory=dict)

    def disallows_for(self, domain: str) -> list[str]:
        now = time.time()
        hit = self._cache.get(domain)
        if hit and now - hit[0] < self.ttl_seconds:
            return hit[1]
        try:
            text = self.fetcher(f"https://{domain}/robots.txt") if self.fetcher else ""
            rules = parse_robots(text or "", user_agent=self.user_agent)
        except Exception:
            rules = []  # fail-open, mirroring the reference
        self._cache[domain] = (now, rules)
        return rules

    def can_fetch(self, url: str, user_agent: str | None = None) -> bool:
        parsed = urlparse(url)
        path = parsed.path or "/"
        if user_agent is not None and user_agent != self.user_agent:
            # UA differs from the cached section: parse fresh for this UA
            try:
                text = (
                    self.fetcher(f"https://{parsed.netloc}/robots.txt")
                    if self.fetcher
                    else ""
                )
                rules = parse_robots(text or "", user_agent=user_agent)
            except Exception:
                rules = []  # fail-open, mirroring the reference
            return not any(path.startswith(p) for p in rules)
        return not any(path.startswith(p) for p in self.disallows_for(parsed.netloc))


def allowed_urls(df: DataFrame, url_col: str, disallow_map: dict[str, list[str]]) -> DataFrame:
    """Distributed application of robots rules: filter a URL column against
    a broadcast {domain: [disallowed prefixes]} map — prefix test as a
    Catalyst expression, no Python in the row path."""
    pred: Column = F.lit(True)
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/"))
    for domain, prefixes in disallow_map.items():
        for p in prefixes:
            pred = pred & ~((host == domain) & path.startswith(p))
    return df.filter(pred)
