"""Live HTTP discovery layer: stdlib transport + per-source fetchers.

The reference's adapters actually fetch: Socrata GET with paging and
optional app token (``ethical_crawler.py:359-414``), Comtrade GET with a
subscription-key header (``:502-563``), SEC HEAD probes with a custom
User-Agent (``:603-672``), Scorecard field probe gated on an API key
(``:696-754``), robots.txt GET (``:220-263``) — all behind one
``aiohttp.ClientSession`` with shared headers and timeout (``:279-291``).

This module is the runnable counterpart, Spark-first in its division of
labor: the TRANSPORT is a tiny driver-side concern (rate-limited, tiny
JSON metadata payloads — never cluster work), and everything downstream
of the spool — mapping, compliance gate, dedupe-upsert, audit — is the
distributed DataFrame pipeline that already exists
(:func:`..cli.cmd_collect`). The fetcher's only job is to turn API
responses into normalized ``(source_name, payload_json)`` items and/or a
JSONL spool file.

Design points:

* **stdlib only** (``urllib.request``): no aiohttp dependency; discovery
  is sequential and rate-limited anyway (the reference awaits between
  requests too), so async buys nothing here.
* **Injectable everywhere**: ``HttpTransport(base_override=...)``
  redirects any URL's scheme+host to a local fixture server while the
  adapters keep their real public URLs; ``RobotsCache(fetcher=
  transport.text)`` reuses the same transport. Tests run a stdlib
  ``http.server`` and exercise the full stack offline.
* **Fail-open / fail-empty semantics mirror the reference**: non-200 →
  skip (log-free here; callers see fewer items), exceptions → partial
  results, robots fetch failure → allowed, missing required API key →
  no items (``:700-703``).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

from .adapters import (
    COLLEGE_SCORECARD,
    NYC_OPEN_DATA,
    SEC_EDGAR,
    SourceSpec,
    UN_COMTRADE,
    RateLimiter,
)
from .robots import RobotsCache

#: Shared request headers (``ethical_crawler.py:283-287``).
DEFAULT_HEADERS = {
    "User-Agent": "EthicalDataBot/1.0 (Responsible Research Data Collection)",
    "Accept": "application/json, application/xml, text/csv, text/html",
}

#: SEC requires a contact-identifying UA (``ethical_crawler.py:637-641``).
SEC_HEADERS = {
    "User-Agent": "Research Institution compliance@university.edu",
    "Accept-Encoding": "gzip, deflate",
}


class HttpTransport:
    """Minimal synchronous HTTP client over ``urllib.request``.

    ``base_override`` rewrites every request's scheme+netloc (e.g. to
    ``http://127.0.0.1:8999``) while preserving path+query — the seam
    that points the real adapters at a local fixture server. ``timeout``
    mirrors the reference's 30 s session default (``:281``).
    """

    def __init__(self, base_override: str | None = None, timeout: float = 30.0):
        self.base_override = base_override
        self.timeout = timeout

    def _rewrite(self, url: str) -> str:
        if not self.base_override:
            return url
        parts = urllib.parse.urlsplit(url)
        base = urllib.parse.urlsplit(self.base_override)
        return urllib.parse.urlunsplit(
            (base.scheme, base.netloc, parts.path, parts.query, parts.fragment)
        )

    def request(
        self,
        url: str,
        params: dict | None = None,
        headers: dict | None = None,
        method: str = "GET",
    ) -> tuple[int, bytes]:
        """(status, body). HTTP error statuses are returned, not raised —
        adapters branch on status like the reference does; transport-level
        failures (refused connection, timeout) do raise."""
        if params:
            sep = "&" if urllib.parse.urlsplit(url).query else "?"
            url = url + sep + urllib.parse.urlencode(params)
        req = urllib.request.Request(
            self._rewrite(url),
            headers={**DEFAULT_HEADERS, **(headers or {})},
            method=method,
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, b"" if method == "HEAD" else resp.read()
        except urllib.error.HTTPError as e:  # 4xx/5xx — a valid response
            return e.code, e.read() if method != "HEAD" else b""

    def get_json(self, url: str, params: dict | None = None, headers: dict | None = None):
        """(status, parsed-or-None)."""
        status, body = self.request(url, params=params, headers=headers)
        if status != 200:
            return status, None
        try:
            return status, json.loads(body.decode("utf-8"))
        except (ValueError, UnicodeDecodeError):
            return status, None

    def head(self, url: str, headers: dict | None = None) -> int:
        return self.request(url, headers=headers, method="HEAD")[0]

    def text(self, url: str) -> str:
        """GET returning decoded text on 200, '' otherwise — the
        ``RobotsCache.fetcher`` signature (robots fail-open upstream)."""
        status, body = self.request(url)
        return body.decode("utf-8", errors="replace") if status == 200 else ""


def robots_transport(transport: HttpTransport) -> HttpTransport:
    """A sibling transport with the reference's tighter robots.txt timeout
    (10 s vs the session's 30 s, ``ethical_crawler.py:222`` vs ``:281``) —
    robots files are tiny and a slow robots host must not stall
    discovery; the fail-open semantics upstream turn the timeout into
    'assume allowed'."""
    return HttpTransport(base_override=transport.base_override, timeout=10.0)


def _payload(spec: SourceSpec, **fields) -> tuple[str, str]:
    """One normalized spool item: JSON with the keys ``raw_to_records``
    extracts (id/name/description/category/tags/updated_at/...), plus
    ``_source`` so a JSONL spool is self-describing for ``cmd_collect``."""
    doc = {"_source": spec.name}
    doc.update({k: v for k, v in fields.items() if v is not None})
    return spec.name, json.dumps(doc, separators=(",", ":"), sort_keys=True)


def discover_nyc(
    transport: HttpTransport,
    limiter: RateLimiter | None = None,
    robots: RobotsCache | None = None,
    api_key: str | None = None,
    page_size: int = 5000,
    max_pages: int = 100,
) -> list[tuple[str, str]]:
    """Socrata discovery (``ethical_crawler.py:359-414``): robots-gate the
    API endpoint, then GET ``/metadata/v1`` pages of ``page_size`` items
    (``limit``/``offset`` params; optional ``$$app_token``) until a short
    page. The reference requests one fixed page of 5000; real Socrata
    domains page past that, so the loop is the honest version of the same
    request. ``max_pages`` bounds a misbehaving endpoint."""
    spec = NYC_OPEN_DATA
    limiter = limiter or RateLimiter(spec.rate_limit_per_second)
    items: list[tuple[str, str]] = []
    url = f"{spec.api_endpoint}/views/metadata/v1"
    # gate the CONCRETE request URL, not a parent path: a robots rule like
    # 'Disallow: /api/views/metadata' must block this fetch even though
    # '/api/views' is allowed (prefix checks on a shorter path would pass).
    if robots is not None and not robots.can_fetch(url):
        return []  # endpoint disallowed (reference logs + returns [], :364-366)
    for page in range(max_pages):
        limiter.wait()
        params = {"limit": page_size, "offset": page * page_size}
        if api_key:
            params["$$app_token"] = api_key
        status, data = transport.get_json(url, params=params)
        if status != 200 or not isinstance(data, list):
            break  # reference: non-200 → log + return what we have
        for item in data:
            if not isinstance(item, dict):
                continue
            items.append(
                _payload(
                    spec,
                    id=item.get("id", ""),
                    name=item.get("name", "Untitled Dataset"),
                    description=item.get("description", ""),
                    category=item.get("category"),
                    tags=json.dumps(item.get("tags", [])),
                    updated_at=item.get("rowsUpdatedAt"),
                    view_count=item.get("viewCount", 0),
                    columns_count=len(item.get("columns", [])),
                    file_format="CSV/JSON",
                )
            )
        if len(data) < page_size:
            break
    return items


def fetch_dataset_nyc(
    transport: HttpTransport,
    dataset_id: str,
    limiter: RateLimiter | None = None,
    api_key: str | None = None,
    robots: RobotsCache | None = None,
) -> tuple[str, str] | None:
    """Live point-fetch of one NYC dataset's detailed metadata — the
    reference's ``fetch_dataset_metadata`` (``ethical_crawler.py:
    416-451``): GET ``{endpoint}/{id}.json`` (optional app token), map to
    the same normalized payload shape the discovery path spools, None on
    any non-200 (the reference's Optional[DataRecord]). The spool-side
    counterpart is ``adapters.fetch_one``, which does the same point
    lookup over already-spooled payloads as a distributed filter."""
    spec = NYC_OPEN_DATA
    limiter = limiter or RateLimiter(spec.rate_limit_per_second)
    url = f"{spec.api_endpoint}/views/{dataset_id}.json"
    # same compliance gate as discovery, on the concrete point-fetch URL
    if robots is not None and not robots.can_fetch(url):
        return None
    limiter.wait()
    params = {"$$app_token": api_key} if api_key else None
    status, data = transport.get_json(url, params=params)
    if status != 200 or not isinstance(data, dict):
        return None
    return _payload(
        spec,
        id=dataset_id,
        name=data.get("name", "Untitled Dataset"),
        description=data.get("description", ""),
        category=data.get("category"),
        tags=json.dumps(data.get("tags", [])),
        updated_at=data.get("rowsUpdatedAt"),
        view_count=data.get("viewCount", 0),
        columns_count=len(data.get("columns", [])),
        file_format="CSV/JSON",
    )


#: Comtrade's two predefined data types (``ethical_crawler.py:506-521``).
_COMTRADE_TYPES = [
    ("goods", "International Trade in Goods",
     "Trade flows of goods between countries"),
    ("services", "International Trade in Services",
     "Trade flows of services between countries"),
]


def discover_comtrade(
    transport: HttpTransport,
    limiter: RateLimiter | None = None,
    api_key: str | None = None,
) -> list[tuple[str, str]]:
    """Comtrade discovery (``ethical_crawler.py:502-563``): GET
    ``/{type}/metadata`` per predefined type with the
    ``Ocp-Apim-Subscription-Key`` header when a key is present; non-200
    skips that type."""
    spec = UN_COMTRADE
    limiter = limiter or RateLimiter(spec.rate_limit_per_second)
    headers = {"Ocp-Apim-Subscription-Key": api_key} if api_key else {}
    items: list[tuple[str, str]] = []
    for type_id, name, desc in _COMTRADE_TYPES:
        limiter.wait()
        status, _meta = transport.get_json(
            f"{spec.api_endpoint}/{type_id}/metadata", headers=headers
        )
        if status != 200:
            continue
        items.append(
            _payload(
                spec,
                id=type_id,
                name=name,
                description=desc,
                tags=json.dumps(["trade", "international", "economics", type_id]),
                file_format="JSON/CSV",
            )
        )
    return items


#: SEC data feeds probed by HEAD (``ethical_crawler.py:607-627``). The
#: submissions probe appends a known CIK (Apple) as the test object.
_SEC_FEEDS = [
    ("company_facts", "Company Facts", "XBRL facts for all companies",
     "https://data.sec.gov/api/xbrl/companyfacts.zip", ""),
    ("submissions", "Company Submissions", "All company filings metadata",
     "https://data.sec.gov/submissions/", "CIK0000320193.json"),
    ("mutual_fund_prospectus", "Mutual Fund Prospectus",
     "Mutual fund and ETF prospectus summaries",
     "https://data.sec.gov/api/xbrl/frames/", ""),
]


def discover_sec(
    transport: HttpTransport, limiter: RateLimiter | None = None
) -> list[tuple[str, str]]:
    """SEC discovery (``ethical_crawler.py:603-672``): HEAD-probe each
    feed URL with the contact-identifying UA; 200 AND 404 both count as
    accessible (the probe object may not exist — the reference accepts
    both, ``:644``); other statuses skip the feed."""
    spec = SEC_EDGAR
    limiter = limiter or RateLimiter(spec.rate_limit_per_second)
    items: list[tuple[str, str]] = []
    for feed_id, name, desc, url, probe in _SEC_FEEDS:
        limiter.wait()
        try:
            status = transport.head(url + probe, headers=SEC_HEADERS)
        except Exception:
            continue  # reference catches per-feed and moves on (:668-669)
        if status in (200, 404):
            items.append(
                _payload(
                    spec,
                    id=feed_id,
                    name=name,
                    description=desc,
                    tags=json.dumps(["sec", "financial", "filings", "xbrl"]),
                    file_format="JSON/ZIP",
                )
            )
    return items


def discover_scorecard(
    transport: HttpTransport,
    limiter: RateLimiter | None = None,
    api_key: str | None = None,
) -> list[tuple[str, str]]:
    """College Scorecard discovery (``ethical_crawler.py:696-754``):
    requires an api.data.gov key (no key → no items, ``:700-703``); GET
    ``/schools`` with ``_per_page=1`` and a two-field projection as a
    liveness probe, recording the reported total school count."""
    spec = COLLEGE_SCORECARD
    if not api_key:
        return []
    limiter = limiter or RateLimiter(spec.rate_limit_per_second)
    limiter.wait()
    status, data = transport.get_json(
        f"{spec.api_endpoint}/schools",
        params={"api_key": api_key, "_per_page": 1, "_fields": "id,school.name"},
    )
    if status != 200 or not isinstance(data, dict):
        return []
    total = (data.get("metadata") or {}).get("total", 0)
    return [
        _payload(
            spec,
            id="schools",
            name="School Data",
            description=(
                "College and university data including academics, admissions, "
                "aid, cost, completion, earnings, and student body"
            ),
            tags=json.dumps(["education", "college", "university", "scorecard"]),
            view_count=total,
            file_format="JSON",
        )
    ]


def fetch_all(
    transport: HttpTransport,
    api_keys: dict[str, str] | None = None,
    robots: RobotsCache | None = None,
    rate_multiplier: float = 1.0,
) -> list[tuple[str, str]]:
    """Run every source's discovery through one transport — the live
    counterpart of the reference's ``collect_all_data`` fan-out
    (``ethical_crawler.py:938-966``). ``api_keys`` maps source name →
    key. A per-source failure yields that source's partial (possibly
    empty) results, never aborts the sweep. ``rate_multiplier`` scales
    every source's published rate limit (>1 only against fixture/staging
    hosts — production pacing is each spec's own limit)."""
    keys = api_keys or {}
    if robots is None:
        robots = RobotsCache(fetcher=robots_transport(transport).text)
    lim = lambda spec: RateLimiter(  # noqa: E731
        spec.rate_limit_per_second * rate_multiplier
    )
    out: list[tuple[str, str]] = []
    for fn in (
        lambda: discover_nyc(
            transport, limiter=lim(NYC_OPEN_DATA), robots=robots,
            api_key=keys.get(NYC_OPEN_DATA.name),
        ),
        lambda: discover_comtrade(
            transport, limiter=lim(UN_COMTRADE),
            api_key=keys.get(UN_COMTRADE.name),
        ),
        lambda: discover_sec(transport, limiter=lim(SEC_EDGAR)),
        lambda: discover_scorecard(
            transport, limiter=lim(COLLEGE_SCORECARD),
            api_key=keys.get(COLLEGE_SCORECARD.name),
        ),
    ):
        try:
            out.extend(fn())
        except Exception:
            continue  # partial sweep, reference-style
    return out


def spool_jsonl(items: list[tuple[str, str]], path: str) -> int:
    """Write discovery output as the JSONL spool ``cmd_collect --raw``
    reads (one self-describing JSON document per line, ``_source`` field
    already embedded by :func:`_payload`). Returns the line count."""
    with open(path, "w", encoding="utf-8") as fh:
        for _name, doc in items:
            fh.write(doc + "\n")
    return len(items)
