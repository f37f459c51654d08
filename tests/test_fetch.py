"""Live HTTP discovery layer against a local ``http.server`` fixture.

Covers the transport behaviors the reference exercises over the real
APIs (``ethical_crawler.py:359-414, 502-563, 603-672, 696-754, 220-263``):
Socrata offset paging, rate-limit pacing between requests, robots.txt
gating (disallow blocks, fetch-failure fails open), SEC HEAD 200/404
semantics, Comtrade subscription-key header, Scorecard key requirement —
and ``cmd_fetch`` → ``cmd_collect`` end-to-end through the fixture
server into the Spark catalog.
"""

from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlsplit

import pytest

from ethical_data_ingestion_spark.sources.adapters import RateLimiter
from ethical_data_ingestion_spark.sources.fetch import (
    HttpTransport,
    discover_comtrade,
    discover_nyc,
    discover_scorecard,
    discover_sec,
    fetch_all,
    fetch_dataset_nyc,
    robots_transport,
    spool_jsonl,
)
from ethical_data_ingestion_spark.sources.robots import RobotsCache

#: Socrata-shaped catalog items served by the fixture.
NYC_ITEMS = [
    {
        "id": f"abcd-00{i}",
        "name": f"Taxi Trips {i}",
        "description": "Yellow taxi trip records",
        "category": "Transportation",
        "tags": ["taxi", "transport"],
        "rowsUpdatedAt": 1700000000 + i,
        "viewCount": 1000 * i,
        "columns": [{"name": "c"}] * 3,
    }
    for i in range(5)
]

_FAST = lambda: RateLimiter(10_000)  # noqa: E731 — no pacing in unit tests


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # silence per-request stderr lines
        pass

    def _record(self):
        u = urlsplit(self.path)
        self.server.requests.append(
            {
                "t": time.monotonic(),
                "method": self.command,
                "path": u.path,
                "query": dict(parse_qsl(u.query)),
                "headers": {k.lower(): v for k, v in self.headers.items()},
            }
        )

    def _send(self, status: int, body: bytes = b"", head_only: bool = False):
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if not head_only and body:
            self.wfile.write(body)

    def do_GET(self):
        self._record()
        cfg = self.server.cfg
        u = urlsplit(self.path)
        q = dict(parse_qsl(u.query))
        if u.path == "/robots.txt":
            status = cfg.get("robots_status", 200)
            self._send(status, cfg.get("robots", "").encode())
        elif u.path == "/api/views/metadata/v1":
            limit, offset = int(q.get("limit", 5000)), int(q.get("offset", 0))
            page = cfg.get("nyc_items", NYC_ITEMS)[offset : offset + limit]
            self._send(200, json.dumps(page).encode())
        elif u.path.startswith("/api/views/") and u.path.endswith(".json"):
            ds_id = u.path[len("/api/views/"):-len(".json")]
            match = [i for i in NYC_ITEMS if i["id"] == ds_id]
            if match:
                self._send(200, json.dumps(match[0]).encode())
            else:
                self._send(404, b"{}")
        elif u.path in ("/data/v1/goods/metadata", "/data/v1/services/metadata"):
            if cfg.get("comtrade_requires_key") and (
                self.headers.get("Ocp-Apim-Subscription-Key") is None
            ):
                self._send(401, b'{"error":"missing subscription key"}')
            else:
                self._send(200, b'{"availableYears":[2022,2023]}')
        elif u.path == "/ed/collegescorecard/v1/schools":
            if "api_key" not in q:
                self._send(403, b'{"error":"API_KEY_MISSING"}')
            else:
                self._send(
                    200,
                    json.dumps(
                        {"metadata": {"total": 6543}, "results": [{"id": 1}]}
                    ).encode(),
                )
        else:
            self._send(404, b"{}")

    def do_HEAD(self):
        self._record()
        cfg = self.server.cfg
        path = urlsplit(self.path).path
        status = {
            "/api/xbrl/companyfacts.zip": cfg.get("sec_facts_status", 200),
            "/submissions/CIK0000320193.json": 404,  # probe object absent: OK
            "/api/xbrl/frames/": 200,
        }.get(path, 404)
        self._send(status, head_only=True)


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.cfg = {}
    srv.requests = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    t.join(timeout=5)


def _transport(srv) -> HttpTransport:
    host, port = srv.server_address
    return HttpTransport(base_override=f"http://{host}:{port}", timeout=5)


def test_socrata_paging(server):
    items = discover_nyc(_transport(server), limiter=_FAST(), page_size=2)
    assert len(items) == 5
    pages = [r for r in server.requests if r["path"] == "/api/views/metadata/v1"]
    assert [(p["query"]["limit"], p["query"]["offset"]) for p in pages] == [
        ("2", "0"), ("2", "2"), ("2", "4"),
    ]  # stops on the short page — no probe request past the end
    names = [json.loads(doc)["name"] for _s, doc in items]
    assert names == [f"Taxi Trips {i}" for i in range(5)]
    # payloads are the normalized spool shape raw_to_records consumes
    doc = json.loads(items[0][1])
    assert doc["_source"] == "NYC Open Data"
    assert doc["id"] == "abcd-000" and doc["columns_count"] == 3
    assert json.loads(doc["tags"]) == ["taxi", "transport"]


def test_socrata_app_token_param(server):
    discover_nyc(_transport(server), limiter=_FAST(), api_key="tok123")
    page = [r for r in server.requests if r["path"] == "/api/views/metadata/v1"][0]
    assert page["query"]["$$app_token"] == "tok123"


def test_rate_limit_pacing(server):
    # 3 page requests at 25 req/s: gaps between consecutive requests must
    # respect the 40 ms floor (first request is unpaced by design).
    discover_nyc(_transport(server), limiter=RateLimiter(25), page_size=2)
    pages = [r for r in server.requests if r["path"] == "/api/views/metadata/v1"]
    assert len(pages) == 3
    gaps = [b["t"] - a["t"] for a, b in zip(pages, pages[1:])]
    assert all(g >= 0.035 for g in gaps), gaps  # 40ms minus timer slack


def test_robots_disallow_blocks_discovery(server):
    server.cfg["robots"] = "User-agent: *\nDisallow: /api\n"
    tr = _transport(server)
    items = discover_nyc(
        tr, limiter=_FAST(), robots=RobotsCache(fetcher=tr.text)
    )
    assert items == []
    # gated BEFORE any catalog request went out
    assert [r["path"] for r in server.requests] == ["/robots.txt"]


def test_robots_fetch_failure_fails_open(server):
    server.cfg["robots_status"] = 500
    tr = _transport(server)
    items = discover_nyc(
        tr, limiter=_FAST(), robots=RobotsCache(fetcher=tr.text)
    )
    assert len(items) == 5  # unreachable robots.txt ⇒ assume allowed


def test_sec_head_probes(server):
    items = discover_sec(_transport(server), limiter=_FAST())
    # companyfacts 200 + submissions 404 (accepted) + frames 200 → 3 feeds
    assert [json.loads(d)["id"] for _s, d in items] == [
        "company_facts", "submissions", "mutual_fund_prospectus",
    ]
    heads = [r for r in server.requests if r["method"] == "HEAD"]
    assert len(heads) == 3
    assert heads[0]["headers"]["user-agent"].startswith("Research Institution")


def test_sec_inaccessible_feed_skipped(server):
    server.cfg["sec_facts_status"] = 403
    items = discover_sec(_transport(server), limiter=_FAST())
    assert [json.loads(d)["id"] for _s, d in items] == [
        "submissions", "mutual_fund_prospectus",
    ]


def test_comtrade_key_header(server):
    items = discover_comtrade(_transport(server), limiter=_FAST(), api_key="sub-1")
    assert len(items) == 2  # goods + services
    gets = [r for r in server.requests if r["path"].startswith("/data/v1/")]
    assert all(g["headers"]["ocp-apim-subscription-key"] == "sub-1" for g in gets)


def test_comtrade_non_200_skips_type(server):
    server.cfg["comtrade_requires_key"] = True
    items = discover_comtrade(_transport(server), limiter=_FAST())  # no key
    assert items == []


def test_scorecard_requires_key(server):
    assert discover_scorecard(_transport(server), limiter=_FAST()) == []
    assert server.requests == []  # no key → no request at all
    items = discover_scorecard(_transport(server), limiter=_FAST(), api_key="k")
    doc = json.loads(items[0][1])
    assert doc["id"] == "schools" and doc["view_count"] == 6543
    probe = server.requests[0]
    assert probe["query"]["_per_page"] == "1"
    assert probe["query"]["_fields"] == "id,school.name"


def test_fetch_all_partial_on_source_failure(server):
    # Scorecard has no key and Comtrade 401s: the sweep still returns the
    # NYC + SEC + (unkeyed-but-200) sources it could reach.
    server.cfg["comtrade_requires_key"] = True
    items = fetch_all(_transport(server), rate_multiplier=10_000)
    sources = {s for s, _d in items}
    assert sources == {"NYC Open Data", "SEC EDGAR"}
    assert len(items) == 5 + 3


def test_cmd_fetch_collect_end_to_end(server, spark, tmp_path):
    """fetch (fixture server) → JSONL spool → cmd_collect → catalog rows:
    the reference's collect lifecycle with a live transport."""
    from ethical_data_ingestion_spark import cli

    host, port = server.server_address
    spool = tmp_path / "live.jsonl"
    n = cli.cmd_fetch(
        str(spool),
        api_keys={"UN Comtrade": "sub-1", "College Scorecard": "k2"},
        base_override=f"http://{host}:{port}",
        rate_multiplier=10_000,
    )
    assert n == 5 + 2 + 3 + 1  # nyc pages + comtrade types + sec feeds + scorecard
    assert len(spool.read_text().splitlines()) == n

    for t in ("data_records", "compliance_checks", "data_sources"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    cli.cmd_setup(spark)
    counts = cli.cmd_collect(
        spark, str(spool), api_keys={"UN Comtrade", "College Scorecard"}
    )
    assert counts["_quarantined"] == 0
    assert counts["_inserted"] == n
    from pyspark.sql import functions as F

    recs = spark.table("data_records")
    by_source = {
        r.source_name: r.n
        for r in recs.groupBy("source_name").agg(F.count("*").alias("n")).collect()
    }
    assert by_source == {
        "NYC Open Data": 5, "UN Comtrade": 2, "SEC EDGAR": 3,
        "College Scorecard": 1,
    }
    # the normalized payload fields survived the distributed mapping
    taxi = recs.filter(recs.record_id == "abcd-000").collect()[0]
    assert taxi.title == "Taxi Trips 0"
    assert taxi.tags == ["taxi", "transport"]


def test_fetch_dataset_point_lookup(server):
    item = fetch_dataset_nyc(_transport(server), "abcd-003", limiter=_FAST())
    assert item is not None
    doc = json.loads(item[1])
    assert doc["id"] == "abcd-003" and doc["name"] == "Taxi Trips 3"
    assert fetch_dataset_nyc(_transport(server), "zzzz-999", limiter=_FAST()) is None


def test_robots_transport_tighter_timeout(server):
    tr = _transport(server)
    rt = robots_transport(tr)
    assert rt.timeout == 10.0
    assert rt.base_override == tr.base_override


def test_spool_jsonl_roundtrip(tmp_path):
    items = [("A", '{"_source":"A","id":"1"}'), ("B", '{"_source":"B","id":"2"}')]
    path = tmp_path / "s.jsonl"
    assert spool_jsonl(items, str(path)) == 2
    lines = [json.loads(ln) for ln in path.read_text().splitlines()]
    assert [ln["_source"] for ln in lines] == ["A", "B"]


def test_robots_gates_the_concrete_request_path(server):
    """A rule disallowing the metadata sub-path must block discovery even
    though the parent '/api/views' is allowed — the gate checks the URL
    actually fetched, not a shorter prefix of it."""
    server.cfg["robots"] = "User-agent: *\nDisallow: /api/views/metadata\n"
    tr = _transport(server)
    items = discover_nyc(
        tr, limiter=_FAST(), robots=RobotsCache(fetcher=tr.text)
    )
    assert items == []
    assert [r["path"] for r in server.requests] == ["/robots.txt"]


def test_point_fetch_is_robots_gated(server):
    server.cfg["robots"] = "User-agent: *\nDisallow: /api/views/abcd-003.json\n"
    tr = _transport(server)
    robots = RobotsCache(fetcher=tr.text)
    assert (
        fetch_dataset_nyc(tr, "abcd-003", limiter=_FAST(), robots=robots)
        is None
    )
    assert [r["path"] for r in server.requests] == ["/robots.txt"]
    # a different, allowed dataset still fetches through the same cache
    item = fetch_dataset_nyc(tr, "abcd-001", limiter=_FAST(), robots=robots)
    assert item is not None


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_LIVE") != "1",
    reason="live-network smoke; opt in with SPARK_GRAFT_LIVE=1",
)
def test_live_nyc_discovery_smoke():
    """Opt-in LIVE smoke against the real NYC Open Data endpoint (round-4
    verdict item 7): the default test path exercises the fetch layer only
    through the local fixture server, which can't catch bit-rot in the
    real transport/endpoint contract (TLS, redirects, schema drift).
    One metadata page, one robots fetch — within the source's published
    rate limit and robots rules by construction."""
    from ethical_data_ingestion_spark.sources.fetch import (
        HttpTransport,
        RobotsCache,
        discover_nyc,
        robots_transport,
    )

    transport = HttpTransport()
    robots = RobotsCache(robots_transport(transport))
    items = discover_nyc(transport, robots=robots, page_size=3, max_pages=1)
    assert len(items) == 3
    source, payload = items[0]
    assert source == "NYC Open Data"
    parsed = json.loads(payload)
    assert parsed["id"] and parsed["name"]
