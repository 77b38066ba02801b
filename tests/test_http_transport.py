"""sources/http.py — the reference's urllib3 retry semantics
(spotify_etl_v2.py:36-43) replicated over stdlib, plus the live
HttpSpotifyClient end-to-end against an in-process http.server and
through the Spark mapInPandas ingestion operators."""

from __future__ import annotations

import base64
import http.server
import json
import threading
import urllib.parse

import pytest

from spotify_data_pipeline_spark.sources.http import (
    BACKOFF_MAX,
    HttpError,
    HttpSpotifyClient,
    HttpTransport,
    RetryPolicy,
)


class ScriptedSend:
    """Queue of (status, headers, body) responses + a call/sleep log."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = []

    def __call__(self, method, url, headers, body):
        self.calls.append((method, url))
        if not self.responses:
            raise AssertionError("send called more times than scripted")
        r = self.responses.pop(0)
        if isinstance(r, Exception):
            raise r
        return r


def _transport(responses, policy=None):
    sleeps = []
    t = HttpTransport(
        policy=policy or RetryPolicy(),
        send=ScriptedSend(responses),
        sleep=sleeps.append,
        now=lambda: 1_000_000.0,
    )
    return t, sleeps


def test_retries_forcelist_then_succeeds():
    t, sleeps = _transport(
        [
            (500, {}, b"boom"),
            (503, {}, b"boom"),
            (200, {}, b'{"ok": 1}'),
        ]
    )
    assert t.request_json("GET", "http://x/a") == {"ok": 1}
    assert len(t.send.calls) == 3
    # no sleep before the first retry, then factor*2^(i-1)
    assert sleeps == [2.0]


def test_backoff_sequence_and_cap():
    p = RetryPolicy(total=8, backoff_factor=1.0)
    assert [p.backoff_time(i) for i in range(1, 9)] == [
        0.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, BACKOFF_MAX,
    ]


def test_gives_up_returning_last_response():
    """raise_on_status=False: 6 requests total (1 + 5 retries), the
    last 429 comes back; the JSON layer raises loudly."""
    t, _ = _transport([(429, {}, b"limited")] * 6)
    status, _, body = t.request("GET", "http://x/a")
    assert status == 429 and body == b"limited"
    assert len(t.send.calls) == 6
    with pytest.raises(HttpError) as ei:
        _transport([(429, {}, b"limited")] * 6)[0].request_json("GET", "http://x/a")
    assert ei.value.status == 429


def test_retry_after_seconds_overrides_backoff():
    t, sleeps = _transport(
        [
            (429, {"retry-after": "7"}, b""),
            (429, {"retry-after": "3"}, b""),
            (200, {}, b"{}"),
        ]
    )
    t.request("GET", "http://x/a")
    assert sleeps == [7.0, 3.0]  # header wins over 0.0 / 2.0


def test_retry_after_http_date():
    t, sleeps = _transport(
        [
            # 90 seconds after the fake now() epoch (1_000_000)
            (503, {"retry-after": "Mon, 12 Jan 1970 13:48:10 GMT"}, b""),
            (200, {}, b"{}"),
        ]
    )
    t.request("GET", "http://x/a")
    assert sleeps == [90.0]


def test_retry_after_malformed_falls_back_to_backoff():
    """Since Python 3.10 parsedate_to_datetime RAISES on garbage; a
    malformed Retry-After on a retryable status must fall back to the
    computed backoff schedule, not crash the request (ADVICE r07 —
    urllib3 ignores unparseable Retry-After)."""
    t, sleeps = _transport(
        [
            (429, {"retry-after": "soonish"}, b""),
            (503, {"retry-after": "1h"}, b""),
            (200, {}, b"{}"),
        ]
    )
    t.request("GET", "http://x/a")
    # computed schedule: no sleep before the first retry (0.0 is not
    # slept), then factor*2^1
    assert sleeps == [2.0]


def test_non_forcelist_status_not_retried():
    t, sleeps = _transport([(404, {}, b"missing")])
    with pytest.raises(HttpError):
        t.request_json("GET", "http://x/a")
    assert len(t.send.calls) == 1 and sleeps == []


def test_non_allowed_method_not_retried():
    t, _ = _transport([(500, {}, b"boom")])
    status, _, _ = t.request("DELETE", "http://x/a")
    assert status == 500
    assert len(t.send.calls) == 1


def test_connection_errors_retried_then_raised():
    t, sleeps = _transport(
        [ConnectionResetError("rst"), ConnectionResetError("rst"), (200, {}, b"{}")]
    )
    assert t.request("GET", "http://x/a")[0] == 200
    assert sleeps == [2.0]
    t2, _ = _transport([ConnectionResetError("rst")] * 6 + [(200, {}, b"{}")])
    with pytest.raises(ConnectionResetError):
        t2.request("GET", "http://x/a")


def _token_response():
    return (200, {}, json.dumps({"access_token": "tok1", "expires_in": 3600}).encode())


def test_client_token_cached_until_expiry():
    clock = {"t": 0.0}
    sends = ScriptedSend(
        [
            _token_response(),
            (200, {}, b'{"artists": [{"id": "a1"}]}'),
            (200, {}, b'{"artists": [{"id": "a1"}]}'),
            # after expiry: re-auth then fetch
            (200, {}, json.dumps({"access_token": "tok2", "expires_in": 3600}).encode()),
            (200, {}, b'{"artists": [{"id": "a1"}]}'),
        ]
    )
    t = HttpTransport(send=sends, sleep=lambda s: None, now=lambda: clock["t"])
    c = HttpSpotifyClient(
        base_url="http://api", token_url="http://auth/token",
        client_id="id", client_secret="sec", transport=t,
    )
    assert c.artists(["a1"]) == [{"id": "a1"}]
    assert c.artists(["a1"]) == [{"id": "a1"}]  # token reused
    clock["t"] = 3600.0  # past expiry-60s
    assert c.artists(["a1"]) == [{"id": "a1"}]
    token_calls = [u for _, u in sends.calls if "auth" in u]
    assert len(token_calls) == 2


def test_artists_batches_of_50():
    sends = ScriptedSend(
        [_token_response()]
        + [(200, {}, json.dumps({"artists": [{"id": f"a{i}"} for i in range(50)]}).encode())] * 2
    )
    t = HttpTransport(send=sends, sleep=lambda s: None, now=lambda: 0.0)
    c = HttpSpotifyClient(
        base_url="http://api", token_url="http://auth/token",
        client_id="id", client_secret="sec", transport=t,
    )
    got = c.artists([f"x{i}" for i in range(60)])
    assert len(got) == 100  # 2 scripted pages
    api_calls = [u for _, u in sends.calls if "/artists" in u]
    assert len(api_calls) == 2
    q0 = urllib.parse.parse_qs(urllib.parse.urlparse(api_calls[0]).query)
    assert len(q0["ids"][0].split(",")) == 50


# --- live end-to-end: in-process HTTP server ---------------------------


class _SpotifyishHandler(http.server.BaseHTTPRequestHandler):
    """Minimal Spotify-shaped endpoint: first /artists hit returns 503
    with Retry-After (the retry path exercised over REAL sockets), then
    serves; paginated albums; client-credentials token endpoint."""

    flaky_remaining = 1
    albums = [{"id": f"al{i}", "name": f"Album {i}"} for i in range(5)]

    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        if self.path == "/api/token":
            auth = self.headers.get("Authorization", "")
            assert auth.startswith("Basic ")
            assert base64.b64decode(auth[6:]).decode() == "cid:csec"
            self._json({"access_token": "live-token", "expires_in": 3600})
        else:
            self.send_error(404)

    def do_GET(self):
        url = urllib.parse.urlparse(self.path)
        params = {k: v[0] for k, v in urllib.parse.parse_qs(url.query).items()}
        if self.headers.get("Authorization") != "Bearer live-token":
            self.send_error(401)
            return
        if url.path == "/artists":
            if _SpotifyishHandler.flaky_remaining > 0:
                _SpotifyishHandler.flaky_remaining -= 1
                self.send_response(503)
                self.send_header("Retry-After", "0")
                self.end_headers()
                return
            ids = params["ids"].split(",")
            self._json({"artists": [{"id": i, "name": i.upper()} for i in ids]})
        elif url.path.startswith("/artists/") and url.path.endswith("/albums"):
            limit, offset = int(params["limit"]), int(params["offset"])
            page = self.albums[offset : offset + limit]
            nxt = "next" if offset + limit < len(self.albums) else None
            self._json({"items": page, "next": nxt})
        else:
            self.send_error(404)

    def _json(self, obj):
        body = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def live_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _SpotifyishHandler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_live_client_retries_and_fetches(live_server):
    _SpotifyishHandler.flaky_remaining = 1
    c = HttpSpotifyClient(
        base_url=live_server, token_url=f"{live_server}/api/token",
        client_id="cid", client_secret="csec",
    )
    got = c.artists(["a1", "a2"])
    assert got == [{"id": "a1", "name": "A1"}, {"id": "a2", "name": "A2"}]
    assert c.artist_albums("a1", limit=2, offset=0)["next"] == "next"


def test_live_client_through_spark_ingestion(spark, live_server):
    """The production client through the UNCHANGED mapInPandas
    operators — the seam's whole point: swap FakeSpotifyClient for
    HttpSpotifyClient and the engine's ingestion runs against real
    sockets (pagination loop included)."""
    from spotify_data_pipeline_spark.sources.rest import (
        fetch_artists,
        fetch_paginated,
    )

    _SpotifyishHandler.flaky_remaining = 0
    c = HttpSpotifyClient(
        base_url=live_server, token_url=f"{live_server}/api/token",
        client_id="cid", client_secret="csec",
    )
    keys = spark.createDataFrame([("a1",), ("a2",)], "artist_id string")
    rows = fetch_artists(keys, c, batch_size=50).collect()
    assert {json.loads(r.payload)["name"] for r in rows} == {"A1", "A2"}

    albums = fetch_paginated(
        keys.limit(1), c, "artist_albums", "artist_id", page_size=2
    ).collect()
    assert len(albums) == 5  # 3 pages of 2/2/1 — the cursor loop ran
    assert {json.loads(r.payload)["id"] for r in albums} == {
        "al0", "al1", "al2", "al3", "al4"
    }