"""Live-transport contract test (VERDICT r4 missing #2): drive
``RealHttpClient`` against an in-process ``http.server`` on loopback (no
external network) and assert its (status, content, redirected_url)
protocol matches what ``MockHttp`` promises the crawl plane — 2xx with
body bytes and the POST-redirect final url, 408 on read timeout, 460 on
any other transport failure, and the reference's exact header envelope
(documentdownloader.py:54-60,94-101) on the wire.

Skips only if the environment can't bind a loopback socket (set
EUROPARL_SKIP_LIVE_TRANSPORT=1 to force-skip)."""

import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from europarl_crawler_ray.stages.fetch import (
    HttpClientConfig,
    RealHttpClient,
    make_http_client,
)

if os.environ.get("EUROPARL_SKIP_LIVE_TRANSPORT") == "1":
    pytest.skip("explicitly disabled", allow_module_level=True)


class _Handler(BaseHTTPRequestHandler):
    seen_headers: list[dict] = []

    def log_message(self, *a):  # keep pytest output clean
        pass

    def do_GET(self):
        type(self).seen_headers.append(dict(self.headers))
        if self.path == "/ok":
            body = b"<html><p>alive</p></html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/hop":
            self.send_response(302)
            self.send_header("Location", "/ok")
            self.send_header("Content-Length", "0")
            self.end_headers()
        elif self.path == "/slow":
            time.sleep(1.5)
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()
        else:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()


@pytest.fixture(scope="module")
def server():
    try:
        srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    except OSError as e:  # sandbox without loopback sockets
        pytest.skip(f"cannot bind loopback: {e}")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _client(timeout_s: float = 5.0) -> RealHttpClient:
    return RealHttpClient(
        HttpClientConfig(request_timeout_factor=timeout_s, stop_wait_secs=1.0)
    )


def test_200_returns_body_and_final_url(server):
    status, content, final = _client().fetch(f"{server}/ok")
    assert status == 200
    assert content == b"<html><p>alive</p></html>"
    assert final == f"{server}/ok"


def test_redirect_is_followed_and_final_url_reported(server):
    # allow_redirects=True (documentdownloader.py:98): the crawl plane
    # records the FINAL url as redirected_url, like MockHttp does
    status, content, final = _client().fetch(f"{server}/hop")
    assert status == 200 and content == b"<html><p>alive</p></html>"
    assert final == f"{server}/ok"


def test_read_timeout_maps_to_408_with_original_url(server):
    url = f"{server}/slow"
    status, content, final = _client(timeout_s=0.3).fetch(url)
    assert (status, content, final) == (408, None, url)


def test_transport_failure_maps_to_460_with_original_url(server):
    # a port nothing listens on -> ConnectionError -> 460
    dead = "http://127.0.0.1:9/nothing"
    status, content, final = _client(timeout_s=0.5).fetch(dead)
    assert (status, content, final) == (460, None, dead)


def test_request_envelope_matches_reference_header_block(server):
    _Handler.seen_headers.clear()
    cli = RealHttpClient(HttpClientConfig(seed=7))
    n = 6
    for _ in range(n):
        cli.fetch(f"{server}/ok")
    assert len(_Handler.seen_headers) == n
    for h in _Handler.seen_headers:
        for k, v in HttpClientConfig.BASE_HEADERS.items():
            assert h.get(k) == v, f"header {k} missing/wrong on the wire"
    # the UA rotates per request along the SAME deterministic sequence
    # build_headers() yields (the reference draws ua.random each time;
    # consecutive repeats are legal, a frozen UA is not)
    expected = []
    ref = HttpClientConfig(seed=7)
    for _ in range(n):
        expected.append(ref.build_headers()["User-Agent"])
    got = [h["User-Agent"] for h in _Handler.seen_headers]
    assert got == expected
    assert len(set(got)) > 1  # it actually rotates


def test_mock_and_real_share_the_fetch_protocol(server):
    """The seam contract: both transports are constructed through
    make_http_client and expose fetch(url, attempt, rulename) ->
    (int status, bytes|None, str redirected_url)."""
    mock = make_http_client("mock", seed=7)
    real = make_http_client("real", seed=7)
    assert hasattr(mock, "fetch") and hasattr(real, "fetch")
    ms, mc, mu = mock.fetch(
        "https://www.europarl.europa.eu/doceo/document/PV-9-2019-07-03_EN.html"
    )
    rs, rc, ru = real.fetch(f"{server}/ok")
    for s, c, u in ((ms, mc, mu), (rs, rc, ru)):
        assert isinstance(s, int) and (c is None or isinstance(c, bytes))
        assert isinstance(u, str)
