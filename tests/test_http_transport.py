"""Hermetic tests for the real HTTP/OAuth2 transport.

An in-process `ThreadingHTTPServer` implements the API surface the
reference client talks to (/oauth2/token refresh, /transactions with
auth + paging + since/before, /balance, /pots), with switchable fault
modes (flaky 5xx, expired access token). No network leaves localhost;
the fake fetch remains the default everywhere else.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import urllib.parse
from datetime import datetime, timedelta
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from monzo_data_pipeline_spark.sources.http_transport import (  # noqa: E402
    ApiAuthError,
    ApiClient,
    FileTokenStore,
    OAuth2TokenManager,
    make_http_fetch,
)

BASE_TS = datetime(2025, 3, 1)


def _make_rows(n: int) -> list[dict]:
    rows = []
    for i in range(n):
        rows.append(
            {
                "id": f"tx_{i:06d}",
                "description": f"Payment {i}",
                "amount": -(100 + i),
                "currency": "GBP",
                "created": (BASE_TS + timedelta(minutes=i)).isoformat(),
                "category": "general",
                "notes": "",
                "is_load": False,
                "settled": (
                    (BASE_TS + timedelta(minutes=i, hours=6)).isoformat()
                    if i % 4
                    else None
                ),
                "local_amount": -(100 + i),
                "local_currency": "GBP",
                "counterparty": None,
                "merchant": (
                    {"id": f"m_{i % 5}", "name": f"M {i % 5}"}
                    if i % 3
                    else None
                ),
            }
        )
    return rows


class _ApiState:
    """Mutable server-side state shared with the tests."""

    def __init__(self, rows: list[dict]):
        self.rows = rows
        self.refresh_tokens = {"rt_0"}  # currently-valid refresh tokens
        self.access_tokens: set[str] = set()
        self.token_seq = 0
        self.rotate_refresh = True
        self.fail_next = 0  # serve this many 503s before succeeding
        self.requests: list[dict] = []  # (path, params) log
        self.lock = threading.Lock()


def _handler_for(state: _ApiState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if urllib.parse.urlparse(self.path).path != "/oauth2/token":
                return self._json(404, {"error": "not_found"})
            n = int(self.headers.get("Content-Length", "0"))
            form = urllib.parse.parse_qs(self.rfile.read(n).decode())
            if form.get("grant_type", [""])[0] == "authorization_code":
                if form.get("code", [""])[0] != "good_code":
                    return self._json(400, {"code": "bad_authorization_code"})
                with state.lock:
                    state.token_seq += 1
                    at = f"at_{state.token_seq}"
                    state.access_tokens.add(at)
                    new_rt = f"rt_{state.token_seq}"
                    state.refresh_tokens = {new_rt}
                return self._json(
                    200,
                    {
                        "access_token": at,
                        "refresh_token": new_rt,
                        "expires_in": 3600,
                    },
                )
            rt = form.get("refresh_token", [""])[0]
            with state.lock:
                if rt not in state.refresh_tokens:
                    return self._json(
                        401,
                        {"code": "unauthorized.bad_refresh_token.evicted"},
                    )
                state.token_seq += 1
                at = f"at_{state.token_seq}"
                state.access_tokens.add(at)
                payload = {"access_token": at, "expires_in": 3600}
                if state.rotate_refresh:
                    new_rt = f"rt_{state.token_seq}"
                    state.refresh_tokens = {new_rt}
                    payload["refresh_token"] = new_rt
            return self._json(200, payload)

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            params = {
                k: v[0] for k, v in urllib.parse.parse_qs(parsed.query).items()
            }
            with state.lock:
                state.requests.append({"path": parsed.path, **params})
                if state.fail_next > 0:
                    state.fail_next -= 1
                    return self._json(503, {"error": "try_later"})
                auth = self.headers.get("Authorization", "")
                token_ok = (
                    auth.startswith("Bearer ")
                    and auth.removeprefix("Bearer ") in state.access_tokens
                )
            if not token_ok:
                return self._json(401, {"error": "unauthorized"})
            if parsed.path == "/transactions":
                rows = state.rows
                since = params.get("since")
                if since:
                    if since.startswith("tx_"):  # id = exclusive cursor
                        rows = [r for r in rows if r["id"] > since]
                    else:  # ISO timestamp = inclusive lower bound
                        rows = [r for r in rows if r["created"] >= since]
                before = params.get("before")
                if before:
                    rows = [r for r in rows if r["created"] < before]
                limit = int(params.get("limit", "200"))
                return self._json(200, {"transactions": rows[:limit]})
            if parsed.path == "/balance":
                return self._json(
                    200,
                    {
                        "balance": 1000,
                        "total_balance": 1500,
                        "currency": "GBP",
                        "spend_today": -250,
                    },
                )
            if parsed.path == "/pots":
                return self._json(200, {"pots": [{"id": "pot_0"}]})
            if parsed.path == "/ping/whoami":
                return self._json(200, {"authenticated": True})
            if parsed.path == "/accounts":
                return self._json(
                    200,
                    {"accounts": [{"id": "acc_1", "type": "uk_retail"}]},
                )
            return self._json(404, {"error": "not_found"})

    return Handler


@pytest.fixture()
def api_server():
    state = _ApiState(_make_rows(450))
    server = ThreadingHTTPServer(("127.0.0.1", 0), _handler_for(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base_url = f"http://127.0.0.1:{server.server_address[1]}"
    yield base_url, state
    server.shutdown()
    server.server_close()


def _seed_store(tmp_path, access: str | None = None, expires_in_s: int = 0):
    from datetime import timezone

    store = FileTokenStore(str(tmp_path / "tokens.json"))
    tokens = {"refresh_token": "rt_0"}
    if access is not None:
        from datetime import datetime as dt

        tokens["access_token"] = access
        tokens["expires_at"] = (
            dt.now(timezone.utc) + timedelta(seconds=expires_in_s)
        ).isoformat()
    store.put(tokens)
    return store


def _manager(base_url, store):
    return OAuth2TokenManager(
        "cid", "csecret", store, token_url=f"{base_url}/oauth2/token"
    )


def test_refresh_flow_and_rotation(api_server, tmp_path):
    base_url, state = api_server
    store = _seed_store(tmp_path)  # refresh token only, no access token
    tm = _manager(base_url, store)
    token = tm.get_valid_token()
    assert token == "at_1"
    # rotated refresh token persisted durably (Secrets-Manager analog)
    assert store.get()["refresh_token"] == "rt_1"
    # second call: stored access token still valid → no new refresh
    assert tm.get_valid_token() == "at_1"
    assert state.token_seq == 1


def test_evicted_refresh_token_raises_auth_error(api_server, tmp_path):
    base_url, state = api_server
    store = _seed_store(tmp_path)
    with state.lock:
        state.refresh_tokens = set()  # grant evicted server-side
    with pytest.raises(ApiAuthError, match="re-authorization required"):
        _manager(base_url, store).get_valid_token()


def test_paging_drains_window_without_dup_or_skip(api_server, tmp_path):
    base_url, state = api_server
    store = _seed_store(tmp_path, access="seed", expires_in_s=0)  # expired
    with state.lock:
        state.access_tokens.add("seed")
    client = ApiClient(base_url, "acc_1", _manager(base_url, store), page_limit=100)
    rows = client.get_transactions(
        since=BASE_TS.isoformat(),
        before=(BASE_TS + timedelta(minutes=450)).isoformat(),
    )
    assert [r["id"] for r in rows] == [f"tx_{i:06d}" for i in range(450)]
    # 5 pages: 100×4 + 50; cursor advanced by id each page
    tx_reqs = [r for r in state.requests if r["path"] == "/transactions"]
    assert len(tx_reqs) == 5
    assert tx_reqs[1]["since"] == "tx_000099"
    # the window bounds reached the wire on every page (pushdown)
    assert all(r["before"] for r in tx_reqs)
    assert all(r["expand[]"] == "merchant" for r in tx_reqs)


def test_retry_on_5xx_then_success(api_server, tmp_path):
    base_url, state = api_server
    store = _seed_store(tmp_path, access="at_ok", expires_in_s=3600)
    with state.lock:
        state.access_tokens.add("at_ok")
        state.fail_next = 2
    client = ApiClient(
        base_url, "acc_1", _manager(base_url, store), backoff_s=0.01
    )
    assert client.get_balance() == {
        "balance": 1000,
        "total_balance": 1500,
        "currency": "GBP",
        "spend_today": 250,  # abs-normalized, reference api_client.py:219
    }


def test_refresh_on_401_midflight(api_server, tmp_path):
    base_url, state = api_server
    # stored token claims 1h of validity but the server no longer
    # accepts it → the client must force ONE refresh and succeed
    store = _seed_store(tmp_path, access="at_revoked", expires_in_s=3600)
    client = ApiClient(base_url, "acc_1", _manager(base_url, store))
    assert client.list_pots() == [{"id": "pot_0"}]
    assert state.token_seq == 1


def test_distributed_ingest_over_real_transport(api_server, tmp_path, spark):
    """End-to-end: cursor windows fan out through mapInPandas, every
    task fetches its window over real HTTP, bronze flatten applies —
    same pipeline as the fake, only the transport swapped."""
    from monzo_data_pipeline_spark.pipeline.ingest import (
        cursor_windows,
        fetch_transactions_distributed,
        flatten_bronze,
    )

    base_url, state = api_server
    store = _seed_store(tmp_path, access="at_exec", expires_in_s=3600)
    with state.lock:
        state.access_tokens.add("at_exec")
    fetch = make_http_fetch(
        base_url=base_url,
        account_id="acc_1",
        client_id="cid",
        client_secret="csecret",
        token_path=str(tmp_path / "tokens.json"),
        page_limit=100,
    )
    windows = cursor_windows(BASE_TS, BASE_TS + timedelta(minutes=450), 4)
    wire = fetch_transactions_distributed(spark, fetch, windows)
    bronze = flatten_bronze(wire, "2025-03-02T00:00:00")
    pdf = bronze.toPandas()
    assert len(pdf) == 450
    assert pdf["id"].nunique() == 450
    assert pdf["merchant_id"].notna().sum() == sum(
        1 for i in range(450) if i % 3
    )


def test_monzo_api_source_with_http_transport(api_server, tmp_path, spark):
    """spark.read.format('monzo_api') with transport=http: the Spark
    data source's InputPartitions fetch over real HTTP per window."""
    from monzo_data_pipeline_spark.sources.api_source import register

    base_url, state = api_server
    store = _seed_store(tmp_path, access="at_ds", expires_in_s=3600)
    with state.lock:
        state.access_tokens.add("at_ds")
    register(spark)
    df = (
        spark.read.format("monzo_api")
        .option("transport", "http")
        .option("base_url", base_url)
        .option("account_id", "acc_1")
        .option("client_id", "cid")
        .option("client_secret", "csecret")
        .option("token_path", str(tmp_path / "tokens.json"))
        .option("page_limit", "100")
        .option("since", BASE_TS.isoformat())
        .option("before", (BASE_TS + timedelta(minutes=450)).isoformat())
        .option("window_hours", "4")
        .load()
    )
    pdf = df.toPandas()
    assert len(pdf) == 450
    assert pdf["id"].nunique() == 450


def test_authorization_code_flow_seeds_token_store(api_server, tmp_path):
    """A27 end-to-end: build auth URL → exchange code → store seeded →
    manager refreshes from there with no further user action."""
    from monzo_data_pipeline_spark.sources.http_transport import (
        build_authorization_url,
        exchange_authorization_code,
    )

    base_url, state = api_server
    url = build_authorization_url(
        "https://auth.example", "cid", "http://localhost:8000/callback", "st8"
    )
    assert "client_id=cid" in url and "response_type=code" in url

    store = FileTokenStore(str(tmp_path / "tokens.json"))
    tokens = exchange_authorization_code(
        "cid",
        "csecret",
        "good_code",
        "http://localhost:8000/callback",
        token_url=f"{base_url}/oauth2/token",
        store=store,
    )
    assert tokens["access_token"] == "at_1"
    # the manager takes over: expired access → refresh via stored grant
    store_data = store.get()
    store_data["expires_at"] = "2020-01-01T00:00:00+00:00"
    store.put(store_data)
    assert _manager(base_url, store).get_valid_token() == "at_2"

    with pytest.raises(ApiAuthError, match="authorization code rejected"):
        exchange_authorization_code(
            "cid",
            "csecret",
            "BAD",
            "http://localhost:8000/callback",
            token_url=f"{base_url}/oauth2/token",
        )


def test_whoami_and_accounts_probe(api_server, tmp_path):
    base_url, state = api_server
    store = _seed_store(tmp_path, access="at_p", expires_in_s=3600)
    with state.lock:
        state.access_tokens.add("at_p")
    client = ApiClient(base_url, "acc_1", _manager(base_url, store))
    assert client.whoami() == {"authenticated": True}
    assert client.list_accounts() == [{"id": "acc_1", "type": "uk_retail"}]


def test_concurrent_refresh_single_rotation(api_server, tmp_path):
    """Two workers hit an expired token simultaneously: the file lock
    + in-lock re-read must produce exactly ONE refresh (a second
    concurrent refresh would present the already-rotated grant and be
    evicted — the token-rotation race)."""
    import threading as th

    base_url, state = api_server
    _seed_store(tmp_path, access="stale", expires_in_s=0)  # expired
    results, errors = [], []

    def worker():
        try:
            store = FileTokenStore(str(tmp_path / "tokens.json"))
            results.append(_manager(base_url, store).get_valid_token())
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [th.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert set(results) == {"at_1"}  # everyone got the ONE new token
    assert state.token_seq == 1  # exactly one refresh hit the server
