"""Real HTTP transport + OAuth2 token refresh for the REST source.

The reference's largest subsystem is its API plumbing:
  * single-request transaction fetch with `limit`/`since`/`before`
    params and merchant expansion
    (/root/reference/src/utils/api/api_client.py:157-201, :177-187);
  * OAuth2 refresh-token management with durable token storage and
    "evicted refresh token → re-auth required" handling
    (/root/reference/src/utils/api/token_manager.py:64-111);
  * a localhost redirect-capture flow for the initial grant
    (/root/reference/src/utils/api/oauth_flow.py:7-62).

This module is the engine-native counterpart, designed for the
executor-side seam the rest of the repo already exposes (`FetchFn` in
pipeline/ingest.py, `monzo_api` source options in api_source.py):

  * **stdlib only** (urllib) — nothing to install on executors;
  * **token store is injectable**: `FileTokenStore` here (the local
    analog of the reference's DynamoDB + Secrets Manager pair); a real
    deployment supplies any object with get()/put();
  * **paging is a cursor loop**, not the reference's single 200-row
    cap: pages advance `since` to the last row's cursor until a short
    page arrives, so a window of any size drains completely;
  * **fetch closures are cloudpickle-safe**: only strings/ints cross
    the driver→executor boundary; sockets and token state are built
    lazily inside the first call on each worker.

Everything is hermetically testable: tests/test_http_transport.py
runs a localhost `http.server` that implements /oauth2/token and
/transactions with real paging, auth, and flaky-retry behavior.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.parse
import urllib.request
from datetime import datetime, timedelta, timezone

from .api_source import API_FIELDS  # noqa: F401  (re-export convenience)

DEFAULT_PAGE_LIMIT = 200  # the reference's cap — here it is a PAGE size
RETRY_STATUSES = (429, 500, 502, 503, 504)


class ApiAuthError(Exception):
    """Authentication cannot proceed without user action (the
    reference's 'evicted refresh token' / missing-grant case)."""


class FileTokenStore:
    """Durable token storage: one JSON file.

    Local analog of the reference's DynamoDB item + Secrets Manager
    secret (token_manager.py:25-63). Writes are atomic (tmp + rename)
    so a crash mid-refresh never corrupts the stored grant.
    """

    def __init__(self, path: str):
        self.path = path

    def get(self) -> dict | None:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def put(self, tokens: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(tokens, f)
        os.replace(tmp, self.path)


class OAuth2TokenManager:
    """Refresh-token lifecycle (reference token_manager.py:64-171).

    * `get_valid_token()` returns a live access token, refreshing
      through `token_url` when the stored one is expired (60 s safety
      margin) or on demand (`force=True` after a 401).
    * A refresh response without a new refresh_token keeps the old one
      (the reference does the same, token_manager.py:100-102).
    * A rejected refresh token raises ApiAuthError — the caller must
      re-run the authorization-code flow; there is no retry that can
      fix it.
    """

    def __init__(
        self,
        client_id: str,
        client_secret: str,
        store,
        token_url: str,
        expiry_margin_s: int = 60,
    ):
        if not client_id or not client_secret:
            raise ValueError("client_id and client_secret are required")
        self.client_id = client_id
        self.client_secret = client_secret
        self.store = store
        self.token_url = token_url
        self.expiry_margin_s = expiry_margin_s

    def _refresh(self, refresh_token: str) -> dict:
        body = urllib.parse.urlencode(
            {
                "grant_type": "refresh_token",
                "client_id": self.client_id,
                "client_secret": self.client_secret,
                "refresh_token": refresh_token,
            }
        ).encode()
        req = urllib.request.Request(self.token_url, data=body, method="POST")
        req.add_header("Content-Type", "application/x-www-form-urlencoded")
        try:
            with urllib.request.urlopen(req) as resp:
                new_tokens = json.loads(resp.read())
        except urllib.error.HTTPError as e:
            payload = e.read().decode(errors="replace")
            try:
                code = json.loads(payload).get("code", "")
            except json.JSONDecodeError:
                code = ""
            if e.code in (400, 401):
                raise ApiAuthError(
                    "token refresh rejected"
                    + (f" ({code})" if code else "")
                    + ": re-authorization required"
                ) from e
            raise
        if "refresh_token" not in new_tokens:
            new_tokens["refresh_token"] = refresh_token
        expires_in = int(new_tokens.get("expires_in", 14400))
        new_tokens["expires_at"] = (
            datetime.now(timezone.utc) + timedelta(seconds=expires_in)
        ).isoformat()
        self.store.put(new_tokens)
        return new_tokens

    def _fresh_access(self, tokens: dict | None) -> str | None:
        if not tokens or not tokens.get("access_token"):
            return None
        if not tokens.get("expires_at"):
            return None
        expires_at = datetime.fromisoformat(tokens["expires_at"])
        margin = timedelta(seconds=self.expiry_margin_s)
        if datetime.now(timezone.utc) + margin < expires_at:
            return tokens["access_token"]
        return None

    def get_valid_token(self, force: bool = False) -> str:
        tokens = self.store.get()
        if not tokens or not tokens.get("refresh_token"):
            raise ApiAuthError(
                "no stored tokens: initial authorization required "
                "(run the authorization-code flow once)"
            )
        if not force:
            access = self._fresh_access(tokens)
            if access is not None:
                return access
        # Refresh under an exclusive file lock, and RE-READ the store
        # once inside it: with token ROTATION, two executors refreshing
        # concurrently would each burn the other's refresh token (the
        # second refresh presents an already-rotated grant and gets
        # 'evicted'). The lock serializes; the re-read makes every
        # waiter after the first a no-op. Lock file lives next to the
        # store when it is file-backed; store types without a path
        # (e.g. a remote secret manager with its own CAS) skip the
        # local lock.
        lock_path = getattr(self.store, "path", None)
        if lock_path is None:
            return self._refresh(tokens["refresh_token"])["access_token"]
        import fcntl

        seen = tokens.get("access_token")
        with open(lock_path + ".lock", "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                current = self.store.get() or tokens
                access = self._fresh_access(current)
                # someone else refreshed while we waited: under force
                # (our token just 401'd) only a DIFFERENT token counts
                if access is not None and (
                    not force or current.get("access_token") != seen
                ):
                    return access
                return self._refresh(current["refresh_token"])[
                    "access_token"
                ]
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)


def _get_json(
    url: str,
    params: dict,
    token: str,
    timeout_s: float,
) -> dict:
    qs = urllib.parse.urlencode(params, doseq=True)
    req = urllib.request.Request(f"{url}?{qs}")
    req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        return json.loads(resp.read())


class ApiClient:
    """Authenticated REST client with retry + refresh-on-401.

    Request shape mirrors api_client.py:157-201 (`account_id`,
    `limit`, `expand[]=merchant`, optional `since`/`before`); errors
    follow the engine posture: bounded exponential backoff on
    429/5xx, ONE forced token refresh on 401, everything else raises.
    """

    def __init__(
        self,
        base_url: str,
        account_id: str,
        token_manager: OAuth2TokenManager,
        page_limit: int = DEFAULT_PAGE_LIMIT,
        max_retries: int = 4,
        backoff_s: float = 0.05,
        timeout_s: float = 30.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.account_id = account_id
        self.tm = token_manager
        self.page_limit = page_limit
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.timeout_s = timeout_s

    def _request(self, path: str, params: dict) -> dict:
        token = self.tm.get_valid_token()
        refreshed = False
        attempt = 0
        while True:
            try:
                return _get_json(
                    f"{self.base_url}{path}", params, token, self.timeout_s
                )
            except urllib.error.HTTPError as e:
                if e.code == 401 and not refreshed:
                    token = self.tm.get_valid_token(force=True)
                    refreshed = True
                    continue
                if e.code in RETRY_STATUSES and attempt < self.max_retries:
                    time.sleep(self.backoff_s * (2**attempt))
                    attempt += 1
                    continue
                raise
            except urllib.error.URLError:
                if attempt < self.max_retries:
                    time.sleep(self.backoff_s * (2**attempt))
                    attempt += 1
                    continue
                raise

    def get_transactions(
        self, since: str | None = None, before: str | None = None
    ) -> list[dict]:
        """Drain [since, before) through cursor paging.

        Each page asks for `page_limit` rows ordered by `created`; the
        next page re-issues the request with `since` advanced to the
        last row's id cursor (the API treats a transaction id as an
        exclusive position cursor — created timestamps can collide,
        ids cannot, so no row is skipped or repeated). A short page
        terminates. The reference stops after one page of ≤200
        (api_client.py:158); this loop is the complete-window version.
        """
        out: list[dict] = []
        cursor = since
        while True:
            params: dict = {
                "account_id": self.account_id,
                "limit": self.page_limit,
                "expand[]": "merchant",
            }
            if cursor is not None:
                params["since"] = cursor
            if before is not None:
                params["before"] = before
            page = self._request("/transactions", params).get(
                "transactions", []
            )
            out.extend(page)
            if len(page) < self.page_limit:
                return out
            cursor = page[-1]["id"]  # id = exclusive position cursor

    def get_balance(self) -> dict:
        data = self._request("/balance", {"account_id": self.account_id})
        return {
            "balance": data["balance"],
            "total_balance": data["total_balance"],
            "currency": data["currency"],
            "spend_today": abs(data["spend_today"]),
        }

    def list_pots(self) -> list[dict]:
        data = self._request(
            "/pots", {"current_account_id": self.account_id}
        )
        return data.get("pots", [])

    def whoami(self) -> dict:
        return self._request("/ping/whoami", {})

    def list_accounts(self) -> list[dict]:
        """A4 accounts/identity probe (api_client.py:124-136) —
        returned, not printed."""
        return self._request("/accounts", {}).get("accounts", [])


def build_authorization_url(
    auth_base: str,
    client_id: str,
    redirect_uri: str,
    state: str,
) -> str:
    """The URL a user visits to grant access (reference
    oauth_flow.py:45-52). The caller owns opening a browser and
    capturing the redirect; `exchange_authorization_code` finishes."""
    qs = urllib.parse.urlencode(
        {
            "client_id": client_id,
            "redirect_uri": redirect_uri,
            "response_type": "code",
            "state": state,
        }
    )
    return f"{auth_base.rstrip('/')}/?{qs}"


def exchange_authorization_code(
    client_id: str,
    client_secret: str,
    code: str,
    redirect_uri: str,
    token_url: str,
    store=None,
) -> dict:
    """Authorization-code → token exchange (oauth_flow.py:15-29),
    seeding `store` so OAuth2TokenManager can take over refreshes.
    Returns the token payload (access_token, refresh_token, ...)."""
    body = urllib.parse.urlencode(
        {
            "grant_type": "authorization_code",
            "client_id": client_id,
            "client_secret": client_secret,
            "redirect_uri": redirect_uri,
            "code": code,
        }
    ).encode()
    req = urllib.request.Request(token_url, data=body, method="POST")
    req.add_header("Content-Type", "application/x-www-form-urlencoded")
    try:
        with urllib.request.urlopen(req) as resp:
            tokens = json.loads(resp.read())
    except urllib.error.HTTPError as e:
        if e.code in (400, 401):
            raise ApiAuthError(
                "authorization code rejected: restart the grant flow"
            ) from e
        raise
    expires_in = int(tokens.get("expires_in", 14400))
    tokens["expires_at"] = (
        datetime.now(timezone.utc) + timedelta(seconds=expires_in)
    ).isoformat()
    if store is not None:
        store.put(tokens)
    return tokens


def make_http_fetch(
    base_url: str,
    account_id: str,
    client_id: str,
    client_secret: str,
    token_path: str,
    token_url: str | None = None,
    page_limit: int = DEFAULT_PAGE_LIMIT,
) -> "callable":
    """A `FetchFn` (pipeline/ingest.py) backed by the real transport.

    Executor contract: the closure captures only strings/ints, so
    cloudpickle ships it by value; the ApiClient (and its sockets) is
    constructed lazily on first use inside each worker process and
    cached on the function object — one authenticated session per
    executor, exactly the seam api_source.py:140-148 documents.

    Wire-datetime normalization: `created`/`settled` arrive as ISO
    strings; they are parsed here so the emitted dicts match
    make_fake_fetch's shape and flow through the same
    TRANSACTION_WIRE_SCHEMA path untouched.
    """
    token_url = token_url or f"{base_url.rstrip('/')}/oauth2/token"

    def _parse_ts(v):
        if v is None or isinstance(v, datetime):
            return v
        return datetime.fromisoformat(v.replace("Z", "+00:00")).replace(
            tzinfo=None
        )

    def fetch(w_since: str, w_before: str) -> list[dict]:
        client = getattr(fetch, "_client", None)
        if client is None:
            tm = OAuth2TokenManager(
                client_id,
                client_secret,
                FileTokenStore(token_path),
                token_url=token_url,
            )
            client = ApiClient(
                base_url, account_id, tm, page_limit=page_limit
            )
            fetch._client = client
        rows = client.get_transactions(since=w_since, before=w_before)
        for r in rows:
            r["created"] = _parse_ts(r.get("created"))
            r["settled"] = _parse_ts(r.get("settled"))
        return rows

    return fetch
