"""Secrets/config lookup (A26) — the injection seam the reference
wires through AWS Secrets Manager.

Reference: /root/reference/src/utils/utils.py:4-19 (`get_secret` /
`update_secret` against Secrets Manager) feeding client credentials
into the API layer, and token_manager.py:104-116 writing the rotated
refresh token back.

Engine posture: the DATA PLANE never reads secrets itself — a
ConfigProvider is injected at the edges (session factory, warehouse
factory, transport factory below). Anything with `get_secret`/
`update_secret` satisfies the protocol: `FileConfigProvider` here for
local/dev/test, a Secrets-Manager- or vault-backed one in production
(same two methods, nothing else changes). Secrets never transit the
driver→executor boundary as objects; only the provider's *values*
feed make_http_fetch's string arguments, which is exactly the seam
the executor contract already requires.
"""

from __future__ import annotations

import json
import os


class MissingSecretError(KeyError):
    pass


class FileConfigProvider:
    """One JSON file per secret under a root dir; atomic updates.

    Local analog of the reference's Secrets Manager usage — including
    `update_secret` for refresh-token rotation (utils.py:12-19).
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.json")

    def get_secret(self, name: str) -> dict:
        try:
            with open(self._path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise MissingSecretError(name) from None

    def update_secret(self, name: str, value: dict) -> None:
        tmp = self._path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(value, f)
        os.replace(tmp, self._path(name))


class EnvConfigProvider:
    """Secrets from environment variables: name → JSON in
    `<PREFIX><NAME-upper-snake>`. Read-only (update_secret raises) —
    env is not durable storage for rotated tokens."""

    def __init__(self, prefix: str = "PIPELINE_SECRET_"):
        self.prefix = prefix

    def _var(self, name: str) -> str:
        return self.prefix + name.upper().replace("-", "_")

    def get_secret(self, name: str) -> dict:
        raw = os.environ.get(self._var(name))
        if raw is None:
            raise MissingSecretError(name)
        return json.loads(raw)

    def update_secret(self, name: str, value: dict) -> None:
        raise NotImplementedError(
            "EnvConfigProvider is read-only; use a writable provider "
            "for token rotation"
        )


class ProviderTokenStore:
    """Adapter: OAuth2TokenManager's store surface (get/put) backed by
    a ConfigProvider secret — the engine twin of the reference keeping
    the rotated refresh token in Secrets Manager
    (token_manager.py:104-116)."""

    def __init__(self, provider, secret_name: str = "monzo-api-credentials"):
        self.provider = provider
        self.secret_name = secret_name

    def get(self) -> dict | None:
        try:
            return self.provider.get_secret(self.secret_name)
        except MissingSecretError:
            return None

    def put(self, tokens: dict) -> None:
        self.provider.update_secret(self.secret_name, tokens)


def warehouse_from_config(spark, provider, secret_name: str = "warehouse"):
    """AtomicWarehouse at the configured root (`{"root": ...}`)."""
    from .atomic import AtomicWarehouse

    return AtomicWarehouse(spark, provider.get_secret(secret_name)["root"])


def fetch_from_config(
    provider, secret_name: str = "monzo-api-credentials"
):
    """The reference's credential flow, engine-shaped: one secret
    (`monzo_client_id`, `monzo_client_secret`, `base_url`,
    `account_id`, optional `token_path`/`token_url`/`page_limit`) →
    a ready executor-side FetchFn. Token state lives wherever
    `token_path` points; rotation is persisted there by the manager.
    """
    from ..sources.http_transport import make_http_fetch

    s = provider.get_secret(secret_name)
    return make_http_fetch(
        base_url=s["base_url"],
        account_id=s.get("account_id", ""),
        client_id=s["monzo_client_id"],
        client_secret=s["monzo_client_secret"],
        token_path=s["token_path"],
        token_url=s.get("token_url"),
        page_limit=int(s.get("page_limit", 200)),
    )
