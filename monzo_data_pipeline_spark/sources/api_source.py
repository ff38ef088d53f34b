"""A first-class Spark data source for the REST transactions API
(Spark 4 Python DataSource API): ``spark.read.format("monzo_api")``.

The reference fetches with a hand-rolled single-threaded page loop
(/root/reference/src/utils/api/api_client.py:157-201) and pushes its
one predicate — the `since`/`before` date range — into the request by
hand (api_client.py:177-187, extract.py:18). This source makes both
behaviors *engine-native*:

  * **partitions()** exposes cursor windows as InputPartitions, so the
    scan parallelizes across executors exactly like a file scan —
    the planner, not user code, owns the fan-out;
  * **pushFilters()** receives Catalyst's pushed predicates; range
    filters on `created` narrow the cursor window BEFORE any fetch
    (the API-source analog of parquet predicate pushdown — SURVEY.md
    §4 row 1). Only inclusive-lower / exclusive-upper bounds are
    consumed (they match window semantics exactly); everything else is
    returned to Spark to evaluate post-scan.

Rows come out FLAT (the 31 bronze columns minus the load stamp):
the A7 nested-struct flatten happens inside the source, mirroring the
reference doing it inside get_transactions (api_client.py:198).

Hermetic by default: the generator is the deterministic fake client
(pipeline/ingest.make_fake_fetch). A real deployment swaps the fetch
for an OAuth2 httpx session constructed lazily inside read() — one
session per task, never serialized.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    SimpleDataSourceStreamReader,
)

from ..schemas import BRONZE_TRANSACTIONS_SCHEMA

# bronze layout minus the loader's date_retrieved stamp
API_FIELDS = [f for f in BRONZE_TRANSACTIONS_SCHEMA.fields if f.name != "date_retrieved"]


def _flatten_wire(d: dict) -> tuple:
    """A7 as a plain dict flatten (the source-side twin of
    operators/projection.flatten_transaction_wire)."""
    cp = d.get("counterparty") or {}
    m = d.get("merchant") or {}
    addr = m.get("address") or {}
    return (
        d.get("id"),
        d.get("description"),
        d.get("amount"),
        d.get("currency"),
        d.get("created"),
        d.get("category"),
        d.get("notes"),
        d.get("is_load"),
        d.get("settled"),
        d.get("local_amount"),
        d.get("local_currency"),
        cp.get("name"),
        cp.get("account_number"),
        cp.get("sort_code"),
        m.get("id"),
        m.get("name"),
        m.get("category"),
        m.get("logo"),
        m.get("emoji"),
        m.get("online"),
        m.get("atm"),
        addr.get("address"),
        addr.get("city"),
        addr.get("postcode"),
        addr.get("country"),
        addr.get("latitude"),
        addr.get("longitude"),
        m.get("google_places_id"),
        m.get("suggested_tags"),
        m.get("foursquare_id"),
        m.get("website"),
    )


def _make_fetch_from_options(options: dict):
    """The transport seam: `transport=http` builds the real urllib/
    OAuth2 client (sources/http_transport.py); default stays the
    deterministic fake so CI and the oracle gate remain hermetic."""
    if options.get("transport") == "http":
        from .http_transport import make_http_fetch

        return make_http_fetch(
            base_url=options["base_url"],
            account_id=options.get("account_id", ""),
            client_id=options.get("client_id", ""),
            client_secret=options.get("client_secret", ""),
            token_path=options["token_path"],
            token_url=options.get("token_url"),
            page_limit=int(options.get("page_limit", "200")),
        )
    from ..pipeline.ingest import make_fake_fetch

    return make_fake_fetch(
        int(options.get("n_per_window", "50")),
        int(options.get("dup_every", "10")),
    )


class MonzoApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.since = options.get("since", "2025-01-01T00:00:00")
        self.before = options.get("before", "2025-01-08T00:00:00")
        self.window_hours = int(options.get("window_hours", "24"))

    def pushFilters(self, filters):
        """Consume created-range bounds; yield back what we can't push.

        Semantics must be EXACT to consume: the cursor window is
        [since, before), so `created >= v` tightens since and
        `created < v` tightens before losslessly. Strict `>` / `<=`
        (off-by-one-row at the bound) are left for Spark.
        """
        from datetime import timezone

        def naive_utc(v: datetime) -> str:
            # session TZ is UTC (session.py); cursor strings are naive UTC
            if v.tzinfo is not None:
                v = v.astimezone(timezone.utc).replace(tzinfo=None)
            return v.isoformat()

        for f in filters:
            if (
                isinstance(f, GreaterThanOrEqual)
                and f.attribute == ("created",)
                and isinstance(f.value, datetime)
            ):
                self.since = max(self.since, naive_utc(f.value))
            elif (
                isinstance(f, LessThan)
                and f.attribute == ("created",)
                and isinstance(f.value, datetime)
            ):
                self.before = min(self.before, naive_utc(f.value))
            else:
                yield f

    def partitions(self):
        from ..pipeline.ingest import cursor_windows

        wins = cursor_windows(
            datetime.fromisoformat(self.since),
            datetime.fromisoformat(self.before),
            self.window_hours,
        )
        return [InputPartition(w) for w in wins]

    def read(self, partition):
        # constructed task-side: only option strings cross the
        # driver→executor boundary; the HTTP session (when
        # transport=http) is built lazily inside the fetch closure
        fetch = _make_fetch_from_options(self.options)
        w_since, w_before = partition.value
        for row in fetch(w_since, w_before):
            yield _flatten_wire(row)


class MonzoApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "monzo_api"

    def schema(self):
        from pyspark.sql.types import StructType

        return StructType(API_FIELDS)

    def reader(self, schema) -> MonzoApiReader:
        return MonzoApiReader(dict(self.options))

    def simpleStreamReader(self, schema) -> "MonzoApiStreamReader":
        return MonzoApiStreamReader(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(MonzoApiDataSource)


class MonzoApiStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming form of the same source: the offset IS the
    cursor (`{"cursor": iso_ts}`), each batch advances one window —
    exactly the reference's EventBridge-cron incremental pull
    (/root/reference/README.md:3) expressed as a Spark streaming
    source, with the checkpoint replacing the hand-kept `since` state.

    Deterministic replay: the fetch is a pure function of the window,
    so readBetweenOffsets() regenerates a failed batch bit-identically
    (the real API satisfies this too: historical transactions keyed by
    [since, before) are immutable; only `settled` arrives late — which
    the silver layer treats as a late-arriving attribute, SURVEY §1.2).
    """

    def __init__(self, options: dict):
        self.options = dict(options)
        self.since = options.get("since", "2025-01-01T00:00:00")
        self.before = options.get("before", "2025-01-08T00:00:00")
        self.window_hours = int(options.get("window_hours", "24"))

    def initialOffset(self) -> dict:
        return {"cursor": self.since}

    def _window_end(self, start: str) -> str:
        from datetime import timedelta

        lo = datetime.fromisoformat(start)
        hi = min(
            lo + timedelta(hours=self.window_hours),
            datetime.fromisoformat(self.before),
        )
        return hi.isoformat()

    def _rows(self, w_since: str, w_before: str) -> list[tuple]:
        # a LIST, not a generator: SimpleDataSourceStreamReader
        # prefetches driver-side and pickles the records to ship them
        # to executors; per-window row counts are bounded by design
        fetch = _make_fetch_from_options(self.options)
        return [_flatten_wire(row) for row in fetch(w_since, w_before)]

    def read(self, start: dict):
        cursor = start["cursor"]
        if cursor >= self.before:  # caught up: empty batch, no advance
            return iter([]), {"cursor": cursor}
        end = self._window_end(cursor)
        # iter(list): Spark pickles the prefetched iterator — list
        # iterators pickle, generators don't
        return iter(self._rows(cursor, end)), {"cursor": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["cursor"], end["cursor"]))


