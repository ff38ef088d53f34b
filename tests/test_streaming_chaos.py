"""Failure-injection tests for the versioned streaming sketch-state
recovery contract (streaming/sketches.py) — the claim the docstring
argues and the happy-path parity tests assume:

  * crash mid-commit of ``v{b}`` (data files present, no _SUCCESS):
    the partial version is INVISIBLE (_SUCCESS-gated discovery), the
    replay recomputes v{b} from v{b-1} and the same batch rows, and
    the recovered state is bit-identical to a no-failure run;
  * crash AFTER v{b} commits but BEFORE the source offsets do (the
    double-fire lane): the replay re-runs batch b against v{b-1}
    (``below=batch_id`` excludes the batch's own committed output)
    and overwrites v{b} with identical content — the lane where the
    grid's SUM merge would silently double-count if recovery ever
    merged a replayed batch into its own prior output.

Chaos enters through the ``_fault_hook`` seam (runs after the state
write, before the offset commit — the exact window a real crash
occupies), mirroring the raise-at-injection-point idiom of
tests/test_atomic_commit.py. Recovery is the REAL mechanism: the
restarted query resumes from the same checkpoint and Structured
Streaming replays the uncommitted batch with the same id and rows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.errors import StreamingQueryException
from pyspark.sql import functions as F

from monzo_data_pipeline_spark.catalog import load_table
from monzo_data_pipeline_spark.streaming import sketches as SSK


class Boom(RuntimeError):
    pass


def _state_rows(spark, state_dir):
    df = SSK.read_latest_state(spark, state_dir)
    assert df is not None
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def _committed_versions(state_dir):
    return sorted(
        d
        for d in os.listdir(state_dir)
        if d.startswith("v")
        and os.path.exists(os.path.join(state_dir, d, "_SUCCESS"))
    )


def _make_hook(state_dir, fail_batch, strip_success):
    """Fail ONCE on ``fail_batch``; optionally strip the _SUCCESS
    marker first (crash mid-commit vs crash after commit)."""
    fired = {"done": False}

    def hook(batch_id: int) -> None:
        if fired["done"] or batch_id != fail_batch:
            return
        fired["done"] = True
        if strip_success:
            marker = os.path.join(
                state_dir, f"v{batch_id:09d}", "_SUCCESS"
            )
            os.remove(marker)
        raise Boom(f"injected crash on batch {batch_id}")

    return hook


def _run_with_chaos(spark, start, drops, schema, state_dir, strip_success):
    """One chaos run: stream fails on batch 1, restart recovers."""

    def mk_stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drops)
        )

    hook = _make_hook(state_dir, fail_batch=1, strip_success=strip_success)
    q = start(mk_stream(), hook)
    with pytest.raises(StreamingQueryException):
        # the injected Boom surfaces as the query's terminal exception;
        # a timeout (False return) would fail pytest.raises instead
        q.awaitTermination(180)
    if strip_success:
        # the partial version must be invisible to state discovery
        assert "v000000001" not in _committed_versions(state_dir)
    else:
        # committed state, uncommitted offsets — the double-fire setup
        assert "v000000001" in _committed_versions(state_dir)

    # recovery: same checkpoint, no hook — Structured Streaming
    # replays the failed batch (same id, same rows) and drains
    q2 = start(mk_stream(), None)
    assert q2.awaitTermination(180), "recovery stream did not drain"
    return _state_rows(spark, state_dir)


def _chaos_parity(spark, tmp_path, base, name, start):
    """Reference (no-failure) state vs both chaos lanes, bit-exact."""
    drops = str(tmp_path / f"{name}_drops")
    base.repartition(3).write.parquet(drops)
    schema = base.schema

    ref_state = str(tmp_path / f"{name}_ref_state")
    q = start(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drops),
        None,
        ref_state,
        str(tmp_path / f"{name}_ref_ckpt"),
    )
    assert q.awaitTermination(180), "reference stream did not drain"
    assert len(_committed_versions(ref_state)) >= 3  # real micro-batches
    want = _state_rows(spark, ref_state)

    for lane, strip in (("partial", True), ("doublefire", False)):
        state_dir = str(tmp_path / f"{name}_{lane}_state")
        ckpt = str(tmp_path / f"{name}_{lane}_ckpt")
        got = _run_with_chaos(
            spark,
            lambda s, h, sd=state_dir, cp=ckpt: start(s, h, sd, cp),
            drops,
            schema,
            state_dir,
            strip_success=strip,
        )
        assert got == want, f"{name}/{lane}: recovered state diverged"


def test_grid_state_recovers_bit_exact_under_chaos(spark, sf_dir, tmp_path):
    """The SUM lane — the one that genuinely depends on exactly-once
    batch replay (a double-merged batch would double every count)."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("v")
    )

    def start(stream, hook, state_dir, ckpt):
        return SSK.stream_grid_state(
            stream, "v", state_dir, ckpt, _fault_hook=hook
        )

    _chaos_parity(spark, tmp_path, base, "grid", start)


def test_hll_registers_recover_bit_exact_under_chaos(
    spark, sf_dir, tmp_path
):
    events = load_table(spark, sf_dir, "events")
    base = events.select("user_id", "event_type").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )

    def start(stream, hook, state_dir, ckpt):
        return SSK.stream_hll_registers(
            stream, "user_id", "event_type", state_dir, ckpt,
            _fault_hook=hook,
        )

    _chaos_parity(spark, tmp_path, base, "hll", start)


def test_bitmap_state_recovers_bit_exact_under_chaos(
    spark, sf_dir, tmp_path
):
    events = load_table(spark, sf_dir, "events")
    base = events.select("event_type", "user_id").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )

    def start(stream, hook, state_dir, ckpt):
        return SSK.stream_bitmap_state(
            stream, ["event_type"], "user_id", state_dir, ckpt,
            _fault_hook=hook,
        )

    _chaos_parity(spark, tmp_path, base, "bitmap", start)


def test_kmv_state_recovers_bit_exact_under_chaos(spark, sf_dir, tmp_path):
    """The k-smallest lane: merge is idempotent AND exact, so both
    chaos lanes must land on the identical k-row state."""
    events = load_table(spark, sf_dir, "events")
    base = events.select("user_id").filter(F.col("user_id").isNotNull())

    def start(stream, hook, state_dir, ckpt):
        return SSK.stream_kmv_state(
            stream, "user_id", state_dir, ckpt, _fault_hook=hook
        )

    _chaos_parity(spark, tmp_path, base, "kmv", start)


def test_view_state_recovers_bit_exact_under_chaos(spark, sf_dir, tmp_path):
    """The IVM SUM fold — like the grid lane, NOT idempotent, so this
    is the lane where recovery merging a replayed batch into its own
    prior output would silently double-count."""
    from monzo_data_pipeline_spark.streaming.views import stream_view_state

    events = load_table(spark, sf_dir, "events")
    base = events.select("event_type", "user_id").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("user_id").alias("s"),
        )

    def start(stream, hook, state_dir, ckpt):
        return stream_view_state(
            stream, partial, ["event_type"], state_dir, ckpt,
            _fault_hook=hook,
        )

    _chaos_parity(spark, tmp_path, base, "view", start)


def test_ares_sample_recovers_bit_exact_under_chaos(
    spark, sf_dir, tmp_path
):
    """r10, the weighted-reservoir lane: like KMV the merge is
    idempotent AND exact (priorities are pure functions of (key,
    weight)), so both chaos lanes must land on the identical n-row
    reservoir."""
    events = load_table(spark, sf_dir, "events")
    base = events.select("user_id", "event_id").filter(
        F.col("user_id").isNotNull()
    ).select(
        "event_id",
        (F.pmod(F.col("user_id"), F.lit(50)) + 1).alias("w"),
    )

    def start(stream, hook, state_dir, ckpt):
        return SSK.stream_ares_sample(
            stream, "event_id", "w", state_dir, ckpt, n=32,
            _fault_hook=hook,
        )

    _chaos_parity(spark, tmp_path, base, "ares", start)
