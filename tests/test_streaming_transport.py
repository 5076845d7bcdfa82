"""Structured Streaming transport smoke tests (SURVEY §4.3 / I11-I12):
the re-batcher semantics riding a real file-drop streaming source."""

from __future__ import annotations

import tempfile
import threading
import time

import pytest

from nibbler_spark.config import Config, Trigger
from nibbler_spark.errors import NibblerStoppedError
from nibbler_spark.streaming.transport import start_file_stream


def test_file_stream_batches_and_order(spark):
    got: list[tuple[list, Trigger]] = []
    lock = threading.Lock()

    def processor(_dl, trig, batch):
        with lock:
            got.append(([r["value"] for r in batch], trig))

    # Ticker far in the future so flush boundaries are purely size-driven
    # (file-drop delivery is slow relative to realistic tickers).
    stream, receiver = start_file_stream(
        spark,
        Config(processor=processor, size=4, ticker_s=300.0),
        tempfile.mkdtemp(prefix="nibbler-src-"),
    )
    try:
        for i in range(10):
            receiver.send(f"x:{i}")
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            with lock:
                flushed = sum(len(b) for b, _ in got)
            if flushed + stream.rebatcher.buffered >= 10:
                break
            time.sleep(0.1)
    finally:
        stream.stop(flush=True)  # drains the 2 leftover items

    assert got == [
        (["x:0", "x:1", "x:2", "x:3"], Trigger.BATCH_FULL),
        (["x:4", "x:5", "x:6", "x:7"], Trigger.BATCH_FULL),
        (["x:8", "x:9"], Trigger.TICKER),
    ]


def test_file_stream_fatal_stop_blocks_sends(spark):
    """R9 through the transport: processor error without resume ⇒ query
    stops, receiver raises NibblerStoppedError (≡ send on closed channel)."""
    failed = threading.Event()

    def processor(_dl, _trig, _batch):
        raise RuntimeError("boom")

    def processor_err(batch, err):
        failed.set()

    stream, receiver = start_file_stream(
        spark,
        Config(
            processor=processor,
            size=2,
            ticker_s=0.5,
            processor_err=processor_err,
        ),
        tempfile.mkdtemp(prefix="nibbler-src-"),
    )
    try:
        receiver.send("hello")
        assert failed.wait(timeout=60.0)
        deadline = time.monotonic() + 30
        while stream.fatal_error is None and time.monotonic() < deadline:
            time.sleep(0.1)
        assert stream.fatal_error is not None
        with pytest.raises(NibblerStoppedError):
            receiver.send("again")
    finally:
        stream.stop(flush=False)
