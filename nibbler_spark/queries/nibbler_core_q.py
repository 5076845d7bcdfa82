"""Declared queries for the nibbler core itself (SURVEY §2.3 I11/I12).

The golden batching scenario (reference: nibbler_test.go:15-83) runs on
the deterministic fake clock and is hash-checked against the pinned
expected batches as a VALUES oracle — the reference's own test, as data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nibbler_spark.queries import register

_GOLDEN_ORACLE = """
SELECT * FROM (VALUES
  (0, 0, 'i:0',  'BATCH_FULL'), (0, 1, 'i:1',  'BATCH_FULL'),
  (0, 2, 'i:2',  'BATCH_FULL'), (0, 3, 'i:3',  'BATCH_FULL'),
  (0, 4, 'i:4',  'BATCH_FULL'), (0, 5, 'i:5',  'BATCH_FULL'),
  (1, 0, 'i:6',  'TICKER'),
  (2, 0, 'i:7',  'BATCH_FULL'), (2, 1, 'i:8',  'BATCH_FULL'),
  (2, 2, 'i:9',  'BATCH_FULL'), (2, 3, 'i:10', 'BATCH_FULL'),
  (2, 4, 'i:11', 'BATCH_FULL'), (2, 5, 'i:12', 'BATCH_FULL'),
  (3, 0, 'i:13', 'TICKER'),
  (4, 0, 'i:14', 'TICKER'), (4, 1, 'i:15', 'TICKER'),
  (4, 2, 'i:16', 'TICKER'), (4, 3, 'i:17', 'TICKER')
) AS t(batch_idx, pos, item, trigger)
ORDER BY batch_idx, pos
"""


@register(
    "r01_rebatcher_golden",
    survey_id="I11",
    category="nibbler-core",
    mode="golden",
    oracle=_GOLDEN_ORACLE,
)
def r01_rebatcher_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-OR-time re-batcher golden (R1/R2/R16/R17): 18 items, size 6,
    1 s ticker, pauses before items 0/7/14 ⇒ batches [6,1,6,1,4] with
    triggers [FULL, TICKER, FULL, TICKER, TICKER]. Deterministic via the
    injected fake clock; independent of sf_dir by design."""
    from nibbler_spark.config import Config
    from nibbler_spark.streaming.rebatcher import FakeClock, ReBatcher

    got: list[tuple[list, str]] = []
    clock = FakeClock()
    rb = ReBatcher(
        Config(
            processor=lambda _dl, trig, batch: got.append(
                (list(batch), str(trig))
            ),
            size=6,
            ticker_s=1.0,
        ),
        clock=clock.monotonic,
    )
    for i in range(18):
        if i % 7 == 0:
            clock.advance(1.1)
            rb.poll()
        rb.push(f"i:{i}")
    clock.advance(1.1)
    rb.poll()

    rows = [
        (bi, pos, item, trig)
        for bi, (batch, trig) in enumerate(got)
        for pos, item in enumerate(batch)
    ]
    return spark.createDataFrame(
        rows, "batch_idx int, pos int, item string, trigger string"
    ).orderBy("batch_idx", "pos")
