"""Differential fuzzing as CI: 40 seeded random queries run as
identical SQL on Spark and DuckDB must agree exactly (the SQLancer
recipe, restricted to the engine-exact grammar in
tools/fuzz_differential.py). A failing seed is a pinned regression —
reproduce with `python tools/fuzz_differential.py`."""

from __future__ import annotations

import random

from nibbler_spark.oracle import compare
from tools.fuzz_differential import gen_query


def test_forty_random_queries_agree(spark, sf_dir, duck):
    from nibbler_spark.sources import register_temp_views

    register_temp_views(spark, sf_dir)
    bad = []
    for seed in range(40):
        rng = random.Random(97_000 + seed)
        sql = gen_query(rng)
        rep = compare(f"fuzz-{seed}", spark.sql(sql), duck, sql)
        if not rep.ok:
            bad.append((seed, sql, rep.first_diffs[:2]))
    assert not bad, bad
