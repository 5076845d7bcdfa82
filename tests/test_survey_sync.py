"""SURVEY.md §2.3 K+ drift gate (r5 verdict #8).

Two invariants:

1. The generated registry table embedded in SURVEY.md equals a fresh
   regeneration from the query registry — adding/removing/renaming a
   query without running ``python tools/gen_coverage.py`` fails here.
2. The hand-written K+ family table (narrative) references only names
   that exist in the registry — stale names fail with the offender.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _specs():
    from nibbler_spark.queries import load_all

    return load_all()


def test_generated_block_matches_registry():
    from tools.gen_coverage import SURVEY_BEGIN, SURVEY_END, survey_kplus_block

    text = (REPO / "SURVEY.md").read_text()
    assert SURVEY_BEGIN in text and SURVEY_END in text, (
        "SURVEY.md lacks the generated K+ block — run "
        "python tools/gen_coverage.py"
    )
    embedded = (
        SURVEY_BEGIN + text.split(SURVEY_BEGIN, 1)[1].split(SURVEY_END, 1)[0]
        + SURVEY_END
    )
    assert embedded == survey_kplus_block(_specs()), (
        "SURVEY.md generated K+ block is stale — run "
        "python tools/gen_coverage.py"
    )


def test_hand_table_names_exist_in_registry():
    from tools.gen_coverage import SURVEY_BEGIN

    text = (REPO / "SURVEY.md").read_text()
    start = text.index("#### K+.")
    end = text.index(SURVEY_BEGIN)
    hand = text[start:end]
    names = set(re.findall(r"`([a-z][a-z0-9_]*)`", hand))
    specs = _specs()
    # Only tokens shaped like full registry names (family prefix + an
    # underscore-joined slug); bare range endpoints like `a18` and
    # continuation fragments like `_cdc` are prose, not names.
    candidate = {
        n
        for n in names
        if re.fullmatch(r"(ext|sql\d+|tq\d+|[a-z]\d{2})_[a-z0-9_]+", n)
    }
    assert candidate, "hand K+ table parsed to zero candidate names"
    stale = sorted(n for n in candidate if n not in specs)
    assert not stale, f"hand K+ table references unknown queries: {stale}"


def test_coverage_tracker_line_is_fresh():
    """r10 verdict #5: the driver-format coverage tracker in COVERAGE.md
    must equal a fresh recomputation of the union over the committed
    CORRECTNESS_*.json records — a new round's samples landing without
    ``python tools/gen_coverage.py`` being re-run fails here instead of
    shipping a stale "N / M distinct queries" line."""
    import glob
    import json

    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"\*\*(\d+) / (\d+) distinct queries\*\*", text)
    assert m, "COVERAGE.md lacks the driver-format tracker line"
    seen: set[str] = set()
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_*.json"))):
        try:
            seen |= set(json.load(open(f)).keys())
        except (json.JSONDecodeError, OSError):
            continue
    specs = _specs()
    assert (int(m.group(1)), int(m.group(2))) == (len(seen), len(specs)), (
        "COVERAGE.md tracker line is stale — run "
        "python tools/gen_coverage.py"
    )
