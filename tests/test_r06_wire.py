"""Round-6 second-pass locks: CM narrow wire format + Arrow state pulls.

The CM counter table serializes with the narrowest dtype its max fits;
query.py pulls state rows through one Arrow job (_pull_rows) instead of
row-pickled collect(). These tests pin the properties the optimizations
rely on: roundtrip identity across every dtype tier, content-determinism
(byte-identity under merge-order permutations), the pessimistic
max_state_bytes bound, and dict-row/Row parity through _rows_to_states.
"""

import numpy as np
import pytest

from sketchlib import CountMin, deserialize


@pytest.mark.parametrize(
    "peak",
    [3, 200, 70_000, 5_000_000_000],  # uint8 / uint8 / uint32 / int64 tiers
)
def test_cm_roundtrip_all_dtype_tiers(peak):
    cm = CountMin(eps=1e-2, delta=0.1)
    cm.update_values(np.array([1, 2, 3], dtype=np.int64), np.array([peak, 1, peak // 2 + 1]))
    back = deserialize(cm.to_bytes())
    assert back.table.dtype == np.int64
    assert (back.table == cm.table).all()
    assert back.total == cm.total and back._n_items == cm._n_items
    assert (np.sort(back.cands) == np.sort(cm.cands)).all()
    # wire narrows: the serialized table area is peak-dependent, never above int64
    assert len(cm.to_bytes()) <= cm.max_state_bytes()


def test_cm_bytes_content_deterministic_under_merge_order():
    rng = np.random.default_rng(3)
    parts = []
    for _ in range(4):
        cm = CountMin(eps=1e-2, delta=0.1)
        cm.update_values(rng.integers(0, 1000, 5000))
        parts.append(cm.to_bytes())
    a = deserialize(parts[0])
    for b in parts[1:]:
        a.merge(deserialize(b))
    c = deserialize(parts[2])
    for b in [parts[1], parts[0], parts[3]]:
        c.merge(deserialize(b))
    assert a.to_bytes() == c.to_bytes()  # same content -> same narrow bytes


def test_rows_to_states_accepts_dicts_and_rows():
    from pyspark.sql import Row

    from sketchlib.spark.query import _rows_to_states

    cm1 = CountMin(eps=1e-2, delta=0.1).update_values(np.array([1, 2, 3]))
    cm2 = CountMin(eps=1e-2, delta=0.1).update_values(np.array([4, 5, 6]))
    as_dicts = [
        {"group": "g", "sketch": "cm", "state": cm1.to_bytes(), "part_id": 0},
        {"group": "g", "sketch": "cm", "state": cm2.to_bytes(), "part_id": 1},
    ]
    as_rows = [Row(**r) for r in as_dicts]
    md = _rows_to_states(as_dicts)[("g", "cm")]
    mr = _rows_to_states(as_rows)[("g", "cm")]
    assert md.to_bytes() == mr.to_bytes()
    ref = deserialize(cm1.to_bytes()).merge(deserialize(cm2.to_bytes()))
    assert md.to_bytes() == ref.to_bytes()


def test_pull_rows_matches_collect(spark):
    from sketchlib.spark.query import _pull_rows

    df = spark.createDataFrame(
        [("a", "cm", bytearray(b"\x01\x02"), 0), ("b", "cm", bytearray(b"\x03"), 1)],
        "group string, sketch string, state binary, part_id int",
    )
    pulled = sorted(_pull_rows(df), key=lambda r: r["group"])
    collected = sorted(df.collect(), key=lambda r: r["group"])
    assert [
        (r["group"], r["sketch"], bytes(r["state"]), int(r["part_id"])) for r in pulled
    ] == [
        (r["group"], r["sketch"], bytes(r["state"]), int(r["part_id"])) for r in collected
    ]
    assert len(_pull_rows(df, 1)) == 1
