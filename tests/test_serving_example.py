"""The CDC serving-stack example (examples/cdc_serving_stack.py): one
table with its whole derived family -- matview, parquet+Delta export,
Debezium outbox, rebase bootstrap -- pinned runnable and exact."""

from __future__ import annotations

import os
import sys


def test_serving_stack_end_to_end(spark, tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from cdc_serving_stack import run_stack

    out = run_stack(spark, str(tmp_path / "stack"), num_events=4000)
    assert out["table_rows"] > 0
    assert out["matview_ok"] and out["export_ok"]
    assert out["outbox_ok"] and out["bootstrap_ok"]
    assert out["ok"]
