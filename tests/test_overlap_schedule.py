"""Schedule-property regression for the sharded train step's collectives
(VERDICT r4 item 3; evidence + arithmetic in bench/OVERLAP.md).

AOT-compiles the 8-device sharded train step for a v5e:2x4 topology
(compile-only — no TPU attach, safe under the CPU-forced suite) and
asserts the load-bearing schedule facts:

  * the module is scheduled (printed order == execution order);
  * the parameter-gradient psum is ONE combined all-reduce carrying all
    gradient leaves (XLA's combiner batches the per-leaf psums — the
    latency-optimal shape for KB-scale payloads);
  * it is issued at the earliest dependency-legal slot (within a few
    instructions of its last producer — no artificial serialization);
  * the scheduler overlaps collectives with independent compute where
    slack exists (some collective's consumers are sunk well past issue).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "bench"))


@pytest.fixture(scope="module")
def schedule_facts():
    try:
        from overlap_probe import analyze, compile_scheduled_hlo

        txt = compile_scheduled_hlo(size=128)
    except Exception as e:  # pragma: no cover - compile service hiccup
        pytest.skip(f"AOT TPU compile unavailable: {type(e).__name__}: {e}")
    return analyze(txt)


def _grad_psum(facts):
    cands = [v for v in facts["collectives"].values()
             if v["grad_psum"] and v["n_operands"] >= 4]
    assert cands, "no combined gradient psum found in the schedule"
    return max(cands, key=lambda v: v["n_operands"])


def test_module_is_scheduled(schedule_facts):
    assert schedule_facts["is_scheduled"]


def test_grad_psum_is_single_combined_all_reduce(schedule_facts):
    g = _grad_psum(schedule_facts)
    # All 8 gradient leaves (scene v0/v1/v2/color + light pos/color/
    # intensity/mask) ride ONE all-reduce over the full mesh.
    assert g["n_operands"] == 8
    groups = g["replica_groups"]
    assert groups.startswith("{0,1,2,3,4,5,6,7"), groups
    others = [v for v in schedule_facts["collectives"].values()
              if v["grad_psum"] and v["n_operands"] >= 4 and v is not g]
    assert not others, "gradient psum was split across multiple reduces"


def test_grad_psum_issued_as_soon_as_ready(schedule_facts):
    g = _grad_psum(schedule_facts)
    assert g["gap_after_last_producer"] is not None
    assert g["gap_after_last_producer"] <= 3, g


def test_config5_shape_compiles_for_real_8chip_v5e():
    """BASELINE config 5's actual shape — the 1024^2 sharded train step
    on an 8-chip v5e — compiles to a scheduled module (AOT; real
    multi-chip hardware is unavailable in this environment, so
    compile-for-the-real-topology is the strongest available check
    beyond the virtual-CPU dryrun's execution at 128^2)."""
    try:
        from overlap_probe import build_train_step

        train_step, args = build_train_step(size=1024)
        txt = train_step.lower(*args).compile().as_text()
    except Exception as e:  # pragma: no cover - compile service hiccup
        pytest.skip(f"AOT TPU compile unavailable: {type(e).__name__}: {e}")
    assert "is_scheduled=true" in txt


def test_scheduler_overlaps_where_slack_exists(schedule_facts):
    # At least one collective's consumers are sunk >= 20 instructions
    # past issue — independent compute scheduled under the collective.
    windows = [v["window_to_last_consumer"]
               for v in schedule_facts["collectives"].values()
               if v["window_to_last_consumer"] is not None]
    assert windows and max(windows) >= 20, windows
