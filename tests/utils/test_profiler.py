"""Tests for the stage-timer / profiler hooks."""

import time

from salve_tpu.utils import profiler


class TestStageTimer:
    def test_accumulates(self, tmp_path) -> None:
        profiler.reset_stage_timers()
        with profiler.stage_timer("stage_a"):
            time.sleep(0.01)
        with profiler.stage_timer("stage_a"):
            time.sleep(0.01)
        with profiler.stage_timer("stage_b"):
            pass
        summary = profiler.stage_summary()
        assert summary["stage_a"]["count"] == 2
        assert summary["stage_a"]["total_s"] >= 0.02
        assert "stage_b" in summary

        out = tmp_path / "stages.json"
        profiler.save_stage_summary(str(out))
        assert out.exists()

    def test_device_trace_noop(self) -> None:
        with profiler.device_trace(None):
            pass

    def test_annotate(self) -> None:
        import jax.numpy as jnp

        with profiler.annotate("test-region"):
            (jnp.ones(4) * 2).block_until_ready()
