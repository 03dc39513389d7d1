"""Tests for the fused render->verify device pipeline."""

import jax
import numpy as np
import pytest

from salve_tpu.common.alignment_hypothesis import AlignmentHypothesis
from salve_tpu.geometry.sim2 import Sim2
from salve_tpu.pipeline.fused_inference import score_floor_hypotheses
from salve_tpu.rendering.bev_pair import BEVRenderConfig
from salve_tpu.training import train as train_lib
from salve_tpu.training.config import TrainingConfig


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = TrainingConfig(
        num_layers=18,
        resize_h=64,
        resize_w=64,
        train_h=56,
        train_w=56,
        modalities=("ceiling_rgb_texture", "floor_rgb_texture"),
        compute_dtype="float32",
    )
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0), max_iter=10)
    render_cfg = BEVRenderConfig(img_px=100, meters_per_px=0.1, crop_ratio=0.1)

    rng = np.random.default_rng(0)
    h, w = 64, 128
    depths = rng.uniform(1000, 4000, (2, h, w)).astype(np.uint16)
    rgbs = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)
    return cfg, state, render_cfg, depths, rgbs


def _hyp(theta, tx, ty):
    return AlignmentHypothesis(
        i2Ti1=Sim2.from_theta_deg(theta, np.array([tx, ty])),
        wdo_alignment_object="door",
        i1_wdo_idx=0,
        i2_wdo_idx=0,
        configuration="identity",
    )


class TestFusedInference:
    def test_scores_all_hypotheses(self, tiny_setup) -> None:
        cfg, state, render_cfg, depths, rgbs = tiny_setup
        hyps = [
            (3, 5, _hyp(0.0, 0.0, 0.0)),
            (3, 5, _hyp(45.0, 1.0, -0.5)),
            (3, 5, _hyp(90.0, -1.0, 0.5)),
        ]
        results = score_floor_hypotheses(
            state, cfg, depths, rgbs, {3: 0, 5: 1}, hyps,
            batch_size=2, render_cfg=render_cfg,
        )
        assert len(results) == 3
        for r, (i1, i2, ah) in zip(results, hyps):
            assert (r.i1, r.i2) == (i1, i2)
            assert r.y_hat in (0, 1)
            assert 0.0 <= r.prob <= 1.0
            assert r.wdo_pair_uuid == "door_0_0"

    def test_deterministic(self, tiny_setup) -> None:
        cfg, state, render_cfg, depths, rgbs = tiny_setup
        hyps = [(3, 5, _hyp(10.0, 0.3, 0.2))]
        r1 = score_floor_hypotheses(state, cfg, depths, rgbs, {3: 0, 5: 1}, hyps, 2, render_cfg)
        r2 = score_floor_hypotheses(state, cfg, depths, rgbs, {3: 0, 5: 1}, hyps, 2, render_cfg)
        assert r1 == r2

    def test_mesh_sharded_matches_single_device(self, tiny_setup) -> None:
        """shard_map over the 8-device virtual mesh must reproduce the
        single-device fused scorer exactly (pure data parallelism: no
        collectives, replicated banks/params, local per-shard scatters)."""
        from salve_tpu.parallel.mesh import make_mesh

        cfg, state, render_cfg, depths, rgbs = tiny_setup
        hyps = [
            (3, 5, _hyp(15.0 * k, 0.2 * k - 1.0, 0.1 * k)) for k in range(12)
        ]
        base = score_floor_hypotheses(
            state, cfg, depths, rgbs, {3: 0, 5: 1}, hyps,
            batch_size=8, render_cfg=render_cfg,
        )
        mesh = make_mesh((8,))
        with mesh:
            sharded = score_floor_hypotheses(
                state, cfg, depths, rgbs, {3: 0, 5: 1}, hyps,
                batch_size=8, render_cfg=render_cfg, mesh=mesh,
            )
        assert [r.y_hat for r in sharded] == [r.y_hat for r in base]
        np.testing.assert_allclose(
            [r.prob for r in sharded], [r.prob for r in base], rtol=1e-5
        )

    def test_mesh_batch_divisibility_enforced(self, tiny_setup) -> None:
        from salve_tpu.parallel.mesh import make_mesh

        cfg, state, render_cfg, depths, rgbs = tiny_setup
        mesh = make_mesh((8,))
        with pytest.raises(ValueError, match="not divisible"):
            score_floor_hypotheses(
                state, cfg, depths, rgbs, {3: 0, 5: 1},
                [(3, 5, _hyp(0.0, 0.0, 0.0))],
                batch_size=6, render_cfg=render_cfg, mesh=mesh,
            )

    def test_warp_renders_smoke_and_shape(self, tiny_setup) -> None:
        """The Sim(2)-warp render path (ops/warp.py) scores hypotheses
        end-to-end with the same output schema as the direct path."""
        cfg, state, render_cfg, depths, rgbs = tiny_setup
        hyps = [
            (3, 5, _hyp(0.0, 0.0, 0.0)),
            (3, 5, _hyp(30.0, 0.8, -0.4)),
        ]
        results = score_floor_hypotheses(
            state, cfg, depths, rgbs, {3: 0, 5: 1}, hyps,
            batch_size=2, render_cfg=render_cfg, use_warp_renders=True,
        )
        assert len(results) == 2
        for r in results:
            assert r.y_hat in (0, 1)
            assert 0.0 <= r.prob <= 1.0

    def test_warp_identity_hypothesis_matches_direct(self, tiny_setup) -> None:
        """At the identity hypothesis the warp is a bit-exact crop of the
        extended identity render, and that render comes from the SAME
        production path as the direct render — so the verifier scores must
        agree to float tolerance."""
        cfg, state, render_cfg, depths, rgbs = tiny_setup
        hyps = [(3, 5, _hyp(0.0, 0.0, 0.0))]
        direct = score_floor_hypotheses(
            state, cfg, depths, rgbs, {3: 0, 5: 1}, hyps, 2, render_cfg
        )
        warped = score_floor_hypotheses(
            state, cfg, depths, rgbs, {3: 0, 5: 1}, hyps, 2, render_cfg,
            use_warp_renders=True,
        )
        assert direct[0].y_hat == warped[0].y_hat
        np.testing.assert_allclose(direct[0].prob, warped[0].prob, rtol=1e-4)

    def test_warp_mesh_sharded_matches_single_device(self, tiny_setup) -> None:
        from salve_tpu.parallel.mesh import make_mesh

        cfg, state, render_cfg, depths, rgbs = tiny_setup
        hyps = [
            (3, 5, _hyp(20.0 * k, 0.15 * k - 0.5, 0.1 * k)) for k in range(8)
        ]
        base = score_floor_hypotheses(
            state, cfg, depths, rgbs, {3: 0, 5: 1}, hyps,
            batch_size=8, render_cfg=render_cfg, use_warp_renders=True,
        )
        mesh = make_mesh((8,))
        with mesh:
            sharded = score_floor_hypotheses(
                state, cfg, depths, rgbs, {3: 0, 5: 1}, hyps,
                batch_size=8, render_cfg=render_cfg, mesh=mesh,
                use_warp_renders=True,
            )
        assert [r.y_hat for r in sharded] == [r.y_hat for r in base]
        np.testing.assert_allclose(
            [r.prob for r in sharded], [r.prob for r in base], rtol=1e-5
        )

    def test_rejects_wrong_modalities(self, tiny_setup) -> None:
        _, state, render_cfg, _, _ = tiny_setup
        from salve_tpu.pipeline.fused_inference import make_fused_score_fn

        bad_cfg = TrainingConfig(modalities=("floor_rgb_texture",))
        with pytest.raises(ValueError):
            make_fused_score_fn(state, bad_cfg, render_cfg)


class TestWarpDefault:
    def test_resolves_by_backend(self, monkeypatch) -> None:
        import jax

        from salve_tpu.pipeline import fused_inference as fi

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.delenv("SALVE_TPU_DISABLE_WARP", raising=False)
        assert fi.resolve_warp_default() is True

        monkeypatch.setenv("SALVE_TPU_DISABLE_WARP", "1")
        assert fi.resolve_warp_default() is False

        # The value is parsed, not just presence: "0"/"false" keep warp ON.
        monkeypatch.setenv("SALVE_TPU_DISABLE_WARP", "0")
        assert fi.resolve_warp_default() is True
        monkeypatch.setenv("SALVE_TPU_DISABLE_WARP", "false")
        assert fi.resolve_warp_default() is True
        monkeypatch.setenv("SALVE_TPU_DISABLE_WARP", "true")
        assert fi.resolve_warp_default() is False

        monkeypatch.delenv("SALVE_TPU_DISABLE_WARP")
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        assert fi.resolve_warp_default() is False
