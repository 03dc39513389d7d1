"""Tests for the pano depth network + layout depth synthesis."""

import jax
import jax.numpy as jnp
import numpy as np

from salve_tpu.models import depth_net


class TestSynthesizeDepth:
    def test_square_room_closed_form(self) -> None:
        """2x2 room (half=1), camera at 1.0m: center-row depth equals the
        horizontal wall distance; nadir equals camera height."""
        room = np.array([[-1.0, -1], [1, -1], [1, 1], [-1, 1]])
        h, w = 64, 128
        depth = depth_net.synthesize_depth_from_layout(
            room, camera_height_m=1.0, ceiling_height_m=2.0, h=h, w=w
        )
        assert depth.shape == (h, w)
        assert np.isfinite(depth).all()
        # Horizon row: rays are nearly horizontal -> depth in [1, sqrt(2)].
        mid = depth[h // 2]
        assert mid.min() > 0.95 and mid.max() < 1.5
        # Bottom row: looking straight down -> ~camera height.
        assert abs(depth[-1, 0] - 1.0) < 0.05
        # Top row: looking straight up -> ~ceiling height above camera (1m).
        assert abs(depth[0, 0] - 1.0) < 0.05

    def test_wall_vs_floor_transition(self) -> None:
        room = np.array([[-2.0, -2], [2, -2], [2, 2], [-2, 2]])
        depth = depth_net.synthesize_depth_from_layout(
            room, camera_height_m=1.5, ceiling_height_m=3.0, h=64, w=128
        )
        # Depth is larger at the horizon than at the nadir for a wide room.
        assert depth[32].mean() > depth[-1].mean()


class TestPanoDepthNet:
    def test_forward_shape_small(self) -> None:
        # Smaller pano for test speed; architecture is size-polymorphic in W
        # multiples of 32 and fixed H via the decoder.
        model = depth_net.PanoDepthNet(num_layers=18, embed_dim=64, num_blocks=1, compute_dtype=jnp.float32)
        rgb = jnp.zeros((1, 512, 1024, 3))
        variables = model.init(jax.random.PRNGKey(0), rgb)
        depth = model.apply(variables, rgb)
        assert depth.shape == (1, 512, 1024)
        assert (np.asarray(depth) >= 0).all()

    def test_train_step_decreases_loss(self) -> None:
        from salve_tpu.training import depth as depth_train

        state = depth_train.create_depth_train_state(
            jax.random.PRNGKey(0), num_layers=18
        )
        # Patch to a tiny model for speed.
        import flax.linen as nn

        step = depth_train.make_depth_train_step()
        rng = np.random.default_rng(0)
        rgb = rng.uniform(0, 1, (1, 512, 1024, 3)).astype(np.float32)
        depth_gt = np.full((1, 512, 1024), 2.0, dtype=np.float32)
        valid = np.ones((1, 512, 1024), dtype=np.float32)

        losses = []
        for _ in range(3):
            state, loss = step(state, rgb, depth_gt, valid)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
