"""Pallas fill+mask kernel vs the XLA reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from salve_tpu.ops import bev as bev_ops
from salve_tpu.ops.pallas_fill import fill_and_mask


def _xla_reference(sparse, occ, support):
    interp = bev_ops.fill_holes(jnp.asarray(sparse), jnp.asarray(occ))
    counts = bev_ops._box_counts(jnp.asarray(support, jnp.float32), bev_ops.DEFAULT_MASK_KERNEL)
    mask = counts > 0.5
    return np.asarray(jnp.where(mask[..., None], interp, 0.0))


class TestPallasFillAndMask:
    def test_matches_xla_path(self) -> None:
        rng = np.random.default_rng(0)
        h = w = 64
        occ = rng.uniform(0, 1, (h, w)) > 0.85
        sparse = np.where(occ[..., None], rng.uniform(10, 250, (h, w, 3)), 0.0).astype(
            np.float32
        )
        support = occ & (sparse > 0).all(axis=-1)

        out_pallas = np.asarray(
            fill_and_mask(
                jnp.asarray(sparse), jnp.asarray(occ), jnp.asarray(support), interpret=True
            )
        )
        out_xla = _xla_reference(sparse, occ, support)
        assert np.allclose(out_pallas, out_xla, atol=1e-4), np.abs(out_pallas - out_xla).max()

    def test_empty_input(self) -> None:
        h = w = 32
        z = np.zeros((h, w, 3), np.float32)
        occ = np.zeros((h, w), bool)
        out = np.asarray(
            fill_and_mask(jnp.asarray(z), jnp.asarray(occ), jnp.asarray(occ), interpret=True)
        )
        assert (out == 0).all()


class TestFillAndMaskBatched:
    def test_batched_matches_single(self) -> None:
        """grid=(B,3) batched kernel == per-image kernel, bit-exact."""
        import numpy as np

        from salve_tpu.ops.pallas_fill import fill_and_mask_batched

        rng = np.random.default_rng(0)
        B, H, W = 3, 40, 64
        occ = rng.uniform(size=(B, H, W)) < 0.15
        sparse = rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32) * occ[..., None]
        support = (sparse > 0).all(axis=-1)

        batched = np.asarray(
            fill_and_mask_batched(
                jnp.asarray(sparse), jnp.asarray(occ), jnp.asarray(support),
                interpret=True,
            )
        )
        for b in range(B):
            single = np.asarray(
                fill_and_mask(
                    jnp.asarray(sparse[b]), jnp.asarray(occ[b]),
                    jnp.asarray(support[b]), interpret=True,
                )
            )
            assert np.array_equal(batched[b], single), f"batch element {b} differs"
