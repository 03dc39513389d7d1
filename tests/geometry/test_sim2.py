"""Sim(2) group axioms + serialization, host class and batched JAX twins."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

import salve_tpu.geometry.sim2_batch as sim2_batch
from salve_tpu.geometry.rotations import rotmat2d
from salve_tpu.geometry.sim2 import Sim2


def test_constructor_validation() -> None:
    with pytest.raises(ValueError):
        Sim2(R=np.eye(3), t=np.zeros(2), s=1.0)
    with pytest.raises(ValueError):
        Sim2(R=np.eye(2), t=np.zeros(3), s=1.0)
    with pytest.raises(ZeroDivisionError):
        Sim2(R=np.eye(2), t=np.zeros(2), s=0.0)


def test_transform_from_scales_after_rotation() -> None:
    """Action must be s*(R p + t), not (s R p) + t."""
    bSa = Sim2(R=np.eye(2), t=np.array([1.0, 2.0]), s=3.0)
    pts_a = np.array([[1.0, 1.0], [0.0, 0.0]])
    expected = np.array([[6.0, 9.0], [3.0, 6.0]])
    assert np.allclose(bSa.transform_from(pts_a), expected)


def test_compose_matches_matrix_product() -> None:
    a = Sim2(R=rotmat2d(35.0), t=np.array([0.5, -2.0]), s=2.0)
    b = Sim2(R=rotmat2d(-110.0), t=np.array([3.0, 1.0]), s=0.25)
    ab = a.compose(b)
    assert np.allclose(ab.matrix, a.matrix @ b.matrix, atol=1e-6)
    # Action equivalence on points.
    pts = np.random.default_rng(0).normal(size=(7, 2))
    assert np.allclose(ab.transform_from(pts), a.transform_from(b.transform_from(pts)), atol=1e-5)


def test_inverse_roundtrip() -> None:
    a = Sim2(R=rotmat2d(77.0), t=np.array([4.0, -1.0]), s=0.5)
    eye = a.compose(a.inverse())
    assert np.allclose(eye.rotation, np.eye(2), atol=1e-6)
    assert np.allclose(eye.translation, np.zeros(2), atol=1e-6)
    assert np.isclose(eye.scale, 1.0)
    pts = np.array([[1.0, 2.0], [-3.0, 0.5]])
    assert np.allclose(a.inverse().transform_from(a.transform_from(pts)), pts, atol=1e-5)


def test_theta_deg() -> None:
    assert np.isclose(Sim2(rotmat2d(135.0), np.zeros(2), 1.0).theta_deg, 135.0, atol=1e-5)
    assert np.isclose(Sim2(rotmat2d(-91.0), np.zeros(2), 1.0).theta_deg, -91.0, atol=1e-5)


def test_json_roundtrip(tmp_path) -> None:
    a = Sim2(R=rotmat2d(12.0), t=np.array([0.1, 0.2]), s=1.5)
    fpath = tmp_path / "a_Sim2_b.json"
    a.save_as_json(fpath)
    b = Sim2.from_json(fpath)
    assert a == b
    # Wire format must be flat row-major lists (reference-compatible).
    data = json.loads(fpath.read_text())
    assert set(data) == {"R", "t", "s"}
    assert len(data["R"]) == 4 and len(data["t"]) == 2


def test_from_json_reference_fixture(ref_test_data) -> None:
    """Parse a Sim(2) JSON produced by the reference implementation."""
    a_Sim2_b = Sim2.from_json(ref_test_data / "a_Sim2_b.json")
    assert isinstance(a_Sim2_b.scale, float)
    assert a_Sim2_b.rotation.shape == (2, 2)


def test_from_matrix_roundtrip() -> None:
    a = Sim2(R=rotmat2d(-45.0), t=np.array([2.0, 3.0]), s=4.0)
    b = Sim2.from_matrix(a.matrix)
    assert a == b


# -- batched JAX twins ---------------------------------------------------------

def _as_params(s: Sim2):
    return (jnp.asarray(s.rotation), jnp.asarray(s.translation), jnp.asarray(s.scale))


def test_batch_compose_inverse_transform_match_host() -> None:
    rng = np.random.default_rng(1)
    hosts_a = [Sim2(rotmat2d(th), rng.normal(size=2), float(s)) for th, s in [(10.0, 1.0), (-130.0, 0.3), (75.0, 2.5)]]
    hosts_b = [Sim2(rotmat2d(th), rng.normal(size=2), float(s)) for th, s in [(0.0, 1.1), (45.0, 0.9), (-5.0, 3.0)]]
    A = tuple(jnp.stack([_as_params(h)[i] for h in hosts_a]) for i in range(3))
    B = tuple(jnp.stack([_as_params(h)[i] for h in hosts_b]) for i in range(3))

    Rc, tc, sc = sim2_batch.compose(A, B)
    for k, (ha, hb) in enumerate(zip(hosts_a, hosts_b)):
        hc = ha.compose(hb)
        assert np.allclose(Rc[k], hc.rotation, atol=1e-5)
        assert np.allclose(tc[k], hc.translation, atol=1e-5)
        assert np.isclose(sc[k], hc.scale, atol=1e-6)

    Ri, ti, si = sim2_batch.inverse(A)
    for k, ha in enumerate(hosts_a):
        hi = ha.inverse()
        assert np.allclose(Ri[k], hi.rotation, atol=1e-5)
        assert np.allclose(ti[k], hi.translation, atol=1e-4)

    pts = jnp.asarray(rng.normal(size=(3, 5, 2)))
    out = sim2_batch.transform(A, pts)
    for k, ha in enumerate(hosts_a):
        assert np.allclose(out[k], ha.transform_from(np.asarray(pts[k])), atol=1e-4)

    th = sim2_batch.theta_deg(A)
    for k, ha in enumerate(hosts_a):
        assert np.isclose(th[k], ha.theta_deg, atol=1e-4)


def test_batch_wrap_angle() -> None:
    a1 = jnp.array([179.0, -170.0, 0.0, 45.0])
    a2 = jnp.array([-179.0, 170.0, 360.0, 55.0])
    expected = jnp.array([2.0, 20.0, 0.0, 10.0])
    assert np.allclose(sim2_batch.wrap_angle_deg(a1, a2), expected)
