"""Kerr geodesic integrator and accretion-disk renderer tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rrt_tpu.physics import kerr
from rrt_tpu.render import kerr_scene as K


def _deflect(mass, spin, b, n=3000, dlam=0.05):
    bh = kerr.KerrParams(position=jnp.zeros(3), mass=jnp.asarray(mass),
                         spin=jnp.asarray(spin))
    o = jnp.array([[-40.0, 0.0, b]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    st = kerr.make_state(o, d, bh)

    def step(st, _):
        st, _ = kerr.march_step(st, bh, dlam, r_escape=100.0)
        return st, None

    st, _ = jax.lax.scan(step, st, None, length=n)
    p = np.array(st.p[0], copy=True)
    p /= np.linalg.norm(p)
    ang = np.arccos(np.clip(p[0], -1, 1))
    return ang, bool(st.captured[0])


def test_zero_mass_goes_straight():
    ang, cap = _deflect(1e-9, 0.0, 5.0)
    assert not cap
    assert ang < 1e-4


def test_weak_field_deflection_4M_over_b():
    ang, cap = _deflect(0.5, 0.0, 20.0)
    assert not cap
    assert ang == pytest.approx(4 * 0.5 / 20.0, rel=0.08)


def test_photon_capture_below_critical_impact():
    # b_crit = 3√3 M ≈ 2.598·M for Schwarzschild
    _, cap_in = _deflect(0.5, 0.0, 1.2)
    _, cap_out = _deflect(0.5, 0.0, 3.0)
    assert cap_in and not cap_out


def test_spin_asymmetry():
    """Prograde vs retrograde photons bend differently for a ≠ 0."""
    ang_p, _ = _deflect(1.0, 0.9, 8.0)
    ang_m, _ = _deflect(1.0, -0.9, 8.0)
    assert abs(ang_p - ang_m) > 0.01


def test_null_constraint_preserved():
    """ℋ stays ≈ 0 along the integration (RK4 accuracy check)."""
    bh = kerr.KerrParams(position=jnp.zeros(3), mass=jnp.asarray(1.0),
                         spin=jnp.asarray(0.7))
    o = jnp.array([[-30.0, 2.0, 4.0]])
    d = jnp.array([[1.0, 0.05, -0.1]])
    d = d / jnp.linalg.norm(d)
    st = kerr.make_state(o, d, bh)
    h0 = float(kerr.hamiltonian(st.x, st.p, st.pt, bh.mass, bh.spin)[0])
    assert abs(h0) < 1e-5

    def step(st, _):
        st, _ = kerr.march_step(st, bh, 0.05, r_escape=200.0)
        return st, None

    st, _ = jax.lax.scan(step, st, None, length=2000)
    h1 = float(kerr.hamiltonian(st.x, st.p, st.pt, bh.mass, bh.spin)[0])
    assert abs(h1) < 1e-2


def test_disk_render_structure():
    """64×48 render: shadow in the middle, disk visible, background lit."""
    bh = kerr.KerrParams(position=jnp.zeros(3), mass=jnp.asarray(1.0),
                         spin=jnp.asarray(0.9))
    disk = K.default_disk(1.0)
    img = K.render_image(64, 48, bh, disk, n_steps=300)
    assert np.isfinite(img).all()
    # center pixels: the shadow (captured) → black
    assert img[22:26, 30:34].max() < 1e-3
    # the disk is bright somewhere
    assert img.max() > 0.5
    # background corners nonzero (escaped rays)
    assert img[0, 0].sum() > 0.0
    # Doppler beaming: left/right asymmetry of the disk
    left = img[:, :32].sum()
    right = img[:, 32:].sum()
    assert abs(left - right) / max(left, right) > 0.2
