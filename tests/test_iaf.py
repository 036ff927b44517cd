import jax.numpy as jnp
import numpy as np

from lens_tpu.core.iaf import iaf_step, iaf_step_int


def test_single_spike_and_subtract_reset():
    v = jnp.zeros((1, 1))
    v, s = iaf_step(v, jnp.array([[1.5]]), threshold=1.0)
    assert s[0, 0] == 1.0
    np.testing.assert_allclose(v[0, 0], 0.5)


def test_multi_spike():
    v = jnp.zeros((1, 1))
    v, s = iaf_step(v, jnp.array([[3.7]]), threshold=1.0)
    assert s[0, 0] == 3.0
    np.testing.assert_allclose(v[0, 0], 0.7, rtol=1e-6)


def test_subthreshold_accumulation():
    v = jnp.zeros((1, 1))
    for _ in range(3):
        v, s = iaf_step(v, jnp.array([[0.4]]), threshold=1.0)
    # 0.4 * 3 = 1.2 crosses threshold on the third step
    assert s[0, 0] == 1.0
    np.testing.assert_allclose(v[0, 0], 0.2, rtol=1e-5)


def test_min_v_mem_floor():
    v = jnp.zeros((1, 1))
    v, s = iaf_step(v, jnp.array([[-5.0]]), threshold=1.0, min_v_mem=-1.0)
    assert s[0, 0] == 0.0
    np.testing.assert_allclose(v[0, 0], -1.0)


def test_no_floor_when_none():
    v = jnp.zeros((1, 1))
    v, _ = iaf_step(v, jnp.array([[-5.0]]), threshold=1.0, min_v_mem=None)
    np.testing.assert_allclose(v[0, 0], -5.0)


def test_binary_passthrough_with_unit_threshold():
    # The conv IAF on binary spikes is an exact passthrough — the property the
    # inference program relies on to rasterize post-downsample.
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2, size=(16, 10)).astype(np.float32)
    v = jnp.zeros((16, 10))
    for t in range(5):
        v, s = iaf_step(v, jnp.asarray(x), threshold=1.0)
        np.testing.assert_array_equal(np.asarray(s), x)


def test_integer_iaf_matches_float_on_integers():
    rng = np.random.default_rng(1)
    xi = rng.integers(-3, 8, size=(4, 7))
    thr = 3
    vf = jnp.zeros((4, 7))
    vi = jnp.zeros((4, 7), jnp.int32)
    for _ in range(6):
        vf, sf = iaf_step(vf, jnp.asarray(xi, jnp.float32), float(thr), min_v_mem=None)
        vi, si = iaf_step_int(vi, jnp.asarray(xi, jnp.int32), jnp.int32(thr))
        np.testing.assert_array_equal(np.asarray(sf), np.asarray(si).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(vf), np.asarray(vi).astype(np.float32))
