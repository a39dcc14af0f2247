"""Pallas tile-gather kernel: interpret mode vs XLA fallback vs direct."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpg_svo_tpu.ops.pallas_tiles import PaddedPyramid, gather_tiles
from rpg_svo_tpu.ops.pyramid import build_pyramid


@pytest.fixture(scope="module")
def pyr():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (480, 752), jnp.float32) * 255.0
    return build_pyramid(img, 5)


def _direct(levels, level, x0c, y0c, th, tw):
    out = []
    for i in range(level.shape[0]):
        img = np.asarray(levels[int(level[i])])
        out.append(img[int(y0c[i]): int(y0c[i]) + th,
                       int(x0c[i]): int(x0c[i]) + tw])
    return np.stack(out)


@pytest.mark.parametrize("th,tw", [(17, 17), (24, 24)])
def test_gather_tiles_matches_direct(pyr, th, tw):
    pp = PaddedPyramid(pyr)
    n = 37
    key = jax.random.PRNGKey(3)
    level = jax.random.randint(key, (n,), 0, 5, jnp.int32)
    # random origins, some intentionally out of range (clamped)
    x0 = jax.random.randint(jax.random.PRNGKey(4), (n,), -10, 760,
                            jnp.int32)
    y0 = jax.random.randint(jax.random.PRNGKey(5), (n,), -10, 470,
                            jnp.int32)
    for interpret in (False, True):
        tiles, x0c, y0c = gather_tiles(pp, level, x0, y0, th, tw,
                                       interpret=interpret)
        ref = _direct(pyr, np.asarray(level), np.asarray(x0c),
                      np.asarray(y0c), th, tw)
        assert np.max(np.abs(np.asarray(tiles) - ref)) == 0.0, \
            f"interpret={interpret}"


def test_clamping_keeps_tiles_in_level(pyr):
    pp = PaddedPyramid(pyr)
    level = jnp.array([4, 4], jnp.int32)       # 30 x 47 level
    x0 = jnp.array([100, -5], jnp.int32)
    y0 = jnp.array([100, -5], jnp.int32)
    tiles, x0c, y0c = gather_tiles(pp, level, x0, y0, 17, 17)
    assert int(x0c[0]) == 47 - 17 and int(y0c[0]) == 30 - 17
    assert int(x0c[1]) == 0 and int(y0c[1]) == 0
    ref = _direct(pyr, np.asarray(level), np.asarray(x0c),
                  np.asarray(y0c), 17, 17)
    assert np.max(np.abs(np.asarray(tiles) - ref)) == 0.0


def test_flat_view_matches_packed_sampling(pyr):
    """The strided flat view of a padded stack samples identically to the
    packed FlatPyramid (bilinear + nearest, validity included)."""
    from rpg_svo_tpu.ops.interp import FlatPyramid
    pp = PaddedPyramid(pyr)
    fv = pp.flat_view()
    fp = FlatPyramid(pyr)
    key = jax.random.PRNGKey(3)
    n = 257
    lv = jax.random.randint(key, (n,), 0, len(pyr))
    # include out-of-range coords to exercise the validity masks
    xy = jax.random.uniform(jax.random.PRNGKey(4), (n, 2)) \
        * jnp.array([900.0, 600.0]) - 50.0
    vb1, ok1 = fp.bilinear(lv, xy)
    vb2, ok2 = fv.bilinear(lv, xy)
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
    np.testing.assert_allclose(np.asarray(vb1), np.asarray(vb2), atol=1e-5)
    vn1, okn1 = fp.nearest(lv, xy)
    vn2, okn2 = fv.nearest(lv, xy)
    np.testing.assert_array_equal(np.asarray(okn1), np.asarray(okn2))
    np.testing.assert_array_equal(np.asarray(vn1), np.asarray(vn2))


def test_from_stack_roundtrip(pyr):
    """from_stack(stack, shapes) reproduces the original levels and tile
    gathers bit-exactly."""
    pp = PaddedPyramid(pyr)
    pp2 = PaddedPyramid.from_stack(pp.stack.reshape(-1), pp.shapes)
    assert pp2.Ws == pp.Ws and pp2.Hs == pp.Hs
    for a, b in zip(pp2.levels(), pyr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    lv = jnp.array([0, 1, 2, 3, 4], jnp.int32)
    x0 = jnp.array([10, 5, 3, 2, 1], jnp.int32)
    y0 = jnp.array([20, 9, 4, 2, 1], jnp.int32)
    t1, _, _ = gather_tiles(pp, lv, x0, y0, 17, 17, interpret=True)
    t2, _, _ = gather_tiles(pp2, lv, x0, y0, 17, 17, interpret=True)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
