"""Cornell-box constants: structure, ranges, and normal orientation.

The builder must match `raytracer/Source/TestModel.h:51-192` bit-for-bit;
these tests check the structural invariants and a handful of hand-computed
vertices (555-scale values pushed through the f32 rescale loop).
"""

import numpy as np

from raytpu.core.cornell import cornell_box, cornell_box_numpy


def _rescale(p):
    v = np.array(p, dtype=np.float32)
    v *= np.float32(2.0) / np.float32(555.0)
    v -= np.float32(1.0)
    v *= np.array([-1.0, -1.0, 1.0], dtype=np.float32)
    return v


def test_counts_and_ranges():
    v0, v1, v2, color = cornell_box_numpy()
    assert v0.shape == v1.shape == v2.shape == color.shape == (30, 3)
    allv = np.concatenate([v0, v1, v2])
    assert allv.min() >= -1.0000001 and allv.max() <= 1.0000001
    assert v0.dtype == np.float32


def test_known_vertices():
    v0, v1, v2, _ = cornell_box_numpy()
    # Floor triangle 0 = Triangle(C, B, A) with C=(L,0,L), B=(0,0,0), A=(L,0,0)
    # (`TestModel.h:83`).
    np.testing.assert_array_equal(v0[0], _rescale((555.0, 0.0, 555.0)))
    np.testing.assert_array_equal(v1[0], _rescale((0.0, 0.0, 0.0)))
    np.testing.assert_array_equal(v2[0], _rescale((555.0, 0.0, 0.0)))
    # Short-block first triangle = (E, B, A) (`TestModel.h:116`).
    np.testing.assert_array_equal(v0[10], _rescale((290.0, 165.0, 114.0)))
    # Tall-block last triangle = (G, H, F) (`TestModel.h:166`).
    np.testing.assert_array_equal(v0[29], _rescale((472.0, 330.0, 406.0)))
    np.testing.assert_array_equal(v2[29], _rescale((265.0, 330.0, 296.0)))


def test_colors():
    _, _, _, color = cornell_box_numpy()
    np.testing.assert_array_equal(color[0], np.float32([0.15, 0.75, 0.15]))
    np.testing.assert_array_equal(color[10], np.float32([0.75, 0.15, 0.15]))
    np.testing.assert_array_equal(color[29], np.float32([0.15, 0.15, 0.75]))


def test_normals_orientation():
    """Floor normal must point up toward -y (ref y is negated, camera space
    has y down): normalize(cross(e2, e1)) (`TestModel.h:30`)."""
    scene = cornell_box()
    n = np.asarray(scene.normals())
    # Floor triangles 0-1: after the y-negation the floor sits at y=+1 and
    # its normal faces the interior (negative y).
    assert n[0][1] < -0.99
    assert n[1][1] < -0.99
    # Ceiling triangles 6-7 face +y.
    assert n[6][1] > 0.99
    # Unit length.
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-6)


def test_padding():
    scene = cornell_box(pad_to=64)
    assert scene.num_triangles == 64
    assert float(scene.active.sum()) == 30.0
