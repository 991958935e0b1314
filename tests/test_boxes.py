import numpy as np
import jax.numpy as jnp

from proxytransformation_tpu.structures import (EulerBoxes, box_corners,
                                                bbox_to_corners,
                                                box_transform, box_flip,
                                                points_in_boxes,
                                                euler_angles_to_matrix,
                                                points_cam2img,
                                                points_img2cam)


def test_corners_axis_aligned():
    box = jnp.asarray([[1, 2, 3, 2, 4, 6, 0, 0, 0]], jnp.float32)
    c = np.asarray(box_corners(box))[0]
    np.testing.assert_allclose(c.min(0), [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(c.max(0), [2, 4, 6], atol=1e-6)
    c2 = np.asarray(bbox_to_corners(box))[0]
    np.testing.assert_allclose(np.sort(c.ravel()), np.sort(c2.ravel()),
                               atol=1e-6)


def test_transform_roundtrip():
    rng = np.random.RandomState(0)
    boxes = np.concatenate([
        rng.uniform(-2, 2, (5, 3)), rng.uniform(0.5, 2, (5, 3)),
        rng.uniform(-1, 1, (5, 3))
    ], -1).astype(np.float32)
    ang = np.array([0.3, 0.1, -0.2], np.float32)
    rot = euler_angles_to_matrix(jnp.asarray(ang), 'ZXY')
    mat = jnp.eye(4).at[:3, :3].set(rot).at[:3, 3].set(jnp.asarray([1., 2., 3.]))
    inv = jnp.linalg.inv(mat)
    fwd = box_transform(jnp.asarray(boxes), mat)
    back = box_transform(fwd, inv)
    # corners roundtrip (angles themselves may alias)
    np.testing.assert_allclose(np.asarray(box_corners(back)),
                               np.asarray(box_corners(jnp.asarray(boxes))),
                               atol=1e-4)
    # transform moves corners exactly like transforming the corners
    want = np.asarray(box_corners(jnp.asarray(boxes))) @ np.asarray(rot).T \
        + np.array([1, 2, 3])
    got = np.asarray(box_corners(fwd))
    # corner sets are equal as sets; compare sorted
    for i in range(5):
        np.testing.assert_allclose(
            np.sort(got[i], axis=0), np.sort(want[i], axis=0), atol=1e-4)


def test_flip_involution_on_corners():
    # yaw-only boxes: the reference's flip formula
    # (euler_box3d.py:265-283, replicated here) is an exact mirror only
    # in this case; for general euler angles it is approximate.
    rng = np.random.RandomState(1)
    boxes = np.concatenate([
        rng.uniform(-2, 2, (4, 3)), rng.uniform(0.5, 2, (4, 3)),
        rng.uniform(-1, 1, (4, 1)), np.zeros((4, 2))
    ], -1).astype(np.float32)
    for d, axis in (('X', 0), ('Y', 1), ('Z', 2)):
        flipped = box_flip(jnp.asarray(boxes), d)
        want = np.asarray(box_corners(jnp.asarray(boxes))).copy()
        want[..., axis] = -want[..., axis]
        got = np.asarray(box_corners(flipped))
        for i in range(4):
            np.testing.assert_allclose(np.sort(got[i], 0), np.sort(want[i], 0),
                                       atol=1e-4)


def test_points_in_boxes():
    box = jnp.asarray([[0, 0, 0, 2, 2, 2, np.pi / 4, 0, 0]], jnp.float32)
    pts = jnp.asarray([
        [0, 0, 0],          # center: inside
        [1.2, 0, 0],        # beyond the rotated face along x? rotated 45deg:
                            # local coords=(cos45*1.2, -sin45*1.2, 0) -> inside
        [1.5, 1.5, 0],      # corner region: outside
        [0, 0, 2],          # above: outside
    ], jnp.float32)
    got = np.asarray(points_in_boxes(pts, box))[:, 0]
    np.testing.assert_array_equal(got, [True, True, False, False])


def test_euler_boxes_wrapper():
    boxes = EulerBoxes(jnp.asarray([[0, 0, 0, 2, 2, 2, 0, 0, 0]]))
    assert len(boxes) == 1
    np.testing.assert_allclose(np.asarray(boxes.volume), [8.0])
    iou = np.asarray(boxes.overlaps(boxes))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-3)
    r = boxes.rotate(0.5)
    np.testing.assert_allclose(np.asarray(r.tensor[0, 6]), 0.5, atol=1e-5)


def test_projection_roundtrip():
    cam2img = jnp.asarray([[500., 0., 320., 0.],
                           [0., 500., 240., 0.],
                           [0., 0., 1., 0.],
                           [0., 0., 0., 1.]])
    pts = jnp.asarray([[0.5, -0.2, 2.0], [1.0, 1.0, 5.0]], jnp.float32)
    uvd = points_cam2img(pts, cam2img, with_depth=True)
    rec = points_img2cam(uvd, cam2img)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(pts), atol=1e-4)


def test_box3d_mode_roundtrip():
    from proxytransformation_tpu.structures.modes import (Box3DMode,
                                                          convert_box,
                                                          convert_point)
    rng = np.random.RandomState(5)
    boxes = np.concatenate([
        rng.uniform(-2, 2, (4, 3)), rng.uniform(0.5, 2, (4, 3)),
        rng.uniform(-1, 1, (4, 3))
    ], -1).astype(np.float32)
    fwd = convert_box(jnp.asarray(boxes), Box3DMode.DEPTH, Box3DMode.CAM)
    back = convert_box(fwd, Box3DMode.CAM, Box3DMode.DEPTH)
    np.testing.assert_allclose(np.asarray(box_corners(back)),
                               np.asarray(box_corners(jnp.asarray(boxes))),
                               atol=1e-4)
    # corner sets must match under the frame change
    want = np.asarray(convert_point(
        jnp.asarray(np.asarray(box_corners(jnp.asarray(boxes)))
                    .reshape(-1, 3)),
        Box3DMode.DEPTH, Box3DMode.CAM)).reshape(4, 8, 3)
    got = np.asarray(box_corners(fwd))
    for i in range(4):
        np.testing.assert_allclose(np.sort(got[i], 0), np.sort(want[i], 0),
                                   atol=1e-4)


def test_points_container_conversion_roundtrip():
    from proxytransformation_tpu.structures import DepthPoints
    rng = np.random.RandomState(6)
    pts = DepthPoints(jnp.asarray(rng.randn(32, 3).astype(np.float32)))
    cam = pts.convert_to('CAMERA')
    back = cam.convert_to('DEPTH')
    np.testing.assert_allclose(np.asarray(back.coord), np.asarray(pts.coord),
                               atol=1e-5)
    # norms preserved under frame change
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cam.coord), axis=1),
        np.linalg.norm(np.asarray(pts.coord), axis=1), atol=1e-5)
