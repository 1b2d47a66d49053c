"""Scene IO, input-format DSL, and splitter tests."""

import os

import numpy as np
import pytest

from read_tpu.data import splitter as S
from read_tpu.scene import formats as F
from read_tpu.scene import io as IO


def test_ply_roundtrip_binary(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.uniform(size=(100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "cloud.ply")
    IO.write_ply(p, xyz, rgb, nrm)
    model = IO.import_model3d(p)
    np.testing.assert_allclose(model["xyz"], xyz, rtol=1e-6)
    np.testing.assert_allclose(model["normals"], nrm, rtol=1e-6)
    # rgb goes through uint8 quantization
    np.testing.assert_allclose(model["rgb"], np.clip(rgb, 0, 1), atol=1/255)
    np.testing.assert_array_equal(model["uv1d"], np.arange(100))
    assert model["uv2d"].shape == (100, 2)


def test_ply_roundtrip_ascii(tmp_path, rng):
    xyz = rng.normal(size=(10, 3)).astype(np.float32)
    p = str(tmp_path / "cloud_ascii.ply")
    IO.write_ply(p, xyz, binary=False)
    model = IO.import_model3d(p)
    np.testing.assert_allclose(model["xyz"], xyz, rtol=1e-5)
    # no colors -> reference's white*255 fallback
    assert (model["rgb"] == 255).all()


def test_ply_mesh_faces(tmp_path):
    # hand-written mesh PLY with faces
    content = b"""ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
3 0 1 2
"""
    p = str(tmp_path / "tri.ply")
    with open(p, "wb") as f:
        f.write(content)
    model = IO.import_model3d(p, is_mesh=True)
    np.testing.assert_array_equal(model["faces"], [0, 1, 2])


def test_metashape_xml(tmp_path):
    xml = """<document><chunk>
    <sensors><sensor><calibration>
      <resolution width="1216" height="368"/><f>720.5</f>
    </calibration></sensor></sensors>
    <cameras>
      <camera label="frame0"><transform>1 0 0 5 0 1 0 6 0 0 1 7 0 0 0 1</transform></camera>
      <camera label="frame1"><transform>1 0 0 8 0 1 0 9 0 0 1 10 0 0 0 1</transform></camera>
    </cameras>
    </chunk></document>"""
    p = str(tmp_path / "camera.xml")
    with open(p, "w") as f:
        f.write(xml)
    K, (w, h) = IO.intrinsics_from_xml(p)
    assert (w, h) == (1216, 368)
    assert K[0, 0] == pytest.approx(720.5)
    assert K[0, 2] == pytest.approx(608)
    views, labels = IO.extrinsics_from_xml(p)
    assert labels == ["frame0", "frame1"]
    # cv->gl: columns 1:3 negated
    np.testing.assert_allclose(views[0][:, 1], [0, -1, 0, 0])
    np.testing.assert_allclose(views[0][:, 2], [0, 0, -1, 0])
    np.testing.assert_allclose(views[0][:, 3], [5, 6, 7, 1])


def test_scene_manifest(tmp_path, rng):
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    IO.write_ply(str(tmp_path / "pc.ply"), xyz)
    vm = np.tile(np.eye(4), (3, 1, 1)).reshape(-1, 4)
    np.savetxt(str(tmp_path / "view.fake"), vm)
    with open(tmp_path / "scene.yaml", "w") as f:
        f.write("viewport_size: [640, 480]\n"
                "pointcloud: pc.ply\n"
                "view_matrix: view.fake\n")
    data = IO.load_scene_data(str(tmp_path / "scene.yaml"))
    assert data["pointcloud"]["xyz"].shape == (50, 3)
    assert len(data["view_matrix"]) == 3
    assert data["camera_labels"] == ["0", "1", "2"]
    assert data["config"]["viewport_size"] == (640, 480)


def test_dsl_roundtrip():
    # The reference's own self-test cases (dataset.py:126-198 spirit).
    cases = ["colors", "uv_1d_p1", "uv_1d_p1_ds2", "uv_2d", "normals_m",
             "normals_d_p4_ds1", "xyz_ps8", "depth", "labels_ds3",
             "colors_p2"]
    for s in cases:
        spec = F.parse_input_string(s)
        assert F.generate_input_string(spec) == s, s


def test_dsl_train_format():
    fmt = "uv_1d_p1, uv_1d_p1_ds1, uv_1d_p1_ds2, uv_1d_p1_ds3, uv_1d_p1_ds4"
    specs = F.parse_input_format(fmt)
    assert len(specs) == 5
    assert all(sp.mode == "uv_1d" for sp in specs)
    assert [sp.downscale for sp in specs] == [None, 1, 2, 3, 4]
    assert all(sp.point_size == 1 for sp in specs)


def test_dsl_rejects_garbage():
    with pytest.raises(ValueError):
        F.parse_input_string("bogus_p1")


def test_split_by_step():
    lists = [list(range(20)), [f"f{i}" for i in range(20)]]
    train, val = S.split_by_step(lists, val_step=10)
    assert val[0] == [0, 10]
    assert 0 not in train[0] and 10 not in train[0]
    assert len(train[0]) + len(val[0]) == 20
    assert train[1][0] == "f1"


def test_split_by_step_drop():
    lists = [list(range(20))]
    train, val = S.split_by_step(lists, val_step=10, train_drop=1)
    assert 1 not in train[0] and 9 not in train[0] and 11 not in train[0]


def test_split_by_ratio_deterministic():
    lists = [list(range(100))]
    t1, v1 = S.split_by_ratio(lists, 0.9, seed=7)
    t2, v2 = S.split_by_ratio(lists, 0.9, seed=7)
    assert t1 == t2 and v1 == v2
    assert len(t1[0]) == 90 and len(v1[0]) == 10
    assert sorted(t1[0] + v1[0]) == list(range(100))


def test_eval_all():
    lists = [list(range(5))]
    train, val = S.eval_all(lists)
    assert train == [[]] and val == [list(range(5))]


def test_get_splitter_registry():
    assert S.get_splitter("split_by_step") is S.split_by_step
    with pytest.raises(KeyError):
        S.get_splitter("nope")
