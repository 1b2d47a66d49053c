"""Scene data IO: PLY point clouds/meshes, Metashape XML, txt/ini poses,
YAML scene manifests.

Parity targets (reference: /root/reference/src/READ/gl/utils.py):
- ``load_scene_data`` (``:286-380``): YAML manifest with keys
  pointcloud/mesh/texture/intrinsic_matrix/proj_matrix/view_matrix/
  model3d_origin/point_sizes/viewport_size/net_path+ckpt+texture_ckpt/
  data_ratio; relative paths resolved against the manifest
  (``fix_relative_path``, ``:404-410``).
- ``import_model3d`` (``:432-500``): vertex dict with xyz, rgb in [0,1]
  (defaults to white*255 when absent — reproduced), normals from ply
  nx/ny/nz, uv2d zeros for point clouds, ``uv1d = arange(n)`` (the point
  index attribute), bbox-normalized ``xyz_c`` colors (``:424-428``).
- ``intrinsics_from_xml`` (``:173-189``): Metashape f with cx,cy at the
  image center; ``intrinsics_from_ini`` (``:191-203``);
  ``intrinsics_from_txt`` (``:205-209``).
- ``extrinsics_from_xml`` (``:211-231``): camera-to-world with columns
  1:3 negated (cv -> gl); ``extrinsics_from_txt`` (``:242-249``, same flip
  + image-name list); ``extrinsics_from_view_matrix`` (``:233-240``) with
  non-finite filtering (``get_valid_matrices``, ``:413-421``).

The reference reads PLY via trimesh; this image has no trimesh, so
``read_ply`` is a self-contained parser (ascii + binary little/big endian)
built on ``np.frombuffer`` — it handles multi-million-point clouds at
memory bandwidth.
"""

from __future__ import annotations

import configparser
import os
import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np
import yaml

__all__ = [
    "read_ply", "write_ply", "import_model3d", "load_scene_data",
    "intrinsics_from_xml", "intrinsics_from_ini", "intrinsics_from_txt",
    "extrinsics_from_xml", "extrinsics_from_txt",
    "extrinsics_from_view_matrix", "get_valid_matrices",
    "fix_relative_path", "get_xyz_colors", "get_normal_colors",
]

_PLY_DTYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply(path: str) -> dict:
    """Parse a PLY file. Returns ``{'vertex': {prop: np.ndarray}, 'face':
    faces [M,3] int or None, 'comments': [...]}``."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop, dtype) or ('list', idx_dt, val_dt, name)])
        comments = []
        cur = None
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unterminated header")
            tok = line.decode("ascii", "replace").strip().split()
            if not tok:
                continue
            if tok[0] == "format":
                fmt = tok[1]
            elif tok[0] == "comment":
                comments.append(" ".join(tok[1:]))
            elif tok[0] == "element":
                cur = (tok[1], int(tok[2]), [])
                elements.append(cur)
            elif tok[0] == "property":
                if tok[1] == "list":
                    cur[2].append(("list", _PLY_DTYPES[tok[2]],
                                   _PLY_DTYPES[tok[3]], tok[4]))
                else:
                    cur[2].append((tok[-1], _PLY_DTYPES[tok[1]]))
            elif tok[0] == "end_header":
                break
        out = {"comments": comments, "face": None}
        if fmt == "ascii":
            raw = f.read()
            text = raw.decode("ascii").split("\n")
            row = 0
            for name, count, props in elements:
                if any(p[0] == "list" for p in props):
                    faces = []
                    for i in range(count):
                        vals = text[row + i].split()
                        n = int(vals[0])
                        faces.append([int(v) for v in vals[1:1 + n]])
                    out[name] = {"_list": faces}
                    if name == "face":
                        out["face"] = np.asarray(faces, np.int64)
                else:
                    arr = None
                    if row == 0 and len(elements) == 1:
                        # hot path: single fixed-record element -> native
                        # strtof parser (np.loadtxt is ~100x slower on
                        # multi-million-line files)
                        from read_tpu import native
                        vals = native.parse_ascii_floats(
                            raw, count * len(props))
                        if vals is not None:
                            arr = vals.reshape(count, len(props))
                    if arr is None:
                        arr = np.loadtxt(text[row:row + count], ndmin=2)
                    out[name] = {p[0]: arr[:, j].astype(p[1])
                                 for j, p in enumerate(props)}
                row += count
            return out
        endian = "<" if fmt == "binary_little_endian" else ">"
        buf = f.read()
        off = 0
        for name, count, props in elements:
            if any(p[0] == "list" for p in props):
                # Variable-length lists: fast path for uniform triangles.
                _, idx_dt, val_dt, _pname = props[0]
                idx_size = np.dtype(idx_dt).itemsize
                val_size = np.dtype(val_dt).itemsize
                if count == 0:
                    out[name] = {}
                    continue
                first_n = int(np.frombuffer(
                    buf, endian + idx_dt, 1, off)[0])
                stride = idx_size + first_n * val_size
                block = np.frombuffer(buf, np.uint8, count * stride, off)
                ns = block.reshape(count, stride)[:, :idx_size].copy().view(
                    endian + idx_dt)[:, 0]
                if (ns == first_n).all():
                    vals = block.reshape(count, stride)[:, idx_size:].copy(
                        ).view(endian + val_dt)
                    out[name] = {"_list": vals}
                    if name == "face":
                        out["face"] = vals.astype(np.int64)
                    off += count * stride
                else:  # ragged: slow path
                    faces, o = [], off
                    for _ in range(count):
                        n = int(np.frombuffer(buf, endian + idx_dt, 1, o)[0])
                        o += idx_size
                        faces.append(np.frombuffer(
                            buf, endian + val_dt, n, o))
                        o += n * val_size
                    out[name] = {"_list": faces}
                    off = o
            else:
                dt = np.dtype([(p[0], endian + p[1]) for p in props])
                arr = np.frombuffer(buf, dt, count, off)
                out[name] = {p[0]: arr[p[0]] for p in props}
                off += dt.itemsize * count
        return out


def write_ply(path: str, xyz: np.ndarray, rgb: Optional[np.ndarray] = None,
              normals: Optional[np.ndarray] = None,
              binary: bool = True) -> None:
    """Write a point cloud PLY (xyz f32, optional uchar rgb, f32 normals)."""
    n = xyz.shape[0]
    props = [("x", "f4"), ("y", "f4"), ("z", "f4")]
    if normals is not None:
        props += [("nx", "f4"), ("ny", "f4"), ("nz", "f4")]
    if rgb is not None:
        props += [("red", "u1"), ("green", "u1"), ("blue", "u1")]
    arr = np.empty(n, np.dtype([(p, "<" + d) for p, d in props]))
    arr["x"], arr["y"], arr["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    if normals is not None:
        arr["nx"], arr["ny"], arr["nz"] = (normals[:, 0], normals[:, 1],
                                           normals[:, 2])
    if rgb is not None:
        r8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8) \
            if rgb.dtype != np.uint8 else rgb
        arr["red"], arr["green"], arr["blue"] = r8[:, 0], r8[:, 1], r8[:, 2]
    header = ["ply",
              "format binary_little_endian 1.0" if binary
              else "format ascii 1.0",
              f"element vertex {n}"]
    type_names = {"f4": "float", "u1": "uchar"}
    header += [f"property {type_names[d]} {p}" for p, d in props]
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if binary:
            f.write(arr.tobytes())
        else:
            for row in arr:
                f.write((" ".join(str(v) for v in row) + "\n")
                        .encode("ascii"))


def get_xyz_colors(xyz: np.ndarray) -> np.ndarray:
    """Bbox-normalized position colors (``utils.py:424-428``)."""
    mmin, mmax = xyz.min(axis=0), xyz.max(axis=0)
    color = (xyz - mmin) / np.maximum(mmax - mmin, 1e-12)
    return np.clip(color, 0.0, 1.0).astype(np.float32)


def get_normal_colors(normals: np.ndarray) -> np.ndarray:
    return (normals * 0.5 + 0.5).astype(np.float32)


def import_model3d(model_path: str, is_mesh: bool = False) -> dict:
    """Load a PLY point cloud / mesh into the scene-dict contract
    (``utils.py:432-500``): keys xyz, rgb, normals, uv2d, uv1d, faces,
    xyz_c."""
    ply = read_ply(model_path)
    v = ply["vertex"]
    xyz = np.stack([np.asarray(v["x"], np.float64),
                    np.asarray(v["y"], np.float64),
                    np.asarray(v["z"], np.float64)], axis=1)
    n_pts = xyz.shape[0]
    model = {"rgb": None, "normals": None, "uv2d": None, "faces": None}
    if {"red", "green", "blue"} <= set(v):
        model["rgb"] = np.stack(
            [v["red"], v["green"], v["blue"]], axis=1).astype(
                np.float32) / 255.0
    if {"nx", "ny", "nz"} <= set(v):
        model["normals"] = np.stack(
            [v["nx"], v["ny"], v["nz"]], axis=1).astype(np.float32)
    if is_mesh:
        if {"s", "t"} <= set(v):
            model["uv2d"] = np.stack([v["s"], v["t"]], axis=1).astype(
                np.float32)
        elif {"u", "v"} <= set(v):
            model["uv2d"] = np.stack([v["u"], v["v"]], axis=1).astype(
                np.float32)
        if ply["face"] is not None:
            model["faces"] = np.asarray(ply["face"]).reshape(-1).astype(
                np.uint32)
    else:
        model["uv2d"] = np.zeros((n_pts, 2), np.float32)
    model["xyz"] = xyz
    model["xyz_c"] = get_xyz_colors(xyz)
    model["uv1d"] = np.arange(n_pts)
    if model["rgb"] is None:
        # Reference behavior: missing colors become white*255
        # (utils.py:498-500) — kept for parity.
        model["rgb"] = np.ones((n_pts, 3), np.float32) * 255
    return model


def intrinsics_from_xml(xml_file: str):
    """Metashape calibration: f with principal point at the image center
    (``utils.py:173-189``)."""
    root = ET.parse(xml_file).getroot()
    calibration = root.find("chunk/sensors/sensor/calibration")
    resolution = calibration.find("resolution")
    width = float(resolution.get("width"))
    height = float(resolution.get("height"))
    f = float(calibration.find("f").text)
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                 np.float32)
    return K, (width, height)


def intrinsics_from_ini(ini_path: str):
    conf = configparser.ConfigParser()
    conf.read(ini_path)
    k = np.fromstring(conf.get("SceneCameraParams", "K"), sep=" ")
    K = np.array([[k[0], 0, k[2]], [0, k[1], k[3]], [0, 0, 1]], np.float32)
    size = [int(conf.get("SceneCameraParams", "w")),
            int(conf.get("SceneCameraParams", "h"))]
    return K, size


def intrinsics_from_txt(cam_txt: str):
    tmp = np.loadtxt(cam_txt)
    size = [int(tmp[0, 0]), int(tmp[0, 1])]
    return tmp[1:].astype(np.float32), size


def extrinsics_from_xml(xml_file: str, verbose: bool = False):
    """Metashape camera transforms; columns 1:3 negated (cv -> gl,
    ``utils.py:226-227``). Returns (list of 4x4 camera-to-world, labels)."""
    root = ET.parse(xml_file).getroot()
    transforms = {}
    for e in root.findall("chunk/cameras")[0].findall("camera"):
        label = e.get("label")
        t = e.find("transform")
        if t is None or t.text is None:
            if verbose:
                print("failed to align camera", label)
            continue
        transforms[label] = t.text
    view_matrices = []
    labels = list(transforms)
    for label in labels:
        m = np.array([float(x) for x in transforms[label].split()]
                     ).reshape(4, 4)
        m[:, 1:3] *= -1
        view_matrices.append(m)
    return view_matrices, labels


def extrinsics_from_txt(pose_path: str):
    """Flat txt of 4x4 poses + sibling ``images`` name list
    (``utils.py:242-249``); same cv->gl column flip."""
    mats = np.loadtxt(pose_path).reshape(-1, 4, 4)
    mats[:, :, 1:3] *= -1
    parts = pose_path.split("/")
    parts[-1] = parts[-1].replace("poses", "images")
    img_names = np.loadtxt("/".join(parts), dtype="str")
    return list(mats), list(np.atleast_1d(img_names))


def extrinsics_from_view_matrix(path: str):
    vm = np.loadtxt(path).reshape(-1, 4, 4)
    vm, ids = get_valid_matrices(vm)
    return vm, [str(i) for i in ids]


def get_valid_matrices(mlist):
    """Drop non-finite matrices (``utils.py:413-421``)."""
    ilist, vmlist = [], []
    for i, m in enumerate(mlist):
        if np.isfinite(m).all():
            ilist.append(i)
            vmlist.append(m)
    return vmlist, ilist


def fix_relative_path(path: str, config_path: str) -> str:
    if not os.path.exists(path) and not os.path.isabs(path):
        abspath = os.path.join(os.path.dirname(config_path), path)
        if os.path.exists(abspath):
            return abspath
    return path


def load_scene_data(path: str) -> dict:
    """Load a YAML scene manifest into the scene-data dict contract
    (``utils.py:286-380``)."""
    from read_tpu.scene import camera as _camera

    with open(path) as f:
        config = yaml.safe_load(f)

    pointcloud = None
    if config.get("pointcloud"):
        pointcloud = import_model3d(
            fix_relative_path(config["pointcloud"], path))
    mesh = None
    if config.get("mesh"):
        mesh = import_model3d(
            fix_relative_path(config["mesh"], path), is_mesh=True)
    texture = None
    if config.get("texture"):
        import cv2
        texture = cv2.imread(fix_relative_path(config["texture"], path))
        assert texture is not None
        texture = texture[..., ::-1].copy()

    intrinsic_matrix = None
    if "intrinsic_matrix" in config:
        apath = fix_relative_path(config["intrinsic_matrix"], path)
        if apath.endswith("xml"):
            intrinsic_matrix, (w, h) = intrinsics_from_xml(apath)
            assert tuple(config["viewport_size"]) == (w, h), \
                f"calibration size ({w}, {h}) != viewport_size"
        elif apath.endswith("ini"):
            intrinsic_matrix, _ = intrinsics_from_ini(apath)
        elif apath.endswith("txt"):
            intrinsic_matrix, _ = intrinsics_from_txt(apath)
        else:
            intrinsic_matrix = np.loadtxt(apath)[:3, :3]

    proj_matrix = None
    if "proj_matrix" in config:
        proj_matrix = np.loadtxt(
            fix_relative_path(config["proj_matrix"], path))
        proj_matrix = _camera.rewrite_near_far(proj_matrix)

    view_matrix, camera_labels = None, None
    if "view_matrix" in config:
        apath = fix_relative_path(config["view_matrix"], path)
        if apath.endswith("xml"):
            view_matrix, camera_labels = extrinsics_from_xml(apath)
        elif apath.endswith("txt"):
            view_matrix, camera_labels = extrinsics_from_txt(apath)
        else:
            view_matrix, camera_labels = extrinsics_from_view_matrix(apath)

    model3d_origin = np.eye(4)
    if "model3d_origin" in config:
        model3d_origin = np.loadtxt(
            fix_relative_path(config["model3d_origin"], path))

    point_sizes = None
    if "point_sizes" in config:
        point_sizes = np.load(
            fix_relative_path(config["point_sizes"], path))

    config["viewport_size"] = tuple(config["viewport_size"]) \
        if "viewport_size" in config else None

    net_ckpt, tex_ckpt = "", ""
    if "net_path" in config:
        net_ckpt = fix_relative_path(os.path.join(
            config["net_path"], "checkpoints", config["ckpt"]), path)
        tex_ckpt = fix_relative_path(os.path.join(
            config["net_path"], "checkpoints", config["texture_ckpt"]),
            path)

    if "data_ratio" in config and view_matrix is not None:
        n = int(len(view_matrix) * config["data_ratio"])
        view_matrix = view_matrix[:n]
        camera_labels = camera_labels[:n]

    return {
        "pointcloud": pointcloud,
        "point_sizes": point_sizes,
        "mesh": mesh,
        "texture": texture,
        "proj_matrix": proj_matrix,
        "intrinsic_matrix": intrinsic_matrix,
        "view_matrix": view_matrix,
        "camera_labels": camera_labels,
        "model3d_origin": model3d_origin,
        "config": config,
        "net_ckpt": net_ckpt,
        "tex_ckpt": tex_ckpt,
    }
