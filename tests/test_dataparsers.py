"""Dataparser zoo: each named parser reads its dataset layout into the
shared DataparserOutputs contract (synthetic on-disk fixtures, mirroring
the reference's tmp-fixture parser tests,
/root/reference/tests/dataparsers/test_nerfstudio_dataparser.py)."""

import json
import math
from pathlib import Path

import numpy as np
import pytest

from gaussiangrasper_tpu.data.dataparsers.zoo import (
    PARSERS,
    _rodrigues,
    resolve_parser,
)

W, H = 8, 6


def _png(path, w=W, h=H):
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(path)


class TestRegistry:
    def test_all_reference_parser_names_present(self):
        expected = {
            "colmap", "nerfstudio", "blender", "instant-ngp", "minimal",
            "scannet", "sdfstudio", "arkitscenes", "dnerf", "phototourism",
            "nuscenes", "dycheck", "sitcoms3d", "nerfosr",
        }
        assert expected <= set(PARSERS)

    def test_stub_parsers_raise_with_hint(self, tmp_path):
        # nuscenes became a real parser in round 4; the remaining stub is
        # phototourism-raw (needs image downloads). Real parsers raise a
        # plain FileNotFoundError on an empty dir, not the install hint.
        with pytest.raises(SystemExit, match="image downloads"):
            PARSERS["phototourism-raw"](tmp_path).parse()
        with pytest.raises(FileNotFoundError):
            PARSERS["nuscenes"](tmp_path).parse()

    def test_unknown_name_rejected(self, tmp_path):
        with pytest.raises(KeyError, match="unknown dataparser"):
            resolve_parser(tmp_path, "nope")


class TestBlender:
    def test_parses_split_and_focal(self, tmp_path):
        meta = {
            "camera_angle_x": 0.8,
            "frames": [
                {"file_path": "./r_0",
                 "transform_matrix": np.eye(4).tolist()},
                {"file_path": "./r_1",
                 "transform_matrix": np.eye(4).tolist()},
            ],
        }
        (tmp_path / "transforms_train.json").write_text(json.dumps(meta))
        _png(tmp_path / "r_0.png")
        _png(tmp_path / "r_1.png")
        out = PARSERS["blender"](tmp_path, split="train").parse()
        assert len(out.cameras) == 2
        focal = 0.5 * W / math.tan(0.4)
        assert abs(out.cameras[0].fx - focal) < 1e-6
        assert out.metadata["alpha_color"] == "white"


class TestInstantNGP:
    def test_focal_fallbacks_and_scene_scale(self, tmp_path):
        meta = {
            "camera_angle_x": 0.8, "w": W, "h": H,
            "k1": 0.01, "aabb_scale": 4,
            "frames": [{"file_path": "im.png",
                        "transform_matrix": (np.eye(4) * 1.0).tolist()}],
        }
        meta["frames"][0]["transform_matrix"][0][3] = 3.0  # x translation
        (tmp_path / "transforms.json").write_text(json.dumps(meta))
        _png(tmp_path / "im.png")
        out = PARSERS["instant-ngp"](tmp_path).parse()
        cam = out.cameras[0]
        assert abs(cam.fx - W / (2 * math.tan(0.4))) < 1e-5
        assert abs(cam.camera_to_world[0, 3] - 3.0 * 0.3333) < 1e-6
        assert cam.distortion[0] == pytest.approx(0.01)
        assert out.metadata["aabb"] == [[-2.0] * 3, [2.0] * 3]


class TestMinimal:
    def test_npz_round_trip(self, tmp_path):
        _png(tmp_path / "img0.png")
        np.savez(
            tmp_path / "train.npz",
            image_filenames=np.array(["img0.png"]),
            cameras={
                "fx": np.array([10.0]), "fy": np.array([10.0]),
                "cx": np.array([4.0]), "cy": np.array([3.0]),
                "width": np.array([W]), "height": np.array([H]),
                "camera_to_worlds": np.eye(4)[None, :3],
            },
            scene_box=np.array([[-1, -1, -1], [1, 1, 1]]),
        )
        out = PARSERS["minimal"](tmp_path).parse()
        assert out.cameras[0].fx == 10.0
        assert out.metadata["aabb"] == [[-1, -1, -1], [1, 1, 1]]
        # auto-detection picks minimal for train.npz layouts
        assert type(resolve_parser(tmp_path)).__name__ == "MinimalParser"


class TestScannet:
    def _make(self, tmp_path):
        for i in range(3):
            _png(tmp_path / "color" / f"{i}.jpg")
        (tmp_path / "pose").mkdir(exist_ok=True)
        for i in range(3):
            pose = np.eye(4)
            pose[0, 3] = float(i)
            if i == 1:
                pose[1, 3] = np.inf  # invalid pose must be skipped
            np.savetxt(tmp_path / "pose" / f"{i}.txt", pose)
        (tmp_path / "intrinsic").mkdir()
        K = np.eye(4)
        K[0, 0] = K[1, 1] = 7.0
        K[0, 2], K[1, 2] = 4.0, 3.0
        np.savetxt(tmp_path / "intrinsic" / "intrinsic_color.txt", K)
        return tmp_path

    def test_layout_flip_and_skip(self, tmp_path):
        data = self._make(tmp_path)
        out = PARSERS["scannet"](data, split="train").parse()
        # one of three poses is non-finite -> skipped
        assert len(out.cameras) == 2
        cam = out.cameras[0]
        assert cam.fx == 7.0
        # OpenCV identity pose becomes OpenGL (y/z flipped)
        r = cam.camera_to_world[:3, :3]
        np.testing.assert_allclose(np.diag(r), [1, -1, -1], atol=1e-6)
        assert type(resolve_parser(data)).__name__ == "ScannetParser"


class TestSdfstudio:
    def test_meta_data_conversion(self, tmp_path):
        intr = np.eye(4)
        intr[0, 0] = intr[1, 1] = 11.0
        intr[0, 2], intr[1, 2] = 4.0, 3.0
        meta = {
            "height": H, "width": W,
            "scene_box": {"aabb": [[-1, -1, -1], [1, 1, 1]]},
            "frames": [{
                "rgb_path": "0.png",
                "camtoworld": np.eye(4).tolist(),
                "intrinsics": intr.tolist(),
            }],
        }
        (tmp_path / "meta_data.json").write_text(json.dumps(meta))
        _png(tmp_path / "0.png")
        out = PARSERS["sdfstudio"](tmp_path).parse()
        cam = out.cameras[0]
        assert cam.fx == 11.0
        np.testing.assert_allclose(
            np.diag(cam.camera_to_world[:3, :3]), [1, -1, -1], atol=1e-6
        )
        assert type(resolve_parser(tmp_path)).__name__ == "SdfstudioParser"


class TestARKitScenes:
    def test_traj_and_pincam(self, tmp_path):
        video = "41069021"
        data = tmp_path / video
        base = data / f"{video}_frames"
        (base / "lowres_wide").mkdir(parents=True)
        (base / "lowres_wide_intrinsics").mkdir()
        lines = []
        for i in range(3):
            ts = 1.0 + i
            _png(base / "lowres_wide" / f"{video}_{ts:.3f}.png")
            np.savetxt(
                base / "lowres_wide_intrinsics" / f"{video}_{ts:.3f}.pincam",
                np.array([[W, H, 9.0, 9.0, 4.0, 3.0]]),
            )
            lines.append(f"{ts} 0 0 0 {0.1 * i} 0 0")
        (base / "lowres_wide.traj").write_text("\n".join(lines))
        out = PARSERS["arkitscenes"](data, split="train").parse()
        assert len(out.cameras) >= 2
        assert out.cameras[0].fx == 9.0

    def test_rodrigues_matches_quarter_turn(self):
        r = _rodrigues(np.array([0.0, 0.0, np.pi / 2]))
        np.testing.assert_allclose(
            r @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-7
        )


class TestDycheck:
    def _make(self, tmp_path):
        (tmp_path / "scene.json").write_text(json.dumps(
            {"center": [0.1, 0.2, 0.3], "scale": 2.0, "near": 0.1, "far": 4.0}
        ))
        (tmp_path / "metadata.json").write_text(json.dumps({
            "0_00000": {"warp_id": 0, "camera_id": 0},
            "0_00001": {"warp_id": 4, "camera_id": 0},
        }))
        (tmp_path / "splits").mkdir()
        (tmp_path / "splits" / "train.json").write_text(json.dumps(
            {"frame_names": ["0_00000", "0_00001"], "time_ids": [0, 4]}
        ))
        (tmp_path / "camera").mkdir()
        for name in ("0_00000", "0_00001"):
            (tmp_path / "camera" / f"{name}.json").write_text(json.dumps({
                "orientation": np.eye(3).tolist(),
                "position": [1.1, 0.2, 0.3],
                "focal_length": 50.0,
                "pixel_aspect_ratio": 1.0,
                "principal_point": [4.0, 3.0],
                "image_size": [W, H],
            }))
        for name in ("0_00000", "0_00001"):
            _png(tmp_path / "rgb" / "1x" / f"{name}.png")
        return tmp_path

    def test_scene_scaling_and_times(self, tmp_path):
        data = self._make(tmp_path)
        out = PARSERS["dycheck"](data).parse()
        assert len(out.cameras) == 2
        cam = out.cameras[0]
        assert cam.fx == 50.0 and cam.width == W
        # position (1,0,0) after centering, scaled by scale*sf =
        # 2 * (1.5/4/(2*4)) = 2*0.046875 = 0.09375, world xyz shuffled.
        sf = 1.5 / 4.0 / (2.0 * 4.0)
        pos = cam.camera_to_world[:, 3]
        np.testing.assert_allclose(
            np.sort(np.abs(pos)), [0, 0, 2.0 * sf], atol=1e-6
        )
        assert out.metadata["times"] == [0.0, 1.0]
        assert out.metadata["far"] == pytest.approx(4.0 * 2.0 * sf)
        # detection: scene.json + splits/ routes to dycheck
        assert type(resolve_parser(data)).__name__ == "DycheckParser"


class TestSitcoms3D:
    def test_bbox_scaling_and_rotation(self, tmp_path):
        intr = np.eye(3)
        intr[0, 0] = intr[1, 1] = 100.0
        intr[0, 2], intr[1, 2] = 4.0, 3.0
        meta = {
            "bbox": [[-2, -1, -1], [2, 1, 1]],  # longest edge 4 along x
            "frames": [{
                "image_name": "f0.jpg",
                "intrinsics": intr.tolist(),
                "camtoworld": np.eye(4).tolist(),
                "width": W, "height": H,
            }],
        }
        (tmp_path / "cameras.json").write_text(json.dumps(meta))
        _png(tmp_path / "images_4" / "f0.jpg")
        out = PARSERS["sitcoms3d"](tmp_path).parse()
        cam = out.cameras[0]
        # downscale 4: intrinsics quartered
        assert cam.fx == 25.0 and cam.width == W // 4
        # longest bbox edge (4) scaled to scene_scale (2) -> scale 0.5
        assert out.dataparser_scale == pytest.approx(0.5)
        aabb = np.asarray(out.metadata["aabb"])
        assert np.max(aabb[1] - aabb[0]) == pytest.approx(2.0)
        # identity pose rotated 90deg about x: cam y axis -> world z
        np.testing.assert_allclose(
            cam.camera_to_world[:3, 1], [0, 0, 1], atol=1e-6
        )
        assert type(resolve_parser(tmp_path)).__name__ == "Sitcoms3DParser"


class TestNerfosr:
    def _make(self, tmp_path):
        K = np.eye(4)
        K[0, 0] = K[1, 1] = 60.0
        K[0, 2], K[1, 2] = 4.0, 3.0
        rng = np.random.default_rng(0)
        for split, n in (("train", 3), ("validation", 1), ("test", 1)):
            for d in ("intrinsics", "pose", "rgb"):
                (tmp_path / split / d).mkdir(parents=True, exist_ok=True)
            for i in range(n):
                np.savetxt(tmp_path / split / "intrinsics" / f"{i:02d}.txt",
                           K.reshape(1, -1))
                pose = np.eye(4)
                pose[:3, 3] = rng.normal(size=3)
                np.savetxt(tmp_path / split / "pose" / f"{i:02d}.txt",
                           pose.reshape(1, -1))
                _png(tmp_path / split / "rgb" / f"{i:02d}.png")
        return tmp_path

    def test_split_slicing_and_scale(self, tmp_path):
        data = self._make(tmp_path)
        out_train = PARSERS["nerfosr"](data, split="train").parse()
        out_val = PARSERS["nerfosr"](data, split="val").parse()
        assert len(out_train.cameras) == 3
        assert len(out_val.cameras) == 1
        assert out_train.cameras[0].fx == 60.0
        # every pose from every split fits in the +-1 box after auto scale
        for out in (out_train, out_val):
            for cam in out.cameras:
                assert np.max(np.abs(cam.camera_to_world[:, 3])) <= 1.0 + 1e-5
        # OpenCV -> OpenGL flip applied
        r = out_train.cameras[0].camera_to_world[:3, :3]
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


class TestCliFlag:
    def test_train_accepts_dataparser_flag(self, tmp_path):
        """--dataparser blender routes to the blender layout."""
        from gaussiangrasper_tpu.engine.trainer import TrainerConfig, make_trainer

        meta = {
            "camera_angle_x": 0.8,
            "frames": [{"file_path": "./r_0",
                        "transform_matrix": np.eye(4).tolist()}],
        }
        (tmp_path / "transforms_train.json").write_text(json.dumps(meta))
        _png(tmp_path / "r_0.png", 16, 12)
        t = make_trainer(TrainerConfig(data=tmp_path, dataparser="blender"))
        assert len(t.dm) == 1


class TestNuScenes:
    def _make(self, tmp_path, n_samples=5):
        """Tiny devkit-free nuScenes layout: JSON tables + jpg files."""
        root = tmp_path / "nusc"
        (root / "v1.0-mini").mkdir(parents=True)
        (root / "samples" / "CAM_FRONT").mkdir(parents=True)
        scene = {"token": "sc0", "name": "scene-0001"}
        samples, sds, css, egos = [], [], [], []
        for i in range(n_samples):
            fn = f"samples/CAM_FRONT/img_{i}.jpg"
            _png(root / fn, 16, 12)
            samples.append({"token": f"s{i}", "scene_token": "sc0",
                            "timestamp": 1000 + i,
                            "data": {"CAM_FRONT": f"sd{i}"}})
            sds.append({"token": f"sd{i}", "filename": fn,
                        "calibrated_sensor_token": f"cs{i}",
                        "ego_pose_token": f"ep{i}",
                        "width": 16, "height": 12})
            css.append({"token": f"cs{i}",
                        "rotation": [1.0, 0.0, 0.0, 0.0],
                        "translation": [1.5, 0.0, 1.6],
                        "camera_intrinsic": [[12.0, 0, 8.0],
                                             [0, 12.0, 6.0], [0, 0, 1]]})
            # ego drives along +x
            egos.append({"token": f"ep{i}",
                         "rotation": [1.0, 0.0, 0.0, 0.0],
                         "translation": [2.0 * i, 0.0, 0.0]})
        import json as J

        v = root / "v1.0-mini"
        (v / "scene.json").write_text(J.dumps([scene]))
        (v / "sample.json").write_text(J.dumps(samples))
        (v / "sample_data.json").write_text(J.dumps(sds))
        (v / "calibrated_sensor.json").write_text(J.dumps(css))
        (v / "ego_pose.json").write_text(J.dumps(egos))
        return root

    def test_tables_poses_and_split(self, tmp_path):
        from gaussiangrasper_tpu.data.dataparsers.zoo import (
            NuScenesParser, resolve_parser,
        )

        root = self._make(tmp_path)
        out = NuScenesParser(root).parse()
        # 0.9 split of 5 snapshots -> ceil(4.5)=5 train, 0 eval
        assert len(out.cameras) == 5
        assert out.image_filenames[0].name == "img_0.jpg"
        cam = out.cameras[0]
        assert cam.fx == 12.0 and cam.width == 16 and cam.height == 12
        # poses centered at the mean and scaled into |t| <= 1
        ts = np.stack([c.camera_to_world[:, 3] for c in out.cameras])
        np.testing.assert_allclose(ts.mean(0), 0.0, atol=1e-6)
        assert np.abs(ts).max() == pytest.approx(1.0, abs=1e-6)
        # rotations stay proper (det +1) through the convention chain
        for c in out.cameras:
            assert np.linalg.det(c.camera_to_world[:, :3]) == pytest.approx(
                1.0, abs=1e-5)
        # identity ego+cam rotations: the chain maps to a right-handed
        # OpenGL camera; forward (-z col) must be a unit vector
        fwd = -out.cameras[0].camera_to_world[:, 2]
        assert np.linalg.norm(fwd) == pytest.approx(1.0, abs=1e-5)
        # ego moves along +x world -> scaled camera centers vary along ONE
        # axis only (z-up world keeps the drive axis horizontal)
        spread = ts.max(0) - ts.min(0)
        assert (spread > 1e-3).sum() == 1
        # layout auto-detect
        assert isinstance(resolve_parser(root), NuScenesParser)

    def test_scene_and_split_selection(self, tmp_path):
        from gaussiangrasper_tpu.data.dataparsers.zoo import NuScenesParser

        root = self._make(tmp_path, n_samples=10)
        tr = NuScenesParser(root, scene="scene-0001").parse()
        ev = NuScenesParser(root, split="val").parse()
        assert len(tr.cameras) == 9 and len(ev.cameras) == 1
        with pytest.raises(KeyError):
            NuScenesParser(root, scene="scene-9999").parse()
