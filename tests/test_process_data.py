"""Capture ingestion (scripts/process_data.py — the ns-process-data
analog): downscale pyramid, COLMAP->transforms.json conversion (pose
convention proven by projection round-trip), polycam conversion."""

import json
from pathlib import Path

import numpy as np
import pytest

from gaussiangrasper_tpu.data import colmap_io as cio
from gaussiangrasper_tpu.scripts.process_data import (
    colmap_to_transforms,
    main,
    polycam_to_transforms,
    process_images,
)

W, H, F = 16, 12, 20.0


def _png(path, w=W, h=H):
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(path)


def _colmap_model(root: Path, n=2):
    recon = root / "sparse" / "0"
    recon.mkdir(parents=True)
    cams = {1: cio.ColmapCamera("PINHOLE", W, H,
                                np.array([F, F, W / 2, H / 2]))}
    cio.write_cameras_text(recon / "cameras.txt", cams)
    rng = np.random.default_rng(0)
    images = {}
    for i in range(n):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images[i + 1] = cio.ColmapImage(
            qvec=q, tvec=rng.normal(size=3) * 0.1,
            camera_id=1, name=f"im{i}.png",
        )
    cio.write_images_text(recon / "images.txt", images)
    cio.write_points3d_text(recon / "points3D.txt",
                            rng.normal(size=(5, 3)),
                            np.zeros((5, 3), np.uint8))
    return images


class TestImages:
    def test_copy_downscale_and_convert(self, tmp_path):
        data = tmp_path / "cap"
        for i in range(2):
            _png(data / f"im{i}.png")
        _colmap_model(data)
        out = tmp_path / "out"
        main(["images", "--data", str(data), "--output", str(out)])
        assert (out / "images" / "im0.png").exists()
        for d in (2, 4, 8):
            assert (out / f"images_{d}" / "im0.png").exists()
        meta = json.loads((out / "transforms.json").read_text())
        assert len(meta["frames"]) == 2
        assert meta["fl_x"] == F

    def test_pose_convention_projection_round_trip(self, tmp_path):
        """A world point projects to the same pixel under the original
        COLMAP (OpenCV, w2c) pose and the converted OpenGL c2w pose in the
        permuted world frame (applied_transform)."""
        data = tmp_path / "cap"
        _png(data / "im0.png")
        images = _colmap_model(data, n=1)
        out = tmp_path / "out"
        out.mkdir()
        colmap_to_transforms(data / "sparse" / "0", out)
        meta = json.loads((out / "transforms.json").read_text())

        im = images[1]
        r = cio.qvec_to_rotmat(im.qvec)
        x_w = np.array([0.2, -0.1, 1.5])
        x_cam_cv = r @ x_w + im.tvec                  # OpenCV camera frame
        px_cv = F * x_cam_cv[0] / x_cam_cv[2] + W / 2
        py_cv = F * x_cam_cv[1] / x_cam_cv[2] + H / 2

        a = np.array(meta["applied_transform"])       # (3, 4) world map
        x_w2 = a[:, :3] @ x_w + a[:, 3]
        c2w = np.array(meta["frames"][0]["transform_matrix"])
        w2c = np.linalg.inv(c2w)
        x_gl = w2c[:3, :3] @ x_w2 + w2c[:3, 3]        # OpenGL camera frame
        z = -x_gl[2]
        px_gl = F * x_gl[0] / z + W / 2
        py_gl = -F * x_gl[1] / z + H / 2
        np.testing.assert_allclose([px_gl, py_gl], [px_cv, py_cv], atol=1e-6)


class TestPolycam:
    def _keyframes(self, root: Path):
        imgs = root / "keyframes" / "corrected_images"
        cams = root / "keyframes" / "corrected_cameras"
        cams.mkdir(parents=True)
        for i, blur in enumerate((100.0, 5.0)):  # second frame too blurry
            _png(imgs / f"{i}.jpg", 40, 30)
            cam = {
                "fx": 20.0, "fy": 20.0, "cx": 20.0, "cy": 15.0,
                "width": 40, "height": 30, "blur_score": blur,
            }
            for rname, row in zip("012", np.eye(4)[:3]):
                for cname, v in zip("0123", row):
                    cam[f"t_{rname}{cname}"] = float(v)
            (cams / f"{i}.json").write_text(json.dumps(cam))
        return root

    def test_blur_filter_and_row_order(self, tmp_path):
        data = self._keyframes(tmp_path)
        out = tmp_path / "out"
        main(["polycam", "--data", str(data), "--output", str(out),
              "--crop-border-pixels", "2"])
        meta = json.loads((out / "transforms.json").read_text())
        assert len(meta["frames"]) == 1  # blurry frame skipped
        f = meta["frames"][0]
        assert f["w"] == 36 and f["cx"] == 18.0
        # identity t_ij -> rows permuted [2, 0, 1]
        m = np.array(f["transform_matrix"])
        np.testing.assert_allclose(
            m[:3, :3], np.eye(3)[[2, 0, 1]], atol=1e-9
        )
        assert (out / "images" / "0.jpg").exists()

    def test_video_gated_without_ffmpeg(self, tmp_path, monkeypatch):
        import shutil as sh

        monkeypatch.setattr(sh, "which", lambda name: None)
        with pytest.raises(SystemExit, match="ffmpeg"):
            main(["video", "--data", str(tmp_path / "v.mp4"),
                  "--output", str(tmp_path / "o")])


class TestRecord3D:
    def test_round_trip(self, tmp_path):
        data = tmp_path / "r3d"
        for i in range(4):
            _png(data / "rgb" / f"{i}.jpg", 8, 6)
        # identity quaternion (x,y,z,w) + distinct translations
        poses = [[0.0, 0.0, 0.0, 1.0, 0.1 * i, 0.0, 0.2] for i in range(4)]
        k_row_major = np.array([[F, 0, 4.0], [0, F, 3.0], [0, 0, 1]])
        (data / "metadata.json").write_text(json.dumps({
            "poses": poses, "K": k_row_major.T.reshape(-1).tolist(),
            "w": 8, "h": 6,
        }))
        out = tmp_path / "out"
        main(["record3d", "--data", str(data), "--output", str(out),
              "--max-images", "3"])
        meta = json.loads((out / "transforms.json").read_text())
        assert len(meta["frames"]) == 3  # evenly subsampled 4 -> 3
        assert meta["fl_x"] == F and meta["cx"] == 4.0
        m = np.array(meta["frames"][0]["transform_matrix"])
        np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-7)
        np.testing.assert_allclose(m[:3, 3], [0.0, 0.0, 0.2], atol=1e-7)
        assert (out / "images" / "0.jpg").exists()


class TestMetashape:
    def test_xml_conversion(self, tmp_path):
        data = tmp_path / "imgs"
        _png(data / "shot0.png", 8, 6)
        xml = tmp_path / "cameras.xml"
        xml.write_text(f"""<?xml version="1.0"?>
<document><chunk>
  <sensors>
    <sensor id="0" type="frame">
      <resolution width="8" height="6"/>
      <calibration><f>{F}</f><cx>0.5</cx><cy>-0.5</cy><k1>0.01</k1></calibration>
    </sensor>
  </sensors>
  <components>
    <component id="0"><transform>
      <rotation>1 0 0 0 1 0 0 0 1</rotation>
      <translation>2 0 0</translation>
      <scale>2</scale>
    </transform></component>
  </components>
  <cameras>
    <camera id="0" sensor_id="0" component_id="0" label="shot0">
      <transform>1 0 0 0 0 1 0 0 0 0 1 1 0 0 0 1</transform>
    </camera>
    <camera id="1" sensor_id="0" label="missing_image">
      <transform>1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1</transform>
    </camera>
  </cameras>
</chunk></document>""")
        out = tmp_path / "out"
        main(["metashape", "--data", str(data), "--xml", str(xml),
              "--output", str(out)])
        meta = json.loads((out / "transforms.json").read_text())
        assert len(meta["frames"]) == 1  # camera without image skipped
        fr = meta["frames"][0]
        assert fr["fl_x"] == F
        assert fr["cx"] == 0.5 + 4.0 and fr["cy"] == -0.5 + 3.0
        assert fr["k1"] == 0.01
        m = np.array(fr["transform_matrix"])
        # component translation scaled by 1/s: (2/2, 0, 0) + camera (0,0,1)
        # then row-permuted [2,0,1]: world z row first
        np.testing.assert_allclose(m[:, 3], [1.0, 1.0, 0.0, 1.0], atol=1e-9)
        # identity rotation: rows [2,0,1] with cols 1:3 negated
        expect = np.eye(3)[[2, 0, 1]]
        expect[:, 1:3] *= -1
        np.testing.assert_allclose(m[:3, :3], expect, atol=1e-9)


class TestRealityCapture:
    def test_csv_conversion(self, tmp_path):
        data = tmp_path / "imgs"
        _png(data / "dji0.png", 8, 6)
        csvf = tmp_path / "poses.csv"
        csvf.write_text(
            "#name,x,y,alt,heading,pitch,roll,f,px,py,k1,k2,k3,k4,t1,t2\n"
            "dji0.png,1.0,2.0,3.0,0,0,0,36,0,0,0,0,0,0,0,0\n"
            "missing.png,0,0,0,0,0,0,36,0,0,0,0,0,0,0,0\n"
        )
        out = tmp_path / "out"
        main(["realitycapture", "--data", str(data), "--csv", str(csvf),
              "--output", str(out)])
        meta = json.loads((out / "transforms.json").read_text())
        assert meta["orientation_override"] == "none"
        assert len(meta["frames"]) == 1
        fr = meta["frames"][0]
        # f=36mm at max(w,h)=8 -> fl = 36*8/36 = 8
        assert fr["fl_x"] == 8.0
        m = np.array(fr["transform_matrix"])
        np.testing.assert_allclose(m[:3, 3], [1.0, 2.0, 3.0], atol=1e-9)
        np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-9)


class TestODM:
    def test_project_conversion(self, tmp_path):
        data = tmp_path / "odm"
        _png(data / "images" / "a.jpg", 8, 6)
        (data / "cameras.json").write_text(json.dumps({
            "cam0": {"projection_type": "brown", "width": 8, "height": 6,
                     "focal": 0.9, "c_x": 0.1, "c_y": -0.1, "k1": 0.02},
        }))
        (data / "odm_report").mkdir()
        (data / "odm_report" / "shots.geojson").write_text(json.dumps({
            "features": [
                {"properties": {"filename": "a.jpg",
                                "rotation": [0.0, 0.0, 0.0],
                                "translation": [1.0, 2.0, 3.0]}},
                {"properties": {"filename": "gone.jpg",
                                "rotation": [0.0, 0.0, 0.0],
                                "translation": [0.0, 0.0, 0.0]}},
            ],
        }))
        out = tmp_path / "out"
        main(["odm", "--data", str(data), "--output", str(out)])
        meta = json.loads((out / "transforms.json").read_text())
        assert meta["camera_model"] == "OPENCV"
        assert len(meta["frames"]) == 1
        fr = meta["frames"][0]
        assert fr["fl_x"] == pytest.approx(0.9 * 8)
        assert fr["cx"] == pytest.approx(0.1 + 3.5)
        assert fr["k1"] == 0.02
        m = np.array(fr["transform_matrix"])
        # identity rotation, translation (1,2,3) row-permuted [2,0,1]
        np.testing.assert_allclose(m[:3, 3], [3.0, 1.0, 2.0], atol=1e-9)


class TestEquirect:
    """Equirect -> perspective crops (data/equirect.py; ref
    equirect_utils.py). The synthetic equirect encodes (lon, lat) in its
    channels, so resampled crops can be checked analytically."""

    @staticmethod
    def _lonlat_image(h=180, w=360):
        lon = np.linspace(-180, 180, w, endpoint=False) + 360.0 / w / 2
        lat = np.linspace(90, -90, h, endpoint=False) - 180.0 / h / 2
        img = np.zeros((h, w, 3), np.float32)
        img[..., 0] = (lon[None, :] + 180.0) / 360.0 * 255.0
        img[..., 1] = (lat[:, None] + 90.0) / 180.0 * 255.0
        return img

    @pytest.mark.parametrize("yaw,pitch", [(0, 0), (90, 0), (0, 45),
                                           (180, 0), (-120, -30)])
    def test_crop_center_direction(self, yaw, pitch):
        from gaussiangrasper_tpu.data.equirect import equirect_to_perspective

        img = self._lonlat_image()
        crop = equirect_to_perspective(img, 90.0, yaw, pitch, (33, 33))
        center = crop[16, 16]
        got_lon = center[0] / 255.0 * 360.0 - 180.0
        got_lat = center[1] / 255.0 * 180.0 - 90.0
        # Tolerance: the reference's (arange - wd/2) grid puts the center
        # pixel half an interval off-axis (~1.7 deg at fov 90/33px, amplified
        # by 1/cos(pitch) in longitude) — real convention bugs are >= tens
        # of degrees. Wrap-aware lon comparison; the 180 crop straddles the
        # seam where the encoded value itself jumps, skip lon there.
        if abs(abs(yaw) - 180.0) > 1:
            dlon = (got_lon - yaw + 180.0) % 360.0 - 180.0
            assert abs(dlon) < 4.0, (yaw, got_lon)
        assert abs(got_lat - pitch) < 4.0, (pitch, got_lat)

    def test_seam_wraps_not_clamps(self):
        from gaussiangrasper_tpu.data.equirect import equirect_to_perspective

        img = self._lonlat_image()
        # looking at the seam: left half of the crop is lon<0 side wrapped
        crop = equirect_to_perspective(img, 60.0, 180.0, 0.0, (21, 21))
        left_lon = crop[10, 2, 0] / 255.0 * 360.0 - 180.0
        right_lon = crop[10, 18, 0] / 255.0 * 360.0 - 180.0
        assert left_lon > 140.0   # approaching +180 from the west
        assert right_lon < -140.0  # wrapped past the seam

    def test_sampling_patterns(self):
        from gaussiangrasper_tpu.data.equirect import sampling_pattern

        fov8, p8 = sampling_pattern(8)
        assert fov8 == 120.0 and len(p8) == 8
        fov14, p14 = sampling_pattern(14)
        assert fov14 == 110.0 and len(p14) == 14
        # heavy bottom crop drops the -45 row entirely
        _, pc = sampling_pattern(8, crop_factor=(0.0, 0.9, 0.0, 0.0))
        pitches = {p for _, p in pc}
        assert all(p > -45.0 for p in pitches) and len(pc) < 8
        with pytest.raises(ValueError):
            sampling_pattern(8, crop_factor=(0.0, 2.0, 0.0, 0.0))
        with pytest.raises(ValueError):
            sampling_pattern(9)

    def test_crop_resolution_heuristic(self):
        from gaussiangrasper_tpu.data.equirect import crop_resolution

        r = crop_resolution((1000, 2000), 8)
        assert r == (500, 500)  # sqrt(2e6 / 8)

    def test_cli_generates_crops(self, tmp_path):
        import cv2

        src = tmp_path / "equirect"
        src.mkdir()
        img = self._lonlat_image(64, 128).astype(np.uint8)
        cv2.imwrite(str(src / "e0.png"), img)
        cv2.imwrite(str(src / "e1.png"), img)
        out = tmp_path / "out"
        main(["equirect", "--data", str(src), "--output", str(out),
              "--images-per-equirect", "8", "--resolution", "24"])
        crops = sorted((src / "planar_projections").glob("*.jpg"))
        assert len(crops) == 16  # 8 per image
        copied = sorted((out / "images").glob("*.jpg"))
        assert len(copied) == 16
        im = cv2.imread(str(crops[0]))
        assert im.shape == (24, 24, 3)
