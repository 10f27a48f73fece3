"""Viewer control panel: train-util throttling, crop box, resolution
(ref viewer_beta/viewer.py:367-406 + control_panel.py crop)."""

import io
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussiangrasper_tpu.scripts.viewer import RenderThrottle, make_server


def _scene():
    from gaussiangrasper_tpu.models.gaussian_field import init_random
    from gaussiangrasper_tpu.engine.train_state import init_train_state
    from gaussiangrasper_tpu.models.efd import init_mlp
    from gaussiangrasper_tpu.models.model import GaussianSplatConfig

    field, alive = init_random(jax.random.PRNGKey(0), 60, extent=1.0,
                               feature_dim=4, init_scale=0.1)
    # two clusters at z = -2: left (x<0) and right (x>0)
    means = field.means.at[:, 2].set(-2.0)
    means = means.at[:30, 0].set(-0.5)
    means = means.at[30:, 0].set(0.5)
    field = field._replace(
        means=means,
        opacity_logits=jnp.full((60,), 3.0),
    )
    fea_up = init_mlp(jax.random.PRNGKey(1), 4, 512, (16,))
    state = init_train_state(jax.random.PRNGKey(2), field, alive, fea_up)
    return state, GaussianSplatConfig(feature_dim=4, sh_degree=1)


class TestThrottle:
    def test_renders_yield_to_training(self):
        """At train_util=0.9, a 10ms render schedules the next admission
        ~90ms later — renders keep <=10% of wall time."""
        th = RenderThrottle(train_util=0.9)
        th.training = True
        assert th.delay_for(0.010) == np.float64(0.010) * 9 or abs(
            th.delay_for(0.010) - 0.09
        ) < 1e-9
        th.note(0.010, now=100.0)
        t0 = time.monotonic()
        # emulate an admit at now=100.05 -> must sleep ~0.04s
        th.admit(now=100.05)
        waited = time.monotonic() - t0
        assert 0.02 < waited < 0.2

    def test_inactive_without_training(self):
        th = RenderThrottle(train_util=0.99)
        th.note(1.0)  # would imply a ~99s delay
        t0 = time.monotonic()
        th.admit()  # training False -> no sleep
        assert time.monotonic() - t0 < 0.05


class TestCropAndResolution:
    def test_crop_box_hides_half_the_scene(self):
        from PIL import Image

        state, cfg = _scene()
        server = make_server(lambda: state, cfg, port=0, width=64, height=48)
        try:
            def frame(**kw):
                jpeg = server.render_pose(
                    eye=[0, 0, 0], center=[0, 0, -2], up=[0, 1, 0],
                    mode="rgb", **kw,
                )
                return np.asarray(Image.open(io.BytesIO(jpeg)), np.float32)

            full = frame()
            left_only = frame(crop_min=[-10, -10, -10], crop_max=[0, 10, 10])
            h, w = full.shape[:2]
            # right half goes dark when cropped to x<0
            right = slice(None), slice(w // 2, None)
            assert left_only[right].sum() < 0.25 * full[right].sum() + 1e-6
            # left half survives
            left = slice(None), slice(0, w // 2)
            assert left_only[left].sum() > 0.5 * full[left].sum()
        finally:
            server.server_close()

    def test_resolution_override(self):
        from PIL import Image

        state, cfg = _scene()
        server = make_server(lambda: state, cfg, port=0, width=64, height=48)
        try:
            jpeg = server.render_pose(
                eye=[0, 0, 0], center=[0, 0, -2], up=[0, 1, 0],
                mode="rgb", res=32,
            )
            img = Image.open(io.BytesIO(jpeg))
            assert img.size == (32, 24)
        finally:
            server.server_close()


class TestRenderExportPanels:
    """Render panel (keyframes -> spline -> offline render job) and export
    tabs over the real HTTP API (ref viewer_beta/render_panel.py +
    viewer.py:230-260 export tabs)."""

    def test_render_path_and_export_over_http(self, tmp_path):
        import json
        import threading
        import urllib.request

        from PIL import Image

        state, cfg = _scene()
        server = make_server(lambda: state, cfg, port=0, width=64, height=48,
                             out_dir=tmp_path / "renders")
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{port}"
            # two keyframes orbiting the clusters -> 6-frame path
            body = json.dumps({
                "keyframes": [
                    {"eye": [0, 0, 0], "center": [0, 0, -2], "up": [0, 1, 0]},
                    {"eye": [0.4, 0, 0], "center": [0, 0, -2], "up": [0, 1, 0]},
                ],
                "n_frames": 6, "mode": "rgb", "res": 64,
            }).encode()
            req = urllib.request.Request(base + "/render_path", data=body)
            out = json.loads(urllib.request.urlopen(req, timeout=120).read())
            assert out["n"] >= 6
            assert len(out["frames"]) == out["n"]
            assert (tmp_path / "renders" / out["frames"][0]).exists()
            # fetch a rendered frame back through the API
            jpeg = urllib.request.urlopen(
                base + "/frames/" + out["frames"][-1], timeout=60
            ).read()
            im = Image.open(io.BytesIO(jpeg))
            assert im.size == (64, 48)
            # export tabs
            ply = urllib.request.urlopen(base + "/export.ply", timeout=120).read()
            assert ply.startswith(b"ply")
            pc = urllib.request.urlopen(
                base + "/export/pointcloud.ply", timeout=120
            ).read()
            assert pc.startswith(b"ply")
            # pointcloud has exactly the alive points
            assert f"element vertex {int(jnp.sum(state.alive))}".encode() in pc
        finally:
            server.shutdown()

    def test_round_trip_ply_matches_field(self, tmp_path):
        """The export tab's .ply re-imports to the same field sizes."""
        from gaussiangrasper_tpu.scripts.export_ply import read_gaussian_ply

        state, cfg = _scene()
        server = make_server(lambda: state, cfg, port=0, width=32, height=24,
                             out_dir=tmp_path)
        try:
            import json
            import urllib.request
            import threading

            port = server.server_address[1]
            threading.Thread(target=server.serve_forever, daemon=True).start()
            ply = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/export.ply", timeout=120
            ).read()
            p = tmp_path / "x.ply"
            p.write_bytes(ply)
            arrays = read_gaussian_ply(p)
            assert arrays["means"].shape[0] == int(jnp.sum(state.alive))
        finally:
            server.shutdown()


class TestInitScene:
    def test_scene_payload_has_camera_rig_and_seed_cloud(self, tmp_path):
        """init_scene parity (ref viewer_beta/viewer.py:318-366): GET
        /scene returns the training-camera frustum rig and the seed
        point cloud; the page draws them as an overlay."""
        import json
        import threading
        import urllib.request

        from gaussiangrasper_tpu.scripts.viewer import scene_info_from_dm

        class FakeDM:
            seed_points = (np.linspace(0, 1, 30).reshape(10, 3),
                           np.full((10, 3), 0.5))

            def __len__(self):
                return 3

            def camera(self, i):
                from gaussiangrasper_tpu.core.cameras import Camera

                c2w = jnp.eye(4)[:3].at[0, 3].set(0.1 * i)
                return Camera.create(fx=60.0, fy=60.0, cx=32.0, cy=24.0,
                                     camera_to_world=c2w, width=64, height=48)

        info = scene_info_from_dm(FakeDM())
        assert len(info["cameras"]) == 3
        assert info["cameras"][1]["c2w"][0][3] == 0.1
        assert info["cameras"][0]["fx"] == 60.0
        assert len(info["points"]) == 10
        assert info["rgb"][0] == [127, 127, 127]

        state, cfg = _scene()
        server = make_server(lambda: state, cfg, port=0, width=64, height=48,
                             scene_info=info)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            got = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/scene", timeout=30).read())
            assert got == info  # full round-trip incl. the camera rig
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=30).read().decode()
            assert "/scene" in page and "camera rig" in page
        finally:
            server.shutdown()
