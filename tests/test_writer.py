"""Metrics writer fan-out: backend selection, optional-dependency
degradation, and the wandb backend against a mocked wandb module
(the reference's WandbWriter surface, utils/writer.py:306-331)."""

import sys
import types

import numpy as np

from gaussiangrasper_tpu.utils.writer import MetricsWriter


def _mock_wandb(monkeypatch, log):
    mod = types.ModuleType("wandb")

    class Run:
        def finish(self):
            log.append(("finish",))

    def init(**kw):
        log.append(("init", kw))
        return Run()

    class Image:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

    mod.init = init
    mod.Image = Image
    mod.log = lambda payload, step=None: log.append(("log", payload, step))
    monkeypatch.setitem(sys.modules, "wandb", mod)


def test_missing_backend_degrades_silently(tmp_path, capsys):
    sys.modules.pop("wandb", None)
    w = MetricsWriter(log_dir=tmp_path, vis=["wandb"], steps_per_log=1)
    assert not w.has_backend
    w.step(0, {"loss": 1.0}, pixels=100)  # terminal line still prints
    out = capsys.readouterr().out
    assert "unavailable" in out and "loss=1" in out


def test_wandb_backend_logs_scalars_and_images(tmp_path, monkeypatch):
    log = []
    _mock_wandb(monkeypatch, log)
    w = MetricsWriter(
        log_dir=tmp_path, vis=["wandb"], steps_per_log=1,
        experiment_name="exp", project="proj",
    )
    assert w.has_backend
    w.step(3, {"loss": 0.5, "psnr": 30.0})
    w.image(3, "eval/rgb", np.zeros((4, 4, 3)))
    w.close()
    kinds = [e[0] for e in log]
    assert kinds[0] == "init" and log[0][1]["project"] == "proj"
    scalars = {k: v for e in log if e[0] == "log" for k, v in e[1].items()
               if not hasattr(v, "arr")}
    assert scalars == {"train/loss": 0.5, "train/psnr": 30.0}
    assert any(e[0] == "log" and any(hasattr(v, "arr") for v in e[1].values())
               for e in log)
    assert kinds[-1] == "finish"


def test_tensorboard_flag_still_routes(tmp_path):
    w = MetricsWriter(log_dir=tmp_path, tensorboard=True, steps_per_log=1)
    # torch tensorboard is in the image; the backend should be live
    assert w.has_backend
    w.step(0, {"loss": 2.0})
    w.image(0, "eval/rgb", np.zeros((4, 4, 3)))
    w.close()
    assert any(tmp_path.iterdir())  # event file written
