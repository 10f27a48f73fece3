"""Native C++ sampler: builds with g++, matches the numpy sampler's
contract (pairs within the same mask id, points inside masks), and the
prefetching datamanager drains correctly."""

import numpy as np
import pytest

from gaussiangrasper_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("g++ unavailable — native sampler not built")
    return lib


def make_mask():
    sam = np.full((48, 64), -1, np.int32)
    sam[:10, :10] = 0
    sam[20:35, 30:60] = 2  # id 1 intentionally absent
    return sam


def test_pairs_within_same_mask(lib):
    sam = make_mask()
    g, p, s = 4, 16, 32
    out = native.sample_mask_batch(sam, g, p, s, seed=7)
    pair_a, pair_b, pair_valid, group_valid, points, point_valid = out
    assert group_valid.sum() == 2
    for gi in range(g):
        if not group_valid[gi]:
            assert not pair_valid[gi].any()
            continue
        ids_a = sam[pair_a[gi, :, 0], pair_a[gi, :, 1]]
        ids_b = sam[pair_b[gi, :, 0], pair_b[gi, :, 1]]
        assert (ids_a == ids_b).all()
        assert (ids_a == ids_a[0]).all()
        assert (ids_a > -1).all()


def test_points_inside_masks(lib):
    sam = make_mask()
    out = native.sample_mask_batch(sam, 4, 8, 64, seed=11)
    _, _, _, _, points, point_valid = out
    assert point_valid.any()
    assert (sam[points[point_valid, 0], points[point_valid, 1]] > -1).all()


def test_empty_mask(lib):
    sam = np.full((16, 16), -1, np.int32)
    out = native.sample_mask_batch(sam, 2, 4, 8, seed=3)
    _, _, pair_valid, group_valid, _, point_valid = out
    assert not group_valid.any() and not pair_valid.any() and not point_valid.any()


def test_determinism_per_seed(lib):
    sam = make_mask()
    a = native.sample_mask_batch(sam, 2, 4, 8, seed=5)
    b = native.sample_mask_batch(sam, 2, 4, 8, seed=5)
    c = native.sample_mask_batch(sam, 2, 4, 8, seed=6)
    np.testing.assert_array_equal(a[0], b[0])
    assert not np.array_equal(a[0], c[0])


def test_prefetching_datamanager(tmp_path):
    # build a tiny scene without pytest fixture plumbing
    import json
    from PIL import Image

    root = tmp_path / "scene"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(2):
        name = f"f{i}.png"
        Image.fromarray(rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)).save(
            root / "images" / name
        )
        frames.append({"file_path": f"images/{name}",
                       "transform_matrix": np.eye(4).tolist()})
    (root / "transforms.json").write_text(json.dumps(
        {"fl_x": 20.0, "fl_y": 20.0, "cx": 16, "cy": 12, "w": 32, "h": 24,
         "frames": frames}))

    from gaussiangrasper_tpu.data.dataparsers.transforms_json import TransformsJsonParser
    from gaussiangrasper_tpu.data.manager import FullImageDatamanager, SamplerConfig
    from gaussiangrasper_tpu.data.prefetch import PrefetchingDatamanager

    dm = FullImageDatamanager(TransformsJsonParser(root).parse(),
                              SamplerConfig(num_points=8))
    pf = PrefetchingDatamanager(dm, depth=2)
    seen = set()
    for _ in range(4):
        idx, cam, batch = pf.next_train()
        seen.add(idx)
        assert batch["image"].shape == (24, 32, 3)
    assert seen == {0, 1}
    pf.close()
