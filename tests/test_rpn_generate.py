"""RPN proposal pre-generation (lib/rpn_msr/generate.py equivalent)."""

import numpy as np
import pytest

from mv3d_tf_tpu.config import cfg


@pytest.fixture
def params_2d():
    import jax
    from mv3d_tf_tpu.models import vggnet
    return vggnet.init_params_2d(jax.random.PRNGKey(0), n_classes=21)


@pytest.mark.slow
def test_im_proposals_shapes_and_unproject(params_2d, monkeypatch):
    from mv3d_tf_tpu import rpn_generate
    monkeypatch.setattr(cfg.TEST, "SCALES_BASE", (1.0,))
    rng = np.random.RandomState(0)
    im = rng.randint(0, 255, (96, 128, 3)).astype(np.float32)
    boxes, scores = rpn_generate.im_proposals(
        params_2d, im, bucket_hw=(96, 128), pre_nms_top_n=200,
        post_nms_top_n=40)
    assert boxes.ndim == 2 and boxes.shape[1] == 4
    assert scores.shape == (len(boxes), 1)
    assert len(boxes) >= 1
    # proposals are clipped to the (bucketed) image extent
    assert boxes[:, 0].min() >= 0 and boxes[:, 2].max() <= 127
    assert boxes[:, 1].min() >= 0 and boxes[:, 3].max() <= 95
    # min-size filter (TEST.RPN_MIN_SIZE=5) holds in original coords
    assert ((boxes[:, 2] - boxes[:, 0] + 1) >= 5).all()

    # scale=2 path: same pipeline, boxes come back in ORIGINAL coords
    monkeypatch.setattr(cfg.TEST, "SCALES_BASE", (2.0,))
    boxes2, _ = rpn_generate.im_proposals(
        params_2d, im[:48, :64], bucket_hw=(96, 128), pre_nms_top_n=200,
        post_nms_top_n=40)
    assert boxes2[:, 2].max() <= 64 - 0.5  # unprojected by /2


@pytest.mark.slow
def test_imdb_proposals_iterates(params_2d, tmp_path, monkeypatch):
    from PIL import Image
    from mv3d_tf_tpu import rpn_generate

    class TinyImdb:
        num_images = 2

        def __init__(self):
            rng = np.random.RandomState(1)
            self.paths = []
            for i in range(2):
                p = tmp_path / f"{i}.png"
                Image.fromarray(
                    rng.randint(0, 255, (96, 128, 3), np.uint8)).save(p)
                self.paths.append(str(p))

        def image_path_at(self, i):
            return self.paths[i]

    monkeypatch.setattr(cfg.TEST, "SCALES_BASE", (1.0,))
    dets = rpn_generate.imdb_proposals_det(
        params_2d, TinyImdb(), log=None, bucket_hw=(96, 128),
        pre_nms_top_n=200, post_nms_top_n=40)
    assert len(dets) == 2
    assert all(d.shape[1] == 5 for d in dets)
