"""Training subsystem tests: datasets, Deep3D trainer, stereo trainer,
checkpoint round trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from stereo_tpu.core.config import TrainerConfig
from stereo_tpu.models import Deep3D, load_or_init_params, build_stereo_model
from stereo_tpu.train import (Kitti2015StereoDataset, KittiStereoDataset,
                              StereoTrainer, Trainer, batch_iterator)

RNG = np.random.default_rng(3)


def _write_png(path, h, w, gray16=False):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if gray16:
        arr = (RNG.integers(1, 64, (h, w)) * 256).astype(np.uint16)
        Image.fromarray(arr).save(path)
    else:
        arr = RNG.integers(0, 256, (h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(path)


@pytest.fixture
def fake_drive(tmp_path):
    drive = tmp_path / "2011_09_26" / "2011_09_26_drive_0001_sync"
    for side in ("image_02", "image_03"):
        for i in range(4):
            _write_png(str(drive / side / "data" / f"{i:010d}.png"), 375, 1242)
    return str(drive)


class TestKittiDataset:
    def test_item_shapes(self, fake_drive):
        ds = KittiStereoDataset([fake_drive])
        assert len(ds) == 4
        left, down, right = ds[0]
        assert left.shape == (3, 384, 1280)
        assert down.shape == (3, 96, 320)
        assert right.shape == (3, 384, 1280)
        assert 0.0 <= left.min() and left.max() <= 1.0

    def test_batch_iterator(self, fake_drive):
        ds = KittiStereoDataset([fake_drive])
        batches = list(batch_iterator(ds, 2, shuffle=True, seed=1))
        assert len(batches) == 2
        assert batches[0][0].shape == (2, 3, 384, 1280)


class TestDeep3DTrainer:
    def _small_trainer(self, tmp_path=None):
        model = Deep3D()
        key = jax.random.PRNGKey(0)
        full = jnp.zeros((1, 3, 128, 256), jnp.float32)
        down = jnp.zeros((1, 3, 32, 64), jnp.float32)
        variables = model.init({"params": key, "dropout": key}, full, down,
                               train=True)
        cfg = TrainerConfig(batch_size=2, learning_rate=1e-3,
                            save_path=str(tmp_path / "ckpt") if tmp_path else None,
                            log_every=0)
        return Trainer(model, cfg, variables=variables)

    def test_step_updates_params(self, tmp_path):
        tr = self._small_trainer()
        full = jnp.asarray(RNG.uniform(0, 1, (2, 3, 128, 256)), jnp.float32)
        down = jnp.asarray(RNG.uniform(0, 1, (2, 3, 32, 64)), jnp.float32)
        before = jax.tree_util.tree_leaves(tr.params)[0].copy()
        tr.params, tr.opt_state, loss = tr._step(
            tr.params, tr.opt_state, full, down, full,
            jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        after = jax.tree_util.tree_leaves(tr.params)[0]
        assert not np.array_equal(np.asarray(before), np.asarray(after))

    @pytest.mark.slow  # two Deep3D inits + an Orbax round trip (~5 min CPU)
    def test_checkpoint_roundtrip(self, tmp_path):
        tr = self._small_trainer()
        tr.epoch = 7
        path = str(tmp_path / "ckpt")
        tr.save_checkpoint(path)
        tr2 = self._small_trainer()
        tr2.load_checkpoint(path)
        assert tr2.epoch == 7
        a = jax.tree_util.tree_leaves(tr.params)[0]
        b = jax.tree_util.tree_leaves(tr2.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestStereoTrainer:
    @pytest.fixture
    def dataset(self, tmp_path):
        lefts, rights, disps = [], [], []
        for i in range(2):
            l = str(tmp_path / f"l{i}.png")
            r = str(tmp_path / f"r{i}.png")
            d = str(tmp_path / f"d{i}.png")
            _write_png(l, 48, 96)
            _write_png(r, 48, 96)
            _write_png(d, 48, 96, gray16=True)
            lefts.append(l); rights.append(r); disps.append(d)
        return Kitti2015StereoDataset(lefts, rights, disps, crop=(32, 64))

    @pytest.mark.slow  # MSNet2D train-mode compile is pathological on CPU
    def test_one_epoch_and_export(self, dataset, tmp_path):
        cfg = TrainerConfig(batch_size=2, n_epochs=1, log_every=0)
        tr = StereoTrainer("msnet2d", max_disparity=16, config=cfg,
                           image_shape=(32, 64))
        losses = tr.train(dataset, n_epochs=1)
        assert len(losses) == 1 and np.isfinite(losses[0])

        export_dir = str(tmp_path / "export")
        tr.export_inference_variables(export_dir)
        model = build_stereo_model("msnet2d", max_disparity=16)
        restored = load_or_init_params(model, "msnet2d", (32, 64),
                                       checkpoint_dir=export_dir)
        a = jax.tree_util.tree_leaves(restored["params"])[0]
        b = jax.tree_util.tree_leaves(tr.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out = model.apply(restored, jnp.zeros((1, 3, 32, 64)),
                          jnp.zeros((1, 3, 32, 64)), train=False)
        assert out.shape == (1, 32, 64)


class TestGroundTruthDecoding:
    """GT disparity PNG scaling must key on the PIL mode, not pixel values
    (a genuine uint16 KITTI file whose disparities are all <= 2px would be
    silently left unscaled by a value heuristic)."""

    def test_uint16_small_values_scaled(self, tmp_path):
        from PIL import Image

        l = str(tmp_path / "l.png"); r = str(tmp_path / "r.png")
        d = str(tmp_path / "d.png")
        _write_png(l, 8, 16)
        _write_png(r, 8, 16)
        # 16-bit GT encoding disparity 1.0 px -> raw value 256 (< 512)
        Image.fromarray(np.full((8, 16), 256, np.uint16)).save(d)
        ds = Kitti2015StereoDataset([l], [r], [d], crop=(8, 16))
        _, _, disp = ds.load(0, np.random.default_rng(0))
        np.testing.assert_allclose(disp, 1.0)

    def test_uint8_values_unscaled(self, tmp_path):
        from PIL import Image

        l = str(tmp_path / "l.png"); r = str(tmp_path / "r.png")
        d = str(tmp_path / "d.png")
        _write_png(l, 8, 16)
        _write_png(r, 8, 16)
        Image.fromarray(np.full((8, 16), 100, np.uint8), mode="L").save(d)
        ds = Kitti2015StereoDataset([l], [r], [d], crop=(8, 16))
        _, _, disp = ds.load(0, np.random.default_rng(0))
        np.testing.assert_allclose(disp, 100.0)


class TestStepLR:
    def test_step_lr_schedule_values(self):
        from stereo_tpu.core.config import TrainerConfig
        from stereo_tpu.train.trainer import step_lr_for_epoch

        cfg = TrainerConfig(learning_rate=1e-3, step_size=2, gamma=0.1)
        assert step_lr_for_epoch(cfg, 0) == pytest.approx(1e-3)
        assert step_lr_for_epoch(cfg, 1) == pytest.approx(1e-3)
        assert step_lr_for_epoch(cfg, 2) == pytest.approx(1e-4)
        assert step_lr_for_epoch(cfg, 5) == pytest.approx(1e-5)


class TestNpzCheckpoints:
    def test_roundtrip_and_backend_autoload(self, tmp_path):
        from stereo_tpu.models import (init_stereo_params, load_params_npz,
                                       save_params_npz)

        model = build_stereo_model("msnet2d", max_disparity=16)
        variables = init_stereo_params(model, (32, 64), seed=3)
        path = str(tmp_path / "msnet2d.npz")
        save_params_npz(variables, path)
        back = load_params_npz(path)
        assert set(back) == set(variables)
        flat_a = jax.tree_util.tree_leaves(variables)
        flat_b = jax.tree_util.tree_leaves(back)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            assert a.shape == b.shape
            # float16 storage: small quantization, structure identical
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32), atol=2e-3)

        # the loader resolves "<dir>/<name>.npz" transparently
        restored = load_or_init_params(model, "msnet2d", (32, 64),
                                       checkpoint_dir=str(tmp_path / "msnet2d"))
        a = jax.tree_util.tree_leaves(restored)[0]
        b = jax.tree_util.tree_leaves(back)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_mismatched_max_disparity_fails_fast(self, tmp_path):
        """A volume-folding net restored at a different max_disparity must
        raise an actionable error, not an opaque flax shape error at the
        first apply."""
        import pytest
        from stereo_tpu.models import init_stereo_params, save_params_npz

        model = build_stereo_model("msnet2d", max_disparity=16)
        path = str(tmp_path / "msnet2d.npz")
        save_params_npz(init_stereo_params(model, (32, 64), seed=3), path)
        other = build_stereo_model("msnet2d", max_disparity=32)
        with pytest.raises(ValueError, match="max_disparity"):
            load_or_init_params(other, "msnet2d", (32, 64),
                                checkpoint_dir=path)
