"""Distributed-engine tests on the virtual 8-device CPU mesh.

The contract is exact equivalence with the single-device engine: the halo
exchange, blockwise cost volume, cross-chip argmax, and psum-gathered
refinement must not change a single output value.
"""

import dataclasses

import numpy as np
import pytest

from stereo_tpu.core.config import MatchingConfig, MeshConfig
from stereo_tpu.matching.classical import ClassicalStereoEngine
from stereo_tpu.parallel import ShardedClassicalEngine, make_mesh

RNG = np.random.default_rng(11)

CFG = MatchingConfig(height=32, width=64, downscale_factor=2,
                     min_disparity=0, max_disparity=15, cost_patch_radius=1,
                     sad_patch_radius=2, threshold=5, small_mbm_radius=1,
                     mid_mbm_radius=1, large_mbm_radius=2)


def batch(n=2):
    left = RNG.integers(0, 256, (n, 3, CFG.height, CFG.width)).astype(np.float32)
    right = np.roll(left, -5, axis=-1).astype(np.float32)
    return left, right


@pytest.fixture(scope="module")
def reference_disparity():
    left, right = batch(2)
    engine = ClassicalStereoEngine(CFG)
    return left, right, np.asarray(engine.compute_disparity_maps(left, right))


class TestMesh:
    def test_make_mesh_shape(self):
        mesh = make_mesh(MeshConfig(data=2, tile=2, disp=2))
        assert mesh.devices.shape == (2, 2, 2)
        assert mesh.axis_names == ("data", "tile", "disp")

    def test_too_many_devices(self):
        with pytest.raises(RuntimeError):
            make_mesh(MeshConfig(data=16, tile=1, disp=1))


class TestShardedEquivalence:
    @pytest.mark.parametrize("mesh_cfg", [
        MeshConfig(data=1, tile=1, disp=1),
        MeshConfig(data=2, tile=1, disp=1),
        MeshConfig(data=1, tile=4, disp=1),
        MeshConfig(data=1, tile=1, disp=4),
        MeshConfig(data=2, tile=2, disp=2),
    ], ids=["single", "dp2", "tile4", "disp4", "dp2tile2disp2"])
    def test_matches_single_device(self, mesh_cfg, reference_disparity):
        left, right, want = reference_disparity
        engine = ShardedClassicalEngine(CFG, mesh_cfg)
        got = np.asarray(engine.compute_disparity_maps(left, right))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_validation(self):
        with pytest.raises(ValueError):
            ShardedClassicalEngine(CFG, MeshConfig(tile=5))  # 16 % (2*5) != 0
        with pytest.raises(ValueError):
            ShardedClassicalEngine(CFG, MeshConfig(disp=3))  # 8 % 3 != 0
        engine = ShardedClassicalEngine(CFG, MeshConfig(data=2))
        with pytest.raises(ValueError):
            engine.compute_disparity_maps(
                np.zeros((3, 3, 32, 64)), np.zeros((3, 3, 32, 64)))


class TestPipelineMeshWiring:
    def test_pipeline_uses_sharded_backend(self):
        from stereo_tpu.core.config import PipelineConfig
        from stereo_tpu.pipeline import DepthEstimationPipeline
        from stereo_tpu.pipeline.backends import ShardedClassicalBackend

        cfg = PipelineConfig(image_shape=(32, 64), min_disparity=0,
                             max_disparity=15, matching=CFG,
                             stereo_matching_backend="classical",
                             mesh=MeshConfig(data=1, tile=2, disp=2))
        pipeline = DepthEstimationPipeline(cfg)
        assert isinstance(pipeline.stereo_matching, ShardedClassicalBackend)
        left, right = batch(1)
        single = ClassicalStereoEngine(CFG).compute_disparity_map(
            left[0], right[0])
        result = pipeline.process(left[0], right[0])
        np.testing.assert_allclose(np.asarray(result.disparity_map),
                                   np.asarray(single), atol=1e-4)


class TestHealth:
    def test_check_devices_healthy(self):
        from stereo_tpu.parallel.health import check_devices

        report = check_devices(timeout_s=60)
        assert report.healthy and report.num_devices == 8

    def test_supervised_runner_retries_then_succeeds(self):
        from stereo_tpu.parallel.health import SupervisedRunner

        calls = {"n": 0, "recovered": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("chip fell over")
            return "ok"

        runner = SupervisedRunner(
            recover=lambda: calls.__setitem__("recovered",
                                              calls["recovered"] + 1),
            max_retries=3, backoff_s=0.01)
        assert runner.run(flaky) == "ok"
        assert calls["recovered"] == 2 and runner.failures == 2

    def test_supervised_runner_gives_up(self):
        from stereo_tpu.parallel.health import SupervisedRunner

        def dead():
            raise RuntimeError("no chips")

        runner = SupervisedRunner(max_retries=1, backoff_s=0.0)
        with pytest.raises(RuntimeError):
            runner.run(dead)


class TestMeshFactors:
    def test_every_count_gets_a_collective_axis(self):
        import __graft_entry__ as ge

        for n in range(1, 13):
            data, tile, disp = ge._mesh_factors(n)
            assert data * tile * disp == n
            if n > 1:
                # at least one collective-bearing axis must be > 1
                assert tile > 1 or disp > 1, (n, data, tile, disp)


class TestShardedPallasEquivalence:
    """The Pallas kernels composed under shard_map (ring-halo prepadded
    inputs) must be bit-equal to the jnp sharded path and the single-device
    engine (kernels run in interpret mode on CPU)."""

    @pytest.mark.parametrize("mesh_cfg", [
        MeshConfig(data=1, tile=1, disp=1),
        MeshConfig(data=1, tile=4, disp=1),
        MeshConfig(data=2, tile=2, disp=1),
    ], ids=["single", "tile4", "dp2tile2"])
    def test_matches_single_device(self, mesh_cfg, reference_disparity):
        left, right, want = reference_disparity
        cfg = dataclasses.replace(CFG, impl="pallas")
        engine = ShardedClassicalEngine(cfg, mesh_cfg)
        assert engine.use_pallas
        got = np.asarray(engine.compute_disparity_maps(left, right))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_pallas_rejects_disp_sharding(self):
        with pytest.raises(ValueError):
            ShardedClassicalEngine(
                dataclasses.replace(CFG, impl="pallas"), MeshConfig(disp=4))
