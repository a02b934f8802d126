"""Exactness of the MXU-packed 3-D conv reformulations (ops/conv3d.py).

Every variant must equal the native ``lax.conv_general_dilated`` 3-D conv
up to float reassociation (these are bit-level re-orderings of the same
MACs, not approximations) — on odd/even D, stride 1 and 2, and the channel
widths the stereo networks use.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_tpu.ops.conv3d import (conv3d_chunked, conv3d_mxu,
                                   conv3d_native, conv3d_shiftadd,
                                   deconv3d_parity)

ATOL = 2e-4  # fp32 reassociation at contraction dims up to ~900


def _xw(d, h, w, cin, cout, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, d, h, w, cin)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)), jnp.float32)
    return x, wt


CASES = [  # (d, h, w, cin, cout, stride)
    (8, 12, 16, 5, 7, 1),
    (8, 12, 16, 5, 7, 2),
    (6, 10, 18, 8, 1, 1),
    (12, 8, 16, 4, 3, 1),
]


class TestConv3dVariants:
    @pytest.mark.parametrize("variant", [conv3d_chunked, conv3d_shiftadd])
    @pytest.mark.parametrize("case", CASES)
    def test_matches_native(self, variant, case):
        d, h, w, cin, cout, stride = case
        x, wt = _xw(d, h, w, cin, cout)
        ref = conv3d_native(x, wt, stride)
        out = variant(x, wt, stride)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=ATOL)

    @pytest.mark.parametrize("case", CASES)
    def test_dispatch_matches_native(self, case):
        d, h, w, cin, cout, stride = case
        x, wt = _xw(d, h, w, cin, cout)
        ref = conv3d_native(x, wt, stride)
        np.testing.assert_allclose(np.asarray(conv3d_mxu(x, wt, stride)),
                                   np.asarray(ref), atol=ATOL)

    def test_dispatch_native_fallbacks(self):
        # kd != 3 and stride > 2 must fall through to the native conv
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 6, 8, 10, 4)), jnp.float32)
        w5 = jnp.asarray(rng.standard_normal((5, 3, 3, 4, 6)), jnp.float32)
        np.testing.assert_allclose(np.asarray(conv3d_mxu(x, w5)),
                                   np.asarray(conv3d_native(x, w5)),
                                   atol=ATOL)


class TestDeconv2dParity:
    @pytest.mark.parametrize("scale", [2, 4, 8, 16])
    def test_matches_flax_conv_transpose(self, scale):
        import flax.linen as nn
        from stereo_tpu.ops.conv3d import deconv2d_parity

        rng = np.random.default_rng(scale)
        x = jnp.asarray(rng.standard_normal((2, 5, 7, 4)), jnp.float32)
        mod = nn.ConvTranspose(6, (2 * scale, 2 * scale),
                               strides=(scale, scale), padding="SAME",
                               use_bias=False)
        variables = mod.init(jax.random.PRNGKey(0), x)
        ref = mod.apply(variables, x)
        out = deconv2d_parity(x, variables["params"]["kernel"], scale)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_module_matches_conv_transpose_with_bias(self):
        import flax.linen as nn
        from stereo_tpu.models.layers import Deconv2dParityMXU

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((1, 6, 8, 3)), jnp.float32)
        ref_mod = nn.ConvTranspose(5, (8, 8), strides=(4, 4),
                                   padding="SAME")
        variables = ref_mod.init(jax.random.PRNGKey(1), x)
        ref = ref_mod.apply(variables, x)
        out = Deconv2dParityMXU(5, 4).apply(variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_rejects_mismatched_kernel(self):
        from stereo_tpu.ops.conv3d import deconv2d_parity

        with pytest.raises(ValueError, match="2s"):
            deconv2d_parity(jnp.zeros((1, 4, 4, 2)),
                            jnp.zeros((3, 3, 2, 2)), 2)


class TestDeconv3dParity:
    def test_matches_flax_conv_transpose(self):
        import flax.linen as nn

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 6, 8, 10, 5)), jnp.float32)
        mod = nn.ConvTranspose(7, (4, 4, 4), strides=(2, 2, 2),
                               padding="SAME", use_bias=False)
        variables = mod.init(jax.random.PRNGKey(0), x)
        ref = mod.apply(variables, x)
        out = deconv3d_parity(x, variables["params"]["kernel"])
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=ATOL)

    def test_rejects_other_kernels(self):
        x = jnp.zeros((1, 4, 4, 4, 2))
        w = jnp.zeros((3, 3, 3, 2, 2))
        with pytest.raises(ValueError, match="4,4,4"):
            deconv3d_parity(x, w)
