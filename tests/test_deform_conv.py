"""DCNv2 (gather+bilinear) vs a direct numpy reference."""

import numpy as np
import jax
import jax.numpy as jnp

from dfm_tpu.ops.deform_conv import deform_conv2d


def _ref_dcn(x, offset, mask, weight, stride=1, dilation=1):
    """Direct-loop DCNv2 with zero-padded bilinear sampling."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    h_out, w_out = offset.shape[1:3]
    out = np.zeros((b, h_out, w_out, cout), np.float64)

    def bil(img, py, px):
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        fy, fx = py - y0, px - x0
        val = np.zeros(cin)
        for (yy, wy) in ((y0, 1 - fy), (y0 + 1, fy)):
            for (xx, wx) in ((x0, 1 - fx), (x0 + 1, fx)):
                if 0 <= yy < h and 0 <= xx < w:
                    val += wy * wx * img[yy, xx]
        return val

    for bi in range(b):
        for oy in range(h_out):
            for ox in range(w_out):
                acc = np.zeros(cout)
                for dy in range(kh):
                    for dx in range(kw):
                        ki = dy * kw + dx
                        py = oy * stride + (dy - (kh - 1) / 2) * dilation \
                            + offset[bi, oy, ox, 2 * ki]
                        px = ox * stride + (dx - (kw - 1) / 2) * dilation \
                            + offset[bi, oy, ox, 2 * ki + 1]
                        s = bil(x[bi], py, px)
                        if mask is not None:
                            s = s * mask[bi, oy, ox, ki]
                        acc += s @ weight[dy, dx]
                out[bi, oy, ox] = acc
    return out


def test_dcnv2_matches_reference():
    rng = np.random.RandomState(0)
    b, h, w, cin, cout = 1, 7, 9, 4, 6
    x = rng.randn(b, h, w, cin).astype(np.float32)
    offset = (rng.randn(b, h, w, 18) * 1.5).astype(np.float32)
    mask = rng.rand(b, h, w, 9).astype(np.float32)
    weight = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2
    out = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight)))
    ref = _ref_dcn(x, offset, mask, weight)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_dcn_zero_offset_equals_conv():
    """Zero offsets + unit masks == a regular 3x3 conv."""
    rng = np.random.RandomState(1)
    b, h, w, cin, cout = 2, 6, 8, 3, 5
    x = rng.randn(b, h, w, cin).astype(np.float32)
    weight = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2
    offset = np.zeros((b, h, w, 18), np.float32)
    mask = np.ones((b, h, w, 9), np.float32)
    out = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight)))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_resnet_dcn_stage_builds():
    from dfm_tpu.models.backbones.resnet import ResNet
    model = ResNet(depth=50, stage_with_dcn=(False, True, True, True))
    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 3)
                    .astype(np.float32))
    var = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(var, x)
    assert len(outs) == 4
    assert 'conv2_dcn' in var['params']['layer2_block0']
    # zero-init offsets: mask = sigmoid(0) = 0.5 everywhere, output finite
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
