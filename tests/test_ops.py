"""Parity tests for core conv/pool ops vs the reference's torch semantics.

Golden comparisons run the *reference code itself* (imported read-only from
/root/reference) on CPU torch and check our JAX ops agree to float tolerance.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ivf_tpu.ops import (
    conv3d_same,
    max_pool3d_same,
    avg_pool3d_valid,
    conv2d_same_torch,
)
from ivf_tpu.ops.conv import max_pool2d_valid
from ivf_tpu.ops.padding import same_pad_amounts


def _nchw3d_to_jax(x_torch):
    # torch (B, C, T, H, W) -> jax (B, T, H, W, C)
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 4, 1))


def _jax_to_nchw3d(x_jax):
    return np.asarray(x_jax).transpose(0, 4, 1, 2, 3)


@pytest.mark.parametrize("size,kernel,stride", [(16, 3, 1), (16, 3, 2), (15, 7, 2), (7, 2, 2), (32, 1, 1)])
def test_same_pad_amounts_match_tf_formula(size, kernel, stride):
    lo, hi = same_pad_amounts(size, kernel, stride)
    # TF SAME definition
    out = -(-size // stride)
    total = max((out - 1) * stride + kernel - size, 0)
    assert lo + hi == total
    assert lo == total // 2


@pytest.mark.parametrize(
    "shape,kshape,stride",
    [
        ((2, 8, 16, 16, 3), (3, 3, 3), (1, 1, 1)),
        ((2, 8, 16, 16, 3), (3, 3, 3), (2, 2, 2)),
        ((1, 7, 15, 13, 4), (7, 7, 7), (2, 2, 2)),
        ((1, 8, 16, 16, 3), (1, 1, 1), (1, 1, 1)),
    ],
)
def test_conv3d_same_matches_reference_unit3d(reference_pt_path, shape, kshape, stride):
    from models.I3D_doubled import Unit3D  # reference module (read-only)

    b, t, h, w, cin = shape
    cout = 5
    torch.manual_seed(0)
    unit = Unit3D(
        in_channels=cin,
        output_channels=cout,
        kernel_shape=list(kshape),
        stride=stride,
        use_batch_norm=False,
        use_bias=True,
        activation_fn=None,
    )
    x_t = torch.randn(b, cin, t, h, w)
    with torch.no_grad():
        ref = unit(x_t).numpy()

    # torch conv weight (Cout, Cin, kT, kH, kW) -> DHWIO
    kern = unit.conv3d.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    bias = unit.conv3d.bias.detach().numpy()
    out = conv3d_same(_nchw3d_to_jax(x_t), jnp.asarray(kern), stride, jnp.asarray(bias))
    np.testing.assert_allclose(_jax_to_nchw3d(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "shape,window,stride",
    [
        ((2, 8, 16, 16, 3), (1, 3, 3), (1, 2, 2)),
        ((2, 8, 16, 16, 3), (3, 3, 3), (2, 2, 2)),
        ((1, 7, 15, 13, 2), (2, 2, 2), (2, 2, 2)),
    ],
)
def test_max_pool3d_same_matches_reference(reference_pt_path, shape, window, stride):
    from models.I3D_doubled import MaxPool3dSamePadding

    b, t, h, w, c = shape
    pool = MaxPool3dSamePadding(kernel_size=list(window), stride=stride, padding=0)
    # include negative values to catch the zero-pad-vs-(-inf) distinction
    x_t = torch.randn(b, c, t, h, w)
    with torch.no_grad():
        ref = pool(x_t).numpy()
    out = max_pool3d_same(_nchw3d_to_jax(x_t), window, stride)
    np.testing.assert_allclose(_jax_to_nchw3d(out), ref, rtol=1e-5, atol=1e-6)


def test_avg_pool3d_valid_matches_torch():
    x_t = torch.randn(2, 4, 6, 14, 14)
    pool = torch.nn.AvgPool3d(kernel_size=[2, 7, 7], stride=(1, 1, 1))
    with torch.no_grad():
        ref = pool(x_t).numpy()
    out = avg_pool3d_valid(_nchw3d_to_jax(x_t), (2, 7, 7), (1, 1, 1))
    np.testing.assert_allclose(_jax_to_nchw3d(out), ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv2d_same_torch_matches_torch(stride):
    k, cin, cout = 5, 3, 8
    torch.manual_seed(1)
    conv = torch.nn.Conv2d(cin, cout, k, stride, padding=(k - 1) // 2, bias=True)
    x_t = torch.randn(2, cin, 16, 12)
    with torch.no_grad():
        ref = conv(x_t).numpy()
    kern = conv.weight.detach().numpy().transpose(2, 3, 1, 0)  # HWIO
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    out = conv2d_same_torch(x_j, jnp.asarray(kern), stride, jnp.asarray(conv.bias.detach().numpy()))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5)


def test_max_pool2d_valid_matches_torch():
    x_t = torch.randn(2, 4, 15, 13)  # odd sizes: floor-mode truncation
    pool = torch.nn.MaxPool2d(kernel_size=(2, 2))
    with torch.no_grad():
        ref = pool(x_t).numpy()
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    out = max_pool2d_valid(x_j, (2, 2))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-6)


@pytest.mark.slow
def test_pallas_gate_math_matches_reference_cell(reference_pt_path):
    """Fused gate block == reference ConvLSTMCell.forward (zero peepholes)."""
    from models.convolution_lstm import ConvLSTMCell

    torch.manual_seed(2)
    cin, ch, k = 3, 8, 5
    cell = ConvLSTMCell(cin, ch, k, conv_stride=1, device="cpu")
    b, hh, ww = 2, 8, 8
    x_t = torch.randn(b, cin, hh, ww)
    h_t = torch.randn(b, ch, hh, ww)
    c_t = torch.randn(b, ch, hh, ww)
    cell.init_hidden(b, ch, (hh, ww))  # creates the zero peephole constants
    with torch.no_grad():
        ref_h, ref_c = cell(x_t, h_t, c_t)

    from ivf_tpu.ops.convlstm_cell import convlstm_cell_step

    def torch_kernel_to_hwio(m):
        return jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0))

    wx = jnp.concatenate(
        [torch_kernel_to_hwio(m) for m in (cell.Wxi, cell.Wxf, cell.Wxc, cell.Wxo)],
        axis=-1,
    )
    bx = jnp.concatenate(
        [jnp.asarray(m.bias.detach().numpy()) for m in (cell.Wxi, cell.Wxf, cell.Wxc, cell.Wxo)]
    )
    wh = jnp.concatenate(
        [torch_kernel_to_hwio(m) for m in (cell.Whi, cell.Whf, cell.Whc, cell.Who)],
        axis=-1,
    )
    to_j = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    new_h, new_c = convlstm_cell_step(to_j(x_t), to_j(h_t), to_j(c_t), wx, bx, wh)
    np.testing.assert_allclose(
        np.asarray(new_h).transpose(0, 3, 1, 2), ref_h.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_c).transpose(0, 3, 1, 2), ref_c.numpy(), rtol=1e-4, atol=1e-5
    )

    # pallas path (interpret mode on CPU) agrees with the jnp path
    from ivf_tpu.ops.convlstm_cell import fused_gate_math
    from ivf_tpu.ops.pallas.fused_gates import pallas_gate_math
    import jax

    key = jax.random.PRNGKey(0)
    gx = jax.random.normal(key, (2, 8, 8, 4 * ch))
    gh = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4 * ch))
    c0 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, ch))
    jh, jc = fused_gate_math(gx, gh, c0)
    ph, pc = pallas_gate_math(gx, gh, c0, interpret=True)
    np.testing.assert_allclose(np.asarray(ph), np.asarray(jh), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pc), np.asarray(jc), rtol=1e-5, atol=1e-6)


def test_pallas_gate_math_vjp_and_auto_interpret():
    """The gate kernel is differentiable (custom VJP == autodiff of the jnp
    gate math) and auto-selects interpret mode off-TPU — use_pallas ConvLSTM
    must work in grad contexts (mask search, training) on the virtual mesh."""
    import jax
    from ivf_tpu.ops.convlstm_cell import fused_gate_math
    from ivf_tpu.ops.pallas.fused_gates import pallas_gate_math

    ch = 4
    gx = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4 * ch))
    gh = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4 * ch))
    c0 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, ch))

    # interpret defaults to auto (CPU backend here) — no explicit flag
    ph, pc = pallas_gate_math(gx, gh, c0)
    jh, jc = fused_gate_math(gx, gh, c0)
    np.testing.assert_allclose(np.asarray(ph), np.asarray(jh), rtol=1e-5, atol=1e-6)

    def loss_pl(gx, gh, c0):
        h, c = pallas_gate_math(gx, gh, c0)
        return (h * h).sum() + (c * 1.5).sum()

    def loss_ref(gx, gh, c0):
        h, c = fused_gate_math(gx, gh, c0)
        return (h * h).sum() + (c * 1.5).sum()

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(gx, gh, c0)
    g_rf = jax.grad(loss_ref, argnums=(0, 1, 2))(gx, gh, c0)
    for a, b in zip(g_pl, g_rf):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


@pytest.mark.slow
def test_pallas_pointwise_conv_matches_jnp():
    import jax
    from ivf_tpu.ops.pallas.pointwise_conv import pallas_pointwise_conv

    key = jax.random.PRNGKey(0)
    # deliberately unaligned shapes: N=2*3*5*5=150, Cin=112, Cout=48
    x = jax.random.normal(key, (2, 3, 5, 5, 112))
    w = jax.random.normal(jax.random.PRNGKey(1), (112, 48)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (48,))
    ref = np.maximum(np.einsum("bthwc,cd->bthwd", np.asarray(x), np.asarray(w)) + np.asarray(b), 0)
    out = pallas_pointwise_conv(x, w, b, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    # no-relu / no-bias path
    out2 = pallas_pointwise_conv(x, w, None, relu=False, interpret=True)
    ref2 = np.einsum("bthwc,cd->bthwd", np.asarray(x), np.asarray(w))
    np.testing.assert_allclose(np.asarray(out2), ref2, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pallas_pointwise_conv_vjp():
    """Custom VJP (dx via the kernel with w.T, dw/db via einsum) matches
    autodiff of the reference einsum formulation — use_pallas models are
    differentiable (the mask search needs d score / d input)."""
    import jax
    import jax.numpy as jnp
    from ivf_tpu.ops.pallas.pointwise_conv import pallas_pointwise_conv

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 3, 5, 5, 112))
    w = jax.random.normal(jax.random.PRNGKey(1), (112, 48)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (48,))
    g = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 5, 5, 48))
    ref = lambda x, w, b: jnp.maximum(jnp.einsum("...c,cd->...d", x, w) + b, 0)
    _, vjp_ref = jax.vjp(ref, x, w, b)
    _, vjp_pl = jax.vjp(
        lambda x, w, b: pallas_pointwise_conv(x, w, b, relu=True), x, w, b
    )
    for a, bb in zip(vjp_ref(g), vjp_pl(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-5
        )


@pytest.mark.slow
def test_pallas_maxpool3d_matches_xla():
    """Pallas 3x3x3 stride-1 pool: forward bit-exact vs reduce_window;
    backward exact on tie-free input (distinct values route gradients to
    unique argmaxes, so both formulations agree)."""
    import jax
    import jax.numpy as jnp
    from ivf_tpu.ops.conv import max_pool3d_same
    from ivf_tpu.ops.pallas.maxpool3d import pallas_maxpool3d_s1

    rng = np.random.RandomState(0)
    x = (
        jnp.asarray(
            rng.permutation(2 * 4 * 9 * 10 * 130)
            .reshape(2, 4, 9, 10, 130)
            .astype(np.float32)
        )
        * 1e-3
    )
    ref = lambda a: max_pool3d_same(a, (3, 3, 3), (1, 1, 1))
    np.testing.assert_array_equal(
        np.asarray(ref(x)), np.asarray(pallas_maxpool3d_s1(x))
    )
    g = jnp.asarray(rng.randn(*x.shape).astype(np.float32))
    _, vjp_ref = jax.vjp(ref, x)
    _, vjp_pl = jax.vjp(pallas_maxpool3d_s1, x)
    np.testing.assert_allclose(
        np.asarray(vjp_ref(g)[0]),
        np.asarray(vjp_pl(g)[0]),
        rtol=1e-5,
        atol=1e-5,  # float accumulation order differs
    )
    # bf16 path (f32-upcast equality): forward bit-exact on positive input
    xb = (x + 1.0).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(ref(xb)), np.asarray(pallas_maxpool3d_s1(xb))
    )


@pytest.mark.slow
def test_i3d_pallas_pool_wiring():
    """pallas_pool routes the Inception branch-3 pools through the kernel
    with unchanged output (interpret mode off-TPU)."""
    import jax
    import jax.numpy as jnp
    from ivf_tpu.models import i3d_smth

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32, 32, 3))
    m_ref = i3d_smth(num_classes=5, dropout_rate=0.0, pool_shape=(1, 1, 1))
    m_pl = i3d_smth(
        num_classes=5, dropout_rate=0.0, pool_shape=(1, 1, 1), pallas_pool=True
    )
    v = m_ref.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(m_pl.apply(v, x, train=False)),
        np.asarray(m_ref.apply(v, x, train=False)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_torch_batchnorm_train_semantics(reference_pt_path):
    """TorchBatchNorm train step == torch BatchNorm3d: biased var for
    normalization, unbiased var + momentum for running stats."""
    import jax
    from ivf_tpu.models.layers import TorchBatchNorm

    torch.manual_seed(5)
    bn_t = torch.nn.BatchNorm3d(6, eps=1e-3, momentum=0.01)
    bn_t.train()
    with torch.no_grad():
        bn_t.weight.uniform_(0.5, 1.5)
        bn_t.bias.uniform_(-0.5, 0.5)
        bn_t.running_mean.uniform_(-0.2, 0.2)
        bn_t.running_var.uniform_(0.8, 1.2)
    x_t = torch.randn(2, 6, 3, 4, 5)

    m = TorchBatchNorm(eps=1e-3, momentum=0.01)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 4, 1))
    variables = {
        "params": {
            "scale": jnp.asarray(bn_t.weight.detach().numpy()),
            "bias": jnp.asarray(bn_t.bias.detach().numpy()),
        },
        "batch_stats": {},
    }
    # run torch from KNOWN initial running stats so the post-call stats are
    # reproducible on the jax side
    bn_t2 = torch.nn.BatchNorm3d(6, eps=1e-3, momentum=0.01)
    bn_t2.train()
    with torch.no_grad():
        bn_t2.weight.copy_(bn_t.weight)
        bn_t2.bias.copy_(bn_t.bias)
        bn_t2.running_mean.fill_(0.1)
        bn_t2.running_var.fill_(0.9)
    ref = bn_t2(x_t).detach().numpy()
    variables["batch_stats"]["mean"] = jnp.full((6,), 0.1)
    variables["batch_stats"]["var"] = jnp.full((6,), 0.9)
    out, updated = m.apply(
        variables, x_j, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["mean"]),
        bn_t2.running_mean.numpy(),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["var"]),
        bn_t2.running_var.numpy(),
        rtol=1e-4,
    )


@pytest.mark.slow
def test_i3d_fuse_pool_conv_matches_baseline():
    """I3D(fuse_pool_conv=True): forward logits == baseline I3D, and the
    input gradient == the I3D(pallas_pool=True) path, which shares the
    fused kernel's documented tie semantics (cotangent to ALL window
    maxima); vs plain XLA the gradients differ exactly at tie sites, which
    are plentiful at random init (half the pooled activations are exact
    post-ReLU zeros)."""
    from ivf_tpu.models import i3d_smth

    key = jax.random.PRNGKey(0)
    clips = jax.random.uniform(key, (2, 16, 64, 64, 3), jnp.float32)
    kw = dict(num_classes=12, dropout_rate=0.0, softmax=True, pool_shape=(2, 2, 2))
    base = i3d_smth(**kw)
    fused = i3d_smth(**kw, fuse_pool_conv=True)
    tie_oracle = i3d_smth(**kw, pallas_pool=True)
    v = base.init(key, clips)
    y0 = base.apply(v, clips, train=False)
    y1 = fused.apply(v, clips, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=2e-4, atol=1e-5)

    def score(model, c):
        return model.apply(v, c, train=False)[0, 3]

    g_fused = np.asarray(jax.grad(lambda c: score(fused, c))(clips))
    g_tie = np.asarray(jax.grad(lambda c: score(tie_oracle, c))(clips))
    assert np.all(np.isfinite(g_fused))
    np.testing.assert_allclose(g_fused, g_tie, rtol=1e-3, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["frame", "tblock"])
def test_fused_pool_conv_matches_xla_composition(variant):
    """fused_pool_conv (per-frame grid) and fused_pool_conv_tblock
    (whole-T frame-block grid, round 5) fwd + all three cotangents ==
    max_pool3d_same + einsum + bias (+ReLU), on tie-free data (interpret
    mode off-TPU)."""
    from ivf_tpu.ops.pallas import fused_branch3

    fused_pool_conv = (
        fused_branch3.fused_pool_conv
        if variant == "frame"
        else fused_branch3.fused_pool_conv_tblock
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.rand(2, 4, 6, 6, 24) + 0.1).astype(np.float32))
    w = jnp.asarray(rng.randn(24, 16).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)

    def ref(x, w, b, relu=True):
        p = max_pool3d_same(x, (3, 3, 3), (1, 1, 1))
        y = jnp.einsum("bthwi,io->bthwo", p, w) + b
        return jnp.maximum(y, 0.0) if relu else y

    for relu in (True, False):
        np.testing.assert_allclose(
            np.asarray(fused_pool_conv(x, w, b, relu)),
            np.asarray(ref(x, w, b, relu)),
            rtol=1e-5, atol=1e-5,
        )
        args = [x, w, b]
        for pos in range(3):
            def at(v, fn):
                a = args[:pos] + [v] + args[pos + 1:]
                return jnp.sum(jnp.sin(fn(*a, relu)))

            g1 = jax.grad(lambda v: at(v, fused_pool_conv))(args[pos])
            g2 = jax.grad(lambda v: at(v, ref))(args[pos])
            np.testing.assert_allclose(
                np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5,
                err_msg=f"cotangent {pos} relu={relu}",
            )


@pytest.mark.parametrize(
    "shape,win,st",
    [
        ((2, 8, 14, 14, 32), (3, 3, 3), (1, 1, 1)),
        ((2, 8, 28, 28, 16), (1, 3, 3), (1, 2, 2)),
        ((2, 8, 14, 14, 16), (3, 3, 3), (2, 2, 2)),
        ((2, 7, 15, 15, 8), (2, 2, 2), (2, 2, 2)),
        ((1, 16, 9, 9, 8), (3, 3, 3), (1, 2, 2)),
    ],
)
def test_max_pool3d_shift_impl_matches_reduce_window(shape, win, st):
    """impl='shift' (separable shifted-slice max chain, elementwise-select
    VJP) is bit-equal to the reduce_window pool forward and gradient-equal
    on tie-free data (ops/conv.py)."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    a = max_pool3d_same(x, win, st)
    b = max_pool3d_same(x, win, st, impl="shift")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    xp = jnp.asarray((rng.rand(*shape) + 0.1).astype(np.float32))
    g1 = jax.grad(lambda v: jnp.sum(jnp.sin(max_pool3d_same(v, win, st))))(xp)
    g2 = jax.grad(
        lambda v: jnp.sum(jnp.sin(max_pool3d_same(v, win, st, impl="shift")))
    )(xp)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_i3d_pool_impl_shift_matches_baseline():
    """I3D(pool_impl='shift') forward logits are bit-compatible with the
    default pools (identical forward math) at inference."""
    from ivf_tpu.models import i3d_smth

    key = jax.random.PRNGKey(2)
    clips = jax.random.uniform(key, (2, 16, 64, 64, 3), jnp.float32)
    kw = dict(num_classes=12, dropout_rate=0.0, softmax=True, pool_shape=(2, 2, 2))
    base = i3d_smth(**kw)
    shift = i3d_smth(**kw, pool_impl="shift")
    v = base.init(key, clips)
    y0 = base.apply(v, clips, train=False)
    y1 = shift.apply(v, clips, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5, atol=1e-6)
    g = jax.grad(lambda c: shift.apply(v, c, train=False)[0, 3])(clips)
    assert np.all(np.isfinite(np.asarray(g)))


def test_maxpool_eqbwd_grads_match_native_on_unique_max():
    """impl='eqbwd' (equality-stencil VJP replacing select_and_scatter):
    identical forward, and EXACTLY equal gradients whenever window maxima
    are unique; strided windows fall back to the native path. Tie semantics
    deviation is documented in ops/conv.py (sum over ties vs first-max)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ivf_tpu.ops.conv import max_pool3d_same

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.permutation(2 * 6 * 8 * 10 * 3)
        .reshape(2, 6, 8, 10, 3)
        .astype(np.float32)
    )
    f_ref = lambda x: jnp.sum(jnp.sin(max_pool3d_same(x, (3, 3, 3), (1, 1, 1))))
    f_eq = lambda x: jnp.sum(
        jnp.sin(max_pool3d_same(x, (3, 3, 3), (1, 1, 1), impl="eqbwd"))
    )
    np.testing.assert_allclose(float(f_ref(x)), float(f_eq(x)), rtol=0)
    np.testing.assert_array_equal(
        np.asarray(jax.grad(f_ref)(x)), np.asarray(jax.grad(f_eq)(x))
    )
    # strided: falls back to native (values equal, no stride-1 assert)
    a = max_pool3d_same(x, (3, 3, 3), (2, 2, 2))
    b = max_pool3d_same(x, (3, 3, 3), (2, 2, 2), impl="eqbwd")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_maxpool_argmax_forward_bit_equal_incl_ties():
    """impl='argmax' forward is BIT-equal to the native pool on any bf16
    data, ties and negatives included — the packed uint32 max reduce
    decodes back to the exact max bits (ops/conv.py)."""
    import jax.numpy as jnp

    from ivf_tpu.ops.conv import max_pool3d_same

    rng = np.random.RandomState(3)
    # coarse integer grid forces many in-window ties; mixed signs exercise
    # the monotone bit flip on both branches
    x = jnp.asarray(
        (rng.randint(-4, 5, size=(2, 6, 8, 10, 3))).astype(np.float32)
    ).astype(jnp.bfloat16)
    for win in ((3, 3, 3), (2, 3, 3)):
        a = max_pool3d_same(x, win, (1, 1, 1))
        b = max_pool3d_same(x, win, (1, 1, 1), impl="argmax")
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )


def test_maxpool_argmax_grads_match_native_on_unique_max():
    """impl='argmax' (uint8 index-plane VJP, the fewest-byte pool backward):
    exactly equal gradients whenever window maxima are unique; strided
    windows and non-16-bit dtypes fall back to the native path. Tie
    deviation (one FULL cotangent per window, largest-key element) is
    documented in ops/conv.py."""
    import jax
    import jax.numpy as jnp

    from ivf_tpu.ops.conv import max_pool3d_same

    rng = np.random.RandomState(0)
    # a permutation of 0..239 is exactly representable in bf16 (integers
    # <= 256) and window-unique by construction
    x = jnp.asarray(
        rng.permutation(2 * 5 * 4 * 3 * 2)
        .reshape(2, 5, 4, 3, 2)
        .astype(np.float32)
    ).astype(jnp.bfloat16)
    f_ref = lambda v: jnp.sum(
        jnp.sin(max_pool3d_same(v, (3, 3, 3), (1, 1, 1)).astype(jnp.float32))
    )
    f_am = lambda v: jnp.sum(
        jnp.sin(
            max_pool3d_same(
                v, (3, 3, 3), (1, 1, 1), impl="argmax"
            ).astype(jnp.float32)
        )
    )
    np.testing.assert_allclose(float(f_ref(x)), float(f_am(x)), rtol=0)
    np.testing.assert_array_equal(
        np.asarray(jax.grad(f_ref)(x), np.float32),
        np.asarray(jax.grad(f_am)(x), np.float32),
    )
    # tie subgradient validity: each window routes its cotangent to exactly
    # one tied element — total mass is preserved on an all-equal input
    xt = jnp.ones((1, 3, 3, 3, 1), jnp.bfloat16)
    g = jax.grad(
        lambda v: jnp.sum(
            max_pool3d_same(v, (3, 3, 3), (1, 1, 1), impl="argmax").astype(
                jnp.float32
            )
        )
    )(xt)
    assert float(jnp.sum(g.astype(jnp.float32))) == 27.0  # 27 windows, 1 each
    # strided under impl='argmax': falls through to the NATIVE path (the
    # strided extension is opt-in via 'argmax_full' — see dispatch note)
    a = max_pool3d_same(x, (3, 3, 3), (2, 2, 2))
    b = max_pool3d_same(x, (3, 3, 3), (2, 2, 2), impl="argmax")
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)
    )
    xf = x.astype(jnp.float32)
    gf1 = jax.grad(
        lambda v: jnp.sum(max_pool3d_same(v, (3, 3, 3), (1, 1, 1)))
    )(xf)
    gf2 = jax.grad(
        lambda v: jnp.sum(
            max_pool3d_same(v, (3, 3, 3), (1, 1, 1), impl="argmax")
        )
    )(xf)
    np.testing.assert_array_equal(np.asarray(gf1), np.asarray(gf2))


@pytest.mark.parametrize(
    "shape,win,st",
    [
        ((2, 8, 14, 14, 4), (1, 3, 3), (1, 2, 2)),  # I3D pool2a/3a geometry
        ((2, 8, 14, 14, 4), (3, 3, 3), (2, 2, 2)),  # pool4a
        ((2, 8, 14, 14, 4), (2, 2, 2), (2, 2, 2)),  # pool5a
        ((1, 7, 9, 11, 3), (3, 3, 3), (2, 2, 2)),  # odd sizes: asym SAME
    ],
)
def test_maxpool_argmax_strided_matches_native(shape, win, st):
    """The strided argmax pool (impl='argmax_full', dilated-pad scatter
    VJP) is forward bit-equal and gradient-equal to the native
    select_and_scatter path on unique-max bf16 data, at every trunk-pool
    geometry the I3D uses."""
    import jax
    import jax.numpy as jnp

    from ivf_tpu.ops.conv import max_pool3d_same

    rng = np.random.RandomState(11)
    n = int(np.prod(shape))
    # distinct bf16-exact values: mantissa in [128, 256) (8 significand
    # bits) x a distinct exponent per block of 128 — injective and exact
    perm = rng.permutation(n)
    vals = ((perm % 128 + 128) * np.exp2(perm // 128)).astype(np.float32)
    x = jnp.asarray(vals.reshape(shape)).astype(jnp.bfloat16)
    assert len(np.unique(np.asarray(x, np.float32))) == n  # tie-free
    f_ref = lambda v: jnp.sum(
        jnp.sin(max_pool3d_same(v, win, st).astype(jnp.float32))
    )
    f_am = lambda v: jnp.sum(
        jnp.sin(
            max_pool3d_same(v, win, st, impl="argmax_full").astype(
                jnp.float32
            )
        )
    )
    np.testing.assert_array_equal(
        np.asarray(max_pool3d_same(x, win, st), np.float32),
        np.asarray(
            max_pool3d_same(x, win, st, impl="argmax_full"), np.float32
        ),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.grad(f_ref)(x), np.float32),
        np.asarray(jax.grad(f_am)(x), np.float32),
    )


@pytest.mark.parametrize(
    "shape,win,st",
    [
        ((1, 5, 6, 4, 2), (3, 3, 3), (1, 1, 1)),  # branch pool -> argmax
        ((1, 4, 8, 7, 1), (1, 3, 3), (1, 2, 2)),  # trunk pool -> shift
        ((1, 5, 6, 4, 2), (3, 3, 3), (2, 2, 2)),  # trunk pool -> shift
    ],
)
def test_maxpool_argmax_shift_matches_native(shape, win, st):
    """impl='argmax_shift' (argmax VJP on stride-1 branch pools, shift
    chain on strided trunk pools — the combo that removes
    select_and_scatter everywhere while compiling where 'argmax_full'
    cannot): bit-equal forward, gradient-equal on unique window maxima."""
    rng = np.random.RandomState(11)
    # a permutation of < 256 integers is bf16-exact and window-unique, so
    # all impls grad-agree (no max ties anywhere, incl. vs the 0 padding
    # because 0 is a window max only where it is the sole real element)
    flat = rng.permutation(np.prod(shape)).astype(np.float32) + 1.0
    x = jnp.asarray(flat.reshape(shape), jnp.bfloat16)

    a = max_pool3d_same(x, win, st)
    b = max_pool3d_same(x, win, st, impl="argmax_shift")
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)
    )

    def f(v, impl):
        y = max_pool3d_same(v, win, st, impl=impl).astype(jnp.float32)
        return jnp.sum(jnp.sin(y * 1e-4))

    g1 = jax.grad(lambda v: f(v, "reduce_window"))(x)
    g2 = jax.grad(lambda v: f(v, "argmax_shift"))(x)
    np.testing.assert_array_equal(
        np.asarray(g1, np.float32), np.asarray(g2, np.float32)
    )

    # f32 input: the argmax leg needs a 16-bit dtype, so stride-1 falls
    # through to the shift chain -- forward must still be bit-equal
    xf = jnp.asarray(flat.reshape(shape))
    np.testing.assert_array_equal(
        np.asarray(max_pool3d_same(xf, win, st)),
        np.asarray(max_pool3d_same(xf, win, st, impl="argmax_shift")),
    )
