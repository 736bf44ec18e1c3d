"""Conv stack ops: masked 2D convs, eval-mode batchnorm, hardtanh, lookahead.

Replaces the reference conv path (model.py:50-81 MaskConv, :357-396 conv
stack, :125-153 Lookahead) with XLA convolutions — on TPU,
``lax.conv_general_dilated`` lowers onto the MXU; BN (eval) and hardtanh fuse
into the conv epilogue, so no Pallas is needed for this stage to hit
speed-of-light.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ConvParams(NamedTuple):
    """One conv block: Conv2d + BatchNorm2d (eval stats)."""

    weight: jnp.ndarray  # (O, I, Kf, Kt) — torch layout
    bias: jnp.ndarray  # (O,)
    bn_gamma: jnp.ndarray  # (O,)
    bn_beta: jnp.ndarray  # (O,)
    bn_mean: jnp.ndarray  # (O,)
    bn_var: jnp.ndarray  # (O,)


def hardtanh(x: jnp.ndarray, lo: float = 0.0, hi: float = 20.0) -> jnp.ndarray:
    """Hardtanh(0, 20) — the reference's conv/lookahead activation."""
    return jnp.clip(x, lo, hi)


def conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: tuple[int, int],
    padding: tuple[int, int],
) -> jnp.ndarray:
    """torch.nn.Conv2d-equivalent on NCHW input.

    Input follows the kernel dtype (bf16 kernels -> bf16 MXU conv) with
    float32 accumulation/output.
    """
    out = jax.lax.conv_general_dilated(
        x.astype(weight.dtype),
        weight,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias[None, :, None, None].astype(jnp.float32)
    return out


def conv2d_banded_cin1(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: tuple[int, int],
    padding: tuple[int, int],
) -> jnp.ndarray:
    """C_in=1 Conv2d recast as one dense banded matmul.

    The first DS2 conv has a single input channel, which starves the MXU's
    contraction dimension in a direct convolution. Instead: unfold the
    small time-kernel taps into KT strided views and fold the freq kernel
    into a banded (KT·F_pad, F_out·O) matrix, so the whole layer is a
    single (B·T_out, KT·F_pad) x (KT·F_pad, F_out·O) MXU matmul —
    ~5x more FLOPs (the band's zeros) but dense and tiled. Numerically
    identical to :func:`conv2d` (pinned in tests/test_conv_banded.py);
    whether it wins is measured on-chip (benchmarks/conv_layout_probe.py).
    """
    b, cin, f, t = x.shape
    assert cin == 1, "banded form only applies to the C_in=1 first conv"
    o, _, kf, kt = weight.shape
    sf, st = stride
    pf, pt = padding
    f_out = (f + 2 * pf - kf) // sf + 1
    t_out = (t + 2 * pt - kt) // st + 1
    fp = f + 2 * pf

    xpad = jnp.pad(x[:, 0], ((0, 0), (pf, pf), (pt, pt)))  # (B, Fp, Tp)

    # banded matrix: M[ktap, fi, f', oc] = w[oc, 0, fi - sf*f', ktap]
    fi = jnp.arange(fp)[:, None]
    fo = sf * jnp.arange(f_out)[None, :]
    kf_idx = fi - fo  # (Fp, F_out)
    valid = (kf_idx >= 0) & (kf_idx < kf)
    w_g = weight[:, 0, jnp.clip(kf_idx, 0, kf - 1), :]  # (O, Fp, F_out, KT)
    m = jnp.where(valid[None, :, :, None], w_g, 0)
    m = jnp.transpose(m, (3, 1, 2, 0)).reshape(kt, fp, f_out * o)

    # KT strided time views: z[k, b, fi, t'] = xpad[b, fi, st*t' + k]
    z = jnp.stack(
        [xpad[:, :, k : k + st * (t_out - 1) + 1 : st] for k in range(kt)]
    )
    mm_dtype = weight.dtype
    out = jnp.einsum(
        "kbft,kfm->btm",
        z.astype(mm_dtype),
        m.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )  # (B, T_out, F_out*O)
    out = out.reshape(b, t_out, f_out, o)
    out = jnp.transpose(out, (0, 3, 2, 1))  # NCHW
    if bias is not None:
        out = out + bias[None, :, None, None].astype(jnp.float32)
    return out


def batchnorm_eval(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = 1e-5,
    channel_axis: int = 1,
) -> jnp.ndarray:
    """BatchNorm in eval mode: a per-channel affine with running stats."""
    shape = [1] * x.ndim
    shape[channel_axis] = -1
    scale = (gamma / jnp.sqrt(var + eps)).reshape(shape)
    shift = (beta - mean * gamma / jnp.sqrt(var + eps)).reshape(shape)
    return x * scale + shift


def fold_bn_into_conv(p: ConvParams, eps: float = 1e-5) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold eval-mode BN into the conv weight/bias — exact for inference.

    mask(htanh(bn(conv(x)))) == mask(htanh(conv'(x))) with
    w' = w * gamma/sqrt(var+eps) per output channel.
    """
    scale = p.bn_gamma / jnp.sqrt(p.bn_var + eps)
    w = p.weight * scale[:, None, None, None].astype(p.weight.dtype)
    b = (p.bias - p.bn_mean) * scale + p.bn_beta
    return w, b


def time_mask(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Zero activations past each row's (final) sequence length.

    x is (N, C, F, T); the reference masks with the post-conv-stack lengths
    after every module (model.py:71-80), which reduces to masking each
    block's output since intermediate re-masks are idempotent.
    """
    t = x.shape[-1]
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)
    return x * mask[:, None, None, :]


def conv2d_s2d_cin1(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: tuple[int, int],
    padding: tuple[int, int],
) -> jnp.ndarray:
    """C_in=1 stride-(2,2) Conv2d via space-to-depth: the four 2x2 input
    phases become channels and the conv runs stride-1 on the half-res
    grid with per-phase kernel taps.

    A single input channel starves the MXU's contraction dimension in a
    direct convolution; folding the stride phases into C_in=4 quadruples
    it while quartering the spatial grid — measured 2.3x faster than the
    direct conv for the DS2 first layer on v5e (9.4 -> 4.1 ms at
    B=104x8s) and bit-identical modulo bf16 summation order (pinned in
    tests/test_conv_banded.py).
    """
    b, cin, f, t = x.shape
    assert cin == 1 and stride == (2, 2)
    o, _, kf, kt = weight.shape
    pf, pt = padding
    # +1 on the high side so every phase slice has equal length
    xp = jnp.pad(x, ((0, 0), (0, 0), (pf, pf + 1), (pt, pt + 1)))
    phases = [xp[:, :, i::2, j::2] for i in range(2) for j in range(2)]
    fmin = min(p.shape[2] for p in phases)
    tmin = min(p.shape[3] for p in phases)
    xs = jnp.concatenate([p[:, :, :fmin, :tmin] for p in phases], axis=1)
    kf2, kt2 = (kf + 1) // 2, (kt + 1) // 2
    # phase kernel: tap (i, j) lands in channel 2*(i%2)+(j%2) at (i//2, j//2)
    wp = jnp.zeros((o, 4, kf2, kt2), weight.dtype)
    ii, jj = jnp.meshgrid(jnp.arange(kf), jnp.arange(kt), indexing="ij")
    wp = wp.at[:, (ii % 2) * 2 + (jj % 2), ii // 2, jj // 2].set(
        weight[:, 0]
    )
    out = jax.lax.conv_general_dilated(
        xs.astype(weight.dtype),
        wp,
        window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    f_out = (f + 2 * pf - kf) // 2 + 1
    t_out = (t + 2 * pt - kt) // 2 + 1
    assert out.shape[2] >= f_out and out.shape[3] >= t_out, (
        out.shape, f_out, t_out,
    )
    out = out[:, :, :f_out, :t_out]
    if bias is not None:
        out = out + bias[None, :, None, None].astype(jnp.float32)
    return out


def conv2d_s2d_freq(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: tuple[int, int],
    padding: tuple[int, int],
) -> jnp.ndarray:
    """Stride-(2,1) Conv2d via space-to-depth on the FREQUENCY axis only:
    the two freq phases become channel blocks (C_in doubles) and the conv
    runs stride-1 on the half-resolution freq grid with per-phase kernel
    taps — the conv2/conv3 counterpart of :func:`conv2d_s2d_cin1` (DS2
    layers 2-3 are (21,11) kernels at stride (2,1), reference
    model.py:357-396). Measured on v5e at the serving shape it LOSES to
    the direct strided conv (conv2 13.0 vs 25.4 ms, conv3 11.7 vs
    21.4 ms, benchmarks/conv_layout_probe.json) — XLA's implicit-im2col
    conv emitter already tiles the 32x21x11 contraction well, and the
    phase split doubles the channel dim at the cost of an extra relayout.
    conv_block therefore keeps :func:`conv2d` for stride (2,1); this
    variant stays as the probe-tested alternative. Numerically identical
    to :func:`conv2d` modulo summation order (tests/test_conv_banded.py).
    """
    b, cin, f, t = x.shape
    assert stride == (2, 1)
    o, _, kf, kt = weight.shape
    pf, pt = padding
    # +1 on the high freq side so both phase slices have equal length
    xp = jnp.pad(x, ((0, 0), (0, 0), (pf, pf + 1), (pt, pt)))
    ph0 = xp[:, :, 0::2, :]
    ph1 = xp[:, :, 1::2, :]
    fmin = min(ph0.shape[2], ph1.shape[2])
    xs = jnp.concatenate([ph0[:, :, :fmin], ph1[:, :, :fmin]], axis=1)
    kf2 = (kf + 1) // 2
    # tap fi of input channel c lands in channel (fi%2)*C + c at freq
    # tap fi//2:  out[f'] = sum w[c,fi] x[c, 2f'+fi]
    #           = sum wp[p*C+c, k] xs[p*C+c, f'+k],  p=fi%2, k=fi//2
    wp = jnp.zeros((o, 2 * cin, kf2, kt), weight.dtype)
    ii = jnp.arange(kf)
    wp = wp.at[
        :,
        (ii % 2)[:, None] * cin + jnp.arange(cin)[None, :],
        (ii // 2)[:, None],
        :,
    ].set(jnp.transpose(weight, (0, 2, 1, 3)))
    out = jax.lax.conv_general_dilated(
        xs.astype(weight.dtype),
        wp,
        window_strides=(1, 1),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    f_out = (f + 2 * pf - kf) // 2 + 1
    t_out = t + 2 * pt - kt + 1
    assert out.shape[2] >= f_out and out.shape[3] >= t_out, (
        out.shape, f_out, t_out,
    )
    out = out[:, :, :f_out, :t_out]
    if bias is not None:
        out = out + bias[None, :, None, None].astype(jnp.float32)
    return out


def conv_block(
    x: jnp.ndarray,
    p: ConvParams,
    lengths: jnp.ndarray,
    stride: tuple[int, int],
    padding: tuple[int, int],
    folded: bool = True,
) -> jnp.ndarray:
    """conv -> BN(eval) -> hardtanh -> length mask, optionally with BN folded."""
    conv = (
        conv2d_s2d_cin1
        if x.shape[1] == 1 and stride == (2, 2)
        else conv2d
    )
    if folded:
        w, b = fold_bn_into_conv(p)
        out = conv(x, w, b, stride, padding)
    else:
        out = conv(x, p.weight, p.bias, stride, padding)
        out = batchnorm_eval(out, p.bn_gamma, p.bn_beta, p.bn_mean, p.bn_var)
    return time_mask(hardtanh(out), lengths)


def conv_out_length(length, kernel: int, stride: int, padding: int, dilation: int = 1):
    """Conv1d/2d output length along one axis (reference get_seq_lens,
    model.py:540-551)."""
    return (length + 2 * padding - dilation * (kernel - 1) - 1) // stride + 1


class LookaheadParams(NamedTuple):
    weight: jnp.ndarray  # (H, context) — depthwise taps over future frames


def lookahead(x: jnp.ndarray, p: LookaheadParams) -> jnp.ndarray:
    """Lookahead convolution over future context (model.py:125-153).

    x is (T, B, H); output[t] = sum_k w[:, k] * x[t + k] with the sequence
    right-padded by context-1 zeros. Implemented as a stacked shift + einsum
    so XLA folds it into one fused contraction.
    """
    t = x.shape[0]
    context = p.weight.shape[1]
    x_pad = jnp.pad(x, ((0, context - 1), (0, 0), (0, 0)))
    stacked = jnp.stack([x_pad[k : k + t] for k in range(context)])  # (C, T, B, H)
    return jnp.einsum("ctbh,hc->tbh", stacked, p.weight, preferred_element_type=jnp.float32)


class BatchNormParams(NamedTuple):
    gamma: jnp.ndarray
    beta: jnp.ndarray
    mean: jnp.ndarray
    var: jnp.ndarray

    def scale_shift(self, eps: float = 1e-5):
        scale = self.gamma / jnp.sqrt(self.var + eps)
        return scale, self.beta - self.mean * scale


class LinearParams(NamedTuple):
    weight: jnp.ndarray  # (out, in) — torch layout
    bias: jnp.ndarray | None
