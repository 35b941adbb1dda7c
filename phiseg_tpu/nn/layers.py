"""Core layers: convolution blocks, pooling, resizing.

TPU-native equivalent of the reference op library `tfwrapper/layers.py`
(conv2D: layers.py:94-145, averagepool2D: layers.py:44-54,
global_averagepool2D: layers.py:70-78, bilinear_upsample2D: layers.py:336-345,
nearest_neighbour_upsample2D: layers.py:326-333) and
`tfwrapper/normalisation.py` (batch_norm: normalisation.py:145-163).

All arrays are NHWC (the natural TPU conv layout). Modules carry an explicit
compute `dtype` so the conv/matmul path can run in bfloat16 on the MXU while
parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# He-normal (fan-in) initialisation, matching the reference's default
# `weight_init='he_normal'` (tfwrapper/layers.py:104, tfwrapper/utils.py:214-271).
he_normal = nn.initializers.he_normal()


def _bilinear_upsample_init(key, shape, dtype=jnp.float32):
    """Bilinear-interpolation kernel init for transposed convs
    (ref tfwrapper/utils.py:275-306)."""
    kh, kw = shape[0], shape[1]
    fy, fx = (kh + 1) // 2, (kw + 1) // 2
    cy = fy - 1 if kh % 2 == 1 else fy - 0.5
    cx = fx - 1 if kw % 2 == 1 else fx - 0.5
    og = jnp.mgrid[:kh, :kw]
    filt = (1 - jnp.abs(og[0] - cy) / fy) * (1 - jnp.abs(og[1] - cx) / fx)
    w = jnp.zeros(shape, dtype)
    n = min(shape[2], shape[3])
    for c in range(n):
        w = w.at[:, :, c, c].set(filt.astype(dtype))
    return w


# Weight-initialiser registry (ref tfwrapper/utils.py:214-271: he_normal /
# he_uniform / xavier_normal / xavier_uniform / caffe_uniform / bilinear).
WEIGHT_INITS = {
    "he_normal": nn.initializers.he_normal(),
    "he_uniform": nn.initializers.he_uniform(),
    "xavier_normal": nn.initializers.glorot_normal(),
    "xavier_uniform": nn.initializers.glorot_uniform(),
    # caffe's default: uniform scaled by fan_in (ref 'caffe_uniform')
    "caffe_uniform": nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
    "bilinear": _bilinear_upsample_init,
}


def get_weight_init(name: str):
    if name not in WEIGHT_INITS:
        raise ValueError(f"unknown weight_init {name!r} (known: {sorted(WEIGHT_INITS)})")
    return WEIGHT_INITS[name]


# ---------------------------------------------------------------------------
# Pooling / resizing (pure functions)
# ---------------------------------------------------------------------------


def avg_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 average pooling, SAME padding (ref layers.py:44-54)."""
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2), padding="SAME")


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 max pooling, SAME padding (ref layers.py:18-28)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding="SAME")


def global_avg_pool(x: jax.Array) -> jax.Array:
    """Global average pool over spatial dims: NHWC -> NC (ref layers.py:70-78)."""
    return jnp.mean(x, axis=(1, 2))


def resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize of NHWC to given (H, W) (ref layers.py:336-345).

    Uses half-pixel-centred sampling (jax.image default). The TF1 reference
    used the legacy corner-aligned=False/half-pixel=False convention; the
    modern convention is strictly more accurate and is used deliberately.
    """
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")


def resize_nearest(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize of NHWC to (H, W) (ref layers.py:326-333)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="nearest")


def upsample_bilinear(x: jax.Array, factor: int = 2) -> jax.Array:
    """Bilinear upsample by an integer factor (ref layers.py:336-345)."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, (h * factor, w * factor))


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    _, h, w, _ = x.shape
    return resize_nearest(x, (h * factor, w * factor))


# ---------------------------------------------------------------------------
# Conv block
# ---------------------------------------------------------------------------

ActivationFn = Optional[Callable[[jax.Array], jax.Array]]


class ConvBlock(nn.Module):
    """Conv2D + optional normalisation + activation.

    Equivalent of the reference `tfwrapper.layers.conv2D` (layers.py:94-145):
    3x3 SAME conv by default, he_normal init, bias automatically disabled
    under batch norm (layers.py:126-128), normalisation applied before the
    activation (layers.py:134-135).

    norm options mirror `tfwrapper/normalisation.py`:
      'batch'    -> BatchNorm(momentum=.99, eps=1e-3)   (normalisation.py:145-163)
      'group'    -> GroupNorm(16 ch/group, min 2 groups) (normalisation.py:17-36)
      'layer'    -> LayerNorm over (H,W,C)               (normalisation.py:39-68)
      'instance' -> per-image, per-channel norm          (normalisation.py:3-14)
      'none'     -> identity
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    activation: ActivationFn = nn.relu
    norm: str = "none"
    weight_init: str = "he_normal"
    # Keep-probability dropout after the activation (ref layers.py:139-140,
    # :653-665). Requires a 'dropout' rng stream in apply() when train=True.
    dropout_keep_prob: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_bias = self.norm != "batch"
        x = nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding="SAME",
            use_bias=use_bias,
            kernel_init=get_weight_init(self.weight_init),
            dtype=self.dtype,
            name="conv",
        )(x)

        # Normalisation layers intentionally do NOT get the compute dtype:
        # with dtype=None flax promotes to the f32 parameter dtype, so batch
        # statistics are always accumulated in float32 even on a bf16 path.
        if self.norm == "batch":
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                name="bn",
            )(x)
        elif self.norm == "batch_bf16":
            # Perf variant (no reference equivalent): BatchNorm with
            # dtype=self.dtype so the NORMALISED OUTPUT stays in the compute
            # dtype. Note flax's _compute_stats forces float32 reductions
            # regardless of dtype, so the batch statistics themselves are
            # still accumulated in f32 -- any speedup comes from the bf16
            # output/elementwise tail, NOT from the stat reduction (the
            # round-3 norm sweep measured it ~equal to "batch", consistent
            # with this). Parameters and running stats stay f32
            # (param_dtype); checkpoint-compatible with norm="batch"
            # (same "bn" scope).
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                name="bn",
            )(x)
        elif self.norm == "group":
            num_groups = max(2, x.shape[-1] // 16)
            x = nn.GroupNorm(num_groups=num_groups, epsilon=1e-5, name="gn")(x)
        elif self.norm == "layer":
            x = nn.LayerNorm(epsilon=1e-3, name="ln",
                             reduction_axes=(-3, -2, -1))(x)
        elif self.norm == "renorm":
            from phiseg_tpu.nn.normalization import BatchRenorm

            x = BatchRenorm(name="brn")(x, train=train)
        elif self.norm == "instance":
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            scale = self.param("in_scale", nn.initializers.normal(0.02), (x.shape[-1],))
            offset = self.param("in_offset", nn.initializers.zeros, (x.shape[-1],))
            x = x * (1.0 + scale.astype(x.dtype)) + offset.astype(x.dtype)
        elif self.norm != "none":
            raise ValueError(f"unknown norm: {self.norm!r}")

        if self.activation is not None:
            x = self.activation(x)
        if self.dropout_keep_prob is not None:
            x = nn.Dropout(rate=1.0 - self.dropout_keep_prob,
                           deterministic=not train, name="dropout")(x)
        # Back to the compute dtype: norms promote to f32 (correct for the
        # statistics) but materialising f32 activations doubles HBM traffic
        # on what is a bandwidth-bound model.
        return x.astype(self.dtype)


class TransposedConvBlock(nn.Module):
    """Transposed (fractionally-strided) conv + norm + activation
    (ref layers.py:197-323). 4x4 kernel, stride 2 by default."""

    features: int
    kernel_size: Tuple[int, int] = (4, 4)
    strides: Tuple[int, int] = (2, 2)
    activation: ActivationFn = nn.relu
    norm: str = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_bias = self.norm != "batch"
        x = nn.ConvTranspose(
            features=self.features, kernel_size=self.kernel_size,
            strides=self.strides, padding="SAME", use_bias=use_bias,
            kernel_init=he_normal, dtype=self.dtype, name="conv_t",
        )(x)
        return _norm_act(self, x, train)


class DilatedConvBlock(nn.Module):
    """Atrous conv + norm + activation (ref layers.py:378-425)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    rate: int = 2
    activation: ActivationFn = nn.relu
    norm: str = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_bias = self.norm != "batch"
        x = nn.Conv(
            features=self.features, kernel_size=self.kernel_size,
            kernel_dilation=(self.rate, self.rate), padding="SAME",
            use_bias=use_bias, kernel_init=he_normal, dtype=self.dtype,
            name="conv_d",
        )(x)
        return _norm_act(self, x, train)


class ResidualUnit(nn.Module):
    """Pre-norm residual unit with optional downsampling / projection
    (ref layers.py:428-536, He et al. 2015)."""

    features: int
    down_sample: bool = False
    activation: ActivationFn = nn.relu
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        strides = (2, 2) if self.down_sample else (1, 1)
        needs_proj = self.down_sample or x.shape[-1] != self.features
        shortcut = x
        if needs_proj:
            shortcut = nn.Conv(self.features, (1, 1), strides=strides,
                               kernel_init=he_normal, dtype=self.dtype,
                               name="proj")(x)
        y = ConvBlock(self.features, strides=strides, activation=self.activation,
                      norm=self.norm, dtype=self.dtype, name="c1")(x, train=train)
        y = ConvBlock(self.features, activation=None, norm=self.norm,
                      dtype=self.dtype, name="c2")(y, train=train)
        out = y + shortcut
        return self.activation(out) if self.activation is not None else out


class Conv3DBlock(nn.Module):
    """3D conv + norm + activation, NDHWC (ref layers.py:148-194)."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    activation: ActivationFn = nn.relu
    norm: str = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_bias = self.norm != "batch"
        x = nn.Conv(
            features=self.features, kernel_size=self.kernel_size,
            strides=self.strides, padding="SAME", use_bias=use_bias,
            kernel_init=he_normal, dtype=self.dtype, name="conv3d",
        )(x)
        return _norm_act(self, x, train)


def _norm_act(mod, x: jax.Array, train: bool) -> jax.Array:
    """Shared norm-then-activation tail for the conv block variants."""
    if mod.norm == "batch":
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name="bn")(x)
    elif mod.norm == "group":
        x = nn.GroupNorm(num_groups=max(2, x.shape[-1] // 16), epsilon=1e-5,
                         name="gn")(x)
    elif mod.norm != "none":
        raise ValueError(f"unknown norm: {mod.norm!r}")
    if mod.activation is not None:
        x = mod.activation(x)
    return x.astype(mod.dtype)


class Dense(nn.Module):
    """Dense layer (ref layers.py:539-582)."""

    features: int
    activation: ActivationFn = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.features, kernel_init=he_normal, dtype=self.dtype)(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class TransposedConv3DBlock(nn.Module):
    """3D transposed conv + norm + activation, NDHWC (ref layers.py:260-323).
    4x4x4 kernel, stride 2 by default."""

    features: int
    kernel_size: Tuple[int, int, int] = (4, 4, 4)
    strides: Tuple[int, int, int] = (2, 2, 2)
    activation: ActivationFn = nn.relu
    norm: str = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        use_bias = self.norm != "batch"
        x = nn.ConvTranspose(
            features=self.features, kernel_size=self.kernel_size,
            strides=self.strides, padding="SAME", use_bias=use_bias,
            kernel_init=he_normal, dtype=self.dtype, name="conv_t3d",
        )(x)
        return _norm_act(self, x, train)


def resize_bilinear_3d(x: jax.Array, size: Tuple[int, int, int]) -> jax.Array:
    """Trilinear resize of NDHWC to (D, H, W) (ref layers.py:348-358)."""
    b, _, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], size[2], c), method="trilinear")


def resize_nearest_3d(x: jax.Array, size: Tuple[int, int, int]) -> jax.Array:
    """Nearest-neighbour 3D resize of NDHWC (ref layers.py:361-376)."""
    b, _, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], size[2], c), method="nearest")


def upsample_bilinear_3d(x: jax.Array, factor: int = 2) -> jax.Array:
    _, d, h, w, _ = x.shape
    return resize_bilinear_3d(x, (d * factor, h * factor, w * factor))


def upsample_nearest_3d(x: jax.Array, factor: int = 2) -> jax.Array:
    _, d, h, w, _ = x.shape
    return resize_nearest_3d(x, (d * factor, h * factor, w * factor))


def avg_pool_2x2x2(x: jax.Array) -> jax.Array:
    """3D average pooling, NDHWC (ref layers.py avg/max pool3D)."""
    return nn.avg_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2), padding="SAME")


def max_pool_2x2x2(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2), padding="SAME")


def pad_to_size(x: jax.Array, target_hw: Tuple[int, int]) -> jax.Array:
    """Centre-pad NHWC spatially up to target size (ref layers.py:625-650)."""
    h, w = x.shape[1], x.shape[2]
    th, tw = target_hw
    if th < h or tw < w:
        raise ValueError(f"target {target_hw} smaller than input {(h, w)}")
    ph, pw = th - h, tw - w
    return jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))


def reshape_pool_2x2(x: jax.Array) -> jax.Array:
    """Space-to-depth 'pooling' (ref layers.py:57-67)."""
    return jnp.concatenate(
        [x[:, 0::2, 0::2, :], x[:, 1::2, 0::2, :], x[:, 0::2, 1::2, :], x[:, 1::2, 1::2, :]],
        axis=3,
    )


def crop_and_concat(tensors: Sequence[jax.Array], axis: int = -1) -> jax.Array:
    """Centre-crop NHWC tensors to the smallest common (H, W) and concat.

    Skip-connection helper (ref tfwrapper/layers.py:586-622). With the usual
    power-of-two image sizes this is a plain concat.
    """
    hs = [t.shape[1] for t in tensors]
    ws = [t.shape[2] for t in tensors]
    h, w = min(hs), min(ws)
    cropped = []
    for t in tensors:
        dh = (t.shape[1] - h) // 2
        dw = (t.shape[2] - w) // 2
        cropped.append(t[:, dh:dh + h, dw:dw + w, :])
    return jnp.concatenate(cropped, axis=axis)


def reparameterize(rng: jax.Array, mu: jax.Array, sigma: jax.Array) -> jax.Array:
    """Diagonal-Gaussian reparameterised sample z = mu + sigma * eps.

    Equivalent of the in-graph `tf.random_normal` draws in the reference
    (phiseg/model_zoo/posteriors.py:108,128) but with an explicit PRNG key so
    multi-sample draws vectorise with vmap instead of batch tiling.
    """
    eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
    return mu + sigma * eps
