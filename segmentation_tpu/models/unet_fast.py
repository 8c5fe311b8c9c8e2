"""Space-to-depth U-Net inference path — the TPU lane-utilization rewrite.

Why: the reference U-Net's top levels run 3×3 convs with 32/64 channels.
TPU vector lanes are 128 wide, so XLA pads those channel dims 4×/2× — the
levels that hold most of the FLOPs AND most of the bytes execute at ≤25%
lane utilization (measured via benchmarks/profile_unet.py). This module
re-expresses the SAME network exactly (same params, equal math up to float
reassociation) in a packed layout:

  space-to-depth 2×2:   [N, H, W, C] → [N, H/2, W/2, 4, C]
  3×3 VALID conv        → 2×2 conv over 4C→4O channels (1.78× FLOPs at 4×
                          lane width — net win)
  3×3 VALID conv over an UNPACKED input with packed output → a 4×4 stride-2
                          conv producing 4O channels (the kernel phases are
                          absorbed into the kernel) — NO pack transpose at
                          all; this is how every packed level ingests the
                          previous level's pooled output
  2×2/2 max-pool        → max over the 4 packing slots (pure VPU, no
                          spatial op at all)
  2×2/2 transposed conv → a 1×1 matmul whose outputs land pre-packed
  center-crop + concat  → slot-aligned packed slicing (even offsets) or a
                          slot-phase shift: 4 contiguous slices + stack
                          (odd offsets)

Usage:
  fast = UNetS2DInference(cfg)
  prepared = fast.prepare(params)        # packs weights, once, outside jit
  logits = jax.jit(fast.apply)(prepared, x)

Only inference: training takes the standard segmentation_tpu.models.unet
path (or the trainable UNetS2D below). Parity is locked by
tests/test_unet_fast.py.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from segmentation_tpu.core.config import ModelConfig
from segmentation_tpu.nn.layers import relu_out as _relu

_DN = ("NHWC", "HWIO", "NHWC")

# Pallas conv kernels for the packed sites (nn/pallas/conv.py): fused
# bias+relu, pinned row-major layouts — removes the XLA layout-compromise
# copies around the packed convs (~12 ms/step at 512²/B=128, per
# benchmarks/profile_s2d_attr.py). "auto" = on for single-chip TPU with
# lane-exact channels; SEG_TPU_PALLAS_CONV=0 forces the XLA path.
_PALLAS_CONV = os.environ.get("SEG_TPU_PALLAS_CONV", "auto")


def _train_backend_ok() -> bool:
    from segmentation_tpu.nn.pallas.train import backend_ok

    return backend_ok()


def _train_vjp_ok(c: int, o: int) -> bool:
    """Gate for the trainable-Pallas (custom-VJP) dispatch at the
    standard packed sites: lane-aligned channels + single-chip TPU (or
    interpret mode)."""
    return c % 128 == 0 and o % 128 == 0 and _train_backend_ok()


def _pallas_conv_ok(c: int, o: int) -> bool:
    if _PALLAS_CONV == "0":
        return False
    if c % 128 or o % 128:
        return False
    try:
        return jax.default_backend() == "tpu" and len(jax.devices()) == 1
    except Exception:
        return False


# ------------------------------------------------------------------ packing
def _explicit_batch_spec(x):
    """True when the traced aval carries a non-None batch axis name, i.e.
    we are under explicit-sharding jit (Auto meshes trace with an all-None
    spec) where strided convs / rank-changing reshapes cannot infer an
    output sharding and need it passed explicitly."""
    try:
        return x.aval.sharding.spec[0] is not None
    except AttributeError:  # plain numpy input outside jit
        return False


def _reshape(x, shape):
    """Reshape that tolerates batch-sharded operands under explicit-sharding
    jit: dim 0 keeps its sharding, new dims are unsharded."""
    if _explicit_batch_spec(x):
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = x.aval.sharding
        out = NamedSharding(
            sh.mesh, P(sh.spec[0], *([None] * (len(shape) - 1)))
        )
        return lax.reshape(x, shape, out_sharding=out)
    return x.reshape(shape)


def pack2(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] → [N, H/2, W/2, 4, C]; slot index s = 2*dy + dx."""
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(
            f"space-to-depth packing needs even H/W, got {h}x{w}; use "
            "models.unet.UNet for odd input sizes"
        )
    x = _reshape(x, (n, h // 2, 2, w // 2, 2, c))
    return _reshape(
        x.transpose(0, 1, 3, 2, 4, 5), (n, h // 2, w // 2, 4, c)
    )


def unpack2(xp: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack2."""
    n, hp, wp, s, c = xp.shape
    x = _reshape(xp, (n, hp, wp, 2, 2, c)).transpose(0, 1, 3, 2, 4, 5)
    return _reshape(x, (n, hp * 2, wp * 2, c))


def pack_conv3_weight(w: np.ndarray) -> np.ndarray:
    """[3, 3, C, O] → [2, 2, 4C, 4O] packed-space kernel.

    W2[u, v, (a,b,c), (d,e,o)] = W[2u+a-d, 2v+b-e, c, o] when both tap
    indices land in [0, 3), else 0 (6/8 slot pairs live per axis)."""
    w = np.asarray(w)
    c, o = w.shape[2], w.shape[3]
    w2 = np.zeros((2, 2, 4, c, 4, o), w.dtype)
    for u in range(2):
        for v in range(2):
            for a in range(2):
                for b in range(2):
                    for d in range(2):
                        for e in range(2):
                            ky = 2 * u + a - d
                            kx = 2 * v + b - e
                            if 0 <= ky < 3 and 0 <= kx < 3:
                                w2[u, v, 2 * a + b, :, 2 * d + e, :] = (
                                    w[ky, kx]
                                )
    return w2.reshape(2, 2, 4 * c, 4 * o)


def pack_conv3_weight_jnp(w: jnp.ndarray) -> jnp.ndarray:
    """Differentiable (traceable) version of pack_conv3_weight: a gather of
    the [3,3,C,O] kernel into the [2,2,4C,4O] packed form. Index arrays are
    static; the op is a tiny gather+mask, so packing inside the train step
    costs nothing while keeping params in the standard layout."""
    c, o = w.shape[2], w.shape[3]
    u = np.arange(2)[:, None, None, None]
    v = np.arange(2)[None, :, None, None]
    s_in = np.arange(4)[None, None, :, None]
    s_out = np.arange(4)[None, None, None, :]
    a, b_ = s_in // 2, s_in % 2
    d, e = s_out // 2, s_out % 2
    ky = 2 * u + a - d
    kx = 2 * v + b_ - e
    valid = (ky >= 0) & (ky < 3) & (kx >= 0) & (kx < 3)
    kyc = np.clip(ky, 0, 2)
    kxc = np.clip(kx, 0, 2)
    # [2,2,4,4,C,O] gather then mask
    w2 = w[jnp.asarray(kyc), jnp.asarray(kxc)]
    w2 = jnp.where(jnp.asarray(valid)[..., None, None], w2, 0)
    # [u,v,s_in,s_out,C,O] → [u,v,s_in,C,s_out,O] → [2,2,4C,4O]
    w2 = jnp.transpose(w2, (0, 1, 2, 4, 3, 5))
    return w2.reshape(2, 2, 4 * c, 4 * o)


def pack_conv3_weight_s2(w: np.ndarray) -> np.ndarray:
    """[3, 3, C, O] → [4, 4, C, 4O] stride-2 space-to-depth kernel.

    A 3×3 VALID conv whose output lands directly in packed layout, computed
    from the UNPACKED input: output packed pixel (i, j) slot (d, e) is the
    conv at unpacked position (2i+d, 2j+e), which reads input rows
    2i+d+ky ∈ [2i, 2i+4) — i.e. a 4×4 kernel at stride 2 with one output
    channel group per slot. K[u, v, c, (2d+e)·O+o] = W[u-d, v-e, c, o]
    where the tap index is in [0, 3), else 0."""
    w = np.asarray(w)
    c, o = w.shape[2], w.shape[3]
    k4 = np.zeros((4, 4, c, 4, o), w.dtype)
    for d in range(2):
        for e in range(2):
            k4[d : d + 3, e : e + 3, :, 2 * d + e, :] = w
    return k4.reshape(4, 4, c, 4 * o)


def pack_conv3_weight_s2_jnp(w: jnp.ndarray) -> jnp.ndarray:
    """Differentiable version of pack_conv3_weight_s2 (gather + mask)."""
    c, o = w.shape[2], w.shape[3]
    u = np.arange(4)[:, None, None]
    v = np.arange(4)[None, :, None]
    s = np.arange(4)[None, None, :]
    d, e = s // 2, s % 2
    ky, kx = u - d, v - e
    valid = (ky >= 0) & (ky < 3) & (kx >= 0) & (kx < 3)
    w4 = w[jnp.asarray(np.clip(ky, 0, 2)), jnp.asarray(np.clip(kx, 0, 2))]
    w4 = jnp.where(jnp.asarray(valid)[..., None, None], w4, 0)
    # [u,v,s_out,C,O] → [u,v,C,s_out,O] → [4,4,C,4O]
    return jnp.transpose(w4, (0, 1, 3, 2, 4)).reshape(4, 4, c, 4 * o)


def packed_conv3(xp, w2, b, relu=True):
    """Packed-space 3×3 VALID conv: [N,Hp,Wp,4,C] → [N,Hp-1,Wp-1,4,O]."""
    n, hp, wp, s, c = xp.shape
    o4 = w2.shape[-1]
    y = _conv_batch_sharded(
        _reshape(xp, (n, hp, wp, s * c)), w2.astype(xp.dtype), (1, 1)
    )
    y = _reshape(y, (n, hp - 1, wp - 1, 4, o4 // 4))
    y = y + b.astype(y.dtype)
    return _relu(y) if relu else y


def _conv_batch_sharded(x, w, strides):
    """conv_general_dilated that tolerates explicitly batch-sharded inputs
    (strided convs can't infer the output sharding under explicit-sharding
    jit — seen with remat over mesh-placed batches): batch dim keeps its
    sharding, spatial/channel dims unsharded."""
    if _explicit_batch_spec(x):
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = x.aval.sharding
        out = NamedSharding(sh.mesh, P(sh.spec[0], None, None, None))
        return lax.conv_general_dilated(
            x, w, strides, "VALID", dimension_numbers=_DN, out_sharding=out,
        )
    return lax.conv_general_dilated(
        x, w, strides, "VALID", dimension_numbers=_DN,
    )


def strided_packed_conv3(x, w4, b, relu=True):
    """3×3 VALID conv over an UNPACKED input with PACKED output, as a 4×4
    stride-2 conv (see pack_conv3_weight_s2): [N,H,W,C] → [N,(H-2)/2,
    (W-2)/2, 4, O]. Replaces pack2+packed_conv3 with zero layout traffic."""
    n = x.shape[0]
    o4 = w4.shape[-1]
    y = _conv_batch_sharded(x, w4.astype(x.dtype), (2, 2))
    y = _reshape(y, (n, y.shape[1], y.shape[2], 4, o4 // 4))
    y = y + b.astype(y.dtype)
    return _relu(y) if relu else y


def packed_pool(xp):
    """2×2/2 max-pool in packed space = max over the 4 slots → UNPACKED
    [N, Hp, Wp, C] (the pooled grid IS the packed grid)."""
    return jnp.max(xp, axis=3)


# The production forward uses the measured A/B winners unconditionally:
# strided entry convs (no pack transposes), packed-in deconvs, slot-phase
# odd crops, flat packed layout, dual (concat-free) decoder convs. The
# legacy 5-D helpers below are kept as oracles for the unit tests.
ODD_CROP_SLOTS = True

# Strided (d::2) slot ops avoid transposes but lower to expensive gathers on
# some TPU generations; kept only for the legacy pooled-repack path.
STRIDED_SLOT_OPS = False


def packed_pool_repack(xp):
    """Fused pool + re-pack for packed→packed level transitions:
    out[i, j, (d,e), c] = max_s xp[2i+d, 2j+e, s, c]. Legacy path — the
    strided encoder (STRIDED_ENCODER) makes this transpose unnecessary."""
    pooled = jnp.max(xp, axis=3)  # [N, Hp, Wp, C] on the pooled grid
    if not STRIDED_SLOT_OPS:
        return pack2(pooled)
    slots = [
        pooled[:, d::2, e::2, :] for d in range(2) for e in range(2)
    ]
    return jnp.stack(slots, axis=3)


def deconv2_as_matmul(x, wm, b, o, relu=True):
    """2×2 stride-2 VALID transposed conv as a matmul with pre-packed
    output: wm is the [C, 4O] rearrangement of the [2,2,C,O] kernel."""
    y = jnp.einsum("nijc,ck->nijk", x, wm.astype(x.dtype))
    y = y.reshape(*y.shape[:3], 4, o) + b.astype(y.dtype)
    return _relu(y) if relu else y


def deconv2_packed_in(xp, wm, b, o, relu=True):
    """2×2 stride-2 VALID transposed conv consuming a PACKED input and
    producing a PACKED output: [N,i,j,4,C] (= [N,2i,2j,C]) → [N,2i,2j,4,O]
    (= [N,4i,4j,O]). Input slot (a,b) contributes output packed pixel
    (2i+a, 2j+b) slots (d,e) = W[d,e]ᵀ·x — an einsum plus one slot
    rearrangement of the output."""
    n, i, j, s, c = xp.shape
    y = jnp.einsum("nijsc,ck->nijsk", xp, wm.astype(xp.dtype))
    y = _reshape(y, (n, i, j, 2, 2, 2, 2, o))  # a, b, d, e, o
    y = y.transpose(0, 1, 3, 2, 4, 5, 6, 7)   # n, i, a, j, b, d, e, o
    y = _reshape(y, (n, 2 * i, 2 * j, 4, o))
    y = y + b.astype(y.dtype)
    return _relu(y) if relu else y


def packed_center_crop(skip_p, target_hw, off):
    """Center-crop a packed tensor to (unpacked) target size without ever
    unpacking. Even offsets slice the packed grid directly. Odd offsets are
    a slot-phase shift: output slot (d, e) reads input slot
    ((oh+d) % 2, (ow+e) % 2) at packed offset ((oh+d)//2, (ow+e)//2) —
    four CONTIGUOUS slices and a stack instead of two full-tensor
    transposes (measured faster; the legacy unpack path is kept for A/B)."""
    th, tw = target_hw
    oh, ow = off
    if oh % 2 == 0 and ow % 2 == 0:
        return skip_p[
            :, oh // 2 : oh // 2 + th // 2, ow // 2 : ow // 2 + tw // 2
        ]
    if ODD_CROP_SLOTS:
        slots = []
        for d in range(2):
            for e in range(2):
                src_slot = (2 * ((oh + d) % 2) + ((ow + e) % 2))
                ro = (oh + d) // 2
                co = (ow + e) // 2
                slots.append(
                    skip_p[:, ro : ro + th // 2, co : co + tw // 2,
                           src_slot, :]
                )
        return jnp.stack(slots, axis=3)
    x = unpack2(skip_p)
    x = x[:, oh : oh + th, ow : ow + tw, :]
    return pack2(x)


# ---------------------------------------------------------------- flat layout
# [N, Hp, Wp, 4, C] (slot-major) and [N, Hp, Wp, 4C] are the same memory.
# The forward keeps packed activations FLAT so conv→bias→relu→conv chains
# stay plain NHWC — XLA assigns consistent layouts and fuses the epilogues
# (the 5-D interludes showed up as pure relayout `copy` ops ≈10% of the
# step in the device profile) — and views them 5-D only inside slot ops,
# where the reshape is a free bitcast.


def tile_bias4(b):
    """[O] → [4O] slot-major flat bias."""
    return jnp.tile(b, 4)


def view5(x4, c):
    """[N,hp,wp,4C] → [N,hp,wp,4,C] (bitcast view)."""
    n, hp, wp, _ = x4.shape
    return _reshape(x4, (n, hp, wp, 4, c))


def flat4(x5):
    """[N,hp,wp,4,C] → [N,hp,wp,4C] (bitcast view)."""
    n, hp, wp, s, c = x5.shape
    return _reshape(x5, (n, hp, wp, s * c))


def head_mask_xla(y4, wd, bd):
    """XLA fallback for the fused binary head: uint8 mask
    [N,h,w,S] = (y4 @ wd + bd > 0). wd: [4C, S] block-diagonal per-slot
    difference head (see _head_diff)."""
    hd = jnp.einsum("nhwc,cs->nhws", y4.astype(jnp.float32),
                    wd.astype(jnp.float32))
    return (hd + bd.astype(jnp.float32) > 0).astype(jnp.uint8)


def packed_conv3_flat(x4, w2, b, relu=True, pallas=True, head=None):
    """Flat packed-space 3×3 VALID conv: [N,hp,wp,4C] → [N,hp-1,wp-1,4O].
    Takes the Pallas kernel on single-chip TPU (fused bias+relu, pinned
    layout); XLA conv elsewhere. ``pallas=False`` forces the XLA path
    (training: the Pallas kernels are forward-only, no VJP yet).
    ``head=(wd, bd)``: also return the fused binary-segmentation mask
    (uint8, see nn.pallas.conv.conv2x2_flat)."""
    if pallas and _pallas_conv_ok(x4.shape[-1], w2.shape[-1]) \
            and x4.shape[1] > 2:
        from segmentation_tpu.nn.pallas.conv import conv2x2_flat

        return conv2x2_flat(x4, w2, tile_bias4(b), relu=relu, head=head)
    y = _conv_batch_sharded(x4, w2.astype(x4.dtype), (1, 1))
    y = y + tile_bias4(b).astype(y.dtype)
    y = _relu(y) if relu else y
    if head is not None:
        return y, head_mask_xla(y, *head)
    return y


def packed_conv3_dual_flat(a4, u4, w2a, w2b, b, relu=True, pallas=True):
    """First decoder conv of a packed level: conv(concat(skip, up), W) ==
    conv(skip, W[:C]) + conv(up, W[C:]) — the concat is never materialized
    (saves a full activation round-trip through HBM per level)."""
    if (
        pallas
        and _pallas_conv_ok(a4.shape[-1], w2a.shape[-1])
        and a4.shape[1] > 2
        and a4.shape == u4.shape
    ):
        from segmentation_tpu.nn.pallas.conv import conv2x2_dual_flat

        return conv2x2_dual_flat(a4, u4, w2a, w2b, tile_bias4(b), relu=relu)
    ya = _conv_batch_sharded(a4, w2a.astype(a4.dtype), (1, 1))
    yb = _conv_batch_sharded(u4, w2b.astype(u4.dtype), (1, 1))
    y = ya + yb + tile_bias4(b).astype(ya.dtype)
    return _relu(y) if relu else y


def _pallas_backend_ok() -> bool:
    if _PALLAS_CONV == "0":
        return False
    if os.environ.get("SEG_PALLAS_INTERPRET") == "1":
        return True  # CPU parity tests: kernels run in interpret mode
    try:
        return jax.default_backend() == "tpu" and len(jax.devices()) == 1
    except Exception:
        return False


@jax.custom_vjp
def _s2conv_t(x, w4):
    """Linear 4×4/stride-2 VALID conv with a parity-decomposed dgrad.

    XLA's dgrad for a stride-2 conv dilates the output grad
    (lhs_dilate=2×2), so 3 of every 4 MAC positions multiply structural
    zeros — at 512²/B=128 the conv2_1 input-grad fusion costs 8.36 ms
    (train HLO compare_select_fusion.10). The backward here computes the
    four output-parity classes as dense 2×2 VALID convs over the padded
    grad (each tap subset w4[a::2, b::2] rotated 180°) and interleaves
    them with unpack2 — same FLOPs as the forward instead of 4×.
    Bias/relu stay OUTSIDE so XLA's AD keeps its usual residual choices.
    """
    return _conv_batch_sharded(x, w4, (2, 2))


def _s2conv_t_fwd(x, w4):
    return _s2conv_t(x, w4), (x, w4)


def _s2conv_t_bwd(res, g):
    x, w4 = res
    _, vjp_w = jax.vjp(
        lambda w: _conv_batch_sharded(x, w, (2, 2)), w4
    )
    (gw,) = vjp_w(g)
    # grad_x[2u+a, 2v+b, c] = Σ_{i,j,o} g[u-i, v-j, o]·w4[a+2i, b+2j, c, o]
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = []
    for a in range(2):
        for b in range(2):
            k2 = jnp.swapaxes(w4[a::2, b::2][::-1, ::-1], 2, 3)
            parts.append(_conv_batch_sharded(gp, k2, (1, 1)))
    gx = unpack2(jnp.stack(parts, axis=3))
    return gx, gw


_s2conv_t.defvjp(_s2conv_t_fwd, _s2conv_t_bwd)


def strided_packed_conv3_flat(x, w4, b, relu=True, pallas=True,
                              paired=False):
    """Strided entry conv with FLAT packed output: [N,H,W,C] →
    [N,(H-2)/2,(W-2)/2, 4O]. Zero layout traffic, zero reshapes.
    On single-chip TPU with lane-viable C (>=16): the Pallas strided
    kernel (pair-view happens in-kernel, so the pool->conv boundary needs
    no XLA relayout). Tiny-C entry (C=3, level 1) stays XLA: its natural
    batch-in-lanes layouts are efficient there, and every Pallas-side
    alternative measured worse (an im2col-dot formulation cost ~13 ms in
    relayouts at 512²/B=128 vs ~11 ms for the whole XLA level)."""
    c = (x.shape[-1] // 2) if paired else x.shape[-1]
    o4 = w4.shape[-1]
    if (
        pallas
        and _pallas_backend_ok()
        and o4 % 128 == 0
        and x.shape[1] > 5
        and c >= 16
        and (2 * c) % 64 == 0
        and (paired or x.shape[2] % 2 == 0)
    ):
        from segmentation_tpu.nn.pallas.conv import conv4x4s2_flat

        return conv4x4s2_flat(x, w4, tile_bias4(b), relu=relu,
                              paired=paired)
    if paired:  # un-pair for the XLA conv (correctness fallback)
        n, h, w2, c2 = x.shape
        x = _reshape(x, (n, h, 2 * w2, c2 // 2))
    y = _s2conv_t(x, w4.astype(x.dtype))
    y = y + tile_bias4(b).astype(y.dtype)
    return _relu(y) if relu else y


def packed_pool_flat(x4, c, slices=True):
    """2×2/2 max-pool of a flat packed tensor = slot-max → UNPACKED
    [N, hp, wp, C].

    Two formulations, both measured on v5e at 512²/B=128:
    - ``slices=True``: elementwise max of 4 channel slices of the FLAT
      tensor. Stays 4D end-to-end so XLA keeps the neighboring convs in
      their preferred layouts — best for INFERENCE (-2 ms/step).
    - ``slices=False``: 5-D view + axis reduce — lighter BACKWARD (the
      slice variant's VJP materializes extra mask buffers), ~11% faster
      training steps. UNetS2D (the trainable class) picks this one.
    """
    if not slices:
        return jnp.max(view5(x4, c), axis=3)
    s0 = x4[..., 0 * c : 1 * c]
    s1 = x4[..., 1 * c : 2 * c]
    s2 = x4[..., 2 * c : 3 * c]
    s3 = x4[..., 3 * c : 4 * c]
    return jnp.maximum(jnp.maximum(s0, s1), jnp.maximum(s2, s3))


def _pool4_max_flat(x4):
    c = x4.shape[-1] // 4
    s0 = x4[..., 0 * c : 1 * c]
    s1 = x4[..., 1 * c : 2 * c]
    s2 = x4[..., 2 * c : 3 * c]
    s3 = x4[..., 3 * c : 4 * c]
    return jnp.maximum(jnp.maximum(s0, s1), jnp.maximum(s2, s3))


@jax.custom_vjp
def pool4_select(x4):
    """2×2/2 max-pool of a FLAT packed tensor with an ARGMAX-INDEX custom
    VJP. The default reduce-formulated pool's backward materializes 5-D
    mask buffers and a ~23 ms scatter chain at 512²/B=128; the round-3
    select-VJP (save x4, recompute the max, cumulative first-hit masks)
    still cost ~30 ms/step in and/select fusions. This version computes
    the winning slot index IN THE FORWARD (3 compare/selects, int8) and
    saves ONLY that [.., C] index plane — the backward broadcasts g
    against a [.., 4, C] slot-index compare and reshapes the result
    straight into the flat [.., 4C] cotangent (one fused select-write,
    no concat — see _pool4_bwd). Same deterministic tie-break (first
    slot attaining the max), 8× smaller residual than saving x4 (the
    buffer that blocked B≥160 compiles)."""
    return _pool4_max_flat(x4)


def _pool4_argmax(x4):
    c = x4.shape[-1] // 4
    y = x4[..., 0:c]
    idx = jnp.zeros(y.shape, jnp.int8)
    for si in range(1, 4):
        sl = x4[..., si * c : (si + 1) * c]
        win = sl > y
        y = jnp.maximum(y, sl)
        idx = jnp.where(win, jnp.int8(si), idx)
    return y, idx


def _pool4_fwd(x4):
    y, idx = _pool4_argmax(x4)
    return y, idx


def _pool4_bwd(idx, g):
    # Broadcast-compare form, NOT a channel concat: XLA lowers a 4-way
    # concatenate as pad+iota-select+maximum chains (4+ full-size passes;
    # the level-2 junction fusion cost 7.3 ms/step at 512²/B=128). The
    # [.., 4, c] broadcast writes each output element once and the final
    # flat reshape is layout-free.
    n, hp, wp, c = g.shape
    sl = jnp.arange(4, dtype=jnp.int8).reshape(1, 1, 1, 4, 1)
    d5 = jnp.where(idx[..., None, :] == sl, g[..., None, :], 0)
    return (_reshape(d5, (n, hp, wp, 4 * c)),)


pool4_select.defvjp(_pool4_fwd, _pool4_bwd)


def deconv2_as_matmul_flat(x, wm, b, o, relu=True, pallas=True):
    """2×2/2 transposed conv, unpacked input → FLAT packed output."""
    if (
        pallas
        and _pallas_backend_ok()
        and x.shape[-1] % 128 == 0
        and wm.shape[-1] % 128 == 0
    ):
        from segmentation_tpu.nn.pallas.conv import matmul_rows_flat

        return matmul_rows_flat(x, wm, tile_bias4(b), relu=relu)
    y = jnp.einsum("nijc,ck->nijk", x, wm.astype(x.dtype))
    y = y + tile_bias4(b).astype(y.dtype)
    return _relu(y) if relu else y


def deconv2_packed_in_flat(x4, wm, b, o, relu=True, pallas=True):
    """2×2/2 transposed conv, FLAT packed input → FLAT packed output (one
    slot rearrangement of the einsum result; Pallas masked-slot kernel on
    single-chip TPU — the XLA 8-D transpose costs ~5 ms in relayouts)."""
    if (
        pallas
        and _pallas_backend_ok()
        and x4.shape[-1] % 128 == 0
        and wm.shape[-1] % 128 == 0
        and x4.shape[1] > 2
    ):
        from segmentation_tpu.nn.pallas.conv import deconv_packed_flat

        return deconv_packed_flat(x4, wm, tile_bias4(b), relu=relu)
    n, i, j, c4 = x4.shape
    # Unpack-then-matmul: with an UNPACKED input each pixel maps to one
    # packed output row, so the einsum emits the FLAT packed output
    # directly — no 8-D slot transpose. The old einsum-on-slots form
    # needed a [n,i,2,j,2,2,2,o] transpose whose fwd+bwd copies cost
    # 5.3 ms/step at 512²/B=128 (train HLO: copy.321/copy.328); the
    # unpack here moves the same rearrangement onto the 2× smaller
    # INPUT tensor (~2.6 ms fwd+bwd). Bitwise-identical output.
    x = unpack2(view5(x4, c4 // 4))
    y = jnp.einsum("nijc,ck->nijk", x, wm.astype(x4.dtype))
    y = y + tile_bias4(b).astype(y.dtype)
    return _relu(y) if relu else y


def packed_center_crop_flat(x4, c, target_hw, off):
    """Center-crop a FLAT packed tensor to (unpacked) target size. Even
    offsets are plain row/col slices of the flat tensor; odd offsets are the
    slot-phase shift (four contiguous 5-D-view slices + stack)."""
    th, tw = target_hw
    oh, ow = off
    if oh % 2 == 0 and ow % 2 == 0:
        return x4[
            :, oh // 2 : oh // 2 + th // 2, ow // 2 : ow // 2 + tw // 2
        ]
    x5 = view5(x4, c)
    slots = []
    for d in range(2):
        for e in range(2):
            src_slot = 2 * ((oh + d) % 2) + ((ow + e) % 2)
            ro = (oh + d) // 2
            co = (ow + e) // 2
            slots.append(
                x5[:, ro : ro + th // 2, co : co + tw // 2, src_slot, :]
            )
    return flat4(jnp.stack(slots, axis=3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _crop_flat_odd_t(x4, c, target_hw, off):
    """Odd-offset (slot-phase) packed crop with a flat-4D backward.

    XLA's AD of the 5-D slot-phase slice/stack round-trips layout copies
    on the backward (train HLO copy.313/copy.338, 6.2 ms/step at
    512²/B=128); this VJP builds the un-crop directly in the flat 4-D
    layout — 4 pads + a channel concat that fuse into the downstream
    grad junction. NO optimization_barrier: measured (r4), a barrier
    here splits the junction into a materialized copy + a 10.4 ms kLoop
    pass; letting XLA fuse freely is faster. Even offsets keep plain
    slice AD — its backward pad merges into the producing dgrad conv's
    window, and that "wasteful" full-size dgrad fuses the whole junction
    epilogue (pads/adds/selects/bias reduce) into the conv's epilogue,
    which beats the split form end-to-end."""
    return packed_center_crop_flat(x4, c, target_hw, off)


def _crop_flat_odd_t_fwd(x4, c, target_hw, off):
    return packed_center_crop_flat(x4, c, target_hw, off), (
        x4.shape[1], x4.shape[2]
    )


def _crop_flat_odd_t_bwd(c, target_hw, off, res, g):
    hp, wp = res
    th, tw = target_hw
    oh, ow = off
    # Forward sends src slot 2·((oh+d)%2)+((ow+e)%2) to dst slot (d, e)
    # from packed rows [ro, ro+th/2) — each SRC slot receives exactly one
    # dst slot's grad at the inverse placement. Built as 4 static-slice
    # updates into a zeroed 5-D [n,hp,wp,4,c] view (then a layout-free
    # flat reshape), NOT pad+concat: XLA lowers a channel concatenate as
    # full-size pad+iota-select+maximum chains, 4+ passes over the big
    # junction tensor (7.3 ms level-2 junction fusion at 512²/B=128).
    n = g.shape[0]
    th2, tw2 = th // 2, tw // 2
    g5 = _reshape(g, (n, th2, tw2, 4, c))
    z = jnp.zeros((n, hp, wp, 4, c), g.dtype)
    for sa in range(2):
        for sb in range(2):
            d = (sa - oh) % 2
            e = (sb - ow) % 2
            dst = 2 * d + e
            ro = (oh + d) // 2
            co = (ow + e) // 2
            z = z.at[:, ro:ro + th2, co:co + tw2, 2 * sa + sb, :].set(
                g5[:, :, :, dst, :]
            )
    return (_reshape(z, (n, hp, wp, 4 * c)),)


_crop_flat_odd_t.defvjp(_crop_flat_odd_t_fwd, _crop_flat_odd_t_bwd)


def crop_flat_t(x4, c, target_hw, off):
    """Trainable packed center-crop: flat-4D custom backward for odd
    (slot-phase) offsets, plain slice AD for even offsets (see
    _crop_flat_odd_t for the measured rationale)."""
    if off[0] % 2 == 0 and off[1] % 2 == 0:
        return packed_center_crop_flat(x4, c, target_hw, off)
    return _crop_flat_odd_t(x4, c, target_hw, off)


# ----------------------------------------------------------- padded-flat
# The padded-flat serving region (nn/pallas/conv_flat.py): packed
# activations live as 3-D [N, HP·S, 4C] where each packed row occupies S
# flat rows (S = width rounded to the sublane tile). Every kernel's block
# is then one contiguous aligned window — no scratch fills, no per-row
# stores (measured −2 ms on c1_2+pool, −2.1 ms on the c9_1 dual at
# 512²/B=128 vs the 4-D flat kernels; benchmarks/padflat_bench.py).


class PadFlat:
    """Padded-flat packed tensor: ``x`` is [N, HP·S, C]; real geometry is
    ``h`` packed rows × ``w`` packed cols at flat row stride ``s``
    (columns w..s-1 and rows beyond h hold finite junk). ``shape``/
    ``dtype`` present the logical 4-D view so shared gating code works on
    either representation."""

    __slots__ = ("x", "h", "w", "s")

    def __init__(self, x, h: int, w: int, s: int):
        self.x, self.h, self.w, self.s = x, h, w, s

    @property
    def shape(self):
        return (self.x.shape[0], self.h, self.w, self.x.shape[-1])

    @property
    def dtype(self):
        return self.x.dtype


jax.tree_util.register_pytree_node(
    PadFlat,
    lambda pf: ((pf.x,), (pf.h, pf.w, pf.s)),
    lambda aux, ch: PadFlat(ch[0], *aux),
)


def _pf_stride(w: int, tile: int) -> int:
    return -(-w // tile) * tile


class PF2:
    """Paired-column padded-flat tensor (the level-1 fast path): ``x``
    is [N, HP·S2, 2C] — column pair (2j, 2j+1) in lane halves at pair
    stride ``s2``; real geometry ``h`` packed rows × ``w`` packed cols.
    See nn/pallas/conv_flat.py 'pf2 layout'."""

    __slots__ = ("x", "h", "w", "s2")

    def __init__(self, x, h: int, w: int, s2: int):
        self.x, self.h, self.w, self.s2 = x, h, w, s2

    @property
    def shape(self):
        return (self.x.shape[0], self.h, self.w, self.x.shape[-1] // 2)

    @property
    def dtype(self):
        return self.x.dtype


jax.tree_util.register_pytree_node(
    PF2,
    lambda pf: ((pf.x,), (pf.h, pf.w, pf.s2)),
    lambda aux, ch: PF2(ch[0], *aux),
)


def pf2_from4(x4, tile: int, s2: "int | None" = None) -> PF2:
    from segmentation_tpu.nn.pallas.conv_flat import pad_pairs

    n, h, w, c = x4.shape
    s2 = s2 or _pf_stride((w + 1) // 2, tile)
    return PF2(pad_pairs(x4, s2), h, w, s2)


def pf2_to4(pf: PF2):
    from segmentation_tpu.nn.pallas.conv_flat import unpad_pairs

    return unpad_pairs(pf.x, pf.s2, pf.h, pf.w)


def pf_from4(x4, tile: int, s: "int | None" = None) -> PadFlat:
    """[N, H, W, C] → PadFlat (one fused XLA pad+reshape copy)."""
    from segmentation_tpu.nn.pallas.conv_flat import pad_rows

    n, h, w, c = x4.shape
    s = s or _pf_stride(w, tile)
    return PadFlat(pad_rows(x4, s), h, w, s)


def pf_to4(pf: PadFlat):
    """PadFlat → real [N, h, w, C] window (one XLA slice copy)."""
    from segmentation_tpu.nn.pallas.conv_flat import unpad_rows

    return unpad_rows(pf.x, pf.s, pf.h, pf.w)


def _mc_drop(h, key, rate: float):
    """Explicit-key MC-dropout on a plain 4-D tensor or a PadFlat/PF2
    flat tensor — the fast-serving analog of nn.layers.dropout with
    ``deterministic=False`` (Kendall & Gal posterior sampling, reference
    examples/inference.py:31-38). Masks are iid Bernoulli per activation
    element, so the estimator is identical to the standard path's; masking
    a flat tensor's junk columns too is harmless (they never re-enter the
    real geometry)."""
    if isinstance(h, PadFlat):
        return PadFlat(_mc_drop(h.x, key, rate), h.h, h.w, h.s)
    if isinstance(h, PF2):
        return PF2(_mc_drop(h.x, key, rate), h.h, h.w, h.s2)
    if rate <= 0.0:
        return h
    if h.dtype == jnp.int8:
        # would need the 1/keep factor folded into the consumer's act
        # scale; no current config quantizes either MC site (see
        # models/unet_int8._out_scale_of) — fail loud if one appears
        raise NotImplementedError(
            "MC-dropout site landed on an int8-resident tensor"
        )
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, h.shape)
    return jnp.where(
        mask, h * jnp.asarray(1.0 / keep, h.dtype), jnp.zeros((), h.dtype)
    )


def pf_pair(pf: PadFlat, tile: int) -> PadFlat:
    """Column-paired handoff for the next strided entry conv: pair
    (2j, 2j+1) → one 2C row.

    The flat-tensor reshape [N, M, C] → [N, M/2, 2C] is the logical
    pairing, but on TPU a narrow-lane (C=32) tiled tensor makes it TWO
    relayout copies (measured 6.6 ms at 512²/B=128 — and the 4-D
    unpad/pair/re-pad route is WORSE, 11.3 ms in four ops; narrow-lane
    relayouts are unsalvageable in XLA). The real fix is the pf2 layout,
    where the pool kernel emits the pair directly; this helper remains
    for the non-pf2 fallback path."""
    n, hps, c = pf.x.shape
    if pf.s % (2 * tile) == 0:
        return PadFlat(
            _reshape(pf.x, (n, hps // 2, 2 * c)), pf.h, pf.w // 2,
            pf.s // 2,
        )
    x4 = pf_to4(pf)
    w2 = pf.w // 2
    x4 = _reshape(x4[:, :, : 2 * w2, :], (n, pf.h, w2, 2 * c))
    return pf_from4(x4, tile)


def _maxpool2(h):
    """2×2/2 max pool on a std-layout tensor; init respects int8-resident
    activations (max pool commutes with the positive per-tensor scale, so
    pooling the int8 codes is exact)."""
    init = (jnp.asarray(-128, h.dtype) if h.dtype == jnp.int8
            else -jnp.inf)
    return lax.reduce_window(
        h, init, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


# ------------------------------------------------------------------ forward
@dataclasses.dataclass
class UNetS2DInference:
    """Inference over standard UNet params (segmentation_tpu.models.unet
    names) in the packed layout. Requires even input H/W (512 qualifies);
    levels 1-2 run packed (C = k, 2k), deeper levels standard (C ≥ 128 is
    already lane-aligned; packing there would only pay the 1.78× FLOP tax);
    the last two decoder up-blocks run packed again.

    Subclasses (e.g. the int8 path) override the _strided_conv /
    _packed_conv / _std_conv hooks; the forward topology lives only here.
    """

    cfg: ModelConfig
    levels: int = 4
    # Optional elementwise stochastic hook applied at the two MC-dropout
    # sites of the standard UNet (bottleneck + decoder end). Dropout is
    # elementwise, so applying it in packed layout draws an iid mask of the
    # same rate over the same activations — the Kendall&Gal mechanism is
    # preserved while keeping the fast layout (set by UNetS2D when
    # cfg.bayesian; None = deterministic serving).
    dropout_fn: "object" = None
    # Pool formulation: lane-sliced (inference winner) vs 5-D reduce
    # (training winner) — see packed_pool_flat. pool_select_vjp switches
    # the trainable path to the flat select-based custom-VJP pool.
    pool_slices: bool = True
    pool_select_vjp: bool = False
    # Pallas conv kernels for the packed sites (inference-only: no VJP).
    # UNetS2D (the trainable wrapper) sets this False.
    allow_pallas: bool = True
    # Padded-flat packed region (conv_flat kernels; see PadFlat/PF2).
    # Default ON — with the pf2 level-1 layout it wins end-to-end for
    # both dtypes at 512²/B=128 (int8 59.5 vs 67.9 ms on the 4-D
    # kernels; bf16 82.2 vs 84.9 XLA; fresh-process, benchmarks/
    # padflat_wall.py). The _pf_supported gate falls back to the 4-D
    # path off-TPU, for unsupported geometry, under dropout, and during
    # calibration.
    padflat: bool = True
    # Trainable-Pallas dispatch (nn.pallas.train): the 4-D forward runs
    # the serving kernels wrapped in custom_vjp (Pallas forward, XLA
    # backward). Set by UNetS2D; mutually exclusive with allow_pallas
    # (which enables the inference-only fusions that carry no VJP).
    pallas_vjp: bool = False

    # How many encoder/decoder levels ride the packed Pallas region
    # (the rest take the std XLA path). None = the measured default.
    pack_levels: "object" = None

    @property
    def packed_levels(self) -> int:
        if self.pack_levels is not None:
            return min(int(self.pack_levels), self.levels)
        return min(2, self.levels)

    # ---- conv-site hooks (overridden by quantized subclasses) ------------
    # Packed activations are FLAT [N, hp, wp, 4C] at every hook boundary.
    def _strided_conv(self, p, name, h, relu=True, paired=False):
        w4 = p[f"{name}/w4"]
        if (
            self.pallas_vjp
            and not paired
            and w4.shape[-1] % 128 == 0
            and h.shape[-1] >= 16
            and (2 * h.shape[-1]) % 64 == 0
            and h.shape[1] > 5
            and h.shape[2] % 2 == 0
            and _train_backend_ok()
        ):
            from segmentation_tpu.nn.pallas.train import conv4x4s2_t

            return conv4x4s2_t(h, w4, tile_bias4(p[f"{name}/b"]), relu)
        return strided_packed_conv3_flat(
            h, w4, p[f"{name}/b"], relu, self.allow_pallas, paired,
        )

    def _packed_conv(self, p, name, x4, relu=True, head=None):
        w2 = p[f"{name}/w2"]
        if (
            self.pallas_vjp
            and head is None
            and x4.shape[1] > 2
            and _train_vjp_ok(x4.shape[-1], w2.shape[-1])
        ):
            from segmentation_tpu.nn.pallas.train import conv2x2_t

            return conv2x2_t(x4, w2, tile_bias4(p[f"{name}/b"]), relu)
        return packed_conv3_flat(
            x4, w2, p[f"{name}/b"], relu, self.allow_pallas,
            head=head,
        )

    def _packed_conv_dual(self, p, name, skip4, up4, relu=True,
                          a_offset=(0, 0), a_slot_phase=None):
        if (
            self.pallas_vjp
            and a_offset == (0, 0)
            and a_slot_phase is None
            and skip4.shape == up4.shape
            and up4.shape[1] > 2
            and _train_vjp_ok(up4.shape[-1], p[f"{name}/w2a"].shape[-1])
        ):
            from segmentation_tpu.nn.pallas.train import conv2x2_dual_t

            return conv2x2_dual_t(
                skip4, up4, p[f"{name}/w2a"], p[f"{name}/w2b"],
                tile_bias4(p[f"{name}/b"]), relu,
            )
        if a_offset != (0, 0) or a_slot_phase is not None:
            # crop-fold path: only reached when _dual_can_fold_crop said
            # the Pallas kernel will engage — the skip center-crop rides
            # the kernel's index maps instead of materializing a slice
            from segmentation_tpu.nn.pallas.conv import conv2x2_dual_flat

            return conv2x2_dual_flat(
                skip4, up4, p[f"{name}/w2a"], p[f"{name}/w2b"],
                tile_bias4(p[f"{name}/b"]), relu=relu,
                a_offset=a_offset, a_slot_phase=a_slot_phase,
            )
        return packed_conv3_dual_flat(
            skip4, up4, p[f"{name}/w2a"], p[f"{name}/w2b"], p[f"{name}/b"],
            relu, self.allow_pallas,
        )

    def _dual_can_fold_crop(self, p, name, skip4, up4) -> bool:
        """True when the skip center-crop can ride the dual kernel's
        index maps instead of materializing a sliced copy."""
        return (
            self.allow_pallas
            and _pallas_conv_ok(up4.shape[-1], p[f"{name}/w2a"].shape[-1])
            and up4.shape[1] > 2
        )

    def _pairs_ok(self) -> bool:
        """Paired pool handoff is only legal when the packed-level hooks
        are ones that understand it (the base set, or a subclass that
        opts in by overriding this)."""
        return (
            type(self)._packed_conv is UNetS2DInference._packed_conv
            and type(self)._strided_conv is UNetS2DInference._strided_conv
        )

    def _packed_conv_pool(self, p, name, x4, width, relu=True,
                          pallas=True, pool_pairs=False):
        """Second encoder conv of a packed level + the 2×2/2 pool, fused
        into one Pallas kernel when available (a standalone pool on the
        packed conv output costs a full extra HBM pass — measured
        14.9 ms on level 1 at 512²/B=128). Returns (conv_out, pooled).
        Subclasses with custom conv hooks (int8) keep the two-op path."""
        if (
            pallas
            and self.allow_pallas
            and type(self)._packed_conv is UNetS2DInference._packed_conv
            and _pallas_conv_ok(x4.shape[-1], p[f"{name}/w2"].shape[-1])
            and x4.shape[1] > 2
        ):
            from segmentation_tpu.nn.pallas.conv import conv2x2_pool_flat

            return conv2x2_pool_flat(
                x4, p[f"{name}/w2"], tile_bias4(p[f"{name}/b"]), relu=relu,
                pool_pairs=pool_pairs,
            )
        if (type(self)._packed_conv is UNetS2DInference._packed_conv
                and not self.pallas_vjp):
            # honor the per-level gate in the fallback too (a Pallas conv
            # here with an XLA pool re-creates the standalone-pool pass)
            h4 = packed_conv3_flat(
                x4, p[f"{name}/w2"], p[f"{name}/b"], relu,
                pallas and self.allow_pallas,
            )
        else:
            h4 = self._packed_conv(p, name, x4, relu)
        if self.pool_select_vjp:
            pooled = pool4_select(h4)
        else:
            pooled = packed_pool_flat(h4, width, self.pool_slices)
        if pool_pairs:
            n, hp, wp, cc = pooled.shape
            pooled = _reshape(pooled, (n, hp, wp // 2, 2 * cc))
        return h4, pooled

    def _std_conv(self, p, name, h, relu=True):
        y = _conv_batch_sharded(h, p[f"{name}/w"].astype(h.dtype), (1, 1))
        y = y + p[f"{name}/b"].astype(y.dtype)
        return _relu(y) if relu else y

    def _std_dual_conv(self, p, name, sk, up, relu=True):
        """Decoder std conv over the (cropped-skip, upsampled) pair.

        Base path is the reference's crop-and-concat conv
        (/root/reference/models/unet.py:138-162), computed as a
        split-weight SUM — conv(concat(a,b), w) == conv(a, w[:, :, :c])
        + conv(b, w[:, :, c:]) — so the concatenated activation is never
        materialized (XLA lowers a channel concat as full-size
        pad+select+maximum passes) and its backward is two direct dgrads
        instead of slices of one. The int8 subclass does the same split
        so each operand keeps its own scale.

        Both halves run in the PROMOTED dtype of (sk, up) — the concat
        form promoted silently, and the split form must keep that
        contract even though every current call site passes matching
        dtypes (the int8 subclass dequantizes sk before super())."""
        dt = jnp.promote_types(sk.dtype, up.dtype)
        sk, up = sk.astype(dt), up.astype(dt)
        w = p[f"{name}/w"].astype(dt)
        ci = sk.shape[-1]
        ya = _conv_batch_sharded(sk, w[:, :, :ci], (1, 1))
        yb = _conv_batch_sharded(up, w[:, :, ci:], (1, 1))
        y = ya + yb + p[f"{name}/b"].astype(ya.dtype)
        return _relu(y) if relu else y

    # ---- padded-flat serving hooks ---------------------------------------
    # The packed region can run entirely on the conv_flat kernels with
    # activations resident in the PadFlat layout. The int8 subclass
    # overrides these with quantized dispatches; geometry bookkeeping
    # lives in _apply_padflat only.
    def _pf_tile(self) -> int:
        return 8  # bf16/f32 sublane tile; int8 region uses 32

    def _pf_ready(self, p) -> bool:
        return True  # int8: calibrated scales present at every site

    def _pf_entry_chain(self, p, c1, c2, x):
        """Fused level-1 chain hook — the int8 subclass runs
        c1_1+c1_2+pool as one kernel (conv_flat.entry_chain_pf2). The
        bf16 path keeps the two-kernel form (no requant point at which
        to hold the intermediate in int8 VMEM cheaply)."""
        return None

    def _pf_supported(self, p, x) -> bool:
        k4 = 4 * self.cfg.n_kernels
        on = self.padflat if isinstance(self.padflat, bool) else True
        return (
            on
            and self.packed_levels > 0
            and self.allow_pallas
            and _pallas_backend_ok()
            and self.dropout_fn is None
            and getattr(self, "_calibrating", None) is None
            and k4 % 128 == 0
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
            and min(x.shape[1], x.shape[2]) >= 24
            and self._pf_ready(p)
        )

    def _pf_entry(self, p, name_next, h4, pf2: bool = False):
        """Region entry: the XLA entry conv's 4-D flat packed output →
        PadFlat/PF2 (int8 subclass quantizes here at the consumer's
        scale)."""
        if pf2:
            return pf2_from4(h4, self._pf_tile())
        return pf_from4(h4, self._pf_tile())

    def _pf_entry_conv(self, p, name, x, tile):
        """lvl-0 entry conv (XLA, C=3) with the output right-padded to
        the flat stride: VALID 4×4/2 plus (0, pad) edge zeros so out
        W == S — the junk columns are conv-of-zeros (finite) and
        pad_rows becomes a pure reshape, saving a full pad pass over the
        region's biggest tensor (~3.1 ms at 512²/B=128). Returns
        (h4, real_w)."""
        n, H, W, _ = x.shape
        w_out = (W - 2) // 2
        s = _pf_stride(w_out, tile)
        pw = 2 * (s - w_out)
        if pw > 16:  # too much junk conv compute; pad_rows instead
            return self._strided_conv(p, name, x), w_out
        y = lax.conv_general_dilated(
            x, p[f"{name}/w4"].astype(x.dtype), (2, 2),
            [(0, 0), (0, pw)], dimension_numbers=_DN,
        )
        y = y + tile_bias4(p[f"{name}/b"]).astype(y.dtype)
        return _relu(y), w_out

    def _pf_entry_fused(self, p, name, x):
        """One-kernel pf2 entry (3×3 conv + s2d fold fused, bf16): no
        XLA conv, no relayout copy of the region's biggest tensor; None
        = use the two-step XLA entry. The int8 subclass adds the requant
        epilogue (conv_flat.conv3entry_pf2 modes)."""
        from segmentation_tpu.nn.pallas import conv_flat as cf

        w = x.shape[2]
        if (
            f"{name}/we" not in p
            or not self.allow_pallas
            or not _pallas_backend_ok()
            or os.environ.get("SEG_TPU_FUSED_ENTRY", "1") == "0"
            or w % 4
            or (w // 4) % 32
        ):
            return None
        xt = cf.entry_transform_pf2(x)  # keeps the caller's dtype
        y = cf.conv3entry_pf2(
            xt, p[f"{name}/we"], p[f"{name}/wh"], p[f"{name}/wl"],
            tile_bias4(p[f"{name}/b"]), h_img=x.shape[1],
        )
        return PF2(y, (x.shape[1] - 2) // 2, (w - 2) // 2, w // 4)

    def _pf_conv_pool(self, p, name, pf, relu=True):
        from segmentation_tpu.nn.pallas import conv_flat as cf

        if isinstance(pf, PF2):
            y, pooled = cf.conv2x2_pf2(
                pf.x, p[f"{name}/w2"], tile_bias4(p[f"{name}/b"]),
                h=pf.h, w_real=pf.w, s2=pf.s2, relu=relu, pool=True,
                r_block=32 if pf.h > 64 else None,
            )
            # the pooled pf2 tensor IS the column-paired PadFlat handoff
            return (PF2(y, pf.h - 1, pf.w - 1, pf.s2),
                    PadFlat(pooled, pf.h - 1, (pf.w - 1) // 2, pf.s2))
        y, pooled = cf.conv2x2_padflat(
            pf.x, p[f"{name}/w2"], tile_bias4(p[f"{name}/b"]),
            h=pf.h, w_real=pf.w, s=pf.s, relu=relu, pool=True,
        )
        g = PadFlat(y, pf.h - 1, pf.w - 1, pf.s)
        return g, PadFlat(pooled, pf.h - 1, pf.w - 1, pf.s)

    def _pf_strided(self, p, name, pfp: PadFlat, relu=True) -> PadFlat:
        from segmentation_tpu.nn.pallas import conv_flat as cf

        y = cf.conv4x4s2_padflat(
            pfp.x, p[f"{name}/w4"], tile_bias4(p[f"{name}/b"]),
            h=pfp.h, w2_real=pfp.w, s2=pfp.s, relu=relu,
        )
        return PadFlat(y, (pfp.h - 2) // 2, pfp.w - 1, pfp.s)

    def _pf_conv(self, p, name, pf, relu=True, head=None,
                 head_only=False):
        from segmentation_tpu.nn.pallas import conv_flat as cf

        if isinstance(pf, PF2):
            out = cf.conv2x2_pf2(
                pf.x, p[f"{name}/w2"], tile_bias4(p[f"{name}/b"]),
                h=pf.h, w_real=pf.w, s2=pf.s2, relu=relu, head=head,
                head_only=head_only,
            )
            mk = lambda v: PF2(v, pf.h - 1, pf.w - 1, pf.s2)
            if head is None or head_only:
                return mk(out)
            return mk(out[0]), mk(out[1])
        out = cf.conv2x2_padflat(
            pf.x, p[f"{name}/w2"], tile_bias4(p[f"{name}/b"]),
            h=pf.h, w_real=pf.w, s=pf.s, relu=relu, head=head,
            head_only=head_only,
        )
        if head is None:
            return PadFlat(out, pf.h - 1, pf.w - 1, pf.s)
        if head_only:
            return PadFlat(out, pf.h - 1, pf.w - 1, pf.s)
        y, mask = out
        return (PadFlat(y, pf.h - 1, pf.w - 1, pf.s),
                PadFlat(mask, pf.h - 1, pf.w - 1, pf.s))

    def _pf_dual(self, p, name, sk, up, relu=True,
                 a_offset=(0, 0), a_slot_phase=None):
        from segmentation_tpu.nn.pallas import conv_flat as cf

        if isinstance(up, PF2):
            assert a_slot_phase is None, "pf2 dual needs slot-even crops"
            y = cf.conv2x2_dual_pf2(
                sk.x, up.x, p[f"{name}/w2a"], p[f"{name}/w2b"],
                tile_bias4(p[f"{name}/b"]), h=up.h, w_real=up.w,
                s2=up.s2, s2_a=sk.s2, hp_a=sk.x.shape[1] // sk.s2,
                relu=relu, a_row_off=a_offset[0], a_col_off=a_offset[1],
            )
            return PF2(y, up.h - 1, up.w - 1, up.s2)
        y = cf.conv2x2_dual_padflat(
            sk.x, up.x, p[f"{name}/w2a"], p[f"{name}/w2b"],
            tile_bias4(p[f"{name}/b"]), h=up.h, w_real=up.w, s=up.s,
            s_a=sk.s, hp_a=sk.x.shape[1] // sk.s, relu=relu,
            a_offset=a_offset, a_slot_phase=a_slot_phase,
            # NO r=32 pin here: the int8 path's measured c8_1 win
            # (unet_int8.py) doubles per-row VMEM at bf16 and blows the
            # 16MB scoped limit (23.28M observed at compile) — _fit_r's
            # byte model underestimates the dual's actual footprint by
            # ~1.4x, so the bf16 site keeps the ragged-safe _auto_r
        )
        return PadFlat(y, up.h - 1, up.w - 1, up.s)

    # 4-D-path deconv hooks (the int8 subclass records calibration here
    # and dequantizes resident inputs hitting this float fallback)
    def _deconv4_matmul(self, p, up, h, width):
        wm = p[f"{up}/wm"]
        if self.pallas_vjp and _train_vjp_ok(h.shape[-1], wm.shape[-1]):
            from segmentation_tpu.nn.pallas.train import matmul_rows_t

            return matmul_rows_t(h, wm, tile_bias4(p[f"{up}/b"]), True)
        return deconv2_as_matmul_flat(
            h, wm, p[f"{up}/b"], width, pallas=self.allow_pallas,
        )

    def _deconv4_packed(self, p, up, h, width):
        wm = p[f"{up}/wm"]
        if (
            self.pallas_vjp
            and h.shape[1] > 2
            and _train_vjp_ok(h.shape[-1], wm.shape[-1])
        ):
            from segmentation_tpu.nn.pallas.train import deconv_packed_t

            return deconv_packed_t(h, wm, tile_bias4(p[f"{up}/b"]), True)
        return deconv2_packed_in_flat(
            h, wm, p[f"{up}/b"], width, pallas=self.allow_pallas,
        )

    def _pf_deconv_matmul(self, p, up, h4, width) -> PadFlat:
        """2×2/2 transposed conv, std 4-D input → PadFlat packed."""
        from segmentation_tpu.nn.pallas import conv_flat as cf

        pf = pf_from4(h4, self._pf_tile())
        y = cf.matmul_rows_padflat(
            pf.x, p[f"{up}/wm"], tile_bias4(p[f"{up}/b"]), relu=True,
        )
        return PadFlat(y, pf.h, pf.w, pf.s)

    def _pf_deconv_packed(self, p, up, pf: PadFlat, width,
                          pf2_out: bool = False):
        from segmentation_tpu.nn.pallas import conv_flat as cf

        if pf2_out:
            y = cf.deconv_packed_padflat(
                pf.x, p[f"{up}/wm"], tile_bias4(p[f"{up}/b"]),
                i_in=pf.h, j_in=pf.w, s_i=pf.s, relu=True, pf2_out=True,
            )
            return PF2(y, 2 * pf.h, 2 * pf.w, pf.s)
        s_out = _pf_stride(2 * pf.w, self._pf_tile())
        y = cf.deconv_packed_padflat(
            pf.x, p[f"{up}/wm"], tile_bias4(p[f"{up}/b"]), i_in=pf.h,
            j_in=pf.w, s_i=pf.s, s_out=s_out, relu=True,
        )
        return PadFlat(y, 2 * pf.h, 2 * pf.w, s_out)

    def _pf2_ok(self, x) -> bool:
        """Level-1 pf2 layout gate: needs two packed levels, a slot-even
        lvl-0 decoder crop (h1, w1 odd ⇒ the skip/up offset is even in
        unpacked units), and the stride-padded entry trick (so the entry
        pair reshape is free)."""
        if self.packed_levels < 2:
            return False
        t = self._pf_tile()
        h1, w1 = (x.shape[1] - 2) // 2, (x.shape[2] - 2) // 2
        if h1 % 2 == 0 or w1 % 2 == 0:
            return False
        s = _pf_stride(w1, t)
        return s % (2 * t) == 0 and 2 * (s - w1) <= 16

    def _apply_padflat(self, p, x, packed_out=False, head=None,
                       mc_keys=None):
        """The apply() topology with the packed region resident in the
        PadFlat layout end-to-end — and level 1 in the paired-column PF2
        layout when the geometry allows (kernel parity:
        tests/test_conv_flat.py; model parity: tests/test_unet_padflat.py)."""
        k = self.cfg.n_kernels
        L, pl_ = self.levels, self.packed_levels
        t = self._pf_tile()
        use_pf2 = self._pf2_ok(x)

        # ---- encoder: packed levels --------------------------------------
        skips: list = []
        pfp = None
        for lvl in range(pl_):
            c1, c2 = f"conv{lvl + 1}_1", f"conv{lvl + 1}_2"
            conv_pool = None
            if lvl == 0:
                # int8 hook: whole level 1 (c1_1+c1_2+pool) as ONE
                # kernel with the c1_1 tensor VMEM-resident
                conv_pool = (self._pf_entry_chain(p, c1, c2, x)
                             if use_pf2 else None)
                if conv_pool is None:
                    pf = (self._pf_entry_fused(p, c1, x) if use_pf2
                          else None)
                    if pf is None:
                        h4, w_real = self._pf_entry_conv(p, c1, x, t)
                        pf = self._pf_entry(p, c2, h4, pf2=use_pf2)
                        if pf.w != w_real:  # stride-padded entry: fix
                            pf = (PF2(pf.x, pf.h, w_real, pf.s2)
                                  if use_pf2
                                  else PadFlat(pf.x, pf.h, w_real, pf.s))
            else:
                pf = self._pf_strided(p, c1, pfp)
            if conv_pool is None:
                conv_pool = self._pf_conv_pool(p, c2, pf)
            conv_pf, pool_pf = conv_pool
            skips.append(conv_pf)
            if lvl + 1 < pl_:
                # the PF2 conv+pool emits the column-paired handoff
                # directly; the plain path pays the pair reshape
                pfp = (pool_pf if isinstance(conv_pf, PF2)
                       else pf_pair(pool_pf, t))
            else:
                h = pf_to4(pool_pf)  # region exit → std levels

        # ---- encoder: standard levels + bottleneck -----------------------
        for lvl in range(pl_, L):
            h = self._std_conv(p, f"conv{lvl + 1}_1", h)
            h = self._std_conv(p, f"conv{lvl + 1}_2", h)
            skips.append(h)
            h = _maxpool2(h)
        h = self._std_conv(p, f"conv{L + 1}_1", h)
        h = self._std_conv(p, f"conv{L + 1}_2", h)
        if mc_keys is not None:  # bottleneck MC-dropout site
            h = _mc_drop(h, mc_keys[0], self.cfg.dropout_rate)

        # ---- decoder ------------------------------------------------------
        head_mask = None
        pf = None
        for i, lvl in enumerate(reversed(range(L))):
            up = f"upconv{i + 1}"
            c1, c2 = f"conv{L + 2 + i}_1", f"conv{L + 2 + i}_2"
            width = k * (2**lvl)
            if lvl < pl_:
                if pf is None:
                    upf = self._pf_deconv_matmul(p, up, h, width)
                else:
                    upf = self._pf_deconv_packed(
                        p, up, pf, width,
                        pf2_out=use_pf2 and lvl == 0,
                    )
                sk = skips[lvl]
                # center-crop offset in UNPACKED units (same math as apply)
                off = (sk.h - upf.h, sk.w - upf.w)
                even = off[0] % 2 == 0 and off[1] % 2 == 0
                pf = self._pf_dual(
                    p, c1, sk, upf,
                    a_offset=(off[0] // 2, off[1] // 2) if even else (0, 0),
                    a_slot_phase=None if even else off,
                )
                if head is not None and lvl == 0:
                    head_mask = self._pf_conv(
                        p, c2, pf, head=head, head_only=True
                    )
                    pf = None  # activation dead once the mask exists
                else:
                    pf = self._pf_conv(p, c2, pf)
            else:
                h = lax.conv_transpose(
                    h, jnp.swapaxes(p[f"{up}/w"], 2, 3).astype(h.dtype),
                    (2, 2), "VALID", dimension_numbers=_DN,
                    transpose_kernel=True,
                )
                h = _relu(h + p[f"{up}/b"].astype(h.dtype))
                sk = skips[lvl]
                dh = sk.shape[1] - h.shape[1]
                dw = sk.shape[2] - h.shape[2]
                sk = sk[:, dh // 2 : dh // 2 + h.shape[1],
                        dw // 2 : dw // 2 + h.shape[2], :]
                h = self._std_dual_conv(p, c1, sk, h)
                h = self._std_conv(p, c2, h)

        if mc_keys is not None:  # decoder-end MC-dropout site
            if pf is not None:
                pf = _mc_drop(pf, mc_keys[1], self.cfg.dropout_rate)
            else:
                h = _mc_drop(h, mc_keys[1], self.cfg.dropout_rate)
        if head_mask is not None:
            # head fold: only the uint8 mask leaves the region (pf2
            # unpads back to the same [N, hp, wp, 4] plain mask)
            m4 = (pf2_to4(head_mask) if isinstance(head_mask, PF2)
                  else pf_to4(head_mask))
            return None, m4
        if pf is not None:
            # 4-D flat packed (apply()'s packed contract)
            h = pf2_to4(pf) if isinstance(pf, PF2) else pf_to4(pf)
            if packed_out:
                return h
            h = unpack2(view5(h, k))
        logits = _conv_batch_sharded(h, p["output/w"].astype(h.dtype),
                                     (1, 1))
        return logits + p["output/b"].astype(logits.dtype)

    # ---- weight preparation ----------------------------------------------
    def _packed_conv_names(self):
        """(encoder-entry names, packed-space names) for the packed levels."""
        L, pl_ = self.levels, self.packed_levels
        entry, packed = [], []
        for lvl in range(pl_):
            entry.append(f"conv{lvl + 1}_1")
            packed.append(f"conv{lvl + 1}_2")
        for i, lvl in enumerate(reversed(range(L))):
            if lvl < pl_:
                packed += [f"conv{L + 2 + i}_1", f"conv{L + 2 + i}_2"]
        return entry, packed

    def _dual_conv_names(self):
        """The first decoder conv of each packed level — runs as a dual
        (skip/up split) conv so the concat is never materialized."""
        L, pl_ = self.levels, self.packed_levels
        return [
            f"conv{L + 2 + i}_1"
            for i, lvl in enumerate(reversed(range(L)))
            if lvl < pl_
        ]

    def prepare(self, params: Dict[str, jnp.ndarray]):
        """Pack the affected conv kernels once (host-side numpy)."""
        out = dict(params)
        L, pl_ = self.levels, self.packed_levels
        entry, packed = self._packed_conv_names()
        dual = set(self._dual_conv_names())
        for name in entry:
            w = np.asarray(params[f"{name}/w"], np.float32)
            out[f"{name}/w4"] = jnp.asarray(pack_conv3_weight_s2(w))
            # legacy pack2-based path weights, kept for the A/B flag
            out[f"{name}/w2"] = jnp.asarray(pack_conv3_weight(w))
        for name in packed:
            w = np.asarray(params[f"{name}/w"], np.float32)
            out[f"{name}/w2"] = jnp.asarray(pack_conv3_weight(w))
            if name in dual:
                ci = w.shape[2] // 2  # input = concat(skip C, up C)
                out[f"{name}/w2a"] = jnp.asarray(
                    pack_conv3_weight(w[:, :, :ci])
                )
                out[f"{name}/w2b"] = jnp.asarray(
                    pack_conv3_weight(w[:, :, ci:])
                )
        for i, lvl in enumerate(reversed(range(L))):
            if lvl < pl_:
                up = f"upconv{i + 1}"
                w = np.asarray(params[f"{up}/w"], np.float32)
                c, o = w.shape[2], w.shape[3]
                out[f"{up}/wm"] = jnp.asarray(
                    np.transpose(w, (2, 0, 1, 3)).reshape(c, 4 * o)
                )
        if pl_ and (4 * self.cfg.n_kernels) % 128 == 0:
            # fused pf2 entry taps (conv_flat.conv3entry_pf2)
            from segmentation_tpu.nn.pallas.conv_flat import (
                entry_weights_pf2,
            )

            for key, arr in zip(
                ("we", "wh", "wl"),
                entry_weights_pf2(
                    np.asarray(params["conv1_1/w"], np.float32)
                ),
            ):
                out[f"conv1_1/{key}"] = jnp.asarray(arr, jnp.bfloat16)
        return out

    def apply(self, prepared: Dict[str, jnp.ndarray], x: jnp.ndarray,
              packed_out: bool = False, head=None, mc_keys=None):
        """Forward to logits. With packed_out=True (and packed levels active)
        returns the final decoder tensor still packed, FLAT
        [N, hp, wp, 4·C]. With ``head=(wd, bd)`` (requires packed_out),
        the LAST packed decoder conv also emits the fused binary mask and
        apply returns (h_packed, mask_u8).

        ``mc_keys=(k_bottleneck, k_decoder)``: explicit-key MC-dropout at
        the two Bayesian sites (reference examples/inference.py:31-38) on
        the FAST layout — both sites are bf16-resident in every current
        config (the bottleneck feeds a bf16 deconv; the last decoder conv
        has no int8 consumer, models/unet_int8._out_scale_of), so the
        masked multiply needs no scale folding."""
        if mc_keys is not None and head is not None:
            raise ValueError("MC-dropout serving needs probabilities; the "
                             "fused mask head bakes the argmax (pass "
                             "head=None with mc_keys)")
        if self._pf_supported(prepared, x):
            return self._apply_padflat(prepared, x, packed_out, head,
                                       mc_keys)
        k = self.cfg.n_kernels
        L, pl_ = self.levels, self.packed_levels
        p = prepared
        head_mask = None

        # ---- encoder: packed levels (flat layout) ------------------------
        skips = []
        h = x
        if pl_ and (x.shape[1] % 2 or x.shape[2] % 2):
            raise ValueError(
                f"space-to-depth U-Net needs even H/W, got "
                f"{x.shape[1]}x{x.shape[2]}; use models.unet.UNet"
            )
        h_paired = False
        for lvl in range(pl_):
            width = k * (2**lvl)
            # c1_1 (C=3 entry) stays XLA (strided_packed_conv3_flat
            # self-gates): one boundary relayout into the Pallas region.
            # Every other packed-level op is Pallas, and level boundaries
            # hand off COLUMN-PAIRED pooled tensors so the next strided
            # kernel needs no XLA reshape (measured 7.5 ms of relayout).
            h4 = self._strided_conv(
                p, f"conv{lvl + 1}_1", h, paired=h_paired
            )
            want_pairs = (
                lvl + 1 < pl_
                and self.allow_pallas
                and _pallas_backend_ok()
                and self._pairs_ok()
                and (h4.shape[2] - 1) % 2 == 0
            )
            h4, h = self._packed_conv_pool(
                p, f"conv{lvl + 1}_2", h4, width, pool_pairs=want_pairs
            )
            h_paired = want_pairs
            skips.append(("packed", h4))

        # ---- encoder: standard levels + bottleneck ------------------------
        for lvl in range(pl_, L):
            h = self._std_conv(p, f"conv{lvl + 1}_1", h)
            h = self._std_conv(p, f"conv{lvl + 1}_2", h)
            skips.append(("plain", h))
            h = _maxpool2(h)
        h = self._std_conv(p, f"conv{L + 1}_1", h)
        h = self._std_conv(p, f"conv{L + 1}_2", h)
        if mc_keys is not None:  # bottleneck MC-dropout site
            h = _mc_drop(h, mc_keys[0], self.cfg.dropout_rate)
        elif self.dropout_fn is not None:
            h = self.dropout_fn(h)

        # ---- decoder -------------------------------------------------------
        packed = False  # is `h` a FLAT packed tensor?
        for i, lvl in enumerate(reversed(range(L))):
            up = f"upconv{i + 1}"
            c1, c2 = f"conv{L + 2 + i}_1", f"conv{L + 2 + i}_2"
            kind, skip = skips[lvl]
            width = k * (2**lvl)
            if lvl < pl_:
                if packed:  # previous packed level stayed packed
                    h4 = self._deconv4_packed(p, up, h, width)
                else:
                    h4 = self._deconv4_matmul(p, up, h, width)
                th, tw = h4.shape[1] * 2, h4.shape[2] * 2
                sk = skip if kind == "packed" else flat4(pack2(skip))
                sh, sw = sk.shape[1] * 2, sk.shape[2] * 2
                off = ((sh - th) // 2, (sw - tw) // 2)
                if self._dual_can_fold_crop(p, c1, sk, h4):
                    even = off[0] % 2 == 0 and off[1] % 2 == 0
                    h4 = self._packed_conv_dual(
                        p, c1, sk, h4,
                        a_offset=(
                            (off[0] // 2, off[1] // 2) if even else (0, 0)
                        ),
                        a_slot_phase=None if even else off,
                    )
                else:
                    sk = crop_flat_t(sk, width, (th, tw), off)
                    h4 = self._packed_conv_dual(p, c1, sk, h4)
                if head is not None and lvl == 0:
                    h4, head_mask = self._packed_conv(
                        p, c2, h4, head=head
                    )
                else:
                    h4 = self._packed_conv(p, c2, h4)
                h = h4  # stays packed (flat); unpacked once at the end
                packed = True
            else:
                h = lax.conv_transpose(
                    h, jnp.swapaxes(p[f"{up}/w"], 2, 3).astype(h.dtype),
                    (2, 2), "VALID", dimension_numbers=_DN,
                    transpose_kernel=True,
                )
                h = _relu(h + p[f"{up}/b"].astype(h.dtype))
                sk = skip
                dh = sk.shape[1] - h.shape[1]
                dw = sk.shape[2] - h.shape[2]
                sk = sk[:, dh // 2 : dh // 2 + h.shape[1],
                        dw // 2 : dw // 2 + h.shape[2], :]
                h = self._std_dual_conv(p, c1, sk, h)
                h = self._std_conv(p, c2, h)

        if mc_keys is not None:  # decoder-end MC-dropout site
            h = _mc_drop(h, mc_keys[1], self.cfg.dropout_rate)
        elif self.dropout_fn is not None:
            h = self.dropout_fn(h)
        if packed:
            if packed_out:
                if head_mask is not None:
                    return h, head_mask
                return h
            # 1×1 output head IN packed layout (the 1×1 conv acts per
            # pixel, so it commutes with the unpack exactly): the unpack
            # transpose then moves from the C=32 decoder tensor to the
            # nc-channel logits — 16× less relayout traffic, fwd AND
            # bwd (train HLO copy.326/copy.327, 5.3 ms/step at
            # 512²/B=128).
            w1 = p["output/w"].astype(h.dtype)[0, 0]
            y5 = jnp.einsum("nijsc,ck->nijsk", view5(h, k), w1)
            logits = unpack2(y5)
            return logits + p["output/b"].astype(logits.dtype)
        logits = _conv_batch_sharded(h, p["output/w"].astype(h.dtype), (1, 1))
        return logits + p["output/b"].astype(logits.dtype)

    def _head_diff(self, p):
        """Block-diagonal per-slot difference head for n_classes=2:
        wd [4C, 4], bd [4] with mask = (y_flat @ wd + bd > 0) — the
        argmax of the 1×1 head, as one tiny matmul on the FLAT packed
        decoder output (fused into the last conv kernel on TPU)."""
        k = self.cfg.n_kernels
        w = p["output/w"][0, 0].astype(jnp.float32)  # [C, 2]
        bv = p["output/b"].astype(jnp.float32)
        wdv = w[:, 1] - w[:, 0]
        wd = jnp.zeros((4 * k, 4), jnp.float32)
        for s in range(4):
            wd = wd.at[s * k : (s + 1) * k, s].set(wdv)
        bd = jnp.full((4,), bv[1] - bv[0], jnp.float32)
        return wd, bd

    def apply_argmax(self, prepared: Dict[str, jnp.ndarray], x: jnp.ndarray):
        """Class-map serving path: run the 1×1 head and the argmax while the
        decoder output is still PACKED, then unpack only the uint8 mask —
        the final layout transpose moves bytes of uint8 instead of bf16
        activations. Identical to argmax(apply(...), -1).

        For n_classes=2 the head+argmax further folds into the LAST packed
        conv as sign(y @ (w₁-w₀) + (b₁-b₀)) — the full-resolution bf16
        activation never leaves the Pallas region (saves the relayout copy
        + XLA einsum/argmax, ~4.8 ms at 512²/B=128)."""
        p = prepared
        if (
            self.packed_levels
            and p["output/b"].shape[0] == 2
            and self.dropout_fn is None
        ):
            out = self.apply(
                prepared, x, packed_out=True, head=self._head_diff(p)
            )
            if isinstance(out, tuple):
                mask_p = out[1]
                n, hp_, wp_, _ = mask_p.shape
                m = _reshape(
                    mask_p, (n, hp_, wp_, 2, 2)
                ).transpose(0, 1, 3, 2, 4)
                return _reshape(m, (n, hp_ * 2, wp_ * 2))
            # head not engaged (e.g. no packed decoder) — plain path
        out = self.apply(prepared, x, packed_out=True)
        if not self.packed_levels:  # no packed levels: plain path
            return jnp.argmax(out, axis=-1).astype(jnp.uint8)
        hp = view5(out, self.cfg.n_kernels)  # [N, hp, wp, 4, C]
        w = p["output/w"][0, 0].astype(hp.dtype)  # [C, nc]
        logits_p = jnp.einsum("nijsc,ck->nijsk", hp, w) + p[
            "output/b"
        ].astype(hp.dtype)
        mask_p = jnp.argmax(logits_p, axis=-1).astype(jnp.uint8)
        # unpack the [N, hp, wp, 4] mask: cheap uint8 transpose
        n, hp_, wp_, s4 = mask_p.shape
        m = _reshape(mask_p, (n, hp_, wp_, 2, 2)).transpose(0, 1, 3, 2, 4)
        return _reshape(m, (n, hp_ * 2, wp_ * 2))


@dataclasses.dataclass
class UNetS2D:
    """Trainable s2d U-Net: declares the SAME parameters as models.unet.UNet
    (names, shapes, initializers → checkpoints interchange) but runs the
    packed forward, with the weight packing done as a differentiable gather
    inside the step (pack_conv3_weight_jnp). Drop-in for SegmentationTrainer
    — train_step/backward also benefit from the lane-utilization win.

    Constraint: even input H/W (the packed encoder); use UNet for arbitrary
    sizes.
    """

    cfg: ModelConfig
    levels: int = 4

    IN_OUT_EQUAL = False
    IN_OUT_CROP = True
    IN_OUT_RATIO = False
    model_name = "unet"  # checkpoint-compatible with the standard UNet

    def output_hw(self, in_hw):
        from segmentation_tpu.nn.shapes import unet_output_hw

        return unet_output_hw(in_hw, self.levels)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from segmentation_tpu.nn import initializers as init
        from segmentation_tpu.nn import module as hk

        k = self.cfg.n_kernels
        nc = self.cfg.n_classes
        L = self.levels
        cin = self.cfg.input_channel

        # Declare params with UNet's exact names/shapes, then assemble the
        # prepared dict for the packed forward.
        p = {}

        def declare_conv(name, ci, co, ksz=3):
            p[f"{name}/w"] = hk.param(
                f"{name}/w", (ksz, ksz, ci, co), init.default_weight
            )
            p[f"{name}/b"] = hk.param(f"{name}/b", (co,), init.zeros)

        c = cin
        for lvl in range(L):
            width = k * (2**lvl)
            declare_conv(f"conv{lvl + 1}_1", c, width)
            declare_conv(f"conv{lvl + 1}_2", width, width)
            c = width
        declare_conv(f"conv{L + 1}_1", c, k * (2**L))
        declare_conv(f"conv{L + 1}_2", k * (2**L), k * (2**L))
        c = k * (2**L)
        for i, lvl in enumerate(reversed(range(L))):
            width = k * (2**lvl)
            declare_conv(f"upconv{i + 1}", c, width, ksz=2)
            declare_conv(f"conv{L + 2 + i}_1", 2 * width, width)
            declare_conv(f"conv{L + 2 + i}_2", width, width)
            c = width
        declare_conv("output", c, nc, ksz=1)

        # Training picks the argmax-index pool VJP and the XLA convs.
        # The trainable-Pallas dispatch (nn.pallas.train: serving
        # kernels forward, XLA linear-transpose backward) is wired here
        # but OFF by default — measured 422 vs 305 ms/step at 512²/B=128
        # because custom_vjp force-saves every site's input+output and
        # defeats XLA's remat policy (see nn/pallas/train.py docstring).
        # SEG_PALLAS_TRAIN=1 opts in. allow_pallas stays False — it
        # gates the inference-only fusions (conv+pool, folded crops,
        # heads) that carry no VJP.
        fast = UNetS2DInference(
            self.cfg, self.levels, pool_slices=False, allow_pallas=False,
            pool_select_vjp=True, pallas_vjp=True,
        )
        if self.cfg.bayesian:
            # Same MC-dropout sites (and liveness contract) as models.unet:
            # stays stochastic at inference (reference examples/inference.py:
            # 31-38) so infer_bayesian gets real posterior samples.
            from segmentation_tpu.nn.layers import dropout as _dropout

            rate = self.cfg.dropout_rate
            fast = dataclasses.replace(
                fast,
                dropout_fn=lambda h: _dropout(
                    h, rate, deterministic=False
                ),
            )
        entry, packed = fast._packed_conv_names()
        dual = set(fast._dual_conv_names())
        for name in entry:
            p[f"{name}/w4"] = pack_conv3_weight_s2_jnp(p[f"{name}/w"])
        for name in packed:
            if name in dual:
                w = p[f"{name}/w"]
                ci = w.shape[2] // 2
                p[f"{name}/w2a"] = pack_conv3_weight_jnp(w[:, :, :ci])
                p[f"{name}/w2b"] = pack_conv3_weight_jnp(w[:, :, ci:])
            else:
                p[f"{name}/w2"] = pack_conv3_weight_jnp(p[f"{name}/w"])
        for i, lvl in enumerate(reversed(range(L))):
            if lvl < fast.packed_levels:
                up = f"upconv{i + 1}"
                w = p[f"{up}/w"]
                ci, co = w.shape[2], w.shape[3]
                p[f"{up}/wm"] = jnp.transpose(w, (2, 0, 1, 3)).reshape(
                    ci, 4 * co
                )
        return fast.apply(p, x)
