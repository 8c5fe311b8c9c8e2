"""int8 quantized U-Net serving path (on top of the s2d layout).

TPU v5e executes int8 MXU ops at ~1.4× the measured bf16 conv rate (probe in
benchmarks; 2× nominal). This module quantizes the s2d U-Net's packed convs
— the 128/256-channel, compute-dominated sites — with:

  - static symmetric per-output-channel weight scales, and
  - static per-layer activation scales CALIBRATED from sample batches,

so the activation round/clip/cast fuses into the previous op's epilogue (no
extra abs-max reduction pass at serving time). Deeper levels and the head
stay bf16. Post-training quantization: expect tiny mask-level disagreement
vs the float path (locked by a tolerance test, tests/test_unet_int8.py).

Usage:
    q = UNetS2DInt8(cfg)
    prepared = q.prepare(params, calib_batches=[x0, x1])
    logits = jax.jit(q.apply)(prepared, x)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from segmentation_tpu.models.unet_fast import (
    UNetS2DInference,
    deconv2_as_matmul,
    pack2,
    packed_center_crop,
    packed_pool,
    packed_pool_repack,
    unpack2,
)

_DN = ("NHWC", "HWIO", "NHWC")


def _quantize_weight(w: np.ndarray):
    """[kh, kw, CI, CO] → (int8 weights, per-CO float scales)."""
    w = np.asarray(w, np.float32)
    s = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
    s = np.maximum(s, 1e-8)
    wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return wq, s.astype(np.float32)


def _quant_act(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    xq = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(xq, -127, 127).astype(jnp.int8)


def int8_conv(x, wq, w_scale, act_scale, b, relu=True):
    """Standard-layout int8 3×3 VALID conv with float rescale epilogue."""
    xq = _quant_act(x, act_scale)
    yi = lax.conv_general_dilated(
        xq, wq, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    y = yi.astype(jnp.float32) * (act_scale * w_scale)
    y = y + b.astype(jnp.float32)
    if relu:
        y = jax.nn.relu(y)
    return y.astype(x.dtype)


def int8_packed_conv(xp, wq, w_scale, act_scale, b, relu=True):
    """Packed-space conv in int8: [N,Hp,Wp,4,C] bf16 → quantize →
    int8 conv (int32 accumulate) → rescale → bias+relu → bf16."""
    n, hp, wp, s, c = xp.shape
    o4 = wq.shape[-1]
    xq = _quant_act(xp.reshape(n, hp, wp, s * c), act_scale)
    yi = lax.conv_general_dilated(
        xq, wq, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    y = yi.astype(jnp.float32) * (act_scale * w_scale)
    y = y.reshape(n, hp - 1, wp - 1, 4, o4 // 4)
    y = y + b.astype(jnp.float32)
    if relu:
        y = jax.nn.relu(y)
    return y.astype(xp.dtype)


@dataclasses.dataclass
class UNetS2DInt8(UNetS2DInference):
    """Quantized variant: packed conv sites run int8; everything else
    inherits the s2d bf16 path."""

    def _std_conv_names(self):
        """The non-packed 3×3 conv sites (deeper encoder/decoder levels +
        bottleneck) — also worth int8 (C ≥ 128 there)."""
        L, pl_ = self.levels, self.packed_levels
        names = []
        for lvl in range(pl_, L):
            names += [f"conv{lvl + 1}_1", f"conv{lvl + 1}_2"]
        names += [f"conv{L + 1}_1", f"conv{L + 1}_2"]
        for i, lvl in enumerate(reversed(range(L))):
            if lvl >= pl_:
                names += [f"conv{L + 2 + i}_1", f"conv{L + 2 + i}_2"]
        return names

    def prepare(self, params: Dict[str, jnp.ndarray],
                calib_batches: Sequence[jnp.ndarray] = ()):
        prepared = super().prepare(params)
        packed = [k[: -len("/w2")] for k in prepared if k.endswith("/w2")]
        for name in packed:
            wq, ws = _quantize_weight(np.asarray(prepared[f"{name}/w2"]))
            prepared[f"{name}/wq"] = jnp.asarray(wq)
            prepared[f"{name}/wscale"] = jnp.asarray(ws)
        std = self._std_conv_names()
        for name in std:
            wq, ws = _quantize_weight(np.asarray(prepared[f"{name}/w"]))
            prepared[f"{name}/wq"] = jnp.asarray(wq)
            prepared[f"{name}/wscale"] = jnp.asarray(ws)
        self._packed_names = sorted(packed)

        # Calibrate activation scales by running the float path and
        # recording abs-max at each quantized site. WITHOUT calibration
        # batches no activation scales are written and every site falls back
        # to the float path (uncalibrated int8 would be garbage).
        all_sites = packed + std
        if len(calib_batches):
            records: Dict[str, float] = {name: 0.0 for name in all_sites}
            self._calibrating = records
            for x in calib_batches:
                # run eagerly through THIS class's apply so the hook records
                self.apply(prepared, jnp.asarray(x))
            self._calibrating = None
            for name in all_sites:
                prepared[f"{name}/ascale"] = jnp.asarray(
                    np.float32(max(records[name], 1e-6) / 127.0)
                )
        return prepared

    # Hook: UNetS2DInference.apply calls packed_conv3 via this indirection.
    _calibrating = None

    def _packed_conv(self, p, name, xp):
        if self._calibrating is not None:
            # float path + abs-max recording (host-side concrete values)
            n, hp, wp, s, c = xp.shape
            self._calibrating[name] = max(
                self._calibrating[name],
                float(jnp.max(jnp.abs(xp.astype(jnp.float32)))),
            )
            from segmentation_tpu.models.unet_fast import packed_conv3

            return packed_conv3(xp, p[f"{name}/w2"], p[f"{name}/b"])
        if f"{name}/wq" in p and f"{name}/ascale" in p:
            return int8_packed_conv(
                xp, p[f"{name}/wq"], p[f"{name}/wscale"],
                p[f"{name}/ascale"], p[f"{name}/b"],
            )
        from segmentation_tpu.models.unet_fast import packed_conv3

        return packed_conv3(xp, p[f"{name}/w2"], p[f"{name}/b"])

    def apply(self, prepared, x, packed_out: bool = False):
        # Re-implement the forward with quantized conv hooks.
        k = self.cfg.n_kernels
        L, pl_ = self.levels, self.packed_levels
        p = prepared
        std_sites = set(self._std_conv_names())

        def conv(h, name, relu=True):
            if name in std_sites and self._calibrating is not None:
                self._calibrating[name] = max(
                    self._calibrating.get(name, 0.0),
                    float(jnp.max(jnp.abs(h.astype(jnp.float32)))),
                )
            elif (name in std_sites and f"{name}/wq" in p
                  and f"{name}/ascale" in p):
                return int8_conv(
                    h, p[f"{name}/wq"], p[f"{name}/wscale"],
                    p[f"{name}/ascale"], p[f"{name}/b"], relu,
                )
            y = lax.conv_general_dilated(
                h, p[f"{name}/w"].astype(h.dtype), (1, 1), "VALID",
                dimension_numbers=_DN,
            )
            y = y + p[f"{name}/b"].astype(y.dtype)
            return jax.nn.relu(y) if relu else y

        skips = []
        hp = pack2(x)
        h = None
        for lvl in range(pl_):
            for tag in ("_1", "_2"):
                hp = self._packed_conv(p, f"conv{lvl + 1}{tag}", hp)
            skips.append(("packed", hp))
            if lvl + 1 < pl_:
                hp = packed_pool_repack(hp)
            else:
                h = packed_pool(hp)
        for lvl in range(pl_, L):
            h = conv(h, f"conv{lvl + 1}_1")
            h = conv(h, f"conv{lvl + 1}_2")
            skips.append(("plain", h))
            h = lax.reduce_window(
                h, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        h = conv(h, f"conv{L + 1}_1")
        h = conv(h, f"conv{L + 1}_2")

        for i, lvl in enumerate(reversed(range(L))):
            up = f"upconv{i + 1}"
            c1, c2 = f"conv{L + 2 + i}_1", f"conv{L + 2 + i}_2"
            kind, skip = skips[lvl]
            width = k * (2**lvl)
            if lvl < pl_:
                hp = deconv2_as_matmul(h, p[f"{up}/wm"], p[f"{up}/b"], width)
                th, tw = hp.shape[1] * 2, hp.shape[2] * 2
                sk = skip if kind == "packed" else pack2(skip)
                sh, sw = sk.shape[1] * 2, sk.shape[2] * 2
                off = ((sh - th) // 2, (sw - tw) // 2)
                sk = packed_center_crop(sk, (th, tw), off)
                hp = jnp.concatenate([sk, hp], axis=-1)
                hp = self._packed_conv(p, c1, hp)
                hp = self._packed_conv(p, c2, hp)
                h = unpack2(hp) if not (packed_out and lvl == 0) else hp
            else:
                h = lax.conv_transpose(
                    h, jnp.swapaxes(p[f"{up}/w"], 2, 3).astype(h.dtype),
                    (2, 2), "VALID", dimension_numbers=_DN,
                    transpose_kernel=True,
                )
                h = jax.nn.relu(h + p[f"{up}/b"].astype(h.dtype))
                sk = skip
                dh = sk.shape[1] - h.shape[1]
                dw = sk.shape[2] - h.shape[2]
                sk = sk[:, dh // 2 : dh // 2 + h.shape[1],
                        dw // 2 : dw // 2 + h.shape[2], :]
                h = jnp.concatenate([sk, h], axis=-1)
                h = conv(h, c1)
                h = conv(h, c2)

        if packed_out and h.ndim == 5:
            return h
        logits = lax.conv_general_dilated(
            h, p["output/w"].astype(h.dtype), (1, 1), "VALID",
            dimension_numbers=_DN,
        )
        return logits + p["output/b"].astype(logits.dtype)
