"""int8 quantized U-Net serving path (on top of the s2d layout).

TPU v5e executes int8 MXU ops at up to 2× the bf16 rate (394 TOPS nominal).
This module quantizes every 3×3 conv site of the s2d U-Net — the packed
convs, the strided-encoder entry convs, and the standard deeper levels —
with:

  - static symmetric per-output-channel weight scales, and
  - static per-layer activation scales CALIBRATED from sample batches,

so the activation round/clip/cast fuses into the previous op's epilogue (no
extra abs-max reduction pass at serving time). Post-training quantization:
expect tiny mask-level disagreement vs the float path (locked by a tolerance
test, tests/test_unet_int8.py).

The forward topology is inherited from UNetS2DInference — this class only
overrides the conv-site hooks, so layout improvements there apply here too.

Usage:
    q = UNetS2DInt8(cfg)
    prepared = q.prepare(params, calib_batches=[x0, x1])
    logits = jax.jit(q.apply)(prepared, x)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from segmentation_tpu.models.unet_fast import (
    UNetS2DInference,
    _pallas_backend_ok,
    packed_conv3_dual_flat,
    packed_conv3_flat,
    packed_pool_flat,
    strided_packed_conv3_flat,
    tile_bias4,
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


def _quantize_matrix(w: np.ndarray):
    """[K, O] matmul weight (e.g. the deconv's pre-packed wm [C, 4O]) →
    (int8 weights, per-O float scales)."""
    w = np.asarray(w, np.float32)
    s = np.maximum(np.max(np.abs(w), axis=0) / 127.0, 1e-8)
    wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return wq, s.astype(np.float32)


def int8_conv(x, wq, w_scale, act_scale, b, relu=True, strides=(1, 1),
              out_scale=None):
    """Standard-layout int8 VALID conv with float rescale epilogue.
    ``x`` may already be int8 (resident activations quantized by the
    producer at ``act_scale``) — then the quantize step is skipped.
    With ``out_scale`` the requant folds into the epilogue (relu becomes
    the clip's lower bound) and the site emits int8 directly — the std
    levels then stay int8-RESIDENT: no bf16 intermediate is written and
    the consumer's standalone quantize pass disappears."""
    xq = x if x.dtype == jnp.int8 else _quant_act(x, act_scale)
    yi = lax.conv_general_dilated(
        xq, wq, strides, "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    if out_scale is not None:
        mult = (act_scale * w_scale / out_scale).astype(jnp.float32)
        y = yi.astype(jnp.float32) * mult
        y = y + b.astype(jnp.float32) / out_scale
        # relu as max + SYMMETRIC clip: the ±127 bounds let the
        # round+clip+cast lower to one saturating convert (identical
        # results — see nn/pallas/conv.py _epilogue_parts)
        if relu:
            y = jnp.maximum(y, 0.0)
        return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)
    y = yi.astype(jnp.float32) * (act_scale * w_scale)
    y = y + b.astype(jnp.float32)
    if relu:
        y = jax.nn.relu(y)
    out_dt = jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype
    return y.astype(out_dt)


def int8_std_dual_conv(sk, up, wqa, wsa, sk_scale, wqb, wsb, asb, b,
                       relu=True, out_scale=None):
    """Decoder std conv with the concat weight split per operand (skip
    half / upsampled half), so the int8-resident skip is consumed at its
    stored scale and only the bf16 deconv side pays a quantize pass.
    Replaces concat→conv (the concat of mixed s8/bf16 would force a
    dequant copy of the big skip)."""
    ska = sk if sk.dtype == jnp.int8 else _quant_act(sk, sk_scale)
    upq = up if up.dtype == jnp.int8 else _quant_act(up, asb)
    # One of the two convs cannot fuse its epilogue (the sum has a single
    # fusion root), so XLA materializes its accumulator. Round that
    # intermediate to bf16: the scaled partial is O(1) and the final s8
    # keeps 7 bits, so bf16's 8-bit mantissa is lossless in practice —
    # and the materialized buffer halves (profiled 0.98+0.84 ms of s32
    # traffic at the two dual-split sites).
    ya = (lax.conv_general_dilated(
        ska, wqa, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (sk_scale * wsa)).astype(jnp.bfloat16)
    yb = lax.conv_general_dilated(
        upq, wqb, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (asb * wsb)
    y = ya.astype(jnp.float32) + yb + b.astype(jnp.float32)
    if out_scale is not None:
        yq = y / out_scale
        if relu:
            yq = jnp.maximum(yq, 0.0)  # symmetric clip -> saturating cast
        return jnp.clip(jnp.round(yq), -127.0, 127.0).astype(jnp.int8)
    if relu:
        y = jax.nn.relu(y)
    return y.astype(jnp.bfloat16)


def _tile4(b):
    """[O] → [4O] slot-major flat bias (matches unet_fast.tile_bias4)."""
    return jnp.tile(b, 4)


def int8_packed_conv(x4, wq, w_scale, act_scale, b, relu=True):
    """FLAT packed-space conv in int8: [N,Hp,Wp,4C] bf16 → quantize →
    int8 conv (int32 accumulate) → rescale → bias+relu → bf16."""
    xq = _quant_act(x4, act_scale)
    yi = lax.conv_general_dilated(
        xq, wq, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    y = yi.astype(jnp.float32) * (act_scale * w_scale)
    y = y + _tile4(b).astype(jnp.float32)
    if relu:
        y = jax.nn.relu(y)
    return y.astype(x4.dtype)


def int8_packed_conv_dual(a4, u4, wqa, wsa, asa, wqb, wsb, asb, b,
                          relu=True):
    """Dual (skip/up split) decoder conv in int8 — each operand gets its own
    calibrated activation scale; results rescale to float and sum."""
    ya = lax.conv_general_dilated(
        _quant_act(a4, asa), wqa, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (asa * wsa)
    yb = lax.conv_general_dilated(
        _quant_act(u4, asb), wqb, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (asb * wsb)
    y = ya + yb + _tile4(b).astype(jnp.float32)
    if relu:
        y = jax.nn.relu(y)
    return y.astype(a4.dtype)


def int8_strided_conv(x, wq, w_scale, act_scale, b, relu=True):
    """Strided-encoder entry conv (4×4/2, FLAT packed output) in int8."""
    xq = _quant_act(x, act_scale)
    yi = lax.conv_general_dilated(
        xq, wq, (2, 2), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    y = yi.astype(jnp.float32) * (act_scale * w_scale)
    y = y + _tile4(b).astype(jnp.float32)
    if relu:
        y = jax.nn.relu(y)
    return y.astype(x.dtype)


@dataclasses.dataclass
class UNetS2DInt8(UNetS2DInference):
    """Quantized variant: every 3×3 conv site runs int8 (calibrated),
    and the packed-decoder deconvs run int8 too (their masked-slot dots
    halve at the int8 MXU rate, and the producer/consumer requant passes
    fold away — see quant_deconvs); the std deconvs and the 1×1 head
    stay bf16 (tiny FLOP share). Everything else — topology, packing,
    serving paths — inherits from UNetS2DInference."""

    # int8 packed-decoder deconvs: the producing decoder _2 conv emits
    # s8 at the deconv's calibrated input scale, the deconv's epilogue
    # requantizes at its consumer dual's b-side scale — the whole packed
    # decoder stays int8-resident. False = deconvs bf16 (round-2 layout).
    quant_deconvs: bool = True

    def _deconv_names(self):
        """The packed-decoder upconv sites eligible for int8 (their
        input and output both live inside the quantized region)."""
        if not self.quant_deconvs:
            return []
        L, pl_ = self.levels, self.packed_levels
        return [
            f"upconv{i + 1}"
            for i, lvl in enumerate(reversed(range(L)))
            if lvl < pl_
        ]

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

    def _std_dual_names(self):
        """Decoder std _1 convs: consume (cropped skip, upsampled) —
        quantized with the concat weight SPLIT per operand so the skip
        stays int8-resident (see int8_std_dual_conv)."""
        L, pl_ = self.levels, self.packed_levels
        return [
            f"conv{L + 2 + i}_1"
            for i, lvl in enumerate(reversed(range(L)))
            if lvl >= pl_
        ]

    def prepare(self, params: Dict[str, jnp.ndarray],
                calib_batches: Sequence[jnp.ndarray] = ()):
        prepared = super().prepare(params)
        entry, packed = self._packed_conv_names()
        dual = set(self._dual_conv_names())
        std = self._std_conv_names()
        for name in entry:
            wq, ws = _quantize_weight(np.asarray(prepared[f"{name}/w4"]))
            prepared[f"{name}/wq4"] = jnp.asarray(wq)
            prepared[f"{name}/wscale4"] = jnp.asarray(ws)
        for name in packed:
            if name in dual:
                for half in ("a", "b"):
                    wq, ws = _quantize_weight(
                        np.asarray(prepared[f"{name}/w2{half}"])
                    )
                    prepared[f"{name}/wq_{half}"] = jnp.asarray(wq)
                    prepared[f"{name}/wscale_{half}"] = jnp.asarray(ws)
            else:
                wq, ws = _quantize_weight(np.asarray(prepared[f"{name}/w2"]))
                prepared[f"{name}/wq"] = jnp.asarray(wq)
                prepared[f"{name}/wscale"] = jnp.asarray(ws)
        for name in std:
            wq, ws = _quantize_weight(np.asarray(prepared[f"{name}/w"]))
            prepared[f"{name}/wq"] = jnp.asarray(wq)
            prepared[f"{name}/wscale"] = jnp.asarray(ws)
        std_dual = self._std_dual_names()
        for name in std_dual:
            # split the concat weight: [:, :, :CI-CO] reads the skip
            # (concat order is [skip, up]); decoder convs halve channels
            # so CI-CO == CO == the up side's width
            w = np.asarray(prepared[f"{name}/w"])
            ca = w.shape[2] - w.shape[3]
            assert ca == w.shape[3], (name, w.shape)
            for half, ws_ in (("a", w[:, :, :ca]), ("b", w[:, :, ca:])):
                wq, ws = _quantize_weight(ws_)
                prepared[f"{name}/wq_{half}"] = jnp.asarray(wq)
                prepared[f"{name}/wscale_{half}"] = jnp.asarray(ws)
        deconvs = self._deconv_names()
        for name in deconvs:
            wq, ws = _quantize_matrix(np.asarray(prepared[f"{name}/wm"]))
            prepared[f"{name}/wqm"] = jnp.asarray(wq)
            prepared[f"{name}/wscale"] = jnp.asarray(ws)
        # (fused pf2 entry taps are built by the base prepare — the int8
        # hook reuses them in bf16 compute with an int8 requant epilogue:
        # input quantization would cost mask accuracy for nothing, since
        # at K=48 the int8 MXU rate equals bf16's)

        # Calibrate activation scales by running the float path and
        # recording abs-max at each quantized site. WITHOUT calibration
        # batches no activation scales are written and every site falls back
        # to the float path (uncalibrated int8 would be garbage).
        if len(calib_batches):
            sites = (entry + packed + std + deconvs
                     + [f"{n}@b" for n in dual]
                     + [f"{n}@b" for n in std_dual])
            dual_a = dual | set(std_dual)

            def calib_fwd(x):
                # ONE jitted forward per batch: the hooks stash traced
                # abs-maxes in _calibrating, returned as outputs (the
                # old eager walk cost minutes of per-op dispatch on the
                # tunnel-attached TPU)
                self._calibrating = {}
                self.apply(prepared, x)
                rec, self._calibrating = self._calibrating, None
                return rec

            jfwd = jax.jit(calib_fwd)
            records: Dict[str, float] = {name: 0.0 for name in sites}
            try:
                for x in calib_batches:
                    # Calibrate at serving numerics: the deployed path is
                    # bf16, and an f32 batch would also run the Pallas
                    # region in f32 — doubling scoped-VMEM footprints past
                    # the 16 MB stack limit (compile-time OOM at B=4 on
                    # conv2x2_flat; seen live in bench.py round 3).
                    rec = jax.device_get(jfwd(jnp.asarray(x, jnp.bfloat16)))
                    for name, v in rec.items():
                        records[name] = max(records[name], float(v))
            finally:
                self._calibrating = None
            for name in records:
                key = (
                    f"{name[:-2]}/ascale_b" if name.endswith("@b")
                    else f"{name}/ascale_a" if name in dual_a
                    else f"{name}/ascale"
                )
                prepared[key] = jnp.asarray(
                    np.float32(max(records[name], 1e-6) / 127.0)
                )
        return prepared

    # ---- resident int8 Pallas flow -----------------------------------------
    # On single-chip TPU with calibrated scales, the packed region runs the
    # int8 Pallas kernels with INT8-RESIDENT activations: each kernel's
    # epilogue requantizes its output at its consumer's calibrated scale,
    # so the region's HBM traffic halves and the MXU runs at the 2x int8
    # rate (measured 1.3-1.5x per kernel vs bf16 at these shapes — the
    # big convs sit at the bandwidth roofline). bf16 islands remain at the
    # region entry (XLA c1_1; its output quantizes in-XLA) and the
    # deconvs (tiny FLOP share; the dual kernels inline-quantize that
    # side).

    def _out_scale_of(self, p, name):
        """The int8 scale a site's OUTPUT tensor is stored at = its
        consumer's calibrated input scale; None -> emit bf16."""
        L, pl_ = self.levels, self.packed_levels
        succ = {}
        for lvl in range(pl_):
            nxt = (
                f"conv{lvl + 2}_1" if lvl + 1 < pl_
                else f"conv{pl_ + 1}_1"
            )
            succ[f"conv{lvl + 1}_1"] = f"conv{lvl + 1}_2"
            succ[f"conv{lvl + 1}_2"] = nxt
        # std levels: encoder chains through the pool into the next
        # level (max pool commutes with the positive scale, so pooling
        # int8 codes at the consumer's scale is exact); the bottleneck
        # _2 and decoder _2 convs feed bf16 deconvs and stay bf16.
        for lvl in range(pl_, L):
            succ[f"conv{lvl + 1}_1"] = f"conv{lvl + 1}_2"
            succ[f"conv{lvl + 1}_2"] = f"conv{lvl + 2}_1"
        succ[f"conv{L + 1}_1"] = f"conv{L + 1}_2"
        for i in range(L):
            # decoder _1 → _2 (packed and std alike); _2 decoder convs
            # feed a deconv (bf16 for std levels; int8 when the next
            # level's deconv is quantized) or the head
            succ[f"conv{L + 2 + i}_1"] = f"conv{L + 2 + i}_2"
        if self.quant_deconvs:
            for i in range(L):
                if 0 <= L - 2 - i < pl_:  # the next up is packed-decoder
                    succ[f"conv{L + 2 + i}_2"] = f"upconv{i + 2}"
            for j, lvl in enumerate(reversed(range(L))):
                if lvl < pl_:
                    # the deconv requantizes at its consumer dual's
                    # b-side scale
                    succ[f"upconv{j + 1}"] = f"conv{L + 2 + j}_1@b"
        nxt = succ.get(name)
        if nxt is None:
            return None
        key = (f"{nxt[:-2]}/ascale_b" if nxt.endswith("@b")
               else f"{nxt}/ascale")
        sc = p.get(key)
        return None if sc is None else float(sc)

    def _in_scale_of(self, p, name, side=None):
        key = f"{name}/ascale" + (f"_{side}" if side else "")
        sc = p.get(key)
        return None if sc is None else float(sc)

    def _use_pallas_int8(self, p, name):
        return (
            self.allow_pallas
            and _pallas_backend_ok()
            and self._calibrating is None
            and (f"{name}/ascale" in p or f"{name}/ascale_a" in p)
        )

    def _pairs_ok(self):
        # the int8 hooks understand the paired pool handoff (resident
        # path) and the float fallbacks un-pair explicitly
        return True

    # ---- hook overrides ----------------------------------------------------
    _calibrating = None

    def _record(self, name, x):
        m = jnp.max(jnp.abs(x.astype(jnp.float32)))
        prev = self._calibrating.get(name)
        self._calibrating[name] = m if prev is None else jnp.maximum(
            prev, m
        )

    def _strided_conv(self, p, name, h, relu=True, paired=False):
        in_s = self._in_scale_of(p, name)
        c_true = (h.shape[-1] // 2) if paired else h.shape[-1]
        if (
            self._use_pallas_int8(p, name)
            and f"{name}/wq4" in p
            and in_s is not None
            and p[f"{name}/wq4"].shape[-1] % 128 == 0
            and h.shape[1] > 5
            and c_true >= 16
            and (2 * c_true) % 64 == 0
            and (paired or h.shape[2] % 2 == 0)
        ):
            from segmentation_tpu.nn.pallas.conv import conv4x4s2_flat

            q = {"chan_scale": p[f"{name}/wscale4"] * in_s}
            if h.dtype != jnp.int8:  # region entry arrives bf16
                q["act_scale"] = in_s
            out_s = self._out_scale_of(p, name)
            if out_s is not None:
                q["out_scale"] = out_s
            return conv4x4s2_flat(
                h, p[f"{name}/wq4"], _tile4(p[f"{name}/b"]), relu=relu,
                paired=paired, quant=q,
            )
        if paired:  # XLA kernels take unpacked columns; un-pair first
            n, hh, w2, c2 = h.shape
            h = h.reshape(n, hh, 2 * w2, c2 // 2)
        if h.dtype == jnp.int8:  # resident tensor hitting an XLA path
            h = h.astype(jnp.bfloat16) * self._in_scale_of(p, name)
        if self._calibrating is not None:
            self._record(name, h)
        elif (
            f"{name}/wq4" in p and f"{name}/ascale" in p and c_true >= 16
        ):
            # Tiny-C entry (c1_1, C=3) must NOT take XLA int8 either: the
            # s32 conv output + separate rescale/requant passes measured
            # 14.3 ms vs ~7 ms for bf16 conv + fused quantize (the
            # consumer quantizes at the region entry) — profile_s2d_attr
            # int8 mode, 512²/B=128.
            return int8_strided_conv(
                h, p[f"{name}/wq4"], p[f"{name}/wscale4"],
                p[f"{name}/ascale"], p[f"{name}/b"], relu,
            )
        return strided_packed_conv3_flat(
            h, p[f"{name}/w4"], p[f"{name}/b"], relu
        )

    def _packed_conv(self, p, name, x4, relu=True, head=None):
        in_s = self._in_scale_of(p, name)
        if (
            self._use_pallas_int8(p, name)
            and f"{name}/wq" in p
            and in_s is not None
            and x4.shape[-1] % 128 == 0
            and p[f"{name}/wq"].shape[-1] % 128 == 0
            and x4.shape[1] > 2
        ):
            from segmentation_tpu.nn.pallas.conv import conv2x2_flat

            q = {"chan_scale": p[f"{name}/wscale"] * in_s}
            if x4.dtype != jnp.int8:
                q["act_scale"] = in_s
            out_s = self._out_scale_of(p, name)
            if out_s is not None and head is None:
                q["out_scale"] = out_s
            return conv2x2_flat(
                x4, p[f"{name}/wq"], _tile4(p[f"{name}/b"]), relu=relu,
                quant=q, head=head,
            )
        if x4.dtype == jnp.int8:
            x4 = x4.astype(jnp.bfloat16) * in_s
        if self._calibrating is not None:
            self._record(name, x4)
        elif f"{name}/wq" in p and f"{name}/ascale" in p:
            y = int8_packed_conv(
                x4, p[f"{name}/wq"], p[f"{name}/wscale"],
                p[f"{name}/ascale"], p[f"{name}/b"], relu,
            )
            if head is not None:
                from segmentation_tpu.models.unet_fast import head_mask_xla

                return y, head_mask_xla(y, *head)
            return y
        return packed_conv3_flat(
            x4, p[f"{name}/w2"], p[f"{name}/b"], relu, head=head
        )

    def _packed_conv_pool(self, p, name, x4, width, relu=True,
                          pallas=True, pool_pairs=False):
        in_s = self._in_scale_of(p, name)
        if (
            pallas
            and self._use_pallas_int8(p, name)
            and f"{name}/wq" in p
            and in_s is not None
            and x4.shape[-1] % 128 == 0
            and p[f"{name}/wq"].shape[-1] % 128 == 0
            and x4.shape[1] > 2
            and not (pool_pairs and (x4.shape[2] - 1) % 2)
        ):
            from segmentation_tpu.nn.pallas.conv import conv2x2_pool_flat

            if x4.dtype != jnp.int8:
                # region entry (XLA c1_1 output): quantize in XLA — the
                # round/clip fuses into the producer, and the int8 tensor
                # halves the XLA->Pallas boundary copy
                x4 = _quant_act(x4, jnp.float32(in_s))
            q = {"chan_scale": p[f"{name}/wscale"] * in_s}
            out_s = self._out_scale_of(p, name)
            if out_s is not None:
                q["out_scale"] = out_s
            return conv2x2_pool_flat(
                x4, p[f"{name}/wq"], _tile4(p[f"{name}/b"]), relu=relu,
                pool_pairs=pool_pairs, quant=q,
            )
        h4 = self._packed_conv(p, name, x4, relu)
        if h4.dtype == jnp.int8:  # pool on the resident tensor
            pooled = packed_pool_flat(h4, width, True)
        else:
            pooled = packed_pool_flat(h4, width, self.pool_slices)
        if pool_pairs:
            n, hp, wp, cc = pooled.shape
            pooled = pooled.reshape(n, hp, wp // 2, 2 * cc)
        return h4, pooled

    def _skip_scale_of(self, p, name):
        """Scale of the int8-resident SKIP tensor feeding decoder conv
        ``name`` (= the encoder conv's out scale, NOT the crop-local
        ascale_a)."""
        L = self.levels
        i = int(name[4:].split("_")[0]) - (L + 2)
        lvl = L - 1 - i
        return self._out_scale_of(p, f"conv{lvl + 1}_2")

    def _dual_can_fold_crop(self, p, name, skip4, up4) -> bool:
        """The int8 dual kernel folds the skip crop too (its index maps
        only read the cropped window, so the calibrated crop scale still
        applies). Gate mirrors the Pallas branch of _packed_conv_dual."""
        return (
            self._use_pallas_int8(p, name)
            and f"{name}/wq_a" in p
            and f"{name}/ascale_b" in p
            and up4.shape[-1] % 128 == 0
            and up4.shape[1] > 2
        )

    def _packed_conv_dual(self, p, name, skip4, up4, relu=True,
                          a_offset=(0, 0), a_slot_phase=None):
        folded = a_offset != (0, 0) or a_slot_phase is not None
        if (
            self._use_pallas_int8(p, name)
            and f"{name}/wq_a" in p
            and f"{name}/ascale_b" in p
            and up4.shape[-1] % 128 == 0
            and up4.shape[1] > 2
            and (folded or skip4.shape == up4.shape)
        ):
            from segmentation_tpu.nn.pallas.conv import conv2x2_dual_flat

            skip_s = (
                self._skip_scale_of(p, name)
                if skip4.dtype == jnp.int8
                else self._in_scale_of(p, name, "a")
            )
            asb = self._in_scale_of(p, name, "b")
            q = {
                "chan_scale_a": p[f"{name}/wscale_a"] * skip_s,
                "chan_scale_b": p[f"{name}/wscale_b"] * asb,
                "act_scale_b": asb,  # the (bf16) deconv side
            }
            if skip4.dtype != jnp.int8:
                q["act_scale_a"] = skip_s
            out_s = self._out_scale_of(p, name)
            if out_s is not None:
                q["out_scale"] = out_s
            return conv2x2_dual_flat(
                skip4, up4, p[f"{name}/wq_a"], p[f"{name}/wq_b"],
                _tile4(p[f"{name}/b"]), quant=q, relu=relu,
                a_offset=a_offset, a_slot_phase=a_slot_phase,
            )
        assert not folded, "fold gate passed but Pallas branch declined"
        if skip4.dtype == jnp.int8:
            skip4 = skip4.astype(jnp.bfloat16) * self._skip_scale_of(
                p, name
            )
        if self._calibrating is not None:
            self._record(name, skip4)
            self._record(f"{name}@b", up4)
        elif f"{name}/wq_a" in p and f"{name}/ascale_a" in p:
            return int8_packed_conv_dual(
                skip4, up4,
                p[f"{name}/wq_a"], p[f"{name}/wscale_a"],
                p[f"{name}/ascale_a"],
                p[f"{name}/wq_b"], p[f"{name}/wscale_b"],
                p[f"{name}/ascale_b"],
                p[f"{name}/b"], relu,
            )
        return packed_conv3_dual_flat(
            skip4, up4, p[f"{name}/w2a"], p[f"{name}/w2b"], p[f"{name}/b"],
            relu,
        )

    # ---- padded-flat hooks (int8-resident region) --------------------------
    # Same dispatch logic as the 4-D hooks above, on the conv_flat kernels;
    # geometry bookkeeping stays in UNetS2DInference._apply_padflat.
    def _pf_tile(self):
        return 32  # int8 sublane tile: every region stride is 32-aligned

    def _pf_ready(self, p) -> bool:
        entry, packed = self._packed_conv_names()
        dual = set(self._dual_conv_names())
        for n in entry[1:]:
            if f"{n}/wq4" not in p or f"{n}/ascale" not in p:
                return False
        for n in packed:
            if n in dual:
                if f"{n}/wq_a" not in p or f"{n}/ascale_b" not in p:
                    return False
            elif f"{n}/wq" not in p or f"{n}/ascale" not in p:
                return False
        return True

    def _pf_quant(self, p, name, pf, *, out_ok=True):
        """(quant dict, weight key suffix) for a single-operand site."""
        in_s = self._in_scale_of(p, name)
        q = {}
        if pf.dtype != jnp.int8:
            q["act_scale"] = in_s
        out_s = self._out_scale_of(p, name) if out_ok else None
        if out_s is not None:
            q["out_scale"] = out_s
        return q, in_s

    def _pf_entry_chain(self, p, c1, c2, x):
        """Whole level 1 (c1_1 entry + c1_2 + pool) as ONE Pallas kernel
        with the c1_1 tensor VMEM-resident — its HBM write and c1_2's
        read-back (2×1.07 GB at 512²/B=128) never happen. Bit-identical
        to the two-kernel path (tests/test_conv_flat.py,
        test_unet_padflat.py); requant points unchanged (c1_1 at its
        calibrated out_scale = c1_2's ascale)."""
        import os

        from segmentation_tpu.models.unet_fast import (
            PF2, PadFlat, _pallas_backend_ok,
        )
        from segmentation_tpu.nn.pallas import conv_flat as cf

        out_s1 = self._out_scale_of(p, c1)
        out_s2 = self._out_scale_of(p, c2)
        in_s2 = self._in_scale_of(p, c2)
        w = x.shape[2]
        if (
            f"{c1}/we" not in p
            or f"{c2}/wq" not in p
            or out_s1 is None
            or out_s2 is None
            or in_s2 is None
            or self._calibrating is not None
            or not self.allow_pallas
            or not _pallas_backend_ok()
            or os.environ.get("SEG_TPU_FUSED_CHAIN", "1") == "0"
            or os.environ.get("SEG_TPU_FUSED_ENTRY", "1") == "0"
            or w % 4
            or (w // 4) % 32
        ):
            return None
        xt = cf.entry_transform_pf2(x)
        q2 = {"chan_scale": p[f"{c2}/wscale"] * in_s2,
              "out_scale": out_s2}
        y, pooled = cf.entry_chain_pf2(
            xt, p[f"{c1}/we"], p[f"{c1}/wh"], p[f"{c1}/wl"],
            _tile4(p[f"{c1}/b"]), p[f"{c2}/wq"], _tile4(p[f"{c2}/b"]),
            h_img=x.shape[1], out_scale1=out_s1, quant2=q2,
        )
        h1, w1 = (x.shape[1] - 2) // 2, (w - 2) // 2
        return (PF2(y, h1 - 1, w1 - 1, w // 4),
                PadFlat(pooled, h1 - 1, (w1 - 1) // 2, w // 4))

    def _pf_entry_fused(self, p, name, x):
        """One-kernel pf2 entry: pair-major transform of the raw bf16
        input, then conv3entry_pf2 does 3×3 conv + s2d fold + requant in
        one pass — no XLA conv, no relayout copy of the region's biggest
        tensor, bit-comparable to the two-step path (bf16 compute, same
        requant scale)."""
        from segmentation_tpu.models.unet_fast import (
            PF2, _pallas_backend_ok,
        )
        from segmentation_tpu.nn.pallas import conv_flat as cf

        import os

        out_s = self._out_scale_of(p, name)
        w = x.shape[2]
        if (
            f"{name}/we" not in p
            or out_s is None
            or self._calibrating is not None
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
            _tile4(p[f"{name}/b"]), h_img=x.shape[1],
            quant={"out_scale": out_s},
        )
        return PF2(y, (x.shape[1] - 2) // 2, (w - 2) // 2, w // 4)

    def _pf_entry(self, p, name_next, h4, pf2=False):
        # quantize the XLA entry conv's bf16 output at its consumer's
        # calibrated scale; the round/clip fuses into the producer and the
        # pad copy moves int8 bytes instead of bf16
        in_s = self._in_scale_of(p, name_next)
        from segmentation_tpu.models.unet_fast import pf2_from4, pf_from4

        q8 = _quant_act(h4, jnp.float32(in_s))
        if pf2:
            return pf2_from4(q8, self._pf_tile())
        return pf_from4(q8, self._pf_tile())

    def _pf_conv_pool(self, p, name, pf, relu=True):
        from segmentation_tpu.models.unet_fast import PF2, PadFlat
        from segmentation_tpu.nn.pallas import conv_flat as cf

        q, in_s = self._pf_quant(p, name, pf)
        q["chan_scale"] = p[f"{name}/wscale"] * in_s
        if isinstance(pf, PF2):
            y, pooled = cf.conv2x2_pf2(
                pf.x, p[f"{name}/wq"], _tile4(p[f"{name}/b"]),
                h=pf.h, w_real=pf.w, s2=pf.s2, relu=relu, pool=True,
                r_block=32 if pf.h > 64 else None, quant=q,
            )
            return (PF2(y, pf.h - 1, pf.w - 1, pf.s2),
                    PadFlat(pooled, pf.h - 1, (pf.w - 1) // 2, pf.s2))
        y, pooled = cf.conv2x2_padflat(
            pf.x, p[f"{name}/wq"], _tile4(p[f"{name}/b"]),
            h=pf.h, w_real=pf.w, s=pf.s, relu=relu, pool=True, quant=q,
            # post-cast-fix sweep at the c2_2 site (126² C=256 int8):
            # r=32 3.255 / r=64 3.164 vs auto-16 3.393 ms; r=32 stays
            # inside the _fit_r byte model, r=64 would be clamped
            # (benchmarks/pf2_rblock.py)
            r_block=32 if pf.h > 64 else None,
        )
        return (PadFlat(y, pf.h - 1, pf.w - 1, pf.s),
                PadFlat(pooled, pf.h - 1, pf.w - 1, pf.s))

    def _pf_strided(self, p, name, pfp, relu=True):
        from segmentation_tpu.models.unet_fast import PadFlat
        from segmentation_tpu.nn.pallas import conv_flat as cf

        q, in_s = self._pf_quant(p, name, pfp)
        q["chan_scale"] = p[f"{name}/wscale4"] * in_s
        y = cf.conv4x4s2_padflat(
            pfp.x, p[f"{name}/wq4"], _tile4(p[f"{name}/b"]),
            h=pfp.h, w2_real=pfp.w, s2=pfp.s, relu=relu, quant=q,
        )
        return PadFlat(y, (pfp.h - 2) // 2, pfp.w - 1, pfp.s)

    def _pf_conv(self, p, name, pf, relu=True, head=None, head_only=False):
        from segmentation_tpu.models.unet_fast import PF2, PadFlat
        from segmentation_tpu.nn.pallas import conv_flat as cf

        q, in_s = self._pf_quant(p, name, pf, out_ok=head is None)
        q["chan_scale"] = p[f"{name}/wscale"] * in_s
        if isinstance(pf, PF2):
            out = cf.conv2x2_pf2(
                pf.x, p[f"{name}/wq"], _tile4(p[f"{name}/b"]),
                h=pf.h, w_real=pf.w, s2=pf.s2, relu=relu, head=head,
                head_only=head_only, quant=q,
            )
            mk = lambda v: PF2(v, pf.h - 1, pf.w - 1, pf.s2)
            if head is None or head_only:
                return mk(out)
            return mk(out[0]), mk(out[1])
        out = cf.conv2x2_padflat(
            pf.x, p[f"{name}/wq"], _tile4(p[f"{name}/b"]),
            h=pf.h, w_real=pf.w, s=pf.s, relu=relu, head=head,
            head_only=head_only, quant=q,
        )
        if head is None or head_only:
            return PadFlat(out, pf.h - 1, pf.w - 1, pf.s)
        y, mask = out
        return (PadFlat(y, pf.h - 1, pf.w - 1, pf.s),
                PadFlat(mask, pf.h - 1, pf.w - 1, pf.s))

    def _pf_dual(self, p, name, sk, up, relu=True, a_offset=(0, 0),
                 a_slot_phase=None):
        from segmentation_tpu.models.unet_fast import PF2, PadFlat
        from segmentation_tpu.nn.pallas import conv_flat as cf

        skip_s = (
            self._skip_scale_of(p, name)
            if sk.dtype == jnp.int8
            else self._in_scale_of(p, name, "a")
        )
        asb = self._in_scale_of(p, name, "b")
        q = {
            "chan_scale_a": p[f"{name}/wscale_a"] * skip_s,
            "chan_scale_b": p[f"{name}/wscale_b"] * asb,
        }
        if up.dtype != jnp.int8:  # bf16 deconv side quantizes inline;
            q["act_scale_b"] = asb  # int8 deconvs arrive resident at asb
        if sk.dtype != jnp.int8:
            q["act_scale_a"] = skip_s
        out_s = self._out_scale_of(p, name)
        if out_s is not None:
            q["out_scale"] = out_s
        if isinstance(up, PF2):
            assert a_slot_phase is None, "pf2 dual needs slot-even crops"
            y = cf.conv2x2_dual_pf2(
                sk.x, up.x, p[f"{name}/wq_a"], p[f"{name}/wq_b"],
                _tile4(p[f"{name}/b"]), h=up.h, w_real=up.w,
                s2=up.s2, s2_a=sk.s2, hp_a=sk.x.shape[1] // sk.s2,
                relu=relu, a_row_off=a_offset[0], a_col_off=a_offset[1],
                quant=q,
            )
            return PF2(y, up.h - 1, up.w - 1, up.s2)
        y = cf.conv2x2_dual_padflat(
            sk.x, up.x, p[f"{name}/wq_a"], p[f"{name}/wq_b"],
            _tile4(p[f"{name}/b"]), h=up.h, w_real=up.w, s=up.s,
            s_a=sk.s, hp_a=sk.x.shape[1] // sk.s, relu=relu,
            a_offset=a_offset, a_slot_phase=a_slot_phase, quant=q,
            # r=32 wins at c8_1 post saturating-cast fix (pf2_rblock.py)
            r_block=32 if up.h > 64 else None,
        )
        return PadFlat(y, up.h - 1, up.w - 1, up.s)

    # ---- packed-decoder deconvs (int8) --------------------------------
    def _deconv_quant(self, p, up, in_dtype):
        """(quant dict, input scale) for a quantized deconv site, or
        (None, None) when the site is not calibrated.
        SEG_TPU_INT8_DECONV=0 forces the float deconv path (A/B lever:
        the int8 deconv saves HBM bytes but adds a requant epilogue)."""
        if (f"{up}/wqm" not in p
                or os.environ.get("SEG_TPU_INT8_DECONV", "1") == "0"):
            return None, None
        in_s = self._in_scale_of(p, up)
        if in_s is None:
            return None, None
        q = {"chan_scale": p[f"{up}/wscale"] * in_s}
        if in_dtype != jnp.int8:
            q["act_scale"] = in_s
        out_s = self._out_scale_of(p, up)
        if out_s is not None:
            q["out_scale"] = out_s
        return q, in_s

    def _pf_deconv_matmul(self, p, up, h4, width):
        from segmentation_tpu.models.unet_fast import PadFlat, pf_from4
        from segmentation_tpu.nn.pallas import conv_flat as cf

        q, _ = self._deconv_quant(p, up, h4.dtype)
        if q is None:
            if h4.dtype == jnp.int8:  # resident input, float deconv
                h4 = h4.astype(jnp.bfloat16) * self._in_scale_of(p, up)
            return super()._pf_deconv_matmul(p, up, h4, width)
        pf = pf_from4(h4, self._pf_tile())
        y = cf.matmul_rows_padflat(
            pf.x, p[f"{up}/wqm"], _tile4(p[f"{up}/b"]), relu=True,
            quant=q,
        )
        return PadFlat(y, pf.h, pf.w, pf.s)

    def _pf_deconv_packed(self, p, up, pf, width, pf2_out=False):
        from segmentation_tpu.models.unet_fast import (
            PF2, PadFlat, _pf_stride,
        )
        from segmentation_tpu.nn.pallas import conv_flat as cf

        q, in_s = self._deconv_quant(p, up, pf.dtype)
        if q is None:
            if pf.dtype == jnp.int8:  # resident input, float deconv
                in_s = self._in_scale_of(p, up)
                xq = pf.x.astype(jnp.bfloat16) * in_s
                pf = (PF2(xq, pf.h, pf.w, pf.s2) if isinstance(pf, PF2)
                      else PadFlat(xq, pf.h, pf.w, pf.s))
            return super()._pf_deconv_packed(p, up, pf, width, pf2_out)
        if pf2_out:
            y = cf.deconv_packed_padflat(
                pf.x, p[f"{up}/wqm"], _tile4(p[f"{up}/b"]),
                i_in=pf.h, j_in=pf.w, s_i=pf.s, relu=True, pf2_out=True,
                quant=q,
            )
            return PF2(y, 2 * pf.h, 2 * pf.w, pf.s)
        s_out = _pf_stride(2 * pf.w, self._pf_tile())
        y = cf.deconv_packed_padflat(
            pf.x, p[f"{up}/wqm"], _tile4(p[f"{up}/b"]), i_in=pf.h,
            j_in=pf.w, s_i=pf.s, s_out=s_out, relu=True, quant=q,
        )
        return PadFlat(y, 2 * pf.h, 2 * pf.w, s_out)

    # 4-D-path deconv hooks: record calibration abs-max of the deconv
    # input; a resident int8 input hitting this float fallback dequants
    def _deconv4_matmul(self, p, up, h, width):
        if self._calibrating is not None and f"{up}/wqm" in p:
            self._record(up, h)
        elif h.dtype == jnp.int8:
            h = h.astype(jnp.bfloat16) * self._in_scale_of(p, up)
        return super()._deconv4_matmul(p, up, h, width)

    def _deconv4_packed(self, p, up, h, width):
        if self._calibrating is not None and f"{up}/wqm" in p:
            self._record(up, h)
        elif h.dtype == jnp.int8:
            h = h.astype(jnp.bfloat16) * self._in_scale_of(p, up)
        return super()._deconv4_packed(p, up, h, width)

    def _std_conv(self, p, name, h, relu=True):
        quantized = f"{name}/wq" in p and name in self._std_names_cache
        if self._calibrating is not None and quantized:
            if name not in self._std_dual_cache:
                # dual sites record their operands in _std_dual_conv;
                # recording the concat here would inflate ascale_a
                self._record(name, h)
        elif quantized and f"{name}/ascale" in p:
            return int8_conv(
                h, p[f"{name}/wq"], p[f"{name}/wscale"],
                p[f"{name}/ascale"], p[f"{name}/b"], relu,
                out_scale=self._out_scale_of(p, name),
            )
        if h.dtype == jnp.int8:  # resident tensor hitting a float path
            h = h.astype(jnp.bfloat16) * self._in_scale_of(p, name)
        return super()._std_conv(p, name, h, relu)

    def _std_dual_conv(self, p, name, sk, up, relu=True):
        split = f"{name}/wq_a" in p
        if self._calibrating is not None and split:
            self._record(name, sk)          # -> {name}/ascale_a
            self._record(f"{name}@b", up)   # -> {name}/ascale_b
        elif split and f"{name}/ascale_b" in p:
            sk_s = (
                self._skip_scale_of(p, name)
                if sk.dtype == jnp.int8
                else self._in_scale_of(p, name, "a")
            )
            return int8_std_dual_conv(
                sk, up, p[f"{name}/wq_a"], p[f"{name}/wscale_a"], sk_s,
                p[f"{name}/wq_b"], p[f"{name}/wscale_b"],
                self._in_scale_of(p, name, "b"), p[f"{name}/b"], relu,
                out_scale=self._out_scale_of(p, name),
            )
        if sk.dtype == jnp.int8:
            sk = sk.astype(jnp.bfloat16) * self._skip_scale_of(p, name)
        return super()._std_dual_conv(p, name, sk, up, relu)

    @property
    def _std_names_cache(self):
        cache = getattr(self, "_std_names_", None)
        if cache is None:
            cache = set(self._std_conv_names())
            object.__setattr__(self, "_std_names_", cache)
        return cache

    @property
    def _std_dual_cache(self):
        cache = getattr(self, "_std_dual_", None)
        if cache is None:
            cache = set(self._std_dual_names())
            object.__setattr__(self, "_std_dual_", cache)
        return cache
