"""Analytic roofline for the 512² U-Net serving graph on TPU v5e.

Computes, per site of the int8 padflat/pf2 serving graph, the minimum
HBM bytes (inputs read once + outputs written once, resident dtypes as
the graph actually stores them) and the MXU time at spec rates
(v5e ≈ 197 TFLOP/s bf16, 394 TOP/s int8 — int8 rate requires K ≥ 256;
below that the MXU runs at the bf16 rate, which is what the K=C=128
packed convs see). The max of the two per site, summed, is the
speed-of-light step time for THIS formulation — the number the
measured profile should be judged against (VERDICT r2 item 1 allows
"a measured proof that the roofline itself is lower" than the 5k
north star).

Prints a per-site table plus the roofline img/s, and compares against
the latest measured device profile if one is pasted in MEASURED.

Pure host arithmetic — no TPU needed.
"""

from __future__ import annotations

BW = 819e9            # HBM bytes/s (v5e spec ~819 GB/s)
MXU_BF16 = 197e12     # FLOP/s
MXU_INT8 = 394e12     # int8 FLOP/s at K >= 256
B = 128


def conv_cost(name, h_in, w_in, c, o, taps, dtype_in, dtype_out,
              k_depth, extra_out=0.0, note=""):
    """One conv-like site: returns (bytes, flops, mxu_rate)."""
    bpi = 1 if dtype_in == "s8" else 2
    bpo = 1 if dtype_out == "s8" else 2
    h_out, w_out = h_in - 1, w_in - 1
    if taps == 16:  # 4x4/2 strided
        h_out, w_out = (h_in - 2) // 2, (w_in - 2) // 2
    reads = B * h_in * w_in * c * bpi
    writes = B * h_out * w_out * o * bpo * (1 + extra_out)
    flops = 2 * B * h_out * w_out * o * c * taps
    rate = MXU_INT8 if (dtype_in == "s8" and k_depth >= 256) else MXU_BF16
    return name, reads + writes, flops, rate, note


def main():
    sites = [
        # entry: XLA bf16 conv (reads input, writes s8 via fused clamp)
        ("c1_1 entry conv (XLA)", B * 512 * 512 * 3 * 2
         + B * 255 * 256 * 128 * 1,
         2 * B * 255 * 255 * 128 * 48, MXU_BF16, "C=3: MXU-starved"),
        ("entry pf2 relayout copy", 2 * B * 255 * 256 * 128 * 1, 0, 1,
         "transposing copy, unavoidable w/o producer layout control"),
        conv_cost("c1_2+pool (pf2)", 255, 255, 128, 128, 4, "s8", "s8",
                  128, extra_out=0.25, note="pool out O/4 paired"),
        conv_cost("c2_1 strided", 254, 127 * 2, 64, 256, 16, "s8", "s8",
                  512, note="paired K-stacked 8C=512"),
        conv_cost("c2_2+pool", 126, 126, 256, 256, 4, "s8", "s8", 256,
                  extra_out=0.25),
        # std levels (XLA int8, batch-minor layouts) — conv pairs + pools
        conv_cost("conv3_1 (XLA)", 125, 125, 64, 256, 9, "s8", "bf16",
                  64),
        conv_cost("conv3_2 (XLA)", 123, 123, 256, 256, 9, "s8", "bf16",
                  256),
        conv_cost("conv4_1 (XLA)", 60, 60, 256, 512, 9, "s8", "bf16",
                  256),
        conv_cost("conv4_2 (XLA)", 58, 58, 512, 512, 9, "s8", "bf16",
                  512),
        conv_cost("conv5_1 (XLA)", 28, 28, 512, 1024, 9, "s8", "bf16",
                  512),
        conv_cost("conv5_2 (XLA)", 26, 26, 1024, 1024, 9, "s8", "bf16",
                  1024),
        # std decoder
        conv_cost("conv6_* + up (XLA)", 48, 48, 1024, 512, 9 + 4, "s8",
                  "bf16", 512, note="upconv+2 convs lumped"),
        conv_cost("conv7_* + up (XLA)", 88, 88, 512, 256, 9 + 4, "s8",
                  "bf16", 256, note="lumped"),
        # packed decoder
        ("up2 matmul (pad+dot)", 2 * B * 84 * 84 * 128 * 2
         + B * 84 * 96 * 256 * 2,
         2 * B * 84 * 84 * 128 * 256, MXU_BF16, "bf16"),
        conv_cost("c8_1 dual", 84, 84, 256 * 2, 256, 4, "s8", "s8", 256,
                  note="two operands"),
        conv_cost("c8_2", 83, 83, 256, 256, 4, "s8", "bf16", 256),
        ("up1 deconv pf2", B * 82 * 96 * 256 * 2
         + B * 164 * 96 * 256 * 2,
         2 * B * 82 * 82 * 64 * 128 * 4 * 4, MXU_BF16,
         "masked-slot dots 4x K tax"),
        conv_cost("c9_1 dual pf2", 164, 164, 128 * 2, 128, 4, "s8", "s8",
                  128, note="skip s8 + up bf16"),
        ("c9_2+head pf2 (mask only)", B * 163 * 96 * 2 * 128 * 1
         + B * 162 * 96 * 8 * 1,
         2 * B * 162 * 162 * 128 * 128 * 4, MXU_BF16, "head_only"),
    ]
    tot = 0.0
    print(f"{'site':34s} {'GB':>6s} {'ms(bw)':>7s} {'ms(mxu)':>8s} "
          f"{'ms(max)':>8s}")
    for name, bytes_, flops, rate, *note in sites:
        t_bw = bytes_ / BW * 1e3
        t_mx = (flops / rate * 1e3) if flops else 0.0
        t = max(t_bw, t_mx)
        tot += t
        print(f"{name:34s} {bytes_ / 1e9:6.2f} {t_bw:7.2f} {t_mx:8.2f} "
              f"{t:8.2f}  {note[0] if note else ''}")
    print(f"\nroofline step = {tot:.1f} ms  ->  {B / tot * 1e3:.0f} img/s "
          f"(B={B})")
    print("measured r3: device 55.9 ms = 2290 img/s device-bound; "
          "wall 59.5 = 2150 (B=128), 115.7 = 2212 (B=256)")


if __name__ == "__main__":
    main()
