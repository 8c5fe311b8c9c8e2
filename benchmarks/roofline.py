"""Analytic roofline for the 512² U-Net int8 serving graph on TPU v5e.

Walks the ACTUAL tensor flow of the current formulation (padflat/pf2
packed levels 1-2 + int8-RESIDENT std levels 3-5 + packed decoder) for
the headline config (n_kernels=32, B=128) and computes per site:

  - minimum HBM bytes: every produced tensor written once, read once
    per consuming op, at the dtype the graph actually stores it
    (s8 for resident activations, bf16 at the deconv boundaries);
  - MXU time at spec rates: v5e ≈ 197 TFLOP/s bf16, 394 TOP/s int8
    when the contraction K ≥ 256 (below that the MXU runs int8 at the
    bf16 rate — the stacked-K taps exist exactly to cross that line).

max(bw, mxu) per site, summed = the speed-of-light step for THIS
formulation — the number the measured device profile is judged against
(VERDICT r2 item 1 allows "a measured proof that the roofline itself
is lower" than the 5k north star). A second total drops the two known
formulation taxes (entry relayout copy; up1 masked-slot 4× K tax) =
the ceiling any reformulation of the same math could reach.

History: the r3-early version of this file hand-listed sites with std
channel widths doubled (128→256, 512→1024), modeling a 68.9 ms floor
that the 55.9 ms measured profile then beat — a roofline the
measurement crosses is a bug, hence this programmatic rebuild.

Pure host arithmetic — no TPU needed.
"""

from __future__ import annotations

BW = 819e9          # HBM bytes/s (v5e spec ~819 GB/s)
MXU_BF16 = 197e12   # FLOP/s
MXU_INT8 = 394e12   # int8 FLOP/s at K >= 256
B = 128
K = 32              # n_kernels

SITES = []


def site(name, bytes_, flops_by_rate, note=""):
    """flops_by_rate: list of (flops, K_depth, is_int8) contributions."""
    t_mx = 0.0
    for fl, kd, i8 in flops_by_rate:
        rate = MXU_INT8 if (i8 and kd >= 256) else MXU_BF16
        t_mx += fl / rate
    SITES.append((name, bytes_, t_mx * 1e3, note))


def conv(name, hw_in, ci, co, taps, in_dt, out_dt, kd, i8,
         extra_writes=0, stride=1, note=""):
    """Generic conv-like site. hw_out = hw_in - 1 for the packed 2x2,
    hw_in - 2 for std 3x3, (hw_in - 2) // 2 for the 4x4/2 strided."""
    bpi = 1 if in_dt == "s8" else 2
    bpo = 1 if out_dt == "s8" else 2
    if stride == 2:
        hw_out = (hw_in - 2) // 2
    elif taps == 9:
        hw_out = hw_in - 2
    else:
        hw_out = hw_in - 1
    reads = B * hw_in * hw_in * ci * bpi
    writes = B * hw_out * hw_out * co * bpo + extra_writes
    flops = 2 * B * hw_out * hw_out * co * ci * taps
    site(name, reads + writes, [(flops, kd, i8)], note)
    return hw_out


def main():
    # ---------------- packed encoder (pf2, int8 resident) ----------------
    # entry: pair-major transform + fused pf2 entry kernel (bf16 compute,
    # s8 requant out) — the XLA entry conv and its relayout copy are gone
    c1 = 4 * K  # flat channels, level 1
    h1 = 255
    site("entry pair-major transform", 2 * B * 512 * 512 * 3 * 2, [],
         "raw input moved once (bf16)")
    site("c1_1 fused entry (pallas bf16->s8)",
         B * 512 * 512 * 3 * 2 + B * h1 * h1 * c1 * 1,
         [(2 * B * h1 * h1 * c1 * 3 * 16, 48, False)],
         "K=48 dots; odd cols one extra dot + roll")
    # c1_2 + fused pool; conv out doubles as the level-1 skip
    h = conv("c1_2+pool (pf2 s8)", h1, c1, c1, 4, "s8", "s8",
             2 * c1, True,
             extra_writes=B * (h1 // 2) ** 2 * c1,  # pool out
             note="stacked K=2C=256; skip stays resident")
    hp = h // 2  # 127 packed = 254 real, paired handoff
    # c2_1: 4x4/2 strided conv on the paired pool handoff
    c2 = 4 * 2 * K
    h = conv("c2_1 strided (pf2 s8)", 2 * hp, 2 * K, c2, 16, "s8",
             "s8", 16 * 2 * K, True, stride=2,
             note="paired stacked K=16C=1024")
    h = conv("c2_2+pool (pf2 s8)", h, c2, c2, 4, "s8", "s8",
             2 * c2, True, extra_writes=B * (h // 2) ** 2 * c2,
             note="stacked K=2C=512; skip resident")
    hp2 = h // 2  # 63 packed -> unpacked 125 std

    # ---------------- std encoder (XLA int8, resident) -------------------
    h = 125
    h = conv("conv3_1 (XLA s8)", h, 2 * K, 4 * K, 9, "s8", "s8",
             9 * 2 * K, True)
    h = conv("conv3_2 (XLA s8)", h, 4 * K, 4 * K, 9, "s8", "s8",
             9 * 4 * K, True, note="out = skip, resident")
    site("pool3 (s8 codes)",
         B * h * h * 4 * K + B * (h // 2) ** 2 * 4 * K, [])
    h = h // 2
    h = conv("conv4_1 (XLA s8)", h, 4 * K, 8 * K, 9, "s8", "s8",
             9 * 4 * K, True)
    h = conv("conv4_2 (XLA s8)", h, 8 * K, 8 * K, 9, "s8", "s8",
             9 * 8 * K, True, note="out = skip, resident")
    site("pool4 (s8 codes)",
         B * h * h * 8 * K + B * (h // 2) ** 2 * 8 * K, [])
    h = h // 2
    h = conv("conv5_1 (XLA s8)", h, 8 * K, 16 * K, 9, "s8", "s8",
             9 * 8 * K, True)
    h = conv("conv5_2 (XLA s8->bf16)", h, 16 * K, 16 * K, 9, "s8",
             "bf16", 9 * 16 * K, True, note="feeds bf16 deconv")

    # ---------------- std decoder ----------------------------------------
    # deconv6: 2x2/2 transposed, bf16 (24 -> 48)
    h6 = 2 * h
    site("deconv6 (bf16)",
         B * h * h * 16 * K * 2 + B * h6 * h6 * 8 * K * 2,
         [(2 * B * h6 * h6 * 8 * K * 16 * K, 16 * K, False)])
    # skip crop 56 -> 48 (materialized window copy, s8)
    site("crop skip4 (s8)", 2 * B * 48 * 48 * 8 * K, [])
    h = conv("conv6_1 dual split (s8+bf16)", h6, 8 * K, 8 * K, 9,
             "s8", "s8", 9 * 8 * K, True,
             extra_writes=B * h6 * h6 * 8 * K,  # bf16 up side read 2B/elem
             note="skip half s8-resident, up half bf16")
    h = conv("conv6_2 (XLA s8->bf16)", h, 8 * K, 8 * K, 9, "s8",
             "bf16", 9 * 8 * K, True, note="feeds bf16 deconv")
    h7 = 2 * h
    site("deconv7 (bf16)",
         B * h * h * 8 * K * 2 + B * h7 * h7 * 4 * K * 2,
         [(2 * B * h7 * h7 * 4 * K * 8 * K, 8 * K, False)])
    site("crop skip3 (s8)", 2 * B * h7 * h7 * 4 * K, [])
    h = conv("conv7_1 dual split (s8+bf16)", h7, 4 * K, 4 * K, 9,
             "s8", "s8", 9 * 4 * K, True,
             extra_writes=B * h7 * h7 * 4 * K,
             note="skip half s8-resident")
    h = conv("conv7_2 (XLA s8)", h, 4 * K, 4 * K, 9, "s8",
             "s8", 9 * 4 * K, True,
             note="emits s8 at the quantized up2's scale")

    # ---------------- packed decoder (pf/pf2) ----------------------------
    # up2: 2x2/2 deconv as one matmul into packed layout (84 -> packed
    # 84), int8 resident (conv7_2 emits s8 at the deconv's scale)
    site("up2 matmul (s8)",
         B * h * h * 4 * K * 1 + B * h * h * 8 * K * 1,
         [(2 * B * h * h * 4 * K * 8 * K, 4 * K, True)])
    # c8_1 dual: skip = c2_2 resident s8 (crop rides the kernel), up bf16
    hq = conv("c8_1 dual (pf s8+bf16)", h, 2 * c2, 2 * K * 4, 4,
              "s8", "s8", 2 * c2, True, note="crop-folded skip")
    hq = conv("c8_2 (pf s8)", hq, c2, c2, 4, "s8", "s8",
              2 * c2, True, note="emits s8 at the quantized up1's scale")
    # up1: pf2 masked-slot deconv (82 -> 164 packed), int8 resident —
    # the masked zero-padding pushes K to 4C=256 where the int8 rate
    # halves the 4x-K tax
    hu = 2 * hq
    site("up1 deconv pf2 (s8)",
         B * hq * hq * c2 * 1 + B * hu * hu * c1 * 1,
         [(2 * B * hu * hu * c1 * c2 * 4, c2 * 4, True)],
         "masked-slot dots: 4x K formulation tax (halved at int8 rate)")
    hq = conv("c9_1 dual pf2 (s8+bf16)", hu, 2 * c1, c1, 4, "s8",
              "s8", 2 * c1, True, note="crop-folded level-1 skip")
    # c9_2 + fused nc=2 head: mask-only output (u8), no conv out write
    site("c9_2+head pf2 (mask only)",
         B * hq * hq * c1 * 1 + B * (2 * (hq - 1)) ** 2 * 1,
         [(2 * B * (hq - 1) ** 2 * c1 * c1 * 4, 2 * c1, True),
          (2 * B * (hq - 1) ** 2 * c1 * 2 * 4, c1, False)],
         "head rides the epilogue")

    # ---------------- report ---------------------------------------------
    tot = 0.0
    tax = 0.0
    print(f"{'site':36s} {'GB':>6s} {'ms(bw)':>7s} {'ms(mxu)':>8s} "
          f"{'ms(max)':>8s}")
    for name, bytes_, t_mx, note in SITES:
        t_bw = bytes_ / BW * 1e3
        t = max(t_bw, t_mx)
        tot += t
        if "tax" in note:
            ideal = (0.0 if "relayout" in name
                     else max(t_bw, t_mx / 4))  # drop the 4x K tax
            tax += t - ideal
        print(f"{name:36s} {bytes_ / 1e9:6.2f} {t_bw:7.2f} {t_mx:8.2f} "
              f"{t:8.2f}  {note}")
    print(f"\nformulation roofline = {tot:.1f} ms -> "
          f"{B / tot * 1e3:.0f} img/s (B={B})")
    print(f"w/o known formulation taxes = {tot - tax:.1f} ms -> "
          f"{B / (tot - tax) * 1e3:.0f} img/s")
    measured_floor()


def measured_floor():
    """MEASURED per-site floor vs the in-context profile (2026-08-18,
    post commit 508905c: entry r=32, bf16 dual-std intermediate).

    The spec table above prices HBM at 819 GB/s and ignores the VPU
    epilogue and Mosaic store structure. Three measured corrections
    (all from benchmarks/kernel_anatomy.py, dual_entry_anatomy.py,
    pf2_rblock.py on the real chip):

      1. achievable stream BW is 651 GB/s (copy probe: 2.14 GB moved in
         3.29 ms) -> every bw-bound term scales 1.26x;
      2. the requant+pool epilogue is VPU-serial: +2.0 ms measured at
         the c1_2 site on top of the raw load/dot/store form;
      3. the split-store+patch structure costs +2.05 ms at c1_2 and is
         NOT removable: six reformulations (acc-concat, Element
         overlapping windows, store+VMEM-overwrite, shift-and-append
         operands, side-tensor+DUS patch-in, r_block growth) all
         measured slower or failed to compile.

    floor kinds: M = direct measurement of an equal-work form,
    I = best isolated run of the shipped kernel (r_block sweep),
    E = spec scaled to measured BW (no direct probe).
    """
    ctx = [  # (site, in-context ms, floor ms, kind, provenance)
        ("entry pair-major copy", 0.64, 0.62, "E", "stream-BW relayout"),
        ("level-1 chain (c1_1+c1_2+pool)", 11.32, 10.24, "M",
         "ONE fused kernel, c1_1 VMEM-resident (entry_chain_pf2); "
         "floor = entry 4.31 (r-sweep/tap-minor exhausted) + c1_2 5.93 "
         "(anatomy base form; 6 store reformulations all worse). The "
         "2.1 GB saved HBM round-trip bought only ~1 ms: the site is "
         "compute-bound (MXU+VPU serialize per block, DMA was hidden)"),
        ("c2_1 strided", 3.83, 3.40, "E", "spec MXU x1.26 est"),
        ("c2_2+pool", 4.50, 4.32, "I", "isolated r=32"),
        ("std XLA levels 3-5+6-7", 11.33, 9.33, "E",
         "sum of clamp_convert fusions; spec x1.26"),
        ("up2 matmul", 1.01, 0.53, "E", "spec x1.26"),
        ("c8_1 dual plain", 4.91, 4.80, "I", "isolated r=32"),
        ("c8_2", 2.15, 1.70, "E", "spec x1.26"),
        ("up1 deconv pf2", 2.47, 2.47, "I", "at spec incl. 4xK tax"),
        ("c9_1 dual pf2", 5.47, 5.30, "M",
         "A-blocked probe (scratch fill is only 0.8 ms; stride "
         "unification costs more in padding traffic than it saves)"),
        ("c9_2+head", 2.91, 2.40, "E", "spec x1.26 + head dots"),
        ("misc small ops", 6.46, 5.00, "E", "residual to 57.0 total"),
    ]
    t_ctx = sum(r[1] for r in ctx)
    t_fl = sum(r[2] for r in ctx)
    print(f"\n{'site':28s} {'ctx ms':>7s} {'floor':>7s} kind")
    for name, c, f, k, note in ctx:
        print(f"{name:28s} {c:7.2f} {f:7.2f}  {k}   {note}")
    print(f"\nmeasured in-context total = {t_ctx:.1f} ms "
          f"({B / t_ctx * 1e3:.0f} img/s)")
    print(f"measured/estimated floor  = {t_fl:.1f} ms "
          f"({B / t_fl * 1e3:.0f} img/s) -> shipped at "
          f"{100 * t_fl / t_ctx:.0f}% of floor")


if __name__ == "__main__":
    main()
