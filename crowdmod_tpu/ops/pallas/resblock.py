"""Weight-stationary fused UNet ResnetBlock kernel (transposed layout).

One ``pallas_call`` computes a whole reference ResnetBlock —
GN(8)+SiLU → 3×3×3 conv → +time-embedding → GN(8)+SiLU → 3×3×3 conv →
(+1×1 skip-match) → residual — with every weight and all intermediate
activations resident in VMEM.  This is the "weight-resident fused resblock
chain" lever from PERF.md: the reference UNet's level-0 blocks
(models/backbones/layers.py:21-78 upstream; unet3d.py:49-91 here) dominate
the DDPM sampler step, and the XLA path pays an HBM round-trip and a
narrow-channel conv schedule at every op boundary.

Design (why it can beat XLA's 25 %-MXU-capped narrow convs):

* **Transposed padded layout** ``(C, Bt·P)`` with ``P = (T+2)(H+2)(W+2)``
  flattened spatial positions on the *lane* dimension (``Bt`` whole samples
  per grid step, concatenated along lanes) and channels on sublanes.  At
  C = 32 the channels-last layout leaves 3/4 of the VPU's 128 lanes idle for
  every normalization sweep; transposed, GN/SiLU/masking run at full width,
  and batching samples into the lane dim amortizes per-grid-step overhead.
* **Tap-packed GEMMs.**  A 3×3×3 SAME conv becomes ONE matmul
  ``A (9·Cout, 3·Cin) @ X3 (3·Cin, Bt·P)``: the three ``dw`` taps are packed
  into K (two lane-rolls of the normalized activation) and the nine
  ``(dt, dh)`` taps into M; output row groups are then shift-added with lane
  rolls.  M = 9·Cout, K = 3·Cin, N = Bt·P — every GEMM dimension is
  MXU-shaped, escaping the N = Cout = 32 output-tile cap (≈25 % utilization)
  that binds the XLA conv at reference widths (PERF.md "the UNet 25k
  question").
* **Zero-padding algebra.**  All math runs over padded flat volumes; the
  padding ring is kept exactly zero between stages (masked after every
  nonlinearity) so conv taps read zeros at borders — identical to SAME
  semantics.  Roll wrap-around garbage provably lands inside a padding ring:
  the maximum shift is HpWp + Wp while the first/last valid flat index of a
  sample block is HpWp + Wp + 1 from either block end — this also covers the
  roll spill *between* adjacent sample blocks in the lane dim.
* **Per-sample statistics via indicator matmuls.**  GroupNorm is
  per-sample: channel×sample sums come from one ``(C, Bt·P) @ (Bt·P, Bt)``
  block-indicator dot, group reduction/broadcast from tiny one-hot dots, and
  the (scale, shift) maps return to ``(C, Bt·P)`` through a single
  ``(2C, Bt) @ (Bt, Bt·P)`` dot — no lane-dim reshapes, which Mosaic forbids.

The kernel is inference-path only (``deterministic=True``; the reference
block's Dropout3d is identity there).  A custom VJP differentiates through
the jnp reference implementation so the op stays trainable if it ever lands
in a loss.  Mosaic constraint honored throughout: lane rotates only support
32-bit element types, so every roll runs on f32 with casts at the stores.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Reference implementation (parity oracle, CPU path, and VJP backward)
# ---------------------------------------------------------------------------

def resblock_reference(x, temb_proj, w, *, num_groups=8, eps=1e-5):
    """jnp oracle for one ResnetBlock3D (deterministic), channels-last.

    Args:
      x: ``(B, T, H, W, Cin)`` activations.
      temb_proj: ``(B, Cout)`` — the block's ``time_dense`` output, i.e.
        ``silu(temb) @ Wt + bt`` (computed by the caller; it is a tiny GEMM).
      w: dict with ``gn1_scale/gn1_bias (Cin,)``, ``w1 (3,3,3,Cin,Cout)``,
        ``b1 (Cout,)``, ``gn2_scale/gn2_bias (Cout,)``, ``w2
        (3,3,3,Cout,Cout)``, ``b2 (Cout,)`` and, when Cin != Cout,
        ``w_skip (1,1,1,Cin,Cout)`` + ``b_skip (Cout,)``.
    """
    from crowdmod_tpu.ops.conv3d import conv3d_same
    from crowdmod_tpu.ops.pallas.groupnorm import group_norm_reference

    dt = x.dtype
    h = group_norm_reference(
        x, w["gn1_scale"], w["gn1_bias"], num_groups, eps, True
    )
    h = conv3d_same(h, w["w1"].astype(dt), "direct") + w["b1"].astype(dt)
    h = h + temb_proj.astype(dt)[:, None, None, None, :]
    h = group_norm_reference(
        h, w["gn2_scale"], w["gn2_bias"], num_groups, eps, True
    )
    h = conv3d_same(h, w["w2"].astype(dt), "direct") + w["b2"].astype(dt)
    if "w_skip" in w:
        skip = jax.lax.conv_general_dilated(
            x, w["w_skip"].astype(dt), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + w["b_skip"].astype(dt)
    else:
        skip = x
    return h + skip


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _pack_conv(kernel):
    """``(3,3,3,Cin,Cout) → (9·Cout, 3·Cin)`` GEMM weights.

    Row r = (dt·3 + dh)·Cout + co;  col k = dw·Cin + ci.
    """
    _, _, _, cin, cout = kernel.shape
    return kernel.transpose(0, 1, 4, 2, 3).reshape(9 * cout, 3 * cin)


def _silu(a):
    return a * jax.nn.sigmoid(a)


def _resblock_kernel(
    x_ref, tvec_ref, a1_ref, a2_ref, gn1_ref, gn2_ref, b2_ref, ws_ref,
    o_ref, x3, y9, x32,
    *, dims, bt, num_groups, eps, has_skip,
):
    t, h_, w_ = dims
    hp, wp = h_ + 2, w_ + 2
    hpwp = hp * wp
    p = hpwp * (t + 2)          # one sample's padded flat volume
    cin = x3.shape[0] // 3
    cout = x32.shape[0] // 3
    pbt = x3.shape[1]           # = bt * p
    cdt = o_ref.dtype
    f32 = jnp.float32

    # Lane-dim index fields: position within the sample block + block id.
    s = jax.lax.broadcasted_iota(jnp.int32, (1, pbt), 1)
    blk = s // p
    q = s - blk * p
    qt = q // hpwp
    qr = q - qt * hpwp
    qh = qr // wp
    qw = qr - qh * wp
    maskf = (
        (qt >= 1) & (qt <= t) & (qh >= 1) & (qh <= h_) & (qw >= 1) & (qw <= w_)
    ).astype(f32)
    # Block-indicator (Bt, Bt·P): ind[j, s] = 1 iff lane s belongs to
    # sample j.  Broadcasts per-sample scalars to lanes via one dot.
    ind = (
        jax.lax.broadcasted_iota(jnp.int32, (bt, pbt), 0) == blk
    ).astype(f32)

    member1 = (
        jax.lax.broadcasted_iota(jnp.int32, (cin, num_groups), 0)
        // (cin // num_groups)
        == jax.lax.broadcasted_iota(jnp.int32, (cin, num_groups), 1)
    ).astype(f32)
    member2 = (
        jax.lax.broadcasted_iota(jnp.int32, (cout, num_groups), 0)
        // (cout // num_groups)
        == jax.lax.broadcasted_iota(jnp.int32, (cout, num_groups), 1)
    ).astype(f32)
    n1 = float(t * h_ * w_ * (cin // num_groups))
    n2 = float(t * h_ * w_ * (cout // num_groups))

    def gn_scale_shift(xf, member, n, gn_ref, c):
        """Per-(channel, sample) affine maps A, B with GN(x) = x·A + B,
        broadcast to (c, Bt·P) through indicator dots.  No concatenation of
        sub-tile arrays — Mosaic cannot concat mismatched vector paddings."""
        lane_sum = lambda a: jax.lax.dot_general(
            a, ind, (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )  # (c, Bt·P) → (c, Bt)
        s1 = lane_sum(xf)
        s2 = lane_sum(xf * xf)
        to_g = lambda a: jax.lax.dot_general(
            member, a, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )  # (c, Bt) → (G, Bt)
        mean_g = to_g(s1) / n
        var_g = to_g(s2) / n - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
        back = lambda a: jnp.dot(member, a, preferred_element_type=f32)
        mean_c = back(mean_g)     # (c, Bt)
        rstd_c = back(rstd_g)
        sc = gn_ref[:, 0:1]
        bi = gn_ref[:, 1:2]
        a_cb = rstd_c * sc
        b_cb = bi - mean_c * a_cb
        widen = lambda a: jnp.dot(a, ind, preferred_element_type=f32)
        return widen(a_cb), widen(b_cb)  # (c, Bt·P) each

    def tap_pack(src, block, three_c):
        """Write [roll(+1), src, roll(-1)] into the 3-block scratch.
        ``src`` must be f32 (Mosaic lane rotate is 32-bit only)."""
        c = three_c // 3
        block[c: 2 * c] = src.astype(block.dtype)
        block[0:c] = pltpu.roll(src, 1, 1).astype(block.dtype)
        block[2 * c: 3 * c] = pltpu.roll(src, pbt - 1, 1).astype(block.dtype)

    def shift_add(ybuf, c):
        """Σ over the 9 (dt, dh) row groups with the matching lane shift."""
        acc = None
        for g in range(9):
            dt_, dh_ = g // 3, g % 3
            sh = -((dt_ - 1) * hpwp + (dh_ - 1) * wp)
            part = ybuf[g * c: (g + 1) * c].astype(f32)
            if sh:
                part = pltpu.roll(part, sh % pbt, 1)
            acc = part if acc is None else acc + part
        return acc  # (c, Bt·P) f32

    # ---- GN1 + SiLU (input padding ring is zero → sums are exact) --------
    x = x_ref[0]
    xf = x.astype(f32)
    a_map, b_map = gn_scale_shift(xf, member1, n1, gn1_ref, cin)
    xn = _silu(xf * a_map + b_map) * maskf

    # ---- conv1 as one tap-packed GEMM ------------------------------------
    tap_pack(xn, x3, 3 * cin)
    y9[:] = jnp.dot(
        a1_ref[:], x3[:], preferred_element_type=f32
    ).astype(y9.dtype)
    h1 = shift_add(y9, cout)

    # +time embedding (conv1 bias folded in by the wrapper), broadcast per
    # sample via the indicator dot; re-zero the padding ring (shift-add wrap
    # garbage + the broadcast add polluted it).
    tvecw = jnp.dot(
        tvec_ref[0].astype(f32), ind, preferred_element_type=f32
    )  # (Cout, Bt·P)
    h1 = (h1 + tvecw) * maskf

    # ---- GN2 + SiLU -------------------------------------------------------
    a_map, b_map = gn_scale_shift(h1, member2, n2, gn2_ref, cout)
    xn2 = _silu(h1 * a_map + b_map) * maskf

    # ---- conv2 ------------------------------------------------------------
    tap_pack(xn2, x32, 3 * cout)
    y9[: 9 * cout] = jnp.dot(
        a2_ref[:], x32[:], preferred_element_type=f32
    ).astype(y9.dtype)
    h2 = shift_add(y9, cout)

    # ---- bias + skip + residual -------------------------------------------
    if has_skip:
        skip = jnp.dot(ws_ref[:], x, preferred_element_type=f32)
    else:
        skip = xf
    out = (h2 + b2_ref[:].astype(f32) + skip) * maskf  # (Cout,1) broadcasts
    o_ref[0] = out.astype(cdt)


def _resblock_vmem_bytes(cin, cout, pbt, itemsize):
    """Rough live-set bound used to pick Bt (scratch + blocks + f32 temps)."""
    scratch = (3 * cin + 9 * cout + 3 * cout) * pbt * itemsize
    blocks = 2 * (cin + cout) * pbt * itemsize  # double-buffered in/out
    temps = (cin + 3 * cout) * pbt * 4
    return scratch + blocks + temps


def _fused_pallas(xt, tvec, a1, a2, gn1, gn2, b2, ws, dims, bt, num_groups,
                  eps, interpret):
    nblk, cin, pbt = xt.shape
    cout = a1.shape[0] // 9
    has_skip = ws is not None
    cdt = xt.dtype

    sample = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    shared = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        sample((cin, pbt)),
        sample((cout, bt)),
        shared(a1.shape),
        shared(a2.shape),
        shared(gn1.shape),
        shared(gn2.shape),
        shared(b2.shape),
    ]
    args = [xt, tvec, a1, a2, gn1, gn2, b2]
    common = dict(dims=dims, bt=bt, num_groups=num_groups, eps=eps)
    if has_skip:
        in_specs.append(shared(ws.shape))
        args.append(ws)
        kernel = partial(_resblock_kernel, has_skip=True, **common)
    else:
        body = partial(_resblock_kernel, has_skip=False, **common)

        def kernel(x_r, tv_r, a1_r, a2_r, g1_r, g2_r, b2_r, o_r, s1, s2, s3):
            body(x_r, tv_r, a1_r, a2_r, g1_r, g2_r, b2_r, None, o_r,
                 s1, s2, s3)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nblk, cout, pbt), cdt),
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=sample((cout, pbt)),
        scratch_shapes=[
            pltpu.VMEM((3 * cin, pbt), cdt),   # x3 (tap-packed GN1 output)
            pltpu.VMEM((9 * cout, pbt), cdt),  # y9 (tap-packed GEMM output)
            pltpu.VMEM((3 * cout, pbt), cdt),  # x32 (tap-packed GN2 output)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Wrapper: layout transforms + weight packing + custom VJP
# ---------------------------------------------------------------------------

def _pick_bt(b, cin, cout, p, itemsize, budget=48 * 1024 * 1024):
    bt = 1
    for cand in (2, 4, 8, 16):
        if b % cand:
            break
        if _resblock_vmem_bytes(cin, cout, cand * p, itemsize) > budget:
            break
        bt = cand
    return bt


def _run(x, temb_proj, w, num_groups, eps, interpret, bt):
    b, t, h_, w_, cin = x.shape
    cout = w["w1"].shape[-1]
    cdt = x.dtype
    p = (t + 2) * (h_ + 2) * (w_ + 2)
    if bt is None:
        bt = _pick_bt(b, cin, cout, p, jnp.dtype(cdt).itemsize)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    # (B, P, Cin) → (B/bt, Cin, bt·P): bt sample blocks concatenated on lanes.
    xt = (
        xp.reshape(b // bt, bt, p, cin)
        .transpose(0, 3, 1, 2)
        .reshape(b // bt, cin, bt * p)
        .astype(cdt)
    )

    a1 = _pack_conv(w["w1"]).astype(cdt)
    a2 = _pack_conv(w["w2"]).astype(cdt)
    gn1 = jnp.stack(
        [w["gn1_scale"], w["gn1_bias"]], axis=1
    ).astype(jnp.float32)  # (Cin, 2)
    gn2 = jnp.stack(
        [w["gn2_scale"], w["gn2_bias"]], axis=1
    ).astype(jnp.float32)
    tvec = (
        temb_proj.astype(cdt) + w["b1"].astype(cdt)[None, :]
    ).astype(jnp.float32)  # (B, Cout)
    tvec = tvec.reshape(b // bt, bt, cout).transpose(0, 2, 1)  # (., Cout, bt)
    b2 = w["b2"].astype(jnp.float32)
    ws = None
    if "w_skip" in w:
        ws = w["w_skip"].reshape(cin, cout).T.astype(cdt)  # (Cout, Cin)
        b2 = b2 + w["b_skip"].astype(jnp.float32)
    b2 = b2[:, None]  # (Cout, 1)

    out_t = _fused_pallas(
        xt, tvec, a1, a2, gn1, gn2, b2, ws,
        (t, h_, w_), bt, num_groups, eps, interpret,
    )
    out = (
        out_t.reshape(b // bt, cout, bt, p)
        .transpose(0, 2, 3, 1)
        .reshape(b, t + 2, h_ + 2, w_ + 2, cout)
    )
    return out[:, 1:-1, 1:-1, 1:-1, :]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused(x, temb_proj, w, num_groups, eps, interpret, bt):
    return _run(x, temb_proj, w, num_groups, eps, interpret, bt)


def _fused_fwd(x, temb_proj, w, num_groups, eps, interpret, bt):
    return (
        _run(x, temb_proj, w, num_groups, eps, interpret, bt),
        (x, temb_proj, w),
    )


def _fused_bwd(num_groups, eps, interpret, bt, res, g):
    x, temb_proj, w = res
    _, vjp = jax.vjp(
        lambda xx, tt, ww: resblock_reference(
            xx, tt, ww, num_groups=num_groups, eps=eps
        ),
        x, temb_proj, w,
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_resblock(
    x: jnp.ndarray,
    temb_proj: jnp.ndarray,
    w: dict,
    *,
    num_groups: int = 8,
    eps: float = 1e-5,
    mode: str | None = None,
    bt: int | None = None,
) -> jnp.ndarray:
    """One fused ResnetBlock3D forward (deterministic path).

    ``x (B, T, H, W, Cin) → (B, T, H, W, Cout)``; see
    :func:`resblock_reference` for the weight dict contract.  ``bt`` pins
    the samples-per-grid-step lane packing (default: auto by VMEM budget).
    """
    from crowdmod_tpu.ops.pallas import pallas_mode

    mode = mode or pallas_mode("resblock")
    cin, cout = x.shape[-1], w["w1"].shape[-1]
    if mode == "off" or cin % num_groups or cout % num_groups or cin % 8:
        return resblock_reference(x, temb_proj, w, num_groups=num_groups,
                                  eps=eps)
    return _fused(x, temb_proj, w, num_groups, eps, mode == "interpret", bt)
