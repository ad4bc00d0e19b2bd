"""Fused tri-plane sampling with a Pallas splat kernel for the plane gradient.

Counterpart of the reference's tri-plane feature lookup
(src/training/tri_plane_renderer.py:577-585, F.grid_sample align_corners=True)
and — crucially — of its CUDA grid_sample *backward*: on TPU, XLA lowers the
gather VJP to a serialized scatter-add costing ~3.2 s of the 6.6 s train step
(docs/DESIGN.md performance ledger). This module replaces that scatter with a
sort + MXU one-hot accumulation kernel.

Design (probe-validated in scripts/testing/probe_onehot_splat2.py and
probe_sort_carry.py):

  forward   : the measured-fastest XLA path — ONE flat gather for all four
              bilinear corners of all three planes, weighted sum, plane mean.
  backward  : d/d planes is a scatter of E = N*3*P weighted rows into the
              [N*3*H*W, F] plane table. We reformulate it as dense matmuls:
                1. build one entry per (plane, point): value row v = g/3 and
                   bilinear corner weights remapped onto a 2-row window
                2. sort entries by "window" = (plane, row-pair). A point's 4
                   corners span exactly 2 adjacent texel rows, so windows of
                   2 full rows x W texels capture all corners; two window
                   families (pairs starting at even / odd rows) cover both
                   point parities. argsort + row-take of the packed entries
                   measures ~126 ms at production size (probe_sort_carry).
                3. a Pallas kernel walks a (chunk, window) worklist: for each
                   item it builds weighted bilinear one-hot matrices [K, W]
                   on the VPU and accumulates vals^T @ onehot into the
                   resident [F, 2W] window block on the MXU. Output blocks
                   stay in VMEM across consecutive grid steps with the same
                   scalar-prefetched index (standard Pallas revisiting rule),
                   so each window is zeroed once and accumulated in place.
              d/d coords falls out of the saved corner values (elementwise).

The one-hot MXU trick: scatter-add of rows v_e into texel columns t_e equals
(one_hot(t) * w)^T summed against v — a matmul. XLA's scatter runs at
~40 us/row; the matmul form runs at ~10 ns/entry (probe_onehot_splat2.py).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# plane projections: x/y, x/z, y/z (ref tri_plane_renderer.py:577-581)
_PROJ = ((0, 1), (0, 2), (1, 2))

# entries per kernel chunk. The worklist has one item per (chunk, window)
# run, so larger chunks trade VMEM scratch + wasted masked MXU work for
# fewer sequential grid steps (~ n_chunks + n_visited_windows of them);
# TDGP_SPLAT_CHUNK is the measurement knob.
_CHUNK = int(os.environ.get('TDGP_SPLAT_CHUNK', '512'))

# texel rows per window. 2 = the shipped two-matmul kernel (one window pair
# per bilinear footprint parity). Wider windows (4, 8, ...) divide n_windows
# by wrows/2 — and the worklist is ~n_chunks + n_windows sequential grid
# steps, so if per-item overhead dominates post-hoist (TODO: measure), fewer
# items win. Wide windows use the generalized single-matmul kernel
# (_splat_kernel_wide): entries carry a row offset within their window and
# the one-hot spans [K, wrows*W]. TDGP_SPLAT_WROWS is the measurement knob.
_WROWS = int(os.environ.get('TDGP_SPLAT_WROWS', '2'))

# OVERLAP windows: a SINGLE window family of (wrows+1)-row windows at row
# stride wrows — window q covers absolute rows [q*wrows, q*wrows + wrows],
# so every bilinear footprint (2 adjacent rows, top row anywhere in
# [q*wrows, (q+1)*wrows - 1]) fits ONE window with no entry splitting and
# no parity families, shrinking the table from 2x planes to
# (1 + 1/wrows) x. MEASURED NEGATIVE (r5 battery stage 1b, DESIGN.md
# round-5 ledger): +14% at wrows=2, scoped-VMEM OOM at wrows=4 — v5e HBM
# (~819 GB/s) makes the visited-window block traffic ~8 ms/pass, so the
# family's extra table bytes were never the accumulate's wall; the wide
# kernel's [K, (wrows+1)*W] one-hot build and per-item grid overhead are,
# and both favor the narrow 2-row family kernel. Kept env-gated
# (TDGP_SPLAT_OVERLAP=1; parity-green at wrows 2/4 incl. bf16 + merged
# pair, on-chip gate stage 5) as the documented measurement; wrows
# defaults to 2 under overlap (the measured-compilable point — 4 is the
# scoped-VMEM OOM) unless TDGP_SPLAT_WROWS is set.
_OVERLAP = os.environ.get('TDGP_SPLAT_OVERLAP', '') not in ('', '0')
_WROWS_SET = 'TDGP_SPLAT_WROWS' in os.environ


def _resolve_window_args(wrows, overlap, H):
    """One policy for the wrows/overlap defaults + shape asserts (shared
    by triplane_splat and triplane_splat_pair so the two can never drift)."""
    if overlap is None:
        overlap = _OVERLAP
    if wrows is None:
        wrows = _WROWS if (_WROWS_SET or not overlap) else 2
    if overlap:
        assert wrows >= 2 and H % wrows == 0, (H, wrows)
    else:
        assert wrows >= 2 and wrows % 2 == 0 and H % wrows == 0, (H, wrows)
    return wrows, overlap

# TDGP_SPLAT_TAKE=i8: sorted row-take through an int8 bitcast. The
# gather is charged per PADDED row (128 lanes x itemsize), so a [E, 41]
# bf16 row moves 256B for 82 useful bytes while its [E, 82] int8 bitcast
# moves 128B — measured standalone 261.2 -> 134.4 ms at E=6.3M,
# bit-exact round-trip (probe_take_int8). DEFAULT OFF: inside the full
# train step the bitcast blew XLA compile past 50 min (r5, vs ~18 min
# without — layout/fusion pathology, unresolved), so the win is real but
# not shippable until the compile cost is understood.
_TAKE_I8 = os.environ.get('TDGP_SPLAT_TAKE', '') == 'i8'


def _sorted_take(packed: jnp.ndarray, perm: jnp.ndarray,
                 via_i8: bool = None) -> jnp.ndarray:
    """Row-gather `packed[perm]`, optionally moving int8-bitcast rows."""
    if via_i8 is None:
        via_i8 = _TAKE_I8
    if not via_i8:
        return jnp.take(packed, perm, axis=0)
    e, lanes = packed.shape
    nb = packed.dtype.itemsize
    rows_i8 = jax.lax.bitcast_convert_type(packed, jnp.int8)  # [E, lanes, nb]
    rows_i8 = rows_i8.reshape(e, lanes * nb)
    taken = jnp.take(rows_i8, perm, axis=0)
    return jax.lax.bitcast_convert_type(
        taken.reshape(e, lanes, nb), packed.dtype)

# worklist meta packing: ONE s32 per item carries (item_chunk << FLAG_BITS
# | flags). Two SMEM-prefetch arrays (meta, key) instead of six keep the
# worklist under the 1 MB SMEM budget at batch >= 24. These constants are
# the single source of truth for the field layout — the pack site, both
# kernels' unpack, and the BlockSpec index_map all use them; widen
# _META_FLAG_BITS if a fifth flag is ever added.
_META_F_FIRST = 1    # first item of a window run -> zero the accumulator
_META_F_LIVE = 2     # real entries (not worklist padding / scratch window)
_META_F_CFIRST = 4   # first item of a chunk -> (re)build the one-hot
_META_F_LAST = 8     # last item of a window run -> write back (table_bf16)
_META_FLAG_BITS = 4
_META_STRIDE = 1 << _META_FLAG_BITS


# --------------------------------------------------------------------- prep

def _pixel_coords(coords: jnp.ndarray, scale: float, H: int, W: int):
    """World coords [N, P, 3] -> per-plane pixel coords gx, gy [N3, P]."""
    n, p, _ = coords.shape
    c = coords / scale
    g2 = jnp.stack([c[..., jnp.array(pr)] for pr in _PROJ], axis=1)  # [N,3,P,2]
    g2 = g2.reshape(n * 3, p, 2)
    # align_corners=True unnormalize (matches ops/grid_sample.py)
    gx = (g2[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (g2[..., 1] + 1.0) * 0.5 * (H - 1)
    return gx, gy


def _corner_meta(gx: jnp.ndarray, gy: jnp.ndarray, H: int, W: int):
    """Bilinear corner integer coords, fractions and validity-masked weights."""
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def valid(yi, xi):
        return ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)).astype(gx.dtype)

    m00 = valid(y0i, x0i)
    m01 = valid(y0i, x0i + 1)
    m10 = valid(y0i + 1, x0i)
    m11 = valid(y0i + 1, x0i + 1)
    w00 = (1 - tx) * (1 - ty) * m00
    w01 = tx * (1 - ty) * m01
    w10 = (1 - tx) * ty * m10
    w11 = tx * ty * m11
    return x0i, y0i, tx, ty, (m00, m01, m10, m11), (w00, w01, w10, w11)


def _window_meta(y0i: jnp.ndarray, ws: Tuple[jnp.ndarray, ...], H: int,
                 n3: int, pid: jnp.ndarray):
    """Remap a point's 2 corner rows onto its 2-row window.

    Window families: parity A = row pairs (2q, 2q+1), parity B = (2q+1, 2q+2).
    A point touching rows (y0, y0+1) lands in exactly one family (by parity
    of its clipped top row). Returns the global window key and the 4 weights
    re-expressed as (window_row0, window_row1) x (x0, x0+1) coefficients.
    """
    w00, w01, w10, w11 = ws
    hp = H // 2
    ytop = jnp.clip(y0i, 0, H - 2)
    sh = ytop - y0i  # 0: rows align; +1: y0=-1 (top corner invalid); -1: y0=H-1
    zeros = jnp.zeros_like(w00)
    a00 = jnp.where(sh == 0, w00, jnp.where(sh == 1, w10, zeros))
    a01 = jnp.where(sh == 0, w01, jnp.where(sh == 1, w11, zeros))
    a10 = jnp.where(sh == 0, w10, jnp.where(sh == -1, w00, zeros))
    a11 = jnp.where(sh == 0, w11, jnp.where(sh == -1, w01, zeros))
    parity = ytop & 1
    nwa = n3 * hp
    key = parity * nwa + pid * hp + (ytop >> 1)
    return key.astype(jnp.int32), (a00, a01, a10, a11)


def _window_meta_wide(y0i: jnp.ndarray, ws: Tuple[jnp.ndarray, ...], H: int,
                      n3: int, pid: jnp.ndarray, wrows: int):
    """_window_meta generalized to wrows-row windows.

    Families: A = windows starting at rows 0, wrows, 2*wrows, ...; B = the
    same grid shifted down by wrows/2. A footprint with (clipped) top row t
    fits family A unless t % wrows == wrows - 1 (it straddles an A boundary),
    in which case the B window containing it holds it at row offset
    wrows/2 - 1. Returns (window key, remapped weights, row offset within
    the window). wrows == 2 reduces to _window_meta's parity mapping.
    """
    w00, w01, w10, w11 = ws
    half = wrows // 2
    nw_pp = H // wrows
    ytop = jnp.clip(y0i, 0, H - 2)
    sh = ytop - y0i  # 0: rows align; +1: y0=-1 (top corner invalid); -1: y0=H-1
    zeros = jnp.zeros_like(w00)
    a00 = jnp.where(sh == 0, w00, jnp.where(sh == 1, w10, zeros))
    a01 = jnp.where(sh == 0, w01, jnp.where(sh == 1, w11, zeros))
    a10 = jnp.where(sh == 0, w10, jnp.where(sh == -1, w00, zeros))
    a11 = jnp.where(sh == 0, w11, jnp.where(sh == -1, w01, zeros))
    r = ytop % wrows
    in_b = r == wrows - 1
    nwa = n3 * nw_pp
    key_a = pid * nw_pp + ytop // wrows
    key_b = nwa + pid * nw_pp + (ytop - half) // wrows
    key = jnp.where(in_b, key_b, key_a)
    roff = jnp.where(in_b, half - 1, r)
    return key.astype(jnp.int32), (a00, a01, a10, a11), roff.astype(jnp.int32)


def _window_meta_overlap(y0i: jnp.ndarray, ws: Tuple[jnp.ndarray, ...], H: int,
                         n3: int, pid: jnp.ndarray, wrows: int):
    """Single-family OVERLAP windows (see _OVERLAP).

    Window q spans absolute rows [q*wrows, q*wrows + wrows] (wrows+1 rows,
    stride wrows). A footprint with clipped top row t lives in window
    t // wrows at row offset t % wrows — always fits, never splits. The
    last window's overlap row is absolute row H (out of plane) but
    unreachable: t <= H-2 gives roff <= wrows-2 there, so the unfold can
    drop it unconditionally.
    """
    w00, w01, w10, w11 = ws
    nw_pp = H // wrows
    ytop = jnp.clip(y0i, 0, H - 2)
    sh = ytop - y0i  # 0: rows align; +1: y0=-1 (top corner invalid); -1: y0=H-1
    zeros = jnp.zeros_like(w00)
    a00 = jnp.where(sh == 0, w00, jnp.where(sh == 1, w10, zeros))
    a01 = jnp.where(sh == 0, w01, jnp.where(sh == 1, w11, zeros))
    a10 = jnp.where(sh == 0, w10, jnp.where(sh == -1, w00, zeros))
    a11 = jnp.where(sh == 0, w11, jnp.where(sh == -1, w01, zeros))
    key = pid * nw_pp + ytop // wrows
    roff = ytop % wrows
    return key.astype(jnp.int32), (a00, a01, a10, a11), roff.astype(jnp.int32)


# ------------------------------------------------------------------- kernel

def _splat_kernel(meta_ref, key_ref, ent_ref, zero_ref, out_ref,
                  oh_top_ref, oh_bot_ref, key_sc_ref, acc_ref,
                  *, F: int, W: int, mxu_bf16: bool, entry_bf16: bool,
                  table_bf16: bool, zero_windows: bool = True):
    j = pl.program_id(0)
    w_id = key_ref[j]
    # meta packs (item_chunk << _META_FLAG_BITS | flags): 6 SMEM-prefetched
    # s32 arrays -> 2, keeping the worklist under the 1 MB SMEM budget at
    # batch >= 24 (6 arrays OOMed smem at b24: 1.29M > 1M)
    m = meta_ref[j]
    is_first = (m & _META_F_FIRST) != 0
    is_live = (m & _META_F_LIVE) != 0
    is_cfirst = (m & _META_F_CFIRST) != 0
    is_last = (m & _META_F_LAST) != 0
    acc_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32

    # table_bf16: accumulate in an fp32 VMEM scratch across a window's run
    # and write the [F, 2W] block to HBM once (in bf16) on the run's last
    # item — halves the kernel's table write + the unfold's read without
    # rounding the cross-entry accumulation. A window's items are
    # consecutive in the worklist (entries are key-sorted), so the single
    # write lands before the block index moves on.
    tgt = acc_ref if table_bf16 else out_ref

    # zero_windows=False: the aliased table input carries a prior entry
    # set's accumulation (merged coarse+fine backward) — fetched blocks
    # must be added to, never reset
    if zero_windows:
        @pl.when(is_first)
        def _():
            tgt[:] = jnp.zeros_like(tgt)

    # per-CHUNK one-hot build, hoisted into VMEM scratch: a chunk's entries
    # span several window runs, and rebuilding the [K, W] weighted one-hots
    # per (chunk, window) item made the VPU construction — not the MXU —
    # the kernel's cost center. The window-independent part (bilinear
    # weights at columns x0/x0+1) is built once per chunk; each item then
    # applies only its membership row-mask (one multiply).
    @pl.when(is_cfirst & is_live)
    def _():
        ent = ent_ref[:]                      # [K, F+6] f32 or [K, F+8] bf16
        if entry_bf16:
            # bf16 meta: ints split into two exact-in-bf16 byte lanes
            # (bf16 holds integers exactly only up to 256)
            f32 = jnp.float32
            ekey = (ent[:, F:F + 1].astype(f32) * 256.0
                    + ent[:, F + 1:F + 2].astype(f32))
            x0f = (ent[:, F + 2:F + 3].astype(f32) * 256.0
                   + ent[:, F + 3:F + 4].astype(f32) - 1.0)
            a00 = ent[:, F + 4:F + 5].astype(f32)
            a01 = ent[:, F + 5:F + 6].astype(f32)
            a10 = ent[:, F + 6:F + 7].astype(f32)
            a11 = ent[:, F + 7:F + 8].astype(f32)
        else:
            ekey = ent[:, F:F + 1]            # [K, 1] window key as float (exact)
            x0f = ent[:, F + 1:F + 2]         # [K, 1]
            a00 = ent[:, F + 2:F + 3]
            a01 = ent[:, F + 3:F + 4]
            a10 = ent[:, F + 4:F + 5]
            a11 = ent[:, F + 5:F + 6]

        k = ent.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (k, W), 1)
        x0 = x0f.astype(jnp.int32)                      # exact: |x0| < 2^23
        c0 = (col == x0).astype(jnp.float32)            # [K, W]
        c1 = (col == x0 + 1).astype(jnp.float32)
        oh_top_ref[:] = (a00 * c0 + a01 * c1).astype(acc_dtype)
        oh_bot_ref[:] = (a10 * c0 + a11 * c1).astype(acc_dtype)
        key_sc_ref[:] = ekey.astype(jnp.float32)        # [K, 1]

    # dead items (worklist padding / scratch-window runs) skip the MXU work
    # entirely — at one render pass (3.1M entries) they were ~2/3 of the
    # static grid; skipping them cuts the wasted matmuls
    @pl.when(is_live)
    def _():
        # window-membership mask applied to vals [K, F], not the [K, W]
        # one-hots: the mask is per-row and exact ({0,1} multiplies), so
        # masking either matmul operand is bit-identical — vals is 16x
        # narrower, saving two [K, W] VPU passes per worklist item
        match = (key_sc_ref[:].astype(jnp.int32) == w_id).astype(acc_dtype)
        vals = ent_ref[:, :F].astype(acc_dtype) * match  # [K, F] row-masked
        # mxu_bf16: single-pass bf16 MXU (fp32 accumulate) instead of
        # HIGHEST's 6-pass fp32 emulation — only per-entry products round
        # to bf16 (~0.4% rel), the tolerance already accepted for bf16
        # packed tables; accumulation across entries stays f32
        prec = (jax.lax.Precision.DEFAULT if mxu_bf16
                else jax.lax.Precision.HIGHEST)
        dn = (((0,), (0,)), ((), ()))
        top = jax.lax.dot_general(vals, oh_top_ref[:], dn,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
        bot = jax.lax.dot_general(vals, oh_bot_ref[:], dn,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
        if table_bf16:
            acc_ref[:, :W] += top
            acc_ref[:, W:] += bot
        else:
            out_ref[0, :, :W] += top
            out_ref[0, :, W:] += bot

    if table_bf16:
        @pl.when(is_last & is_live)
        def _():
            out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _splat_kernel_wide(meta_ref, key_ref, ent_ref, zero_ref, out_ref,
                       oh_ref, key_sc_ref, acc_ref,
                       *, F: int, W: int, wc: int, mxu_bf16: bool,
                       entry_bf16: bool, table_bf16: bool,
                       zero_windows: bool = True):
    """Multi-row window variant: one [K, wc] one-hot, one MXU matmul.

    wc = window columns: wrows*W for family windows, (wrows+1)*W for
    overlap windows. Each entry's four bilinear weights land at flat
    columns roff*W + {x0, x0+1} (top corner row) and (roff+1)*W +
    {x0, x0+1} (bottom). Out-of-plane corners carry zero weight, so the
    false column collisions their unclipped x0 can produce (e.g.
    x0+1 == W aliasing the next row's column 0) contribute exactly zero —
    same invariant the 2-row kernel relies on within its [K, W] one-hots.
    """
    j = pl.program_id(0)
    w_id = key_ref[j]
    m = meta_ref[j]     # chunk << _META_FLAG_BITS | flags (see _splat_kernel)
    is_first = (m & _META_F_FIRST) != 0
    is_live = (m & _META_F_LIVE) != 0
    is_cfirst = (m & _META_F_CFIRST) != 0
    is_last = (m & _META_F_LAST) != 0
    acc_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
    tgt = acc_ref if table_bf16 else out_ref

    if zero_windows:
        @pl.when(is_first)
        def _():
            tgt[:] = jnp.zeros_like(tgt)

    @pl.when(is_cfirst & is_live)
    def _():
        ent = ent_ref[:]                  # [K, F+7] f32 or [K, F+9] bf16
        f32 = jnp.float32
        if entry_bf16:
            ekey = (ent[:, F:F + 1].astype(f32) * 256.0
                    + ent[:, F + 1:F + 2].astype(f32))
            x0f = (ent[:, F + 2:F + 3].astype(f32) * 256.0
                   + ent[:, F + 3:F + 4].astype(f32) - 1.0)
            a00 = ent[:, F + 4:F + 5].astype(f32)
            a01 = ent[:, F + 5:F + 6].astype(f32)
            a10 = ent[:, F + 6:F + 7].astype(f32)
            a11 = ent[:, F + 7:F + 8].astype(f32)
            rof = ent[:, F + 8:F + 9].astype(f32)   # exact: roff <= wrows-1
        else:
            ekey = ent[:, F:F + 1]
            x0f = ent[:, F + 1:F + 2]
            a00 = ent[:, F + 2:F + 3]
            a01 = ent[:, F + 3:F + 4]
            a10 = ent[:, F + 4:F + 5]
            a11 = ent[:, F + 5:F + 6]
            rof = ent[:, F + 6:F + 7]

        k = ent.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (k, wc), 1)
        top = (rof * W + x0f).astype(jnp.int32)     # exact: |values| < 2^23
        c0 = (col == top).astype(jnp.float32)
        c1 = (col == top + 1).astype(jnp.float32)
        c2 = (col == top + W).astype(jnp.float32)
        c3 = (col == top + W + 1).astype(jnp.float32)
        oh_ref[:] = (a00 * c0 + a01 * c1 + a10 * c2 + a11 * c3).astype(acc_dtype)
        key_sc_ref[:] = ekey.astype(jnp.float32)

    @pl.when(is_live)
    def _():
        # mask on vals [K, F], not the [K, wrows*W] one-hot — per-row exact
        # {0,1} mask commutes across the contraction (see _splat_kernel)
        match = (key_sc_ref[:].astype(jnp.int32) == w_id).astype(acc_dtype)
        vals = ent_ref[:, :F].astype(acc_dtype) * match  # [K, F] row-masked
        prec = (jax.lax.Precision.DEFAULT if mxu_bf16
                else jax.lax.Precision.HIGHEST)
        dn = (((0,), (0,)), ((), ()))
        blk = jax.lax.dot_general(vals, oh_ref[:], dn,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)   # [F, wrows*W]
        if table_bf16:
            acc_ref[:] += blk
        else:
            out_ref[0] += blk

    if table_bf16:
        @pl.when(is_last & is_live)
        def _():
            out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _splat_table(packed_sorted: jnp.ndarray, keys_sorted: jnp.ndarray,
                 n_windows: int, F: int, W: int, interpret: bool,
                 mxu_bf16: bool = False, entry_bf16: bool = False,
                 table_bf16: bool = False, wrows: int = 2,
                 overlap: bool = False,
                 init_table: jnp.ndarray = None) -> jnp.ndarray:
    """Run the worklist kernel. packed_sorted: [Epad, F+6] sorted by key.

    Returns the window table [n_windows + 1, F, 2W] (last row = scratch
    window that absorbs padding entries).

    Zero-initialization: the output aliases a pre-zeroed buffer, so windows
    with no entries simply keep their zeros and need no synthetic coverage
    visits (compiled path). Visited windows are zeroed in-kernel on their
    first worklist item (the write-back of a visited block always overwrites
    the aliased contents). Interpret mode does not honor the aliasing, so
    there the caller adds one zero-weight coverage entry per window.

    init_table: accumulate ON TOP of an existing table instead of zeroing —
    the aliased input carries it and in-kernel zeroing is disabled, so a
    second entry set (e.g. the fine pass of a merged coarse+fine backward)
    lands in the same table and the unfold runs once. Compiled path only
    (interpret does not honor aliasing; callers add tables instead).
    """
    epad = packed_sorted.shape[0]
    k = _CHUNK
    n_chunks = epad // k
    # one worklist item per (chunk, key) run; static bound
    L = n_chunks + n_windows + 2

    prev = jnp.concatenate([keys_sorted[:1] - 1, keys_sorted[:-1]])
    flag = (keys_sorted != prev) | ((jnp.arange(epad, dtype=jnp.int32) % k) == 0)
    starts = jnp.nonzero(flag, size=L, fill_value=epad)[0].astype(jnp.int32)
    is_pad = starts >= epad
    item_key = jnp.where(is_pad, n_windows,
                         keys_sorted[jnp.minimum(starts, epad - 1)])
    item_chunk = jnp.minimum(starts // k, n_chunks - 1).astype(jnp.int32)
    prev_key = jnp.concatenate([item_key[:1] - 1, item_key[:-1]])
    first = (item_key != prev_key).astype(jnp.int32)
    # dead items: worklist padding and scratch-window runs (chunk-alignment
    # padding entries carry key == n_windows) — no useful MXU work
    live = jnp.logical_and(jnp.logical_not(is_pad),
                           item_key != n_windows).astype(jnp.int32)
    # first item of each chunk (sorted keys put dead runs last within a
    # chunk, so a chunk with any live item has a live first item — the
    # scratch one-hot build can safely gate on cfirst & live)
    prev_chunk = jnp.concatenate([item_chunk[:1] - 1, item_chunk[:-1]])
    cfirst = (item_chunk != prev_chunk).astype(jnp.int32)
    next_key = jnp.concatenate([item_key[1:], item_key[-1:] + 1])
    last = (item_key != next_key).astype(jnp.int32)
    # pack (chunk, 4 flags) into ONE s32 per item: the scalar-prefetch
    # arrays live in SMEM (1 MB); at batch 24 six s32[L] arrays hit 1.29 MB
    # and the compile fails. Two arrays (meta, key) keep b24/b32 in budget.
    # Field layout is defined once by the _META_* module constants.
    meta = (item_chunk * _META_STRIDE + first * _META_F_FIRST
            + live * _META_F_LIVE + cfirst * _META_F_CFIRST
            + last * _META_F_LAST)
    meta = meta.astype(jnp.int32)

    lanes = packed_sorted.shape[1]
    acc_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
    out_dtype = jnp.bfloat16 if table_bf16 else jnp.float32
    if overlap:
        wc = (wrows + 1) * W                  # stride wrows + 1 overlap row
    else:
        wc = wrows * W if wrows != 2 else 2 * W   # window block columns
    zero_windows = init_table is None
    if zero_windows:
        init_table = jnp.zeros((n_windows + 1, F, wc), out_dtype)
    else:
        assert not table_bf16, 'init_table accumulation requires f32 tables'
        assert not interpret, 'init_table accumulation is compiled-path only'
        assert init_table.shape == (n_windows + 1, F, wc), init_table.shape
    if wrows == 2 and not overlap:
        kernel = functools.partial(_splat_kernel, F=F, W=W, mxu_bf16=mxu_bf16,
                                   entry_bf16=entry_bf16, table_bf16=table_bf16,
                                   zero_windows=zero_windows)
        scratch = [
            pltpu.VMEM((k, W), acc_dtype),      # per-chunk one-hot, top row
            pltpu.VMEM((k, W), acc_dtype),      # per-chunk one-hot, bottom row
            pltpu.VMEM((k, 1), jnp.float32),    # per-entry window keys
            pltpu.VMEM((F, wc), jnp.float32),   # fp32 run accumulator
        ]
    else:
        kernel = functools.partial(_splat_kernel_wide, F=F, W=W, wc=wc,
                                   mxu_bf16=mxu_bf16, entry_bf16=entry_bf16,
                                   table_bf16=table_bf16,
                                   zero_windows=zero_windows)
        scratch = [
            pltpu.VMEM((k, wc), acc_dtype),     # per-chunk one-hot, all rows
            pltpu.VMEM((k, 1), jnp.float32),    # per-entry window keys
            pltpu.VMEM((F, wc), jnp.float32),   # fp32 run accumulator
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((k, lanes),
                         lambda j, mi, ki: (mi[j] // _META_STRIDE, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, F, wc),
                               lambda j, mi, ki: (ki[j], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_windows + 1, F, wc), out_dtype),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(meta, item_key, packed_sorted, init_table)


def _prep_entries(g_pts: jnp.ndarray, coords: jnp.ndarray, scale: float,
                  n3: int, H: int, W: int, interpret: bool,
                  entry_bf16: bool, wrows: int, overlap: bool = False):
    """Pack one entry per (plane, point), pad to chunk multiple, key-sort.

    Returns (packed_sorted [Epad, lanes], keys_sorted [Epad], n_windows).
    """
    _, P, F = g_pts.shape
    gx, gy = _pixel_coords(coords, scale, H, W)
    x0i, y0i, _tx, _ty, _ms, ws = _corner_meta(gx, gy, H, W)
    pid = jnp.broadcast_to(jnp.arange(n3, dtype=jnp.int32)[:, None], (n3, P))
    if overlap:
        key, avec, roff = _window_meta_overlap(y0i, ws, H, n3, pid, wrows)
    elif wrows == 2:
        key, avec = _window_meta(y0i, ws, H, n3, pid)
        roff = None
    else:
        key, avec, roff = _window_meta_wide(y0i, ws, H, n3, pid, wrows)

    E = n3 * P
    nw_pp = H // wrows                 # windows per plane (per family)
    n_windows = n3 * nw_pp if overlap else 2 * n3 * nw_pp
    f32 = jnp.float32
    if entry_bf16:
        assert W <= 0x10000 and n_windows + 1 <= 0x10000
        bf = jnp.bfloat16
        # x0 can be any value for fully-masked (out-of-plane) corners whose
        # weights are all zero — clip so the byte split stays exact; the
        # column match is irrelevant when the weights are zero
        x1 = jnp.clip(x0i + 1, 0, W)
        meta = [key >> 8, key & 255, x1 >> 8, x1 & 255]
        cols = ([g_pts.reshape(E, F).astype(bf)]
                + [m.reshape(E, 1).astype(bf) for m in meta]
                + [a.reshape(E, 1).astype(bf) for a in avec])
        if roff is not None:
            cols.append(roff.reshape(E, 1).astype(bf))  # exact: <= wrows-1
        packed = jnp.concatenate(cols, axis=1)   # [E, F+8] (+1 wide)
    else:
        cols = [
            g_pts.reshape(E, F).astype(f32),
            key.reshape(E, 1).astype(f32),
            x0i.reshape(E, 1).astype(f32),
            avec[0].reshape(E, 1).astype(f32),
            avec[1].reshape(E, 1).astype(f32),
            avec[2].reshape(E, 1).astype(f32),
            avec[3].reshape(E, 1).astype(f32),
        ]
        if roff is not None:
            cols.append(roff.reshape(E, 1).astype(f32))
        packed = jnp.concatenate(cols, axis=1)    # [E, F+6] (+1 wide)
    keys = key.reshape(E)

    # chunk-alignment padding entries carry the scratch-window key (their
    # worklist items are marked dead). Interpret mode additionally gets one
    # zero-weight coverage entry per window: the interpreter does not honor
    # the output aliasing that keeps unvisited windows zeroed on hardware.
    n_cov = (n_windows + 1) if interpret else 0
    epad = -(-(E + n_cov) // _CHUNK) * _CHUNK
    n_extra = epad - E
    if interpret:
        extra_keys = jnp.minimum(jnp.arange(n_extra, dtype=jnp.int32), n_windows)
    else:
        extra_keys = jnp.full((n_extra,), n_windows, dtype=jnp.int32)
    extra = jnp.zeros((n_extra, packed.shape[1]), dtype=packed.dtype)
    if entry_bf16:
        extra = extra.at[:, F].set((extra_keys >> 8).astype(packed.dtype))
        extra = extra.at[:, F + 1].set((extra_keys & 255).astype(packed.dtype))
    else:
        extra = extra.at[:, F].set(extra_keys.astype(f32))
    packed = jnp.concatenate([packed, extra], axis=0)
    keys = jnp.concatenate([keys, extra_keys], axis=0)

    perm = jnp.argsort(keys)
    packed_sorted = _sorted_take(packed, perm)
    # sorted keys come back out of the sorted rows (exact integer round-trip
    # through f32 / split-bf16) — saves a second [E]-row gather
    if entry_bf16:
        keys_sorted = (packed_sorted[:, F].astype(f32) * 256.0
                       + packed_sorted[:, F + 1].astype(f32)).astype(jnp.int32)
    else:
        keys_sorted = packed_sorted[:, F].astype(jnp.int32)
    return packed_sorted, keys_sorted, n_windows


def _unfold_table(table: jnp.ndarray, n3: int, H: int, W: int, F: int,
                  n_windows: int, wrows: int,
                  overlap: bool = False) -> jnp.ndarray:
    """Window table [nw+1, F, wrows*W] -> plane cotangent [N3, H, W, F]."""
    nw_pp = H // wrows
    if overlap:
        # [nw+1, F, (wrows+1)*W]: rows 0..wrows-1 of window q are absolute
        # rows q*wrows+r (disjoint — a strided view of the plane); the
        # overlap row wrows adds into the NEXT window's row 0. The last
        # window's overlap row is unreachable (see _window_meta_overlap).
        t = table[:n_windows].reshape(n3, nw_pp, F, wrows + 1, W)
        main = t[:, :, :, :wrows].transpose(0, 1, 3, 4, 2)  # [n3,nw,wr,W,F]
        main = main.reshape(n3, H, W, F).astype(jnp.float32)
        over = t[:, :-1, :, wrows].transpose(0, 1, 3, 2)    # [n3,nw-1,W,F]
        over = over.astype(jnp.float32)[:, :, None]         # [n3,nw-1,1,W,F]
        # window q's overlap -> absolute row (q+1)*wrows: pad one window in
        # front and wrows-1 zero rows behind; pad+add fuses elementwise
        add = jnp.pad(over, ((0, 0), (1, 0), (0, wrows - 1), (0, 0), (0, 0)))
        return main + add.reshape(n3, H, W, F)
    nwa = n3 * nw_pp
    half = wrows // 2
    A = table[:nwa].reshape(n3, nw_pp, F, wrows, W).transpose(0, 1, 3, 4, 2)
    A = A.reshape(n3, H, W, F).astype(jnp.float32)
    B = table[nwa:n_windows].reshape(n3, nw_pp, F, wrows, W).transpose(0, 1, 3, 4, 2)
    B = B.reshape(n3, H, W, F).astype(jnp.float32)
    # family-B flat row i is absolute row i+half; pad+slice+add fuses into
    # one elementwise pass (the previous .at[:, half:].add lowered to a
    # dynamic-update-slice that XLA scheduled as a separate copy)
    return A + jnp.pad(B, ((0, 0), (half, 0), (0, 0), (0, 0)))[:, :H]


def triplane_splat(g_pts: jnp.ndarray, coords: jnp.ndarray, scale: float,
                   n3: int, H: int, W: int, interpret: bool = False,
                   mxu_bf16: bool = False, entry_bf16: bool = False,
                   table_bf16: bool = False, wrows: int = None,
                   overlap: bool = None) -> jnp.ndarray:
    """Adjoint of the tri-plane bilinear gather.

    g_pts:  [N3, P, F] cotangent rows per (plane, point)
    coords: [N, P, 3] world coordinates
    mxu_bf16: run the kernel's one-hot accumulation matmuls in bf16 (fp32
    accumulate) — single MXU pass instead of HIGHEST's 6-pass fp32 emulation.
    entry_bf16: pack the sorted entry rows in bf16 ([E, F+8] instead of
    [E, F+6] f32). The row-take of the sorted entries is the largest prep
    stage (132 ms/pass, profile_splat_prep.py) and the physical row is
    lane-padded to 128 either way, so bf16 halves the bytes it moves.
    Integer meta (window key, x0) is split into two exact-in-bf16 byte lanes.
    table_bf16: store the window table in bf16 (fp32 VMEM run accumulator,
    one bf16 HBM write per window) — halves the kernel's table write and the
    unfold's read; rounds each plane-grad texel once.
    wrows: texel rows per window (default TDGP_SPLAT_WROWS; see _WROWS).
    overlap: single-family overlapping windows (default TDGP_SPLAT_OVERLAP;
    see _OVERLAP — table (1+1/wrows)x planes instead of 2x).
    Returns g_planes [N3, H, W, F].
    """
    wrows, overlap = _resolve_window_args(wrows, overlap, H)
    assert W % 128 == 0, W
    F = g_pts.shape[-1]
    packed_sorted, keys_sorted, n_windows = _prep_entries(
        g_pts, coords, scale, n3, H, W, interpret, entry_bf16, wrows,
        overlap=overlap)
    table = _splat_table(packed_sorted, keys_sorted, n_windows, F, W, interpret,
                         mxu_bf16=mxu_bf16, entry_bf16=entry_bf16,
                         table_bf16=table_bf16, wrows=wrows, overlap=overlap)
    return _unfold_table(table, n3, H, W, F, n_windows, wrows, overlap=overlap)


def triplane_splat_pair(g_pts1: jnp.ndarray, coords1: jnp.ndarray,
                        g_pts2: jnp.ndarray, coords2: jnp.ndarray,
                        scale: float, n3: int, H: int, W: int,
                        interpret: bool = False, mxu_bf16: bool = False,
                        entry_bf16: bool = False, wrows: int = None,
                        overlap: bool = None) -> jnp.ndarray:
    """Merged adjoint for TWO entry sets splatting into the SAME planes.

    == triplane_splat(g1, c1) + triplane_splat(g2, c2), computed with ONE
    window table: the second accumulate aliases the first's output with
    in-kernel zeroing disabled (_splat_table init_table), so the unfold,
    the zero-table init, and the final family add run once instead of
    twice. This is the merged coarse+fine BACKWARD the round-4 re-cost
    could not get by merging the forward gathers (the fine sample
    positions depend on the coarse pass's output, so one differentiable
    forward gather needs a stop-grad pre-pass — but the backward entry
    sets are both known once both cotangents exist; see
    triplane_sample_pair_* for how the fine cotangents reach this call).
    Interpret mode (no aliasing support) computes two tables and adds.
    """
    wrows, overlap = _resolve_window_args(wrows, overlap, H)
    assert W % 128 == 0, W
    F = g_pts1.shape[-1]
    # 'concat' (default since the r5 battery: 10.22 vs alias 10.13 vs
    # unmerged 9.75 imgs/s at b16): ONE sort/take/accumulate over the
    # union — halves the worklist's window-run items (each window visited
    # once, not once per pass) at the cost of double-size packed/sorted
    # transients (~+3 GB at b16 256²). 'alias' keeps per-pass transients
    # and merges at the table. Both are exact reassociations.
    if os.environ.get('TDGP_SPLAT_PAIR_MODE', 'concat') == 'concat':
        g = jnp.concatenate([g_pts1, g_pts2], axis=1)
        cc = jnp.concatenate([coords1, coords2], axis=1)
        return triplane_splat(g, cc, scale, n3, H, W, interpret=interpret,
                              mxu_bf16=mxu_bf16, entry_bf16=entry_bf16,
                              wrows=wrows, overlap=overlap)
    ps1, ks1, n_windows = _prep_entries(
        g_pts1, coords1, scale, n3, H, W, interpret, entry_bf16, wrows,
        overlap=overlap)
    table = _splat_table(ps1, ks1, n_windows, F, W, interpret,
                         mxu_bf16=mxu_bf16, entry_bf16=entry_bf16, wrows=wrows,
                         overlap=overlap)
    ps2, ks2, n_windows2 = _prep_entries(
        g_pts2, coords2, scale, n3, H, W, interpret, entry_bf16, wrows,
        overlap=overlap)
    assert n_windows2 == n_windows
    if interpret:
        table2 = _splat_table(ps2, ks2, n_windows, F, W, interpret,
                              mxu_bf16=mxu_bf16, entry_bf16=entry_bf16,
                              wrows=wrows, overlap=overlap)
        table = table + table2
    else:
        table = _splat_table(ps2, ks2, n_windows, F, W, interpret,
                             mxu_bf16=mxu_bf16, entry_bf16=entry_bf16,
                             wrows=wrows, overlap=overlap, init_table=table)
    return _unfold_table(table, n3, H, W, F, n_windows, wrows, overlap=overlap)


def triplane_splat_ref(g_pts: jnp.ndarray, coords: jnp.ndarray, scale: float,
                       n3: int, H: int, W: int) -> jnp.ndarray:
    """Pure-XLA scatter-add reference (the slow path the kernel replaces)."""
    _, P, F = g_pts.shape
    gx, gy = _pixel_coords(coords, scale, H, W)
    x0i, y0i, _tx, _ty, _ms, ws = _corner_meta(gx, gy, H, W)
    flat = jnp.zeros((n3 * H * W, F), jnp.float32)
    base = jnp.arange(n3, dtype=jnp.int32)[:, None] * (H * W)
    for (dy, dx), w in zip(((0, 0), (0, 1), (1, 0), (1, 1)), ws):
        yi = jnp.clip(y0i + dy, 0, H - 1)
        xi = jnp.clip(x0i + dx, 0, W - 1)
        idx = (base + yi * W + xi).reshape(-1)
        flat = flat.at[idx].add((w[..., None] * g_pts).reshape(-1, F))
    return flat.reshape(n3, H, W, F)


# ------------------------------------------------- fused sample (custom VJP)

def _build_quad_table(planes_flat: jnp.ndarray) -> jnp.ndarray:
    """Pack every 2x2 texel block (all four parities) into one table row.

    A bilinear footprint (y0..y0+1, x0..x0+1) is exactly one 2x2 block at
    parity (y0&1, x0&1) — so with four parity-shifted block views, the four
    corner values of any sample point live in ONE [4F] row and the 4-corner
    gather collapses to a single take. Measured on the v5e
    (scripts/testing/probe_pair_gather.py): the XLA gather costs ~40 ns/ROW
    regardless of row width, so quad rows run the same sweep in 76 ms vs
    523 ms row-per-corner, and the table build is ~75 ms (rebuilt under the
    render remat — no steady-state memory cost).

    Returns [4 * N3 * (H/2+1) * (W/2+1), 4F]; row layout (c00,c01,c10,c11).
    """
    n3, H, W, F = planes_flat.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    hb, wb = H // 2 + 1, W // 2 + 1
    # +1 front pad: y0 = -1 footprints resolve to a real (zero) block; the
    # zero padding doubles as the out-of-range corner value (weights for
    # invalid corners are already masked to 0, values just must be finite)
    padded = jnp.pad(planes_flat, ((0, 0), (1, 2), (1, 2), (0, 0)))
    tabs = []
    for py in (0, 1):
        for px in (0, 1):
            sub = padded[:, py:py + 2 * hb, px:px + 2 * wb, :]
            v = sub.reshape(n3, hb, 2, wb, 2, F).transpose(0, 1, 3, 2, 4, 5)
            tabs.append(v.reshape(n3 * hb * wb, 4 * F))
    return jnp.concatenate(tabs, axis=0)


def _build_pair_table(planes_flat: jnp.ndarray) -> jnp.ndarray:
    """Pack x-adjacent texel pairs (both parities) into one table row.

    The half-memory sibling of _build_quad_table: a bilinear footprint's two
    x-adjacent corners live in one [2F] row, so the 4-corner gather becomes
    TWO takes (rows y0 and y0+1). Measured (probe_pair_gather.py): 119 ms vs
    523 ms per sweep; table is 2x the planes (vs quad's 4x) — the middle
    point on the speed/HBM tradeoff.

    Returns [2 * N3 * H * (W/2+1), 2F]; row layout (c_x0, c_x0+1).
    """
    n3, H, W, F = planes_flat.shape
    assert W % 2 == 0, W
    wb = W // 2 + 1
    padded = jnp.pad(planes_flat, ((0, 0), (0, 0), (1, 2), (0, 0)))
    tabs = []
    for px in (0, 1):
        sub = padded[:, :, px:px + 2 * wb, :]
        tabs.append(sub.reshape(n3 * H * wb, 2 * F))
    return jnp.concatenate(tabs, axis=0)


def build_sample_table(planes_flat: jnp.ndarray, pack: str) -> jnp.ndarray:
    """Public table builder for the packed sampling paths (callers that want
    to hoist the build out of a remat region pair it with
    triplane_sample_packed).

    pack '<mode>_bf16' stores the table in bfloat16: gather cost is per-ROW
    (ledger), so bf16 buys memory only — 'quad_bf16' has quad's row count at
    pair's footprint. Feature values quantize to ~3 decimal digits; the
    backward splat is unaffected (computed from coords + cotangents in f32).
    """
    if pack.endswith('_bf16'):
        planes_flat = planes_flat.astype(jnp.bfloat16)
        pack = pack[:-5]
    if pack == 'quad':
        return _build_quad_table(planes_flat)
    if pack == 'pair':
        return _build_pair_table(planes_flat)
    raise ValueError(f'unknown pack mode: {pack!r}')


def _gather_packed(table: jnp.ndarray, coords: jnp.ndarray, scale: float,
                   shape: Tuple[int, int, int, int], pack: str):
    """Gather corner values + weighted combine from a packed table.
    Returns (feats [N3,P,F] pre-mean, vals4 [N3,P,4,F])."""
    n3, H, W, F = shape
    P = coords.shape[1]
    pack = pack[:-5] if pack.endswith('_bf16') else pack  # layout is the same
    gx, gy = _pixel_coords(coords, scale, H, W)
    x0i, y0i, _tx, _ty, _ms, ws = _corner_meta(gx, gy, H, W)
    pid = jnp.arange(n3, dtype=jnp.int32)[:, None]                   # [N3, 1]
    if pack == 'quad':
        hb, wb = H // 2 + 1, W // 2 + 1
        Y = jnp.clip(y0i + 1, 0, H)     # offset into the front-padded grid
        X = jnp.clip(x0i + 1, 0, W)
        parity = (Y & 1) * 2 + (X & 1)
        idx = ((parity * n3 + pid) * (hb * wb) + (Y >> 1) * wb + (X >> 1))
        vals4 = jnp.take(table, idx.reshape(-1), axis=0).reshape(n3, P, 4, F)
        feats = (ws[0][..., None] * vals4[:, :, 0] + ws[1][..., None] * vals4[:, :, 1]
                 + ws[2][..., None] * vals4[:, :, 2] + ws[3][..., None] * vals4[:, :, 3])
    else:
        assert pack == 'pair', pack
        wb = W // 2 + 1
        X = jnp.clip(x0i + 1, 0, W)
        px = X & 1
        qx = X >> 1
        y_top = jnp.clip(y0i, 0, H - 1)
        y_bot = jnp.clip(y0i + 1, 0, H - 1)
        base = (px * n3 + pid) * (H * wb) + qx
        idx2 = jnp.concatenate([base + y_top * wb, base + y_bot * wb], axis=1)
        v = jnp.take(table, idx2.reshape(-1), axis=0).reshape(n3, 2, P, 2 * F)
        vt, vb = v[:, 0], v[:, 1]                                    # [N3,P,2F]
        feats = (ws[0][..., None] * vt[..., :F] + ws[1][..., None] * vt[..., F:]
                 + ws[2][..., None] * vb[..., :F] + ws[3][..., None] * vb[..., F:])
        vals4 = jnp.stack([vt[..., :F], vt[..., F:], vb[..., :F], vb[..., F:]],
                          axis=2)                                    # [N3,P,4,F]
    return feats, vals4


def _sample_fwd_impl(planes_flat: jnp.ndarray, coords: jnp.ndarray, scale: float,
                     pack: str = 'pair'):
    """Forward gather + plane mean.

    pack: 'quad' — one [4F] row per (plane, point), fastest, 4x-planes table;
          'pair' — two [2F] rows, 4.4x faster than 'none', 2x-planes table;
          'none' — plain flat-table 4-corner gather (one [F] row per corner).
    """
    n3, H, W, F = planes_flat.shape
    n = n3 // 3
    P = coords.shape[1]

    if pack in ('quad', 'pair', 'quad_bf16', 'pair_bf16'):
        table = build_sample_table(planes_flat, pack)
        feats, vals4 = _gather_packed(table, coords, scale, (n3, H, W, F), pack)
    elif pack == 'none':
        gx, gy = _pixel_coords(coords, scale, H, W)
        x0i, y0i, _tx, _ty, _ms, ws = _corner_meta(gx, gy, H, W)
        flat = planes_flat.reshape(n3 * H * W, F)
        base = (jnp.arange(n3, dtype=jnp.int32) * (H * W))[:, None]

        def cidx(dy, dx):
            yi = jnp.clip(y0i + dy, 0, H - 1)
            xi = jnp.clip(x0i + dx, 0, W - 1)
            return yi * W + xi + base

        idx4 = jnp.concatenate([cidx(0, 0), cidx(0, 1), cidx(1, 0), cidx(1, 1)],
                               axis=1)                               # [N3, 4P]
        vals = jnp.take(flat, idx4.reshape(-1), axis=0).reshape(n3, 4, P, F)
        feats = (ws[0][..., None] * vals[:, 0] + ws[1][..., None] * vals[:, 1]
                 + ws[2][..., None] * vals[:, 2] + ws[3][..., None] * vals[:, 3])
        vals4 = vals.transpose(0, 2, 1, 3)                           # [N3,P,4,F]
    else:
        raise ValueError(f'unknown pack mode: {pack!r}')

    out = jnp.mean(feats.reshape(n, 3, P, F), axis=1)
    return out.astype(planes_flat.dtype), vals4


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def triplane_sample_fused(planes_flat: jnp.ndarray, coords: jnp.ndarray,
                          scale: float, interpret: bool = False,
                          pack: str = 'pair') -> jnp.ndarray:
    """Tri-plane sampling with a Pallas splat backward.

    planes_flat: [N*3, H, W, F]; coords: [N, P, 3] world coords.
    Returns plane-mean features [N, P, F] (== tri_plane_sample).
    pack: 'quad' | 'pair' | 'none' forward gather layout (see
    _build_quad_table / _build_pair_table).
    """
    out, _ = _sample_fwd_impl(planes_flat, coords, scale, pack)
    return out


def _sample_fwd(planes_flat, coords, scale, interpret, pack):
    out, vals4 = _sample_fwd_impl(planes_flat, coords, scale, pack)
    # zero-size prototype carries the primal dtype (a dtype object is
    # not a valid residual leaf)
    proto = jnp.zeros((0,), planes_flat.dtype)
    return out, (vals4, coords, planes_flat.shape, proto)


def _broadcast_cotangent(g, n3, P, F):
    """Output cotangent [N, P, F] -> per-(plane, point) rows [N3, P, F] f32
    (mean over 3 planes -> /3)."""
    n = n3 // 3
    gp = jnp.broadcast_to((g / 3.0)[:, None], (n, 3, P, F)).reshape(n3, P, F)
    return gp.astype(jnp.float32)


def _coords_grad(vals4, coords, gp, scale, H, W, n3):
    """d/d coords from the saved corner values [N3, P, 4, F] (elementwise).
    gp: broadcast cotangent rows [N3, P, F] f32."""
    n = n3 // 3
    P = coords.shape[1]
    gx, gy = _pixel_coords(coords, scale, H, W)
    _x0i, _y0i, tx, ty, ms, _ws = _corner_meta(gx, gy, H, W)
    m00, m01, m10, m11 = ms
    v00, v01, v10, v11 = (vals4[:, :, 0], vals4[:, :, 1],
                          vals4[:, :, 2], vals4[:, :, 3])
    one = jnp.float32(1.0)
    dtx = jnp.sum(gp * ((one - ty)[..., None] * (m01[..., None] * v01 - m00[..., None] * v00)
                        + ty[..., None] * (m11[..., None] * v11 - m10[..., None] * v10)),
                  axis=-1)                                           # [N3, P]
    dty = jnp.sum(gp * ((one - tx)[..., None] * (m10[..., None] * v10 - m00[..., None] * v00)
                        + tx[..., None] * (m11[..., None] * v11 - m01[..., None] * v01)),
                  axis=-1)
    # chain: gx = (c/scale + 1) * 0.5 * (W-1)
    dgx = dtx * (0.5 * (W - 1) / scale)
    dgy = dty * (0.5 * (H - 1) / scale)
    dgx = dgx.reshape(n, 3, P)
    dgy = dgy.reshape(n, 3, P)
    return jnp.stack([
        dgx[:, 0] + dgx[:, 1],          # x: plane xy + plane xz
        dgy[:, 0] + dgx[:, 2],          # y: plane xy + plane yz
        dgy[:, 1] + dgy[:, 2],          # z: plane xz + plane yz
    ], axis=-1).astype(coords.dtype)    # [N, P, 3]


def _splat_flags(pack: str):
    """Kernel precision follows the pack mode: bf16 tables already round
    the forward features to bf16, so the plane-gradient per-entry products
    (mxu_bf16) and packed entry rows (entry_bf16) rounding the same way is
    a consistent precision point (accumulation across entries stays fp32).
    TDGP_SPLAT_MXU / TDGP_SPLAT_ENTRY = {bf16,f32} override for measurement.
    table_bf16 is REJECTED as a default: its 60-kimg dynamics A/B diverged
    (+27.5% mean FID-proxy gap — DESIGN.md round-5 ledger); quantizing
    plane-GRADIENT partial sums to bf16 harms training.
    TDGP_SPLAT_TABLE=bf16 stays as a measurement-only knob."""
    is_bf16_pack = pack.endswith('_bf16')
    mxu = os.environ.get('TDGP_SPLAT_MXU')
    mxu_bf16 = is_bf16_pack if mxu is None else (mxu == 'bf16')
    entry = os.environ.get('TDGP_SPLAT_ENTRY')
    entry_bf16 = is_bf16_pack if entry is None else (entry == 'bf16')
    table_bf16 = (os.environ.get('TDGP_SPLAT_TABLE') == 'bf16')
    return mxu_bf16, entry_bf16, table_bf16


def _sample_bwd(scale, interpret, pack, res, g):
    vals4, coords, (n3, H, W, F), planes_proto = res
    P = coords.shape[1]
    gp = _broadcast_cotangent(g, n3, P, F)
    g_coords = _coords_grad(vals4, coords, gp, scale, H, W, n3)
    # --- d/d planes via the Pallas splat
    mxu_bf16, entry_bf16, table_bf16 = _splat_flags(pack)
    g_planes = triplane_splat(gp, coords, scale, n3, H, W, interpret=interpret,
                              mxu_bf16=mxu_bf16, entry_bf16=entry_bf16,
                              table_bf16=table_bf16)
    # custom_vjp requires the plane cotangent to match the primal dtype:
    # bf16 planes (render_bf16 views) get a bf16 cotangent (accumulation
    # inside the splat stays fp32; only this boundary rounds)
    return g_planes.astype(planes_proto.dtype), g_coords


triplane_sample_fused.defvjp(_sample_fwd, _sample_bwd)


# --------------------------------------- packed sample (table input, VJP)

def _embed_gplanes(g_planes: jnp.ndarray, pack: str) -> jnp.ndarray:
    """Lift a planes-layout cotangent into table layout.

    build_sample_table duplicates every texel into 2 (pair) / 4 (quad)
    parity slots, so its transpose SUMS the slots. Embedding the whole
    cotangent into the parity-0 region (zeros elsewhere) therefore
    satisfies build^T(embed(g)) == g exactly — which lets the hoisted-table
    sampler return its plane gradient through the table input and have the
    (automatically differentiated) build recover it untouched. Pure
    pad/reshape data movement, no arithmetic.
    """
    n3, H, W, F = g_planes.shape
    pack = pack[:-5] if pack.endswith('_bf16') else pack
    if pack == 'pair':
        wb = W // 2 + 1
        ev = jnp.pad(g_planes, ((0, 0), (0, 0), (1, 2), (0, 0)))[:, :, :2 * wb, :]
        ev = ev.reshape(n3 * H * wb, 2 * F)
        return jnp.concatenate([ev, jnp.zeros_like(ev)], axis=0)
    assert pack == 'quad', pack
    hb, wb = H // 2 + 1, W // 2 + 1
    gq = jnp.pad(g_planes, ((0, 0), (1, 2), (1, 2), (0, 0)))[:, :2 * hb, :2 * wb, :]
    gq = gq.reshape(n3, hb, 2, wb, 2, F).transpose(0, 1, 3, 2, 4, 5)
    gq = gq.reshape(n3 * hb * wb, 4 * F)
    z = jnp.zeros_like(gq)
    return jnp.concatenate([gq, z, z, z], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def triplane_sample_packed(table: jnp.ndarray, coords: jnp.ndarray,
                           scale: float, shape: Tuple[int, int, int, int],
                           pack: str = 'pair',
                           interpret: bool = False,
                           residual_dtype: str = 'table') -> jnp.ndarray:
    """triplane_sample_fused with the packed table as the INPUT.

    Callers build the table once per step via build_sample_table OUTSIDE
    their remat region (the model rebuilds it 4x/step otherwise: coarse +
    fine pass, forward + backward replay). shape = (N3, H, W, F) of the
    original planes. Gradients flow to the table through _embed_gplanes —
    the build's autodiff VJP then maps them back onto the planes exactly.

    residual_dtype: dtype of the saved corner-value residuals ('table'
    keeps the table dtype; 'bf16' halves residual HBM when this op runs
    OUTSIDE a remat region, i.e. GeneratorConfig.sample_save='save_bf16').
    The residuals feed only the d/d coords products — bf16 there costs
    ~3 decimal digits on a gradient that is itself noise-dominated.
    """
    n3, _, _, F = shape
    n = n3 // 3
    P = coords.shape[1]
    feats, _ = _gather_packed(table, coords, scale, shape, pack)
    # feats promote to f32 through the corner weights even off a bf16 table
    return jnp.mean(feats.reshape(n, 3, P, F), axis=1).astype(jnp.float32)


def _packed_fwd(table, coords, scale, shape, pack, interpret, residual_dtype):
    n3, _, _, F = shape
    n = n3 // 3
    P = coords.shape[1]
    feats, vals4 = _gather_packed(table, coords, scale, shape, pack)
    out = jnp.mean(feats.reshape(n, 3, P, F), axis=1).astype(jnp.float32)
    if residual_dtype == 'bf16':
        vals4 = vals4.astype(jnp.bfloat16)
    return out, (vals4, coords)


def _packed_bwd(scale, shape, pack, interpret, residual_dtype, res, g):
    vals4, coords = res
    n3, H, W, F = shape
    # fp32 planes cotangent: the table-build autodiff (downstream of the
    # embed) re-casts to the table dtype itself
    g_planes, g_coords = _sample_bwd(
        scale, interpret, pack,
        (vals4, coords, (n3, H, W, F), jnp.zeros((0,), jnp.float32)), g)
    return _embed_gplanes(g_planes, pack), g_coords


triplane_sample_packed.defvjp(_packed_fwd, _packed_bwd)


# ------------------------------------ hoisted sample (direct plane VJP)

def table_meta(shape: Tuple[int, int, int, int], pack: str):
    """(rows, row_width, dtype) of build_sample_table's output for `shape`."""
    n3, H, W, F = shape
    dtype = jnp.bfloat16 if pack.endswith('_bf16') else jnp.float32
    base = pack[:-5] if pack.endswith('_bf16') else pack
    if base == 'pair':
        return 2 * n3 * H * (W // 2 + 1), 2 * F, dtype
    assert base == 'quad', pack
    return 4 * n3 * (H // 2 + 1) * (W // 2 + 1), 4 * F, dtype


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def triplane_sample_hoisted(planes_flat: jnp.ndarray, table: jnp.ndarray,
                            coords: jnp.ndarray, scale: float,
                            shape: Tuple[int, int, int, int],
                            pack: str = 'pair', interpret: bool = False,
                            residual_dtype: str = 'table') -> jnp.ndarray:
    """Packed-table sampling whose plane gradient BYPASSES the table.

    The model builds `table = stop_gradient(build_sample_table(planes))`
    once per step (hoisted out of the remat region) and passes BOTH planes
    and table here. Forward gathers from the table; backward computes
    d/d planes DIRECTLY with the Pallas splat from (coords, cotangent) and
    returns a symbolic-zero table cotangent. This replaces the
    triplane_sample_packed + _embed_gplanes + build-autodiff route, whose
    build VJP made XLA materialize four 4x-padded [n3,hb,2,wb,2,F]
    transpose cotangents (3 GB each at satellite batch 8 with 'quad' —
    the round-2 quad OOM). shape = planes_flat.shape as a static tuple.
    """
    assert tuple(planes_flat.shape) == tuple(shape), (planes_flat.shape, shape)
    n3, _, _, F = shape
    n = n3 // 3
    P = coords.shape[1]
    feats, _ = _gather_packed(table, coords, scale, shape, pack)
    return jnp.mean(feats.reshape(n, 3, P, F), axis=1).astype(jnp.float32)


def _hoisted_fwd(planes_flat, table, coords, scale, shape, pack, interpret,
                 residual_dtype):
    n3, _, _, F = shape
    n = n3 // 3
    P = coords.shape[1]
    feats, vals4 = _gather_packed(table, coords, scale, shape, pack)
    out = jnp.mean(feats.reshape(n, 3, P, F), axis=1).astype(jnp.float32)
    if residual_dtype == 'bf16':
        vals4 = vals4.astype(jnp.bfloat16)
    return out, (vals4, coords, jnp.zeros((0,), planes_flat.dtype))


def _hoisted_bwd(scale, shape, pack, interpret, residual_dtype, res, g):
    vals4, coords, planes_proto = res
    n3, H, W, F = shape
    g_planes, g_coords = _sample_bwd(
        scale, interpret, pack, (vals4, coords, (n3, H, W, F), planes_proto), g)
    rows, width, dtype = table_meta(shape, pack)
    # the table is a stop_gradient'd cache of build(planes): its cotangent
    # is dead by construction and XLA DCEs the zeros
    return g_planes, jnp.zeros((rows, width), dtype), g_coords


triplane_sample_hoisted.defvjp(_hoisted_fwd, _hoisted_bwd)


# --------------------- paired sample (merged coarse+fine backward splat)
#
# The renderer samples the planes twice per pass (coarse then fine), and the
# fine sample positions depend on the coarse output — so the two FORWARD
# gathers cannot fuse into one op (round-4 re-cost: a merged differentiable
# gather needs a stop-grad coarse pre-pass that costs more than the merge
# saves). The BACKWARD splats can merge anyway: both cotangent entry sets
# exist by the time the coarse op's bwd runs (reverse-mode runs the fine
# op's bwd first). The fine op smuggles its cotangent rows + coords to the
# coarse op through the cotangent of a zero "token" the coarse op emits and
# the fine op consumes — a data dependency that (a) orders the ops, and
# (b) gives autodiff a channel that flows fine-bwd -> coarse-bwd. The
# coarse bwd then runs triplane_splat_pair: ONE window table (the second
# accumulate aliases the first), ONE unfold, ONE zero-init instead of two.
#
# Token layout: [N, P_fine, F+3] f32 — lanes [0:F] the fine output
# cotangent, [F:F+3] the fine coords (exact f32; bilinear keys/weights are
# recomputed from them in the pair splat). A zero token cotangent (fine
# output unused by the loss) splats zero-value entries at coord 0 — valid
# and harmless.

def token_shape(n: int, p_fine: int, F: int) -> Tuple[int, int, int]:
    return (n, p_fine, F + 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def triplane_sample_pair_first(planes_flat: jnp.ndarray, table: jnp.ndarray,
                               coords: jnp.ndarray, p_fine: int, scale: float,
                               shape: Tuple[int, int, int, int],
                               pack: str = 'pair', interpret: bool = False,
                               residual_dtype: str = 'table'):
    """Coarse-pass sample op of the merged-backward pair.

    Returns (feats [N, P, F] f32, token [N, p_fine, F+3] f32 zeros). Pass
    the token into triplane_sample_pair_second for the fine pass of the
    SAME planes/table. The plane cotangent this op returns is the SUM of
    both passes' splats, computed with one window table."""
    n3, _, _, F = shape
    n = n3 // 3
    P = coords.shape[1]
    feats, _ = _gather_packed(table, coords, scale, shape, pack)
    out = jnp.mean(feats.reshape(n, 3, P, F), axis=1).astype(jnp.float32)
    return out, jnp.zeros(token_shape(n, p_fine, F), jnp.float32)


def _pair_first_fwd(planes_flat, table, coords, p_fine, scale, shape, pack,
                    interpret, residual_dtype):
    n3, _, _, F = shape
    n = n3 // 3
    P = coords.shape[1]
    feats, vals4 = _gather_packed(table, coords, scale, shape, pack)
    out = jnp.mean(feats.reshape(n, 3, P, F), axis=1).astype(jnp.float32)
    if residual_dtype == 'bf16':
        vals4 = vals4.astype(jnp.bfloat16)
    token = jnp.zeros(token_shape(n, p_fine, F), jnp.float32)
    return (out, token), (vals4, coords, jnp.zeros((0,), planes_flat.dtype))


def _pair_first_bwd(p_fine, scale, shape, pack, interpret, residual_dtype,
                    res, cts):
    g, g_token = cts
    vals4, coords, planes_proto = res
    n3, H, W, F = shape
    P = coords.shape[1]
    gp_c = _broadcast_cotangent(g, n3, P, F)
    g_coords = _coords_grad(vals4, coords, gp_c, scale, H, W, n3)
    # unpack the fine pass from the token cotangent (see module comment)
    g_fine = g_token[..., :F]                       # [N, p_fine, F]
    coords_fine = g_token[..., F:F + 3]             # [N, p_fine, 3] exact
    gp_f = _broadcast_cotangent(g_fine, n3, p_fine, F)
    mxu_bf16, entry_bf16, _tbl = _splat_flags(pack)
    g_planes = triplane_splat_pair(gp_c, coords, gp_f, coords_fine,
                                   scale, n3, H, W, interpret=interpret,
                                   mxu_bf16=mxu_bf16, entry_bf16=entry_bf16)
    rows, width, dtype = table_meta(shape, pack)
    return (g_planes.astype(planes_proto.dtype),
            jnp.zeros((rows, width), dtype), g_coords)


triplane_sample_pair_first.defvjp(_pair_first_fwd, _pair_first_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def triplane_sample_pair_second(table: jnp.ndarray, coords: jnp.ndarray,
                                token: jnp.ndarray, scale: float,
                                shape: Tuple[int, int, int, int],
                                pack: str = 'pair', interpret: bool = False,
                                residual_dtype: str = 'table') -> jnp.ndarray:
    """Fine-pass sample op of the merged-backward pair.

    Takes the token emitted by triplane_sample_pair_first; its plane
    gradient rides the token cotangent back to the first op's backward
    (this op returns NO plane cotangent of its own — the table input is
    the stop-grad cache, zero cotangent, as in triplane_sample_hoisted)."""
    n3, _, _, F = shape
    n = n3 // 3
    P = coords.shape[1]
    feats, _ = _gather_packed(table, coords, scale, shape, pack)
    return jnp.mean(feats.reshape(n, 3, P, F), axis=1).astype(jnp.float32)


def _pair_second_fwd(table, coords, token, scale, shape, pack, interpret,
                     residual_dtype):
    n3, _, _, F = shape
    n = n3 // 3
    P = coords.shape[1]
    feats, vals4 = _gather_packed(table, coords, scale, shape, pack)
    out = jnp.mean(feats.reshape(n, 3, P, F), axis=1).astype(jnp.float32)
    if residual_dtype == 'bf16':
        vals4 = vals4.astype(jnp.bfloat16)
    return out, (vals4, coords)


def _pair_second_bwd(scale, shape, pack, interpret, residual_dtype, res, g):
    vals4, coords = res
    n3, H, W, F = shape
    P = coords.shape[1]
    gp = _broadcast_cotangent(g, n3, P, F)
    g_coords = _coords_grad(vals4, coords, gp, scale, H, W, n3)
    # token cotangent = the side-channel payload: raw output cotangent +
    # the coords this op sampled at (values, not gradients — the pair-first
    # bwd rebuilds keys/weights from them)
    g_token = jnp.concatenate(
        [g.astype(jnp.float32), coords.astype(jnp.float32)], axis=-1)
    rows, width, dtype = table_meta(shape, pack)
    return jnp.zeros((rows, width), dtype), g_coords, g_token


triplane_sample_pair_second.defvjp(_pair_second_fwd, _pair_second_bwd)
