"""TPU packet BVH traversal: jnp frustum walk + Pallas leaf sweep.

Replaces the per-ray short-stack walk (reference accelerators/bvh.cpp
:585-687) with a two-phase wavefront design shaped for the TPU:

  Phase A (jnp): rays are sorted by a coherence key (origin Morton,
  then direction octant + direction Morton) and grouped into TILE-ray
  packets. Candidate leaf blocks come from an EXACT dense per-ray slab
  test ([R, B] fused on the VPU, reduced to per-tile nearest-first
  lists) — precise even for direction-incoherent secondary bounces,
  where a conservative tile-frustum test degenerates to "everything".

  Phase B (Pallas): the per-tile lists are compacted into a flat
  (tile, leaf-block) pair list — cost scales with real work, not the
  list capacity. A 1D grid sweeps the pairs: each step block-gathers
  the leaf's (16, 128) component-major triangle block — selected by a
  scalar-prefetched block id in the BlockSpec index_map — and runs
  Moller-Trumbore for the tile's TILE rays on the VPU, folding the
  per-ray (t, prim) minimum. Pairs are tile-sorted, so revisits of a
  tile's accumulator are consecutive; accumulators are input/output
  aliased so blocks untouched by a chunk keep their prior values.

  Waves: A fills lists -> B sweeps -> per-tile t_max tightens -> A
  resumes from the saved stacks. Repeats until every stack drains,
  which also makes leaf-list overflow benign (stalled tiles simply
  continue next wave).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pbrt_tpu.accel.wide_bvh import WideBVH, LEAF_W, TILE, MAX_L

# accumulator sublane count: (ACC_S, 128) tiles span one ray tile
ACC_S = TILE // 128

BIG = 1e30
DEPTH = 64          # per-packet stack depth (wide tree depth << this)
CHUNK = 1 << 20     # rays per dispatch (bounds pair-list / SMEM size)
PAIR_CHUNK = 16384  # (tile, leaf) pairs per Pallas dispatch


# ---------------------------------------------------------------------------
# Phase B: Pallas pair sweep

KP = 4              # pairs swept per grid step (amortizes step overhead)


def _make_sweep_kernel(sentinel_block):
    def _sweep_kernel(pt_ref, pb_ref, rays_ref, tin_ref, pin_ref,
                      tris0_ref, tris1_ref, tris2_ref, tris3_ref,
                      tout_ref, pout_ref):
        import jax.experimental.pallas as pl

        g = pl.program_id(0)
        prev_tile = pt_ref[jnp.maximum(g * KP - KP, 0)]
        tile = pt_ref[g * KP]
        first = (g == 0) | (tile != prev_tile)

        @pl.when(first)
        def _():
            tout_ref[:] = tin_ref[:]
            pout_ref[:] = pin_ref[:]

        rays = rays_ref[:]           # [TILE, 8]
        ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
        dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
        tmin, tmax = rays[:, 6:7], rays[:, 7:8]

        for k, tref in enumerate((tris0_ref, tris1_ref, tris2_ref, tris3_ref)):
            b = pb_ref[g * KP + k]

            # sentinel (padding) sub-pairs only exist to keep shapes
            # static — skip their compute entirely
            @pl.when(b != sentinel_block)
            def _(b=b, tref=tref):
                tris = tref[:]       # [16, LEAF_W]
                v0x, v0y, v0z = tris[0:1, :], tris[1:2, :], tris[2:3, :]
                e1x, e1y, e1z = tris[3:4, :], tris[4:5, :], tris[5:6, :]
                e2x, e2y, e2z = tris[6:7, :], tris[7:8, :], tris[8:9, :]

                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx = ox - v0x
                tvy = oy - v0y
                tvz = oz - v0z
                b1 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                b2 = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                valid = (
                    (jnp.abs(det) > 1e-12)
                    & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
                    & (t > tmin) & (t < tmax)
                )
                t = jnp.where(valid, t, BIG)
                t_blk = jnp.min(t, axis=1).reshape(1, ACC_S, 128)
                idx_blk = jnp.argmin(t, axis=1).astype(jnp.int32).reshape(
                    1, ACC_S, 128)
                prim_blk = b * LEAF_W + idx_blk
                better = t_blk < tout_ref[:]
                tout_ref[:] = jnp.where(better, t_blk, tout_ref[:])
                pout_ref[:] = jnp.where(better, prim_blk, pout_ref[:])
    return _sweep_kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sweep_pairs(pair_tile, pair_block, rays8, t_in, prim_in, tris16,
                 interpret=False):
    """pair_* [PAIR_CHUNK] i32, tile-sorted, KP pairs per step sharing a
    tile (intra-tile padding = sentinel block, whole-step padding =
    sentinel tile); rays8 [(T+1)*TILE, 8]; t/prim [T+1, ACC_S, 128]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Tp = t_in.shape[0]
    n_blocks_pad = tris16.shape[1] // LEAF_W   # includes sentinel block
    tri_spec = lambda k: pl.BlockSpec(
        (16, LEAF_W), (lambda g, pt, pb, k=k: (0, pb[g * KP + k])),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(PAIR_CHUNK // KP,),
        in_specs=[
            pl.BlockSpec((TILE, 8), lambda g, pt, pb: (pt[g * KP], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ACC_S, 128),
                         lambda g, pt, pb: (pt[g * KP], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ACC_S, 128),
                         lambda g, pt, pb: (pt[g * KP], 0, 0),
                         memory_space=pltpu.VMEM),
            tri_spec(0), tri_spec(1), tri_spec(2), tri_spec(3),
        ],
        out_specs=[
            pl.BlockSpec((1, ACC_S, 128),
                         lambda g, pt, pb: (pt[g * KP], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ACC_S, 128),
                         lambda g, pt, pb: (pt[g * KP], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _make_sweep_kernel(n_blocks_pad - 1),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, ACC_S, 128), jnp.float32),
            jax.ShapeDtypeStruct((Tp, ACC_S, 128), jnp.int32),
        ],
        # accumulators alias: blocks a chunk never touches keep their
        # prior values (operands: pt, pb, rays8, t_in, prim_in, tris x4)
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(pair_tile, pair_block, rays8, t_in, prim_in,
      tris16, tris16, tris16, tris16)


# ---------------------------------------------------------------------------
# Phase A: dense per-ray culling. With ~LEAF_W-triangle leaves the leaf
# count is small (B ~ prims/100), so instead of walking a tree we slab-
# test EVERY ray against EVERY leaf box as a fused [R, B] vector op and
# top_k each tile's entered blocks into per-tile lists. O(R*B) of
# ~20-flop tests is cheap on the VPU up to tens of millions of
# triangles, and unlike a tile-frustum test it stays EXACT for
# direction-incoherent secondary bounces.

def _frusta(o, d, tmin, tmax, live, T):
    """Per-tile conservative interval bounds:
    (olo, ohi, ilo, ihi [T,3]; tmin_t, tmax_t [T]; alive [T] bool)."""
    o3 = o.reshape(T, TILE, 3)
    d3 = d.reshape(T, TILE, 3)
    lv = live.reshape(T, TILE, 1)
    safe_d = jnp.where(jnp.abs(d3) > 1e-20, d3, jnp.where(d3 < 0, -1e-20, 1e-20))
    inv = 1.0 / safe_d
    olo = jnp.min(jnp.where(lv, o3, BIG), 1)
    ohi = jnp.max(jnp.where(lv, o3, -BIG), 1)
    ilo = jnp.min(jnp.where(lv, inv, BIG), 1)
    ihi = jnp.max(jnp.where(lv, inv, -BIG), 1)
    lvf = lv[:, :, 0]
    tmin_tile = jnp.min(jnp.where(lvf, tmin.reshape(T, TILE), BIG), 1)
    tmax_c = jnp.where(jnp.isfinite(tmax), tmax, BIG).reshape(T, TILE)
    tmax_tile = jnp.max(jnp.where(lvf, tmax_c, -BIG), 1)
    alive = jnp.any(lvf, 1)
    return olo, ohi, ilo, ihi, tmin_tile, tmax_tile, alive


def _dense_cull(wb: WideBVH, frus, tmax_t, swept):
    """frus: per-tile interval bounds; tmax_t [T]: current per-tile
    farthest useful t (tightens between waves); swept [T, B]: blocks
    already swept. Selects up to MAX_L NEAREST (by conservative entry
    t) unswept candidate blocks per tile. Returns (lst [T, MAX_L] with
    sentinel padding, nl [T], swept', done [T])."""
    olo, ohi, ilo, ihi, tmin_t, _, alive = frus
    T = olo.shape[0]
    B = wb.block_lo.shape[0]
    blo = wb.block_lo[None, :, :]      # [1, B, 3]
    bhi = wb.block_hi[None, :, :]
    u1 = blo - ohi[:, None, :]         # [T, B, 3]
    u2 = blo - olo[:, None, :]
    v1 = bhi - ohi[:, None, :]
    v2 = bhi - olo[:, None, :]
    il = ilo[:, None, :]
    ih = ihi[:, None, :]
    p = (u1 * il, u1 * ih, u2 * il, u2 * ih, v1 * il, v1 * ih, v2 * il, v2 * ih)
    e_min = p[0]
    x_max = p[0]
    for q in p[1:]:
        e_min = jnp.minimum(e_min, q)
        x_max = jnp.maximum(x_max, q)
    L = jnp.maximum(jnp.max(e_min, -1), tmin_t[:, None])   # [T, B]
    U = jnp.min(x_max, -1)
    sel = ((L <= U * 1.0001) & (L <= tmax_t[:, None]) & alive[:, None]
           & ~swept)
    count = jnp.sum(sel, 1)
    # nearest-first: top_k by -entry_t over candidates
    score = jnp.where(sel, -L, -jnp.inf)
    k = min(MAX_L, B)
    val, idx = jax.lax.top_k(score, k)
    got = val > -jnp.inf
    lst = jnp.where(got, idx.astype(jnp.int32), wb.n_blocks)
    if k < MAX_L:
        lst = jnp.concatenate(
            [lst, jnp.full((T, MAX_L - k), wb.n_blocks, jnp.int32)], -1)
        got = jnp.concatenate([got, jnp.zeros((T, MAX_L - k), bool)], -1)
    newly = jnp.zeros((T, B), bool).at[
        jnp.arange(T)[:, None], jnp.clip(lst, 0, B - 1)].max(got)
    swept = swept | newly
    nl = jnp.minimum(count, MAX_L)
    done = count <= MAX_L
    return lst, nl, swept, done


def _perray_candidates(wb: WideBVH, o_s, inv_s, tmin_s, t_cap, live):
    """Exact per-ray slab culling into per-tile entry-sorted candidate
    lists, computed ONCE per traversal.

    The tile-frustum interval test collapses for direction-mixed tiles
    (secondary bounces): reciprocal intervals straddling zero make the
    conservative bound infinite, so EVERY leaf block became a candidate
    and incoherent throughput was ~1% of coherent. Testing each RAY
    against each block costs a dense fused [R, B] slab test (~20 flops
    per pair on the VPU). Wave bodies then just CONSUME successive
    windows of the sorted list with a per-tile pointer — no re-culling,
    and the ascending entry order makes the per-wave acceptance test a
    prefix check against the tile's tightening t bound.

    Dead lanes dominate secondary bounces (they sort to the end), so
    the slab test runs through a while_loop over 64-tile chunks that
    stops at the last live chunk.

    Returns (cand_L [T, B] ascending entry t per tile (inf pad),
             cand_b [T, B] block ids in that order,
             count [T] number of real candidates)."""
    R = o_s.shape[0]
    T = R // TILE
    B = wb.block_lo.shape[0]
    TC = 64                                   # tiles per chunk
    nT = -(-T // TC)
    pad_t = nT * TC - T

    o_p = jnp.pad(o_s, ((0, pad_t * TILE), (0, 0)))
    i_p = jnp.pad(inv_s, ((0, pad_t * TILE), (0, 0)))
    tmin_p = jnp.pad(tmin_s, (0, pad_t * TILE))
    tcap_p = jnp.pad(t_cap, (0, pad_t * TILE), constant_values=-BIG)
    live_p = jnp.pad(live, (0, pad_t * TILE))

    blo = wb.block_lo                         # [B, 3]
    bhi = wb.block_hi

    # live tiles are a sorted prefix: stop chunking at the last one
    live_tiles = jnp.any(live_p.reshape(nT * TC, TILE), -1)
    n_live_chunks = jnp.max(jnp.where(
        jnp.any(live_tiles.reshape(nT, TC), -1),
        jnp.arange(nT, dtype=jnp.int32) + 1, 0))

    def chunk_at(c, Lt):
        s = c * TC * TILE
        oc = lax.dynamic_slice(o_p, (s, 0), (TC * TILE, 3))
        ic = lax.dynamic_slice(i_p, (s, 0), (TC * TILE, 3))
        tminc = lax.dynamic_slice(tmin_p, (s,), (TC * TILE,))
        tcapc = lax.dynamic_slice(tcap_p, (s,), (TC * TILE,))
        livec = lax.dynamic_slice(live_p, (s,), (TC * TILE,))
        t1 = (blo[None, :, :] - oc[:, None, :]) * ic[:, None, :]
        t2 = (bhi[None, :, :] - oc[:, None, :]) * ic[:, None, :]
        L = jnp.maximum(jnp.max(jnp.minimum(t1, t2), -1), tminc[:, None])
        U = jnp.min(jnp.maximum(t1, t2), -1)
        ok = (L <= U * 1.0001) & (L <= tcapc[:, None]) & livec[:, None]
        Lm = jnp.where(ok, L, jnp.inf)        # [TC*TILE, B]
        Lc = jnp.min(Lm.reshape(TC, TILE, B), axis=1)
        return lax.dynamic_update_slice(Lt, Lc, (c * TC, 0))

    Lt0 = jnp.full((nT * TC, B), jnp.inf, jnp.float32)
    Lt = lax.while_loop(
        lambda s: s[0] < n_live_chunks,
        lambda s: (s[0] + 1, chunk_at(s[0], s[1])),
        (jnp.int32(0), Lt0))[1][:T]           # [T, B]

    bids = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[None, :], (T, B))
    cand_L, cand_b = lax.sort((Lt, bids), dimension=1, num_keys=1)
    count = jnp.sum(jnp.isfinite(Lt), 1).astype(jnp.int32)
    return cand_L, cand_b, count


def _window_cull(cand_L, cand_b, count, ptr, tile_t, sentinel_block):
    """Consume the next <= MAX_L candidates per tile whose entry t is
    within the tile's current bound. Ascending order makes acceptance a
    prefix; tile_t only tightens, so rejected entries stay rejected.
    Returns (lst [T, MAX_L], nl [T], ptr', done [T])."""
    T, B = cand_L.shape
    win = ptr[:, None] + jnp.arange(MAX_L, dtype=jnp.int32)[None, :]
    win_c = jnp.clip(win, 0, B - 1)
    wl = jnp.take_along_axis(cand_L, win_c, axis=1)
    wb_ = jnp.take_along_axis(cand_b, win_c, axis=1)
    ok = (win < count[:, None]) & (wl <= tile_t[:, None] * 1.0001)
    lst = jnp.where(ok, wb_, sentinel_block)
    nl = jnp.sum(ok.astype(jnp.int32), 1)
    ptr2 = ptr + nl
    done = (ptr2 >= count) | (nl == 0)
    return lst, nl, ptr2, done


def _morton3(q, bits):
    m = jnp.zeros(q.shape[0], jnp.uint32)
    for b in range(bits):
        m = (m
             | (((q[:, 0] >> b) & 1) << (3 * b))
             | (((q[:, 1] >> b) & 1) << (3 * b + 1))
             | (((q[:, 2] >> b) & 1) << (3 * b + 2)))
    return m


def _coherence_sort(o, d, world_lo, world_hi):
    """Sort key: origin Morton (high), direction octant+Morton (low).
    Pinhole batches (equal origins) sort into image-space blocks via the
    direction bits; scattered secondary rays group spatially first."""
    on = jnp.clip((o - world_lo) / jnp.maximum(world_hi - world_lo, 1e-12),
                  0.0, 1.0)
    qo = (on * 31.0).astype(jnp.uint32)          # 5 bits/axis -> 15
    mo = _morton3(qo, 5)
    oct_ = ((d[:, 0] < 0).astype(jnp.uint32)
            | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
            | ((d[:, 2] < 0).astype(jnp.uint32) << 2))
    qd = (jnp.clip(d * 0.5 + 0.5, 0.0, 1.0) * 15.0).astype(jnp.uint32)
    md = _morton3(qd, 4)                          # 12 bits
    return (mo << 15) | (oct_ << 12) | md


def _sort_rays(o, d, tmin, tmax, world_lo, world_hi):
    """Coherence-sort rays. Row gathers are slow on TPU, so the ray
    columns ride along as lax.sort payload operands instead of being
    gathered through argsort indices. Returns sorted columns + the
    original index column (for the payload-unsort at the end).
    Dead rays (tmax <= tmin) sort to the end, packing themselves into
    all-dead tiles that generate no sweep pairs."""
    key = _coherence_sort(o, d, world_lo, world_hi)
    key = jnp.where(tmax > tmin, key, jnp.uint32(0xFFFFFFFF))
    idx = jnp.arange(o.shape[0], dtype=jnp.int32)
    (_, ox, oy, oz, dx, dy, dz, tmn, tmx, idx_s) = lax.sort(
        (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         tmin, tmax, idx),
        dimension=0, num_keys=1, is_stable=True)
    o_s = jnp.stack([ox, oy, oz], -1)
    d_s = jnp.stack([dx, dy, dz], -1)
    return o_s, d_s, tmn, tmx, idx_s


def _compact_pairs(lst, nl, T, sentinel_block):
    """[T, MAX_L] lists -> flat tile-sorted pair arrays. Per-tile counts
    are rounded up to KP so each grid step's KP sub-pairs share one tile
    (padding sub-pairs carry the sentinel BLOCK, whole-step padding the
    sentinel TILE T). Returns (pair_tile, pair_block, total)."""
    nl_pad = (nl + (KP - 1)) // KP * KP
    mask = (jnp.arange(MAX_L)[None, :] < nl_pad[:, None])
    flat_v = mask.reshape(-1)
    flat_b = lst.reshape(-1)   # sentinel-block beyond nl (top_k padding)
    tiles = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None],
                             (T, MAX_L)).reshape(-1)
    start = jnp.cumsum(nl_pad) - nl_pad          # per-tile start offset
    pos = (jnp.broadcast_to(start[:, None], (T, MAX_L))
           + jnp.arange(MAX_L)[None, :]).reshape(-1)
    total = jnp.sum(nl_pad)
    n_slots = T * MAX_L
    size = n_slots + PAIR_CHUNK  # slack so dynamic_slice never clamps short
    dump = size - 1
    idx = jnp.where(flat_v, pos, dump)
    pair_tile = jnp.full((size,), T, jnp.int32).at[idx].set(
        jnp.where(flat_v, tiles, T))
    pair_block = jnp.full((size,), sentinel_block, jnp.int32).at[idx].set(
        jnp.where(flat_v, flat_b, sentinel_block))
    pair_tile = pair_tile.at[dump].set(T)
    pair_block = pair_block.at[dump].set(sentinel_block)
    return pair_tile, pair_block, total


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "coherent", "interpret"))
def _wide_t_pass_chunk(wb: WideBVH, o, d, tmin, tmax, any_hit=False,
                       coherent=False, interpret=False):
    R = o.shape[0]
    T = R // TILE
    o_s, d_s, tmin_s, tmax_s, idx_s = _sort_rays(
        o, d, tmin, tmax, wb.world_lo, wb.world_hi)
    live_s = tmax_s > tmin_s
    frus = (_frusta(o_s, d_s, tmin_s, tmax_s, live_s, T)
            if coherent else None)

    rays8 = jnp.concatenate([
        o_s, d_s, tmin_s[:, None],
        jnp.where(jnp.isfinite(tmax_s), tmax_s, BIG)[:, None],
    ], -1)
    # one extra (dead) tile of rays for sentinel pairs
    rays8p = jnp.concatenate(
        [rays8, jnp.zeros((TILE, 8), jnp.float32)], 0)

    # cap the pruning bound at the world-bbox exit: no hit can lie
    # beyond it, and it keeps miss rays from pinning their tile's
    # t_max at infinity (which would defeat inter-wave culling)
    safe_d = jnp.where(jnp.abs(d_s) > 1e-20, d_s,
                       jnp.where(d_s < 0, -1e-20, 1e-20))
    inv_s = 1.0 / safe_d
    t_a = (wb.world_lo[None, :] - o_s) * inv_s
    t_b = (wb.world_hi[None, :] - o_s) * inv_s
    exit_t = jnp.min(jnp.maximum(t_a, t_b), -1) * 1.001 + 1e-4
    cap = jnp.minimum(jnp.where(jnp.isfinite(tmax_s), tmax_s, BIG),
                      jnp.maximum(exit_t, 0.0))
    t_best = jnp.where(live_s, cap, -BIG)
    t3 = jnp.concatenate(
        [t_best.reshape(T, ACC_S, 128), jnp.full((1, ACC_S, 128), -BIG)], 0)
    p3 = jnp.full((T + 1, ACC_S, 128), -1, jnp.int32)
    done = jnp.zeros((T,), bool)

    def sweep_lists(lst, nl, t3, p3):
        pair_tile, pair_block, total = _compact_pairs(lst, nl, T, wb.n_blocks)

        def chunk_body(c, carry):
            t3, p3 = carry
            off = c * PAIR_CHUNK
            pt = lax.dynamic_slice(pair_tile, (off,), (PAIR_CHUNK,))
            pb = lax.dynamic_slice(pair_block, (off,), (PAIR_CHUNK,))
            return _sweep_pairs(pt, pb, rays8p, t3, p3, wb.tris16,
                                interpret=interpret)

        n_chunks = (total + PAIR_CHUNK - 1) // PAIR_CHUNK
        return lax.fori_loop(0, n_chunks, chunk_body, (t3, p3))

    def tile_bound(t3, p3):
        # per-tile farthest useful t; any-hit (shadow) queries retire a
        # lane at its FIRST hit — the reference's dedicated IntersectP
        # early-out (bvh.cpp:639-687)
        cap_lane = t3[:T].reshape(T, TILE)
        if any_hit:
            hit_lane = (p3[:T] >= 0).reshape(T, TILE)
            return jnp.max(jnp.where(hit_lane, -BIG, cap_lane), 1)
        return jnp.max(cap_lane, 1)

    # Cull selection (static `coherent` hint from the caller):
    #   coherent  — per-wave tile-frustum interval test: near-free for
    #               camera/shadow beams whose tiles share signs.
    #   otherwise — ONE exact dense per-ray slab cull into entry-sorted
    #               per-tile candidate lists; waves consume successive
    #               windows via a pointer. For direction-mixed secondary
    #               bounces the frustum degenerates to "sweep
    #               everything" (round-3 incoherent rate was ~1% of
    #               coherent).
    if coherent:
        swept = jnp.zeros((T, wb.block_lo.shape[0]), bool)

        def wave_cond(s):
            swept, done, t3, p3, w = s
            return jnp.any(~done) & (w < 64)

        def wave_body(s):
            swept, done, t3, p3, w = s
            lst, nl, swept, done = _dense_cull(
                wb, frus, tile_bound(t3, p3), swept)
            t3, p3 = sweep_lists(lst, nl, t3, p3)
            return swept, done, t3, p3, w + 1

        _, _, t3, p3, _ = lax.while_loop(
            wave_cond, wave_body, (swept, done, t3, p3, jnp.int32(0)))
    else:
        cand_L, cand_b, count = _perray_candidates(
            wb, o_s, inv_s, tmin_s, cap, live_s)
        ptr = jnp.zeros((T,), jnp.int32)

        def wave_cond(s):
            ptr, done, t3, p3, w = s
            return jnp.any(~done) & (w < 64)

        def wave_body(s):
            ptr, done, t3, p3, w = s
            lst, nl, ptr, done = _window_cull(
                cand_L, cand_b, count, ptr, tile_bound(t3, p3),
                wb.n_blocks)
            t3, p3 = sweep_lists(lst, nl, t3, p3)
            return ptr, done, t3, p3, w + 1

        _, _, t3, p3, _ = lax.while_loop(
            wave_cond, wave_body, (ptr, done, t3, p3, jnp.int32(0)))
    t_best = t3[:T].reshape(R)
    prim = p3[:T].reshape(R)

    # padded-slot -> global prim id; then undo the coherence sort
    # (payload-sort by the original index — no scatter)
    gprim = jnp.where(prim >= 0, wb.prim_map[jnp.clip(prim, 0, None)], -1)
    miss = (gprim < 0) | (t_best >= BIG) | ~live_s
    t_o = jnp.where(miss, BIG, t_best)
    p_o = jnp.where(miss, -1, gprim)
    _, t_out, p_out = lax.sort((idx_s, t_o, p_o), dimension=0, num_keys=1)
    return t_out, p_out


def wide_t_pass(wb: WideBVH, ray_o, ray_d, tmin, tmax, any_hit=False,
                coherent=False, interpret=False):
    """[R] rays -> (t [R], global prim [R], -1 = miss). Handles padding
    to TILE multiples and chunking for very large wavefronts. any_hit:
    occlusion semantics — lanes retire at the first confirmed hit (the
    returned t is then SOME hit, not the nearest). coherent: caller
    vouches the batch is beam-like (camera/shadow rays) — selects the
    cheap tile-frustum cull instead of the per-ray slab cull."""
    R = ray_o.shape[0]
    Rpad = max(TILE, (R + TILE - 1) // TILE * TILE)
    if Rpad != R:
        pad = Rpad - R
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate([ray_d, jnp.ones((pad, 3), ray_d.dtype)])
        tmin = jnp.concatenate([tmin, jnp.zeros((pad,), tmin.dtype)])
        tmax = jnp.concatenate([tmax, jnp.full((pad,), -1.0, tmax.dtype)])
    outs_t, outs_p = [], []
    for s in range(0, Rpad, CHUNK):
        e = min(s + CHUNK, Rpad)
        t, p = _wide_t_pass_chunk(wb, ray_o[s:e], ray_d[s:e], tmin[s:e],
                                  tmax[s:e], any_hit=any_hit,
                                  coherent=coherent, interpret=interpret)
        outs_t.append(t)
        outs_p.append(p)
    t = outs_t[0] if len(outs_t) == 1 else jnp.concatenate(outs_t)
    p = outs_p[0] if len(outs_p) == 1 else jnp.concatenate(outs_p)
    return t[:R], p[:R]
