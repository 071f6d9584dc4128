"""Host-side SAH BVH4 builder for the explicit-stack packet kernel.

The production packet kernel (ops/pallas_bvh.py) traverses an implicit
complete pow2 heap (the reference's layout, kernels.cu:614) whose
bitstack needs equal-count splits.  On irregular-density meshes
(terrain, architectural interiors) equal-count topology is measurably
bad: the round-3 topology simulation (experiments/topo_sim.py,
PERFORMANCE.md) puts a true binned-SAH tree at 1.25-1.7x fewer
visit-weighted packet steps on the terrain zoo scene, while the smooth
parametric meshes (knot, dragon) are already topology-optimal.

This module builds that variable topology host-side (NumPy, at scene
construction — SAH builds are data-dependent and cannot be traced):

  * binned SAH over the mesh's sane triangles, with the PACKET cost
    model: a leaf visit costs the full cluster width regardless of
    fill (the kernel's MT loop is fully unrolled over `width` slots),
    so split costs count ceil(n/width) *visits*, not triangles.
  * the binary tree is collapsed into a 4-wide BVH (each node's
    children are its binary grandchildren where possible) so one
    scalar vote round trip — the node step's latency floor — covers
    two binary levels at every depth, like the production kernel's
    4-ary grandchild step but over arbitrary topology.
  * children keep the binary pairing (slots 0,1 = left subtree,
    slots 2,3 = right) so the kernel's hierarchical near-first votes
    (pair-vs-pair, then within the chosen pair) match the binary
    near-first order the heap kernel uses (kernels.cu:183-187).

Output is a :class:`Bvh4Data`: flat f32 child-bounds table + flat i32
child-ref table (both DMA'd HBM→SMEM per packet), triangle cluster
blocks in the same (16, 128) SoA layout the scalar MT loop consumes,
and the 19-wide per-triangle feature rows for the post-kernel winner
gather.  Ref encoding: 0 = empty slot, +k = interior node k-1,
-(c+1) = leaf cluster c.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.models.scene import MeshData

# measured packet cost model (PERFORMANCE.md round-3 phase split)
A_NS = 300.0     # per node step
TRI_NS = 18.4    # per triangle slot of a leaf visit


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Bvh4Data:
    """Device tables for the explicit-stack BVH4 packet kernel."""
    bounds: jnp.ndarray    # [n_nodes*24] f32: node n child k bounds at
    # 24n+6k (minx,miny,minz,maxx,maxy,maxz); empty slots inverted
    refs: jnp.ndarray      # [n_nodes*4] i32: 0 empty / +k interior k-1 /
    # -(c+1) leaf cluster c
    blocks: jnp.ndarray    # [C, 16, 128] f32 cluster SoA DMA blocks
    # (component rows padded to 128 lanes — same layout as the heap
    # kernel's stride-128 blocks)
    tri_feat: jnp.ndarray  # [C*width, 19] winner feature rows (SAH slot
    # order): nx,ny,nz,tc0..5,mid,v0,e1,e2
    tri_map: jnp.ndarray   # [C*width] i32 original mesh slot per SAH
    # slot (-1 = padding) — tests/debug only; the engine needs only
    # hit = slot >= 0
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    stack_cap: int = dataclasses.field(metadata=dict(static=True))
    # quantized tier (dragon-class tables): ``bounds`` holds the packed
    # [n_nodes*12] int32 uint16-quantized table instead of f32, with the
    # dequant scales/offsets in ``qparams`` ([8] f32:
    # sx,sy,sz,lox,loy,loz,0,0 — the heap kernel's layout)
    quant: bool = dataclasses.field(default=False,
                                    metadata=dict(static=True))
    qparams: object = None

    @property
    def n_clusters(self) -> int:
        return self.blocks.shape[0]


def _area3(mn, mx):
    d = np.maximum(mx - mn, 0.0)
    return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] \
        + d[..., 2] * d[..., 0]


def _build_sah_binary(v0, v1, v2, width, n_bins=16, ct=1.0):
    """Binned-SAH binary tree under the per-VISIT packet cost model.

    Returns (bmin [Nb,3], bmax [Nb,3], c0 [Nb], c1 [Nb], order [T],
    leaf_first [Nb], leaf_count [Nb], depth): interior nodes have
    c0/c1 = child indices; leaves have c0 = -1 and
    leaf_first/leaf_count into `order` (the SAH triangle permutation).
    """
    ci = TRI_NS * width / A_NS  # node-steps per leaf visit (~3.9)
    T = v0.shape[0]
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    cent = 0.5 * (tmin + tmax)

    bmin_l, bmax_l, c0_l, c1_l, lf_l, lc_l = [], [], [], [], [], []
    order = []
    n_ordered = 0

    def new_node():
        for lst in (bmin_l, bmax_l):
            lst.append(None)
        for lst in (c0_l, c1_l, lf_l, lc_l):
            lst.append(0)
        return len(c0_l) - 1

    root = new_node()
    stack = [(root, np.arange(T, dtype=np.int64), 0)]
    max_depth = 0
    while stack:
        node, idxs, depth = stack.pop()
        max_depth = max(max_depth, depth)
        bb_min = tmin[idxs].min(0)
        bb_max = tmax[idxs].max(0)
        bmin_l[node] = bb_min
        bmax_l[node] = bb_max
        nt = len(idxs)

        best = None  # (sah_child_sum, left_mask)
        c = cent[idxs]
        for axis in range(3):
            lo, hi = c[:, axis].min(), c[:, axis].max()
            if hi - lo < 1e-12:
                continue
            bins = np.minimum(((c[:, axis] - lo) / (hi - lo)
                               * n_bins).astype(np.int64), n_bins - 1)
            cnt = np.bincount(bins, minlength=n_bins)
            bmn = np.full((n_bins, 3), 1e30, np.float64)
            bmx = np.full((n_bins, 3), -1e30, np.float64)
            np.minimum.at(bmn, bins, tmin[idxs])
            np.maximum.at(bmx, bins, tmax[idxs])
            lmn = np.minimum.accumulate(bmn, 0)
            lmx = np.maximum.accumulate(bmx, 0)
            rmn = np.minimum.accumulate(bmn[::-1], 0)[::-1]
            rmx = np.maximum.accumulate(bmx[::-1], 0)[::-1]
            lc = np.cumsum(cnt)[:-1]
            rc = nt - lc
            vl = -(-lc // width)  # ceil: minimal leaf VISITS left
            vr = -(-rc // width)
            cost = _area3(lmn, lmx)[:-1] * vl \
                + _area3(rmn[1:], rmx[1:]) * vr
            valid = (lc > 0) & (rc > 0)
            if not valid.any():
                continue
            j = int(np.argmin(np.where(valid, cost, 1e30)))
            if best is None or cost[j] < best[0]:
                best = (cost[j], bins <= j)

        parent_area = max(_area3(bb_min, bb_max), 1e-30)
        if nt <= width and (
                best is None
                or ct + ci * best[0] / parent_area >= ci * 1.0):
            c0_l[node] = -1
            lf_l[node] = n_ordered
            lc_l[node] = nt
            order.append(idxs)
            n_ordered += nt
            continue
        if best is None:
            # degenerate centroids: forced median halves
            axis = int(np.argmax(bb_max - bb_min))
            srt = np.argsort(cent[idxs][:, axis], kind="stable")
            lmask = np.zeros(nt, bool)
            lmask[srt[: nt // 2]] = True
        else:
            lmask = best[1]
        l_id = new_node()
        r_id = new_node()
        c0_l[node] = l_id
        c1_l[node] = r_id
        stack.append((l_id, idxs[lmask], depth + 1))
        stack.append((r_id, idxs[~lmask], depth + 1))

    return (np.stack(bmin_l).astype(np.float32),
            np.stack(bmax_l).astype(np.float32),
            np.asarray(c0_l, np.int64), np.asarray(c1_l, np.int64),
            np.concatenate(order) if order else np.zeros(0, np.int64),
            np.asarray(lf_l, np.int64), np.asarray(lc_l, np.int64),
            max_depth)


def _collapse4(bmin, bmax, c0, c1, lf, lc):
    """Collapse the binary tree to 4-wide nodes: each BVH4 node's
    children are the binary node's grandchildren (a binary-leaf child
    stays a direct child in slot 0 of its pair).  Returns
    (bounds [Nn*24] f32, refs [Nn*4] i32, clusters list of
    (first, count), depth4)."""
    INV = np.array([1e30, 1e30, 1e30, -1e30, -1e30, -1e30], np.float32)

    clusters = []  # (first, count) per BVH4 leaf cluster

    def leaf_ref(b):
        clusters.append((int(lf[b]), int(lc[b])))
        return -len(clusters)  # -(c+1)

    bounds_rows = []
    refs_rows = []
    # map binary interior node -> bvh4 node id, BFS so ids are stable
    if c0[0] < 0:
        # degenerate single-leaf tree: one node, one child slot
        bounds = np.full(24, 0, np.float32)
        bounds[:] = np.tile(INV, 4)
        bounds[0:3] = bmin[0]
        bounds[3:6] = bmax[0]
        refs = np.zeros(4, np.int32)
        refs[0] = leaf_ref(0)
        return (bounds, refs, clusters, 1)

    node_of = {0: 0}
    queue = [0]
    depth_of = {0: 1}
    depth4 = 1
    next_id = 1
    # first pass: assign ids so refs can point forward
    order4 = []
    while queue:
        b = queue.pop(0)
        order4.append(b)
        # expansion: for each binary child, its children if interior
        slots = []
        for ch in (c0[b], c1[b]):
            if c0[ch] < 0:
                slots.append((ch, True))
                slots.append(None)
            else:
                for g in (c0[ch], c1[ch]):
                    if c0[g] < 0:
                        slots.append((g, True))
                    else:
                        slots.append((g, False))
        for s in slots:
            if s is not None and not s[1]:
                g = s[0]
                node_of[g] = next_id
                depth_of[g] = depth_of[b] + 1
                depth4 = max(depth4, depth_of[g])
                next_id += 1
                queue.append(g)

    for b in order4:
        row_b = np.tile(INV, 4).astype(np.float32)
        row_r = np.zeros(4, np.int32)
        slots = []
        for ch in (c0[b], c1[b]):
            if c0[ch] < 0:
                slots.append(ch)
                slots.append(None)
            else:
                slots.append(c0[ch])
                slots.append(c1[ch])
        for k, g in enumerate(slots):
            if g is None:
                continue
            row_b[6 * k: 6 * k + 3] = bmin[g]
            row_b[6 * k + 3: 6 * k + 6] = bmax[g]
            if c0[g] < 0:
                row_r[k] = leaf_ref(g)
            else:
                row_r[k] = node_of[g] + 1
        bounds_rows.append(row_b)
        refs_rows.append(row_r)

    return (np.concatenate(bounds_rows), np.concatenate(refs_rows),
            clusters, depth4)


def _sah_binary_for(mesh: MeshData, width: int, n_bins: int,
                    host: dict | None = None):
    """Filter sane triangles and build the binary SAH tree (native C++
    builder when available, NumPy fallback). Returns
    (tris, built): tris = (v0, v1, v2, tc, mid, slot_ids),
    built = the _build_sah_binary tuple.

    ``host``: optional dict of the mesh's HOST-side numpy arrays
    (v0/v1/v2/tc/mid) — ops/bvh.build_bvh passes them so the build
    never downloads device arrays (the axon relay downloads at
    ~0.5 MB/s; a dragon-scale round trip measured ~700 s)."""
    if host is not None:
        v0a = np.asarray(host["v0"])
    else:
        v0a = np.asarray(mesh.v0)
    sane = np.isfinite(v0a).all(1)
    slot_ids = np.nonzero(sane)[0].astype(np.int64)
    get = (lambda k: np.asarray(host[k])) if host is not None else \
        (lambda k: np.asarray(getattr(mesh, k)))
    v0 = v0a[sane]
    v1 = get("v1")[sane]
    v2 = get("v2")[sane]
    tc = get("tex_coords")[sane]
    mid = get("mesh_id")[sane]

    built = None
    try:
        from tpu_pathtracer.native import native_bvh4_binary
        built = native_bvh4_binary(v0, v1, v2, width, n_bins,
                                   ci=TRI_NS * width / A_NS, ct=1.0)
    except Exception:  # pragma: no cover - native lib is optional
        built = None
    if built is None:
        built = _build_sah_binary(v0, v1, v2, width, n_bins)
    return (v0, v1, v2, tc, mid, slot_ids), built


def expected_cost_ratio(mesh: MeshData, bounds: np.ndarray,
                        refs: np.ndarray, width: int,
                        host: dict | None = None) -> float:
    """SA-heuristic expected packet-traversal cost of a candidate BVH4
    tree relative to the mesh's implicit-heap tree, under the measured
    cost model (A_NS per 2-binary-level node step, TRI_NS per leaf
    slot). < 1 means the SAH topology is predicted cheaper.

    Both trees are priced consistently: one BVH4 node == one heap
    quad step == two binary levels (so heap interior nodes count
    A_NS/2 each), and a leaf visit costs its full cluster width
    (the kernels' MT loops are fully unrolled). This is the per-mesh
    generalization of the round-3 topology sim
    (experiments/topo_sim.py), cheap enough to run at scene build:
    the sim's measured/simulated gains order the same way (knot ~1.0,
    dragon ~1.05, terrain/stairs 1.25-1.7)."""
    # --- heap tree ---------------------------------------------------
    if host is not None:
        hmin = np.asarray(host["bvh_min"], np.float64)
        hmax = np.asarray(host["bvh_max"], np.float64)
    else:
        hmin = np.asarray(mesh.bvh_min, np.float64)
        hmax = np.asarray(mesh.bvh_max, np.float64)
    L = mesh.first_leaf
    sa = _area3(hmin, hmax)
    sa = np.where(np.isfinite(sa), sa, 0.0)  # sentinel-padded leaves
    root = max(float(sa[1]), 1e-30)
    heap = (0.5 * A_NS * float(sa[1:L].sum() / root)
            + mesh.prims_per_leaf * TRI_NS
            * float(sa[L: 2 * L].sum() / root))
    # --- BVH4 candidate ----------------------------------------------
    b = np.asarray(bounds, np.float64).reshape(-1, 4, 6)
    r = np.asarray(refs).reshape(-1, 4)
    csa = _area3(b[..., 0:3], b[..., 3:6])
    csa = np.where(r != 0, csa, 0.0)
    # every non-root node's own box appears exactly once as an
    # interior child slot; the root contributes SA_root itself
    quad = (A_NS * (1.0 + float(csa[r > 0].sum() / root))
            + width * TRI_NS * float(csa[r < 0].sum() / root))
    return quad / max(heap, 1e-30)


def build_bvh4(mesh: MeshData, width: int = 64,
               n_bins: int = 16, host: dict | None = None) -> Bvh4Data:
    """Build the SAH BVH4 tables for ``mesh`` (host-side NumPy).

    The mesh keeps its implicit-heap tree untouched (the CPU fallback
    and serialization paths still use it); the BVH4 carries its OWN
    reordered cluster blocks, so attaching it changes no existing
    behavior until the dispatch selects the BVH4 kernel.
    """
    tris, built = _sah_binary_for(mesh, width, n_bins, host=host)
    bmin, bmax, c0, c1, order, lf, lc, _db = built
    bounds, refs, clusters, depth4 = _collapse4(bmin, bmax, c0, c1,
                                                lf, lc)
    return _assemble4(tris, order, bounds, refs, clusters, depth4,
                      width)


def _assemble4(tris, order, bounds, refs, clusters, depth4,
               width: int) -> Bvh4Data:
    """Pack cluster blocks + feature rows (the expensive assembly —
    deferred until a tier decision has accepted the tree)."""
    v0, v1, v2, tc, mid, slot_ids = tris
    C = len(clusters)
    n_nodes = refs.shape[0] // 4

    # padded per-slot triangle arrays in cluster order
    S = C * width
    pv0 = np.zeros((S, 3), np.float32)
    pe1 = np.zeros((S, 3), np.float32)
    pe2 = np.zeros((S, 3), np.float32)
    ptc = np.zeros((S, 6), np.float32)
    pmid = np.zeros(S, np.float32)
    tri_map = np.full(S, -1, np.int32)
    for ci_, (first, count) in enumerate(clusters):
        sl = slice(ci_ * width, ci_ * width + count)
        tids = order[first: first + count]
        pv0[sl] = v0[tids]
        pe1[sl] = v1[tids] - v0[tids]
        pe2[sl] = v2[tids] - v0[tids]
        ptc[sl] = tc[tids]
        pmid[sl] = mid[tids]
        tri_map[sl] = slot_ids[tids]

    nrm = np.cross(pe1, pe2)  # zero rows for padding -> a=0 -> miss
    comps = np.zeros((12, S), np.float32)
    comps[0:3] = pv0.T
    comps[3:6] = pe1.T
    comps[6:9] = pe2.T
    comps[9:12] = nrm.T
    if width & (width - 1) == 0 and 12 * width <= 1024:
        # PACKED layout (r4): component c of tri w at flat c*width+w
        # inside a single (8,128) block per cluster — halves the
        # per-visit DMA (4 KB vs the legacy 8 KB of half-empty rows),
        # which the leafmt_probe decomposition says is the entire
        # per-visit overhead. All indices stay compile-time static
        # under full unroll (off = c*width; row off//128,
        # col off%128 + w — in-range because width | 128). The r2
        # "packed blocks" negative result was cpb>1 multi-cluster
        # packing with DYNAMIC row offsets; this is one cluster per
        # block, cpb=1, static.
        flat = comps.reshape(12, C, width).transpose(1, 0, 2) \
            .reshape(C, 12 * width)
        blk = np.zeros((C, 8 * 128), np.float32)
        blk[:, : 12 * width] = flat
        blk = blk.reshape(C, 8, 128)
    else:
        # legacy layout: one component per row, lanes 0..width-1
        blk = np.concatenate(
            [comps, np.zeros((4, S), np.float32)], axis=0) \
            .reshape(16, C, width).transpose(1, 0, 2)
        if width < 128:
            blk = np.concatenate(
                [blk, np.zeros((C, 16, 128 - width), np.float32)],
                axis=2)
    tri_feat = np.concatenate(
        [nrm, ptc, pmid[:, None], pv0, pe1, pe2],
        axis=1).astype(np.float32)

    return Bvh4Data(
        bounds=jnp.asarray(bounds), refs=jnp.asarray(refs),
        blocks=jnp.asarray(blk), tri_feat=jnp.asarray(tri_feat),
        tri_map=jnp.asarray(tri_map),
        n_nodes=int(n_nodes), width=int(width),
        stack_cap=int(3 * depth4 + 8))


def _quantize4(bounds: np.ndarray, refs: np.ndarray):
    """Pack the [Nn*24] f32 child-bounds table into [Nn*12] int32 words
    of uint16 bounds relative to the root box, rounded OUTWARD plus a
    one-quantum pad, so every dequantized box provably contains the
    true box — traversal stays exact (conservative boxes add visits,
    never miss hits), the same contract as the heap kernel's quantized
    tables (ops/pallas_bvh.build_packet_mesh).  Empty child slots
    (ref == 0) are forced to inverted quantized boxes (qlo=65535,
    qhi=0) so the slab test can never hit them.

    Word layout matches ops/pallas_bvh._node_bounds4's dequant:
    w0 = qminx | qminy<<16, w1 = qminz | qmaxx<<16,
    w2 = qmaxy | qmaxz<<16; dq(q) = f32(q) * s_axis + lo_axis.
    Returns (words [Nn*12] int32, qparams [8] f32).
    """
    b = bounds.reshape(-1, 4, 6).astype(np.float64)
    live = refs.reshape(-1, 4) != 0
    mins = b[..., 0:3]
    maxs = b[..., 3:6]
    root_lo = np.where(live[..., None], mins, 1e30).min(axis=(0, 1))
    root_hi = np.where(live[..., None], maxs, -1e30).max(axis=(0, 1))
    # final f32 dequant constants; offset rounded DOWN so dq(0) <= lo
    lo32 = np.nextafter(root_lo.astype(np.float32),
                        np.float32(-np.inf)).astype(np.float64)
    # /65000 leaves headroom above qhi ~= 65002 and keeps the 1-quantum
    # pad >> the f32 rounding error of q*s+lo (~2^-24 * extent)
    s32 = (np.maximum(root_hi - root_lo, 1e-20) / 65000.0) \
        .astype(np.float32).astype(np.float64)
    qlo = np.clip(np.floor((mins - lo32) / s32) - 1, 0, 65535)
    qhi = np.clip(np.ceil((maxs - lo32) / s32) + 1, 0, 65535)
    qlo = np.where(live[..., None], qlo, 65535).astype(np.uint32)
    qhi = np.where(live[..., None], qhi, 0).astype(np.uint32)
    w0 = qlo[..., 0] | (qlo[..., 1] << 16)
    w1 = qlo[..., 2] | (qhi[..., 0] << 16)
    w2 = qhi[..., 1] | (qhi[..., 2] << 16)
    words = np.stack([w0, w1, w2], axis=-1).reshape(-1) \
        .astype(np.uint32).view(np.int32)
    qparams = np.concatenate(
        [s32, lo32, np.zeros(2)]).astype(np.float32)
    return words, qparams


# the kernel DMAs the whole node table HBM->SMEM per packet; leave
# headroom under the ~512 KB SMEM for the cluster block + stack
SMEM_TABLE_BUDGET = 400 << 10
# per-mesh auto tier selection for the quant tier (attach_bvh4
# auto_ratio): attach only when the SA-heuristic expected cost of the
# SAH topology is at least ~15% below the heap walk — the quantized
# BVH4 step carries ~5% overhead (dragon measured 0.97x at a
# predicted ratio near 1; terrain-class irregular meshes predict
# 0.6-0.8 and measured 1.33x as the f32 tier)
QUANT_AUTO_RATIO = 0.85
# quantized tables are 12+4 words/node (vs 28 f32) and ride the SMEM
# ceiling the heap kernel probed to 768 KB; the dragon's 7,887-node
# table is 492 KB here (vs 862 KB f32)
QUANT_TABLE_BUDGET = 640 << 10


def attach_bvh4(mesh: MeshData, width: int = 64,
                n_bins: int = 16, silent: bool = False,
                quant: str | bool = "auto",
                auto_ratio: float | None = None,
                host: dict | None = None) -> MeshData:
    """Return ``mesh`` with SAH BVH4 tables attached.

    Tables that fit ``SMEM_TABLE_BUDGET`` stay f32.  Bigger tables
    (dragon-class: 7,887 nodes = 862 KB f32) fall to the uint16
    quantized tier when they fit ``QUANT_TABLE_BUDGET`` (dragon:
    492 KB) — outward-rounded boxes keep traversal exact, same
    contract as the heap kernel's quantized path.  ``quant=True``
    forces quantization (tests); ``False`` disables the tier.  A mesh
    fitting neither budget is returned unchanged (warning unless
    ``silent``) and stays on the heap kernel.

    ``auto_ratio``: per-mesh tier auto-selection (VERDICT r3 item 8).
    When set, a tree landing in the QUANT tier is attached only if
    ``expected_cost_ratio`` predicts at least that relative cost
    (e.g. 0.85 = predicted >=15% cheaper than the heap walk) — the
    quantized BVH4 walk carries ~5% overhead vs the heap kernel's
    quantized path, so topology-neutral dragon-class meshes (measured
    0.97x, PERFORMANCE.md) must stay on the heap. f32-tier tables are
    exempt: they measured >= neutral on every workload (knot 1.00x,
    torus 1.005x, terrain 1.33x, stairs 1.68x)."""
    tris, built = _sah_binary_for(mesh, width, n_bins, host=host)
    bmin, bmax, c0, c1, order, lf, lc, _db = built
    bounds, refs, clusters, depth4 = _collapse4(bmin, bmax, c0, c1,
                                                lf, lc)
    n_nodes = refs.shape[0] // 4
    table_bytes = (bounds.size + refs.size) * 4
    qtable_bytes = (n_nodes * 12 + refs.size) * 4
    use_quant = quant is True or (quant == "auto"
                                  and table_bytes > SMEM_TABLE_BUDGET
                                  and qtable_bytes
                                  <= QUANT_TABLE_BUDGET)
    if use_quant and quant == "auto" and auto_ratio is not None:
        ratio = expected_cost_ratio(mesh, bounds, refs, width,
                                    host=host)
        if ratio > auto_ratio:
            if not silent:
                import warnings
                warnings.warn(
                    f"BVH4 quant tier skipped: expected cost ratio "
                    f"{ratio:.2f} > {auto_ratio:.2f} — topology is "
                    "already near-optimal for the heap kernel.",
                    RuntimeWarning, stacklevel=2)
            return mesh
    if not use_quant and table_bytes > SMEM_TABLE_BUDGET:
        if not silent:
            import warnings
            warnings.warn(
                f"BVH4 node table ({table_bytes >> 10} KB for "
                f"{n_nodes} nodes; {qtable_bytes >> 10} KB "
                f"quantized) exceeds the SMEM budgets "
                f"({SMEM_TABLE_BUDGET >> 10}/"
                f"{QUANT_TABLE_BUDGET >> 10} KB); keeping the "
                "implicit-heap packet kernel.",
                RuntimeWarning, stacklevel=2)
        return mesh
    data = _assemble4(tris, order, bounds, refs, clusters, depth4,
                      width)
    if use_quant:
        words, qp = _quantize4(np.asarray(data.bounds),
                               np.asarray(data.refs))
        data = dataclasses.replace(
            data, bounds=jnp.asarray(words), quant=True,
            qparams=jnp.asarray(qp))
    return dataclasses.replace(mesh, bvh4=data)
