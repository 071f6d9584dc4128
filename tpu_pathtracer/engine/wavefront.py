"""Wavefront path-tracing stages (component-SoA) + the plain batch engine.

The reference renders with one megakernel: one CUDA thread owns one pixel
and serially loops samples × bounces (kernels.cu:535–569, :396–533). A
megakernel maps badly onto TPU, so this engine inverts it into a
*wavefront*: a batch of N paths advances one bounce per iteration of a
``lax.while_loop``; each stage (intersect, scatter, NEE, roulette) is a
fixed-shape masked vector op over dense ``[N]`` component arrays
(:mod:`tpu_pathtracer.ops.v3` — interleaved ``[N,3]`` state would pad its
3-wide minor dim to 128 TPU lanes).

Radiance accumulation reproduces the reference exactly (SURVEY §3.3):
  * miss  → ``color += attenuation * sky`` then the path ends
    (kernels.cu:424);
  * specular light hit → path ends contributing NOTHING when NEE is on
    (the as-built quirk, kernels.cu:440–446), or adds
    ``attenuation * lightColor`` when NEE is off (kernels.cu:444);
  * NEE contribution uses the attenuation *after* the scatter update
    (kernels.cu:487 before :493);
  * roulette starts at bounce 4 with survival prob max(attenuation)
    (kernels.cu:512–527).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.camera import Camera
from tpu_pathtracer.models import scene as sc
from tpu_pathtracer.models.scene import Scene
from tpu_pathtracer.ops import bvh as _bvh
from tpu_pathtracer.ops import materials as _m
from tpu_pathtracer.ops import rng as _rng
from tpu_pathtracer.ops.v3 import V3, where as vwhere
from tpu_pathtracer.ops.vec import FLT_MAX

TRI_BRUTE_MAX = 16384  # VMEM budget for the Pallas all-triangles kernel


def _on_tpu(config: RenderConfig) -> bool:
    """Dispatch to the Pallas kernel path. True on real TPU, and with
    ``force_feat_kernels`` also off-TPU (interpret mode) so CI exercises
    the exact feature-fetch hot path that runs on hardware."""
    if config.force_feat_kernels:
        return True
    return jax.default_backend() == "tpu" and not config.interpret


def _interp(config: RenderConfig) -> bool:
    """Run Pallas kernels in interpret mode when not on real TPU."""
    return jax.default_backend() != "tpu" or config.interpret


class MatCols(NamedTuple):
    """Per-lane material columns (the `material` row each lane hit,
    helper_structs.h:133–138 extended) — fetched inside the intersection
    kernels on TPU, gathered on CPU."""
    mtype: jnp.ndarray        # [N] int32
    color: V3
    color2: V3
    param: jnp.ndarray
    param2: jnp.ndarray
    absorption: V3
    scatter_dist: jnp.ndarray
    tex_id: jnp.ndarray       # [N] int32

    @staticmethod
    def zeros(n: int) -> "MatCols":
        z = jnp.zeros((n,))
        zi = jnp.zeros((n,), jnp.int32)
        return MatCols(zi, V3.zeros((n,)), V3.zeros((n,)), z, z,
                       V3.zeros((n,)), z, zi)


def _cols_where(mask: jnp.ndarray, a: MatCols, b: MatCols) -> MatCols:
    return jax.tree.map(lambda x, y: jnp.where(mask, x, y), a, b)


def _gather_cols(mats, mat_id: jnp.ndarray) -> MatCols:
    """CPU path: material columns via jnp gathers."""
    g = lambda a: a[mat_id]
    g3 = lambda a: V3(a[:, 0][mat_id], a[:, 1][mat_id], a[:, 2][mat_id])
    return MatCols(mtype=g(mats.mtype), color=g3(mats.color),
                   color2=g3(mats.color2), param=g(mats.param),
                   param2=g(mats.param2), absorption=g3(mats.absorption),
                   scatter_dist=g(mats.scatter_dist), tex_id=g(mats.tex_id))


def _material_table(mats, ids: jnp.ndarray) -> jnp.ndarray:
    """[len(ids), 14] material columns joined by id (host-side prep for the
    in-kernel feature fetch)."""
    cols = [mats.mtype.astype(jnp.float32)[ids],
            mats.color[:, 0][ids], mats.color[:, 1][ids],
            mats.color[:, 2][ids],
            mats.color2[:, 0][ids], mats.color2[:, 1][ids],
            mats.color2[:, 2][ids],
            mats.param[ids], mats.param2[ids],
            mats.absorption[:, 0][ids], mats.absorption[:, 1][ids],
            mats.absorption[:, 2][ids],
            mats.scatter_dist[ids], mats.tex_id.astype(jnp.float32)[ids]]
    return jnp.stack(cols, axis=1)


def _cols_from_feats(f, off: int) -> MatCols:
    """Decode the 14 material columns out of kernel feature outputs."""
    return MatCols(
        mtype=f[off + 0].astype(jnp.int32),
        color=V3(f[off + 1], f[off + 2], f[off + 3]),
        color2=V3(f[off + 4], f[off + 5], f[off + 6]),
        param=f[off + 7], param2=f[off + 8],
        absorption=V3(f[off + 9], f[off + 10], f[off + 11]),
        scatter_dist=f[off + 12],
        tex_id=f[off + 13].astype(jnp.int32))


class SceneView(NamedTuple):
    """Per-call component-SoA view of the scene's hot arrays. Built once
    per traced function (outside the bounce loop) so the slices are loop
    invariants."""
    sph_c: Optional[V3]            # sphere centers, [S] components
    sph_r: Optional[jnp.ndarray]   # [S]
    sph_feat: Optional[jnp.ndarray]  # [S, 18] center,radius + material cols
    tri_v0: Optional[V3]           # [T] components
    tri_e1: Optional[V3]
    tri_e2: Optional[V3]
    tri_n: Optional[V3]            # precomputed face normals e1×e2
    tri_feat: Optional[jnp.ndarray]  # [T, 26] e1,e2,tc + material cols
    atlas: Optional[jnp.ndarray]     # [K*H*W, 3] row-packed texel table
    packet: Optional[object] = None   # ops.pallas_bvh.PacketMesh (big mesh)
    mat_rows: Optional[jnp.ndarray] = None  # [n_mats, 14] material columns


# lanes per traversal packet: the kernels trace (8,128) ray tiles, so
# packet-path node/leaf counters advance once per 1024 rays
PACKET_LANES = 1024


def _use_packet(scene: Scene, config: RenderConfig) -> bool:
    """Large meshes on the TPU path traverse via the packet BVH kernel."""
    if not (scene.has_mesh and config.use_bvh and _on_tpu(config)):
        return False
    fl = scene.mesh.first_leaf
    thresh = config.packet_threshold or TRI_BRUTE_MAX
    if scene.mesh.num_tris <= thresh:
        return False
    if fl & (fl - 1) != 0:
        # Our builders always produce implicit-heap trees with a
        # power-of-two leaf row, but an externally loaded .bvh may not;
        # the jnp gather fallback it lands on is ~75x slower than the
        # packet kernel (PERFORMANCE.md). Warn loudly rather than
        # silently regress.
        import warnings
        warnings.warn(
            f"mesh with {scene.mesh.num_tris} triangles has a "
            f"non-power-of-two leaf row (first_leaf={fl}): the TPU "
            "packet-BVH kernel requires an implicit-heap tree with a "
            "power-of-two leaf count, so this render falls back to the "
            "gather traversal (~75x slower). Rebuild the BVH with "
            "tpu_pathtracer.ops.bvh.build_bvh to restore the fast "
            "path.",
            RuntimeWarning, stacklevel=3)
        return False
    return True


def make_view(scene: Scene, config: Optional[RenderConfig] = None
              ) -> SceneView:
    sph_c = sph_r = sph_feat = None
    if scene.has_spheres:
        sph_c = V3.from_array(scene.sphere_center)
        sph_r = scene.sphere_radius
        sph_feat = jnp.concatenate(
            [scene.sphere_center, sph_r[:, None],
             _material_table(scene.materials, scene.sphere_mat)], axis=1)
    tri_v0 = tri_e1 = tri_e2 = tri_n = tri_feat = None
    packet = mat_rows = None
    use_packet = (config is not None and _use_packet(scene, config))
    if scene.has_mesh and not use_packet:
        m = scene.mesh
        if (m.brute is not None and config is not None
                and _on_tpu(config) and config.use_bvh
                and m.num_tris <= TRI_BRUTE_MAX):
            # compacted arrays (no interleaved sentinel padding): the
            # brute kernels' scalar-broadcast loop runs only LIVE
            # triangles (396 vs 640 slots on the toy staircase); tri
            # ids stay internally consistent — the engine consumes
            # only hit = id >= 0 plus the kernel-fetched features.
            # Gated on EXACTLY the kernel-dispatch condition: the
            # non-kernel paths gather view.tri_feat with PADDED-space
            # tri ids and must keep the padded table.
            mv0, mv1, mv2, mtc, mmid = m.brute
        else:
            mv0, mv1, mv2, mtc, mmid = (m.v0, m.v1, m.v2,
                                        m.tex_coords, m.mesh_id)
        tri_v0 = V3.from_array(mv0)
        tri_e1 = V3.from_array(mv1) - tri_v0
        tri_e2 = V3.from_array(mv2) - tri_v0
        tri_n = tri_e1.cross(tri_e2)
        safe_mid = jnp.clip(mmid, 0, scene.materials.count - 1)
        tri_feat = jnp.concatenate(
            [jnp.nan_to_num(mv1 - mv0, posinf=0.0, neginf=0.0),
             jnp.nan_to_num(mv2 - mv0, posinf=0.0, neginf=0.0),
             mtc,
             _material_table(scene.materials, safe_mid)], axis=1)
    if use_packet:
        if config.bvh4 and scene.mesh.bvh4 is not None:
            # prebuilt SAH BVH4 tables (ops/bvh4): the explicit-stack
            # kernel frees the tree topology — measurably better on
            # irregular-density meshes (topo sim: terrain/stairs
            # 1.25-1.7x fewer visit-weighted steps)
            packet = scene.mesh.bvh4
        elif config.mx_leaf:
            from tpu_pathtracer.ops.pallas_bvh_mx import build_packet_mx
            packet = build_packet_mx(scene.mesh,
                                     max_width=config.packet_width)
        elif config.regroup:
            from tpu_pathtracer.ops.pallas_bvh_rg import build_packet_rg
            packet = build_packet_rg(scene.mesh,
                                     max_width=config.packet_width)
        else:
            from tpu_pathtracer.ops.pallas_bvh import build_packet_mesh
            packet = build_packet_mesh(scene.mesh,
                                       max_width=config.packet_width)
        mat_rows = _material_table(
            scene.materials,
            jnp.arange(scene.materials.count, dtype=jnp.int32))
    atlas = None
    if scene.has_textures:
        # [K,H,W,3] -> [K*H*W, 3]: the texel fetch becomes ONE row
        # gather per lane instead of 3 element gathers (~1.3 ms each at
        # 131k lanes — measured rows up to 320 B gather at the same cost
        # as one element)
        a = scene.tex_atlas
        atlas = a.reshape(-1, 3)
    return SceneView(sph_c, sph_r, sph_feat, tri_v0, tri_e1, tri_e2,
                     tri_n, tri_feat, atlas, packet, mat_rows)


class Intersection(NamedTuple):
    """SoA `intersection` (helper_structs.h:16–36) + the hit material's
    columns (fetched in-kernel on TPU, gathered on CPU)."""
    obj: jnp.ndarray      # [N] int32 OBJ_* id
    t: jnp.ndarray        # [N]
    normal: V3            # flipped to face the ray (kernels.cu:354)
    cols: "MatCols"       # material of the hit surface
    tex_u: jnp.ndarray    # [N]
    tex_v: jnp.ndarray    # [N]


class Stats(NamedTuple):
    """The reference's full 18-counter ray-accounting matrix
    (kernels.cu:48–66) as masked sums. Semantics follow the as-built
    rayStat call sites exactly, including the quirk that a primary ray
    hitting a non-mesh surface ALSO counts into primary_nohit
    (kernels.cu:430). nodes_both/nodes_single (kernels.cu:220–221) count
    traversal steps — per ray on the jnp traversal, per packet on the
    packet-BVH kernel (the refactor-validation signal either way); the
    brute-force paths visit no nodes."""
    primary: jnp.ndarray
    primary_hit_mesh: jnp.ndarray
    primary_nohit: jnp.ndarray
    primary_bbox_nohit: jnp.ndarray
    secondary: jnp.ndarray
    secondary_mesh: jnp.ndarray
    secondary_nohit: jnp.ndarray
    secondary_mesh_nohit: jnp.ndarray
    secondary_bbox_nohit: jnp.ndarray
    shadows: jnp.ndarray
    shadows_bbox_nohit: jnp.ndarray
    shadows_nohit: jnp.ndarray
    low_power: jnp.ndarray
    exceed_max_bounce: jnp.ndarray
    roulette_kill: jnp.ndarray
    nans: jnp.ndarray
    nodes_both: jnp.ndarray
    nodes_single: jnp.ndarray
    # 19th counter, ours: leaf-cluster visits on the packet kernels
    # (0 on the jnp/brute paths) — the phase-split telemetry that says
    # whether a frame is node- or leaf-dominated (PERFORMANCE.md r3)
    leaf_visits: jnp.ndarray
    # 20th, ours: the subset of leaf_visits entered by popping a leaf
    # ref straight off the stack (BVH4 kernels only) — exactly the
    # visits the non-speculative double-buffer prefetch covers;
    # leaf_visits - leaf_pop pay the sync DMA (VERDICT r4 item 1b)
    leaf_pop: jnp.ndarray

    @staticmethod
    def zeros() -> "Stats":
        z = jnp.zeros((), jnp.int32)
        return Stats(*([z] * 20))


# ---------------------------------------------------------------------------
# intersection dispatch
# ---------------------------------------------------------------------------


def _ray_sort_key(scene: Scene, origin: V3, direction: V3) -> jnp.ndarray:
    """18-bit spatial-coherence key: direction octant (major) + 15-bit
    morton of the quantized origin within the mesh bounds. Packet
    traversal visits the union of its lanes' nodes, so sorting rays by
    this key before the kernel call shrinks the union (measured ~1.8× on
    worst-case incoherent rays for ~0.7 ms of sort; octant-major beats
    morton-major by a further ~15% — the near-first descent order is
    direction-determined, so same-octant packets also traverse in the
    same order)."""
    lo = scene.mesh.bounds_min
    ext = jnp.maximum(scene.mesh.bounds_max - lo, 1e-9)

    def q5(x, a):
        v = jnp.clip((x - lo[a]) / ext[a] * 31.0, 0.0, 31.0)
        return v.astype(jnp.uint32)

    qx, qy, qz = q5(origin.x, 0), q5(origin.y, 1), q5(origin.z, 2)
    m = jnp.zeros_like(qx)
    for b in range(5):
        m = m | (((qx >> b) & 1) << (3 * b))
        m = m | (((qy >> b) & 1) << (3 * b + 1))
        m = m | (((qz >> b) & 1) << (3 * b + 2))
    octant = ((direction.x < 0).astype(jnp.uint32)
              | ((direction.y < 0).astype(jnp.uint32) << 1)
              | ((direction.z < 0).astype(jnp.uint32) << 2))
    return (octant << 15) | m


def _packet_nearest(scene: Scene, view: SceneView, config: RenderConfig,
                    origin: V3, direction: V3, t_min: float, t_max):
    """Large-mesh nearest hit via the packet BVH kernel, with a
    coherence sort/unsort around the call. Returns
    (t, tri, u, v, normal V3, tu, tv, mid)."""
    from tpu_pathtracer.ops.pallas_bvh import packet_trace

    pk = view.packet
    n = origin.x.shape[0]
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if config.sort_rays:
        key = _ray_sort_key(scene, origin, direction)
        iota = jnp.arange(n, dtype=jnp.uint32)
        (_, back, ox, oy, oz, dx, dy, dz, tm) = jax.lax.sort(
            (key, iota, origin.x, origin.y, origin.z,
             direction.x, direction.y, direction.z, t_max_b), num_keys=1)
        o_s, d_s = V3(ox, oy, oz), V3(dx, dy, dz)
    else:
        back = None
        o_s, d_s, tm = origin, direction, t_max_b
    if hasattr(pk, "refs"):  # Bvh4Data: explicit-stack SAH BVH4 kernel
        from tpu_pathtracer.ops.pallas_bvh4 import packet_trace4
        outs, node_counts = packet_trace4(
            o_s, d_s, tm, pk.bounds, pk.refs, pk.blocks, pk.tri_feat,
            pk.width, t_min, pk.stack_cap, interpret=_interp(config),
            prefetch=config.bvh4_pf, quant=pk.quant, qparams=pk.qparams,
            scratch=config.bvh4_scratch,
            spec=(config.bvh4_spec and config.bvh4_pf
                  and not config.bvh4_pair),
            pair=config.bvh4_pair and config.bvh4_pf)
    elif hasattr(pk, "gblocks"):  # PacketMX: MXU leaf path
        from tpu_pathtracer.ops.pallas_bvh_mx import packet_trace_mx
        outs, node_counts = packet_trace_mx(
            o_s, d_s, tm, pk.pm.nodes, pk.gblocks, pk.tri_geom,
            pk.pm.cl_first, pk.pm.width, t_min, center=pk.center,
            passes=config.mx_passes, interpret=_interp(config),
            smem_nodes=pk.pm.smem_nodes, top_rows=pk.pm.top_rows,
            nodes_top=pk.pm.nodes_top)
    elif hasattr(pk, "blocks_rg"):  # PacketRG: demand-packed leaf phase
        from tpu_pathtracer.ops.pallas_bvh_rg import packet_trace_rg
        outs, node_counts = packet_trace_rg(
            o_s, d_s, tm, pk.pm.nodes, pk.pm.blocks, pk.blocks_rg,
            pk.pm.tri_feat, pk.pm.cl_first, pk.pm.width, t_min,
            interpret=_interp(config), stride=pk.pm.stride,
            smem_nodes=pk.pm.smem_nodes, top_rows=pk.pm.top_rows,
            nodes_top=pk.pm.nodes_top, quant=pk.pm.quant,
            qparams=pk.pm.qparams, dense_thresh=config.regroup_dense)
    else:
        outs, node_counts = packet_trace(o_s, d_s, tm, pk.nodes, pk.blocks,
                                         pk.tri_feat, pk.cl_first, pk.width,
                                         t_min, interpret=_interp(config),
                                         stride=pk.stride, cpb=pk.cpb,
                                         smem_nodes=pk.smem_nodes,
                                         top_rows=pk.top_rows,
                                         nodes_top=pk.nodes_top,
                                         quant=pk.quant,
                                         qparams=pk.qparams,
                                         leaf_cull=config.leaf_cull,
                                         approx_recip=config.fast_math,
                                         oct=config.oct,
                                         packs=config.packet_packs,
                                         prefetch=config.prefetch,
                                         scratch=config.packet_scratch,
                                         split=config.packet_split,
                                         pair_pf=config.pair_pf)
    if back is not None:
        unsorted = jax.lax.sort((back,) + outs, num_keys=1)
        outs = unsorted[1:]
    t, tri, u, v, nx, ny, nz, tu, tv, mid = outs
    return (t, tri, u, v, V3(nx, ny, nz), tu, tv, mid), node_counts


def _packet_shadow(scene: Scene, view: SceneView, config: RenderConfig,
                   origin: V3, direction: V3, t_min: float,
                   t_max: jnp.ndarray) -> jnp.ndarray:
    """Large-mesh any-hit occlusion via the shadow packet kernel
    (early-out semantics of kernels.cu:207)."""
    pk = view.packet
    if hasattr(pk, "blocks_rg"):  # PacketRG: shadow stays on the
        pk = pk.pm                # scalar any-hit kernel
    if hasattr(pk, "refs"):  # Bvh4Data: explicit-stack any-hit kernel
        from tpu_pathtracer.ops.pallas_bvh4 import packet_occluded4
        b4 = pk

        def _call(o, d, tm):
            return packet_occluded4(
                o, d, tm, b4.bounds, b4.refs, b4.blocks, b4.width,
                t_min, b4.stack_cap, interpret=_interp(config),
                prefetch=config.bvh4_pf, quant=b4.quant,
                qparams=b4.qparams, scratch=config.bvh4_scratch)
    elif hasattr(pk, "gblocks"):  # PacketMX: MXU leaf path
        from tpu_pathtracer.ops.pallas_bvh_mx import packet_occluded_mx
        mx = pk

        def _call(o, d, tm):
            return packet_occluded_mx(
                o, d, tm, mx.pm.nodes, mx.gblocks, mx.pm.cl_first,
                mx.pm.width, t_min, center=mx.center,
                passes=config.mx_passes, interpret=_interp(config),
                smem_nodes=mx.pm.smem_nodes, top_rows=mx.pm.top_rows,
                nodes_top=mx.pm.nodes_top)
    else:
        from tpu_pathtracer.ops.pallas_bvh import packet_occluded

        def _call(o, d, tm):
            return packet_occluded(
                o, d, tm, pk.nodes, pk.blocks, pk.cl_first, pk.width,
                t_min, interpret=_interp(config), stride=pk.stride,
                cpb=pk.cpb, smem_nodes=pk.smem_nodes,
                top_rows=pk.top_rows, nodes_top=pk.nodes_top,
                quant=pk.quant, qparams=pk.qparams,
                leaf_cull=config.leaf_cull,
                approx_recip=config.fast_math, oct=config.oct,
                packs=config.packet_packs, prefetch=config.prefetch,
                scratch=config.packet_scratch,
                split=config.packet_split,
                pair_pf=config.pair_pf)

    n = origin.x.shape[0]
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if config.sort_rays:
        # validity as the sort MSB: non-NEE lanes (t_max = -1) carry a
        # STALE coherence key, and scattering them through the packets
        # dilutes every packet's visit union. Compacted to the tail they
        # form all-retired packets that exit after ~1 node step, and the
        # live packets get denser (measured: see PERFORMANCE.md).
        if config.shadow_sort == "origin":
            # NEE rays share one target: the direction octant is
            # origin-determined, so spend all key bits on origin
            # locality (VERDICT r3 item 4 A/B)
            key = _ray_sort_key(scene, origin, direction) & 0x7FFF
        elif config.shadow_sort == "light":
            # octant of (light - origin): groups lanes by which side
            # of the light they shoot from
            lc = scene.light_center
            octant = ((origin.x > lc[0]).astype(jnp.uint32)
                      | ((origin.y > lc[1]).astype(jnp.uint32) << 1)
                      | ((origin.z > lc[2]).astype(jnp.uint32) << 2))
            key = ((octant << 15)
                   | (_ray_sort_key(scene, origin, direction) & 0x7FFF))
        else:  # "scatter": the generic key (octant(dir) + morton15)
            key = _ray_sort_key(scene, origin, direction)
        key = key | ((t_max_b <= 0.0).astype(jnp.uint32) << 18)
        iota = jnp.arange(n, dtype=jnp.uint32)
        (_, back, ox, oy, oz, dx, dy, dz, tm) = jax.lax.sort(
            (key, iota, origin.x, origin.y, origin.z,
             direction.x, direction.y, direction.z, t_max_b), num_keys=1)
        occ, node_counts = _call(V3(ox, oy, oz), V3(dx, dy, dz), tm)
        _, occ = jax.lax.sort((back, occ.astype(jnp.int32)), num_keys=1)
        return occ != 0, node_counts
    return _call(origin, direction, t_max_b)


def _cols_from_rows(rows: jnp.ndarray) -> MatCols:
    """Decode [N, 14] material-column rows (one row-gather from the
    [n_mats, 14] table — ~0.3 ms vs ~18 ms for per-column gathers)."""
    return MatCols(
        mtype=rows[:, 0].astype(jnp.int32),
        color=V3(rows[:, 1], rows[:, 2], rows[:, 3]),
        color2=V3(rows[:, 4], rows[:, 5], rows[:, 6]),
        param=rows[:, 7], param2=rows[:, 8],
        absorption=V3(rows[:, 9], rows[:, 10], rows[:, 11]),
        scatter_dist=rows[:, 12],
        tex_id=rows[:, 13].astype(jnp.int32))


def _spheres_nearest(view: SceneView, config: RenderConfig, origin: V3,
                     direction: V3, t_min: float, t_max):
    """Brute-force sphere set: Pallas kernel on TPU (VMEM-resident, direct
    oc-form quadratic), chunked jnp elsewhere."""
    if _on_tpu(config):
        from tpu_pathtracer.ops.pallas_spheres import spheres_hit_soa
        return spheres_hit_soa(origin, direction, view.sph_c, view.sph_r,
                               t_min, t_max, interpret=_interp(config))
    from tpu_pathtracer.ops.intersect import spheres_hit
    t, idx = spheres_hit(origin.stack(), direction.stack(),
                         view.sph_c.stack(), view.sph_r, t_min, t_max)
    return t, idx


def _mesh_nearest(scene: Scene, view: SceneView, config: RenderConfig,
                  origin: V3, direction: V3, t_min: float, t_max,
                  is_shadow: bool = False):
    """Mesh dispatch: TPU + small mesh → Pallas VMEM brute force (streaming
    every triangle through the VPU beats gather-heavy BVH descent for
    meshes that fit on-chip); otherwise vectorized BVH traversal, or the
    all-triangles oracle path when use_bvh is off (kernels.cu:307–321)."""
    mesh = scene.mesh
    if (_on_tpu(config) and config.use_bvh
            and mesh.num_tris <= TRI_BRUTE_MAX):
        from tpu_pathtracer.ops.pallas_tris import tris_hit_soa
        t, idx, u, v = tris_hit_soa(origin, direction, view.tri_v0,
                                    view.tri_e1, view.tri_e2, view.tri_n,
                                    t_min, t_max,
                                    interpret=_interp(config))
        return _bvh.TraceResult(t=t, tri_id=idx, u=u, v=v)
    o = origin.stack()
    d = direction.stack()
    if config.use_bvh:
        return _bvh.traverse(mesh, o, d, t_min, t_max, is_shadow=is_shadow)
    return _bvh.brute_force(mesh, o, d, t_min, t_max)


def _mesh_bbox_hit(scene: Scene, origin: V3, direction: V3,
                   t_max) -> jnp.ndarray:
    """Global mesh-bbox slab test (hit_bbox at hitMesh, kernels.cu:298) —
    used for the *_bbox_nohit stats counters. As an execution early-out it
    cannot help the TPU paths (the brute kernels test all triangles
    densely; the traversals reject at the root node), so it is accounting
    only — see PERFORMANCE.md's negative-results section.

    Deliberately a component-SoA re-expression of
    ``ops.intersect.bbox_hit`` rather than a call into it: that helper
    takes interleaved [..., 3] arrays, and stacking the V3 state here
    would materialize [N, 3] intermediates whose 3-wide minor dim pads
    to 128 TPU lanes (the exact layout this engine exists to avoid).
    Same where-form slab semantics; keep the two in sync."""
    from tpu_pathtracer.ops.intersect import BBOX_T_MIN

    bmin = scene.mesh.bounds_min
    bmax = scene.mesh.bounds_max
    tmin_acc = jnp.full(origin.x.shape, BBOX_T_MIN, jnp.float32)
    tmax_acc = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                origin.x.shape)
    for o, d, a in ((origin.x, direction.x, 0), (origin.y, direction.y, 1),
                    (origin.z, direction.z, 2)):
        inv = 1.0 / d
        t0 = (bmin[a] - o) * inv
        t1 = (bmax[a] - o) * inv
        neg = inv < 0.0
        lo = jnp.where(neg, t1, t0)
        hi = jnp.where(neg, t0, t1)
        tmin_acc = jnp.where(lo > tmin_acc, lo, tmin_acc)
        tmax_acc = jnp.where(hi < tmax_acc, hi, tmax_acc)
    return tmax_acc >= tmin_acc


def _sphere_hit_one(origin: V3, direction: V3, center, radius,
                    t_min, t_max) -> jnp.ndarray:
    """Single-sphere test (the light, kernels.cu:346)."""
    oc = origin - V3(center[0], center[1], center[2])
    b = oc.dot(direction)
    c = oc.dot(oc) - radius * radius
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = -b - sq
    t2 = -b + sq
    ok = disc > 0.0
    t1v = jnp.where(ok & (t1 > t_min) & (t1 < t_max), t1, FLT_MAX)
    t2v = jnp.where(ok & (t2 > t_min) & (t2 < t_max), t2, FLT_MAX)
    return jnp.minimum(t1v, t2v)


def _plane_hit(scene: Scene, origin: V3, direction: V3, t_min,
               t_max) -> jnp.ndarray:
    """Single-sided plane (intersections.h:43–52)."""
    nrm = scene.plane_norm
    pt = scene.plane_point
    denom = (direction.x * nrm[0] + direction.y * nrm[1]
             + direction.z * nrm[2])
    po_dot_n = ((pt[0] - origin.x) * nrm[0] + (pt[1] - origin.y) * nrm[1]
                + (pt[2] - origin.z) * nrm[2])
    t = po_dot_n / denom
    miss = (denom > -1e-6) | (t < t_min) | (t > t_max)
    return jnp.where(miss, FLT_MAX, t)


def intersect_scene(scene: Scene, view: SceneView, config: RenderConfig,
                    origin: V3, direction: V3, specular: jnp.ndarray,
                    alive: Optional[jnp.ndarray] = None):
    """Top-level `hit()` (kernels.cu:325–360) over a ray batch.

    Surface geometry (mesh / spheres / plane) competes by nearest t; the
    light sphere is only tested for specular lanes and only when no
    surface was hit (the reference's else-branch ordering,
    kernels.cu:339–349).

    Returns (Intersection, (nodes_both, nodes_single)) — the scalar BVH
    step telemetry feeding NUM_NODES_BOTH/SINGLE (kernels.cu:220–221);
    zeros on the non-traversal paths.
    """
    n = origin.x.shape[0]
    eps = config.epsilon
    t = jnp.full((n,), FLT_MAX)
    obj = jnp.full((n,), sc.OBJ_NONE, jnp.int32)
    normal = V3.zeros((n,))
    cols = MatCols.zeros(n)
    tex_u = jnp.zeros((n,))
    tex_v = jnp.zeros((n,))
    node_counts = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    # Analytic geometry first (spheres + plane are O(1) per lane), so
    # their best t SEEDS the expensive mesh traversal: the kernels'
    # strictly-closer tests then cull every node/leaf beyond the floor
    # or a sphere from step one. The final winner is unchanged (the mesh
    # only ever wins strictly-closer hits); only exact-t ties between a
    # triangle and an analytic surface would flip, and no scene has
    # coincident geometry (zoo floors are plane-only).
    if scene.has_spheres:
        if _on_tpu(config):
            from tpu_pathtracer.ops.pallas_spheres import spheres_hit_feat
            # NOTE: the MXU b/c-term variant (mx=True) was A/B'd on
            # hardware and NOT wired to config.fast_math: 1.034x for
            # SSIM 0.9934 vs the exact path — fails the >=0.999 gate
            # for a ~3% win (PERFORMANCE.md round 3, VERDICT r2 item 9).
            st, sidx, f = spheres_hit_feat(origin, direction, view.sph_c,
                                           view.sph_r, view.sph_feat, eps,
                                           FLT_MAX, interpret=_interp(config))
            center = V3(f[0], f[1], f[2])
            radius = f[3]
            scols = _cols_from_feats(f, 4)
        else:
            st, sidx = _spheres_nearest(view, config, origin, direction,
                                        eps, FLT_MAX)
            sidx = jnp.maximum(sidx, 0)
            center = V3(view.sph_c.x[sidx], view.sph_c.y[sidx],
                        view.sph_c.z[sidx])
            radius = view.sph_r[sidx]
            scols = _gather_cols(scene.materials, scene.sphere_mat[sidx])
        win = st < t
        p = origin + direction * st
        nrm = (p - center) * (1.0 / jnp.maximum(radius, 1e-30))
        t = jnp.where(win, st, t)
        obj = jnp.where(win, sc.OBJ_SPHERE, obj)
        normal = vwhere(win, nrm, normal)
        cols = _cols_where(win, scols, cols)

    if scene.has_plane:
        pt = _plane_hit(scene, origin, direction, eps, FLT_MAX)
        win = pt < t
        nrm = scene.plane_norm
        t = jnp.where(win, pt, t)
        obj = jnp.where(win, sc.OBJ_PLANE, obj)
        normal = vwhere(win, V3.full((n,), nrm[0], nrm[1], nrm[2]), normal)
        pcols = _gather_cols(scene.materials,
                             jnp.broadcast_to(scene.plane_mat, (n,)))
        cols = _cols_where(win, pcols, cols)

    # dead lanes trace with t_max = -1: instantly inert on every mesh
    # path (no traversal work, no node-count pollution); their outputs
    # are masked downstream anyway
    t_ray_max = (t if alive is None
                 else jnp.where(alive, t, -1.0))

    if scene.has_mesh:
        mesh = scene.mesh
        if view.packet is not None:
            # large-mesh packet BVH path: normal/texcoords/mesh-id are
            # captured in-kernel at win time; material columns come from
            # one row-gather of the tiny per-material table.
            (tt, tri_id, u, vv, nrm_raw, tu, tv,
             mid), node_counts = _packet_nearest(
                scene, view, config, origin, direction, eps, t_ray_max)
            hit = tri_id >= 0
            mid_c = jnp.clip(mid, 0, scene.materials.count - 1)
            mcols = _cols_from_rows(view.mat_rows[mid_c])
            # guard the normalize: miss lanes have a zero normal
            nrm = vwhere(hit, nrm_raw, V3.full(hit.shape, 0.0, 0.0, 1.0))
            nrm = nrm.normalized()  # kernels.cu:336 (cross done in-kernel)
            res_t = tt
        elif (_on_tpu(config) and config.use_bvh
                and mesh.num_tris <= TRI_BRUTE_MAX):
            from tpu_pathtracer.ops.pallas_tris import tris_hit_feat
            tt, tri_id, u, vv, f = tris_hit_feat(
                origin, direction, view.tri_v0, view.tri_e1, view.tri_e2,
                view.tri_n, view.tri_feat, eps, t_ray_max,
                interpret=_interp(config))
            hit = tri_id >= 0
            e1 = V3(f[0], f[1], f[2])
            e2 = V3(f[3], f[4], f[5])
            w0 = 1.0 - u - vv
            tu = u * f[8] + vv * f[10] + w0 * f[6]
            tv = u * f[9] + vv * f[11] + w0 * f[7]
            mcols = _cols_from_feats(f, 12)
            nrm = e1.cross(e2).normalized()  # kernels.cu:336
            res_t = tt
        else:
            res = _mesh_nearest(scene, view, config, origin, direction, eps,
                                t_ray_max)
            node_counts = (res.nodes_both, res.nodes_single, jnp.int32(0))
            hit = res.tri_id >= 0
            tri = jnp.maximum(res.tri_id, 0)
            e1 = V3(view.tri_e1.x[tri], view.tri_e1.y[tri],
                    view.tri_e1.z[tri])
            e2 = V3(view.tri_e2.x[tri], view.tri_e2.y[tri],
                    view.tri_e2.z[tri])
            tc = mesh.tex_coords
            u, vv = res.u, res.v
            w0 = 1.0 - u - vv
            # barycentric texcoord interpolation, kernels.cu:337–338
            tu = u * tc[:, 2][tri] + vv * tc[:, 4][tri] + w0 * tc[:, 0][tri]
            tv = u * tc[:, 3][tri] + vv * tc[:, 5][tri] + w0 * tc[:, 1][tri]
            mcols = _gather_cols(scene.materials,
                                 jnp.clip(mesh.mesh_id[tri], 0,
                                          scene.materials.count - 1))
            nrm = e1.cross(e2).normalized()  # kernels.cu:336
            res_t = res.t
        win = hit & (res_t < t)
        t = jnp.where(win, res_t, t)
        obj = jnp.where(win, sc.OBJ_TRIMESH, obj)
        normal = vwhere(win, nrm, normal)
        cols = _cols_where(win, mcols, cols)
        tex_u = jnp.where(win, tu, tex_u)
        tex_v = jnp.where(win, tv, tex_v)

    if scene.use_nee:
        # light sphere only for specular rays with no surface hit
        # (kernels.cu:346–349)
        lt = _sphere_hit_one(origin, direction, scene.light_center,
                             scene.light_radius, eps, FLT_MAX)
        win = specular & (obj == sc.OBJ_NONE) & (lt < FLT_MAX)
        t = jnp.where(win, lt, t)
        obj = jnp.where(win, sc.OBJ_LIGHT, obj)

    # flip normal to face the ray (kernels.cu:354–355)
    flip = direction.dot(normal) > 0.0
    normal = vwhere(flip, -normal, normal)
    return Intersection(obj=obj, t=t, normal=normal, cols=cols,
                        tex_u=tex_u, tex_v=tex_v), node_counts


def occluded(scene: Scene, view: SceneView, config: RenderConfig,
             origin: V3, direction: V3, t_max: jnp.ndarray) -> jnp.ndarray:
    """Shadow-ray occlusion (any-hit). The reference occludes only against
    the triangle mesh (kernels.cu:340); analytic scenes use their spheres
    as the occluder set. Returns (occluded, (nodes_both, nodes_single,
    leaf_visits))."""
    n = origin.x.shape[0]
    occ = jnp.zeros((n,), bool)
    node_counts = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    if scene.has_mesh:
        if view.packet is not None:
            mesh_occ, node_counts = _packet_shadow(
                scene, view, config, origin, direction, config.epsilon,
                t_max)
            occ = occ | mesh_occ
        elif (_on_tpu(config) and config.use_bvh
                and scene.mesh.num_tris <= TRI_BRUTE_MAX):
            # any-hit fast kernel: no argmin/u/v/feature work
            # (early-out semantics of kernels.cu:207)
            from tpu_pathtracer.ops.pallas_tris import tris_anyhit_soa
            occ = occ | tris_anyhit_soa(origin, direction, view.tri_v0,
                                        view.tri_e1, view.tri_e2,
                                        view.tri_n, config.epsilon, t_max,
                                        interpret=_interp(config))
        else:
            res = _mesh_nearest(scene, view, config, origin, direction,
                                config.epsilon, t_max, is_shadow=True)
            node_counts = (res.nodes_both, res.nodes_single, jnp.int32(0))
            occ = occ | (res.tri_id >= 0)
    if scene.has_spheres:
        if _on_tpu(config):
            from tpu_pathtracer.ops.pallas_spheres import spheres_anyhit_soa
            occ = occ | spheres_anyhit_soa(origin, direction, view.sph_c,
                                           view.sph_r, config.epsilon,
                                           t_max, interpret=_interp(config))
        else:
            st, _ = _spheres_nearest(view, config, origin, direction,
                                     config.epsilon, t_max)
            occ = occ | (st < t_max)
    return occ, node_counts


def sky_radiance(scene: Scene, direction: V3) -> V3:
    """kernels.cu:424 (constant) / kernels.cu:419–421 (RTiOW gradient)."""
    n = direction.x.shape[0]
    if scene.sky_mode == sc.SKY_GRADIENT:
        t = 0.5 * (direction.y + 1.0)
        return V3(1.0 - 0.5 * t, 1.0 - 0.3 * t, jnp.ones_like(t))
    c = scene.sky_color
    return V3.full((n,), c[0], c[1], c[2])


def resolve_albedo(scene: Scene, view: SceneView, config: RenderConfig,
                   cols: MatCols, tex_u: jnp.ndarray,
                   tex_v: jnp.ndarray, use_tex: jnp.ndarray) -> V3:
    """Texture-or-color albedo (kernels.cu:456–476): nearest-neighbor
    wrap-mode lookup as a single row gather from the flat texel table
    (one ~1.3 ms gather for all three channels instead of three)."""
    base = cols.color
    if not (scene.has_textures and config.textures):
        return base
    tid = cols.tex_id
    tid_c = jnp.maximum(tid, 0)
    w = scene.tex_width[tid_c]
    h = scene.tex_height[tid_c]
    fu = tex_u - jnp.floor(tex_u)
    fv = tex_v - jnp.floor(tex_v)
    tx = ((w - 1).astype(jnp.float32) * fu).astype(jnp.int32)
    ty = ((h - 1).astype(jnp.float32) * fv).astype(jnp.int32)
    hmax = scene.tex_atlas.shape[1]
    wmax = scene.tex_atlas.shape[2]
    flat = (tid_c * hmax + ty) * wmax + tx
    texel_rows = view.atlas[flat]  # [N, 3] — one gather
    texel = V3(texel_rows[:, 0], texel_rows[:, 1], texel_rows[:, 2])
    return vwhere(use_tex & (tid >= 0), texel, base)


def generate_shadow_rays(scene: Scene, origin: V3, normal: V3,
                         attenuation: V3, eps1: jnp.ndarray,
                         eps2: jnp.ndarray):
    """Solid-angle sphere-light sampling (generateShadowRay,
    kernels.cu:363–393). Returns (valid, shadow_dir, contribution,
    light_dist)."""
    lc = scene.light_center
    to_light = V3(lc[0] - origin.x, lc[1] - origin.y, lc[2] - origin.z)
    sw = to_light.normalized()
    big_x = jnp.abs(sw.x) > 0.01
    up = V3(jnp.where(big_x, 0.0, 1.0), jnp.where(big_x, 1.0, 0.0),
            jnp.zeros_like(sw.x))
    su = up.cross(sw).normalized()
    sv = sw.cross(su)

    d2 = to_light.squared_length()
    ratio = 1.0 - scene.light_radius * scene.light_radius / d2
    valid = ratio >= 0.0  # isnan(cosAMax) guard, kernels.cu:372
    cos_a_max = jnp.sqrt(jnp.maximum(ratio, 0.0))
    cos_a = 1.0 - eps1 + eps1 * cos_a_max
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    phi = 2.0 * jnp.pi * eps2
    l = (su * (jnp.cos(phi) * sin_a) + sv * (jnp.sin(phi) * sin_a)
         + sw * cos_a)
    dotl = l.dot(normal)
    valid = valid & (dotl > 0.0)
    shadow_dir = l.normalized()
    omega = 2.0 * jnp.pi * (1.0 - cos_a_max)
    scale = dotl * omega / jnp.pi
    lcol = scene.light_color
    contribution = attenuation * V3(lcol[0] * scale, lcol[1] * scale,
                                    lcol[2] * scale)
    light_dist = jnp.sqrt(d2) - scene.light_radius  # kernels.cu:390
    return valid, shadow_dir, contribution, light_dist


class BounceState(NamedTuple):
    """Mutable per-lane path state threaded through one bounce."""
    origin: V3
    direction: V3
    color: V3
    attenuation: V3
    specular: jnp.ndarray
    inside: jnp.ndarray
    alive: jnp.ndarray
    # previous bounce hit the triangle mesh (STATS `fromMesh`,
    # kernels.cu:400/:430) — only consumed by the stats counters
    from_mesh: jnp.ndarray


def bounce_step(scene: Scene, view: SceneView, config: RenderConfig,
                state: BounceState, pixel: jnp.ndarray, sample: jnp.ndarray,
                bounce: jnp.ndarray, stats: Optional[Stats] = None
                ) -> Tuple[BounceState, Optional[Stats]]:
    """One wavefront bounce for all lanes — the body of `color()`
    (kernels.cu:402–527). ``bounce`` may be scalar (plain engine) or
    per-lane [N] (regeneration engine)."""
    base = _rng.bounce_base(pixel, sample, bounce)
    alive = state.alive

    def count(stat, mask):
        return stat + jnp.sum(mask, dtype=jnp.int32)

    inters, node_counts = intersect_scene(scene, view, config, state.origin,
                                          state.direction, state.specular,
                                          alive=alive)
    if stats is not None:
        # per-bounce counters, kernels.cu:404-407
        primary_m = alive & (bounce == 0)
        secondary_m = alive & (bounce > 0)
        low = alive & (state.attenuation.squared_length() < 1e-4)
        stats = stats._replace(
            primary=count(stats.primary, primary_m),
            secondary=count(stats.secondary, secondary_m),
            secondary_mesh=count(stats.secondary_mesh,
                                 alive & state.from_mesh),
            low_power=count(stats.low_power, low),
            nodes_both=stats.nodes_both + node_counts[0],
            nodes_single=stats.nodes_single + node_counts[1],
            leaf_visits=stats.leaf_visits + node_counts[2],
            leaf_pop=stats.leaf_pop + (node_counts[3]
                                       if len(node_counts) > 3 else 0))
        if scene.has_mesh:
            # global mesh-bbox reject accounting (hitMesh,
            # kernels.cu:298-300)
            bbhit = _mesh_bbox_hit(scene, state.origin, state.direction,
                                   FLT_MAX)
            stats = stats._replace(
                primary_bbox_nohit=count(stats.primary_bbox_nohit,
                                         primary_m & ~bbhit),
                secondary_bbox_nohit=count(stats.secondary_bbox_nohit,
                                           secondary_m & ~bbhit))

    # ---- miss → sky (kernels.cu:424)
    miss = alive & (inters.obj == sc.OBJ_NONE)
    color = state.color + vwhere(
        miss, state.attenuation * sky_radiance(scene, state.direction),
        V3.zeros(miss.shape))
    is_mesh_hit = inters.obj == sc.OBJ_TRIMESH
    if stats is not None:
        hit_any = alive & ~miss
        stats = stats._replace(
            # the quirk at kernels.cu:430: a primary ray hitting a
            # non-mesh surface also counts as primary_nohit
            primary_nohit=count(
                stats.primary_nohit,
                (bounce == 0) & (miss | (hit_any & ~is_mesh_hit))),
            primary_hit_mesh=count(stats.primary_hit_mesh,
                                   (bounce == 0) & hit_any & is_mesh_hit),
            secondary_nohit=count(stats.secondary_nohit,
                                  miss & (bounce > 0) & ~state.from_mesh),
            secondary_mesh_nohit=count(
                stats.secondary_mesh_nohit,
                miss & (bounce > 0) & state.from_mesh))

    # ---- light hit by specular path (kernels.cu:433–447)
    light_hit = alive & (inters.obj == sc.OBJ_LIGHT)
    if not config.shadow:
        lc = scene.light_color
        color = color + vwhere(
            light_hit, state.attenuation * V3.full(miss.shape, lc[0], lc[1], lc[2]),
            V3.zeros(miss.shape))

    surf = alive & ~miss & ~light_hit
    alive = surf

    # ---- scatter (kernels.cu:452–489)
    cols = inters.cols
    albedo = resolve_albedo(scene, view, config, cols, inters.tex_u,
                            inters.tex_v, inters.obj == sc.OBJ_TRIMESH)
    hit_p = state.origin + state.direction * inters.t
    out = _m.scatter(
        wo=state.direction, normal=inters.normal, hit_t=inters.t,
        hit_p=hit_p, inside=state.inside,
        mtype=cols.mtype, albedo=albedo, color2=cols.color2,
        param=cols.param, param2=cols.param2, absorption=cols.absorption,
        scatter_dist=cols.scatter_dist, rng_base=base)

    new_origin = vwhere(surf, state.origin + state.direction * out.t,
                        state.origin)
    # NOTE: the reference stores possibly non-unit SSS directions and
    # re-normalizes in the next ray ctor (ray.h:9) but then advances the
    # origin with the non-unit vector (kernels.cu:485) — a scale
    # inconsistency on SSS paths. We normalize at store time instead.
    new_dir = vwhere(surf, out.wi.normalized(), state.direction)
    new_att = vwhere(surf, state.attenuation * out.throughput,
                     state.attenuation)
    new_specular = jnp.where(surf, out.specular, state.specular)
    new_inside = jnp.where(surf, state.inside ^ out.refracted, state.inside)

    # ---- NEE shadow pass (kernels.cu:491–510)
    if config.shadow and scene.use_nee:
        nee_mask = surf & ~new_specular
        valid, sdir, contrib, ldist = generate_shadow_rays(
            scene, new_origin, inters.normal, new_att,
            _rng.slot_uniform(base, _rng.S_NEE0),
            _rng.slot_uniform(base, _rng.S_NEE1))
        nee_mask = nee_mask & valid
        # non-NEE lanes get t_max = -1: every occluder test fails and the
        # packet-BVH shadow kernel retires them at init (no node votes)
        occ, sh_counts = occluded(scene, view, config, new_origin, sdir,
                                  jnp.where(nee_mask, ldist, -1.0))
        lit = nee_mask & ~occ
        color = color + vwhere(lit, contrib, V3.zeros(miss.shape))
        if stats is not None:
            stats = stats._replace(
                shadows=count(stats.shadows, nee_mask),
                shadows_nohit=count(stats.shadows_nohit, lit),
                nodes_both=stats.nodes_both + sh_counts[0],
                nodes_single=stats.nodes_single + sh_counts[1],
                leaf_visits=stats.leaf_visits + sh_counts[2],
                leaf_pop=stats.leaf_pop + (sh_counts[3]
                                           if len(sh_counts) > 3 else 0))
            if scene.has_mesh:
                sbb = _mesh_bbox_hit(scene, new_origin, sdir, ldist)
                stats = stats._replace(
                    shadows_bbox_nohit=count(stats.shadows_bbox_nohit,
                                             nee_mask & ~sbb))

    # ---- Russian roulette (kernels.cu:512–527)
    if config.russian_roulette:
        rr = alive & (bounce > config.rr_start_bounce)
        mx = new_att.max3()
        kill = rr & (_rng.slot_uniform(base, _rng.S_ROULETTE) > mx)
        alive = alive & ~kill
        scale = jnp.where(rr & ~kill, 1.0 / jnp.maximum(mx, 1e-30), 1.0)
        new_att = new_att * scale
        if stats is not None:
            stats = stats._replace(roulette_kill=count(stats.roulette_kill,
                                                       kill))

    # fromMesh for the next bounce (kernels.cu:430): only surf lanes
    # continue, so non-surf lanes' value is never consumed
    new_from_mesh = surf & is_mesh_hit
    return BounceState(origin=new_origin, direction=new_dir, color=color,
                       attenuation=new_att, specular=new_specular,
                       inside=new_inside, alive=alive,
                       from_mesh=new_from_mesh), stats


def trace(scene: Scene, camera: Camera, config: RenderConfig,
          pixel_id: jnp.ndarray, sample: jnp.ndarray,
          valid: Optional[jnp.ndarray] = None
          ) -> Tuple[jnp.ndarray, Stats]:
    """Trace one sample for each pixel lane; returns ([N,3] radiance,
    Stats). This is `color()` (kernels.cu:396–533) as a wavefront loop.

    ``valid`` (optional [N] bool) marks real lanes; tail-padding duplicate
    lanes start dead so they never inflate the Stats counters."""
    n = pixel_id.shape[0]
    view = make_view(scene, config)
    origin, direction = camera.generate_rays(pixel_id, sample,
                                             config.nx, config.ny)
    # inits derived from inputs: carry varyance matches under shard_map
    zf = pixel_id.astype(jnp.float32) * 0.0
    zb = zf != 0.0
    state = BounceState(
        origin=origin, direction=direction,
        color=V3(zf, zf, zf), attenuation=V3(zf + 1, zf + 1, zf + 1),
        specular=zb, inside=zb,
        alive=~zb if valid is None else valid & ~zb,
        from_mesh=zb,
    )

    def cond(carry):
        state, bounce, _ = carry
        return (bounce < config.max_depth) & jnp.any(state.alive)

    def body(carry):
        state, bounce, stats = carry
        state, stats = bounce_step(scene, view, config, state, pixel_id,
                                   sample, bounce,
                                   stats if config.stats else None)
        if stats is None:
            stats = carry[2]
        return state, bounce + 1, stats

    zstat = jnp.sum(zf).astype(jnp.int32)  # varying scalar zero
    carry = (state, jnp.int32(0), jax.tree.map(lambda s: s + zstat,
                                               Stats.zeros()))
    state, bounce, stats = jax.lax.while_loop(cond, body, carry)
    if config.stats:
        stats = stats._replace(
            exceed_max_bounce=stats.exceed_max_bounce
            + jnp.sum(state.alive, dtype=jnp.int32))
    if config.check_nans:
        isnan = (jnp.isnan(state.color.x) | jnp.isnan(state.color.y)
                 | jnp.isnan(state.color.z))
        stats = stats._replace(nans=stats.nans
                               + jnp.sum(isnan, dtype=jnp.int32))
    return state.color.stack(), stats
