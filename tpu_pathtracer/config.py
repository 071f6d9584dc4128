"""Render configuration.

The reference uses compile-time ``#define``s as its config system
(kernels.cu:13–24: STATS, RUSSIAN_ROULETTE, BVH, SHADOW, TEXTURES, EPSILON,
DUAL_NODES, USE_BVH_TEXTURE) plus hardcoded driver constants
(main.cpp:62–74). Here all of them are runtime options in one dataclass.

Fields are hashable / static so a config can be closed over by ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import warnings


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """All knobs of the renderer, mirroring the reference's defines + argv.

    Attributes:
      nx, ny: image resolution (main.cpp:65–66).
      ns: samples per pixel (main.cpp:67).
      max_depth: bounce limit (main.cpp:68, argv[1] main.cpp:73–74).
      epsilon: self-intersection t_min (kernels.cu:19 ``EPSILON 0.01f``).
      russian_roulette: enable RR after bounce 3 (kernels.cu:14, :512–527).
      rr_start_bounce: first bounce index at which RR applies
        (``p.bounce > 3`` kernels.cu:514).
      shadow: next-event-estimation shadow rays toward the sphere light
        (kernels.cu:16, :362–393). When True, specular light hits add
        nothing — reproducing the reference's as-built quirk
        (kernels.cu:440–446). When False, specular light hits add
        attenuation*lightColor (kernels.cu:444).
      use_bvh: accelerate mesh intersection with the BVH (kernels.cu:15);
        False falls back to brute-force all-triangles (kernels.cu:307–321),
        kept as the slow oracle path.
      textures: enable image-texture albedo lookups (kernels.cu:17).
      stats: collect ray-accounting counters (kernels.cu:13, :48–67) as
        masked sums — cheap on TPU.
      samples_per_batch: how many samples-per-pixel are traced per wavefront
        launch; the outer loop accumulates batches into the framebuffer.
      rays_per_chunk: pixels*samples are processed in chunks of this many
        lanes to bound peak memory (0 = single chunk).
      check_nans: count NaN radiance samples like NUM_RAYS_NAN
        (kernels.cu:63, :560) into Stats.nans — requires ``stats=True``
        to be collected/reported (both engines agree on this contract).
      interpret: run Pallas kernels in interpreter mode (debugging/CPU).
      force_feat_kernels: dispatch the feature-fetch Pallas kernels even
        off-TPU (interpret mode) so CI exercises the TPU hot path.

    Geometry compute dtype is always float32 (bf16 is too coarse for
    ray-scene intersection); BVH traversal depth is bounded at 32 by the
    uint32 bitstack and validated at mesh load/traverse time.
    """

    nx: int = 640
    ny: int = 800
    ns: int = 256
    max_depth: int = 64
    epsilon: float = 0.01
    russian_roulette: bool = True
    rr_start_bounce: int = 3
    shadow: bool = True
    use_bvh: bool = True
    textures: bool = True
    stats: bool = False
    samples_per_batch: int = 0  # 0 = auto
    rays_per_chunk: int = 0  # 0 = auto
    flush_window: int = 0  # regen flush window rows (decision record,
    # VERDICT r4 item 5): the pixel-flush one-hot adds into a W-row
    # dynamic slice of the [rounds, m] accumulator instead of
    # rewriting every row; lanes more than W-1 rounds ahead of the
    # slowest stall their flush (radiance bit-identical — tested).
    # MEASURED SLOWER on hardware (experiments/flush_window_ab.py:
    # headline 1.643 s full vs 1.689/1.705/1.732 at W=8/4/16) — the
    # out-row rewrite is not the regen-body bottleneck (and/or the
    # dynamic-start update forces a copy). 0 = full one-hot, default.
    check_nans: bool = False
    interpret: bool = False
    force_feat_kernels: bool = False
    sort_rays: bool = True  # coherence sort around packet-BVH traversal
    shadow_sort: str = "scatter"  # sort key for SHADOW packets:
    # "scatter" = the generic key (octant(dir)<<15 | morton15(origin));
    # "origin"  = morton15 only (NEE rays share one target, so their
    #             direction octant is origin-correlated — spend the
    #             bits on origin locality);
    # "light"   = octant of (light - origin) + morton15.
    # VERDICT r3 item 4: the reference measured shadow traversal at
    # ~50% of render time (TODO.txt:559); A/B in
    # experiments/shadow_sort_ab.py picks the default.
    packet_threshold: int = 8192  # padded tri slots above which the
    # packet BVH kernel is used on the TPU path (0 = TRI_BRUTE_MAX =
    # 16384; tests set 1 to force it). Justified by the zoo table:
    # teapot-class meshes run ~2.2x faster on the packet path than the
    # VMEM brute kernel (PERFORMANCE.md).
    packet_width: int = 64  # max triangles per packet-BVH leaf cluster —
    # the round-3 end-to-end A/B (PERFORMANCE.md) reads 64 fastest on
    # all four packet workloads (knot 229 vs 248 ms/spp, stairs 1735
    # vs 1800, terrain 871 vs 1010, dragon-with-quant-nodes 496 vs
    # 516); the earlier width-32 preference predates the SMEM-node +
    # decision-trim work. NOTE: this only caps leaf GROUPING — a tree
    # built with prims_per_leaf > packet_width keeps its wider leaves
    # (the builder can't split); build scenes at the target width.
    mx_leaf: bool = False  # MXU leaf tests on the packet path: leaf MT as
    # a split-bf16 matmul (ops/pallas_bvh_mx.py). Winner t/u/v/features
    # are recomputed exactly post-kernel; winner *selection* is matmul-
    # toleranced (gated by RMSE/SSIM tests vs the exact scalar path,
    # which stays the bit-exact anchor). Default OFF: measured SLOWER
    # than the exact scalar-broadcast kernel (knot 512^2 traversal
    # 7.85 vs 5.29 ms at w=32, 7.27 vs 4.39 at w=64, phase_probe —
    # operand staging + winner recompute outweigh the MXU MT win).
    mx_passes: int = 3  # bf16 split passes for the leaf matmul: 3 ~ 2^-18
    # relative per numerator, 6 ~ f32. 3 matched 6's winners on random
    # soup to 99.8%+ and is gated by the image-level tests.
    regroup: bool = False  # demand-packed leaf phase on the packet path
    # (ops/pallas_bvh_rg.py): sparse leaf visits (<= regroup_dense
    # demanding lanes) batch into windows of <=64 visits / 1024
    # (ray,leaf) pairs, MT-tested densely with one-hot MXU operand
    # fetches — measured 12 us per 64-visit window vs 75.5 us for the
    # union leaf phase (experiments/regroup_probe.py; demand_sim: the
    # union does 81x/368x the demanded work on knot/dragon bounces).
    # Dense visits keep the inline scalar MT. Hits are exact per-pair
    # MT accepts; vs the scalar kernel, t agrees to FMA-contraction
    # ulps and traversal counters shift a few % (deferred commits).
    regroup_dense: int = 160  # demanding-lane count above which a
    # visit takes the inline scalar MT instead of the window
    # (break-even ~ scalar visit cost / window marginal cost).
    bvh4: bool = True  # use the explicit-stack SAH BVH4 kernel
    # (ops/pallas_bvh4.py) when the mesh carries prebuilt BVH4 tables
    # (MeshData.bvh4, built host-side by ops/bvh4.build_bvh4). The
    # heap kernel's complete pow2 topology forces equal-count splits,
    # which the round-3 topology sim measured 1.25-1.7x worse on
    # irregular-density meshes (terrain); scenes opt in at build time.
    # False forces the heap kernel even when the tables are present.
    packet_packs: int = 1  # independent 1024-ray packets interleaved
    # per packet-kernel invocation: every loop trip ISSUES all packets'
    # node slabs + vote reductions before CONSUMING any, so the
    # vector->scalar vote sync (the measured ~300-340 ns node-step
    # latency floor) amortizes across packets — 338/211/142 ns/step at
    # 1/2/4 packets in isolation (experiments/dual_probe.py). Results
    # are bit-identical to packs=1 (tested). DEFAULT 1: end-to-end the
    # win does not survive — knot 178.5 -> 191.6 ms/spp, dragon 442.3
    # -> 451.8 (P=2 quad+fused) / 455.7 (P=4) — per-packet tile state
    # through the per-trip branch boundaries, block convoying, and the
    # speculative phase-1 slabs eat more than the amortized latency
    # saves (PERFORMANCE.md round 3). Kept as an opt-in decision
    # record; requires a flat SMEM node table (f32/quant), else the
    # single-packet kernel runs regardless.
    packet_split: bool = False  # split-trip multi-packet kernels
    # (needs packet_packs > 1): the issue/consume phase split extended
    # to the LEAF phase — phase 1 issues every pack's slabs + votes +
    # pop-entered leaf cluster DMAs (per-pack semaphores), phase 2a
    # advances scalar state and issues fused-descend DMAs, phase 2b
    # runs all MT loops back-to-back against VMEM lane-state refs. The
    # ~590 ns/visit non-compute leaf serialization (PERFORMANCE.md r3
    # phase split) amortizes across packs instead of serializing.
    # Results and counters identical to packs=1 (tested).
    oct: bool = False  # 8-ary great-grandchild node step on the heap
    # packet kernels (3 binary levels per vector->scalar vote round
    # trip, extending the landed 4-ary grandchild step): rows
    # 8*idx..8*idx+7 slab-tested together, hierarchical near-first
    # votes, up to 3 pending bits pushed — the binary bitstack's pop
    # arithmetic is unchanged. Requires a flat SMEM node table
    # (f32/quant) and cl_first >= 16; disables the pair-prefetch
    # scheme (8 candidate clusters span 4 pairs — the 2 parity slots
    # can't cover them). MEASURED NEUTRAL e2e (dragon 437.8 vs 438.6
    # quad+pf; knot-heap 182.2 vs 178.0 — it only recovers what
    # forfeiting pf costs): the wider vector step + one more cond
    # level cancel the trip cut. Opt-in decision record
    # (PERFORMANCE.md "8-ary great-grandchild node step").
    prefetch: bool = True  # leaf prefetch in the heap packet kernels.
    # Legacy (stride >= 128) layout: sibling-pair DMAs issued under the
    # node step's vote latency (pf — knot bounce trace -17%). Packed
    # (stride < 128) layout, the r4+ default: next-leaf prefetch (pf1)
    # — the pop target after a leaf visit is a pure scalar function of
    # (idx, bs), so when it is itself a leaf its block copy starts
    # before this visit's MT loop and completes under it
    # (non-speculative, the BVH4 bvh4_pf pattern). Within-run e2e A/B
    # (experiments/pf1_ab.py): dragon 404.3 -> 393.6 ms/spp (-2.7%),
    # rocks 435.6 -> 420.7 (-3.4%), bit-identical. NOTE r4's packed
    # landing silently disabled ALL heap leaf prefetch (the wrapper
    # passed the pair-gate down); fixed in r5.
    bvh4_pf: bool = True  # double-buffered leaf DMA in the BVH4
    # explicit-stack kernels: the stack top after a leaf pop names the
    # NEXT cluster non-speculatively, so its copy starts before this
    # visit's MT loop and completes under it. Within-run e2e A/B
    # (experiments/bvh4_state_ab.py): knot -5.7%, terrain -8%,
    # stairs -2.5%, bit-identical images — default ON.
    pair_pf: bool = True  # pair-prefetch scheme on the PACKED heap
    # layout (takes precedence over pf1 when both eligible): both
    # clusters of a leaf pair are DMA'd at the node step that descends
    # into them (binary or quad), issued BEFORE the slab votes — the
    # same zero-misprediction coverage argument as the legacy
    # stride>=128 pair scheme, so there is NO sync leaf path at all;
    # each pair is two single-cluster copies with their own
    # semaphores. Covers descend-entered visits pf1 cannot; the
    # speculative pair traffic at quad steps (2 pairs, often <=1
    # consumed) is half the legacy bytes on packed 4 KB blocks.
    # Within-run e2e A/B (experiments/pf1_ab.py): dragon 401.8 ->
    # 387.3 ms/spp (-3.6%), rocks 431.7 -> 414.5 (-4.0%) — beats pf1
    # (391.4 / 417.9) on both; bit-identical — default ON.
    bvh4_pair: bool = False  # all-leaf-children prefetch in the BVH4
    # nearest kernel (the heap pf2 idea on the explicit stack,
    # decision record): every leaf child of a node step is DMA'd
    # pre-vote into its child slot (4 slots + 4 sems) — guaranteed
    # cover, zero misprediction. MEASURED LOSS within-run
    # (experiments/bvh4_pair_ab.py): knot 152.6->161.5, terrain
    # 422.7->462.7, stairs ~890->912 ms/spp (+3..9%). Unlike the heap
    # pf2 (parity-keyed slots, 2 predicated issue regions), the
    # explicit stack needs a 4-way ref-match cascade at consume and 4
    # independent per-step drains — scalar overhead on EVERY
    # leaf-children node step exceeds the DMA latency it hides on the
    # ~50% of visits bvh4_pf doesn't already cover. Bit-exact
    # (tested); kept OFF.
    bvh4_spec: bool = False  # descend-entered SPECULATIVE leaf prefetch
    # in the BVH4 nearest kernel (VERDICT r4 item 1a, decision record):
    # the child refs are scalar SMEM reads available BEFORE the vote
    # round trip, so the first leaf ref in table order is speculatively
    # DMA'd into a dedicated 3rd slot under the ~300 ns vote stall.
    # Predictor accuracy measured 53-59% on real renders
    # (experiments/leaf_spec_probe.py) — but the within-run e2e A/B
    # (experiments/bvh4_spec_ab.py) measured a consistent LOSS: knot
    # 152.5->155.4, terrain 423.5->434.3, stairs 829.6->851.2 ms/spp
    # (+2..2.6%; off/off2 brackets agree to 0.1%). The per-node-step
    # issue+drain overhead exceeds what ~55% accuracy recovers —
    # matching the heap kernel's speculative-pair history. Bit-exact
    # (tested); kept OFF as the decision record.
    packet_scratch: bool = True  # heap-kernel version of bvh4_scratch:
    # closest/besti (nearest) and closest/occ (any-hit) tiles live in
    # VMEM scratch refs instead of the while carry, so every cond join
    # of the trip (fused body + quad/oct nesting) carries scalars only.
    # Dragon e2e A/B (experiments/dragon_scratch_ab.py): 470.7 ->
    # 465.9 ms/spp (1.010x), bit-identical, faster in all reps —
    # default ON.
    bvh4_scratch: bool = True  # keep the per-lane closest/besti tiles
    # in VMEM scratch refs instead of the traversal while-loop carry:
    # the node/leaf lax.cond joins then carry only scalars, so no
    # (8,128) tile is materialized/relaid-out at the two branch
    # boundaries of every trip (the measured per-trip serialization —
    # PERFORMANCE.md round 3 "regrouped leaf phase"). Bit-identical
    # (tested); alone it is NEUTRAL (the carry tiles don't cost until
    # the trip shortens), but composed with bvh4_pf it adds ~1-2%
    # everywhere (knot 168.7 -> 166.0 ms/spp) — default ON with it.
    leaf_cull: bool = False  # stale-leaf re-test in the packet kernels:
    # re-slab a popped leaf cluster's own box against the (shrunken)
    # per-lane closest before the MT loop. Exact (same conservative
    # slab criterion as the vote) but measured a ~8% NET LOSS on
    # knot/stairs (cull rate ~4-6% < re-test cost); kept as an option
    # for deep/incoherent workloads.
    fast_math: bool = False  # opt-in approximate reciprocal in the
    # packet-kernel MT (~2^-14 rel on t/u/v; winner geometry stays
    # exact). Gated by an SSIM >= 0.999 test vs the exact path. The
    # MXU sphere b/c-term variant (ops/pallas_spheres.py mx=True) is
    # deliberately NOT on this flag: hardware A/B read 1.034x at SSIM
    # 0.9934 — fails the gate for ~3% (PERFORMANCE.md round 3).

    @property
    def num_pixels(self) -> int:
        return self.nx * self.ny

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    def validate(self) -> list:
        """Mutually-constrained knob combos that would otherwise no-op
        silently (the reference's #define matrix, kernels.cu:13–24,
        fails such combos at compile time). Returns the list of
        warning strings; ``__post_init__`` emits them as
        RuntimeWarnings so every constructed config is checked.

        Mesh-dependent constraints (packet_packs > 1 without a flat
        SMEM node table, oct on a hybrid/top-rows table) cannot be
        checked here — ops/pallas_bvh.packet_trace warns at trace time
        when those force a fallback."""
        w = []
        if self.packet_split and self.packet_packs <= 1:
            w.append("packet_split requires packet_packs > 1 — the "
                     "split-trip kernels never engage; set packet_packs")
        if self.oct and self.packet_packs > 1:
            w.append("oct is ignored by the multi-packet kernels "
                     "(packet_packs > 1): they implement only the "
                     "binary/4-ary node steps")
        if self.oct and self.prefetch:
            w.append("oct disables the sibling-pair cluster prefetch "
                     "(its 8 candidate clusters span 4 pairs — the 2 "
                     "parity slots can't cover them); prefetch=True "
                     "is ignored wherever the oct step engages")
        if self.leaf_cull and self.prefetch:
            w.append("leaf_cull disables the sibling-pair cluster "
                     "prefetch (the re-test invalidates the "
                     "prefetched pair's addresses); prefetch=True is "
                     "ignored while leaf_cull is on")
        if self.pair_pf and (self.leaf_cull or self.oct):
            w.append("pair_pf (packed pair prefetch) is disabled by "
                     "leaf_cull/oct for the same reasons as the "
                     "legacy pair scheme; the packed heap kernels "
                     "fall back to sync leaf DMA")
        if (self.bvh4_spec or self.bvh4_pair) and not self.bvh4_pf:
            w.append("bvh4_spec/bvh4_pair require bvh4_pf (they share "
                     "its prefetch slots) — silently ignored while "
                     "bvh4_pf is off")
        if self.bvh4_spec and self.bvh4_pair:
            w.append("bvh4_pair takes precedence over bvh4_spec (they "
                     "share carry slots); bvh4_spec is ignored")
        if self.mx_leaf and self.regroup:
            w.append("mx_leaf takes dispatch precedence over regroup "
                     "(engine/wavefront.make_view) — regroup is "
                     "ignored")
        if (self.fast_math and (self.mx_leaf or self.regroup)):
            w.append("fast_math (approximate-reciprocal MT) only "
                     "affects the heap packet kernels; the mx_leaf / "
                     "regroup paths ignore it")
        if self.regroup and self.regroup_dense >= 1024:
            w.append("regroup_dense is clamped to ws-1 = 1023 (a "
                     "statically-never-dense kernel measured 5x "
                     "slower AND produced a hardware-only winner "
                     "mismatch — PERFORMANCE.md round 3)")
        if self.check_nans and not self.stats:
            w.append("check_nans counts into Stats.nans, which is "
                     "only collected/reported when stats=True")
        if self.packet_width & (self.packet_width - 1):
            w.append("packet_width should be a power of two (leaf "
                     "clusters are grouped in pow2 sub-blocks of the "
                     "tree's prims_per_leaf); non-pow2 widths fall "
                     "back to the tree's own leaf width")
        return w

    def __post_init__(self):
        for msg in self.validate():
            warnings.warn(msg, RuntimeWarning, stacklevel=3)
