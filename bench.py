"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline workload (BASELINE.md): random-spheres 1200×800 @ 100 spp,
max depth 50 — the reference's final README state ran it in 6.48 s on a
GTX 1050 (README.md:94). ``vs_baseline`` is baseline_time / our_time
(>1 = faster than the reference).

The single JSON line also carries the other BASELINE configs and the
Mrays/sec/chip metric under ``extra``:
  * config 2 — random-spheres 1200×800 @ 10 spp (README.md:70: 2.1 s)
  * staircase-toy — 396-tri procedural staircase 1200×800 @ 100 spp
    (brute-kernel path; NOT config 4 — kept for continuity)
  * config 4 — reported from the asset-scale 154k-tri staircase
    (BVH + textures + NEE), extrapolated ×100 from the measured s/spp
  * large-mesh zoo — 102k-tri torus knot (131k padded slots) 512×512
    @ 16 spp via the packet-BVH kernel (see PERFORMANCE.md)
  * staircase-hires — asset-scale 154k-tri staircase (262k padded BVH
    slots), s/spp at 1200×800 — the reference's own staircase workload
    at real mesh density

Renders are issued in sample batches (shorter device dispatches — the
axon tunnel intermittently kills very long ones) and each measurement
retries on a worker crash.
"""

import json
import os
import sys
import time

BASELINE_100SPP = 6.48   # README.md:94, GTX 1050
BASELINE_10SPP = 2.1     # README.md:70, GTX 1050
BATCH = 25
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "assets")
GOLDEN_RMSE = 1e-3


class ImageGateError(AssertionError):
    """Deterministic radiance mismatch vs a committed golden."""


def _gate(name, img, ny=None, nx=None):
    """On-hardware image gate (VERDICT r2 item 7): compare a 128x128
    center crop of the *linear mean radiance* image against a committed
    golden (reference mechanism: main.cpp:117-126). A perf change that
    shifts radiance fails the bench loudly instead of shipping a wrong
    image under a green timing. Set BENCH_STORE_REF=1 to (re)generate
    goldens after an intentional radiance change.

    ``img`` may be the engine's FLAT [npixels, 3] framebuffer
    (normalize=False) — pass ny/nx to recover the spatial layout, or
    a 3-D [ny, nx, 3] image directly."""
    import numpy as np

    from tpu_pathtracer.utils.golden import (load_reference, rmse,
                                             save_reference)
    if img.ndim == 2:
        img = np.asarray(img).reshape(ny, nx, 3)
    ny, nx = img.shape[:2]
    cy, cx = ny // 2, nx // 2
    crop = np.ascontiguousarray(
        img[max(cy - 64, 0):cy + 64, max(cx - 64, 0):cx + 64],
        np.float32)
    path = os.path.join(GOLDEN_DIR, f"bench_{name}.ref")
    if os.environ.get("BENCH_STORE_REF"):
        save_reference(path, crop)
        print(f"  stored golden {path}", file=sys.stderr)
        return
    if not os.path.exists(path):
        # bootstrap: first run of a new workload stores its golden (and
        # says so); subsequent runs gate against it
        save_reference(path, crop)
        print(f"  no golden for {name} -> stored bootstrap {path}",
              file=sys.stderr)
        return
    err = rmse(crop, load_reference(path))
    if err >= GOLDEN_RMSE:
        raise ImageGateError(
            f"image gate FAILED for {name}: rmse {err:.2e} >= "
            f"{GOLDEN_RMSE:.0e} vs committed golden {path}")
    print(f"  image gate {name}: rmse {err:.2e} OK", file=sys.stderr)


def _oracle_gate(name, scene, cam, cfg, rmse_tol, ssim_min):
    """On-hardware oracle cross-check (VERDICT r3 item 7): a low-res
    render on the TPU must match the independent NumPy oracle
    (same RNG streams — reference analogue: the no-BVH slow-oracle
    path, kernels.cu:307–321). Unlike ``_gate`` this re-anchors every
    hardware run to an independent implementation, so TPU-only numeric
    drift can't be ratified into the stored goldens."""
    import numpy as np

    from tpu_pathtracer.oracle import render_oracle
    from tpu_pathtracer.utils import golden

    _, img = _render_batched(scene, cam, cfg, cfg.ns, cfg.ns)
    img = np.asarray(img).reshape(cfg.ny, cfg.nx, 3)
    ref = render_oracle(scene, cam, cfg)
    err, ss = golden.rmse(img, ref), golden.ssim(img, ref)
    if err >= rmse_tol or ss < ssim_min:
        raise ImageGateError(
            f"oracle gate FAILED for {name}: rmse {err:.2e} "
            f"(tol {rmse_tol:.0e}) ssim {ss:.4f} (min {ssim_min})")
    print(f"  oracle gate {name}: rmse {err:.2e} ssim {ss:.4f} OK",
          file=sys.stderr)


def _render_batched(scene, cam, cfg, ns, batch):
    """Timed render of `ns` samples in `batch`-spp dispatches; returns
    (seconds, mean image). Timing matches the reference driver, which
    times runRenderer only (main.cpp:96-101). batch == ns is a single
    dispatch (no tail repetition); smaller batches keep dispatches under
    the tunnel's crash horizon for long renders.

    The warmup call uses the SAME static signature (normalize=False) as
    the timed calls — a different static arg would compile a second
    executable inside the timed region.
    """
    import jax.numpy as jnp
    import numpy as np

    from tpu_pathtracer.engine.regen import _render_regen_jit

    np.asarray(_render_regen_jit(scene, cam, cfg, jnp.uint32(1),
                                 jnp.uint32(0), normalize=False))
    t0 = time.perf_counter()
    tot = None
    for s0 in range(0, ns, batch):
        take = min(batch, ns - s0)
        fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(take),
                               jnp.uint32(s0), normalize=False)
        if batch >= ns:
            fb.block_until_ready()  # single dispatch: time kernel only
            elapsed = time.perf_counter() - t0
            return elapsed, np.asarray(fb) / ns
        a = np.asarray(fb)
        tot = a if tot is None else tot + a
    elapsed = time.perf_counter() - t0
    return elapsed, tot / ns


def _rays_per_path(scene, cam, cfg):
    """Measured rays per camera path (primary+secondary+shadow) from a
    short stats-enabled run — converts Mpaths/s to Mrays/s."""
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.engine.regen import render_regen

    scfg = cfg.replace(stats=True, nx=cfg.nx // 4, ny=cfg.ny // 4)
    _, stats = jax.jit(
        lambda s, c: render_regen(s, c, scfg, ns=jnp.uint32(4)))(scene, cam)
    rays = int(stats.primary) + int(stats.secondary) + int(stats.shadows)
    return rays / max(int(stats.primary), 1)


def _retry(fn, attempts=3):
    last = None
    for i in range(attempts):
        try:
            return fn()
        except ImageGateError:
            raise  # image-gate failure is deterministic — don't retry
        except Exception as e:  # tunnel/worker crash — retry
            last = e
            print(f"attempt {i} failed: {e!r}"[:300], file=sys.stderr)
            time.sleep(30)
    raise last


def bench_headline():
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.spheres import random_spheres_scene

    gcfg = RenderConfig(nx=96, ny=64, ns=4, max_depth=8)
    gscene, gcam = random_spheres_scene(gcfg.nx, gcfg.ny)
    _oracle_gate("spheres", gscene, gcam, gcfg,
                 rmse_tol=5e-3, ssim_min=0.99)

    cfg = RenderConfig(nx=1200, ny=800, ns=100, max_depth=50)
    scene, cam = random_spheres_scene(cfg.nx, cfg.ny)
    elapsed, img = _render_batched(scene, cam, cfg, 100, 100)
    _gate("spheres_100spp", img, cfg.ny, cfg.nx)
    rpp = _rays_per_path(scene, cam, cfg)
    paths = cfg.num_pixels * cfg.ns
    mrays = paths * rpp / elapsed / 1e6
    print(f"random-spheres 1200x800@100spp: {elapsed:.3f} s "
          f"({paths / elapsed / 1e6:.1f} Mpaths/s, {mrays:.1f} Mrays/s, "
          f"mean={img.mean():.4f})", file=sys.stderr)

    # config 2 on the same warm executable (ns is dynamic)
    t2, _ = _render_batched(scene, cam, cfg, 10, 10)
    print(f"random-spheres 1200x800@10spp: {t2:.3f} s", file=sys.stderr)
    return elapsed, mrays, t2


def bench_staircase():
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.mesh import procedural_staircase_scene

    gcfg = RenderConfig(nx=96, ny=64, ns=4, max_depth=8)
    gscene, gcam = procedural_staircase_scene(gcfg.nx, gcfg.ny)
    _oracle_gate("staircase_mesh", gscene, gcam, gcfg,
                 rmse_tol=1e-2, ssim_min=0.97)

    cfg = RenderConfig(nx=1200, ny=800, ns=100, max_depth=64)
    scene, cam = procedural_staircase_scene(cfg.nx, cfg.ny)
    elapsed, img = _render_batched(scene, cam, cfg, 100, BATCH)  # ~6 s/batch
    _gate("staircase_toy_100spp", img, cfg.ny, cfg.nx)
    print(f"staircase-toy 1200x800@100spp: {elapsed:.3f} s "
          f"(mean={img.mean():.4f})", file=sys.stderr)
    return elapsed


def bench_dragon():
    """Dragon-class large mesh: 872k-tri knot at 512x512 (the reference's
    own model-zoo headline row is the 871k-tri dragon, TODO.txt:288 —
    ~24 ms/spp on a GTX 1050)."""
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.shapes import knot_zoo_scene

    cfg = RenderConfig(nx=512, ny=512, ns=4, max_depth=50, textures=False)
    scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=1664, nv=262)
    # single dispatch (~2 s, safely under the tunnel's crash horizon):
    # batch-split timing pays ~240 ms/dispatch tunnel latency
    elapsed, img = _render_batched(scene, cam, cfg, 4, 4)
    _gate("dragon_4spp", img, cfg.ny, cfg.nx)
    print(f"dragon-class 872k 512x512@4spp (packet BVH): {elapsed:.3f} s "
          f"({elapsed / 4 * 1e3:.0f} ms/spp, mean={img.mean():.4f})",
          file=sys.stderr)
    return elapsed / 4


def bench_terrain():
    """Irregular-mesh zoo scene (fBm terrain + thin-strut lattice,
    ~168k tris): the non-parametric topology check (VERDICT r2 item 8)."""
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.shapes import terrain_zoo_scene

    cfg = RenderConfig(nx=512, ny=512, ns=8, max_depth=50, textures=False)
    scene, cam = terrain_zoo_scene(cfg.nx, cfg.ny)
    elapsed, img = _render_batched(scene, cam, cfg, 8, 8)  # ~6 s, 1 dispatch
    _gate("terrain_8spp", img, cfg.ny, cfg.nx)
    print(f"terrain-168k 512x512@8spp (packet BVH): {elapsed:.3f} s "
          f"({elapsed / 8 * 1e3:.0f} ms/spp, mean={img.mean():.4f})",
          file=sys.stderr)
    return elapsed / 8


def bench_terrain_big():
    """Dragon-scale irregular mesh (~668k real tris): exercises the SAH
    BVH4 quant tier chosen by the per-mesh expected-cost tier selection
    (VERDICT r3 item 8). Reference scale anchor: the model-zoo dragon
    row, TODO.txt:283–298."""
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.shapes import terrain_big_zoo_scene

    cfg = RenderConfig(nx=512, ny=512, ns=4, max_depth=50, textures=False)
    scene, cam = terrain_big_zoo_scene(cfg.nx, cfg.ny)
    assert scene.mesh.bvh4 is not None and scene.mesh.bvh4.quant, \
        "terrain-big must auto-select the quant BVH4 tier"
    elapsed, img = _render_batched(scene, cam, cfg, 4, 4)
    _gate("terrain_big_4spp", img, cfg.ny, cfg.nx)
    print(f"terrain-big-668k 512x512@4spp (quant BVH4): {elapsed:.3f} s "
          f"({elapsed / 4 * 1e3:.0f} ms/spp, mean={img.mean():.4f})",
          file=sys.stderr)
    return elapsed / 4


def bench_rocks():
    """Genuinely irregular dragon-scale mesh (~845k tris): fBm-displaced
    interpenetrating rocks (VERDICT r4 item 3 — the knot matches the
    dragon's COUNT but not its BVH hostility; this does both).
    Reference anchor: the model-zoo dragon, ~24 ms/spp, TODO.txt:288."""
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.shapes import rocks_zoo_scene

    # family oracle gate on a small pile forced onto the packet kernels
    gcfg = RenderConfig(nx=64, ny=48, ns=4, max_depth=8, textures=False,
                        packet_threshold=1)
    gscene, gcam = rocks_zoo_scene(gcfg.nx, gcfg.ny, n_big=2, n_small=3,
                                   seed=9)
    _oracle_gate("rocks_packet", gscene, gcam, gcfg,
                 rmse_tol=1e-2, ssim_min=0.97)

    cfg = RenderConfig(nx=512, ny=512, ns=4, max_depth=50, textures=False)
    scene, cam = rocks_zoo_scene(cfg.nx, cfg.ny)
    tier = ("quant-bvh4" if scene.mesh.bvh4 is not None
            and scene.mesh.bvh4.quant else
            "bvh4" if scene.mesh.bvh4 is not None else "heap")
    elapsed, img = _render_batched(scene, cam, cfg, 4, 4)
    _gate("rocks_4spp", img, cfg.ny, cfg.nx)
    print(f"rocks-845k 512x512@4spp ({tier}): {elapsed:.3f} s "
          f"({elapsed / 4 * 1e3:.0f} ms/spp, mean={img.mean():.4f})",
          file=sys.stderr)
    return elapsed / 4


def bench_staircase_hires():
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.mesh import procedural_staircase_scene

    cfg = RenderConfig(nx=1200, ny=800, ns=2, max_depth=64)
    scene, cam = procedural_staircase_scene(1200, 800, prims_per_leaf=64,
                                            sub=20)
    elapsed, img = _render_batched(scene, cam, cfg, 2, 2)
    _gate("staircase_hires_2spp", img, 800, 1200)
    print(f"staircase-hires 154k 1200x800@2spp (packet BVH): "
          f"{elapsed:.3f} s ({elapsed / 2 * 1e3:.0f} ms/spp, "
          f"mean={img.mean():.4f})", file=sys.stderr)
    # BASELINE config 4, MEASURED end-to-end (VERDICT r3 item 2): the
    # full 100 spp on the asset-scale staircase, in 8-spp dispatches
    # (~7 s each — safely under the tunnel's ~60 s crash horizon).
    # Reuses the warm executable above (ns/s0 are dynamic scalars).
    t100, img100 = _render_batched(scene, cam, cfg, 100, 8)
    print(f"config 4 staircase-hires 1200x800@100spp MEASURED: "
          f"{t100:.1f} s (mean={img100.mean():.4f})", file=sys.stderr)
    return elapsed / 2, t100


def bench_knot():
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.shapes import knot_zoo_scene

    # packet-path family oracle gate: a small knot FORCED onto the
    # packet BVH kernels (packet_threshold=1 — same dispatch the tests
    # use) so hardware runs cross-check the traversal kernels, not
    # just the brute path
    gcfg = RenderConfig(nx=64, ny=48, ns=4, max_depth=8, textures=False,
                        packet_threshold=1)
    gscene, gcam = knot_zoo_scene(gcfg.nx, gcfg.ny, nu=48, nv=24)
    _oracle_gate("knot_packet", gscene, gcam, gcfg,
                 rmse_tol=1e-2, ssim_min=0.97)

    cfg = RenderConfig(nx=512, ny=512, ns=16, max_depth=50, textures=False)
    scene, cam = knot_zoo_scene(cfg.nx, cfg.ny)
    elapsed, img = _render_batched(scene, cam, cfg, 16, 16)
    _gate("knot_16spp", img, cfg.ny, cfg.nx)
    print(f"knot-102k 512x512@16spp (packet BVH): {elapsed:.3f} s "
          f"(mean={img.mean():.4f})", file=sys.stderr)
    return elapsed


def main():
    from tpu_pathtracer.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    headline, mrays, t10 = _retry(bench_headline)
    extra = {"config2_random_spheres_10spp_s": round(t10, 4),
             "config2_vs_baseline": round(BASELINE_10SPP / t10, 3)}
    try:
        extra["staircase_toy_100spp_s"] = round(_retry(bench_staircase), 4)
    except Exception as e:
        print(f"staircase bench failed: {e!r}"[:200], file=sys.stderr)
    try:
        extra["zoo_knot_102k_512_16spp_s"] = round(_retry(bench_knot), 4)
    except Exception as e:
        print(f"knot bench failed: {e!r}"[:200], file=sys.stderr)
    try:
        extra["dragon_872k_ms_per_spp"] = round(
            _retry(bench_dragon) * 1e3, 1)
    except Exception as e:
        print(f"dragon bench failed: {e!r}"[:200], file=sys.stderr)
    try:
        extra["terrain_168k_ms_per_spp"] = round(
            _retry(bench_terrain) * 1e3, 1)
    except Exception as e:
        print(f"terrain bench failed: {e!r}"[:200], file=sys.stderr)
    try:
        extra["terrain_big_668k_ms_per_spp"] = round(
            _retry(bench_terrain_big) * 1e3, 1)
    except Exception as e:
        print(f"terrain-big bench failed: {e!r}"[:200], file=sys.stderr)
    try:
        extra["rocks_845k_ms_per_spp"] = round(
            _retry(bench_rocks) * 1e3, 1)
    except Exception as e:
        print(f"rocks bench failed: {e!r}"[:200], file=sys.stderr)
    try:
        s_per_spp, t100 = _retry(bench_staircase_hires)
        extra["staircase_hires_154k_s_per_spp"] = round(s_per_spp, 4)
        # config 4 (VERDICT r3 item 2): the asset-scale 154k-tri
        # staircase (BVH + textures + NEE) at the full 1200x800@100spp,
        # measured end-to-end in 8-spp dispatches
        extra["config4_staircase_100spp_s"] = round(t100, 2)
        extra["config4_basis"] = "measured"
    except Exception as e:
        print(f"staircase-hires bench failed: {e!r}"[:200],
              file=sys.stderr)

    print(json.dumps({
        "metric": "random_spheres_1200x800_100spp_wall_clock",
        "value": round(headline, 4),
        "unit": "seconds",
        "vs_baseline": round(BASELINE_100SPP / headline, 3),
        "mrays_per_sec": round(mrays, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
