"""Accumulation-buffer checkpoint / resume.

The reference has no runtime checkpointing; resuming a render from a
saved file is on its wish-list (SURVEY §5, TODO.txt:70). For 1000-spp
frames (BASELINE config 5) it's cheap and valuable: the checkpoint is the
linear radiance *sum* buffer plus the number of samples completed —
because the RNG is counter-based, resuming at sample k reproduces exactly
the samples a straight run would have traced.

Format: ``CKPT_00.02`` header, nx, ny, samples_done, scene/config
fingerprint (uint64), float32 sum buffer. ``CKPT_00.01`` (no fingerprint)
is still readable.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Callable, Optional

import numpy as np

CKPT_HEADER = b"CKPT_00.02"
_CKPT_HEADER_V1 = b"CKPT_00.01"


def scene_fingerprint(scene, config) -> int:
    """Cheap stable digest of the scene + the config fields that change
    radiance, so a checkpoint written for one render can't silently seed a
    different one."""
    import jax

    crc = 0
    for leaf in jax.tree.leaves(scene):
        a = np.asarray(leaf)
        crc = zlib.crc32(a.tobytes(), crc)
        crc = zlib.crc32(str(a.dtype).encode(), crc)
    key = (config.nx, config.ny, config.max_depth, config.epsilon,
           config.russian_roulette, config.rr_start_bounce, config.shadow,
           config.textures)
    return zlib.crc32(repr(key).encode(), crc) & 0xFFFFFFFF


def save_checkpoint(path: str, sum_buffer: np.ndarray, samples_done: int,
                    fingerprint: int = 0) -> None:
    ny, nx, _ = sum_buffer.shape
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(CKPT_HEADER)
        f.write(struct.pack("<iiiQ", nx, ny, samples_done, fingerprint))
        f.write(np.ascontiguousarray(sum_buffer, np.float32).tobytes())
    os.replace(tmp, path)  # atomic: a torn write never corrupts the ckpt


def load_checkpoint(path: str):
    """Returns (sum_buffer [ny,nx,3], samples_done, fingerprint) or None
    if absent. V1 checkpoints load with fingerprint None (unchecked)."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        header = f.read(len(CKPT_HEADER))
        if header == CKPT_HEADER:
            nx, ny, done, fp = struct.unpack("<iiiQ", f.read(20))
        elif header == _CKPT_HEADER_V1:
            nx, ny, done = struct.unpack("<iii", f.read(12))
            fp = None
        else:
            raise ValueError(f"invalid checkpoint header {header!r}")
        data = np.frombuffer(f.read(nx * ny * 12), np.float32)
    return data.reshape(ny, nx, 3).copy(), done, fp


def render_with_checkpoints(scene, camera, config, path: str,
                            batch: int = 16,
                            progress: Optional[Callable[[int, int], None]] = None,
                            devices=None) -> np.ndarray:
    """Progressive render: trace ``batch`` samples at a time, checkpoint
    after each batch, resume automatically if ``path`` exists. Returns the
    final mean-radiance image [ny, nx, 3].

    Uses the regeneration engine with dynamic sample offsets — sample
    indices [done, done+batch) are traced exactly as a straight run would.
    With ``devices`` the frame is image-tile-sharded over that device
    list per batch (BASELINE config 5: 4K @ 1000 spp = tiled + RNG-exact
    checkpoint/resume); radiance is bit-identical either way because the
    counter RNG is keyed by global pixel id.
    """
    from tpu_pathtracer.engine.regen import render_sample_range

    fp = scene_fingerprint(scene, config)
    state = load_checkpoint(path)
    if state is None:
        acc = np.zeros((config.ny, config.nx, 3), np.float32)
        done = 0
    else:
        acc, done, ckpt_fp = state
        if acc.shape != (config.ny, config.nx, 3):
            raise ValueError("checkpoint resolution mismatch")
        if done > config.ns:
            raise ValueError(
                f"checkpoint has {done} samples done > config.ns={config.ns};"
                " refusing to produce a mean over the wrong sample count")
        if ckpt_fp is not None and ckpt_fp != fp:
            raise ValueError(
                "checkpoint scene/config fingerprint mismatch: the file was"
                " written for a different render")

    while done < config.ns:
        take = min(batch, config.ns - done)
        if devices is not None:
            from tpu_pathtracer.parallel.tiles import \
                render_image_tiled_regen
            part = render_image_tiled_regen(scene, camera, config,
                                            devices=devices, ns=take,
                                            s0=done, normalize=False)
        else:
            part = render_sample_range(scene, camera, config, done, take)
        acc = acc + np.asarray(part)  # part is a SUM over `take` samples
        done += take
        save_checkpoint(path, acc, done, fp)
        if progress is not None:
            progress(done, config.ns)

    return acc / config.ns
