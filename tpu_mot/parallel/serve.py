"""Multi-stream serving: shard_map the tracking step over a stream mesh.

BASELINE.json configs[4]: "8 concurrent 1080p streams sharded across a
v5e-8, shared detector batch".  Design (SURVEY.md §3.5):

  * Each device owns one (or more) stream's TrackBank — tracker state never
    moves; per-frame tracking is embarrassingly parallel over "stream".
  * The detector runs as ONE batched forward over all streams' frames.
    With replicated detector params this is pure data parallelism (no
    collective — each shard detects its own frames).  With sharded
    detector activations/batch the all-gather/scatter ride ICI; both modes
    are expressed below by the sharding of `frames` and the params.

Everything is jit + NamedSharding (GSPMD): XLA inserts the collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_mot.config import TrackerConfig
from tpu_mot.tracker import bank as bank_mod
from tpu_mot.tracker import step as step_mod


def make_stream_banks(n_streams: int, cfg: TrackerConfig, mesh: Mesh):
    """One TrackBank per stream, leading axis sharded over the mesh."""
    one = bank_mod.empty_bank(cfg)
    banks = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_streams,) + x.shape), one)
    sharding = NamedSharding(mesh, P("stream"))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), banks)


@functools.partial(jax.jit, static_argnames=("cfg",))
def multi_stream_step(banks, frames: jnp.ndarray, dets: jnp.ndarray,
                      det_valid: jnp.ndarray, cfg: TrackerConfig):
    """One tracking frame for every stream.

    banks     : TrackBank pytree with leading [N_streams] axis (sharded).
    frames    : [N_streams, H, W] — sharded over "stream".
    dets      : [N_streams, D, 5], det_valid [N_streams, D].
    Under jit with stream-sharded inputs, GSPMD partitions the vmap over
    devices — each chip tracks its own streams with zero communication.
    """
    return jax.vmap(lambda b, f, d, v: step_mod.step(b, f, d, v, cfg))(
        banks, frames, dets, det_valid)


@functools.partial(jax.jit, static_argnames=("cfg",))
def multi_stream_sequence(banks, frames, dets, det_valid,
                          cfg: TrackerConfig):
    """Track a clip per stream: frames [N_streams, T_frames, H, W]."""
    def per_stream(bank, fr, de, va):
        from tpu_mot.tracker import scan
        return scan.run_sequence(bank, fr, de, va, cfg)

    return jax.vmap(per_stream)(banks, frames, dets, det_valid)


def detect_then_track_step(detector_params, banks, frames, cfg,
                           detect_fn):
    """The fused detect→track serving step with a shared detector batch.

    detect_fn(params, frames) → (dets [N, D, 5], valid [N, D]); typically
    models.detector.detect_batch closed over the spec.  frames arrive
    stream-sharded; the detector forward is data-parallel over the same
    axis (one batched conv program — XLA keeps it local per shard), then
    each shard's tracker consumes its own detections.
    """
    dets, valid, _ = detect_fn(detector_params, frames)
    return multi_stream_step(banks, frames, dets, valid, cfg)
