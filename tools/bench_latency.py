"""Per-frame serving LATENCY of the reference-shaped API (VERDICT r2
next #4): `MultiTracker.update` — one frame in, confirmed tracks out,
synchronously — at 1080p with a 128-slot bank.

Every other recorded number is THROUGHPUT via `lax.scan` chunks; this is
the real-time serving SLA shape.  Each `update` call necessarily pays one
full host→device→host round trip, and on this dev harness that includes
the axon tunnel's ~30-45 ms HTTP RTT, which is an artifact of the tunnel,
not of the framework or the chip.  So the report decomposes:

  * raw per-call wall latency (what THIS harness observes), p50/p90;
  * the tunnel RTT floor, measured by the smallest possible dependent
    device round trip (a [1] f32 increment whose input carries the
    previous output — dedup-proof);
  * net = raw_p50 − rtt_p50: the framework-attributable per-frame
    latency (host prep + H2D of a 2 MB u8 frame + step + D2H + unpack),
    the number a direct-attached deployment would see on top of its own
    dispatch cost.

Run on the TPU:  python tools/bench_latency.py
Prints ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_mot.config import TrackerConfig
    from tpu_mot.data import synthetic
    from tpu_mot.tracker.api import MultiTracker

    height, width = 1080, 1920
    n_obj = 128
    n_frames = 48

    rng = np.random.default_rng(0)
    objs = synthetic.make_objects(n_obj, height, width, rng,
                                  min_size=24, max_size=64, max_speed=3.0)
    frames, boxes, vis = synthetic.render_sequence(
        objs, n_frames, height, width, seed=0, noise=0.01)
    frames_u8 = (frames * 255).astype(np.uint8)
    dets_list = synthetic.detections_from_gt(boxes, vis, seed=0,
                                             frame_hw=(height, width))

    cfg = TrackerConfig(max_tracks=128, max_detections=160,
                        frame_height=height, frame_width=width)
    mt = MultiTracker(cfg)
    mt.init(frames_u8[0], dets_list[0])
    # Warm: a second distinct call so compile + any lazy init are done.
    mt.update(frames_u8[1], dets_list[1])

    # --- raw per-call serving latency (dependent by construction: the
    # bank carries across calls; frames/dets differ per call) ------------
    lat = []
    for f in range(2, n_frames):
        t0 = time.perf_counter()
        mt.update(frames_u8[f], dets_list[f])
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)

    # --- async serving shape: update_async chained, one fetch -----------
    # The per-call fetch is what exposes the RTT; a serving loop that
    # reports every Kth frame chains update_async and fetches once.
    mt2 = MultiTracker(cfg)
    mt2.init(frames_u8[0], dets_list[0])
    mt2.update_async(frames_u8[1], dets_list[1])
    t0 = time.perf_counter()
    last = None
    for f in range(2, n_frames):
        last = mt2.update_async(frames_u8[f], dets_list[f])
    mt2.unpack(last)                              # one fetch at the end
    async_ms = (time.perf_counter() - t0) / (n_frames - 2) * 1e3

    # --- tunnel RTT floor: minimal dependent device round trip ----------
    @jax.jit
    def bump(x):
        return x + 1.0

    x = jnp.zeros((1,), jnp.float32)
    x = bump(x)
    float(x[0])                                   # warm
    rtts = []
    for _ in range(24):
        t0 = time.perf_counter()
        x = bump(x)
        float(x[0])                               # forced fetch, carries
        rtts.append((time.perf_counter() - t0) * 1e3)
    rtts = np.asarray(rtts)

    # --- tunnel H2D cost of one 1080p u8 frame --------------------------
    # The dominant per-call term on this harness: a 2 MB frame upload
    # rides the HTTP tunnel at tens of MB/s.  Direct-attached PCIe moves
    # the same frame in ~0.2 ms — this term is a harness artifact in the
    # same class as the RTT.
    jax.block_until_ready(jax.device_put(frames_u8[0]))   # warm
    h2ds = []
    for f in range(2, 26):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(frames_u8[f % n_frames]))
        h2ds.append((time.perf_counter() - t0) * 1e3)
    h2ds = np.asarray(h2ds)

    p50 = float(np.percentile(lat, 50))
    p90 = float(np.percentile(lat, 90))
    rtt50 = float(np.percentile(rtts, 50))
    h2d50 = float(np.percentile(h2ds, 50))
    net = max(p50 - h2d50 - small_fetch_overlap(rtt50, h2d50), 0.0)

    print(json.dumps({
        "metric": "1080p@128trk per-frame MultiTracker.update latency",
        "value": round(p50, 2),
        "unit": "ms (p50, incl. tunnel RTT + tunnel H2D)",
        "extra": {
            "p90_ms": round(p90, 2),
            "update_async_chained_ms_per_frame": round(async_ms, 2),
            "tunnel_rtt_p50_ms": round(rtt50, 2),
            "tunnel_h2d_2mb_frame_p50_ms": round(h2d50, 2),
            "net_framework_ms_p50": round(net, 2),
            "net_fps_equiv": round(1e3 / net, 1) if net > 0 else None,
            "n_calls": int(lat.size),
            "note": "net = p50 - frame H2D - dispatch RTT; on a "
                    "direct-attached chip H2D is ~0.2 ms and RTT ~0, so "
                    "serving latency there ~= net + 0.2 ms",
            "device": str(jax.devices()[0]),
        },
    }))


def small_fetch_overlap(rtt50: float, h2d50: float) -> float:
    """The update call's dispatch+fetch round trip: one RTT (the H2D
    transfer itself already includes its own round trip, measured
    separately, so count the dispatch RTT once)."""
    return rtt50


if __name__ == "__main__":
    sys.exit(main())
