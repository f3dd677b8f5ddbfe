"""Map + tracker checkpointing.

The reference's ``System::SaveMap/LoadMap`` are an explicit TODO
(System.h:119-121); the only artifacts it can dump are terminal trajectory /
cuboid / plane text files (System.cc:341-549).  Because our map is a single
structure-of-arrays pytree (map/mapstate.py) rather than a pointer graph,
checkpointing is trivial and exact: every array field -> one npz entry,
host-side scalar counters -> a JSON side blob.  A checkpoint fully resumes a
run (the tracker continues tracking against the restored map, including
relocalization against restored keyframes).
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from ..map import mapstate as ms

_FORMAT_VERSION = 1


def save_map(path: str, m: ms.MapState, extra: dict | None = None) -> None:
    """Serialize a MapState (and optional scalar metadata) to ``path``.npz."""
    arrays = {name: np.asarray(val) for name, val in zip(ms.MapState._fields, m)}
    meta = {"format_version": _FORMAT_VERSION, "extra": extra or {}}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    ).copy()
    np.savez_compressed(path, **arrays)


def load_map(path: str):
    """Load ``(MapState, extra_dict)`` from an npz checkpoint."""
    with np.load(path) as z:
        meta = {}
        if "__meta__" in z.files:
            meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        missing = [f for f in ms.MapState._fields if f not in z.files]
        if missing:
            raise ValueError(f"checkpoint {path} missing map fields: {missing}")
        m = ms.MapState(*(jnp.asarray(z[f]) for f in ms.MapState._fields))
    return m, meta.get("extra", {})


def save_tracker(path: str, tracker) -> None:
    """Checkpoint a frontend Tracker: map arrays + host state machine."""
    if hasattr(tracker, "flush"):
        tracker.flush()  # resolve the in-flight pipelined frame
    if hasattr(tracker, "_resolve_pending_alloc"):
        tracker._resolve_pending_alloc()  # flush async slot bookkeeping
    extra = {
        "state": int(tracker.state),
        "n_kf": int(tracker.n_kf),
        "n_pt": int(tracker.n_pt),
        "n_plane": int(tracker.n_plane),
        "n_cub": int(tracker.n_cub),
        "ref_kf": int(tracker.ref_kf),
        "frames_since_kf": int(tracker.frames_since_kf),
        "T_cur": np.asarray(tracker.T_cur).tolist(),
        "velocity": np.asarray(tracker.velocity).tolist(),
        "trajectory": [
            [int(fid), np.asarray(T).tolist()] for fid, T in tracker.trajectory
        ],
        "kf_fids": [int(f) for f in tracker._kf_fids],
    }
    save_map(path, tracker.map, extra=extra)


def load_tracker(path: str, cam, cfg, vocab=None):
    """Restore a Tracker from a checkpoint.

    The restored tracker resumes in the LOST state when it was mid-sequence
    (its ``last_frame`` feature snapshot is deliberately not serialized —
    like the reference after a map load, the next frame relocalizes against
    the restored keyframes rather than the motion model).
    """
    from ..frontend.tracking import Tracker

    m, extra = load_map(path)
    tracker = Tracker(cam, cfg, vocab=vocab)
    tracker.map = m
    tracker.n_kf = extra["n_kf"]
    tracker.n_pt = extra["n_pt"]
    tracker.n_plane = extra["n_plane"]
    tracker.n_cub = extra["n_cub"]
    tracker.ref_kf = extra["ref_kf"]
    tracker.frames_since_kf = extra["frames_since_kf"]
    tracker.T_cur = np.array(extra["T_cur"], np.float32)
    tracker.velocity = np.array(extra["velocity"], np.float32)
    tracker.trajectory = [
        (fid, np.array(T, np.float32)) for fid, T in extra["trajectory"]
    ]
    tracker._kf_fids = [int(f) for f in extra.get("kf_fids", [])]
    # slot -> frame-id occupancy for relative-pose trajectory recording
    kf_valid = np.asarray(m.kf_valid)
    kf_fid = np.asarray(m.kf_frame_id)
    tracker._kf_slot_fid = {
        int(s): int(kf_fid[s]) for s in np.flatnonzero(kf_valid)
    }
    tracker.state = Tracker.LOST if extra["state"] != Tracker.NOT_INITIALIZED else Tracker.NOT_INITIALIZED
    # never auto-reset a restored map (the tiny-map reset rule,
    # Tracking.cc:620-628, targets failed bootstraps, not resumed sessions)
    tracker._resumed = True
    return tracker
