"""Checkpoint / resume: snapshot the full SLAM state to disk.

The reference has NO persistence — map and trajectory state live in RAM
and only final TUM dumps survive (SURVEY §5).  Because the rebuild keeps
all state in arrays (TrackState pytree on device, keyframe-manager arrays
on host), snapshot/restore is exact: a resumed run continues bitwise
identically.

- TrackState: flattened pytree leaves -> one .npz (restored against a
  template with the same static config, which defines the treedef).
- KeyframeManager: keyframes / edges / descriptor maps numpy-ified into a
  second .npz + a small JSON header.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp


def save_pytree(path, tree):
    leaves, _ = jax.tree_util.tree_flatten(tree)
    np.savez_compressed(path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_pytree(path, template):
    z = np.load(path)
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    leaves = []
    for i, tl in enumerate(t_leaves):
        a = z[f"leaf_{i}"]
        leaves.append(jnp.asarray(a, np.asarray(tl).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_manager(prefix, mgr):
    """KeyframeManager -> <prefix>.json + <prefix>.npz."""
    from liwslam.backend.loop import MapFeature

    head = {
        "n_keyframes": len(mgr.keyframes),
        "modify_delta": {
            str(s): np.asarray(T).tolist() for s, T in mgr._modify_delta.items()
        },
        "kf_session": [kf.session for kf in mgr.keyframes],
        "last_solve_t_us": mgr.last_solve_t_us,
        "has_loop_pending": mgr.has_loop_pending,
        "seq_edges": [(i, j) for i, j, _ in mgr.seq_edges],
        "loop_edges": [(i, j) for i, j, _ in mgr.loop_edges],
        "kf_t_us": [kf.t_us for kf in mgr.keyframes],
        "kf_is_laser": [kf.is_laser for kf in mgr.keyframes],
        "mf_present": [f is not None for f in mgr.map_features],
        "mf_index": [
            int(m["index"]) if m is not None else -1 for m in mgr.mf_meta
        ],
        "session_root": {
            str(s): int(r) for s, r in mgr._session_root.items()
        },
    }
    arrays = {}
    for k, kf in enumerate(mgr.keyframes):
        arrays[f"kf{k}_T"] = kf.T_tracking
        arrays[f"kf{k}_p"] = kf.p
        arrays[f"kf{k}_q"] = kf.q
        arrays[f"kf{k}_corners"] = kf.corners
        arrays[f"kf{k}_l1"] = np.asarray(kf.scan_lines[0])
        arrays[f"kf{k}_l2"] = np.asarray(kf.scan_lines[1])
    for n, (i, j, tf) in enumerate(mgr.seq_edges):
        arrays[f"se{n}"] = np.asarray(tf)
    for n, (i, j, tf) in enumerate(mgr.loop_edges):
        arrays[f"le{n}"] = np.asarray(tf)
    # descriptor maps live in the device pool (manager round-5 redesign);
    # fetch each field ONCE and slice per slot on the host
    pool_np = (
        {f: np.asarray(x) for f, x in mgr._mf_pool.items()}
        if mgr._mf_pool is not None
        else None
    )
    for k, slot in enumerate(mgr.map_features):
        if slot is None:
            continue
        for field in ("points", "valid", "dist_q", "ang", "bitmap", "origin"):
            arrays[f"mf{k}_{field}"] = pool_np[field][slot]
    with open(prefix + ".json", "w") as fh:
        json.dump(head, fh)
    np.savez_compressed(prefix + ".npz", **arrays)


def load_manager(prefix, params):
    from liwslam.backend.loop import MapFeature
    from liwslam.backend.manager import Keyframe, KeyframeManager

    with open(prefix + ".json") as fh:
        head = json.load(fh)
    z = np.load(prefix + ".npz")
    mgr = KeyframeManager(params)
    mgr._modify_delta = {
        int(s): np.asarray(T) for s, T in head["modify_delta"].items()
    }
    mgr.last_solve_t_us = head["last_solve_t_us"]
    mgr.has_loop_pending = head["has_loop_pending"]
    mgr._session_root = {
        int(s): int(r) for s, r in head.get("session_root", {}).items()
    }
    for k in range(head["n_keyframes"]):
        mgr.keyframes.append(
            Keyframe(
                t_us=head["kf_t_us"][k],
                T_tracking=z[f"kf{k}_T"],
                p=z[f"kf{k}_p"],
                q=z[f"kf{k}_q"],
                is_laser=head["kf_is_laser"][k],
                corners=z[f"kf{k}_corners"],
                scan_lines=(z[f"kf{k}_l1"], z[f"kf{k}_l2"]),
                session=head["kf_session"][k],
            )
        )
    # rebuild the per-session rolling corner window the descriptor builder
    # consumes (last submap_count laser keyframes per session, in order)
    for k, kf in enumerate(mgr.keyframes):
        if not kf.is_laser:
            continue
        hist = mgr._corner_hist.setdefault(kf.session, [])
        hist.append((k, np.asarray(kf.corners).reshape(-1, 3)))
        if len(hist) > params.submap_count:
            del hist[: len(hist) - params.submap_count]
    mgr.seq_edges = [
        (i, j, z[f"se{n}"]) for n, (i, j) in enumerate(head["seq_edges"])
    ]
    mgr.loop_edges = [
        (i, j, z[f"le{n}"]) for n, (i, j) in enumerate(head["loop_edges"])
    ]
    for k, present in enumerate(head["mf_present"]):
        if not present:
            mgr.map_features.append(None)
            mgr.mf_meta.append(None)
            continue
        mf = MapFeature(
            points=jnp.asarray(z[f"mf{k}_points"]),
            valid=jnp.asarray(z[f"mf{k}_valid"]),
            dist_q=jnp.asarray(z[f"mf{k}_dist_q"]),
            ang=jnp.asarray(z[f"mf{k}_ang"]),
            bitmap=jnp.asarray(z[f"mf{k}_bitmap"]),
            origin=jnp.asarray(z[f"mf{k}_origin"]),
            index=head["mf_index"][k],
        )
        slot = mgr._pool_add(mf)
        mgr.map_features.append(slot)
        # host-side metadata twin the loop-detect gates read (r4)
        mgr.mf_meta.append(
            dict(
                n_valid=int(np.asarray(mf.valid).sum()),
                origin=np.asarray(z[f"mf{k}_origin"], np.float64),
                index=head["mf_index"][k],
                slot=slot,
            )
        )
    return mgr
