"""TUM-format trajectory IO: `timestamp tx ty tz qx qy qz qw` per line.

Matches the incremental tracking trajectory writer
(cpp/voxel_ps/src/main_ps.cpp:262-275) and the refined-pose writer
(cpp/include/ps_optimizer/OptimizerAux.cpp:580-599), plus an ATE-RMSE
evaluator (the reference defers this to external tooling).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _rot_to_quat_xyzw(R: np.ndarray) -> np.ndarray:
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w], dtype=np.float64)


def pose_line(timestamp: str, T: np.ndarray) -> str:
    t = T[:3, 3]
    q = _rot_to_quat_xyzw(np.asarray(T[:3, :3], dtype=np.float64))
    return (
        f"{timestamp} {t[0]:g} {t[1]:g} {t[2]:g} "
        f"{q[0]:g} {q[1]:g} {q[2]:g} {q[3]:g}"
    )


def write_trajectory(path: str, timestamps: Sequence[str], poses: Sequence[np.ndarray]) -> bool:
    try:
        with open(path, "w") as fh:
            for ts, T in zip(timestamps, poses):
                fh.write(pose_line(ts, np.asarray(T)) + "\n")
        return True
    except OSError:
        return False


def read_trajectory(path: str) -> Tuple[List[str], List[np.ndarray]]:
    stamps: List[str] = []
    poses: List[np.ndarray] = []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) < 8 or parts[0].startswith("#"):
                continue
            t = np.array([float(v) for v in parts[1:4]])
            x, y, z, w = (float(v) for v in parts[4:8])
            n = np.sqrt(x * x + y * y + z * z + w * w)
            x, y, z, w = x / n, y / n, z / n, w / n
            R = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                    [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                    [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
                ]
            )
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
            stamps.append(parts[0])
            poses.append(T)
    return stamps, poses


def associate(stamps_est: Sequence[str], stamps_gt: Sequence[str],
              max_diff: float = 0.02) -> List[Tuple[int, int]]:
    """Greedy nearest-timestamp association — the semantics of the TUM
    benchmark's associate.py (the external tooling the reference defers
    ATE evaluation to, SURVEY §4): candidate (i, j) pairs sorted by
    |t_i − t_j|, each index matched at most once, pairs farther apart
    than max_diff seconds discarded.  Non-numeric timestamps (synthetic
    frame counters) fall back to positional pairing."""
    try:
        te = [float(s) for s in stamps_est]
        tg = [float(s) for s in stamps_gt]
    except ValueError:
        n = min(len(stamps_est), len(stamps_gt))
        return [(i, i) for i in range(n)]
    # near-neighbor candidate generation via bisect on the sorted gt stamps
    # (the full est x gt cross-product is O(N*M) — tens of millions of pairs
    # against a real 100 Hz TUM ground-truth file)
    import bisect

    order = sorted(range(len(tg)), key=lambda j: tg[j])
    tg_sorted = [tg[j] for j in order]
    cand = []
    for i, a in enumerate(te):
        lo = bisect.bisect_left(tg_sorted, a - max_diff)
        hi = bisect.bisect_right(tg_sorted, a + max_diff)
        for k in range(lo, hi):
            cand.append((abs(a - tg_sorted[k]), i, order[k]))
    cand.sort()
    used_e, used_g, pairs = set(), set(), []
    for _, i, j in cand:
        if i not in used_e and j not in used_g:
            used_e.add(i)
            used_g.add(j)
            pairs.append((i, j))
    pairs.sort()
    return pairs


def evaluate_ate(est_file: str, gt_file: str, max_diff: float = 0.02) -> dict:
    """ATE-RMSE between two TUM-format trajectory files with timestamp
    association — the in-repo equivalent of the external evaluation path
    the reference relies on (main_ps.cpp:262-275 writes, tooling absent)."""
    stamps_e, est = read_trajectory(est_file)
    stamps_g, gt = read_trajectory(gt_file)
    pairs = associate(stamps_e, stamps_g, max_diff=max_diff)
    if not pairs:
        # None serializes as valid JSON null (NaN would not)
        return {"ate_rmse": None, "pairs": 0,
                "est_poses": len(est), "gt_poses": len(gt)}
    err = ate_rmse([est[i] for i, _ in pairs], [gt[j] for _, j in pairs])
    return {"ate_rmse": err, "pairs": len(pairs),
            "est_poses": len(est), "gt_poses": len(gt)}


def ate_rmse(est_poses: Sequence[np.ndarray], gt_poses: Sequence[np.ndarray]) -> float:
    """Absolute trajectory error RMSE after Umeyama (rigid, no scale)
    alignment of the translation tracks — the TUM benchmark metric."""
    est = np.stack([np.asarray(T)[:3, 3] for T in est_poses])
    gt = np.stack([np.asarray(T)[:3, 3] for T in gt_poses])
    n = min(len(est), len(gt))
    est, gt = est[:n], gt[:n]
    mu_e, mu_g = est.mean(0), gt.mean(0)
    E, G = est - mu_e, gt - mu_g
    U, _, Vt = np.linalg.svd(G.T @ E)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    t = mu_g - R @ mu_e
    aligned = est @ R.T + t
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1))))
