"""NBA SportVU preprocessing: SocialVAE-split txt → per-game npz.

Pandas-free port of the reference scripts/nba/process_data.py: each txt row
is ``frame agent_id x y group``; PLAYER rows get team 1/2 by per-frame rank
(first five = team 1), BALL rows team 0 / group 1; agent ids are re-indexed
0..N-1; output npz keys: frame_id, agent_id, pos, group, team — the format
lam_slide_tpu.data.nba.NBADataset loads.

    python tools/process_nba.py --data-dir .../score/train --outdir .../processed
"""

import argparse
import os
from collections import defaultdict

import numpy as np


def process_file(in_path: str, out_path: str) -> None:
    rows = []
    with open(in_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 5:
                continue
            frame, agent, x, y, group = parts
            rows.append((float(frame), agent, float(x), float(y), group))
    rows.sort(key=lambda r: (r[0], r[1]))

    # team by per-frame player rank (process_data.py:47-50)
    player_rank = defaultdict(int)
    records = []
    for frame, agent, x, y, group in rows:
        if group == "PLAYER":
            team = 1 if player_rank[frame] < 5 else 2
            player_rank[frame] += 1
            g = 0
        else:
            team = 0
            g = 1
        records.append((frame, agent, x, y, g, team))

    agent_ids = {}
    for _, agent, *_ in records:
        if agent not in agent_ids:
            agent_ids[agent] = len(agent_ids)

    frames = sorted({r[0] for r in records})
    frame_idx = {f: i for i, f in enumerate(frames)}
    n_agents = len(agent_ids)
    t = len(frames)
    pos = np.zeros((t, n_agents, 2), np.float32)
    team = np.zeros((t, n_agents), np.int64)
    group = np.zeros((t, n_agents), np.int64)
    agent_arr = np.zeros((t, n_agents), np.int64)
    frame_arr = np.zeros((t, n_agents), np.float64)
    for frame, agent, x, y, g, tm in records:
        fi, ai = frame_idx[frame], agent_ids[agent]
        pos[fi, ai] = (x, y)
        team[fi, ai] = tm
        group[fi, ai] = g
        agent_arr[fi, ai] = ai
        frame_arr[fi, ai] = frame
    np.savez(out_path, frame_id=frame_arr, agent_id=agent_arr, pos=pos,
             group=group, team=team)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--outdir", required=True)
    args = p.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    for name in sorted(os.listdir(args.data_dir)):
        if not name.endswith(".txt"):
            continue
        process_file(
            os.path.join(args.data_dir, name),
            os.path.join(args.outdir, name.replace(".txt", ".npz")),
        )
        print("processed", name)


if __name__ == "__main__":
    main()
