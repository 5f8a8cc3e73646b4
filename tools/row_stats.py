import sys
sys.path.insert(0, ".")
import numpy as np
from bench import _bench_cfg, make_window

cfg = _bench_cfg()
w = make_window(cfg)
pts = w["points"].reshape(-1, 4)
n = w["num_points"][0]
valid = np.zeros(len(pts), bool)
W, P = w["points"].shape[:2]
for i in range(W):
    valid[i*P:i*P+n] = True
pts = pts[valid]

def stats(name, coords, dims):
    ok = ((coords >= 0) & (coords < np.array(dims))).all(1)
    c = coords[ok]
    # rows along x: row id = (t*Z + z)*Y + y  (or (z*Y+y) for 3D)
    if c.shape[1] == 4:
        row = (c[:,3]*dims[2] + c[:,2])*dims[1] + c[:,1]
    else:
        row = c[:,2]*dims[1] + c[:,1]
    vox = np.unique(np.concatenate([row[:,None]* dims[0] + c[:,0:1]], 1))
    vrow = vox // dims[0]
    rows, counts = np.unique(vrow, return_counts=True)
    nrows_total = np.prod(dims[1:]) * (dims[3] if len(dims)>3 else 1) if False else None
    print(f"{name}: voxels={len(vox)} occ_rows={len(rows)} "
          f"mean_run={counts.mean():.2f} p50={np.percentile(counts,50):.0f} "
          f"p95={np.percentile(counts,95):.0f} p99={np.percentile(counts,99):.0f} max={counts.max()}")

mc = cfg.model.motionnet
lo = np.array(mc.crop_range[:3])
gx, gy, gz = mc.grid_size
c4 = np.floor((pts[:, :3] - lo) * 10).astype(np.int64)
t = np.repeat(np.arange(W), n)[ :len(c4)]  # approximate: all scans same n
c4 = np.concatenate([c4, t[:,None]], 1)
stats("4D L1 (x-rows)", c4, (gx, gy, gz, W))
c4_2 = np.concatenate([c4[:, :3] // 2, c4[:, 3:]], 1)
stats("4D L2", c4_2, (gx//2, gy//2, gz//2, W))
c4_4 = np.concatenate([c4[:, :3] // 4, c4[:, 3:]], 1)
stats("4D L4", c4_4, (gx//4, gy//4, gz//4, W))
c4_8 = np.concatenate([c4[:, :3] // 8, c4[:, 3:]], 1)
stats("4D L8", c4_8, (gx//8, gy//8, gz//8, W))

# 3D UNet current scan
cur = w["points"][W-1][:w["num_points"][W-1]]
rng3 = np.array(cfg.data.point_cloud_range[:3])
c3 = np.floor((cur[:, :3] - rng3) * 10).astype(np.int64)
g3 = cfg.data.grid_size
stats("3D L1", c3, g3)
stats("3D L2", c3 // 2, (g3[0]//2, g3[1]//2, g3[2]//2))
