"""Cross-view depth-map fusion to a point cloud (``RunFusion`` ETH variant,
DPE.cpp:1220-1370).

TPU-native restructuring: the reference's per-pixel sequential loop becomes a
vectorized consistency vote per reference view — every pixel is projected into
all source views at once, gathers the source depth/normal, and accumulates the
dynamic consistency score:

    consistent if reproj_err < 2px AND rel_depth_diff < 0.01 AND angle < 10°
    score = sum exp(-(err + 200*dd + 10*angle)) must exceed
            0.45*n (weak) / 0.3*n (strong)

The reference also masks out every *used* source pixel while scanning
sequentially (DPE.cpp:1299, 1353); we apply the mask between reference views
(scatter after each view) — suppression of duplicates discovered within the
same reference view is coarser, which can only add points, never drop them.
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PixelState
from ..geometry import cameras as geo
from ..io import formats, scene


def _camera_of(c: scene.CameraData) -> geo.Camera:
    return geo.Camera(K=jnp.asarray(c.K), R=jnp.asarray(c.R), t=jnp.asarray(c.t))


@jax.jit
def _fuse_view(ref_cam_arrs, src_cam_arrs, ref_depth, ref_normal, ref_weak,
               ref_mask, src_depths, src_normals, src_masks):
    """Consistency vote of one reference view against its V source views.

    Returns (accept (H, W) bool, world points (H, W, 3), used (V, H, W) bool,
    used_x, used_y (V, H, W) int32)."""
    ref_cam = geo.Camera(*ref_cam_arrs)
    H, W = ref_depth.shape
    px, py = geo.pixel_grid(H, W)
    Xw = geo.backproject_to_world(ref_cam, px, py, ref_depth)

    def per_src(xs):
        K, R, t, s_depth, s_normal, s_mask = xs
        cam = geo.Camera(K=K, R=R, t=t)
        sx, sy, _ = geo.project_to_camera(cam, Xw)
        sxi = jnp.round(sx).astype(jnp.int32)
        syi = jnp.round(sy).astype(jnp.int32)
        inb = (sxi >= 0) & (sxi < W) & (syi >= 0) & (syi < H)
        lin = jnp.clip(syi, 0, H - 1) * W + jnp.clip(sxi, 0, W - 1)
        d_src = jnp.take(s_depth.reshape(-1), lin)
        n_src = jnp.take(s_normal.reshape(-1, 3), lin, axis=0)
        m_src = jnp.take(s_mask.reshape(-1), lin)
        X_src = geo.backproject_to_world(
            cam, sxi.astype(jnp.float32), syi.astype(jnp.float32), d_src)
        bx, by, proj_d = geo.project_to_camera(ref_cam, X_src)
        err = jnp.sqrt((px - bx) ** 2 + (py - by) ** 2)
        dd = jnp.abs(proj_d - ref_depth) / jnp.maximum(ref_depth, 1e-30)
        cosang = jnp.clip(jnp.sum(ref_normal * n_src, -1), -1.0, 1.0)
        ang = jnp.arccos(cosang)
        ang = jnp.where(jnp.isnan(ang), 0.0, ang)
        ok = inb & (~m_src) & (d_src > 0) & (err < 2.0) & (dd < 0.01) & \
            (ang < 0.174533)
        score = jnp.where(ok, jnp.exp(-(err + 200.0 * dd + 10.0 * ang)), 0.0)
        return ok, score, sxi, syi

    oks, scores, sxs, sys_ = jax.vmap(per_src)(
        (src_cam_arrs[0], src_cam_arrs[1], src_cam_arrs[2],
         src_depths, src_normals, src_masks))

    num_consistent = jnp.sum(oks, axis=0)
    total = jnp.sum(scores, axis=0)
    factor = jnp.where(ref_weak == int(PixelState.WEAK), 0.45, 0.3)
    accept = (~ref_mask) & (ref_depth > 0) & (num_consistent >= 1) & \
        (total > factor * num_consistent)
    used = oks & accept[None]
    return accept, Xw, num_consistent, used, sxs, sys_


# ---------------------------------------------------------------------------
# Mesh-distributed fusion (SURVEY §2.3 #4)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _vote_exec(mesh: Mesh, axis: str):
    """Sharded consistency vote: reference views sharded over the mesh,
    depth/normal/camera stacks all-gathered once per pass, each device
    voting its local reference block (lax.map over the shard)."""
    def body(K, R, t, d, n, w, m, idx, sm):
        d_all = jax.lax.all_gather(d, axis, tiled=True)      # (B, H, W)
        n_all = jax.lax.all_gather(n, axis, tiled=True)
        K_all = jax.lax.all_gather(K, axis, tiled=True)
        R_all = jax.lax.all_gather(R, axis, tiled=True)
        t_all = jax.lax.all_gather(t, axis, tiled=True)

        def one(args):
            K_b, R_b, t_b, d_b, n_b, w_b, m_b, idx_b, sm_b = args
            safe = jnp.maximum(idx_b, 0)
            smk = sm_b | (idx_b < 0)[:, None, None]
            return _fuse_view(
                (K_b, R_b, t_b),
                (K_all[safe], R_all[safe], t_all[safe]),
                d_b, n_b, w_b, m_b, d_all[safe], n_all[safe], smk)

        return jax.lax.map(one, (K, R, t, d, n, w, m, idx, sm))

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(axis),) * 9, out_specs=P(axis),
        check_vma=False))


def run_fusion_mesh(dense_folder, problems: List[scene.Problem],
                    mesh: Mesh, axis: str = "views",
                    verbose: bool = False) -> Path:
    """``run_fusion`` with the reference views sharded over a device mesh
    (SURVEY §2.3 #4 — the cross-view vote as gather+reduce collectives
    instead of the reference's sequential whole-scene CPU loop,
    DPE.cpp:1220-1370).

    The sequential path's used-pixel masks are inherently order-dependent
    (each reference view masks source pixels for LATER views,
    DPE.cpp:1299/1353). The mesh variant reproduces that schedule to first
    order with two sharded vote passes: pass 1 votes unmasked; the host
    then replays the reference's mask schedule over pass-1's used maps;
    pass 2 votes with those masks. Duplicates-of-duplicates (a pixel
    suppressed only because its suppressor was itself suppressed) are the
    only divergence — second-order, bounded in tests/test_parallel.py."""
    dense_folder = Path(dense_folder)
    id_to_idx = {p.ref_image_id: i for i, p in enumerate(problems)}
    cache = _ViewCache(problems, max_views=len(problems) + 1)
    n_dev = len(mesh.devices.flat)
    B = len(problems)
    Bp = ((B + n_dev - 1) // n_dev) * n_dev
    v_pad = max(1, max(len(p.src_image_ids) for p in problems))

    H, W = cache.get(0)["depth"].shape
    d_st = np.zeros((Bp, H, W), np.float32)
    n_st = np.zeros((Bp, H, W, 3), np.float32)
    w_st = np.zeros((Bp, H, W), np.uint8)
    sky = np.zeros((Bp, H, W), bool)
    K_st = np.tile(np.eye(3, dtype=np.float32), (Bp, 1, 1))
    R_st = np.tile(np.eye(3, dtype=np.float32), (Bp, 1, 1))
    t_st = np.zeros((Bp, 3), np.float32)
    idx = np.full((Bp, v_pad), -1, np.int32)
    block_dir = dense_folder / "blocks"
    for i, p in enumerate(problems):
        e = cache.get(i)
        d_st[i], n_st[i], w_st[i] = e["depth"], e["normal"], e["weak"]
        K_st[i], R_st[i], t_st[i] = e["cam"].K, e["cam"].R, e["cam"].t
        for v, s in enumerate(p.src_image_ids[:v_pad]):
            if s in id_to_idx:
                idx[i, v] = id_to_idx[s]
        bp = block_dir / f"mask_{p.ref_image_id}.jpg"
        if bp.exists():
            import cv2
            b = cv2.imread(str(bp), cv2.IMREAD_GRAYSCALE)
            b = scene.resize_linear(b, W, H) if b.shape != (H, W) else b
            sky[i] = b < 128

    sharding = NamedSharding(mesh, P(axis))
    put = lambda a: jax.device_put(jnp.asarray(a), sharding)
    vote = _vote_exec(mesh, axis)

    # Pass 1: unmasked vote -> candidate used maps.
    zero_sm = np.zeros((Bp, v_pad, H, W), bool)
    out1 = vote(put(K_st), put(R_st), put(t_st), put(d_st), put(n_st),
                put(w_st), put(sky), put(idx), put(zero_sm))
    used1 = np.asarray(jax.device_get(out1[3]))              # (Bp, V, H, W)
    sx1 = np.asarray(jax.device_get(out1[4]))
    sy1 = np.asarray(jax.device_get(out1[5]))

    # Replay the sequential mask schedule over pass-1 votes (host).
    sup = np.zeros((Bp, H, W), bool)
    ref_mask = np.zeros((Bp, H, W), bool)
    src_mask = np.zeros((Bp, v_pad, H, W), bool)
    for i in range(B):
        ref_mask[i] = sup[i] | sky[i]
        for v in range(v_pad):
            j = idx[i, v]
            if j >= 0:
                src_mask[i, v] = sup[j]
        for v in range(v_pad):
            j = idx[i, v]
            if j >= 0:
                uv = used1[i, v]
                sup[j][sy1[i, v][uv], sx1[i, v][uv]] = True

    # Pass 2: the masked vote (the one whose accepts become points).
    out2 = vote(put(K_st), put(R_st), put(t_st), put(d_st), put(n_st),
                put(w_st), put(ref_mask), put(idx), put(src_mask))
    accept = np.asarray(jax.device_get(out2[0]))
    Xw = np.asarray(jax.device_get(out2[1]))
    num_c = np.asarray(jax.device_get(out2[2]))
    used = np.asarray(jax.device_get(out2[3]))
    sxs = np.asarray(jax.device_get(out2[4]))
    sys_ = np.asarray(jax.device_get(out2[5]))

    pts_out, col_out = [], []
    for i, p in enumerate(problems):
        col = cache.get(i)["img"].astype(np.float32).copy()
        acc = accept[i]
        for v in range(v_pad):
            j = idx[i, v]
            if j < 0:
                continue
            uv = used[i, v] & acc
            col[uv] += cache.get(j)["img"][sys_[i, v][uv],
                                           sxs[i, v][uv]].astype(np.float32)
        col[acc] /= (num_c[i][acc] + 1)[:, None]
        pts_out.append(Xw[i][acc])
        col_out.append(col[acc].astype(np.uint8))

    pts = (np.concatenate(pts_out, 0) if pts_out
           else np.zeros((0, 3), np.float32))
    cols = (np.concatenate(col_out, 0) if col_out
            else np.zeros((0, 3), np.uint8))
    out_path = dense_folder / "DPE" / "DPE.ply"
    out_path.parent.mkdir(exist_ok=True)
    formats.write_ply(out_path, pts, cols)
    if verbose:
        print(f"  fused point cloud (mesh x{n_dev}): {pts.shape[0]} points "
              f"-> {out_path}")
    return out_path


def export_depth_image_point_cloud(out_path, image_bgr: np.ndarray,
                                   cam: scene.CameraData,
                                   depth: np.ndarray,
                                   depth_min: float, depth_max: float) -> Path:
    """Back-project a single depth map to a colored PLY
    (``ExportDepthImagePointCloud``, DPE.cpp:1691-1724)."""
    H, W = depth.shape
    cam_j = _camera_of(cam)
    px, py = geo.pixel_grid(H, W)
    Xw = np.asarray(geo.backproject_to_world(cam_j, px, py,
                                             jnp.asarray(depth)))
    valid = (depth >= depth_min) & (depth <= depth_max) & np.isfinite(depth)
    pts = Xw[valid].astype(np.float32)
    cols = image_bgr[valid].astype(np.uint8)
    formats.write_ply(out_path, pts, cols)
    return Path(out_path)


class _ViewCache:
    """Bounded LRU loader for per-view fusion inputs.

    The reference loads EVERY view's image/depth/normal/weak into RAM up
    front (DPE.cpp:1248-1282) — O(views x H x W) host bytes, several GB at
    full resolution. Fusion touches views with pair-graph locality (each
    reference view plus its <=20 sources), so a small cache streams them
    from the per-view .dmb checkpoints instead. Used-pixel masks persist
    outside the cache (they accumulate across reference views,
    DPE.cpp:1299/1353)."""

    def __init__(self, problems, max_views: int = 24):
        from collections import OrderedDict
        self.problems = problems
        self.max_views = max_views
        self._cache = OrderedDict()

    def get(self, i: int):
        if i in self._cache:
            self._cache.move_to_end(i)
            return self._cache[i]
        p = self.problems[i]
        rf = p.result_folder
        d = formats.read_dmb(rf / "depths.dmb").astype(np.float32)
        nm = formats.read_dmb(rf / "normals.dmb").astype(np.float32)
        w = formats.read_dmb(rf / "weak.bin").astype(np.uint8)
        img = scene.load_image_color(p.dense_folder, p.ref_image_id)
        cam = scene.load_camera(p.dense_folder, p.ref_image_id)
        H, W = d.shape
        if img.shape[:2] != (H, W):
            sx = W / img.shape[1]
            sy = H / img.shape[0]
            img = scene.resize_linear(img, W, H)
            cam = cam.scaled(sx, sy, W, H)
        if w.shape != (H, W):
            w = scene.rescale_nearest(w, W, H)
        entry = {"depth": d, "normal": nm, "weak": w, "img": img, "cam": cam}
        self._cache[i] = entry
        while len(self._cache) > self.max_views:
            self._cache.popitem(last=False)
        return entry


def run_fusion(dense_folder, problems: List[scene.Problem],
               verbose: bool = False, max_resident_views: int = 24) -> Path:
    dense_folder = Path(dense_folder)
    id_to_idx = {p.ref_image_id: i for i, p in enumerate(problems)}
    block_dir = dense_folder / "blocks"
    cache = _ViewCache(problems, max_resident_views)

    # Used-pixel masks are the only whole-scene state (1 bit/px equivalent).
    masks = {}

    def mask_of(i):
        if i not in masks:
            masks[i] = np.zeros(cache.get(i)["depth"].shape, bool)
        return masks[i]

    pts_out = []
    col_out = []
    for i, p in enumerate(problems):
        if verbose:
            print(f"  fusing image {p.ref_image_id:08d}")
        src_idx = [id_to_idx[s] for s in p.src_image_ids if s in id_to_idx]
        if not src_idx:
            continue
        ref = cache.get(i)
        srcs = [cache.get(j) for j in src_idx]
        ref_cam = _camera_of(ref["cam"])
        src_K = jnp.asarray(np.stack([s["cam"].K for s in srcs]))
        src_R = jnp.asarray(np.stack([s["cam"].R for s in srcs]))
        src_t = jnp.asarray(np.stack([s["cam"].t for s in srcs]))
        ref_mask = mask_of(i).copy()
        bp = block_dir / f"mask_{p.ref_image_id}.jpg"
        if bp.exists():
            import cv2
            H, W = ref["depth"].shape
            b = cv2.imread(str(bp), cv2.IMREAD_GRAYSCALE)
            b = scene.resize_linear(b, W, H) if b.shape != (H, W) else b
            ref_mask |= b < 128          # True = blocked (sky mask)

        accept, Xw, num_c, used, sxs, sys_ = _fuse_view(
            (ref_cam.K, ref_cam.R, ref_cam.t),
            (src_K, src_R, src_t),
            jnp.asarray(ref["depth"]), jnp.asarray(ref["normal"]),
            jnp.asarray(ref["weak"]), jnp.asarray(ref_mask),
            jnp.asarray(np.stack([s["depth"] for s in srcs])),
            jnp.asarray(np.stack([s["normal"] for s in srcs])),
            jnp.asarray(np.stack([mask_of(j) for j in src_idx])),
        )
        accept = np.asarray(accept)
        Xw = np.asarray(Xw)
        num_c = np.asarray(num_c)
        used = np.asarray(used)
        sxs = np.asarray(sxs)
        sys_ = np.asarray(sys_)

        # Color average over ref + used src pixels (DPE.cpp:1348-1362);
        # vectorized fancy-indexed gather/scatter per source view.
        col = ref["img"].astype(np.float32).copy()
        for v, j in enumerate(src_idx):
            uv = used[v] & accept
            col[uv] += srcs[v]["img"][sys_[v][uv], sxs[v][uv]] \
                .astype(np.float32)
            # Mark used src pixels (DPE.cpp:1353).
            mask_of(j)[sys_[v][uv], sxs[v][uv]] = True
        col[accept] /= (num_c[accept] + 1)[:, None]

        pts_out.append(Xw[accept])
        col_out.append(col[accept].astype(np.uint8))

    pts = np.concatenate(pts_out, axis=0) if pts_out else np.zeros((0, 3), np.float32)
    cols = np.concatenate(col_out, axis=0) if col_out else np.zeros((0, 3), np.uint8)
    out_path = dense_folder / "DPE" / "DPE.ply"
    out_path.parent.mkdir(exist_ok=True)
    formats.write_ply(out_path, pts, cols)
    if verbose:
        print(f"  fused point cloud: {pts.shape[0]} points -> {out_path}")
    return out_path
