"""Geometry & box math: pure-jnp, fully vectorized, jit/vmap friendly.

Single source of truth for the BEV grid constants and every coordinate
transform the detector uses (the reference duplicates the constants in
lib/utils/transform.py:3-11 and tools/read_lidar.py:121-123 and keeps
loop-based / singleton variants of most functions).

Behavioral parity notes (each function cites the reference it matches):

* ``lidar_cnr_to_img`` matches the SECOND definition in the reference
  (transform.py:483-500), which shadows the vectorized first one
  (transform.py:388-414): depth division WITHOUT abs(), int32 truncation
  of the output box.
* ``bbox_transform_3d`` keeps the reference's dx/width dy/length mixing
  (bbox_transform.py:49-50) while ``bbox_transform_inv_3d`` decodes
  dx*length dy*width (bbox_transform.py:134-136) — the encode/decode
  pair is intentionally NOT self-inverse, exactly like the reference.
* projection helpers use a 0 (not 1) homogeneous coordinate and the
  permuted translation vector, exactly like transform.py:502-524 /
  :369-386 — the translation column is dropped by design of the
  reference's hand-rolled inverse.

All functions take/return float32 jnp arrays and never branch on data,
so they can live inside a single jit program.
"""

import jax
import jax.numpy as jnp
import numpy as np

# JAX's default matmul precision is reduced (bf16-class) on TPU *and* in
# recent CPU lowerings; calibration/projection math is tiny and must be
# exact f32, so every matmul/einsum here pins HIGHEST precision.
_HI = jax.lax.Precision.HIGHEST

# --- BEV grid constants (transform.py:3-11; read_lidar.py:121-123) ---------
TOP_X_MAX = 60.0
TOP_X_MIN = 0.0
TOP_Y_MIN = -30.0
TOP_Y_MAX = 30.0
RES = 0.1
ZRES = 0.3
HEIGHT_MIN = -2.0
HEIGHT_MAX = 0.4
LIDAR_HEIGHT = 1.73
CAR_HEIGHT = 1.56
# Reference quirk (replicated): transform.py:10-11 computes the grid size
# with FLOOR division — int((60-0)//0.1)+1 == 600 in IEEE (60//0.1 == 599.0)
# — while read_lidar.py:49-53 allocates int(60/0.1)+1 == 601 pixels. So all
# coordinate maps use Xn=Yn=600 but the BEV raster is 601x601.
Xn = int((TOP_X_MAX - TOP_X_MIN) // RES) + 1   # 600 (transform.py:10)
Yn = int((TOP_Y_MAX - TOP_Y_MIN) // RES) + 1   # 600 (transform.py:11)
BEV_H = int((TOP_X_MAX - TOP_X_MIN) / RES) + 1  # 601 (read_lidar.py:50,53)
BEV_W = int((TOP_Y_MAX - TOP_Y_MIN) / RES) + 1  # 601 (read_lidar.py:49,53)
N_SLICES = int(round((HEIGHT_MAX - HEIGHT_MIN) / ZRES))  # 8 height slices
BEV_C = N_SLICES + 1                                     # + intensity


# --- pixel <-> meter maps ---------------------------------------------------

def lidar_to_bv_coord(x, y):
    """Lidar meters -> BEV pixel coords. transform.py:13-20."""
    xx = Yn - jnp.floor((y - TOP_Y_MIN) / RES)
    yy = Xn - jnp.floor((x - TOP_X_MIN) / RES)
    return xx, yy


def bv_to_lidar_coords(xx, yy):
    """BEV pixel coords (+0.5 cell center) -> lidar meters. transform.py:81-87."""
    y = Xn * RES - (xx + 0.5) * RES + TOP_Y_MIN
    x = Yn * RES - (yy + 0.5) * RES + TOP_X_MIN
    return x, y


# --- anchors / boxes between views ------------------------------------------

def bv_anchor_to_lidar(anchors):
    """2D BEV anchors (N,4 px) -> 3D lidar boxes (N,6 m). transform.py:89-111."""
    anchors = jnp.asarray(anchors, jnp.float32)
    ex_lengths = (anchors[:, 3] - anchors[:, 1]) * RES
    ex_widths = (anchors[:, 2] - anchors[:, 0]) * RES
    ex_ctr_xx = (anchors[:, 0] + anchors[:, 2]) / 2.0
    ex_ctr_yy = (anchors[:, 1] + anchors[:, 3]) / 2.0
    ex_ctr_x, ex_ctr_y = bv_to_lidar_coords(ex_ctr_xx, ex_ctr_yy)
    ex_heights = jnp.full_like(ex_lengths, CAR_HEIGHT)
    ex_ctr_z = jnp.full_like(ex_lengths, -(LIDAR_HEIGHT - CAR_HEIGHT / 2.0))
    return jnp.stack(
        [ex_ctr_x, ex_ctr_y, ex_ctr_z, ex_lengths, ex_widths, ex_heights], axis=1)


def lidar_3d_to_bv(rois_3d):
    """(N,6) lidar [x,y,z,l,w,h] -> (N,4) BEV px [x1,y1,x2,y2]. transform.py:113-142."""
    rois_3d = jnp.asarray(rois_3d, jnp.float32)
    a = rois_3d[:, 0] + rois_3d[:, 3] * 0.5
    b = rois_3d[:, 1] + rois_3d[:, 4] * 0.5
    c = rois_3d[:, 0] - rois_3d[:, 3] * 0.5
    d = rois_3d[:, 1] - rois_3d[:, 4] * 0.5
    x1, y1 = lidar_to_bv_coord(a, b)
    x2, y2 = lidar_to_bv_coord(c, d)
    return jnp.stack([x1, y1, x2, y2], axis=1)


def lidar_to_bv(rois_3d):
    """(N,7) [batch,x,y,z,l,w,h] -> (N,5) [batch,x1,y1,x2,y2]. transform.py:145-161."""
    rois_3d = jnp.asarray(rois_3d, jnp.float32)
    bv = lidar_3d_to_bv(rois_3d[:, 1:7])
    return jnp.concatenate([rois_3d[:, :1], bv], axis=1)


def lidar_3d_to_corners(pts_3d):
    """(N,6) [x,y,z,l,w,h] -> (N,24) corners (x0..x7,y0..y7,z0..z7).

    transform.py:290-315 — clockwise, z corners at -h/2 (x4) then +h/2 (x4).
    """
    pts_3d = jnp.asarray(pts_3d, jnp.float32)
    l = pts_3d[:, 3:4]
    w = pts_3d[:, 4:5]
    h = pts_3d[:, 5:6]
    x_sign = jnp.array([1, 1, -1, -1, 1, 1, -1, -1], jnp.float32) * 0.5
    y_sign = jnp.array([1, -1, -1, 1, 1, -1, -1, 1], jnp.float32) * 0.5
    z_sign = jnp.array([-1, -1, -1, -1, 1, 1, 1, 1], jnp.float32) * 0.5
    xc = l * x_sign + pts_3d[:, 0:1]
    yc = w * y_sign + pts_3d[:, 1:2]
    zc = h * z_sign + pts_3d[:, 2:3]
    return jnp.concatenate([xc, yc, zc], axis=1)


def lidar_cnr_to_3d(corners, lwh):
    """(N,24) corners + (N,3) lwh -> (N,6) [x,y,z,l,w,h]. transform.py:172-187."""
    corners = jnp.asarray(corners, jnp.float32).reshape(-1, 3, 8)
    ctr = corners.mean(axis=2)
    return jnp.concatenate([ctr, jnp.asarray(lwh, jnp.float32).reshape(-1, 3)],
                           axis=1)


def corners_to_bv(corners):
    """(N, 24*K) corners -> (N, 4*K) BEV boxes per class. transform.py:342-366.

    Footprint is (xmax,ymax,xmin,ymin) in lidar meters mapped through
    lidar_to_bv_coord, giving (x1,y1,x2,y2) in BEV pixels.
    """
    corners = jnp.asarray(corners, jnp.float32)
    n, d = corners.shape
    k = d // 24
    c = corners.reshape(n, k, 24)
    xmin = jnp.min(c[:, :, 0:8], axis=2)
    xmax = jnp.max(c[:, :, 0:8], axis=2)
    ymin = jnp.min(c[:, :, 8:16], axis=2)
    ymax = jnp.max(c[:, :, 8:16], axis=2)
    x1, y1 = lidar_to_bv_coord(xmax, ymax)
    x2, y2 = lidar_to_bv_coord(xmin, ymin)
    return jnp.stack([x1, y1, x2, y2], axis=2).reshape(n, 4 * k)


# --- camera <-> lidar --------------------------------------------------------

def compute_corners_3d(box3d, ry):
    """Camera-frame yaw-rotated corners of one box. transform.py:441-465.

    box3d: (6,) [x,y,z,l,w,h] camera frame; ry scalar. Returns (3,8).
    """
    box3d = jnp.asarray(box3d, jnp.float32)
    cos, sin = jnp.cos(ry), jnp.sin(ry)
    R = jnp.array([[cos, 0.0, sin], [0.0, 1.0, 0.0], [-sin, 0.0, cos]],
                  jnp.float32)
    l, w, h = box3d[3], box3d[4], box3d[5]
    x_c = jnp.array([1, 1, -1, -1, 1, 1, -1, -1], jnp.float32) * (l / 2)
    y_c = jnp.array([0, 0, 0, 0, -1, -1, -1, -1], jnp.float32) * h
    z_c = jnp.array([1, -1, -1, 1, 1, -1, -1, 1], jnp.float32) * (w / 2)
    corners = jnp.matmul(R, jnp.stack([x_c, y_c, z_c]), precision=_HI)
    return corners + box3d[0:3, None]


def _legacy_inverse_rt(Tr):
    """The reference's hand-rolled 'inverse' extrinsics (transform.py:513-519):
    R = inv(Tr[:,:3]); T = [-Tr[1,3], -Tr[2,3], Tr[0,3]] — permuted on purpose
    (paired with the 0 homogeneous coordinate below)."""
    Tr = jnp.asarray(Tr, jnp.float32).reshape(3, 4)
    R = jnp.linalg.inv(Tr[:, :3])
    T = jnp.stack([-Tr[1, 3], -Tr[2, 3], Tr[0, 3]])[:, None]
    return jnp.concatenate([R, T], axis=1)  # (3,4)


def camera_to_lidar_cnr(pts_3d, Tr):
    """Camera corners (3,8)|(N,24 cam layout) -> lidar corners (N,24).

    transform.py:502-524 — note the homogeneous coordinate is 0, so the
    T column of the hand-rolled RT is never applied.
    """
    pts_3d = jnp.asarray(pts_3d, jnp.float32)
    if pts_3d.ndim == 2 and pts_3d.shape == (3, 8):
        pts_3d = pts_3d.reshape(1, 24)
    pts = pts_3d.reshape(-1, 3, 8)
    pts4 = jnp.concatenate([pts, jnp.zeros((pts.shape[0], 1, 8), jnp.float32)],
                           axis=1)
    RT = _legacy_inverse_rt(Tr)
    lidar = jnp.einsum('ij,njk->nik', RT, pts4, precision=_HI)
    return lidar.reshape(-1, 24)


def cam_to_lidar_3d(pts_3d, Tr):
    """Camera (N,6) [x,y,z,l,w,h] -> lidar (N,6). transform.py:189-209."""
    pts_3d = jnp.asarray(pts_3d, jnp.float32)
    pts = pts_3d[:, :3].T                                   # (3,N)
    pts4 = jnp.concatenate([pts, jnp.zeros((1, pts.shape[1]), jnp.float32)])
    RT = _legacy_inverse_rt(Tr)
    lidar = jnp.matmul(RT, pts4, precision=_HI).T
    return jnp.concatenate([lidar, pts_3d[:, 3:6]], axis=1)


def project_to_image(pts_3d, P):
    """3xN points -> 2xN image px via 3x4 P (homog 1). transform.py:317-340."""
    pts_3d = jnp.asarray(pts_3d, jnp.float32)
    mat = jnp.concatenate([pts_3d, jnp.ones((1, pts_3d.shape[1]), jnp.float32)])
    p2 = jnp.matmul(jnp.asarray(P, jnp.float32).reshape(3, 4), mat, precision=_HI)
    return p2[:2] / p2[2:3]


def lidar_cnr_to_img(corners, Tr, R0, P2, legacy_int=True):
    """Lidar corners (N,24) -> image boxes (N,4) [x1,y1,x2,y2].

    Matches the SECOND (shadowing) definition transform.py:483-500 +
    the single-box helper transform.py:369-386:
      mat = P2(3,4) @ R0asp(4,3) @ Tr(3,4)   (R0 read as a 4x3 with a zero row)
      img = mat @ [xyz; 0]                   (0 homogeneous -> no translation)
      divide by depth WITHOUT abs, box = min/max, int32 truncation.
    Set legacy_int=False to skip the int32 truncation (quality mode).
    """
    corners = jnp.asarray(corners, jnp.float32).reshape(-1, 3, 8)
    Tr = jnp.asarray(Tr, jnp.float32).reshape(-1)[:12].reshape(3, 4)
    R0 = jnp.asarray(R0, jnp.float32).reshape(-1)
    if R0.shape[0] == 9:   # raw 3x3 R0 -> pad the zero row the calib blob has
        R0 = jnp.concatenate([R0, jnp.zeros(3, jnp.float32)])
    R0m = R0[:12].reshape(4, 3)
    P2 = jnp.asarray(P2, jnp.float32).reshape(-1)[:12].reshape(3, 4)
    mat = jnp.matmul(jnp.matmul(P2, R0m, precision=_HI), Tr,
                     precision=_HI)                      # (3,4)
    pts4 = jnp.concatenate(
        [corners, jnp.zeros((corners.shape[0], 1, 8), jnp.float32)], axis=1)
    img_cor = jnp.einsum('ij,njk->nik', mat, pts4,
                         precision=_HI)                 # (N,3,8)
    img_cor = img_cor / img_cor[:, 2:3, :]                  # no abs (parity)
    xs, ys = img_cor[:, 0, :], img_cor[:, 1, :]
    boxes = jnp.stack([jnp.min(xs, 1), jnp.min(ys, 1),
                       jnp.max(xs, 1), jnp.max(ys, 1)], axis=1)
    if legacy_int:
        boxes = jnp.trunc(boxes)                            # .astype(np.int32)
    return boxes


def lidar_cnr_to_img_full(corners, Tr, R0, P2):
    """Quality-mode lidar-corners -> image boxes: the STANDARD KITTI
    calibration chain with translations kept.

    Both reference definitions of lidar_cnr_to_img append a ZERO
    homogeneous row (transform.py:380 and :399-401), so P2's 4th column
    and Tr's translation never contribute — every projected box is
    offset by (P2[:,:3]@R0@t_Tr + P2[:,3]) / depth (several px at car
    range on KITTI-like calibs). This function computes the correct
    p = P2 @ [R0 @ (Tr @ [xyz;1]); 1] instead; use for quality-mode
    eval/demo output, keep lidar_cnr_to_img for reference parity.
    """
    corners = jnp.asarray(corners, jnp.float32).reshape(-1, 3, 8)
    Tr = jnp.asarray(Tr, jnp.float32).reshape(-1)[:12].reshape(3, 4)
    R0 = jnp.asarray(R0, jnp.float32).reshape(-1)[:9].reshape(3, 3)
    P2 = jnp.asarray(P2, jnp.float32).reshape(-1)[:12].reshape(3, 4)
    n = corners.shape[0]
    pts4 = jnp.concatenate(
        [corners, jnp.ones((n, 1, 8), jnp.float32)], axis=1)   # (N,4,8)
    cam = jnp.einsum('ij,njk->nik', Tr, pts4, precision=_HI)   # (N,3,8)
    rect = jnp.einsum('ij,njk->nik', R0, cam, precision=_HI)
    rect4 = jnp.concatenate(
        [rect, jnp.ones((n, 1, 8), jnp.float32)], axis=1)
    img = jnp.einsum('ij,njk->nik', P2, rect4, precision=_HI)
    img = img / img[:, 2:3, :]
    xs, ys = img[:, 0, :], img[:, 1, :]
    return jnp.stack([jnp.min(xs, 1), jnp.min(ys, 1),
                      jnp.max(xs, 1), jnp.max(ys, 1)], axis=1)


# --- box delta encode / decode (lib/fast_rcnn/bbox_transform.py) -------------

def bbox_transform(ex_rois, gt_rois):
    """2D deltas with the +1 width convention. bbox_transform.py:11-29."""
    ex_rois = jnp.asarray(ex_rois, jnp.float32)
    gt_rois = jnp.asarray(gt_rois, jnp.float32)
    ex_w = ex_rois[:, 2] - ex_rois[:, 0] + 1.0
    ex_h = ex_rois[:, 3] - ex_rois[:, 1] + 1.0
    ex_cx = ex_rois[:, 0] + 0.5 * ex_w
    ex_cy = ex_rois[:, 1] + 0.5 * ex_h
    gt_w = gt_rois[:, 2] - gt_rois[:, 0] + 1.0
    gt_h = gt_rois[:, 3] - gt_rois[:, 1] + 1.0
    gt_cx = gt_rois[:, 0] + 0.5 * gt_w
    gt_cy = gt_rois[:, 1] + 0.5 * gt_h
    return jnp.stack([(gt_cx - ex_cx) / ex_w, (gt_cy - ex_cy) / ex_h,
                      jnp.log(gt_w / ex_w), jnp.log(gt_h / ex_h)], axis=1)


def bbox_transform_3d(ex_rois_3d, gt_rois_3d):
    """6-dof deltas, KEEPING dx/width dy/length mixing. bbox_transform.py:32-58."""
    ex = jnp.asarray(ex_rois_3d, jnp.float32)
    gt = jnp.asarray(gt_rois_3d, jnp.float32)
    return jnp.stack([
        (gt[:, 0] - ex[:, 0]) / ex[:, 4],   # dx / ex_widths   (quirk)
        (gt[:, 1] - ex[:, 1]) / ex[:, 3],   # dy / ex_lengths  (quirk)
        (gt[:, 2] - ex[:, 2]) / ex[:, 5],
        jnp.log(gt[:, 3] / ex[:, 3]),
        jnp.log(gt[:, 4] / ex[:, 4]),
        jnp.log(gt[:, 5] / ex[:, 5]),
    ], axis=1)


def corner_diag(boxes_cnr):
    """gt diagonal |corner0 - corner6| used for corner normalization.
    bbox_transform.py:63-68 (xyz0 = cols 0,8,16; xyz6 = cols 6,14,22)."""
    boxes_cnr = jnp.asarray(boxes_cnr, jnp.float32)
    d = boxes_cnr[:, 0::8] - boxes_cnr[:, 6::8]
    return jnp.linalg.norm(d, axis=1)


def bbox_transform_cnr(ex_rois_cnr, gt_rois_cnr):
    """Corner offsets normalized by gt diagonal. bbox_transform.py:61-72."""
    ex = jnp.asarray(ex_rois_cnr, jnp.float32)
    gt = jnp.asarray(gt_rois_cnr, jnp.float32)
    diag = corner_diag(gt)
    return (gt - ex) / diag[:, None]


def bbox_transform_inv(boxes, deltas):
    """2D decode. bbox_transform.py:75-106."""
    boxes = jnp.asarray(boxes, jnp.float32)
    deltas = jnp.asarray(deltas, jnp.float32)
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    dx, dy = deltas[:, 0::4], deltas[:, 1::4]
    dw, dh = deltas[:, 2::4], deltas[:, 3::4]
    pcx = dx * w[:, None] + cx[:, None]
    pcy = dy * h[:, None] + cy[:, None]
    pw = jnp.exp(dw) * w[:, None]
    ph = jnp.exp(dh) * h[:, None]
    out = jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                     pcx + 0.5 * pw, pcy + 0.5 * ph], axis=2)
    return out.reshape(deltas.shape)


def bbox_transform_inv_3d(boxes, deltas):
    """6-dof decode: dx*length dy*width (NOT the encode's mixing).
    bbox_transform.py:108-155."""
    boxes = jnp.asarray(boxes, jnp.float32)
    deltas = jnp.asarray(deltas, jnp.float32)
    l, w, h = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    cx, cy, cz = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    dx, dy, dz = deltas[:, 0::6], deltas[:, 1::6], deltas[:, 2::6]
    dl, dw, dh = deltas[:, 3::6], deltas[:, 4::6], deltas[:, 5::6]
    out = jnp.stack([
        dx * l[:, None] + cx[:, None],
        dy * w[:, None] + cy[:, None],
        dz * h[:, None] + cz[:, None],
        jnp.exp(dl) * l[:, None],
        jnp.exp(dw) * w[:, None],
        jnp.exp(dh) * h[:, None],
    ], axis=2)
    return out.reshape(deltas.shape)


def bbox_transform_inv_cnr(boxes_cnr, deltas):
    """Corner decode: deltas * diag + tiled base corners. bbox_transform.py:157-176."""
    boxes_cnr = jnp.asarray(boxes_cnr, jnp.float32)
    deltas = jnp.asarray(deltas, jnp.float32)
    diag = corner_diag(boxes_cnr)
    d = deltas * diag[:, None]
    k = deltas.shape[1] // 24
    return (d.reshape(-1, k, 24) + boxes_cnr[:, None, :]).reshape(deltas.shape)


def clip_boxes(boxes, im_shape):
    """Clip (N,4K) boxes to [0, dim-1]. bbox_transform.py:178-191."""
    boxes = jnp.asarray(boxes, jnp.float32)
    n, d = boxes.shape
    b = boxes.reshape(n, d // 4, 4)
    h, w = im_shape[0], im_shape[1]
    x1 = jnp.clip(b[:, :, 0], 0, w - 1)
    y1 = jnp.clip(b[:, :, 1], 0, h - 1)
    x2 = jnp.clip(b[:, :, 2], 0, w - 1)
    y2 = jnp.clip(b[:, :, 3], 0, h - 1)
    return jnp.stack([x1, y1, x2, y2], axis=2).reshape(n, d)
