"""Affine volume warp by shear decomposition — the fast HoloGAN resample.

The HoloGAN rigid transform applies ONE affine map per sample to a regular
output grid (hologan_generator.py:198-243). Exploiting that structure, the
trilinear resample factorises into a sequence of 1-D resampling passes:

    inv_map = [centered Ry(a)] · [centered Rz(b)] · [p ↦ s⁻¹·p + f]

  * angles a, b and the isotropic scale are extracted EXACTLY from the
    composite inverse matrix (a = atan2(R₀₂, R₂₂), b = atan2(R₁₀, R₁₁),
    s⁻¹ = ∛det L) — the HoloGAN warp is always of the form Ry·Rz·scale;
  * each axis rotation splits into three centered shears
    R(α) = Shₓ(−tan α/2)·Sh_u(sin α)·Shₓ(−tan α/2), with a per-sample
    90°-multiple pre-rotation (one-hot blend of lattice-exact rot90s)
    keeping the residual |r| ≤ 45° so shear factors stay ≤ tan 22.5°;
  * the translation lands exactly in three final axis passes.

Every pass contracts the volume with a tiny per-slice hat-weight matrix via
one batched einsum, fully differentiable through volume AND view.

STATUS — measured on TPU v5e (B=32, 16³×64): 19.9 ms forward vs 3.6 ms for
the dense Pallas MXU kernel. Despite ~256× fewer dense-equivalent FLOPs,
the pass structure (8192-way batches of (16,16)@(16,64) matmuls + rot90
axis permutes) starves the MXU; the dense kernel stays the default
('auto'). This module remains as (a) a correctness oracle with exact
matrix-identity tests, (b) the only path differentiable through the view
parameters, and (c) the better choice on CPU/GPU-class backends.

Boundary semantics: each pass border-clamps independently; the volume is
replicate-padded by ``pad`` voxels so those artefacts stay off the content.
Interior values match the single-gather reference (tests/test_shear_warp.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# elementary passes
# ---------------------------------------------------------------------------

def _hat_matrix(pos, size_in):
    """pos: (..., O) continuous sample positions → (..., O, size_in) hat
    (linear interpolation) weights with border clamp."""
    pc = jnp.clip(pos, 0.0, size_in - 1.0)
    k = jnp.arange(size_in, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pc[..., None] - k))


_EQ = {
    ("x", "y"): "bhoi,bdhic->bdhoc",
    ("x", "z"): "bdoi,bdhic->bdhoc",
    ("y", "x"): "bwoi,bdiwc->bdowc",
    ("y", "z"): "bdoi,bdiwc->bdowc",
    ("z", "x"): "bwoi,bihwc->bohwc",
    ("z", "y"): "bhoi,bihwc->bohwc",
}
_EQ_NODEP = {"x": "boi,bdhic->bdhoc", "y": "boi,bdiwc->bdowc",
             "z": "boi,bihwc->bohwc"}
_AXIS_POS = {"z": 1, "y": 2, "x": 3}


def shear_pass(vol, axis: str, dep, a, b, c):
    """Resample ``vol`` (B, D, H, W, C) along ``axis``: output index o
    samples the input at a·o + b·dep_index + c (a, b, c per-sample (B,))."""
    sizes = {"z": vol.shape[1], "y": vol.shape[2], "x": vol.shape[3]}
    size = sizes[axis]
    o = jnp.arange(size, dtype=jnp.float32)
    if dep is None:
        pos = a[:, None] * o[None] + c[:, None]             # (B, O)
        m = _hat_matrix(pos, size)
        return jnp.einsum(_EQ_NODEP[axis], m, vol)
    u = jnp.arange(sizes[dep], dtype=jnp.float32)
    pos = (a[:, None, None] * o[None, None, :]
           + b[:, None, None] * u[None, :, None]
           + c[:, None, None])                              # (B, U, O)
    m = _hat_matrix(pos, size)                              # (B, U, O, I)
    return jnp.einsum(_EQ[(axis, dep)], m, vol)


def _shear_matrix(axis, dep, a, b, c):
    """4×4 point-map matrices of shear_pass (for factorisation tests)."""
    bsz = a.shape[0]
    m = jnp.broadcast_to(jnp.eye(4), (bsz, 4, 4)).copy()
    i = {"x": 0, "y": 1, "z": 2}[axis]
    m = m.at[:, i, i].set(a)
    if dep is not None:
        j = {"x": 0, "y": 1, "z": 2}[dep]
        m = m.at[:, i, j].set(b)
    m = m.at[:, i, 3].set(c)
    return m


# ---------------------------------------------------------------------------
# lattice 90° rotations (one-hot per-sample)
# ---------------------------------------------------------------------------

_PLANE_AXES = {"xy": (3, 2), "xz": (3, 1)}  # jnp.rot90 axes in BDHWC


def _rot90_onehot(vol, k_onehot, plane):
    axes = _PLANE_AXES[plane]
    outs = [vol,
            jnp.rot90(vol, 1, axes=axes),
            jnp.rot90(vol, 2, axes=axes),
            jnp.rot90(vol, 3, axes=axes)]
    return sum(k_onehot[:, i, None, None, None, None] * outs[i]
               for i in range(4))


def _plane_rotation(plane, ang, bsz):
    """3×3 rotation of angle `ang` matching the convention that
    Ry(a)=atan2-extracted acts in (x,z) and Rz(b) in (x,y)."""
    c, s = jnp.cos(ang), jnp.sin(ang)
    one = jnp.ones_like(ang) if hasattr(ang, "shape") and ang.shape else None
    r = jnp.zeros((bsz, 3, 3))
    if plane == "xz":   # Ry(a): x' = c·x + s·z ; z' = −s·x + c·z
        r = r.at[:, 0, 0].set(c).at[:, 0, 2].set(s) \
             .at[:, 2, 0].set(-s).at[:, 2, 2].set(c).at[:, 1, 1].set(1.0)
    elif plane == "xy":  # Rz(b): x' = c·x − s·y ; y' = s·x + c·y
        r = r.at[:, 0, 0].set(c).at[:, 0, 1].set(-s) \
             .at[:, 1, 0].set(s).at[:, 1, 1].set(c).at[:, 2, 2].set(1.0)
    return r


def _reduce_angle(alpha):
    """α → (k int, r) with α ≡ k·90° + r, r ∈ [−45°, 45°]."""
    k = jnp.round(alpha / (jnp.pi / 2)).astype(jnp.int32)
    r = alpha - k.astype(jnp.float32) * (jnp.pi / 2)
    return k, r


# ---------------------------------------------------------------------------
# the full warp
# ---------------------------------------------------------------------------

def _factorise(inv):
    """inv (B,4,4) → (a, b, s_inv, tr). The HoloGAN inverse linear part is
    always s⁻¹·Ry(a)·Rz(b): Ry·Rz = [[ca·cb, −ca·sb, sa],
                                     [sb,     cb,     0],
                                     [−sa·cb, sa·sb, ca]]."""
    lin = inv[:, :3, :3]
    det = jnp.linalg.det(lin)
    s_inv = jnp.cbrt(det)
    r = lin / s_inv[:, None, None]
    a = jnp.arctan2(r[:, 0, 2], r[:, 2, 2])
    b = jnp.arctan2(r[:, 1, 0], r[:, 1, 1])
    return a, b, s_inv, inv[:, :3, 3]


def _segment_passes(plane, dep_main, alpha, cc):
    """Centered-shear pass specs realising a rotation by `alpha` in `plane`
    about center cc, split as R(residual) · R(k·90°)."""
    k, r = _reduce_angle(alpha)
    if plane == "xz":
        # Ry(a) in (x,z) is R(−a) in standard plane orientation
        t = jnp.tan(r / 2)
        s = -jnp.sin(r)
        shears = [("x", "z", t), ("z", "x", s), ("x", "z", t)]
    else:
        t = -jnp.tan(r / 2)
        s = jnp.sin(r)
        shears = [("x", "y", t), ("y", "x", s), ("x", "y", t)]
    ones = jnp.ones_like(t)
    specs = [(ax, dp, ones, f, -f * cc) for ax, dp, f in shears]
    return specs, k


def _rot90_k_onehot(k, plane):
    """Map the residual-reduction k onto the jnp.rot90 count whose point map
    equals the centered P(k·90°) for this plane (pinned empirically by
    tests/test_shear_warp.py): rot90(axes=(W,D))^k realises Ry(k·90°);
    rot90(axes=(W,H))^k realises Rz(−k·90°) ⇒ negate for xy."""
    if plane == "xy":
        k = -k
    return jax.nn.one_hot(jnp.mod(k, 4), 4)


def rigid_warp_shear(vol, view, pad: int = 4):
    """HoloGAN rigid transform of a cubic (B, S, S, S, C) volume by shear
    passes; drop-in equivalent of models.hologan.rigid_transform_volume's
    resample (same `inv` map, interior-exact vs the gather reference)."""
    bsz, d, h, w, ch = vol.shape
    assert d == h == w, "shear warp expects cubic volumes"
    size = d
    from ..models.hologan import _rigid_matrices
    m_fwd = _rigid_matrices(view)
    centroid = jnp.eye(4).at[:3, 3].set(-size * 0.5)
    centroid_new = jnp.eye(4).at[:3, 3].set(size * 0.5)
    inv = jnp.linalg.inv(centroid_new[None] @ m_fwd @ centroid[None])
    return warp_by_inverse(vol, inv, pad=pad)


def warp_by_inverse(vol, inv, pad: int = 4):
    """Apply the inverse-map resample out(p) = vol(inv·p) by shear passes.
    inv's linear part must be s⁻¹·Ry·Rz (HoloGAN's structure)."""
    bsz, size = vol.shape[0], vol.shape[1]
    a, b, s_inv, tr = _factorise(inv)

    p = size + 2 * pad
    cc = (p - 1) / 2.0
    # padded-frame translation: p_in' = L p_out' + tr' with
    # tr' = tr + pad·(1 − L)·1
    lin = inv[:, :3, :3]
    ones3 = jnp.ones((3,))
    tr_p = tr + pad * (ones3[None] - lin @ ones3)
    # final-segment shift: f = Rᵀ (tr' − w) + w, w = cc·1
    r_mat = lin / s_inv[:, None, None]
    wvec = jnp.full((3,), cc)
    f = jnp.einsum("bji,bj->bi", r_mat, tr_p - wvec[None]) + wvec[None]

    x = vol
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)),
                    mode="edge")

    ry_passes, ky = _segment_passes("xz", "z", a, cc)
    rz_passes, kz = _segment_passes("xy", "y", b, cc)
    for ax, dp, aa, bb, ccst in ry_passes:
        x = shear_pass(x, ax, dp, aa, bb, ccst)
    x = _rot90_onehot(x, _rot90_k_onehot(ky, "xz"), "xz")
    for ax, dp, aa, bb, ccst in rz_passes:
        x = shear_pass(x, ax, dp, aa, bb, ccst)
    x = _rot90_onehot(x, _rot90_k_onehot(kz, "xy"), "xy")
    for i, ax in enumerate(("x", "y", "z")):
        x = shear_pass(x, ax, None, s_inv, None, f[:, i])

    if pad:
        x = x[:, pad:p - pad, pad:p - pad, pad:p - pad, :]
    return x


# ---------------------------------------------------------------------------
# factorisation self-check (used by tests)
# ---------------------------------------------------------------------------

def composite_matrix(inv, size, pad: int = 4):
    """Rebuild the point map realised by warp_by_inverse's pass sequence as
    4×4 matrices IN THE UNPADDED FRAME — must equal `inv` exactly."""
    bsz = inv.shape[0]
    a, b, s_inv, tr = _factorise(inv)
    p = size + 2 * pad
    cc = (p - 1) / 2.0
    lin = inv[:, :3, :3]
    ones3 = jnp.ones((3,))
    tr_p = tr + pad * (ones3[None] - lin @ ones3)
    r_mat = lin / s_inv[:, None, None]
    wvec = jnp.full((3,), cc)
    f = jnp.einsum("bji,bj->bi", r_mat, tr_p - wvec[None]) + wvec[None]

    def rot90_mat(k, plane):
        # the segment needs centered P(k·90°) with P = Ry for xz, Rz for xy
        ang = (jnp.pi / 2) * k.astype(jnp.float32)
        r = _plane_rotation(plane, ang, bsz)
        m = jnp.broadcast_to(jnp.eye(4), (bsz, 4, 4)).copy()
        m = m.at[:, :3, :3].set(r)
        shift = wvec[None] - jnp.einsum("bij,j->bi", r, wvec)
        return m.at[:, :3, 3].set(shift)

    ry_passes, ky = _segment_passes("xz", "z", a, cc)
    rz_passes, kz = _segment_passes("xy", "y", b, cc)
    mats = []
    for ax, dp, aa, bb, ccst in ry_passes:
        mats.append(_shear_matrix(ax, dp, aa, bb, ccst))
    mats.append(rot90_mat(ky, "xz"))
    for ax, dp, aa, bb, ccst in rz_passes:
        mats.append(_shear_matrix(ax, dp, aa, bb, ccst))
    mats.append(rot90_mat(kz, "xy"))
    for i, ax in enumerate(("x", "y", "z")):
        mats.append(_shear_matrix(ax, None, s_inv, None, f[:, i]))

    comp = mats[0]
    for m in mats[1:]:
        comp = comp @ m
    # unpadded frame: conjugate by the pad shift
    shift = jnp.eye(4).at[:3, 3].set(pad)
    unshift = jnp.eye(4).at[:3, 3].set(-pad)
    return unshift[None] @ comp @ shift[None]
