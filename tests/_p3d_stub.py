"""A faithful CPU stand-in for the two pytorch3d symbols the reference's
ca_body geometry code uses (visualize/ca_body/utils/geom.py:27-28):
``Meshes`` and ``rasterize_meshes``.

Only the configuration the reference actually exercises is implemented:
single mesh, ``faces_per_pixel=1``, ``bin_size=0``, no blur, no culling.
The pixel↔NDC convention follows pytorch3d: NDC +X points LEFT and +Y
points UP, image row 0 / col 0 is the top-left pixel, and the center of
pixel (r, c) in an H×W image sits at
``y = 1 - (2r+1)/H``, ``x = 1 - (2c+1)/W``.

Used by tests to run the REFERENCE UV-map precompute on CPU so this
framework's host rasterizer (render/geometry.py:rasterize_uv_maps) can be
compared against the exact maps a real checkpoint was trained with.
"""

import sys
import types

import numpy as np
import torch


class Meshes:
    def __init__(self, verts, faces):
        self._verts = verts  # [1, V, 3]
        self._faces = faces  # [1, F, 3]


def rasterize_meshes(
    meshes,
    image_size,
    blur_radius: float = 0.0,
    faces_per_pixel: int = 1,
    bin_size=None,
    z_clip_value=None,
    **kwargs,
):
    if isinstance(image_size, int):
        image_size = (image_size, image_size)
    H, W = image_size
    verts = meshes._verts[0].detach().cpu().numpy().astype(np.float64)
    faces = meshes._faces[0].detach().cpu().numpy().astype(np.int64)

    pix_to_face = np.full((H, W), -1, np.int64)
    zbuf = np.full((H, W), -1.0, np.float64)
    bary = np.zeros((H, W, 3), np.float64)

    # pixel-center NDC grids (row-major)
    ys = 1.0 - (2.0 * np.arange(H) + 1.0) / H  # +Y up
    xs = 1.0 - (2.0 * np.arange(W) + 1.0) / W  # +X left

    best_z = np.full((H, W), np.inf)
    for f, (a, b, c) in enumerate(faces):
        pa, pb, pc = verts[a], verts[b], verts[c]
        if z_clip_value is not None and min(pa[2], pb[2], pc[2]) < z_clip_value:
            continue
        # bounding box in pixel space (x decreasing with col, y with row)
        fx = np.array([pa[0], pb[0], pc[0]])
        fy = np.array([pa[1], pb[1], pc[1]])
        c0 = max(int(np.floor((1.0 - fx.max()) * W / 2.0 - 0.5)), 0)
        c1 = min(int(np.ceil((1.0 - fx.min()) * W / 2.0 + 0.5)) + 1, W)
        r0 = max(int(np.floor((1.0 - fy.max()) * H / 2.0 - 0.5)), 0)
        r1 = min(int(np.ceil((1.0 - fy.min()) * H / 2.0 + 0.5)) + 1, H)
        if c0 >= c1 or r0 >= r1:
            continue
        gx, gy = np.meshgrid(xs[c0:c1], ys[r0:r1])
        det = (pb[1] - pc[1]) * (pa[0] - pc[0]) + (pc[0] - pb[0]) * (pa[1] - pc[1])
        if abs(det) < 1e-12:
            continue
        w0 = ((pb[1] - pc[1]) * (gx - pc[0]) + (pc[0] - pb[0]) * (gy - pc[1])) / det
        w1 = ((pc[1] - pa[1]) * (gx - pc[0]) + (pa[0] - pc[0]) * (gy - pc[1])) / det
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        z = w0 * pa[2] + w1 * pb[2] + w2 * pc[2]
        cur = best_z[r0:r1, c0:c1]
        take = inside & (z < cur)  # strict: first face wins ties (insertion order)
        rr, cc = np.where(take)
        pix_to_face[r0 + rr, c0 + cc] = f
        zbuf[r0 + rr, c0 + cc] = z[take]
        bary[r0 + rr, c0 + cc, 0] = w0[take]
        bary[r0 + rr, c0 + cc, 1] = w1[take]
        bary[r0 + rr, c0 + cc, 2] = w2[take]
        best_z[r0 + rr, c0 + cc] = z[take]

    p2f = torch.as_tensor(pix_to_face)[None, ..., None]
    zb = torch.as_tensor(zbuf)[None, ..., None]
    ba = torch.as_tensor(bary)[None, ..., None, :]
    dists = torch.zeros_like(zb)
    return p2f, zb, ba, dists


def gaussian_blur(img, kernel_size, sigma=None):
    """torchvision.transforms.functional.gaussian_blur for the single case
    the reference uses (tex_mean, kernel_size=11, sigma=None → 2.0;
    mesh_vae_drivable.py:113): separable conv, reflect padding."""
    import torch.nn.functional as tF

    ks = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
    if sigma is None:
        s = 0.3 * ((ks - 1) * 0.5 - 1) + 0.8
    else:
        s = sigma if isinstance(sigma, (int, float)) else sigma[0]
    coords = torch.arange(ks, dtype=torch.float32) - (ks - 1) / 2
    g = torch.exp(-(coords**2) / (2 * s**2))
    g = g / g.sum()
    x = img if img.dim() == 4 else img[None]
    C = x.shape[1]
    pad = ks // 2
    xp = tF.pad(x, (pad, pad, pad, pad), mode="reflect")
    out = tF.conv2d(xp, g.view(1, 1, 1, ks).expand(C, 1, 1, ks), groups=C)
    out = tF.conv2d(out, g.view(1, 1, ks, 1).expand(C, 1, ks, 1), groups=C)
    return out if img.dim() == 4 else out[0]


def install_torchvision():
    """Stub the two torchvision symbols mesh_vae_drivable imports (it is not
    installed in this environment)."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    utils = types.ModuleType("torchvision.utils")

    def make_grid(*a, **k):  # only used by compute_summaries (not under test)
        raise NotImplementedError

    utils.make_grid = make_grid
    transforms = types.ModuleType("torchvision.transforms")
    tfunc = types.ModuleType("torchvision.transforms.functional")
    tfunc.gaussian_blur = gaussian_blur
    tv.utils = utils
    tv.transforms = transforms
    transforms.functional = tfunc
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.utils"] = utils
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = tfunc


def install():
    """Register stub modules so `from pytorch3d...import rasterize_meshes`
    and `from pytorch3d.structures import Meshes` resolve."""
    if "pytorch3d" in sys.modules and not getattr(
        sys.modules["pytorch3d"], "_is_a2p_stub", False
    ):
        return
    p3d = types.ModuleType("pytorch3d")
    p3d._is_a2p_stub = True
    renderer = types.ModuleType("pytorch3d.renderer")
    mesh = types.ModuleType("pytorch3d.renderer.mesh")
    rmm = types.ModuleType("pytorch3d.renderer.mesh.rasterize_meshes")
    rmm.rasterize_meshes = rasterize_meshes
    struct = types.ModuleType("pytorch3d.structures")
    struct.Meshes = Meshes
    transforms = types.ModuleType("pytorch3d.transforms")

    # symbols the reference RenderLayer imports at module scope
    # (ca_body/utils/render.py:12-19) — never exercised when renderer=None
    class _Unused:
        def __init__(self, *a, **k):
            raise NotImplementedError("pytorch3d stub: rasterization not supported")

    renderer.RasterizationSettings = _Unused
    renderer.MeshRasterizer = _Unused
    textures = types.ModuleType("pytorch3d.renderer.mesh.textures")
    textures.TexturesUV = _Unused
    p3d_utils = types.ModuleType("pytorch3d.utils")
    p3d_utils.cameras_from_opencv_projection = _Unused
    sys.modules["pytorch3d.renderer.mesh.textures"] = textures
    sys.modules["pytorch3d.utils"] = p3d_utils

    def matrix_to_euler_angles(*a, **k):  # imported by lbs.py, unused at runtime
        raise NotImplementedError

    transforms.matrix_to_euler_angles = matrix_to_euler_angles
    sys.modules["pytorch3d"] = p3d
    sys.modules["pytorch3d.renderer"] = renderer
    sys.modules["pytorch3d.renderer.mesh"] = mesh
    sys.modules["pytorch3d.renderer.mesh.rasterize_meshes"] = rmm
    sys.modules["pytorch3d.structures"] = struct
    sys.modules["pytorch3d.transforms"] = transforms
