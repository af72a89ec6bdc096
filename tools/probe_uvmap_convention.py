"""Probe: does rasterize_uv_maps produce the SAME index/bary maps as the
reference make_uv_face_index/make_uv_barys (run via the faithful pytorch3d
CPU stub)?  Answers the map-orientation question decisively."""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

from tests import _p3d_stub

_p3d_stub.install()

# cuda → cpu redirect (make_uv_face_index hardcodes cuda, geom.py:50-58)
_orig_to = torch.Tensor.to


def _to(self, *args, **kwargs):
    args = tuple(
        "cpu" if (isinstance(a, (str, torch.device)) and str(a).startswith("cuda")) else a
        for a in args
    )
    return _orig_to(self, *args, **kwargs)


torch.Tensor.to = _to

from visualize.ca_body.utils import geom as ref_geom  # noqa: E402

from audio2photoreal_tpu.render.geometry import rasterize_uv_maps  # noqa: E402

# asymmetric two-triangle atlas
vt = np.array(
    [[0.1, 0.2], [0.9, 0.25], [0.15, 0.85], [0.8, 0.9]], np.float32
)
vti = np.array([[0, 1, 2], [1, 3, 2]], np.int64)

S = 32
fi_ref = ref_geom.make_uv_face_index(
    torch.as_tensor(vt), torch.as_tensor(vti), S, flip_uv=False
).cpu().numpy()
fi_ref2, bary_ref = ref_geom.make_uv_barys(
    torch.as_tensor(vt), torch.as_tensor(vti), S, flip_uv=False
)
fi_ref2 = fi_ref2.cpu().numpy()
bary_ref = bary_ref.cpu().numpy()

for flip in (True, False):
    fi_me, bary_me = rasterize_uv_maps(vt, vti, S, flip_v=flip)
    same = (fi_me == fi_ref).mean()
    print(f"flip_v={flip}: face-index agreement {same:.3f}")
    if same > 0.99:
        ok = np.allclose(bary_me[fi_me >= 0], bary_ref[fi_me >= 0], atol=1e-4)
        print("  bary match:", ok)

print("ref face idx coverage:", (fi_ref >= 0).mean())
print(fi_ref[::4, ::4])
