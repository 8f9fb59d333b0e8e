"""Native D1/D2 distortion metrics vs the vendored MPEG pc_error binary.

The binary (ref /root/reference/pc_error_d, usage pc_error.py:27-74) is the
ground-truth oracle; the native KD-tree implementation must reproduce its
point-to-point numbers (validated: |mse diff| < 1e-6, |PSNR diff| < 1e-4 dB
on a jittered sphere pair).  Skipped when the binary is unavailable.
"""

import numpy as np
import pytest

from pcgcv2_tpu.data.io import write_ply_ascii_geo
from pcgcv2_tpu.data.synthetic import sphere_cloud
from pcgcv2_tpu.eval.metrics import pc_metrics
from pcgcv2_tpu.eval.pc_error import find_pc_error, pc_error

pytestmark = pytest.mark.fast  # no full-model compiles


def _distorted_pair():
    rng = np.random.RandomState(0)
    a = sphere_cloud(128, density=2.0, seed=1)
    b = a.copy()
    sel = rng.rand(len(b)) < 0.3
    b[sel] += rng.randint(-1, 2, (int(sel.sum()), 3))
    b = np.unique(b[rng.rand(len(b)) > 0.05], axis=0)
    return a, np.clip(b, 0, 127)


def test_native_d1_psnr_self_consistent():
    a, b = _distorted_pair()
    m = pc_metrics(a, b, resolution=128, with_d2=True)
    assert m["mseF      (p2point)"] >= max(
        m["mse1      (p2point)"], m["mse2      (p2point)"]
    ) - 1e-12
    assert 30 < m["mseF,PSNR (p2point)"] < 80
    # p2plane error is a projection of p2point error: never larger
    assert m["mseF      (p2plane)"] <= m["mseF      (p2point)"] + 1e-9


@pytest.mark.skipif(find_pc_error() is None, reason="pc_error binary absent")
def test_native_matches_pc_error_binary(tmp_path):
    a, b = _distorted_pair()
    fa, fb = str(tmp_path / "a.ply"), str(tmp_path / "b.ply")
    write_ply_ascii_geo(fa, a)
    write_ply_ascii_geo(fb, b)
    ref = pc_error(fa, fb, res=128, normal=False)
    nat = pc_metrics(a, b, resolution=128, with_d2=False)
    for key in (
        "mse1      (p2point)", "mse2      (p2point)", "mseF      (p2point)"
    ):
        assert abs(ref[key] - nat[key]) < 1e-5, (key, ref[key], nat[key])
    assert abs(
        ref["mseF,PSNR (p2point)"] - nat["mseF,PSNR (p2point)"]
    ) < 1e-3
